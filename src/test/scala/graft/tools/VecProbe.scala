package graft.tools

import org.apache.spark.sql.SparkSession

import graft.functions.VectorFunctions

/** Scale probe for the embedding near-dup paths: times the FIXED
  * (4 tables × 4 planes — t10's declared configuration) against the
  * AUTO policy (lshParamsFor) on an sf/probe dir, printing pair counts
  * so recall loss is visible next to the speedup. Usage:
  *   sbt "Test/runMain graft.tools.VecProbe /tmp/probe10x [threshold] [sections]"
  * where sections ⊆ lsh-auto,lsh-fixed,knn-fixed,knn-auto (default
  * all; lsh-fixed at ≥100x is hours of quadratic work — that being
  * impractical to even measure IS the finding).
  */
object VecProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/probe10x")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.45)
    val sections = args.lift(2)
      .map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("lsh-auto", "lsh-fixed", "knn-fixed", "knn-auto"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // match Bench's scale posture: AQE may widen heavy exchanges
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val (tables, planes) = VectorFunctions.lshParamsFor(n, threshold)
    println(s"[vecprobe] n=$n threshold=$threshold -> auto tables=$tables planes=$planes")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[vecprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, $c pairs")
      spark.catalog.clearCache()
    }
    if (sections("lsh-auto")) time("auto") {
      VectorFunctions.cosineNearDupPairsAuto(emb, "vec_id", "embedding", threshold).count()
    }
    if (sections("lsh-fixed")) time("fixed 4x4") {
      // deliberate baseline measurement: the fixed-at-scale fence is
      // exactly what this probe exists to quantify, so acknowledge it
      VectorFunctions.cosineNearDupPairs(emb, "vec_id", "embedding", threshold,
        allowFixedAtScale = true).count()
    }
    // s08-shaped kNN graph: fixed k=16 cells vs the ivfParamsFor policy
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    def knnGraph(k: Int): Long = {
      val cents = VectorFunctions.ivfTrainCentroids(emb, "vec_id", "embedding",
        k = k, sampleSize = math.max(256, 4 * k))
      val assigned = VectorFunctions.ivfAssign(emb, "vec_id", "embedding", cents)
        .persist()
      val a = assigned.select(col("__cid").as("cid"), col("__aid").as("query_id"),
        col("__avec").as("qv"))
      val b = assigned.select(col("__cid").as("cid"), col("__aid").as("neighbor_id"),
        col("__avec").as("nv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      val c = a.join(b, "cid").filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cos", VectorFunctions.cosine(col("qv"), col("nv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3).count()
      assigned.unpersist()
      c
    }
    def knnGraphTwoLevel(k: Int): Long = {
      val cents = VectorFunctions.ivfTrainCentroids(emb, "vec_id", "embedding",
        k = k, sampleSize = math.max(256, 4 * k))
      val assigned = VectorFunctions.ivfAssignTwoLevel(
        emb, "vec_id", "embedding", cents).persist()
      val a = assigned.select(col("__cid").as("cid"), col("__aid").as("query_id"),
        col("__avec").as("qv"))
      val b = assigned.select(col("__cid").as("cid"), col("__aid").as("neighbor_id"),
        col("__avec").as("nv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      val c = a.join(b, "cid").filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cos", VectorFunctions.cosine(col("qv"), col("nv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3).count()
      assigned.unpersist()
      c
    }
    val autoK = VectorFunctions.ivfParamsFor(n)
    if (sections("assign")) {
      val cents = VectorFunctions.ivfTrainCentroids(emb, "vec_id", "embedding",
        k = autoK, sampleSize = math.max(256, 4 * autoK))
      time(s"assign flat k=$autoK") {
        VectorFunctions.ivfAssign(emb, "vec_id", "embedding", cents)
          .select(sum(col("__cid"))).head(); n
      }
      time(s"assign 2level k=$autoK") {
        VectorFunctions.ivfAssignTwoLevel(emb, "vec_id", "embedding", cents)
          .select(sum(col("__cid"))).head(); n
      }
    }
    if (sections("knn-fixed")) time(s"knn fixed k=16")(knnGraph(16))
    if (sections("knn-auto")) time(s"knn auto k=$autoK")(knnGraph(autoK))
    if (sections("knn-2level")) time(s"knn 2level k=$autoK")(knnGraphTwoLevel(autoK))
    spark.stop()
  }
}
