package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextIndex, VectorIndex}

/** Scale probe for the GENERATION-layout persisted indexes (r13
  * verdict item 1's done-criterion: append cost still ∝ touched
  * buckets / O(batch) after the reader-consistency refactor): builds
  * TextIndex and VectorIndex on an sf/probe dir's corpus, appends a
  * small batch, compacts, and serves — printing wall-clock per phase
  * so the ROADMAP table can show append ≪ build at 10× and compare
  * against the pre-refactor shape.
  *
  * Usage: sbt "Test/runMain graft.tools.GenIdxProbe <dir> [batch] [sections]"
  *   sections ⊆ text,vector
  */
object GenIdxProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val batch = args.lift(1).map(_.toInt).getOrElse(500)
    val sections = args.lift(2)
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set("text", "vector"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITPARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[genidxprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    if (sections("text")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      // id-disjoint split so the append is genuinely incremental
      val ids = docs.select($"doc_id").orderBy($"doc_id".desc)
        .limit(batch).agg(min($"doc_id")).as[Long].head()
      val base = docs.filter($"doc_id" < ids)
      val delta = docs.filter($"doc_id" >= ids)
      val idx = java.nio.file.Files.createTempDirectory("giprobe_t").toString + "/idx"
      println(s"[genidxprobe] text: n=$n base=${n - batch} batch=$batch")
      time("text build")(TextIndex.build(base, "doc_id", "text", idx))
      time("text append")(TextIndex.append(delta, "doc_id", "text", idx))
      time("text compact")(TextIndex.compact(spark, idx))
      val k = time("text serve bm25TopK") {
        TextIndex.bm25TopK(spark, idx,
          Seq("vector", "stream", "window", "hash"), 20).count()
      }
      println(s"[genidxprobe] text serve rows=$k")
    }

    if (sections("vector")) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val ids = emb.select($"vec_id").orderBy($"vec_id".desc)
        .limit(batch).agg(min($"vec_id")).as[Long].head()
      val base = emb.filter($"vec_id" < ids)
      val delta = emb.filter($"vec_id" >= ids)
      val idx = java.nio.file.Files.createTempDirectory("giprobe_v").toString + "/idx"
      println(s"[genidxprobe] vector: n=$n base=${n - batch} batch=$batch")
      time("vector build")(VectorIndex.build(base, "vec_id", "embedding", idx))
      time("vector append")(
        VectorIndex.append(delta, "vec_id", "embedding", idx))
      time("vector compact")(VectorIndex.compact(spark, idx))
      val queries = emb.filter($"vec_id" < 8)
      val k = time("vector serve topK") {
        VectorIndex.topK(spark, idx, queries, "vec_id", "embedding", 5).count()
      }
      println(s"[genidxprobe] vector serve rows=$k")
    }
    spark.stop()
  }
}
