package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Recall-vs-cost A/B for the routed near-dup IVF branch (r13 verdict
  * item 3b): runs ivfCellPairsFrame over an (nAssign, cellTarget) grid
  * on an sf/probe dir's embeddings, printing wall-clock, pair count,
  * and — when `truth` is affordable (10× and below; the corpus² join
  * is the same excuse s09's audit makes) — recall vs the brute-force
  * θ-truth. The output feeds the ROADMAP table that decides whether
  * nAssign=3 buys ≥0.9 recall at an affordable candidate-volume
  * multiplier (≈ (nAssign²/4)× the nAssign=2 volume).
  *
  * Usage: sbt "Test/runMain graft.tools.RouteProbe <dir> [theta] [withTruth] [grid]"
  *   grid = "2:256,3:256,2:128,3:128" (nAssign:cellTarget pairs)
  */
object RouteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/probe10x")
    val theta = args.lift(1).map(_.toDouble).getOrElse(0.45)
    val withTruth = args.lift(2).map(_.toBoolean).getOrElse(true)
    val grid = args.lift(3).getOrElse("2:256,3:256,2:128,3:128")
      .split(",").map(_.trim.split(":")).map(a => (a(0).toInt, a(1).toInt))
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

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    println(s"[routeprobe] n=$n theta=$theta grid=${grid.mkString(",")}")

    val truth: Set[(Long, Long)] = if (!withTruth) Set.empty else {
      val v = emb.select($"vec_id".as("id_a"), $"embedding".as("__va"))
      val w = emb.select($"vec_id".as("id_b"), $"embedding".as("__vb"))
      val t = v.crossJoin(w).filter($"id_a" < $"id_b")
        .withColumn("cos", VectorFunctions.cosine($"__va", $"__vb"))
        .filter($"cos" >= theta)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      println(s"[routeprobe] brute-force truth pairs=${t.size}")
      t
    }

    grid.foreach { case (nAssign, cellTarget) =>
      val kc = math.max(1, math.min(n,
        VectorFunctions.ivfParamsFor(n, cellTarget).toLong)).toInt
      val t0 = System.nanoTime()
      val (out, assigned) = VectorFunctions.ivfCellPairsFrame(
        emb, "vec_id", "embedding", theta, kc,
        blockTarget = 4 * cellTarget, nAssign = nAssign)
      val pairs = out.select($"id_a", $"id_b").as[(Long, Long)].collect()
      val dt = (System.nanoTime() - t0) / 1e9
      assigned.unpersist()
      val recall = if (truth.isEmpty) -1.0
        else pairs.toSet.intersect(truth).size.toDouble / truth.size
      println(f"[routeprobe] nAssign=$nAssign cellTarget=$cellTarget " +
        f"kc=$kc: $dt%.2f s, pairs=${pairs.length}, recall=$recall%.3f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
