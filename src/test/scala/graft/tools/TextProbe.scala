package graft.tools

import org.apache.spark.sql.SparkSession

import graft.functions.Dedup

/** Scale probe for the TEXT near-dup auto path (t59's production
  * side): times nearDuplicatePairsAuto — banded MinHash sized by
  * minhashParamsFor from one corpus count — against the FIXED 16×2
  * declared configuration (t05's) on an sf/probe dir, printing the
  * chosen policy and pair counts. The brute-force truth join t59
  * carries at test SF is deliberately NOT run here: it is corpus² by
  * construction (the same excuse as s09's truth side at 100×) — the
  * production recall audit bounds the query side instead.
  * Usage: sbt "Test/runMain graft.tools.TextProbe /tmp/probe10x [theta] [sections]"
  * where sections ⊆ auto,fixed.
  */
object TextProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/probe10x")
    val theta = args.lift(1).map(_.toDouble).getOrElse(0.8)
    val sections = args.lift(2)
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set("auto", "fixed"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val (numHashes, bands) = Dedup.minhashParamsFor(n, theta)
    println(s"[textprobe] n=$n theta=$theta -> auto numHashes=$numHashes bands=$bands (rows=${numHashes / bands})")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[textprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, $c pairs")
      spark.catalog.clearCache()
    }
    if (sections("auto")) time("auto") {
      Dedup.nearDuplicatePairsAuto(docs, "doc_id", "text", theta).count()
    }
    if (sections("fixed")) time("fixed 16x2") {
      Dedup.nearDuplicatePairs(docs, "doc_id", "text", theta).count()
    }
    spark.stop()
  }
}
