package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.SignatureIndex

/** Scale probe for the persisted signature index: builds the index on
  * a base corpus dir, then serves the SAME small incoming batch and
  * prints build + serve wall-clock — run against sf0.1 and its
  * 10×/100× replicas to see serve cost stay ∝ batch + matched buckets
  * while the base grows 100×. Usage:
  *   sbt "Test/runMain graft.tools.SigProbe <baseDir> [batchSize] [nBuckets]"
  */
object SigProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val batchSize = args.lift(1).map(_.toInt).getOrElse(50)
    val nBuckets = args.lift(2).map(_.toInt).getOrElse(
      SignatureIndex.DefaultBuckets)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    // incoming batch + append batch: fixed tiny slices; base: the rest
    val head = docs.orderBy(col("doc_id")).limit(2 * batchSize)
      .localCheckpoint(true)
    val incoming = head.orderBy(col("doc_id")).limit(batchSize)
      .localCheckpoint(true)
    val appendBatch = head.join(incoming.select(col("doc_id")),
      Seq("doc_id"), "left_anti").localCheckpoint(true)
    val base = docs.join(head.select(col("doc_id")), Seq("doc_id"),
      "left_anti")
    val idx = java.nio.file.Files.createTempDirectory("sigprobe").toString +
      "/idx"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sigprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    println(s"[sigprobe] base=${n - 2 * batchSize} batch=$batchSize buckets=$nBuckets")
    time("build")(SignatureIndex.build(base, "doc_id", "text", idx,
      nBuckets = nBuckets))
    // the r15 verdict item-1 done-criterion: append cost ∝ batch, not
    // base — an O(batch) fragment commit (the delta is materialized so
    // the metric prices the index commit, not corpus filter scans)
    time("append")(SignatureIndex.append(appendBatch, "doc_id", "text", idx))
    // serve twice: cold (includes listing) and warm
    for (round <- Seq("serve_cold", "serve_warm")) {
      time(round) {
        val pairs = SignatureIndex.servePairs(spark, idx, incoming,
          "doc_id", "text", 0.8)
        println(s"[sigprobe] $round pairs=${pairs.count()}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
