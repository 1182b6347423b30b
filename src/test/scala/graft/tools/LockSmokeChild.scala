package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forked-JVM worker for LockSmokeSpec (r14 verdict item 6): appends
  * `batches` disjoint synthetic doc batches to a SHARED SignatureIndex,
  * serializing against the OTHER JVM only through the index's on-disk
  * writer lock — the cross-process exercise the single-JVM specs can't
  * give the StagedSwap/GenIndex protocol (stale-break, grave-rename,
  * third-writer acquisition are all cross-process failure modes).
  *
  * args: indexDir fromId batches batchSize
  * exit 0 = every append committed; non-zero = an append threw.
  */
object LockSmokeChild {
  def main(args: Array[String]): Unit = {
    val Array(indexDir, from, batches, batchSize) = args.take(4)
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName(s"locksmoke-$from")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      for (b <- 0 until batches.toInt) {
        val lo = from.toLong + b.toLong * batchSize.toInt
        // deterministic synthetic text: 12 tokens drawn from a 97-token
        // vocabulary by id arithmetic — unique enough per doc that the
        // signer produces varied bands, cheap enough to stay O(batch)
        val docs = spark.range(lo, lo + batchSize.toInt)
          .select(col("id").as("doc_id"),
            concat_ws(" ", (1 to 12).map(j =>
              concat(lit("tok"), pmod(col("id") * j, lit(97)))): _*)
              .as("text"))
        graft.functions.SignatureIndex.append(docs, "doc_id", "text", indexDir)
      }
    } finally spark.stop()
  }
}
