package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.catalog.Catalog
import graft.functions.{Dedup, SignatureIndex}

/** Streaming faces of the persisted signature index:
  * (1) a document stream drives build-then-append through foreachBatch
  *     (the incremental-crawl ingest shape) and the stream-final index
  *     serves bit-identically to a one-shot batch build;
  * (2) the index is INTERCHANGEABLE with IncrementalDedup's
  *     log-maintained state: after the deduper drains the base corpus
  *     into its Catalog band/set logs, a new batch's CROSS-side pairs
  *     from processBatch equal servePairs from a SignatureIndex built
  *     on the same base — the persisted-artifact face and the
  *     streaming-state face answer the same question identically.
  */
class SignatureIndexStreamSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")

  test("foreachBatch build+append stream-final index equals a batch build") {
    val srcDir = tmpDir("sigsrc")
    docs.filter($"doc_id" % 2 === 0 && $"doc_id" % 3 === 0).coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    Thread.sleep(1100) // distinct mtimes: file listing preserves order
    docs.filter($"doc_id" % 2 === 0 && $"doc_id" % 3 === 1).coalesce(1)
      .write.mode("append").parquet(srcDir)
    Thread.sleep(1100)
    docs.filter($"doc_id" % 2 === 0 && $"doc_id" % 3 === 2).coalesce(1)
      .write.mode("append").parquet(srcDir)

    val streamIdx = tmpDir("sigstream") + "/idx"
    var built = false
    val q = spark.readStream
      .schema("doc_id long, text string")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!built) {
          SignatureIndex.build(batch, "doc_id", "text", streamIdx)
          built = true
        } else SignatureIndex.append(batch, "doc_id", "text", streamIdx)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val oneShotIdx = tmpDir("sigoneshot") + "/idx"
    SignatureIndex.build(docs.filter($"doc_id" % 2 === 0),
      "doc_id", "text", oneShotIdx)
    val incoming = docs.filter($"doc_id" % 2 === 1)
    def serve(idx: String) =
      SignatureIndex.servePairs(spark, idx, incoming, "doc_id", "text", 0.8)
        .as[(Long, Long, Double)].collect().toSet
    val got = serve(streamIdx)
    assert(got == serve(oneShotIdx))
    assert(got.nonEmpty, "no cross-side pairs - weak test")
    spark.catalog.clearCache()
  }

  test("servePairs == the cross-side pairs of IncrementalDedup's log state") {
    val base = docs.filter($"doc_id" % 2 === 0)
    val incoming = docs.filter($"doc_id" % 2 === 1)
    val cat = new Catalog(spark, tmpDir("sigcat"))
    val dedup = new IncrementalDedup(cat, threshold = 0.8)
    dedup.processBatch(base, "doc_id", "text").unpersist()
    val batchPairs = dedup.processBatch(incoming, "doc_id", "text")
      .select($"id_a", $"id_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    spark.catalog.clearCache()
    // cross-side subset, re-normalized to (id_new=odd, id_base=even)
    val cross = batchPairs
      .filter(p => (p._1 % 2 == 0) != (p._2 % 2 == 0))
      .map(p => if (p._1 % 2 == 1) p else (p._2, p._1, p._3))
    val idx = tmpDir("sigvslog") + "/idx"
    SignatureIndex.build(base, "doc_id", "text", idx)
    val served = SignatureIndex
      .servePairs(spark, idx, incoming, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(served == cross)
    assert(served.nonEmpty, "no cross-side pairs - weak test")
    spark.catalog.clearCache()
  }
}
