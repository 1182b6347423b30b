package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.functions.TextIndex

/** Streaming maintenance face of the inverted text index: a document
  * stream drives build-then-append through foreachBatch (the
  * incremental-crawl ingest shape — each micro-batch rewrites only
  * the buckets its terms touch), and the stream-final index must
  * serve BIT-identically to a one-shot batch build over the same
  * corpus. This is the retrieval twin of the VectorIndex/streaming
  * dedup maintenance story: the serving side never knows how the
  * index was built.
  */
class TextIndexStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val terms = Seq("vector", "stream", "window", "hash")

  test("foreachBatch build+append stream-final index equals a batch build") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val srcDir = tmpDir("tidxsrc")
    docs.filter($"doc_id" % 3 === 0).coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    Thread.sleep(1100) // distinct mtimes: file listing preserves order
    docs.filter($"doc_id" % 3 === 1).coalesce(1)
      .write.mode("append").parquet(srcDir)
    Thread.sleep(1100)
    docs.filter($"doc_id" % 3 === 2).coalesce(1)
      .write.mode("append").parquet(srcDir)

    val idxDir = tmpDir("tidxstream")
    var built = false
    val q = spark.readStream
      .schema("doc_id long, text string")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!built) { TextIndex.build(batch, "doc_id", "text", idxDir); built = true }
        else TextIndex.append(batch, "doc_id", "text", idxDir)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val fullDir = tmpDir("tidxbatch")
    TextIndex.build(docs, "doc_id", "text", fullDir)
    assert(TextIndex.corpusStats(spark, idxDir) ==
      TextIndex.corpusStats(spark, fullDir))
    def serve(d: String) = TextIndex.bm25TopK(spark, d, terms, 20)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(serve(idxDir) == serve(fullDir) && serve(idxDir).size == 20)
  }
}
