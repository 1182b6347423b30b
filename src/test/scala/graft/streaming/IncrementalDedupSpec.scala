package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.catalog.Catalog
import graft.functions.Dedup

class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val b1 = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely different content about spark engines"))
  private val b2 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog!"), // near-dup of 0
    (3L, "the quick brown fox jumps over the lazy dog"))  // exact dup of 0

  test("cross-batch pairs match the batch pipeline, each emitted once") {
    val cat = new Catalog(spark, tmpDir("incdedup"))
    val dd = new IncrementalDedup(cat, threshold = 0.8)
    val p1 = dd.processBatch(b1.toDF("doc_id", "text"), "doc_id", "text")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(p1.isEmpty) // nothing duplicated yet
    val p2 = dd.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val ref = Dedup.nearDuplicatePairs(
        (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text", threshold = 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(p1 ++ p2 == ref, s"incremental ${p1 ++ p2} != batch $ref")
    assert(ref == Set((0L, 1L), (0L, 3L), (1L, 3L)))

    // replaying a processed batch is a no-op: ids are already known
    val p3 = dd.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text")
    assert(p3.isEmpty)
  }

  test("streaming drain appends pairs to the pairs log exactly once") {
    val cat = new Catalog(spark, tmpDir("incdedupstream"))
    val dd = new IncrementalDedup(cat, threshold = 0.8)
    val srcDir = tmpDir("incdedupsrc")
    (b1 ++ b2).toDF("doc_id", "text").write.mode("overwrite").parquet(srcDir)
    val q = dd.start(
      spark.readStream.schema("doc_id long, text string").parquet(srcDir),
      "doc_id", "text", checkpoint = tmpDir("incdedupck"))
    q.awaitTermination()
    val pairs = cat.read("dedup_pairs")
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(pairs.toSet == Set((0L, 1L), (0L, 3L), (1L, 3L)))
    assert(pairs.length == 3, "a pair was emitted more than once")
  }
}
