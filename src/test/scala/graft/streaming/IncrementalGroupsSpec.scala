package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.functions.Dedup

/** Incremental dedup-group label maintenance: folding pair batches
  * through applyPairs must equal the global batch CC bit-for-bit (same
  * min-doc reps), regardless of batch split; cluster merges relabel
  * the absorbed side wholesale; the streaming face is exactly-once
  * under replay of a committed batch.
  */
class IncrementalGroupsSpec extends SparkTestBase {
  import spark.implicits._

  private def labelsOf(df: DataFrame): Set[(Long, Long)] =
    df.select($"doc_id", $"rep").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def globalCc(pairs: DataFrame): Set[(Long, Long)] = {
    val nodes = pairs.select($"id_a".as("doc_id"))
      .union(pairs.select($"id_b".as("doc_id"))).distinct()
    labelsOf(Dedup.connectedComponents(nodes, pairs))
  }

  private val empty = {
    import org.apache.spark.sql.types.StructType
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType.fromDDL("doc_id long, rep long"))
  }

  test("two separate clusters merge wholesale when a bridging pair arrives") {
    val b1 = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val l1 = IncrementalGroups.applyPairs(empty, b1)
    assert(labelsOf(l1) == Set((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)))
    val b2 = Seq((2L, 3L)).toDF("id_a", "id_b")
    val l2 = IncrementalGroups.applyPairs(l1, b2)
    assert(labelsOf(l2) == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("untouched clusters pass through unchanged") {
    val l1 = IncrementalGroups.applyPairs(empty,
      Seq((10L, 11L), (20L, 21L), (30L, 31L)).toDF("id_a", "id_b"))
    val l2 = IncrementalGroups.applyPairs(l1,
      Seq((11L, 12L)).toDF("id_a", "id_b"))
    assert(labelsOf(l2) == Set((10L, 10L), (11L, 10L), (12L, 10L),
      (20L, 20L), (21L, 20L), (30L, 30L), (31L, 30L)))
  }

  test("any batch split of the fixture pairs folds to the global CC") {
    val pairs = Dedup.nearDuplicatePairsAuto(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text", threshold = 0.8)
      .select($"id_a", $"id_b").localCheckpoint(true)
    val want = globalCc(pairs)
    assert(want.nonEmpty)
    for (splits <- Seq(2, 3)) {
      var labels = empty
      for (i <- 0 until splits) {
        val part = pairs.filter(pmod(hash($"id_a", $"id_b"), lit(splits)) === i)
        labels = IncrementalGroups.applyPairs(labels, part)
          .localCheckpoint(true)
      }
      assert(labelsOf(labels) == want, s"fold over $splits batches diverged")
    }
  }

  test("streaming face is exactly-once: replaying a committed batch is a no-op") {
    val stateDir = tmpDir("iglabels") + "/state"
    val b1 = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val b2 = Seq((2L, 3L)).toDF("id_a", "id_b")
    IncrementalGroups.processBatch(b1, 0L, stateDir)
    IncrementalGroups.processBatch(b2, 1L, stateDir)
    val after = labelsOf(IncrementalGroups.latestLabels(spark, stateDir))
    assert(after == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
    // crash-replay of batch 1: already committed -> state unchanged even
    // though a naive re-fold would double-apply the star edges
    IncrementalGroups.processBatch(b2, 1L, stateDir)
    assert(labelsOf(IncrementalGroups.latestLabels(spark, stateDir)) == after)
  }

  test("a torn version (parquet without marker) is invisible and rewritten") {
    val stateDir = tmpDir("igtorn") + "/state"
    IncrementalGroups.processBatch(
      Seq((1L, 2L)).toDF("id_a", "id_b"), 0L, stateDir)
    val before = labelsOf(IncrementalGroups.latestLabels(spark, stateDir))
    // simulate a crash between parquet write and marker: v=1 parquet
    // lands with bogus content but no _graft_committed
    Seq((99L, 99L)).toDF("doc_id", "rep")
      .write.mode("overwrite").parquet(s"$stateDir/v=1")
    assert(labelsOf(IncrementalGroups.latestLabels(spark, stateDir)) == before,
      "uncommitted version must be invisible")
    // the replayed batch 1 recomputes FROM v=0 and overwrites the torn dir
    IncrementalGroups.processBatch(
      Seq((2L, 3L)).toDF("id_a", "id_b"), 1L, stateDir)
    assert(labelsOf(IncrementalGroups.latestLabels(spark, stateDir)) ==
      Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("streaming pair files maintain labels equal to the batch CC") {
    val root = tmpDir("igstream")
    val srcDir = s"$root/pairs"
    val pairs = Seq((1L, 2L), (5L, 6L), (2L, 5L), (7L, 8L))
    // 4 single-pair files => 4 micro-batches under maxFilesPerTrigger=1
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      Seq((a, b)).toDF("id_a", "id_b").repartition(1)
        .write.mode(if (i == 0) "overwrite" else "append").parquet(srcDir)
    }
    val stream = spark.readStream.schema("id_a long, id_b long")
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = IncrementalGroups.start(stream, s"$root/state", s"$root/ckpt")
    q.processAllAvailable()
    q.stop()
    val got = labelsOf(IncrementalGroups.latestLabels(spark, s"$root/state"))
    assert(got == globalCc(pairs.toDF("id_a", "id_b")))
  }

  test("a foreign v=-prefixed dir in the state root is ignored, not fatal") {
    val stateDir = tmpDir("igforeign") + "/state"
    IncrementalGroups.processBatch(
      Seq((1L, 2L)).toDF("id_a", "id_b"), 0L, stateDir)
    val before = labelsOf(IncrementalGroups.latestLabels(spark, stateDir))
    // e.g. an operator's scratch dir or an editor artifact — before the
    // digit filter this NumberFormatException-poisoned every later read
    new java.io.File(s"$stateDir/v=tmp").mkdirs()
    assert(labelsOf(IncrementalGroups.latestLabels(spark, stateDir)) == before)
    IncrementalGroups.processBatch(
      Seq((2L, 3L)).toDF("id_a", "id_b"), 1L, stateDir)
    assert(labelsOf(IncrementalGroups.latestLabels(spark, stateDir)) ==
      Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }
}
