package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.catalog.Catalog

class IncrementalViewSpec extends SparkTestBase {
  import spark.implicits._

  private val vals = Seq("amt" -> "CAST(amt AS DECIMAL(19,0))")

  private def viewOf(iv: IncrementalView): Map[String, (Long, java.math.BigDecimal)] =
    iv.read(spark).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap

  test("batch deltas merge to the full recompute; replay of a committed batch is a no-op") {
    val cat = new Catalog(spark, tmpDir("ivm1"))
    val iv = new IncrementalView(cat, "sales", Seq("k"), vals)
    val b0 = Seq(("a", 10L), ("a", 5L), ("b", 1L)).toDF("k", "amt")
    val b1 = Seq(("a", 2L), ("c", 7L)).toDF("k", "amt")
    iv.processBatch(b0, 0L)
    iv.processBatch(b1, 1L)
    val expect = Map(
      "a" -> (3L, new java.math.BigDecimal(17)),
      "b" -> (1L, new java.math.BigDecimal(1)),
      "c" -> (1L, new java.math.BigDecimal(7)))
    assert(viewOf(iv) == expect)
    assert(iv.appliedThrough(spark) == 1L)
    // foreachBatch replay: same batchId again must change nothing
    iv.processBatch(b1, 1L)
    assert(viewOf(iv) == expect)
    // a second maintainer on the same catalog dir resumes the watermark
    val iv2 = new IncrementalView(cat, "sales", Seq("k"), vals)
    iv2.processBatch(b1, 1L)
    assert(viewOf(iv2) == expect)
  }

  test("signed stream retracts; vanished group leaves reads now and storage at compact") {
    val cat = new Catalog(spark, tmpDir("ivm2"))
    val iv = new IncrementalView(cat, "cdc", Seq("k"), vals, signCol = Some("s"))
    iv.processBatch(Seq(("a", 10L, 1L), ("gone", 4L, 1L)).toDF("k", "amt", "s"), 0L)
    iv.processBatch(Seq(("gone", 4L, -1L), ("a", 3L, 1L)).toDF("k", "amt", "s"), 1L)
    assert(viewOf(iv) == Map("a" -> (2L, new java.math.BigDecimal(13))))
    iv.compact(spark)
    // tombstone GC: the fully-retracted group is physically gone
    assert(cat.read("cdc_vstate").filter($"k" === "gone").count() == 0)
    // watermark survives compaction; replay still a no-op
    assert(iv.appliedThrough(spark) == 1L)
    iv.processBatch(Seq(("a", 99L, 1L)).toDF("k", "amt", "s"), 1L)
    assert(viewOf(iv) == Map("a" -> (2L, new java.math.BigDecimal(13))))
  }

  test("streaming drain with compactEvery: view equals batch recompute, state folded") {
    val cat = new Catalog(spark, tmpDir("ivm3"))
    val iv = new IncrementalView(cat, "str", Seq("k"), vals, compactEvery = 1)
    val srcDir = tmpDir("ivm3src")
    val rows = Seq(("a", 1L), ("b", 2L), ("a", 3L), ("c", 4L), ("b", 5L))
    rows.toDF("k", "amt").repartition(3).write.mode("overwrite").parquet(srcDir)
    val q = iv.start(
      spark.readStream.schema("k string, amt long").parquet(srcDir),
      checkpoint = tmpDir("ivm3ck"))
    q.awaitTermination()
    val expect = rows.groupBy(_._1).map { case (k, rs) =>
      k -> (rs.size.toLong, new java.math.BigDecimal(rs.map(_._2).sum)) }
    assert(viewOf(iv) == expect)
    // compactEvery folded the log to a single ref
    assert(cat.bucketRefs("str_vstate").size == 1)
  }

  test("bus-to-view: published CDC rows maintain the view exactly once across restarts") {
    import graft.sources.bus.BusLog
    val cat = new Catalog(spark, tmpDir("ivm4"))
    val iv = new IncrementalView(cat, "bus", Seq("k"), vals, signCol = Some("s"))
    val busRoot = tmpDir("ivm4bus")
    val ck = tmpDir("ivm4ck")
    BusLog.create(busRoot, numPartitions = 2)
    def publish(rows: Seq[(String, Long, Long)]): Unit =
      rows.zipWithIndex.groupBy(_._2 % 2).foreach { case (p, part) =>
        BusLog.publish(busRoot, p, part.map { case ((k, amt, s), _) =>
          (0L, s"""{"k":"$k","amt":$amt,"s":$s}""")
        })
      }
    publish(Seq(("a", 10L, 1L), ("b", 4L, 1L)))
    iv.startFromBus(spark, busRoot, "k string, amt long, s long", ck)
      .awaitTermination()
    assert(viewOf(iv) == Map(
      "a" -> (1L, new java.math.BigDecimal(10)),
      "b" -> (1L, new java.math.BigDecimal(4))))
    // restart: a retraction wave drains from the same checkpoint
    publish(Seq(("b", 4L, -1L), ("a", 1L, 1L)))
    iv.startFromBus(spark, busRoot, "k string, amt long, s long", ck)
      .awaitTermination()
    assert(viewOf(iv) == Map("a" -> (2L, new java.math.BigDecimal(11))))
    // nothing new: a drain is a no-op
    iv.startFromBus(spark, busRoot, "k string, amt long, s long", ck)
      .awaitTermination()
    assert(viewOf(iv) == Map("a" -> (2L, new java.math.BigDecimal(11))))
  }
}
