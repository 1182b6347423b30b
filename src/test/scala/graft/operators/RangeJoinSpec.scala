package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val points = Seq(
    (1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 95L), (6L, 1000L))
    .toDF("pid", "p")
  private val intervals = Seq(
    (10L, 10L, 20L),   // half-open: contains 10, 19; not 20
    (11L, 0L, 100L),   // wide: spans many buckets
    (12L, 50L, 50L),   // empty: matches nothing
    (13L, 90L, 96L))   // narrow, off bucket boundaries
    .toDF("iid", "s", "e")

  private def naive = points.crossJoin(intervals)
    .filter($"p" >= $"s" && $"p" < $"e")
    .select($"pid", $"iid").as[(Long, Long)].collect().toSet

  test("bucketized range join equals the naive theta-join, once per pair") {
    for (width <- Seq(1L, 7L, 10L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", width)
        .select($"pid", $"iid").as[(Long, Long)].collect()
      assert(got.toSet == naive, s"width=$width")
      assert(got.length == got.toSet.size, s"duplicate pairs at width=$width")
    }
  }

  test("plans a shuffle equi-join on buckets, not a broadcast nested loop") {
    val df = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 10L)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the raw theta-join formulation, for contrast, nested-loops:
    val theta = points.join(intervals, $"p" >= $"s" && $"p" < $"e")
    val thetaPlan = theta.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(thetaPlan.contains("BroadcastNestedLoopJoin"), thetaPlan)
  }

  test("matches DuckDB-oracle semantics on the events incident window") {
    val ev = graft.Tables.withTsMicros(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"tus")
    val incidents = ev.filter($"event_type" === "error")
      .select($"event_id".as("iid"), $"tus".as("s"), ($"tus" + 600000000L).as("e"))
    val bucketed = RangeJoin.pointInInterval(clicks, incidents, "tus", "s", "e",
      600000000L).select($"iid", $"event_id").as[(Long, Long)].collect().toSet
    val ref = clicks.crossJoin(incidents)
      .filter($"tus" >= $"s" && $"tus" < $"e")
      .select($"iid", $"event_id").as[(Long, Long)].collect().toSet
    assert(bucketed == ref && bucketed.nonEmpty)
  }

  test("output estimate is exact under within-bucket-uniform points") {
    // one point at every integer of [0, 4480) — 4480 = 7·10·64, so at
    // every tested width EVERY bucket is fully tiled (a partially
    // filled tail bucket breaks within-bucket uniformity and the
    // estimate is only approximate there)
    val dense = spark.range(7L * 10L * 64L).select($"id".as("p"))
    for (width <- Seq(7L, 10L, 64L)) {
      val est = RangeJoin.estimateOutputRows(dense, intervals,
        "p", "s", "e", width)
      val actual = RangeJoin.pointInInterval(dense, intervals,
        "p", "s", "e", width).count()
      assert(math.abs(est - actual) < 1e-6,
        s"width=$width est=$est actual=$actual")
    }
  }

  test("output estimate bounds the real events incident window within 2x") {
    // the e08 shape on real (hot-key-skewed) event times: the
    // pre-flight must land in the right order of magnitude so a
    // caller can gate materialization on it (the 100x lesson: output
    // grows ~quadratically in temporal density — semantics, and the
    // estimate is how the caller sees it coming)
    val ev = graft.Tables.withTsMicros(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"tus")
    val incidents = ev.filter($"event_type" === "error")
      .select($"event_id".as("iid"), $"tus".as("s"), ($"tus" + 600000000L).as("e"))
    val est = RangeJoin.estimateOutputRows(clicks, incidents,
      "tus", "s", "e", 600000000L)
    val actual = RangeJoin.pointInInterval(clicks, incidents,
      "tus", "s", "e", 600000000L).count()
    assert(actual > 0 && est >= actual / 2.0 && est <= actual * 2.0,
      s"est=$est actual=$actual")
  }

  test("checked join refuses past the output cap, serves under it") {
    val dense = spark.range(100).select($"id".as("p"))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInIntervalChecked(dense, intervals, "p", "s", "e",
        10L, maxOutputRows = 10L)
    }
    assert(e.getMessage.contains("range join refused"))
    val ok = RangeJoin.pointInIntervalChecked(dense, intervals, "p", "s", "e",
      10L, maxOutputRows = 1000L)
    assert(ok.count() ==
      RangeJoin.pointInInterval(dense, intervals, "p", "s", "e", 10L).count())
  }

  test("estimate of an empty side is 0, not NULL") {
    val none = points.filter($"p" < 0)
    assert(RangeJoin.estimateOutputRows(none, intervals, "p", "s", "e", 10L) == 0.0)
    assert(RangeJoin.estimateOutputRows(points, intervals.filter($"s" > 1e9),
      "p", "s", "e", 10L) == 0.0)
  }
}
