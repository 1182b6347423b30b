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
}
