package graft

import org.apache.spark.sql.functions._

import graft.queries.EventOps

/** e19/e20 semantics, checked against a driver-side recomputation from
  * independently-collected hourly counts — same fixed-order double
  * arithmetic, so equality is exact, not approximate.
  */
class EventRateSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  /** Hourly (h, event_type) -> n, collected via a separate aggregation. */
  private def hourlyCounts(): Map[(java.sql.Timestamp, String), Long] = {
    val ev = Tables.load(spark, dir, "events")
    ev.groupBy(date_trunc("hour", Tables.tsUtc(ev)).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .toMap
  }

  test("e19 z-scores equal the exact-moment recomputation; stats side broadcasts") {
    val hourly = hourlyCounts()
    val stats = hourly.groupBy(_._1._2).map { case (tpe, rows) =>
      val ns = rows.values.toSeq
      val nh = ns.size.toLong
      val s = ns.sum
      val ss = ns.map(n => BigInt(n) * BigInt(n)).sum
      (tpe, nh, s, ss)
    }
    val expected = hourly.flatMap { case ((h, tpe), n) =>
      stats.find(_._1 == tpe).collect { case (_, nh, s, ss) if nh > 1 =>
        val varr = (ss.toDouble - s.toDouble * s.toDouble / nh) / (nh - 1)
        val z =
          if (varr > 0.0) (n.toDouble - s.toDouble / nh) / math.sqrt(varr)
          else 0.0
        (h, tpe) -> z
      }
    }
    val df = EventOps.e19RateAnomaly.fn(spark, dir)
    val got = df.collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, z) =>
      assert(got(k) == z, s"z mismatch at $k: got ${got(k)}, want $z")
    }
    // the per-type stats side must broadcast — a shuffled join of a
    // type-cardinality frame would add a pointless exchange at scale
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("e20 ewma equals the hand-rolled 8-tap exponential average, exactly") {
    val hourly = hourlyCounts()
    val expected = hourly.keys.map(_._2).toSeq.distinct.flatMap { tpe =>
      val series = hourly.collect { case ((h, t), n) if t == tpe => (h, n) }
        .toSeq.sortBy(_._1.getTime)
      series.zipWithIndex.map { case ((h, n), i) =>
        var num = 0.0
        var den = 0.0
        (0 to 7).foreach { k =>
          if (i - k >= 0) {
            val w = math.pow(0.5, k)
            num += w * series(i - k)._2
            den += w
          }
        }
        (tpe, h) -> num / den
      }
    }.toMap
    val got = EventOps.e20EwmaRate.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getDouble(3)).toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, e) =>
      assert(got(k) == e, s"ewma mismatch at $k: got ${got(k)}, want $e")
    }
  }
}
