package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("backward as-of picks greatest right time <= left time, per key") {
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 50L, "l3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 90L, "r90"), (1L, 150L, "r150"), (1L, 201L, "r201"),
      (2L, 60L, "r60"))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asofBackward(left, right, Seq("k"),
      $"t", $"t", Map("v" -> "matched"), rightOrd = $"t")
      .select("name", "matched").as[(String, String)].collect().toMap
    assert(got == Map("l1" -> "r90", "l2" -> "r150")) // l3: no right <= 50
  }

  test("exact-time tie matches; equal-time right rows break by rightOrd") {
    val left = Seq((1L, 100L, "l")).toDF("k", "t", "name")
    val right = Seq((1L, 100L, 1L, "first"), (1L, 100L, 2L, "second"))
      .toDF("k", "t", "ord", "v")
    val got = AsOfJoin.asofBackward(left, right, Seq("k"),
      $"t", $"t", Map("v" -> "matched"), rightOrd = $"ord")
      .select("matched").as[String].collect().toSeq
    assert(got == Seq("second"))
  }

  test("struct carry keeps matched columns from one right row") {
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 90L, "a", 9L), (1L, 95L, "b", 5L))
      .toDF("k", "t", "s", "n")
    val got = AsOfJoin.asofBackward(left, right, Seq("k"),
      $"t", $"t", Map("s" -> "ms", "n" -> "mn"), rightOrd = $"t")
      .select("ms", "mn").as[(String, Long)].head()
    assert(got == ("b", 5L))
  }

  test("agrees with brute-force window formulation on real events") {
    val ev = graft.Tables.withTsMicros(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"tus".as("ts_us"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_event"), $"user_id", $"tus", $"value")

    val fast = AsOfJoin.asofBackward(errors, clicks, Seq("user_id"),
      $"ts_us", $"tus", Map("click_event" -> "click_id"), $"click_event")
      .select($"event_id", $"click_id").as[(Long, Long)].collect().toSet

    // brute force: inequality join + keep max (tus, click_event) per error
    val w = Window.partitionBy($"event_id").orderBy($"tus".desc, $"click_event".desc)
    val slow = errors.join(clicks, Seq("user_id"))
      .filter($"tus" <= $"ts_us")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"event_id", $"click_event").as[(Long, Long)].collect().toSet

    assert(fast == slow && fast.nonEmpty)
  }
}
