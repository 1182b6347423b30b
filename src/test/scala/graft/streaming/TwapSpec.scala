package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Streaming TWAP face: the stateful gap extractor's stream-final
  * output, aggregated through the SAME twapFromGaps the batch query
  * runs, must equal e34 row-for-row — in one big batch and when
  * holding intervals span event-time-ordered batch boundaries. Plus
  * the exactness contract the round-9 advice flagged: a value×gap
  * product that overflows long arithmetic must still be exact
  * (decimal-widened before the multiply), end-to-end through the real
  * e34 query on a crafted fixture.
  */
class TwapSpec extends SparkTestBase {
  import StreamingAnalytics.{TwapEvent, TwapGap}

  private val dir = "/root/testdata/sf0.001"

  private def batchRows: Seq[(String, Long, Double)] =
    graft.queries.EventOps.e34Twap.fn(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_gaps"),
        r.getAs[Double]("twap"))).toSeq

  private def source: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    graft.Tables.withTsMicros(spark.read.parquet(s"$dir/events.parquet"))
      .select($"user_id", $"event_type", $"tus".as("ts_us"), $"event_id",
        ($"value".cast("decimal(14,2)") * 100).cast("long").as("cents"))
  }

  private def drive(srcDir: String): Seq[(String, Long, Double)] = {
    import spark.implicits._
    val stream = spark.readStream
      .schema("user_id long, event_type string, ts_us long, event_id long, cents long")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir).as[TwapEvent]
    val name = s"twap_out_${System.nanoTime()}"
    val q = StreamingAnalytics.twapGaps(stream)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    StreamingAnalytics.twapFromGaps(spark.table(name)).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_gaps"),
        r.getAs[Double]("twap"))).toSeq
  }

  test("single-batch stream TWAP equals the batch twin bit-for-bit") {
    val srcDir = tmpDir("twapsrc")
    source.coalesce(1).write.mode("overwrite").parquet(srcDir)
    assert(drive(srcDir) == batchRows)
  }

  test("holding intervals spanning batch boundaries close exactly once") {
    import spark.implicits._
    val raw = source
    val Array(c1, c2) = raw
      .agg(expr("percentile(ts_us, array(0.33d, 0.66d))")).collect()(0)
      .getSeq[Double](0).toArray
    val srcDir = tmpDir("twapsrc3")
    raw.filter($"ts_us" <= c1).coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    Thread.sleep(1100) // distinct mtimes so file listing preserves order
    raw.filter($"ts_us" > c1 && $"ts_us" <= c2).coalesce(1)
      .write.mode("append").parquet(srcDir)
    Thread.sleep(1100)
    raw.filter($"ts_us" > c2).coalesce(1)
      .write.mode("append").parquet(srcDir)
    assert(drive(srcDir) == batchRows)
  }

  test("decimal-widened products survive a long-overflowing value×gap") {
    import spark.implicits._
    // cents₁·gap₁ = 2·10¹⁹ > Long.Max — long math silently wraps, the
    // decimal path must not
    val c1 = 10000000L; val g1 = 2000000000000L
    val c2 = 5000000L; val g2 = 1000000000000L
    val got = StreamingAnalytics.twapFromGaps(
      Seq(("purchase", c1, g1), ("purchase", c2, g2))
        .toDF("event_type", "cents", "gap_us")).collect()
    val expected = (BigDecimal(c1) * g1 + BigDecimal(c2) * g2).toDouble /
      (BigDecimal(g1) + BigDecimal(g2)).toDouble / 100.0
    assert(got.length == 1 && got(0).getAs[Long]("n_gaps") == 2L &&
      got(0).getAs[Double]("twap") == expected)
  }

  test("e34 end-to-end: overflowing interval + last-event exclusion") {
    import spark.implicits._
    // ts carried as long NANOS (the fixture's nanosAsLong encoding)
    def ev(id: Long, tsUs: Long, user: Long, tpe: String, v: Double) =
      (id, tsUs * 1000L, user, tpe, v, "{}")
    val events = Seq(
      ev(1L, 0L, 1L, "purchase", 100000.0),
      ev(2L, 2000000000000L, 1L, "purchase", 50000.0),
      // the user's last event: value never weighted, only closes g2
      ev(3L, 3000000000000L, 1L, "purchase", 77777.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val fixDir = tmpDir("twapfix")
    events.coalesce(1).write.mode("overwrite")
      .parquet(s"$fixDir/events.parquet")
    val got = graft.queries.EventOps.e34Twap.fn(spark, fixDir).collect()
    val expected = (BigDecimal(10000000L) * 2000000000000L +
        BigDecimal(5000000L) * 1000000000000L).toDouble /
      BigDecimal(3000000000000L).toDouble / 100.0
    assert(got.length == 1 && got(0).getAs[Long]("n_gaps") == 2L &&
      got(0).getAs[Double]("twap") == expected)
  }
}
