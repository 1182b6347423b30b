package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Streaming rate-anomaly face: the stateful operator's emitted
  * z-scores must equal a prequential recomputation from the hourly
  * count series (each hour judged only by the hours closed before
  * it), and trailing still-open hours must stay unemitted.
  */
class RateAnomalySpec extends SparkTestBase {
  import StreamingAnalytics.{RateEvent, RateScore}

  test("prequential z-scores match; trailing open hours stay in state") {
    import spark.implicits._
    val lateness = 2
    val hourUs = 3600L * 1000 * 1000
    val raw = graft.Tables.withTsMicros(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .select($"event_type", $"tus".as("ts_us"))
    val srcDir = tmpDir("ratesrc")
    raw.write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream
      .schema("event_type string, ts_us long").parquet(srcDir)
      .as[RateEvent]
    val scored = StreamingAnalytics.rateAnomalies(stream, lateness)
    val q = scored.writeStream.outputMode("append")
      .format("memory").queryName("rate_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("rate_out").as[RateScore].collect()
      .map(r => (r.event_type, r.hour_us) -> ((r.n, r.z, r.anomaly))).toMap

    // independent prequential recomputation from plain hourly counts
    val hourly = raw.withColumn("h", $"ts_us" / hourUs)
      .groupBy($"event_type", $"h".cast("long").as("h"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
    val expected = hourly.groupBy(_._1).toSeq.flatMap { case (tpe, rows) =>
      val series = rows.toSeq.map(r => (r._2, r._3)).sortBy(_._1)
      val maxHour = series.map(_._1).max
      var (nh, s, ss) = (0L, 0L, 0L)
      series.map { case (h, n) =>
        val z =
          if (nh > 1) {
            val varr = (ss.toDouble - s.toDouble * s.toDouble / nh) / (nh - 1)
            if (varr > 0.0) (n.toDouble - s.toDouble / nh) / math.sqrt(varr)
            else 0.0
          } else 0.0
        nh += 1; s += n; ss += n * n
        (h < maxHour - lateness, (tpe, h * hourUs) -> ((n, z, math.abs(z) >= 2.0)))
      }.filter(_._1).map(_._2)
    }.toMap

    assert(got.nonEmpty)
    assert(got.keySet == expected.keySet,
      s"closed-hour sets differ: got ${got.size}, want ${expected.size}")
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"mismatch at $k: got ${got(k)}, want $v")
    }
  }
}
