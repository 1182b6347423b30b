package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Streaming SCD2 face: after folding the twins' upsert contract
  * (latest row per (user, ver) — closed beats open, larger n_events
  * beats smaller), the stream-final history must equal the batch twin
  * (e32) row-for-row — in one big batch and when the stream splits
  * into event-time-ordered batches, where a version can open in batch
  * 1, grow in batch 2, and close in batch 3.
  */
class Scd2Spec extends SparkTestBase {
  import StreamingAnalytics.{Scd2Row, TransEvent}

  private val dir = "/root/testdata/sf0.001"

  private def batchRows: Map[(Long, Long), (String, Long, Long, Long, Boolean)] =
    graft.queries.EventOps.e32Scd2History.fn(spark, dir).collect()
      .map { r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("ver")) ->
          ((r.getAs[String]("state"), r.getAs[Long]("valid_from"),
            r.getAs[Long]("valid_to"), r.getAs[Long]("n_events"),
            r.getAs[Boolean]("is_current")))
      }.toMap

  private def drive(srcDir: String, perTrigger: Option[Int])
      : Map[(Long, Long), (String, Long, Long, Long, Boolean)] = {
    import spark.implicits._
    val reader = spark.readStream
      .schema("user_id long, event_type string, ts_us long, event_id long")
    val withOpt = perTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n))
    val stream = withOpt.parquet(srcDir).as[TransEvent]
    val name = s"scd2_out_${perTrigger.getOrElse(0)}"
    val q = StreamingAnalytics.scd2History(stream)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).as[Scd2Row].collect()
      .groupBy(r => (r.user_id, r.ver)).view.mapValues { rows =>
        // upsert contract: the closed row is final; otherwise the open
        // row with the largest run length is the latest
        val last = rows.find(!_.is_current)
          .getOrElse(rows.maxBy(_.n_events))
        (last.state, last.valid_from, last.valid_to, last.n_events,
          last.is_current)
      }.toMap
  }

  // same slice as the batch twin (e32 restricts to user_id % 10 = 0)
  private def source: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    graft.Tables.withTsMicros(spark.read.parquet(s"$dir/events.parquet"))
      .filter($"user_id" % 10 === 0)
      .select($"user_id", $"event_type", $"tus".as("ts_us"), $"event_id")
  }

  test("single-batch SCD2 history equals the batch twin") {
    val srcDir = tmpDir("scd2src")
    source.coalesce(1).write.mode("overwrite").parquet(srcDir)
    assert(drive(srcDir, None) == batchRows)
  }

  test("versions open, grow, and close across batch boundaries") {
    import spark.implicits._
    val raw = source
    val Array(c1, c2) = raw
      .agg(expr("percentile(ts_us, array(0.33d, 0.66d))")).collect()(0)
      .getSeq[Double](0).toArray
    val srcDir = tmpDir("scd2src3")
    raw.filter($"ts_us" <= c1).coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    Thread.sleep(1100) // distinct mtimes so file listing preserves order
    raw.filter($"ts_us" > c1 && $"ts_us" <= c2).coalesce(1)
      .write.mode("append").parquet(srcDir)
    Thread.sleep(1100)
    raw.filter($"ts_us" > c2).coalesce(1)
      .write.mode("append").parquet(srcDir)
    assert(drive(srcDir, Some(1)) == batchRows)
  }
}
