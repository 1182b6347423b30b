package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Streaming bounded-funnel face: the LATEST emitted row per user must
  * equal the batch twin (e29) row-for-row — in one big batch and when
  * the stream splits into event-time-ordered batches (a stage can open
  * in batch 1 and convert in batch 2; the 24 h window must still be
  * enforced across the boundary).
  */
class FunnelSpec extends SparkTestBase {
  import StreamingAnalytics.{FunnelRow, TransEvent}

  private val dir = "/root/testdata/sf0.001"

  private def batchRows: Map[Long, (Long, Option[Long], Option[Long], Option[Long])] =
    graft.queries.EventOps.e29BoundedFunnel.fn(spark, dir).collect()
      .map { r =>
        def opt(c: String) =
          if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c))
        r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("stage"), opt("view_us"), opt("click_us"), opt("purchase_us")))
      }.toMap

  private def drive(srcDir: String, perTrigger: Option[Int])
      : Map[Long, (Long, Option[Long], Option[Long], Option[Long])] = {
    import spark.implicits._
    val reader = spark.readStream
      .schema("user_id long, event_type string, ts_us long, event_id long")
    val withOpt = perTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n))
    val stream = withOpt.parquet(srcDir).as[TransEvent]
    val name = s"funnel_out_${perTrigger.getOrElse(0)}"
    val q = StreamingAnalytics.funnelStages(stream)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // latest row per user = max stage (stage is monotone per user)
    spark.table(name).as[FunnelRow].collect()
      .groupBy(_.user_id).view.mapValues { rows =>
        val last = rows.maxBy(_.stage)
        (last.stage, last.view_us, last.click_us, last.purchase_us)
      }.toMap
  }

  private def source: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    graft.Tables.withTsMicros(spark.read.parquet(s"$dir/events.parquet"))
      .select($"user_id", $"event_type", $"tus".as("ts_us"), $"event_id")
  }

  test("single-batch funnel positions equal the batch bounded funnel") {
    val srcDir = tmpDir("funnelsrc")
    source.coalesce(1).write.mode("overwrite").parquet(srcDir)
    assert(drive(srcDir, None) == batchRows)
  }

  test("stages open and convert across batch boundaries") {
    import spark.implicits._
    val raw = source
    val cut = raw.agg(expr("percentile(ts_us, 0.5d)")).collect()(0).getDouble(0)
    val srcDir = tmpDir("funnelsrc2")
    raw.filter($"ts_us" <= cut).coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    Thread.sleep(1100) // distinct mtimes so file listing preserves order
    raw.filter($"ts_us" > cut).coalesce(1)
      .write.mode("append").parquet(srcDir)
    assert(drive(srcDir, Some(1)) == batchRows)
  }
}
