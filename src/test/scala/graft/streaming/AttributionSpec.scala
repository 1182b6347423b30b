package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Streaming last-touch attribution: every emitted purchase row must
  * equal the batch twin (e30) — single batch and across event-time-
  * ordered batch splits (a view in batch 1 attributes a purchase in
  * batch 2; the 7 d window holds across the boundary).
  */
class AttributionSpec extends SparkTestBase {
  import StreamingAnalytics.{AttribRow, TransEvent}

  private val dir = "/root/testdata/sf0.001"

  private def batchRows: Map[(Long, Long), (Long, Option[Long], Boolean)] =
    graft.queries.EventOps.e30Attribution.fn(spark, dir).collect()
      .map { r =>
        val att = if (r.isNullAt(r.fieldIndex("att_view_us"))) None
          else Some(r.getAs[Long]("att_view_us"))
        (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
          ((r.getAs[Long]("purchase_us"), att, r.getAs[Boolean]("attributed")))
      }.toMap

  private def drive(srcDir: String, perTrigger: Option[Int])
      : Map[(Long, Long), (Long, Option[Long], Boolean)] = {
    import spark.implicits._
    val reader = spark.readStream
      .schema("user_id long, event_type string, ts_us long, event_id long")
    val withOpt = perTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n))
    val stream = withOpt.parquet(srcDir).as[TransEvent]
    val name = s"attrib_out_${perTrigger.getOrElse(0)}"
    val q = StreamingAnalytics.lastTouchAttribution(stream)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).as[AttribRow].collect()
      .map(r => (r.user_id, r.event_id) ->
        ((r.purchase_us, r.att_view_us, r.attributed))).toMap
  }

  private def source: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    graft.Tables.withTsMicros(spark.read.parquet(s"$dir/events.parquet"))
      .select($"user_id", $"event_type", $"tus".as("ts_us"), $"event_id")
  }

  test("single-batch attribution equals the batch RANGE-frame twin") {
    val srcDir = tmpDir("attribsrc")
    source.coalesce(1).write.mode("overwrite").parquet(srcDir)
    assert(drive(srcDir, None) == batchRows)
  }

  test("views attribute purchases across batch boundaries") {
    import spark.implicits._
    val raw = source
    val cut = raw.agg(expr("percentile(ts_us, 0.5d)")).collect()(0).getDouble(0)
    val srcDir = tmpDir("attribsrc2")
    raw.filter($"ts_us" <= cut).coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    Thread.sleep(1100) // distinct mtimes so file listing preserves order
    raw.filter($"ts_us" > cut).coalesce(1)
      .write.mode("append").parquet(srcDir)
    assert(drive(srcDir, Some(1)) == batchRows)
  }
}
