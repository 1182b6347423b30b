package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Streaming transition face: folded edge counts must equal the batch
  * twin (e23) exactly — per (prev_type, event_type) cell — both in one
  * big batch and when the stream is split into event-time-ordered
  * batches (the cross-batch state handoff: each user's last event
  * must link to their first event of the next batch).
  */
class TransitionsSpec extends SparkTestBase {
  import StreamingAnalytics.{TransEvent, Transition}

  private val dir = "/root/testdata/sf0.001"

  private def batchCells: Map[(String, String), Long] =
    graft.queries.EventOps.e23MarkovTransitions.fn(spark, dir).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("n")).toMap

  private def drive(srcDir: String, perTrigger: Option[Int])
      : Map[(String, String), Long] = {
    import spark.implicits._
    val reader = spark.readStream
      .schema("user_id long, event_type string, ts_us long, event_id long")
    val withOpt = perTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n))
    val stream = withOpt.parquet(srcDir).as[TransEvent]
    val name = s"trans_out_${perTrigger.getOrElse(0)}"
    val q = StreamingAnalytics.transitions(stream)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).as[Transition].collect()
      .groupBy(t => (t.prev_type, t.event_type))
      .view.mapValues(_.length.toLong).toMap
  }

  test("single-batch edge counts equal the batch transition matrix") {
    import spark.implicits._
    val raw = graft.Tables.withTsMicros(
        spark.read.parquet(s"$dir/events.parquet"))
      .select($"user_id", $"event_type", $"tus".as("ts_us"), $"event_id")
    val srcDir = tmpDir("transsrc")
    raw.coalesce(1).write.mode("overwrite").parquet(srcDir)
    assert(drive(srcDir, None) == batchCells)
  }

  test("cross-batch state handoff links last-of-batch to first-of-next") {
    import spark.implicits._
    val raw = graft.Tables.withTsMicros(
        spark.read.parquet(s"$dir/events.parquet"))
      .select($"user_id", $"event_type", $"tus".as("ts_us"), $"event_id")
    val cut = raw.agg(expr("percentile(ts_us, 0.5d)")).collect()(0).getDouble(0)
    val srcDir = tmpDir("transsrc2")
    // two files in event-time order; maxFilesPerTrigger=1 => two batches
    raw.filter($"ts_us" <= cut).coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    Thread.sleep(1100) // distinct mtimes so file listing preserves order
    raw.filter($"ts_us" > cut).coalesce(1)
      .write.mode("append").parquet(srcDir)
    assert(drive(srcDir, Some(1)) == batchCells)
  }
}
