package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Streaming session-path face: folded trigram counts must equal the
  * batch twin (e27) exactly, both in one big batch and when the stream
  * is split into event-time-ordered batches (the cross-batch handoff:
  * a user's last TWO events must chain into their next batch, and a
  * session gap at the batch boundary must still reset the chain).
  */
class PathTrigramsSpec extends SparkTestBase {
  import StreamingAnalytics.{PathTrigram, TransEvent}

  private val dir = "/root/testdata/sf0.001"

  private def batchPaths: Map[String, Long] =
    graft.queries.EventOps.e27SessionPaths.fn(spark, dir).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("n")).toMap

  private def drive(srcDir: String, perTrigger: Option[Int])
      : Map[String, Long] = {
    import spark.implicits._
    val reader = spark.readStream
      .schema("user_id long, event_type string, ts_us long, event_id long")
    val withOpt = perTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n))
    val stream = withOpt.parquet(srcDir).as[TransEvent]
    val name = s"paths_out_${perTrigger.getOrElse(0)}"
    val q = StreamingAnalytics.pathTrigrams(stream)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).as[PathTrigram].collect()
      .groupBy(_.path).view.mapValues(_.length.toLong).toMap
  }

  private def source: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    graft.Tables.withTsMicros(spark.read.parquet(s"$dir/events.parquet"))
      .select($"user_id", $"event_type", $"tus".as("ts_us"), $"event_id")
  }

  test("single-batch trigram counts equal the batch session paths") {
    val srcDir = tmpDir("pathsrc")
    source.coalesce(1).write.mode("overwrite").parquet(srcDir)
    assert(drive(srcDir, None) == batchPaths)
  }

  test("cross-batch chain handoff preserves trigrams and session resets") {
    import spark.implicits._
    val raw = source
    val cut = raw.agg(expr("percentile(ts_us, 0.5d)")).collect()(0).getDouble(0)
    val srcDir = tmpDir("pathsrc2")
    // two files in event-time order; maxFilesPerTrigger=1 => two batches
    raw.filter($"ts_us" <= cut).coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    Thread.sleep(1100) // distinct mtimes so file listing preserves order
    raw.filter($"ts_us" > cut).coalesce(1)
      .write.mode("append").parquet(srcDir)
    assert(drive(srcDir, Some(1)) == batchPaths)
  }
}
