package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.catalog.Catalog
import graft.sources.bus.BusLog
import graft.streaming.{IncrementalDedup, StatefulV2}

/** Streaming throughput benchmark — the perf signal for the two
  * stateful streaming surfaces (sessionizer, incremental dedup), which
  * the batch `Bench` never exercises. Prints ONE JSON line with
  * events/s, docs/s and per-batch latency.
  *
  * Method: the sf events table is split into time-ordered chunks,
  * landed as one file each, and drained through
  * `StatefulV2.sessionizeWithTimers` under `maxFilesPerTrigger=1` +
  * AvailableNow — every chunk is a micro-batch, mirroring steady-state
  * arrival, with two far-future sentinel batches to flush the trailing
  * timers. Per-batch wall times come from the query's own progress
  * events (`batchDuration`), throughput from total input / drain wall
  * time. The dedup side drives `IncrementalDedup.processBatch` (the
  * foreachBatch body) over document chunks against a fresh catalog.
  */
object StreamBench {

  case class SideResult(rows: Long, wallSec: Double, batches: Int,
      batchSecs: Seq[Double]) {
    def rate: Double = if (wallSec > 0) rows / wallSec else 0.0
    def medianBatchSec: Double =
      if (batchSecs.isEmpty) 0.0
      else batchSecs.sorted.apply(batchSecs.size / 2)
    def json(rowsName: String): String =
      f"""{"$rowsName":$rows,"wall_sec":$wallSec%.3f,"${rowsName}_per_sec":$rate%.1f,""" +
        f""""batches":$batches,"batch_sec_median":$medianBatchSec%.3f}"""
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Drain the events table through the timer sessionizer. */
  def benchSessionize(spark: SparkSession, sfDir: String,
      chunks: Int): SideResult = {
    val srcDir = tmp("sbench-src")
    val ckpt = tmp("sbench-ckpt")
    // ts encoding varies by fixture vintage — resolve adaptively
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = raw.select(col("user_id"), Tables.tsMicros(raw).as("ts_us"))
    // time-ordered chunks, one file per chunk = one micro-batch each
    // (the ntile global sort is harness setup, outside the clock)
    val chunked = ev
      .withColumn("__c", ntile(chunks).over(Window.orderBy("ts_us")))
      .persist()
    val total = chunked.count()
    (1 to chunks).foreach { c =>
      chunked.filter(col("__c") === c).drop("__c")
        .repartition(1).write.mode("append").parquet(srcDir)
    }
    chunked.unpersist()
    val maxTs = ev.agg(max("ts_us")).head().getLong(0)
    // two sentinels: batch N advances the watermark, batch N+1 lets the
    // advanced watermark fire the timers that close trailing sessions
    import spark.implicits._
    Seq(1, 2).foreach { i =>
      Seq((-1L, maxTs + i * 3600000000L)).toDF("user_id", "ts_us")
        .repartition(1).write.mode("append").parquet(srcDir)
    }

    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema("user_id long, ts_us long")
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val t0 = System.nanoTime()
      val q = StatefulV2.sessionizeWithTimers(stream, gapUs = 30L * 60 * 1000 * 1000)
        .writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      SideResult(total, wall, progress.size,
        progress.map(_.batchDuration / 1000.0))
    } finally {
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** Drive IncrementalDedup.processBatch over document chunks. */
  def benchIncrementalDedup(spark: SparkSession, sfDir: String,
      chunks: Int): SideResult = {
    val cat = new Catalog(spark, tmp("sbench-cat"))
    val dd = new IncrementalDedup(cat, threshold = 0.8)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).persist()
    val total = docs.count()
    val batchSecs = (0 until chunks).map { k =>
      val batch = docs.filter(pmod(col("doc_id"), lit(chunks)) === k)
      val t0 = System.nanoTime()
      dd.processBatch(batch, "doc_id", "text", Some(k.toLong))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    docs.unpersist()
    SideResult(total, batchSecs.sum, chunks, batchSecs)
  }

  /** Amortization sweep (round-8 verdict item 4): the same corpus
    * drained at several batch sizes, each against a FRESH state — if
    * per-batch overhead dominates (the r8 observation at toy batches),
    * docs/s must rise with batch size; the phase breakdown says where
    * the fixed cost lives (state_commit = the four catalog appends,
    * constant JOB overhead regardless of batch rows). Prints one JSON
    * line per batch size.
    */
  def benchDedupSweep(spark: SparkSession, sfDir: String,
      chunksList: Seq[Int]): Seq[String] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).persist()
    val total = docs.count()
    val out = chunksList.map { chunks =>
      val cat = new Catalog(spark, tmp("sbench-sweep"))
      val dd = new IncrementalDedup(cat, threshold = 0.8)
      var compute = 0.0
      var commit = 0.0
      val batchSecs = (0 until chunks).map { k =>
        val batch = docs.filter(pmod(col("doc_id"), lit(chunks)) === k)
        val t0 = System.nanoTime()
        dd.processBatch(batch, "doc_id", "text", Some(k.toLong))
          .write.format("noop").mode("overwrite").save()
        compute += dd.lastPhases.getOrElse("compute", 0.0)
        commit += dd.lastPhases.getOrElse("state_commit", 0.0)
        (System.nanoTime() - t0) / 1e9
      }
      val wall = batchSecs.sum
      f"""{"metric":"dedup_sweep","batches":$chunks,""" +
        f""""docs_per_batch":${total / chunks},"docs_per_sec":${total / wall}%.1f,""" +
        f""""wall_sec":$wall%.2f,"compute_sec":$compute%.2f,""" +
        f""""state_commit_sec":$commit%.2f,""" +
        f""""commit_sec_per_batch":${commit / chunks}%.3f,"sf":"$sfDir"}"""
    }
    docs.unpersist()
    out
  }

  /** Publish the events table to a graftbus log from the executors and
    * drain it back through the DSv2 stream — end-to-end bus throughput
    * on both faces. One Spark partition per bus partition on the
    * publish side (repartition = the routing shuffle a real producer
    * layer does), so partition locks never contend.
    */
  def benchBus(spark: SparkSession, sfDir: String,
      busParts: Int): (SideResult, SideResult) = {
    val root = tmp("sbench-bus")
    val ckpt = tmp("sbench-busckpt")
    BusLog.create(root, busParts)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(concat_ws("\u0001", col("event_id"), col("user_id"),
        col("event_type"), col("value").cast("string")).as("v"))
      .repartition(busParts)
      .persist()
    val total = ev.count()
    val t0 = System.nanoTime()
    ev.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val recs = rows.map(r => (0L, r.getString(0))).toSeq
      if (recs.nonEmpty) {
        val p = org.apache.spark.TaskContext.getPartitionId() % busParts
        BusLog.publish(root, p, recs)
      }
      ()
    }
    val pubWall = (System.nanoTime() - t0) / 1e9
    ev.unpersist()

    val t1 = System.nanoTime()
    val parts = split(col("value"), "\u0001")
    val q = spark.readStream.format("graftbus").option("path", root).load()
      .select(parts.getItem(0).cast("long").as("event_id"),
        parts.getItem(1).cast("long").as("user_id"),
        parts.getItem(2).as("event_type"),
        parts.getItem(3).cast("double").as("value"))
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val conWall = (System.nanoTime() - t1) / 1e9
    val progress = q.recentProgress.toSeq.filter(_.numInputRows > 0)
    (SideResult(total, pubWall, busParts, Seq.empty),
      SideResult(total, conWall, progress.size,
        progress.map(_.batchDuration / 1000.0)))
  }

  def run(spark: SparkSession, sfDir: String, sessionChunks: Int = 10,
      dedupChunks: Int = 5, busParts: Int = 8): String = {
    val sess = benchSessionize(spark, sfDir, sessionChunks)
    val dd = benchIncrementalDedup(spark, sfDir, dedupChunks)
    val (pub, con) = benchBus(spark, sfDir, busParts)
    s"""{"metric":"stream_bench","sessionize":${sess.json("events")},""" +
      s""""incremental_dedup":${dd.json("docs")},""" +
      s""""bus_publish":${pub.json("events")},""" +
      s""""bus_consume":${con.json("events")},"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // chunk counts size the micro-batches: small batches measure
    // per-batch overhead (steady trickle), large ones peak throughput
    val sessionChunks = sys.env.getOrElse("SPARK_GRAFT_SESSION_CHUNKS", "10").toInt
    val dedupChunks = sys.env.getOrElse("SPARK_GRAFT_DEDUP_CHUNKS", "5").toInt
    val busParts = sys.env.getOrElse("SPARK_GRAFT_BUS_PARTS", "8").toInt
    // SPARK_GRAFT_DEDUP_SWEEP=50,10,2,1 runs ONLY the amortization sweep
    sys.env.get("SPARK_GRAFT_DEDUP_SWEEP") match {
      case Some(spec) =>
        benchDedupSweep(spark, sfDir, spec.split(",").map(_.trim.toInt).toSeq)
          .foreach(println)
      case None =>
        println(run(spark, sfDir, sessionChunks, dedupChunks, busParts))
    }
    spark.stop()
  }
}
