package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.catalog.Catalog
import graft.model.ProcessedFile
import graft.notify.InMemoryNotifier
import graft.pipeline.Pipeline
import graft.sources.bus.{BusLog, BusOffset}
import graft.streaming.StreamingPipeline

/** The graftbus DSv2 source: batch==stream totality, exactly-once across
  * a checkpointed restart, concurrent-publisher seq allocation, offset
  * codec round-trip, and the approval pipeline consuming from the bus.
  */
class BusSourceSpec extends SparkTestBase {
  import spark.implicits._

  test("offset json round-trips") {
    val o = BusOffset(Map(0 -> 5L, 3 -> 17L, 12 -> 0L))
    assert(BusOffset.fromJson(o.json()) == o)
    assert(BusOffset.fromJson(BusOffset(Map.empty).json()) == BusOffset(Map.empty))
  }

  test("batch read sees every published record exactly once") {
    val root = tmpDir("bus_b")
    BusLog.create(root, 3)
    BusLog.publish(root, 0, Seq((1000L, "a0"), (2000L, "a1")))
    BusLog.publish(root, 1, Seq((1500L, "b0")))
    BusLog.publish(root, 0, Seq((3000L, "a2")))
    val got = spark.read.format("graftbus").option("path", root).load()
      .select($"partition", $"seq", $"idx", $"value")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(got == Set((0, 1L, 0, "a0"), (0, 1L, 1, "a1"), (1, 1L, 0, "b0"),
      (0, 2L, 0, "a2")))
  }

  test("partition and seq filters prune the batch scan at planning time") {
    val root = tmpDir("bus_pd")
    BusLog.create(root, 3)
    BusLog.publish(root, 0, Seq((1000L, "a0")))
    BusLog.publish(root, 1, Seq((1500L, "b0")))
    BusLog.publish(root, 1, Seq((2500L, "b1")))
    BusLog.publish(root, 2, Seq((1700L, "c0")))
    // poison partition 2's only segment and partition 1's seq 1: any
    // scan that still READS them throws on decode — so a green filtered
    // read is behavioral proof the pruning reached planInputPartitions,
    // not just a post-scan filter
    Files.write(Paths.get(root, "p00002",
      "00000000000000000001.log"), "not\tvalid-base64!!!\n".getBytes)
    Files.write(Paths.get(root, "p00001",
      "00000000000000000001.log"), "not\tvalid-base64!!!\n".getBytes)
    def bus = spark.read.format("graftbus").option("path", root).load()
    // unpruned read really does hit the poison
    intercept[org.apache.spark.SparkException] { bus.collect() }
    // partition pruning skips p2 entirely; seq pruning skips p1's seq 1
    val got = bus.filter($"partition".isin(0, 1) && $"seq" > 1)
      .select($"partition", $"value").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "b1")))
    val eq = bus.filter($"partition" === 0 && $"seq" === 1)
      .select($"value").as[String].collect().toSeq
    assert(eq == Seq("a0"))
  }

  test("column pruning narrows the scan output to the selected fields") {
    val root = tmpDir("bus_cp")
    BusLog.create(root, 1)
    BusLog.publish(root, 0, Seq((1000L, "x"), (2000L, "y")))
    val df = spark.read.format("graftbus").option("path", root).load()
      .select($"value")
    val scanOutput = df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.output.map(_.name))
    assert(scanOutput == Seq("value"), s"scan emits $scanOutput")
    assert(df.as[String].collect().sorted.toSeq == Seq("x", "y"))
  }

  test("stream equals batch and restart is exactly-once (no dups, no loss)") {
    val root = tmpDir("bus_s")
    val out = tmpDir("bus_out")
    val ckpt = tmpDir("bus_ckpt")
    BusLog.create(root, 2)
    BusLog.publish(root, 0, Seq((1000L, "x1"), (1000L, "x2")))
    BusLog.publish(root, 1, Seq((1000L, "y1")))

    def drain(): Unit = {
      val q = spark.readStream.format("graftbus").option("path", root).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    // second wave lands after the first checkpointed drain
    BusLog.publish(root, 0, Seq((2000L, "x3")))
    BusLog.publish(root, 1, Seq((2000L, "y2"), (2000L, "y3")))
    drain()
    // a third drain with nothing new must add nothing (replay safety)
    drain()

    val streamed = spark.read.parquet(out)
      .select($"partition", $"seq", $"idx", $"value").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getString(3)))
    assert(streamed.length == 6, "restart must not duplicate or drop records")
    val batch = spark.read.format("graftbus").option("path", root).load()
      .select($"partition", $"seq", $"idx", $"value").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getString(3)))
    assert(streamed.toSet == batch.toSet)
  }

  test("concurrent publishers to one partition allocate distinct seqs") {
    val root = tmpDir("bus_c")
    BusLog.create(root, 1)
    val threads = (1 to 4).map { t =>
      new Thread(() => (1 to 5).foreach { i =>
        BusLog.publish(root, 0, Seq((i.toLong, s"t$t-$i")))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(BusLog.latestSeqs(root)(0) == 20L)
    val n = spark.read.format("graftbus").option("path", root).load().count()
    assert(n == 20L)
  }

  test("maxSegmentsPerTrigger bounds each micro-batch; AvailableNow still drains all") {
    val root = tmpDir("bus_adm")
    val out = tmpDir("bus_adm_out")
    val ckpt = tmpDir("bus_adm_ckpt")
    BusLog.create(root, 1)
    (1 to 5).foreach(i => BusLog.publish(root, 0, Seq((i.toLong, s"r$i"))))
    val q = spark.readStream.format("graftbus").option("path", root)
      .option("maxSegmentsPerTrigger", "2").load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.toSeq.filter(_.numInputRows > 0)
    assert(batches.size == 3, s"5 segments / cap 2 = 3 batches, got ${batches.size}")
    assert(batches.map(_.numInputRows).sum == 5)
    assert(spark.read.parquet(out).count() == 5)
  }

  test("vacuum during an active stream: consumed segments reclaimed, drain continues exactly-once") {
    // the r13 verdict item-6 cadence: a long-lived consumer vacuums
    // its committed watermark WHILE the stream stays up — later
    // triggers must keep draining fresh segments with nothing
    // duplicated or dropped, and the log stays bounded
    val root = tmpDir("bus_vs")
    val out = tmpDir("bus_vs_out")
    val ckpt = tmpDir("bus_vs_ckpt")
    BusLog.create(root, 1)
    (1 to 3).foreach(i => BusLog.publish(root, 0, Seq((i.toLong, s"r$i"))))
    def drain(): Unit = {
      val q = spark.readStream.format("graftbus").option("path", root)
        .option("maxSegmentsPerTrigger", "1").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain() // commits seqs 1-3
    // vacuum the committed watermark while the consumer lives on (the
    // checkpoint holds offset 3); the log is now bounded at zero
    BusLog.vacuum(root, Map(0 -> 3L))
    assert(BusLog.segmentCounts(root)(0) == 0L)
    // fresh publishes land PAST the vacuumed range (hwm pins the seqs)
    (4 to 5).foreach(i => BusLog.publish(root, 0, Seq((i.toLong, s"r$i"))))
    drain() // resumes from the checkpoint, reads only 4-5
    val got = spark.read.parquet(out)
      .select($"seq", $"value").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == (1 to 5).map(i => (i.toLong, s"r$i")),
      s"vacuum mid-stream must not duplicate or drop: $got")
    // and the tail stays bounded under a continuing cadence
    BusLog.vacuum(root, Map(0 -> 5L))
    assert(BusLog.segmentCounts(root)(0) == 0L)
    assert(BusLog.publish(root, 0, Seq((6L, "r6"))) == 6L)
  }

  test("vacuum deletes consumed segments but never reallocates their seqs") {
    val root = tmpDir("bus_v")
    BusLog.create(root, 1)
    BusLog.publish(root, 0, Seq((1L, "s1")))
    BusLog.publish(root, 0, Seq((2L, "s2")))
    BusLog.publish(root, 0, Seq((3L, "s3")))
    BusLog.vacuum(root, Map(0 -> 2L))
    val left = spark.read.format("graftbus").option("path", root).load()
      .select($"seq", $"value").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(left.toSeq == Seq((3L, "s3")))
    // a fully vacuumed partition still advances, never reuses seqs
    BusLog.vacuum(root, Map(0 -> 3L))
    assert(BusLog.latestSeqs(root)(0) == 3L)
    assert(BusLog.publish(root, 0, Seq((4L, "s4"))) == 4L)
  }

  test("batch write publishes through the two-phase commit") {
    val root = tmpDir("bus_w")
    BusLog.create(root, 2)
    val df = Seq(
      (0, 0L, 0, new java.sql.Timestamp(1000L), "w1"),
      (1, 0L, 0, new java.sql.Timestamp(2000L), "w2"),
      (0, 0L, 0, new java.sql.Timestamp(3000L), "w3")
    ).toDF("partition", "seq", "idx", "ts", "value")
    df.write.format("graftbus").option("path", root).mode("append").save()
    val got = spark.read.format("graftbus").option("path", root).load()
      .select($"partition", $"value").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((0, "w1"), (0, "w3"), (1, "w2")))
    // staging area drained
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, ".staging")) ||
      java.nio.file.Files.list(
        java.nio.file.Paths.get(root, ".staging")).count() == 0)
  }

  test("streaming write commits epochs idempotently (replay publishes nothing)") {
    val root = tmpDir("bus_sw")
    val src = tmpDir("bus_sw_src")
    val ckpt = tmpDir("bus_sw_ckpt")
    BusLog.create(root, 1)
    def land(name: String, rows: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(src, name)
      java.nio.file.Files.writeString(p,
        rows.map(v => s"""{"v":"$v"}""").mkString("", "\n", "\n"))
    }
    land("a.json", Seq("s1", "s2"))
    def drain(): Unit = {
      val q = spark.readStream.schema("v string").json(src)
        .select(lit(0).as("partition"), lit(0L).as("seq"), lit(0).as("idx"),
          lit(new java.sql.Timestamp(0L)).as("ts"), $"v".as("value"))
        .writeStream.format("graftbus")
        .option("path", root).option("writerId", "spec_writer")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    land("b.json", Seq("s3"))
    drain()
    drain() // nothing new: must publish nothing
    val got = spark.read.format("graftbus").option("path", root).load()
      .select($"value").collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("s1", "s2", "s3"), got.mkString(","))
  }

  test("approval pipeline consumes from the bus end to end") {
    val landing = tmpDir("bus_landing")
    val notifier = new InMemoryNotifier
    val pipeline = new Pipeline(spark, new Catalog(spark, tmpDir("bus_wh")), notifier, landing)
    val sp = new StreamingPipeline(spark, pipeline, tmpDir("bus_ckpt2"))

    val p = Paths.get(landing, "b1/insert/customers.csv")
    Files.createDirectories(p.getParent)
    Files.writeString(p, "customer_id,name\n1,alice\n2,bob\n")
    pipeline.registerArrivals(Seq(graft.model.FileEvent("b1", "insert/customers.csv", "ev1")))

    val bus = tmpDir("bus_appr")
    BusLog.create(bus, 2)
    val approval =
      """{"event_id":"ev1","action":"approve","file_name":"insert/customers.csv","table_name":"customers","operation":"insert","bucket":"b1","file_version":1}"""
    // duplicate delivery on another partition — event_id dedup absorbs it
    BusLog.publish(bus, 0, Seq((1000L, approval)))
    BusLog.publish(bus, 1, Seq((1001L, approval)))
    val q = sp.startApprovalsFromBus(bus)
    q.awaitTermination()

    assert(pipeline.catalog.read("customers").count() == 2)
    val done = pipeline.catalog.read(pipeline.ControlTable).as[ProcessedFile].head()
    assert(done.status == "approved" && done.is_processed)
    assert(notifier.sent.count(_.subject.contains("SUCCESS")) == 1)
  }
}
