package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.sources.bus.BusLog

/** Crash-fault injection for the two two-phase commit protocols
  * (round-8 verdict item 3): kill each one BETWEEN its stage and its
  * visibility flip and prove (a) readers keep serving the last good
  * state, (b) restart/replay publishes nothing twice, (c) the next
  * successful commit is unaffected by the wreckage.
  *
  * Catalog: data dir + manifest materialize first, then the one-line
  * `_current` pointer flips (Catalog.scala commit/appendLog). BusWrite:
  * task writers stage under `.staging/`, the driver renames staged
  * files into live segments, streaming commits then append the epoch
  * ledger (BusWrite.scala commit protocol).
  */
class CrashFaultSpec extends SparkTestBase {
  import spark.implicits._

  test("appendLog crash after manifest, before pointer flip: last version stays live") {
    val root = tmpDir("crash_alog")
    val cat = new Catalog(spark, root)
    cat.appendLog("log", Seq(1L, 2L).toDF("id"))
    // simulate the dead writer: a COMPLETE staged commit (parquet with
    // _SUCCESS, manifest referencing itself + the live refs) whose
    // pointer flip never happened. Version name sorts NEWEST.
    val orphan = s"v9999999999999_deadcafe"
    val dir = Paths.get(root, "log", orphan)
    Seq(99L).toDF("id").write.mode("overwrite").parquet(dir.toString)
    val manifest =
      s"""{"schemaDDL":"id BIGINT","buckets":{"0":"$orphan"}}"""
    Files.writeString(dir.resolve("_manifest.json"), manifest)
    // pointer still names the good version: readers never see row 99
    assert(cat.read("log").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // the next append commits exactly its batch — the crashed batch is
    // not resurrected into the manifest chain
    cat.appendLog("log", Seq(3L).toDF("id"))
    assert(cat.read("log").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("half-staged pointer tmp files are inert; a missing pointer falls back") {
    val root = tmpDir("crash_ptr")
    val cat = new Catalog(spark, root)
    cat.overwrite("t", Seq(("a", 1L)).toDF("k", "v"))
    cat.overwrite("t", Seq(("a", 2L)).toDF("k", "v"))
    // crash between tmp-pointer create and rename leaves `._current.tmp*`
    Files.writeString(Paths.get(root, "t", "._current.tmpdead1234"),
      "vGARBAGE_NOT_A_VERSION")
    assert(cat.read("t").as[(String, Long)].head() == ("a", 2L))
    // legacy two-step crash window: pointer deleted, rename never ran —
    // the newest COMMITTED version must serve (Catalog.scala fallback)
    Files.delete(Paths.get(root, "t", "_current"))
    assert(cat.read("t").as[(String, Long)].head() == ("a", 2L))
    // and the table still takes commits afterwards
    cat.overwrite("t", Seq(("a", 3L)).toDF("k", "v"))
    assert(cat.read("t").as[(String, Long)].head() == ("a", 3L))
  }

  test("bus: staged-but-uncommitted files publish nothing, ever") {
    val root = tmpDir("crash_bus")
    BusLog.create(root, 1)
    BusLog.publish(root, 0, Seq((1000L, "live1")))
    // simulate tasks that staged and a driver that died before the
    // rename pass: segment-format files sitting in .staging
    val staging = Paths.get(root, ".staging")
    Files.createDirectories(staging)
    Files.writeString(staging.resolve("stage-dead-1"),
      "0\t" + java.util.Base64.getEncoder.encodeToString(
        "ghost".getBytes(StandardCharsets.UTF_8)) + "\n")
    def values() = spark.read.format("graftbus").option("path", root).load()
      .select($"value").as[String].collect().sorted.toSeq
    assert(values() == Seq("live1"))
    // later successful publishes are unaffected and never sweep the
    // ghost into a live segment
    Seq((0, 0L, 0, new java.sql.Timestamp(0L), "live2"))
      .toDF("partition", "seq", "idx", "ts", "value")
      .write.format("graftbus").option("path", root).mode("append").save()
    assert(values() == Seq("live1", "live2"))
  }

  test("bus: epoch replayed after a lost commit marker publishes nothing twice") {
    val root = tmpDir("crash_epoch")
    val src = tmpDir("crash_epoch_src")
    val ckpt = tmpDir("crash_epoch_ckpt")
    BusLog.create(root, 1)
    Files.writeString(Paths.get(src, "a.json"),
      """{"v":"r1"}""" + "\n" + """{"v":"r2"}""" + "\n")
    def drain(): Unit = {
      val q = spark.readStream.schema("v string").json(src)
        .select(lit(0).as("partition"), lit(0L).as("seq"), lit(0).as("idx"),
          lit(new java.sql.Timestamp(0L)).as("ts"), $"v".as("value"))
        .writeStream.format("graftbus")
        .option("path", root).option("writerId", "crash_writer")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    // crash window: the sink committed (segments live, epoch in the
    // ledger) but the QUERY died before writing its commit marker —
    // Spark's restart contract re-executes the whole epoch. Simulate by
    // deleting the checkpoint's commit record for batch 0.
    val marker = Paths.get(ckpt, "commits", "0")
    assert(Files.exists(marker), s"expected commit marker at $marker")
    Files.delete(marker)
    // the local ChecksumFileSystem keeps a .crc sidecar; a real crash
    // loses both (the marker write is one atomic rename)
    Files.deleteIfExists(Paths.get(ckpt, "commits", ".0.crc"))
    drain() // re-runs epoch 0: the ledger must swallow the replay
    val got = spark.read.format("graftbus").option("path", root).load()
      .select($"value").as[String].collect().sorted.toSeq
    assert(got == Seq("r1", "r2"), s"replay duplicated records: $got")
  }
}
