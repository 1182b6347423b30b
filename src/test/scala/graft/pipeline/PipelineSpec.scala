package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.catalog.Catalog
import graft.model._
import graft.notify.InMemoryNotifier

/** End-to-end scenarios mirroring SURVEY §3's E1→E3→E4 lifecycle against
  * golden expectations (SURVEY §5.2).
  */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def freshPipeline(): (Pipeline, InMemoryNotifier, String) = {
    val landing = tmpDir("landing")
    val notifier = new InMemoryNotifier
    val p = new Pipeline(spark, new Catalog(spark, tmpDir("wh")), notifier, landing)
    (p, notifier, landing)
  }

  private def land(landing: String, bucket: String, path: String, csv: String): Unit = {
    val f = Paths.get(landing, bucket, path)
    Files.createDirectories(f.getParent)
    Files.writeString(f, csv)
  }

  private def approval(eventId: String, action: String, op: String,
      file: String = "customers.csv", table: String = "customers") =
    ApprovalEvent(eventId, action, s"$op/$file", table, op, "b1",
      Some(1L), None, Some("2026-01-02T03:04:05Z"), Some("1.2.3.4"))

  test("E1+E3: insert flow creates all-string table, loads rows, approves") {
    val (p, notifier, landing) = freshPipeline()
    land(landing, "b1", "insert/customers.csv",
      "customer_id,name,balance\n1,alice,10.5\n2,bob,20\n")

    val v = p.registerArrival(FileEvent("b1", "insert/customers.csv", "ev1"))
    assert(v.contains(1L))
    val pending = p.catalog.read(p.ControlTable).as[ProcessedFile].collect()
    assert(pending.length == 1 && pending.head.status == Status.Pending
      && !pending.head.is_processed)
    assert(notifier.sent.length == 1 &&
      notifier.sent.head.subject.contains("Approval Required: INSERT"))

    p.processApproval(approval("ev1", "approve", "insert"))
    val t = p.catalog.read("customers")
    assert(t.schema.fields.forall(_.dataType.typeName == "string")) // all-TEXT parity
    assert(t.as[(String, String, String)].collect().toSet ==
      Set(("1", "alice", "10.5"), ("2", "bob", "20")))
    val done = p.catalog.read(p.ControlTable).as[ProcessedFile].head()
    assert(done.status == Status.Approved && done.is_processed)
    assert(notifier.sent.last.subject.contains("Operation SUCCESS"))
  }

  test("duplicate event_id is skipped (idempotency O8/O19)") {
    val (p, notifier, landing) = freshPipeline()
    land(landing, "b1", "insert/customers.csv", "customer_id,name\n1,a\n")
    p.registerArrival(FileEvent("b1", "insert/customers.csv", "ev1"))
    p.processApproval(approval("ev1", "approve", "insert"))
    val sentBefore = notifier.sent.length
    p.processApproval(approval("ev1", "approve", "insert"))
    assert(notifier.sent.length == sentBefore) // no second apply/notify
    assert(p.catalog.read("customers").count() == 1)
  }

  test("reject records status without reading the file") {
    val (p, _, _) = freshPipeline() // no file landed at all
    p.registerArrival(FileEvent("b1", "insert/customers.csv", "ev2"))
    p.processApproval(approval("ev2", "reject", "insert"))
    val row = p.catalog.read(p.ControlTable).as[ProcessedFile].head()
    assert(row.status == Status.Rejected && row.is_processed)
    assert(!p.catalog.exists("customers"))
  }

  test("unknown action is dropped silently (process-pipeline.py:469-471)") {
    val (p, _, landing) = freshPipeline()
    land(landing, "b1", "insert/customers.csv", "customer_id,name\n1,a\n")
    p.registerArrival(FileEvent("b1", "insert/customers.csv", "ev3"))
    p.processApproval(approval("ev3", "maybe", "insert"))
    val row = p.catalog.read(p.ControlTable).as[ProcessedFile].head()
    assert(row.status == Status.Pending && !row.is_processed)
  }

  test("operation failure marks failed + failure notification") {
    val (p, notifier, _) = freshPipeline() // approve without landing the file
    p.registerArrival(FileEvent("b1", "insert/customers.csv", "ev4"))
    p.processApproval(approval("ev4", "approve", "insert"))
    val row = p.catalog.read(p.ControlTable).as[ProcessedFile].head()
    assert(row.status == Status.Failed && row.is_processed)
    assert(notifier.sent.last.subject.contains("Operation FAILURE"))
  }

  test("update path upserts by registered PK; re-upload versions bump") {
    val (p, _, landing) = freshPipeline()
    land(landing, "b1", "insert/customers.csv", "customer_id,name\n1,alice\n2,bob\n")
    p.registerArrival(FileEvent("b1", "insert/customers.csv", "ev5"))
    p.processApproval(approval("ev5", "approve", "insert"))
    p.catalog.registerPrimaryKey("customers", Seq("customer_id"))

    // versions continue per file_name across operations (the reference's
    // MAX query has no operation filter, data-query.py:74-79): the
    // insert was v1, so this update registration is v2
    land(landing, "b1", "update/customers.csv", "customer_id,name\n2,BOB\n3,carol\n")
    assert(p.registerArrival(FileEvent("b1", "update/customers.csv", "ev6")).contains(2L))
    p.processApproval(approval("ev6", "approve", "update"))
    assert(p.catalog.read("customers").as[(String, String)].collect().toSet ==
      Set("1" -> "alice", "2" -> "BOB", "3" -> "carol"))

    // same file again: version 3 of the shared history
    assert(p.registerArrival(FileEvent("b1", "update/customers.csv", "ev7")).contains(3L))
  }

  test("delete stages rows (never touches data), E4 executes them") {
    val (p, _, landing) = freshPipeline()
    land(landing, "b1", "insert/customers.csv", "customer_id,name\n1,a\n2,b\n3,c\n")
    p.registerArrival(FileEvent("b1", "insert/customers.csv", "ev8"))
    p.processApproval(approval("ev8", "approve", "insert"))
    p.catalog.registerPrimaryKey("customers", Seq("customer_id"))

    land(landing, "b1", "delete/customers.csv", "customer_id\n2\n3\n")
    p.registerArrival(FileEvent("b1", "delete/customers.csv", "ev9"))
    p.processApproval(approval("ev9", "approve", "delete"))
    // staged only — data untouched (reference quirk preserved)
    assert(p.catalog.read("customers").count() == 3)
    val staged = p.catalog.read(p.DeleteControlTable).as[DeleteControl].collect()
    assert(staged.length == 2 && staged.forall(r => !r.ExecutedFlag && r.DeleteFlag))
    assert(staged.map(_.DeleteQuery).toSet ==
      Set("""DELETE FROM customers WHERE "customer_id" = '2'""",
        """DELETE FROM customers WHERE "customer_id" = '3'"""))

    val executed = p.executePendingDeletes()
    assert(executed.toSet == staged.map(_.QueryId).toSet)
    assert(p.catalog.read("customers").as[(String, String)].collect().toSet ==
      Set("1" -> "a"))
    val after = p.catalog.read(p.DeleteControlTable).as[DeleteControl].collect()
    assert(after.forall(r => r.ExecutedFlag && r.ExecutedDeleteTimestamp.nonEmpty))
    // second run is a no-op
    assert(p.executePendingDeletes().isEmpty)
  }

  test("batch registration versions a whole arrival batch in one commit") {
    val (p, notifier, _) = freshPipeline()
    // seed history: customers.csv already at version 1
    p.registerArrival(FileEvent("b1", "insert/customers.csv", "ev0"))
    val got = p.registerArrivals(Seq(
      FileEvent("b1", "insert/customers.csv", "ev1"),  // continues -> v2
      FileEvent("b1", "update/customers.csv", "ev2"),  // same file  -> v3
      FileEvent("b1", "insert/parts.csv", "ev3"),      // fresh      -> v1
      FileEvent("b1", "archive/skip.csv", "ev4"),      // filtered
      FileEvent("b1", "insert/", "ev5")))              // folder marker
    assert(got == Map("ev1" -> 2L, "ev2" -> 3L, "ev3" -> 1L))
    val ctrl = p.catalog.read(p.ControlTable).as[ProcessedFile].collect()
    assert(ctrl.length == 4 && ctrl.forall(_.status == Status.Pending))
    assert(notifier.sent.length == 4) // 1 from seed + 3 from the batch
  }

  test("path guards: folders, shallow paths, unknown prefixes filtered (O4)") {
    val (p, _, _) = freshPipeline()
    assert(p.registerArrival(FileEvent("b", "insert/", "e1")).isEmpty)
    assert(p.registerArrival(FileEvent("b", "orphan.csv", "e2")).isEmpty)
    assert(p.registerArrival(FileEvent("b", "archive/f.csv", "e3")).isEmpty)
  }

  test("empty and headerless CSVs raise (process-pipeline.py:334-337)") {
    val (p, notifier, landing) = freshPipeline()
    land(landing, "b1", "insert/empty.csv", "")
    p.registerArrival(FileEvent("b1", "insert/empty.csv", "ev10"))
    p.processApproval(approval("ev10", "approve", "insert",
      file = "empty.csv", table = "empty"))
    assert(p.catalog.read(p.ControlTable).as[ProcessedFile].head().status == Status.Failed)
    assert(notifier.sent.last.subject.contains("FAILURE"))
  }

  test("batch approvals: N events, ONE control-table commit, per-event semantics") {
    val landing = tmpDir("landing")
    val notifier = new InMemoryNotifier
    val counting = new Catalog(spark, tmpDir("wh")) {
      val overwrites = scala.collection.mutable.Map[String, Int]()
      override def overwrite(name: String,
          df: org.apache.spark.sql.DataFrame): Unit = {
        overwrites(name) = overwrites.getOrElse(name, 0) + 1
        super.overwrite(name, df)
      }
    }
    val p = new Pipeline(spark, counting, notifier, landing)
    land(landing, "b1", "insert/customers.csv", "customer_id,name\n1,a\n2,b\n")
    land(landing, "b1", "insert/parts.csv", "part_id,name\n7,bolt\n")
    p.registerArrivals(Seq(
      FileEvent("b1", "insert/customers.csv", "ev1"),
      FileEvent("b1", "insert/parts.csv", "ev2"),
      FileEvent("b1", "insert/customers.csv", "ev3"),
      FileEvent("b1", "insert/customers.csv", "ev4"),
      FileEvent("b1", "insert/customers.csv", "ev5")))
    counting.overwrites.clear()

    p.processApprovals(Seq(
      approval("ev1", "approve", "insert"),               // applies
      approval("ev2", "approve", "insert", file = "parts.csv", table = "parts"),
      approval("ev3", "reject", "insert"),                // rejected
      approval("ev4", "maybe", "insert"),                 // unknown: dropped
      approval("ev1", "approve", "insert"),               // in-batch dup: skipped
      ApprovalEvent("ev5", "approve", null, null, null, null,
        None, None, Some("2026-01-02T03:04:05Z"), None))) // missing fields → Failed

    // the whole batch of 5 distinct outcomes = ONE control-table rewrite
    assert(counting.overwrites(p.ControlTable) == 1,
      s"control-table commits: ${counting.overwrites}")
    val st = p.catalog.read(p.ControlTable).as[ProcessedFile].collect()
      .map(r => r.event_id -> (r.status, r.is_processed)).toMap
    assert(st("ev1") == (Status.Approved, true))
    assert(st("ev2") == (Status.Approved, true))
    assert(st("ev3") == (Status.Rejected, true))
    assert(st("ev4") == (Status.Pending, false)) // unknown action untouched
    assert(st("ev5") == (Status.Failed, true))
    assert(p.catalog.read("customers").count() == 2)
    assert(p.catalog.read("parts").count() == 1)
    // ev1 applied once despite the in-batch duplicate
    assert(notifier.sent.count(_.subject.contains("Operation SUCCESS")) == 2)
  }

  test("unknown action does not consume the event_id (later valid approval lands)") {
    val (p, _, landing) = freshPipeline()
    land(landing, "b1", "insert/customers.csv", "customer_id,name\n1,a\n")
    p.registerArrival(FileEvent("b1", "insert/customers.csv", "ev1"))
    // the reference drops an unknown action WITHOUT marking the message
    // processed — a valid approve for the same id later in the batch
    // must still apply
    p.processApprovals(Seq(
      approval("ev1", "maybe", "insert"),
      approval("ev1", "approve", "insert")))
    val row = p.catalog.read(p.ControlTable).as[ProcessedFile].head()
    assert(row.status == Status.Approved && row.is_processed)
    assert(p.catalog.read("customers").count() == 1)
  }

  test("bucketed data table: approval mutations rewrite only touched buckets") {
    val (p, _, landing) = freshPipeline()
    val n = 8
    land(landing, "b1", "insert/customers.csv",
      "customer_id,name\n" + (1 to 40).map(i => s"$i,name$i\n").mkString)
    p.registerArrival(FileEvent("b1", "insert/customers.csv", "bv1"))
    p.processApproval(approval("bv1", "approve", "insert"))
    p.catalog.registerPrimaryKey("customers", Seq("customer_id"))
    p.catalog.registerBucketLayout("customers", n)

    // first post-layout mutation migrates into the bucket layout
    land(landing, "b1", "update/customers.csv", "customer_id,name\n5,FIVE\n")
    p.registerArrival(FileEvent("b1", "update/customers.csv", "bv2"))
    p.processApproval(approval("bv2", "approve", "update"))
    assert(p.catalog.hasBucketManifest("customers"))
    val refs0 = p.catalog.bucketRefs("customers")

    // second mutation touches ONLY the bucket of id 9
    land(landing, "b1", "update/customers.csv", "customer_id,name\n9,NINE\n")
    p.registerArrival(FileEvent("b1", "update/customers.csv", "bv3"))
    p.processApproval(approval("bv3", "approve", "update"))
    val refs1 = p.catalog.bucketRefs("customers")
    val b9 = Seq("9").toDF("customer_id")
      .select(p.catalog.bucketOf(Seq("customer_id"), n).as("b")).head().getInt(0)
    assert(refs1(b9) != refs0(b9))
    refs0.keys.filter(_ != b9).foreach(k => assert(refs1(k) == refs0(k),
      s"bucket $k rewritten by an update that never touched it"))
    assert(p.catalog.read("customers").count() == 40)
    assert(p.catalog.read("customers").filter($"customer_id" === "9")
      .select("name").head().getString(0) == "NINE")
    assert(p.catalog.read("customers").filter($"customer_id" === "5")
      .select("name").head().getString(0) == "FIVE")

    // staged deletes execute bucket-scoped too
    land(landing, "b1", "delete/customers.csv", "customer_id\n9\n")
    p.registerArrival(FileEvent("b1", "delete/customers.csv", "bv4"))
    p.processApproval(approval("bv4", "approve", "delete"))
    val refsBeforeDel = p.catalog.bucketRefs("customers")
    assert(p.executePendingDeletes().nonEmpty)
    val refsAfterDel = p.catalog.bucketRefs("customers")
    refsBeforeDel.keys.filter(_ != b9).foreach(k =>
      assert(refsAfterDel(k) == refsBeforeDel(k)))
    assert(p.catalog.read("customers").count() == 39)
  }

  test("control-plane guard trips loudly past maxControlRows") {
    // control collects assume rows scale with file events; the cap
    // turns a data-scale misuse into a diagnosis instead of a driver OOM
    val landing = tmpDir("landing")
    val p = new Pipeline(spark, new Catalog(spark, tmpDir("wh")),
      new InMemoryNotifier, landing, maxControlRows = 3)
    val events = (1 to 5).map(i =>
      FileEvent("b1", s"insert/f$i.csv", s"ev$i"))
    val ex = intercept[IllegalStateException] {
      p.registerArrivals(events)
    }
    assert(ex.getMessage.contains("maxControlRows"))
    // under the cap, the same batch registers normally
    val p2 = new Pipeline(spark, new Catalog(spark, tmpDir("wh")),
      new InMemoryNotifier, landing, maxControlRows = 10)
    assert(p2.registerArrivals(events).size == 5)
  }

  test("catalog survives a lost pointer file (crash-recovery fallback)") {
    val root = tmpDir("wh")
    val cat = new Catalog(spark, root)
    cat.createIfAbsent("t", cat.allStringSchema(Seq("a")))
    cat.append("t", Seq(("x")).toDF("a"))
    // simulate the legacy delete-then-rename crash window: pointer gone
    assert(new java.io.File(s"$root/t/_current").delete())
    assert(cat.exists("t"))
    assert(cat.read("t").as[String].collect().toSeq == Seq("x"))
  }
}
