package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.model._
import graft.notify.InMemoryNotifier
import graft.pipeline.Pipeline

/** The same catalog + pipeline flows over THREE root spellings — a bare
  * local path, an explicit `file:` URI, and the non-local `rawspec://`
  * scheme (round-8 verdict item 5): everything reaches storage through
  * `Path.getFileSystem`, so a GCS/S3-shaped root must only change the
  * scheme string, never the behavior. What this flushes: bare-path
  * string concatenation fed to java.io/java.nio, `file`-scheme
  * special-cases, and the FileContext AbstractFileSystem binding that
  * object-store deployments don't ship (rawspec registers none, so
  * writeAtomic's fallback rename is the path under test).
  */
class FsSchemeSpec extends SparkTestBase {
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration
    .set("fs.rawspec.impl", classOf[RawSpecFileSystem].getName)

  /** Local backing dir → the three spellings a deployment might use. */
  private def roots(prefix: String): Seq[(String, String)] = {
    def local(suffix: String) = tmpDir(s"$prefix$suffix")
    Seq(
      "bare-path" -> local("_bare"),
      "file-uri" -> s"file://${local("_uri")}",
      "rawspec" -> s"rawspec://${local("_raw")}")
  }

  test("catalog CRUD + versioning behave identically under every scheme") {
    for ((label, root) <- roots("fscat")) {
      val cat = new Catalog(spark, root)
      cat.createIfAbsent("t", cat.allStringSchema(Seq("id", "v")), Seq("id"))
      cat.append("t", Seq(("1", "a"), ("2", "b")).toDF("id", "v"))
      cat.overwrite("t", cat.read("t").filter($"id" =!= "2"))
      assert(cat.read("t").as[(String, String)].collect().toSeq ==
        Seq(("1", "a")), s"[$label] wrong rows")
      assert(cat.primaryKey("t") == Seq("id"), s"[$label] PK lost")
      assert(cat.listTables() == Seq("t"), s"[$label] listTables")
      // append-log manifests and multi-ref reads under the scheme too
      cat.appendLog("log", Seq(1L, 2L).toDF("n"))
      cat.appendLog("log", Seq(3L).toDF("n"))
      assert(cat.read("log").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L), s"[$label] appendLog refs")
    }
  }

  test("pipeline ingest + approval runs end-to-end under every scheme") {
    for ((label, root) <- roots("fspipe")) {
      // landing CSVs live under the SAME scheme as a real bucket would
      val landing = s"$root/landing"
      val localLanding = root.replaceFirst("^[a-z]+://", "")
      val f = Paths.get(localLanding, "landing", "b1", "insert", "customers.csv")
      Files.createDirectories(f.getParent)
      Files.writeString(f, "customer_id,name\n1,alice\n2,bob\n")
      val notifier = new InMemoryNotifier
      val p = new Pipeline(spark, new Catalog(spark, s"$root/wh"), notifier, landing)
      val v = p.registerArrival(FileEvent("b1", "insert/customers.csv", s"ev_$label"))
      assert(v.contains(1L), s"[$label] version")
      p.processApproval(ApprovalEvent(s"ev_$label", "approve",
        "insert/customers.csv", "customers", "insert", "b1",
        Some(1L), None, Some("2026-01-02T03:04:05Z"), None))
      assert(p.catalog.read("customers").count() == 2, s"[$label] rows")
      val done = p.catalog.read(p.ControlTable).as[ProcessedFile].head()
      assert(done.status == Status.Approved && done.is_processed,
        s"[$label] control row")
      assert(notifier.sent.last.subject.contains("SUCCESS"), s"[$label] notify")
    }
  }

  test("rawspec writes carry the scheme end to end (no silent file:// rewrite)") {
    val root = s"rawspec://${tmpDir("fsraw")}"
    val cat = new Catalog(spark, root)
    cat.overwrite("t", Seq(1L).toDF("n"))
    // the pointer file exists under the local backing dir (RawLocal
    // mapping) and was written through the fallback rename — no CRC
    // sidecar proves the CHECKSUM wrapper (file://) never slipped in
    val backing = Paths.get(root.stripPrefix("rawspec://"), "t")
    assert(Files.exists(backing.resolve("_current")))
    assert(!Files.exists(backing.resolve("._current.crc")),
      "checksum sidecar present: writes went through file://, not rawspec")
  }
}
