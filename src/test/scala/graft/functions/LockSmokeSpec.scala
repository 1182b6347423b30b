package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Two-JVM concurrency smoke for the StagedSwap/GenIndex writer
  * protocol (r14 verdict item 6): every failure mode the lock defends
  * against — stale-break of a live holder, grave-rename on release, a
  * third writer acquiring between probe and deadline — is
  * CROSS-PROCESS, which the single-JVM specs structurally cannot
  * exercise. Here two forked JVMs append disjoint doc batches to ONE
  * SignatureIndex concurrently; serialization happens only through the
  * on-disk `_commit.lock`. Success = both processes exit clean, no
  * batch is lost (the sets table holds exactly base + both children's
  * doc ids), and the final manifest serves (a re-presented duplicate
  * finds its indexed twin).
  *
  * Fails on the r13 lock bug if reverted: a 60 s staleMs would let one
  * JVM stale-break the other mid-append (appends here hold the lock
  * for multiple seconds and the children run ~a minute), losing a
  * generation flip — the doc-count assert catches the lost batch.
  */
class LockSmokeSpec extends SparkTestBase {
  import spark.implicits._

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def smokeText(idCol: org.apache.spark.sql.Column) =
    concat_ws(" ", (1 to 12).map(j =>
      concat(lit("tok"), pmod(idCol * j, lit(97)))): _*)

  test("two JVMs appending concurrently: no lost batch, serveable manifest") {
    val dir = tmpDir("locksmoke")
    // base index built in-process with the SAME text recipe the
    // children use (LockSmokeChild.main)
    val base = spark.range(0, 100)
      .select($"id".as("doc_id"), smokeText($"id").as("text"))
    SignatureIndex.build(base, "doc_id", "text", dir)

    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    def child(from: Long): Process = new ProcessBuilder(
      (Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.tools.LockSmokeChild",
        dir, from.toString, "3", "40")): _*)
      .inheritIO().start()
    // both children live concurrently: 3 appends × 40 docs each, every
    // append a full lock-acquire → stage → generation flip → release
    val a = child(1000L)
    val b = child(2000L)
    assert(a.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
      b.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "a child JVM hung — lock protocol deadlock or stale-break loop")
    assert(a.exitValue() == 0 && b.exitValue() == 0,
      s"child exit codes: ${a.exitValue()} / ${b.exitValue()}")

    // no lost batch: the sets table holds EXACTLY base + both children
    val m = GenIndex.readManifest(spark, dir, "lock smoke")
    val sets = GenIndex.readBuckets(spark, dir, m.refs("sets"), "__db",
      m.refs("sets").keys.toSeq, withBucketCol = false,
      "doc_id bigint, hhd array<bigint>")
    val ids = sets.select($"doc_id").as[Long].collect().toSet
    val want = (0L until 100L) ++
      (1000L until 1120L) ++ (2000L until 2120L)
    assert(ids == want.toSet,
      s"lost/extra docs: missing=${(want.toSet -- ids).toSeq.sorted.take(10)} " +
        s"extra=${(ids -- want.toSet).toSeq.sorted.take(10)}")

    // and the final manifest SERVES: a re-presented duplicate of an
    // appended doc (same recipe ⇒ identical text) finds its twin
    val probe = spark.range(1, 2)
      .select(lit(999999L).as("doc_id"), smokeText(lit(1003L)).as("text"))
    val pairs = SignatureIndex.servePairs(
        spark, dir, probe, "doc_id", "text", 0.9)
      .select($"id_base").as[Long].collect().toSet
    assert(pairs.contains(1003L),
      s"appended doc 1003 not findable through the final manifest: $pairs")
  }
}
