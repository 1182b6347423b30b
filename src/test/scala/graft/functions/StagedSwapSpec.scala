package graft.functions

import graft.SparkTestBase

/** The shared commit primitives under [[StagedSwap]]: checked deletes
  * fail loudly on Hadoop's return-false path (r11 ADVICE — a silent
  * false leaves stale state a later recover would roll forward over),
  * and the cross-process writer lock holds its r13 ADVICE contract —
  * a live holder is never stale-broken under the defaults, release
  * verifies ownership before deleting, and contended writers hand off
  * without spurious timeouts.
  */
class StagedSwapSpec extends SparkTestBase {

  test("deleteChecked throws when the filesystem reports failure by returning false") {
    // Hadoop FileSystem.delete reports most failures by returning
    // FALSE, not throwing — a silent false here would leave a stale
    // generation that a later vacuum/rebuild trips over with no trail.
    spark.sparkContext.hadoopConfiguration
      .set("fs.faildel.impl", classOf[FailDeleteFileSystem].getName)
    val root = tmpDir("ssw_faildel")
    new java.io.File(s"$root/doomed").mkdirs()
    val e = intercept[IllegalStateException](
      StagedSwap.deleteChecked(spark, s"faildel://$root/doomed", "test state"))
    assert(e.getMessage.contains("test state"))
    assert(new java.io.File(s"$root/doomed").exists())
  }

  test("withFileLock: a live lock held longer than the body-sized old default is NOT stale-broken") {
    // r13 ADVICE #1: the guarded bodies run 81-255 s, so the old 60 s
    // stale default meant a waiter always broke a LIVE holder. The
    // default now matches Catalog's lockStaleMs (30 min): a 2-minute-old
    // lock must read as HELD — the waiter times out loudly instead.
    val root = tmpDir("ssw_lockstale")
    val lock = java.nio.file.Paths.get(root, "_commit.lock")
    java.nio.file.Files.writeString(lock, """{"pid":0,"token":"holder"}""")
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000L))
    val e = intercept[IllegalStateException] {
      StagedSwap.withFileLock(spark, lock.toString, timeoutMs = 300L) {
        fail("must not acquire over a live holder")
      }
    }
    assert(e.getMessage.contains("another writer holds it"))
    assert(java.nio.file.Files.readString(lock).contains("holder"),
      "the live holder's lock must survive the waiter's timeout")
  }

  test("withFileLock: release skips deleting a lock it no longer owns") {
    // r13 ADVICE #2: if a holder's lock was stale-broken and re-acquired
    // by another writer, the original holder's release must NOT delete
    // the new holder's lock (that lets a third writer enter mid-commit).
    val root = tmpDir("ssw_locktoken")
    val lock = java.nio.file.Paths.get(root, "_commit.lock")
    StagedSwap.withFileLock(spark, lock.toString, timeoutMs = 300L) {
      // simulate: a breaker graved our lock and acquired its own
      java.nio.file.Files.writeString(lock,
        """{"pid":1,"token":"the-new-holder"}""")
    }
    assert(java.nio.file.Files.exists(lock) &&
      java.nio.file.Files.readString(lock).contains("the-new-holder"),
      "release must leave a lock owned by another writer in place")
    java.nio.file.Files.delete(lock)
    // and when the lock IS still ours, release deletes it as before
    StagedSwap.withFileLock(spark, lock.toString, timeoutMs = 300L) { () }
    assert(!java.nio.file.Files.exists(lock))
  }

  test("withFileLock: contended writers hand off without a spurious timeout") {
    // r13 ADVICE #3 regression shape: holder releases while the waiter
    // is between its status probe and deadline check — the waiter must
    // retry the acquire, not throw. Driven as a real two-thread handoff.
    val root = tmpDir("ssw_lockrace")
    val lock = s"$root/_commit.lock"
    @volatile var order = Vector.empty[String]
    val t = new Thread(() =>
      StagedSwap.withFileLock(spark, lock, timeoutMs = 5000L) {
        order :+= "first-in"; Thread.sleep(400L); order :+= "first-out"
      })
    t.start()
    Thread.sleep(100L) // let the holder in
    StagedSwap.withFileLock(spark, lock, timeoutMs = 5000L) {
      order :+= "second-in"
    }
    t.join()
    assert(order == Vector("first-in", "first-out", "second-in"))
  }
}

/** RawLocalFileSystem whose delete always reports failure the Hadoop
  * way (returning false) — drives the deleteChecked return-value check.
  */
class FailDeleteFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "faildel"
  override def getUri: java.net.URI = java.net.URI.create("faildel:///")
  override def delete(p: org.apache.hadoop.fs.Path,
      recursive: Boolean): Boolean = false
}
