package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The shared staged-swap protocol (r11 ADVICE): read paths refuse to
  * serve with an actionable "run recover" while a compact stage is
  * pending (the post-delete pre-rename crash window would otherwise
  * surface as a bare path-not-found — or worse, an append would
  * silently recreate the live dir holding only its batch), and
  * delete/rename return-false failures throw instead of silently
  * leaving the index with no live dir.
  */
class StagedSwapSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" < 100)

  test("TextIndex serve + append refuse while a compact stage is pending") {
    val dir = tmpDir("ssw_text")
    TextIndex.build(docs, "doc_id", "text", dir)
    val next = s"$dir/postings_compact_next"
    spark.range(1).toDF("junk").write.parquet(next)
    val e = intercept[IllegalStateException](
      TextIndex.bm25TopK(spark, dir, Seq("the"), 5).collect())
    assert(e.getMessage.contains("TextIndex.recover"))
    val e2 = intercept[IllegalStateException](
      TextIndex.append(docs.limit(5), "doc_id", "text", dir))
    assert(e2.getMessage.contains("TextIndex.recover"))
    // recover discards the unmarked stage; serving resumes
    TextIndex.recover(spark, dir)
    assert(TextIndex.bm25TopK(spark, dir, Seq("the"), 5).count() > 0)
  }

  test("VectorIndex serve + append refuse while a compact stage is pending") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" < 200)
    val dir = tmpDir("ssw_vec")
    VectorIndex.build(emb, "vec_id", "embedding", dir, numCentroids = 4)
    val queries = emb.filter($"vec_id" < 5)
    val next = s"$dir/lists_compact_next"
    spark.range(1).toDF("junk").write.parquet(next)
    val e = intercept[IllegalStateException](
      VectorIndex.topK(spark, dir, queries, "vec_id", "embedding", 3)
        .collect())
    assert(e.getMessage.contains("VectorIndex.recover"))
    val e2 = intercept[IllegalStateException](
      VectorIndex.append(queries, "vec_id", "embedding", dir))
    assert(e2.getMessage.contains("VectorIndex.recover"))
    VectorIndex.recover(spark, dir)
    assert(VectorIndex.topK(spark, dir, queries, "vec_id", "embedding", 3)
      .count() > 0)
  }

  test("VectorIndex recover rolls a marked stage forward in every window") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" < 200)
    val dir = tmpDir("ssw_vecroll")
    VectorIndex.build(emb, "vec_id", "embedding", dir, numCentroids = 4)
    val queries = emb.filter($"vec_id" < 5)
    def serve() = VectorIndex
      .topK(spark, dir, queries, "vec_id", "embedding", 3)
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    val want = serve()
    val next = s"$dir/lists_compact_next"
    // marked stage + live dir still present
    spark.read.parquet(s"$dir/lists").repartition(col("__cid"))
      .write.partitionBy("__cid").parquet(next)
    new java.io.File(next, "_COMPACT_DONE").createNewFile()
    VectorIndex.recover(spark, dir)
    assert(serve() == want && !new java.io.File(next).exists())
    // post-delete pre-rename window: live dir already gone
    spark.read.parquet(s"$dir/lists").repartition(col("__cid"))
      .write.partitionBy("__cid").parquet(next)
    new java.io.File(next, "_COMPACT_DONE").createNewFile()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(s"$dir/lists"))
    VectorIndex.recover(spark, dir)
    assert(serve() == want && !new java.io.File(next).exists())
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

  test("rollForward throws when rename fails instead of losing the live dir") {
    // Hadoop FileSystem.rename reports most failures by returning
    // FALSE, not throwing — simulate with a scheme whose rename always
    // fails. Before the return-value check this silently left the
    // index with no live dir and no error.
    spark.sparkContext.hadoopConfiguration
      .set("fs.failren.impl", classOf[FailRenameFileSystem].getName)
    val root = tmpDir("ssw_fail")
    val stage = s"$root/stage"
    new java.io.File(stage).mkdirs()
    new java.io.File(stage, "_DONE").createNewFile()
    val e = intercept[IllegalStateException](
      StagedSwap.rollForward(spark, s"failren://$root/live",
        s"failren://$stage", "_DONE"))
    assert(e.getMessage.contains("rename"))
    assert(new java.io.File(stage).exists(),
      "the staged copy must survive a failed rename")
  }
}

/** RawLocalFileSystem whose rename always reports failure the Hadoop
  * way (returning false) — drives the StagedSwap return-value check.
  */
class FailRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "failren"
  override def getUri: java.net.URI = java.net.URI.create("failren:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = false
}
