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
