package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Persisted MinHash signature index: serving from the index must be
  * BIT-IDENTICAL to the in-plan recompute (crossCorpusNearDupPairs),
  * appends must serve identically to a full rebuild, compaction is
  * pure layout, the staged-append crash windows all recover, and the
  * serve scan actually prunes to the batch's key buckets.
  */
class SignatureIndexSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def base = docs.filter($"doc_id" % 2 === 0)
  private def incoming = docs.filter($"doc_id" % 2 === 1)

  private def serve(dir: String): Set[(Long, Long, Double)] =
    SignatureIndex.servePairs(spark, dir, incoming, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet

  private lazy val recompute: Set[(Long, Long, Double)] =
    Dedup.crossCorpusNearDupPairs(base, incoming, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet

  test("index-served pairs == in-plan recompute, bit-identical") {
    val dir = tmpDir("sigidx") + "/idx"
    SignatureIndex.build(base, "doc_id", "text", dir)
    assert(serve(dir) == recompute)
    assert(recompute.nonEmpty, "fixture has no cross-side pairs - weak test")
    spark.catalog.clearCache()
  }

  test("append serves identically to a full rebuild; empty append is a no-op") {
    val dir = tmpDir("sigidxapp") + "/idx"
    SignatureIndex.build(base.filter($"doc_id" % 4 === 0), "doc_id", "text", dir)
    SignatureIndex.append(base.filter($"doc_id" % 4 === 2), "doc_id", "text", dir)
    assert(serve(dir) == recompute)
    SignatureIndex.append(base.filter($"doc_id" < 0), "doc_id", "text", dir)
    assert(serve(dir) == recompute)
    spark.catalog.clearCache()
  }

  test("re-appending the same batch is idempotent (upsert, no dup pairs)") {
    val dir = tmpDir("sigidxdup") + "/idx"
    SignatureIndex.build(base.filter($"doc_id" % 4 === 0), "doc_id", "text", dir)
    val batch = base.filter($"doc_id" % 4 === 2)
    SignatureIndex.append(batch, "doc_id", "text", dir)
    SignatureIndex.append(batch, "doc_id", "text", dir)
    assert(serve(dir) == recompute)
    // the sets table holds each doc once despite the double append
    val n = spark.read.parquet(s"$dir/sets").count()
    val nd = spark.read.parquet(s"$dir/sets").select("doc_id").distinct().count()
    assert(n == nd, s"sets table has $n rows over $nd docs")
    spark.catalog.clearCache()
  }

  test("compact rewrites each bucket to one file; serving is bit-identical") {
    val dir = tmpDir("sigidxcomp") + "/idx"
    SignatureIndex.build(base.filter($"doc_id" % 4 === 0), "doc_id", "text", dir)
    SignatureIndex.append(base.filter($"doc_id" % 8 === 2), "doc_id", "text", dir)
    SignatureIndex.append(base.filter($"doc_id" % 8 === 6), "doc_id", "text", dir)
    val before = serve(dir)
    SignatureIndex.compact(spark, dir)
    def bucketFiles(sub: String) = new java.io.File(s"$dir/$sub")
      .listFiles().filter(_.getName.contains("=")).map(d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(bucketFiles("bands").forall(_._2 == 1))
    assert(bucketFiles("sets").forall(_._2 == 1))
    assert(serve(dir) == before && before == recompute)
    spark.catalog.clearCache()
  }

  test("append crash windows: unmarked stage discarded, marked stage rolls forward") {
    val dir = tmpDir("sigidxcrash") + "/idx"
    SignatureIndex.build(base.filter($"doc_id" % 4 === 0), "doc_id", "text", dir)
    val st = s"$dir/append_next"
    // crash BEFORE _STAGE_DONE: garbage stage, serve refuses, recover
    // discards, live state intact
    spark.range(1).toDF("junk").write.parquet(s"$st/bands")
    intercept[IllegalStateException](serve(dir))
    SignatureIndex.recover(spark, dir)
    assert(!new java.io.File(st).exists())
    // crash AFTER _STAGE_DONE but before/mid apply: recover re-runs the
    // idempotent apply and the index then serves like a full rebuild
    val batch = base.filter($"doc_id" % 4 === 2)
    val p = spark.read.parquet(s"$dir/meta").head()
    val stagedSets = Dedup.hashedShingleFrame(batch, "doc_id", "text", p.getInt(0))
      .select($"__id".as("doc_id"), $"__hhd".as("hhd"))
      .withColumn("__db", pmod(hash($"doc_id"), lit(p.getInt(3))))
    stagedSets.write.parquet(s"$st/sets")
    val rows = p.getInt(1) / p.getInt(2)
    Dedup.hashedShingleFrame(batch, "doc_id", "text", p.getInt(0))
      .withColumn("__sig",
        Dedup.minhashSignatureFromHashesFast($"__hhd", p.getInt(1)))
      .select($"__id".as("doc_id"),
        posexplode(Dedup.lshBandKeys($"__sig", p.getInt(2), rows))
          .as(Seq("band", "key")))
      .withColumn("__kb", pmod(hash($"key"), lit(p.getInt(3))))
      .write.parquet(s"$st/bands")
    new java.io.File(st, "_STAGE_DONE").createNewFile()
    intercept[IllegalStateException](serve(dir))
    SignatureIndex.recover(spark, dir)
    assert(!new java.io.File(st).exists())
    assert(serve(dir) == recompute)
    spark.catalog.clearCache()
  }

  test("serve scan reads only the batch's key buckets (partition pruning)") {
    val dir = tmpDir("sigidxprune") + "/idx"
    SignatureIndex.build(base, "doc_id", "text", dir)
    // a 3-doc batch: at most 6 band keys hash to at most 6 of 64 buckets
    val tiny = incoming.filter($"doc_id" <= 5)
    val p = spark.read.parquet(s"$dir/meta").head()
    val rows = p.getInt(1) / p.getInt(2)
    val touched = Dedup.hashedShingleFrame(tiny, "doc_id", "text", p.getInt(0))
      .withColumn("__sig",
        Dedup.minhashSignatureFromHashesFast($"__hhd", p.getInt(1)))
      .select(posexplode(Dedup.lshBandKeys($"__sig", p.getInt(2), rows))
        .as(Seq("band", "key")))
      .select(pmod(hash($"key"), lit(p.getInt(3))))
      .distinct().as[Int].collect().toSet
    assert(touched.size <= 6)
    // inputFiles ignores filters — assert on the physical scan the serve
    // path builds: the __kb isin must land in PartitionFilters, and the
    // files actually read must come only from the touched bucket dirs
    val pruned = spark.read.parquet(s"$dir/bands")
      .filter($"__kb".isin(touched.toSeq.map(x => x: Any): _*))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__kb"),
      s"no partition pruning in:\n$plan")
    val scannedKbs = pruned.select(input_file_name()).distinct().as[String]
      .collect().map(f => f.split("__kb=")(1).split("/")(0).toInt).toSet
    assert(scannedKbs.subsetOf(touched), s"scanned $scannedKbs, touched $touched")
    spark.catalog.clearCache()
  }
}
