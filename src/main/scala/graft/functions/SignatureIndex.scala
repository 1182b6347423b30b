package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash SIGNATURE index — the text-dedup counterpart of
  * VectorIndex (dense) and TextIndex (sparse retrieval): the banded
  * MinHash keys and distinct shingle-hash sets of a BASE corpus,
  * written once and served many. `crossCorpusNearDupPairs` noted its
  * base band frame "is a persistable signature index" but recomputed
  * it per call — at warehouse scale the base side is a 100 TB corpus
  * snapshot whose signatures are a build artifact, and each crawl
  * batch should pay only its own signing plus the matched buckets
  * (r11 verdict item 4).
  *
  * Layout under `indexDir`:
  *  - `meta`  — one row: (shingle, num_hashes, bands, n_buckets),
  *    validated on every serve/append — band keys built under
  *    different parameters would silently collapse recall, so drift
  *    fails fast (the IncrementalDedup contract);
  *  - `bands` — (doc_id, band, key) PARTITIONED BY `__kb` =
  *    hash(key) mod nBuckets: a serve batch touches only the bucket
  *    dirs its own keys hash to — partition pruning, the TextIndex
  *    postings trick;
  *  - `sets`  — (doc_id, hhd) PARTITIONED BY `__db` = hash(doc_id)
  *    mod nBuckets: exact-Jaccard verification reads only the bucket
  *    dirs holding candidate base docs.
  *
  * Serving is BIT-IDENTICAL to the in-plan recompute
  * (Dedup.crossCorpusNearDupPairs with the same parameters) — pinned
  * by SignatureIndexSpec and the t71 oracle row, which shares t49's
  * SQL.
  *
  * Crash safety reuses the shared [[StagedSwap]] protocol. An append
  * is TWO live tables (bands + sets) — a torn append would serve
  * candidates whose verification sets are missing, silently dropping
  * pairs — so the batch is STAGED first (`append_next/{bands,sets}` +
  * `_STAGE_DONE`), then applied as IDEMPOTENT dynamic partition
  * overwrites of the touched buckets (old rows minus the batch's
  * doc_ids, plus the staged rows — a replay rewrites the same
  * partitions to the same content). recover() rolls a marked stage
  * forward by re-running the apply; an unmarked stage is discarded
  * with the live dirs untouched.
  */
object SignatureIndex {

  val DefaultBuckets = 64

  private def stageDir(indexDir: String) = s"$indexDir/append_next"

  private case class Params(shingle: Int, numHashes: Int, bands: Int,
      nBuckets: Int)

  private def writeMeta(spark: SparkSession, indexDir: String,
      p: Params): Unit = {
    import spark.implicits._
    Seq((p.shingle, p.numHashes, p.bands, p.nBuckets))
      .toDF("shingle", "num_hashes", "bands", "n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/meta")
  }

  private def readMeta(spark: SparkSession, indexDir: String): Params = {
    val r = spark.read.parquet(s"$indexDir/meta").head()
    Params(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  /** (doc_id, band, key, __kb) band rows for a document frame. */
  private def bandRows(docs: DataFrame, idCol: String, textCol: String,
      p: Params): DataFrame = {
    val rows = p.numHashes / p.bands
    Dedup.hashedShingleFrame(docs, idCol, textCol, p.shingle)
      .withColumn("__sig",
        Dedup.minhashSignatureFromHashesFast(col("__hhd"), p.numHashes))
      .select(col("__id").as("doc_id"),
        posexplode(Dedup.lshBandKeys(col("__sig"), p.bands, rows))
          .as(Seq("band", "key")))
      .withColumn("__kb", pmod(hash(col("key")), lit(p.nBuckets)))
  }

  /** (doc_id, hhd, __db) verification-set rows. */
  private def setRows(docs: DataFrame, idCol: String, textCol: String,
      p: Params): DataFrame =
    Dedup.hashedShingleFrame(docs, idCol, textCol, p.shingle)
      .select(col("__id").as("doc_id"), col("__hhd").as("hhd"))
      .withColumn("__db", pmod(hash(col("doc_id")), lit(p.nBuckets)))

  /** One-shot build from a base corpus snapshot: sign every document
    * (the offline cost any dedup system pays once per snapshot) and
    * write the bucket-partitioned band + set tables. Build cost is the
    * signing scan plus two bucket-count-bounded write shuffles —
    * corpus-linear, never corpus².
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, shingle: Int = 3, numHashes: Int = 16,
      bands: Int = 2, nBuckets: Int = DefaultBuckets): Unit = {
    val spark = docs.sparkSession
    require(numHashes % bands == 0, s"numHashes $numHashes not divisible by $bands")
    val p = Params(shingle, numHashes, bands, nBuckets)
    writeMeta(spark, indexDir, p)
    bandRows(docs, idCol, textCol, p)
      .write.mode("overwrite").partitionBy("__kb")
      .parquet(s"$indexDir/bands")
    setRows(docs, idCol, textCol, p)
      .write.mode("overwrite").partitionBy("__db")
      .parquet(s"$indexDir/sets")
  }

  /** Incremental append: sign ONLY the new batch, stage it, then apply
    * idempotent dynamic-overwrite rewrites of the touched buckets —
    * O(batch + touched buckets), independent of base size. A pending
    * marked stage from a crashed append rolls forward first (the apply
    * is re-runnable); re-appended doc_ids upsert (their old rows in
    * the touched buckets are replaced, the retry-idempotency this
    * protocol needs anyway).
    */
  def append(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String): Unit = {
    val spark = docs.sparkSession
    pendingCompactGuard(spark, indexDir)
    rollForwardAppend(spark, indexDir)
    if (docs.isEmpty) return
    val p = readMeta(spark, indexDir)
    val st = stageDir(indexDir)
    setRows(docs, idCol, textCol, p)
      .write.mode("overwrite").parquet(s"$st/sets")
    bandRows(docs, idCol, textCol, p)
      .write.mode("overwrite").parquet(s"$st/bands")
    StagedSwap.touchMarker(spark, s"$st/_STAGE_DONE")
    applyStagedAppend(spark, indexDir, p)
  }

  /** The idempotent apply: every run rewrites the batch's touched
    * buckets to the same content (live rows minus the staged doc_ids,
    * plus the staged rows), so any crash window re-runs safely.
    */
  private def applyStagedAppend(spark: SparkSession, indexDir: String,
      p: Params): Unit = {
    import spark.implicits._
    val st = stageDir(indexDir)
    val stagedBands = spark.read.parquet(s"$st/bands")
    val stagedSets = spark.read.parquet(s"$st/sets")
    val batchIds = stagedSets.select(col("doc_id")).distinct()
    val kbs = stagedBands.select(col("__kb")).distinct().as[Int].collect().toSeq
    val newBands = spark.read.parquet(s"$indexDir/bands")
      .filter(col("__kb").isin(kbs: _*))
      .join(batchIds, Seq("doc_id"), "left_anti")
      .unionByName(stagedBands)
      .localCheckpoint(true) // self-referential overwrite
    newBands.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__kb").parquet(s"$indexDir/bands")
    val dbs = stagedSets.select(col("__db")).distinct().as[Int].collect().toSeq
    val newSets = spark.read.parquet(s"$indexDir/sets")
      .filter(col("__db").isin(dbs: _*))
      .join(batchIds, Seq("doc_id"), "left_anti")
      .unionByName(stagedSets)
      .localCheckpoint(true)
    newSets.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__db").parquet(s"$indexDir/sets")
    val (fs, hp) = hfs(spark, st)
    if (!fs.delete(hp, true))
      throw new IllegalStateException(
        s"signature index append: could not clear staged batch $st")
  }

  /** Serve incoming-vs-base near-dup pairs from the index:
    * (id_new, id_base, jaccard ≥ threshold), bit-identical to
    * Dedup.crossCorpusNearDupPairs(base, incoming) at the index's
    * baked parameters. The incoming batch signs in-plan (its own cost);
    * the base side is read PRUNED twice — the band scan opens only the
    * batch's key buckets, the set scan only the candidate docs'
    * buckets — so serve cost is ∝ batch + matched buckets, never base
    * size. The batch band frame broadcasts when small (maybeBroadcast),
    * keeping the pruned base scan shuffle-free.
    */
  def servePairs(spark: SparkSession, indexDir: String, incoming: DataFrame,
      idCol: String, textCol: String, threshold: Double): DataFrame = {
    import spark.implicits._
    serveGuard(spark, indexDir)
    val p = readMeta(spark, indexDir)
    val inBands = bandRows(incoming, idCol, textCol, p)
      .select(col("doc_id").as("id_new"), col("band"), col("key"),
        col("__kb"))
      .persist()
    // touched key buckets: bounded ≤ nBuckets control read
    val kbs = inBands.select(col("__kb")).distinct().as[Int].collect().toSeq
    val baseBands = spark.read.parquet(s"$indexDir/bands")
      .filter(col("__kb").isin(kbs: _*))
      .select(col("doc_id").as("id_base"), col("band"), col("key"))
    val cand = baseBands
      .join(Dedup.maybeBroadcast(inBands.select(col("id_new"), col("band"),
        col("key"))), Seq("band", "key"))
      .select(col("id_new"), col("id_base"))
      // a cross-side pair colliding in several bands emits once per band
      .distinct()
      .persist()
    // candidate docs' set buckets: bounded ≤ nBuckets control read
    val dbs = cand
      .select(pmod(hash(col("id_base")), lit(p.nBuckets)).as("__db"))
      .distinct().as[Int].collect().toSeq
    val baseSets = spark.read.parquet(s"$indexDir/sets")
      .filter(col("__db").isin(dbs: _*))
      .select(col("doc_id").as("id_base"), col("hhd").as("__hb"))
    val inSets = Dedup.hashedShingleFrame(incoming, idCol, textCol, p.shingle)
      .select(col("__id").as("id_new"), col("__hhd").as("__ha"))
    val out = cand
      .join(Dedup.maybeBroadcast(inSets), "id_new")
      .join(baseSets, "id_base")
      .withColumn("jaccard",
        Dedup.jaccardLongSets(col("__ha"), col("__hb"), assumeSorted = true))
      .filter(col("jaccard") >= threshold)
      .select(col("id_new"), col("id_base"), col("jaccard"))
    inBands.unpersist()
    out
  }

  /** Maintenance: rewrite each bucket of both tables to one file —
    * pure layout, serving bit-identical before/after (spec-pinned).
    * Staged via the shared protocol; run in maintenance windows.
    */
  def compact(spark: SparkSession, indexDir: String): Unit = {
    // complete any torn maintenance first — a marked append stage means
    // the live dirs may be half-applied, and compact must snapshot a
    // consistent state
    recover(spark, indexDir)
    val bn = s"$indexDir/bands_compact_next"
    spark.read.parquet(s"$indexDir/bands").repartition(col("__kb"))
      .write.mode("overwrite").partitionBy("__kb").parquet(bn)
    StagedSwap.touchMarker(spark, s"$bn/_COMPACT_DONE")
    val sn = s"$indexDir/sets_compact_next"
    spark.read.parquet(s"$indexDir/sets").repartition(col("__db"))
      .write.mode("overwrite").partitionBy("__db").parquet(sn)
    StagedSwap.touchMarker(spark, s"$sn/_COMPACT_DONE")
    rollForwardCompacts(spark, indexDir)
  }

  /** Repair any torn maintenance: finish or discard staged compacts,
    * then roll a marked staged append forward (the apply is
    * idempotent) or discard an unmarked one (live dirs untouched).
    */
  def recover(spark: SparkSession, indexDir: String): Unit = {
    rollForwardCompacts(spark, indexDir)
    rollForwardAppend(spark, indexDir)
  }

  private def rollForwardCompacts(spark: SparkSession,
      indexDir: String): Unit = {
    StagedSwap.rollForward(spark, s"$indexDir/bands",
      s"$indexDir/bands_compact_next", "_COMPACT_DONE")
    StagedSwap.rollForward(spark, s"$indexDir/sets",
      s"$indexDir/sets_compact_next", "_COMPACT_DONE")
  }

  private def rollForwardAppend(spark: SparkSession,
      indexDir: String): Unit = {
    val st = stageDir(indexDir)
    if (!StagedSwap.exists(spark, st)) return
    if (StagedSwap.exists(spark, s"$st/_STAGE_DONE")) {
      applyStagedAppend(spark, indexDir, readMeta(spark, indexDir))
    } else {
      val (fs, hp) = hfs(spark, st)
      if (!fs.delete(hp, true))
        throw new IllegalStateException(
          s"signature index: could not discard incomplete append stage $st")
    }
  }

  private def serveGuard(spark: SparkSession, indexDir: String): Unit = {
    pendingCompactGuard(spark, indexDir)
    StagedSwap.pendingStageGuard(spark, stageDir(indexDir),
      s"run SignatureIndex.recover(spark, \"$indexDir\") first — a torn " +
        "append may have rewritten bands but not sets")
  }

  private def pendingCompactGuard(spark: SparkSession,
      indexDir: String): Unit = {
    StagedSwap.pendingStageGuard(spark, s"$indexDir/bands_compact_next",
      s"run SignatureIndex.recover(spark, \"$indexDir\") first")
    StagedSwap.pendingStageGuard(spark, s"$indexDir/sets_compact_next",
      s"run SignatureIndex.recover(spark, \"$indexDir\") first")
  }

  private def hfs(spark: SparkSession, p: String
      ): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }
}
