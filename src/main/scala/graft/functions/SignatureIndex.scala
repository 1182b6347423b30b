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
  * Layout under `indexDir` — IMMUTABLE generation dirs + an atomic
  * pointer, the Catalog bucket-manifest treatment (r12 verdict item
  * 2; `Catalog.scala` bucket layout is the same design for tables):
  *
  *  - `meta`  — one row: (shingle, num_hashes, bands, n_buckets),
  *    validated on every serve/append — band keys built under
  *    different parameters would silently collapse recall, so drift
  *    fails fast (the IncrementalDedup contract);
  *  - `bands_g{G}/__kb={k}/` — (doc_id, band, key) rows of key-hash
  *    bucket k as written by generation G (G=0 is the build; each
  *    append/compact is a new generation holding only the buckets it
  *    rewrote). Generation dirs are NEVER modified after their
  *    manifest commits — a reader that resolved its paths keeps
  *    reading a consistent snapshot while appends land;
  *  - `sets_g{G}/__db={k}/` — (doc_id, hhd) verification sets,
  *    bucketed by hash(doc_id);
  *  - `_manifest_v{N}.json` — bucket → generation-dir map for both
  *    tables, plus the append id it committed (idempotency token);
  *  - `_current` — the manifest version N, flipped atomically
  *    (StagedSwap.writeAtomic) as the SINGLE commit point.
  *
  * A serve batch touches only the bucket dirs its own keys hash to
  * (structural pruning — the paths are resolved from the manifest, so
  * no scan of untouched buckets even lists files), and exact-Jaccard
  * verification reads only the bucket dirs holding candidate base
  * docs.
  *
  * Serving is BIT-IDENTICAL to the in-plan recompute
  * (Dedup.crossCorpusNearDupPairs with the same parameters) — pinned
  * by SignatureIndexSpec and the t71 oracle row, which shares t49's
  * SQL.
  *
  * Crash safety: an append is STAGED first (`append_next/{bands,sets}`
  * + an `_APPEND_ID` token + `_STAGE_DONE`), then applied by writing
  * the touched buckets' new contents into a fresh generation dir and
  * flipping `_current`. Every window is covered: before `_STAGE_DONE`
  * the stage is garbage (recover discards it, live state untouched);
  * after it, recover re-runs the apply — and if the crash happened
  * AFTER the pointer flip, the manifest already records the stage's
  * `_APPEND_ID`, so the re-apply is skipped and the stage simply
  * cleared (exactly-once, not at-least-once). Readers never observe a
  * half-applied state because nothing mutates in place; a reader that
  * opened mid-append serves the pre-append snapshot bit-exactly
  * (spec-pinned). Old generations accumulate until [[vacuum]], whose
  * default grace window keeps the previous snapshot servable; full
  * reclaim (`graceVersions = 0`) belongs in maintenance windows.
  *
  * Writers are mutually exclusive: build/append/compact/recover/vacuum
  * each hold `_commit.lock` (StagedSwap.withFileLock, the Catalog
  * protocol) for their whole read→write→flip span — without it two
  * concurrent appends both compute generation N+1 and the loser's
  * acknowledged batch silently vanishes. Reads stay lock-free.
  */
object SignatureIndex {

  val DefaultBuckets = 64

  /** Bucket-count sizing for a known base-corpus size: append/serve
    * cost is ∝ the TOUCHED buckets' row counts, and a realistically
    * diverse batch's band keys hash into ~all buckets — so the unit of
    * rewrite/read amplification is base_band_rows / nBuckets. Size
    * buckets so that unit stays a bounded chunk (default ~4M band
    * rows ≈ 100 MB parquet): at 64 buckets a 10⁹-doc base puts ~31M
    * rows in every touched bucket and an append rewrites essentially
    * the whole base; at bucketsFor(1e9) = 477 buckets the same append
    * rewrites only the buckets it actually touches at ~4M rows each.
    * The default stays 64 for small corpora (fixture scale) where
    * per-bucket task overhead dominates. (Spec-pinned: floor,
    * monotonicity, and the 1e9 example.)
    */
  def bucketsFor(nBaseDocs: Long, bandsPerDoc: Int = 2,
      targetBandRowsPerBucket: Long = 4L << 20): Int =
    math.max(DefaultBuckets,
      math.ceil(nBaseDocs.toDouble * bandsPerDoc /
        targetBandRowsPerBucket - 1e-9).toInt)

  private def stageDir(indexDir: String) = s"$indexDir/append_next"

  /** Writer lock: every public mutation (build/append/compact/recover/
    * vacuum) runs its whole read→write→pointer-flip span under this
    * cross-process lock (StagedSwap.withFileLock — the Catalog
    * protocol). Without it two concurrent appends both compute
    * generation N+1 and the loser's acknowledged batch silently
    * vanishes from every later serve. READS take no lock: serves
    * resolve immutable generation paths through the manifest.
    */
  private val LockName = "_commit.lock"
  private def lockPath(indexDir: String) = s"$indexDir/$LockName"

  private case class Params(shingle: Int, numHashes: Int, bands: Int,
      nBuckets: Int)

  private val What = "signature index"
  private val GenPrefixes = Seq("bands_g", "sets_g")

  // ------------------------------------------------------- meta

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

  // --------------------------------------------------- manifest
  // Generation/manifest/pointer machinery lives in [[GenIndex]] — the
  // factored form of THIS index's r12 design, now shared with
  // TextIndex and VectorIndex (r13 verdict item 1). Bands and sets are
  // rewrite-style tables: every bucket maps to exactly ONE generation
  // dir (an append rewrites its touched buckets into the new
  // generation), so the Seq-valued refs stay singletons here.

  private def readManifest(spark: SparkSession,
      indexDir: String): GenIndex.Manifest =
    GenIndex.readManifest(spark, indexDir, What)

  // ------------------------------------------------------ signing

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

  // ----------------------------------------------------- lifecycle

  /** One-shot build from a base corpus snapshot: sign every document
    * (the offline cost any dedup system pays once per snapshot) and
    * write the generation-0 bucket dirs + manifest v0. Build cost is
    * the signing scan plus two bucket-count-bounded write shuffles —
    * corpus-linear, never corpus².
    *
    * `nBuckets` defaults to AUTO (`nBuckets <= 0`): one corpus count —
    * noise beside the signing scan — feeds [[bucketsFor]], so the
    * 10⁹-doc base the bucketsFor scaladoc warns about gets its 477
    * bounded-rewrite buckets BY DEFAULT instead of only when the
    * caller remembers (r13 verdict item 5). Pass an explicit positive
    * count to override; `targetBandRowsPerBucket` tunes the auto
    * sizing's rewrite-unit goal (and lets specs pin the wiring without
    * a 10⁹-row corpus).
    *
    * A build CLEARS any prior index state at `indexDir` first —
    * including a stale `append_next` stage from a crashed append of a
    * previous life, which must never roll forward over an index built
    * under new parameters (r12 ADVICE item 1).
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, shingle: Int = 3, numHashes: Int = 16,
      bands: Int = 2, nBuckets: Int = 0,
      targetBandRowsPerBucket: Long = 4L << 20): Unit = {
    val spark = docs.sparkSession
    require(numHashes % bands == 0, s"numHashes $numHashes not divisible by $bands")
    val nb =
      if (nBuckets > 0) nBuckets
      else bucketsFor(docs.count(), bandsPerDoc = bands,
        targetBandRowsPerBucket = targetBandRowsPerBucket)
    StagedSwap.withFileLock(spark, lockPath(indexDir)) {
      buildLocked(docs, idCol, textCol, indexDir, shingle, numHashes,
        bands, nb)
    }
  }

  private def buildLocked(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, shingle: Int, numHashes: Int,
      bands: Int, nBuckets: Int): Unit = {
    val spark = docs.sparkSession
    // clear prior index state — including a stale append_next stage
    // from a crashed append of a previous life, which must never roll
    // forward over an index built under new parameters (r12 ADVICE
    // item 1) — but NOT the lock file this writer is holding
    GenIndex.clearIndexState(spark, indexDir, LockName,
      "prior signature index state (stale stages must not survive a rebuild)")
    val p = Params(shingle, numHashes, bands, nBuckets)
    writeMeta(spark, indexDir, p)
    // one file per bucket (repartition on the partition column): the
    // r15 file-count lesson — task-parallel writes leave
    // tasks×buckets tiny files and every later read (append's
    // touched-bucket rewrite, the serve's bucket-pruned scan) pays an
    // open+footer per file; one exchange on the offline build buys
    // compact-quality layout from generation 0
    bandRows(docs, idCol, textCol, p)
      .repartition(col("__kb"))
      .write.mode("overwrite").partitionBy("__kb")
      .parquet(s"$indexDir/bands_g0")
    setRows(docs, idCol, textCol, p)
      .repartition(col("__db"))
      .write.mode("overwrite").partitionBy("__db")
      .parquet(s"$indexDir/sets_g0")
    val m = GenIndex.Manifest(0, "build", Map(
      "bands" -> GenIndex.bucketsIn(spark, s"$indexDir/bands_g0", "__kb")
        .map(_ -> Seq("bands_g0")).toMap,
      "sets" -> GenIndex.bucketsIn(spark, s"$indexDir/sets_g0", "__db")
        .map(_ -> Seq("sets_g0")).toMap), Map.empty)
    GenIndex.writeManifest(spark, indexDir, m)
    GenIndex.flipCurrent(spark, indexDir, 0)
  }

  /** Incremental append: sign ONLY the new batch, stage it, then write
    * the touched buckets' new contents into a fresh generation dir and
    * flip the manifest pointer. Cost is O(batch + touched buckets'
    * rows) — NOTE the qualifier: a realistically diverse batch's band
    * keys hash into ~every bucket, so at the 64-bucket default the
    * touched set IS ~the whole base and append cost scales with base
    * size. Operators with an append cadence must size `nBuckets` at
    * build time for their base corpus ([[bucketsFor]]) so each touched
    * bucket is a bounded rewrite unit; serve cost prunes by the same
    * buckets and gets the same bound. A pending marked stage from a
    * crashed append rolls forward first (exactly-once via the staged
    * `_APPEND_ID`); re-appended doc_ids upsert (their old rows in the
    * touched buckets are replaced).
    */
  def append(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String): Unit = {
    val spark = docs.sparkSession
    StagedSwap.withFileLock(spark, lockPath(indexDir)) {
      rollForwardAppend(spark, indexDir)
      if (!docs.isEmpty) {
        val p = readMeta(spark, indexDir)
        val st = stageDir(indexDir)
        setRows(docs, idCol, textCol, p)
          .write.mode("overwrite").parquet(s"$st/sets")
        bandRows(docs, idCol, textCol, p)
          .write.mode("overwrite").parquet(s"$st/bands")
        StagedSwap.writeAtomic(spark, s"$st/_APPEND_ID",
          java.util.UUID.randomUUID().toString)
        StagedSwap.touchMarker(spark, s"$st/_STAGE_DONE")
        applyStagedAppend(spark, indexDir)
      }
    }
  }

  /** The apply: write (live touched-bucket rows minus the staged
    * doc_ids, plus the staged rows) into generation dirs named by the
    * NEXT manifest version, commit the manifest recording the stage's
    * append id, flip the pointer, clear the stage. Exactly-once: a
    * re-run after a post-flip crash sees its own append id in the
    * current manifest and just clears the stage.
    */
  private def applyStagedAppend(spark: SparkSession,
      indexDir: String): Unit = {
    import spark.implicits._
    val st = stageDir(indexDir)
    val appendId = StagedSwap.readSmallFile(spark, s"$st/_APPEND_ID")
      .getOrElse(throw new IllegalStateException(
        s"marked append stage at $st has no _APPEND_ID token"))
    val cur = readManifest(spark, indexDir)
    if (cur.commitId == appendId) { // already applied, crash was post-flip
      StagedSwap.deleteChecked(spark, st, "already-applied append stage")
      return
    }
    val gen = cur.version + 1
    val stagedBands = spark.read.parquet(s"$st/bands")
    val stagedSets = spark.read.parquet(s"$st/sets")
    val batchIds = stagedSets.select(col("doc_id")).distinct()
    // touched buckets: bounded ≤ nBuckets control reads
    val kbs = stagedBands.select(col("__kb")).distinct().as[Int].collect().toSeq
    val dbs = stagedSets.select(col("__db")).distinct().as[Int].collect().toSeq
    // same one-file-per-bucket discipline as the build (r15): the
    // rewritten touched buckets come out of a doc_id-partitioned
    // anti join — without the repartition each bucket dir collects
    // one file per join task
    GenIndex.readBuckets(spark, indexDir, cur.refs("bands"), "__kb", kbs,
        withBucketCol = true, "doc_id bigint, band int, key string")
      .join(batchIds, Seq("doc_id"), "left_anti")
      .unionByName(stagedBands)
      .repartition(col("__kb"))
      .write.mode("overwrite").partitionBy("__kb")
      .parquet(s"$indexDir/bands_g$gen")
    GenIndex.readBuckets(spark, indexDir, cur.refs("sets"), "__db", dbs,
        withBucketCol = true, "doc_id bigint, hhd array<bigint>")
      .join(batchIds, Seq("doc_id"), "left_anti")
      .unionByName(stagedSets)
      .repartition(col("__db"))
      .write.mode("overwrite").partitionBy("__db")
      .parquet(s"$indexDir/sets_g$gen")
    val m = GenIndex.Manifest(gen, appendId, Map(
      "bands" -> (cur.refs("bands") ++
        GenIndex.bucketsIn(spark, s"$indexDir/bands_g$gen", "__kb")
          .map(_ -> Seq(s"bands_g$gen"))),
      "sets" -> (cur.refs("sets") ++
        GenIndex.bucketsIn(spark, s"$indexDir/sets_g$gen", "__db")
          .map(_ -> Seq(s"sets_g$gen")))), Map.empty)
    GenIndex.writeManifest(spark, indexDir, m)
    GenIndex.flipCurrent(spark, indexDir, gen)
    StagedSwap.deleteChecked(spark, st, "applied append stage")
  }

  /** Serve incoming-vs-base near-dup pairs from the index:
    * (id_new, id_base, jaccard ≥ threshold), bit-identical to
    * Dedup.crossCorpusNearDupPairs(base, incoming) at the index's
    * baked parameters. The incoming batch signs in-plan (its own
    * cost); the base side is read through the manifest's immutable
    * paths, PRUNED twice — the band read opens only the batch's key
    * buckets, the set read only the candidate docs' buckets — so
    * serve cost is ∝ batch + matched buckets, never base size (see
    * the [[append]] note on sizing nBuckets so "matched buckets"
    * stays a bounded fraction). The batch band frame broadcasts when
    * small (maybeBroadcast), keeping the pruned base read
    * shuffle-free. Because the resolved paths are generation dirs no
    * append ever rewrites, a frame returned here keeps serving ITS
    * snapshot even while appends commit; [[vacuum]]'s default grace
    * window additionally protects the previous snapshot, so only a
    * reader ≥2 commits stale can race a full-reclaim vacuum.
    *
    * Cache contract (shared with the other Dedup entry points): the
    * batch band frame and the candidate frame are persisted for their
    * multiple consumers — the caller clears the session cache once
    * the result is consumed.
    */
  def servePairs(spark: SparkSession, indexDir: String, incoming: DataFrame,
      idCol: String, textCol: String, threshold: Double): DataFrame = {
    import spark.implicits._
    val p = readMeta(spark, indexDir)
    val m = readManifest(spark, indexDir)
    val inBands = bandRows(incoming, idCol, textCol, p)
      .select(col("doc_id").as("id_new"), col("band"), col("key"),
        col("__kb"))
      .persist()
    // touched key buckets: bounded ≤ nBuckets control read
    val kbs = inBands.select(col("__kb")).distinct().as[Int].collect().toSeq
    val baseBands = GenIndex.readBuckets(spark, indexDir, m.refs("bands"),
        "__kb", kbs,
        withBucketCol = false, "doc_id bigint, band int, key string")
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
    val baseSets = GenIndex.readBuckets(spark, indexDir, m.refs("sets"),
        "__db", dbs,
        withBucketCol = false, "doc_id bigint, hhd array<bigint>")
      .select(col("doc_id").as("id_base"), col("hhd").as("__hb"))
    val inSets = Dedup.hashedShingleFrame(incoming, idCol, textCol, p.shingle)
      .select(col("__id").as("id_new"), col("__hhd").as("__ha"))
    cand
      .join(Dedup.maybeBroadcast(inSets), "id_new")
      .join(baseSets, "id_base")
      .withColumn("jaccard",
        Dedup.jaccardLongSets(col("__ha"), col("__hb"), assumeSorted = true))
      .filter(col("jaccard") >= threshold)
      .select(col("id_new"), col("id_base"), col("jaccard"))
  }

  /** Maintenance: rewrite every bucket of both tables to one file —
    * pure layout, serving bit-identical before/after (spec-pinned).
    * Commits like an append (fresh generation + pointer flip), so a
    * crash mid-compact leaves only orphan generation dirs the next
    * [[vacuum]] clears. Runs [[vacuum]] afterwards at its default
    * grace window, which keeps the immediately-previous manifest's
    * generations — so a reader that resolved its snapshot just before
    * the compact keeps serving it; only snapshots ≥2 versions old
    * need the explicit `vacuum(graceVersions = 0)` maintenance window.
    */
  def compact(spark: SparkSession, indexDir: String): Unit =
    StagedSwap.withFileLock(spark, lockPath(indexDir)) {
      compactLocked(spark, indexDir)
    }

  private def compactLocked(spark: SparkSession, indexDir: String): Unit = {
    // complete any torn append first: compact must snapshot a state
    // that includes every acknowledged-or-marked batch
    rollForwardAppend(spark, indexDir)
    val cur = readManifest(spark, indexDir)
    val gen = cur.version + 1
    GenIndex.readBuckets(spark, indexDir, cur.refs("bands"), "__kb",
        cur.refs("bands").keys.toSeq, withBucketCol = true,
        "doc_id bigint, band int, key string")
      .repartition(col("__kb"))
      .write.mode("overwrite").partitionBy("__kb")
      .parquet(s"$indexDir/bands_g$gen")
    GenIndex.readBuckets(spark, indexDir, cur.refs("sets"), "__db",
        cur.refs("sets").keys.toSeq, withBucketCol = true,
        "doc_id bigint, hhd array<bigint>")
      .repartition(col("__db"))
      .write.mode("overwrite").partitionBy("__db")
      .parquet(s"$indexDir/sets_g$gen")
    GenIndex.writeManifest(spark, indexDir,
      GenIndex.Manifest(gen, s"compact_g$gen", Map(
        "bands" -> GenIndex.bucketsIn(spark, s"$indexDir/bands_g$gen", "__kb")
          .map(_ -> Seq(s"bands_g$gen")).toMap,
        "sets" -> GenIndex.bucketsIn(spark, s"$indexDir/sets_g$gen", "__db")
          .map(_ -> Seq(s"sets_g$gen")).toMap), Map.empty))
    GenIndex.flipCurrent(spark, indexDir, gen)
    vacuumLocked(spark, indexDir, graceVersions = 1)
  }

  /** Delete generation dirs referenced by NO manifest inside the grace
    * window, and the manifest files older than that window. The
    * default `graceVersions = 1` keeps the immediately-previous
    * snapshot fully servable — a reader that resolved its paths just
    * before a concurrent commit is never invalidated (Catalog.vacuum's
    * keepLast treatment). `graceVersions = 0` reclaims everything but
    * the current snapshot: run THAT only in maintenance windows when
    * no reader holds an older snapshot.
    */
  def vacuum(spark: SparkSession, indexDir: String,
      graceVersions: Int = 1): Unit =
    StagedSwap.withFileLock(spark, lockPath(indexDir)) {
      vacuumLocked(spark, indexDir, graceVersions)
    }

  private def vacuumLocked(spark: SparkSession, indexDir: String,
      graceVersions: Int): Unit =
    GenIndex.vacuum(spark, indexDir, GenPrefixes, graceVersions, What)

  /** Repair any torn maintenance: re-materialize a lost `_current`
    * pointer (the torn-flip window of StagedSwap.writeAtomic's
    * non-atomic fallback — manifests are flip-ordered, so newest wins),
    * roll a marked staged append forward (exactly-once via its append
    * id) or discard an unmarked one, then vacuum out-of-grace
    * generations a crashed compact/apply left behind.
    */
  def recover(spark: SparkSession, indexDir: String): Unit =
    StagedSwap.withFileLock(spark, lockPath(indexDir)) {
      GenIndex.restoreCurrentIfMissing(spark, indexDir)
      rollForwardAppend(spark, indexDir)
      vacuumLocked(spark, indexDir, graceVersions = 1)
    }

  private def rollForwardAppend(spark: SparkSession,
      indexDir: String): Unit = {
    val st = stageDir(indexDir)
    if (!StagedSwap.exists(spark, st)) return
    if (StagedSwap.exists(spark, s"$st/_STAGE_DONE")) {
      applyStagedAppend(spark, indexDir)
    } else StagedSwap.deleteChecked(spark, st,
      "incomplete append stage (no _STAGE_DONE marker)")
  }

}
