package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF index: train once, serve many.
  *
  * `build` trains deterministic k-means centroids (see
  * VectorFunctions.trainKMeansDeterministic), assigns the corpus in one
  * broadcast map-side pass, and writes the inverted lists PARTITIONED
  * BY list id — one directory per centroid. `topK` then reads ONLY the
  * `nprobe` lists each query probes, so serving cost is proportional
  * to the probed lists, not the corpus — at 100 TB a query touches
  * nprobe/numCentroids of the data and the rest is never opened
  * (asserted by a spec on the scan's input files).
  *
  * Storage is the shared [[GenIndex]] generation layout (r13 verdict
  * item 1 — the SignatureIndex treatment): inverted lists live in
  * IMMUTABLE `lists_g{G}/__cid={c}/` dirs mapped by
  * `_manifest_v{N}.json`, committed by an atomic `_current` flip.
  * Lists are the FRAGMENT-style table: an append writes ONLY its
  * batch's rows as a new generation and the manifest accumulates
  * per-list fragment refs — append stays O(batch), never O(touched
  * lists' rows) — while [[compact]] folds each list back to one file.
  * The old layout appended files into live list dirs, so a concurrent
  * serve could observe a TORN batch (some lists already holding new
  * rows, others not); now a reader that resolved its paths keeps
  * serving its snapshot bit-exactly while appends land, and a crash
  * before the flip leaves the committed snapshot untouched (orphan
  * generations are [[vacuum]]ed). Centroids are written once at build
  * and never mutated — the frozen assignment function is what lets
  * appends commute with serving.
  *
  * Writers (build/buildPq/append/compact/recover/vacuum) serialize
  * through `_commit.lock`; reads stay lock-free.
  */
object VectorIndex {

  private val What = "vector index"
  private val LockName = "_commit.lock"
  private def lockPath(indexDir: String) = s"$indexDir/$LockName"
  private val GenPrefixes = Seq("lists_g")

  private def readManifest(spark: SparkSession,
      indexDir: String): GenIndex.Manifest =
    GenIndex.readManifest(spark, indexDir, What)

  /** Commit a fresh generation holding ONLY `rows` (partitioned by
    * __cid) and flip: `replace = true` makes the new generation the
    * whole table (build/compact); `replace = false` appends its lists
    * as FRAGMENTS onto the existing refs (append).
    */
  private def commitGeneration(spark: SparkSession, indexDir: String,
      rows: DataFrame, cur: Option[GenIndex.Manifest], commitId: String,
      replace: Boolean, extras: Map[String, String] = Map.empty): Unit = {
    val gen = cur.map(_.version + 1).getOrElse(0)
    rows.write.mode("overwrite").partitionBy("__cid")
      .parquet(s"$indexDir/lists_g$gen")
    val written = GenIndex
      .bucketsIn(spark, s"$indexDir/lists_g$gen", "__cid")
    val prior: Map[Int, Seq[String]] =
      if (replace) Map.empty else cur.map(_.refs("lists")).getOrElse(Map.empty)
    val refs =
      if (replace) written.map(_ -> Seq(s"lists_g$gen")).toMap
      else prior ++ written.map(c =>
        c -> (prior.getOrElse(c, Seq.empty) :+ s"lists_g$gen"))
    // a fragment commit carries the build's extras forward unchanged
    val eff = if (extras.nonEmpty) extras
      else cur.map(_.extras).getOrElse(Map.empty)
    GenIndex.writeManifest(spark, indexDir,
      GenIndex.Manifest(gen, commitId, Map("lists" -> refs), eff))
    GenIndex.flipCurrent(spark, indexDir, gen)
  }

  /** Auto-scale defaults (the production path; round-8 probes proved
    * the fixed configs are quadratic cliffs):
    *  - `numCentroids ≤ 0` (the default) sizes the index with
    *    ivfParamsFor — k ~ n/cellTarget, so expected list population
    *    stays bounded as the corpus grows (a fixed k makes per-list
    *    scan work quadratic in n);
    *  - `coarseProbe = None` (the default) picks the assignment path
    *    by k: the fused two-level kernel once k ≥ TwoLevelMinCentroids
    *    (flat assignment is O(n·k) arithmetic plus an (n·k)-row window
    *    shuffle; the kernel is ~(1+p)·√k cosines, map-only, 19× on the
    *    assignment stage at 200k×782), flat below it where exactness
    *    is free. Pass an explicit probe count to force the kernel
    *    (probe ≥ ⌈√k⌉ reproduces flat exactly); queries at serve time
    *    still assign flat — their side is tiny.
    *
    * `metaCols` are carried into the inverted lists and each list's
    * files are clustered on them, so a filtered serve ([[topKFiltered]])
    * prunes twice: partition dirs by probed list, then row groups by
    * metadata min/max — the "filtered vector search" layout.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      indexDir: String, numCentroids: Int = 0, sampleSize: Int = 256,
      iters: Int = 2, metaCols: Seq[String] = Nil,
      coarseProbe: Option[Int] = None, cellTarget: Int = 256): Unit = {
    val spark = corpus.sparkSession
    StagedSwap.withFileLock(spark, lockPath(indexDir)) {
      GenIndex.clearIndexState(spark, indexDir, LockName,
        "prior vector index state (old generations must not survive a rebuild)")
      val k =
        if (numCentroids > 0) numCentroids
        else {
          // one cheap count sizes the index; clamp so tiny corpora never
          // ask the trainer for more centroids than vectors
          val n = corpus.count()
          math.min(n, VectorFunctions.ivfParamsFor(n, cellTarget).toLong).toInt
        }
      // the deterministic trainer needs sample ≥ k; auto-sized k can
      // outgrow the default sample, so scale it (training cost is
      // ~sample·k per Lloyd step — still bounded, never corpus-sized)
      val effSample = math.max(sampleSize, 2 * k)
      val cents = VectorFunctions.ivfTrainCentroids(
        corpus, idCol, vecCol, k, effSample, iters)
      cents.write.mode("overwrite").parquet(s"$indexDir/centroids")
      val lists = assignedLists(corpus, idCol, vecCol, cents, coarseProbe,
        k, metaCols)
      commitGeneration(spark, indexDir, lists, None, "build", replace = true,
        extras = Map("flavor" -> "raw", "meta_cols" -> metaCols.mkString(",")))
    }
  }

  /** The (list id, neighbor, vector, metaCols…) rows of one assignment
    * pass — shared by build and append so a fragment generation always
    * carries the SAME columns as the built generations (an append that
    * dropped the metaCols would make the cross-generation read of a
    * filtered index unresolvable).
    */
  private def assignedLists(corpus: DataFrame, idCol: String,
      vecCol: String, cents: DataFrame, coarseProbe: Option[Int], k: Int,
      metaCols: Seq[String]): DataFrame = {
    val assigned = assignWith(corpus, idCol, vecCol, cents, coarseProbe, k)
      .select(col("__cid"), col("__aid").as("neighbor_id"),
        col("__avec").as("__cv"))
    if (metaCols.isEmpty) assigned
    else assigned.join(corpus.select(
        (col(idCol).as("neighbor_id") +: metaCols.map(col)): _*),
        "neighbor_id")
      .repartition(col("__cid"))
      .sortWithinPartitions(metaCols.map(col): _*)
  }

  /** Incremental maintenance: assign a batch of NEW vectors against the
    * frozen centroids and commit them as a FRAGMENT generation — no
    * rebuild, no rewrite of existing rows, O(batch); the manifest flip
    * makes the batch visible atomically (a concurrent serve sees all
    * of it or none of it — the torn-batch window of the old live-dir
    * append is gone). Centroids intentionally stay fixed (rebuild to
    * retrain): a stable assignment function is what lets the append
    * commute with serving. Many small appends fragment the list refs;
    * [[compact]] folds them in maintenance windows, as with
    * Catalog.compact.
    */
  def append(corpus: DataFrame, idCol: String, vecCol: String,
      indexDir: String, coarseProbe: Option[Int] = None): Unit = {
    val spark = corpus.sparkSession
    if (corpus.isEmpty) return
    StagedSwap.withFileLock(spark, lockPath(indexDir)) {
      val cur = readManifest(spark, indexDir)
      // REQUIRED extras, never defaulted: an index built before the
      // flavor/meta_cols manifest fields (extras = {}) must refuse
      // actionably here — defaulting to "raw"/"" would bypass both
      // guards and commit incompatible fragments into a pre-upgrade PQ
      // or metaCols index (round-14 second-review finding #1)
      val flavor = cur.extra("flavor", What)
      // a raw-vector append into a PQ index would commit fragments the
      // code-row serving path cannot read — refuse with the real fix
      if (flavor == "pq")
        throw new IllegalStateException(
          s"vector index at $indexDir stores PQ codes — append raw " +
            "vectors by rebuilding with buildPq (codebooks are frozen " +
            "per build; incremental PQ appends would encode against " +
            "stale codebooks)")
      // a fragment must carry the SAME columns as the built
      // generations — including the build's metaCols (recorded in the
      // manifest), or the cross-generation read becomes unresolvable
      val metaCols = cur.extra("meta_cols", What)
        .split(",").filter(_.nonEmpty).toSeq
      val cents = spark.read.parquet(s"$indexDir/centroids")
      // same auto rule as build: the frozen centroid count decides the path
      val rows = assignedLists(corpus, idCol, vecCol, broadcast(cents),
        coarseProbe, cents.count().toInt, metaCols)
      commitGeneration(spark, indexDir, rows, Some(cur),
        java.util.UUID.randomUUID().toString, replace = false)
    }
  }

  /** Persisted IVF-PQ index — the memory/disk-bounded serving layout:
    * inverted lists store m one-byte-ish PQ codes + one reconstructed
    * norm per vector (~14× smaller than raw floats at m=16 over 64
    * dims) instead of the vectors themselves, so the probed-list scan
    * at serve time reads code bytes, not vectors. Raw vectors stay in
    * the corpus table (cold storage at 100 TB) and are touched only
    * for the exact rerank of the ADC shortlist — a pointed id join
    * bounded by queries × shortlist. Same deterministic trainers as
    * the in-memory ivfPqTopK, so serving from this index is
    * bit-identical to the in-memory path (spec-pinned, the s03/s04
    * precedent).
    */
  def buildPq(corpus: DataFrame, idCol: String, vecCol: String,
      indexDir: String, numCentroids: Int = 16, dims: Int = 64,
      m: Int = 16, codes: Int = 16, sampleSize: Int = 256,
      iters: Int = 2): Unit = {
    require(dims % m == 0, s"dims $dims not divisible into $m subspaces")
    val spark = corpus.sparkSession
    StagedSwap.withFileLock(spark, lockPath(indexDir)) {
      GenIndex.clearIndexState(spark, indexDir, LockName,
        "prior vector index state (old generations must not survive a rebuild)")
      val cents = VectorFunctions.ivfTrainCentroids(
        corpus, idCol, vecCol, numCentroids, sampleSize, iters)
      cents.write.mode("overwrite").parquet(s"$indexDir/centroids")
      val cb = VectorFunctions.pqCodebooks(
        corpus, idCol, vecCol, m, codes, sampleSize, iters)
      cb.write.mode("overwrite").parquet(s"$indexDir/pq_codebooks")
      val enc = VectorFunctions.pqEncode(
        corpus, idCol, vecCol, cb, m, dims / m)
      val rows = VectorFunctions
        .ivfAssign(corpus, idCol, vecCol, broadcast(cents))
        .select(col("__cid"), col("__aid").as("neighbor_id"))
        .join(enc.withColumnRenamed("__eid", "neighbor_id"), "neighbor_id")
      commitGeneration(spark, indexDir, rows, None, "build", replace = true,
        extras = Map("flavor" -> "pq", "meta_cols" -> ""))
    }
  }

  /** Serve top-k from a [[buildPq]] index: probe nprobe lists
    * (only the probed lists' fragment dirs are opened — CODE rows, no
    * raw vectors), score candidates by asymmetric distance against a
    * per-query broadcast LUT (dot(q,x) ≈ Σₘ dot(qₘ, c[m,codeₘ])), then
    * exact-rerank only the `shortlist` ADC-best via a pointed id join
    * into `rerank` (the corpus table). Identical result to the
    * in-memory ivfPqTopK with the same parameters.
    */
  def topKPq(spark: SparkSession, indexDir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, rerank: DataFrame,
      nprobe: Int = 4, shortlist: Int = 64, dims: Int = 64,
      m: Int = 16): DataFrame = {
    import spark.implicits._
    val subDim = dims / m
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val cb = spark.read.parquet(s"$indexDir/pq_codebooks")
    val probes = VectorFunctions.ivfAssign(queries, idCol, vecCol,
        broadcast(cents), nprobe)
      .select(col("__aid").as("query_id"), col("__cid"))
    // list ids to open: bounded by numCentroids — control-plane collect
    val needed = probes.select("__cid").distinct().as[Long].collect()
    val lists = readLists(spark, indexDir, needed.toSeq)
    val lut = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .select(col("query_id"), VectorFunctions.norm(col("__qv")).as("__qn"),
        posexplode(array((0 until m).map(i =>
          slice(col("__qv"), i * subDim + 1, subDim)): _*)).as(Seq("__m", "__qsv")))
      .withColumn("__m", col("__m").cast("long"))
      .join(broadcast(cb), Seq("__m"))
      .select(col("query_id"), col("__qn"), col("__m"), col("__code"),
        VectorFunctions.dot(col("__qsv"), col("__cvec")).as("__qdot"))
    val adc = probes.join(lists, Seq("__cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("__rnorm2"),
        posexplode(col("__codes")).as(Seq("__m", "__code")))
      .withColumn("__m", col("__m").cast("long"))
      .join(lut, Seq("query_id", "__m", "__code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(first(col("__qn")).as("__qn"), first(col("__rnorm2")).as("__r2"),
        sum(col("__qdot")).as("__adot"))
      .withColumn("__adc", col("__adot") / (col("__qn") * sqrt(col("__r2"))))
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").desc, col("neighbor_id"))
    val short = adc.withColumn("__srn", row_number().over(ws))
      .filter(col("__srn") <= shortlist)
    val rer = short.select(col("query_id"), col("neighbor_id"))
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")),
        "query_id")
      .join(rerank.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
        "neighbor_id")
      .withColumn("cos", VectorFunctions.cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    rer.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Maintenance twin of append — the fragmentation answer: every
    * append lands a fragment generation per touched list, so a
    * high-frequency ingest leaves each list with many small files
    * across generations and serving pays an open per file. Compaction
    * folds every list to ONE file in a fresh generation with no
    * content change (centroids untouched — assignment stays frozen);
    * serving is bit-identical before/after (spec-pinned).
    * Hash-repartitioning on the list id compacts lists in parallel,
    * one task per list. Commits like any generation (manifest +
    * pointer flip), then vacuums at the default grace window — a
    * crash mid-compact leaves only an orphan generation.
    */
  def compact(spark: SparkSession, indexDir: String): Unit =
    StagedSwap.withFileLock(spark, lockPath(indexDir)) {
      val cur = readManifest(spark, indexDir)
      val all = GenIndex.readBuckets(spark, indexDir, cur.refs("lists"),
        "__cid", cur.refs("lists").keys.toSeq, withBucketCol = true,
        listsDDL(spark, indexDir, cur))
      commitGeneration(spark, indexDir, all.repartition(col("__cid")),
        Some(cur), s"compact_g${cur.version + 1}", replace = true)
      GenIndex.vacuum(spark, indexDir, GenPrefixes, graceVersions = 1, What)
    }

  /** Repair torn maintenance: re-materialize a lost `_current` pointer
    * and vacuum orphan generations a crashed build/append/compact left
    * behind. There is no torn-append or torn-compact state anymore —
    * every mutation commits atomically at the pointer flip or not at
    * all.
    */
  def recover(spark: SparkSession, indexDir: String): Unit =
    StagedSwap.withFileLock(spark, lockPath(indexDir)) {
      GenIndex.restoreCurrentIfMissing(spark, indexDir)
      GenIndex.vacuum(spark, indexDir, GenPrefixes, graceVersions = 1, What)
    }

  /** Delete generations referenced by NO manifest inside the grace
    * window (default 1 keeps the previous snapshot servable; 0 is
    * maintenance-window-only full reclaim).
    */
  def vacuum(spark: SparkSession, indexDir: String,
      graceVersions: Int = 1): Unit =
    StagedSwap.withFileLock(spark, lockPath(indexDir)) {
      GenIndex.vacuum(spark, indexDir, GenPrefixes, graceVersions, What)
    }

  /** The lists' data schema varies by flavor (raw __cv vs PQ codes,
    * optional metaCols), so derive the empty-read DDL from an actual
    * fragment's footer (shared GenIndex helper; evaluated lazily by
    * readBuckets's by-name parameter — never per serve).
    */
  private def listsDDL(spark: SparkSession, indexDir: String,
      m: GenIndex.Manifest): String =
    GenIndex.footerDDL(spark, indexDir, m.refs("lists"), "__cid",
      "neighbor_id bigint, __cv array<float>")

  /** Probed lists read through the manifest's immutable fragment
    * paths, with the list id re-attached (basePath) — only the probed
    * lists' dirs are opened, and a frame returned here keeps serving
    * ITS snapshot while appends/compacts commit.
    */
  private[graft] def readLists(spark: SparkSession, indexDir: String,
      needed: Seq[Long]): DataFrame = {
    val m = readManifest(spark, indexDir)
    GenIndex.readBuckets(spark, indexDir, m.refs("lists"), "__cid",
      needed.map(_.toInt), withBucketCol = true, listsDDL(spark, indexDir, m))
  }

  /** The CURRENT snapshot's full lists relation (every list, fragment
    * refs resolved, list id attached) — the audit/maintenance read;
    * serving uses the probed subset.
    */
  private[graft] def currentLists(spark: SparkSession,
      indexDir: String): DataFrame = {
    val m = readManifest(spark, indexDir)
    GenIndex.readBuckets(spark, indexDir, m.refs("lists"), "__cid",
      m.refs("lists").keys.toSeq, withBucketCol = true,
      listsDDL(spark, indexDir, m))
  }

  /** The current snapshot's list → generation-dir refs — exposed for
    * specs that pin layout properties (fragment accumulation per
    * append, single-generation refs after compact, vacuum bounds).
    */
  private[graft] def currentRefs(spark: SparkSession,
      indexDir: String): Map[Int, Seq[String]] =
    readManifest(spark, indexDir).refs("lists")

  def topK(spark: SparkSession, indexDir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 4): DataFrame =
    serve(spark, indexDir, queries, idCol, vecCol, k, nprobe, None)

  /** Filtered vector search: serve top-k among only the corpus vectors
    * satisfying `predicate` (over the index's metaCols). The predicate
    * lands on the list scan itself — after structural pruning to the
    * probed lists' dirs, metadata clustering skips non-matching row
    * groups — so the candidate set shrinks BEFORE any distance math,
    * instead of post-filtering a k that may then starve. Equals
    * filter-then-search exactly (assignment is deterministic and
    * per-row, so it commutes with the filter) — pinned by s07.
    */
  def topKFiltered(spark: SparkSession, indexDir: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      predicate: org.apache.spark.sql.Column, nprobe: Int = 4): DataFrame =
    serve(spark, indexDir, queries, idCol, vecCol, k, nprobe, Some(predicate))

  private def serve(spark: SparkSession, indexDir: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int,
      predicate: Option[org.apache.spark.sql.Column]): DataFrame = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val probes = VectorFunctions.ivfAssign(queries, idCol, vecCol,
        broadcastableCentroids(cents), nprobe)
      .select(col("__aid").as("query_id"), col("__avec").as("__qv"), col("__cid"))
    // list ids to open: bounded by numCentroids — control-plane collect
    val needed = probes.select("__cid").distinct().as[Long].collect()
    val lists0 = readLists(spark, indexDir, needed.toSeq)
    val lists = predicate.map(lists0.filter).getOrElse(lists0)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(lists, Seq("__cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("__qv"), col("__cv"))
      .distinct()
      .withColumn("cos", VectorFunctions.cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** The centroids frame is tiny (numCentroids rows) — read it as a
    * local relation so the assignment cross join broadcasts without a
    * size-estimate gamble on a fresh parquet scan.
    */
  private def broadcastableCentroids(cents: DataFrame): DataFrame =
    broadcast(cents)

  /** Below this centroid count flat assignment is cheap and exact;
    * from here up the √k two-level decomposition pays (it saves
    * k − (1+p)·√k cosines per vector — at k=64/p=2 already 2.7×, and
    * growing with √k).
    */
  private[graft] val TwoLevelMinCentroids = 64

  private def assignWith(corpus: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, coarseProbe: Option[Int], k: Int): DataFrame =
    coarseProbe match {
      case Some(p) =>
        VectorFunctions.ivfAssignTwoLevel(corpus, idCol, vecCol, cents, p)
      case None if k >= TwoLevelMinCentroids =>
        VectorFunctions.ivfAssignTwoLevel(corpus, idCol, vecCol, cents,
          coarseProbe = 2)
      case None => VectorFunctions.ivfAssign(corpus, idCol, vecCol, cents)
    }
}
