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
  * `nprobe` lists each query probes: the `__cid IN (...)` filter
  * becomes a partition filter, so serving cost is proportional to the
  * probed lists, not the corpus — at 100 TB a query touches
  * nprobe/numCentroids of the data and the rest is never opened
  * (asserted by a spec on the scan's input files).
  */
object VectorIndex {

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
      coarseProbe: Option[Int] = None, cellTarget: Int = 256): Unit =
   StagedSwap.withFileLock(corpus.sparkSession,
       s"$indexDir/_commit.lock") {
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
    val meta = corpus.select(
      (col(idCol).as("neighbor_id") +: metaCols.map(col)): _*)
    val assigned = assignWith(corpus, idCol, vecCol, cents, coarseProbe, k)
      .select(col("__cid"), col("__aid").as("neighbor_id"), col("__avec").as("__cv"))
    val lists =
      if (metaCols.isEmpty) assigned
      else assigned.join(meta, "neighbor_id")
        .repartition(col("__cid"))
        .sortWithinPartitions(metaCols.map(col): _*)
    lists.write.mode("overwrite").partitionBy("__cid")
      .parquet(s"$indexDir/lists")
   }

  /** Incremental maintenance: assign a batch of NEW vectors against the
    * frozen centroids and append them into the matching list
    * partitions — no rebuild, no rewrite of existing files, O(batch).
    * Centroids intentionally stay fixed (rebuild to retrain): a stable
    * assignment function is what lets the append commute with serving.
    * Many small appends fragment the list files; rebuild when
    * maintenance windows allow, as with Catalog.compact.
    */
  def append(corpus: DataFrame, idCol: String, vecCol: String,
      indexDir: String, coarseProbe: Option[Int] = None): Unit = {
    val spark = corpus.sparkSession
    StagedSwap.withFileLock(spark, s"$indexDir/_commit.lock") {
    // in the compact crash window the live lists dir may be gone — an
    // unguarded append would silently recreate it holding ONLY this batch
    pendingCompactGuard(spark, indexDir)
    val cents = spark.read.parquet(s"$indexDir/centroids")
    // same auto rule as build: the frozen centroid count decides the path
    assignWith(corpus, idCol, vecCol, broadcast(cents), coarseProbe,
        cents.count().toInt)
      .select(col("__cid"), col("__aid").as("neighbor_id"), col("__avec").as("__cv"))
      .write.mode("append").partitionBy("__cid")
      .parquet(s"$indexDir/lists")
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
    StagedSwap.withFileLock(corpus.sparkSession,
        s"$indexDir/_commit.lock") {
    val cents = VectorFunctions.ivfTrainCentroids(
      corpus, idCol, vecCol, numCentroids, sampleSize, iters)
    cents.write.mode("overwrite").parquet(s"$indexDir/centroids")
    val cb = VectorFunctions.pqCodebooks(
      corpus, idCol, vecCol, m, codes, sampleSize, iters)
    cb.write.mode("overwrite").parquet(s"$indexDir/pq_codebooks")
    val enc = VectorFunctions.pqEncode(
      corpus, idCol, vecCol, cb, m, dims / m)
    VectorFunctions.ivfAssign(corpus, idCol, vecCol, broadcast(cents))
      .select(col("__cid"), col("__aid").as("neighbor_id"))
      .join(enc.withColumnRenamed("__eid", "neighbor_id"), "neighbor_id")
      .write.mode("overwrite").partitionBy("__cid")
      .parquet(s"$indexDir/lists")
    }
  }

  /** Serve top-k from a [[buildPq]] index: probe nprobe lists
    * (partition-pruned scan over CODE rows), score candidates by
    * asymmetric distance against a per-query broadcast LUT
    * (dot(q,x) ≈ Σₘ dot(qₘ, c[m,codeₘ]); no raw vector touched), then
    * exact-rerank only the `shortlist` ADC-best via a pointed id join
    * into `rerank` (the corpus table). Identical result to the
    * in-memory ivfPqTopK with the same parameters.
    */
  def topKPq(spark: SparkSession, indexDir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, rerank: DataFrame,
      nprobe: Int = 4, shortlist: Int = 64, dims: Int = 64,
      m: Int = 16): DataFrame = {
    import spark.implicits._
    pendingCompactGuard(spark, indexDir)
    val subDim = dims / m
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val cb = spark.read.parquet(s"$indexDir/pq_codebooks")
    val probes = VectorFunctions.ivfAssign(queries, idCol, vecCol,
        broadcast(cents), nprobe)
      .select(col("__aid").as("query_id"), col("__cid"))
    // list ids to open: bounded by numCentroids — control-plane collect
    val needed = probes.select("__cid").distinct().as[Long].collect()
    val lists = spark.read.parquet(s"$indexDir/lists")
      .filter(col("__cid").isin(needed.map(x => x: Any): _*))
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

  /** Maintenance twin of append — the fragmentation answer the append
    * scaladoc defers to maintenance windows: every append lands one
    * new file per touched list, so a high-frequency ingest leaves each
    * list directory with many small files and serving pays an open per
    * file. Compaction rewrites each inverted list to ONE file with no
    * content change (centroids untouched — assignment stays frozen);
    * serving is bit-identical before/after (spec-pinned).
    * Hash-repartitioning on the list id compacts lists in parallel,
    * one task per list.
    */
  def compact(spark: SparkSession, indexDir: String): Unit =
    StagedSwap.withFileLock(spark, s"$indexDir/_commit.lock") {
    // staged, never in place (same protocol as TextIndex.compact): an
    // in-place overwrite deletes the live lists before the job commits,
    // so a mid-compact crash destroys the only copy. Stage → marker →
    // swap; every crash window either keeps the old dir intact or
    // leaves a marked complete copy the next call rolls forward.
    rollForwardCompact(spark, indexDir)
    val next = s"$indexDir/lists_compact_next"
    spark.read.parquet(s"$indexDir/lists")
      .repartition(col("__cid"))
      .write.mode("overwrite").partitionBy("__cid").parquet(next)
    StagedSwap.touchMarker(spark, s"$next/_COMPACT_DONE")
    rollForwardCompact(spark, indexDir)
    }

  /** Repair a torn compact: finish a marked staged swap or discard an
    * unmarked one (the TextIndex.recover twin — a compact stage is
    * content-identical by construction, so both directions are safe).
    */
  def recover(spark: SparkSession, indexDir: String): Unit =
    StagedSwap.withFileLock(spark, s"$indexDir/_commit.lock") {
      rollForwardCompact(spark, indexDir)
    }

  /** Finish (marker present) or discard (no marker) a staged compact
    * left by a crash — the shared [[StagedSwap]] protocol with this
    * index's dir/marker names; delete/rename return-false failures
    * throw naming the staged dir (r11 ADVICE).
    */
  private def rollForwardCompact(spark: SparkSession, indexDir: String): Unit =
    StagedSwap.rollForward(spark, s"$indexDir/lists",
      s"$indexDir/lists_compact_next", "_COMPACT_DONE")

  /** Serve-path guard: in the post-delete pre-rename compact crash
    * window the live lists dir is gone — refuse with "run recover"
    * instead of a bare path-not-found (r11 ADVICE).
    */
  private def pendingCompactGuard(spark: SparkSession, indexDir: String): Unit =
    StagedSwap.pendingStageGuard(spark, s"$indexDir/lists_compact_next",
      s"run VectorIndex.recover(spark, \"$indexDir\") first")

  def topK(spark: SparkSession, indexDir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 4): DataFrame =
    serve(spark, indexDir, queries, idCol, vecCol, k, nprobe, None)

  /** Filtered vector search: serve top-k among only the corpus vectors
    * satisfying `predicate` (over the index's metaCols). The predicate
    * lands on the list scan itself — after partition pruning by probed
    * list, metadata clustering skips non-matching row groups — so the
    * candidate set shrinks BEFORE any distance math, instead of
    * post-filtering a k that may then starve. Equals
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
    pendingCompactGuard(spark, indexDir)
    val cents = spark.read.parquet(s"$indexDir/centroids")
    val probes = VectorFunctions.ivfAssign(queries, idCol, vecCol,
        broadcastableCentroids(cents), nprobe)
      .select(col("__aid").as("query_id"), col("__avec").as("__qv"), col("__cid"))
    // list ids to open: bounded by numCentroids — control-plane collect
    val needed = probes.select("__cid").distinct().as[Long].collect()
    val lists0 = spark.read.parquet(s"$indexDir/lists")
      .filter(col("__cid").isin(needed.map(x => x: Any): _*))
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
