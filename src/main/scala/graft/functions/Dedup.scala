package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at corpus scale: MinHash signatures, LSH
  * banding, exact Jaccard verification, and SimHash — the standard
  * shingle→minhash→band→bucket-join pipeline (Broder '97 / MMDS ch.3).
  *
  * Scale design: the only shuffle is the band-bucket self-join, whose
  * fan-out is bounded by bucket size (near-duplicate clusters), never
  * O(n²) over the corpus. Hash functions are md5-based so signatures are
  * engine-portable and deterministic: min over the lexicographic order
  * of fixed-width hex strings equals min over the hash integers.
  */
object Dedup {

  /** Column form of VectorFunctions.stableCeil — ceil biased down by
    * 1e-9. Every θ·n threshold the prefix joins derive goes through
    * this: the double product can land 1 ulp ABOVE the true integer
    * (0.28·25 = 7.000000000000001), and a plain ceil then overstates
    * the overlap bound by 1 and prunes an exact-boundary true pair
    * that exact verification would accept — contradicting "recall 1
    * by theorem". True thresholds never sit within 1e-9 of the
    * boundary from BELOW, so the bias is semantically free.
    */
  private def stableCeilCol(x: Column): Column = ceil(x - lit(1e-9))

  /** MinHash prime modulus (smallest prime above 2^32). */
  val MinhashPrime: Long = 4294967311L

  /** Affine permutation constants for hash i: Knuth-multiplicative
    * spread, forced odd, capped below 2^30 so aᵢ·H stays under 2^62
    * (no 64-bit overflow in any engine). Shared with the oracle SQL
    * generator in graft.queries.LlmOps.
    */
  def minhashA(i: Int): Long = ((2654435761L * (i + 1)) % (1L << 30)) | 1L
  def minhashB(i: Int): Long = (40503L * (i + 1) * 65537L) % (1L << 30)

  /** ONE md5 per shingle (the expensive part), reduced to its leading
    * 32 bits. Materialize this as its own column before fanning out to
    * the per-seed permutations — inlining it would re-evaluate the
    * digests once per seed (Catalyst does not CSE across lambda
    * functions).
    */
  def shingleBaseHashes(shingles: Column): Column =
    transform(shingles, x => conv(substring(md5(x), 1, 8), 16, 10).cast("long"))

  /** MinHash signature from pre-computed base hashes: `numHashes` cheap
    * affine permutations (aᵢ·H + bᵢ) mod p — the classic one-hash
    * minwise family.
    */
  def minhashSignatureFromHashes(baseHashes: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(baseHashes,
        h => (lit(minhashA(i)) * h + lit(minhashB(i))) % lit(MinhashPrime)))
    }: _*)

  /** Signature via the one-pass custom expression (value-identical to
    * the HOF formulation above — pinned by a test).
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.MinHashSig(
      ColumnBridge.expression(shingles), numHashes))
  }

  /** Signature from pre-computed base hashes via the digest-free
    * one-pass expression — identical values to `minhashSignature`
    * because the min is taken over the same hash multiset (and is
    * invariant to dedup/sort of the input).
    */
  def minhashSignatureFromHashesFast(baseHashes: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.MinHashSigFromHashes(
      ColumnBridge.expression(baseHashes), numHashes))
  }

  /** One-permutation signature (OPH with rotation densification) from
    * pre-computed base hashes: O(|set| + k) instead of O(|set|·k) —
    * the production signature for the AUTO path, whose k grows with
    * log n. NOT value-compatible with the k-permutation signatures
    * (a signature family is an internal signing↔banding contract);
    * the fixed-param declared outputs keep the classic family their
    * oracles re-derive. See expressions.MinHashSigOPH.
    */
  def minhashSignatureFromHashesOPH(baseHashes: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.MinHashSigOPH(
      ColumnBridge.expression(baseHashes), numHashes))
  }

  /** LSH band keys: signature split into `bands` groups of `rowsPerBand`
    * adjacent minhashes, each group md5-compressed to one bucket key.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|",
        (0 until rowsPerBand).map(r =>
          element_at(signature, b * rowsPerBand + r + 1).cast("string")): _*))
    }: _*)

  /** (id, distinct-shingle-set) frame for a document table; empty-set
    * rows (text shorter than the shingle width) are dropped and never
    * pair.
    */
  def shingleFrame(df: DataFrame, idCol: String, textCol: String,
      shingle: Int): DataFrame =
    df.select(col(idCol).as("__id"),
        TextFunctions.distinctCharNgrams(
          TextFunctions.normalize(col(textCol)), shingle).as("__sh"))
      .filter(size(col("__sh")) > 0)

  /** (id, sorted-distinct-shingle-HASH-set) frame — the fused fast path
    * (one digest per shingle, no shingle-string array): feeds both the
    * MinHash signature and the exact-Jaccard verification. Bit-
    * identical hashes to `shingleBaseHashes(shingleFrame(...))`.
    */
  def hashedShingleFrame(df: DataFrame, idCol: String, textCol: String,
      shingle: Int): DataFrame =
    df.select(col(idCol).as("__id"),
        TextFunctions.distinctCharNgramHashes(
          TextFunctions.normalize(col(textCol)), shingle).as("__hhd"))
      .filter(size(col("__hhd")) > 0)

  /** Candidate pairs (idA < idB) from a shingle frame via banded
    * MinHash buckets.
    *
    * The self-join carries a `merge` hint: left to the estimator the
    * small side broadcasts, and a broadcast build is a SEPARATE plan
    * subtree — the whole scan→shingle→minhash→band pipeline (the md5-
    * heavy part) executes twice, and at corpus scale the build side is
    * a corpus-wide broadcast. A shuffle join gives both sides an
    * identical Exchange which ReuseExchange collapses into one: the
    * signature pipeline runs exactly once at any scale (asserted by a
    * plan spec).
    */
  def candidatePairsFromShingles(sh: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    val rows = numHashes / bands
    val flat = sh
      .withColumn("__sig", minhashSignature(col("__sh"), numHashes))
      .select(col("__id"),
        posexplode(lshBandKeys(col("__sig"), bands, rows)).as(Seq("__b", "__key")))
      .hint("merge")
    flat.as("a").join(flat.as("b"),
        col("a.__b") === col("b.__b") && col("a.__key") === col("b.__key") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      // REQUIRED at every band count: a pair whose documents collide in
      // BOTH bands emits once per band — dropping this under bands=2
      // duplicates such pairs in the declared output
      .distinct()
  }

  /** Candidate pairs from a hashed shingle frame (`__id`, `__hhd`):
    * digest-free signature + banded self-join with the same reused-
    * exchange shape as candidatePairsFromShingles.
    *
    * `maxBucket` (off by default — declared outputs are exact LSH
    * semantics) caps band-bucket all-pairs expansion. A bucket of b
    * docs contributes b(b−1)/2 candidate pairs, so one boilerplate-
    * heavy bucket (every page sharing a template header hashes its
    * band to the same key) turns the candidate stream quadratic while
    * carrying almost no recall — near-dups that common usually collide
    * in other bands too. Over-cap buckets degrade to STAR pairs
    * (bucket-min × member, O(pop)) instead of being dropped: a giant
    * j≈1 clique shares the same band key in EVERY band, so no other
    * band could rescue a hard drop, while star pairs + connected
    * components still recover it as one group. At 100 TB this is the
    * difference between a bounded candidate stream and an accidental
    * cross join on template text.
    *
    * `candidateBudget` derives the cap from a TOTAL pair budget via
    * the bucket-population volume histogram (see the capped branch).
    * Any cap switches candidate generation to the bucket-aggregated
    * path (one exchange at bucket cardinality, pairs expanded in-plan
    * from sorted id lists) — measured 3.0× over the banded self-join
    * at the 100× probe with identical output.
    *
    * `oph = true` signs with the one-permutation family instead of the
    * classic k permutations. Measured and REJECTED as the default for
    * this workload (round 11, /tmp/probe100x): shingle sets (~140
    * elements median) are comparable in size to the policy's k (189 at
    * 500k docs), so ~a third of bins densify to COPIES of other bins'
    * minima — band keys lose independence and candidate volume rose
    * 79% (9.9M vs 5.5M pairs at the same budget), costing more in
    * verification than the one-pass signing saves (signature eval was
    * <2% of the path). Kept as an opt-in for corpora whose sets are
    * ≫ k, where the classic family's O(|set|·k) signing dominates.
    */
  def candidatePairsFromHashSets(hs: DataFrame, numHashes: Int,
      bands: Int, maxBucket: Option[Int] = None,
      candidateBudget: Option[Long] = None,
      oph: Boolean = false): DataFrame = {
    val rows = numHashes / bands
    val sig =
      if (oph) minhashSignatureFromHashesOPH(col("__hhd"), numHashes)
      else minhashSignatureFromHashesFast(col("__hhd"), numHashes)
    val exploded = hs
      .withColumn("__sig", sig)
      .select(col("__id"),
        posexplode(lshBandKeys(col("__sig"), bands, rows)).as(Seq("__b", "__key")))
    if (maxBucket.isEmpty && candidateBudget.isEmpty) {
      // Uncapped path (exact LSH semantics — the declared fixed-param
      // rows): banded self-join over one reused Exchange.
      val flat = exploded.hint("merge") // see candidatePairsFromShingles
      flat.as("a").join(flat.as("b"),
          col("a.__b") === col("b.__b") && col("a.__key") === col("b.__key") &&
            col("a.__id") < col("b.__id"))
        .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
        // REQUIRED at every band count: a pair whose documents collide in
        // BOTH bands emits once per band — dropping this under bands=2
        // duplicates such pairs in the declared output
        .distinct()
    } else {
      // Capped path: aggregate each band bucket to ONE row (sorted id
      // list) and expand pairs in-plan — one exchange at bucket
      // cardinality instead of a window-annotate + sort-merge self-join
      // over every banded row (three sorts of the bands × corpus row
      // stream; measured 3.0× end-to-end at the 100× probe: 40.9 s →
      // 13.7 s warm, identical pairs). Per-row expansion is bounded BY
      // the cap: all-pairs rows emit ≤ cap·(cap−1)/2 structs, and a
      // budget-derived cap satisfies cap·(cap−1)/2 ≤ budget by
      // construction (its own population's volume is inside the
      // cumulative sum). The bucket frame is persisted for the cap
      // histogram and the two lazy pair consumers (same lifecycle
      // contract as the shingle frames: the caller clears the cache
      // once the result is consumed).
      val buckets = exploded.groupBy("__b", "__key")
        .agg(sort_array(collect_list(col("__id"))).as("__ids"))
        .select(col("__ids"), size(col("__ids")).cast("long").as("__pop"))
        .persist()
      val budgetCap: Option[Long] = candidateBudget.map { budget =>
        // The policy's linear-candidate bound (≈ n·fanout) assumes
        // background pairs sit near θ/4; corpora with heavy shared
        // boilerplate blow past it through MID-SIZE buckets (measured
        // at the 100× probe: 85M candidate pairs against a 4M budget,
        // long-tailed — no fixed cap both holds the budget and keeps
        // small buckets). Enforce the contract BY CONSTRUCTION: take
        // the pair-volume histogram BY bucket population (bounded
        // cardinality — distinct populations, not buckets), cumulate
        // ascending, and keep the largest population whose running
        // volume still fits the budget. True near-dup clusters live in
        // small buckets (a j≈1 clique's bucket is the clique); what
        // the cut demotes is the boilerplate tail, and a true pair
        // confined to a demoted bucket can still surface through its
        // other bands — the recall floor is re-checked, not assumed
        // (t59's oracle row, DedupAutoSpec). Over-cap buckets are NOT
        // dropped wholesale: they keep their STAR pairs (see below),
        // so a giant j≈1 clique — which shares the same band key in
        // EVERY band and could never be rescued by another band —
        // still surfaces with O(pop) candidates.
        val w = org.apache.spark.sql.expressions.Window
          .orderBy("__pop")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val stats = buckets
          .groupBy("__pop").agg(count(lit(1)).as("__nb"))
          .withColumn("__vol",
            (col("__pop") * (col("__pop") - 1) / 2 * col("__nb")).cast("long"))
          .withColumn("__cum", sum(col("__vol")).over(w))
          .agg(
            coalesce(max(when(col("__cum") <= budget, col("__pop"))), lit(0L)),
            coalesce(sum(col("__vol")), lit(0L)),
            coalesce(max(when(col("__cum") <= budget, col("__cum"))), lit(0L)))
          .head()
        val (cap, totalVol, keptVol) =
          (stats.getLong(0), stats.getLong(1), stats.getLong(2))
        if (totalVol > keptVol)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"candidate budget cut engaged: ${totalVol - keptVol} of $totalVol " +
              s"all-pairs candidates sit in buckets above cap=$cap " +
              s"(budget=$budget); over-cap buckets contribute star pairs only " +
              "— clique connectivity is preserved, sub-threshold boilerplate " +
              "pairs inside them are not enumerated.")
        // never cut below trivial cluster width: tiny buckets ARE the
        // true-pair signal, so a budget smaller than their volume keeps
        // them anyway and simply overshoots
        math.max(cap, 8L)
      }
      val cap: Long = (maxBucket.map(_.toLong).toSeq ++ budgetCap.toSeq).min
      // under-cap buckets: all pairs, expanded from the sorted id list
      // (ids sorted ascending, so id_a < id_b by construction)
      val allPairs = buckets.filter(col("__pop") <= cap && col("__pop") >= 2)
        .select(explode(flatten(transform(col("__ids"), (x, i) =>
          transform(slice(col("__ids"), i + lit(2),
            greatest(col("__pop") - i - 1, lit(0)).cast("int")),
            y => struct(x.as("id_a"), y.as("id_b")))))).as("__p"))
        .select(col("__p.id_a"), col("__p.id_b"))
      // over-cap buckets degrade to star pairs: bucket-min × member —
      // O(pop) candidates that keep mega-cliques connected
      val starPairs = buckets.filter(col("__pop") > cap)
        .select(element_at(col("__ids"), 1).as("id_a"),
          explode(slice(col("__ids"), lit(2), (col("__pop") - 1).cast("int")))
            .as("id_b"))
        .select(col("id_a"), col("id_b"))
      allPairs.unionByName(starPairs)
        // REQUIRED at every band count: a pair colliding in several
        // bands emits once per band
        .distinct()
    }
  }

  /** Candidate near-duplicate pairs of `df` by MinHash-LSH over
    * character n-grams of normalized `textCol`, on the fused
    * hash-set path (one digest per shingle).
    */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      shingle: Int = 3, numHashes: Int = 16, bands: Int = 2,
      maxBucket: Option[Int] = None): DataFrame =
    candidatePairsFromHashSets(
      hashedShingleFrame(df, idCol, textCol, shingle), numHashes, bands,
      maxBucket)

  /** Exact Jaccard similarity between two distinct-element set columns
    * (HOF reference formulation; used for string shingle sets and by
    * the JaccardLongSets equivalence spec).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** Fused one-pass Jaccard for distinct `array<long>` sets (hot path
    * of candidate verification — see expressions.JaccardLongSets).
    */
  def jaccardLongSets(a: Column, b: Column,
      assumeSorted: Boolean = false): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.JaccardLongSets(
      ColumnBridge.expression(a), ColumnBridge.expression(b), assumeSorted))
  }

  /** Fused one-pass containment |A∩B|/min(|A|,|B|) for distinct
    * `array<long>` sets (see expressions.ContainmentLongSets).
    */
  def containmentLongSets(a: Column, b: Column,
      assumeSorted: Boolean = false): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.ContainmentLongSets(
      ColumnBridge.expression(a), ColumnBridge.expression(b), assumeSorted))
  }

  /** Broadcast `df` only when the optimizer's size estimate fits the
    * session's `autoBroadcastJoinThreshold`; above it (or with the
    * threshold disabled) return the frame unhinted, so the join
    * shuffles on its keys — cost proportional to candidates, never
    * corpus² — and AQE may still choose a runtime broadcast from
    * observed sizes. An unconditional hint is a scale bug: a corpus-
    * wide frame slams into the 8 GB broadcast cap / driver memory long
    * before 100 TB.
    */
  private[graft] def maybeBroadcast(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.PlanBridge
    val threshold = PlanBridge.autoBroadcastThresholdBytes(df.sparkSession)
    if (threshold > 0 && PlanBridge.optimizedSizeInBytes(df) <= threshold)
      broadcast(df)
    else df
  }

  /** Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold.
    * The candidate join keeps the exact verification off the O(n²) path.
    *
    * Lifecycle: the shingle frame backing the result is `persist()`ed
    * (it feeds the banding and both verification joins). In a
    * long-lived session, call `spark.catalog.clearCache()` (or
    * unpersist via the plan) once the result is consumed — Verify and
    * Bench both do this between queries.
    */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingle: Int = 3, numHashes: Int = 16,
      bands: Int = 2, maxBucket: Option[Int] = None,
      candidateBudget: Option[Long] = None, oph: Boolean = false): DataFrame = {
    // shingle + md5 is the expensive narrow stage — the fused
    // CharNgramHashSet pass materializes ONLY the distinct 32-bit
    // base-hash sets (no shingle-string array ever exists), persisted
    // once to feed both the signature banding (MinHashSigFromHashes:
    // the minhash min is invariant to the dedup/sort) and the
    // verification joins: one digest per shingle across the whole
    // query, and the cache holds compact long arrays (at warehouse
    // scale this would be a checkpointed signature table). A hash
    // collision merging two shingles shifts Jaccard by < 1/|set| with
    // probability ~2⁻³²·|set|².
    val sh = hashedShingleFrame(df, idCol, textCol, shingle).persist()
    val cand = candidatePairsFromHashSets(sh, numHashes, bands, maxBucket,
      candidateBudget, oph)
    // the per-document hash-set side is small relative to the candidate
    // stream when clusters are dense — broadcast it only when the size
    // estimate says it fits (see maybeBroadcast); otherwise shuffle on id.
    cand
      .join(maybeBroadcast(sh.select(col("__id").as("id_a"), col("__hhd").as("__ha"))), "id_a")
      .join(maybeBroadcast(sh.select(col("__id").as("id_b"), col("__hhd").as("__hb"))), "id_b")
      .withColumn("jaccard", jaccardLongSets(col("__ha"), col("__hb"), assumeSorted = true))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash banding policy — lshParamsFor's twin for the text family:
    * choose (rows-per-band r, bands b) from the corpus size instead of
    * fixing them, holding two contracts simultaneously:
    *
    *  - recall: a θ-similar pair collides in one band w.p. θʳ, so
    *    missing all b bands is (1-θʳ)ᵇ — b = ln(missProb)/ln(1-θʳ)
    *    keeps candidate recall ≥ 1-missProb as r rises;
    *  - linear candidates: background pairs at similarity s₀ (= θ/4 —
    *    the worst sub-threshold mass assumed to be corpus-dominating;
    *    θ/2-similar pairs are themselves rare in a near-dup regime,
    *    while truly random pairs sit near 0) collide ≈ b·s₀ʳ per pair,
    *    so total candidates ≈ C(n,2)·b·s₀ʳ; holding that ≤ n·fanout
    *    needs r ≥ ln(n·b/(2·fanout))/ln(1/s₀) — r must GROW with
    *    log n, which is exactly what a fixed (16,2) config misses:
    *    its per-pair collision rate is a constant, so candidate volume
    *    is quadratic in corpus size.
    *
    * The two couple (bigger r needs more bands, more bands loosen the
    * r bound), so iterate to the fixpoint — r is monotone under the
    * loop and b is capped at maxBands (same contract as lshParamsFor:
    * past the cap the recall floor is NOT met and banded MinHash is
    * the wrong tool for that θ/n regime).
    *
    * Returns (numHashes = b·r, bands = b) in nearDuplicatePairs' terms.
    */
  def minhashParamsFor(n: Long, threshold: Double, fanout: Int = 8,
      missProb: Double = 0.05, maxBands: Int = 128): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0, "jaccard threshold in (0,1)")
    val s0 = threshold / 4.0
    var r = 2
    var b = 2
    var stable = false
    var guard = 0
    while (!stable && guard < 100) {
      val bWant = math.max(2, VectorFunctions.stableCeil(
        math.log(missProb) / math.log(1.0 - math.pow(threshold, r.toDouble))))
      val bNext = math.min(bWant, maxBands)
      val rNext = math.max(r, VectorFunctions.stableCeil(
        math.log(n.toDouble * bNext / (2.0 * fanout)) /
          math.log(1.0 / s0)))
      stable = bNext == b && rNext == r
      if (bWant > maxBands && !stable)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"minhashParamsFor(n=$n, threshold=$threshold) wants $bWant bands; " +
            s"capping at $maxBands — recall >= ${1 - missProb} is NOT met in " +
            "this regime (consider a higher threshold or embedding-space dedup).")
      b = bNext
      r = rNext
      guard += 1
    }
    (b * r, b)
  }

  /** nearDuplicatePairs with the minhashParamsFor policy applied from
    * one cheap corpus count — the production entry point for corpora
    * whose size isn't known at authoring time; the fixed-param form
    * remains for oracle-pinned declared outputs. Same persist()
    * lifecycle contract as nearDuplicatePairs.
    *
    * Signatures stay the classic k-permutation family: the OPH
    * alternative was implemented, A/B-measured at the 100× probe and
    * rejected here — with shingle sets comparable in size to the
    * policy's k, densified bins copy other bins' minima, band keys
    * lose independence, and candidate volume rose 79% for a <2%
    * signing saving (see candidatePairsFromHashSets scaladoc; recall
    * is re-checked either way — DedupAutoSpec ≥0.95 on the fixture,
    * t59's oracle row ≥0.85 at sf0.01).
    *
    * `candidateBudget` overrides the policy's own n·fanout pair budget
    * (`Some(Long.MaxValue)` effectively disables the cut — every
    * bucket stays under an unreachable cap). Over-budget buckets
    * degrade to star pairs, never silent drops, so mega-cliques stay
    * connected either way.
    */
  def nearDuplicatePairsAuto(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingle: Int = 3, fanout: Int = 8,
      missProb: Double = 0.05, maxBucket: Option[Int] = None,
      candidateBudget: Option[Long] = None): DataFrame = {
    val n = df.count()
    val (numHashes, bands) = minhashParamsFor(n, threshold, fanout, missProb)
    // the production path ENFORCES the policy's own linear-candidate
    // contract (≈ n·fanout pairs) with the volume-budgeted bucket cut —
    // boilerplate-heavy corpora otherwise blow past it through mid-size
    // buckets (85M candidates vs a 4M budget measured at the 100×
    // probe); the declared fixed-param form stays exact LSH
    nearDuplicatePairs(df, idCol, textCol, threshold, shingle, numHashes,
      bands, maxBucket,
      candidateBudget = Some(candidateBudget.getOrElse(fanout.toLong * n)))
  }

  /** Cross-corpus near-dup pairs: incoming documents that near-duplicate
    * a STATIC base corpus — the incremental-crawl dedup step (drop new
    * documents already represented in the training set) that t23-style
    * self-dedup cannot express without re-pairing the base corpus with
    * itself. Candidates come from the same banded-MinHash construction
    * as nearDuplicatePairs, but the band join is STRICTLY cross-side:
    * base×base and new×new pairs never form, so the incremental cost is
    * ∝ |new batch| + matched bucket populations, independent of base
    * corpus self-similarity. At warehouse scale the base side's
    * signature/band frame is a persisted artifact (built once per
    * snapshot, exactly the VectorIndex pattern) and each crawl batch
    * joins against it; here both sides derive in-plan. No merge hint:
    * the sides are DIFFERENT pipelines (no exchange to reuse), and the
    * incoming batch is typically the small side — the estimator/AQE
    * broadcasting its band frame is precisely right.
    *
    * Lifecycle: BOTH shingle frames backing the result are
    * `persist()`ed (each feeds its banding and a verification join) —
    * same contract as nearDuplicatePairs: in a long-lived session, call
    * `spark.catalog.clearCache()` (or unpersist via the plan) once the
    * result is consumed; Verify and Bench both do this between queries.
    *
    * Output: (id_new, id_base, jaccard ≥ threshold).
    */
  def crossCorpusNearDupPairs(base: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String, threshold: Double, shingle: Int = 3,
      numHashes: Int = 16, bands: Int = 2): DataFrame = {
    val rows = numHashes / bands
    val shBase = hashedShingleFrame(base, idCol, textCol, shingle).persist()
    val shNew = hashedShingleFrame(incoming, idCol, textCol, shingle).persist()
    def bandFrame(sh: DataFrame): DataFrame = sh
      .withColumn("__sig", minhashSignatureFromHashesFast(col("__hhd"), numHashes))
      .select(col("__id"),
        posexplode(lshBandKeys(col("__sig"), bands, rows)).as(Seq("__b", "__key")))
    val cand = bandFrame(shNew).as("a")
      .join(bandFrame(shBase).as("b"),
        col("a.__b") === col("b.__b") && col("a.__key") === col("b.__key"))
      .select(col("a.__id").as("id_new"), col("b.__id").as("id_base"))
      // a cross-side pair colliding in both bands emits once per band
      .distinct()
    cand
      .join(maybeBroadcast(shNew.select(col("__id").as("id_new"), col("__hhd").as("__ha"))), "id_new")
      .join(maybeBroadcast(shBase.select(col("__id").as("id_base"), col("__hhd").as("__hb"))), "id_base")
      .withColumn("jaccard", jaccardLongSets(col("__ha"), col("__hb"), assumeSorted = true))
      .filter(col("jaccard") >= threshold)
      .select(col("id_new"), col("id_base"), col("jaccard"))
  }

  /** Containment pairs over WORD-n-gram hash sets: EXACT
    * |A∩B| / min(|A|,|B|) ≥ threshold — the ASYMMETRIC near-dup
    * measure that catches quotes, excerpts and boilerplate-plus-body
    * composites which symmetric Jaccard dilutes (a 100-shingle doc
    * fully containing a 20-shingle doc scores containment 1.0 but
    * Jaccard 0.2). Candidates come from the containment prefix filter
    * ([[prefixContainmentJoin]] — recall 1 by theorem), not banded
    * MinHash: the LSH route kept Jaccard-curve recall (< 1 for exactly
    * the asymmetric pairs this face exists to find) while its bucket
    * volume was the r11 verdict's heaviest non-audit row at 100×.
    *
    * The shingle unit is the word n-gram (the t56/t70 basis), NOT the
    * char-3-gram the r6–r11 face used, and the reason is measured, not
    * aesthetic: char-3-grams draw from a ~40³ universe, so at corpus
    * scale every doc shares most of its shingles with every other —
    * at sf0.1, 83% of ALL pairs were candidates under the exact prefix
    * filter (25.4M of 12.5M·2) AND the true θ=0.9 answer itself was
    * 160k pairs of boilerplate-character overlap, NOT quote reuse. No
    * candidate scheme is sub-quadratic on an element universe that
    * small (the LSH buckets were dense for the same reason). Word
    * grams make rarity real (vocab 27k on the same corpus, candidates
    * 68k, 1.75 s vs 7.8 s) and are the unit quote/excerpt detection
    * actually wants. ContainProbe re-derives both basis numbers.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingle: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      TextFunctions.wordNgramHashes(col(textCol), shingle).as("__hhd"))
    prefixContainmentJoin(sh, "__id", "__hhd", threshold,
        assumeSorted = true)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** Connected components over a duplicate-pair edge list: every node
    * gets the MINIMUM node id reachable from it (`rep`) — the step that
    * turns near-dup PAIRS into dedup GROUPS so a pipeline can keep one
    * representative per cluster. Iterative min-label propagation: each
    * round joins the current labels across the (symmetrized) edges and
    * keeps the per-node minimum, converging in O(cluster diameter)
    * rounds. Scale shape: each round is ONE shuffle of the edge list
    * joined to the vocab-of-nodes label frame (both persisted — lineage
    * stays flat, no exponential re-execution); near-dup clusters are
    * dense in practice, so diameters — and rounds — stay small. The
    * per-round convergence check is an aggregate on the label frame,
    * not a collect of it. Throws if `maxIter` rounds don't converge
    * (a pathological chain-shaped graph): raise maxIter, don't drop
    * the check — an unconverged label map silently under-merges.
    *
    * `nodes`: one column, the node id. `edges`: `id_a`, `id_b`.
    * Output: (<idCol>, rep).
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 20, pointerJump: Boolean = false): DataFrame = {
    val idCol = nodes.columns.head
    val e = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = nodes.select(col(idCol).as("__n"), col(idCol).as("rep")).persist()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neigh = e.join(labels, e("dst") === labels("__n"))
        .groupBy(col("src")).agg(min(col("rep")).as("__nrep"))
      // carry a changed flag in the same projection — labels only ever
      // DECREASE, so `__nrep < rep` is the complete change predicate
      // and the convergence check runs over this round's cached frame
      // instead of a next-vs-previous join (one join + shuffle fewer
      // per round)
      val combined = labels.join(neigh, labels("__n") === neigh("src"), "left")
        .select(col("__n"),
          least(col("rep"), coalesce(col("__nrep"), col("rep"))).as("rep"),
          (col("__nrep") < col("rep")).as("__chg"))
      // pointerJump adds rep := rep(rep) each round — pointer doubling
      // halves chain length per round, so convergence is O(log
      // diameter) instead of O(diameter), at the cost of one extra
      // label-table (vocab-sized, not edge-sized) self-join per round.
      // Default off: near-dup clusters are dense and shallow, where
      // the plain rounds are cheaper; turn on for chain-shaped graphs.
      // `combined` is persisted for the self-join — both join sides
      // reference it and they shuffle on DIFFERENT keys (rep vs __n),
      // so without the cache the edge-sized neighbor aggregation would
      // execute twice per round, erasing the O(log) win.
      val combinedCached = if (pointerJump) combined.persist() else combined
      val next = (if (!pointerJump) combinedCached else {
        val reps = combinedCached
          .select(col("__n").as("__rn"), col("rep").as("__rrep"))
        combinedCached.join(reps, combinedCached("rep") === reps("__rn"), "left")
          .select(col("__n"),
            least(col("rep"), coalesce(col("__rrep"), col("rep"))).as("rep"),
            coalesce(col("__chg"), lit(false))
              .or(col("__rrep") < col("rep")).as("__chg"))
      // localCheckpoint(eager), not persist: each round's plan
      // references `labels` TWICE (label frame + neighbor aggregation;
      // with pointerJump, `combined` twice more), so carrying lineage
      // DOUBLES the logical tree per round — by round ~20 Catalyst
      // re-analyzes a ~2^20-node plan and the driver OOMs building
      // plan strings. Checkpointing truncates each round to a flat
      // LogicalRDD: per-round planning cost stays constant no matter
      // the round count, and the eager materialization doubles as the
      // convergence check's full scan.
      }).localCheckpoint(true)
      val noChange = !next.agg(coalesce(max(col("__chg")), lit(false)))
        .head().getBoolean(0)
      // next is safely materialized out of lineage, so the round's
      // scratch caches can go (a dropped round's checkpoint blocks are
      // freed by the ContextCleaner once the frame goes unreferenced)
      if (pointerJump) combinedCached.unpersist()
      labels.unpersist()
      labels = next
      converged = noChange
      iter += 1
    }
    e.unpersist()
    if (!converged) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    }
    // Materialize the result OUT of the cache before returning:
    // localCheckpoint(eager) copies the (already cached — cheap) final
    // labels into ContextCleaner-managed RDD blocks that are freed when
    // the caller drops the frame, so the library leaves no CacheManager
    // entry behind that only an explicit unpersist could reclaim.
    val out = labels.select(col("__n").as(idCol), col("rep"))
      .localCheckpoint(true)
    labels.unpersist()
    out
  }

  /** 16-bit SimHash over whitespace tokens: per token take the first 4
    * hex chars of md5 as a 16-bit value; each bit votes ±1; the sketch
    * sets bits with positive vote sums. Small enough to verify in SQL,
    * same construction as the 64-bit production variant. One-pass
    * custom expression; `simhash16Hof` is the reference formulation.
    */
  def simhash16(textCol: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.SimHash16(
      ColumnBridge.expression(TextFunctions.tokens(textCol))))
  }

  /** 60-bit SimHash over whitespace tokens (production-scale variant;
    * see expressions.SimHash60).
    */
  def simhash60(textCol: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.SimHash60(
      ColumnBridge.expression(TextFunctions.tokens(textCol))))
  }

  /** SimHash near-duplicate pairs: band the 60-bit sketch into
    * `bands` equal slices — any pair within Hamming distance
    * `bands - 1` shares at least one clean band (pigeonhole), so for
    * maxDist ≤ bands-1 recall is exactly 1 — then verify
    * bit_count(a XOR b) ≤ maxDist. Join fan-out is band-bucket
    * population, never corpus². Same persist() lifecycle note as
    * nearDuplicatePairs: clear the cache once the result is consumed.
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, bands: Int = 4): DataFrame = {
    require(60 % bands == 0, "bands must divide 60")
    val width = 60 / bands
    val sk = df.select(col(idCol).as("__id"), simhash60(col(textCol)).as("__sk"))
      .persist()
    // merge hint for the same reason as candidatePairsFromShingles: one
    // reused Exchange instead of a broadcast build that re-runs the
    // sketch pipeline (and would broadcast the corpus at scale)
    val flat = sk.select(col("__id"), col("__sk"),
      posexplode(array((0 until bands).map { b =>
        shiftright(col("__sk"), b * width) % lit(1L << width)
      }: _*)).as(Seq("__b", "__key"))).hint("merge")
    flat.as("a").join(flat.as("b"),
        col("a.__b") === col("b.__b") && col("a.__key") === col("b.__key") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__sk").as("__ska"), col("b.__sk").as("__skb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("__ska").bitwiseXOR(col("__skb"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** HOF reference formulation of simhash16 (kept for the equivalence
    * spec and as documentation of the exact bit semantics).
    */
  def simhash16Hof(textCol: Column): Column = {
    val vals = transform(TextFunctions.tokens(textCol),
      t => conv(substring(md5(t), 1, 4), 16, 10).cast("int"))
    // bit j of v via exact double arithmetic (v < 2^16, j <= 15) — the
    // identical floor/pow form the oracle SQL uses
    def bit(v: Column, j: Column): Column =
      floor(v / pow(lit(2.0), j)).cast("int") % 2
    val bits = transform(sequence(lit(0), lit(15)), j =>
      when(lit(2) * size(filter(vals, v => bit(v, j) === 1)) > size(vals), 1)
        .otherwise(0))
    aggregate(
      sequence(lit(0), lit(15)), lit(0),
      (acc, j) => acc + element_at(bits, j + 1) * pow(lit(2.0), j).cast("int"))
  }

  /** Exact set-similarity self-join via prefix filtering (the
    * AllPairs/PPJoin candidate scheme): every pair with
    * Jaccard(A, B) ≥ theta, recall 1 BY THEOREM — no probabilistic
    * signatures. The complement to minhash LSH (nearDuplicatePairs):
    * LSH trades recall for candidate volume; prefix filtering is exact
    * and gets its sub-quadratic bound from GLOBAL FREQUENCY ORDERING —
    * each set contributes only its (n − ⌈θn⌉ + 1) RAREST elements to
    * the candidate join, so high-df boilerplate elements (the
    * quadratic killers in any element-equality join) are pushed out of
    * every prefix and generate no candidates at all.
    *
    * Candidate completeness: J(A,B) ≥ θ implies |A∩B| ≥
    * θ(|A|+|B|)/(1+θ) ≥ max(⌈θ|A|⌉, ⌈θ|B|⌉) (the per-side bound uses
    * min ≥ θ·max, which J ≥ θ itself implies), and two sets with
    * overlap ≥ o must share an element inside their (n−o+1)-prefixes
    * under ANY shared total order — so joining the (n−⌈θn⌉+1)-prefixes
    * misses nothing, and exact verification on the full sets means
    * pruning can only drop non-answers. The size filter
    * θ·max(|A|,|B|) ≤ min(|A|,|B|) inside the join is likewise pure
    * pruning.
    *
    * Scale shape: one df aggregation (shuffle at vocab cardinality), a
    * df join-back + per-set rank (shuffles keyed by element and id),
    * then the candidate self-join keyed by element — ONE reused
    * exchange (merge hint), bucket sizes bounded by prefix-df, small
    * by construction — and verification bounded by the candidate
    * count. Verification cost is dominated by shipping the two set
    * arrays per candidate, so sets should be HASHED to `array<long>`
    * upstream (wordNgramHashes): that path uses the fused one-pass
    * JaccardLongSets merge (no per-pair hashing or allocation) and
    * shuffles 8-byte elements instead of strings — measured 9.2×
    * end-to-end vs string grams on the near-dup corpus (sf0.1:
    * 18.1 s → 2.0 s). Generic element types verify via
    * array_intersect.
    *
    * `sets` must carry DISTINCT-element arrays (array_distinct or a
    * hash-set expression upstream); empty sets are dropped. Set
    * `assumeSorted = true` when `array<long>` sets are pre-sorted
    * (wordNgramHashes emits sorted sets) to skip the per-pair sort.
    * Same persist() lifecycle note as nearDuplicatePairs: the set
    * frame is cached for its three consumers — clear the cache once
    * the result is consumed.
    */
  def prefixJaccardJoin(sets: DataFrame, idCol: String, setCol: String,
      theta: Double, assumeSorted: Boolean = false): DataFrame = {
    require(theta > 0 && theta <= 1, s"theta in (0, 1], got $theta")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val longSets = sets.schema(setCol).dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val g = sets.select(col(idCol).as("__id"), col(setCol).as("__set"))
      .filter(size(col("__set")) > 0)
      .persist()
    val ex = g.select(col("__id"), size(col("__set")).as("__n"),
      explode(col("__set")).as("__el"))
    val dfreq = ex.groupBy(col("__el")).agg(count(lit(1)).as("__df"))
    val pref = ex.join(dfreq, "__el")
      .withColumn("__pos", row_number().over(
        Window.partitionBy(col("__id")).orderBy(col("__df"), col("__el"))))
      .filter(col("__pos") <= col("__n") - stableCeilCol(lit(theta) * col("__n")) + 1)
      .select(col("__el"), col("__id"), col("__n"))
      .hint("merge")
    val cands = pref.as("a").join(pref.as("b"),
        col("a.__el") === col("b.__el") && col("a.__id") < col("b.__id") &&
          // 1e-9 down-bias like stableCeilCol: θ·max can land 1 ulp
          // ABOVE the true product (0.28·25 = 7.000000000000001) and
          // prune an exact-boundary true pair the verification accepts
          greatest(col("a.__n"), col("b.__n")) * lit(theta) - lit(1e-9) <=
            least(col("a.__n"), col("b.__n")))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    val jac =
      if (longSets) jaccardLongSets(col("__sa"), col("__sb"), assumeSorted)
      else jaccard(col("__sa"), col("__sb"))
    cands
      .join(g.select(col("__id").as("id_a"), col("__set").as("__sa")), Seq("id_a"))
      .join(g.select(col("__id").as("id_b"), col("__set").as("__sb")), Seq("id_b"))
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= theta)
      .select(col("id_a"), col("id_b"),
        size(col("__sa")).cast("long").as("n_a"),
        size(col("__sb")).cast("long").as("n_b"),
        col("jaccard"))
  }

  /** Exact CONTAINMENT self-join via prefix filtering — the asymmetric
    * twin of [[prefixJaccardJoin]]: every pair with
    * |A∩B| / min(|A|,|B|) ≥ theta, recall 1 BY THEOREM. Containment
    * breaks the symmetric prefix scheme (the overlap bound is
    * ⌈θ·min(|A|,|B|)⌉ — a tiny quote inside a huge doc leaves the
    * huge side's prefix nearly full-length), so the candidate join is
    * prefix(smaller) × FULL element list(larger) instead of prefix ×
    * prefix: order the pair by (set size, id) and let the smaller set
    * contribute only its ⌊(1−θ)·n⌋+1 globally-RAREST elements.
    *
    * Candidate completeness: with A the (n, id)-lexicographic smaller
    * side, containment ≥ θ means |A∩B| ≥ ⌈θ·|A|⌉, so A has at most
    * |A| − ⌈θ|A|⌉ elements OUTSIDE A∩B — fewer than its
    * (|A| − ⌈θ|A|⌉ + 1)-prefix under ANY fixed total order, so at
    * least one prefix element lies in A∩B ⊆ B and the join on B's
    * full list finds it. Exact verification on the full sets means
    * pruning only ever drops non-answers.
    *
    * Scale shape vs prefixJaccardJoin: same df aggregation and per-set
    * rank; the candidate join keys prefix rows (rare by construction —
    * global frequency ordering pushes boilerplate out of every prefix)
    * against the corpus element rows, so the extra cost over the
    * symmetric join is one corpus-element-sized exchange and bucket
    * sizes are prefix-df(el) × df(el) — boilerplate elements carry
    * corpus-sized df but appear in ~no prefixes. Output-quadratic only
    * where the TRUE pair set is (duplicate cliques), like every exact
    * dedup join. Replaces the LSH-candidate containment path for t39:
    * char-3-gram sets at θ=0.9 made LSH bucket volume intrinsically
    * dense while recall stayed < 1; this is exact AND cheaper.
    *
    * `sets` must carry DISTINCT-element arrays; empty sets are
    * dropped. Output: (id_a < id_b, n_a, n_b, containment).
    */
  def prefixContainmentJoin(sets: DataFrame, idCol: String, setCol: String,
      theta: Double, assumeSorted: Boolean = false): DataFrame = {
    require(theta > 0 && theta <= 1, s"theta in (0, 1], got $theta")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val longSets = sets.schema(setCol).dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val g = sets.select(col(idCol).as("__id"), col(setCol).as("__set"))
      .filter(size(col("__set")) > 0)
      .persist()
    val ex = g.select(col("__id"), size(col("__set")).as("__n"),
      explode(col("__set")).as("__el"))
    val dfreq = ex.groupBy(col("__el")).agg(count(lit(1)).as("__df"))
    // every element keeps its rank in the GLOBAL (df, el) order — the
    // prefix is a rank filter, and the rank doubles as the PPJoin
    // positional filter's input on the full side
    val ranked = ex.join(dfreq, "__el")
      .withColumn("__pos", row_number().over(
        Window.partitionBy(col("__id")).orderBy(col("__df"), col("__el"))))
      .select(col("__el"), col("__id"), col("__n"), col("__pos"))
    val pref = ranked
      .filter(col("__pos") <= col("__n") - stableCeilCol(lit(theta) * col("__n")) + 1)
    // Positional filter (the PPJoin bound, adapted to containment): the
    // FIRST common element e* of a qualifying pair sits in the smaller
    // side's prefix (prefixes are downward-closed in the shared order),
    // and every other common element follows e* on BOTH sides, so
    // |A∩B| ≤ 1 + min(n_a−pos_a(e*), n_b−pos_b(e*)) must clear
    // ⌈θ·n_a⌉. A pair only needs its e*-row to survive — rows for
    // later common elements may be pruned freely. Without this, a
    // low-cardinality element universe (char-3-grams: ~400 distinct)
    // makes prefix × full-list degenerate to all-pairs — measured at
    // sf0.1: 25.4M raw candidate rows → ~65× fewer, same result.
    val cands = pref.as("a").join(ranked.as("b"),
        col("a.__el") === col("b.__el") &&
          (col("a.__n") < col("b.__n") ||
            (col("a.__n") === col("b.__n") && col("a.__id") < col("b.__id"))) &&
          lit(1) + least(col("a.__n") - col("a.__pos"),
            col("b.__n") - col("b.__pos")) >=
            stableCeilCol(lit(theta) * col("a.__n")))
      // normalize to id_a < id_b: the smaller SET may carry the larger id
      .select(least(col("a.__id"), col("b.__id")).as("id_a"),
        greatest(col("a.__id"), col("b.__id")).as("id_b"))
      .distinct()
    val cont =
      if (longSets) containmentLongSets(col("__sa"), col("__sb"), assumeSorted)
      else size(array_intersect(col("__sa"), col("__sb"))).cast("double") /
        least(size(col("__sa")), size(col("__sb")))
    cands
      .join(g.select(col("__id").as("id_a"), col("__set").as("__sa")), Seq("id_a"))
      .join(g.select(col("__id").as("id_b"), col("__set").as("__sb")), Seq("id_b"))
      .withColumn("containment", cont)
      .filter(col("containment") >= theta)
      .select(col("id_a"), col("id_b"),
        size(col("__sa")).cast("long").as("n_a"),
        size(col("__sb")).cast("long").as("n_b"),
        col("containment"))
  }

  /** Exact cross-document repeated-span profile — the suffix-dedup
    * operation of Lee et al. '22 ("Deduplicating Training Data Makes
    * Language Models Better") at word-gram granularity: any repeated
    * span of ≥ `gram` words contains a repeated `gram`-gram, so the
    * maximal runs of repeated grams ARE the maximal repeated spans
    * (up to gram-1 boundary words).
    *
    * Per surviving doc: number of maximal repeated spans, the longest
    * span, and the count/share of token positions covered by any span
    * (overlapping runs are interval-merged so no token counts twice).
    *
    * Scale design: the data-sized work is two token-cardinality stages
    * sharing the gh key — the df≥2 aggregate (map-side partials
    * collapse repeated grams before the wire) and the semi-join probe
    * (full (gh, doc, pos) rows) — the suffix-automaton lower bound up
    * to the constant. The gram pipeline (scan→split→md5) executes once
    * per stage; a collect_list bucket aggregation would fuse them into
    * one pass but puts EVERY occurrence of a boilerplate gram into one
    * row (the mega-clique skew the capped-LSH path had to rescue), so
    * the skew-safe two-stage form is deliberate. Everything after the
    * semi-join is partitioned and windowed by doc_id (near-dup-
    * population-sized). Never all-pairs. The gram key is the full md5
    * hex so the oracle can re-derive it; at petabyte scale you'd ship
    * unhex(md5) (16-byte binary, half the shuffle bytes) — grouping
    * semantics identical. The sampled 1/w-cost alternative is
    * winnowing (t44).
    */
  def repeatedSpanProfile(df: DataFrame, idCol: String, textCol: String,
      gram: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = df.select(col(idCol).as("doc_id"),
        split(TextFunctions.normalize(col(textCol)), " ").as("__ws"))
      .withColumn("n_tokens", size(col("__ws")).cast("long"))
    // sequence(0, n-gram) REVERSES when n < gram (negative stop) — the
    // short-doc filter is a correctness guard, not an optimization.
    val grams = docs.filter(col("n_tokens") >= gram)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), col("n_tokens").cast("int") - gram),
          i => md5(concat_ws(" ", slice(col("__ws"), i + 1, lit(gram))))))
          .as(Seq("pos", "gh")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("gh"))
    // grams in ≥2 distinct docs; partial-aggregated, then a semi join
    // that reuses the gh partitioning of the aggregate's exchange.
    val rep = grams.groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= 2).select(col("gh"))
    val rp = grams.join(rep, Seq("gh"), "left_semi")
    // maximal runs of consecutive repeated positions (islands), then
    // interval-merge runs whose token ranges still overlap (gap < gram).
    val wP = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = rp
      .withColumn("__isl", col("pos") - row_number().over(wP))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("pos")).as("s"),
        (max(col("pos")) + lit(gram.toLong - 1)).as("e"))
    val wS = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val spans = runs
      .withColumn("__brk", when(col("s") > coalesce(
        max(col("e")).over(wS.rowsBetween(Window.unboundedPreceding, -1)),
        lit(-1L)), lit(1L)).otherwise(lit(0L)))
      .withColumn("__grp",
        sum(col("__brk")).over(wS.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("__grp"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        max(col("e") - col("s") + 1).as("max_span_tokens"),
        sum(col("e") - col("s") + 1).as("covered_tokens"))
      .join(docs.select(col("doc_id"), col("n_tokens")), Seq("doc_id"))
      .withColumn("coverage",
        col("covered_tokens").cast("double") / col("n_tokens").cast("double"))
  }
}
