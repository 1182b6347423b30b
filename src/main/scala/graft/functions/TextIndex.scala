package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent inverted text index: the sparse-retrieval counterpart of
  * VectorIndex. `build` tokenizes the corpus once and writes postings
  * (term, doc_id, tf, dl, df) PARTITIONED BY a term hash bucket — one
  * directory per bucket — plus a one-row corpus-stats table (N docs,
  * total tokens). `postingsFor` then reads ONLY the buckets the query
  * terms hash to: the `__tb IN (...)` filter is a partition filter, so
  * serving cost is proportional to the queried terms' postings, not
  * the corpus — a 100 TB corpus serves a 4-term query from 4 of
  * `nBuckets` directories and the rest is never opened.
  *
  * df is denormalized onto every posting row (it repeats per posting
  * but dictionary-encodes to nothing in parquet) so scoring needs NO
  * join at serve time; corpus-wide constants come from the 1-row stats
  * table. The BM25 a consumer computes from this index is pinned equal
  * to the full-scan t57 query by sharing its oracle.
  */
object TextIndex {

  val DefaultBuckets = 64

  /** One corpus pass: tokenize → (doc, term) tf with per-doc length
    * carried through the explode → per-term df joined back (one
    * vocab-cardinality shuffle), bucketed and written. Build cost is
    * two shuffles at (doc,term) / term cardinality — the offline cost
    * every retrieval system pays once per corpus snapshot.
    *
    * Postings are POSITIONAL (`pss` = sorted 0-based token positions
    * per posting): positions ride the same explode the tf aggregation
    * already pays and dictionary/delta-encode tightly in parquet, and
    * they are what turns the index from BM25-only into a phrase-
    * capable one ([[phraseMatches]]) — the standard positional-index
    * trade every production text index makes.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, nBuckets: Int = DefaultBuckets): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    StagedSwap.withFileLock(spark, s"$indexDir/_commit.lock") {
    val tokens = docs.select(col(idCol).as("doc_id"),
      TextFunctions.terms(col(textCol)).as("ts"))
    val tf = tokens
      .select($"doc_id", size($"ts").cast("long").as("dl"),
        posexplode($"ts").as(Seq("pos", "term")))
      .groupBy($"doc_id", $"term", $"dl")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list($"pos")).as("pss"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val stats = tokens.agg(
      count(lit(1)).as("n_docs"),
      sum(size($"ts").cast("long")).as("total_tokens"))
    stats.coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/corpus_stats")
    tf.join(df, "term")
      .withColumn("__tb", pmod(hash($"term"), lit(nBuckets)))
      .write.mode("overwrite").partitionBy("__tb")
      .parquet(s"$indexDir/postings")
    }
  }

  /** Incremental append — the VectorIndex.append twin for the text
    * index: tokenize ONLY the new documents, then rewrite ONLY the
    * postings buckets their terms hash to (dynamic partition
    * overwrite; untouched buckets are never read or written). The
    * denormalized df is what makes this subtle: a term's df changes
    * for its OLD postings too, so touched buckets are re-derived from
    * their combined (old + new) posting rows — df is recomputable
    * from the rows themselves, and terms in a touched bucket with no
    * new postings get back the df they already had. Corpus stats
    * accumulate. Append cost ∝ new-batch terms' buckets, independent
    * of corpus size; serving from an appended index is BIT-IDENTICAL
    * to a full rebuild (TextIndexSpec pins it).
    */
  def append(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, nBuckets: Int = DefaultBuckets): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    // an empty micro-batch (a legitimate foreachBatch delivery) must be
    // a no-op: sum(size) over 0 rows is NULL and the touched-bucket
    // rewrite would pointlessly rewrite nothing
    if (docs.isEmpty) return
    StagedSwap.withFileLock(spark, s"$indexDir/_commit.lock") {
    // BEFORE any staging: refusing mid-append would itself leave a
    // torn-append state (staged stats with no postings-done marker)
    StagedSwap.pendingStageGuard(spark, s"$indexDir/postings_compact_next",
      s"run TextIndex.recover(spark, \"$indexDir\") before appending")
    val tokens = docs.select(col(idCol).as("doc_id"),
      TextFunctions.terms(col(textCol)).as("ts"))
    val newTf = tokens
      .select($"doc_id", size($"ts").cast("long").as("dl"),
        posexplode($"ts").as(Seq("pos", "term")))
      .groupBy($"doc_id", $"term", $"dl")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list($"pos")).as("pss"))
      .withColumn("__tb", pmod(hash($"term"), lit(nBuckets)))
    // touched buckets: bounded ≤ nBuckets control read
    val touched = newTf.select($"__tb").distinct()
      .as[Int].collect().toSeq
    // Torn-append protection: postings and corpus_stats are two
    // separate writes; a crash between them would leave idf/avgdl
    // silently inconsistent with the postings. The post-append stats
    // are therefore STAGED FIRST under corpus_stats_next/ — its
    // presence marks an append in flight, corpusStats refuses to serve
    // past it, and recover() rolls the commit forward once the
    // postings-done marker proves the rewrite completed.
    val (n0, t0) = corpusStats(spark, indexDir)
    val st = tokens.agg(count(lit(1)).as("n"),
      sum(size($"ts").cast("long")).as("t")).head()
    val nextDir = s"$indexDir/corpus_stats_next"
    Seq((n0 + st.getLong(0), t0 + st.getLong(1)))
      .toDF("n_docs", "total_tokens")
      .coalesce(1).write.mode("overwrite").parquet(nextDir)
    val old = spark.read.parquet(s"$indexDir/postings")
      .filter($"__tb".isin(touched: _*))
      .select($"doc_id", $"term", $"dl", $"tf", $"pss", $"__tb")
    val combined = old.unionByName(
      newTf.select($"doc_id", $"term", $"dl", $"tf", $"pss", $"__tb"))
    val df = combined.groupBy($"term").agg(count(lit(1)).as("df"))
    val rewritten = combined.join(df, "term")
      .select($"term", $"doc_id", $"dl", $"tf", $"df", $"pss", $"__tb")
      // self-referential overwrite: the plan reads the same partitions
      // it replaces, so materialize before the write truncates them
      .localCheckpoint(true)
    rewritten.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__tb")
      .parquet(s"$indexDir/postings")
    touchMarker(spark, s"$nextDir/_POSTINGS_DONE")
    promoteStats(spark, indexDir)
    }
  }

  /** Hadoop FileSystem for a path — NOT java.io.File: the index dir
    * may be hdfs://, s3a://, or any scheme Spark writes to, and the
    * crash-safety machinery (markers, staged dirs) must live on the
    * SAME filesystem as the data or it is silently dead off-box.
    */
  private def hfs(spark: SparkSession,
      p: String): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }

  private def pathExists(spark: SparkSession, p: String): Boolean =
    StagedSwap.exists(spark, p)

  private def touchMarker(spark: SparkSession, p: String): Unit =
    StagedSwap.touchMarker(spark, p)

  /** Roll a staged append commit forward: copy corpus_stats_next into
    * corpus_stats and clear the staging dir. Only legal once the
    * postings rewrite is proven complete (the _POSTINGS_DONE marker).
    */
  private def promoteStats(spark: SparkSession, indexDir: String): Unit = {
    val nextDir = s"$indexDir/corpus_stats_next"
    spark.read.parquet(nextDir)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/corpus_stats")
    // checked: a silent false would leave the stage pending and make
    // every later serve refuse with a stale recover() hint
    StagedSwap.deleteChecked(spark, nextDir, "promoted stats stage")
  }

  /** Repair a torn append or compact. If the staged stats carry the
    * postings-done marker the crash hit AFTER the postings rewrite —
    * the commit rolls forward (promote staged stats). Without the
    * marker the postings rewrite itself may be partial and no
    * automatic repair is sound — fail loudly so the operator rebuilds
    * or replays the batch. A staged compact (content-identical by
    * construction) always either rolls forward or is discarded.
    */
  def recover(spark: SparkSession, indexDir: String): Unit =
    StagedSwap.withFileLock(spark, s"$indexDir/_commit.lock") {
    rollForwardCompact(spark, indexDir)
    val nextDir = s"$indexDir/corpus_stats_next"
    if (!pathExists(spark, nextDir)) return
    if (pathExists(spark, s"$nextDir/_POSTINGS_DONE")) {
      promoteStats(spark, indexDir)
    } else {
      throw new IllegalStateException(
        s"torn TextIndex append at $indexDir: staged stats exist but the " +
          "postings rewrite is not proven complete — rebuild the index " +
          "or replay the source batch after clearing corpus_stats_next")
    }
    }

  /** Finish (marker present) or discard (no marker) a staged compact
    * left by a crash — the shared [[StagedSwap]] protocol with this
    * index's dir/marker names. delete/rename return-false failures
    * throw naming the staged dir (r11 ADVICE — Hadoop reports most
    * failures by returning false, not throwing).
    */
  private def rollForwardCompact(spark: SparkSession, indexDir: String): Unit =
    StagedSwap.rollForward(spark, s"$indexDir/postings",
      s"$indexDir/postings_compact_next", "_COMPACT_DONE")

  /** Index-served PHRASE search: documents containing the exact
    * consecutive token sequence `phrase`, with occurrence counts.
    * Serve cost is the phrase terms' postings only (bucket partition
    * pruning via postingsFor — a 100 TB corpus answers a 2-word phrase
    * from 2 of `nBuckets` directories): per term a (doc, positions)
    * frame, inner-joined on doc (every phrase term must appear), then
    * the match set folds left-to-right IN-ROW —
    * start ∩ (positions(next) − 1) via transform+array_intersect — so
    * the per-doc cost is the posting-list arithmetic every positional
    * index pays, with no explode and no per-position shuffle. Output:
    * (doc_id, n_matches > 0), the start-position occurrence count.
    */
  def phraseMatches(spark: SparkSession, indexDir: String,
      phrase: Seq[String], nBuckets: Int = DefaultBuckets): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two terms")
    val posts = postingsFor(spark, indexDir, phrase.distinct, nBuckets)
      .select(col("doc_id"), col("term"), col("pss"))
    val frames = phrase.zipWithIndex.map { case (t, i) =>
      posts.filter(col("term") === t).select(col("doc_id"),
        col("pss").as(s"__p$i"))
    }
    val joined = frames.reduce((a, b) => a.join(b, "doc_id"))
    // fold: after step i the array holds the positions of term i in
    // valid prefix occurrences; array_intersect is set-semantics, which
    // is exact here because positions within one posting are distinct
    val ends = (1 until phrase.size).foldLeft(col("__p0")) { (acc, i) =>
      array_intersect(transform(acc, x => x + 1), col(s"__p$i"))
    }
    joined.select(col("doc_id"), size(ends).cast("long").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** Index-served PROXIMITY search: documents where `termA` and
    * `termB` co-occur within `window` tokens (unordered) — the
    * relevance/decontamination primitive between bag-of-words AND
    * (too loose) and exact phrase (too strict). Same serving shape as
    * [[phraseMatches]]: two bucket-pruned postings reads, one doc
    * join, then IN-ROW position arithmetic — `n_near` counts termA
    * positions with a termB within the window, `min_gap` is the
    * closest pair distance. The pair expansion is per-doc tf(A)·tf(B)
    * — bounded by document length, never corpus-sized.
    */
  def proximityMatches(spark: SparkSession, indexDir: String,
      termA: String, termB: String, window: Int,
      nBuckets: Int = DefaultBuckets): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val posts = postingsFor(spark, indexDir, Seq(termA, termB).distinct,
        nBuckets)
      .select(col("doc_id"), col("term"), col("pss"))
    val a = posts.filter(col("term") === termA)
      .select(col("doc_id"), col("pss").as("__pa"))
    val b = posts.filter(col("term") === termB)
      .select(col("doc_id"), col("pss").as("__pb"))
    // pa =!= pb: distinct terms can never share a position (harmless),
    // but termA == termB would otherwise match every occurrence with
    // ITSELF (n_near = tf, min_gap = 0 even at tf = 1); excluding the
    // self-pair makes the degenerate case mean "occurrences with
    // ANOTHER occurrence within the window" — the right semantics
    a.join(b, "doc_id")
      .select(col("doc_id"),
        size(filter(col("__pa"), pa =>
          exists(col("__pb"), pb =>
            pa =!= pb && abs(pa - pb) <= window)))
          .cast("long").as("n_near"),
        array_min(filter(flatten(transform(col("__pa"), pa =>
          transform(col("__pb"), pb => abs(pa - pb)))), d => d > 0))
          .cast("long").as("min_gap"))
      .filter(col("n_near") > 0)
  }

  /** Maintenance twin of append — the Catalog.compact story for the
    * inverted index: every append rewrites its TOUCHED buckets to
    * fresh files, but buckets repeatedly touched by small batches
    * accumulate files (dynamic partition overwrite replaces whole
    * partitions, so fragmentation here comes from the batch pattern's
    * task parallelism). Compaction rewrites each bucket to ONE file
    * with NO content change — df is already denormalized and correct,
    * so this is a pure layout rewrite; serving is bit-identical
    * before/after (spec-pinned) and the read-side benefit is fewer
    * file opens per probed bucket. Hash-repartitioning on the bucket
    * column sends each bucket to exactly one task (1 file each) while
    * buckets compact in parallel across tasks. Run in maintenance
    * windows, like Catalog.compact.
    */
  def compact(spark: SparkSession, indexDir: String): Unit =
    StagedSwap.withFileLock(spark, s"$indexDir/_commit.lock") {
    // staged, never in place: an in-place overwrite DELETES the live
    // postings before the job commits, so a mid-compact crash destroys
    // the only copy. Stage → marker → swap instead; every crash window
    // either keeps the old dir intact or leaves a marked complete copy
    // that recover()/the next compact rolls forward.
    rollForwardCompact(spark, indexDir)
    val next = s"$indexDir/postings_compact_next"
    spark.read.parquet(s"$indexDir/postings")
      .repartition(col("__tb"))
      .write.mode("overwrite").partitionBy("__tb").parquet(next)
    touchMarker(spark, s"$next/_COMPACT_DONE")
    rollForwardCompact(spark, indexDir)
    }

  /** Postings for a set of query terms. The bucket IN-list prunes
    * partition directories at planning time; the term filter prunes
    * row groups via parquet min/max inside the matching buckets.
    * Refuses to serve while a staged compact is pending — in the
    * post-delete pre-rename crash window the live postings dir is
    * already gone, and a direct read would fail with an unactionable
    * path-not-found instead of "run recover".
    */
  def postingsFor(spark: SparkSession, indexDir: String,
      terms: Seq[String], nBuckets: Int = DefaultBuckets): DataFrame = {
    import spark.implicits._
    StagedSwap.pendingStageGuard(spark, s"$indexDir/postings_compact_next",
      s"run TextIndex.recover(spark, \"$indexDir\") first")
    // bucket ids re-derived with the same codegen'd hash the writer
    // used; one bounded local job for the whole (tiny) term list
    val buckets = terms.toDF("term")
      .select(pmod(hash($"term"), lit(nBuckets)))
      .collect().map(_.getInt(0)).toSeq
    spark.read.parquet(s"$indexDir/postings")
      .filter($"__tb".isin(buckets.distinct: _*) && $"term".isin(terms: _*))
  }

  /** The (n_docs, total_tokens) row written at build time. Refuses to
    * serve while a staged append commit is pending (corpus_stats_next
    * present) — stats and postings may disagree until recover() rolls
    * the commit forward or the operator rebuilds.
    */
  def corpusStats(spark: SparkSession, indexDir: String): (Long, Long) = {
    val nextDir = s"$indexDir/corpus_stats_next"
    if (pathExists(spark, nextDir))
      throw new IllegalStateException(
        s"TextIndex at $indexDir has a pending append commit " +
          "(corpus_stats_next present) — run TextIndex.recover first")
    val r = spark.read.parquet(s"$indexDir/corpus_stats").head()
    (r.getLong(0), r.getLong(1))
  }

  /** One BM25 term contribution from exact integer inputs — the single
    * scoring tree the full-scan t57 query and the index-served
    * `bm25TopK` both produce, so their results are bit-identical:
    * rational idf ((N−df)·10⁴ div df — ln() is not correctly-rounded
    * and can never cross-engine-hash) times the k1=1.2 / b=0.75
    * saturation term cleared of fractions, tf·(k1+1)/(tf +
    * k1·(1−b+b·dl·N/T)) == 22·T·tf / (10·T·tf + 3·T + 9·dl·N): exact
    * longs into ONE double multiply + divide, an identical IEEE tree
    * in every engine.
    */
  def bm25Contrib(tfc: Column, dlc: Column, df: Long, n: Long,
      tot: Long): Column = {
    val idf = if (df <= 0) 0L else ((n - df) * 10000L) / df
    when(tfc > 0,
      lit(idf.toDouble) *
        ((tfc * lit(22L) * lit(tot)).cast("double") /
          (lit(10L) * lit(tot) * tfc + lit(3L) * lit(tot) +
            lit(9L) * dlc * lit(n)).cast("double")))
      .otherwise(lit(0.0))
  }

  /** Index-served BM25 top-k: candidates come from `postingsFor` (only
    * the query terms' buckets are opened — serve cost ∝ queried terms'
    * postings, never the corpus), per-term df rides denormalized on the
    * postings rows (a ≤|terms|-row bounded control read), and scoring
    * is ONE (doc, dl) aggregate over the candidate postings — no join,
    * no corpus scan. Output relation matches the full-scan query
    * exactly: (rank, doc_id, dl, tf_<term>…, score) ordered by score
    * desc then doc_id.
    *
    * Retrieval truncates to matching docs, so when fewer than k docs
    * contain any query term — or when the k-th candidate itself scores
    * 0 (integer idf vanishes for df within n/10⁴ of n, not only
    * df == n) — the top-k tail is zero-score rows the index cannot
    * fully order against non-candidates. `fallback` (the corpus, id +
    * text cols) closes that gap exactly: the k smallest-id
    * non-candidates join the ranking with score 0 and the ≤2k-row
    * union re-sorts. Only these cases touch the corpus.
    */
  def bm25TopK(spark: SparkSession, indexDir: String, terms: Seq[String],
      k: Int, fallback: Option[(DataFrame, String, String)] = None,
      nBuckets: Int = DefaultBuckets): DataFrame = {
    import spark.implicits._
    val (n, tot) = corpusStats(spark, indexDir)
    val posts = postingsFor(spark, indexDir, terms, nBuckets)
    // df per matched term: denormalized onto every posting, so this is
    // a bounded ≤|terms|-row control read (the t12/t22 pattern)
    val dfs = posts.groupBy($"term").agg(first($"df").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tfAggs = terms.map(t =>
      sum(when($"term" === t, $"tf").otherwise(0L)).as(s"tf_$t"))
    val scored = posts.groupBy($"doc_id", $"dl")
      .agg(tfAggs.head, tfAggs.tail: _*)
      .withColumn("score",
        terms.map(t => bm25Contrib(col(s"tf_$t"), $"dl",
          dfs.getOrElse(t, 0L), n, tot)).reduce(_ + _))
    // materialize the ≤k candidate rows once (bounded control read, the
    // t12/t22 pattern) — deciding whether the zero-score fallback is
    // needed must not rescan the postings
    val (topCand, candRows) = {
      val lim = scored.orderBy($"score".desc, $"doc_id").limit(k)
      val rows = lim.collect()
      (spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), lim.schema), rows)
    }
    // The fallback must also run when the k-th CANDIDATE scores 0:
    // integer idf ((n−df)·10⁴ div df) is 0 for any df within n/10⁴ of n
    // (not only df == n), so zero-score candidates can coexist with
    // non-candidates — and the full-scan ordering breaks their tie by
    // doc_id, which a smaller-id non-candidate can win. candRows is
    // ordered score desc, so the last row carries the k-th score.
    val scoreIdx = topCand.schema.fieldIndex("score")
    val kthIsZero = candRows.nonEmpty &&
      candRows.last.getDouble(scoreIdx) == 0.0
    val top = if (fallback.isEmpty ||
        (candRows.length >= k && !kthIsZero)) topCand else {
      val (docs, idCol, textCol) = fallback.get
      // k smallest-id docs OUTSIDE the candidate set at score 0: a
      // zero-score candidate can still outrank them only by doc_id, so
      // re-sorting the ≤2k-row union reproduces the full-scan order
      val zeros = docs
        .select(col(idCol).as("doc_id"),
          size(TextFunctions.terms(col(textCol))).cast("long").as("dl"))
        .join(scored.select($"doc_id"), Seq("doc_id"), "left_anti")
        .orderBy($"doc_id").limit(k)
        .select($"doc_id" +: $"dl" +:
          terms.map(t => lit(0L).as(s"tf_$t")) :+ lit(0.0).as("score"): _*)
      topCand.unionByName(zeros)
        .orderBy($"score".desc, $"doc_id").limit(k)
    }
    top
      .withColumn("rank",
        row_number().over(Window.orderBy($"score".desc, $"doc_id"))
          .cast("long"))
      .select($"rank" +: $"doc_id" +: $"dl" +:
        terms.map(t => col(s"tf_$t")) :+ $"score": _*)
      .orderBy($"rank")
  }
}
