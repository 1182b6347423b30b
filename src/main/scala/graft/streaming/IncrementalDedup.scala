package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.Catalog
import graft.functions.Dedup

/** Incremental corpus-wide near-duplicate detection: the streaming face
  * of Dedup.nearDuplicatePairs.
  *
  * State lives in append-log Catalog tables — the banded MinHash keys
  * (`<prefix>_bands`), the distinct base-hash sets (`<prefix>_sets`),
  * and a one-row parameter record (`<prefix>_meta`). Each batch
  * computes signatures for its TRULY NEW documents only
  * (retry-idempotent anti-join on already-seen ids), finds candidates
  * by joining the new band keys against history plus the in-batch
  * self-join, verifies with exact Jaccard, and APPENDS the new
  * signatures in O(batch) (Catalog.appendLog never rewrites history).
  *
  * Band history carries a key-hash bucket column (`__kb`) and every
  * append is range-clustered on it (Catalog.appendLogClustered), so
  * each historical ref's row groups have tight `__kb` min/max stats.
  * Serving collects the batch's touched buckets driver-side (a bounded
  * set, ≤ keyBuckets values) and filters history with a static isin —
  * pushed to the parquet scan, it skips non-matching row groups across
  * the whole history, so a small batch reads a bounded slice of an
  * arbitrarily large accumulated history instead of scanning all of it.
  *
  * Exactly-once pairs AND state: the streaming path stages a batch's
  * verified pairs to `<prefix>_pairs` — keyed by the Structured
  * Streaming batchId — BEFORE the band/set state commits, and the band
  * append itself is batchId-guarded. A crash or foreachBatch retry in
  * any window replays safely: if nothing committed, everything
  * recomputes identically and the staged batchId suppresses double
  * appends; if bands committed but sets didn't, the replay recomputes
  * (docs still unseen by the sets-driven anti-join) and the band guard
  * skips the duplicate state append; once sets commit, the batch's
  * docs are known and the replay is a no-op. Pairs are neither lost
  * nor duplicated, and band history never accumulates replay bloat.
  *
  * Parameters (shingle, numHashes, bands, keyBuckets) are persisted on
  * first creation and validated on every reopen — joining band keys
  * built under different parameters against history would silently
  * collapse recall, so drift fails fast instead. `maxBucket` is NOT
  * part of that contract: band keys don't depend on it, so it can be
  * raised/lowered/enabled on a live corpus without corrupting state —
  * it only gates which candidate buckets the NEXT batches consider
  * (pairs already emitted from a since-capped bucket stand; the staged
  * per-batchId pairs keep replays consistent even across a cap change).
  *
  * Bucket populations for the cap come from a dedicated stats log
  * (`<prefix>_bstats`): one batch-sized aggregate appended per batch,
  * read back pruned by the same `__kb` isin as the band history. The
  * alternative — counting over the pruned band history itself — would
  * shuffle that slice every batch, exactly the history-sized work the
  * broadcast-new-side design avoids; stats are maintained even with
  * the cap off so it can be enabled later with full history counts.
  */
final class IncrementalDedup(catalog: Catalog, threshold: Double,
    shingle: Int = 3, numHashes: Int = 16, bands: Int = 2,
    keyBuckets: Int = 16, prefix: String = "dedup",
    compactEvery: Int = 0, maxBucket: Int = 0) {

  private val bandsTable = s"${prefix}_bands"
  private val setsTable = s"${prefix}_sets"
  private val metaTable = s"${prefix}_meta"
  private val pairsTable = s"${prefix}_pairs"
  private val bstatsTable = s"${prefix}_bstats"

  @volatile private var paramsValidated = false

  /** Diagnostic wall-clock of the LAST processBatch's phases:
    * `compute` = signature + candidate + verify work up to the pairs
    * materialization; `state_commit` = the staged-pairs/stats/bands/
    * sets appends after it. One writer per batch (foreachBatch is
    * sequential), read by StreamBench's amortization sweep — the
    * per-batch fixed cost lives almost entirely in `state_commit`'s
    * four catalog commits, which are O(batch) in DATA but constant in
    * JOB overhead, so docs/s must rise with batch size until compute
    * dominates.
    */
  @volatile var lastPhases: Map[String, Double] = Map.empty

  private def ensureTables(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.types._
    import spark.implicits._
    if (!catalog.exists(metaTable))
      catalog.appendLog(metaTable,
        Seq((shingle, numHashes, bands, keyBuckets))
          .toDF("shingle", "num_hashes", "bands", "key_buckets"))
    if (!paramsValidated) {
      val stored = catalog.read(metaTable)
        .select("shingle", "num_hashes", "bands", "key_buckets")
        .as[(Int, Int, Int, Int)].head()
      val mine = (shingle, numHashes, bands, keyBuckets)
      require(stored == mine,
        s"$prefix state was created with (shingle, numHashes, bands, keyBuckets)=" +
          s"$stored but reopened with $mine — band keys would silently " +
          "mismatch history and recall would collapse")
      paramsValidated = true
    }
    if (!catalog.exists(bandsTable))
      catalog.appendLog(bandsTable, spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL(
          "doc_id BIGINT, band INT, key STRING, __kb INT, __batch_id BIGINT")))
    if (!catalog.exists(setsTable))
      catalog.appendLog(setsTable, spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL("doc_id BIGINT, hhd ARRAY<BIGINT>")))
    if (!catalog.exists(bstatsTable))
      catalog.appendLog(bstatsTable, spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL(
          "band INT, key STRING, __kb INT, n BIGINT, __batch_id BIGINT")))
  }

  /** Process one batch of documents; returns the verified new duplicate
    * pairs (id_a < id_b, jaccard ≥ threshold) this batch completes.
    * With a `batchId`, the pairs are ALSO staged durably to the pairs
    * log before the state commits, idempotently per batchId (the
    * streaming path's exactly-once contract); without one, the caller
    * owns pair durability and only the band/set state commits.
    */
  def processBatch(docs: DataFrame, idCol: String, textCol: String,
      batchId: Option[Long] = None): DataFrame = {
    // The bucket-stats replay guard keys on batchId: without one, a
    // crash between the bstats append and the bands append re-appends
    // the same batch's stats under __batch_id=-1 on retry, permanently
    // double-counting populations and silently tightening the
    // maxBucket cap. So stats maintenance REQUIRES a batchId.
    require(batchId.isDefined || maxBucket <= 0,
      "maxBucket > 0 maintains bucket-population stats whose " +
        "crash-replay idempotency depends on a batchId; pass " +
        "batchId=Some(n) (foreachBatch provides one) or set maxBucket=0")
    val spark = docs.sparkSession
    val tCompute0 = System.nanoTime()
    ensureTables(spark)
    val known = catalog.read(setsTable).select(col("doc_id"))
    val fresh = Dedup.hashedShingleFrame(docs, idCol, textCol, shingle)
      .select(col("__id").cast("long").as("doc_id"), col("__hhd").as("hhd"))
      .join(known, Seq("doc_id"), "left_anti") // retries re-add nothing
      .persist()
    val rows = numHashes / bands
    val newFlat = fresh
      .withColumn("__sig", Dedup.minhashSignatureFromHashesFast(col("hhd"), numHashes))
      .select(col("doc_id"),
        posexplode(Dedup.lshBandKeys(col("__sig"), bands, rows))
          .as(Seq("band", "key")))
      .withColumn("__kb", pmod(hash(col("key")), lit(keyBuckets)))
      .withColumn("__batch_id", lit(batchId.getOrElse(-1L)))
      .persist()
    // the batch's touched key buckets, collected driver-side — bounded
    // by keyBuckets, and the static isin filter pushes to the parquet
    // scan where clustered row-group stats skip non-matching history
    val kbs = newFlat.select("__kb").distinct().collect().map(_.getInt(0)).toSeq
    val hist0 = catalog.read(bandsTable)
    val hist = if (kbs.isEmpty) hist0.filter(lit(false))
               else hist0.filter(col("__kb").isin(kbs.map(Int.box): _*))
    // per-batch bucket-population stats: a batch-sized aggregate,
    // appended to the stats log below alongside the bands
    val batchStats = newFlat.groupBy(col("band"), col("key"), col("__kb"))
      .agg(count(lit(1)).as("n"))
      .persist()
    // the cap reads CUMULATIVE populations (history stats, pruned by
    // the same touched-bucket isin, plus this batch) and removes
    // over-populated buckets from the PROBE side — which starves both
    // the new-vs-history and new-vs-new joins of those buckets, so a
    // template-heavy burst can't go quadratic against a big history
    val probe = if (maxBucket <= 0) newFlat else {
      val histStats0 =
        if (kbs.isEmpty) catalog.read(bstatsTable).filter(lit(false))
        else catalog.read(bstatsTable)
          .filter(col("__kb").isin(kbs.map(Int.box): _*))
      // a replay must not count the batch's OWN staged stats as
      // history (stats commit before bands, so the crash window
      // replays with them durable): double-counting would cap buckets
      // the original attempt probed, silently dropping pairs from the
      // returned frame that the first attempt already staged
      val histStats = batchId.map(bid =>
        histStats0.filter(col("__batch_id") =!= bid)).getOrElse(histStats0)
      val over = batchStats
        .join(histStats.groupBy(col("band"), col("key"))
          .agg(sum(col("n")).as("hist_n")), Seq("band", "key"), "left")
        .filter(coalesce(col("hist_n"), lit(0L)) + col("n") > maxBucket)
        .select(col("band"), col("key"))
      newFlat.join(Dedup.maybeBroadcast(over), Seq("band", "key"), "left_anti")
    }
    // new-vs-history (unordered → normalize) + new-vs-new (a < b).
    // The batch side broadcasts when its size estimate fits (same gate
    // as the batch pipeline), so the accumulated history is streamed
    // map-side and never shuffled — per-batch cost is a PRUNED history
    // scan plus batch-sized state, not a history shuffle.
    val nh = Dedup.maybeBroadcast(probe).as("a").join(hist.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("id_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("id_b"))
    val nn = probe.as("a").join(probe.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val cand = nh.unionByName(nn).distinct()
    val sets = catalog.read(setsTable).unionByName(fresh.select("doc_id", "hhd"))
    val pairs = cand
      .join(sets.select(col("doc_id").as("id_a"), col("hhd").as("__ha")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("hhd").as("__hb")), "id_b")
      .withColumn("jaccard",
        Dedup.jaccardLongSets(col("__ha"), col("__hb"), assumeSorted = true))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .persist()
    val nPairs = pairs.count() // materialize before state moves underneath
    val tCommit0 = System.nanoTime()
    // STAGE PAIRS FIRST: durable before bands/sets commit, so no crash
    // window can lose them; idempotent per batchId so no retry can
    // double them
    batchId.foreach { bid =>
      val staged = catalog.exists(pairsTable) &&
        catalog.read(pairsTable).filter(col("__batch_id") === bid)
          .limit(1).count() > 0
      if (!staged && nPairs > 0)
        catalog.appendLog(pairsTable, pairs.withColumn("__batch_id", lit(bid)))
    }
    // Band append is batchId-idempotent: a crash AFTER this commit but
    // BEFORE the sets commit replays the batch (docs still unseen by
    // the sets-driven anti-join) — without the guard the identical
    // band rows would append a second time and every future history
    // probe would pay the duplicates forever. The commit ORDER
    // (bands, then sets) is what makes the guard sufficient: once sets
    // commit, the batch can't replay at all.
    // Stats commit FIRST with their own batchId guard (not piggybacked
    // on the bands guard): a crash between the two appends then replays
    // into "stats staged, skip; bands missing, append" — nothing is
    // lost or double-counted in either log.
    val statsStaged = batchId.exists { bid =>
      catalog.read(bstatsTable).filter(col("__batch_id") === bid)
        .limit(1).count() > 0
    }
    if (!statsStaged && !batchStats.isEmpty)
      catalog.appendLogClustered(bstatsTable,
        batchStats.withColumn("__batch_id", lit(batchId.getOrElse(-1L))),
        Seq("__kb"))
    val bandsStaged = batchId.exists { bid =>
      catalog.read(bandsTable).filter(col("__batch_id") === bid)
        .limit(1).count() > 0
    }
    if (!bandsStaged)
      catalog.appendLogClustered(bandsTable, newFlat, Seq("__kb", "key"))
    // An empty `fresh` means every doc in the batch is already known —
    // a replay after a fully committed batch, or a genuinely empty
    // batch. Appending an empty ref would grow the manifest ref list
    // on every retry until the next compactLog, so skip it (cheap:
    // `fresh` is already persisted and materialized by the joins above).
    if (!fresh.isEmpty)
      catalog.appendLog(setsTable, fresh.select("doc_id", "hhd"))
    lastPhases = Map(
      "compute" -> (tCommit0 - tCompute0) / 1e9,
      "state_commit" -> (System.nanoTime() - tCommit0) / 1e9)
    newFlat.unpersist()
    batchStats.unpersist()
    fresh.unpersist()
    pairs
  }

  /** State maintenance: fold each append-log's refs into one clustered
    * directory (bands keep their `__kb` clustering so row-group
    * skipping survives the fold) and reclaim unreferenced version
    * directories. Per-run cost is O(state), so it is maintenance to
    * schedule — every `compactEvery` batches via `start`, or manually
    * between bursts — not per-batch work.
    */
  def maintain(spark: org.apache.spark.sql.SparkSession): Unit = {
    ensureTables(spark)
    catalog.compactLog(bandsTable, clusterCols = Seq("__kb", "key"))
    catalog.compactLog(setsTable)
    catalog.compactLog(bstatsTable, clusterCols = Seq("__kb"))
    if (catalog.exists(pairsTable)) catalog.compactLog(pairsTable)
    // Honor the catalog's configured reader grace window — reclaiming
    // to keepLast=0 here would strand an in-flight reader that resolved
    // the previous pointer, defeating the retention the catalog was
    // constructed with.
    Seq(metaTable, bandsTable, setsTable, pairsTable, bstatsTable)
      .filter(catalog.exists)
      .foreach(t => catalog.vacuum(t, keepLast = catalog.graceVersions))
  }

  /** Streaming entry: drain a documents stream through processBatch;
    * duplicate pairs land in `<prefix>_pairs` (an append-log) tagged
    * with the batchId that produced them, exactly once per pair. With
    * `compactEvery` = N > 0, every Nth batch ends with `maintain()` —
    * batchId-based, so the cadence survives restarts.
    */
  def start(docsStream: DataFrame, idCol: String, textCol: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, idCol, textCol, Some(batchId)).unpersist()
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          maintain(batch.sparkSession)
        ()
      }
      .start()

  /** The full reference-shaped ingest loop, end to end: documents
    * published to a `graftbus` topic (the Pub/Sub twin) drain through
    * the incremental deduper. Payloads are JSON `{doc_id, text}` rows
    * riding the bus's `value` column; the bus's immutable segments give
    * deterministic replay, and processBatch's batchId staging turns
    * that into exactly-once pairs across restarts — the same guarantee
    * chain a Kafka→Spark→Delta pipeline provides.
    */
  def startFromBus(spark: org.apache.spark.sql.SparkSession, busRoot: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val docs = spark.readStream.format("graftbus")
      .option("path", busRoot).load()
      .select(from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL("doc_id long, text string")).as("d"))
      .select("d.*")
    start(docs, "doc_id", "text", checkpoint, trigger)
  }
}
