package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.Catalog
import graft.functions.Dedup

/** Incremental corpus-wide near-duplicate detection: the streaming face
  * of Dedup.nearDuplicatePairs.
  *
  * State lives in two append-log Catalog tables — the banded MinHash
  * keys (`<prefix>_bands`) and the distinct base-hash sets
  * (`<prefix>_sets`). Each batch computes signatures for its TRULY NEW
  * documents only (retry-idempotent anti-join on already-seen ids),
  * finds candidates by joining the new band keys against history plus
  * the in-batch self-join, verifies with exact Jaccard, and APPENDS the
  * new signatures in O(batch) (Catalog.appendLog never rewrites
  * history). Per-batch cost is batch-size × band fan-out + candidates —
  * the history side participates only through the band-key equi-join,
  * so a 100 TB accumulated corpus is fine as long as band buckets stay
  * bounded (the same invariant the batch pipeline relies on). Each
  * cross-batch duplicate pair is emitted exactly once, in the batch
  * that completes it.
  */
final class IncrementalDedup(catalog: Catalog, threshold: Double,
    shingle: Int = 3, numHashes: Int = 16, bands: Int = 2,
    prefix: String = "dedup") {

  private val bandsTable = s"${prefix}_bands"
  private val setsTable = s"${prefix}_sets"

  private def ensureTables(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.types._
    if (!catalog.exists(bandsTable))
      catalog.appendLog(bandsTable, spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL("doc_id BIGINT, band INT, key STRING")))
    if (!catalog.exists(setsTable))
      catalog.appendLog(setsTable, spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL("doc_id BIGINT, hhd ARRAY<BIGINT>")))
  }

  /** Process one batch of documents; returns the verified new duplicate
    * pairs (id_a < id_b, jaccard ≥ threshold) this batch completes.
    */
  def processBatch(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
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
      .persist()
    val hist = catalog.read(bandsTable)
    // new-vs-history (unordered → normalize) + new-vs-new (a < b).
    // The batch side broadcasts when its size estimate fits (same gate
    // as the batch pipeline), so the accumulated history is streamed
    // map-side and never shuffled — per-batch cost is a history SCAN
    // plus batch-sized state, not a history shuffle.
    val nh = Dedup.maybeBroadcast(newFlat).as("a").join(hist.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("id_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("id_b"))
    val nn = newFlat.as("a").join(newFlat.as("b"),
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
    pairs.count() // materialize before the state tables move underneath
    catalog.appendLog(bandsTable, newFlat)
    catalog.appendLog(setsTable, fresh.select("doc_id", "hhd"))
    newFlat.unpersist()
    fresh.unpersist()
    pairs
  }

  /** Streaming entry: drain a documents stream through processBatch;
    * duplicate pairs append to `<prefix>_pairs` (also an append-log).
    */
  def start(docsStream: DataFrame, idCol: String, textCol: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val pairs = processBatch(batch, idCol, textCol)
        catalog.appendLog(s"${prefix}_pairs", pairs)
        pairs.unpersist()
        ()
      }
      .start()
}
