package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.Catalog
import graft.operators.Ivm

/** Streaming materialized view: keeps a grouped-aggregate view of an
  * unbounded stream fresh by appending one PARTIAL-STATE delta per
  * batch ([[Ivm.partializeSigned]]) to an append-log Catalog table and
  * merging at read — the LSM shape. Writes are O(batch) regardless of
  * how big the view or its history has grown; the read-side merge cost
  * grows with the log until [[compact]] folds it back to one
  * view-sized state (schedulable every N batches via `compactEvery`,
  * like IncrementalDedup's maintenance cadence).
  *
  * Exactly-once across crashes and foreachBatch replays WITHOUT a
  * staging table: every state row carries the `__batch_id` that
  * produced it, and Structured Streaming replays batchIds monotonically
  * from the checkpoint, so `batchId <= max(__batch_id)` identifies an
  * already-committed batch and the append is skipped — the delta and
  * its idempotency marker commit in the same atomic appendLog pointer
  * flip, leaving no window where one is durable without the other.
  * Compaction preserves the marker by stamping the folded state with
  * the high-watermark batchId.
  *
  * Retractions ride a sign column (+1/-1) on the batch, so a CDC-style
  * stream of inserts and deletes maintains the same view; a group whose
  * count reaches zero disappears from reads immediately (Ivm.merge
  * filters it) and from storage at the next compaction — tombstone GC.
  * Extrema (min/max) are deliberately absent: they don't form a group
  * under deletion (see [[Ivm]]).
  *
  * `values` are (state-suffix, SQL expression) pairs evaluated against
  * batch rows; use decimal casts for sums so merges stay bit-exact
  * across arbitrary batch boundaries.
  */
final class IncrementalView(catalog: Catalog, name: String,
    keys: Seq[String], values: Seq[(String, String)],
    signCol: Option[String] = None, compactEvery: Int = 0) {

  private val stateTable = s"${name}_vstate"

  /** Highest batchId whose delta has committed; -1 before any. */
  def appliedThrough(spark: SparkSession): Long =
    if (!catalog.exists(stateTable)) -1L
    else {
      val r = catalog.read(stateTable).agg(max(col("__batch_id"))).head()
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }

  /** Apply one batch's delta, idempotently per batchId: a replay of a
    * committed batch (crash between the append and the checkpoint
    * commit, or a foreachBatch retry) is a no-op.
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batchId <= appliedThrough(spark)) return
    val sign = signCol.map(col).getOrElse(lit(1L))
    val st = Ivm.partializeSigned(batch,
        keys, values.map { case (n, e) => n -> expr(e) }, sign)
      .withColumn("__batch_id", lit(batchId))
    // an empty delta would grow the manifest's ref list on every idle
    // trigger; skipping it also leaves the watermark untouched, which
    // is safe — replaying an empty batch re-derives an empty delta
    if (!st.isEmpty) catalog.appendLog(stateTable, st)
  }

  /** The view's current contents (merged state, live groups only). */
  def read(spark: SparkSession): DataFrame = {
    require(catalog.exists(stateTable), s"view $name has no state yet")
    Ivm.merge(keys, catalog.read(stateTable).drop("__batch_id"))
  }

  /** Fold the delta log into one view-sized state, keeping the replay
    * watermark. O(view) — maintenance cadence, not per-batch work.
    */
  def compact(spark: SparkSession): Unit = {
    val hwm = appliedThrough(spark)
    if (hwm >= 0)
      catalog.compactLogWith(stateTable,
        df => Ivm.merge(keys, df.drop("__batch_id"))
          .withColumn("__batch_id", lit(hwm)),
        clusterCols = keys)
  }

  /** Streaming entry: maintain the view from a (possibly signed) row
    * stream. With `compactEvery` = N > 0 every Nth batch folds the log
    * — batchId-based, so the cadence survives restarts.
    */
  def start(rows: DataFrame, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          compact(batch.sparkSession)
        ()
      }
      .start()

  /** Maintain the view from a graftbus topic: JSON rows of `rowDDL`
    * shape ride the bus's `value` column. The bus's immutable segments
    * give deterministic replay; the `__batch_id` watermark turns that
    * into an exactly-once view across restarts — the event-bus-to-
    * materialized-view loop (CDC included when `rowDDL` carries the
    * sign column).
    */
  def startFromBus(spark: SparkSession, busRoot: String, rowDDL: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val rows = spark.readStream.format("graftbus")
      .option("path", busRoot).load()
      .select(from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL(rowDDL)).as("r"))
      .select("r.*")
    start(rows, checkpoint, trigger)
  }
}
