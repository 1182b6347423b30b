package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for distributive aggregates: keep a
  * materialized GROUP BY view fresh by merging per-batch PARTIAL STATES
  * instead of rescanning the base table — the only affordable shape when
  * the base is 100 TB and a batch is a few GB.
  *
  * State layout per group: `__cnt` (row count) plus, per tracked value
  * column `v`: `sum_v` (decimal — exact, order-independent), and for the
  * append-only face `min_v`/`max_v`. Merging is re-aggregation of the
  * union of states: sums and counts add, extrema take min/max — valid
  * because these aggregates are commutative monoids, so ANY partition of
  * the input rows into batches merges to the full-recompute answer
  * (what Spark itself exploits in partial aggregation; same algebra,
  * persisted across batches instead of across tasks).
  *
  * Two faces with different algebraic power:
  *  - [[partialize]] (append-only): supports min/max. Deletes are NOT
  *    expressible — removing the current extremum would need a rescan.
  *  - [[partializeSigned]] (retractable): rows carry a sign (+1 insert,
  *    -1 retraction); counts and sums subtract cleanly; extrema are
  *    structurally absent rather than silently wrong. Groups whose
  *    count reaches zero vanish from the merged view ([[merge]] filters
  *    them), matching the recompute-over-surviving-rows semantics.
  *
  * Scale shape: partialize is one map-side-combined shuffle over the
  * BATCH (not the base); merge shuffles only (existing groups + batch
  * groups) partial-state rows, each O(bytes of the view), never the
  * underlying fact rows. Decimal sums make the merge bit-exact — double
  * sums would drift with batch boundaries and re-orderings.
  */
object Ivm {

  private val Cnt = "__cnt"

  /** Append-only partial states: counts, exact decimal sums, extrema.
    * `values` maps a state-column suffix to the (pre-cast, decimal-typed
    * for sums) value expression.
    */
  def partialize(df: DataFrame, keys: Seq[String],
      values: Seq[(String, Column)]): DataFrame = {
    val aggs =
      values.map { case (n, c) => sum(c).as(s"sum_$n") } ++
      values.map { case (n, c) => min(c).as(s"min_$n") } ++
      values.map { case (n, c) => max(c).as(s"max_$n") }
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(Cnt), aggs: _*)
  }

  /** Retractable partial states: `sign` is +1 for inserts, -1 for
    * retractions. No extrema columns — deletes can't maintain them.
    */
  def partializeSigned(df: DataFrame, keys: Seq[String],
      values: Seq[(String, Column)], sign: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(sign).as(Cnt),
        values.map { case (n, c) => sum(sign * c).as(s"sum_$n") }: _*)

  /** Merge any number of partial-state frames (all produced by the same
    * partialize face over the same keys/values) into the refreshed view
    * state. Groups whose merged count is zero (fully retracted) drop
    * out, as a recompute would drop them.
    */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state frame")
    val unioned = states.reduce(_.unionByName(_))
    val aggs = unioned.columns.toSeq.collect {
      case c if c == Cnt              => sum(col(c)).as(c)
      case c if c.startsWith("sum_")  => sum(col(c)).as(c)
      case c if c.startsWith("min_")  => min(col(c)).as(c)
      case c if c.startsWith("max_")  => max(col(c)).as(c)
    }
    require(aggs.size + keys.size == unioned.columns.length,
      s"unrecognized state columns in ${unioned.columns.mkString(",")}")
    unioned.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col(Cnt) > 0)
  }
}
