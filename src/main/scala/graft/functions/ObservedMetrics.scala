package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Single-pass pipeline telemetry via `Dataset.observe`: the counters
  * ride the frame's OWN execution (per-task accumulators merged on the
  * driver), so a curation run's quality dashboard costs ZERO extra
  * scans — at 100 TB a separate metrics job doubles the pipeline.
  * Observed aggregates must be commutative and deterministic (counts,
  * sums, min/max — never a percentile or first()); values become
  * available once ANY action materializes the observed frame and cover
  * exactly the rows that action processed.
  */
object ObservedMetrics {

  /** Drop-reason counters for a curation-gate frame (t18/t24 shape:
    * a `reason` column with `kept` as the pass value). Returns the
    * frame to execute plus the `Observation` to read AFTER an action.
    */
  def observeCuration(gated: DataFrame, reasons: Seq[String],
      name: String = "curation"): (DataFrame, Observation) = {
    val obs = Observation(name)
    val reasonCounters = reasons.map(r =>
      sum(when(col("reason") === r, 1L).otherwise(0L)).as(s"n_$r"))
    val observed = gated.observe(obs,
      count(lit(1)).as("n_docs"), reasonCounters: _*)
    (observed, obs)
  }

  /** Null/blank-rate counters over arbitrary columns — the ingest
    * sanity check (schema drift shows up as a null-rate spike) folded
    * into the ingest scan itself.
    */
  def observeCompleteness(df: DataFrame, cols: Seq[String],
      name: String = "completeness"): (DataFrame, Observation) = {
    val obs = Observation(name)
    def nullCount(c: String): Column =
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"), cols.map(nullCount): _*)
    (observed, obs)
  }
}
