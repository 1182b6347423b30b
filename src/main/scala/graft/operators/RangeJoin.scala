package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join.
  *
  * Spark plans a raw `p >= s AND p < e` theta-join as a
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) work with a
  * mandatory broadcast of one whole side, which fails long before
  * 100 TB. The scalable form bucketizes the domain: each interval
  * explodes into the buckets it overlaps (fan-out bounded by
  * interval_length/bucketWidth + 1), each point maps to exactly ONE
  * bucket, and the join becomes a shuffle equi-join on bucket id
  * followed by the exact range predicate. Because a point lives in a
  * single bucket, every matching pair appears exactly once — no
  * post-join dedup. Pick `bucketWidth` near the typical interval
  * length: one fact shuffle, interval fan-out ≈ 2.
  */
object RangeJoin {

  /** Inner join of `points` to `intervals` on
    * `points.pointCol ∈ [intervals.startCol, intervals.endCol)`.
    * Columns must be integral (epoch micros, keys...); empty intervals
    * (end ≤ start) match nothing.
    *
    * ==Output-size contract (read before scaling this up)==
    * The PLAN is linear-ish (one fact shuffle, bounded interval
    * fan-out), but the OUTPUT is inherently quadratic in density:
    * |result| ≈ point_density × Σ interval_lengths — every point
    * inside an interval is a row, so densifying points 10× AND
    * intervals 10× over the same domain grows the output ~100×
    * (measured: the e08 probe at 100× produced ~10⁴× the rows — the
    * semantics, not plan waste). No join strategy can beat its own
    * output size; if downstream only needs aggregates, aggregate the
    * bucketized join directly instead of materializing pairs.
    *
    * `estimateOutputRows` is the cheap pre-flight for exactly this:
    * one rollup per side, exact under within-bucket uniformity, so a
    * caller can log/refuse a pair explosion BEFORE paying for it.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__rb",
      expr(s"`$pointCol` div ${bucketWidth}L"))
    val ib = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__rb", explode(sequence(
        expr(s"`$startCol` div ${bucketWidth}L"),
        expr(s"(`$endCol` - 1) div ${bucketWidth}L"))))
    pb.join(ib, Seq("__rb"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__rb")
  }

  /** [[pointInInterval]] with the output-size contract enforced: runs
    * the pre-flight estimate, logs the expected magnitude, and refuses
    * to build the join when it exceeds `maxOutputRows` — the caller
    * learns about a pair explosion from one cheap rollup instead of a
    * dying stage. Production entry point for unbounded inputs; the
    * unchecked form remains for callers that already know their
    * density.
    */
  def pointInIntervalChecked(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long, maxOutputRows: Long): DataFrame = {
    val est = estimateOutputRows(points, intervals, pointCol, startCol,
      endCol, bucketWidth)
    org.slf4j.LoggerFactory.getLogger(getClass).info(
      f"range join pre-flight: expected ~$est%.3g output rows " +
        s"(cap $maxOutputRows)")
    require(est <= maxOutputRows,
      f"range join refused: expected ~$est%.3g output rows exceeds the " +
        s"$maxOutputRows cap — output is point_density x interval_length " +
        "by SEMANTICS; aggregate the bucketized join instead of " +
        "materializing pairs, or raise the cap deliberately")
    pointInInterval(points, intervals, pointCol, startCol, endCol,
      bucketWidth)
  }

  /** Pre-flight output-magnitude estimate for [[pointInInterval]]:
    * expected matches = Σ over buckets of
    * points_in_bucket × covered_interval_length_in_bucket / bucketWidth
    * — EXACT when points are uniform within each bucket, a tight
    * order-of-magnitude guide otherwise. Cost: one rollup per side at
    * bucket cardinality (the same fan-out the join itself pays), so
    * calling it before a large join is ~free relative to materializing
    * an exploded result. Callers should log the estimate and gate
    * materialization on it (see the output-size contract above).
    */
  def estimateOutputRows(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): Double = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = bucketWidth
    val pb = points
      .groupBy(expr(s"`$pointCol` div ${w}L").as("__rb"))
      .agg(count(lit(1)).as("__np"))
    val ib = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__rb", explode(sequence(
        expr(s"`$startCol` div ${w}L"),
        expr(s"(`$endCol` - 1) div ${w}L"))))
      .withColumn("__cov",
        least(col(endCol), (col("__rb") + 1) * w) -
          greatest(col(startCol), col("__rb") * w))
      .groupBy(col("__rb")).agg(sum(col("__cov")).as("__cov"))
    pb.join(ib, Seq("__rb"))
      .select(coalesce(
        sum(col("__np") * col("__cov").cast("double") / w), lit(0.0)))
      .head().getDouble(0)
  }
}
