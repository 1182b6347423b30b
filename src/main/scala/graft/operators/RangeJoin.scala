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
}
