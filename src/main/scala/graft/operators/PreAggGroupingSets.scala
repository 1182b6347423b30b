package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Grouping sets (rollup/cube) re-expressed as re-aggregation over a
  * pre-aggregate, for DECOMPOSABLE aggregates (sum, count, min, max —
  * anything where agg(all) = agg(agg(parts)); count decomposes as
  * sum of partial counts).
  *
  * Why: Spark plans `df.rollup(a, b).agg(...)` as Expand → aggregate,
  * and Expand replicates EVERY INPUT ROW once per grouping set — a
  * 3-set rollup triples the scan output before the first partial
  * aggregate. At 100 TB that is the difference between one pass over
  * the data and three. Here the input is first reduced to one row per
  * full dimension tuple (one ordinary partial+final aggregate — the
  * plan you'd get for a plain GROUP BY), and Expand then runs over
  * |distinct dim tuples| rows, which for low-cardinality reporting
  * dimensions is vanishingly small. Same rows out, spec-pinned
  * (PreAggGroupingSetsSpec) against the direct rollup/cube.
  *
  * Contract: `partials` aggregate the raw input per dimension tuple;
  * `finals` re-aggregate the partial columns (by their aliases) across
  * grouping sets. Non-decomposable aggregates (avg, stddev, exact
  * percentiles) must be decomposed by the caller (avg = sum/sum of
  * (sum, count) partials) or use the direct rollup. Empty input is NOT
  * an edge: grouping-sets aggregation over zero rows returns zero rows
  * in both formulations (spec-pinned), unlike a global no-grouping
  * aggregate.
  */
object PreAggGroupingSets {

  def rollup(df: DataFrame, dims: Seq[String],
      partials: Seq[Column], finals: Seq[Column]): DataFrame =
    grouped(df, dims, partials, finals, cube = false)

  def cube(df: DataFrame, dims: Seq[String],
      partials: Seq[Column], finals: Seq[Column]): DataFrame =
    grouped(df, dims, partials, finals, cube = true)

  private def grouped(df: DataFrame, dims: Seq[String],
      partials: Seq[Column], finals: Seq[Column],
      cube: Boolean): DataFrame = {
    require(dims.nonEmpty, "dims must be non-empty")
    require(partials.nonEmpty && finals.nonEmpty,
      "partials and finals must be non-empty")
    val pre = df.groupBy(dims.map(col): _*).agg(partials.head, partials.tail: _*)
    val g = if (cube) pre.cube(dims.map(col): _*)
            else pre.rollup(dims.map(col): _*)
    g.agg(finals.head, finals.tail: _*)
  }
}
