package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the single right row with
  * the greatest right-time ≤ left-time within the same key group (the
  * time-series point-in-time join Spark's DataFrame API lacks).
  *
  * Implementation is the scalable union trick, not a per-key loop or a
  * range cross-join: tag both sides, union, and carry the latest right
  * row forward as ONE struct with a `last(ignoreNulls)` window — a
  * SINGLE shuffle on (keys), O(n log n) per key group, versus the
  * O(left×right) blow-up Catalyst plans for an inequality join. The
  * struct carry guarantees all matched columns come from the same right
  * row. On equal timestamps the right row sorts before the left row
  * (exact-time matches visible), and the largest `rightOrd` wins among
  * same-timestamp right rows (deterministic).
  */
object AsOfJoin {

  /** @param rightCols map of right column → output name to carry
    * @param rightOrd  deterministic tie-breaker among right rows with
    *                  equal (keys, time)
    * @return matched left rows with the carried columns appended
    *         (inner as-of semantics)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: Column, rightTime: Column, rightCols: Map[String, String],
      rightOrd: Column): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = rightCols.keys.toSeq
    val restLeft = leftCols.filterNot(keys.contains)

    val l = left
      .withColumn("__t", leftTime)
      .withColumn("__side", lit(1))
      .withColumn("__rord", lit(null).cast("long"))
      .withColumn("__rrow", lit(null).cast(
        org.apache.spark.sql.types.StructType(carried.map(c => right.schema(c)))))
      .select(keys.map(col) ++ Seq(col("__t"), col("__side"), col("__rord"),
        col("__rrow")) ++ restLeft.map(col): _*)

    val r = right
      .withColumn("__t", rightTime)
      .withColumn("__side", lit(0))
      .withColumn("__rord", rightOrd.cast("long"))
      .withColumn("__rrow", struct(carried.map(col): _*))
      .select(keys.map(col) ++ Seq(col("__t"), col("__side"), col("__rord"),
        col("__rrow")) ++ restLeft.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__rord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__m", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull)
      .select(leftCols.map(col) ++
        carried.map(c => col("__m").getField(c).as(rightCols(c))): _*)
  }
}
