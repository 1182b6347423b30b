package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style snapshot diff: one row per changed primary key between an
  * old and a new snapshot, tagged `__op` ∈ insert | delete | update.
  * Inserts and updates carry the NEW column values, deletes the OLD —
  * the change feed a downstream consumer needs to replay one snapshot
  * into the other (Catalog.diffVersions wires this to time travel, so
  * any two committed versions yield their change feed after the fact,
  * without the writer having logged one).
  *
  * Shape: ONE full-outer shuffle join on the PK; change detection is a
  * null-safe column-wise comparison (`<=>` conjunction), exact — no
  * row-hash collisions can fake an unchanged row. Unchanged keys drop
  * out before the select, so output ∝ churn, not table size.
  */
object TableDiff {

  def diff(oldDf: DataFrame, newDf: DataFrame, pkCols: Seq[String]): DataFrame = {
    require(pkCols.nonEmpty, "diff requires primary key columns")
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"snapshot schemas differ: [${oldDf.columns.mkString(",")}] vs " +
        s"[${newDf.columns.mkString(",")}]")
    val dataCols = newDf.columns.filterNot(pkCols.contains).toSeq
    // presence markers distinguish "row absent" from "column null"
    val o = oldDf.withColumn("__po", lit(true)).as("o")
    val n = newDf.withColumn("__pn", lit(true)).as("n")
    val pkEq = pkCols.map(c => col(s"o.$c") <=> col(s"n.$c")).reduce(_ && _)
    val changed = dataCols.map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val op = when(col("o.__po").isNull, "insert")
      .when(col("n.__pn").isNull, "delete")
      .when(changed, "update")
    o.join(n, pkEq, "full_outer")
      .withColumn("__op", op)
      .filter(col("__op").isNotNull)
      .select(col("__op") +:
        (pkCols.map(c => coalesce(col(s"n.$c"), col(s"o.$c")).as(c)) ++
          dataCols.map(c =>
            when(col("n.__pn").isNull, col(s"o.$c"))
              .otherwise(col(s"n.$c")).as(c))): _*)
  }
}
