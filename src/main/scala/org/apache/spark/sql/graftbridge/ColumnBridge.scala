package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ↔ Expression converters of
  * Spark 4's classic API, for wiring custom Catalyst expressions into
  * the public Column world (the pre-4.x `new Column(expr)` idiom).
  * Lives under org.apache.spark.sql only to satisfy the access
  * qualifier; contains no Spark-internal logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
