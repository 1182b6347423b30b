package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Jaccard similarity |A∩B| / |A∪B| of two DISTINCT `array<long>`
  * columns, as one sort-merge pass — value-identical to
  * `size(array_intersect(a,b)) / (size(a)+size(b)-size(array_intersect(a,b)))`
  * for distinct inputs, but evaluates the intersection once instead of
  * twice (Catalyst does not CSE the duplicated array_intersect) and
  * without per-pair hash-set allocation. This sits on the hot path of
  * near-dup verification: one call per LSH candidate pair.
  */
case class JaccardLongSets(left: Expression, right: Expression,
    assumeSorted: Boolean = false)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toLongArray()
    val b = r.asInstanceOf[ArrayData].toLongArray()
    // callers on the hot path pre-sort ONCE per document (sort_array
    // upstream) rather than once per candidate pair here
    if (!assumeSorted) {
      java.util.Arrays.sort(a)
      java.util.Arrays.sort(b)
    }
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override def prettyName: String = "jaccard_long_sets"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardLongSets =
    copy(left = newLeft, right = newRight)
}
