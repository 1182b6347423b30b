package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Jaccard similarity |A∩B| / |A∪B| of two DISTINCT `array<long>`
  * columns, as one sort-merge pass — value-identical to
  * `size(array_intersect(a,b)) / (size(a)+size(b)-size(array_intersect(a,b)))`
  * for distinct inputs, but evaluates the intersection once instead of
  * twice (Catalyst does not CSE the duplicated array_intersect) and
  * without per-pair hash-set allocation. This sits on the hot path of
  * near-dup verification — one call per LSH candidate pair — so it
  * participates in whole-stage codegen via doGenCode.
  */
case class JaccardLongSets(left: Expression, right: Expression,
    assumeSorted: Boolean = false)
    extends BinaryExpression {

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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      val sortCode = if (assumeSorted) "" else
        s"""java.util.Arrays.sort($a);
           |java.util.Arrays.sort($b);""".stripMargin
      s"""
         |final long[] $a = $l.toLongArray();
         |final long[] $b = $r.toLongArray();
         |$sortCode
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $a.length && $j < $b.length) {
         |  if ($a[$i] == $b[$j]) { $inter++; $i++; $j++; }
         |  else if ($a[$i] < $b[$j]) { $i++; }
         |  else { $j++; }
         |}
         |final int $union = $a.length + $b.length - $inter;
         |${ev.value} = ($union == 0) ? 0.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override def prettyName: String = "jaccard_long_sets"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardLongSets =
    copy(left = newLeft, right = newRight)
}
