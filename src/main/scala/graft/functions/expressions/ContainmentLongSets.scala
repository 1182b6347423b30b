package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Containment |A∩B| / min(|A|,|B|) of two DISTINCT `array<long>`
  * columns in one sort-merge pass — the asymmetric sibling of
  * [[JaccardLongSets]], value-identical to
  * `size(array_intersect(a,b)) / least(size(a), size(b))` for distinct
  * inputs but without the per-pair hash-set allocation that
  * array_intersect pays. Hot path: one call per LSH candidate pair
  * (Dedup.containmentPairs / t39), inside whole-stage codegen.
  */
case class ContainmentLongSets(left: Expression, right: Expression,
    assumeSorted: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData].toLongArray()
    val b = r.asInstanceOf[ArrayData].toLongArray()
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
    val m = math.min(a.length, b.length)
    if (m == 0) 0.0 else inter.toDouble / m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val m = ctx.freshName("m")
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
         |final int $m = java.lang.Math.min($a.length, $b.length);
         |${ev.value} = ($m == 0) ? 0.0 : ((double) $inter) / $m;
       """.stripMargin
    })

  override def prettyName: String = "containment_long_sets"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ContainmentLongSets =
    copy(left = newLeft, right = newRight)
}
