package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-frequency estimate from a serialized Count-Min sketch
  * (`org.apache.spark.util.sketch.CountMinSketch`, the same binary the
  * built-in `count_min_sketch` aggregate emits). Completes the
  * mergeable-sketch family (HLL / Theta / KLL / top-k): CMS answers
  * "how often did key x occur" from per-partition O(width×depth)
  * summaries with the guarantee est ≥ exact and, w.p. confidence,
  * est ≤ exact + eps×N — never an undercount.
  *
  * The left child is almost always a single merged sketch broadcast
  * against a handful of probe keys, but deserialization is still
  * cached per distinct byte array (reference identity) so a thousand
  * probes against one sketch parse it once. Codegen delegates to
  * [[estimate]] through an instance reference, keeping the projection
  * inside whole-stage codegen.
  */
case class CmsEstimateLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_estimate_long expects (BINARY, BIGINT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  // single-reference cache: executor tasks deserialize their own
  // expression copies, but driver-side evaluation paths (constant
  // folding, local relations) can share an instance — so the
  // (bytes, sketch) pair swaps through ONE reference; two separate
  // fields could tear into a sketch parsed from different bytes. A
  // racing thread at worst re-deserializes, never misreads.
  @transient private var cached: (Array[Byte], CountMinSketch) = _

  /** Called from both interpreted and generated code. */
  def estimate(bytes: Array[Byte], item: Long): Long = {
    var c = cached
    if (c == null || !(c._1 eq bytes)) {
      c = (bytes,
        CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes)))
      cached = c
    }
    c._2.estimateCount(java.lang.Long.valueOf(item))
  }

  override def nullSafeEval(sk: Any, item: Any): Any =
    estimate(sk.asInstanceOf[Array[Byte]], item.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, item) => {
      val self = ctx.addReferenceObj("cmsEstimate", this,
        classOf[CmsEstimateLong].getName)
      s"${ev.value} = $self.estimate($sk, $item);"
    })

  override def prettyName: String = "cms_estimate_long"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateLong =
    copy(left = newLeft, right = newRight)
}
