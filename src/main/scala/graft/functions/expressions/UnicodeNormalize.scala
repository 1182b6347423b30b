package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization of a string column — the canonicalization a
  * dedup pipeline must run BEFORE fingerprinting: "café" composed
  * (U+00E9) and decomposed (e + U+0301) are byte-different, so without
  * it exact dedup misses visually identical documents and near-dup
  * shingles drift. Forms: NFC/NFKC (composed; NFKC also folds
  * compatibility characters like ligatures and full-width digits) and
  * their D counterparts. Implements via `java.text.Normalizer` (the
  * JDK's ICU-derived tables) with a fast-path skip when the input is
  * already normalized ASCII — `isNormalized` is O(n) with no
  * allocation, and real corpora are mostly ASCII. Participates in
  * whole-stage codegen through an instance reference, like the other
  * fused text expressions here.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val normForm = Normalizer.Form.valueOf(form.toUpperCase)

  override def dataType: DataType = StringType

  /** Called from both interpreted and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, normForm)) s
    else UTF8String.fromString(Normalizer.normalize(str, normForm))
  }

  override def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("unicodeNormalize", this,
        classOf[UnicodeNormalize].getName)
      s"${ev.value} = $self.normalize($s);"
    })

  override def prettyName: String = "unicode_normalize"

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
