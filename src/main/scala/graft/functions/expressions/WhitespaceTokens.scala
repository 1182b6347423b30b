package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenization as one linear byte scan — semantically
  * identical to `split(trim(s), "\\s+")` (pinned by a spec over
  * adversarial strings AND the whole fixture corpus) but without the
  * built-in's per-row costs: Spark's `StringSplit` funnels through
  * `UTF8String.split` → `String.split(regex)`, which RECOMPILES
  * `Pattern("\\s+")` for every row (String.split's non-regex fast path
  * covers only single-literal-char patterns) and round-trips the text
  * through `java.lang.String` plus one more UTF-8 encode per produced
  * token. For the token-shaped half of the text-pipeline board this
  * scan IS the hot loop, and the regex engine + recompile + transcode
  * is most of its per-row cost.
  *
  * The scan is exact because Java's `\s` is precisely the six ASCII
  * bytes [ \t\n\x0B\f\r], which in UTF-8 can never appear inside a
  * multi-byte code point (continuation bytes have the high bit set) —
  * so byte-level splitting equals character-level regex splitting, and
  * tokens are zero-copy slices of one shared byte array. Leading
  * `trim` (ASCII space only — `UTF8String.trim()`, what `trim()` the
  * builtin does) and the limit=-1 empty-token rules (leading empty
  * token when the trimmed text starts with whitespace, trailing empty
  * token when it ends with it, `[""]` for empty input) are reproduced
  * exactly.
  *
  * Codegen delegates to `tokenize` through an instance reference (the
  * scan dominates row cost; the surrounding stage stays whole-stage
  * generated), the CharNgramSet pattern.
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** One linear scan; called from interpreted and generated code. */
  def tokenize(input: UTF8String): ArrayData = {
    val s = input.trim() // the builtin composition's trim(): ASCII 32 only
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val out = new java.util.ArrayList[UTF8String](math.min(n / 4 + 1, 1 << 16))
    var i = 0
    var tokenStart = 0
    while (i < n) {
      val b = bytes(i)
      if (b == ' ' || (b >= '\t' && b <= '\r')) { // [ \t\n\x0B\f\r] — Java \s
        out.add(UTF8String.fromBytes(bytes, tokenStart, i - tokenStart))
        i += 1
        var c: Byte = 0
        while (i < n && { c = bytes(i); c == ' ' || (c >= '\t' && c <= '\r') })
          i += 1
        tokenStart = i
      } else i += 1
    }
    // the remainder token — empty when the text ends in whitespace,
    // which limit=-1 split semantics KEEP (one trailing "" per run)
    out.add(UTF8String.fromBytes(bytes, tokenStart, n - tokenStart))
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("whitespaceTokens", this,
        classOf[WhitespaceTokens].getName)
      s"${ev.value} = $self.tokenize($s);"
    })

  override def prettyName: String = "whitespace_tokens"

  override protected def withNewChildInternal(
      newChild: Expression): WhitespaceTokens = copy(child = newChild)
}

/** Whitespace-run collapse as one linear byte scan — semantically
  * identical to `regexp_replace(trim(s), "\\s+", " ")` (spec-pinned
  * like [[WhitespaceTokens]], whose byte-exactness argument carries
  * over verbatim): every maximal run of the six ASCII whitespace
  * bytes, including leading/trailing runs that survive the
  * space-only trim, becomes one 0x20 byte. This is the normalize()
  * half of the fingerprint/shingle scan stage (the dedup family's
  * hottest narrow op); the builtin keeps a cached compiled pattern
  * but still pays a regex Matcher walk plus StringBuffer
  * appendReplacement (replacement-escape parsing included) per row.
  */
case class WhitespaceCollapse(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  /** One linear scan; called from interpreted and generated code. */
  def collapse(input: UTF8String): UTF8String = {
    val s = input.trim() // the builtin composition's trim(): ASCII 32 only
    val bytes = s.getBytes
    val n = bytes.length
    var i = 0
    var changed = false
    while (i < n && !changed) {
      val b = bytes(i)
      changed = b == '\t' || (b > '\t' && b <= '\r') ||
        (b == ' ' && i + 1 < n && {
          val c = bytes(i + 1)
          c == ' ' || (c >= '\t' && c <= '\r')
        })
      i += 1
    }
    if (!changed) return s // common case: already collapsed, zero copy
    val out = new Array[Byte](n)
    var w = 0
    i = 0
    while (i < n) {
      val b = bytes(i)
      if (b == ' ' || (b >= '\t' && b <= '\r')) {
        out(w) = ' '
        w += 1
        i += 1
        var c: Byte = 0
        while (i < n && { c = bytes(i); c == ' ' || (c >= '\t' && c <= '\r') })
          i += 1
      } else {
        out(w) = b
        w += 1
        i += 1
      }
    }
    UTF8String.fromBytes(out, 0, w)
  }

  override def nullSafeEval(input: Any): Any =
    collapse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("whitespaceCollapse", this,
        classOf[WhitespaceCollapse].getName)
      s"${ev.value} = $self.collapse($s);"
    })

  override def prettyName: String = "whitespace_collapse"

  override protected def withNewChildInternal(
      newChild: Expression): WhitespaceCollapse = copy(child = newChild)
}
