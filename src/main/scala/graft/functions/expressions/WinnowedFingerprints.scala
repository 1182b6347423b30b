package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Winnowed (MOSS) document fingerprints from a token array, fused
  * into one pass: hash every word `n`-gram to its leading-60-bit md5
  * (the portable hash shared with WordNgramHashSet / the DuckDB
  * oracles), slide a `w`-hash window, keep each window's minimum,
  * return the sorted distinct minima as `array<long>`.
  *
  * Exists because the HOF formulation
  * `transform(sequence(...), j -> array_min(slice(hs, j, w)))`
  * CAPTURES `hs` inside the lambda: higher-order functions get no
  * common-subexpression elimination, so the whole gram-hash array is
  * re-evaluated once per window position — quadratic in document
  * length (measured: 374 s for the t44 pair query at sf0.1 vs ~1 s
  * fused). Here the gram hashes are computed once and the sliding
  * minimum is a monotonic deque, O(tokens) total.
  *
  * Fewer than w grams (but ≥ 1) degrade to the single global minimum;
  * zero grams (short doc) to an empty array — both matching the
  * oracle's CASE.
  */
case class WinnowedFingerprints(child: Expression, n: Int, w: Int)
    extends UnaryExpression {
  require(n >= 1, "gram width must be >= 1")
  require(w >= 2, "winnow window must be >= 2")

  @transient private lazy val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnowed_fingerprints needs array<string> tokens, got $other")
    }
  }

  private val space = Array[Byte](' ')

  def winnow(input: ArrayData): ArrayData = {
    val m = input.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val md = digest.get()
    val grams = m - n + 1
    val hs = new Array[Long](grams)
    var i = 0
    while (i < grams) {
      md.reset()
      var j = 0
      var wrote = false
      while (j < n) {
        if (!input.isNullAt(i + j)) {
          if (wrote) md.update(space)
          md.update(input.getUTF8String(i + j).getBytes)
          wrote = true
        }
        j += 1
      }
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      hs(i) = v >>> 4
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    if (grams < w) {
      var mn = hs(0)
      var k = 1
      while (k < grams) { if (hs(k) < mn) mn = hs(k); k += 1 }
      seen.add(mn)
    } else {
      // monotonic ascending deque of indices; head is the window min
      val deque = new Array[Int](grams)
      var head = 0
      var tail = 0 // exclusive
      var k = 0
      while (k < grams) {
        if (head < tail && deque(head) <= k - w) head += 1
        while (head < tail && hs(deque(tail - 1)) >= hs(k)) tail -= 1
        deque(tail) = k
        tail += 1
        if (k >= w - 1) seen.add(hs(deque(head)))
        k += 1
      }
    }
    val arr = new Array[Long](seen.size)
    val it = seen.iterator()
    var k2 = 0
    while (it.hasNext) { arr(k2) = it.next(); k2 += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    winnow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("winnowedFingerprints", this,
        classOf[WinnowedFingerprints].getName)
      s"${ev.value} = $self.winnow($s);"
    })

  override def prettyName: String = "winnowed_fingerprints"

  override protected def withNewChildInternal(
      newChild: Expression): WinnowedFingerprints =
    copy(child = newChild)
}
