package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct leading-60-bit md5 hashes of a token array's word
  * n-grams, as `array<long>` — the fused scan-side stage of n-gram
  * decontamination/overlap screening. Value-identical (pinned by a
  * test) to
  * `sort_array(array_distinct(transform(wordNgrams(c, n), g -> conv(substring(md5(g),1,15),16,10))))`
  * but ONE pass that never materializes the gram-string array: each
  * gram's UTF-8 bytes are streamed into the digest as the window
  * slides (no join-string allocation), deduped in a long hash set.
  * 60 bits (vs CharNgramHashSet's 32) because decontamination counts
  * distinct grams exactly: at benchmark-scale gram sets (~10^8) a
  * 32-bit space would collide routinely, a 60-bit one at ~10^-2
  * expected collisions. One digest per gram per document — total,
  * across the whole query — and downstream the grams travel as
  * 8-byte longs, so the broadcast eval-side set is ~4x smaller than
  * the gram strings it replaces.
  */
case class WordNgramHashSet(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "gram width must be >= 1")

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
          s"word_ngram_hash_set needs array<string> tokens, got $other")
    }
  }

  private val space = Array[Byte](' ')

  /** One slide-digest-dedup pass; called from interpreted and generated
    * code.
    */
  def hashSet(input: ArrayData): ArrayData = {
    val m = input.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val md = digest.get()
    val seen = new java.util.HashSet[java.lang.Long](math.min(m * 2, 1 << 16))
    var i = 0
    while (i + n <= m) {
      md.reset()
      var j = 0
      var wrote = false
      while (j < n) {
        // null elements never come from split(), but the function is
        // SQL-registered: skip them exactly like the reference chain's
        // array_join does (no NPE, no doubled separator)
        if (!input.isNullAt(i + j)) {
          if (wrote) md.update(space)
          md.update(input.getUTF8String(i + j).getBytes)
          wrote = true
        }
        j += 1
      }
      val d = md.digest()
      // leading 60 bits = first 15 hex nibbles = (first 8 bytes) >>> 4,
      // matching conv(substring(md5(g), 1, 15), 16, 10)
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      seen.add(v >>> 4)
      i += 1
    }
    val arr = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    hashSet(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("wordNgramHashSet", this,
        classOf[WordNgramHashSet].getName)
      s"${ev.value} = $self.hashSet($s);"
    })

  override def prettyName: String = "word_ngram_hash_set"

  override protected def withNewChildInternal(
      newChild: Expression): WordNgramHashSet =
    copy(child = newChild)
}
