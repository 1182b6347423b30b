package graft.functions.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct leading-32-bit md5 hashes of a string's character
  * n-grams, as `array<long>` — the fused scan-side stage of the
  * near-dup pipeline. Value-identical (pinned by a test) to
  * `sort_array(array_distinct(transform(ngrams, g -> conv(substring(md5(g),1,8),16,10))))`
  * over CharNgramSet's output, but ONE pass that never materializes
  * the shingle-string array: each n-gram is digested as it is sliced,
  * deduped in a long hash set, and the result is exactly the frame the
  * MinHash signature (MinHashSigFromHashes) and the exact-Jaccard
  * verification both consume. One digest per shingle per document —
  * total, across the whole query.
  */
case class CharNgramHashSet(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  @transient private lazy val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** One slice-digest-dedup pass; called from interpreted and generated
    * code.
    */
  def hashSet(input: UTF8String): ArrayData = {
    val s = input.toString
    if (s.length < n) return new GenericArrayData(Array.emptyLongArray)
    val md = digest.get()
    val seen = new java.util.HashSet[java.lang.Long](math.min(s.length * 2, 1 << 16))
    var i = 0
    while (i + n <= s.length) {
      md.reset()
      val d = md.digest(s.substring(i, i + n).getBytes(StandardCharsets.UTF_8))
      seen.add(((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL))
      i += 1
    }
    val arr = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    hashSet(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("charNgramHashSet", this,
        classOf[CharNgramHashSet].getName)
      s"${ev.value} = $self.hashSet($s);"
    })

  override def prettyName: String = "char_ngram_hash_set"

  override protected def withNewChildInternal(
      newChild: Expression): CharNgramHashSet =
    copy(child = newChild)
}
