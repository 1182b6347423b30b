package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Leading-60-bit md5 hashes of a token array's non-overlapping
  * n-token chunks (stride = n, tail remainder dropped), in chunk
  * order, as `array<long>` — the fused scan-side stage of
  * paragraph/line-level dedup. Value-identical (pinned by a test) to
  * `transform(wordChunks(c, n), g -> conv(substring(md5(g),1,15),16,10))`
  * but ONE pass that never materializes the chunk-string array: each
  * chunk's token bytes stream into the digest directly. Unlike
  * WordNgramHashSet this is NOT deduped — chunk-level dedup counts
  * every occurrence, including a chunk repeating inside one document —
  * and downstream the chunks shuffle as 8-byte longs instead of
  * chunk-width strings.
  */
case class WordChunkHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "chunk width must be >= 1")

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
          s"word_chunk_hashes needs array<string> tokens, got $other")
    }
  }

  private val space = Array[Byte](' ')

  def hashes(input: ArrayData): ArrayData = {
    val m = input.numElements()
    val k = m / n
    if (k == 0) return new GenericArrayData(Array.emptyLongArray)
    val md = digest.get()
    val arr = new Array[Long](k)
    var c = 0
    while (c < k) {
      md.reset()
      var j = 0
      var wrote = false
      while (j < n) {
        // null elements never come from split(), but the function is
        // SQL-registered: skip them exactly like the reference chain's
        // array_join does (no NPE, no doubled separator)
        if (!input.isNullAt(c * n + j)) {
          if (wrote) md.update(space)
          md.update(input.getUTF8String(c * n + j).getBytes)
          wrote = true
        }
        j += 1
      }
      val d = md.digest()
      // leading 60 bits = first 15 hex nibbles, matching
      // conv(substring(md5(g), 1, 15), 16, 10)
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      arr(c) = v >>> 4
      c += 1
    }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    hashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("wordChunkHashes", this,
        classOf[WordChunkHashes].getName)
      s"${ev.value} = $self.hashes($s);"
    })

  override def prettyName: String = "word_chunk_hashes"

  override protected def withNewChildInternal(
      newChild: Expression): WordChunkHashes =
    copy(child = newChild)
}
