package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 60-bit SimHash of a token array — the production-scale variant of
  * SimHash16: per token the leading 60 bits (15 hex chars) of its md5
  * vote ±1 per bit position; bit j is set when positive votes exceed
  * half the tokens. 60 bits (not 64) keeps the sketch and every
  * intermediate strictly positive in signed-64 engines, so the oracle's
  * integer div/mod arithmetic is exact.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ones = new Array[Int](60)
    val md = digest.get()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // leading 15 hex chars = top 60 bits of the first 8 bytes
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v >>>= 4 // drop the 16th hex char
      var j = 0
      while (j < 60) {
        if (((v >>> j) & 1L) == 1L) ones(j) += 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (2 * ones(j) > n) out |= 1L << j
      j += 1
    }
    out
  }

  override def prettyName: String = "simhash60"

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
