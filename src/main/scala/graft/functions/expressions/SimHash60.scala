package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 60-bit SimHash of a token array — the production-scale variant of
  * SimHash16: per token the leading 60 bits (15 hex chars) of its md5
  * vote ±1 per bit position; bit j is set when positive votes exceed
  * half the tokens. 60 bits (not 64) keeps the sketch and every
  * intermediate strictly positive in signed-64 engines, so the oracle's
  * integer div/mod arithmetic is exact.
  *
  * Whole-stage codegen'd: doGenCode emits the same digest/vote loops as
  * nullSafeEval so the sketch stage of t06/t11 stays in generated code.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression {

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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val md = ctx.addMutableState("java.security.MessageDigest", "simhashMd",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
                |""".stripMargin)
      val n = ctx.freshName("n")
      val ones = ctx.freshName("ones")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val v = ctx.freshName("v")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $arr.numElements();
         |final int[] $ones = new int[60];
         |for (int $i = 0; $i < $n; $i++) {
         |  $md.reset();
         |  final byte[] $d = $md.digest($arr.getUTF8String($i).getBytes());
         |  long $v = 0L;
         |  for (int $b = 0; $b < 8; $b++) { $v = ($v << 8) | ($d[$b] & 0xffL); }
         |  $v >>>= 4;
         |  for (int $j = 0; $j < 60; $j++) {
         |    if ((($v >>> $j) & 1L) == 1L) $ones[$j]++;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 60; $j++) {
         |  if (2 * $ones[$j] > $n) $out |= 1L << $j;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override def prettyName: String = "simhash60"

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
