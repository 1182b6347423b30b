package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** 16-bit SimHash of a token array: per token, the leading 16 bits of
  * its md5 vote ±1 on each bit position; the sketch sets bit j when the
  * positive votes outnumber half the tokens (2·ones > n). Value-
  * identical to the HOF formulation in graft.functions.Dedup.simhash16Hof
  * (pinned by a test) at one digest per token instead of one per
  * token-per-bit-probe.
  *
  * Whole-stage codegen'd — doGenCode mirrors nullSafeEval bit-for-bit.
  */
case class SimHash16(child: Expression)
    extends UnaryExpression {

  @transient private lazy val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ones = new Array[Int](16)
    val md = digest.get()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      val v = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      var j = 0
      while (j < 16) {
        if (((v >> j) & 1) == 1) ones(j) += 1
        j += 1
      }
      i += 1
    }
    var out = 0
    var j = 0
    while (j < 16) {
      if (2 * ones(j) > n) out |= 1 << j
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val md = ctx.addMutableState("java.security.MessageDigest", "simhash16Md",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
                |""".stripMargin)
      val n = ctx.freshName("n")
      val ones = ctx.freshName("ones")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val v = ctx.freshName("v")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $arr.numElements();
         |final int[] $ones = new int[16];
         |for (int $i = 0; $i < $n; $i++) {
         |  $md.reset();
         |  final byte[] $d = $md.digest($arr.getUTF8String($i).getBytes());
         |  final int $v = (($d[0] & 0xff) << 8) | ($d[1] & 0xff);
         |  for (int $j = 0; $j < 16; $j++) {
         |    if ((($v >> $j) & 1) == 1) $ones[$j]++;
         |  }
         |}
         |int $out = 0;
         |for (int $j = 0; $j < 16; $j++) {
         |  if (2 * $ones[$j] > $n) $out |= 1 << $j;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override def prettyName: String = "simhash16"

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}
