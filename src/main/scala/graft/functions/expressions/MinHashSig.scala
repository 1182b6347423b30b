package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.functions.Dedup

/** MinHash signature of a shingle array as `array<long>`: for each
  * element take the leading 32 bits of its md5, then keep the running
  * minimum of every affine permutation (aᵢ·H + bᵢ) mod p — bit-for-bit
  * the values of
  * `array(i -> array_min(transform(hashes, h -> (aᵢ*h+bᵢ) % p)))`
  * but in ONE pass with no intermediate arrays. The HOF formulation
  * re-evaluates the md5 column once per seed (Catalyst collapses the
  * hash projection back into every lambda and does not CSE across
  * them), making this expression ~10× faster at 16 seeds.
  *
  * Participates in whole-stage codegen (doGenCode mirrors nullSafeEval
  * exactly; the permutation constants ride along as reference objects,
  * the MD5 digest as per-instance mutable state) so the signature stage
  * of the LSH pipeline stays inside one generated function.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1)

  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(Dedup.minhashA)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(Dedup.minhashB)

  @transient private lazy val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // an empty shingle set has no minimum — whole signature is null, like
  // array_min over an empty array
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill[Long](numHashes)(Long.MaxValue)
    val md = digest.get()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      md.reset()
      val d = md.digest(s.getBytes)
      // leading 32 bits of the digest, as the unsigned value that
      // conv(substring(md5(x),1,8), 16, 10) yields
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var k = 0
      while (k < numHashes) {
        val v = (as(k) * h + bs(k)) % Dedup.MinhashPrime
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val md = ctx.addMutableState("java.security.MessageDigest", "minhashMd",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
                |""".stripMargin)
      val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
      val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val h = ctx.freshName("h")
      val k = ctx.freshName("k")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    $md.reset();
         |    final byte[] $d = $md.digest($arr.getUTF8String($i).getBytes());
         |    final long $h = (($d[0] & 0xffL) << 24) | (($d[1] & 0xffL) << 16) |
         |      (($d[2] & 0xffL) << 8) | ($d[3] & 0xffL);
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      final long $v = ($asRef[$k] * $h + $bsRef[$k]) % ${Dedup.MinhashPrime}L;
         |      if ($v < $mins[$k]) $mins[$k] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override def prettyName: String = "minhash_sig"

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
