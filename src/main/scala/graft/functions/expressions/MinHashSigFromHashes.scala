package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.functions.Dedup

/** MinHash signature from PRE-COMPUTED 32-bit base hashes
  * (`array<long>`): the running minimum of every affine permutation
  * (aᵢ·H + bᵢ) mod p in one pass. Digest-free twin of MinHashSig —
  * used when the base hashes are already materialized for exact
  * verification (near-dup pipelines), so each shingle is md5'd exactly
  * once across the whole query instead of once for the signature and
  * once for the verification set.
  */
case class MinHashSigFromHashes(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1)

  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(Dedup.minhashA)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(Dedup.minhashB)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // empty hash set has no minimum — null, like MinHashSig
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill[Long](numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
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
      val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
      val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
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
         |    final long $h = $arr.getLong($i);
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      final long $v = ($asRef[$k] * $h + $bsRef[$k]) % ${Dedup.MinhashPrime}L;
         |      if ($v < $mins[$k]) $mins[$k] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override def prettyName: String = "minhash_sig_from_hashes"

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigFromHashes =
    copy(child = newChild)
}
