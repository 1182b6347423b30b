package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.functions.Dedup

/** One-permutation MinHash signature (OPH) with rotation densification
  * (Li/Owen/Zhang '12; Shrivastava & Li '14): ONE affine permutation of
  * each pre-computed 32-bit base hash, bucketed into `numHashes` bins
  * by residue, keeping the per-bin minimum; empty bins borrow the
  * nearest non-empty bin to the RIGHT (circular), offset by
  * distance·P so borrowed values collide only with equal-distance
  * borrows of the SAME source value — the densified estimator is
  * unbiased: P(sig_i(A)=sig_i(B)) = J(A,B) per bin.
  *
  * Cost: O(|set| + k) versus the k-permutation family's O(|set|·k) —
  * the ~k× cut that matters because the banding policy
  * (Dedup.minhashParamsFor) grows k with log n: at the 100× probe the
  * auto path evaluates 189 permutations per shingle on the classic
  * path and exactly one here. Used by nearDuplicatePairsAuto (whose
  * oracle pins the POLICY and the recall floor, not signature values);
  * the fixed-param declared outputs keep the classic k-permutation
  * signatures their oracles re-derive.
  *
  * Values are NOT comparable with MinHashSigFromHashes output — a
  * signature family is an internal contract between signing and
  * banding, and both sides of any join must use the same one.
  */
case class MinHashSigOPH(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1)

  // one shared permutation decorrelates bin assignment from the raw
  // md5-derived hashes (same affine family as the classic signatures)
  private val A: Long = Dedup.minhashA(0)
  private val B: Long = Dedup.minhashB(0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // empty hash set has no minima — null, like MinHashSigFromHashes
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val k = numHashes
    val mins = Array.fill[Long](k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val u = (A * arr.getLong(i) + B) % Dedup.MinhashPrime
      val bin = (u % k).toInt
      if (u < mins(bin)) mins(bin) = u
      i += 1
    }
    // rotation densification in O(k): nearest non-empty bin at or
    // after each index (circular) via one wrapped backward pass
    val nn = new Array[Int](k)
    var nearest = -1
    var t = 2 * k - 1
    while (t >= 0) {
      val j = t % k
      if (mins(j) != Long.MaxValue) nearest = j
      if (t < k) nn(j) = nearest
      t -= 1
    }
    val out = new Array[Long](k)
    var b = 0
    while (b < k) {
      if (mins(b) != Long.MaxValue) out(b) = mins(b)
      else {
        val src = nn(b)
        val d = ((src - b) % k + k) % k
        out(b) = mins(src) + d.toLong * Dedup.MinhashPrime
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val nn = ctx.freshName("nn")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val u = ctx.freshName("u")
      val bin = ctx.freshName("bin")
      val nearest = ctx.freshName("nearest")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val src = ctx.freshName("src")
      val d = ctx.freshName("d")
      val p = s"${Dedup.MinhashPrime}L"
      s"""
         |final int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $u = (${A}L * $arr.getLong($i) + ${B}L) % $p;
         |    final int $bin = (int) ($u % $numHashes);
         |    if ($u < $mins[$bin]) $mins[$bin] = $u;
         |  }
         |  final int[] $nn = new int[$numHashes];
         |  int $nearest = -1;
         |  for (int $t = 2 * $numHashes - 1; $t >= 0; $t--) {
         |    final int $j = $t % $numHashes;
         |    if ($mins[$j] != Long.MAX_VALUE) $nearest = $j;
         |    if ($t < $numHashes) $nn[$j] = $nearest;
         |  }
         |  final long[] $out = new long[$numHashes];
         |  for (int $b = 0; $b < $numHashes; $b++) {
         |    if ($mins[$b] != Long.MAX_VALUE) { $out[$b] = $mins[$b]; }
         |    else {
         |      final int $src = $nn[$b];
         |      final int $d = (($src - $b) % $numHashes + $numHashes) % $numHashes;
         |      $out[$b] = $mins[$src] + (long) $d * $p;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override def prettyName: String = "minhash_sig_oph"

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigOPH =
    copy(child = newChild)
}
