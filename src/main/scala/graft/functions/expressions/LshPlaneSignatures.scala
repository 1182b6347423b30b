package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Multi-table hyperplane-LSH signatures of a float vector: for table t
  * the `planesPerTable`-bit key whose bit j is [Σᵢ sign(p,i)·vᵢ > 0]
  * with p = t·planesPerTable+j and sign(p,i) = ±1 from the parity of
  * the last hex digit of md5("plane{p}_{i}") — exactly the
  * VectorFunctions.planeSign construction the oracle SQL mirrors.
  *
  * The ±1 matrix is computed once per (expression instance, dimension
  * count) instead of one md5 per (row, plane, dim): the HOF
  * formulation spends its whole runtime re-hashing plane ids. Double
  * accumulation is left-to-right, bit-identical to the
  * zip_with/aggregate form.
  *
  * Whole-stage codegen'd: the generated code fetches the cached sign
  * matrix through a reference to this instance (`signsFor` is a cheap
  * bounds check after the first row) and inlines the projection loops.
  */
case class LshPlaneSignatures(child: Expression, tables: Int, planesPerTable: Int)
    extends UnaryExpression {
  require(tables >= 1 && planesPerTable >= 1 && planesPerTable <= 30)

  private def numPlanes = tables * planesPerTable

  // sign matrix grown lazily to the seen dimensionality; per-instance
  // (expressions are serialized per task), so plain var is safe
  @transient private var signs: Array[Array[Double]] = _
  @transient private var signDims: Int = 0

  private def ensureSigns(dims: Int): Unit = {
    if (signs == null) signs = Array.fill(numPlanes)(Array.emptyDoubleArray)
    if (dims <= signDims) return
    val md = MessageDigest.getInstance("MD5")
    var p = 0
    while (p < numPlanes) {
      val grown = java.util.Arrays.copyOf(signs(p), dims)
      var i = signDims
      while (i < dims) {
        md.reset()
        val d = md.digest(s"plane${p}_$i".getBytes("UTF-8"))
        grown(i) = if (((d(15) & 0x0f) & 1) == 0) 1.0 else -1.0
        i += 1
      }
      signs(p) = grown
      p += 1
    }
    signDims = dims
  }

  /** Sign matrix for `dims` dimensions — called from generated code. */
  def signsFor(dims: Int): Array[Array[Double]] = {
    ensureSigns(dims)
    signs
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val dims = vec.numElements()
    ensureSigns(dims)
    val v = new Array[Double](dims)
    var i = 0
    while (i < dims) { v(i) = vec.getFloat(i).toDouble; i += 1 }
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var j = 0
      while (j < planesPerTable) {
        val s = signs(t * planesPerTable + j)
        var acc = 0.0
        var k = 0
        while (k < dims) { acc += v(k) * s(k); k += 1 }
        if (acc > 0) sig |= 1 << j
        j += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val self = ctx.addReferenceObj("lshPlanes", this,
        classOf[LshPlaneSignatures].getName)
      val dims = ctx.freshName("dims")
      val signs = ctx.freshName("signs")
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val sig = ctx.freshName("sig")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val k = ctx.freshName("k")
      s"""
         |final int $dims = $vec.numElements();
         |final double[][] $signs = $self.signsFor($dims);
         |final double[] $v = new double[$dims];
         |for (int $i = 0; $i < $dims; $i++) { $v[$i] = (double) $vec.getFloat($i); }
         |final int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $sig = 0;
         |  for (int $j = 0; $j < $planesPerTable; $j++) {
         |    final double[] $s = $signs[$t * $planesPerTable + $j];
         |    double $acc = 0.0;
         |    for (int $k = 0; $k < $dims; $k++) { $acc += $v[$k] * $s[$k]; }
         |    if ($acc > 0) $sig |= 1 << $j;
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override def prettyName: String = "lsh_plane_signatures"

  override protected def withNewChildInternal(newChild: Expression): LshPlaneSignatures =
    copy(child = newChild)
}
