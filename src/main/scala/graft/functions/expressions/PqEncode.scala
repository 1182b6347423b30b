package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Product-quantization encoding as ONE fused per-row pass — the
  * [[TwoLevelAssign]] treatment applied to the PQ encode stage. For an
  * `array<float>` vector and a driver-resident codebook
  * (`cb(mi)(ci)` = sub-centroid ci of subspace mi, each `subDim`
  * floats), returns `struct(codes array<long>, rnorm2 double)` where
  * `codes(mi)` is the L2-nearest code of subspace mi (ties to the
  * LOWER code) and `rnorm2` is Σ_mi dot(cb(mi)(codes(mi)), same) —
  * the reconstructed squared norm.
  *
  * Replaces the r15 DataFrame formulation — per-vector posexplode
  * into m subvector rows × broadcast-join against m·codes codebook
  * rows × argmin row_number window × regroup — which pushed a
  * corpus×(m·codes) frame through a window exchange and a
  * collect_list aggregation to argmin 16 numbers per subspace. The
  * kernel is a map-side pass: zero exchanges, zero row explosion.
  *
  * Bit-compat contract (pinned by a spec comparing against the old
  * formulation on the whole fixture):
  *  - the per-code L2 is the fold `aggregate(zip_with(sv, cv,
  *    (x,y) -> (x-y)²), 0.0, acc+v)` evaluated left to right in
  *    double, reproduced index-order exactly;
  *  - code comparison uses Spark's double TOTAL order
  *    (SQLOrderingUtil.compareDoubles — NaN greatest, -0 < 0), strict
  *    `<` keeping the lower code on ties, exactly the old
  *    `orderBy(l2 asc, code asc)` + `rn = 1`;
  *  - rnorm2 accumulates dot(cv, cv) (left-to-right double, the
  *    VectorFunctions.dot fold) in SUBSPACE ORDER — the old
  *    `sum(...)` over the grouped rows summed the same 16 doubles in
  *    partition-arrival order, so the deterministic m-order here is a
  *    strict determinism upgrade on values that feed only the ADC
  *    shortlist cut.
  *
  * Codegen delegates to `encode` through an instance reference (the
  * CharNgramSet pattern) — the scoring loops are JIT-hot JVM code and
  * the surrounding stage stays whole-stage generated.
  */
case class PqEncode(child: Expression, cb: Array[Array[Array[Float]]])
    extends UnaryExpression {

  require(cb.nonEmpty && cb.forall(_.nonEmpty), "empty PQ codebook")

  private val subDim = cb(0)(0).length

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("rnorm2", DoubleType, nullable = false)))

  override def nullable: Boolean = child.nullable

  // Σ x·x of a code vector, left-to-right double — dot(cv, cv)'s fold;
  // precomputed once per codebook entry (pure function of the plan
  // literal, not of any row)
  private val normSq: Array[Array[Double]] = cb.map(_.map { cv =>
    var s = 0.0
    var j = 0
    while (j < cv.length) {
      val x = cv(j).toDouble
      s += x * x
      j += 1
    }
    s
  })

  /** One fused pass; called from interpreted and generated code. */
  def encode(v: ArrayData): InternalRow = {
    val m = cb.length
    val codes = new Array[Long](m)
    var rnorm2 = 0.0
    val nAvail = v.numElements()
    var mi = 0
    while (mi < m) {
      val cbm = cb(mi)
      val off = mi * subDim
      var best = 0
      var bestL2 = l2(v, off, nAvail, cbm(0))
      var ci = 1
      while (ci < cbm.length) {
        val d = l2(v, off, nAvail, cbm(ci))
        if (SQLOrderingUtil.compareDoubles(d, bestL2) < 0) {
          best = ci
          bestL2 = d
        }
        ci += 1
      }
      codes(mi) = best.toLong
      rnorm2 += normSq(mi)(best)
      mi += 1
    }
    InternalRow(new GenericArrayData(codes), rnorm2)
  }

  // the zip_with((x,y) -> (x-y)²) + aggregate(0.0, acc+v) fold,
  // index order, doubles throughout
  private def l2(v: ArrayData, off: Int, nAvail: Int,
      c: Array[Float]): Double = {
    val n = math.min(c.length, math.max(0, nAvail - off))
    var s = 0.0
    var j = 0
    while (j < n) {
      val d = v.getFloat(off + j).toDouble - c(j).toDouble
      s += d * d
      j += 1
    }
    s
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val self = ctx.addReferenceObj("pqEncode", this,
        classOf[PqEncode].getName)
      s"${ev.value} = $self.encode($s);"
    })

  override def prettyName: String = "pq_encode"

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
