package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Two-level (coarse-quantizer) IVF assignment kernel: for an
  * `array<float>` vector, score the ~√k super-centroids, keep the top
  * `coarseProbe`, score only those supers' child centroids, and return
  * the best child's cid (highest cosine, ties to the lower cid) — all
  * in ONE fused per-row pass with no exploded (vector × centroid)
  * frame and no shuffle.
  *
  * Why it exists: flat assignment costs k cosines per vector, and once
  * k follows the ivfParamsFor contract (k ~ n/cellTarget) that is
  * n²/cellTarget arithmetic — quadratic at corpus scale (measured:
  * the flat path became the dominant cost of the kNN-graph build at
  * the 100× probe). This kernel does ~(1 + coarseProbe)·√k cosines per
  * vector. Assignment is APPROXIMATE: the true nearest child can hide
  * under an unprobed super; `coarseProbe = #supers` degenerates to the
  * exact flat assignment (the equivalence a spec pins), and the spec
  * also pins the partial-probe agreement rate on the fixture.
  *
  * Codegen: participates in whole-stage codegen by calling back into
  * this instance (addReferenceObj) — the scoring loops run as JIT-hot
  * JVM code either way; what matters is that the ROW pipeline stays
  * fused (no CodegenFallback barrier, no shuffle).
  *
  * `superVecs(s)` is super s's vector; `childCids(s)(j)` /
  * `childVecs(s)(j)` are the cid/vector of super s's j-th child.
  * Cosine matches expressions.CosineSimilarity bit-for-bit
  * (left-to-right double accumulation).
  */
case class TwoLevelAssign(child: Expression,
    superVecs: Array[Array[Float]],
    childCids: Array[Array[Long]],
    childVecs: Array[Array[Array[Float]]],
    coarseProbe: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  private def dotNorm(v: ArrayData, c: Array[Float]): Double = {
    val n = math.min(v.numElements(), c.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      val y = c(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // NaN (zero-norm side) normalizes to +Inf so the kernel's argmax
    // matches flat ivfAssign's window ordering, where Spark sorts NaN
    // above every real double under `desc` — without this a zero-norm
    // input fails every comparison and no child is ever scored.
    val cos = dot / (math.sqrt(na) * math.sqrt(nb))
    if (cos != cos) Double.PositiveInfinity else cos
  }

  /** Public for the generated code's callback. */
  def assign(v: ArrayData): Long = {
    val s = superVecs.length
    val p = math.min(coarseProbe, s)
    // top-p supers by cosine (ties -> lower index); p is small, so
    // insertion into parallel arrays beats a heap
    val topSid = new Array[Int](p)
    val topCos = new Array[Double](p)
    var filled = 0
    var si = 0
    while (si < s) {
      val c = dotNorm(v, superVecs(si))
      var pos = filled
      while (pos > 0 && (topCos(pos - 1) < c)) pos -= 1
      if (pos < p) {
        val last = math.min(filled, p - 1)
        var j = last
        while (j > pos) {
          topSid(j) = topSid(j - 1); topCos(j) = topCos(j - 1); j -= 1
        }
        topSid(pos) = si
        topCos(pos) = c
        if (filled < p) filled += 1
      }
      si += 1
    }
    // argmax over the probed supers' children
    var bestCid = Long.MaxValue
    var bestCos = Double.NegativeInfinity
    var scored = false
    var t = 0
    while (t < filled) {
      val sid = topSid(t)
      val cids = childCids(sid)
      val vecs = childVecs(sid)
      var j = 0
      while (j < cids.length) {
        val c = dotNorm(v, vecs(j))
        scored = true
        if (c > bestCos || (c == bestCos && cids(j) < bestCid)) {
          bestCos = c
          bestCid = cids(j)
        }
        j += 1
      }
      t += 1
    }
    // Fallback: if every probed super was childless (possible only when
    // the caller did not prune empty supers), never emit the sentinel —
    // a phantom cid would flow into the index as an unsearchable list
    // partition. Scan ALL children instead (the flat argmax).
    if (!scored) {
      var si2 = 0
      while (si2 < s) {
        val cids = childCids(si2)
        val vecs = childVecs(si2)
        var j = 0
        while (j < cids.length) {
          val c = dotNorm(v, vecs(j))
          if (c > bestCos || (c == bestCos && cids(j) < bestCid)) {
            bestCos = c
            bestCid = cids(j)
          }
          j += 1
        }
        si2 += 1
      }
    }
    bestCid
  }

  override def nullSafeEval(input: Any): Any =
    assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("twoLevelAssign", this,
      classOf[TwoLevelAssign].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.assign($a);")
  }

  override def prettyName: String = "two_level_assign"

  override protected def withNewChildInternal(newChild: Expression): TwoLevelAssign =
    copy(child = newChild)
}

/** TwoLevelAssign's multi-assignment sibling: the same fused
  * coarse-probe pass, but returning the top `nAssign` child cids
  * (cosine desc, ties to the lower cid) as `array<long>` instead of
  * the single argmax — the kernel behind symmetric nprobe>1 IVF cell
  * assignment (nearDupPairsRouted's boundary-loss fix: a θ-similar
  * pair straddling a cell boundary is recovered when EITHER side's
  * top-2 cells include the other's). With `coarseProbe = #supers` the
  * result is exactly flat ivfAssign(nprobe = nAssign)'s per-vector
  * cell list (spec-pinned); partial probes are approximate the same
  * way TwoLevelAssign is. Cost is identical to TwoLevelAssign —
  * ~(1 + coarseProbe)·√k cosines per row — plus an O(nAssign)
  * insertion per child scored.
  */
case class TwoLevelAssignTopK(child: Expression,
    superVecs: Array[Array[Float]],
    childCids: Array[Array[Long]],
    childVecs: Array[Array[Array[Float]]],
    coarseProbe: Int,
    nAssign: Int) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = child.nullable

  private def dotNorm(v: ArrayData, c: Array[Float]): Double = {
    val n = math.min(v.numElements(), c.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      val y = c(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // see TwoLevelAssign.dotNorm: zero-norm cosines sort like Spark's
    // NaN-above-everything `desc` ordering
    val cos = dot / (math.sqrt(na) * math.sqrt(nb))
    if (cos != cos) Double.PositiveInfinity else cos
  }

  /** Public for the generated code's callback. */
  def assignTopK(v: ArrayData): ArrayData = {
    val s = superVecs.length
    val p = math.min(coarseProbe, s)
    val topSid = new Array[Int](p)
    val topCos = new Array[Double](p)
    var filled = 0
    var si = 0
    while (si < s) {
      val c = dotNorm(v, superVecs(si))
      var pos = filled
      while (pos > 0 && (topCos(pos - 1) < c)) pos -= 1
      if (pos < p) {
        val last = math.min(filled, p - 1)
        var j = last
        while (j > pos) {
          topSid(j) = topSid(j - 1); topCos(j) = topCos(j - 1); j -= 1
        }
        topSid(pos) = si
        topCos(pos) = c
        if (filled < p) filled += 1
      }
      si += 1
    }
    // top-nAssign children across the probed supers (cos desc, ties
    // to the lower cid) — same insertion scheme, keyed on (cos, cid)
    val outCid = new Array[Long](nAssign)
    val outCos = new Array[Double](nAssign)
    var outFilled = 0
    def offer(cid: Long, c: Double): Unit = {
      var pos = outFilled
      while (pos > 0 && (outCos(pos - 1) < c ||
          (outCos(pos - 1) == c && outCid(pos - 1) > cid))) pos -= 1
      if (pos < nAssign) {
        val last = math.min(outFilled, nAssign - 1)
        var j = last
        while (j > pos) {
          outCid(j) = outCid(j - 1); outCos(j) = outCos(j - 1); j -= 1
        }
        outCid(pos) = cid
        outCos(pos) = c
        if (outFilled < nAssign) outFilled += 1
      }
    }
    var t = 0
    while (t < filled) {
      val sid = topSid(t)
      val cids = childCids(sid)
      val vecs = childVecs(sid)
      var j = 0
      while (j < cids.length) {
        offer(cids(j), dotNorm(v, vecs(j)))
        j += 1
      }
      t += 1
    }
    // childless-probe fallback: scan ALL children (see TwoLevelAssign)
    if (outFilled == 0) {
      var si2 = 0
      while (si2 < s) {
        val cids = childCids(si2)
        val vecs = childVecs(si2)
        var j = 0
        while (j < cids.length) {
          offer(cids(j), dotNorm(v, vecs(j)))
          j += 1
        }
        si2 += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(outCid, outFilled))
  }

  override def nullSafeEval(input: Any): Any =
    assignTopK(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("twoLevelAssignTopK", this,
      classOf[TwoLevelAssignTopK].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.assignTopK($a);")
  }

  override def prettyName: String = "two_level_assign_top_k"

  override protected def withNewChildInternal(
      newChild: Expression): TwoLevelAssignTopK =
    copy(child = newChild)
}
