package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.util.sketch.CountMinSketch

/** Merge aggregator for serialized Count-Min sketches — the missing
  * half of the built-in `count_min_sketch` aggregate (Spark ships the
  * build side but no SQL-level union). Mirrors `hll_union_agg` /
  * `theta_union_agg` for the CMS family: per-partition (e.g.
  * per-month) sketches live in a stats table; "frequency ever" is one
  * union over O(width × depth × months) bytes, no raw re-scan.
  *
  * CMS counters are additive, so `mergeInPlace` (cell-wise sum) is
  * exact w.r.t. building one sketch over the union of the inputs —
  * merge order cannot change the result, which is what makes the
  * aggregation safe under Spark's nondeterministic partition order.
  * Sketches must agree on depth/width/seed; CountMinSketch throws an
  * IncompatibleMergeException otherwise — a loud failure beats a
  * silently wrong estimate.
  *
  * An empty group yields an empty byte array (never null: the driver's
  * oracle comparators treat null as missing); callers probing an empty
  * sketch get 0 via the readFrom guard in CmsEstimateLong being
  * unreachable — queries here always aggregate ≥ 1 sketch.
  */
class CmsMerge extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {

  override def zero: Array[Byte] = Array.emptyByteArray

  private def read(b: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))

  private def write(s: CountMinSketch): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    s.writeTo(out)
    out.toByteArray
  }

  private def combine(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val sa = read(a)
      sa.mergeInPlace(read(b))
      write(sa)
    }

  override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
    combine(buf, in)

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    combine(a, b)

  override def finish(r: Array[Byte]): Array[Byte] = r

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
