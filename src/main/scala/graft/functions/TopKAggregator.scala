package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest (score, id) pairs per
  * group in a bounded buffer — the UDAF path for top-k-per-key when the
  * rank-window formulation's full per-group sort is unwanted. Merge is
  * associative/commutative (k-bounded merge of sorted buffers), so the
  * aggregation is a normal partial/final hash aggregate: map-side
  * combine trims to k before the shuffle, moving O(groups·k) instead of
  * O(rows) — the difference that matters when one key holds millions of
  * candidate rows.
  *
  * Ordering: score descending, then id ascending (same deterministic
  * tie-break as the window formulation in VectorFunctions).
  */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Double), List[(Long, Double)], Seq[(Long, Double)]] {
  require(k >= 1)

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def trim(xs: List[(Long, Double)]): List[(Long, Double)] =
    xs.sortWith(better).take(k)

  override def zero: List[(Long, Double)] = Nil

  override def reduce(buf: List[(Long, Double)],
      in: (Long, Double)): List[(Long, Double)] = trim(in :: buf)

  override def merge(a: List[(Long, Double)],
      b: List[(Long, Double)]): List[(Long, Double)] = trim(a ::: b)

  override def finish(buf: List[(Long, Double)]): Seq[(Long, Double)] =
    buf.sortWith(better)

  override def bufferEncoder: Encoder[List[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
