package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory frequent-token summary (SpaceSaving, Metwally et al.
  * 2005; merged per Agarwal et al., "Mergeable Summaries", 2012: sum
  * shared counters, union, keep the `capacity` largest). At most
  * `capacity` counters ever exist per partial buffer, so the
  * partial/final hash aggregate moves O(capacity) per partition
  * instead of O(vocab) — the one-pass alternative to t22's exact
  * two-aggregation formulation when the vocabulary itself is
  * shuffle-prohibitive (token n-grams at corpus scale). Guarantees,
  * preserved under merge: any token with true count > total/(capacity+1)
  * is present in the output, and every reported count overestimates the
  * true count by at most the summed eviction minima. Output is the
  * counters sorted by (count desc, token asc) — a deterministic
  * SUPERSET of the true heavy hitters, to be exact-counted in a second
  * pass over just those candidates when exact counts matter.
  */
class FrequentTokens(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(capacity >= 1)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], token: String): Map[String, Long] =
    // NULL tokens are absent values, not countable items (built-in
    // aggregate convention) — admitting one would NPE the String
    // tie-break in merge/finish
    if (token == null) buf
    else buf.get(token) match {
      case Some(c) => buf.updated(token, c + 1)
      case None if buf.size < capacity => buf.updated(token, 1L)
      case None =>
        // evict the minimum counter (deterministic tie-break on token);
        // the newcomer inherits min+1 — the SpaceSaving overestimate
        val (mTok, mCnt) = buf.minBy { case (t, c) => (c, t) }
        (buf - mTok).updated(token, mCnt + 1)
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    // Mergeable-summaries compensation (Agarwal et al. 2012): a token
    // absent from a FULL summary may have been evicted there with count
    // up to that summary's minimum counter, so charge the minimum to
    // one-sided tokens. A below-capacity summary never evicted — its
    // floor is 0. This keeps every merged count an overestimate of the
    // true count (the 'never underestimate' guarantee).
    val floorA = if (a.size >= capacity) a.valuesIterator.min else 0L
    val floorB = if (b.size >= capacity) b.valuesIterator.min else 0L
    val union = (a.keySet ++ b.keySet).iterator.map { t =>
      t -> (a.getOrElse(t, floorA) + b.getOrElse(t, floorB))
    }.toMap
    if (union.size <= capacity) union
    else union.toSeq.sortBy { case (t, c) => (-c, t) }.take(capacity).toMap
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
