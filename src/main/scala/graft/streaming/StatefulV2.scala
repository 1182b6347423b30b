package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import StreamingAnalytics.{ClosedSession, SessionState}

/** Arbitrary-state v2 (Spark 4 `transformWithState`): sessionization
  * with the same close-on-gap semantics as
  * `StreamingAnalytics.sessionize` (the flatMapGroupsWithState v1 twin,
  * batch face EventOps.e02), PLUS one event-time timer per key that
  * closes the trailing idle session once the watermark passes its
  * deadline — the session the v1 operator can only ever emit if a later
  * event happens to arrive for that user. With timers, the stream's
  * total output equals the batch sessionizer's (every session is
  * eventually emitted), not just its closed prefix.
  *
  * Scale: the v2 operator requires the RocksDB state store, which
  * bounds executor heap no matter how many million keys hold open
  * sessions (state spills to local SST files, checkpointed
  * incrementally); timers live in their own column family and are
  * range-scanned up to the batch watermark, not enumerated per key.
  */
object StatefulV2 {

  /** Input row for the timer sessionizer: `ts_utc` carries the
    * watermark; `ts_us` keeps integer-exact microsecond arithmetic.
    */
  final case class TimedEvent(user_id: Long, ts_us: Long,
      ts_utc: java.sql.Timestamp)

  /** Per-key state machine: extend-or-close on input (identical to the
    * v1 fn), re-arm the idle timer at `last + gap`, and emit the open
    * session from `handleExpiredTimer` when the watermark proves no
    * event can extend it.
    */
  final class SessionTimerProcessor(gapUs: Long)
      extends StatefulProcessor[Long, TimedEvent, ClosedSession] {
    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TimedEvent],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(_.ts_us)
      var cur = if (session.exists()) Some(session.get()) else None
      val closed = Seq.newBuilder[ClosedSession]
      sorted.foreach { ev =>
        cur match {
          case Some(s) if ev.ts_us - s.last_us > gapUs =>
            closed += ClosedSession(key, s.start_us, s.last_us, s.n)
            cur = Some(SessionState(ev.ts_us, ev.ts_us, 1))
          case Some(s) =>
            cur = Some(SessionState(
              s.start_us, math.max(s.last_us, ev.ts_us), s.n + 1))
          case None =>
            cur = Some(SessionState(ev.ts_us, ev.ts_us, 1))
        }
      }
      cur.foreach { s =>
        session.update(s)
        // one timer per key: replace the previous deadline with the
        // new one (+1 ms: the batch gap rule is strict `> gap`, and
        // timers fire at watermark >= expiry)
        // materialize before deleting: deleteTimer-while-iterating the
        // state-store iterator is safe on RocksDB snapshots today but
        // undefined against other providers
        getHandle.listTimers().toList.foreach(getHandle.deleteTimer)
        getHandle.registerTimer((s.last_us + gapUs) / 1000 + 1)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] =
      if (session.exists()) {
        val s = session.get()
        session.clear()
        Iterator.single(ClosedSession(key, s.start_us, s.last_us, s.n))
      } else Iterator.empty
  }

  /** Sessionize a `(user_id long, ts_us long)` stream with idle-timeout
    * finalization. `delay` is the out-of-orderness bound; sessions
    * close `gapUs` of event time after their last event, once the
    * watermark proves it.
    */
  def sessionizeWithTimers(events: DataFrame, gapUs: Long,
      delay: String = "10 minutes"): Dataset[ClosedSession] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withColumn("ts_utc", timestamp_micros(col("ts_us")))
      .withWatermark("ts_utc", delay)
      .as[TimedEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // ----- MapState face: per-key categorical running aggregate --------

  final case class TypedEvent(user_id: Long, event_type: String, value: Double)
  final case class TypeAgg(user_id: Long, event_type: String, n: Long,
      total: Double)
  final case class CountSum(n: Long, total: Double)

  /** Per-(key, category) running aggregate on `MapState` — the state
    * face where a key owns an open-ended sub-keyed collection. The
    * point of MapState over a `ValueState[Map[..]]`: RocksDB stores one
    * state-store entry PER (key, category), so a batch touching 2 of a
    * user's 10k categories reads and writes 2 entries — a ValueState
    * map would deserialize, mutate, and rewrite all 10k on every
    * update. At 100 TB (millions of keys × wide category sets) that
    * per-entry access is the difference between O(touched) and
    * O(state) I/O per batch.
    *
    * Emission is Update-mode: each batch re-emits the new running
    * (n, total) for exactly the categories it touched; downstream
    * takes latest-per-(user, category) (n is monotone, so max(n) is
    * the latest — the spec pins stream-final == batch groupBy).
    */
  final class TypeAggProcessor
      extends StatefulProcessor[Long, TypedEvent, TypeAgg] {
    @transient private var counts: MapState[String, CountSum] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, CountSum]("counts",
        Encoders.STRING, Encoders.product[CountSum], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[TypeAgg] = {
      val touched = scala.collection.mutable.LinkedHashMap.empty[String, CountSum]
      rows.foreach { e =>
        val cur = touched.getOrElse(e.event_type,
          if (counts.containsKey(e.event_type)) counts.getValue(e.event_type)
          else CountSum(0L, 0.0))
        touched(e.event_type) = CountSum(cur.n + 1, cur.total + e.value)
      }
      touched.foreach { case (t, cs) => counts.updateValue(t, cs) }
      touched.iterator.map { case (t, cs) => TypeAgg(key, t, cs.n, cs.total) }
    }
  }

  /** Running per-(user, event_type) counts and value sums over a
    * `(user_id long, event_type string, value double)` stream.
    * Processing-time mode: no watermark needed, every batch's updates
    * emit immediately.
    */
  def typeAggsWithMapState(events: DataFrame): Dataset[TypeAgg] = {
    val s = events.sparkSession
    import s.implicits._
    events.as[TypedEvent]
      .groupByKey(_.user_id)
      .transformWithState(new TypeAggProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  // ----- ListState face: bounded recent-events buffer ----------------

  final case class TimedValue(user_id: Long, ts_us: Long, value: Double,
      ts_utc: java.sql.Timestamp)
  final case class BufEntry(ts_us: Long, value: Double)
  final case class RecentDigest(user_id: Long, n_events: Int,
      start_us: Long, end_us: Long, total: Double)

  /** Idle-flush bounded buffer on `ListState`: each key accumulates its
    * most recent `keep` events; when the watermark proves the key idle
    * for `gapUs`, the buffered window is emitted as one digest and the
    * buffer clears (events arriving later start a fresh buffer). The
    * shape a per-user feature extractor needs — "hand me the last N
    * events whenever a user goes quiet" — without ever holding more
    * than N entries per key.
    *
    * ListState earns its keep on the append path: `appendList` is a
    * RocksDB merge (O(delta) write, no read-modify-write of the
    * existing buffer); the O(keep) read+trim runs only for keys the
    * batch touched, and `keep` bounds it regardless of how many events
    * a key has ever seen.
    */
  final class RecentBufferProcessor(keep: Int, gapUs: Long)
      extends StatefulProcessor[Long, TimedValue, RecentDigest] {
    @transient private var buf: ListState[BufEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[BufEntry]("buf",
        Encoders.product[BufEntry], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TimedValue],
        timerValues: TimerValues): Iterator[RecentDigest] = {
      val delta = rows.map(e => BufEntry(e.ts_us, e.value)).toArray
      if (delta.nonEmpty) buf.appendList(delta)
      // trim to the newest `keep` (ties broken by value for determinism)
      val kept = buf.get().toArray.sortBy(e => (e.ts_us, e.value))
        .takeRight(keep)
      if (kept.nonEmpty) {
        buf.put(kept)
        getHandle.listTimers().toList.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(kept.last.ts_us / 1000 + gapUs / 1000 + 1)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[RecentDigest] = {
      val kept = buf.get().toArray
      buf.clear()
      if (kept.isEmpty) Iterator.empty
      else {
        var total = 0.0
        kept.foreach(total += _.value)
        Iterator.single(RecentDigest(key, kept.length,
          kept.map(_.ts_us).min, kept.map(_.ts_us).max, total))
      }
    }
  }

  /** Digest of each key's last `keep` events, flushed `gapUs` of event
    * time after the key goes idle. Input: `(user_id long, ts_us long,
    * value double)`.
    */
  def recentDigestsWithListState(events: DataFrame, keep: Int, gapUs: Long,
      delay: String = "10 minutes"): Dataset[RecentDigest] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withColumn("ts_utc", timestamp_micros(col("ts_us")))
      .withWatermark("ts_utc", delay)
      .as[TimedValue]
      .groupByKey(_.user_id)
      .transformWithState(new RecentBufferProcessor(keep, gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // ----- TTL face: state hygiene for unbounded key cardinality -------

  final case class KeyCount(user_id: Long, n: Long)

  /** Running per-key counter whose state carries a PROCESSING-TIME TTL:
    * a key not updated within `ttl` has its value expired by the state
    * store itself — the hygiene mechanism for unbounded key spaces
    * (one-visit users, rotating session ids) where neither watermarks
    * nor explicit timers fit: event-time timers need per-key timer
    * registrations the processor must manage, while TTL is declared
    * once on the state and enforced store-side. After expiry the key
    * re-counts from zero, exactly as if never seen — pinned by spec
    * across query restarts on one checkpoint.
    */
  final class TtlCountProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, TypedEvent, KeyCount] {
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong,
        TTLConfig(ttl))

    override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[KeyCount] = {
      val prev = if (cnt.exists()) cnt.get() else 0L
      val n = prev + rows.size
      cnt.update(n)
      Iterator.single(KeyCount(key, n))
    }
  }

  /** Per-user event counts with state TTL; TTL requires processing-time
    * mode (expiry is wall-clock by definition).
    */
  def countsWithTtl(events: DataFrame, ttl: java.time.Duration): Dataset[KeyCount] = {
    val s = events.sparkSession
    import s.implicits._
    events.as[TypedEvent]
      .groupByKey(_.user_id)
      .transformWithState(new TtlCountProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  // ----- Bounded-state heavy hitters: sharded Misra–Gries ------------

  final case class ShardedToken(shard: Int, token: String)

  /** One live summary row: `est` never exceeds the token's true count
    * in its shard and undercounts by at most `decrements`; `n_processed`
    * is monotone per shard, so max-per-shard selects the final summary.
    */
  final case class MgEntry(shard: Int, token: String, est: Long,
      n_processed: Long, decrements: Long)

  final case class MgMeta(processed: Long, decrements: Long)

  /** Misra–Gries '82 frequency summary with at most `m` counters per
    * shard — the bounded-state answer when the vocabulary exceeds what
    * a state store should hold (exact per-token counting at 100 TB is
    * a billion-entry MapState; MG is m entries, with the theorem that
    * any token whose shard frequency exceeds N_shard/m is STILL
    * tracked, undercounted by at most the decrement total ≤ N_shard/m).
    * All of a token's occurrences hash to one shard, so a global heavy
    * hitter is heavy in its shard and cannot be lost.
    *
    * The decrement round is O(m) but runs at most N/m times (each
    * round cancels m occurrences), so the amortized cost per token is
    * O(1). With m ≥ the shard vocabulary no decrement ever fires and
    * the summary IS the exact count table — the bit-exact bridge to
    * the batch heavy-hitters query that the spec pins.
    *
    * Each batch re-emits the shard's full live summary stamped with
    * `n_processed`; MG summaries are arrival-order-dependent, so the
    * spec contract is the GUARANTEE (containment + error bound), plus
    * bit-equality in the m-unbounded regime where order cancels out.
    */
  final class MisraGriesProcessor(m: Int)
      extends StatefulProcessor[Int, ShardedToken, MgEntry] {
    @transient private var counters: MapState[String, Long] = _
    @transient private var meta: ValueState[MgMeta] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[String, Long]("counters",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      meta = getHandle.getValueState[MgMeta]("meta",
        Encoders.product[MgMeta], TTLConfig.NONE)
    }

    override def handleInputRows(key: Int, rows: Iterator[ShardedToken],
        timerValues: TimerValues): Iterator[MgEntry] = {
      // work on an in-memory copy: the decrement round touches every
      // counter, and per-entry state-store writes inside a loop over
      // the store's own iterator are both slow and undefined
      val live = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      counters.iterator().foreach { p => live(p._1) = p._2 }
      var mt = if (meta.exists()) meta.get() else MgMeta(0L, 0L)
      rows.foreach { r =>
        mt = mt.copy(processed = mt.processed + 1)
        live.get(r.token) match {
          case Some(c) => live(r.token) = c + 1
          case None if live.size < m => live(r.token) = 1L
          case None =>
            // full: the arrival cancels against one unit of every
            // tracked counter (m+1 distinct tokens each lose one)
            mt = mt.copy(decrements = mt.decrements + 1)
            live.filterInPlace((_, c) => c > 1)
            live.mapValuesInPlace((_, c) => c - 1)
        }
      }
      // rewrite only the delta: removed keys, then upserts
      counters.keys().toList.foreach { k =>
        if (!live.contains(k)) counters.removeKey(k)
      }
      live.foreach { case (t, c) => counters.updateValue(t, c) }
      meta.update(mt)
      live.iterator.map { case (t, c) =>
        MgEntry(key, t, c, mt.processed, mt.decrements)
      }
    }
  }

  /** Sharded MG heavy hitters over a `(token string)` stream: tokens
    * hash to `shards` independent summaries of at most `m` counters.
    */
  def misraGriesTokens(tokens: DataFrame, m: Int,
      shards: Int): Dataset[MgEntry] = {
    val s = tokens.sparkSession
    import s.implicits._
    tokens
      .select(pmod(hash(col("token")), lit(shards)).cast("int").as("shard"),
        col("token"))
      .as[ShardedToken]
      .groupByKey(_.shard)
      .transformWithState(new MisraGriesProcessor(m),
        TimeMode.None(), OutputMode.Append())
  }
}
