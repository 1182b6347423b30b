package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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
}
