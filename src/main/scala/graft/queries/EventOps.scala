package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Event-time analytics over the `events` table — the batch-verifiable
  * faces of the streaming operators (tumbling windows, sessionization,
  * payload decode). The same transforms run under readStream in
  * graft.streaming; here they run as batch for the DuckDB oracle.
  *
  * `ts` has shipped in multiple parquet encodings (TIMESTAMP(NANOS)
  * read as a nanosecond long under nanosAsLong; TIMESTAMP_MICROS read
  * as TIMESTAMP_NTZ) — every query resolves the encoding through
  * Tables.tsMicros / Tables.tsUtc and works in integer microseconds
  * for cross-engine exactness.
  */
object EventOps {

  /** Session-scoped source artifacts for the streaming-bridge rows
    * (e35/e36): their input streams are deterministic functions of the
    * fixture dir (t22's token explode, t23's near-dup pairs), so the
    * parquet file-stream SOURCE is built once per (JVM, fixture dir)
    * and reused — Bench's interleaved passes and its sf0.001 warm-up
    * then time the STATEFUL machinery the rows exist to measure, not a
    * re-derivation another board row already prices (r12 verdict item
    * 5: e36 re-paid t23's pair generation on every pass). Only the
    * source dir is cached; checkpoint/state dirs stay fresh per run —
    * they hold the mutable state under test.
    */
  private val srcCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def cachedSrc(kind: String, dir: String)
      (build: String => Unit): String =
    srcCache.computeIfAbsent(s"$kind:$dir", _ => {
      val d = java.nio.file.Files.createTempDirectory(s"graft_$kind")
        .toString + "/data"
      build(d)
      d
    })

  /** Tumbling 1-hour event-time windows: count + exact value sum per
    * (window, event_type). Streaming equivalent: groupBy(window($"ts",
    * "1 hour"), $"event_type") with a watermark.
    */
  val e01TumblingWindows = Q(
    "e01_tumbling_windows",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .transform(Tables.withTsUtc(_))
        .groupBy(window($"ts_utc", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          // final decimal agg cast to double: dtype-stable across the
          // parquet->pandas and DuckDB->pandas paths (see Relational q01)
          sum($"value".cast("decimal(14,2)")).cast("double").as("sum_value"))
        .select($"window.start".as("ws"), $"event_type", $"n", $"sum_value")
        .orderBy($"ws", $"event_type")
    },
    Some("""
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY ws, event_type
    """.trim))

  /** Sessionization: per-user sessions split at >30 min inactivity —
    * lag + cumulative-sum windows in batch; mapGroupsWithState in the
    * streaming variant. Pure integer-nanos arithmetic end to end.
    */
  val e02Sessionize = Q(
    "e02_sessionize",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // microsecond resolution on both sides: DuckDB truncates parquet
      // TIMESTAMP(NANOS) to micros, so sub-µs detail can't be compared
      val byUser = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      val gapUs = 30L * 60 * 1000 * 1000
      Tables.load(s, dir, "events")
        .transform(Tables.withTsMicros(_))
        .withColumn("prev_ts", lag($"tus", 1).over(byUser))
        .withColumn("new_session",
          when($"prev_ts".isNull || $"tus" - $"prev_ts" > gapUs, 1).otherwise(0))
        .withColumn("session_idx",
          sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"session_idx")
        .agg(count(lit(1)).as("n_events"),
          min($"tus").as("start_us"), max($"tus").as("end_us"))
        .orderBy($"user_id", $"session_idx")
    },
    Some("""
      WITH g AS (
        SELECT user_id, event_id, epoch_us(ts) AS tus,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts
        FROM events),
      f AS (SELECT user_id, event_id, tus,
              CASE WHEN prev_ts IS NULL OR tus - prev_ts > 1800000000 THEN 1 ELSE 0 END AS new_session
            FROM g),
      sess AS (SELECT user_id, tus,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
               FROM f)
      SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             count(*) AS n_events,
             min(tus) AS start_us, max(tus) AS end_us
      FROM sess
      GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx
    """.trim))

  /** O18 — approval-payload decode: base64 + JSON round trip with field
    * extraction and lowercasing (process-pipeline.py:443-457), the
    * byte-level path approvals take through the engine.
    */
  val e03ApprovalDecode = Q(
    "e03_approval_decode",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .withColumn("payload", concat(
          lit("{\"event_id\": \""), $"event_id".cast("string"),
          lit("\", \"action\": \""), upper($"event_type"), lit("\"}")))
        .withColumn("b64", base64(encode($"payload", "UTF-8")))
        .withColumn("decoded", decode(unbase64($"b64"), "UTF-8"))
        // one from_json parse instead of a get_json_object per field
        .withColumn("payload_struct", from_json($"decoded",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("event_id",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("action",
              org.apache.spark.sql.types.StringType)))))
        .select(
          $"event_id",
          $"payload_struct.event_id".cast("long").as("decoded_id"),
          lower($"payload_struct.action").as("action"))
        .orderBy($"event_id")
    },
    Some("""
      WITH p AS (
        SELECT event_id,
               '{"event_id": "' || event_id || '", "action": "' || upper(event_type) || '"}' AS payload
        FROM events),
      b AS (SELECT event_id, to_base64(encode(payload)) AS b64 FROM p),
      d AS (SELECT event_id, decode(from_base64(b64)) AS decoded FROM b)
      SELECT event_id,
             CAST(json_extract_string(decoded, '$.event_id') AS BIGINT) AS decoded_id,
             lower(json_extract_string(decoded, '$.action')) AS action
      FROM d
      ORDER BY event_id
    """.trim))

  /** Backward as-of join (custom operator, graft.operators.AsOfJoin):
    * each error event picks up the user's most recent click at or
    * before it. DuckDB's native ASOF JOIN is the oracle.
    */
  val e04AsofJoin = Q(
    "e04_asof_join",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .transform(Tables.withTsMicros(_))
      val errors = ev.filter($"event_type" === "error")
        .select($"event_id", $"user_id", $"tus".as("ts_us"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_event"), $"user_id", $"tus", $"value")
      graft.operators.AsOfJoin.asofBackward(
        errors, clicks, keys = Seq("user_id"),
        leftTime = $"ts_us", rightTime = $"tus",
        rightCols = Map("click_event" -> "click_id", "value" -> "click_value"),
        rightOrd = $"click_event")
        .orderBy($"event_id")
    },
    Some("""
      SELECT e.event_id, e.user_id, e.tus AS ts_us,
             c.event_id AS click_id, c.value AS click_value
      FROM (SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
            WHERE event_type = 'error') e
      ASOF JOIN (SELECT event_id, user_id, epoch_us(ts) AS tus, value FROM events
                 WHERE event_type = 'click') c
        ON e.user_id = c.user_id AND e.tus >= c.tus
      ORDER BY e.event_id
    """.trim))

  /** Pivot: per-user event counts spread across fixed type columns
    * (Spark .pivot ↔ portable CASE-sum SQL).
    */
  val e05Pivot = Q(
    "e05_pivot",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id,
             -- CAST: DuckDB sum() is HUGEINT (float64 in pandas); Spark's
             -- pivot-count is int64 — BIGINT keeps both sides int64
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      FROM events
      GROUP BY user_id
      ORDER BY user_id
    """.trim))

  /** Sketch aggregation: approx_count_distinct (HLL++). The sketch
    * value itself has no portable oracle (DuckDB's approx sketch
    * differs bit-for-bit), so the query emits the exact distinct count
    * alongside a `within_bound` flag checking the sketch's relative
    * error against 3x the configured rsd ON THE SPARK SIDE; the oracle
    * computes the exact counts and pins `within_bound` to TRUE. A
    * sketch drifting past the bound flips the flag and fails the hash
    * compare — the bound is a checked invariant, not a rows-only hope.
    * (3x rsd: rsd is one standard deviation of the HLL++ estimator;
    * the fixed test corpora sit well inside it — observed rel_err at
    * sf0.001/sf0.01 is < 1x rsd — and 3 sigma leaves headroom without
    * accepting a broken sketch.)
    */
  val e06ApproxDistinct = Q(
    "e06_approx_distinct",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"event_type")
        .agg(approx_count_distinct($"user_id", rsd = 0.02).as("__approx"),
          countDistinct($"user_id").as("exact_users"),
          count(lit(1)).as("n"))
        .withColumn("within_bound",
          abs($"__approx".cast("double") / $"exact_users".cast("double")
            - lit(1.0)) <= lit(3 * 0.02))
        .select($"event_type", $"exact_users", $"n", $"within_bound")
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
             CAST(count(*) AS BIGINT) AS n,
             TRUE AS within_bound
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """.trim))

  /** Native session windows (30-min gap): Spark's session_window merges
    * events closer than the gap; the oracle reconstructs the same
    * sessions with the lag/cumsum formulation — window end is last
    * event + gap by definition.
    */
  val e07SessionWindow = Q(
    "e07_session_window",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .transform(Tables.withTsUtc(_))
        .groupBy(session_window($"ts_utc", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", $"session_window.start".as("ws"),
          $"session_window.end".as("we"), $"n_events")
        .orderBy($"user_id", $"ws")
    },
    Some("""
      WITH g AS (
        SELECT user_id, event_id, epoch_us(ts) AS tus,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts
        FROM events),
      f AS (SELECT user_id, event_id, tus,
              -- session_window is half-open [start, last+gap): an event
              -- exactly gap after the last one starts a NEW session (>=)
              CASE WHEN prev_ts IS NULL OR tus - prev_ts >= 1800000000 THEN 1 ELSE 0 END AS new_session
            FROM g),
      sess AS (SELECT user_id, tus,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
               FROM f)
      SELECT user_id,
             make_timestamp(min(tus)) AS ws,
             make_timestamp(max(tus) + 1800000000) AS we,
             count(*) AS n_events
      FROM sess
      GROUP BY user_id, session_idx
      ORDER BY user_id, ws
    """.trim))

  /** Range join (custom operator, graft.operators.RangeJoin): clicks
    * landing inside a 10-minute incident window opened by each error
    * event. Bucketized to a shuffle equi-join — a raw BETWEEN join
    * would plan as a BroadcastNestedLoopJoin (asserted away by
    * RangeJoinSpec); DuckDB's native range join is the oracle.
    */
  val e08RangeJoin = Q(
    "e08_range_join",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .transform(Tables.withTsMicros(_))
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"tus")
      val incidents = ev.filter($"event_type" === "error")
        .select($"event_id".as("incident_id"), $"tus".as("w_start"),
          ($"tus" + lit(600000000L)).as("w_end"))
      graft.operators.RangeJoin.pointInInterval(clicks, incidents,
        "tus", "w_start", "w_end", bucketWidth = 600000000L)
        .select($"incident_id", $"event_id", $"user_id", $"tus")
        .orderBy($"incident_id", $"event_id")
    },
    Some("""
      SELECT i.incident_id, c.event_id, c.user_id, c.tus
      FROM (SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
            WHERE event_type = 'click') c
      JOIN (SELECT event_id AS incident_id, epoch_us(ts) AS w_start,
                   epoch_us(ts) + 600000000 AS w_end
            FROM events WHERE event_type = 'error') i
        ON c.tus >= i.w_start AND c.tus < i.w_end
      ORDER BY incident_id, event_id
    """.trim))

  /** Unpivot (melt) — the inverse reshape of e05: the per-user pivoted
    * counts fold back to long form (user_id, event_type, n), zero
    * cells included (which a plain GROUP BY over the raw events cannot
    * produce — absent combinations simply don't group). Spark's native
    * `Dataset.unpivot` (an Expand node: one pass, rows×types output,
    * no join) vs DuckDB's UNPIVOT clause.
    */
  val e09Unpivot = Q(
    "e09_unpivot",
    (s, dir) => {
      import s.implicits._
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.load(s, dir, "events")
        .groupBy($"user_id")
        .pivot("event_type", types)
        .count()
        .na.fill(0L)
        .unpivot(Array($"user_id"), types.map(col).toArray, "event_type", "n")
        .orderBy($"user_id", $"event_type")
    },
    Some("""
      WITH pv AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events
        GROUP BY user_id)
      SELECT user_id, event_type, n
      FROM pv UNPIVOT (n FOR event_type IN (click, error, purchase, signup, view))
      ORDER BY user_id, event_type
    """.trim))

  /** Dynamic-gap session windows: the inactivity gap is a PER-EVENT
    * expression (errors hold a session open 60 minutes, everything
    * else 30) — `session_window(ts, gapExpr)`. Merge semantics differ
    * from the fixed-gap case in a way a lag-based oracle cannot
    * express: a session's end is the MAX of (event + its own gap) over
    * the merged set, so the oracle tracks a running-max end over all
    * preceding events, not the previous event's end. Streaming face is
    * the same operator under a watermark; batch face here for the
    * oracle.
    */
  val e10DynamicSession = Q(
    "e10_dynamic_session",
    (s, dir) => {
      import s.implicits._
      // dynamic gaps require CalendarIntervalType; ANSI interval
      // literals are DayTimeIntervalType and the operator rejects them
      val gap = when($"event_type" === "error",
          expr("cast('60 minutes' as interval)"))
        .otherwise(expr("cast('30 minutes' as interval)"))
      Tables.load(s, dir, "events")
        .transform(Tables.withTsUtc(_))
        .groupBy(session_window($"ts_utc", gap), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", $"session_window.start".as("ws"),
          $"session_window.end".as("we"), $"n_events")
        .orderBy($"user_id", $"ws")
    },
    Some("""
      WITH g AS (
        SELECT user_id, event_id, epoch_us(ts) AS tus,
               CASE WHEN event_type = 'error' THEN 3600000000 ELSE 1800000000 END AS gap_us
        FROM events),
      r AS (SELECT *,
              max(tus + gap_us) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
            FROM g),
      f AS (SELECT *, CASE WHEN prev_end IS NULL OR tus >= prev_end THEN 1 ELSE 0 END AS new_session
            FROM r),
      sess AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
               FROM f)
      SELECT user_id,
             make_timestamp(min(tus)) AS ws,
             make_timestamp(max(tus + gap_us)) AS we,
             count(*) AS n_events
      FROM sess
      GROUP BY user_id, session_idx
      ORDER BY user_id, ws
    """.trim))

  /** The `graftbus` event-bus source through the oracle gate: every
    * Spark partition PUBLISHES its split of the events table to a bus
    * partition from the executors (no driver collect — distributed
    * publish is the 100 TB shape), then the relation is read back
    * through the DSv2 batch scan and aggregated. The oracle aggregates
    * the same parquet directly, so rows/schema/hash pin the full
    * publish → segment encode → offset-planned scan → decode loop.
    * Doubles survive the payload round trip exactly because Spark's
    * double→string cast emits the shortest decimal representation,
    * which parses back to the identical bits.
    */
  val e11BusRoundtrip = Q(
    "e11_bus_roundtrip",
    (s, dir) => {
      import s.implicits._
      val busPartitions = 8
      val root = java.nio.file.Files.createTempDirectory("bus_e11").toString
      graft.sources.bus.BusLog.create(root, busPartitions)
      Tables.load(s, dir, "events")
        .select(concat_ws("\u0001", $"event_id", $"user_id", $"event_type",
          $"value".cast("string")).as("v"))
        .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
          val recs = rows.map(r => (0L, r.getString(0))).toSeq
          if (recs.nonEmpty) {
            val p = org.apache.spark.TaskContext.getPartitionId() % busPartitions
            graft.sources.bus.BusLog.publish(root, p, recs)
          }
          ()
        }
      val parts = split($"value", "\u0001")
      s.read.format("graftbus").option("path", root).load()
        .select(
          parts.getItem(0).cast("long").as("event_id"),
          parts.getItem(1).cast("long").as("user_id"),
          parts.getItem(2).as("event_type"),
          parts.getItem(3).cast("double").as("value"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users"),
          sum($"value".cast("decimal(14,2)")).cast("double").as("sum_value"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type,
             count(*) AS n_events,
             count(DISTINCT user_id) AS n_users,
             CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """.trim))

  /** Funnel analysis (view → click → purchase, strictly ordered,
    * earliest-match greedy): per user, the first view, the first click
    * AFTER that view, the first purchase AFTER that click, and the
    * funnel stage reached. The sequential dependency is expressed as
    * CHAINED window minimums over one `PARTITION BY user_id` — each
    * stage's conditional min references the previous stage's column —
    * so the whole funnel is ONE exchange on user_id feeding three
    * Window operators and a final same-partitioning aggregate: no
    * second shuffle, no per-user collect, no self-joins (the naive
    * 3-way self-join formulation shuffles the fact table three times).
    * Pure integer-micros arithmetic for cross-engine exactness.
    */
  val e12Funnel = Q(
    "e12_funnel",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id")
      val ev = Tables.load(s, dir, "events")
      ev.select($"user_id", $"event_type", Tables.tsMicros(ev).as("tus"))
        .withColumn("v_us",
          min(when($"event_type" === "view", $"tus")).over(byUser))
        .withColumn("c_us",
          min(when($"event_type" === "click" && $"tus" > $"v_us", $"tus"))
            .over(byUser))
        .withColumn("p_us",
          min(when($"event_type" === "purchase" && $"tus" > $"c_us", $"tus"))
            .over(byUser))
        .groupBy($"user_id")
        .agg(min($"v_us").as("v_us"), min($"c_us").as("c_us"),
          min($"p_us").as("p_us"))
        .withColumn("stage",
          when($"p_us".isNotNull, 3).when($"c_us".isNotNull, 2)
            .when($"v_us".isNotNull, 1).otherwise(0))
        .orderBy($"user_id")
    },
    Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
      w1 AS (SELECT user_id, event_type, tus,
                    min(CASE WHEN event_type = 'view' THEN tus END)
                      OVER (PARTITION BY user_id) AS v_us
             FROM e),
      w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND tus > v_us THEN tus END)
                         OVER (PARTITION BY user_id) AS c_us
             FROM w1),
      w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND tus > c_us THEN tus END)
                         OVER (PARTITION BY user_id) AS p_us
             FROM w2)
      SELECT user_id, min(v_us) AS v_us, min(c_us) AS c_us, min(p_us) AS p_us,
             CASE WHEN min(p_us) IS NOT NULL THEN 3
                  WHEN min(c_us) IS NOT NULL THEN 2
                  WHEN min(v_us) IS NOT NULL THEN 1
                  ELSE 0 END AS stage
      FROM w3
      GROUP BY user_id
      ORDER BY user_id
    """.trim))

  /** Events with the derived keys the sketch suite (e13–e15) aggregates
    * over: `day`/`month` partitions and the `uday` (user, day) activity
    * key — ~13.5k distinct udays at sf0.01, enough that the sketches
    * genuinely estimate rather than sit in their small-n exact mode.
    */
  private def eventDays(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
    ev.withColumn("day", to_date(Tables.tsUtc(ev)))
      .withColumn("month", trunc($"day", "month"))
      .withColumn("uday", concat_ws(":", $"user_id", $"day"))
  }

  /** Mergeable distinct counts — the 100 TB pattern for "distinct users
    * ever" dashboards: build one HLL sketch per (event_type, month)
    * partition (each an O(4 KB) binary, storable in a stats table), then
    * answer the all-time question by UNIONING sketches instead of
    * re-scanning raw events. Two-level here: hll_sketch_agg per month →
    * hll_union_agg across months → estimate, checked against the exact
    * distinct ± 3×rsd (lgConfigK=12 → rsd ≈ 1.6%). `sum_monthly_exact ==
    * exact_user_days` is the partition-disjointness invariant (a user-day
    * belongs to exactly one month), which is what makes per-partition
    * sketch builds embarrassingly parallel with no overlap correction.
    */
  val e13HllMerge = Q(
    "e13_hll_merge",
    (s, dir) => {
      import s.implicits._
      val ev = eventDays(s, dir)
      val monthly = ev.groupBy($"event_type", $"month")
        .agg(expr("hll_sketch_agg(uday, 12)").as("sk"),
          countDistinct($"uday").as("exact_m"))
      val merged = monthly.groupBy($"event_type")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("__est"),
          count(lit(1)).as("n_months"),
          sum($"exact_m").as("sum_monthly_exact"))
      val exact = ev.groupBy($"event_type")
        .agg(countDistinct($"uday").as("exact_user_days"))
      merged.join(exact, "event_type")
        .select($"event_type", $"n_months", $"sum_monthly_exact",
          $"exact_user_days",
          (abs($"__est".cast("double") / $"exact_user_days".cast("double")
            - lit(1.0)) <= lit(0.05)).as("within_bound"))
        .orderBy($"event_type")
    },
    Some("""
      WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                        user_id || ':' || CAST(ts AS DATE) AS uday
                 FROM events),
      m AS (SELECT event_type, date_trunc('month', day) AS month,
                   count(DISTINCT uday) AS exact_m
            FROM e GROUP BY 1, 2),
      a AS (SELECT event_type, count(*) AS n_months,
                   sum(exact_m) AS sum_monthly_exact
            FROM m GROUP BY 1),
      x AS (SELECT event_type, count(DISTINCT uday) AS exact_user_days
            FROM e GROUP BY 1)
      SELECT a.event_type, CAST(n_months AS BIGINT) AS n_months,
             CAST(sum_monthly_exact AS BIGINT) AS sum_monthly_exact,
             CAST(exact_user_days AS BIGINT) AS exact_user_days,
             TRUE AS within_bound
      FROM a JOIN x ON a.event_type = x.event_type
      ORDER BY a.event_type
    """.trim))

  /** Set algebra on distinct sets WITHOUT a join — Theta sketches make
    * |A∪B|, |A∩B|, |A∖B| computable from two mergeable per-partition
    * summaries, where the exact answer needs a full shuffle of both key
    * sets. Two-level again: per-month theta_sketch_agg for click-days
    * and purchase-days → theta_union_agg across months → set-expression
    * estimates. Error bounds follow the theta guarantee shape: union
    * relative; intersection/difference ABSOLUTE vs the union size (a
    * small intersection of two big sets has unbounded relative error).
    * Exact side: per-(user, day) boolean flags, one aggregate.
    */
  val e14ThetaSetops = Q(
    "e14_theta_setops",
    (s, dir) => {
      import s.implicits._
      val ev = eventDays(s, dir)
        .filter($"event_type".isin("click", "purchase"))
      val monthly = ev.groupBy($"month")
        .agg(
          expr("theta_sketch_agg(CASE WHEN event_type = 'click' THEN uday END)").as("csk"),
          expr("theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN uday END)").as("psk"))
      val est = monthly
        .agg(expr("theta_union_agg(csk)").as("cm"), expr("theta_union_agg(psk)").as("pm"))
        .select(
          expr("theta_sketch_estimate(theta_union(cm, pm))").as("__u"),
          expr("theta_sketch_estimate(theta_intersection(cm, pm))").as("__i"),
          expr("theta_sketch_estimate(theta_difference(cm, pm))").as("__d"))
      val flags = ev.groupBy($"user_id", $"day")
        .agg(max(when($"event_type" === "click", 1).otherwise(0)).as("c"),
          max(when($"event_type" === "purchase", 1).otherwise(0)).as("p"))
      val exact = flags.agg(
        sum(when($"c" === 1, 1L).otherwise(0L)).as("n_click_days"),
        sum(when($"p" === 1, 1L).otherwise(0L)).as("n_purchase_days"),
        count(lit(1)).as("n_union_exact"),
        sum(when($"c" === 1 && $"p" === 1, 1L).otherwise(0L)).as("n_inter_exact"),
        sum(when($"c" === 1 && $"p" === 0, 1L).otherwise(0L)).as("n_diff_exact"))
      // 1-row × 1-row combine of the two global aggregates — labeled in
      // PlanGuardSpec's whitelist next to the other bounded build sides
      exact.crossJoin(est)
        .select($"n_click_days", $"n_purchase_days", $"n_union_exact",
          $"n_inter_exact", $"n_diff_exact",
          (abs($"__u".cast("double") / $"n_union_exact".cast("double") - lit(1.0)) <= lit(0.05))
            .as("union_ok"),
          (abs($"__i".cast("double") - $"n_inter_exact".cast("double"))
            <= lit(0.05) * $"n_union_exact".cast("double")).as("inter_ok"),
          (abs($"__d".cast("double") - $"n_diff_exact".cast("double"))
            <= lit(0.05) * $"n_union_exact".cast("double")).as("diff_ok"))
    },
    Some("""
      WITH e AS (SELECT event_type, user_id, CAST(ts AS DATE) AS day
                 FROM events WHERE event_type IN ('click', 'purchase')),
      f AS (SELECT user_id, day,
                   max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
            FROM e GROUP BY 1, 2)
      SELECT CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_click_days,
             CAST(sum(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_days,
             CAST(count(*) AS BIGINT) AS n_union_exact,
             CAST(sum(CASE WHEN c = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_inter_exact,
             CAST(sum(CASE WHEN c = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_diff_exact,
             TRUE AS union_ok, TRUE AS inter_ok, TRUE AS diff_ok
      FROM f
    """.trim))

  /** Mergeable quantiles — per-month KLL sketches of `value` merged into
    * an all-time sketch per event_type, so p50/p90 over a year of data
    * is answerable from 12 small summaries. The check is the KLL
    * guarantee itself: the EXACT rank of each estimated quantile must
    * lie within ε of the target rank (k=200 → ε ≈ 1.65% normalized;
    * bound at 0.05). `exact_p50` also pins Spark's exact interpolated
    * percentile against DuckDB's quantile_cont, independent of the
    * sketch path.
    */
  val e15KllQuantiles = Q(
    "e15_kll_quantiles",
    (s, dir) => {
      import s.implicits._
      val ev = eventDays(s, dir)
      val est = ev.groupBy($"event_type", $"month")
        .agg(expr("kll_sketch_agg_double(value, 200)").as("sk"))
        .groupBy($"event_type")
        .agg(expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), array(0.5D, 0.9D))")
          .as("__q"))
        .select($"event_type", $"__q".getItem(0).as("__e50"), $"__q".getItem(1).as("__e90"))
      ev.join(broadcast(est), "event_type")
        .groupBy($"event_type")
        .agg(count($"value").as("n_values"),
          expr("percentile(value, 0.5D)").as("exact_p50"),
          (sum(when($"value" <= $"__e50", 1L).otherwise(0L)).cast("double")
            / count($"value").cast("double")).as("__r50"),
          (sum(when($"value" <= $"__e90", 1L).otherwise(0L)).cast("double")
            / count($"value").cast("double")).as("__r90"))
        .select($"event_type", $"n_values", $"exact_p50",
          ($"__r50" >= 0.45 && $"__r50" <= 0.55).as("ok_p50"),
          ($"__r90" >= 0.85 && $"__r90" <= 0.95).as("ok_p90"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, CAST(count(value) AS BIGINT) AS n_values,
             quantile_cont(value, 0.5) AS exact_p50,
             TRUE AS ok_p50, TRUE AS ok_p90
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """.trim))

  /** Mergeable top-k sketch (completes the DataSketches quartet: HLL
    * e13 / theta e14 / KLL e15 / frequent-items here): per-language
    * `approx_top_k_accumulate` partials combined into one corpus
    * sketch, estimated at k=9 — the two-level shard-then-merge shape
    * that answers "top tokens ever" with no raw re-scan. At this
    * vocabulary (31 ≪ the 100-slot capacity) the sketch is in its
    * EXACT regime, so the oracle pins full membership and counts
    * (`est_n = n`, top-9 set identical — k chosen so every SF has a
    * clean count gap at the boundary, making the set unambiguous);
    * at production vocabularies the same plan degrades gracefully to
    * the ±ε frequent-items guarantee, the t22 SpaceSaving story with
    * merge built in.
    */
  val e16TopkSketch = Q(
    "e16_topk_sketch",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{TextFunctions => TF}
      val toks = Tables.parallelized(Tables.load(s, dir, "documents"))
        .select($"lang", explode(TF.tokens(TF.normalize($"text"))).as("tok"))
      val est = toks.groupBy($"lang")
        .agg(expr("approx_top_k_accumulate(tok, 100)").as("sk"))
        .agg(expr("approx_top_k_combine(sk, 100)").as("sk"))
        .select(explode(expr("approx_top_k_estimate(sk, 9)")).as("e"))
        .select($"e.*")
      val exact = toks.groupBy($"tok").agg(count(lit(1)).as("n"))
      est.select($"item".as("tok"), $"count".as("est_n"))
        .join(exact, Seq("tok"))
        .select($"tok", $"n", $"est_n", ($"est_n" === $"n").as("exact_in_sketch"))
        .orderBy($"n".desc, $"tok")
    },
    Some("""
      WITH t AS (SELECT unnest(string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS tok
                 FROM documents),
      c AS (SELECT tok, count(*) AS n FROM t GROUP BY tok)
      SELECT tok, n, n AS est_n, TRUE AS exact_in_sketch
      FROM c
      ORDER BY n DESC, tok
      LIMIT 9
    """.trim))

  /** Hopping (sliding) 1-hour windows every 15 minutes: each event
    * contributes to length/slide = 4 overlapping windows. Spark's
    * `window(ts, length, slide)` plans an Expand (one output row per
    * covering window) BEFORE the aggregation shuffle — partial
    * aggregation compresses the 4x blow-up map-side, so the exchange
    * moves (window, type) groups, not 4x the events. The oracle
    * enumerates the same 4 epoch-aligned window starts per event with
    * integer micros arithmetic. Streaming face:
    * StreamingAnalytics.slidingCounts (same operator under a
    * watermark; StreamingSpec pins stream == batch).
    */
  val e17SlidingWindows = Q(
    "e17_sliding_windows",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .transform(Tables.withTsUtc(_))
        .groupBy(window($"ts_utc", "1 hour", "15 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(14,2)")).cast("double").as("sum_value"))
        .select($"window.start".as("ws"), $"event_type", $"n", $"sum_value")
        .orderBy($"ws", $"event_type")
    },
    Some("""
      WITH e AS (SELECT epoch_us(ts) AS tus, event_type, value FROM events),
      w AS (SELECT (tus // 900000000) * 900000000
                     - CAST(i AS BIGINT) * 900000000 AS ws_us,
                   event_type, value
            FROM e CROSS JOIN (SELECT unnest([0,1,2,3]) AS i))
      SELECT make_timestamp(ws_us) AS ws, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      FROM w
      GROUP BY 1, 2
      ORDER BY ws, event_type
    """.trim))

  /** Cohort retention: users grouped by first-active day (their
    * cohort), then for each (cohort, day-offset) the count of cohort
    * members active that many days later — the dashboard behind every
    * "day-N retention" metric. Shape: ONE user_id exchange serves both
    * the (user, day) dedup (partitioning on a subset of the grouping
    * keys satisfies its clustered distribution) and the per-user
    * min-day cohort window; (user, day) is unique after the dedup, so
    * the retention cell count is a plain count, not a distinct
    * aggregate. Offsets beyond 14 days are capped to keep the output a
    * bounded matrix at any corpus size.
    */
  val e18CohortRetention = Q(
    "e18_cohort_retention",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(s, dir, "events")
      val activity = ev
        .select($"user_id", to_date(Tables.tsUtc(ev)).as("day"))
        .repartition($"user_id")
        .dropDuplicates("user_id", "day")
      val withCohort = activity
        .withColumn("cohort", min($"day").over(Window.partitionBy($"user_id")))
        .withColumn("offset_days", datediff($"day", $"cohort"))
        .filter($"offset_days" <= 14)
      withCohort
        .groupBy($"cohort", $"offset_days")
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"cohort", $"offset_days")
    },
    Some("""
      WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      c AS (SELECT user_id, day,
                   min(day) OVER (PARTITION BY user_id) AS cohort
            FROM a)
      SELECT cohort, CAST(day - cohort AS INTEGER) AS offset_days,
             count(*) AS n_users
      FROM c
      WHERE day - cohort <= 14
      GROUP BY 1, 2
      ORDER BY cohort, offset_days
    """.trim))

  /** Rate-anomaly detection: z-score of each (hour, event_type)'s event
    * count against that type's own hourly series — the alerting query
    * behind every traffic-spike monitor. Mean/variance come from exact
    * integer/decimal sums (count, sum n, sum n²) so the double math is
    * a fixed, order-independent expression both engines evaluate
    * identically — a raw STDDEV over doubles would be partition-order
    * dependent and engine-divergent. Scale shape: one map-side-combined
    * aggregate to hourly rollup cardinality (hours × types, tiny vs raw
    * events), then a broadcast of per-type stats back onto it; the raw
    * corpus is scanned exactly once. n² accumulates in decimal(38,0)
    * (HUGEINT on the oracle side) so billion-event hours don't overflow
    * a long.
    */
  val e19RateAnomaly = Q(
    "e19_rate_anomaly",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val hourly = ev
        .groupBy(date_trunc("hour", Tables.tsUtc(ev)).as("h"), $"event_type")
        .agg(count(lit(1)).as("n"))
      val stats = hourly.groupBy($"event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum($"n").as("s"),
          sum($"n".cast("decimal(19,0)") * $"n").as("ss"))
        .filter($"n_hours" > 1)
      val mean = $"s".cast("double") / $"n_hours"
      val varr = ($"ss".cast("double") -
        $"s".cast("double") * $"s".cast("double") / $"n_hours") /
        ($"n_hours" - 1)
      hourly.join(broadcast(stats), "event_type")
        .withColumn("z",
          when(varr > 0.0, ($"n".cast("double") - mean) / sqrt(varr))
            .otherwise(lit(0.0)))
        .select($"h", $"event_type", $"n", $"z",
          (abs($"z") >= 2.0).as("anomaly"))
        .orderBy($"h", $"event_type")
    },
    Some("""
      WITH hourly AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type,
               count(*) AS n
        FROM events GROUP BY 1, 2),
      stats AS (
        SELECT event_type, count(*) AS n_hours, sum(n) AS s,
               sum(CAST(n AS HUGEINT) * n) AS ss
        FROM hourly GROUP BY 1
        HAVING count(*) > 1),
      scored AS (
        SELECT h, event_type, n,
               CASE WHEN (CAST(ss AS DOUBLE)
                            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_hours)
                          / (n_hours - 1) > 0.0
                    THEN (CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / n_hours)
                         / sqrt((CAST(ss AS DOUBLE)
                                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_hours)
                                / (n_hours - 1))
                    ELSE 0.0 END AS z
        FROM hourly JOIN stats USING (event_type))
      SELECT h, event_type, n, z, abs(z) >= 2.0 AS anomaly
      FROM scored
      ORDER BY h, event_type
    """.trim))

  /** EWMA smoothing of the hourly event rate per type: an 8-tap
    * exponentially-weighted moving average over the hourly counts with
    * α = 1/2 — the smoothed-rate curve dashboards draw next to e19's
    * spikes. Weights are exact powers of two (1, 1/2, …, 1/128), so
    * every term is an exact double product of a long and a binary
    * fraction and the fixed left-to-right summation order makes both
    * engines produce bit-identical results — a recursive EWMA or
    * power() weights would diverge by ULPs across libms. Partial
    * windows at each series head renormalize by the weights actually
    * present (num/den both skip null lags). Scale shape: the raw scan
    * collapses to the hourly rollup first; the lag window runs at
    * hours × types cardinality, partitioned by type — no raw-event
    * shuffle anywhere.
    */
  val e20EwmaRate = Q(
    "e20_ewma_rate",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(s, dir, "events")
      val hourly = ev
        .groupBy(date_trunc("hour", Tables.tsUtc(ev)).as("h"), $"event_type")
        .agg(count(lit(1)).as("n"))
      val byType = Window.partitionBy($"event_type").orderBy($"h")
      val weights = (0 to 7).map(i => math.pow(0.5, i)) // exact binary fractions
      val lags = (0 to 7).map {
        case 0 => $"n"
        case i => lag($"n", i).over(byType)
      }
      val num = weights.zip(lags).map { case (w, x) =>
        when(x.isNull, lit(0.0)).otherwise(lit(w) * x)
      }.reduce(_ + _)
      val den = weights.zip(lags).map { case (w, x) =>
        when(x.isNull, lit(0.0)).otherwise(lit(w))
      }.reduce(_ + _)
      hourly
        .withColumn("ewma", num / den)
        .select($"event_type", $"h", $"n", $"ewma")
        .orderBy($"event_type", $"h")
    },
    Some {
      val w = (0 to 7).map(i => math.pow(0.5, i))
      def lagSql(i: Int) =
        if (i == 0) "n"
        else s"lag(n, $i) OVER (PARTITION BY event_type ORDER BY h)"
      // CAST to DOUBLE everywhere: a bare 0.5 literal is DECIMAL in
      // DuckDB, and decimal arithmetic would diverge from Spark's
      // double math
      val num = (0 to 7).map(i =>
        s"CASE WHEN ${lagSql(i)} IS NULL THEN CAST(0 AS DOUBLE) " +
          s"ELSE CAST(${w(i)} AS DOUBLE) * CAST(${lagSql(i)} AS DOUBLE) END")
        .mkString(" + ")
      val den = (0 to 7).map(i =>
        s"CASE WHEN ${lagSql(i)} IS NULL THEN CAST(0 AS DOUBLE) " +
          s"ELSE CAST(${w(i)} AS DOUBLE) END")
        .mkString(" + ")
      s"""
      WITH hourly AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type,
               count(*) AS n
        FROM events GROUP BY 1, 2),
      sm AS (
        SELECT event_type, h, n, ($num) / ($den) AS ewma
        FROM hourly)
      SELECT event_type, h, n, ewma
      FROM sm
      ORDER BY event_type, h
      """.trim
    })

  /** Seasonality detection: lag-24 autocorrelation of each type's
    * hourly count series — the "does this metric have a daily cycle"
    * classifier feeding anomaly baselining (a seasonal series should
    * be z-scored against its phase, not its global mean). The ACF is
    * assembled entirely from exact integer moments (Σx, Σx², Σx·x₋₂₄
    * via one lag window + decimal sums), then one fixed double
    * expression both engines evaluate identically — the only honest
    * way to hash-match a correlation across engines (same trick as
    * q48's corr). Scale shape: raw events collapse to the hourly
    * rollup first; the lag window and moment aggregate run at
    * hours × types cardinality. n·x₋₂₄ products accumulate in
    * decimal/HUGEINT so billion-event hours can't overflow.
    */
  val e21Seasonality = Q(
    "e21_seasonality",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(s, dir, "events")
      val hourly = ev
        .groupBy(date_trunc("hour", Tables.tsUtc(ev)).as("h"), $"event_type")
        .agg(count(lit(1)).as("n"))
      val byType = Window.partitionBy($"event_type").orderBy($"h")
      val lagged = hourly.withColumn("xl", lag($"n", 24).over(byType))
      val stats = lagged.groupBy($"event_type")
        .agg(
          count(lit(1)).as("n_hours"),
          sum($"n").as("s_all"),
          sum($"n".cast("decimal(19,0)") * $"n").as("ss_all"),
          count($"xl").as("n_pairs"),
          sum(when($"xl".isNotNull, $"n")).as("s_tail"),
          sum(when($"xl".isNotNull, $"xl")).as("s_head"),
          sum(when($"xl".isNotNull, $"n".cast("decimal(19,0)") * $"xl"))
            .as("c"))
        .filter($"n_hours" > 24)
      val m = $"s_all".cast("double") / $"n_hours"
      val num = $"c".cast("double") - m * $"s_tail".cast("double") -
        m * $"s_head".cast("double") +
        $"n_pairs".cast("double") * m * m
      val den = $"ss_all".cast("double") -
        $"s_all".cast("double") * $"s_all".cast("double") / $"n_hours"
      stats
        .withColumn("r24", when(den > 0.0, num / den).otherwise(lit(0.0)))
        .select($"event_type", $"n_hours", $"r24",
          ($"r24" >= 0.25).as("seasonal"))
        .orderBy($"event_type")
    },
    Some("""
      WITH hourly AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type,
               count(*) AS n
        FROM events GROUP BY 1, 2),
      lagged AS (
        SELECT event_type, n,
               lag(n, 24) OVER (PARTITION BY event_type ORDER BY h) AS xl
        FROM hourly),
      st AS (
        SELECT event_type,
               count(*) AS n_hours,
               sum(n) AS s_all,
               sum(CAST(n AS HUGEINT) * n) AS ss_all,
               count(xl) AS n_pairs,
               sum(CASE WHEN xl IS NOT NULL THEN n END) AS s_tail,
               sum(CASE WHEN xl IS NOT NULL THEN xl END) AS s_head,
               sum(CASE WHEN xl IS NOT NULL THEN CAST(n AS HUGEINT) * xl END) AS c
        FROM lagged GROUP BY 1
        HAVING count(*) > 24),
      sc AS (
        SELECT event_type, n_hours,
               CASE WHEN (CAST(ss_all AS DOUBLE)
                            - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE) / n_hours) > 0.0
                    THEN (CAST(c AS DOUBLE)
                            - (CAST(s_all AS DOUBLE) / n_hours) * CAST(s_tail AS DOUBLE)
                            - (CAST(s_all AS DOUBLE) / n_hours) * CAST(s_head AS DOUBLE)
                            + CAST(n_pairs AS DOUBLE)
                              * (CAST(s_all AS DOUBLE) / n_hours)
                              * (CAST(s_all AS DOUBLE) / n_hours))
                         / (CAST(ss_all AS DOUBLE)
                              - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE) / n_hours)
                    ELSE 0.0 END AS r24
        FROM st)
      SELECT event_type, n_hours, r24, r24 >= 0.25 AS seasonal
      FROM sc
      ORDER BY event_type
    """.trim))

  /** Mergeable point-frequency estimates — Count-Min completes the
    * sketch family (HLL=distinct, Theta=set algebra, KLL=quantiles,
    * top-k=heavy ranks, CMS=per-key counts): one O(width×depth) sketch
    * per month in a stats table answers "how many events did user x
    * ever fire" with NO raw re-scan, under the one-sided guarantee
    * est ≥ exact and (w.p. confidence) est ≤ exact + eps×N. Two-level
    * like e13: built-in count_min_sketch per month → cms_merge_agg
    * union (cell-wise counter sums — exact w.r.t. a single global
    * sketch, so partition order can't change the bits) → probe the top
    * five exact-heaviest users through cms_estimate_long. The probe
    * side is 5 rows × one 1-row merged sketch: a labeled broadcast
    * cross join, nothing corpus-sized moves.
    */
  val e22CmsFreq = Q(
    "e22_cms_freq",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.Encoders
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val cmsMergeAgg = udaf(new graft.functions.CmsMerge, Encoders.BINARY)
      val ev = eventDays(s, dir)
      val monthly = ev.groupBy($"month")
        .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"),
          count(lit(1)).as("n_m"))
      val merged = monthly.agg(
        cmsMergeAgg($"sk").as("msk"),
        count(lit(1)).as("n_months"),
        sum($"n_m").as("n_total"))
      val top5 = ev.groupBy($"user_id")
        .agg(count(lit(1)).as("exact_n"))
        .orderBy($"exact_n".desc, $"user_id")
        .limit(5)
      top5.crossJoin(broadcast(merged)) // 5 rows x 1 row, labeled
        .withColumn("__est", ColumnBridge.column(
          graft.functions.expressions.CmsEstimateLong(
            ColumnBridge.expression($"msk"),
            ColumnBridge.expression($"user_id"))))
        .select($"user_id", $"exact_n", $"n_months", $"n_total",
          ($"__est" >= $"exact_n").as("never_under"),
          ($"__est" <= $"exact_n" + lit(0.001) * $"n_total").as("within_bound"))
        .orderBy($"user_id")
    },
    Some("""
      WITH t AS (SELECT user_id, count(*) AS exact_n
                 FROM events GROUP BY 1
                 ORDER BY exact_n DESC, user_id LIMIT 5),
      g AS (SELECT count(DISTINCT date_trunc('month', CAST(ts AS DATE))) AS n_months,
                   count(*) AS n_total
            FROM events)
      SELECT user_id, CAST(exact_n AS BIGINT) AS exact_n,
             CAST(n_months AS BIGINT) AS n_months,
             CAST(n_total AS BIGINT) AS n_total,
             TRUE AS never_under, TRUE AS within_bound
      FROM t CROSS JOIN g
      ORDER BY user_id
    """.trim))

  /** First-order Markov transition matrix over per-user event
    * sequences — the "what happens after a click" path analytic. ONE
    * exchange on user_id serves the lag window; the transition count
    * aggregate and its normalizing window both run at |event_type|²
    * rollup cardinality (≤ 25 rows here, ≤ a few thousand for any real
    * event taxonomy), so everything after the lag is driver-trivial no
    * matter the corpus size. Probabilities are one IEEE double divide
    * of two exact longs — identical trees both engines, hash-exact.
    */
  val e23MarkovTransitions = Q(
    "e23_markov_transitions",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      val seq = Tables.load(s, dir, "events")
        .transform(Tables.withTsMicros(_))
        .select($"user_id", $"event_id", $"tus", $"event_type")
        .withColumn("prev_type", lag($"event_type", 1).over(byUser))
        .filter($"prev_type".isNotNull)
      val counts = seq.groupBy($"prev_type", $"event_type")
        .agg(count(lit(1)).as("n"))
      val byPrev = Window.partitionBy($"prev_type")
      counts
        .withColumn("p",
          $"n".cast("double") / sum($"n").over(byPrev).cast("double"))
        .orderBy($"prev_type", $"event_type")
    },
    Some("""
      WITH o AS (SELECT user_id, event_id, event_type,
                        lag(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS prev_type
                 FROM events),
      c AS (SELECT prev_type, event_type, count(*) AS n
            FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      SELECT prev_type, event_type, CAST(n AS BIGINT) AS n,
             CAST(n AS DOUBLE)
               / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
      FROM c
      ORDER BY prev_type, event_type
    """.trim))

  /** Inter-arrival gap distribution per event type — the burstiness /
    * latency analytic behind rate limiting and capacity planning: lag
    * each type's event times, then exact interpolated percentiles of
    * the gaps. ONE exchange total: the groupBy key is a subset of the
    * window's partitionBy key, so the aggregate reuses the window's
    * partitioning. Gap values are exact integer micros, and Spark's
    * `percentile` interpolates identically to DuckDB's quantile_cont
    * (index p·(n−1), linear between neighbors — the e15 exact_p50
    * precedent), so the doubles hash-match. Tie-safe: the multiset of
    * consecutive differences of a sorted multiset doesn't depend on
    * the tie-break order.
    */
  val e24InterArrival = Q(
    "e24_inter_arrival",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byType = Window.partitionBy($"event_type").orderBy($"tus", $"event_id")
      Tables.load(s, dir, "events")
        .transform(Tables.withTsMicros(_))
        .select($"event_type", $"event_id", $"tus")
        .withColumn("prev", lag($"tus", 1).over(byType))
        .filter($"prev".isNotNull)
        .withColumn("gap_us", $"tus" - $"prev")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_gaps"),
          expr("percentile(gap_us, 0.5d)").as("p50_us"),
          expr("percentile(gap_us, 0.9d)").as("p90_us"),
          max($"gap_us").as("max_us"))
        .orderBy($"event_type")
    },
    Some("""
      WITH o AS (SELECT event_type, event_id, epoch_us(ts) AS tus,
                        lag(epoch_us(ts)) OVER (PARTITION BY event_type
                                                ORDER BY ts, event_id) AS prev
                 FROM events),
      g AS (SELECT event_type, tus - prev AS gap_us
            FROM o WHERE prev IS NOT NULL)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
             quantile_cont(gap_us, 0.5) AS p50_us,
             quantile_cont(gap_us, 0.9) AS p90_us,
             CAST(max(gap_us) AS BIGINT) AS max_us
      FROM g
      GROUP BY event_type
      ORDER BY event_type
    """.trim))

  /** Late-data profile — the measurement behind choosing a watermark:
    * each event's lateness is how far the stream's running-max event
    * time had already advanced past it on arrival. The fixture carries
    * no arrival column (event_id is event-time-ordered, which would
    * make every lateness 0 and the oracle vacuous), so arrival order
    * is simulated deterministically as the md5 of the event id — a
    * worst-case shuffled arrival both engines can reproduce. The real
    * content is HOW the global running max is computed: a naive global
    * window is a single partition (the classic scale-killer); here
    * it's the two-level prefix-scan — the first two hex chars of the
    * arrival key define 256 BLOCKS that are contiguous ranges of the
    * arrival order, so per-block maxima (a 256-row frame, effectively
    * free) running-maxed exclusively + a within-block window
    * partitioned BY block give exactly the single-window semantics at
    * full parallelism. Per type: late fraction beyond a 30-minute
    * candidate watermark, p99 and max lateness.
    */
  val e25LateProfile = Q(
    "e25_late_profile",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(s, dir, "events")
        .transform(Tables.withTsMicros(_))
        .select($"event_id", $"event_type", $"tus")
        .withColumn("arr", md5(concat(lit("arr_"), $"event_id")))
        .withColumn("blk", substring($"arr", 1, 2))
      // block-cardinality frame: running max of the PREVIOUS blocks
      val blocks = ev.groupBy($"blk").agg(max($"tus").as("blk_max"))
        .withColumn("prev_max",
          max($"blk_max").over(Window.orderBy($"blk")
            .rowsBetween(Window.unboundedPreceding, -1)))
        .select($"blk", $"prev_max")
      val inBlk = Window.partitionBy($"blk").orderBy($"arr", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val gapUs = 30L * 60 * 1000 * 1000
      ev.withColumn("in_max", max($"tus").over(inBlk))
        .join(broadcast(blocks), "blk")
        .withColumn("seen_max", greatest(
          coalesce($"in_max", lit(Long.MinValue)),
          coalesce($"prev_max", lit(Long.MinValue))))
        .withColumn("late_us",
          when($"seen_max" === Long.MinValue, 0L) // first arrival overall
            .otherwise(greatest($"seen_max" - $"tus", lit(0L))))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum(when($"late_us" > gapUs, 1L).otherwise(0L)).as("n_late"),
          expr("percentile(late_us, 0.99d)").as("p99_late_us"),
          max($"late_us").as("max_late_us"))
        .withColumn("late_frac",
          $"n_late".cast("double") / $"n".cast("double"))
        .orderBy($"event_type")
    },
    Some("""
      WITH o AS (SELECT event_type, epoch_us(ts) AS tus,
                        max(epoch_us(ts)) OVER (
                          ORDER BY md5('arr_' || event_id), event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                          AS seen_max
                 FROM events),
      l AS (SELECT event_type,
                   CASE WHEN seen_max IS NULL THEN 0
                        ELSE greatest(seen_max - tus, 0) END AS late_us
            FROM o)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN late_us > 1800000000 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_late,
             quantile_cont(late_us, 0.99) AS p99_late_us,
             CAST(max(late_us) AS BIGINT) AS max_late_us,
             CAST(sum(CASE WHEN late_us > 1800000000 THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE) AS late_frac
      FROM l
      GROUP BY event_type
      ORDER BY event_type
    """.trim))

  /** DAU/MAU stickiness — trailing-window distinct counts, the query
    * that makes mergeable sketches earn their keep: an exact 28-day
    * sliding distinct must re-touch every (day, user) pair once per
    * window it falls in, but per-day HLL sketches union in O(28 × 4 KB)
    * per anchor day with NO raw re-scan — the e13 pattern extended to
    * sliding windows. The window join is equi-ified (each day's sketch
    * explodes to the 28 anchor days it serves) so it hash-joins at
    * rollup cardinality instead of planning a theta-join; the exact
    * side — needed for the oracle and the bound check — pays the full
    * (window × users) recount, which is exactly the cost the sketch
    * path avoids. One corpus-sized shuffle total (the (day, user)
    * dedup); everything after runs at days × 28.
    */
  val e26Stickiness = Q(
    "e26_stickiness",
    (s, dir) => {
      import s.implicits._
      val ev = eventDays(s, dir)
      // du feeds FOUR consumers (daily twice via dau+sketch, the
      // anchor spine, and the exact MAU rollup); without the persist
      // each consumer re-runs the events scan + day×user distinct —
      // the static plan showed FIVE parquet scans of events for one
      // query (guide §2.4: remove repeated passes outright). du is
      // days×users, orders of magnitude smaller than events.
      val du = ev.select($"day", $"user_id").distinct().persist()
      // daily is itself read twice (dau spine + sketch explode): tiny
      // (one row per day), so persist it too rather than re-aggregate
      // du both times
      val daily = du.groupBy($"day")
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"),
          countDistinct($"user_id").as("dau"))
        .persist()
      val anchors = daily.select($"day").distinct()
      // each day's sketch/users serve anchors day .. day+27 (equi-join
      // on the exploded anchor: rollup × 28 rows, never a theta join)
      val skAnch = daily
        .withColumn("anchor",
          explode(expr("transform(sequence(0, 27), i -> date_add(day, i))")))
        .join(anchors.withColumnRenamed("day", "anchor"), "anchor")
        .groupBy($"anchor")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("__mau_est"))
      val exactAnch = du
        .withColumn("anchor",
          explode(expr("transform(sequence(0, 27), i -> date_add(day, i))")))
        .join(anchors.withColumnRenamed("day", "anchor"), "anchor")
        .groupBy($"anchor")
        .agg(countDistinct($"user_id").as("mau"))
      daily.select($"day", $"dau")
        .join(exactAnch.withColumnRenamed("anchor", "day"), "day")
        .join(skAnch.withColumnRenamed("anchor", "day"), "day")
        .select($"day", $"dau", $"mau",
          ($"dau".cast("double") / $"mau".cast("double")).as("stickiness"),
          (abs($"__mau_est".cast("double") / $"mau".cast("double") - lit(1.0))
            <= lit(0.05)).as("within_bound"))
        .orderBy($"day")
    },
    Some("""
      WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                  FROM events),
      daily AS (SELECT day, count(DISTINCT user_id) AS dau
                FROM du GROUP BY day),
      m AS (SELECT d.day, count(DISTINCT du.user_id) AS mau
            FROM daily d JOIN du
              ON du.day <= d.day AND du.day >= d.day - 27
            GROUP BY d.day)
      SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(m.mau AS BIGINT) AS mau,
             CAST(d.dau AS DOUBLE) / CAST(m.mau AS DOUBLE) AS stickiness,
             TRUE AS within_bound
      FROM daily d JOIN m ON d.day = m.day
      ORDER BY d.day
    """.trim))

  /** Session path mining: the most common within-session event-type
    * trigrams (view>click>purchase, …) — the navigation-pattern rollup
    * a product-analytics engine serves. Builds on e02's sessionization
    * (30-min inactivity gap) but keeps EVERY window on the same
    * partitionBy(user_id) spec: the session boundary (lag), the running
    * session index (sum), and the two lookaheads (lead) all share ONE
    * exchange+sort; a trigram is emitted only when all three events
    * carry the same session index, which is exactly "lead stays within
    * the session" without re-partitioning by (user, session). The final
    * rollup shuffles trigram keys — |event_types|³ rows at most.
    */
  val e27SessionPaths = Q(
    "e27_session_paths",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      val gapUs = 30L * 60 * 1000 * 1000
      Tables.load(s, dir, "events")
        .transform(Tables.withTsMicros(_))
        .withColumn("prev_ts", lag($"tus", 1).over(byUser))
        .withColumn("new_session",
          when($"prev_ts".isNull || $"tus" - $"prev_ts" > gapUs, 1).otherwise(0))
        .withColumn("session_idx",
          sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("e2", lead($"event_type", 1).over(byUser))
        .withColumn("s2", lead($"session_idx", 1).over(byUser))
        .withColumn("e3", lead($"event_type", 2).over(byUser))
        .withColumn("s3", lead($"session_idx", 2).over(byUser))
        .filter($"s2" === $"session_idx" && $"s3" === $"session_idx")
        .groupBy(concat_ws(">", $"event_type", $"e2", $"e3").as("path"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), $"path")
    },
    Some("""
      WITH g AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts
        FROM events),
      f AS (SELECT user_id, event_id, event_type, tus,
              CASE WHEN prev_ts IS NULL OR tus - prev_ts > 1800000000 THEN 1 ELSE 0 END AS new_session
            FROM g),
      sess AS (SELECT user_id, event_id, event_type, tus,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
               FROM f),
      tri AS (SELECT event_type,
                lead(event_type, 1) OVER w AS e2,
                lead(session_idx, 1) OVER w AS s2,
                lead(event_type, 2) OVER w AS e3,
                lead(session_idx, 2) OVER w AS s3,
                session_idx
              FROM sess
              WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
      SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
      FROM tri
      WHERE s2 = session_idx AND s3 = session_idx
      GROUP BY 1
      ORDER BY n DESC, path
    """.trim))

  /** Weekly churn flows — the audience-movement report on top of
    * presence sets: per calendar week, how many active users are NEW
    * (absent the prior week), RETAINED (present both), or CHURNED
    * (present the prior week, gone now). Shape: the distinct
    * (week, user) frame emits each membership twice — once at its own
    * week, once advanced one week as a "previous" marker — so the
    * classification is ONE groupBy(week, user) over the doubled frame
    * (the e26 equi-ification idea): no self-join of the presence set,
    * no window over users. Weeks beyond the observed range are cut by
    * an inner join to the real week list (rollup-sized).
    */
  val e28ChurnFlows = Q(
    "e28_churn_flows",
    (s, dir) => {
      import s.implicits._
      val wu = Tables.load(s, dir, "events")
        .transform(Tables.withTsUtc(_))
        .select(to_date(date_trunc("week", $"ts_utc")).as("week"), $"user_id")
        .distinct()
      val weeks = wu.select($"week").distinct()
      val doubled = wu.select($"week", $"user_id", lit(1).as("cur"), lit(0).as("prev"))
        .unionAll(wu.select(date_add($"week", 7).as("week"), $"user_id",
          lit(0).as("cur"), lit(1).as("prev")))
      doubled
        .join(weeks, "week")
        .groupBy($"week", $"user_id")
        .agg(max($"cur").as("c"), max($"prev").as("p"))
        .groupBy($"week")
        .agg(
          count(when($"c" === 1, 1)).as("n_active"),
          count(when($"c" === 1 && $"p" === 0, 1)).as("n_new"),
          count(when($"c" === 1 && $"p" === 1, 1)).as("n_retained"),
          count(when($"c" === 0 && $"p" === 1, 1)).as("n_churned"))
        .orderBy($"week")
    },
    Some("""
      WITH wu AS (
        SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS week, user_id
        FROM events),
      weeks AS (SELECT DISTINCT week FROM wu),
      doubled AS (
        SELECT week, user_id, 1 AS cur, 0 AS prev FROM wu
        UNION ALL
        SELECT week + 7, user_id, 0, 1 FROM wu),
      cl AS (
        SELECT d.week, d.user_id, max(cur) AS c, max(prev) AS p
        FROM doubled d JOIN weeks USING (week)
        GROUP BY d.week, d.user_id)
      SELECT week,
             count(*) FILTER (c = 1) AS n_active,
             count(*) FILTER (c = 1 AND p = 0) AS n_new,
             count(*) FILTER (c = 1 AND p = 1) AS n_retained,
             count(*) FILTER (c = 0 AND p = 1) AS n_churned
      FROM cl
      GROUP BY week
      ORDER BY week
    """.trim))

  /** Time-BOUNDED funnel — e12 with conversion windows, which is what
    * product funnels actually are: first view, then the earliest click
    * within 24 h OF THAT VIEW, then the earliest purchase within 24 h
    * of that click. Three chained conditional window minimums, each
    * conditioned on the previous stage's timestamp, all on the SAME
    * partitionBy(user_id) spec, and the final per-user rollup groups on
    * the window key — ONE exchange end to end (e12's shape plus the
    * bound predicates). NULL semantics carry the funnel: a user with
    * no view has v NULL, every later-stage predicate comparing against
    * NULL is false, so later stages stay NULL without special-casing.
    */
  val e29BoundedFunnel = Q(
    "e29_bounded_funnel",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id")
      val dayUs = 24L * 3600 * 1000 * 1000
      Tables.load(s, dir, "events")
        .transform(Tables.withTsMicros(_))
        .withColumn("v", min(when($"event_type" === "view", $"tus")).over(w))
        .withColumn("c", min(when($"event_type" === "click" &&
          $"tus" >= $"v" && $"tus" - $"v" <= dayUs, $"tus")).over(w))
        .withColumn("p", min(when($"event_type" === "purchase" &&
          $"tus" >= $"c" && $"tus" - $"c" <= dayUs, $"tus")).over(w))
        .groupBy($"user_id")
        .agg(min($"v").as("view_us"), min($"c").as("click_us"),
          min($"p").as("purchase_us"))
        .withColumn("stage",
          when($"purchase_us".isNotNull, 3L)
            .when($"click_us".isNotNull, 2L)
            .when($"view_us".isNotNull, 1L).otherwise(0L))
        .orderBy($"user_id")
    },
    Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
      v1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN tus END)
                         OVER (PARTITION BY user_id) AS v
             FROM e),
      v2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND tus >= v
                                 AND tus - v <= 86400000000 THEN tus END)
                         OVER (PARTITION BY user_id) AS c
             FROM v1),
      v3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND tus >= c
                                 AND tus - c <= 86400000000 THEN tus END)
                         OVER (PARTITION BY user_id) AS p
             FROM v2)
      SELECT user_id, min(v) AS view_us, min(c) AS click_us,
             min(p) AS purchase_us,
             CAST(CASE WHEN min(p) IS NOT NULL THEN 3
                       WHEN min(c) IS NOT NULL THEN 2
                       WHEN min(v) IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage
      FROM v3
      GROUP BY user_id
      ORDER BY user_id
    """.trim))

  /** Last-touch attribution: every purchase attributes to the most
    * recent view in the trailing 7 days — the marketing-attribution
    * primitive. A conditional max over an event-time RANGE frame
    * (integer microseconds, so the frame bound is exact on both
    * engines): ONE partitionBy(user_id) exchange, no self-join of
    * purchases against views — the naive formulation is a range join
    * that Catalyst would plan as a per-pair nested loop.
    */
  val e30Attribution = Q(
    "e30_attribution",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val weekUs = 7L * 24 * 3600 * 1000 * 1000
      val w = Window.partitionBy($"user_id").orderBy($"tus")
        .rangeBetween(-weekUs, 0)
      Tables.load(s, dir, "events")
        .transform(Tables.withTsMicros(_))
        .withColumn("att_view_us",
          max(when($"event_type" === "view", $"tus")).over(w))
        .filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"tus".as("purchase_us"),
          $"att_view_us", $"att_view_us".isNotNull.as("attributed"))
        .orderBy($"user_id", $"purchase_us", $"event_id")
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
                 FROM events),
      a AS (SELECT *, max(CASE WHEN event_type = 'view' THEN tus END)
                        OVER (PARTITION BY user_id ORDER BY tus
                              RANGE BETWEEN 604800000000 PRECEDING
                                        AND CURRENT ROW) AS att_view_us
            FROM e)
      SELECT user_id, event_id, tus AS purchase_us, att_view_us,
             att_view_us IS NOT NULL AS attributed
      FROM a
      WHERE event_type = 'purchase'
      ORDER BY user_id, purchase_us, event_id
    """.trim))

  /** Session co-occurrence lift — market-basket association over
    * sessions: for each event-type pair, lift =
    * P(a,b together in a session) / (P(a)·P(b)), the signal that
    * separates "views and clicks travel together" from base-rate
    * coincidence. Shape: e02's sessionization (ONE user_id exchange —
    * the per-session distinct-type rollup groups on (user, session),
    * whose user_id prefix the window's partitioning already
    * satisfies), then the t46 in-row pair expansion over each
    * session's sorted distinct types (≤ |types|², never a session
    * self-join), then rollups at types/types² cardinality. The
    * session total is one bounded scalar collect. All probabilities
    * are exact longs in identical IEEE trees.
    */
  val e31SessionLift = Q(
    "e31_session_lift",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      val gapUs = 30L * 60 * 1000 * 1000
      val sessions = Tables.load(s, dir, "events")
        .transform(Tables.withTsMicros(_))
        .withColumn("prev_ts", lag($"tus", 1).over(byUser))
        .withColumn("new_session",
          when($"prev_ts".isNull || $"tus" - $"prev_ts" > gapUs, 1).otherwise(0))
        .withColumn("session_idx",
          sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"session_idx")
        .agg(sort_array(collect_set($"event_type")).as("types"))
        .persist() // feeds the scalar total + both rollups
      val total = sessions.count()
      val typeCounts = sessions.select(explode($"types").as("t"))
        .groupBy($"t").agg(count(lit(1)).as("nt"))
      val pairs = sessions.select(explode(expr(
          "flatten(transform(types, (x, i) -> " +
            "transform(slice(types, i + 2, size(types)), y -> struct(x AS a, y AS b))))"))
          .as("p"))
        .select($"p.a".as("a"), $"p.b".as("b"))
        .groupBy($"a", $"b").agg(count(lit(1)).as("nab"))
      pairs
        .join(broadcast(typeCounts.select($"t".as("a"), $"nt".as("na"))), "a")
        .join(broadcast(typeCounts.select($"t".as("b"), $"nt".as("nb"))), "b")
        .select($"a", $"b", $"nab", $"na", $"nb",
          (($"nab".cast("double") * lit(total.toDouble)) /
            ($"na".cast("double") * $"nb".cast("double"))).as("lift"))
        .orderBy($"a", $"b")
    },
    Some("""
      WITH g AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts
        FROM events),
      f AS (SELECT user_id, event_id, event_type, tus,
              CASE WHEN prev_ts IS NULL OR tus - prev_ts > 1800000000 THEN 1 ELSE 0 END AS new_session
            FROM g),
      sess AS (SELECT user_id, event_type, tus,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
               FROM f),
      st AS (SELECT DISTINCT user_id, session_idx, event_type FROM sess),
      tot AS (SELECT count(*) AS s FROM (SELECT DISTINCT user_id, session_idx FROM st)),
      tc AS (SELECT event_type AS t, count(*) AS nt FROM st GROUP BY 1),
      pc AS (SELECT x.event_type AS a, y.event_type AS b, count(*) AS nab
             FROM st x JOIN st y
               ON x.user_id = y.user_id AND x.session_idx = y.session_idx
                  AND x.event_type < y.event_type
             GROUP BY 1, 2)
      SELECT pc.a, pc.b, pc.nab, ta.nt AS na, tb.nt AS nb,
             (CAST(pc.nab AS DOUBLE) * CAST((SELECT s FROM tot) AS DOUBLE))
               / (CAST(ta.nt AS DOUBLE) * CAST(tb.nt AS DOUBLE)) AS lift
      FROM pc JOIN tc ta ON pc.a = ta.t
              JOIN tc tb ON pc.b = tb.t
      ORDER BY pc.a, pc.b
    """.trim))

  /** SCD Type-2 history build: collapse each user's event-type
    * changelog into versioned validity intervals — (state, valid_from,
    * valid_to, is_current), the slowly-changing-dimension shape every
    * warehouse derives from a CDC/event stream before joining facts
    * "as of" a point in time (e04's as-of join is the consumer of
    * exactly this table). Run detection is lag() + a change-flag
    * prefix sum; versions keep only change rows, so output is
    * CHANGE-cardinality, not event-cardinality. Open intervals close
    * with the 9999-12-31 sentinel (the SCD2 convention — and it keeps
    * the column non-null for engines whose comparators treat NULL
    * specially).
    *
    * Scale shape: ONE data exchange on user_id serves everything —
    * the lag/rn/n_total windows, and (partitioning survives the chg=1
    * filter) the ver/lead windows after it; no groupBy re-shuffle, no
    * join (plan-verified: the only other exchange is the
    * determinism-only output sort). The user_id % 10 slice runs as a
    * narrow filter before that exchange (modulo is not a pushable
    * predicate).
    */
  val e32Scd2History = Q(
    "e32_scd2_history",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      val allRows = Window.partitionBy($"user_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val openEnd = 253402214400000000L // 9999-12-31 00:00:00 in micros
      Tables.load(s, dir, "events")
        .transform(Tables.withTsMicros(_))
        .filter($"user_id" % 10 === 0)
        .withColumn("prev_state", lag($"event_type", 1).over(byUser))
        .withColumn("chg",
          when($"prev_state".isNull || $"prev_state" =!= $"event_type", 1)
            .otherwise(0))
        .withColumn("rn", row_number().over(byUser))
        .withColumn("n_total", count(lit(1)).over(allRows))
        .filter($"chg" === 1)
        .withColumn("ver", row_number().over(byUser).cast("long"))
        .withColumn("valid_to",
          coalesce(lead($"tus", 1).over(byUser), lit(openEnd)))
        .withColumn("is_current", lead($"tus", 1).over(byUser).isNull)
        .withColumn("n_events",
          coalesce(lead($"rn", 1).over(byUser) - $"rn",
            $"n_total" - $"rn" + 1).cast("long"))
        .select($"user_id", $"ver", $"event_type".as("state"),
          $"tus".as("valid_from"), $"valid_to", $"n_events", $"is_current")
        .orderBy($"user_id", $"ver")
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
                 FROM events WHERE user_id % 10 = 0),
      l AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev_state
            FROM e),
      f AS (SELECT *, CASE WHEN prev_state IS NULL OR prev_state <> event_type THEN 1 ELSE 0 END AS chg
            FROM l),
      v AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver
            FROM f),
      g AS (SELECT user_id, ver, min(event_type) AS state, min(tus) AS valid_from,
                   count(*) AS n_events
            FROM v GROUP BY 1, 2)
      SELECT user_id, CAST(ver AS BIGINT) AS ver, state, valid_from,
             coalesce(lead(valid_from) OVER (PARTITION BY user_id ORDER BY ver),
                      253402214400000000) AS valid_to,
             CAST(n_events AS BIGINT) AS n_events,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY ver) IS NULL AS is_current
      FROM g
      ORDER BY user_id, ver
    """.trim))

  /** Point-in-time SCD2 lookup — the consumer of e32's history table:
    * each fact (purchase) resolves the dimension version valid at its
    * own position in the user's timeline. Dimension = the user's
    * browsing state (latest NON-purchase event type — it changes only
    * when the type changes); fact = every purchase; the lookup is
    * strictly-before by (tus, event_id) position.
    *
    * The point is the PLAN: the textbook formulation is an interval
    * join (fact.ts BETWEEN dim.valid_from AND dim.valid_to — e08's
    * range join) or an as-of join (e04's custom operator). When fact
    * and dimension share the partition key, BOTH collapse to a single
    * window pass over the unioned timeline — here even the union
    * disappears because dim changes derive from the same stream:
    * `last(state) IGNORE NULLS OVER (rows unbounded preceding..1
    * preceding)` carries the current version to every fact, and a
    * running sum of change flags numbers it. ONE exchange on user_id,
    * zero joins, at any scale — the 100 TB preferred shape for
    * co-partitioned temporal lookups.
    */
  val e33Scd2Lookup = Q(
    "e33_scd2_lookup",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      val strictlyBefore =
        byUser.rowsBetween(Window.unboundedPreceding, -1)
      val upToHere =
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .transform(Tables.withTsMicros(_))
        .filter($"user_id" % 10 === 0)
        .withColumn("prev_np",
          last(when($"event_type" =!= "purchase", $"event_type"),
            ignoreNulls = true).over(strictlyBefore))
        .withColumn("chg",
          when($"event_type" =!= "purchase" &&
            ($"prev_np".isNull || $"prev_np" =!= $"event_type"), 1)
            .otherwise(0))
        .withColumn("ver_at", sum($"chg").over(upToHere).cast("long"))
        .filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"tus",
          coalesce($"prev_np", lit("none")).as("state_at"), $"ver_at")
        .orderBy($"user_id", $"tus", $"event_id")
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
                 FROM events WHERE user_id % 10 = 0),
      w AS (SELECT *,
              last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY tus, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_np
            FROM e),
      c AS (SELECT *,
              CASE WHEN event_type <> 'purchase'
                     AND (prev_np IS NULL OR prev_np <> event_type)
                   THEN 1 ELSE 0 END AS chg
            FROM w),
      v AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver_at
            FROM c)
      SELECT user_id, event_id, tus, coalesce(prev_np, 'none') AS state_at,
             CAST(ver_at AS BIGINT) AS ver_at
      FROM v WHERE event_type = 'purchase'
      ORDER BY user_id, tus, event_id
    """.trim))

  /** Time-weighted average (TWAP) per event type — the IoT/finance
    * aggregation where a reading holds until the next one arrives, so
    * the mean must weight each value by its holding interval, not
    * count it once: Σ value·Δt / Σ Δt over per-user gaps (a user's
    * last event has no interval and is excluded).
    *
    * Exactness: values go through the board's decimal(14,2) cents
    * convention, weights are exact integer micros from lead(), and
    * each value·Δt product is formed in DECIMAL (cents widened to
    * decimal(19,0) BEFORE the multiply — a long×long product at
    * multi-day gaps can exceed Long.Max, where non-ANSI Spark wraps
    * silently while DuckDB raises) then summed in decimal(38,0); the
    * oracle mirrors with HUGEINT. The final TWAP is ONE double
    * division over two exactly-summed integers (identical IEEE tree
    * both engines), immune to partition order at any cluster width.
    *
    * Scale: one user_id window exchange for lead(), then a rollup at
    * event-type cardinality; nothing else touches the fact table. The
    * gaps→TWAP aggregation is StreamingAnalytics.twapFromGaps — the
    * SAME code the streaming twin's output feeds, so stream≡batch
    * equivalence (TwapSpec) is structural, not re-derived.
    */
  val e34Twap = Q(
    "e34_twap",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      val gaps = Tables.load(s, dir, "events")
        .transform(Tables.withTsMicros(_))
        .withColumn("gap_us", lead($"tus", 1).over(byUser) - $"tus")
        .filter($"gap_us".isNotNull)
        .withColumn("cents",
          ($"value".cast("decimal(14,2)") * 100).cast("long"))
        .select($"event_type", $"cents", $"gap_us")
      graft.streaming.StreamingAnalytics.twapFromGaps(gaps)
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
                        CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
                 FROM events),
      g AS (SELECT event_type, cents,
              lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) - tus AS gap_us
            FROM e)
      SELECT event_type, count(*) AS n_gaps,
             CAST(sum(CAST(cents AS HUGEINT) * gap_us) AS DOUBLE)
               / CAST(sum(CAST(gap_us AS DECIMAL(30,0))) AS DOUBLE) / 100.0 AS twap
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY event_type
      ORDER BY event_type
    """.trim))

  /** The Misra–Gries stateful path driven through its batch bridge as
    * an oracle row (r11 verdict item 3 — the face was spec-only and
    * invisible to the driver's per-round board): the fixture's tokens
    * become a 3-file stream, transformWithState (RocksDB MapState)
    * folds them through MisraGriesProcessor across three micro-batches
    * with cross-batch state handoff, and the FINAL summary — taken at
    * m far above the vocabulary, the regime where no decrement ever
    * fires and MG is provably the exact count table, order-independent
    * — is filtered through t22's 0.1% integer threshold. The oracle is
    * t22's plain-SQL heavy-hitter query verbatim: a regression
    * anywhere in the stateful machinery (sharding, MapState rewrite,
    * summary re-emission, processed accounting) breaks hash equality
    * with a relation DuckDB derives with none of it.
    */
  val e35MgHeavyHitters = Q(
    "e35_mg_heavy_hitters",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{TextFunctions => TF}
      val shards = 4
      val srcDir = cachedSrc("mg_toks", dir) { d =>
        Tables.load(s, dir, "documents")
          .select(explode(TF.tokens($"text")).as("token"))
          .filter($"token" =!= "")
          .repartition(3)
          .write.parquet(d)
      }
      val key = "spark.sql.streaming.stateStore.providerClass"
      val old = s.conf.getOption(key)
      s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try {
        val stream = s.readStream.schema("token string")
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
        val name = "e35_mg_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        val q = graft.streaming.StatefulV2
          .misraGriesTokens(stream, m = 1 << 20, shards)
          .writeStream.outputMode("append").format("memory").queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        import org.apache.spark.sql.expressions.Window
        // final summary: each batch re-emits the full live table, so
        // keep the rows stamped with each shard's max n_processed
        val fin = s.table(name)
          .withColumn("__maxp",
            max($"n_processed").over(Window.partitionBy($"shard")))
          .filter($"n_processed" === $"__maxp")
          // bounded: ≤ vocabulary rows — past here nothing is streaming
          .localCheckpoint(true)
        // the eager checkpoint detached us from the sink: drop the
        // memory table so repeated runs don't accumulate vocab-sized
        // sinks in the session
        s.catalog.dropTempView(name)
        // total corpus tokens = Σ over shards of that shard's processed
        // count (bounded control read — `shards` rows)
        val tot = fin.select($"shard", $"n_processed").distinct()
          .agg(sum($"n_processed")).head().getLong(0)
        fin.filter($"est" * lit(1000L) > lit(tot))
          .select($"token", $"est".as("n"))
          .orderBy($"token")
      } finally old match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    },
    graft.queries.LlmOps.t22HeavyHitters.oracle)

  /** The IncrementalGroups stateful path driven through its batch
    * bridge as an oracle row (r11 verdict item 3's second face): t23's
    * near-dup pairs become a 3-file stream, foreachBatch folds each
    * micro-batch into the versioned label table (exactly-once commit
    * markers, cross-batch cluster merges), and the stream-final labels
    * — joined back to the corpus with t23's singleton rule — must
    * equal the one-shot global connected components. The oracle is
    * t23's recursive-closure SQL verbatim, so a regression in
    * applyPairs' merge logic or the commit protocol fails the driver's
    * hash compare against a relation derived with neither.
    */
  val e36IncrementalGroups = Q(
    "e36_incremental_groups",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      // 2 files -> 2 micro-batches: cross-batch cluster merges are
      // exercised (finer splits are IncrementalGroupsSpec's job) while
      // the row pays the incremental fold twice, not N times. The pair
      // frame itself is t23's generation, built once per session
      // (cachedSrc) — this row prices the INCREMENTAL fold, not a pair
      // derivation t05/t23 already price on the same board.
      val srcDir = cachedSrc("ig_pairs", dir) { d =>
        graft.functions.Dedup
          .nearDuplicatePairs(docs, "doc_id", "text", threshold = 0.8)
          .select($"id_a", $"id_b")
          .repartition(2).write.parquet(d)
        s.catalog.clearCache() // nearDuplicatePairs' shingle persist
      }
      val root = java.nio.file.Files.createTempDirectory("ig_e36").toString
      val stream = s.readStream.schema("id_a long, id_b long")
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = graft.streaming.IncrementalGroups
        .start(stream, s"$root/state", s"$root/ckpt")
      q.processAllAvailable()
      q.stop()
      val labels = graft.streaming.IncrementalGroups
        .latestLabels(s, s"$root/state")
      docs.select($"doc_id").join(labels, Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"rep", $"doc_id").as("rep"))
        .withColumn("keep", $"doc_id" === $"rep")
        .orderBy($"doc_id")
    },
    graft.queries.LlmOps.t23DedupGroups.oracle)

  /** Publish one wave to a graftbus as exactly ONE segment per bus
    * partition through the two-phase DSv2 sink (a staged file = a
    * segment = a drained micro-batch under maxSegmentsPerTrigger=1) —
    * the publish discipline shared by every bus-fed index row
    * (e37/e38/e39; one copy, r16 review finding). Without the
    * repartition every Spark task stages its own segment and the
    * drain degrades to ~tasks micro-batches, each paying an index
    * append — measured 171 s at the 10× probe vs ~2 batches' cost.
    * The two-phase sink (executors stage, the driver renames into
    * live segments) is what a retried/speculative task needs to never
    * publish a duplicate segment the way a raw executor-side
    * BusLog.publish could.
    */
  private def busPublishWave(rows: org.apache.spark.sql.DataFrame,
      partKey: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column,
      root: String, busParts: Int): Unit =
    rows.select(pmod(hash(partKey), lit(busParts)).as("partition"),
        lit(0L).as("seq"), lit(0).as("idx"),
        lit(new java.sql.Timestamp(0L)).as("ts"), value.as("value"))
      .repartition(busParts, col("partition"))
      .write.format("graftbus").option("path", root)
      .mode("append").save()

  /** Post-drain retention on the production path (r13 verdict item 6):
    * the drained log is dead disk weight at 100 TB — vacuum to the
    * consumed watermark (an AvailableNow drain terminated ⇒ every
    * published seq is committed) and ASSERT the log is bounded at zero
    * live segments. Vacuumed seqs are hwm-pinned so they are never
    * reallocated; a replayed range fails by omission, never
    * misattribution.
    */
  private def busVacuumAssertEmpty(root: String): Unit = {
    import graft.sources.bus.BusLog
    BusLog.vacuum(root, BusLog.latestSeqs(root))
    val leftover = BusLog.segmentCounts(root).values.sum
    require(leftover == 0L,
      s"bus log not bounded after post-drain vacuum: $leftover segments remain")
  }

  /** The production crawl-ingest shape end-to-end on the board (r12
    * verdict item 6): graftbus → foreachBatch → persisted signature
    * index → bucket-pruned serve. The BASE corpus (even doc_ids)
    * publishes to a 2-partition bus FROM THE EXECUTORS in two segment
    * waves (doc_id%4==0 then %4==2 — t71's exact split), the DSv2
    * micro-batch stream drains it one segment per partition per
    * trigger, and foreachBatch folds each micro-batch into the index:
    * build on the first, O(batch) idempotent fragment appends on the
    * rest (batchId commitId token — a redelivered batch no-ops). The
    * stream-final index then serves the odd-doc_id batch and must be
    * hash-identical to t49's SQL — a relation DuckDB derives with no
    * bus, no stream, and no index, so offsets, segment decode, the
    * append protocol's generation flips, and the bucket-pruned serve
    * all sit behind one driver-checked hash. (SignatureIndexStreamSpec
    * pins the file-stream face and the IncrementalDedup state
    * equivalence; this row makes the BUS-fed face driver-visible.)
    */
  val e37BusSignatureIndex = Q(
    "e37_bus_signature_index",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      // 8 partitions: the drain is still 2 micro-batches (one segment
      // per partition per wave — a trigger takes one segment from
      // EVERY partition), but staging parallelism is ~busParts tasks
      // instead of the 1–2 a 2-partition bus leaves after hash
      // collisions (measured 253 s vs 81 s at the 100× probe with 2)
      val busParts = 8
      val root = java.nio.file.Files.createTempDirectory("bus_e37").toString
      graft.sources.bus.BusLog.create(root, busParts)
      // two publish waves (busPublishWave: one segment per bus
      // partition per wave): wave 0 becomes micro-batch 0 (the build),
      // wave 1 becomes batch 1 (the append)
      for (g <- Seq(0, 2))
        busPublishWave(docs.filter($"doc_id" % 4 === g), $"doc_id",
          concat_ws("\u0001", $"doc_id", $"text"), root, busParts)
      val idx = s"$root/idx"
      var built = false
      val parts = split($"value", "\u0001", 2)
      val q = s.readStream.format("graftbus").option("path", root)
        .option("maxSegmentsPerTrigger", "1").load()
        .select(parts.getItem(0).cast("long").as("doc_id"),
          parts.getItem(1).as("text"))
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            if (!built) {
              graft.functions.SignatureIndex.build(batch, "doc_id", "text",
                idx)
              built = true
            } else
              // batchId-derived idempotency token (the e38 discipline):
              // a redelivered foreachBatch batch no-ops instead of
              // committing a duplicate fragment generation
              graft.functions.SignatureIndex.append(batch, "doc_id", "text",
                idx, commitId = Some(s"bus_batch_$batchId"))
            ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      busVacuumAssertEmpty(root)
      graft.functions.SignatureIndex.servePairs(
          s, idx, docs.filter($"doc_id" % 2 === 1), "doc_id", "text", 0.8)
        .orderBy($"id_new", $"id_base")
    },
    graft.queries.LlmOps.t49SnapshotDedup.oracle)

  /** e37's shape for VECTORS (r14 verdict item 2) — the production
    * embedding-crawl ingest end-to-end: the build half (vec_id < 300,
    * the split whose id-ordered trainer sample makes the frozen
    * centroids equal a full build's — s14's construction) publishes to
    * an 8-partition bus as ONE segment wave through the two-phase DSv2
    * sink, the rest as a second wave; the micro-batch drain folds
    * batch 0 into `VectorIndex.build` and batch 1 into a FRAGMENT
    * `append` carrying a batchId-derived idempotency token (a
    * redelivered foreachBatch batch would no-op instead of
    * double-inserting — the r14 ADVICE redelivery gap, here on the
    * production path). Vectors ride the bus as strings
    * (Float.toString is round-trip exact by Java spec, so
    * decode∘encode is the identity bit-for-bit); the label column
    * rides too, proving the metaCols append schema through the bus.
    * Post-drain the log vacuums to the consumed watermark (zero live
    * segments — drained segments are dead disk weight at 100 TB), and
    * the stream-final index serves top-k that must hash-match s03's
    * index-free SQL oracle: bus offsets, segment decode, the fragment
    * protocol's generation flips, the idempotency token and the
    * probed-list serve all behind one driver check.
    */
  val e38BusVectorIndex = Q(
    "e38_bus_vector_index",
    (s, dir) => {
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val busParts = 8
      val root = java.nio.file.Files.createTempDirectory("bus_e38").toString
      graft.sources.bus.BusLog.create(root, busParts)
      // two publish waves (busPublishWave: one segment per bus
      // partition per wave — the e37 discipline)
      for (g <- Seq(0, 1))
        busPublishWave(
          if (g == 0) emb.filter($"vec_id" < 300)
          else emb.filter($"vec_id" >= 300),
          $"vec_id",
          concat_ws("", $"vec_id", $"label",
            concat_ws(",", transform($"embedding", x => x.cast("string")))),
          root, busParts)
      val idx = s"$root/idx"
      var built = false
      val parts = split($"value", "", 3)
      val q = s.readStream.format("graftbus").option("path", root)
        .option("maxSegmentsPerTrigger", "1").load()
        .select(parts.getItem(0).cast("long").as("vec_id"),
          parts.getItem(1).cast("int").as("label"),
          transform(split(parts.getItem(2), ","), x => x.cast("float"))
            .as("embedding"))
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            if (!built) {
              graft.functions.VectorIndex.build(batch, "vec_id", "embedding",
                idx, numCentroids = 16, metaCols = Seq("label"))
              built = true
            } else
              graft.functions.VectorIndex.append(batch, "vec_id", "embedding",
                idx, commitId = Some(s"bus_batch_$batchId"))
            ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      busVacuumAssertEmpty(root)
      graft.functions.VectorIndex.topK(s, idx,
        emb.filter($"vec_id" < 8), "vec_id", "embedding", k = 3, nprobe = 4)
        .orderBy($"query_id", $"rank")
    },
    graft.queries.LlmOps.s14IvfAppendTopK.oracle)

  /** e37/e38's shape for the THIRD index family (r15 verdict item 3) —
    * the production retrieval-ingest loop end-to-end: the even-doc_id
    * half of the corpus publishes to an 8-partition bus as ONE segment
    * wave through the two-phase DSv2 sink, the odd half as a second
    * wave; the micro-batch drain folds batch 0 into `TextIndex.build`
    * and batch 1 into an O(batch) FRAGMENT `append` carrying a
    * batchId-derived idempotency token (a redelivered foreachBatch
    * batch no-ops against the persisted last_append_id extra even if
    * the append folded inline). Post-drain the log vacuums to the
    * consumed watermark (zero live segments), and the stream-final
    * index serves BM25 top-20 that must hash-match t57's index-free
    * SQL oracle — bus offsets, segment decode, the fragment protocol's
    * generation flips, serve-time df re-derivation across fragments,
    * and the bucket-pruned postings read all behind one driver check.
    * (t58 proves the hash is achievable from a batch-built index;
    * TextIndexStreamSpec pins the file-stream face — this row makes
    * the BUS-fed face driver-visible.)
    */
  val e39BusTextIndex = Q(
    "e39_bus_text_index",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val busParts = 8
      val root = java.nio.file.Files.createTempDirectory("bus_e39").toString
      graft.sources.bus.BusLog.create(root, busParts)
      // two publish waves (busPublishWave: one segment per bus
      // partition per wave — the e37 discipline)
      for (g <- Seq(0, 1))
        busPublishWave(docs.filter($"doc_id" % 2 === g), $"doc_id",
          concat_ws("", $"doc_id", $"text"), root, busParts)
      val idx = s"$root/idx"
      var built = false
      val parts = split($"value", "", 2)
      val q = s.readStream.format("graftbus").option("path", root)
        .option("maxSegmentsPerTrigger", "1").load()
        .select(parts.getItem(0).cast("long").as("doc_id"),
          parts.getItem(1).as("text"))
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            if (!built) {
              graft.functions.TextIndex.build(batch, "doc_id", "text", idx)
              built = true
            } else
              graft.functions.TextIndex.append(batch, "doc_id", "text", idx,
                commitId = Some(s"bus_batch_$batchId"))
            ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      busVacuumAssertEmpty(root)
      graft.functions.TextIndex.bm25TopK(s, idx,
        Seq("vector", "stream", "window", "hash"), 20,
        fallback = Some((docs, "doc_id", "text")))
    },
    graft.queries.LlmOps.t57Bm25TopK.oracle)

  val all: Seq[Q] = Seq(e01TumblingWindows, e02Sessionize, e03ApprovalDecode,
    e04AsofJoin, e05Pivot, e06ApproxDistinct, e07SessionWindow, e08RangeJoin,
    e09Unpivot, e10DynamicSession, e11BusRoundtrip, e12Funnel,
    e13HllMerge, e14ThetaSetops, e15KllQuantiles, e16TopkSketch,
    e17SlidingWindows, e18CohortRetention, e19RateAnomaly, e20EwmaRate,
    e21Seasonality, e22CmsFreq, e23MarkovTransitions, e24InterArrival,
    e25LateProfile, e26Stickiness, e27SessionPaths, e28ChurnFlows,
    e29BoundedFunnel, e30Attribution, e31SessionLift, e32Scd2History,
    e33Scd2Lookup, e34Twap, e35MgHeavyHitters, e36IncrementalGroups,
    e37BusSignatureIndex, e38BusVectorIndex, e39BusTextIndex)
}
