package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ivm

/** One declared query: a DataFrame program plus (when expressible) the
  * equivalent ANSI SQL for the driver's DuckDB oracle. Column names are
  * aliased identically on both sides (the driver sorts columns by name
  * before hashing values).
  *
  * Determinism rules (SURVEY.md §5.4):
  *  - every query ends in an explicit orderBy over a unique key set;
  *  - sums over doubles go through decimal casts (exact, order-independent)
  *    or per-row double math cast to decimal — never a raw double SUM,
  *    whose value depends on partition order;
  *  - averages are computed as cast(sum_decimal as double)/count so both
  *    engines perform the identical IEEE division.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

/** Core relational operators (SURVEY.md §2.b): scan, project/filter,
  * joins (inner/semi/anti/outer), aggregation, rollup/cube, windows,
  * sort/limit/top-k, set ops, string/date/math/json functions.
  */
object Relational {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** TPC-H Q1-shaped pricing summary: scan → filter → hash aggregate.
    * At scale: single shuffle on low-cardinality keys, map-side partial
    * aggregation; filter + 7-column pruning pushed to the parquet scan.
    */
  val q01PricingSummary = Q(
    "q01_pricing_summary",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          // accumulate exactly in decimal (order-independent), then cast the
          // FINAL aggregate to double: parquet decimal arrives in pandas as
          // object-Decimal while the oracle's decimal arrives as float64, and
          // the driver's hash is representation-sensitive — double on both
          // sides is the only dtype-stable exact encoding.
          sum($"l_quantity".cast("decimal(12,2)")).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast("decimal(12,2)")).cast("double")
            .as("sum_base_price"),
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          // scale 6, not 4: the true per-row value price*(1-d)*(1+t) has
          // exactly 6 decimal digits, so a scale-6 cast recovers it exactly
          // from the double in both engines; scale 4 would force a genuine
          // rounding step whose half-way behavior is engine-specific.
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))
            .cast("decimal(22,6)")).cast("double").as("sum_charge"),
          (sum($"l_quantity".cast("decimal(12,2)")).cast("double") / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(22,6))) AS DOUBLE) AS sum_charge,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.trim),
    headline = true)

  /** Projection + predicate: both must reach the parquet scan
    * (PushedFilters / 4-column ReadSchema in `.explain`).
    */
  val q02FilterProject = Q(
    "q02_filter_project",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1995-04-01").cast("timestamp") &&
          $"l_discount" > lit(0.05))
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
        AND l_discount > 0.05
      ORDER BY l_orderkey, l_linenumber
    """.trim))

  /** Multi-way join + aggregate (TPC-H Q5 shape). nation/region are tiny
    * dimensions → broadcast; the fact-side joins shuffle on their keys and
    * AQE picks broadcast for the small build sides at runtime.
    *
    * Plan note (round-2 +35% bench drift investigated round 3): the only
    * code delta vs round 1 is the final `.cast("double")` on the summed
    * aggregate, which lands in the final HashAggregate's 25-row result
    * projection — the physical plan is otherwise identical (3-column
    * pruned lineitem scan, broadcast joins, partial+final hash agg), so
    * the drift was single-shot timing noise; Bench now reports
    * median-of-3.
    */
  val q03RevenueByNation = Q(
    "q03_revenue_by_nation",
    (s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val nat = broadcast(t(s, dir, "nation"))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(nat, $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"n_name")
    },
    Some("""
      SELECT n_name,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY revenue DESC, n_name
    """.trim),
    headline = true)

  /** Left-semi join (SQL EXISTS): customers that placed at least one
    * urgent order. Semi joins shuffle only the keys of the right side.
    */
  val q04SemiJoin = Q(
    "q04_semi_join",
    (s, dir) => {
      import s.implicits._
      val urgent = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
      t(s, dir, "customer")
        .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
      ORDER BY c_custkey
    """.trim))

  /** Left-anti join (SQL NOT EXISTS): customers with no orders at all —
    * the same primitive that backs insert-ignore-duplicates (SURVEY O12).
    */
  val q05AntiJoin = Q(
    "q05_anti_join",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey
    """.trim))

  /** Left-outer join + aggregate: order count per customer including
    * zero-order customers (count over the null-extended side).
    */
  val q06OuterJoinCounts = Q(
    "q06_outer_join_counts",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(
          count($"o_orderkey").as("n_orders"),
          sum($"o_totalprice".cast("decimal(14,2)")).cast("double").as("sum_price"))
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, count(o_orderkey) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
      ORDER BY c_custkey
    """.trim))

  /** Global top-k: orderBy + limit compiles to TakeOrderedAndProject —
    * a per-partition top-k then a k-row driver merge, no full sort.
    */
  val q07TopK = Q(
    "q07_topk_orders",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10
    """.trim))

  /** Ranking window: top-3 orders per customer. One shuffle on the
    * partition key; rank filter applied post-window.
    */
  val q08WindowTopNPerKey = Q(
    "q08_window_topn",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
        .orderBy($"o_custkey", $"rn")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rn
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 3
      ORDER BY o_custkey, rn
    """.trim))

  /** Running-total window (frame = unbounded preceding .. current row).
    * Decimal accumulation keeps the running sum exact and
    * order-independent across engines.
    */
  val q09RunningTotal = Q(
    "q09_running_total",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .filter($"l_orderkey" <= 200)
        .withColumn("running_qty",
          sum($"l_quantity".cast("decimal(12,2)")).over(w).cast("double"))
        .select($"l_orderkey", $"l_linenumber", $"running_qty")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
               OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      FROM lineitem
      WHERE l_orderkey <= 200
      ORDER BY l_orderkey, l_linenumber
    """.trim))

  /** ROLLUP grouping sets. NULLS FIRST is explicit on both sides —
    * Spark defaults nulls-first ASC, DuckDB defaults nulls-last.
    * Runs through PreAggGroupingSets: a direct `.rollup` Expands every
    * lineitem row once per grouping set (3× the scan output at any
    * scale); pre-aggregating to one row per (returnflag, linestatus)
    * first leaves Expand a handful of rows. count(*) re-aggregates as
    * sum of partial counts; the decimal partial sums re-sum exactly.
    */
  val q10Rollup = Q(
    "q10_rollup",
    (s, dir) => {
      import s.implicits._
      graft.operators.PreAggGroupingSets.rollup(
        t(s, dir, "lineitem"), Seq("l_returnflag", "l_linestatus"),
        partials = Seq(count(lit(1)).as("__n"),
          sum($"l_quantity".cast("decimal(12,2)")).as("__q")),
        finals = Seq(sum($"__n").as("n"),
          sum($"__q").cast("double").as("sum_qty")))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },
    Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """.trim))

  /** CUBE grouping sets over orders — pre-aggregated like q10 (a
    * 2-dim cube Expands 4×; the pre-aggregate leaves Expand the
    * status×priority tuples only).
    */
  val q11Cube = Q(
    "q11_cube",
    (s, dir) => {
      import s.implicits._
      graft.operators.PreAggGroupingSets.cube(
        t(s, dir, "orders"), Seq("o_orderstatus", "o_orderpriority"),
        partials = Seq(count(lit(1)).as("__n"),
          sum($"o_totalprice".cast("decimal(14,2)")).as("__p")),
        finals = Seq(sum($"__n").as("n"),
          sum($"__p").cast("double").as("sum_price")))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """.trim))

  /** Set operations: INTERSECT and EXCEPT (both set-semantics distinct). */
  val q12SetOps = Q(
    "q12_set_ops",
    (s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders")
      val fCust = ord.filter($"o_orderstatus" === "F").select($"o_custkey")
      val oCust = ord.filter($"o_orderstatus" === "O").select($"o_custkey")
      fCust.intersect(oCust)
        .withColumn("src", lit("both"))
        .unionByName(fCust.except(oCust).withColumn("src", lit("f_only")))
        .orderBy($"src", $"o_custkey")
    },
    Some("""
      SELECT o_custkey, 'both' AS src FROM
        (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      UNION ALL
      SELECT o_custkey, 'f_only' AS src FROM
        (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      ORDER BY src, o_custkey
    """.trim))

  /** DISTINCT aggregation: count(distinct) expands to a two-phase
    * aggregate in Spark; exact (not approx) to match the oracle.
    */
  val q13DistinctAgg = Q(
    "q13_distinct_agg",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          countDistinct($"o_custkey").as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
             count(*) AS n_orders
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """.trim))

  /** String functions — the reference's table-name derivation (SURVEY O3,
    * data-query.py:62-68: strip extension, sanitize to [a-zA-Z0-9_],
    * lowercase) and path-based operation routing (O4, data-query.py:212-229)
    * expressed as pure column expressions over synthesized file paths.
    */
  val q14StringFns = Q(
    "q14_string_fns",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("file_name",
          concat(lit("Report "), $"source", lit("-"), $"lang", lit(".Final.csv")))
        .withColumn("path", concat(
          when($"doc_id" % 3 === 0, "insert")
            .when($"doc_id" % 3 === 1, "update").otherwise("delete"),
          lit("/"), $"file_name"))
        .withColumn("operation", element_at(split($"path", "/"), 1))
        .withColumn("table_name",
          lower(regexp_replace(
            regexp_replace($"file_name", "\\.[^.]*$", ""),
            "[^a-zA-Z0-9_]", "_")))
        .filter($"operation".isin("insert", "update", "delete"))
        .select($"doc_id", $"path", $"operation", $"table_name")
        .orderBy($"doc_id")
    },
    Some("""
      WITH f AS (
        SELECT doc_id,
               'Report ' || source || '-' || lang || '.Final.csv' AS file_name,
               CASE WHEN doc_id % 3 = 0 THEN 'insert'
                    WHEN doc_id % 3 = 1 THEN 'update'
                    ELSE 'delete' END
                 || '/' || 'Report ' || source || '-' || lang || '.Final.csv' AS path
        FROM documents)
      SELECT doc_id, path, string_split(path, '/')[1] AS operation,
             lower(regexp_replace(regexp_replace(file_name, '\.[^.]*$', ''),
                                  '[^a-zA-Z0-9_]', '_', 'g')) AS table_name
      FROM f
      WHERE string_split(path, '/')[1] IN ('insert', 'update', 'delete')
      ORDER BY doc_id
    """.trim))

  /** Date/time functions: truncation to month, extraction, ISO-8601
    * formatting at the notification edge (SURVEY §1.2).
    */
  val q15DateFns = Q(
    "q15_date_fns",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy(
          year($"o_orderdate").cast("long").as("y"),
          month($"o_orderdate").cast("long").as("m"))
        .agg(count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(14,2)")).cast("double").as("sum_price"))
        .orderBy($"y", $"m")
    },
    Some("""
      SELECT EXTRACT(year FROM o_orderdate) AS y,
             EXTRACT(month FROM o_orderdate) AS m,
             count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY 1, 2
      ORDER BY y, m
    """.trim))

  /** JSON extraction (SURVEY O18's from_json/decode path, minus the
    * base64 layer exercised in unit tests): pull a typed field out of the
    * events.props JSON payload.
    */
  val q16JsonFns = Q(
    "q16_json_fns",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"k").as("sum_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n,
             -- DuckDB sum(BIGINT) is HUGEINT -> float64 in pandas; Spark's is
             -- int64. CAST back to BIGINT keeps both sides int64.
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """.trim))

  /** CASE expressions + arithmetic bucketing. */
  val q17CaseMath = Q(
    "q17_case_math",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .withColumn("bucket",
          when($"l_quantity" < 10, "low")
            .when($"l_quantity" < 25, "mid")
            .otherwise("high"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          sum($"l_extendedprice".cast("decimal(14,2)")).cast("double").as("sum_price"))
        .orderBy($"bucket")
    },
    Some("""
      SELECT CASE WHEN l_quantity < 10 THEN 'low'
                  WHEN l_quantity < 25 THEN 'mid'
                  ELSE 'high' END AS bucket,
             count(*) AS n,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
      FROM lineitem
      GROUP BY 1
      ORDER BY bucket
    """.trim))

  /** Exact interpolated percentiles (sort-based aggregate) + min/max. */
  val q18Percentiles = Q(
    "q18_percentiles",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          min($"l_quantity").as("min_qty"),
          max($"l_quantity").as("max_qty"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.5) AS median_qty,
             quantile_cont(l_quantity, 0.9) AS p90_qty,
             min(l_quantity) AS min_qty,
             max(l_quantity) AS max_qty
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """.trim))

  /** Correlated-aggregate filter (decorrelated as a window aggregate):
    * customers above their nation's average balance. The window form
    * needs one shuffle; Catalyst decorrelates the equivalent subquery
    * to the same shape.
    */
  val q19AboveNationAvg = Q(
    "q19_above_nation_avg",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey")
      t(s, dir, "customer")
        .withColumn("nation_avg",
          sum($"c_acctbal".cast("decimal(14,2)")).over(w).cast("double") /
            count(lit(1)).over(w))
        .filter($"c_acctbal" > $"nation_avg")
        .select($"c_custkey", $"c_name", $"c_acctbal", $"nation_avg")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, c_acctbal, nation_avg
      FROM (SELECT c_custkey, c_name, c_acctbal,
              CAST(sum(CAST(c_acctbal AS DECIMAL(14,2)))
                     OVER (PARTITION BY c_nationkey) AS DOUBLE) /
                count(*) OVER (PARTITION BY c_nationkey) AS nation_avg
            FROM customer)
      WHERE c_acctbal > nation_avg
      ORDER BY c_custkey
    """.trim))

  /** Date arithmetic: interval shift + day difference. */
  val q20DateArith = Q(
    "q20_date_arith",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select(
          $"o_orderkey",
          date_add($"o_orderdate", 90).as("due_date"),
          datediff(lit("1998-01-01").cast("date"), $"o_orderdate")
            .cast("long").as("days_to_cutoff"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
             CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
             datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_cutoff
      FROM orders
      ORDER BY o_orderkey
    """.trim))

  /** Regex group extraction: '1-URGENT' → (1, URGENT). */
  val q21RegexExtract = Q(
    "q21_regex_extract",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy(
          nullif(regexp_extract($"o_orderpriority", "^(\\d+)-(\\w+)$", 1), lit(""))
            .cast("long").as("prio_num"),
          nullif(regexp_extract($"o_orderpriority", "^(\\d+)-(\\w+)$", 2), lit(""))
            .as("prio_word"))
        .agg(count(lit(1)).as("n"))
        .orderBy($"prio_num".asc_nulls_first)
    },
    Some("""
      SELECT CAST(nullif(regexp_extract(o_orderpriority, '^(\d+)-(\w+)$', 1), '') AS BIGINT) AS prio_num,
             nullif(regexp_extract(o_orderpriority, '^(\d+)-(\w+)$', 2), '') AS prio_word,
             count(*) AS n
      FROM orders
      GROUP BY 1, 2
      ORDER BY prio_num ASC NULLS FIRST
    """.trim))

  /** Array construction + functions: deterministic collect via
    * sort_array, element access, slicing, containment. Array-valued
    * columns are serialized to comma-joined strings on BOTH sides — the
    * driver's pandas comparator cannot sort/hash raw ndarray cells
    * (round-1 q22 `err`), and a canonical string is dtype-stable.
    */
  val q22ArrayFns = Q(
    "q22_array_fns",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_orderkey" <= 500)
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_list($"l_linenumber")).as("lines_arr"))
        .select(
          $"l_orderkey",
          concat_ws(",", $"lines_arr").as("lines"),
          size($"lines_arr").cast("long").as("n_lines"),
          element_at($"lines_arr", 1).as("first_line"),
          concat_ws(",", slice($"lines_arr", 1, 2)).as("first_two"),
          array_contains($"lines_arr", 3).as("has_three"))
        .orderBy($"l_orderkey")
    },
    Some("""
      SELECT l_orderkey,
             array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
             len(list_sort(list(l_linenumber))) AS n_lines,
             list_sort(list(l_linenumber))[1] AS first_line,
             array_to_string(list_sort(list(l_linenumber))[1:2], ',') AS first_two,
             list_contains(list(l_linenumber), 3) AS has_three
      FROM lineitem
      WHERE l_orderkey <= 500
      GROUP BY l_orderkey
      ORDER BY l_orderkey
    """.trim))

  /** Math scalar functions over exactly-reproducible ops: abs, floor,
    * ceil, sqrt (IEEE correctly-rounded), pmod, decimal round. (ln/pow
    * are deliberately absent — libm implementations differ across
    * engines at ULP level.)
    */
  val q23MathFns = Q(
    "q23_math_fns",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_orderkey" <= 300)
        .select(
          $"l_orderkey", $"l_linenumber",
          abs(-$"l_quantity").as("abs_qty"),
          floor($"l_extendedprice").cast("long").as("floor_price"),
          ceil($"l_extendedprice").cast("long").as("ceil_price"),
          sqrt($"l_quantity").as("sqrt_qty"),
          pmod($"l_orderkey", lit(7)).as("mod7"),
          round($"l_discount" * 100).cast("long").as("disc_pct"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             abs(-l_quantity) AS abs_qty,
             CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
             CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
             sqrt(l_quantity) AS sqrt_qty,
             l_orderkey % 7 AS mod7,
             CAST(round(l_discount * 100) AS BIGINT) AS disc_pct
      FROM lineitem
      WHERE l_orderkey <= 300
      ORDER BY l_orderkey, l_linenumber
    """.trim))

  /** Salted skew join through the correctness gate: the salted plan
    * must produce exactly the unsalted join's rows (the oracle is the
    * plain SQL join). SkewJoinSpec covers the plan mechanics; this
    * covers end-to-end value equality on real tables.
    */
  val q24SaltedJoin = Q(
    "q24_salted_join",
    (s, dir) => {
      import s.implicits._
      val big = t(s, dir, "lineitem")
        .select($"l_suppkey".as("suppkey"), $"l_extendedprice", $"l_discount")
      val small = t(s, dir, "supplier")
        .select($"s_suppkey".as("suppkey"), $"s_nationkey")
      graft.operators.SkewJoin.saltedInnerJoin(big, small, Seq("suppkey"))
        .groupBy($"s_nationkey")
        .agg(
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"s_nationkey")
    },
    Some("""
      SELECT s_nationkey,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey
      ORDER BY s_nationkey
    """.trim))

  /** TPC-H Q7-shaped volume shipping: a 6-table join (lineitem, orders,
    * customer, supplier, nation×2) with a cross-side nation-pair
    * predicate — the join-ORDERING workload q03's 3-table shape never
    * exercises. Scale shape: both nation dims are pre-filtered to the
    * two trading nations BEFORE their broadcasts (two-row build sides —
    * constraint propagation isn't trusted to derive this from the
    * disjunctive pair predicate), the fact table keeps its pushed
    * shipdate range filter, and the only shuffles are the two big
    * fact-fact joins on orderkey/custkey.
    */
  val q25VolumeShipping = Q(
    "q25_volume_shipping",
    (s, dir) => {
      import s.implicits._
      val nations = Seq("NATION_3", "NATION_7")
      val n1 = broadcast(t(s, dir, "nation")
        .filter($"n_name".isin(nations: _*))
        .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation")))
      val n2 = broadcast(t(s, dir, "nation")
        .filter($"n_name".isin(nations: _*))
        .select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation")))
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        .join(t(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
        .join(n1, $"s_nationkey" === $"s_nk")
        .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(n2, $"c_nationkey" === $"c_nk")
        .filter(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_7") ||
          ($"supp_nation" === "NATION_7" && $"cust_nation" === "NATION_3"))
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").cast("long").as("l_year"))
        .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    },
    Some("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') OR
             (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3
    """.trim),
    headline = true)

  /** TPC-H Q8-shaped market share: an 8-table join (lineitem, orders,
    * customer, supplier, part, region, nation×2) computing one supplier
    * nation's share of a region's order volume for one part type, per
    * year. The deepest join tree in the suite — join ordering +
    * broadcast selection under multiple selective dims. The share is a
    * single IEEE division of two decimal-exact sums (conditional
    * numerator via a CASE inside the aggregate — one pass, no re-join).
    */
  val q26MarketShare = Q(
    "q26_market_share",
    (s, dir) => {
      import s.implicits._
      val n1 = broadcast(t(s, dir, "nation")
        .select($"n_nationkey".as("c_nk"), $"n_regionkey"))
      val n2 = broadcast(t(s, dir, "nation")
        .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation")))
      val reg = broadcast(t(s, dir, "region").filter($"r_name" === "EUROPE"))
      val prt = broadcast(t(s, dir, "part").filter($"p_type" === "STANDARD"))
      val vol = ($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast("decimal(18,4)")
      t(s, dir, "lineitem")
        .join(prt, $"l_partkey" === $"p_partkey")
        .join(t(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
        .join(n2, $"s_nationkey" === $"s_nk")
        .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
        .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(n1, $"c_nationkey" === $"c_nk")
        .join(reg, $"n_regionkey" === $"r_regionkey")
        .groupBy(year($"o_orderdate").cast("long").as("o_year"))
        .agg(
          (sum(when($"supp_nation" === "NATION_3", vol).otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
            sum(vol).cast("double")).as("mkt_share"),
          sum(vol).cast("double").as("total_volume"))
        .orderBy($"o_year")
    },
    Some("""
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                           THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_volume
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
        AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
      ORDER BY 1
    """.trim),
    headline = true)

  /** TPC-H Q17-shaped small-quantity revenue through the SQL face: a
    * CORRELATED scalar subquery (per-part average threshold) that
    * Catalyst must decorrelate into an aggregate + join — the last
    * planner behavior the suite didn't exercise. The threshold is
    * decimal-exact (sum-decimal → one IEEE division → one multiply) so
    * both engines compare against the identical double. Scale shape
    * after decorrelation: one partial-agg shuffle on l_partkey + the
    * brand-filtered join — no per-row re-scan of lineitem.
    */
  val q27SmallQtyRevenue = Q(
    "q27_small_qty_revenue",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "part").createOrReplaceTempView("g_part")
      s.sql("""
        SELECT p_brand,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               count(*) AS n_small
        FROM g_lineitem l1 JOIN g_part ON l1.l_partkey = p_partkey
        WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
          AND l1.l_quantity < (
            SELECT 0.5 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*))
            FROM g_lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        GROUP BY p_brand
        ORDER BY p_brand
      """)
    },
    Some("""
      SELECT p_brand,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             count(*) AS n_small
      FROM lineitem l1 JOIN part ON l1.l_partkey = p_partkey
      WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        AND l1.l_quantity < (
          SELECT 0.5 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*))
          FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
      GROUP BY p_brand
      ORDER BY p_brand
    """.trim))

  /** One co-located warehouse per process per dataset (write once /
    * join many — the pattern bucketing exists for): lineitem and
    * orders persisted `bucketBy` their join keys into a temp warehouse
    * reclaimed at JVM exit. Table idents carry a dir hash so datasets
    * never cross-contaminate the session catalog.
    */
  private val coLocatedRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def coLocatedWarehouse(s: SparkSession,
      dir: String): (graft.catalog.Catalog, String, String) = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val (liName, ordName) = (s"q28li_$tag", s"q28ord_$tag")
    val root = Tables.cachedTempRoot(coLocatedRoots, dir, "graft_colocated") { p =>
      val cat = new graft.catalog.Catalog(s, p.toString)
      cat.saveCoLocated(liName, t(s, dir, "lineitem"), Seq("l_orderkey"), 8)
      cat.saveCoLocated(ordName, t(s, dir, "orders"), Seq("o_orderkey"), 8)
      p.toString
    }
    (new graft.catalog.Catalog(s, root), liName, ordName)
  }

  /** Co-located join through the correctness gate: both fact tables are
    * bucketed on their join keys (same bucket count), so the merge join
    * plans with NO Exchange on either side — the lever that makes a
    * repeated 100 TB fact-fact join cost a local sort-merge instead of
    * a full shuffle of both sides. The oracle is the plain SQL join:
    * shuffle elision must change the plan, never the rows. (Mechanics
    * and the no-Exchange plan assert live in BucketingSpec; the merge
    * hint pins the join shape against auto-broadcast at small SF.)
    */
  val q28ColocatedJoin = Q(
    "q28_colocated_join",
    (s, dir) => {
      import s.implicits._
      val (cat, li, ord) = coLocatedWarehouse(s, dir)
      cat.readCoLocated(li).hint("merge")
        .join(cat.readCoLocated(ord), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """.trim))

  /** Arbitrary GROUPING SETS (the aggregation face rollup/cube can't
    * express: two independent single-column groupings + grand total in
    * ONE pass over the data). gid is assembled explicitly from ANSI
    * `grouping()` bits so both engines agree on the encoding.
    */
  val q29GroupingSets = Q(
    "q29_grouping_sets",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      s.sql("""
        SELECT c_mktsegment, c_nationkey,
               CAST(grouping(c_mktsegment) * 2 + grouping(c_nationkey) AS BIGINT) AS gid,
               count(*) AS n,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS acct_sum
        FROM g_customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY gid, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
      """)
    },
    Some("""
      SELECT c_mktsegment, c_nationkey,
             CAST(grouping(c_mktsegment) * 2 + grouping(c_nationkey) AS BIGINT) AS gid,
             count(*) AS n,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS acct_sum
      FROM customer
      GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
      ORDER BY gid, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
    """.trim))

  /** TPC-H Q20-shaped nested semi join: an IN-subquery whose body is an
    * aggregate over another IN-subquery — suppliers whose shipped
    * volume of one part type in one year clears a threshold. Catalyst
    * must rewrite BOTH predicates to LeftSemi joins with the HAVING
    * aggregate between them: LeftSemi(supplier, Agg(LeftSemi(lineitem,
    * σ(part)))) — a planner shape no other query exercises. Scale
    * shape: part's type filter broadcasts into the inner semi join, the
    * shipdate range is pushed to the fact scan, the aggregate's
    * partial/final shuffle is on l_suppkey, and the outer semi join
    * broadcasts the (supplier-cardinality-bounded) qualifying-key set.
    */
  val q30NestedSemiJoin = Q(
    "q30_nested_semi_join",
    (s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "part").createOrReplaceTempView("g_part")
      s.sql("""
        SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
        FROM g_supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM g_lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM g_part WHERE p_type = 'STANDARD')
            AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey
          HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 450.0)
        ORDER BY s_suppkey
      """)
    },
    Some("""
      SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
      FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'STANDARD')
          AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 450.0)
      ORDER BY s_suppkey
    """.trim))

  /** TPC-H Q22-shaped dormant-customer summary: three subquery flavors
    * in one predicate — an uncorrelated scalar (global avg threshold,
    * decimal-exact division), a NOT IN over a filtered dimension (the
    * null-aware anti join, Spark's single-column NAAJ broadcast path —
    * distinct from q05's NOT EXISTS rewrite), and a correlated NOT
    * EXISTS over a date-restricted fact ("no orders since 2000", a
    * plain LeftAnti). Scale shape: the scalar and the two-row NOT IN
    * build side broadcast; the only shuffle is the anti join against
    * the pre-filtered orders slice and the final segment aggregate.
    * NOT IN over a FACT table would be an anti-pattern at 100 TB (the
    * null-check forces the whole build side resident); keeping it on
    * the dimension and the fact side as NOT EXISTS is the shape that
    * survives scale.
    */
  val q31DormantCustomers = Q(
    "q31_dormant_customers",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT c_mktsegment, count(*) AS n_cust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
        FROM g_customer c
        WHERE c_acctbal > (
            SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
            FROM g_customer WHERE c_acctbal > 0.0)
          AND c_nationkey NOT IN (
            SELECT n_nationkey FROM g_nation WHERE n_name IN ('NATION_1', 'NATION_2'))
          AND NOT EXISTS (
            SELECT 1 FROM g_orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
      """)
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n_cust,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
      FROM customer c
      WHERE c_acctbal > (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
          FROM customer WHERE c_acctbal > 0.0)
        AND c_nationkey NOT IN (
          SELECT n_nationkey FROM nation WHERE n_name IN ('NATION_1', 'NATION_2'))
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment
    """.trim))

  /** LATERAL correlated subquery with ORDER BY + LIMIT (per-nation
    * top-3 customers by balance): Catalyst decorrelates the lateral
    * top-k into `WindowGroupLimit` (a PARTIAL map-side rank-limit
    * before the shuffle, then the final one) + a broadcast join with
    * the outer side — the per-group-top-k plan you'd hand-write, but
    * derived from the declarative per-row subquery. The planner
    * surface q08's explicit window formulation never touches.
    */
  val q32LateralTopK = Q(
    "q32_lateral_topk",
    (s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      s.sql("""
        SELECT n_name, c.c_custkey, c.c_acctbal
        FROM g_nation, LATERAL (
          SELECT c_custkey, c_acctbal FROM g_customer
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 3) c
        ORDER BY n_name, c_acctbal DESC, c_custkey
      """)
    },
    Some("""
      SELECT n_name, c.c_custkey, c.c_acctbal
      FROM nation, LATERAL (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 3) c
      ORDER BY n_name, c_acctbal DESC, c_custkey
    """.trim))

  /** RECURSIVE CTE (new in Spark 4): a data-driven monthly calendar
    * spine from min to max order date, left-joined to per-month order
    * counts — the dense-time-series pattern (months with zero orders
    * appear as 0, which no GROUP BY over the raw data can produce).
    * The recursion is driver-bounded at one row per month; the heavy
    * side stays one hash aggregate of the fact table joined to the
    * tiny spine.
    */
  val q33MonthSpine = Q(
    "q33_month_spine",
    (s, dir) => {
      import org.apache.spark.sql.functions.{date_format, date_trunc, max => smax, min => smin}
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      // bounds once, as a bounded control-plane read: a subquery in the
      // recursive step's WHERE is re-evaluated EVERY iteration — ~80
      // full scans of the fact table for two constants (measured 12.2 s
      // at sf0.1; literals bring it to 1.3 s, the floor set by the ~80
      // single-row recursion iterations themselves). The literals are
      // rendered by date_format IN the session timezone — collecting a
      // Timestamp and toString-ing it would render in the JVM default
      // zone and re-parse in the session zone, shifting the spine on
      // any non-UTC driver.
      val b = t(s, dir, "orders").agg(
        date_format(date_trunc("month", smin(col("o_orderdate"))),
          "yyyy-MM-dd HH:mm:ss").as("lo"),
        date_format(date_trunc("month", smax(col("o_orderdate"))),
          "yyyy-MM-dd HH:mm:ss").as("hi")).head()
      s.sql(s"""
        WITH RECURSIVE spine(m) AS (
          SELECT TIMESTAMP '${b.getString(0)}'
          UNION ALL
          SELECT m + INTERVAL '1' MONTH FROM spine
          WHERE m < TIMESTAMP '${b.getString(1)}'
        )
        SELECT m, count(o_orderkey) AS n
        FROM spine LEFT JOIN g_orders ON date_trunc('month', o_orderdate) = m
        GROUP BY m ORDER BY m
      """)
    },
    Some("""
      WITH RECURSIVE spine(m) AS (
        SELECT date_trunc('month', min(o_orderdate)) FROM orders
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM spine
        WHERE m < (SELECT date_trunc('month', max(o_orderdate)) FROM orders)
      )
      SELECT m, count(o_orderkey) AS n
      FROM spine LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
      GROUP BY m ORDER BY m
    """.trim))

  /** One ORC copy of `orders` per process per dataset (write once /
    * query many), reclaimed at JVM exit — the q28 warehouse pattern
    * applied to format parity.
    */
  private val orcRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def orcOrders(s: SparkSession, dir: String): String =
    Tables.cachedTempRoot(orcRoots, dir, "graft_orc") { p =>
      val out = s"$p/orders_orc"
      t(s, dir, "orders").write.mode("overwrite").orc(out)
      out
    }

  /** Time-based RANGE window frame (90-day rolling revenue per
    * customer): the frame boundary is an event-time INTERVAL on the
    * ORDER BY column, not a row count — ties share one frame value and
    * gaps shrink it, which no ROWS frame (q09) can express. Exercises
    * Spark's RangeFrame + interval-bound window path. One shuffle on
    * the partition key; the frame scan is a per-partition sliding
    * aggregate, never a per-row re-scan.
    */
  val q36RangeFrame = Q(
    "q36_range_frame",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL '90' DAY PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS rolling_90d
        FROM g_orders
        ORDER BY o_custkey, o_orderdate, o_orderkey
      """)
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS rolling_90d
      FROM orders
      ORDER BY o_custkey, o_orderdate, o_orderkey
    """.trim))

  private val csvRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def csvOrders(s: SparkSession, dir: String): String =
    Tables.cachedTempRoot(csvRoots, dir, "graft_csv") { p =>
      val out = s"$p/orders_csv"
      t(s, dir, "orders").write.mode("overwrite")
        .option("header", "true")
        // ISO-8601 with micros: text round-trip keeps timestamp identity
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .csv(out)
      out
    }

  /** CSV sink + source parity — the reference's actual landing format
    * (O1). orders written once as headered CSV and read back with an
    * EXPLICIT schema (never inferSchema at scale: inference is a full
    * extra pass over the data and can type drift per file), then
    * aggregated; the oracle aggregates the original parquet, so any
    * text round-trip loss hash-fails. Doubles survive because Spark
    * writes shortest-round-trip representations; timestamps survive
    * via an explicit micros format on both write and read.
    */
  val q35CsvRoundtrip = Q(
    "q35_csv_roundtrip",
    (s, dir) => {
      import s.implicits._
      s.read
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .schema("o_orderkey bigint, o_custkey bigint, o_orderstatus string, " +
          "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
        .csv(csvOrders(s, dir))
        .filter($"o_orderdate" < lit("1996-01-01").cast("timestamp"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(18,4)")).cast("double").as("total"),
          max($"o_orderdate").as("last_order"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
             max(o_orderdate) AS last_order
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1996-01-01'
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """.trim))

  /** ORC sink + source parity: orders written to ORC once, the query
    * reads it back with a pushed date filter and aggregates — the
    * oracle runs the identical aggregate over the original parquet, so
    * a round-trip that loses rows, precision, or timestamp semantics
    * hash-fails. ORC is the second columnar format the engine serves
    * (same predicate pushdown + column pruning contract as parquet,
    * asserted in PlanGuard's scan spec below at the ORC scan node).
    */
  val q34OrcRoundtrip = Q(
    "q34_orc_roundtrip",
    (s, dir) => {
      import s.implicits._
      s.read.orc(orcOrders(s, dir))
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp"))
        .groupBy($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(18,4)")).cast("double").as("total"))
        .orderBy($"o_orderstatus", $"o_orderpriority")
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      GROUP BY o_orderstatus, o_orderpriority
      ORDER BY o_orderstatus, o_orderpriority
    """.trim))

  private val jsonRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def jsonCustomer(s: SparkSession, dir: String): String =
    Tables.cachedTempRoot(jsonRoots, dir, "graft_json") { p =>
      val out = s"$p/customer_json"
      t(s, dir, "customer").write.mode("overwrite").json(out)
      out
    }

  /** JSON-lines sink + source parity, completing the format matrix
    * (parquet / ORC / CSV / JSON — the four formats a landing pipeline
    * actually meets). customer written once as JSON-lines and read back
    * with an EXPLICIT schema (inference is a full extra pass and can
    * type-drift per file), then aggregated; the oracle aggregates the
    * original parquet, so any round-trip loss (doubles, key order,
    * nulls) hash-fails. Doubles survive because Spark writes
    * shortest-round-trip representations in JSON as in CSV.
    */
  val q37JsonRoundtrip = Q(
    "q37_json_roundtrip",
    (s, dir) => {
      import s.implicits._
      s.read
        .schema("c_custkey bigint, c_name string, c_nationkey int, " +
          "c_acctbal double, c_mktsegment string")
        .json(jsonCustomer(s, dir))
        .filter($"c_acctbal" > 0.0)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum($"c_acctbal".cast("decimal(18,4)")).cast("double").as("total_bal"),
          max($"c_name").as("last_name"))
        .orderBy($"c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal,
             max(c_name) AS last_name
      FROM customer
      WHERE c_acctbal > 0.0
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment
    """.trim))

  /** Analytic-window breadth: lag/lead offsets, ntile bucketing, and the
    * rank-family ratios (percent_rank, cume_dist) in one pass over each
    * customer's order history. One shuffle on o_custkey serves every
    * function (a single Window operator computes all six), and the full
    * (o_orderdate, o_orderkey) ordering makes offsets and ratios
    * deterministic under date ties. The ratio functions divide exact
    * integer rank counts in binary64, so both engines produce identical
    * doubles.
    */
  val q38WindowBreadth = Q(
    "q38_window_breadth",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .filter($"o_custkey" % 10 === 0)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate",
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate,
             lag(o_totalprice, 1) OVER w AS prev_price,
             lead(o_totalprice, 1) OVER w AS next_price,
             ntile(4) OVER w AS quartile,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd
      FROM orders
      WHERE o_custkey % 10 = 0
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderdate, o_orderkey
    """.trim))

  /** Multiset set-ops: INTERSECT ALL / EXCEPT ALL between two order-year
    * customer multisets (one element per order, so multiplicities carry
    * purchase frequency). Spark plans both as aggregate-style joins on a
    * replicated row-count — no row explosion beyond min/max counts —
    * and the final per-key counts pin the multiplicity semantics the
    * bag-operators guarantee (min(a,b) for INTERSECT ALL, a-b floor 0
    * for EXCEPT ALL), which DISTINCT set ops (q12) cannot express.
    */
  val q39SetOpsAll = Q(
    "q39_set_ops_all",
    (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      def custs(y: Int) = o
        .filter(year($"o_orderdate") === y)
        .select($"o_custkey")
      val i = custs(1995).intersectAll(custs(1996))
        .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
        .withColumn("op", lit("intersect_all"))
      val e = custs(1995).exceptAll(custs(1996))
        .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
        .withColumn("op", lit("except_all"))
      i.unionByName(e)
        .select($"op", $"o_custkey", $"n")
        .orderBy($"op", $"o_custkey")
    },
    Some("""
      WITH a AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
      b AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
      i AS (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b),
      e AS (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b)
      SELECT 'intersect_all' AS op, o_custkey, count(*) AS n FROM i GROUP BY 2
      UNION ALL
      SELECT 'except_all' AS op, o_custkey, count(*) AS n FROM e GROUP BY 2
      ORDER BY op, o_custkey
    """.trim))

  /** NULL-semantics surface: NULLIF-manufactured nulls, a null-safe
    * equality join (<=> / IS NOT DISTINCT FROM) against a dimension that
    * itself carries a NULL key, and the count(*) vs count(col) vs
    * count(DISTINCT col) split that nulls drive apart. The null-safe
    * join stays a hash join (null keys hash like any other value under
    * <=>), so the NULL bucket routes to one partition rather than
    * degenerating to a nested loop.
    */
  val q40NullSemantics = Q(
    "q40_null_semantics",
    (s, dir) => {
      import s.implicits._
      val dim = Seq(
        ("2-HIGH", "fast"), ("3-MEDIUM", "mid"), ("4-NOT SPECIFIED", "mid"),
        ("5-LOW", "slow"), (null.asInstanceOf[String], "urgent"))
        .toDF("prio", "speed")
      val o = t(s, dir, "orders")
        .withColumn("prio", nullif($"o_orderpriority", lit("1-URGENT")))
      o.join(broadcast(dim), o("prio") <=> dim("prio"))
        .groupBy($"speed")
        .agg(count(lit(1)).as("n_rows"),
          count(o("prio")).as("n_prio"),
          countDistinct($"o_custkey").as("n_custs"))
        .orderBy($"speed")
    },
    Some("""
      WITH dim(prio, speed) AS (VALUES
        ('2-HIGH', 'fast'), ('3-MEDIUM', 'mid'), ('4-NOT SPECIFIED', 'mid'),
        ('5-LOW', 'slow'), (NULL, 'urgent')),
      o AS (SELECT nullif(o_orderpriority, '1-URGENT') AS prio, o_custkey FROM orders)
      SELECT speed, count(*) AS n_rows, count(o.prio) AS n_prio,
             count(DISTINCT o_custkey) AS n_custs
      FROM o JOIN dim ON o.prio IS NOT DISTINCT FROM dim.prio
      GROUP BY speed
      ORDER BY speed
    """.trim))

  /** Semi-structured VARIANT path (Spark 4's open-schema column type):
    * nested order documents — an items array of per-line structs — are
    * serialized to JSON, parsed to VARIANT, and re-extracted with typed
    * `variant_get` paths including array indexing. VARIANT is the
    * engine's answer to schema-on-read event payloads: the binary
    * encoding is columnar-shredded-friendly and typed extraction stays
    * in codegen. The oracle verifies the roundtrip preserved every
    * value by computing the same facts relationally (arg_min for the
    * items[0] probe). Scale shape: one shuffle join orders⋈lineitem
    * after the selective orderkey filter pushes to both scans, one
    * collect_list aggregation at order granularity; the VARIANT
    * encode/decode is narrow per-row work.
    */
  val q41Variant = Q(
    "q41_variant",
    (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders").filter($"o_orderkey" % 20 === 0)
      val l = t(s, dir, "lineitem").filter($"l_orderkey" % 20 === 0)
      val docs = o.join(l, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey", $"o_custkey", $"o_orderstatus")
        .agg(sort_array(collect_list(struct(
          $"l_linenumber".cast("long").as("ln"),
          $"l_quantity".cast("decimal(12,2)").as("qty")))).as("items"))
        .select($"o_orderkey", to_json(struct(
          $"o_custkey".as("cust"), $"o_orderstatus".as("status"),
          $"items")).as("js"))
      docs.withColumn("v", parse_json($"js"))
        .select($"o_orderkey",
          variant_get($"v", "$.cust", "bigint").as("cust"),
          variant_get($"v", "$.status", "string").as("status"),
          expr("array_size(variant_get(v, '$.items', 'array<variant>'))")
            .cast("long").as("n_items"),
          variant_get($"v", "$.items[0].qty", "decimal(12,2)")
            .cast("double").as("first_qty"),
          variant_get($"v", "$.absent", "string").as("missing"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o.o_orderkey,
             o.o_custkey AS cust,
             o.o_orderstatus AS status,
             count(*) AS n_items,
             -- l_linenumber is NOT unique per order in this corpus:
             -- sort by the full (ln, qty) struct exactly like the
             -- Spark side's sort_array, or ties pick arbitrary rows
             CAST(list_sort(list(struct_pack(
               ln := l_linenumber,
               qty := CAST(l_quantity AS DECIMAL(12,2)))))[1].qty AS DOUBLE) AS first_qty,
             CAST(NULL AS VARCHAR) AS missing
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey % 20 = 0
      GROUP BY 1, 2, 3
      ORDER BY o_orderkey
    """.trim))

  /** FULL OUTER join — the reconciliation shape: per-month order
    * revenue (orders side) against per-month shipped quantity
    * (lineitem side), keeping months present on either side and
    * classifying each row's provenance. Spark plans a full outer
    * sort-merge join; both inputs are pre-aggregated to month
    * cardinality first, so the expensive join runs on tiny frames no
    * matter the fact-table size — the aggregate-then-outer-join order
    * is the difference between a month-sized and a corpus-sized
    * shuffle at 100 TB.
    */
  val q42FullOuter = Q(
    "q42_full_outer",
    (s, dir) => {
      import s.implicits._
      val om = t(s, dir, "orders")
        .groupBy(trunc($"o_orderdate", "mm").as("mon"))
        .agg(count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast("decimal(14,2)")).cast("double").as("revenue"))
      val sm = t(s, dir, "lineitem")
        .groupBy(trunc($"l_shipdate", "mm").as("mon"))
        .agg(count(lit(1)).as("n_ship"),
          sum($"l_quantity".cast("decimal(14,2)")).cast("double").as("qty"))
      om.join(sm, Seq("mon"), "full")
        .select($"mon",
          coalesce($"n_orders", lit(0L)).as("n_orders"),
          coalesce($"revenue", lit(0.0)).as("revenue"),
          coalesce($"n_ship", lit(0L)).as("n_ship"),
          coalesce($"qty", lit(0.0)).as("qty"),
          when($"n_orders".isNotNull && $"n_ship".isNotNull, "both")
            .when($"n_orders".isNotNull, "orders_only")
            .otherwise("ship_only").as("presence"))
        .orderBy($"mon")
    },
    Some("""
      WITH om AS (
        SELECT date_trunc('month', o_orderdate) AS mon,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1),
      sm AS (
        SELECT date_trunc('month', l_shipdate) AS mon,
               count(*) AS n_ship,
               CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY 1)
      SELECT coalesce(om.mon, sm.mon) AS mon,
             coalesce(n_orders, 0) AS n_orders,
             coalesce(revenue, 0.0) AS revenue,
             coalesce(n_ship, 0) AS n_ship,
             coalesce(qty, 0.0) AS qty,
             CASE WHEN om.mon IS NOT NULL AND sm.mon IS NOT NULL THEN 'both'
                  WHEN om.mon IS NOT NULL THEN 'orders_only'
                  ELSE 'ship_only' END AS presence
      FROM om FULL OUTER JOIN sm ON om.mon = sm.mon
      ORDER BY mon
    """.trim))

  /** IGNORE NULLS window breadth — the gap-fill (last observation
    * carried forward) shape: prices observable only on finalized
    * orders, filled forward per customer with `last(..., ignoreNulls)`
    * over a running frame, plus first-known and previous-known
    * variants. One Window operator computes all three; values pass
    * through untouched (no double aggregation), so cross-engine
    * equality is structural.
    */
  val q43GapFill = Q(
    "q43_gap_fill",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .filter($"o_custkey" % 50 === 0)
        .withColumn("price_f", when($"o_orderstatus" === "F", $"o_totalprice"))
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"price_f",
          last($"price_f", ignoreNulls = true).over(run).as("filled"),
          first($"price_f", ignoreNulls = true).over(run).as("first_f"),
          lag($"price_f", 1, null, ignoreNulls = true).over(w).as("prev_f"))
        .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate, price_f,
             last_value(price_f IGNORE NULLS) OVER run AS filled,
             first_value(price_f IGNORE NULLS) OVER run AS first_f,
             lag(price_f, 1 IGNORE NULLS) OVER w AS prev_f
      FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                   CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS price_f
            FROM orders WHERE o_custkey % 50 = 0)
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderdate, o_orderkey
    """.trim))

  /** Aggregate-function breadth: max_by/min_by (arg-extrema — made
    * deterministic under spend ties with a fixed-width digit-string
    * total order, which both engines compare bytewise), count_if,
    * bool_and/bool_or, and EXACT second moments — variance derived in
    * one IEEE expression from integer-exact decimal sums of x and x²,
    * the only way an unordered distributed sum of squares is
    * bit-reproducible (a raw double var_pop depends on partition
    * order). Two aggregations: customer-grain spend, then
    * nation-grain stats.
    */
  val q44AggBreadth = Q(
    "q44_agg_breadth",
    (s, dir) => {
      import s.implicits._
      val spend = t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg((sum($"o_totalprice".cast("decimal(14,2)")) * 100)
          .cast("long").as("spend_c"))
      val cust = t(s, dir, "customer")
        .join(spend, $"c_custkey" === $"o_custkey")
        .withColumn("ord", format_string("%020d%012d", $"spend_c", $"c_custkey"))
      cust.join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_custs"),
          max_by($"c_custkey", $"ord").as("top_cust"),
          min_by($"c_custkey", $"ord").as("bottom_cust"),
          expr("count_if(spend_c > 10000000)").as("n_big"),
          expr("bool_and(spend_c > 0)").as("all_positive"),
          expr("bool_or(spend_c > 50000000)").as("any_huge"),
          sum($"spend_c".cast("decimal(19,0)")).as("s1"),
          sum($"spend_c".cast("decimal(19,0)") * $"spend_c").as("s2"),
          count(lit(1)).cast("double").as("n"))
        .select($"n_name", $"n_custs", $"top_cust", $"bottom_cust",
          $"n_big", $"all_positive", $"any_huge",
          (($"s2".cast("double") -
            $"s1".cast("double") * $"s1".cast("double") / $"n") / $"n")
            .as("var_spend"))
        .orderBy($"n_name")
    },
    Some("""
      WITH spend AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) * 100 AS BIGINT) AS spend_c
        FROM orders GROUP BY o_custkey),
      cust AS (
        SELECT c_custkey, c_nationkey, spend_c,
               printf('%020d%012d', spend_c, c_custkey) AS ord
        FROM customer JOIN spend ON c_custkey = o_custkey)
      SELECT n_name,
             count(*) AS n_custs,
             arg_max(c_custkey, ord) AS top_cust,
             arg_min(c_custkey, ord) AS bottom_cust,
             CAST(count_if(spend_c > 10000000) AS BIGINT) AS n_big,
             bool_and(spend_c > 0) AS all_positive,
             bool_or(spend_c > 50000000) AS any_huge,
             (CAST(sum(CAST(spend_c AS DECIMAL(19,0)) * spend_c) AS DOUBLE) -
              CAST(sum(CAST(spend_c AS DECIMAL(19,0))) AS DOUBLE) *
              CAST(sum(CAST(spend_c AS DECIMAL(19,0))) AS DOUBLE) /
              CAST(count(*) AS DOUBLE)) / CAST(count(*) AS DOUBLE) AS var_spend
      FROM cust JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name
    """.trim))

  /** Multi-column IN subquery — the two-key semi join the planner must
    * NOT degrade to a single-key join plus residual filter: line items
    * restricted to "hot" (part, supplier) pairs, then re-aggregated at
    * order-year grain. Catalyst plans the pair-IN as a LeftSemi hash
    * join keyed on BOTH columns; the subquery's aggregate shrinks the
    * build side to hot-pair cardinality before the join, so at scale
    * the semi join broadcasts a filtered dimension, never the fact.
    */
  val q45MultiColIn = Q(
    "q45_multicol_in",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS n_items,
               CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
        FROM g_lineitem JOIN g_orders ON l_orderkey = o_orderkey
        WHERE (l_partkey, l_suppkey) IN (
          SELECT l_partkey, l_suppkey FROM g_lineitem
          GROUP BY l_partkey, l_suppkey
          HAVING count(*) >= 4)
        GROUP BY year(o_orderdate)
        ORDER BY yr
      """)
    },
    Some("""
      -- DuckDB has no row-valued IN subquery: the hot set is unique by
      -- construction (grouped), so an inner join is the exact semi join
      WITH hot AS (
        SELECT l_partkey, l_suppkey FROM lineitem
        GROUP BY l_partkey, l_suppkey
        HAVING count(*) >= 4)
      SELECT year(o_orderdate) AS yr, count(*) AS n_items,
             CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN hot USING (l_partkey, l_suppkey)
      GROUP BY year(o_orderdate)
      ORDER BY yr
    """.trim))

  /** Disjunctive EXISTS — `EXISTS(...) OR EXISTS(...)` cannot be two
    * semi joins (a semi join FILTERS; OR needs both outcomes), so
    * Catalyst plans each subquery as an ExistenceJoin that materializes
    * a boolean column and filters on the disjunction afterwards — the
    * planner shape this query exists to cover. Both existence probes
    * stay hash joins with their filters pushed to the orders scans.
    */
  val q46DisjunctiveExists = Q(
    "q46_disjunctive_exists",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT c_custkey, c_mktsegment
        FROM g_customer c
        WHERE EXISTS (SELECT 1 FROM g_orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
           OR EXISTS (SELECT 1 FROM g_orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderpriority = '1-URGENT'
                        AND year(o2.o_orderdate) = 1995)
        ORDER BY c_custkey
      """)
    },
    Some("""
      SELECT c_custkey, c_mktsegment
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
         OR EXISTS (SELECT 1 FROM orders o2
                    WHERE o2.o_custkey = c.c_custkey
                      AND o2.o_orderpriority = '1-URGENT'
                      AND year(o2.o_orderdate) = 1995)
      ORDER BY c_custkey
    """.trim))

  /** Runtime bloom-filter semi-join reduction — the optimizer surface
    * that matters most for big shuffle joins at 100 TB: a selective
    * filter on the small (creation) side is turned into a bloom filter
    * that prunes the large (application) side's rows BEFORE the shuffle,
    * so lineitem rows for non-qualifying orders never cross the network.
    * Spark's InjectRuntimeFilter only fires past size thresholds tuned
    * for real clusters (10 GB application-side scan), so the query runs
    * in a forked session (`newSession`: shared catalog/context, private
    * SQLConf) with the thresholds lowered and broadcast disabled — the
    * exact conf shape a 100 TB deployment uses, where neither side
    * broadcasts. Plan pinned in PlanGuardSpec: the lineitem scan must
    * carry `bloom_filter_might_contain` and the join stays a shuffle
    * hash/merge join.
    */
  val q47BloomFilterJoin = Q(
    "q47_bloom_filter_join",
    (s, dir) => {
      val s2 = s.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      import s2.implicits._
      val ord = t(s2, dir, "orders")
        .filter($"o_orderdate" >= "1995-01-01" && $"o_orderdate" < "1995-04-01")
      t(s2, dir, "lineitem")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """.trim))

  /** Statistical aggregates (corr, regression slope/intercept, R²)
    * computed EXACTLY across engines: both sides accumulate integer
    * moments (quantity units, price cents) in decimals — order-
    * independent, no IEEE drift — then derive the statistics with an
    * IDENTICAL final double expression tree, so even corr's
    * divide/sqrt chain hashes bit-equal. The built-in `corr`/`regr_*`
    * aggregates stream IEEE doubles in partition order and can't be
    * hash-compared across engines; the moment formulation is also the
    * RIGHT 100 TB shape — one partial-aggregable pass, no second scan.
    */
  val q48StatAggs = Q(
    "q48_stat_aggs",
    (s, dir) => {
      import s.implicits._
      val base = t(s, dir, "lineitem")
        .select($"l_returnflag",
          $"l_quantity".cast("long").as("x"),
          ($"l_extendedprice".cast("decimal(14,2)") * 100).cast("long").as("y"))
      base.groupBy($"l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"),
          sum($"x".cast("decimal(19,0)")).cast("double").as("sx"),
          sum($"y".cast("decimal(19,0)")).cast("double").as("sy"),
          sum(($"x" * $"x").cast("decimal(19,0)")).cast("double").as("sxx"),
          sum($"y".cast("decimal(19,0)") * $"y").cast("double").as("syy"),
          sum(($"x" * $"y").cast("decimal(19,0)")).cast("double").as("sxy"))
        .withColumn("covar", ($"sxy" - $"sx" * $"sy" / $"n") / $"n")
        .withColumn("varx", ($"sxx" - $"sx" * $"sx" / $"n") / $"n")
        .withColumn("vary", ($"syy" - $"sy" * $"sy" / $"n") / $"n")
        .withColumn("corr_qty_price", $"covar" / sqrt($"varx" * $"vary"))
        .withColumn("slope_cents_per_unit", $"covar" / $"varx")
        .select($"l_returnflag", $"n".cast("long").as("n_rows"),
          $"corr_qty_price", $"slope_cents_per_unit",
          ($"sy" / $"n" - $"slope_cents_per_unit" * ($"sx" / $"n"))
            .as("intercept_cents"),
          ($"corr_qty_price" * $"corr_qty_price").as("r2"))
        .orderBy($"l_returnflag")
    },
    Some("""
      WITH b AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
                        CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS y
                 FROM lineitem),
      a AS (SELECT l_returnflag,
                   CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sx,
                   CAST(sum(CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS sy,
                   CAST(sum(CAST(x * x AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
                   CAST(sum(CAST(y AS DECIMAL(19,0)) * y) AS DOUBLE) AS syy,
                   CAST(sum(CAST(x * y AS DECIMAL(19,0))) AS DOUBLE) AS sxy
            FROM b GROUP BY 1),
      c AS (SELECT l_returnflag, n, sx, sy,
                   (sxy - sx * sy / n) / n AS covar,
                   (sxx - sx * sx / n) / n AS varx,
                   (syy - sy * sy / n) / n AS vary
            FROM a),
      d AS (SELECT l_returnflag, n, sx, sy, covar, varx,
                   covar / sqrt(varx * vary) AS corr_qty_price
            FROM c)
      SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
             corr_qty_price,
             covar / varx AS slope_cents_per_unit,
             sy / n - (covar / varx) * (sx / n) AS intercept_cents,
             corr_qty_price * corr_qty_price AS r2
      FROM d
      ORDER BY l_returnflag
    """.trim))

  /** Linear time-series interpolation over a month spine: per-status
    * monthly revenue with every idx%5==2 month dropped, rebuilt on the
    * full [min,max] month grid and interior gaps filled by linear
    * interpolation between the bracketing known points —
    * prev + (next−prev)·(i−pi)/(ni−pi), evaluated as the IDENTICAL
    * IEEE double expression tree on both engines (the q48 discipline);
    * values are integer cents so every operand before the final double
    * math is exact. Boundary gaps (before the first / after the last
    * known point) stay null, distinguishing interpolation from
    * extrapolation. Scale shape: ONE exchange on the series key serves
    * both direction windows (forward last/backward first IGNORE NULLS
    * carry value AND position); the spine explode is narrow; the
    * [lo,hi] bounds are a two-value control read (the q33 pattern —
    * recomputing them per-row would re-scan the series).
    */
  val q50Interpolate = Q(
    "q50_interpolate",
    (s, dir) => {
      import s.implicits._
      val series = t(s, dir, "orders")
        .select($"o_orderstatus".as("k"),
          ((year($"o_orderdate") - 1995) * 12 + month($"o_orderdate") - 1)
            .cast("int").as("idx"),
          ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long").as("cents"))
        .filter($"idx" % 5 =!= 2)
        .groupBy($"k", $"idx").agg(sum($"cents").as("v"))
      val Seq(lo, hi) = {
        val r = series.agg(min($"idx"), max($"idx")).head()
        Seq(r.getInt(0), r.getInt(1))
      }
      val spine = series.select($"k").distinct()
        .select($"k", explode(sequence(lit(lo), lit(hi))).as("idx"))
      val wPrev = Window.partitionBy($"k").orderBy($"idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy($"k").orderBy($"idx")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val knownIdx = when($"v".isNotNull, $"idx")
      spine.join(series, Seq("k", "idx"), "left")
        .select($"k", $"idx", $"v",
          last($"v", ignoreNulls = true).over(wPrev).as("pv"),
          last(knownIdx, ignoreNulls = true).over(wPrev).as("pi"),
          first($"v", ignoreNulls = true).over(wNext).as("nv"),
          first(knownIdx, ignoreNulls = true).over(wNext).as("ni"))
        .select($"k", $"idx", $"v",
          when($"v".isNotNull, $"v".cast("double"))
            .when($"pv".isNotNull && $"nv".isNotNull,
              $"pv".cast("double") + ($"nv" - $"pv").cast("double") *
                (($"idx" - $"pi").cast("double") / ($"ni" - $"pi").cast("double")))
            .as("interp"),
          $"v".isNull.as("is_gap"))
        .orderBy($"k", $"idx")
    },
    Some("""
      WITH s AS (
        SELECT k, idx, sum(cents) AS v
        FROM (SELECT o_orderstatus AS k,
                     CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS INT) AS idx,
                     CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
              FROM orders)
        WHERE idx % 5 <> 2
        GROUP BY k, idx),
      b AS (SELECT min(idx) AS lo, max(idx) AS hi FROM s),
      spine AS (SELECT k, CAST(unnest(range(lo, hi + 1)) AS INT) AS idx
                FROM (SELECT DISTINCT k FROM s) CROSS JOIN b),
      j AS (SELECT spine.k, spine.idx, s.v FROM spine LEFT JOIN s USING (k, idx)),
      w AS (SELECT k, idx, v,
              last_value(v IGNORE NULLS) OVER wp AS pv,
              last_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER wp AS pi,
              first_value(v IGNORE NULLS) OVER wn AS nv,
              first_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER wn AS ni
            FROM j
            WINDOW wp AS (PARTITION BY k ORDER BY idx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wn AS (PARTITION BY k ORDER BY idx
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT k, idx, v,
             CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                  WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                    CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE) *
                      (CAST(idx - pi AS DOUBLE) / CAST(ni - pi AS DOUBLE))
             END AS interp,
             (v IS NULL) AS is_gap
      FROM w
      ORDER BY k, idx
    """.trim))

  /** Incremental view maintenance ([[graft.operators.Ivm]]): the
    * per-customer order-stats view refreshed by merging PARTIAL STATES —
    * the base's persisted states plus one signed delta batch (inserts of
    * new orders, retractions of a slice of old ones) — never rescanning
    * base fact rows. The oracle recomputes from scratch over the
    * surviving rows, so the green row IS the IVM correctness theorem
    * (merge ∘ partialize = recompute) on real data, including the
    * group-vanish case (a customer whose every order is retracted must
    * disappear, not linger with cnt 0). Decimal sums keep the merge
    * bit-exact across batch boundaries; the final division is the same
    * IEEE double op on both engines. Scale shape: delta cost ∝ batch,
    * merge cost ∝ view size — base fact rows are never re-read (here
    * both states come from one scan only because the demo must build
    * "persisted" state somehow).
    */
  val q49IvmMerge = Q(
    "q49_ivm_merge",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
      val cutoff = lit("1998-01-01").cast("timestamp")
      val vals = Seq("price" -> $"o_totalprice".cast("decimal(14,2)"))
      val base = orders.filter($"o_orderdate" < cutoff)
      val inserts = orders.filter($"o_orderdate" >= cutoff)
        .withColumn("__sign", lit(1L))
      val retractions = base.filter($"o_orderkey" % 97 === 0)
        .withColumn("__sign", lit(-1L))
      val baseState = Ivm.partializeSigned(base, Seq("o_custkey"), vals, lit(1L))
      val deltaState = Ivm.partializeSigned(
        inserts.unionByName(retractions), Seq("o_custkey"), vals, $"__sign")
      Ivm.merge(Seq("o_custkey"), baseState, deltaState)
        .select($"o_custkey", $"__cnt".as("n_orders"),
          $"sum_price".cast("double").as("total_price"),
          ($"sum_price".cast("double") / $"__cnt").as("avg_price"))
        .orderBy($"o_custkey")
    },
    Some("""
      WITH surv AS (
        SELECT * FROM orders
        WHERE NOT (o_orderdate < TIMESTAMP '1998-01-01' AND o_orderkey % 97 = 0))
      SELECT o_custkey, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS avg_price
      FROM surv
      GROUP BY o_custkey
      ORDER BY o_custkey
    """.trim))

  /** Aggregate pushdown to the parquet footer: COUNT/MIN/MAX answered
    * from row-group METADATA — zero data pages read, the cheapest
    * possible full-table profile at 100 TB (footer bytes ∝ files, not
    * rows). Needs the DSv2 parquet path (useV1SourceList cleared) and
    * holds only for the no-filter, no-group-by shape; anything else
    * silently falls back to a real scan — which is why PlanGuardSpec
    * pins `PushedAggregation` in the plan, the difference being a
    * footer read vs a 100 TB scan.
    */
  val q51AggPushdown = Q(
    "q51_agg_pushdown",
    (s, dir) => {
      val s2 = s.newSession()
      s2.conf.set("spark.sql.sources.useV1SourceList", "")
      s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      import s2.implicits._
      t(s2, dir, "lineitem")
        .agg(expr("count(*)").as("n_rows"),
          min($"l_orderkey").as("min_key"), max($"l_orderkey").as("max_key"),
          min($"l_quantity").as("min_qty"), max($"l_quantity").as("max_qty"))
    },
    Some("""
      SELECT count(*) AS n_rows,
             min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
             min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
      FROM lineitem
    """.trim))

  private val dppOrdersCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Dynamic partition pruning: orders re-laid-out hive-partitioned on
    * o_orderstatus (the layout a 100 TB fact table ships with), joined
    * to a tiny dim whose FILTER decides which status survives. Static
    * pruning can't help — the filter is on the dim — so Spark builds a
    * runtime subquery from the broadcast side and injects it into the
    * fact scan's PartitionFilters (PlanGuardSpec pins `dynamicpruning`
    * there): 2/3 of the fact's partition directories are never opened.
    * At warehouse scale this is the difference between scanning one
    * date/tenant slice and scanning the table, whenever the slicing
    * predicate arrives through a join instead of a literal.
    */
  val q52DynamicPruning = Q(
    "q52_dynamic_pruning",
    (s, dir) => {
      import s.implicits._
      val root = Tables.cachedTempRoot(dppOrdersCache, dir, "graft_dpp_orders") { p =>
        t(s, dir, "orders").write.partitionBy("o_orderstatus")
          .parquet(p.resolve("orders").toString)
        // the dim must be a SCANNED relation: a literal local dim
        // constant-folds its filter away and DPP's selective-predicate
        // detection never sees one
        Seq(("O", "open"), ("F", "finished"), ("P", "pending"))
          .toDF("o_orderstatus", "status_name")
          .write.parquet(p.resolve("dim").toString)
        p.toString
      }
      val fact = s.read.parquet(s"$root/orders")
      val dim = s.read.parquet(s"$root/dim")
      fact.join(broadcast(dim.filter($"status_name" === "finished")), "o_orderstatus")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast("decimal(14,2)")).cast("double").as("total"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      WITH dim(o_orderstatus, status_name) AS (
        VALUES ('O', 'open'), ('F', 'finished'), ('P', 'pending'))
      SELECT o_orderpriority, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
      FROM orders JOIN dim USING (o_orderstatus)
      WHERE status_name = 'finished'
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """.trim))

  /** Error-tolerant ingestion semantics: `try_cast` / `try_divide`
    * turn malformed values and zero divisors into NULLs instead of
    * task-killing exceptions — at 100 TB a single dirty record must
    * not fail a stage, and ANSI mode (Spark 4's default) makes the
    * non-try forms throw. A third of the synthesized raw column parses
    * (integer-cent strings — exact roundtrip, double→string formatting
    * differs across engines), a third is 'N/A', a third empty; the
    * per-row parse outcome and the null-safe ratio are both oracle
    * rows.
    */
  val q53TryIngest = Q(
    "q53_try_ingest",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .select($"c_custkey",
          when($"c_custkey" % 3 === 0,
            ($"c_acctbal".cast("decimal(12,2)") * 100).cast("long").cast("string"))
            .when($"c_custkey" % 3 === 1, lit("N/A"))
            .otherwise(lit("")).as("raw"))
        .select($"c_custkey", $"raw",
          expr("try_cast(raw AS BIGINT)").as("cents"),
          expr("try_divide(CAST(100 AS DOUBLE), CAST(c_custkey % 5 AS DOUBLE))").as("ratio"))
        .select($"c_custkey", $"raw", $"cents", $"ratio",
          $"cents".isNotNull.as("parsed_ok"))
        .orderBy($"c_custkey")
    },
    Some("""
      WITH r AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 3 = 0
                      THEN CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS VARCHAR)
                    WHEN c_custkey % 3 = 1 THEN 'N/A'
                    ELSE '' END AS raw
        FROM customer)
      SELECT c_custkey, raw,
             TRY_CAST(raw AS BIGINT) AS cents,
             CAST(100 AS DOUBLE) / nullif(CAST(c_custkey % 5 AS DOUBLE), 0) AS ratio,
             (TRY_CAST(raw AS BIGINT) IS NOT NULL) AS parsed_ok
      FROM r
      ORDER BY c_custkey
    """.trim))

  /** Windowed DISTINCT count — a classic engine gap: Spark rejects
    * COUNT(DISTINCT) OVER, so the idiom is `size(collect_set(...))`
    * over the frame (DuckDB supports the native form, which is the
    * oracle). Trailing-5-orders frame per customer, counting distinct
    * priorities — the "how varied was recent behavior" feature shape.
    * Scale note: collect_set materializes the frame's distinct set per
    * row, fine for bounded frames (5 here); an unbounded-preceding
    * frame should use the dense_rank running-distinct trick instead.
    */
  val q54WindowedDistinct = Q(
    "q54_windowed_distinct",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey").rowsBetween(-4, 0)
      t(s, dir, "orders")
        .filter($"o_custkey" % 20 === 0)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate",
          size(collect_set($"o_orderpriority").over(w)).cast("long")
            .as("distinct_prio_5"))
        .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(count(DISTINCT o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS distinct_prio_5
      FROM orders
      WHERE o_custkey % 20 = 0
      ORDER BY o_custkey, o_orderdate, o_orderkey
    """.trim))

  /** Z-order (Morton) clustering key over (l_partkey, l_suppkey) — the
    * multi-dimensional layout key a warehouse sorts by so parquet
    * row-group stats stay tight on BOTH dimensions (see
    * operators.ZOrder; ZOrderSpec measures the row groups a box
    * predicate decodes under z-ordered vs single-column layout). The
    * oracle pins the bit-spreading exactly: pure integer ops, no
    * engine-specific hashing.
    */
  val q55ZOrderKey = Q(
    "q55_zorder_key",
    (s, dir) => {
      import s.implicits._
      import graft.operators.ZOrder
      t(s, dir, "lineitem")
        .filter($"l_orderkey" % 10 === 0)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
          ZOrder.interleave16($"l_partkey" % 65536, $"l_suppkey" % 65536)
            .as("zkey"))
        .orderBy($"zkey", $"l_orderkey", $"l_linenumber")
    },
    Some(s"""
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             ${graft.operators.ZOrder.interleaveSql(
               "(l_partkey % 65536)", "(l_suppkey % 65536)")} AS zkey
      FROM lineitem
      WHERE l_orderkey % 10 = 0
      ORDER BY zkey, l_orderkey, l_linenumber
    """.trim))

  /** Ordered string aggregation (LISTAGG, SQL:2016) — the report-shaping
    * face: per region, the comma-joined ordered nation list plus the
    * DISTINCT-deduped initial letters. WITHIN GROUP (ORDER BY …) makes
    * the concatenation deterministic — an unordered listagg is a
    * partition-order lottery and would never match an oracle. Scale
    * note: listagg materializes each group as ONE string, so it belongs
    * on bounded-cardinality groups (dimension rollups like this); an
    * unbounded group turns into a driver-sized string — use
    * collect_list only behind a windowed cap, or keep rows relational.
    */
  val q56Listagg = Q(
    "q56_listagg",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "nation")
        .join(t(s, dir, "region"), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(
          expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
            .as("nations"),
          expr("listagg(DISTINCT substring(n_name, 1, 1), '')" +
            " WITHIN GROUP (ORDER BY substring(n_name, 1, 1))").as("initials"),
          count(lit(1)).as("n_nations"))
        .orderBy($"r_name")
    },
    Some("""
      SELECT r_name,
             string_agg(n_name, ',' ORDER BY n_name) AS nations,
             string_agg(DISTINCT n_name[1:1], '' ORDER BY n_name[1:1]) AS initials,
             count(*) AS n_nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name
    """.trim))

  /** Key-skew profiler — the diagnostic that DECIDES when q24's salting
    * / AQE skew handling is needed: exact distribution statistics of
    * per-key row counts (here l_suppkey over lineitem). Scale shape is
    * counts-of-counts: pass 1 groups the fact table by key (the only
    * data-sized shuffle), pass 2 groups the key-count frame by count
    * value — the (count, n_keys) frame is tiny (counts concentrate), so
    * the ranking window that computes exact quantiles and the Gini sum
    * runs over hundreds of rows, never over the corpus or even the key
    * set. All stats are exact integers; the Gini coefficient and top-1
    * share are the same IEEE expression tree on both engines. Keys with
    * equal counts are interchangeable in every emitted statistic, so no
    * per-key tie-break is needed anywhere.
    */
  val q57SkewProfile = Q(
    "q57_skew_profile",
    (s, dir) => {
      import s.implicits._
      val counts = t(s, dir, "lineitem")
        .groupBy($"l_suppkey").agg(count(lit(1)).as("c"))
      // counts-of-counts: f = how many keys have exactly c rows
      val cc = counts.groupBy($"c").agg(count(lit(1)).as("f"))
      val w = Window.orderBy($"c")
        .rowsBetween(Window.unboundedPreceding, 0)
      val ranked = cc
        .withColumn("cum_keys", sum($"f").over(w))
        .withColumn("nk", sum($"f").over(Window.partitionBy()))
        // ranks of the f keys in this count-group are
        // (cum_keys-f+1)..cum_keys; their Gini contribution is
        // c * (sum of those ranks) = c * (f*cum_keys - f*(f-1)/2)
        .withColumn("rank_sum",
          expr("c * (f * cum_keys - (f * (f - 1)) div 2)"))
      ranked.agg(
          sum($"f").as("n_keys"),
          sum($"c" * $"f").as("total_rows"),
          max($"c").as("max_count"),
          min($"c").as("min_count"),
          sum($"rank_sum").as("gini_rank_sum"),
          min(when($"cum_keys" * 2 >= $"nk", $"c")).as("p50_count"),
          min(when($"cum_keys" * 100 >= $"nk" * 99, $"c")).as("p99_count"))
        .select($"n_keys", $"total_rows", $"max_count", $"min_count",
          $"p50_count", $"p99_count",
          ($"max_count".cast("double") / $"total_rows".cast("double") * 10000.0)
            .as("top1_share_bp"),
          ((lit(2.0) * $"gini_rank_sum".cast("double") -
            ($"n_keys" + 1).cast("double") * $"total_rows".cast("double")) /
            ($"n_keys".cast("double") * $"total_rows".cast("double"))).as("gini"))
    },
    Some("""
      WITH kc AS (SELECT l_suppkey, count(*) AS c FROM lineitem GROUP BY 1),
      cc AS (SELECT c, count(*) AS f FROM kc GROUP BY 1),
      r AS (SELECT c, f,
              sum(f) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_keys,
              sum(f) OVER () AS nk
            FROM cc),
      g AS (SELECT c, f, cum_keys, nk,
              c * (f * cum_keys - (f * (f - 1)) // 2) AS rank_sum
            FROM r)
      SELECT CAST(sum(f) AS BIGINT) AS n_keys,
             CAST(sum(c * f) AS BIGINT) AS total_rows,
             max(c) AS max_count,
             min(c) AS min_count,
             min(CASE WHEN cum_keys * 2 >= nk THEN c END) AS p50_count,
             min(CASE WHEN cum_keys * 100 >= nk * 99 THEN c END) AS p99_count,
             CAST(max(c) AS DOUBLE) / CAST(sum(c * f) AS DOUBLE) * 10000.0 AS top1_share_bp,
             (2.0 * CAST(sum(rank_sum) AS DOUBLE)
               - CAST(sum(f) + 1 AS DOUBLE) * CAST(sum(c * f) AS DOUBLE))
               / (CAST(sum(f) AS DOUBLE) * CAST(sum(c * f) AS DOUBLE)) AS gini
      FROM g
    """.trim))

  /** Schema-drift-tolerant union: two snapshots whose schemas diverged
    * (one gained a column, one kept an old one) unioned BY NAME with
    * missing columns null-filled — `unionByName(allowMissingColumns)`,
    * the read-side half of schema evolution (the write side is
    * `Catalog.appendLog(evolveSchema = true)`). Positional UNION here
    * is silent data corruption (columns shift); by-name is the only
    * correct way to fold heterogeneous file vintages. Narrow: two
    * scans, a null-fill projection each, zero shuffles before the
    * ordering.
    */
  val q58UnionEvolve = Q(
    "q58_union_evolve",
    (s, dir) => {
      import s.implicits._
      val v1 = t(s, dir, "orders").filter($"o_orderkey" % 7 === 0)
        .select($"o_orderkey", $"o_orderstatus",
          $"o_totalprice".cast("decimal(12,2)").cast("double").as("total"))
      val v2 = t(s, dir, "orders").filter($"o_orderkey" % 7 === 1)
        .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority")
      v1.withColumn("vintage", lit(1))
        .unionByName(v2.withColumn("vintage", lit(2)),
          allowMissingColumns = true)
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total,
             1 AS vintage, NULL AS o_orderpriority
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus, NULL, 2, o_orderpriority
      FROM orders WHERE o_orderkey % 7 = 1
      ORDER BY o_orderkey
    """.trim))

  /** Hierarchical share-of-parent — the drill-down report shape:
    * monthly revenue with each month's share of its year and each
    * year's share of the grand total. One fact-table aggregate to the
    * (year, month) rollup; every share window then runs on that
    * ~dozens-of-rows frame (the single-partition window is bounded by
    * the rollup cardinality, the q57 counts-of-counts argument).
    * Revenue is decimal-exact cents; shares are identical IEEE
    * divisions of exact longs on both engines.
    */
  val q59ShareOfParent = Q(
    "q59_share_of_parent",
    (s, dir) => {
      import s.implicits._
      val wYear = Window.partitionBy($"y")
      val wAll = Window.partitionBy()
      t(s, dir, "orders")
        .groupBy(year($"o_orderdate").cast("long").as("y"),
          month($"o_orderdate").cast("long").as("m"))
        .agg(sum(($"o_totalprice".cast("decimal(12,2)") * 100).cast("long"))
          .as("cents"))
        .withColumn("year_cents", sum($"cents").over(wYear))
        .withColumn("total_cents", sum($"cents").over(wAll))
        .select($"y", $"m",
          ($"cents".cast("double") / 100.0).as("revenue"),
          ($"cents".cast("double") / $"year_cents".cast("double"))
            .as("share_of_year"),
          ($"year_cents".cast("double") / $"total_cents".cast("double"))
            .as("year_share_of_total"))
        .orderBy($"y", $"m")
    },
    Some("""
      WITH ym AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(month(o_orderdate) AS BIGINT) AS m,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        GROUP BY 1, 2),
      w AS (SELECT y, m, cents,
              sum(cents) OVER (PARTITION BY y) AS year_cents,
              sum(cents) OVER () AS total_cents
            FROM ym)
      SELECT y, m,
             CAST(cents AS DOUBLE) / 100.0 AS revenue,
             CAST(cents AS DOUBLE) / CAST(year_cents AS DOUBLE) AS share_of_year,
             CAST(year_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) AS year_share_of_total
      FROM w
      ORDER BY y, m
    """.trim))

  /** Ranking-function breadth — the four window ranks q08/q38 don't
    * cover: ntile (quartile bucketing), percent_rank, cume_dist, and
    * nth_value over an explicit full-partition frame (its default
    * running frame returns NULL until row n — a classic trap). The
    * ORDER BY key is (acctbal, custkey) — unique, so the tie-sensitive
    * rank functions are deterministic and engine-identical.
    */
  val q60RankBreadth = Q(
    "q60_rank_breadth",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey")
        .orderBy($"c_acctbal", $"c_custkey")
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "customer")
        .filter($"c_custkey" % 5 === 0)
        .select($"c_nationkey", $"c_custkey", $"c_acctbal",
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          nth_value($"c_custkey", 3).over(wFull).as("third_key"))
        .orderBy($"c_nationkey", $"c_custkey")
    },
    Some("""
      SELECT c_nationkey, c_custkey, c_acctbal,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd,
             nth_value(c_custkey, 3) OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_key
      FROM customer
      WHERE c_custkey % 5 = 0
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      ORDER BY c_nationkey, c_custkey
    """.trim))

  /** TPC-H Q11 shape — global-share HAVING: keep the groups whose
    * aggregate exceeds a scalar fraction of the GRAND total (here 1.4×
    * the mean part value, which unlike Q11's fixed 0.0001/SF fraction
    * is scale-invariant: a part's share of the mean doesn't drift with
    * corpus size). The scalar (total, #parts) is a fully-aggregated
    * 1-row collect — control-plane, the t12/t22 pattern — computed in
    * ONE lineitem pass; a constant-key join would constant-fold to
    * BroadcastNestedLoopJoin and an empty-partition window would drag
    * all |parts| rows (20B at warehouse SF) to one task.
    *
    * Exactness: per-part value is an integer cents·qty sum; the HAVING
    * compare runs in decimal(38,0) integer space on BOTH engines —
    * value_cents·5·np > 7·tot is exact where a double fraction of the
    * grand total could flip a borderline part. Long arithmetic alone
    * would overflow at warehouse scale (value·np·5 ≈ 3e20 at SF 100k),
    * hence the decimal widening before the multiply.
    */
  val q61ValueShareHaving = Q(
    "q61_value_share_having",
    (s, dir) => {
      import s.implicits._
      val cents = ($"l_extendedprice".cast("decimal(12,2)") * 100)
        .cast("long") * $"l_quantity".cast("long")
      val g = t(s, dir, "lineitem")
        .agg(sum(cents).as("tot"), countDistinct($"l_partkey").as("np")).head()
      val np5 = lit(new java.math.BigDecimal(
        java.math.BigInteger.valueOf(g.getLong(1)).multiply(
          java.math.BigInteger.valueOf(5L))))
      val tot7 = lit(new java.math.BigDecimal(
        java.math.BigInteger.valueOf(g.getLong(0)).multiply(
          java.math.BigInteger.valueOf(7L))))
      t(s, dir, "lineitem")
        .groupBy($"l_partkey")
        .agg(sum(cents).as("value_cents"))
        .filter($"value_cents".cast("decimal(19,0)") * np5 > tot7)
        .select($"l_partkey",
          ($"value_cents".cast("double") / 100.0).as("value"))
        .orderBy($"value".desc, $"l_partkey")
    },
    Some("""
      WITH pv AS (
        SELECT l_partkey,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_cents
        FROM lineitem GROUP BY 1),
      g AS (SELECT CAST(sum(value_cents) AS BIGINT) AS tot,
                   count(*) AS np FROM pv)
      SELECT l_partkey, CAST(value_cents AS DOUBLE) / 100.0 AS value
      FROM pv, g
      WHERE CAST(value_cents AS DECIMAL(19,0)) * (5 * np) > CAST(7 AS DECIMAL(19,0)) * tot
      ORDER BY value DESC, l_partkey
    """.trim))

  /** TPC-H Q15 shape — max-of-view: a revenue view per supplier over a
    * shipping quarter, then the supplier(s) achieving the view's MAX.
    * The max is a 1-row full aggregate collected to a literal (again
    * the t12/t22 pattern: the classic scalar-subquery plan re-reads the
    * view; Spark's equivalent constant-key join constant-folds to
    * BNLJ). The equality filter runs on the EXACT decimal(18,4) sums —
    * revenue ties are found exactly, both engines — and only the final
    * output casts to double. The supplier join broadcasts the ≤handful
    * of max-revenue rows into the dimension, never the reverse.
    */
  val q62TopSupplier = Q(
    "q62_top_supplier",
    (s, dir) => {
      import s.implicits._
      val revenue = t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1995-04-01").cast("timestamp"))
        .groupBy($"l_suppkey".as("supplier_no"))
        .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .cast("decimal(18,4)")).as("rev"))
      val maxRev = revenue.agg(max($"rev")).head().getDecimal(0)
      t(s, dir, "supplier")
        .join(broadcast(revenue.filter($"rev" === lit(maxRev))),
          $"s_suppkey" === $"supplier_no")
        .select($"s_suppkey", $"s_name",
          $"rev".cast("double").as("total_revenue"))
        .orderBy($"s_suppkey")
    },
    Some("""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
        GROUP BY 1)
      SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE rev = (SELECT max(rev) FROM revenue)
      ORDER BY s_suppkey
    """.trim))

  /** TPC-H Q21 shape — EXISTS + NOT-EXISTS self-joins: suppliers who
    * were the SOLE flagged supplier in a multi-supplier finished order
    * (the fixture has no receipt/commit dates, so "at fault" is
    * l_returnflag='R' — the join topology, not the predicate, is the
    * shape under test). Physical plan: the flagged scan semi-joins
    * lineitem on l_orderkey (EXISTS another supplier's line), then
    * anti-joins the flagged subset (NOT EXISTS another flagged
    * supplier) — both shuffle on the same l_orderkey key and AQE reuses
    * the probe exchange; supplier and nation broadcast. Self-join
    * conditions carry the suppkey inequality INSIDE the join condition,
    * so no post-join filter materializes the n² order-pair frame.
    */
  val q63SoleBlame = Q(
    "q63_sole_blame",
    (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
      val flagged = li.filter($"l_returnflag" === "R")
      val l1 = flagged
        .join(broadcast(t(s, dir, "orders")
            .filter($"o_orderstatus" === "F").select($"o_orderkey")),
          $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_suppkey")
      val other = li.select($"l_orderkey".as("o2"), $"l_suppkey".as("s2"))
      val otherFlagged = flagged.select($"l_orderkey".as("o3"), $"l_suppkey".as("s3"))
      val sole = l1
        .join(other, $"l_orderkey" === $"o2" && $"l_suppkey" =!= $"s2", "left_semi")
        .join(otherFlagged, $"l_orderkey" === $"o3" && $"l_suppkey" =!= $"s3", "left_anti")
      sole
        .join(broadcast(t(s, dir, "supplier")), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name", $"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
    },
    Some("""
      SELECT n_name, s_name, count(*) AS numwait
      FROM supplier, lineitem l1, orders, nation
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
        AND s_nationkey = n_nationkey
      GROUP BY n_name, s_name
      ORDER BY numwait DESC, s_name
    """.trim))

  /** LATERAL dependent join — "top-2 orders per customer" phrased as a
    * per-row correlated subquery with ORDER BY + LIMIT, the SQL shape
    * analysts reach for before they know window functions. Spark 4
    * DECORRELATES the dependent LIMIT into a single partitioned top-k
    * (WindowGroupLimit: the rank filter runs map-side BEFORE the
    * window shuffle), so the "run a subquery per customer" surface
    * costs one exchange on o_custkey at any scale — never N probe
    * queries, never a per-row nested loop. Same physical plan family
    * as t37's explicit window top-k; this row pins the LATERAL
    * *syntax* lowering to it.
    */
  val q64LateralTopK = Q(
    "q64_lateral_topk",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
        FROM g_customer c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM g_orders o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) t
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey
      """)
    },
    Some("""
      SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
      FROM customer c,
           LATERAL (SELECT o_orderkey, o_totalprice
                    FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                    ORDER BY o_totalprice DESC, o_orderkey
                    LIMIT 2) t
      ORDER BY c_custkey, o_totalprice DESC, o_orderkey
    """.trim))

  /** Data-quality expectation gate (the deequ/dbt-test shape): a
    * declarative check suite — completeness, uniqueness, accepted
    * values, range, freshness, referential integrity — evaluated as
    * ONE profile aggregate over the fact table plus ONE anti-join for
    * RI, emitting a (check_name, metric, passed) report row per check.
    * This is the gate a training-data pipeline runs before a corpus
    * snapshot is promoted. Scale shape: the profile pass is a single
    * map-side-combined aggregate (count DISTINCT is the only expand);
    * RI is one shuffled anti join; output is O(checks), so gating
    * 100 TB costs two scans and nothing driver-side. All metrics are
    * exact longs (or ratios of identical longs), so the report —
    * booleans included — hash-matches cross-engine.
    */
  val q65DqGate = Q(
    "q65_dq_gate",
    (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val prof = o.agg(
        count(lit(1)).as("n"),
        count($"o_custkey").as("nn_ck"),
        countDistinct($"o_orderkey").as("nd_ok"),
        sum(when($"o_orderstatus".isin("O", "F", "P"), 0L).otherwise(1L))
          .as("bad_status"),
        sum(when($"o_totalprice" <= 0.0, 1L).otherwise(0L)).as("bad_price"),
        datediff(lit("1999-01-01").cast("date"), max($"o_orderdate").cast("date"))
          .as("staleness"))
      val checks = prof.select(expr(
        """stack(6,
           'accepted_values_o_orderstatus', cast(bad_status as double), bad_status = 0,
           'completeness_o_custkey', cast(nn_ck as double) / n, nn_ck = n,
           'freshness_o_orderdate_days', cast(staleness as double), staleness <= 400,
           'non_negative_o_totalprice', cast(bad_price as double), bad_price = 0,
           'row_count', cast(n as double), n > 0,
           'uniqueness_o_orderkey', cast(nd_ok as double) / n, nd_ok = n
           ) as (check_name, metric, passed)"""))
      val ri = o.join(c, $"o_custkey" === $"c_custkey", "left_anti")
        .agg(count(lit(1)).as("viol"))
        .select(lit("referential_integrity_o_custkey").as("check_name"),
          $"viol".cast("double").as("metric"), ($"viol" === 0L).as("passed"))
      checks.unionByName(ri).orderBy($"check_name")
    },
    Some("""
      WITH prof AS (
        SELECT count(*) AS n,
               count(o_custkey) AS nn_ck,
               count(DISTINCT o_orderkey) AS nd_ok,
               sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS bad_status,
               sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS bad_price,
               date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '1999-01-01') AS staleness
        FROM orders),
      ri AS (SELECT count(*) AS viol FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      SELECT * FROM (
        SELECT 'accepted_values_o_orderstatus' AS check_name,
               CAST(bad_status AS DOUBLE) AS metric, bad_status = 0 AS passed FROM prof
        UNION ALL SELECT 'completeness_o_custkey', CAST(nn_ck AS DOUBLE) / n, nn_ck = n FROM prof
        UNION ALL SELECT 'freshness_o_orderdate_days', CAST(staleness AS DOUBLE), staleness <= 400 FROM prof
        UNION ALL SELECT 'non_negative_o_totalprice', CAST(bad_price AS DOUBLE), bad_price = 0 FROM prof
        UNION ALL SELECT 'row_count', CAST(n AS DOUBLE), n > 0 FROM prof
        UNION ALL SELECT 'referential_integrity_o_custkey', CAST(viol AS DOUBLE), viol = 0 FROM ri
        UNION ALL SELECT 'uniqueness_o_orderkey', CAST(nd_ok AS DOUBLE) / n, nd_ok = n FROM prof)
      ORDER BY check_name
    """.trim))

  private val xmlRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def xmlSupplier(s: SparkSession, dir: String): String =
    Tables.cachedTempRoot(xmlRoots, dir, "graft_xml") { p =>
      val out = s"$p/supplier_xml"
      t(s, dir, "supplier").write.mode("overwrite")
        .option("rowTag", "supplier").format("xml").save(out)
      out
    }

  /** XML source + sink — built into Spark 4 (the former spark-xml
    * connector), the fifth landing format after parquet/ORC/CSV/JSON
    * and the one B2B/EDI feeds still arrive in. supplier written once
    * as element-per-row XML and read back with an EXPLICIT schema
    * (XML inference is an extra full pass and element-order
    * sensitive), then aggregated per nation; the oracle aggregates the
    * original parquet, so any roundtrip loss — doubles, element
    * nesting, nulls — hash-fails. Doubles survive because the XML
    * writer emits shortest-round-trip representations like the
    * CSV/JSON writers.
    */
  val q66XmlRoundtrip = Q(
    "q66_xml_roundtrip",
    (s, dir) => {
      import s.implicits._
      s.read
        .schema("s_suppkey bigint, s_name string, s_nationkey int, " +
          "s_acctbal double")
        .option("rowTag", "supplier")
        .format("xml").load(xmlSupplier(s, dir))
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n"),
          sum($"s_acctbal".cast("decimal(14,2)")).cast("double").as("total_bal"))
        .orderBy($"s_nationkey")
    },
    Some("""
      SELECT s_nationkey, count(*) AS n,
             CAST(sum(CAST(s_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS total_bal
      FROM supplier
      GROUP BY s_nationkey
      ORDER BY s_nationkey
    """.trim))

  /** Order-insensitive reconciliation checksum
    * (functions.Reconcile — digest/monoid details and the 100 TB cost
    * argument live on that object; ReconcileSpec pins the monoid,
    * invariance, and sensitivity properties on arbitrary frames).
    * Variants pin both directions: `roundtrip` re-computes over a
    * deliberately re-ordered copy (split + re-union) and must MATCH;
    * `mutated` perturbs every row by one cent and must MISMATCH.
    */
  val q67ReconcileChecksum = Q(
    "q67_reconcile_checksum",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      import graft.functions.Reconcile
      val orders = t(s, dir, "orders")
      def canonical(cents: Column): Column = concat_ws("|",
        $"o_orderkey".cast("string"), $"o_custkey".cast("string"),
        $"o_orderstatus", $"o_orderpriority", cents.cast("string"),
        (year($"o_orderdate") * 10000 + month($"o_orderdate") * 100 +
          dayofmonth($"o_orderdate")).cast("long").cast("string"))
      val cents = ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long")
      def checksum(df: DataFrame, label: String, c: Column): DataFrame =
        df.agg(Reconcile.checksumAgg(canonical(c)).as("checksum"))
          .select(lit(label).as("variant"), $"checksum")
      val reordered = orders.filter($"o_orderkey" % 2 === 0)
        .unionByName(orders.filter($"o_orderkey" % 2 =!= 0))
      checksum(orders, "base", cents)
        .unionByName(checksum(orders, "mutated", cents + 1))
        .unionByName(checksum(reordered, "roundtrip", cents))
        .withColumn("matches_base",
          $"checksum" === max(when($"variant" === "base", $"checksum"))
            .over(Window.partitionBy()))
        .orderBy($"variant")
    },
    Some {
      val hex15 = (1 to 15).map { i =>
        val w = math.pow(16, 15 - i).toLong
        s"(strpos('0123456789abcdef', m[$i:$i]) - 1) * $w"
      }.mkString(" + ")
      val hex15b = (1 to 15).map { i =>
        val w = math.pow(16, 15 - i).toLong
        s"(strpos('0123456789abcdef', m2[$i:$i]) - 1) * $w"
      }.mkString(" + ")
      s"""
      WITH o AS (SELECT CAST(o_orderkey AS VARCHAR) AS k, CAST(o_custkey AS VARCHAR) AS c,
                        o_orderstatus AS st, o_orderpriority AS pr,
                        CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents,
                        CAST(year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate) AS VARCHAR) AS ymd
                 FROM orders),
      d AS (SELECT md5(concat_ws('|', k, c, st, pr, CAST(cents AS VARCHAR), ymd)) AS m,
                   md5(concat_ws('|', k, c, st, pr, CAST(cents + 1 AS VARCHAR), ymd)) AS m2
            FROM o),
      g AS (SELECT CAST(($hex15) % 2147483647 AS BIGINT) AS dg,
                   CAST(($hex15b) % 2147483647 AS BIGINT) AS dg2
            FROM d),
      cs AS (SELECT CAST(CAST(sum(dg) AS HUGEINT) % 2147483647 AS BIGINT) AS base_ck,
                    CAST(CAST(sum(dg2) AS HUGEINT) % 2147483647 AS BIGINT) AS mut_ck
             FROM g)
      SELECT 'base' AS variant, base_ck AS checksum, true AS matches_base FROM cs
      UNION ALL
      SELECT 'mutated', mut_ck, mut_ck = base_ck FROM cs
      UNION ALL
      SELECT 'roundtrip', base_ck, true FROM cs
      ORDER BY variant
      """.trim
    })

  /** TPC-H Q13 shape — order-count distribution: a LEFT OUTER join
    * whose ON clause carries a selective predicate on the inner side
    * (customers keep their row even when every order is filtered
    * away), a per-customer count, then a second aggregate OVER the
    * counts — the "distribution of a distribution" double aggregation.
    * Scale: the outer join and the first groupBy share the c_custkey
    * hash partitioning, so the per-customer count adds NO exchange
    * over the join's; the second aggregate moves only
    * distinct-count-cardinality rows. count(o_orderkey) (non-null
    * counting) is what makes the never-ordered customer land in the
    * c_count=0 bucket — count(*) would be an off-by-one on exactly
    * the rows the outer join exists to keep.
    */
  val q68OrderCountDist = Q(
    "q68_order_count_dist",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter($"o_orderpriority" =!= "1-URGENT"),
          $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count").agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    },
    Some("""
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey) c
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC
    """.trim))

  /** TPC-H Q18 shape — large-volume customers: a semi join against a
    * HAVING aggregate (orders whose total quantity exceeds the
    * threshold), then the fact re-joined to aggregate the SAME measure
    * per surviving order. Scale: the HAVING side is one partial-
    * aggregated shuffle on l_orderkey; the semi join keeps orders
    * narrow before customer/lineitem attach; the final top-100 is a
    * TakeOrderedAndProject, never a global sort.
    */
  val q69LargeOrders = Q(
    "q69_large_orders",
    (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val big = li.groupBy($"l_orderkey")
        .agg(sum($"l_quantity".cast("decimal(12,2)")).as("qty"))
        .filter($"qty" > 150).select($"l_orderkey")
      t(s, dir, "orders")
        .join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
        .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(li, $"o_orderkey" === $"l_orderkey")
        .groupBy($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
          $"o_totalprice")
        .agg(sum($"l_quantity".cast("decimal(12,2)")).cast("double")
          .as("total_qty"))
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(100)
    },
    Some("""
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150)
      GROUP BY 1, 2, 3, 4, 5
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100
    """.trim))

  /** TPC-H Q2 shape — min-cost supplier per part: the correlated
    * scalar-min subquery expressed the distributed way, aggregate-and-
    * rejoin (per-part min over the (part, supplier) cost table, joined
    * back on (part, cost) to recover WHICH suppliers achieve it — all
    * of them on ties, like Q2). The fixture has no partsupp table, so
    * the cost table derives from lineitem: min extended price each
    * supplier ever charged for the part — same shape, same keys.
    * Scale: the cost table and its per-part min share the l_partkey
    * exchange; part/supplier/nation/region are broadcast dims; the
    * region filter prunes before the supplier attach.
    */
  val q70MinCostSupplier = Q(
    "q70_min_cost_supplier",
    (s, dir) => {
      import s.implicits._
      // explicit isnotnull on the shared base: the supplier join infers
      // isnotnull(l_suppkey) on ONE branch only, which breaks canonical
      // equality between the two ps exchanges and silently doubles the
      // lineitem aggregation (the t30 AQE stage-reuse lesson)
      val ps = t(s, dir, "lineitem")
        .filter($"l_partkey".isNotNull && $"l_suppkey".isNotNull)
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(min($"l_extendedprice".cast("decimal(12,2)")).as("cost"))
      val mn = ps.groupBy($"l_partkey").agg(min($"cost").as("mcost"))
        .withColumnRenamed("l_partkey", "m_partkey")
      ps.join(mn, $"l_partkey" === $"m_partkey" && $"cost" === $"mcost")
        .join(t(s, dir, "part").filter($"p_size" % 5 === 0),
          $"p_partkey" === $"l_partkey")
        .join(t(s, dir, "supplier"), $"s_suppkey" === $"l_suppkey")
        .join(t(s, dir, "nation"), $"s_nationkey" === $"n_nationkey")
        .join(t(s, dir, "region").filter($"r_name" === "EUROPE"),
          $"n_regionkey" === $"r_regionkey")
        .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey",
          $"p_brand", $"cost".cast("double").as("cost"))
        .orderBy($"s_acctbal".desc, $"s_name", $"p_partkey")
    },
    Some("""
      WITH ps AS (SELECT l_partkey, l_suppkey,
                         min(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
                  FROM lineitem GROUP BY 1, 2),
      mn AS (SELECT l_partkey AS m_partkey, min(cost) AS mcost
             FROM ps GROUP BY 1)
      SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
             CAST(ps.cost AS DOUBLE) AS cost
      FROM ps
      JOIN mn ON ps.l_partkey = mn.m_partkey AND ps.cost = mn.mcost
      JOIN part ON p_partkey = ps.l_partkey AND p_size % 5 = 0
      JOIN supplier ON s_suppkey = ps.l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      ORDER BY s_acctbal DESC, s_name, p_partkey
    """.trim))

  /** TPC-H Q16 shape — supplier diversity per part attribute: an anti
    * join against an exclusion list (Q16's NOT IN complaints
    * suppliers; surrogate predicate here — the fixture has no comment
    * column) feeding a COUNT(DISTINCT) per attribute group. Scale:
    * the exclusion list broadcasts; the distinct-count expands to
    * (group, supplier) partial-distinct before the final count, so
    * the shuffle carries distinct pairs, not lineitem rows.
    */
  val q71SupplierDiversity = Q(
    "q71_supplier_diversity",
    (s, dir) => {
      import s.implicits._
      val excl = t(s, dir, "supplier")
        .filter($"s_suppkey" % 3 === 0).select($"s_suppkey")
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(
          $"p_brand" =!= "Brand#45" && $"p_size" <= 10),
          $"p_partkey" === $"l_partkey")
        .join(excl, $"l_suppkey" === $"s_suppkey", "left_anti")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
    },
    Some("""
      SELECT p_brand, p_type, p_size,
             count(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#45' AND p_size <= 10
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_suppkey % 3 = 0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """.trim))

  /** TPC-H Q9 shape — product-type profit by nation and year. The
    * fixture has no partsupp table, so unit cost is modeled as
    * 0.6 * p_retailprice (deterministic, same formula in the oracle).
    * Scale: the p_name filter prunes the part dim BEFORE the fact join
    * (broadcast — part is tiny relative to lineitem); lineitem joins
    * orders on its own key (one shuffle each side, AQE-coalesced);
    * nation attaches by broadcast after supplier. The per-row profit
    * expression stays in whole-stage codegen; the final group-by is a
    * low-cardinality (nation × year) hash aggregate with map-side
    * partials — at 100 TB the only large exchange is lineitem⋈orders.
    */
  val q72ProductProfit = Q(
    "q72_product_profit",
    (s, dir) => {
      import s.implicits._
      val prt = broadcast(t(s, dir, "part").filter($"p_name".contains("ol"))
        .select($"p_partkey", $"p_retailprice"))
      val sup = broadcast(t(s, dir, "supplier")
        .select($"s_suppkey", $"s_nationkey"))
      val nat = broadcast(t(s, dir, "nation")
        .select($"n_nationkey", $"n_name"))
      val profit = ($"l_extendedprice" * (lit(1.0) - $"l_discount") -
        lit(0.6) * $"p_retailprice" * $"l_quantity").cast("decimal(18,4)")
      t(s, dir, "lineitem")
        .join(prt, $"l_partkey" === $"p_partkey")
        .join(sup, $"l_suppkey" === $"s_suppkey")
        .join(nat, $"s_nationkey" === $"n_nationkey")
        .join(t(s, dir, "orders").select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"n_name".as("nation"),
          year($"o_orderdate").cast("long").as("o_year"))
        .agg(sum(profit).cast("double").as("sum_profit"))
        .orderBy($"nation", $"o_year".desc)
    },
    Some("""
      SELECT n_name AS nation,
             EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           - 0.6 * p_retailprice * l_quantity
                           AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN orders   ON l_orderkey = o_orderkey
      WHERE p_name LIKE '%ol%'
      GROUP BY 1, 2
      ORDER BY nation, o_year DESC
    """.trim))

  /** TPC-H Q10 shape — returned-item revenue ranking: which customers
    * returned the most value in a quarter. Scale: the o_orderdate
    * window prunes orders at the scan (pushed filter), the R-flag
    * filter prunes lineitem at the scan; the surviving fact⋈orders is
    * the one large exchange; customer attaches by its key and nation
    * by broadcast; the top-20 is TakeOrderedAndProject (per-partition
    * heads, never a global sort).
    */
  val q73ReturnedItems = Q(
    "q73_returned_items",
    (s, dir) => {
      import s.implicits._
      val rev = ($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast("decimal(18,4)")
      t(s, dir, "lineitem").filter($"l_returnflag" === "R")
        .join(t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1996-07-01").cast("timestamp"))
          .select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(t(s, dir, "nation")),
          $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name", $"c_acctbal")
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    },
    Some("""
      SELECT c_custkey, c_name, n_name, c_acctbal,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1996-07-01'
      GROUP BY 1, 2, 3, 4
      ORDER BY revenue DESC, c_custkey
      LIMIT 20
    """.trim))

  /** TPC-H Q11 shape — important stock: parts whose shipped value from
    * a nation group exceeds a fixed fraction of that group's total.
    * The operator highlight is the scalar-aggregate HAVING: the
    * threshold is one global sum computed over the SAME filtered fact,
    * broadcast into the group filter. Scale: the per-part aggregate is
    * one shuffle on l_partkey with map-side partials; the scalar side
    * re-aggregates the per-part partials (not the raw fact) so the
    * fact is scanned once; comparison is a 1-row broadcast join.
    */
  val q74ImportantStock = Q(
    "q74_important_stock",
    (s, dir) => {
      import s.implicits._
      val sup = broadcast(t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .filter($"n_regionkey" === 0).select($"n_nationkey")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey"))
      val perPart = t(s, dir, "lineitem")
        .join(sup, $"l_suppkey" === $"s_suppkey")
        .groupBy($"l_partkey")
        .agg(sum($"l_extendedprice".cast("decimal(18,4)")).as("value_dec"))
      val total = perPart.agg(
        (sum($"value_dec").cast("double") * lit(0.001)).as("threshold"))
      perPart
        .join(broadcast(total))
        .filter($"value_dec".cast("double") > $"threshold")
        .select($"l_partkey",
          $"value_dec".cast("double").as("part_value"))
        .orderBy($"part_value".desc, $"l_partkey")
    },
    Some("""
      WITH per_part AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS value_dec
        FROM lineitem
        WHERE l_suppkey IN (
          SELECT s_suppkey FROM supplier JOIN nation
            ON s_nationkey = n_nationkey WHERE n_regionkey = 0)
        GROUP BY l_partkey)
      SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
      FROM per_part
      WHERE CAST(value_dec AS DOUBLE) >
            (SELECT CAST(sum(value_dec) AS DOUBLE) * 0.001 FROM per_part)
      ORDER BY part_value DESC, l_partkey
    """.trim))

  /** TPC-H Q14 shape — promotion revenue share by ship month: a
    * conditional aggregate ratio over one fact scan. Scale: part is
    * broadcast (only p_partkey + p_type read — column pruning to two
    * columns); the month group-by is low-cardinality with map-side
    * partials; numerator and denominator come from the SAME aggregate
    * pass (no second scan, no self-join).
    */
  val q75PromoShare = Q(
    "q75_promo_share",
    (s, dir) => {
      import s.implicits._
      val vol = ($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast("decimal(18,4)")
      val zero = lit(0).cast("decimal(18,4)")
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select($"p_partkey", $"p_type")),
          $"l_partkey" === $"p_partkey")
        .groupBy(date_trunc("month", $"l_shipdate").as("ship_month"))
        .agg(
          (lit(100.0) *
            sum(when($"p_type" === "PROMO", vol).otherwise(zero))
              .cast("double") /
            sum(vol).cast("double")).as("promo_share"),
          sum(vol).cast("double").as("total_revenue"))
        .orderBy($"ship_month")
    },
    Some("""
      SELECT date_trunc('month', l_shipdate) AS ship_month,
             100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS promo_share,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS total_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1
      ORDER BY ship_month
    """.trim))

  /** TPC-H Q5 shape — local supplier volume: revenue where the
    * CUSTOMER and the SUPPLIER sit in the same nation of one region.
    * The operator highlight is the equality constraint BETWEEN two
    * dimension paths (c_nationkey = s_nationkey), which prunes the
    * fact⋈orders⋈customer result against the supplier side rather
    * than either dim alone. Scale: lineitem⋈orders is the one large
    * exchange; supplier/nation/region broadcast; the same-nation
    * predicate rides the supplier hash join (no extra shuffle); the
    * final per-nation aggregate is 25 groups with map-side partials.
    */
  val q76LocalSupplierVolume = Q(
    "q76_local_supplier_volume",
    (s, dir) => {
      import s.implicits._
      val vol = ($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast("decimal(18,4)")
      val nat = broadcast(t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
          .select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(t(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
          $"o_custkey" === $"c_custkey")
        .join(broadcast(t(s, dir, "supplier")
          .select($"s_suppkey", $"s_nationkey")),
          $"l_suppkey" === $"s_suppkey" &&
            $"c_nationkey" === $"s_nationkey")
        .join(nat, $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(sum(vol).cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    },
    Some("""
      SELECT n_name,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name
    """.trim))

  val all: Seq[Q] = Seq(
    q01PricingSummary, q02FilterProject, q03RevenueByNation, q04SemiJoin,
    q05AntiJoin, q06OuterJoinCounts, q07TopK, q08WindowTopNPerKey,
    q09RunningTotal, q10Rollup, q11Cube, q12SetOps, q13DistinctAgg,
    q14StringFns, q15DateFns, q16JsonFns, q17CaseMath, q18Percentiles,
    q19AboveNationAvg, q20DateArith, q21RegexExtract, q22ArrayFns,
    q23MathFns, q24SaltedJoin, q25VolumeShipping, q26MarketShare,
    q27SmallQtyRevenue, q28ColocatedJoin, q29GroupingSets,
    q30NestedSemiJoin, q31DormantCustomers, q32LateralTopK, q33MonthSpine,
    q34OrcRoundtrip, q35CsvRoundtrip, q36RangeFrame, q37JsonRoundtrip,
    q38WindowBreadth, q39SetOpsAll, q40NullSemantics, q41Variant,
    q42FullOuter, q43GapFill, q44AggBreadth, q45MultiColIn,
    q46DisjunctiveExists, q47BloomFilterJoin, q48StatAggs, q49IvmMerge,
    q50Interpolate, q51AggPushdown, q52DynamicPruning, q53TryIngest,
    q54WindowedDistinct, q55ZOrderKey, q56Listagg, q57SkewProfile,
    q58UnionEvolve, q59ShareOfParent, q60RankBreadth, q61ValueShareHaving,
    q62TopSupplier, q63SoleBlame, q64LateralTopK, q65DqGate,
    q66XmlRoundtrip, q67ReconcileChecksum, q68OrderCountDist,
    q69LargeOrders, q70MinCostSupplier, q71SupplierDiversity,
    q72ProductProfit, q73ReturnedItems, q74ImportantStock, q75PromoShare,
    q76LocalSupplierVolume)
}
