package graft

/** Plan hygiene across the WHOLE declared query surface: no query may
  * plan a BroadcastNestedLoopJoin or CartesianProduct except the
  * labeled brute-force baseline (s01) and the broadcast-centroid IVF
  * assignment cross joins (s03/s04: a ≤16-row build side by
  * construction). Catches the classic silent scale-killer — a theta-
  * join or a lost equi-key quietly degrading to a nested loop — at
  * spec time instead of in a 100 TB run.
  */
class PlanGuardSpec extends SparkTestBase {

  private val allowedCross = Set(
    "s01_cosine_topk", "s03_ivf_topk", "s04_ivf_index_topk",
    "s14_ivf_append_topk", // s04's serve shape on the appended index (≤16-row broadcast-centroid assignment)
    "s15_ivf_delete", // s04's serve shape on the deleted index (≤16-row broadcast-centroid assignment)
    "e38_bus_vector_index", // same serve shape, fed from the bus (≤16-row broadcast-centroid assignment)
    "s05_ann_recall", // s05's exact side is the s01 baseline cross join
    "t32_cluster_profile", // broadcast-centroid assignment, ≤16-row build side
    "t43_semantic_dedup", // same broadcast-centroid assignment (cached once)
    "e14_theta_setops", // 1-row × 1-row combine of two global aggregates
    "s06_ivf_pq_topk", // exact side is the s01 baseline cross join
    "s07_filtered_ann", // exact side is the s01 baseline cross join
    "s08_knn_graph", // same broadcast-centroid assignment as t43
    "e22_cms_freq", // 5-row probe set × 1-row merged sketch, labeled
    "t47_source_divergence", // 1-row global token total attach
    "s09_auto_near_dup", // truth side is the s01 brute-force baseline
    "s10_auto_knn", // broadcast-centroid assignment + query-bounded exact side
    "t62_hybrid_indexed", // dense side probes via the s04 broadcast-centroid assignment (1 query row × ≤16 centroids)
    "s11_pq_index_topk", // exact side is the s01 baseline cross join (s06's shape, persisted)
    "t63_mmr_rerank", // rel/sim computed over the bounded 20-row shortlist (control data)
    "t64_triplet_mining", // candidate side is the labeled exact baseline (8 anchors × corpus, the s01 pattern)
    "q74_important_stock") // 1-row global-threshold attach (the t47 pattern)

  test("no query plans nested-loop or cartesian joins (labeled baselines excepted)") {
    val offenders = SparkEntry.allQueries
      .filterNot(q => allowedCross(q.name))
      .flatMap { q =>
        val plan = q.fn(spark, "/root/testdata/sf0.001")
          .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
        if (plan.contains("BroadcastNestedLoopJoin") ||
          plan.contains("CartesianProduct")) Some(q.name) else None
      }
    assert(offenders.isEmpty, s"nested-loop plans in: ${offenders.mkString(", ")}")
  }

  // AQE's toString appends the pre-adaptive "Initial Plan" — pin only
  // the final executed section or every operator counts double.
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("q30 plans as nested semi joins with the aggregate between them") {
    val plan = finalPlan(
      SparkEntry.queries("q30_nested_semi_join")(spark, "/root/testdata/sf0.001"))
    assert("LeftSemi".r.findAllIn(plan).size == 2,
      s"expected both IN predicates as semi joins:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"HAVING aggregate missing between the semi joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"semi joins must broadcast at this scale:\n$plan")
  }

  test("q34's ORC scan pushes the date filter and prunes columns") {
    val df = SparkEntry.queries("q34_orc_roundtrip")(spark, "/root/testdata/sf0.001")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val orcScan = formatted.linesIterator
      .dropWhile(!_.contains("Scan orc")).take(12).mkString("\n")
    assert(orcScan.nonEmpty, s"no ORC scan in plan:\n$formatted")
    val section = formatted.split("Scan orc").last.split("\\(\\d+\\) ").head
    assert(section.contains("PushedFilters") &&
      section.contains("GreaterThanOrEqual(o_orderdate"),
      s"date filter not pushed to the ORC scan:\n$section")
    assert(section.contains("ReadSchema") && !section.contains("o_custkey"),
      s"unused columns not pruned from the ORC scan:\n$section")
  }

  test("t47 computes source divergence in one corpus pass") {
    // the (source, token) count is THE data-sized stage; the token
    // model (c), per-source totals (ns), and global total (n) are
    // re-aggregations that must reuse its exchange — same explicit-
    // null-filter requirement as t30, same failure mode without it
    spark.catalog.clearCache()
    val plan = finalPlan(
      SparkEntry.queries("t47_source_divergence")(spark, "/root/testdata/sf0.001"))
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected ONE corpus scan, got $scans:\n$plan")
    assert("ReusedExchange".r.findAllIn(plan).size == 3,
      s"c/ns/n branches must reuse the (source, tok) stage:\n$plan")
  }

  test("t46 expands source pairs in-row, never via a chunk self-join") {
    // the (fp -> source set) frame is cached and read by both the pair
    // expansion and the totals; pair generation is bounded in-row HOF
    // work, so no shuffle-side join on the chunk key may appear
    spark.catalog.clearCache()
    val df = SparkEntry.queries("t46_source_overlap")(spark, "/root/testdata/sf0.001")
    df.collect()
    // NOT finalPlan(): the cached relation nests its own AdaptiveSparkPlan
    // whose "== Initial Plan ==" marker would truncate the outer plan
    // before the totals branch; count on the full rendering instead
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"t46 must not self-join on the chunk key:\n$plan")
    assert("InMemoryTableScan".r.findAllIn(plan).size >= 2,
      s"pair expansion and totals must both read the cached chunk frame:\n$plan")
    spark.catalog.clearCache()
  }

  test("t30 trains and scores the bigram LM in one corpus pass") {
    // dk (per-doc transition counts), c2 (bigram model) and c1 (unigram
    // model) must all derive from ONE scan+explode: the model branches
    // reuse the dk shuffle stage. Without the explicit null filter on
    // the transition frame, branch-asymmetric inferred isnotnull
    // constraints break canonical equality and AQE re-scans the corpus
    // per branch (3 scans, 3 explodes).
    spark.catalog.clearCache()
    val plan = finalPlan(
      SparkEntry.queries("t30_lm_quality")(spark, "/root/testdata/sf0.001"))
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected ONE corpus scan, got $scans:\n$plan")
    assert("ReusedExchange".r.findAllIn(plan).size == 2,
      s"model branches must reuse the dk shuffle stage:\n$plan")
  }

  test("q46 plans OR-EXISTS as existence hash joins, not a nested loop") {
    // a semi join FILTERS, so EXISTS OR EXISTS can't be two semi
    // joins: each subquery must become an ExistenceJoin materializing
    // a boolean, with the disjunction filtered afterwards
    val plan = finalPlan(
      SparkEntry.queries("q46_disjunctive_exists")(spark, "/root/testdata/sf0.001"))
    assert("ExistenceJoin".r.findAllIn(plan).size == 2,
      s"expected two existence joins:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q47 injects a runtime bloom filter on the lineitem side") {
    // the date filter on orders must materialize as a bloom filter
    // pruning lineitem rows BEFORE the join's shuffle; broadcast is
    // disabled in the query's forked session, so without the bloom
    // filter every lineitem row would cross the exchange
    val df = SparkEntry.queries("q47_bloom_filter_join")(spark, "/root/testdata/sf0.001")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain") &&
      optimized.contains("bloom_filter_agg"),
      s"runtime bloom filter not injected:\n$optimized")
    val plan = finalPlan(df)
    assert(!plan.contains("BroadcastHashJoin"),
      s"join must be a shuffle join (broadcast disabled) for the bloom path to matter:\n$plan")
  }

  test("q31 plans NOT IN as a single-column null-aware anti hash join") {
    val plan = finalPlan(
      SparkEntry.queries("q31_dormant_customers")(spark, "/root/testdata/sf0.001"))
    assert("LeftAnti".r.findAllIn(plan).size == 2,
      s"expected NOT IN + NOT EXISTS as two anti joins:\n$plan")
    // BroadcastHashJoinExec renders isNullAwareAntiJoin as the trailing
    // boolean: "LeftAnti, BuildRight, true" is the NAAJ; the NOT EXISTS
    // join renders "..., false".
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"NOT IN must take the null-aware anti hash join path, not a nested loop:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q51 answers COUNT/MIN/MAX from parquet footers (PushedAggregation)") {
    val plan = finalPlan(
      SparkEntry.queries("q51_agg_pushdown")(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("PushedAggregation: [COUNT(*)"),
      s"aggregates not pushed to the parquet scan:\n$plan")
  }

  test("q52's fact scan carries a dynamicpruning partition filter") {
    val plan = finalPlan(
      SparkEntry.queries("q52_dynamic_pruning")(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the fact scan:\n$plan")
  }

  test("t37's rank filter rewrites to WindowGroupLimit (pre-shuffle top-k)") {
    val plan = finalPlan(
      SparkEntry.queries("t37_sample_k")(spark, "/root/testdata/sf0.001"))
    // the rewrite inserts a Partial WindowGroupLimit BEFORE the key
    // exchange, so each map partition forwards at most k rows per key —
    // without it the whole corpus crosses the shuffle just to be ranked
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      s"expected partial+final WindowGroupLimit:\n$plan")
  }

  test("s08's top-k rank filter rewrites to WindowGroupLimit too") {
    // the public knnGraph returns an eager checkpoint (so it can
    // release its assignment cache) whose plan is a flat LogicalRDD —
    // pin the UN-checkpointed frame the checkpoint materializes
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (df, assigned) = graft.functions.VectorFunctions.knnGraphFrame(
      emb, "vec_id", "embedding", k = 3, numCentroids = 16,
      allowFixedAtScale = true)
    try {
      val plan = finalPlan(df.orderBy(
        org.apache.spark.sql.functions.col("query_id"),
        org.apache.spark.sql.functions.col("rank")))
      // candidate pairs per query are cell-bounded but still fan out;
      // the group-limit keeps at most k per query ahead of the rank
      assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
        s"expected partial+final WindowGroupLimit:\n$plan")
    } finally assigned.unpersist()
  }

  test("q63 plans EXISTS/NOT-EXISTS as one semi + one anti hash join") {
    val plan = finalPlan(
      SparkEntry.queries("q63_sole_blame")(spark, "/root/testdata/sf0.001"))
    // the suppkey inequality must ride INSIDE each join condition —
    // a lost equi-key here degrades to a nested loop over order pairs
    assert("LeftSemi".r.findAllIn(plan).size == 1 &&
      "LeftAnti".r.findAllIn(plan).size == 1,
      s"expected exactly one semi and one anti self-join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    // dimension joins (orders-F, supplier, nation) broadcast
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"dimension joins must broadcast:\n$plan")
    // the flagged probe scan pushes its predicate
    assert(plan.contains("EqualTo(l_returnflag,R)"),
      s"flag filter not pushed to the parquet scan:\n$plan")
  }

  test("q62 broadcasts the max-revenue rows into supplier, not the reverse") {
    val plan = finalPlan(
      SparkEntry.queries("q62_top_supplier")(spark, "/root/testdata/sf0.001"))
    // the view filtered to the max is a handful of rows; supplier is
    // the unbounded side at warehouse scale
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast join against supplier:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"supplier side must never shuffle for a ≤handful build side:\n$plan")
  }

  test("q67 never hash-shuffles data rows (checksum is all-partial)") {
    val plan = finalPlan(
      SparkEntry.queries("q67_reconcile_checksum")(spark, "/root/testdata/sf0.001"))
    // the reconciliation checksum's whole point at 100 TB: each variant
    // is a partial aggregate whose exchange carries ONE row per
    // partition, and the only other exchanges order the 3-row result —
    // a hashpartitioning exchange anywhere means data rows shuffled
    assert(!plan.contains("hashpartitioning"),
      s"data-row shuffle in the checksum plan:\n$plan")
  }

  test("t69's running sum is band-partitioned, never a single-reducer window") {
    val plan = finalPlan(
      SparkEntry.queries("t69_budget_selection")(spark, "/root/testdata/sf0.001"))
    // a running sum over a window with NO partition keys plans one
    // SinglePartition exchange — the classic total-order scale killer
    // the quantile banding exists to avoid
    val windowSection = plan.linesIterator
      .filter(l => l.contains("Window") || l.contains("Exchange"))
      .mkString("\n")
    assert(windowSection.contains("hashpartitioning(band"),
      s"running sum not band-partitioned:\n$windowSection")
    assert(!windowSection.contains("Exchange SinglePartition"),
      s"single-reducer exchange in the selection plan:\n$windowSection")
  }
}
