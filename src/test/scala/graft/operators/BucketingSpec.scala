package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Co-located joins: bucketed tables joined on their bucket key must
  * plan WITHOUT a shuffle exchange on either side — the pre-partitioned
  * layout that makes repeated fact-to-fact joins at warehouse scale
  * one-stage operations.
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed-by-key join plans with no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString

    // the join itself must not shuffle: the only exchange allowed is
    // the post-join aggregation's
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles:\n$plan")

    // and the result matches the plain join
    val expected = lineitem.join(orders, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSet
    assert(joined.as[(String, Long)].collect().toSet == expected)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("co-located joins through the Catalog API plan shuffle-free") {
    import graft.catalog.Catalog
    spark.sql("DROP TABLE IF EXISTS graft_co_orders")
    spark.sql("DROP TABLE IF EXISTS graft_co_lineitem")
    val cat = new Catalog(spark, tmpDir("cowh"))
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    cat.saveCoLocated("co_orders", orders, Seq("o_orderkey"), 8)
    cat.saveCoLocated("co_lineitem", lineitem, Seq("l_orderkey"), 8)
    assert(cat.coLocatedSpec("co_orders").contains((Seq("o_orderkey"), 8)))

    val joined = cat.readCoLocated("co_lineitem")
      .join(cat.readCoLocated("co_orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"catalog co-located join still shuffles:\n$plan")
    assert(joined.as[(String, Long)].collect().toSet ==
      lineitem.join(orders, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toSet)
    spark.sql("DROP TABLE IF EXISTS graft_co_orders")
    spark.sql("DROP TABLE IF EXISTS graft_co_lineitem")
  }

  test("q28's declared plan joins without an exchange on the join keys") {
    val q28 = graft.SparkEntry.queries("q28_colocated_join")(
      spark, "/root/testdata/sf0.001")
    val plan = q28.queryExecution.executedPlan.toString
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin"),
      s"q28 must merge-join its bucketed sides:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"q28's co-located join still shuffles:\n$plan")
  }

  test("readCoLocated re-registers the ident from the persisted spec") {
    import graft.catalog.Catalog
    spark.sql("DROP TABLE IF EXISTS graft_rr_orders")
    val cat = new Catalog(spark, tmpDir("rrwh"))
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cat.saveCoLocated("rr_orders", orders, Seq("o_orderkey"), 8)
    // Simulate a SparkSession that never ran the build: the ident is
    // absent from its catalog but the files + persisted spec exist
    // (DROP on the external table keeps the data).
    spark.sql("DROP TABLE graft_rr_orders")
    assert(!spark.catalog.tableExists("graft_rr_orders"))

    val re = cat.readCoLocated("rr_orders")
    assert(re.count() == orders.count())
    // the re-registered table must carry the bucket spec — a plain
    // parquet re-read would lose it and reintroduce the shuffle
    assert(cat.coLocatedSpec("rr_orders").contains((Seq("o_orderkey"), 8)))
    val selfJoined = re.as("a").join(cat.readCoLocated("rr_orders").as("b"),
      $"a.o_orderkey" === $"b.o_orderkey")
    val plan = selfJoined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"re-registered table lost its bucket metadata:\n$plan")
    spark.sql("DROP TABLE IF EXISTS graft_rr_orders")
  }

  test("migrateToCoLocated converts the mutation-face layout into the join face") {
    import graft.catalog.Catalog
    spark.sql("DROP TABLE IF EXISTS graft_mt")
    spark.sql("DROP TABLE IF EXISTS graft_mt_other")
    val cat = new Catalog(spark, tmpDir("convwh"))
    // mutation face: a PK-bucketed manifested table
    cat.createIfAbsent("mt", cat.allStringSchema(Seq("id", "v")), Seq("id"))
    cat.registerBucketLayout("mt", 8)
    cat.overwriteAllBuckets("mt", (1 to 100).map(i => (i.toString, s"v$i")).toDF("id", "v"))
    assert(cat.hasBucketManifest("mt"))

    // converge: same data, now with a session-catalog bucket spec
    assert(cat.migrateToCoLocated("mt") == (Seq("id"), 8))
    assert(cat.coLocatedSpec("mt").contains((Seq("id"), 8)))
    assert(cat.readCoLocated("mt").count() == 100)

    // and it joins shuffle-free against another co-located table on id
    cat.saveCoLocated("mt_other",
      (50 to 150).map(i => (i.toString, i)).toDF("id", "w"), Seq("id"), 8)
    val joined = cat.readCoLocated("mt")
      .join(cat.readCoLocated("mt_other"), "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(id"),
      s"converged table still shuffles on its PK join:\n$plan")
    assert(joined.count() == 51)
    // the mutation face is untouched — further bucket-scoped rewrites work
    assert(cat.bucketRefs("mt").nonEmpty && cat.read("mt").count() == 100)
    spark.sql("DROP TABLE IF EXISTS graft_mt")
    spark.sql("DROP TABLE IF EXISTS graft_mt_other")
  }
}
