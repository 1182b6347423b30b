package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pre-aggregated grouping sets must return exactly the direct
  * rollup/cube's rows while keeping Expand ABOVE a full aggregate —
  * the shape that stops Expand from replicating every input row once
  * per grouping set.
  */
class PreAggGroupingSetsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val lineitem =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("rollup matches the direct formulation row-for-row") {
    val direct = lineitem.rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(12,2)")).cast("double").as("sum_qty"))
      .collect().toSet
    val pre = PreAggGroupingSets.rollup(
      lineitem, Seq("l_returnflag", "l_linestatus"),
      partials = Seq(count(lit(1)).as("__n"),
        sum($"l_quantity".cast("decimal(12,2)")).as("__q")),
      finals = Seq(sum($"__n").as("n"),
        sum($"__q").cast("double").as("sum_qty")))
      .collect().toSet
    assert(pre == direct)
  }

  test("cube matches the direct formulation row-for-row") {
    val direct = lineitem.cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n")).collect().toSet
    val pre = PreAggGroupingSets.cube(
      lineitem, Seq("l_returnflag", "l_linestatus"),
      partials = Seq(count(lit(1)).as("__n")),
      finals = Seq(sum($"__n").as("n")))
      .collect().toSet
    assert(pre == direct)
  }

  test("Expand sits above a completed aggregate, not above the scan") {
    val q = PreAggGroupingSets.rollup(
      lineitem, Seq("l_returnflag", "l_linestatus"),
      partials = Seq(count(lit(1)).as("__n")),
      finals = Seq(sum($"__n").as("n")))
    // strip AQE's "== Initial Plan ==" echo so nodes count once
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val atAndBelowExpand = plan.substring(plan.indexOf("Expand"))
    assert(plan.contains("Expand"), s"rollup lost its Expand:\n$plan")
    assert(atAndBelowExpand.contains("HashAggregate"),
      s"Expand runs directly over the input — pre-aggregate missing:\n$plan")
    // and the direct formulation really does put Expand under the first
    // aggregate (the shape we are avoiding), so the assert above is
    // meaningful, not vacuously true
    val directPlan = lineitem.rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val directBelow = directPlan.substring(directPlan.indexOf("Expand"))
    assert(!directBelow.contains("HashAggregate"),
      "direct rollup unexpectedly pre-aggregates — spec premise broken")
  }

  test("empty input: zero rows from both formulations") {
    // grouping-sets aggregation over zero rows emits zero rows (no
    // grand-total row) — unlike a global no-grouping aggregate; the
    // pre-agg formulation must agree with the direct one
    val empty = lineitem.filter(lit(false))
    val direct = empty.rollup($"l_returnflag")
      .agg(count(lit(1)).as("n")).collect()
    val pre = PreAggGroupingSets.rollup(
      empty, Seq("l_returnflag"),
      partials = Seq(count(lit(1)).as("__n")),
      finals = Seq(sum($"__n").as("n")))
      .collect()
    assert(direct.isEmpty && pre.isEmpty)
  }
}
