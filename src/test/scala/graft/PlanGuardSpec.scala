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

  private val allowedCross = Set("s01_cosine_topk", "s03_ivf_topk", "s04_ivf_index_topk")

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
}
