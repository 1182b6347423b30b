package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.{GraftExtensions, SparkTestBase}

/** Count-Min frequency sketches — the per-key-count member of the
  * mergeable-sketch family (e22). The properties that make the
  * two-level per-month → union pattern safe at 100 TB:
  *   - merging per-partition sketches is EXACT w.r.t. one global
  *     sketch (counters are cell-wise additive), so partition order
  *     and merge shape cannot change a bit of the result;
  *   - point estimates never undercount;
  *   - est ≤ exact + eps×N at the query keys (checked, not assumed).
  */
class CmsSketchSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("partition-split sketches merge to the exact global sketch bytes") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val cmsMergeAgg = udaf(new CmsMerge, Encoders.BINARY)

    // split on an arbitrary predicate, sketch each side, merge
    val halves = ev.withColumn("h", col("event_id") % 2)
      .groupBy(col("h"))
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
    val merged = halves.agg(cmsMergeAgg(col("sk")).as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    val global = ev
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    // additive counters: merge-of-parts is bit-identical to one pass
    assert(java.util.Arrays.equals(merged, global),
      "merged sketch bytes differ from the single-pass global sketch")
  }

  test("estimates never undercount and respect the eps*N bound") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val sk = ev
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sk))
    val exact = ev.groupBy(col("user_id")).count().collect()
    val n = exact.map(_.getAs[Long]("count")).sum
    exact.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val ex = r.getAs[Long]("count")
      val est = cms.estimateCount(java.lang.Long.valueOf(u))
      assert(est >= ex, s"CMS undercounted user $u: $est < $ex")
      assert(est <= ex + math.ceil(0.001 * n).toLong,
        s"CMS estimate for user $u outside eps*N: $est vs exact $ex, N=$n")
    }
  }

  test("cms_merge_agg and cms_estimate_long are SQL-registered") {
    GraftExtensions.registerAll(spark)
    spark.read.parquet(s"$dir/events.parquet").createOrReplaceTempView("ev_cms")
    val rows = spark.sql("""
      WITH parts AS (
        SELECT event_id % 4 AS p,
               count_min_sketch(user_id, 0.001d, 0.99d, 42) AS sk,
               count(*) AS n
        FROM ev_cms GROUP BY 1),
      m AS (SELECT cms_merge_agg(sk) AS sk, sum(n) AS n_total FROM parts),
      probe AS (SELECT user_id, count(*) AS exact_n FROM ev_cms GROUP BY 1)
      SELECT p.user_id, p.exact_n,
             cms_estimate_long(m.sk, p.user_id) AS est
      FROM probe p CROSS JOIN m
    """).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact_n"), r.toString)
    }
  }

  test("e22/e23 oracle invariants hold (bounds true; probabilities sum to 1)") {
    val e22 = graft.queries.EventOps.e22CmsFreq.fn(spark, dir).collect()
    assert(e22.length == 5)
    assert(e22.forall(_.getAs[Boolean]("never_under")))
    assert(e22.forall(_.getAs[Boolean]("within_bound")))

    val e23 = graft.queries.EventOps.e23MarkovTransitions.fn(spark, dir)
    val sums = e23.groupBy(col("prev_type"))
      .agg(sum(col("p")).as("sp"), sum(col("n")).as("sn")).collect()
    sums.foreach { r =>
      assert(math.abs(r.getAs[Double]("sp") - 1.0) < 1e-9,
        s"transition probabilities don't normalize: $r")
    }
    // every non-first event contributes exactly one transition
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(sums.map(_.getAs[Long]("sn")).sum == expected)
  }
}
