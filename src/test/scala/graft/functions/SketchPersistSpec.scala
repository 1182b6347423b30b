package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.catalog.Catalog

/** Persisted mergeable sketches — the storage face of e13: per-batch
  * HLL sketches written into a Catalog append-log (the binary sketch
  * column round-trips through parquet), then merged AT READ TIME into
  * all-time distinct estimates. This is the production pattern for
  * "distinct ever" over 100 TB: each ingest batch appends O(4 KB) per
  * (event_type, batch) without reading old refs, and the dashboard
  * query unions sketches instead of re-scanning raw history.
  */
class SketchPersistSpec extends SparkTestBase {

  test("catalog-logged HLL sketches merge to a bound-true all-time estimate") {
    val cat = new Catalog(spark, tmpDir("skcat"))
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val ev = raw
      .withColumn("day", to_date(graft.Tables.tsUtc(raw)))
      .withColumn("uday", concat_ws(":", col("user_id"), col("day")))

    // two ingest batches, each appending its own sketches — the batches
    // OVERLAP in udays (a user active in both halves), which is exactly
    // what union-merge must handle and naive sum-of-counts cannot
    Seq(0, 1).foreach { b =>
      val sk = ev.filter(col("event_id") % 2 === b)
        .groupBy(col("event_type"))
        .agg(expr("hll_sketch_agg(uday, 12)").as("sk"),
          countDistinct(col("uday")).as("batch_exact"))
        .withColumn("batch", lit(b))
      cat.appendLog("dist_sketches", sk)
    }

    val merged = cat.read("dist_sketches")
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
        sum(col("batch_exact")).as("naive_sum"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("uday")).as("exact"))
    val rows = merged.join(exact, "event_type").collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val est = r.getAs[Long]("est").toDouble
      val ex = r.getAs[Long]("exact").toDouble
      assert(math.abs(est / ex - 1.0) <= 0.05,
        s"merged estimate off: $r")
    }
    // at least one type must prove the overlap point: naive per-batch
    // sum over-counts where the sketch union deduplicates
    assert(rows.exists(r => r.getAs[Long]("naive_sum") > r.getAs[Long]("exact")),
      "fixture lost its cross-batch uday overlap — the union-vs-sum point is untested")
  }
}
