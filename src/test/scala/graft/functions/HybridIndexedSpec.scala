package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.LlmOps

/** Pins t62 (index-served hybrid retrieval) against an INDEPENDENTLY
  * composed reference: sparse ranks from the full-scan t57 relation
  * (never the index), dense ranks from filter-then-probe over a
  * freshly built index's centroids (never topKFiltered), fused by a
  * from-scratch Scala RRF. A bug in either serving path, or in the
  * fusion join, breaks the equality; the shared-machinery oracle alone
  * could not see a bug both sides inherit.
  */
class HybridIndexedSpec extends SparkTestBase {
  import spark.implicits._

  test("t62 == independent fusion of exact sparse ranks and filter-then-probe dense ranks") {
    val sf = "/root/testdata/sf0.001"
    val got = LlmOps.t62HybridIndexed.fn(spark, sf)
      .as[(Long, Long, Option[Long], Option[Long], Double)].collect().toSeq

    // sparse reference: the FULL-SCAN t57 ranking (t58's index-served
    // twin is pinned equal elsewhere; using the scan here keeps this
    // reference independent of TextIndex entirely)
    val sparseRanks = LlmOps.t57Bm25TopK.fn(spark, sf)
      .select($"doc_id", $"rank").as[(Long, Long)].collect().toMap

    // dense reference: build a fresh index with t62's exact parameters
    // and run filter-then-probe over its centroids (the s07 commutation
    // reference — no topKFiltered, no persisted-list scan)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = tmpDir("hybrididx")
    VectorIndex.build(emb, "vec_id", "embedding", dir,
      numCentroids = 16, metaCols = Seq("label"))
    val cents = VectorIndex.centroids(spark, dir)
    val denseRanks = VectorFunctions.ivfTopK(
        emb.filter($"label" === 1), emb.filter($"vec_id" === 0),
        "vec_id", "embedding", k = 20, nprobe = 4, centroids = Some(cents))
      .select($"neighbor_id", $"rank").as[(Long, Long)].collect().toMap

    // from-scratch RRF fusion over the union of ranked ids
    val fused = (sparseRanks.keySet ++ denseRanks.keySet).toSeq.map { id =>
      val rrf = sparseRanks.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        denseRanks.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, rrf)
    }.sortBy { case (id, rrf) => (-rrf, id) }.take(10)

    assert(got.size == 10)
    assert(got.map(r => (r._2, r._5)) == fused,
      s"fused mismatch:\n got=$got\n want=$fused")
    // and the component ranks t62 reports round-trip to the references
    got.foreach { case (_, id, rs, rd, _) =>
      assert(rs == sparseRanks.get(id), s"rank_s mismatch for $id")
      assert(rd == denseRanks.get(id), s"rank_d mismatch for $id")
    }
  }
}
