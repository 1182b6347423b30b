package graft.functions

import graft.SparkTestBase

/** The MinHash banding policy (Dedup.minhashParamsFor) and the
  * auto-parameterized near-dup entry built on it: rows-per-band grow
  * with log n (candidate volume stays linear), bands grow to hold the
  * recall floor as rows rise. All hashing is md5-deterministic, so the
  * achieved recall on a fixture is a constant, not a flake.
  */
class DedupAutoSpec extends SparkTestBase {
  import spark.implicits._

  test("rows grow with log n, bands hold recall, candidates stay linear") {
    val theta = 0.8
    val ns = Seq(1000L, 100000L, 10000000L, 1000000000L)
    val params = ns.map(Dedup.minhashParamsFor(_, theta))
    val rows = params.map { case (h, b) => h / b }
    // r monotone in n — the contract a fixed config misses
    assert(rows == rows.sorted && rows.distinct.size > 1, s"rows: $rows")
    for ((n, (h, b)) <- ns.zip(params)) {
      val r = h / b
      // recall floor from the S-curve: 1-(1-θ^r)^b ≥ 0.95, held up to
      // a BILLION docs before the band cap would bite
      val recall = 1.0 - math.pow(1.0 - math.pow(theta, r.toDouble), b.toDouble)
      assert(recall >= 0.95, s"n=$n r=$r b=$b recall=$recall")
      // linear-candidate contract at the background similarity θ/4:
      // expected candidates per doc ≈ (n/2)·b·s₀^r ≤ fanout
      val perDoc = n / 2.0 * b * math.pow(theta / 4.0, r.toDouble)
      assert(perDoc <= 8.0 + 1e-9, s"n=$n r=$r b=$b perDoc=$perDoc")
    }
    // the cap regime: a broad-similarity ask at corpus scale cannot hold
    // the recall floor — bands pin at the cap instead of exploding
    val (hCap, bCap) = Dedup.minhashParamsFor(100000000L, 0.3)
    assert(bCap == 128, s"expected the 128-band cap, got $bCap (hashes $hCap)")
  }

  test("auto pairs are threshold-true and recall brute-force Jaccard") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val auto = Dedup.nearDuplicatePairsAuto(docs, "doc_id", "text",
        threshold = 0.8)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(auto.forall(_._3 >= 0.8))
    // brute-force truth over all C(500,2) shingle-set pairs
    val sh = Dedup.hashedShingleFrame(docs, "doc_id", "text", shingle = 3)
    val truth = sh.select($"__id".as("id_a"), $"__hhd".as("__ha"))
      .crossJoin(sh.select($"__id".as("id_b"), $"__hhd".as("__hb")))
      .filter($"id_a" < $"id_b")
      .withColumn("j", Dedup.jaccardLongSets($"__ha", $"__hb", assumeSorted = true))
      .filter($"j" >= 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    val found = auto.map(p => (p._1, p._2))
    val recall = found.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall over ${truth.size} true pairs")
    spark.catalog.clearCache()
  }
}
