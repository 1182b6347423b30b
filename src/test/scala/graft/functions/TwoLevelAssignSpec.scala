package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The fused two-level assignment kernel vs the flat path: probing ALL
  * supers must reproduce flat ivfAssign EXACTLY (same candidate set,
  * same tie rules); the default partial probe must agree on almost all
  * vectors (md5/deterministic throughout, so agreement is a constant).
  */
class TwoLevelAssignSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def flatMap(k: Int): Map[Long, Long] = {
    val cents = VectorFunctions.ivfTrainCentroids(emb, "vec_id", "embedding", k)
    VectorFunctions.ivfAssign(emb, "vec_id", "embedding", cents)
      .select($"__aid", $"__cid").as[(Long, Long)].collect().toMap
  }

  private def twoLevelMap(k: Int, probe: Int): Map[Long, Long] = {
    val cents = VectorFunctions.ivfTrainCentroids(emb, "vec_id", "embedding", k)
    VectorFunctions.ivfAssignTwoLevel(emb, "vec_id", "embedding", cents, probe)
      .select($"__aid", $"__cid").as[(Long, Long)].collect().toMap
  }

  test("probing all supers reproduces flat assignment exactly") {
    val k = 16
    // coarseProbe >= ceil(sqrt(k)) covers every super => every child scored
    assert(twoLevelMap(k, probe = 16) == flatMap(k))
  }

  test("agreement with flat is monotone in coarseProbe, reaching equality") {
    // set(p1) ⊆ set(p2) for p1 < p2, and the flat argmax — the global
    // max — stays the argmax of any candidate superset containing it,
    // so per-vector agreement can only grow with the probe. Any bug in
    // the top-p insertion (ordering, shifting, tie handling) breaks
    // either the monotone chain or the final equality.
    val k = 16
    val flat = flatMap(k)
    val rates = (1 to 4).map { p =>
      val two = twoLevelMap(k, probe = p)
      assert(two.values.toSet.subsetOf(flat.values.toSet ++ two.values))
      two.count { case (id, cid) => flat(id) == cid }.toDouble / flat.size
    }
    assert(rates == rates.sorted, s"agreement not monotone: $rates")
    assert(rates.last == 1.0, s"full probe disagrees: ${rates.last}")
  }

  test("default partial probe agrees on almost all vectors and is deterministic") {
    val k = 16
    val flat = flatMap(k)
    val two = twoLevelMap(k, probe = 2)
    assert(two.keySet == flat.keySet)
    val agree = two.count { case (id, cid) => flat(id) == cid }
    val rate = agree.toDouble / flat.size
    assert(rate >= 0.9, s"agreement $rate over ${flat.size} vectors")
    assert(twoLevelMap(k, probe = 2) == two)
  }
}
