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
    val cents = VectorFunctions.ivfTrainCentroids(emb, "vec_id", "embedding", k)
    val realCids = cents.select($"__cid".cast("long")).as[Long].collect().toSet
    val rates = (1 to 4).map { p =>
      val two = twoLevelMap(k, probe = p)
      // every emitted cid is a REAL centroid id — never the init
      // sentinel, never a phantom list partition
      assert(two.values.toSet.subsetOf(realCids))
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

  test("zero-norm vectors and childless supers never emit a phantom cid") {
    // A zero-norm vector makes every cosine NaN; flat ivfAssign's desc
    // window sorts NaN highest so it still assigns (lowest cid wins the
    // tie). The kernel must do the same — not return Long.MaxValue —
    // and must survive supers that lost all children in the grouping.
    val vecs = Seq(
      (0L, Array(0f, 0f, 0f, 0f)), // zero-norm: all cosines NaN
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)),
      (4L, Array(0.9f, 0.1f, 0f, 0f)),
      (5L, Array(0.1f, 0.9f, 0f, 0f)),
      (6L, Array(0f, 0.1f, 0.9f, 0f)),
      (7L, Array(0f, 0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val cents = VectorFunctions.ivfTrainCentroids(vecs.filter($"vec_id" > 0),
      "vec_id", "embedding", k = 4)
    val realCids = cents.select($"__cid".cast("long")).as[Long].collect().toSet
    for (p <- 1 to 2) {
      val out = VectorFunctions.ivfAssignTwoLevel(vecs, "vec_id", "embedding",
          cents, p)
        .select($"__aid", $"__cid").as[(Long, Long)].collect().toMap
      assert(out.keySet == (0L to 7L).toSet)
      assert(out.values.toSet.subsetOf(realCids),
        s"phantom cid at probe=$p: ${out.values.toSet -- realCids}")
    }
    // zero-norm row matches flat's NaN-sorts-highest tie rule at full probe
    val flat = VectorFunctions.ivfAssign(vecs, "vec_id", "embedding", cents)
      .select($"__aid", $"__cid").as[(Long, Long)].collect().toMap
    val full = VectorFunctions.ivfAssignTwoLevel(vecs, "vec_id", "embedding",
        cents, coarseProbe = 4)
      .select($"__aid", $"__cid").as[(Long, Long)].collect().toMap
    assert(full == flat)
  }
}
