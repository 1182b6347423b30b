package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Exact prefix-filtered CONTAINMENT join (Dedup.prefixContainmentJoin)
  * — the asymmetric twin of SsJoinSpec's Jaccard pin. Load-bearing
  * claims: (1) recall 1 — the smaller-side-prefix × larger-side-full
  * candidate scheme NEVER drops a pair with |A∩B|/min ≥ θ, on corpora
  * engineered to punish a symmetric prefix prune (tiny quotes inside
  * huge docs — exactly the pairs the LSH route missed); (2) frequency
  * ordering still prunes boilerplate from the prefixes.
  */
class ContainmentJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteForce(sets: Seq[(Long, Set[String])], theta: Double)
      : Set[(Long, Long, Long, Long, Double)] =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size.toLong
      c = inter.toDouble / math.min(sa.size, sb.size)
      if c >= theta
    } yield (ia, ib, sa.size.toLong, sb.size.toLong, c)).toSet

  private def run(sets: Seq[(Long, Set[String])], theta: Double)
      : Set[(Long, Long, Long, Long, Double)] = {
    val df = sets.map { case (i, s) => (i, s.toSeq) }.toDF("id", "s")
    Dedup.prefixContainmentJoin(df, "id", "s", theta)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet
  }

  test("equals brute force on an asymmetric corpus (recall 1)") {
    // the pairs symmetric Jaccard (and its prefix scheme) dilutes:
    // a 3-element quote fully inside a 12-element doc (containment 1,
    // Jaccard 0.25), partial containment just over/under θ, twins,
    // and universal boilerplate in every set
    val big = (1 to 12).map(i => s"w$i").toSet + "bp"
    val sets = Seq[(Long, Set[String])](
      1L -> big,
      2L -> Set("w1", "w2", "w3", "bp"), // quote: containment 1.0 in 1
      3L -> Set("w1", "w2", "zz", "bp"), // 3/4 = 0.75 vs 1
      4L -> big, // twin of 1
      5L -> Set("w5", "w6", "w7", "w8", "qq", "bp"), // 5/6 vs 1
      6L -> Set("bp"),
      7L -> Set("uu", "vv", "bp"))
    for (theta <- Seq(0.5, 0.75, 0.8, 0.9, 1.0)) {
      assert(run(sets, theta) == bruteForce(sets, theta), s"theta=$theta")
    }
    spark.catalog.clearCache()
  }

  test("id order and size order disagreeing still normalizes id_a < id_b") {
    // the SMALLER set carries the LARGER id: candidate roles are
    // (size, id)-ordered, output must still be id-ordered
    val sets = Seq[(Long, Set[String])](
      1L -> (1 to 10).map(i => s"x$i").toSet,
      9L -> Set("x1", "x2"))
    assert(run(sets, 0.9) ==
      Set((1L, 9L, 10L, 2L, 1.0)))
    spark.catalog.clearCache()
  }

  test("equal-size sets pair exactly once") {
    val sets = Seq[(Long, Set[String])](
      1L -> Set("a", "b", "c"), 2L -> Set("a", "b", "c"),
      3L -> Set("a", "b", "d"))
    val out = run(sets, 0.6)
    assert(out == bruteForce(sets, 0.6))
    assert(out.count(p => p._1 == 1L && p._2 == 2L) == 1)
    spark.catalog.clearCache()
  }

  test("fixture parity: containmentPairs equals the naive join at theta=0.9") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" < 150)
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val sh = docs.select($"doc_id",
        TextFunctions.wordNgramHashes($"text", 3).as("g"))
      .filter(size($"g") > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toSeq
    val want = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      c = (sa & sb).size.toDouble / math.min(sa.size, sb.size)
      if c >= 0.9
    } yield (ia, ib, c)).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture has no containment pairs - weak test")
    spark.catalog.clearCache()
  }

  test("exact-boundary theta survives the IEEE ceil overstatement") {
    // θ=0.28 on 25-element sets: the double product 0.28·25 =
    // 7.000000000000001, so a PLAIN ceil gives 8 — one more than the
    // true overlap bound 7 — which (a) shortens the prefix to 18 and
    // (b) tightens the positional filter to ≥8. The pair below shares
    // EXACTLY 7 elements (containment 7/25 = 0.28, a true pair the
    // exact verification accepts), and the shared elements carry the
    // highest df so they rank LAST (positions 19–25) in both sets:
    // under the unbiased ceil the prefix misses every shared element
    // and recall drops below 1. stableCeilCol's 1e-9 down-bias keeps
    // the theorem's bound.
    val shared = (1 to 7).map(i => s"zz$i").toSet
    val sets = Seq[(Long, Set[String])](
      1L -> ((1 to 18).map(i => s"a$i").toSet ++ shared),
      2L -> ((1 to 18).map(i => s"b$i").toSet ++ shared))
    val got = run(sets, 0.28)
    assert(got == bruteForce(sets, 0.28))
    assert(got.contains((1L, 2L, 25L, 25L, 0.28)),
      "exact-boundary pair must be found (recall 1 by theorem)")
    spark.catalog.clearCache()
  }

  test("frequency ordering prunes the boilerplate element from prefixes") {
    // same-size sets sharing one hot element, otherwise disjoint:
    // containment 1/4 < θ; the hot element's df pushes it out of every
    // ⌊(1−θ)·4⌋+1 = 1-element prefix, so zero candidates survive
    val sets = (1 to 40).map(i =>
      (i.toLong, Set("hot", s"u$i-1", s"u$i-2", s"u$i-3")))
    assert(run(sets, 0.9).isEmpty)
    spark.catalog.clearCache()
  }
}
