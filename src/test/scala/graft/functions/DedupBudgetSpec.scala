package graft.functions

import graft.SparkTestBase

/** The volume-budgeted bucket cut behind nearDuplicatePairsAuto's
  * linear-candidate contract: with a candidate budget set, band
  * buckets above the derived cap stop enumerating all pairs, so one
  * boilerplate mega-bucket can no longer turn the candidate stream
  * quadratic — but they degrade to STAR pairs (bucket-min × member,
  * O(pop)) instead of being dropped, because a giant j≈1 clique shares
  * the same band key in EVERY band and no other band could rescue it.
  * Small buckets (where modest true near-dup cliques live) always
  * survive all-pairs via the floor.
  */
class DedupBudgetSpec extends SparkTestBase {
  import spark.implicits._

  // 100 docs sharing ONE hash set — the deterministic extreme of a
  // boilerplate hot bucket (every band key identical) — plus one
  // distinct duplicate pair in its own tiny buckets
  private def frame = {
    val mega = (1L to 100L).map(i => (i, (1L to 40L).toArray.sorted))
    val pair = Seq((201L, (1000L to 1030L).toArray.sorted),
      (202L, (1000L to 1030L).toArray.sorted))
    (mega ++ pair).toDF("__id", "__hhd")
  }

  private val starOfMega: Set[(Long, Long)] =
    (2L to 100L).map(i => (1L, i)).toSet

  test("without a budget the mega-bucket goes quadratic; with one it degrades to star pairs") {
    val unbounded = Dedup.candidatePairsFromHashSets(frame, 8, 2)
      .as[(Long, Long)].collect().toSet
    assert(unbounded.size == 100 * 99 / 2 + 1, s"got ${unbounded.size}")
    val budgeted = Dedup.candidatePairsFromHashSets(frame, 8, 2,
      candidateBudget = Some(50L))
    val got = budgeted.as[(Long, Long)].collect().toSet
    // the 100-doc clique's buckets (pop 100) blow the 50-pair budget:
    // all-pairs enumeration is cut, but the clique stays CONNECTED via
    // its 99 star pairs; the distinct pair's pop-2 buckets survive
    // all-pairs untouched
    assert(got == starOfMega + ((201L, 202L)), s"got $got")
  }

  test("the floor keeps trivial buckets even under a zero budget") {
    val got = Dedup.candidatePairsFromHashSets(frame, 8, 2,
        candidateBudget = Some(0L))
      .as[(Long, Long)].collect().toSet
    assert(got == starOfMega + ((201L, 202L)), s"got $got")
  }

  test("an ample budget changes nothing") {
    val all = Dedup.candidatePairsFromHashSets(frame, 8, 2,
        candidateBudget = Some(1000000L))
      .as[(Long, Long)].collect().toSet
    assert(all.size == 100 * 99 / 2 + 1)
  }

  test("maxBucket (no budget) also stars over-cap buckets instead of dropping them") {
    val got = Dedup.candidatePairsFromHashSets(frame, 8, 2,
        maxBucket = Some(10))
      .as[(Long, Long)].collect().toSet
    assert(got == starOfMega + ((201L, 202L)), s"got $got")
  }
}
