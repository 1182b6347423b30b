package graft.functions

import graft.SparkTestBase

/** The volume-budgeted bucket cut behind nearDuplicatePairsAuto's
  * linear-candidate contract: with a candidate budget set, band
  * buckets are dropped LARGEST-FIRST until the remaining pair volume
  * fits, so one boilerplate mega-bucket can no longer turn the
  * candidate stream quadratic — while small buckets (where true
  * near-dup cliques live) always survive via the floor.
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

  test("without a budget the mega-bucket goes quadratic; with one it is cut") {
    val unbounded = Dedup.candidatePairsFromHashSets(frame, 8, 2)
      .as[(Long, Long)].collect().toSet
    assert(unbounded.size == 100 * 99 / 2 + 1, s"got ${unbounded.size}")
    val budgeted = Dedup.candidatePairsFromHashSets(frame, 8, 2,
      candidateBudget = Some(50L))
    val got = budgeted.as[(Long, Long)].collect().toSet
    // the 100-doc clique's buckets (pop 100) blow the 50-pair budget
    // and are dropped; the distinct pair's pop-2 buckets survive
    assert(got == Set((201L, 202L)), s"got $got")
  }

  test("the floor keeps trivial buckets even under a zero budget") {
    val got = Dedup.candidatePairsFromHashSets(frame, 8, 2,
        candidateBudget = Some(0L))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((201L, 202L)), s"got $got")
  }

  test("an ample budget changes nothing") {
    val all = Dedup.candidatePairsFromHashSets(frame, 8, 2,
        candidateBudget = Some(1000000L))
      .as[(Long, Long)].collect().toSet
    assert(all.size == 100 * 99 / 2 + 1)
  }
}
