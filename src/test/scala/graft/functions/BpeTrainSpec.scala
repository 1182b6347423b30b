package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** BPE training (t60) invariants beyond the oracle's 8 re-derived
  * rounds: merge counts never increase (a new pair's count is bounded
  * by an existing trigram's, hence by the previous max), rules
  * concatenate exactly, and a hand-built corpus learns the merges a
  * human derives.
  */
class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  test("fixture run: 8 rules, non-increasing counts, merged = left+right") {
    val rules = graft.queries.LlmOps.t60BpeTrain
      .fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(rules.map(_._1).toSeq == (1L to 8L))
    assert(rules.forall { case (_, l, r, m, _) => m == l + r })
    val ns = rules.map(_._5).toSeq
    assert(ns == ns.sorted.reverse, s"counts increased: $ns")
    assert(ns.last > 0)
  }

  test("hand-built corpus learns the expected first merges") {
    // 4×"abab" + 2×"abc": round 1 pairs a b:10, b a:4, b c:2 → merge
    // (a,b) n=10; round 2: " ab ab "×4, " ab c "×2 → ab ab:4, ab c:2
    // → merge (ab,ab) n=4; round 3: " abab "×4, " ab c "×2 → (ab,c) n=2
    val docs = Seq((1L, "abab abab abc"), (2L, "abab abab abc"))
      .toDF("doc_id", "text")
    val dir = tmpDir("bpefix")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rules = graft.queries.LlmOps.t60BpeTrain.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq
    assert(rules.take(3) == Seq(
      (1L, "a", "b", 10L), (2L, "ab", "ab", 4L), (3L, "ab", "c", 2L)),
      s"got $rules")
  }
}
