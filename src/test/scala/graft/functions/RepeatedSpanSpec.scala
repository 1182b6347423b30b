package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Exact cross-document repeated-span detection (suffix dedup at
  * 8-word-gram granularity): a repeated span of L ≥ 8 words appears as
  * L-7 consecutive repeated grams, so the island pass recovers the
  * span EXACTLY; runs closer than the gram width merge into one span;
  * within-doc-only repetition and sub-gram-width overlap are excluded
  * by construction.
  */
class RepeatedSpanSpec extends SparkTestBase {
  import spark.implicits._

  private def profile(rows: Seq[(Long, String)]) =
    Dedup.repeatedSpanProfile(rows.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy($"doc_id")

  // 12 shared words: one maximal repeated span of exactly 12 tokens
  private val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"

  test("a shared 12-word span is recovered exactly in both docs") {
    val out = profile(Seq(
      (1L, s"unique one two three $shared tail1 tail2"),
      (2L, s"other prefix words here $shared different suffix entirely now"))).collect()
    assert(out.length == 2)
    for (r <- out) {
      assert(r.getAs[Long]("n_spans") == 1L, r.toString)
      assert(r.getAs[Long]("max_span_tokens") == 12L, r.toString)
      assert(r.getAs[Long]("covered_tokens") == 12L, r.toString)
    }
    // span ≠ whole doc: coverage strictly < 1 on both
    assert(out.forall(_.getAs[Double]("coverage") < 1.0))
  }

  test("two shared spans with a gap < gram width merge into one") {
    // spans A (8 words) and B (8 words) separated by a 3-word gap that
    // is ALSO identical in both docs — the full 19-word window repeats,
    // so the maximal span is 19 tokens, not two 8s.
    val a = "w1 w2 w3 w4 w5 w6 w7 w8"
    val b = "x1 x2 x3 x4 x5 x6 x7 x8"
    val joint = s"$a gap1 gap2 gap3 $b"
    val out = profile(Seq(
      (1L, s"lead1 lead2 $joint trail1"),
      (2L, s"start0 $joint end9 end8"))).collect()
    assert(out.forall(_.getAs[Long]("n_spans") == 1L))
    assert(out.forall(_.getAs[Long]("max_span_tokens") == 19L))
  }

  test("two shared spans with distinct docs' gaps stay separate spans") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8"
    val b = "x1 x2 x3 x4 x5 x6 x7 x8"
    val out = profile(Seq(
      (1L, s"$a g1a g2a g3a g4a g5a g6a g7a g8a $b"),
      (2L, s"$a g1b g2b g3b g4b g5b g6b g7b g8b $b"))).collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Long]("n_spans") == 2L), out.mkString("; "))
    assert(out.forall(_.getAs[Long]("max_span_tokens") == 8L))
    assert(out.forall(_.getAs[Long]("covered_tokens") == 16L))
  }

  test("within-doc repetition alone does not count; short docs drop") {
    val rep = "r1 r2 r3 r4 r5 r6 r7 r8"
    val out = profile(Seq(
      (1L, s"$rep middle filler words $rep"), // repeats only within doc 1
      (2L, "too short for any gram"),
      (3L, "entirely different content with no overlap at all present here")))
    assert(out.count() == 0L)
  }

  test("fixture profile matches the gram-run invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Dedup.repeatedSpanProfile(docs, "doc_id", "text")
    val bad = out.filter($"covered_tokens" > $"n_tokens" ||
        $"max_span_tokens" < 8 || $"n_spans" < 1 ||
        $"coverage" <= 0.0 || $"coverage" > 1.0)
      .count()
    assert(bad == 0L)
    assert(out.count() > 0L, "fixture has near-dup docs; spans expected")
  }
}
