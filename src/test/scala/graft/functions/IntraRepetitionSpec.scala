package graft.functions

import graft.SparkTestBase

/** Gopher-style intra-document repetition measures (t68): hand-counted
  * values on a crafted doc, and the short-doc drop rule.
  */
class IntraRepetitionSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-counted bigram/trigram repetition on a crafted doc") {
    val dir = tmpDir("intrarep")
    Seq(
      (1L, "a b a b a b c"), // bigrams: ab×3 ba×2 bc×1; trigrams: aba×2 bab×2 abc×1
      (2L, "x y"), // 2 tokens: drops
      (3L, "p q r") // all grams unique
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = graft.queries.LlmOps.t68IntraRepetition.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 3L))
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_bigrams") == 6L)
    assert(d1.getAs[Long]("top_bigram_n") == 3L)
    assert(d1.getAs[Double]("top_bigram_share") == 0.5)
    assert(d1.getAs[Long]("n_trigrams") == 5L)
    assert(d1.getAs[Long]("dup_trigram_occ") == 4L)
    assert(d1.getAs[Double]("dup_trigram_frac") == 0.8)
    val d3 = out(3L)
    assert(d3.getAs[Long]("top_bigram_n") == 1L)
    assert(d3.getAs[Long]("dup_trigram_occ") == 0L)
    assert(d3.getAs[Double]("dup_trigram_frac") == 0.0)
  }
}
