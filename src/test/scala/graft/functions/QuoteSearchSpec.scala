package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Quote-search containment (t70): the query-side rare-gram prefix is
  * recall-1 by the prefix theorem — verified against an independent
  * brute-force crossJoin on the fixture — and the integer threshold
  * keeps exactly the ≥ 8-of-10-gram docs on a crafted corpus.
  */
class QuoteSearchSpec extends SparkTestBase {
  import spark.implicits._

  private def run(dir: String) =
    graft.queries.LlmOps.t70QuoteSearch.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("containment"))).toSet

  test("crafted corpus: 8/10 grams kept, 7/10 dropped, threshold exact") {
    val dir = tmpDir("quotesearch")
    // query doc 5 (5 % 97 == 5): snippet = words 4..15
    val snippet = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12" // 10 distinct 3-grams
    val qdoc = s"pad1 pad2 pad3 $snippet tail1 tail2"
    // doc 10: contains words 4..13 of the snippet (q1..q10) => grams
    // q1q2q3..q8q9q10 = 8 of the 10 query grams -> containment 0.8 kept
    val d8 = "x1 x2 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 y1"
    // doc 11: q1..q9 => 7 of 10 grams -> 0.7 dropped
    val d7 = "x1 x2 q1 q2 q3 q4 q5 q6 q7 q8 q9 y1 y2"
    Seq((5L, qdoc), (10L, d8), (11L, d7), (12L, "unrelated words only here"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = run(dir)
    assert(got.contains((5L, 5L, 1.0)), s"query must match itself: $got")
    assert(got.contains((5L, 10L, 0.8)), s"8/10 doc must be kept: $got")
    assert(!got.exists(t => t._2 == 11L), s"7/10 doc must be dropped: $got")
    assert(!got.exists(t => t._2 == 12L))
  }

  test("fixture results equal the brute-force all-pairs verification") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", split(trim($"text"), "\\s+").as("ws"))
    def grams(from: org.apache.spark.sql.Column, to: org.apache.spark.sql.Column) =
      array_distinct(transform(sequence(from, to),
        i => md5(concat_ws(" ", slice($"ws", i, lit(3))))))
    val d = docs.filter(size($"ws") >= 3)
      .select($"doc_id", grams(lit(1), size($"ws") - 2).as("dg"))
    val q = docs.filter($"doc_id" % 97 === 5 && size($"ws") >= 15)
      .select($"doc_id".as("query_id"), grams(lit(4), lit(13)).as("qg"))
    val brute = q.crossJoin(d)
      .withColumn("i", size(array_intersect($"qg", $"dg")).cast("long"))
      .filter($"i" * 5 >= size($"qg").cast("long") * 4)
      .select($"query_id", $"doc_id",
        ($"i".cast("double") / size($"qg")).as("containment"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("containment"))).toSet
    assert(brute.nonEmpty)
    assert(run(dir) == brute, "prefix-filtered search must be recall-1 AND precise")
  }
}
