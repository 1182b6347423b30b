package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.LlmOps

class TextIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val terms = Seq("vector", "stream", "window", "hash")

  test("index-served BM25 reproduces the full-scan t57 relation bit-exactly") {
    val sf = "/root/testdata/sf0.001"
    val scan = LlmOps.t57Bm25TopK.fn(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    val served = LlmOps.t58Bm25Index.fn(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    // same rows, same order, same IEEE doubles — the two paths share
    // one scoring tree (TextIndex.bm25Contrib) over identical integers
    assert(served == scan && served.size == 20)
  }

  test("serving scans only the query terms' postings buckets (partition pruning)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmpDir("textidx")
    TextIndex.build(docs, "doc_id", "text", dir)
    val wanted = terms.toDF("term")
      .select(pmod(hash($"term"), lit(TextIndex.DefaultBuckets)))
      .as[Int].collect().toSet
    val posts = TextIndex.postingsFor(spark, dir, terms)
    // the bucket IN-list must land in PartitionFilters, and the files
    // actually read must come only from the wanted __tb directories
    val plan = posts.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__tb"),
      s"no partition pruning in:\n$plan")
    val scanned = posts.select(input_file_name()).distinct().as[String]
      .collect().map(f => f.split("__tb=")(1).split("/")(0).toInt).toSet
    assert(scanned.nonEmpty && scanned.subsetOf(wanted),
      s"scanned $scanned, wanted $wanted")
    // and only rows for the query terms survive
    assert(posts.select($"term").distinct().as[String].collect().toSet
      .subsetOf(terms.toSet))
  }

  test("incremental append serves bit-identically to a full rebuild") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val first = docs.filter($"doc_id" < 400)
    val delta = docs.filter($"doc_id" >= 400)
    val incDir = tmpDir("textidxinc")
    TextIndex.build(first, "doc_id", "text", incDir)
    TextIndex.append(delta, "doc_id", "text", incDir)
    val fullDir = tmpDir("textidxfull")
    TextIndex.build(docs, "doc_id", "text", fullDir)
    // corpus stats accumulate exactly
    assert(TextIndex.corpusStats(spark, incDir) ==
      TextIndex.corpusStats(spark, fullDir))
    // the postings RELATION matches row-for-row — including the
    // POSITION lists (df re-derived for touched buckets must equal the
    // rebuilt global df; appended docs' positions must equal a fresh
    // tokenization's)
    def rows(d: String) = spark.read.parquet(s"$d/postings")
      .select($"term", $"doc_id", $"dl", $"tf", $"df", $"pss", $"__tb")
      .collect().map(_.toString).toSet
    assert(rows(incDir) == rows(fullDir) && rows(incDir).nonEmpty)
    // and the served BM25 is bit-identical
    def serve(d: String) = TextIndex.bm25TopK(spark, d, terms, 20)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(serve(incDir) == serve(fullDir))
  }

  test("fewer than k matching docs: zero-score fallback fills by doc_id") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "beta gamma delta"),
      (3L, "vector beta"),
      (4L, "gamma delta epsilon zeta"),
      (5L, "vector vector gamma")).toDF("doc_id", "text")
    val dir = tmpDir("textidxfb")
    TextIndex.build(docs, "doc_id", "text", dir)
    // output relation: (rank, doc_id, dl, tf_vector, score)
    val got = TextIndex.bm25TopK(spark, dir, Seq("vector"), 4,
        fallback = Some((docs, "doc_id", "text")))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // docs 3 and 5 match; the zero-score tail is the smallest-id
    // non-matching docs in doc_id order
    assert(got.size == 4)
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L))
    val (matched, zeros) = got.partition(_._5 > 0.0)
    assert(matched.map(_._2).toSet == Set(3L, 5L))
    assert(zeros.map(_._2) == Seq(1L, 2L))
    // and the full row set equals the brute-force full-scan computation
    val n = 5L
    val tot = docs.select(sum(size(TextFunctions.terms($"text")))).as[Long].head()
    val brute = docs
      .select($"doc_id",
        size(TextFunctions.terms($"text")).cast("long").as("dl"),
        size(filter(TextFunctions.terms($"text"), x => x === lit("vector")))
          .cast("long").as("tf"))
      .withColumn("score", TextIndex.bm25Contrib($"tf", $"dl", 2L, n, tot))
      .orderBy($"score".desc, $"doc_id").limit(4)
      .select($"doc_id", $"dl", $"tf", $"score")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._2, r._3, r._4, r._5)) == brute)
  }

  test("phrase search: 3-term phrases, overlapping repeats, adjacency required") {
    val docs = Seq(
      (1L, "a b c a b c"), // "a b c" twice, "b c" twice
      (2L, "a x b c"),     // all of a,b,c present but "a b" never adjacent
      (3L, "b b b"),       // overlapping "b b" twice
      (4L, "c a")).toDF("doc_id", "text")
    val dir = tmpDir("textidxphrase")
    TextIndex.build(docs, "doc_id", "text", dir)
    def q(phrase: String*) =
      TextIndex.phraseMatches(spark, dir, phrase)
        .as[(Long, Long)].collect().toSet
    assert(q("a", "b", "c") == Set((1L, 2L)))
    assert(q("b", "c") == Set((1L, 2L), (2L, 1L)))
    // overlapping occurrences each count (start positions 0 and 1)
    assert(q("b", "b") == Set((3L, 2L)))
    // all terms present but never consecutive => no row
    assert(q("x", "a") == Set.empty)
  }

  test("compact rewrites each bucket to one file; serving is bit-identical") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmpDir("textidxcompact")
    TextIndex.build(docs.filter($"doc_id" < 200), "doc_id", "text", dir)
    TextIndex.append(docs.filter($"doc_id" >= 200 && $"doc_id" < 350),
      "doc_id", "text", dir)
    TextIndex.append(docs.filter($"doc_id" >= 350), "doc_id", "text", dir)
    def serve() = TextIndex.bm25TopK(spark, dir, terms, 20)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    def bucketFiles() = new java.io.File(
        new java.net.URI(s"file://$dir/postings").getPath)
      .listFiles().filter(_.getName.startsWith("__tb=")).map(d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
      .toMap
    val before = serve()
    val statsBefore = TextIndex.corpusStats(spark, dir)
    assert(bucketFiles().values.exists(_ > 1),
      "fixture too small: appends left no fragmented bucket")
    TextIndex.compact(spark, dir)
    assert(bucketFiles().values.forall(_ == 1), s"${bucketFiles()}")
    assert(serve() == before)
    assert(TextIndex.corpusStats(spark, dir) == statsBefore)
  }

  test("compact crash windows: unmarked stage discarded, marked stage rolls forward") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" < 200)
    val dir = tmpDir("textidxcrash")
    TextIndex.build(docs, "doc_id", "text", dir)
    def serve() = TextIndex.bm25TopK(spark, dir, terms, 10)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    val want = serve()
    val next = s"$dir/postings_compact_next"

    // crash BEFORE the marker: the stage is garbage, live dir intact
    spark.range(1).toDF("junk").write.parquet(next)
    TextIndex.compact(spark, dir)
    assert(!new java.io.File(next).exists())
    assert(serve() == want)

    // crash AFTER the marker but BEFORE the swap: stage is a complete
    // copy; a crash may even have deleted the live dir already —
    // recover() must restore serving bit-identically in both windows
    spark.read.parquet(s"$dir/postings").repartition(col("__tb"))
      .write.partitionBy("__tb").parquet(next)
    new java.io.File(next, "_COMPACT_DONE").createNewFile()
    TextIndex.recover(spark, dir) // live dir still present
    assert(serve() == want && !new java.io.File(next).exists())

    spark.read.parquet(s"$dir/postings").repartition(col("__tb"))
      .write.partitionBy("__tb").parquet(next)
    new java.io.File(next, "_COMPACT_DONE").createNewFile()
    // the post-delete pre-rename window: live dir gone
    val live = new java.io.File(s"$dir/postings")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(live)
    TextIndex.recover(spark, dir)
    assert(serve() == want && !new java.io.File(next).exists())
  }

  test("append of an empty batch is a no-op (empty foreachBatch delivery)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" < 100)
    val dir = tmpDir("textidxempty")
    TextIndex.build(docs, "doc_id", "text", dir)
    val statsBefore = TextIndex.corpusStats(spark, dir)
    val before = TextIndex.bm25TopK(spark, dir, terms, 10)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    TextIndex.append(docs.filter($"doc_id" < 0), "doc_id", "text", dir)
    assert(TextIndex.corpusStats(spark, dir) == statsBefore)
    val after = TextIndex.bm25TopK(spark, dir, terms, 10)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(after == before)
  }

  test("torn append is detected; recover rolls a proven commit forward") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" < 100)
    val dir = tmpDir("textidxtorn")
    TextIndex.build(docs, "doc_id", "text", dir)
    val (n0, t0) = TextIndex.corpusStats(spark, dir)
    // crash BETWEEN staged stats and postings completion: next exists,
    // no done marker -> serving refuses, recover refuses (postings may
    // be partial — no sound automatic repair)
    Seq((n0 + 7L, t0 + 99L)).toDF("n_docs", "total_tokens")
      .coalesce(1).write.parquet(s"$dir/corpus_stats_next")
    intercept[IllegalStateException](TextIndex.corpusStats(spark, dir))
    intercept[IllegalStateException](TextIndex.recover(spark, dir))
    // crash AFTER the postings rewrite: the done marker proves the
    // commit — recover promotes the staged stats and clears staging
    new java.io.File(new java.net.URI(s"file://$dir/corpus_stats_next")
      .getPath, "_POSTINGS_DONE").createNewFile()
    TextIndex.recover(spark, dir)
    assert(TextIndex.corpusStats(spark, dir) == (n0 + 7L, t0 + 99L))
    // idempotent once clean
    TextIndex.recover(spark, dir)
    assert(TextIndex.corpusStats(spark, dir) == (n0 + 7L, t0 + 99L))
  }

  test("zero integer idf (df within n/10^4 of n): fallback restores full-scan order") {
    // 10002 docs, term in 10001 of them: idf = ((n-df)*10^4) div df =
    // (1*10^4) div 10001 = 0 — every CANDIDATE scores 0.0, yet doc 0
    // (the one non-candidate) wins the doc_id tiebreak in the full-scan
    // ordering. Skipping the fallback because "k candidates exist"
    // would silently drop it.
    val docs = spark.range(10002)
      .select($"id".as("doc_id"),
        when($"id" === 0, "rare").otherwise("common").as("text"))
    val dir = tmpDir("textidxzeroidf")
    TextIndex.build(docs, "doc_id", "text", dir)
    val got = TextIndex.bm25TopK(spark, dir, Seq("common"), 5,
        fallback = Some((docs, "doc_id", "text")))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(0L, 1L, 2L, 3L, 4L),
      s"expected doc 0 to enter via the zero-score tiebreak, got $got")
    assert(got.forall(_._5 == 0.0))
  }
}
