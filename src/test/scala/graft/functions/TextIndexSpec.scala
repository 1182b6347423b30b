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

  test("serving scans only the query terms' postings buckets (structural pruning)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmpDir("textidx")
    TextIndex.build(docs, "doc_id", "text", dir)
    val wanted = terms.toDF("term")
      .select(pmod(hash($"term"), lit(TextIndex.DefaultBuckets)))
      .as[Int].collect().toSet
    val posts = TextIndex.postingsFor(spark, dir, terms)
    // the read resolves ONLY the wanted buckets' generation dirs
    // through the manifest (untouched buckets are never even listed),
    // so every file the scan touches must sit under a wanted __tb dir
    val scanned = posts.select(input_file_name()).distinct().as[String]
      .collect().map(f => f.split("__tb=")(1).split("/")(0).toInt).toSet
    assert(scanned.nonEmpty && scanned.subsetOf(wanted),
      s"scanned $scanned, wanted $wanted")
    // the PLANNED input set is already pruned — not filter-at-runtime:
    // every input file of the relation lives in a wanted bucket dir
    val planned = posts.inputFiles
      .map(f => f.split("__tb=")(1).split("/")(0).toInt).toSet
    assert(planned.nonEmpty && planned.subsetOf(wanted),
      s"planned $planned, wanted $wanted")
    // and only rows for the query terms survive
    assert(posts.select($"term").distinct().as[String].collect().toSet
      .subsetOf(terms.toSet))
  }

  test("build default auto-sizes nBuckets from the corpus token volume") {
    // the SignatureIndex r14 treatment: at fixture scale the auto
    // default floors to DefaultBuckets...
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" < 150)
    val dir1 = tmpDir("textidxauto1")
    TextIndex.build(docs, "doc_id", "text", dir1)
    def metaBuckets(d: String): Int = {
      // recorded count drives the serve hashing; read it back the way
      // postingsFor does (via the manifest)
      val posts = TextIndex.currentPostings(spark, d)
      posts.select(max($"__tb")).as[Int].head() + 1 // dense at fixture vocab
    }
    assert(metaBuckets(dir1) <= TextIndex.DefaultBuckets)
    // ...and a tiny rewrite-unit target pushes the SAME default past the
    // floor, proving the token count flows through bucketsFor end-to-end
    val tokens = docs
      .select(sum(size(TextFunctions.terms($"text")))).as[Long].head()
    val want = TextIndex.bucketsFor(tokens, targetRowsPerBucket = 50L)
    assert(want > TextIndex.DefaultBuckets)
    val dir2 = tmpDir("textidxauto2")
    TextIndex.build(docs, "doc_id", "text", dir2, targetRowsPerBucket = 50L)
    // serving still works against the wider bucket map and matches the
    // floored index bit-exactly (bucketing is layout, not content)
    def serve(d: String) = TextIndex.bm25TopK(spark, d, terms, 10)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(serve(dir2) == serve(dir1))
    // bucketsFor: floor and monotonicity
    assert(TextIndex.bucketsFor(1000L) == TextIndex.DefaultBuckets)
    val ks = Seq(1L << 20, 1L << 28, 1L << 34, 1L << 38)
      .map(TextIndex.bucketsFor(_))
    assert(ks == ks.sorted && ks.last > TextIndex.DefaultBuckets)
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
    // POSITION lists (appended docs' positions must equal a fresh
    // tokenization's; fragments jointly hold exactly the rebuilt rows)
    def rows(d: String) = TextIndex.currentPostings(spark, d)
      .select($"term", $"doc_id", $"dl", $"tf", $"pss", $"__tb")
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
    // files per bucket, resolved through the CURRENT manifest refs
    def bucketFiles() = TextIndex.currentRefs(spark, dir).map {
      case (k, gs) => k -> gs.map(g => new java.io.File(
          new java.net.URI(s"file://$dir/$g/__tb=$k").getPath)
        .listFiles().count(_.getName.endsWith(".parquet"))).sum
    }
    val before = serve()
    val statsBefore = TextIndex.corpusStats(spark, dir)
    assert(bucketFiles().values.exists(_ > 1),
      "fixture too small: appends left no fragmented bucket")
    TextIndex.compact(spark, dir)
    assert(bucketFiles().values.forall(_ == 1), s"${bucketFiles()}")
    // post-compact every bucket maps to the single fresh generation
    assert(TextIndex.currentRefs(spark, dir).values.toSet.size == 1)
    assert(serve() == before)
    assert(TextIndex.corpusStats(spark, dir) == statsBefore)
  }

  test("a reader opened mid-append serves the pre-append snapshot bit-exactly") {
    // THE r13 verdict item-1 property: the old layout dynamic-overwrote
    // live buckets, so a reader crossing an append saw mixed df values.
    // Generations: a frame that resolved its manifest paths keeps
    // reading its immutable snapshot while any number of commits land.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmpDir("textidxsnap")
    TextIndex.build(docs.filter($"doc_id" < 300), "doc_id", "text", dir)
    val snap = TextIndex.postingsFor(spark, dir, terms)
      .select($"term", $"doc_id", $"dl", $"tf", $"pss")
    val want = snap.collect().map(_.toString).sorted.toSeq
    val statsBefore = TextIndex.corpusStats(spark, dir)
    // two commits land while the reader's frame is live — touching the
    // SAME buckets (same query terms appear in the appended docs)
    TextIndex.append(docs.filter($"doc_id" >= 300 && $"doc_id" < 450),
      "doc_id", "text", dir)
    TextIndex.append(docs.filter($"doc_id" >= 450), "doc_id", "text", dir)
    assert(snap.collect().map(_.toString).sorted.toSeq == want,
      "mid-append reader must keep its pre-append snapshot")
    // while a FRESH read serves the post-append state
    val fresh = TextIndex.postingsFor(spark, dir, terms)
      .select($"term", $"doc_id", $"dl", $"tf", $"pss")
      .collect().map(_.toString).sorted.toSeq
    assert(fresh != want && fresh.size > want.size)
    assert(TextIndex.corpusStats(spark, dir) != statsBefore)
  }

  test("crash windows: orphan generations are vacuumed, a lost pointer is restored") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" < 200)
    val dir = tmpDir("textidxcrash")
    TextIndex.build(docs, "doc_id", "text", dir)
    def serve() = TextIndex.bm25TopK(spark, dir, terms, 10)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    val want = serve()
    // a crash mid-append/mid-compact leaves an ORPHAN generation no
    // manifest references — the committed snapshot is untouched
    // (pointer-flip design); recover() reclaims the orphan
    spark.range(3).toDF("junk").write
      .parquet(s"$dir/postings_g99/__tb=0")
    assert(serve() == want)
    TextIndex.recover(spark, dir)
    assert(!new java.io.File(s"$dir/postings_g99").exists())
    assert(serve() == want)
    // the torn-flip window of writeAtomic's non-atomic fallback: the
    // pointer file is lost with every manifest intact — reads fall
    // back to the newest manifest; recover re-materializes the pointer
    val cur = java.nio.file.Paths.get(dir, "_current")
    val v = java.nio.file.Files.readString(cur).trim
    java.nio.file.Files.delete(cur)
    assert(serve() == want)
    TextIndex.recover(spark, dir)
    assert(java.nio.file.Files.readString(cur).trim == v)
    assert(serve() == want)
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

  test("stats and postings commit atomically: no observable torn-append state") {
    // the old layout wrote stats and postings separately and needed a
    // staged repair protocol for the window between them; stats now
    // ride the manifest's extras, committed by the SAME pointer flip
    // as the postings refs — at every point around an append the pair
    // (stats, postings) is one of exactly two consistent snapshots
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmpDir("textidxatomic")
    TextIndex.build(docs.filter($"doc_id" < 100), "doc_id", "text", dir)
    val before = TextIndex.corpusStats(spark, dir)
    val delta = docs.filter($"doc_id" >= 100 && $"doc_id" < 200)
    TextIndex.append(delta, "doc_id", "text", dir)
    val after = TextIndex.corpusStats(spark, dir)
    val (dn, dt) = (delta.count(),
      delta.select(sum(size(TextFunctions.terms($"text")))).as[Long].head())
    assert(after == (before._1 + dn, before._2 + dt))
    // consistency invariant: df/doc counts derivable from the CURRENT
    // postings always agree with the manifest stats they shipped with
    val nDocs = TextIndex.currentPostings(spark, dir)
      .select($"doc_id").distinct().count()
    assert(nDocs == after._1)
  }

  test("compact rebuckets to the accumulated corpus volume; rebucketed == rebuilt") {
    // r14 verdict item 1: the bucket count used to be frozen at build,
    // so a corpus that outgrew its build-time sizing swelled per-bucket
    // units forever. compact() now re-derives nBuckets from the
    // ACCUMULATED token count at the build's recorded target.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def nb(d: String): Int =
      GenIndex.readManifest(spark, d, "t").extra("n_buckets", "t").toInt
    val dir = tmpDir("textidxrebkt")
    // tiny rewrite-unit target so fixture-scale token counts clear the
    // floor and the growth is visible
    TextIndex.build(docs.filter($"doc_id" < 300), "doc_id", "text", dir,
      targetRowsPerBucket = 20L)
    val nbBefore = nb(dir)
    assert(nbBefore > TextIndex.DefaultBuckets)
    TextIndex.append(docs.filter($"doc_id" >= 300), "doc_id", "text", dir)
    TextIndex.compact(spark, dir)
    val nbAfter = nb(dir)
    assert(nbAfter > nbBefore,
      s"compact must rebucket to the grown corpus: $nbBefore -> $nbAfter")
    // the rebucketed count equals what a fresh build over the full
    // corpus would choose at the same target...
    val fullDir = tmpDir("textidxrebktfull")
    TextIndex.build(docs, "doc_id", "text", fullDir,
      targetRowsPerBucket = 20L)
    assert(nb(fullDir) == nbAfter)
    // ...and serving is bit-identical to that rebuild (bucketing is
    // layout, not content; postingsFor hashes with the RECORDED count)
    def serve(d: String) = TextIndex.bm25TopK(spark, d, terms, 20)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(serve(dir) == serve(fullDir) && serve(dir).nonEmpty)
  }

  test("append with a commitId no-ops on redelivery (at-least-once ingest)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmpDir("textidxidem")
    TextIndex.build(docs.filter($"doc_id" < 200), "doc_id", "text", dir)
    val batch = docs.filter($"doc_id" >= 200 && $"doc_id" < 300)
    TextIndex.append(batch, "doc_id", "text", dir,
      commitId = Some("batch-1"))
    val stats = TextIndex.corpusStats(spark, dir)
    val rows = TextIndex.currentPostings(spark, dir).count()
    def serve() = TextIndex.bm25TopK(spark, dir, terms, 10)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    val want = serve()
    // the SAME batch redelivered under the SAME commit id: no-op — no
    // double-counted n_docs, no duplicated postings, no df inflation
    TextIndex.append(batch, "doc_id", "text", dir,
      commitId = Some("batch-1"))
    assert(TextIndex.corpusStats(spark, dir) == stats)
    assert(TextIndex.currentPostings(spark, dir).count() == rows)
    assert(serve() == want)
    // a NEW commit id commits normally
    TextIndex.append(docs.filter($"doc_id" >= 300 && $"doc_id" < 400),
      "doc_id", "text", dir, commitId = Some("batch-2"))
    assert(TextIndex.corpusStats(spark, dir) != stats)
    // multi-batch-back replay (r16: a checkpoint restored from backup
    // replays SEVERAL batches, not just the immediately-preceding
    // one): batch-1 redelivered AFTER batch-2 committed must still
    // no-op — the bounded append-id history remembers it where a
    // single last_append_id (now batch-2) would not, and the replay
    // would double-count n_docs/df and duplicate postings
    val stats2 = TextIndex.corpusStats(spark, dir)
    val rows2 = TextIndex.currentPostings(spark, dir).count()
    TextIndex.append(batch, "doc_id", "text", dir,
      commitId = Some("batch-1"))
    assert(TextIndex.corpusStats(spark, dir) == stats2)
    assert(TextIndex.currentPostings(spark, dir).count() == rows2)
  }

  test("delete: BM25 == rebuild-without bit-exactly; compact purges; clash refuses") {
    // the takedown/PII-purge primitive: the doclens sidecar prices the
    // EXACT n_docs/total_tokens decrement, df re-derives downstream of
    // the tombstone anti join, so the deleted index must score
    // bit-identically to an index BUILT on the reduced corpus
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmpDir("textidxdel") + "/idx"
    TextIndex.build(docs, "doc_id", "text", dir)
    val deadPred = $"doc_id" % 6 === 0
    val refDir = tmpDir("textidxdelref") + "/idx"
    TextIndex.build(docs.filter(!deadPred), "doc_id", "text", refDir)
    def serve(d: String) = TextIndex.bm25TopK(spark, d, terms, 20)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    val wantFull = serve(dir)
    val want = serve(refDir)
    assert(want != wantFull, "delete must change the top-k or the test is weak")
    TextIndex.delete(docs.filter(deadPred).select($"doc_id"), "doc_id",
      dir, commitId = Some("d1"))
    assert(serve(dir) == want)
    assert(TextIndex.corpusStats(spark, dir) ==
      TextIndex.corpusStats(spark, refDir),
      "n_docs/total_tokens must decrement by exactly the purged docs")
    // phrase search inherits delete-awareness through postingsFor
    def phrase(d: String) = TextIndex
      .phraseMatches(spark, d, Seq("vector", "stream"))
      .as[(Long, Long)].collect().toSet
    assert(phrase(dir) == phrase(refDir))
    // redelivered delete (same commitId): no-op
    val stats = TextIndex.corpusStats(spark, dir)
    TextIndex.delete(docs.filter(deadPred).select($"doc_id"), "doc_id",
      dir, commitId = Some("d1"))
    assert(TextIndex.corpusStats(spark, dir) == stats)
    // re-deleting already-dead / never-indexed ids: no-op by content
    TextIndex.delete(docs.filter(deadPred).select($"doc_id"), "doc_id",
      dir, commitId = Some("d2"))
    TextIndex.delete(spark.range(10).select(($"id" + 1000000L).as("doc_id")),
      "doc_id", dir)
    assert(TextIndex.corpusStats(spark, dir) == stats && serve(dir) == want)
    // re-appending a TOMBSTONED id refuses with the compact hint
    val ex = intercept[IllegalStateException] {
      TextIndex.append(docs.filter(deadPred).limit(3), "doc_id", "text", dir)
    }
    assert(ex.getMessage.contains("compact"))
    // compact PHYSICALLY purges: dead rows out of postings AND
    // doclens, tombstones dropped, stats and serve unchanged
    TextIndex.compact(spark, dir)
    assert(serve(dir) == want)
    assert(TextIndex.corpusStats(spark, dir) == stats)
    val m = GenIndex.readManifest(spark, dir, "t")
    assert(m.refs("tombs").isEmpty, "compact must drop the tombstones")
    assert(TextIndex.currentPostings(spark, dir)
      .filter($"doc_id" % 6 === 0).count() == 0)
    // post-purge the ids are free again: re-append restores the full
    // corpus serving
    TextIndex.append(docs.filter(deadPred), "doc_id", "text", dir)
    assert(serve(dir) == wantFull)
    spark.catalog.clearCache()
  }

  test("delete survives an inline fold (tombstones + decremented stats carried)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmpDir("textidxdelfold") + "/idx"
    TextIndex.build(docs.filter($"doc_id" < 200), "doc_id", "text", dir)
    TextIndex.delete(
      docs.filter($"doc_id" % 6 === 0 && $"doc_id" < 200)
        .select($"doc_id"), "doc_id", dir)
    val stats = TextIndex.corpusStats(spark, dir)
    // fresh-id appends cross the fold threshold; the fold's manifest
    // must CARRY tombstones + doclens or the delete un-deletes
    for (lo <- Seq(200, 300, 400))
      TextIndex.append(
        docs.filter($"doc_id" >= lo && $"doc_id" < lo + 100),
        "doc_id", "text", dir, autoCompactFragments = 2)
    val m = GenIndex.readManifest(spark, dir, "t")
    assert(m.commitId.startsWith("fold_"),
      "precondition: a fold must have happened")
    assert(m.refs("tombs").nonEmpty, "tombstones must survive the fold")
    assert(m.refs("doclens").nonEmpty, "doclens must survive the fold")
    // deleted docs still invisible after the folds
    assert(TextIndex.bm25TopK(spark, dir, terms, 50)
      .filter($"doc_id" % 6 === 0 && $"doc_id" < 200).count() == 0)
    // and the accumulated stats stayed exact: build-minus-deleted plus
    // the three appends
    val appended = docs.filter($"doc_id" >= 200 && $"doc_id" < 500)
    val appendedToks = appended
      .select(size(graft.functions.TextFunctions.terms($"text")).cast("long"))
      .as[Long].collect().sum
    assert(TextIndex.corpusStats(spark, dir) ==
      (stats._1 + appended.count(), stats._2 + appendedToks))
    spark.catalog.clearCache()
  }

  test("appends past the fragment threshold auto-fold inline (bounded LSM fold)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmpDir("textidxautocompact")
    TextIndex.build(docs.filter($"doc_id" < 200), "doc_id", "text", dir)
    // threshold 3: append2 crosses it (build ref + 2 fragments) and
    // folds the FRAGMENTS — the BOUNDED fold (r15 verdict item 5):
    // refs collapse to [first, folded], the build generation is never
    // rewritten, and read amplification stays ≤ 2 files per bucket
    for (lo <- Seq(200, 275, 350, 425))
      TextIndex.append(
        docs.filter($"doc_id" >= lo && $"doc_id" < lo + 75),
        "doc_id", "text", dir, autoCompactFragments = 3)
    val refs = TextIndex.currentRefs(spark, dir)
    assert(refs.values.forall(_.size <= 2),
      s"${refs.values.map(_.size).toSeq.sorted}")
    // the build generation survives every fold as the first ref — the
    // bounded-cost claim (folds never rewrite the base)
    assert(refs.values.exists(_.size == 2))
    assert(refs.values.filter(_.contains("postings_g0"))
      .forall(_.head == "postings_g0"))
    assert(new java.io.File(s"$dir/postings_g0").exists())
    // content unharmed by the inline folds: serve == full rebuild
    val fullDir = tmpDir("textidxautofull")
    TextIndex.build(docs, "doc_id", "text", fullDir)
    def serve(d: String) = TextIndex.bm25TopK(spark, d, terms, 20)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(serve(dir) == serve(fullDir) && serve(dir).nonEmpty)
  }

  test("a dangling crashed-commit manifest is never selected nor restored-to") {
    // r14 ADVICE item 1: a crash between writeManifest(v+1) and the
    // pointer flip leaves an uncommitted manifest; once its generation
    // dirs are gone (vacuumed as orphans, or never fully written) the
    // lost-pointer fallback must NOT select it — pre-fix, maxOption
    // pinned the index to a snapshot with no data.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" < 200)
    val dir = tmpDir("textidxdangle")
    TextIndex.build(docs, "doc_id", "text", dir)
    val cur = GenIndex.readManifest(spark, dir, "t")
    def serve() = TextIndex.bm25TopK(spark, dir, terms, 10)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    val want = serve()
    // the crashed commit: a newer manifest referencing a generation
    // that does not exist
    GenIndex.writeManifest(spark, dir, GenIndex.Manifest(cur.version + 1,
      "crashed", Map("postings" -> Map(0 -> Seq("postings_g99"))),
      cur.extras))
    // lost pointer: reads must fall back PAST the dangling manifest to
    // the newest intact one
    val curPath = java.nio.file.Paths.get(dir, "_current")
    java.nio.file.Files.delete(curPath)
    assert(serve() == want)
    // recover restores the pointer to the INTACT version and its
    // vacuum reclaims the uncommitted manifest file
    TextIndex.recover(spark, dir)
    assert(java.nio.file.Files.readString(curPath).trim.toInt == cur.version)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir,
      s"_manifest_v${cur.version + 1}.json")))
    assert(serve() == want)
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

  test("redelivery no-ops even when the append itself triggered an inline fold") {
    // r15 ADVICE item 1: an append crossing AutoCompactFragments
    // commits compact_g{N} in the same call, so a commitId check
    // against the manifest's own commitId alone would re-append the
    // redelivered batch (~1-in-AutoCompactFragments appends under
    // at-least-once delivery) — duplicate postings, double-counted
    // n_docs/total_tokens/df. The persisted last_append_id extra —
    // carried forward by every compact — closes the window.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmpDir("textidxidemfold")
    TextIndex.build(docs.filter($"doc_id" < 200), "doc_id", "text", dir)
    val batch = docs.filter($"doc_id" >= 200 && $"doc_id" < 300)
    // threshold 2: this append folds inline (build ref + 1 fragment),
    // replacing the manifest's own commitId with fold_g{N}
    TextIndex.append(batch, "doc_id", "text", dir, commitId = Some("b1"),
      autoCompactFragments = 2)
    assert(GenIndex.readManifest(spark, dir, "t").commitId
      .startsWith("fold_"),
      "precondition: the append must actually have folded")
    val stats = TextIndex.corpusStats(spark, dir)
    val rows = TextIndex.currentPostings(spark, dir).count()
    // the redelivered batch (crash before the checkpoint write): no-op
    TextIndex.append(batch, "doc_id", "text", dir, commitId = Some("b1"),
      autoCompactFragments = 2)
    assert(TextIndex.corpusStats(spark, dir) == stats)
    assert(TextIndex.currentPostings(spark, dir).count() == rows)
    // a MAINTENANCE compact between append and redelivery reopens the
    // same window — still a no-op
    val b2 = docs.filter($"doc_id" >= 300 && $"doc_id" < 350)
    TextIndex.append(b2, "doc_id", "text", dir, commitId = Some("b2"))
    TextIndex.compact(spark, dir)
    val stats2 = TextIndex.corpusStats(spark, dir)
    TextIndex.append(b2, "doc_id", "text", dir, commitId = Some("b2"))
    assert(TextIndex.corpusStats(spark, dir) == stats2)
  }
}
