package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.catalog.Catalog
import graft.functions.Dedup

class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val b1 = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely different content about spark engines"))
  private val b2 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog!"), // near-dup of 0
    (3L, "the quick brown fox jumps over the lazy dog"))  // exact dup of 0

  test("cross-batch pairs match the batch pipeline, each emitted once") {
    val cat = new Catalog(spark, tmpDir("incdedup"))
    val dd = new IncrementalDedup(cat, threshold = 0.8)
    val p1 = dd.processBatch(b1.toDF("doc_id", "text"), "doc_id", "text")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(p1.isEmpty) // nothing duplicated yet
    val p2 = dd.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val ref = Dedup.nearDuplicatePairs(
        (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text", threshold = 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(p1 ++ p2 == ref, s"incremental ${p1 ++ p2} != batch $ref")
    assert(ref == Set((0L, 1L), (0L, 3L), (1L, 3L)))

    // replaying a processed batch is a no-op: ids are already known
    val p3 = dd.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text")
    assert(p3.isEmpty)
  }

  test("band history is key-bucketed; the bucket filter reaches the scan") {
    val cat = new Catalog(spark, tmpDir("incdedupkb"))
    val dd = new IncrementalDedup(cat, threshold = 0.8)
    dd.processBatch(b1.toDF("doc_id", "text"), "doc_id", "text")
    dd.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text")
    val hist = cat.read("dedup_bands")
    assert(hist.columns.contains("__kb"))
    val kbs = hist.select($"__kb").distinct().as[Int].collect().toSeq.sorted
    assert(kbs.nonEmpty && kbs.forall(k => k >= 0 && k < 16))
    // serving filters history on the batch's buckets; the predicate
    // must reach the parquet scan, where the clustered row-group stats
    // do the skipping (mechanism pinned by CatalogSpec's
    // appendLogClustered test)
    val plan = hist.filter($"__kb".isin(kbs.head, 99))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("__kb"),
      s"__kb filter not pushed to the scan:\n$plan")
    // pruned reads don't change results: replay of a known batch is empty
    assert(dd.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text").isEmpty)
  }

  test("pairs are staged before state and exactly-once per batchId") {
    // reference run: harvest batch 2's true pairs
    val catA = new Catalog(spark, tmpDir("incdedupA"))
    val ddA = new IncrementalDedup(catA, threshold = 0.8)
    ddA.processBatch(b1.toDF("doc_id", "text"), "doc_id", "text", Some(0L))
    val p2 = ddA.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text", Some(1L))
      .as[(Long, Long, Double)].collect().toSeq
    assert(p2.map(p => (p._1, p._2)).toSet == Set((0L, 1L), (0L, 3L), (1L, 3L)))
    assert(catA.read("dedup_pairs").count() == 3)
    // foreachBatch retry AFTER full commit: nothing re-appends
    ddA.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text", Some(1L))
    assert(catA.read("dedup_pairs").count() == 3)

    // crash window: pairs staged, state NOT committed. Replay must
    // commit the state without duplicating the staged pairs.
    val catB = new Catalog(spark, tmpDir("incdedupB"))
    val ddB = new IncrementalDedup(catB, threshold = 0.8)
    ddB.processBatch(b1.toDF("doc_id", "text"), "doc_id", "text", Some(0L))
    catB.appendLog("dedup_pairs",
      p2.toDF("id_a", "id_b", "jaccard").withColumn("__batch_id", lit(1L)))
    val replayed = ddB.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text", Some(1L))
    assert(replayed.count() == 3, "replay must recompute the batch's pairs")
    assert(catB.read("dedup_pairs").count() == 3, "staged pairs must not duplicate")
    // state is now committed: the batch replays as a no-op
    assert(ddB.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text", Some(1L)).isEmpty)
    assert(catB.read("dedup_pairs").select($"id_a", $"id_b").as[(Long, Long)]
      .collect().toSet == Set((0L, 1L), (0L, 3L), (1L, 3L)))
  }

  test("replay after a fully committed batch appends no empty sets ref") {
    val cat = new Catalog(spark, tmpDir("incdedupER"))
    val dd = new IncrementalDedup(cat, threshold = 0.8)
    dd.processBatch(b1.toDF("doc_id", "text"), "doc_id", "text", Some(0L))
    dd.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text", Some(1L))
    val refsBefore = cat.bucketRefs("dedup_sets").size
    // foreachBatch retries after the full commit recompute an empty
    // `fresh` — without the empty-skip guard every retry appended an
    // empty ref, growing the manifest until the next compactLog
    dd.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text", Some(1L))
    dd.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text", Some(1L))
    assert(cat.bucketRefs("dedup_sets").size == refsBefore,
      "replays after full commit must not grow the sets manifest")
  }

  test("crash between bands and sets commits: replay adds no duplicate band rows") {
    // reference run: harvest batch 2's TRUE band rows
    val catA = new Catalog(spark, tmpDir("incdedupBA"))
    val ddA = new IncrementalDedup(catA, threshold = 0.8)
    ddA.processBatch(b1.toDF("doc_id", "text"), "doc_id", "text", Some(0L))
    ddA.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text", Some(1L))
    val trueBands = catA.read("dedup_bands").filter($"__batch_id" === 1L)
    val nTrue = trueBands.count()
    assert(nTrue > 0)

    // crashed attempt: pairs staged AND bands committed, sets NOT
    val catB = new Catalog(spark, tmpDir("incdedupBB"))
    val ddB = new IncrementalDedup(catB, threshold = 0.8)
    ddB.processBatch(b1.toDF("doc_id", "text"), "doc_id", "text", Some(0L))
    catB.appendLog("dedup_pairs", catA.read("dedup_pairs")
      .filter($"__batch_id" === 1L))
    catB.appendLog("dedup_bands", trueBands)

    // replay recomputes (docs still unseen by the sets anti-join) but
    // must NOT append the band rows a second time
    val replayed = ddB.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text", Some(1L))
    assert(replayed.count() == 3)
    assert(catB.read("dedup_bands").filter($"__batch_id" === 1L).count() == nTrue,
      "replay duplicated band history")
    assert(catB.read("dedup_pairs").count() == 3)
    // sets now committed: a further replay is a no-op, and the state
    // equals the crash-free reference run's
    assert(ddB.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text", Some(1L)).isEmpty)
    assert(catB.read("dedup_sets").count() == catA.read("dedup_sets").count())
  }

  test("reopening with different parameters fails fast") {
    val cat = new Catalog(spark, tmpDir("incdedupmeta"))
    new IncrementalDedup(cat, threshold = 0.8)
      .processBatch(b1.toDF("doc_id", "text"), "doc_id", "text")
    val drifted = new IncrementalDedup(cat, threshold = 0.8, bands = 4)
    val e = intercept[IllegalArgumentException] {
      drifted.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(e.getMessage.contains("reopened with"))
    // same params reopen fine and see the existing state
    val same = new IncrementalDedup(cat, threshold = 0.8)
    assert(same.processBatch(b1.toDF("doc_id", "text"), "doc_id", "text").isEmpty)
  }

  test("maxBucket caps template buckets against cumulative history, keeps real pairs") {
    val template = "lorem ipsum dolor sit amet consectetur adipiscing elit boilerplate"
    val c1 = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (10L, template), (11L, template), (12L, template), (13L, template))
    val c2 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog!"), // near-dup of 0
      (14L, template)) // would pair with all four historical templates

    // uncapped control: the template bucket goes quadratic
    val catU = new Catalog(spark, tmpDir("incdedupU"))
    val ddU = new IncrementalDedup(catU, threshold = 0.8)
    val u = (ddU.processBatch(c1.toDF("doc_id", "text"), "doc_id", "text")
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      ++ ddU.processBatch(c2.toDF("doc_id", "text"), "doc_id", "text")
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet)
    assert(u.contains((0L, 1L)) && u.count(p => p._1 >= 10L) == 10,
      s"control run should emit all 4C2 + 4 template pairs, got $u")

    // capped: population counts accumulate ACROSS batches (4 in batch
    // 1, +1 in batch 2 — both over the cap), so neither the in-batch
    // self-join nor the vs-history join ever explodes the bucket;
    // the genuine pair (population 2) is untouched
    val cat = new Catalog(spark, tmpDir("incdedupcap"))
    val dd = new IncrementalDedup(cat, threshold = 0.8, maxBucket = 3)
    val p1 = dd.processBatch(c1.toDF("doc_id", "text"), "doc_id", "text", Some(0L))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(p1.isEmpty, s"template bucket (population 4 > 3) must be capped: $p1")
    val p2 = dd.processBatch(c2.toDF("doc_id", "text"), "doc_id", "text", Some(1L))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(p2 == Set((0L, 1L)),
      s"history population must keep the template capped, real pair kept: $p2")
    // the stats log carries the cumulative populations the cap read
    val pops = cat.read("dedup_bstats").groupBy($"band", $"key")
      .agg(sum($"n").as("pop")).select($"pop").as[Long].collect().toSeq
    assert(pops.contains(5L), s"expected a population-5 template bucket in $pops")
  }

  test("maxBucket replay does not double-count the batch's own staged stats") {
    val template = "lorem ipsum dolor sit amet consectetur adipiscing elit boilerplate"
    val c1 = (10L to 13L).map(i => (i, template)) // bucket population 4
    val c2 = Seq((14L, template)) // +1 → population 5, exactly at the cap

    // reference: cap 5 keeps the bucket; batch 2 pairs 14 with all four
    val catA = new Catalog(spark, tmpDir("incdedupRA"))
    val ddA = new IncrementalDedup(catA, threshold = 0.8, maxBucket = 5)
    ddA.processBatch(c1.toDF("doc_id", "text"), "doc_id", "text", Some(0L))
    val ref = ddA.processBatch(c2.toDF("doc_id", "text"), "doc_id", "text", Some(1L))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(ref == (10L to 13L).map((_, 14L)).toSet)

    // crash window: batch 2's STATS committed (they stage before the
    // bands), bands/sets did not. The replay reads its own staged
    // stats as history — counted, population would look like 6 > 5
    // and the returned pairs would silently vanish.
    val catB = new Catalog(spark, tmpDir("incdedupRB"))
    val ddB = new IncrementalDedup(catB, threshold = 0.8, maxBucket = 5)
    ddB.processBatch(c1.toDF("doc_id", "text"), "doc_id", "text", Some(0L))
    val staged = catA.read("dedup_bstats").filter($"__batch_id" === 1L)
    catB.appendLogClustered("dedup_bstats", staged, Seq("__kb"))
    val replayed = ddB.processBatch(c2.toDF("doc_id", "text"), "doc_id", "text", Some(1L))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(replayed == ref,
      s"replay with staged stats must return the same pairs: $replayed != $ref")
    // and the stats themselves did not double-append
    assert(catB.read("dedup_bstats").filter($"__batch_id" === 1L).count() ==
      staged.count())
  }

  test("maxBucket > 0 without a batchId is rejected up front") {
    // the bstats replay guard keys on batchId; without one a crash
    // between the stats and bands appends would double-count forever
    val cat = new Catalog(spark, tmpDir("incdedupreq"))
    val dd = new IncrementalDedup(cat, threshold = 0.8, maxBucket = 3)
    val ex = intercept[IllegalArgumentException] {
      dd.processBatch(Seq((1L, "a")).toDF("doc_id", "text"),
        "doc_id", "text", None)
    }
    assert(ex.getMessage.contains("batchId"))
  }

  test("maintain folds state to single clustered refs, behavior intact") {
    val cat = new Catalog(spark, tmpDir("incdedupmaint"))
    val dd = new IncrementalDedup(cat, threshold = 0.8)
    dd.processBatch(b1.toDF("doc_id", "text"), "doc_id", "text", Some(0L))
    dd.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text", Some(1L))
    assert(cat.bucketRefs("dedup_bands").size >= 3) // create + 2 batches
    dd.maintain(spark)
    assert(cat.bucketRefs("dedup_bands").size == 1)
    assert(cat.bucketRefs("dedup_sets").size == 1)
    assert(cat.read("dedup_pairs").count() == 3)
    // exactly one live version dir per folded state table
    val bandsDirs = new java.io.File(s"${cat.read("dedup_bands").inputFiles.head
      .stripPrefix("file:").split("/dedup_bands/").head}/dedup_bands")
      .listFiles().filter(f => f.isDirectory && f.getName.startsWith("v"))
    assert(bandsDirs.length == 1, s"unvacuumed versions: ${bandsDirs.toSeq}")
    // post-maintenance the state still dedups: replay is a no-op,
    // idempotency marker survived the pairs fold
    assert(dd.processBatch(b2.toDF("doc_id", "text"), "doc_id", "text", Some(1L)).isEmpty)
    assert(cat.read("dedup_pairs").count() == 3)
  }

  test("streaming with compactEvery folds state between batches") {
    val cat = new Catalog(spark, tmpDir("incdedupce"))
    val dd = new IncrementalDedup(cat, threshold = 0.8, compactEvery = 1)
    val srcDir = tmpDir("incdedupcesrc")
    (b1 ++ b2).toDF("doc_id", "text").write.mode("overwrite").parquet(srcDir)
    val q = dd.start(
      spark.readStream.schema("doc_id long, text string").parquet(srcDir),
      "doc_id", "text", checkpoint = tmpDir("incdedupceck"))
    q.awaitTermination()
    assert(cat.bucketRefs("dedup_bands").size == 1)
    assert(cat.read("dedup_pairs").select($"id_a", $"id_b").as[(Long, Long)]
      .collect().toSet == Set((0L, 1L), (0L, 3L), (1L, 3L)))
  }

  test("streaming drain appends pairs to the pairs log exactly once") {
    val cat = new Catalog(spark, tmpDir("incdedupstream"))
    val dd = new IncrementalDedup(cat, threshold = 0.8)
    val srcDir = tmpDir("incdedupsrc")
    (b1 ++ b2).toDF("doc_id", "text").write.mode("overwrite").parquet(srcDir)
    val q = dd.start(
      spark.readStream.schema("doc_id long, text string").parquet(srcDir),
      "doc_id", "text", checkpoint = tmpDir("incdedupck"))
    q.awaitTermination()
    val pairs = cat.read("dedup_pairs")
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(pairs.toSet == Set((0L, 1L), (0L, 3L), (1L, 3L)))
    assert(pairs.length == 3, "a pair was emitted more than once")
  }

  test("bus-to-dedup end to end: published docs dedupe exactly once across restarts") {
    import graft.sources.bus.BusLog
    val cat = new Catalog(spark, tmpDir("busdedupcat"))
    val dd = new IncrementalDedup(cat, threshold = 0.8)
    val busRoot = tmpDir("busdeduplog")
    val ck = tmpDir("busdedupck")
    BusLog.create(busRoot, numPartitions = 2)
    def publish(docs: Seq[(Long, String)]): Unit =
      docs.zipWithIndex.groupBy(_._2 % 2).foreach { case (p, part) =>
        BusLog.publish(busRoot, p, part.map { case ((id, text), _) =>
          (0L, s"""{"doc_id":$id,"text":"$text"}""")
        })
      }

    // run 1: first wave contains no duplicates
    publish(b1)
    dd.startFromBus(spark, busRoot, ck).awaitTermination()
    // no pairs yet — the pairs log is created lazily on first emission
    assert(!cat.exists("dedup_pairs") || cat.read("dedup_pairs").isEmpty)

    // run 2 (restart from the same checkpoint): near/exact dups arrive
    publish(b2)
    dd.startFromBus(spark, busRoot, ck).awaitTermination()
    val pairs = cat.read("dedup_pairs")
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(pairs.toSet == Set((0L, 1L), (0L, 3L), (1L, 3L)))
    assert(pairs.length == 3, "a pair was emitted more than once")

    // run 3: nothing new on the bus — a drain is a complete no-op
    dd.startFromBus(spark, busRoot, ck).awaitTermination()
    assert(cat.read("dedup_pairs").count() == 3)
  }
}
