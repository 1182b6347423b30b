package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class VectorIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("persisted IVF index serves the same top-k as the in-memory path") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = tmpDir("ivfidx")
    // default build = the auto policy: ivfParamsFor(500) = 4 centroids
    VectorIndex.build(emb, "vec_id", "embedding", dir)
    val cents = spark.read.parquet(s"$dir/centroids")
    assert(cents.count() == VectorFunctions.ivfParamsFor(500))
    val queries = emb.filter($"vec_id" < 8)
    val served = VectorIndex.topK(spark, dir, queries, "vec_id", "embedding", 3)
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Long)]
      .collect().toSet
    // the in-memory path over the SAME centroids must be identical,
    // not merely similar
    val inMem = VectorFunctions.ivfTopK(emb, queries, "vec_id", "embedding", 3,
        centroids = Some(cents))
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Long)]
      .collect().toSet
    assert(served == inMem && served.nonEmpty)
  }

  test("incremental append serves identically to a full rebuild") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val first = emb.filter($"vec_id" < 400)
    val delta = emb.filter($"vec_id" >= 400)
    val incDir = tmpDir("ivfinc")
    VectorIndex.build(first, "vec_id", "embedding", incDir)
    VectorIndex.append(delta, "vec_id", "embedding", incDir)
    val fullDir = tmpDir("ivffull")
    VectorIndex.build(emb, "vec_id", "embedding", fullDir)
    // NOTE: build trains on the id-ordered sample (vec_id < 256 here),
    // identical for both indexes, so assignments — and results — match
    val queries = emb.filter($"vec_id" < 8)
    def serve(dir: String) =
      VectorIndex.topK(spark, dir, queries, "vec_id", "embedding", 3)
        .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Long)]
        .collect().toSet
    assert(serve(incDir) == serve(fullDir) && serve(incDir).nonEmpty)
  }

  test("compact rewrites each list to one file; serving is bit-identical") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = tmpDir("ivfcompact")
    VectorIndex.build(emb.filter($"vec_id" < 200), "vec_id", "embedding", dir)
    VectorIndex.append(emb.filter($"vec_id" >= 200 && $"vec_id" < 350),
      "vec_id", "embedding", dir)
    VectorIndex.append(emb.filter($"vec_id" >= 350), "vec_id", "embedding", dir)
    val queries = emb.filter($"vec_id" < 8)
    def serve() =
      VectorIndex.topK(spark, dir, queries, "vec_id", "embedding", 3)
        .select($"query_id", $"neighbor_id", $"rank", $"cos")
        .as[(Long, Long, Long, Double)].collect().toSet
    def listFiles() = new java.io.File(
        new java.net.URI(s"file://$dir/lists").getPath)
      .listFiles().filter(_.getName.startsWith("__cid=")).map(d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
      .toMap
    val before = serve()
    val centsBefore = spark.read.parquet(s"$dir/centroids")
      .collect().map(_.toString).sorted.toSeq
    assert(listFiles().values.exists(_ > 1),
      "fixture too small: appends left no fragmented list")
    VectorIndex.compact(spark, dir)
    assert(listFiles().values.forall(_ == 1), s"${listFiles()}")
    assert(serve() == before)
    // centroids (the frozen assignment function) untouched
    assert(spark.read.parquet(s"$dir/centroids")
      .collect().map(_.toString).sorted.toSeq == centsBefore)
  }

  test("two-level build with full coarse probe serves identically to flat build") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val flatDir = tmpDir("ivfflat")
    val twoDir = tmpDir("ivftwo")
    VectorIndex.build(emb, "vec_id", "embedding", flatDir)
    // auto k=4 -> 2 supers; probing 4 >= 2 makes the kernel EXACTLY
    // flat, so the on-disk lists and every serve must match
    VectorIndex.build(emb, "vec_id", "embedding", twoDir, coarseProbe = Some(4))
    val queries = emb.filter($"vec_id" < 8)
    def serve(d: String) =
      VectorIndex.topK(spark, d, queries, "vec_id", "embedding", 3)
        .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Long)]
        .collect().toSet
    assert(serve(twoDir) == serve(flatDir) && serve(twoDir).nonEmpty)
  }

  test("auto default routes large-k builds through the two-level kernel") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val autoDir = tmpDir("ivfauto64")
    val pinDir = tmpDir("ivfpin64")
    // k=64 = TwoLevelMinCentroids: the None default must take the
    // two-level probe-2 path — identical lists to an explicit Some(2)
    VectorIndex.build(emb, "vec_id", "embedding", autoDir, numCentroids = 64)
    VectorIndex.build(emb, "vec_id", "embedding", pinDir, numCentroids = 64,
      coarseProbe = Some(2))
    def lists(d: String) = spark.read.parquet(s"$d/lists")
      .select($"__cid".cast("long"), $"neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(lists(autoDir) == lists(pinDir) && lists(autoDir).nonEmpty)
  }

  test("filtered serve == filter-then-search; predicate pushed to the list scan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = tmpDir("ivffilt")
    VectorIndex.build(emb, "vec_id", "embedding", dir, metaCols = Seq("label"))
    val queries = emb.filter($"vec_id" < 8)
    val got = VectorIndex.topKFiltered(spark, dir, queries,
        "vec_id", "embedding", 3, $"label" === 1)
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Long)]
      .collect().toSet
    // deterministic assignment commutes with the filter, so serving
    // inside the index must EQUAL filtering the corpus then searching
    val cents = spark.read.parquet(s"$dir/centroids")
    val want = VectorFunctions.ivfTopK(emb.filter($"label" === 1), queries,
        "vec_id", "embedding", 3, centroids = Some(cents))
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == want && got.nonEmpty)
    // the metadata predicate lands in the parquet scan's PushedFilters
    val lists = spark.read.parquet(s"$dir/lists").filter($"label" === 1)
    val plan = lists.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(label,1)"), s"predicate not pushed:\n$plan")
  }

  test("serving scans only the probed list partitions (partition pruning)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = tmpDir("ivfprune")
    // explicit k=16 here: with auto's 4 lists the pruning assertion
    // would be vacuous (2 queries at nprobe=2 can probe all 4)
    VectorIndex.build(emb, "vec_id", "embedding", dir, numCentroids = 16)
    val cents = spark.read.parquet(s"$dir/centroids")
    // two queries at nprobe=2 probe at most 4 of the 16 lists
    val queries = emb.filter($"vec_id" < 2)
    val probed = VectorFunctions.ivfAssign(queries, "vec_id", "embedding",
        broadcast(cents), nprobe = 2)
      .select("__cid").distinct().as[Long].collect().toSet
    assert(probed.size <= 4)
    val pruned = spark.read.parquet(s"$dir/lists")
      .filter($"__cid".isin(probed.toSeq.map(x => x: Any): _*))
    // inputFiles ignores filters — assert pruning on the physical scan:
    // the __cid filter must land in PartitionFilters, and the scan's
    // selected partitions must be exactly the probed list directories
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__cid"),
      s"no partition pruning in:\n$plan")
    val scannedCids = pruned.select(input_file_name()).distinct().as[String]
      .collect().map(f => f.split("__cid=")(1).split("/")(0).toLong).toSet
    assert(scannedCids == probed || scannedCids.subsetOf(probed),
      s"scanned $scannedCids, probed $probed")
    assert(pruned.count() ==
      spark.read.parquet(s"$dir/lists").filter($"__cid".isin(probed.toSeq.map(x => x: Any): _*)).count())
  }
}
