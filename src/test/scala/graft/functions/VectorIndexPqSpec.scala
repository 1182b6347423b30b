package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class VectorIndexPqSpec extends SparkTestBase {
  import spark.implicits._

  test("persisted PQ index serves bit-identically to the in-memory IVF-PQ path") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 8)
    val dir = tmpDir("pqidx")
    VectorIndex.buildPq(emb, "vec_id", "embedding", dir, numCentroids = 16)
    val served = VectorIndex.topKPq(spark, dir, queries,
        "vec_id", "embedding", k = 3, rerank = emb, nprobe = 4)
      .select($"query_id", $"neighbor_id", $"rank", $"cos")
      .as[(Long, Long, Long, Double)].collect().toSet
    // same deterministic trainers => identical result to the in-memory
    // path with the same parameters (the s03/s04 precedent, PQ edition)
    val inMem = VectorFunctions.ivfPqTopK(emb, queries, "vec_id", "embedding",
        k = 3, numCentroids = 16, nprobe = 4)
      .select($"query_id", $"neighbor_id", $"rank", $"cos")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(served == inMem && served.size == 24)
  }

  test("PQ lists store codes + norm, never raw vectors; scan is partition-pruned") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = tmpDir("pqidxlayout")
    VectorIndex.buildPq(emb, "vec_id", "embedding", dir, numCentroids = 16)
    val lists = VectorIndex.currentLists(spark, dir)
    // the memory-bounded contract: code bytes + one norm, no float array
    assert(lists.columns.toSet ==
      Set("neighbor_id", "__codes", "__rnorm2", "__cid"))
    assert(lists.schema("__codes").dataType.simpleString.startsWith("array"),
      lists.schema.treeString)
    // m=16 codes per vector
    assert(lists.select(size($"__codes")).distinct().as[Int].collect()
      .toSeq == Seq(16))
    // probed-list pruning is STRUCTURAL: the serve read resolves only
    // the probed lists' generation dirs through the manifest
    val pruned = VectorIndex.readLists(spark, dir, Seq(0L, 1L))
    val planned = pruned.inputFiles
      .map(f => f.split("__cid=")(1).split("/")(0).toLong).toSet
    assert(planned.nonEmpty && planned.subsetOf(Set(0L, 1L)),
      s"planned $planned not within probed lists")
  }
}
