package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the fixed-parameter scale fence: the two declared quadratic
  * baselines (fixed-LSH near-dup, fixed-k kNN cells) REFUSE past
  * FixedParamMaxRows and name their sized-policy twins, so no sweep or
  * user pays the quadratic cost by picking the wrong name; the
  * explicit acknowledgment flag and the auto paths stay open.
  */
class FixedParamFenceSpec extends SparkTestBase {
  import spark.implicits._

  // 50001 rows with a cheap 2-dim embedding: the guard counts BEFORE
  // any signature/assignment work, so this never does vector math
  private def bigVecs = spark.range(VectorFunctions.FixedParamMaxRows + 1)
    .select($"id".as("vec_id"),
      array(lit(0.1f), lit(0.2f)).as("embedding"))

  test("fixed-LSH near-dup refuses past the row cap and names the auto twin") {
    val e = intercept[IllegalArgumentException] {
      VectorFunctions.cosineNearDupPairs(bigVecs, "vec_id", "embedding", 0.45)
    }
    assert(e.getMessage.contains("cosineNearDupPairsAuto"))
    assert(e.getMessage.contains("allowFixedAtScale"))
  }

  test("fixed-k kNN graph refuses past the row cap and names the sized policy") {
    val e = intercept[IllegalArgumentException] {
      VectorFunctions.knnGraph(bigVecs, "vec_id", "embedding",
        k = 3, numCentroids = 16)
    }
    assert(e.getMessage.contains("ivfParamsFor"))
  }

  test("auto LSH refuses in the table-cap regime and names the routed entry") {
    // targetBucket=1 pushes planes to log2(n) at fixture n, so the
    // recall target wants >64 tables — the same regime θ=0.45 reaches
    // at the 100× corpus (wants 542 tables; the capped run ground
    // through ~2.4B candidates before failing)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert(VectorFunctions.lshTablesWanted(500000L, 0.45) > 64)
    val e = intercept[IllegalArgumentException] {
      VectorFunctions.cosineNearDupPairsAuto(emb, "vec_id", "embedding",
        0.45, targetBucket = 1)
    }
    // the refusal must hand the caller the WORKING path (r13 verdict
    // item 8): the router and its board row, not just the IVF family
    assert(e.getMessage.contains("nearDupPairsRouted") &&
      e.getMessage.contains("s13") &&
      e.getMessage.contains("IVF") &&
      e.getMessage.contains("allowCapRegime"))
    // the deliberate opt-in still runs
    assert(VectorFunctions.cosineNearDupPairsAuto(emb, "vec_id", "embedding",
      0.45, targetBucket = 1, allowCapRegime = true).count() >= 0)
    spark.catalog.clearCache()
  }

  test("fixture-scale fixed params and the acknowledged baseline still run") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // under the cap: no fence
    assert(VectorFunctions.cosineNearDupPairs(
      emb, "vec_id", "embedding", 0.45).count() >= 0)
    assert(VectorFunctions.knnGraph(
      emb, "vec_id", "embedding", k = 3, numCentroids = 16).count() > 0)
    // the knnGraph default is the sized policy — open at any n (the
    // count here proves no fence fires on the auto path's plan build)
    assert(VectorFunctions.knnGraph(emb, "vec_id", "embedding").count() > 0)
  }
}
