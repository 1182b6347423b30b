package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MmrSpec extends SparkTestBase {
  import spark.implicits._

  private def shortlist(sf: String) = {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qv = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getAs[scala.collection.Seq[Float]](0).toArray
    val cand = emb.filter($"vec_id" =!= 0)
      .withColumn("rel", VectorFunctions.cosine($"embedding", typedlit(qv)))
      .orderBy($"rel".desc, $"vec_id").limit(20)
      .select($"vec_id".as("id"), $"rel", $"embedding")
    val rows = cand.collect()
    val local = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), cand.schema)
    val sims = local.as("a").join(local.as("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id"), col("b.id"),
        VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("sim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    (rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq, sims)
  }

  test("lambda = 1 reduces MMR to plain relevance top-k") {
    val (cands, sims) = shortlist("/root/testdata/sf0.001")
    val mmr = VectorFunctions.mmrSelect(cands, sims, k = 10, lambda = 1.0)
    val plain = cands.sortBy { case (id, rel) => (-rel, id) }.take(10)
      .zipWithIndex.map { case ((id, rel), i) => (i + 1L, id, rel) }
    assert(mmr == plain)
  }

  test("lambda = 0.7 diversifies: mean pairwise sim strictly below plain top-10") {
    val (cands, sims) = shortlist("/root/testdata/sf0.001")
    val mmr = VectorFunctions.mmrSelect(cands, sims, k = 10, lambda = 0.7)
      .map(_._2)
    val plain = cands.sortBy { case (id, rel) => (-rel, id) }.take(10)
      .map(_._1)
    assert(mmr.toSet != plain.toSet,
      "fixture too easy: MMR changed nothing — pick a harder lambda")
    def meanSim(ids: Seq[Long]) = {
      val ps = for (a <- ids; b <- ids if a != b) yield sims(a -> b)
      ps.sum / ps.size
    }
    assert(meanSim(mmr) < meanSim(plain),
      s"mmr=${meanSim(mmr)} plain=${meanSim(plain)}")
    // rank 1 is always the relevance argmax regardless of lambda
    assert(mmr.head == plain.head)
  }

  test("selection count clamps to the candidate count") {
    val cands = Seq((1L, 0.9), (2L, 0.8))
    val sims = Map((1L, 2L) -> 0.5, (2L, 1L) -> 0.5)
    assert(VectorFunctions.mmrSelect(cands, sims, k = 10, lambda = 0.7)
      .map(_._2) == Seq(1L, 2L))
  }
}
