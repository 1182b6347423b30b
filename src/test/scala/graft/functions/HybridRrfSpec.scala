package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** t61's fusion contract, re-derived independently in the spec: RRF
  * scores must equal 1/(60+rank_sparse) + 1/(60+rank_dense) computed
  * from the two component rankings obtained separately, and the fused
  * top-10 must be exactly the top-10 of that hand-combined scoring.
  */
class HybridRrfSpec extends SparkTestBase {
  import spark.implicits._

  test("fused ranking equals hand-combined component rankings") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.LlmOps.t61HybridRrf.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getDouble(4))).toSeq
    assert(got.size == 10 && got.map(_._1) == (1L to 10L))

    // components, independently: t57's ranks and a fresh dense top-20
    val sparse = graft.queries.LlmOps.t57Bm25TopK.fn(spark, dir)
      .select($"doc_id", $"rank").as[(Long, Long)].collect().toMap
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val qv = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getAs[scala.collection.Seq[Float]](0).toArray
    val dense = emb.filter($"vec_id" =!= 0)
      .withColumn("cos", VectorFunctions.cosine($"embedding", typedlit(qv)))
      .orderBy($"cos".desc, $"vec_id").limit(20)
      .select($"vec_id").as[Long].collect().toSeq
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap

    val expected = (sparse.keySet ++ dense.keySet).toSeq
      .map { id =>
        val s = sparse.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        val d = dense.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (id, s + d)
      }
      .sortBy { case (id, rrf) => (-rrf, id) }
      .take(10)
    assert(got.map(r => (r._2, r._5)) == expected,
      s"fused ${got.map(r => (r._2, r._5))} vs expected $expected")
    // rank columns round-trip the component ranks (null ⇒ absent)
    got.foreach { case (_, id, rs, rd, _) =>
      assert(rs == sparse.get(id) && rd == dense.get(id))
    }
  }
}
