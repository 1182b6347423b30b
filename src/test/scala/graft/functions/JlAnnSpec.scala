package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** JL random projection + projected-space LSH + full-space re-rank:
  * the projection is the deterministic Achlioptas ±1 sign matrix (md5
  * parity, own key namespace), cosine re-rank happens in the ORIGINAL
  * space, and candidate recall on the fixture clears the same floor
  * the direct-LSH row holds.
  */
class JlAnnSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("jlProject matches the hand-computed sign fold on unit vectors") {
    // e_i projections isolate single signs: proj(e_i)[j] == jlSign(j, i)
    val dims = 8
    val rows = (0 until dims).map { i =>
      (i.toLong, Array.tabulate(dims)(d => if (d == i) 1.0f else 0.0f))
    }
    val df = rows.toDF("id", "v")
      .withColumn("pv", VectorFunctions.jlProject($"v", 4))
    val got = df.orderBy($"id").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("pv")))
    val expected = (0 until dims).map { i =>
      (0 until 4).map { j =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"jl${j}_$i".getBytes("UTF-8"))
        val lastNibble = md(15) & 0x0f
        if (lastNibble % 2 == 0) 1.0 else -1.0
      }
    }
    for (i <- 0 until dims; j <- 0 until 4)
      assert(got(i)(j) == expected(i)(j), s"i=$i j=$j")
  }

  test("jl and plane namespaces never alias") {
    // the same (comp, dim) pair under the two families must be free to
    // differ — equal keys would silently correlate projection and
    // bucketing and void the two-stage independence argument
    val keysJl = (0 until 16).flatMap(j => (0 until 64).map(i => s"jl${j}_$i"))
    val keysPl = (0 until 16).flatMap(p => (0 until 64).map(i => s"plane${p}_$i"))
    assert(keysJl.toSet.intersect(keysPl.toSet).isEmpty)
  }

  test("literal plane-sign signatures equal the HOF reference form") {
    val df = emb.limit(100)
      .select(VectorFunctions.jlProject($"embedding", 24).as("pv"))
    val diff = df.select(
        VectorFunctions.lshTableSignaturesLit($"pv", 8, 4, dIn = 24).as("a"),
        VectorFunctions.lshTableSignaturesHof($"pv", 8, 4).as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(diff == 0L)
  }

  test("re-rank is full-space: every returned cosine equals the exact one") {
    val queries = emb.filter($"vec_id" < 8)
    val jl = VectorFunctions.jlLshTopK(emb, queries, "vec_id", "embedding", k = 3)
    val exact = VectorFunctions.bruteForceTopK(emb, queries, "vec_id", "embedding",
      k = Int.MaxValue - 1)
    val mismatched = jl.select($"query_id", $"neighbor_id", $"cos".as("jlcos"))
      .join(exact.select($"query_id", $"neighbor_id", $"cos"),
        Seq("query_id", "neighbor_id"), "left")
      .filter($"cos".isNull || $"cos" =!= $"jlcos")
      .count()
    assert(mismatched == 0L)
  }

  test("fixture recall@3 vs brute force clears 0.6 at the measured defaults") {
    val queries = emb.filter($"vec_id" < 8)
    val jl = VectorFunctions.jlLshTopK(emb, queries, "vec_id", "embedding", k = 3)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = VectorFunctions.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 3)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = jl.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall@3 = $recall")
  }

  test("a vector wider than dIn raises instead of silently null-projecting") {
    // before the guard: slice truncated the sign row, zip_with
    // null-padded, null swallowed the whole projection — a mis-sized
    // dIn degraded candidates to NOTHING with no error (r11 ADVICE)
    def chainMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
    val wide = Seq((1L, Array.fill(12)(1.0f))).toDF("id", "v")
    val e1 = intercept[Throwable](
      wide.select(VectorFunctions.jlProject($"v", 4, dIn = 8)).collect())
    assert(chainMsg(e1).contains("exceeds dIn=8"), chainMsg(e1))
    val e2 = intercept[Throwable](
      wide.select(VectorFunctions.lshTableSignaturesLit($"v", 2, 4,
        dIn = 8)).collect())
    assert(chainMsg(e2).contains("exceeds dIn=8"), chainMsg(e2))
    // the narrower-vector direction stays exact zip semantics: no raise
    val narrow = Seq((1L, Array.fill(6)(1.0f))).toDF("id", "v")
    assert(narrow.select(VectorFunctions.jlProject($"v", 4, dIn = 8))
      .collect().length == 1)
  }
}
