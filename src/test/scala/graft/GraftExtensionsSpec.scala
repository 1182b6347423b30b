package graft

class GraftExtensionsSpec extends SparkTestBase {

  test("custom expressions are callable from SQL") {
    GraftExtensions.registerAll(spark)
    val rows = spark.sql("""
      SELECT char_ngram_set('abab', 3) AS ngrams,
             simhash16(array('a', 'b')) AS sh,
             jaccard_long_sets(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS jac,
             cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                               array(CAST(2.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
             size(minhash_sig(array('x', 'y'), 16)) AS siglen,
             size(lsh_plane_signatures(array(CAST(0.5 AS FLOAT)), 4, 4)) AS nsigs,
             simhash60(array('a', 'b')) AS sh60,
             size(char_ngram_hash_set('abab', 3)) AS nhashes,
             minhash_sig_from_hashes(array(7L, 9L), 16) AS sigh,
             token_max_freq(array('a', 'b', 'a')) AS tmf
    """).head()
    assert(rows.getAs[collection.Seq[String]]("ngrams").toSeq == Seq("aba", "bab"))
    assert(rows.getAs[Double]("jac") == 0.5)
    assert(math.abs(rows.getAs[Double]("cos") - 1.0) < 1e-12)
    assert(rows.getAs[Int]("siglen") == 16)
    assert(rows.getAs[Int]("nsigs") == 4)
    assert(rows.getAs[Long]("sh60") >= 0L)
    assert(rows.getAs[Int]("nhashes") == 2) // "aba", "bab"
    assert(rows.getAs[collection.Seq[Long]]("sigh").length == 16)
    assert(rows.getAs[Int]("tmf") == 2)
  }

  test("typed aggregators are callable from SQL") {
    GraftExtensions.registerAll(spark)
    spark.sql("SELECT explode(array('a','b','a','c','a','b')) AS tok")
      .createOrReplaceTempView("ext_toks")
    val ft = spark.sql(
      "SELECT frequent_tokens_1k(tok) AS hh FROM ext_toks").head()
      .getAs[collection.Seq[org.apache.spark.sql.Row]]("hh")
    assert(ft.head.getString(0) == "a" && ft.head.getLong(1) == 3L)

    spark.sql("SELECT * FROM VALUES (1L, 0.5D), (2L, 0.9D), (3L, 0.1D) AS t(id, score)")
      .createOrReplaceTempView("ext_scores")
    val tk = spark.sql(
      "SELECT topk10_by_score(id, score) AS tk FROM ext_scores").head()
      .getAs[collection.Seq[org.apache.spark.sql.Row]]("tk")
    assert(tk.map(_.getLong(0)) == Seq(2L, 1L, 3L))
  }
}
