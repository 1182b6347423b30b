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
}
