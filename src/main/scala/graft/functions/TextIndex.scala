package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent inverted text index: the sparse-retrieval counterpart of
  * VectorIndex. `build` tokenizes the corpus once and writes postings
  * (term, doc_id, tf, dl, df) PARTITIONED BY a term hash bucket — one
  * directory per bucket — plus a one-row corpus-stats table (N docs,
  * total tokens). `postingsFor` then reads ONLY the buckets the query
  * terms hash to: the `__tb IN (...)` filter is a partition filter, so
  * serving cost is proportional to the queried terms' postings, not
  * the corpus — a 100 TB corpus serves a 4-term query from 4 of
  * `nBuckets` directories and the rest is never opened.
  *
  * df is denormalized onto every posting row (it repeats per posting
  * but dictionary-encodes to nothing in parquet) so scoring needs NO
  * join at serve time; corpus-wide constants come from the 1-row stats
  * table. The BM25 a consumer computes from this index is pinned equal
  * to the full-scan t57 query by sharing its oracle.
  */
object TextIndex {

  val DefaultBuckets = 64

  /** One corpus pass: tokenize → (doc, term) tf with per-doc length
    * carried through the explode → per-term df joined back (one
    * vocab-cardinality shuffle), bucketed and written. Build cost is
    * two shuffles at (doc,term) / term cardinality — the offline cost
    * every retrieval system pays once per corpus snapshot.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, nBuckets: Int = DefaultBuckets): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tokens = docs.select(col(idCol).as("doc_id"),
      TextFunctions.terms(col(textCol)).as("ts"))
    val tf = tokens
      .select($"doc_id", size($"ts").cast("long").as("dl"),
        explode($"ts").as("term"))
      .groupBy($"doc_id", $"term", $"dl")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val stats = tokens.agg(
      count(lit(1)).as("n_docs"),
      sum(size($"ts").cast("long")).as("total_tokens"))
    stats.coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/corpus_stats")
    tf.join(df, "term")
      .withColumn("__tb", pmod(hash($"term"), lit(nBuckets)))
      .write.mode("overwrite").partitionBy("__tb")
      .parquet(s"$indexDir/postings")
  }

  /** Postings for a set of query terms. The bucket IN-list prunes
    * partition directories at planning time; the term filter prunes
    * row groups via parquet min/max inside the matching buckets.
    */
  def postingsFor(spark: SparkSession, indexDir: String,
      terms: Seq[String], nBuckets: Int = DefaultBuckets): DataFrame = {
    import spark.implicits._
    // bucket ids re-derived with the same codegen'd hash the writer
    // used; one bounded local job for the whole (tiny) term list
    val buckets = terms.toDF("term")
      .select(pmod(hash($"term"), lit(nBuckets)))
      .collect().map(_.getInt(0)).toSeq
    spark.read.parquet(s"$indexDir/postings")
      .filter($"__tb".isin(buckets.distinct: _*) && $"term".isin(terms: _*))
  }

  /** The (n_docs, total_tokens) row written at build time. */
  def corpusStats(spark: SparkSession, indexDir: String): (Long, Long) = {
    val r = spark.read.parquet(s"$indexDir/corpus_stats").head()
    (r.getLong(0), r.getLong(1))
  }
}
