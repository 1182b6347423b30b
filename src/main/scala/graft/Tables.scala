package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided read-only parquet tables
  * (see TESTDATA.md / FIXTURES.md §B). All queries take the sf
  * directory as a runtime argument so the same code runs at any
  * scale factor — and, on a real cluster, against any warehouse
  * root.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoize resolved relations per (session, path): repeated
  // spark.read.parquet calls re-list files and re-read footers on every
  // query — the moral equivalent of a catalog's cached table metadata.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })

  /** Register every table as a temp view (used by SQL-form queries
    * such as GROUPING SETS and by tests).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
