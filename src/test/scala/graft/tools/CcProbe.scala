package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Dedup

/** Diagnostic probe for the near-dup graph the t23/t24 pipelines fold:
  * candidate/verified pair counts, cluster count and size distribution,
  * and the label-propagation round count to convergence — the numbers
  * that explain a connectedComponents runtime shift when the driver
  * regenerates the documents corpus (round-7: t23/t24 ~1.6x slower
  * isolated; hypothesis was more pairs and/or larger diameter).
  *
  *   sbt "Test/runMain graft.tools.CcProbe /root/testdata/sf0.1"
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.load(spark, sfDir, "documents")
    val nDocs = docs.count()
    val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text", threshold = 0.8)
      .select($"id_a", $"id_b").persist()
    val nPairs = pairs.count()

    // same min-label propagation as Dedup.connectedComponents, with the
    // round count surfaced (the operator only guarantees convergence)
    val e = pairs.select($"id_a".as("src"), $"id_b".as("dst"))
      .union(pairs.select($"id_b".as("src"), $"id_a".as("dst"))).persist()
    var labels = docs.select($"doc_id".as("__n"), $"doc_id".as("rep"))
      .localCheckpoint(true)
    var rounds = 0
    var converged = false
    while (!converged && rounds < 50) {
      val neigh = e.join(labels, e("dst") === labels("__n"))
        .groupBy($"src").agg(min($"rep").as("__nrep"))
      val next = labels.join(neigh, labels("__n") === neigh("src"), "left")
        .select($"__n",
          least($"rep", coalesce($"__nrep", $"rep")).as("rep"),
          ($"__nrep" < $"rep").as("__chg"))
        .localCheckpoint(true)
      converged = !next.agg(coalesce(max($"__chg"), lit(false))).head().getBoolean(0)
      labels = next.drop("__chg")
      rounds += 1
    }

    val clusters = labels.groupBy($"rep").agg(count(lit(1)).as("sz"))
      .filter($"sz" > 1)
    val stats = clusters.agg(count(lit(1)).as("n_clusters"),
      max($"sz").as("max_sz"), avg($"sz").as("avg_sz")).head()
    println(s"""{"sf":"$sfDir","docs":$nDocs,"verified_pairs":$nPairs,""" +
      s""""rounds_to_converge":$rounds,"nontrivial_clusters":${stats.getLong(0)},""" +
      s""""max_cluster":${if (stats.isNullAt(1)) 0 else stats.getLong(1)},""" +
      s""""avg_cluster":${if (stats.isNullAt(2)) 0.0 else stats.getDouble(2)}}""")
    spark.stop()
  }
}
