package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-probe generator: replicates an sf directory N× with key
  * columns shifted per replica (joins stay consistent within a
  * replica; dimensions nation/region stay single-copy), so the probe's
  * dup/hot-key structure scales LINEARLY with N instead of going
  * quadratic on verbatim copies. Usage:
  *   sbt "Test/runMain graft.tools.MakeProbe [src] [out] [n]"
  * then SPARK_GRAFT_SF_DIR=<out> Bench on the queries under probe.
  */
object MakeProbe {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/probe10x")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // large enough that replica key ranges never collide, and a
    // multiple of the id-arithmetic moduli queries use (50, 20, 7, 3),
    // so per-replica slices (eval sets, filters) replicate too
    val shift = 2100000000L
    def rep(name: String, keyCols: Seq[String]): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
      (0 until n).map { i =>
        keyCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(shift * i)))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    rep("orders", Seq("o_orderkey", "o_custkey"))
    rep("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    rep("customer", Seq("c_custkey"))
    rep("supplier", Seq("s_suppkey"))
    rep("part", Seq("p_partkey"))
    rep("documents", Seq("doc_id"))
    rep("embeddings", Seq("vec_id"))
    rep("events", Seq("event_id", "user_id"))
    Seq("nation", "region").foreach { name =>
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    spark.stop()
  }
}
