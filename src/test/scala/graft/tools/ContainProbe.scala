package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Scale probe for the exact containment join (t39's
  * prefixContainmentJoin path): stage-by-stage volumes — prefix rows,
  * raw candidate rows, distinct candidate pairs, verified pairs — and
  * end-to-end time on an sf/probe dir, so candidate-budget regressions
  * show as numbers, not vibes.
  * Usage: sbt "Test/runMain graft.tools.ContainProbe <dir> [theta]"
  */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val theta = args.lift(1).map(_.toDouble).getOrElse(0.9)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val basis = args.lift(2).getOrElse("char")
    val sh =
      if (basis == "word")
        docs.select(col("doc_id").as("__id"),
          graft.functions.TextFunctions.wordNgramHashes(col("text"), 3)
            .as("__hhd"))
      else Dedup.hashedShingleFrame(docs, "doc_id", "text", 3)
    val g = sh.select(col("__id"), col("__hhd").as("__set"))
      .filter(size(col("__set")) > 0).persist()
    println(s"[containprobe] sets=${g.count()} " +
      s"avg_n=${g.agg(avg(size(col("__set")))).head().getDouble(0)}")
    val ex = g.select(col("__id"), size(col("__set")).as("__n"),
      explode(col("__set")).as("__el"))
    val dfreq = ex.groupBy(col("__el")).agg(count(lit(1)).as("__df"))
    println(s"[containprobe] vocab=${dfreq.count()}")
    val ranked = ex.join(dfreq, "__el")
      .withColumn("__pos", row_number().over(
        Window.partitionBy(col("__id")).orderBy(col("__df"), col("__el"))))
      .select(col("__el"), col("__id"), col("__n"), col("__pos")).persist()
    val pref = ranked
      .filter(col("__pos") <= col("__n") - ceil(lit(theta) * col("__n")) + 1)
    println(s"[containprobe] prefix_rows=${pref.count()}")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[containprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val raw = pref.as("a").join(ranked.as("b"),
      col("a.__el") === col("b.__el") &&
        (col("a.__n") < col("b.__n") ||
          (col("a.__n") === col("b.__n") && col("a.__id") < col("b.__id"))) &&
        lit(1) + least(col("a.__n") - col("a.__pos"),
          col("b.__n") - col("b.__pos")) >=
          ceil(lit(theta) * col("a.__n")))
    time("raw_candidates")(println(s"[containprobe] raw=${raw.count()}"))
    val cand = raw.select(least(col("a.__id"), col("b.__id")).as("id_a"),
      greatest(col("a.__id"), col("b.__id")).as("id_b")).distinct()
    time("distinct_pairs")(println(s"[containprobe] pairs=${cand.count()}"))
    time("end_to_end") {
      val out = Dedup.prefixContainmentJoin(sh.toDF("__id", "__hhd"),
        "__id", "__hhd", theta, assumeSorted = true)
      println(s"[containprobe] verified=${out.count()}")
    }
    spark.stop()
  }
}
