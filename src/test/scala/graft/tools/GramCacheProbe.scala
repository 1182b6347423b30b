package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, TextFunctions => TF}

/** A/B probe for the double-md5 gram passes (r11 verdict item 5): the
  * t67/t70 plans evaluate their gram pipelines once per consumer (df
  * aggregation + candidate/probe join) — this measures each row with
  * the flat gram frame RECOMPUTED (current) vs PERSISTED across the
  * two consumers, at any sf/probe dir. Adoption rule: rewrite only on
  * a ≥1.5× win.
  * Usage: sbt "Test/runMain graft.tools.GramCacheProbe <dir> [t67|t70|both]"
  */
object GramCacheProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse("both")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val c = f
      println(f"[gramprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
      spark.catalog.clearCache()
    }
    if (which != "t70") {
      time("t67_recompute")(
        Dedup.repeatedSpanProfile(docs, "doc_id", "text").count())
      time("t67_cached")(repeatedSpanCached(docs).count())
    }
    if (which != "t67") {
      time("t70_recompute")(quoteSearch(docs, cache = false).count())
      time("t70_cached")(quoteSearch(docs, cache = true).count())
    }
    spark.stop()
  }

  /** repeatedSpanProfile with the flat (doc, pos, gh) frame persisted
    * across its two consumers instead of re-deriving the md5 grams.
    */
  private def repeatedSpanCached(df: DataFrame): DataFrame = {
    val gram = 8
    val docs = df.select(col("doc_id"),
        split(TF.normalize(col("text")), " ").as("__ws"))
      .withColumn("n_tokens", size(col("__ws")).cast("long"))
    val grams = docs.filter(col("n_tokens") >= gram)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), col("n_tokens").cast("int") - gram),
          i => md5(concat_ws(" ", slice(col("__ws"), i + 1, lit(gram))))))
          .as(Seq("pos", "gh")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("gh"))
      .persist()
    val rep = grams.groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= 2).select(col("gh"))
    val rp = grams.join(rep, Seq("gh"), "left_semi")
    val wP = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = rp
      .withColumn("__isl", col("pos") - row_number().over(wP))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("pos")).as("s"),
        (max(col("pos")) + lit(gram.toLong - 1)).as("e"))
    val wS = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val spans = runs
      .withColumn("__brk", when(col("s") > coalesce(
        max(col("e")).over(wS.rowsBetween(Window.unboundedPreceding, -1)),
        lit(-1L)), lit(1L)).otherwise(lit(0L)))
      .withColumn("__grp",
        sum(col("__brk")).over(wS.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("__grp"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        max(col("e") - col("s") + 1).as("max_span_tokens"),
        sum(col("e") - col("s") + 1).as("covered_tokens"))
      .join(docs.select(col("doc_id"), col("n_tokens")), Seq("doc_id"))
      .withColumn("coverage",
        col("covered_tokens").cast("double") / col("n_tokens").cast("double"))
  }

  /** t70's pipeline with the flat (doc, gh) frame optionally persisted
    * across the df pass and the candidate pass.
    */
  private def quoteSearch(raw: DataFrame, cache: Boolean): DataFrame = {
    val docs = raw.select(col("doc_id"), TF.tokens(col("text")).as("__ws"))
    def gram(i: org.apache.spark.sql.Column) =
      md5(concat_ws(" ", slice(col("__ws"), i, lit(3))))
    def docGrams = array_distinct(transform(
      sequence(lit(1), size(col("__ws")) - 2), i => gram(i)))
    val gramRows0 = docs.filter(size(col("__ws")) >= 3)
      .select(col("doc_id"), explode(docGrams).as("gh"))
    val gramRows = if (cache) gramRows0.persist() else gramRows0
    val queries = docs.filter(col("doc_id") % 97 === 5 && size(col("__ws")) >= 15)
      .select(col("doc_id").as("query_id"),
        array_distinct(transform(sequence(lit(4), lit(13)),
          i => gram(i))).as("qg"))
      .withColumn("nq", size(col("qg")).cast("long"))
    val dfreq = gramRows.groupBy(col("gh")).agg(count(lit(1)).as("df"))
    val wQ = Window.partitionBy(col("query_id")).orderBy(col("df"), col("gh"))
    val prefix = queries
      .select(col("query_id"), col("nq"), explode(col("qg")).as("gh"))
      .join(dfreq, Seq("gh"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("__rk", row_number().over(wQ))
      .filter(col("__rk") <=
        col("nq") - floor((col("nq") * 4 + 4) / lit(5)).cast("long") + 1)
      .select(col("query_id"), col("gh"))
    val cand = broadcast(prefix)
      .join(gramRows, "gh")
      .select(col("query_id"), col("doc_id")).distinct()
    val corpusCand = docs.filter(size(col("__ws")) >= 3)
      .join(cand.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), docGrams.as("dg"))
    cand
      .join(queries.select(col("query_id"), col("qg"), col("nq")), "query_id")
      .join(corpusCand, "doc_id")
      .withColumn("__i", size(array_intersect(col("qg"), col("dg"))).cast("long"))
      .filter(col("__i") * 5 >= col("nq") * 4)
      .select(col("query_id"), col("doc_id"),
        (col("__i").cast("double") / col("nq")).as("containment"))
      .orderBy(col("query_id"), col("doc_id"))
  }
}
