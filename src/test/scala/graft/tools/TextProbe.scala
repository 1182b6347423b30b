package graft.tools

import org.apache.spark.sql.SparkSession

import graft.functions.Dedup

/** Scale probe for the TEXT near-dup auto path (t59's production
  * side): times nearDuplicatePairsAuto — banded MinHash sized by
  * minhashParamsFor from one corpus count — against the FIXED 16×2
  * declared configuration (t05's) on an sf/probe dir, printing the
  * chosen policy and pair counts. The brute-force truth join t59
  * carries at test SF is deliberately NOT run here: it is corpus² by
  * construction (the same excuse as s09's truth side at 100×) — the
  * production recall audit bounds the query side instead.
  * Usage: sbt "Test/runMain graft.tools.TextProbe /tmp/probe10x [theta] [sections]"
  * where sections ⊆ auto,fixed.
  */
object TextProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/probe10x")
    val theta = args.lift(1).map(_.toDouble).getOrElse(0.8)
    val sections = args.lift(2)
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set("auto", "fixed"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val (numHashes, bands) = Dedup.minhashParamsFor(n, theta)
    println(s"[textprobe] n=$n theta=$theta -> auto numHashes=$numHashes bands=$bands (rows=${numHashes / bands})")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[textprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, $c pairs")
      spark.catalog.clearCache()
    }
    if (sections("auto")) time("auto") {
      Dedup.nearDuplicatePairsAuto(docs, "doc_id", "text", theta).count()
    }
    // like-for-like A/B for the OPH signature swap: the same policy
    // params and budget, classic k-permutation signatures — run in the
    // SAME JVM as `auto` so JIT/page-cache context cancels out
    if (sections("autoclassic")) time("auto classic-sig") {
      Dedup.nearDuplicatePairs(docs, "doc_id", "text", theta,
        numHashes = numHashes, bands = bands,
        candidateBudget = Some(8L * n)).count()
    }
    if (sections("auto2")) time("auto (2nd run, warm)") {
      Dedup.nearDuplicatePairsAuto(docs, "doc_id", "text", theta).count()
    }
    if (sections("fixed")) time("fixed 16x2") {
      Dedup.nearDuplicatePairs(docs, "doc_id", "text", theta).count()
    }
    if (sections("buckets")) {
      import org.apache.spark.sql.functions._
      val sh = Dedup.hashedShingleFrame(docs, "doc_id", "text", 3)
      val keys = sh.withColumn("__sig",
          Dedup.minhashSignatureFromHashesFast(col("__hhd"), numHashes))
        .select(col("__id"),
          posexplode(Dedup.lshBandKeys(col("__sig"), bands, numHashes / bands))
            .as(Seq("__b", "__key")))
      val pops = keys.groupBy("__b", "__key").count().persist()
      val top = pops.orderBy(col("count").desc).limit(10)
        .select(col("count")).collect().map(_.getLong(0)).toSeq
      println(s"[textprobe] top-10 bucket pops: $top")
      for (cap <- Seq(Long.MaxValue, 1000L, 200L, 64L, 16L)) {
        val vol = pops.filter(col("count") <= cap)
          .select(sum((col("count") * (col("count") - 1) / 2).cast("long")))
          .head().getLong(0)
        println(s"[textprobe] cap=$cap candidate volume=$vol")
      }
      pops.unpersist()
    }
    // current budgeted candidate machinery in isolation (no
    // verification) — the fastcand comparison baseline
    if (sections("candbudget")) {
      val sh = Dedup.hashedShingleFrame(docs, "doc_id", "text", 3).persist()
      time("candbudget: candidates") {
        Dedup.candidatePairsFromHashSets(sh, numHashes, bands, None,
          Some(8L * n)).count()
      }
      sh.unpersist()
    }
    // candidate volume + cost under OPH signatures (same budget) — the
    // densified-copy band correlation evidence
    if (sections("candoph")) {
      val sh = Dedup.hashedShingleFrame(docs, "doc_id", "text", 3).persist()
      time("candoph: candidates") {
        Dedup.candidatePairsFromHashSets(sh, numHashes, bands, None,
          Some(8L * n), oph = true).count()
      }
      sh.unpersist()
    }
    // interleaved warm A/B: candbudget vs fastcand, 2 passes each
    if (sections("ab")) {
      for (pass <- 1 to 2) {
        val sh = Dedup.hashedShingleFrame(docs, "doc_id", "text", 3).persist()
        time(s"ab$pass candbudget") {
          Dedup.candidatePairsFromHashSets(sh, numHashes, bands, None,
            Some(8L * n)).count()
        }
        sh.unpersist()
      }
    }
    // prototype: bucket-aggregated candidate generation — ONE shuffle
    // (groupBy bucket, collect ids) + in-plan pair expansion, instead
    // of window-annotate + sort-merge self-join over the banded rows
    if (sections("fastcand")) {
      import org.apache.spark.sql.functions._
      val budget = 8L * n
      val passes = if (sections("ab")) Seq(1, 2) else Seq(1)
      for (pass <- passes) {
      val sh = Dedup.hashedShingleFrame(docs, "doc_id", "text", 3).persist()
      time(s"fastcand$pass: candidates") {
        val exploded = sh.withColumn("__sig",
            Dedup.minhashSignatureFromHashesFast(col("__hhd"), numHashes))
          .select(col("__id"),
            posexplode(Dedup.lshBandKeys(col("__sig"), bands, numHashes / bands))
              .as(Seq("__b", "__key")))
        val buckets = exploded.groupBy("__b", "__key")
          .agg(sort_array(collect_list(col("__id"))).as("__ids"))
          .select(col("__ids"), size(col("__ids")).as("__pop"))
          .persist()
        val cap = {
          val w = org.apache.spark.sql.expressions.Window
            .orderBy("__pop")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
          val s = buckets.groupBy("__pop").agg(count(lit(1)).as("__nb"))
            .withColumn("__vol",
              (col("__pop") * (col("__pop") - 1) / 2 * col("__nb")).cast("long"))
            .withColumn("__cum", sum(col("__vol")).over(w))
            .agg(coalesce(max(when(col("__cum") <= budget, col("__pop"))), lit(0))
              .cast("long"))
            .head().getLong(0)
          math.max(s, 8L)
        }
        val small = buckets.filter(col("__pop") <= cap && col("__pop") >= 2)
          .select(explode(flatten(transform(col("__ids"), (x, i) =>
            transform(slice(col("__ids"), i + lit(2),
              greatest(col("__pop") - i - 1, lit(0))),
              y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
          .select(col("p.id_a"), col("p.id_b"))
        val star = buckets.filter(col("__pop") > cap)
          .select(explode(slice(col("__ids"), lit(2), col("__pop") - 1)).as("id_b"),
            element_at(col("__ids"), 1).as("id_a"))
          .select(col("id_a"), col("id_b"))
        val c = small.unionByName(star).distinct().count()
        buckets.unpersist()
        c
      }
      sh.unpersist()
      }
    }
    if (sections("stages")) {
      import org.apache.spark.sql.functions._
      val sh = Dedup.hashedShingleFrame(docs, "doc_id", "text", 3)
      time("stage: shingle hashes") { sh.select(sum(size(col("__hhd")))).head().getLong(0) }
      val sig = sh.withColumn("__sig",
        Dedup.minhashSignatureFromHashesFast(col("__hhd"), numHashes))
      time("stage: + signature") { sig.select(sum(size(col("__sig")))).head().getLong(0) }
      val keys = sig.select(col("__id"),
        posexplode(Dedup.lshBandKeys(col("__sig"), bands, numHashes / bands))
          .as(Seq("__b", "__key")))
      time("stage: + band keys") { keys.count() }
      val cand = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        3, numHashes, bands)
      time("stage: candidates") { cand.count() }
    }
    spark.stop()
  }
}
