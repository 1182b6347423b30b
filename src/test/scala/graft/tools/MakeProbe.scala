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
    val spark = probeSession()
    build(spark, src, out, n)
    spark.stop()
  }

  def probeSession(): SparkSession = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def build(spark: SparkSession, src: String, out: String, n: Int): Unit = {
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
    // affine char cipher per replica (see the documents block below for
    // the full rationale) — also applied to part names, whose verbatim
    // copies would otherwise hand every part n-1 distance-0 twins and
    // push the fuzzy join's (t35) pair count quadratic in n
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val digits = "0123456789"
    val cop26 = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    val cop10 = Seq(1, 3, 7, 9)
    def cipher(i: Int): (String, String) = {
      val aL = cop26((i / 26) % cop26.length); val bL = i % 26
      val aD = cop10((i / 10) % cop10.length); val bD = i % 10
      val mapL = lower.indices.map(j => lower((aL * j + bL) % 26)).mkString
      val mapD = digits.indices.map(j => digits((aD * j + bD) % 10)).mkString
      (lower + lower.toUpperCase + digits,
        mapL + mapL.toUpperCase + mapD)
    }
    def cipherCol(df: org.apache.spark.sql.DataFrame, c: String, i: Int) =
      if (i == 0) df
      else { val (from, to) = cipher(i); df.withColumn(c, translate(col(c), from, to)) }

    rep("orders", Seq("o_orderkey", "o_custkey"))
    rep("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    rep("customer", Seq("c_custkey"))
    rep("supplier", Seq("s_suppkey"))
    locally {
      val df = spark.read.parquet(s"$src/part.parquet")
      (0 until n).map { i =>
        cipherCol(df.withColumn("p_partkey", col("p_partkey") + lit(shift * i)),
          "p_name", i)
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/part.parquet")
    }
    // documents: id shifts alone leave TEXT identical across replicas,
    // so every doc gains n-1 verbatim twins — near-dup pair counts and
    // LSH bucket populations then grow QUADRATICALLY in n, a probe
    // artifact no real corpus has (10× mostly hid it; at 30× it
    // drowns the signal: t04 went ~80× and connected components
    // stopped converging through cross-replica dup chains). And
    // because shingles are CHARACTER n-grams, token-level tags don't
    // help — most trigrams inside a word survive a suffix. Each
    // replica instead gets its own AFFINE CHARACTER CIPHER (separate
    // affine maps on the 26 letters — applied case-consistently — and
    // the 10 digits, via one `translate`): a bijection on characters
    // keeps every replica's char-trigram structure, token counts,
    // distinct ratios and word-bigram vocabulary exactly isomorphic to
    // the original, while cross-replica trigram overlap collapses to
    // punctuation-only — so dup structure AND vocab scale linearly.
    // (Language-ID labels ciphered replicas 'unknown'; none of the
    // heavy composites gate their compute volume on detection, so only
    // the gate's cheap reason distribution shifts.)
    locally {
      val df = spark.read.parquet(s"$src/documents.parquet")
      (0 until n).map { i =>
        cipherCol(df.withColumn("doc_id", col("doc_id") + lit(shift * i)),
          "text", i)
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }
    // embeddings: id shifts alone leave the VECTORS identical across
    // replicas — every vector gains n-1 exact twins, so cosine
    // near-dup pairs (t10), LSH/IVF bucket populations and kNN cells
    // (s02/s08/t43) grow QUADRATICALLY in n, the same probe artifact
    // the documents cipher fixes for text (first observed as t10 going
    // ~90x at the 10x probe). Each replica i>0 instead gets a SIGNED
    // COORDINATE PERMUTATION (odd stride + per-coordinate sign flips):
    // an exact isometry of cosine, so every replica's intra-replica
    // similarity structure is bit-identical in magnitude to the
    // original, while cross-replica cosines decorrelate to generic
    // near-orthogonality — dup/bucket structure scales linearly.
    locally {
      val df = spark.read.parquet(s"$src/embeddings.parquet")
      val d = 64
      (0 until n).map { i =>
        val shifted = df.withColumn("vec_id", col("vec_id") + lit(shift * i))
        if (i == 0) shifted
        else {
          val p = 2 * i + 3 // odd => coprime with 64
          shifted.withColumn("embedding", expr(
            s"transform(sequence(0, ${d - 1}), j -> CAST(" +
              s"element_at(embedding, CAST((j * $p + $i) % $d AS INT) + 1) * " +
              s"(CASE WHEN (j * 7 + $i) % 2 = 0 THEN 1.0 ELSE -1.0 END) AS FLOAT))"))
        }
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    rep("events", Seq("event_id", "user_id"))
    Seq("nation", "region").foreach { name =>
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    // stamp the replication factor so Bench can enforce its memory
    // contract (round-10 lesson: a 100x sweep under the 8 GB default
    // heap OOM'd the heavy dedup tail and took 10 successors down
    // with the SparkContext — the harness, not the operator's memory
    // of a knob, must own that check)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "_probe_meta.json"),
      s"""{"source":"$src","factor":$n}""")
  }
}
