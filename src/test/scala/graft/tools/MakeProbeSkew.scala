package graft.tools

import org.apache.spark.sql.functions._

/** Skew-shaped probe (round-8 verdict item 2): MakeProbe's replicas are
  * uniform, so every prior probe tested VOLUME; this overlays the three
  * hot structures a real corpus develops, on top of the same n-replica
  * base:
  *
  *  - HOT JOIN KEY: every lineitem row with l_orderkey % 11 == 0 (~9%
  *    of the fact table) is remapped to supplier key 1 — one join key
  *    carrying ~900× the average key's rows, the q24 salting scenario.
  *  - HOT BAND BUCKET: a near-dup mega-cluster of `hot` documents (one
  *    base text + a tiny unique suffix each, so exact 3-gram Jaccard
  *    stays ≈1): ONE LSH band bucket holds the whole cluster, and its
  *    intra-cluster pair count is quadratic in the cluster size — by
  *    definition, since the pairs are real. Sequential ids straddle
  *    t49's parity split, so the cross-snapshot band join gets the
  *    same hot bucket on both sides.
  *  - HOT IVF CELL: `hot` embeddings that are EXACT directional copies
  *    of one base vector (scaled — cosine is scale-blind), so every
  *    copy lands in the same centroid cell regardless of k: s08's
  *    cell-bounded self-join meets one cell with a quadratic interior.
  *
  * Usage: sbt "Test/runMain graft.tools.MakeProbeSkew [src] [out] [n] [hot]"
  * then SPARK_GRAFT_ONLY=q24…,t05,… SPARK_GRAFT_SF_DIR=<out> Bench;
  * compare against the uniform probe of the same n (ROADMAP table).
  */
object MakeProbeSkew {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/probeskew")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val hot = args.lift(3).map(_.toInt).getOrElse(500)
    // the non-duplicate topic cell sizes separately: measuring ITS
    // skew needs a population past the blocking threshold (≥ several
    // × blockTarget) without inflating the copy-cluster overlays'
    // real quadratic OUTPUT alongside
    val hotTopic = args.lift(4).map(_.toInt).getOrElse(hot)
    val spark = MakeProbe.probeSession()
    import spark.implicits._
    MakeProbe.build(spark, src, out, n)

    // ids far above every replica's shifted range (shift·(n-1) + base ids)
    val hotIdBase = 1000000000000000L

    // hot join key: localCheckpoint breaks lineage off the files being
    // overwritten (Spark cannot overwrite an input path in-flight)
    val li = spark.read.parquet(s"$out/lineitem.parquet")
      .withColumn("l_suppkey",
        when(col("l_orderkey") % 11 === 0, lit(1L)).otherwise(col("l_suppkey")))
      .localCheckpoint(true)
    li.write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // hot near-dup cluster: suffix each copy so texts are near- but not
    // verbatim-identical (exact dedup keeps them distinct; near-dup,
    // band buckets and connected components see one mega-cluster)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val base = docs.filter(col("doc_id") === 0).select(col("text"), col("lang"),
      col("source")).head()
    val cluster = (0 until hot).map { i =>
      (hotIdBase + i, base.getString(0) + s" zqx$i", base.getString(1),
        base.getString(2), (base.getString(0).length + 5 + i.toString.length).toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.unionByName(cluster).localCheckpoint(true)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // hot IVF cell: exact directional copies (scaled) of one vector
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val baseVec = emb.filter(col("vec_id") === 0)
      .select(col("embedding"), col("label")).head()
    val baseArr = baseVec.getSeq[Float](0)
    val cell = (0 until hot).map { i =>
      (hotIdBase + i, baseArr.map(x => x * (1.0f + i / 10000.0f)),
        baseVec.getInt(1))
    }.toDF("vec_id", "embedding", "label")

    // hot NON-DUPLICATE cell (r13 verdict item 4's missing overlay):
    // the copies above measure OUTPUT growth — their pairs are real
    // cos=1.0 results any correct enumerator must emit. This cluster
    // measures pure verification SKEW: `hot` distinct vectors sharing
    // one topic direction u with per-vector noise sized so pairwise
    // cosine ≈ w²/(w²+s²) = 0.30 < θ=0.45 (near-zero output), yet
    // every vector's dominant centroid is u's cell (cos to it ≈ 0.55
    // vs ~|N(0,1)|/√dims ≈ 0.1 to random others) — one cell with a
    // quadratic interior and nothing to show for it, the exact
    // one-task straggler ivfCellPairsFrame's salted blocking bounds.
    val hotIdBase2 = hotIdBase + 10000000L
    val dims = baseArr.length
    val uNorm = math.sqrt(baseArr.map(x => x.toDouble * x).sum)
    val noiseScale = 1.53 // s/w for cos ≈ 1/(1+s²) ≈ 0.30
    val topic = (0 until hotTopic).map { i =>
      val rnd = new java.util.Random(7919L * (i + 1)) // deterministic
      val g = Array.fill(dims)(rnd.nextGaussian())
      val gNorm = math.sqrt(g.map(x => x * x).sum)
      val v = baseArr.indices.map(d =>
        (baseArr(d) / uNorm + noiseScale * g(d) / gNorm).toFloat)
      (hotIdBase2 + i, v, baseVec.getInt(1))
    }.toDF("vec_id", "embedding", "label")

    emb.unionByName(cell).unionByName(topic).localCheckpoint(true)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    spark.stop()
  }
}
