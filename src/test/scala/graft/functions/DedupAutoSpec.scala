package graft.functions

import graft.SparkTestBase

/** The MinHash banding policy (Dedup.minhashParamsFor) and the
  * auto-parameterized near-dup entry built on it: rows-per-band grow
  * with log n (candidate volume stays linear), bands grow to hold the
  * recall floor as rows rise. All hashing is md5-deterministic, so the
  * achieved recall on a fixture is a constant, not a flake.
  */
class DedupAutoSpec extends SparkTestBase {
  import spark.implicits._

  test("rows grow with log n, bands hold recall, candidates stay linear") {
    val theta = 0.8
    val ns = Seq(1000L, 100000L, 10000000L, 1000000000L)
    val params = ns.map(Dedup.minhashParamsFor(_, theta))
    val rows = params.map { case (h, b) => h / b }
    // r monotone in n — the contract a fixed config misses
    assert(rows == rows.sorted && rows.distinct.size > 1, s"rows: $rows")
    for ((n, (h, b)) <- ns.zip(params)) {
      val r = h / b
      // recall floor from the S-curve: 1-(1-θ^r)^b ≥ 0.95, held up to
      // a BILLION docs before the band cap would bite
      val recall = 1.0 - math.pow(1.0 - math.pow(theta, r.toDouble), b.toDouble)
      assert(recall >= 0.95, s"n=$n r=$r b=$b recall=$recall")
      // linear-candidate contract at the background similarity θ/4:
      // expected candidates per doc ≈ (n/2)·b·s₀^r ≤ fanout
      val perDoc = n / 2.0 * b * math.pow(theta / 4.0, r.toDouble)
      assert(perDoc <= 8.0 + 1e-9, s"n=$n r=$r b=$b perDoc=$perDoc")
    }
    // the cap regime: a broad-similarity ask at corpus scale cannot hold
    // the recall floor — bands pin at the cap instead of exploding
    val (hCap, bCap) = Dedup.minhashParamsFor(100000000L, 0.3)
    assert(bCap == 128, s"expected the 128-band cap, got $bCap (hashes $hCap)")
  }

  test("auto pairs are threshold-true and recall brute-force Jaccard") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val auto = Dedup.nearDuplicatePairsAuto(docs, "doc_id", "text",
        threshold = 0.8)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(auto.forall(_._3 >= 0.8))
    // brute-force truth over all C(500,2) shingle-set pairs
    val sh = Dedup.hashedShingleFrame(docs, "doc_id", "text", shingle = 3)
    val truth = sh.select($"__id".as("id_a"), $"__hhd".as("__ha"))
      .crossJoin(sh.select($"__id".as("id_b"), $"__hhd".as("__hb")))
      .filter($"id_a" < $"id_b")
      .withColumn("j", Dedup.jaccardLongSets($"__ha", $"__hb", assumeSorted = true))
      .filter($"j" >= 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    val found = auto.map(p => (p._1, p._2))
    val recall = found.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall over ${truth.size} true pairs")
    spark.catalog.clearCache()
  }

  test("sf0.01 recall audit: auto pairs cover >= 0.85 of prefix-filter truth") {
    // the audit that used to ride t59's board row (r11 verdict item 2):
    // the board row now declares the production pair set itself, and
    // the recall floor is enforced HERE on every `sbt test` — truth via
    // the exact AllPairs/PPJoin prefix join (recall 1 by theorem,
    // SsJoinSpec-pinned), not a corpus^2 cross join
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val auto = Dedup.nearDuplicatePairsAuto(docs, "doc_id", "text",
        threshold = 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val sh = Dedup.hashedShingleFrame(docs, "doc_id", "text", 3)
    val truth = Dedup.prefixJaccardJoin(sh, "__id", "__hhd", 0.8,
        assumeSorted = true)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    val recall = auto.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.85, s"recall $recall over ${truth.size} true pairs")
    spark.catalog.clearCache()
  }

  test("a mega duplicate clique survives the candidate budget cut connected") {
    // 300 copies of one template in a 500-doc corpus: every copy's band
    // key is identical in EVERY band, so the clique's buckets blow any
    // linear budget and a hard drop would silently lose the whole
    // clique — the star-pair degradation must keep it as ONE group
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val clique = spark.range(300)
      .select(($"id" + 100000L).as("doc_id"),
        org.apache.spark.sql.functions.lit(
          "the same boilerplate template page duplicated across the crawl")
          .as("text"))
    val pairs = Dedup.nearDuplicatePairsAuto(docs.unionByName(clique),
        "doc_id", "text", threshold = 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val cliqueIds = (100000L until 100300L).toSet
    // connectivity: union-find over the emitted pairs must place all
    // 300 clique members in one component
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val roots = cliqueIds.map(find)
    assert(roots.size == 1,
      s"mega clique split into ${roots.size} components under the budget cut")
    // and the candidate stream stayed linear-ish, not the 300·299/2
    // all-pairs explosion the budget exists to prevent
    assert(pairs.length < 20000, s"candidate volume ${pairs.length}")
    spark.catalog.clearCache()
  }

  test("OPH signature: deterministic, codegen==eval reference, estimator tracks Jaccard") {
    val old = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val k = 64
      // two sets with known Jaccard 80/120 = 2/3, plus an identical twin
      val a = (1L to 100L).toArray
      val b = (21L to 120L).toArray
      val df = Seq((1L, a), (2L, b), (3L, a)).toDF("__id", "__hhd")
        .withColumn("sig", Dedup.minhashSignatureFromHashesOPH($"__hhd", k))
      val sigs = df.select($"__id", $"sig").as[(Long, Seq[Long])]
        .collect().toMap
      // pure-Scala reference of the densified OPH construction
      def ref(set: Array[Long]): Seq[Long] = {
        val A = Dedup.minhashA(0); val B = Dedup.minhashB(0)
        val mins = Array.fill[Long](k)(Long.MaxValue)
        set.foreach { h =>
          val u = (A * h + B) % Dedup.MinhashPrime
          val bin = (u % k).toInt
          if (u < mins(bin)) mins(bin) = u
        }
        (0 until k).map { i =>
          if (mins(i) != Long.MaxValue) mins(i)
          else {
            val d = (1 until k).find(d => mins((i + d) % k) != Long.MaxValue).get
            mins((i + d) % k) + d.toLong * Dedup.MinhashPrime
          }
        }
      }
      assert(sigs(1L) == ref(a) && sigs(2L) == ref(b),
        "codegen'd OPH signature diverges from the reference construction")
      assert(sigs(1L) == sigs(3L), "identical sets must sign identically")
      // unbiased estimator: matching positions / k ≈ J = 2/3
      // (md5-free affine permutation here, so this is a fixed number,
      // not a flake; tolerance covers k=64 sampling variance)
      val est = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y }.toDouble / k
      assert(math.abs(est - 2.0 / 3.0) < 0.2, s"OPH estimate $est for J=2/3")
      // empty set signs null, matching the classic signatures
      val nullSig = Seq((9L, Array.empty[Long])).toDF("__id", "__hhd")
        .select(Dedup.minhashSignatureFromHashesOPH($"__hhd", k)).head()
      assert(nullSig.isNullAt(0))
    } finally spark.conf.set("spark.sql.codegen.fallback", old)
  }
}
