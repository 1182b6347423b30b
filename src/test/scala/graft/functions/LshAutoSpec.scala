package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The LSH parameter policy (VectorFunctions.lshParamsFor) and the
  * auto-parameterized near-dup entry point built on it: planes cap
  * bucket population (log₂ growth), tables hold candidate recall as
  * planes rise. All hashing is md5-deterministic, so whatever recall a
  * configuration achieves on a fixture is a constant, not a flake.
  */
class LshAutoSpec extends SparkTestBase {
  import spark.implicits._

  test("planes grow log2 with corpus size; tables grow to hold recall") {
    // bucket cap: expected population n / 2^planes stays <= target
    for (n <- Seq(1000L, 10000L, 100000L, 1000000L)) {
      val (_, planes) = VectorFunctions.lshParamsFor(n, 0.9, targetBucket = 150)
      assert(n.toDouble / math.pow(2.0, planes.toDouble) <= 150.0 + 1e-9,
        s"n=$n planes=$planes")
    }
    // monotone: more vectors never means fewer planes or fewer tables
    val params = Seq(1000L, 10000L, 100000L, 1000000L)
      .map(VectorFunctions.lshParamsFor(_, 0.9, 150))
    assert(params.map(_._2) == params.map(_._2).sorted)
    assert(params.map(_._1) == params.map(_._1).sorted)
    // a lower threshold (harder LSH regime) needs at least as many tables
    val (tHigh, _) = VectorFunctions.lshParamsFor(100000L, 0.9, 150)
    val (tLow, _) = VectorFunctions.lshParamsFor(100000L, 0.45, 150)
    assert(tLow >= tHigh)
    // the IVF-regime guard: a broad-similarity ask at corpus scale wants
    // thousands of tables; the policy caps instead of silently planning
    // a multi-thousand-signature explode (θ=0.45 @ 10M uncapped ≈ 4700)
    val (tCapped, _) = VectorFunctions.lshParamsFor(10000000L, 0.45, 150)
    assert(tCapped == 64, s"expected the 64-table cap, got $tCapped")
    val (tRaised, _) =
      VectorFunctions.lshParamsFor(10000000L, 0.45, 150, maxTables = 10000)
    assert(tRaised > 1000, s"uncapped regime should explode: $tRaised")
  }

  test("ivfParamsFor caps expected cell population") {
    for (n <- Seq(1000L, 20000L, 1000000L, 100000000L)) {
      val k = VectorFunctions.ivfParamsFor(n, cellTarget = 256)
      assert(n.toDouble / k <= 256.0 + 1e-9, s"n=$n k=$k")
    }
    val ks = Seq(1000L, 20000L, 1000000L).map(VectorFunctions.ivfParamsFor(_))
    assert(ks == ks.sorted)
  }

  test("auto pairs are threshold-true, deterministic, and recall brute force on the fixture") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val auto = VectorFunctions.cosineNearDupPairsAuto(
      emb, "vec_id", "embedding", threshold = 0.45)
      .select($"id_a", $"id_b", $"cos").as[(Long, Long, Double)].collect().toSet
    // every emitted pair really clears the threshold
    assert(auto.forall(_._3 >= 0.45))
    // deterministic: same plan, same pairs
    val again = VectorFunctions.cosineNearDupPairsAuto(
      emb, "vec_id", "embedding", threshold = 0.45)
      .select($"id_a", $"id_b", $"cos").as[(Long, Long, Double)].collect().toSet
    assert(auto == again)
    // brute-force truth on the small fixture; md5-deterministic hashing
    // makes the achieved recall a constant — pin it at the policy's
    // 1 - missProb floor
    val v = emb.select($"vec_id".as("id_a"), $"embedding".as("__va"))
    val w = emb.select($"vec_id".as("id_b"), $"embedding".as("__vb"))
    val truth = v.crossJoin(w).filter($"id_a" < $"id_b")
      .withColumn("cos", VectorFunctions.cosine($"__va", $"__vb"))
      .filter($"cos" >= 0.45)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val found = auto.map(p => (p._1, p._2))
    assert(truth.nonEmpty)
    val recall = found.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.95, s"recall $recall over ${truth.size} true pairs")
  }

  test("sf0.01 recall audit: auto pairs cover >= 0.85 of brute-force truth") {
    // the audit that used to ride s09's board row (the t59 treatment):
    // the board row now declares the production pair set itself, and
    // the recall floor vs the corpus^2 truth join is enforced HERE on
    // every `sbt test` — the truth side is fixture-scale work by
    // definition, which is exactly why it left the bench board
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val auto = VectorFunctions.cosineNearDupPairsAuto(
        emb, "vec_id", "embedding", threshold = 0.45)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val v = emb.select($"vec_id".as("id_a"), $"embedding".as("__va"))
    val w = emb.select($"vec_id".as("id_b"), $"embedding".as("__vb"))
    val truth = v.crossJoin(w).filter($"id_a" < $"id_b")
      .withColumn("cos", VectorFunctions.cosine($"__va", $"__vb"))
      .filter($"cos" >= 0.45)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    val recall = auto.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.85, s"recall $recall over ${truth.size} true pairs")
  }

  test("routed entry: LSH below the cap boundary, identical to the auto path") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    // default policy params at n=500 want ~16 tables — comfortably
    // under the cap, so the router must take the LSH branch and emit
    // exactly cosineNearDupPairsAuto's pair set
    val pol = VectorFunctions.nearDupRoutePolicy(500L, 0.45)
    assert(pol.route == "lsh" && pol.wanted <= pol.cap, pol.toString)
    // the route carries its recall CONTRACT (r13 verdict item 3a):
    // LSH branch promises >= 1 - missProb by the table policy
    assert(pol.recallRegime == "table-policy" && pol.recallFloor == 0.95,
      pol.toString)
    val routed = VectorFunctions.nearDupPairsRouted(
      emb, "vec_id", "embedding", threshold = 0.45)
    assert(routed.select($"route").distinct()
      .as[String].collect().toSeq == Seq("lsh"))
    val routedPairs = routed.select($"id_a", $"id_b")
      .as[(Long, Long)].collect().toSet
    val auto = VectorFunctions.cosineNearDupPairsAuto(
        emb, "vec_id", "embedding", threshold = 0.45)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(routedPairs == auto)
    spark.catalog.clearCache()
  }

  test("routed entry: cap regime routes to IVF cells where the auto entry refuses, recall floor holds") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    // θ=0.45 at 99.5% recall with tight buckets: the policy wants more
    // tables than the cap at n=500 (69 > 64) — the exact regime where
    // cosineNearDupPairsAuto throws (FixedParamFenceSpec pins that);
    // the router must turn it into a working IVF-cell plan instead
    val pol = VectorFunctions.nearDupRoutePolicy(500L, 0.45,
      targetBucket = 10, missProb = 0.005)
    assert(pol.route == "ivf" && pol.wanted > pol.cap, pol.toString)
    // crossing the boundary is surfaced, not silent: the policy names
    // the weaker cell-coverage regime, and recallFloor is 0.0 — NO
    // guaranteed bound (measured recall is scale-dependent: 1.000 at
    // fixture kc=4, 0.420 at 10x kc=79) — so a `recallFloor >= x` gate
    // fails onto the stronger family instead of passing on a fixture pin
    assert(pol.recallRegime == "cell-coverage" && pol.recallFloor == 0.0,
      pol.toString)
    intercept[IllegalArgumentException] {
      VectorFunctions.cosineNearDupPairsAuto(emb, "vec_id", "embedding",
        threshold = 0.45, targetBucket = 10, missProb = 0.005)
    }
    val routed = VectorFunctions.nearDupPairsRouted(emb, "vec_id",
        "embedding", threshold = 0.45, targetBucket = 10, missProb = 0.005)
      .select($"id_a", $"id_b", $"cos", $"route")
      .as[(Long, Long, Double, String)].collect()
    assert(routed.nonEmpty && routed.forall(_._4 == "ivf"))
    // every emitted pair is exact-verified and ordered
    assert(routed.forall(p => p._3 >= 0.45 && p._1 < p._2))
    // deterministic: k-means init/Lloyd and assignment are
    // comparison- or integer-exact, so the pair set is a constant
    val again = VectorFunctions.nearDupPairsRouted(emb, "vec_id",
        "embedding", threshold = 0.45, targetBucket = 10, missProb = 0.005)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(routed.map(p => (p._1, p._2)).toSet == again)
    // recall floor vs brute-force truth: IVF-branch recall is
    // cell-coverage-bounded by design (a true pair is missed only if
    // NONE of either side's top-nAssign cells is shared; single
    // assignment measured 0.50 here, top-2 0.857, top-3 — the round-14
    // default — 14/14 = 1.000) — the floor pins the MEASURED constant
    // so a regression in training/assignment/pairing shows up. It is a
    // FIXTURE pin, not a scale guarantee: RouteProbe measured 0.420 at
    // the 10× probe's kc=79 (ROADMAP round-14 table) — the honest
    // price of the routed regime next to LSH's 1−missProb
    val v = emb.select($"vec_id".as("id_a"), $"embedding".as("__va"))
    val w = emb.select($"vec_id".as("id_b"), $"embedding".as("__vb"))
    val truth = v.crossJoin(w).filter($"id_a" < $"id_b")
      .withColumn("cos", VectorFunctions.cosine($"__va", $"__vb"))
      .filter($"cos" >= 0.45)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    val recall = routed.map(p => (p._1, p._2)).toSet
      .intersect(truth).size.toDouble / truth.size
    assert(recall >= VectorFunctions.IvfRoutedRecallFloor,
      s"routed recall $recall over ${truth.size} true pairs")
    spark.catalog.clearCache()
  }

  test("routed IVF plan: theta filter fused into the ONE cell join, no pair-sized re-join") {
    // the 255→52 s lesson at the 100× probe: the pair set must never
    // cross an exchange before the θ filter. Pin the shape — exactly
    // one top-level join (the cid cell join) carrying the cosine
    // threshold in its condition, and no vector re-attach joins above
    // it (the distinct runs at RESULT cardinality, above the filter).
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val (out, assigned) = VectorFunctions.ivfCellPairsFrame(
      emb, "vec_id", "embedding", 0.45, kc = 4)
    out.collect() // finalize the adaptive plan
    val plan = out.queryExecution.executedPlan.toString
    // outer plan only: drop the cached assignment's nested plan (it
    // owns a LABELED centroid-broadcast cross join) and AQE's
    // "== Initial Plan ==" echo
    val outer = plan.split("\n")
      .takeWhile(l => !l.contains("InMemoryRelation"))
      .filterNot(_.contains("ReusedExchange"))
    val joins = outer.filter(l => l.contains("Join"))
    assert(joins.length == 1, s"expected 1 outer join:\n${joins.mkString("\n")}")
    assert(joins.head.contains("[cid") || joins.head.contains("cid#"),
      s"join not on cid: ${joins.head}")
    // θ reaches the join itself (fused condition) — nothing pair-sized
    // runs unfiltered
    assert(joins.head.contains(">= 0.45"),
      s"cosine threshold not fused into the join: ${joins.head}")
    assigned.unpersist()
    spark.catalog.clearCache()
  }

  test("hot-cell salted blocking is bit-identical to the unblocked cell join") {
    // r13 verdict item 4: the blocking only changes WHERE within-cell
    // pairs are verified (⌈pop/blockTarget⌉ salted tasks instead of
    // one), never WHICH pairs exist — each pair meets exactly once per
    // shared cell in the b-side member's block. Forcing a tiny
    // blockTarget on the fixture drives every cell through the
    // multi-block path; the pair set must not move.
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    def pairs(blockTarget: Int) = {
      val (out, assigned) = VectorFunctions.ivfCellPairsFrame(
        emb, "vec_id", "embedding", 0.45, kc = 4, blockTarget = blockTarget)
      val got = out.select($"id_a", $"id_b", $"cos")
        .as[(Long, Long, Double)].collect().toSet
      assigned.unpersist()
      got
    }
    val unblocked = pairs(blockTarget = 1 << 20) // pop << target: 1 block
    val blocked = pairs(blockTarget = 32)        // ~250/cell: 8 blocks
    assert(blocked == unblocked && blocked.nonEmpty)
    spark.catalog.clearCache()
  }

  test("two-level top-k assignment at full probe equals flat multi-probe assignment") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val kc = 16
    val cents = VectorFunctions.ivfTrainCentroids(
      emb, "vec_id", "embedding", kc, sampleSize = 256)
    val flat = VectorFunctions.ivfAssign(
        emb, "vec_id", "embedding", cents, nprobe = 2)
      .select($"__aid", $"__cid").as[(Long, Long)].collect().toSet
    // coarseProbe >= #supers (ceil(sqrt(16)) = 4): every child is
    // scored, so the top-2 list must match the flat window exactly
    val full = VectorFunctions.ivfAssignTwoLevelTopK(
        emb, "vec_id", "embedding", cents, coarseProbe = 16, nAssign = 2)
      .select($"__aid", $"__cid").as[(Long, Long)].collect().toSet
    assert(full == flat)
    // partial probe: approximate, but home-cell agreement stays high
    // and output stays exactly 2 cells per vector
    val part = VectorFunctions.ivfAssignTwoLevelTopK(
        emb, "vec_id", "embedding", cents, coarseProbe = 2, nAssign = 2)
      .select($"__aid", $"__cid").as[(Long, Long)].collect()
    val n = emb.count()
    assert(part.length == 2 * n)
    val agree = part.toSet.intersect(flat).size.toDouble / flat.size
    assert(agree >= 0.75, s"partial-probe agreement $agree")
  }
}
