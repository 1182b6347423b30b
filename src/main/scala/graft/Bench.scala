package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Queries materialize through the `noop` sink —
  * a count() would let Catalyst prune the projected columns and
  * under-measure scan-shaped queries. A warm-up pass at sf0.001 takes
  * JIT/codegen/classloading out of the first timed query.
  *
  * Each query is timed SPARK_GRAFT_RUNS times (default 3) and the
  * median reported: single-shot timing at these sub-2s scales swings
  * ±70% run to run (GC, JIT recompiles), which can't distinguish a
  * regression from noise.
  *
  * The runs are INTERLEAVED — the suite executes as SPARK_GRAFT_RUNS
  * complete passes, and each query's median is taken across passes —
  * not 3 back-to-back runs per query. Back-to-back runs put one
  * query's whole sample in a single ~5s wall-clock window, so a
  * co-tenant load spike poisons a contiguous alphabetical block and
  * its medians (BENCH_r05 showed phantom 4-8x regressions this way:
  * t24 "14.9s" under load vs 2.9s isolated). Spreading a query's
  * samples across the full suite duration means a transient spike
  * inflates at most one of its samples, which the median discards.
  */
object Bench {

  /** Replication factor of a MakeProbe-built directory (its
    * `_probe_meta.json` stamp), 1 for plain sf fixtures or pre-stamp
    * probe dirs.
    */
  private[graft] def probeFactor(sfDir: String): Int = {
    val p = java.nio.file.Paths.get(sfDir, "_probe_meta.json")
    if (!java.nio.file.Files.exists(p)) 1
    else {
      val m = "\"factor\"\\s*:\\s*(\\d+)".r
        .findFirstMatchIn(java.nio.file.Files.readString(p))
      m.map(_.group(1).toInt).getOrElse(1)
    }
  }

  /** Heavy index-LIFECYCLE rows (persisted-index build/append/serve and
    * the stateful-machinery rows): benched in a SECOND phase after the
    * common set finishes (r13 verdict item 2). Interleaving them with
    * the light rows let their multi-second builds contend with
    * alphabetical neighbors' samples — r13's artifact over-reported
    * untouched rows by up to ~40% (t71 13.5 s in-suite vs 9.79 s
    * isolated, q-family ±14% with zero code change). Two phases keep
    * the common set's samples free of lifecycle contention while the
    * heavy rows still price their declared cost.
    */
  private[graft] val HeavyRows = Set(
    "e35_mg_heavy_hitters", "e36_incremental_groups",
    "e37_bus_signature_index", "e38_bus_vector_index",
    "e39_bus_text_index",
    "t71_signature_index", "t71b_signature_serve",
    "t72_signature_delete", "t73_text_delete", "s15_ivf_delete")

  /** Round-over-round drift fence (r13 verdict item 2): medians that
    * moved more than this factor vs the committed reference
    * (`tools/bench_reference.json`, refreshed each round) are
    * RE-MEASURED in isolation after the suite and flagged `isolated`
    * in the output — so a contention-inflated reading can never ship
    * as a regression without the isolated counter-evidence riding the
    * same artifact.
    */
  private[graft] val DriftFactor = 1.25

  /** Isolated re-measures are budgeted by ESTIMATED TIME, not a flat
    * count: most board rows are sub-second, so a loaded-box run where
    * 100+ rows drift (observed: 129/210 under co-tenant load) can still
    * re-measure the bulk of them for ~2 minutes, while one 20 s
    * lifecycle row doesn't eat the whole budget. Cheapest-first
    * ordering maximizes rows corrected per second; the count cap is a
    * backstop.
    */
  private val IsolatedBudgetSec = 120.0
  private val MaxIsolatedRemeasures = 64

  private[graft] def loadReference(sfDir: String,
      path: String = "tools/bench_reference.json"): Map[String, Double] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return Map.empty
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(p))
      // the reference is only comparable at ITS scale factor
      if (node.get("sf").asText() != sfDir) return Map.empty
      val m = node.get("medians")
      val it = m.fieldNames()
      val b = Map.newBuilder[String, Double]
      while (it.hasNext) { val k = it.next(); b += k -> m.get(k).asDouble() }
      b.result()
    } catch { case _: Throwable => Map.empty }
  }

  /** The probe memory contract (round-10 lesson: the 100× sweep under
    * the default 8 GB heap OOM'd at the heavy dedup tail and the dead
    * SparkContext took 10 subsequent queries with it — an environment
    * knob the harness must own, not the operator). local[*] puts the
    * whole "cluster" in ONE heap, so required memory scales with the
    * probe factor: ~0.5 GiB per replication decade unit, floor 8
    * (100× → 50 GiB, matching the 64 GiB that cleared the round-10
    * tail; ≤10× runs at the default). Refuses to start rather than
    * die mid-suite; SPARK_GRAFT_FORCE_HEAP=1 overrides for deliberate
    * under-heap experiments.
    */
  private[graft] def requiredGiB(factor: Int): Long =
    math.max(8L, factor / 2L)

  private def enforceHeapContract(sfDir: String): Unit = {
    val factor = probeFactor(sfDir)
    // plain sf fixtures (factor 1) ran fine under default heaps long
    // before this guard existed — the contract is about PROBE factors,
    // so an un-stamped dir must never refuse
    if (factor <= 1) return
    val requiredGiB = this.requiredGiB(factor)
    val heapGiB = Runtime.getRuntime.maxMemory().toDouble / (1L << 30)
    // maxMemory under-reports Xmx by a survivor-space correction —
    // allow ~15% slack so Xmx=8g passes an 8 GiB floor
    if (heapGiB < requiredGiB * 0.85 &&
        !sys.env.contains("SPARK_GRAFT_FORCE_HEAP")) {
      System.err.println(
        f"[bench] REFUSING to start: $sfDir is a ${factor}x probe needing " +
          f"~$requiredGiB GiB heap, JVM has $heapGiB%.1f GiB. " +
          s"Set SPARK_DRIVER_MEM=${requiredGiB}g (forked-JVM -Xmx; " +
          "SBT_OPTS does NOT reach the fork) or " +
          "SPARK_GRAFT_FORCE_HEAP=1 to override.")
      sys.exit(2)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    enforceHeapContract(sfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // SPARK_GRAFT_INITPARTS widens AQE's initial shuffle width for
      // probe-scale corpora: a billion-row candidate exchange at 32
      // partitions puts ~30M rows in one sorter whose pointer array
      // can no longer even spill (measured: auto-LSH at 200k vectors
      // SPILL_OOM'd a 64 g heap at 32 partitions; runs at 256 — AQE
      // then coalesces small stages back down). Deliberately NOT the
      // sf0.1 default: per-stage overhead costs iterative queries
      // ~30% at small data (t23 3.3→4.4 s measured), the same reason
      // a real cluster tunes initialPartitionNum to fleet size, not
      // one constant.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITPARTS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // default 4MB open-cost floors split size, so byte-small files
      // become 1-2 partitions even when per-row work is CPU-bound
      // (regex-heavy text ops): a 5MB documents file serialized the
      // curation gate onto 2 of 32 cores. 128KB lets small hot tables
      // split to full parallelism; a no-op for scale-sized files.
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()

    // SPARK_GRAFT_ONLY=q20_date_arith,t05_near_dup_pairs narrows the
    // suite for focused investigation; unset = full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { n =>
      try materialize(n, "/root/testdata/sf0.001")
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()

    // a failed query must NOT bench as a plausible small time: record
    // -1 and list it under "failed" so a regression is visible in the
    // output JSON, not hidden in a healthy-looking total
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val times = scala.collection.mutable.Map
      .empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    def timeOnce(name: String, pass: String): Double = {
      val t0 = System.nanoTime()
      val ok = try { materialize(name, sfDir); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        false
      }
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // unpersist AFTER the clock stops: cache teardown is harness
      // hygiene between runs, not part of the query's cost
      spark.catalog.clearCache()
      // per-run times to stderr so a weird median is explainable
      // from the round's log instead of needing a re-run
      System.err.println(f"[bench] pass $pass $name: $dt%.3f")
      dt
    }
    // PHASE 1: the common set, interleaved. PHASE 2: the heavy
    // index-lifecycle rows, after the common samples are all taken —
    // their multi-second builds no longer contend with light rows
    // (r13 verdict item 2).
    val (heavy, common) = names.partition(HeavyRows.contains)
    for (pass <- 1 to runs; name <- common)
      times(name) = times(name) :+ timeOnce(name, pass.toString)
    for (pass <- 1 to runs; name <- heavy)
      times(name) = times(name) :+ timeOnce(name, s"heavy-$pass")
    def median(ts: Vector[Double]): Double =
      if (ts.exists(_ < 0)) -1.0 else ts.sorted.apply(ts.size / 2)
    // Drift fence: any median > DriftFactor × the committed reference
    // is re-measured ALONE (suite idle) and the isolated median ships
    // instead, flagged — contention inflation self-corrects in the
    // artifact rather than reading as a regression (r13: t71 13.5 s
    // in-suite vs 9.79 s isolated, untouched q-rows ±14%).
    val reference = loadReference(sfDir)
    val drifted = names.filter { n =>
      val m = median(times(n))
      m >= 0 && reference.get(n).exists(r => r > 0 && m / r > DriftFactor)
    }
    // cheapest-first within a wall-clock budget, count-capped as a
    // backstop. Cost estimate uses the OBSERVED in-suite median, not
    // the clean reference: a genuinely regressed row re-runs at its
    // regressed speed, and estimating with the reference would blow the
    // budget severalfold on exactly the runs the fence targets.
    // the count cap applies INSIDE the selection loop: a row rejected
    // by the cap must not have debited the time budget first (r14
    // ADVICE item 4 — takeWhile-then-take under-selected cheap drifted
    // rows and made the 'dropped' log wrong)
    val byCost = drifted.sortBy(n => median(times(n)))
    val selected = {
      var budget = IsolatedBudgetSec
      var accepted = 0
      byCost.takeWhile { n =>
        val est = runs * median(times(n))
        val fits = accepted < MaxIsolatedRemeasures && est <= budget
        if (fits) { budget -= est; accepted += 1 }
        fits
      }
    }
    if (drifted.size > selected.size)
      System.err.println(s"[bench] drift re-measure budget " +
        s"(${IsolatedBudgetSec}s / max $MaxIsolatedRemeasures) covered " +
        s"${selected.size} of ${drifted.size} drifted rows — dropped: " +
        s"${(drifted.toSet -- selected.toSet).toSeq.sorted.mkString(",")}")
    // only rows whose re-measure actually REPLACED the suite median are
    // reported `isolated` — a failed re-run keeps the in-suite value
    // and must not be mislabeled as isolated counter-evidence
    val isolated = selected.filter { n =>
      val before = median(times(n))
      val iso = (1 to runs).map(p => timeOnce(n, s"isolated-$p")).toVector
      if (iso.exists(_ < 0)) {
        System.err.println(s"[bench] $n isolated re-measure failed a pass " +
          s"— keeping the in-suite median $before")
        false
      } else {
        times(n) = iso
        System.err.println(f"[bench] $n drifted ${before / reference(n)}%.2fx " +
          f"vs reference ${reference(n)}%.3f — isolated median " +
          f"${median(iso)}%.3f replaces in-suite $before%.3f")
        true
      }
    }
    val results = names.map(name => name -> median(times(name)))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // contamination self-evidence: alongside each median, emit the
    // per-query MIN (the least-loaded pass — closest to true cost) and
    // the max/min spread. Sustained external load inflates every pass,
    // which the interleaved median can't defeat (round-5/round-7
    // incidents: phantom 4-16x "regressions", all machine load); a
    // spread > ~3x on sub-30s queries marks the run as noisy in the
    // artifact itself so a poisoned board is adjudicable without a
    // re-bench.
    val mins = names.map { n =>
      val ts = times(n)
      n -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val minJson = mins.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val spreads = names.flatMap { n =>
      val ts = times(n).filter(_ >= 0)
      if (ts.size < 2 || ts.min <= 0) None else Some(ts.max / ts.min)
    }
    val noisy = spreads.count(_ > 3.0) > math.max(1, names.size / 10)
    // SPARK_GRAFT_WRITE_REF=1 refreshes tools/bench_reference.json from
    // THIS run's medians (done once per round, committed, so the next
    // driver run has a same-box, same-code baseline to fence against).
    // A NOISY or widely-drifted run must never become the baseline —
    // observed: a co-tenant load window inflated 129/210 rows 1.3-1.4x
    // and a WRITE_REF during it would have poisoned every later fence.
    if (sys.env.contains("SPARK_GRAFT_WRITE_REF")) {
      val widelyDrifted = reference.nonEmpty && drifted.size > names.size / 4
      if (noisy || widelyDrifted)
        System.err.println(s"[bench] REFUSING to overwrite the drift " +
          s"reference from this run (noisy=$noisy, drifted=${drifted.size}" +
          s"/${names.size}) — re-run on a quiet box")
      else {
        val meds = results.filter(_._2 >= 0)
          .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("tools/bench_reference.json"),
          s"""{"sf":"$sfDir","medians":$meds}""" + "\n")
      }
    }
    val isolatedJson = isolated.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"min_queries":$minJson,"noisy":$noisy,"isolated":$isolatedJson,"failed":$failed,"sf":"$sfDir"}""")
    // FINAL compact line (r12 verdict item 3): the driver's BENCH_rN
    // artifact keeps only the last ~2,000 output chars, which the full
    // per-query map exceeds — so its `parsed` field was null every
    // round and per-family timings were invisible outside the repo.
    // This self-contained summary (total, per-family subtotals, the
    // top-10 slowest rows, failures) always fits the tail.
    // Locale.ROOT: f"%.3f" uses the JVM default locale, and a comma
    // decimal separator (de_DE, fr_FR, …) would make this line — which
    // exists solely to be machine-parsed — invalid JSON
    def j(d: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(d))
    val fams = results.filter(_._2 >= 0)
      .groupBy { case (k, _) => k.takeWhile(!_.isDigit) }
      .toSeq.sortBy(_._1)
      .map { case (f, rs) => "\"" + f + "\":" + j(rs.map(_._2).sum) }
      .mkString("{", ",", "}")
    val top10 = results.filter(_._2 >= 0).sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + j(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${j(total)},"unit":"sec","sf":"$sfDir","n_queries":${names.size},"families":$fams,"top10":$top10,"noisy":$noisy,"isolated":$isolatedJson,"failed":$failed}""")
    spark.stop()
  }
}
