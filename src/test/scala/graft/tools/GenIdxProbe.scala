package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextIndex, VectorIndex}

/** Scale probe for the GENERATION-layout persisted indexes (r13
  * verdict item 1's done-criterion: append cost still ∝ touched
  * buckets / O(batch) after the reader-consistency refactor): builds
  * TextIndex and VectorIndex on an sf/probe dir's corpus, appends a
  * small batch, compacts, and serves — printing wall-clock per phase
  * so the ROADMAP table can show append ≪ build at 10× and compare
  * against the pre-refactor shape.
  *
  * Usage: sbt "Test/runMain graft.tools.GenIdxProbe <dir> [batch] [sections]"
  *   sections ⊆ text,vector,vecfrag,textfrag,drift,autoretrain
  *
  * r15 sections:
  *  - `vecfrag`: 20 small appends against a built index, serving after
  *    each 5 — proves serve stays FLAT under a high-frequency ingest
  *    because the inline auto-compaction folds fragments past the
  *    threshold (verdict item 4's done criterion);
  *  - `drift`: a same-distribution append then a SHIFTED-distribution
  *    append (vectors scaled + offset), printing driftReport after
  *    each — the trigger fires only on the shift — then prices the
  *    retrain path (verdict item 3's done criterion).
  */
object GenIdxProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val batch = args.lift(1).map(_.toInt).getOrElse(500)
    val sections = args.lift(2)
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set("text", "vector"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITPARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[genidxprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    if (sections("text")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      // id-disjoint split so the append is genuinely incremental
      val ids = docs.select($"doc_id").orderBy($"doc_id".desc)
        .limit(batch).agg(min($"doc_id")).as[Long].head()
      val base = docs.filter($"doc_id" < ids)
      // materialized, as a foreachBatch ingest would hand it over — the
      // append metric prices the index commit, not corpus filter scans
      val delta = docs.filter($"doc_id" >= ids).localCheckpoint(true)
      val idx = java.nio.file.Files.createTempDirectory("giprobe_t").toString + "/idx"
      def nb() = graft.functions.GenIndex
        .readManifest(spark, idx, "probe").extra("n_buckets", "probe")
      println(s"[genidxprobe] text: n=$n base=${n - batch} batch=$batch")
      time("text build")(TextIndex.build(base, "doc_id", "text", idx))
      println(s"[genidxprobe] text n_buckets after build: ${nb()}")
      time("text append")(TextIndex.append(delta, "doc_id", "text", idx))
      val k0 = time("text serve bm25TopK (pre-compact)") {
        TextIndex.bm25TopK(spark, idx,
          Seq("vector", "stream", "window", "hash"), 20).count()
      }
      time("text compact")(TextIndex.compact(spark, idx))
      println(s"[genidxprobe] text n_buckets after compact: ${nb()}")
      val k = time("text serve bm25TopK") {
        TextIndex.bm25TopK(spark, idx,
          Seq("vector", "stream", "window", "hash"), 20).count()
      }
      println(s"[genidxprobe] text serve rows=$k pre=$k0")
    }

    if (sections("vector")) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val ids = emb.select($"vec_id").orderBy($"vec_id".desc)
        .limit(batch).agg(min($"vec_id")).as[Long].head()
      val base = emb.filter($"vec_id" < ids)
      // materialized — same reasoning as the text section's delta
      val delta = emb.filter($"vec_id" >= ids).localCheckpoint(true)
      val idx = java.nio.file.Files.createTempDirectory("giprobe_v").toString + "/idx"
      println(s"[genidxprobe] vector: n=$n base=${n - batch} batch=$batch")
      time("vector build")(VectorIndex.build(base, "vec_id", "embedding", idx))
      time("vector append")(
        VectorIndex.append(delta, "vec_id", "embedding", idx))
      time("vector compact")(VectorIndex.compact(spark, idx))
      val queries = emb.filter($"vec_id" < 8)
      val k = time("vector serve topK") {
        VectorIndex.topK(spark, idx, queries, "vec_id", "embedding", 5).count()
      }
      println(s"[genidxprobe] vector serve rows=$k")
    }

    if (sections("vecfrag")) {
      // 20 small appends against a built base: serve latency must stay
      // FLAT because inline auto-compaction (AutoCompactFragments)
      // folds fragment refs — without it each probed list accumulates
      // 20 fragment dirs and serve pays an open per file. Wave ranges
      // cut by id QUANTILE (probe replicas shift key ranges — absolute
      // arithmetic on ids silently yields empty waves), and each delta
      // is MATERIALIZED (localCheckpoint) before timing so the append
      // metric prices the index commit, not re-scans of the corpus
      // filter — the foreachBatch ingest shape hands the index a
      // materialized batch too.
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val waves = 20
      val probs = (0 to waves).map(w =>
        1.0 - (waves - w).toDouble * batch / n).toArray
      val cuts = emb.stat.approxQuantile("vec_id", probs, 1e-6)
      val base = emb.filter($"vec_id" < cuts(0))
      val idx = java.nio.file.Files.createTempDirectory("giprobe_vf").toString + "/idx"
      println(s"[genidxprobe] vecfrag: n=$n base=${base.count()} " +
        s"waves=$waves batch=$batch")
      time("vecfrag build")(VectorIndex.build(base, "vec_id", "embedding", idx))
      val queries = emb.filter($"vec_id" < 8)
      for (w <- 0 until waves) {
        val delta = emb.filter(
            $"vec_id" >= cuts(w) && $"vec_id" < cuts(w + 1))
          .localCheckpoint(true)
        time(s"vecfrag append $w (${delta.count()} rows)")(
          VectorIndex.append(delta, "vec_id", "embedding", idx))
        if ((w + 1) % 5 == 0) {
          val maxFrags = VectorIndex.currentRefs(spark, idx)
            .values.map(_.size).maxOption.getOrElse(0)
          val k = time(s"vecfrag serve after ${w + 1} appends") {
            VectorIndex.topK(spark, idx, queries,
              "vec_id", "embedding", 5).count()
          }
          println(s"[genidxprobe] vecfrag after ${w + 1}: " +
            s"max_fragments_per_list=$maxFrags serve_rows=$k")
        }
      }
    }

    if (sections("textfrag")) {
      // the vecfrag shape for TEXT: 20 small appends, serve every 5 —
      // serve must stay flat (bounded fold keeps ≤2 files per probed
      // bucket) and the fold-paying appends must stay within ~2× a
      // steady append (r15 verdict item 5's done criterion; the old
      // inline FULL compact cost 24.1 s at 100× vs ~6.1 s steady)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val waves = 20
      val probs = (0 to waves).map(w =>
        1.0 - (waves - w).toDouble * batch / n).toArray
      val cuts = docs.stat.approxQuantile("doc_id", probs, 1e-6)
      val base = docs.filter($"doc_id" < cuts(0))
      val idx = java.nio.file.Files.createTempDirectory("giprobe_tf")
        .toString + "/idx"
      println(s"[genidxprobe] textfrag: n=$n base=${base.count()} " +
        s"waves=$waves batch=$batch")
      time("textfrag build")(TextIndex.build(base, "doc_id", "text", idx))
      val terms = Seq("vector", "stream", "window", "hash")
      for (w <- 0 until waves) {
        val delta = docs.filter(
            $"doc_id" >= cuts(w) && $"doc_id" < cuts(w + 1))
          .localCheckpoint(true)
        time(s"textfrag append $w (${delta.count()} rows)")(
          TextIndex.append(delta, "doc_id", "text", idx))
        if ((w + 1) % 5 == 0) {
          val maxFrags = TextIndex.currentRefs(spark, idx)
            .values.map(_.size).maxOption.getOrElse(0)
          val k = time(s"textfrag serve after ${w + 1} appends") {
            TextIndex.bm25TopK(spark, idx, terms, 20).count()
          }
          println(s"[genidxprobe] textfrag after ${w + 1}: " +
            s"max_fragments_per_bucket=$maxFrags serve_rows=$k")
        }
      }
    }

    if (sections("drift")) {
      // build on the fixture distribution, append (a) more of the same
      // and (b) a SHIFTED distribution (scaled + offset vectors) — the
      // drift report must stay quiet on (a) and fire on (b); then price
      // the retrain path the trigger recommends. Splits by id QUANTILE,
      // not absolute id: MakeProbe shifts each replica's key range, so
      // `vec_id < n/2` would silently select one replica only.
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val Array(q50, q75) =
        emb.stat.approxQuantile("vec_id", Array(0.5, 0.75), 0.001)
      val base = emb.filter($"vec_id" < q50)
      val same = emb.filter($"vec_id" >= q50 && $"vec_id" < q75)
      val shifted = emb.filter($"vec_id" >= q75)
        .select($"vec_id",
          transform($"embedding", x => x * lit(0.05f) + lit(3.0f))
            .as("embedding"))
      val idx = java.nio.file.Files.createTempDirectory("giprobe_d").toString + "/idx"
      println(s"[genidxprobe] drift: n=$n base=${base.count()} " +
        s"same=${same.count()} shifted=${shifted.count()}")
      time("drift build")(VectorIndex.build(base, "vec_id", "embedding", idx))
      time("drift append same-distribution")(
        VectorIndex.append(same, "vec_id", "embedding", idx))
      println(s"[genidxprobe] drift report after same: " +
        s"${VectorIndex.driftReport(spark, idx)}")
      time("drift append shifted-distribution")(
        VectorIndex.append(shifted, "vec_id", "embedding", idx))
      println(s"[genidxprobe] drift report after shift: " +
        s"${VectorIndex.driftReport(spark, idx)}")
      time("drift retrain")(VectorIndex.retrain(spark, idx))
      println(s"[genidxprobe] drift report after retrain: " +
        s"${VectorIndex.driftReport(spark, idx)}")
      val k = time("drift serve post-retrain") {
        VectorIndex.topK(spark, idx, emb.filter($"vec_id" < 8),
          "vec_id", "embedding", 5).count()
      }
      println(s"[genidxprobe] drift serve rows=$k")
    }

    if (sections("autoretrain")) {
      // r16 (r15 verdict item 4): price the APPEND-THAT-RETRAINED on
      // the production ingest path — the shifted batch trips the skew
      // trigger and the same append call pays the retrain inline
      // before releasing the writer lock. The row to quote beside the
      // steady O(batch) append cost: an operator arming
      // autoRetrainRatio accepts this occasional corpus-sized trigger
      // inside an ingest batch instead of scheduling retrains.
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val Array(q50, q75) =
        emb.stat.approxQuantile("vec_id", Array(0.5, 0.75), 0.001)
      val base = emb.filter($"vec_id" < q50)
      val same = emb.filter($"vec_id" >= q50 && $"vec_id" < q75)
        .localCheckpoint(true)
      val shifted = emb.filter($"vec_id" >= q75)
        .select($"vec_id",
          transform($"embedding", x => x * lit(0.05f) + lit(3.0f))
            .as("embedding"))
        .localCheckpoint(true)
      val idx = java.nio.file.Files.createTempDirectory("giprobe_ar")
        .toString + "/idx"
      println(s"[genidxprobe] autoretrain: n=$n base=${base.count()} " +
        s"same=${same.count()} shifted=${shifted.count()}")
      time("autoretrain build")(
        VectorIndex.build(base, "vec_id", "embedding", idx))
      time("autoretrain append same (steady, armed)")(
        VectorIndex.append(same, "vec_id", "embedding", idx,
          commitId = Some("ar_same"),
          autoRetrainRatio = Some(VectorIndex.DriftRetrainRatio)))
      time("autoretrain append shifted (pays inline retrain)")(
        VectorIndex.append(shifted, "vec_id", "embedding", idx,
          commitId = Some("ar_shift"),
          autoRetrainRatio = Some(VectorIndex.DriftRetrainRatio)))
      val m = graft.functions.GenIndex.readManifest(spark, idx, "probe")
      println(s"[genidxprobe] autoretrain manifest commit=${m.commitId} " +
        s"(retrain_* proves the trigger fired)")
      val k = time("autoretrain serve") {
        VectorIndex.topK(spark, idx, emb.filter($"vec_id" < 8),
          "vec_id", "embedding", 5).count()
      }
      println(s"[genidxprobe] autoretrain serve rows=$k")
    }
    spark.stop()
  }
}
