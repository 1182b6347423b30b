package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ProcessingTime-trigger pricing for the bus-fed index-ingest paths
  * (r15 verdict item 6): e37/e38/e39 drain with AvailableNow, but a
  * production crawl runs CONTINUOUS micro-batches — this probe
  * publishes `waves` single-segment waves to a graftbus, drains them
  * under `Trigger.ProcessingTime`, and prices every trigger's
  * foreachBatch body (index append + the occasional inline fold +
  * a bus vacuum every 5 batches) so the ROADMAP table can quote
  * per-trigger p50/p99 at 10×/100× instead of a single drain total.
  *
  * Usage:
  *   sbt "Test/runMain graft.tools.BusTriggerProbe <dir> [family] [waves] [batch]"
  * family ∈ text | sig | vector. The index is BUILT OFFLINE on the
  * base corpus first (the production shape: build is a snapshot job;
  * the stream only appends), so every timed trigger is a steady-state
  * ingest batch.
  */
object BusTriggerProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val family = args.lift(1).getOrElse("text")
    val waves = args.lift(2).map(_.toInt).getOrElse(20)
    val batch = args.lift(3).map(_.toInt).getOrElse(500)
    val busParts = 8
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

    val (table, idCol) = family match {
      case "vector" => ("embeddings", "vec_id")
      case _ => ("documents", "doc_id")
    }
    val rows = spark.read.parquet(s"$dir/$table.parquet")
    val n = rows.count()
    // wave ranges by id QUANTILE (probe replicas shift key ranges —
    // absolute-id splits silently select one replica)
    val probs = (0 to waves).map(w =>
      1.0 - (waves - w).toDouble * batch / n).toArray
    val cuts = rows.stat.approxQuantile(idCol, probs, 1e-6)
    val base = rows.filter(col(idCol) < cuts(0))
    val root = java.nio.file.Files.createTempDirectory("bustrig").toString
    graft.sources.bus.BusLog.create(root, busParts)
    val idx = s"$root/idx"

    def t[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    println(s"[bustrigprobe] family=$family n=$n base=${base.count()} " +
      s"waves=$waves batch=$batch")
    val (_, tb) = t(family match {
      case "vector" =>
        graft.functions.VectorIndex.build(base, idCol, "embedding", idx)
      case "sig" =>
        graft.functions.SignatureIndex.build(base, idCol, "text", idx)
      case _ =>
        graft.functions.TextIndex.build(base, idCol, "text", idx)
    })
    println(f"[bustrigprobe] offline build: $tb%.2f s")

    // publish every wave up front (one segment per bus partition per
    // wave — the e37 discipline), so the drain's cadence is the
    // trigger's, not the publisher's
    val enc = family match {
      case "vector" => concat_ws("", col(idCol),
        concat_ws(",", transform(col("embedding"), x => x.cast("string"))))
      case _ => concat_ws("", col(idCol), col("text"))
    }
    for (w <- 0 until waves) {
      rows.filter(col(idCol) >= cuts(w) && col(idCol) < cuts(w + 1))
        .select(pmod(hash(col(idCol)), lit(busParts)).as("partition"),
          lit(0L).as("seq"), lit(0).as("idx"),
          lit(new java.sql.Timestamp(0L)).as("ts"), enc.as("value"))
        .repartition(busParts, col("partition"))
        .write.format("graftbus").option("path", root)
        .mode("append").save()
    }

    val timings =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, String)]()
    val parts = split($"value", "", 2)
    val decoded = spark.readStream.format("graftbus").option("path", root)
      .option("maxSegmentsPerTrigger", "1").load()
      .select(parts.getItem(0).cast("long").as(idCol),
        parts.getItem(1).as("payload"))
    val withCols = family match {
      case "vector" => decoded.select(col(idCol),
        transform(split($"payload", ","), x => x.cast("float"))
          .as("embedding"))
      case _ => decoded.withColumnRenamed("payload", "text")
    }
    val q = withCols.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val (_, ta) = t(family match {
          case "vector" => graft.functions.VectorIndex.append(
            b, idCol, "embedding", idx, commitId = Some(s"bt_$batchId"))
          case "sig" => graft.functions.SignatureIndex.append(
            b, idCol, "text", idx, commitId = Some(s"bt_$batchId"))
          case _ => graft.functions.TextIndex.append(
            b, idCol, "text", idx, commitId = Some(s"bt_$batchId"))
        })
        // retention cadence: every 5th trigger vacuums the bus up to
        // the last COMMITTED batch's seq (batch b-1 committed before
        // this trigger ran, and batch IDs map 1:1 to segment seqs
        // under maxSegmentsPerTrigger=1) — priced inside the trigger
        // because production would pay it there
        val (_, tv) = t {
          if (batchId > 0 && batchId % 5 == 0)
            graft.sources.bus.BusLog.vacuum(root,
              (0 until busParts).map(_ -> batchId).toMap)
        }
        val cid = graft.functions.GenIndex
          .readManifest(spark, idx, "probe").commitId
        val kind = if (cid.startsWith("fold_")) "fold"
          else if (cid.startsWith("retrain_")) "retrain" else "append"
        timings.add((batchId, ta + tv, kind))
        println(f"[bustrigprobe] trigger $batchId%2d: ${ta + tv}%.2f s " +
          f"($kind; vacuum $tv%.2f s)")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("250 milliseconds"))
      .start()
    // q.isActive in the loop: a failed append kills the query — report
    // the real stream error immediately instead of spinning out the
    // deadline and crashing on an empty summary
    val deadline = System.currentTimeMillis() + 60L * 60 * 1000
    while (timings.size < waves && q.isActive &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(500)
    q.exception.foreach(e => throw e)
    q.stop()
    q.awaitTermination()

    val ts = timings.toArray(Array.empty[(Long, Double, String)])
      .sortBy(_._1)
    require(ts.nonEmpty, "stream terminated before any trigger completed")
    val sorted = ts.map(_._2).sorted
    def pct(p: Double) =
      sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))
    val folds = ts.filter(x => x._3 != "append")
    println(f"[bustrigprobe] $family triggers=${sorted.length} " +
      f"p50=${pct(0.5)}%.2f s p99=${pct(0.99)}%.2f s max=${sorted.last}%.2f s " +
      f"folds=${folds.length} (${folds.map(_._1).mkString(",")})")
    val steady = ts.filter(_._3 == "append").map(_._2)
    if (steady.nonEmpty && folds.nonEmpty)
      println(f"[bustrigprobe] steady median=${steady.sorted.apply(steady.length / 2)}%.2f s " +
        f"fold-paying max=${folds.map(_._2).max}%.2f s " +
        f"ratio=${folds.map(_._2).max / steady.sorted.apply(steady.length / 2)}%.2f")
    spark.stop()
  }
}
