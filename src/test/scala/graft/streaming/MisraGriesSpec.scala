package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Bounded-state streaming heavy hitters (sharded Misra–Gries on
  * transformWithState MapState). The contract is the MG theorem, which
  * holds for EVERY arrival order — so it is the right pin for an
  * order-dependent summary:
  *   (1) no false negatives: any token with shard frequency > N_shard/m
  *       is in the final summary;
  *   (2) error bound: true − decrements ≤ est ≤ true, and
  *       decrements ≤ N_shard/m;
  * plus the m-unbounded bridge: with m ≥ shard vocabulary no decrement
  * ever fires and the stream-final summary equals the batch exact
  * count table bit-for-bit — which reproduces the batch heavy-hitters
  * query (t22) through the same threshold.
  */
class MisraGriesSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val shards = 4

  private def tokenFrame: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(trim($"text"), "\\s+")).as("token"))
      .filter($"token" =!= "")
      .withColumn("shard",
        pmod(hash($"token"), lit(shards)).cast("int"))

  /** (token → true count, token → shard, shard → N_shard) from batch. */
  private lazy val exact = {
    val rows = tokenFrame.groupBy($"shard", $"token")
      .agg(count(lit(1)).as("n")).collect()
    val counts = rows.map(r => r.getAs[String]("token") -> r.getAs[Long]("n")).toMap
    val shardOf = rows.map(r => r.getAs[String]("token") -> r.getAs[Int]("shard")).toMap
    val nShard = rows.groupBy(_.getAs[Int]("shard"))
      .map { case (s, rs) => s -> rs.map(_.getAs[Long]("n")).sum }
    (counts, shardOf, nShard)
  }

  private def drive(srcDir: String, m: Int): Seq[StatefulV2.MgEntry] = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val name = s"mg_out_${System.nanoTime()}"
      val q = StatefulV2.misraGriesTokens(stream, m, shards)
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // final summary: the rows stamped with each shard's max processed
      val all = spark.table(name).as[StatefulV2.MgEntry].collect().toSeq
      val lastN = all.groupBy(_.shard).map { case (s, es) =>
        s -> es.map(_.n_processed).max
      }
      all.filter(e => e.n_processed == lastN(e.shard))
    } finally {
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  private def writeSource(parts: Int): String = {
    val srcDir = tmpDir("mgsrc") + "/toks"
    // deterministic multi-file split so AvailableNow drives `parts` batches
    tokenFrame.select($"token").repartition(parts)
      .write.mode("overwrite").parquet(srcDir)
    srcDir
  }

  private def assertGuarantees(fin: Seq[StatefulV2.MgEntry], m: Int): Unit = {
    val (counts, shardOf, nShard) = exact
    val byShard = fin.groupBy(_.shard)
    for ((s, n) <- nShard) {
      val entries = byShard.getOrElse(s, Seq.empty)
      assert(entries.size <= m, s"shard $s tracks ${entries.size} > m=$m")
      val decs = entries.headOption.map(_.decrements).getOrElse(0L)
      assert(entries.forall(_.decrements == decs))
      assert(decs <= n / m, s"shard $s decrements $decs > N/m ${n / m}")
      assert(entries.headOption.map(_.n_processed).getOrElse(0L) == n,
        s"shard $s processed mismatch")
      val tracked = entries.map(_.token).toSet
      // (1) no false negatives above the threshold
      for ((tok, c) <- counts if shardOf(tok) == s && c > n / m)
        assert(tracked(tok), s"heavy token '$tok' ($c > ${n / m}) lost in shard $s")
      // (2) per-entry error bound
      for (e <- entries) {
        val truth = counts(e.token)
        assert(e.est <= truth, s"'${e.token}' overcounted: ${e.est} > $truth")
        assert(truth - e.est <= decs,
          s"'${e.token}' undercount ${truth - e.est} > decrements $decs")
      }
    }
  }

  test("MG guarantee holds across multi-batch arrival (m = 16)") {
    assertGuarantees(drive(writeSource(parts = 3), m = 16), m = 16)
  }

  test("MG guarantee holds in a single batch (m = 16)") {
    assertGuarantees(drive(writeSource(parts = 1), m = 16), m = 16)
  }

  test("m above the vocabulary: summary equals exact counts, zero decrements") {
    val (counts, _, _) = exact
    val m = counts.size + 8
    val fin = drive(writeSource(parts = 3), m)
    assert(fin.forall(_.decrements == 0L))
    val got = fin.map(e => e.token -> e.est).toMap
    assert(got == counts, "m-unbounded MG must BE the exact count table")
    // and the batch heavy-hitters threshold reproduces on top of it
    val total = counts.values.sum
    val hh = got.filter { case (_, n) => n * 1000L > total }.keySet
    val batchHh = graft.queries.LlmOps.t22HeavyHitters.fn(spark, dir)
      .collect().map(_.getAs[String]("token")).toSet
    assert(hh == batchHh)
  }
}
