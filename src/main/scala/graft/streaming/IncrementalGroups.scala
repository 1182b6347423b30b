package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Incremental maintenance of near-duplicate GROUP labels over an
  * arriving pair stream — the registry face of t23: the batch job
  * labels a frozen corpus once; production keeps the label table
  * current as `IncrementalDedup` emits new pairs batch by batch,
  * without ever recomputing the global fixpoint.
  *
  * Contract (spec-pinned bit-exact): folding `applyPairs` over any
  * batch split of a pair set, starting from labels that are the CC of
  * the prior pairs, yields EXACTLY `Dedup.connectedComponents` over
  * the union — same min-doc representatives, same rows.
  *
  * Scale design: a batch touches only the clusters its pairs reach.
  * The subgraph re-solved per batch is (members of touched clusters) ∪
  * (new docs) with (new pairs) ∪ (member→rep star edges) — cost ∝
  * touched-cluster mass, never corpus mass. Untouched labels pass
  * through without a shuffle on the label value (one semi/anti join by
  * rep). A pair merging two million-doc clusters relabels both — that
  * is the output's own size, the lower bound for any exact maintainer.
  * Label storage is one (doc_id, rep) table partitionable by hash(doc)
  * at any corpus size; the per-batch CC runs at touched-subgraph
  * cardinality with the same localCheckpoint-truncated lineage as the
  * batch operator.
  */
object IncrementalGroups {

  /** Fold one batch of undirected pairs (`id_a`, `id_b`) into a label
    * table (`doc_id`, `rep`). Docs unseen by `labels` enter as new
    * nodes; min-label determinism makes the result independent of how
    * pairs were batched.
    */
  def applyPairs(labels: DataFrame, pairs: DataFrame): DataFrame = {
    val touched = pairs.select(col("id_a").as("doc_id"))
      .union(pairs.select(col("id_b").as("doc_id"))).distinct()
    // clusters reached by this batch: reps of every touched KNOWN doc
    val touchedReps = labels.join(touched, Seq("doc_id"), "left_semi")
      .select(col("rep")).distinct()
    // every member of a touched cluster must be eligible for relabel —
    // a merge renames the absorbed cluster wholesale
    val affected = labels.join(touchedReps, Seq("rep"), "left_semi")
    val newDocs = touched.join(labels, Seq("doc_id"), "left_anti")
    val nodes = affected.select(col("doc_id")).union(newDocs).distinct()
    // star edges reconstruct the old clusters; new pairs stitch them
    val edges = affected.filter(col("doc_id") =!= col("rep"))
      .select(col("doc_id").as("id_a"), col("rep").as("id_b"))
      .union(pairs.select(col("id_a"), col("id_b")))
    val solved = Dedup.connectedComponents(nodes, edges)
      .select(col("doc_id"), col("rep"))
    labels.join(touchedReps, Seq("rep"), "left_anti")
      .select(col("doc_id"), col("rep"))
      .union(solved)
  }

  private def versionDir(stateDir: String, batchId: Long) =
    s"$stateDir/v=$batchId"

  private def committed(spark: SparkSession, stateDir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .map(_.getPath.getName).filter(_.startsWith("v="))
      // ONLY all-digit versions: a foreign dir like "v=tmp" must not
      // NumberFormatException-poison every later read of this state dir
      .map(_.stripPrefix("v="))
      .filter(s => s.nonEmpty && s.forall(_.isDigit))
      .map(_.toLong)
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(
        versionDir(stateDir, v) + "/_graft_committed")))
      .sorted
  }

  /** Latest committed label table, or an empty one. */
  def latestLabels(spark: SparkSession, stateDir: String): DataFrame =
    committed(spark, stateDir).lastOption match {
      case Some(v) => spark.read.parquet(versionDir(stateDir, v))
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id long, rep long"))
    }

  /** foreachBatch body: fold the batch's pairs into a NEW label
    * version, committed with a marker AFTER the parquet lands — a
    * replay of an already-committed batchId is a no-op, so the label
    * table is exactly-once under crash/replay (same staging discipline
    * as IncrementalDedup).
    */
  def processBatch(pairs: DataFrame, batchId: Long, stateDir: String): Unit = {
    val spark = pairs.sparkSession
    if (committed(spark, stateDir).contains(batchId)) return
    val next = applyPairs(latestLabels(spark, stateDir), pairs)
    val dir = versionDir(stateDir, batchId)
    next.write.mode("overwrite").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(dir + "/_graft_committed"), true)
      .close()
  }

  /** Maintain labels from a streaming pair frame (`id_a`, `id_b`). */
  def start(pairStream: DataFrame, stateDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    pairStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id, stateDir))
      .start()
}
