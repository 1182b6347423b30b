package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared GENERATION machinery for the persisted on-disk indexes —
  * SignatureIndex's reader-consistency design (r12 verdict item 2),
  * factored out so TextIndex and VectorIndex get the identical
  * treatment instead of their own drifting in-place mutation protocols
  * (r13 verdict item 1: TextIndex.append dynamic-overwrote live
  * postings buckets, so a concurrent reader mid-append saw mixed df
  * values; VectorIndex.append wrote into live list dirs, so a
  * concurrent serve could observe a torn batch).
  *
  * The design is the Catalog bucket-manifest treatment:
  *
  *  - data lives in IMMUTABLE generation dirs,
  *    `<table>_g{G}/<part>={k}/` — a generation dir is NEVER modified
  *    after its manifest commits, so a reader that resolved its paths
  *    keeps reading a bit-exact snapshot while any number of commits
  *    land;
  *  - `_manifest_v{N}.json` maps every bucket of every table to the
  *    generation dir(s) holding its current rows (a Seq per bucket:
  *    rewrite-style tables — postings, signature bands/sets — keep
  *    singletons; fragment-style tables — IVF inverted lists, whose
  *    appends must stay O(batch), not O(touched lists) — accumulate
  *    fragments that compaction folds back to one). The manifest also
  *    carries small `extras` (corpus stats, bucket counts), committed
  *    ATOMICALLY with the data refs — which is what dissolves
  *    TextIndex's old torn-append window between its postings rewrite
  *    and its separate stats table;
  *  - `_current` holds the committed manifest version, flipped
  *    atomically (StagedSwap.writeAtomic) as the SINGLE commit point.
  *
  * Crash safety falls out: every mutation writes only fresh
  * generation dirs + a fresh manifest, then flips the pointer — a
  * crash anywhere before the flip leaves orphan generation dirs
  * ([[vacuum]] reclaims them) and the committed snapshot untouched.
  * Old generations stay servable inside the vacuum grace window, so a
  * reader holding the previous snapshot is never invalidated by the
  * next commit.
  *
  * Writers serialize through StagedSwap.withFileLock around their
  * whole read→write→flip span; reads are lock-free.
  */
private[graft] object GenIndex {

  /** One committed snapshot: bucket → generation-dir list per table,
    * plus the commit id that produced it (idempotency token for
    * staged replays) and small atomic extras.
    */
  case class Manifest(version: Int, commitId: String,
      tables: Map[String, Map[Int, Seq[String]]],
      extras: Map[String, String]) {
    def refs(table: String): Map[Int, Seq[String]] =
      tables.getOrElse(table, Map.empty)
    def extra(key: String, what: String): String =
      extras.getOrElse(key, throw new IllegalStateException(
        s"$what manifest v$version has no '$key' extra — " +
          "built by an incompatible version?"))
  }

  private def hfs(spark: SparkSession, p: String
      ): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }

  def manifestPath(indexDir: String, v: Int): String =
    s"$indexDir/_manifest_v$v.json"

  /** Serialized with Jackson, NOT hand-built strings (r14 ADVICE
    * item 2): extras carry user-influenced values (metaCols, commit
    * ids), and a quote or backslash in one would corrupt a
    * concatenated manifest silently — the writer must escape exactly
    * what the reader (already Jackson) unescapes.
    */
  def writeManifest(spark: SparkSession, indexDir: String,
      m: Manifest): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("version", m.version)
    root.put("commit_id", m.commitId)
    val ex = root.putObject("extras")
    m.extras.toSeq.sorted.foreach { case (k, v) => ex.put(k, v) }
    val ts = root.putObject("tables")
    m.tables.toSeq.sortBy(_._1).foreach { case (t, refs) =>
      val tn = ts.putObject(t)
      refs.toSeq.sortBy(_._1).foreach { case (k, gs) =>
        val arr = tn.putArray(k.toString)
        gs.foreach(arr.add)
      }
    }
    StagedSwap.writeAtomic(spark, manifestPath(indexDir, m.version),
      om.writeValueAsString(root))
  }

  /** The single commit point: flip `_current` to the new manifest. */
  def flipCurrent(spark: SparkSession, indexDir: String,
      version: Int): Unit =
    StagedSwap.writeAtomic(spark, s"$indexDir/_current", version.toString)

  /** Versions of every `_manifest_v*.json` present at indexDir. */
  def manifestVersions(spark: SparkSession, indexDir: String): Seq[Int] = {
    val (fs, root) = hfs(spark, indexDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("_manifest_v") && n.endsWith(".json"))
      .map(_.stripPrefix("_manifest_v").stripSuffix(".json").toInt)
  }

  /** The committed manifest. Missing-pointer fallback: writeAtomic's
    * non-atomic delete+rename path (filesystems without an
    * AbstractFileSystem binding) can crash between deleting `_current`
    * and recreating it with every manifest intact — fall back
    * READ-ONLY to the newest INTACT manifest (manifests are written
    * before the flip, so the newest one whose generation dirs all
    * still exist is the committed state — see
    * [[newestIntactVersion]] for why "intact" matters); a recover()
    * call re-materializes the pointer via [[restoreCurrentIfMissing]].
    */
  def readManifest(spark: SparkSession, indexDir: String,
      what: String): Manifest = {
    val v = StagedSwap.readSmallFile(spark, s"$indexDir/_current")
      .map(_.trim.toInt)
      .orElse(newestIntactVersion(spark, indexDir, what))
      .getOrElse(throw new IllegalStateException(
        s"$what at $indexDir has no _current pointer and no manifest — " +
          "not built, or a build crashed before its first commit"))
    readManifestVersion(spark, indexDir, v, what)
  }

  def readManifestVersion(spark: SparkSession, indexDir: String, v: Int,
      what: String): Manifest = {
    val txt = StagedSwap.readSmallFile(spark, manifestPath(indexDir, v))
      .getOrElse(throw new IllegalStateException(
        s"$what at $indexDir: _current names manifest v$v but the " +
          "manifest file is missing"))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
    // fail actionably on a pre-GenIndex manifest (the r13 SignatureIndex
    // format had append_id/bands/sets at top level) instead of NPEing
    // deep in the field walk
    if (node.get("tables") == null || node.get("extras") == null ||
        node.get("commit_id") == null)
      throw new IllegalStateException(
        s"$what at $indexDir: manifest v$v predates the shared generation " +
          "format (no tables/extras/commit_id fields) — rebuild the index " +
          "with the current version")
    def fields[T](n: com.fasterxml.jackson.databind.JsonNode)(
        f: (String, com.fasterxml.jackson.databind.JsonNode) => T): Seq[T] = {
      val it = n.fieldNames()
      val b = Seq.newBuilder[T]
      while (it.hasNext) { val k = it.next(); b += f(k, n.get(k)) }
      b.result()
    }
    val tables = fields(node.get("tables")) { (t, refsNode) =>
      t -> fields(refsNode) { (k, arr) =>
        k.toInt -> (0 until arr.size()).map(i => arr.get(i).asText())
      }.toMap
    }.toMap
    val extras = fields(node.get("extras"))((k, vn) => k -> vn.asText()).toMap
    Manifest(v, node.get("commit_id").asText(), tables, extras)
  }

  /** Which bucket subdirs a just-written generation dir actually holds
    * (empty buckets write no dir).
    */
  def bucketsIn(spark: SparkSession, genDir: String,
      part: String): Seq[Int] = {
    val (fs, hp) = hfs(spark, genDir)
    if (!fs.exists(hp)) Seq.empty
    else fs.listStatus(hp).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$part="))
      .map(_.getPath.getName.stripPrefix(s"$part=").toInt)
  }

  /** Read the given buckets through the manifest's immutable paths —
    * the structural pruning that makes a serve open ONLY the buckets
    * it needs (untouched buckets are never even listed).
    * `withBucketCol` re-attaches the bucket id as a partition column
    * via a per-generation basePath read (needed whenever the consumer
    * joins or groups on the bucket id, or re-writes partitionBy).
    * `schemaDDL` is BY-NAME: it is only evaluated for the empty-bucket
    * frame, so callers that derive it from a parquet footer pay that
    * driver-side read only on the (rare) all-buckets-absent path, not
    * per serve.
    */
  def readBuckets(spark: SparkSession, indexDir: String,
      refs: Map[Int, Seq[String]], part: String, buckets: Seq[Int],
      withBucketCol: Boolean, schemaDDL: => String): DataFrame = {
    val present: Seq[(Int, String)] = buckets.distinct
      .flatMap(k => refs.getOrElse(k, Seq.empty).map(k -> _))
    if (present.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          if (withBucketCol) s"$schemaDDL, $part int" else schemaDDL))
    if (!withBucketCol) {
      val paths = present.map { case (k, g) => s"$indexDir/$g/$part=$k" }
      spark.read.parquet(paths: _*)
    } else {
      present.groupBy(_._2).map { case (g, ks) =>
        spark.read.option("basePath", s"$indexDir/$g")
          .parquet(ks.map { case (k, _) => s"$indexDir/$g/$part=$k" }: _*)
      }.reduce(_ unionByName _)
    }
  }

  /** The table's data schema derived from ONE committed fragment's
    * parquet footer (a leaf-dir read, so the partition column is
    * excluded), falling back to `fallbackDDL` only for a table with no
    * committed bucket at all. This is [[readBuckets]]' empty-frame
    * schema companion — feed it through the BY-NAME parameter so the
    * footer is only opened on the all-buckets-absent path, never per
    * serve. Shared here because both TextIndex and VectorIndex derive
    * it from the same generation layout (second-review finding: two
    * verbatim copies would drift).
    */
  def footerDDL(spark: SparkSession, indexDir: String,
      refs: Map[Int, Seq[String]], part: String,
      fallbackDDL: String): String =
    refs.headOption.map { case (k, gs) =>
      spark.read.parquet(s"$indexDir/${gs.head}/$part=$k").schema.toDDL
    }.getOrElse(fallbackDDL)

  /** Newest manifest whose referenced generation dirs ALL still
    * exist — the fallback selector for a lost `_current` pointer
    * (r14 ADVICE item 1). A manifest left by a crashed commit (crash
    * after writeManifest, before flipCurrent) is newer than the
    * committed one, and once a vacuum has reclaimed its orphan
    * generation dirs it DANGLES: blindly selecting the newest
    * manifest would pin the index to a snapshot whose data is gone.
    * An intact uncommitted manifest (no vacuum ran yet) is still
    * selected — that is a harmless roll-forward of a fully-written
    * commit that only missed its pointer flip.
    */
  private def newestIntactVersion(spark: SparkSession, indexDir: String,
      what: String): Option[Int] = {
    val (fs, _) = hfs(spark, indexDir)
    manifestVersions(spark, indexDir).sorted.reverse.find { v =>
      readManifestVersion(spark, indexDir, v, what)
        .tables.values.flatMap(_.values.flatten).toSet
        .forall(g => fs.exists(
          new org.apache.hadoop.fs.Path(s"$indexDir/$g")))
    }
  }

  /** Delete generation dirs referenced by NO manifest inside the grace
    * window, and manifest files older than that window. The default
    * grace of 1 keeps the immediately-previous snapshot fully
    * servable — a reader that resolved its paths just before a
    * concurrent commit is never invalidated (Catalog.vacuum's keepLast
    * treatment). Grace 0 reclaims everything but the current snapshot:
    * maintenance windows only. `genPrefixes` are the table dir
    * prefixes ("postings_g", "lists_g", …) this index owns — nothing
    * else at indexDir is touched.
    */
  def vacuum(spark: SparkSession, indexDir: String,
      genPrefixes: Seq[String], graceVersions: Int, what: String): Unit = {
    val cur = readManifest(spark, indexDir, what)
    val floor = cur.version - math.max(0, graceVersions)
    val live = manifestVersions(spark, indexDir)
      .filter(v => v >= floor && v <= cur.version)
      .map(v => readManifestVersion(spark, indexDir, v, what))
      .flatMap(_.tables.values.flatMap(_.values.flatten))
      .toSet
    val (fs, root) = hfs(spark, indexDir)
    fs.listStatus(root).foreach { s =>
      val name = s.getPath.getName
      val isGen = genPrefixes.exists(name.startsWith)
      // manifests NEWER than the committed version are uncommitted
      // leftovers of a crashed commit (the writer lock is held here,
      // so no live writer can be mid-flip): their generation dirs are
      // being reclaimed as orphans by this very pass, and leaving the
      // manifest file behind would leave a DANGLING newest manifest
      // for the lost-pointer fallback to mis-select (r14 ADVICE
      // item 1 — the vacuumed-dirs half of the fix; the read side is
      // [[newestIntactVersion]])
      val mv = if (!name.startsWith("_manifest_v")) None
        else Some(name.stripPrefix("_manifest_v").stripSuffix(".json").toInt)
      val isOldManifest = mv.exists(_ < floor)
      val isUncommittedManifest = mv.exists(_ > cur.version)
      if ((isGen && !live.contains(name)) || isOldManifest ||
          isUncommittedManifest)
        StagedSwap.deleteChecked(spark, s.getPath.toString,
          s"out-of-grace $what generation")
    }
  }

  /** Re-materialize a lost `_current` pointer from the newest INTACT
    * manifest (the torn-flip window of writeAtomic's non-atomic
    * fallback; manifests are flip-ordered, so the newest whose
    * generation dirs survive wins — a dangling crashed-commit
    * manifest must not be restored-to, see [[newestIntactVersion]]).
    */
  def restoreCurrentIfMissing(spark: SparkSession, indexDir: String,
      what: String = "index"): Unit =
    if (StagedSwap.readSmallFile(spark, s"$indexDir/_current").isEmpty)
      newestIntactVersion(spark, indexDir, what)
        .foreach(flipCurrent(spark, indexDir, _))

  /** How many append commit ids the redelivery guard remembers (the
    * `append_ids` manifest extra). One id is enough for foreachBatch's
    * own guarantee (only the immediately-preceding batch is ever
    * redelivered), but a checkpoint restored from backup can replay
    * SEVERAL batches back, and under the fragment indexes'
    * last-generation-wins upsert semantics an out-of-order re-append
    * is worse than a double-count: the replayed old version lands at a
    * HIGHER generation and silently reverts a newer upsert (r16 review
    * finding). A bounded history closes that window for any replay
    * within the last MaxAppendIds commits.
    */
  val MaxAppendIds = 64

  /** The shared redelivery guard for fragment-index appends: true when
    * `commitId` already committed — as the current manifest's own
    * commitId, or anywhere in the bounded `append_ids` history that
    * [[withAppendId]] maintains (which survives inline folds, compacts
    * and retrains because every later commit carries extras forward).
    */
  def isRedelivered(cur: Manifest, commitId: Option[String]): Boolean =
    commitId.exists { id =>
      cur.commitId == id ||
        cur.extras.get("last_append_id").contains(id) ||
        cur.extras.getOrElse("append_ids", "")
          .split(",").contains(id)
    }

  /** Extras for an append commit: record `cid` as `last_append_id`
    * and push it onto the bounded comma-joined `append_ids` history
    * (see [[MaxAppendIds]]). Commit ids must be comma-free — batchId
    * tokens and UUIDs are; a hostile id would corrupt the history's
    * membership test, so refuse actionably.
    */
  def withAppendId(extras: Map[String, String],
      cid: String): Map[String, String] = {
    require(!cid.contains(","),
      s"append commitId must be comma-free (append_ids history): $cid")
    val prior = extras.getOrElse("append_ids", "")
      .split(",").filter(_.nonEmpty).toSeq
    extras ++ Map(
      "last_append_id" -> cid,
      "append_ids" -> ((prior.takeRight(MaxAppendIds - 1) :+ cid)
        .mkString(",")))
  }

  /** The bounded inline fold shared by the three fragment indexes
    * (r16 review finding: three drifting copies of the same
    * merge-tail logic is the failure this object was factored out to
    * prevent). For every bucket of `table` holding at least
    * `threshold` refs, merge all refs ABOVE its first (largest) ref
    * into `<table>_g{gen}` — cost ∝ the merged fragments' rows
    * (appended since the last full compact), never the base, because
    * the first ref is never read or rewritten. Returns the updated
    * refs, or None when no bucket crossed the threshold (the caller
    * skips its commit for that table). `order` sorts rows within the
    * written partitions — pass the partition column FIRST so the
    * dynamic-partition writer's requirement is satisfied and no
    * second, order-destroying sort is inserted.
    */
  def foldFragmentTable(spark: SparkSession, indexDir: String,
      cur: Manifest, table: String, part: String, gen: Int,
      threshold: Int, order: Seq[org.apache.spark.sql.Column],
      ddl: => String): Option[Map[Int, Seq[String]]] = {
    val refs = cur.refs(table)
    val over = refs.filter(_._2.size >= threshold)
    if (over.isEmpty) return None
    val fragRefs = over.map { case (k, gs) => k -> gs.tail }
    val merged = readBuckets(spark, indexDir, fragRefs, part,
        over.keys.toSeq, withBucketCol = true, ddl)
      .repartition(org.apache.spark.sql.functions.col(part))
    val ordered = if (order.isEmpty) merged
      else merged.sortWithinPartitions(order: _*)
    ordered.write.mode("overwrite").partitionBy(part)
      .parquet(s"$indexDir/${table}_g$gen")
    Some(refs ++ over.map { case (k, gs) =>
      k -> Seq(gs.head, s"${table}_g$gen") })
  }

  /** Clear every prior index artifact at indexDir EXCEPT the writer
    * lock the caller is holding — the build()-time reset that keeps a
    * stale stage or old-parameter generation from ever surviving into
    * a rebuilt index (r12 ADVICE item 1).
    */
  def clearIndexState(spark: SparkSession, indexDir: String,
      lockName: String, what: String): Unit = {
    val (fs, root) = hfs(spark, indexDir)
    if (fs.exists(root)) fs.listStatus(root).foreach { s =>
      if (s.getPath.getName != lockName)
        StagedSwap.deleteChecked(spark, s.getPath.toString, what)
    }
  }
}
