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

  def writeManifest(spark: SparkSession, indexDir: String,
      m: Manifest): Unit = {
    val tablesJson = m.tables.toSeq.sortBy(_._1).map { case (t, refs) =>
      val rj = refs.toSeq.sortBy(_._1).map { case (k, gs) =>
        s""""$k":[${gs.map(g => s""""$g"""").mkString(",")}]"""
      }.mkString("{", ",", "}")
      s""""$t":$rj"""
    }.mkString("{", ",", "}")
    val extrasJson = m.extras.toSeq.sorted.map { case (k, v) =>
      s""""$k":"$v""""
    }.mkString("{", ",", "}")
    StagedSwap.writeAtomic(spark, manifestPath(indexDir, m.version),
      s"""{"version":${m.version},"commit_id":"${m.commitId}",""" +
        s""""extras":$extrasJson,"tables":$tablesJson}""")
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
    * READ-ONLY to the newest manifest (manifests are written before
    * the flip, so newest IS the committed state); a recover() call
    * re-materializes the pointer via [[restoreCurrentIfMissing]].
    */
  def readManifest(spark: SparkSession, indexDir: String,
      what: String): Manifest = {
    val v = StagedSwap.readSmallFile(spark, s"$indexDir/_current")
      .map(_.trim.toInt)
      .orElse(manifestVersions(spark, indexDir).maxOption)
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
      val isOldManifest = name.startsWith("_manifest_v") &&
        name.stripPrefix("_manifest_v").stripSuffix(".json").toInt < floor
      if ((isGen && !live.contains(name)) || isOldManifest)
        StagedSwap.deleteChecked(spark, s.getPath.toString,
          s"out-of-grace $what generation")
    }
  }

  /** Re-materialize a lost `_current` pointer from the newest manifest
    * (the torn-flip window of writeAtomic's non-atomic fallback;
    * manifests are flip-ordered, so newest wins).
    */
  def restoreCurrentIfMissing(spark: SparkSession, indexDir: String): Unit =
    if (StagedSwap.readSmallFile(spark, s"$indexDir/_current").isEmpty)
      manifestVersions(spark, indexDir).maxOption
        .foreach(flipCurrent(spark, indexDir, _))

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
