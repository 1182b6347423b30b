package graft.catalog

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, expr, hash, lit, pmod, shiftright, sum, when}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

/** Transactional Parquet table layer — the one genuinely custom piece of
  * storage machinery (SURVEY §4): no lakehouse-format jar ships with the
  * image, so tables are plain Parquet directories plus a JSON metadata
  * sidecar carrying the schema and primary-key registry. This replaces
  * the reference's Postgres catalog lookups (process-pipeline.py:67-86
  * pg_index PK introspection, :133-150 information_schema columns) with
  * externally supplied PK metadata, mirroring its design.
  *
  * Atomicity: every mutation writes a fresh versioned data directory and
  * then atomically flips a one-line `_current` pointer file (write temp +
  * rename). Readers resolve the pointer first, so a crash mid-write
  * leaves the previous version live. Directory renames are atomic on
  * local FS and HDFS; on S3-like stores the pointer-file flip is still
  * the single commit point, which is why we flip a file instead of
  * renaming the data directory itself.
  *
  * Version GC: every commit calls `vacuum` with this catalog's
  * `graceVersions` retention, deleting version directories that neither
  * the `_current` pointer nor any live bucket-manifest ref reaches
  * (ref-counted, never blind). `graceVersions > 0` keeps that many of
  * the newest unreferenced versions as a grace window so a reader that
  * resolved the pointer just before a commit still finds its files —
  * the lakehouse-standard reader/GC contract (snapshot retention);
  * explicit `vacuum(name, keepLast = 0)` reclaims them on demand.
  *
  * Cross-process writer safety: `synchronized` serializes mutations
  * within one JVM, but every public mutation is a read-modify-write
  * (append resolves the current version, merges, then flips the
  * pointer), so two DRIVER PROCESSES sharing a root could interleave
  * and silently drop a commit — the reference never faced this because
  * Postgres gave it transactions. Each mutation therefore also holds a
  * per-table `_commit.lock` file for its whole read→write→flip span,
  * acquired create-exclusive (atomic on the local FS via O_EXCL and on
  * HDFS via the namenode; the same lock-file protocol HDFS-backed
  * lakehouse formats use for their commit protocol). A crashed holder's
  * lock goes stale after `lockStaleMs` and is broken by renaming it
  * aside (rename is the atomic claim — only one breaker wins) — size
  * `lockStaleMs` above your slowest expected commit, since a breaker
  * can't tell a dead holder from a slow one. Acquisition waits up to
  * `lockTimeoutMs` then fails loudly rather than deadlocking a job.
  */
class Catalog(spark: SparkSession, root: String, val graceVersions: Int = 0,
    val lockTimeoutMs: Long = 60000, val lockStaleMs: Long = 1800000) {
  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableDir(name: String) = new Path(root, name)
  private def pointerFile(name: String) = new Path(tableDir(name), "_current")
  private def metaFile(name: String) = new Path(tableDir(name), "_meta.json")
  private def lockFile(name: String) = new Path(tableDir(name), "_commit.lock")

  // tables whose _commit.lock THIS instance's current mutation already
  // holds — mutators call each other (compact → commitBuckets,
  // overwriteCoLocated → saveCoLocated) and the file lock, unlike
  // `synchronized`, is not reentrant. Only touched under the instance
  // monitor (every locked() body runs synchronized), so a plain Set.
  private val heldLocks = scala.collection.mutable.Set.empty[String]

  /** Atomic create-exclusive of the lock file: O_EXCL via NIO on the
    * local FS (Hadoop's RawLocalFileSystem `create(…, overwrite=false)`
    * is check-then-act, NOT atomic); `FileSystem.create` elsewhere,
    * where the namenode makes it atomic. Returns false when the lock is
    * already held.
    */
  private def tryAcquire(lock: Path): Boolean = {
    val content = s"""{"pid":${ProcessHandle.current().pid()},"epochMs":${System.currentTimeMillis()}}"""
    if (fs.getScheme == "file") {
      val f = new java.io.File(fs.makeQualified(lock).toUri.getPath)
      try {
        if (!f.createNewFile()) false
        else {
          val out = new java.io.FileOutputStream(f)
          try out.write(content.getBytes("UTF-8")) finally out.close()
          true
        }
      } catch { case _: java.io.IOException => false }
    } else {
      try {
        val out = fs.create(lock, false)
        try out.write(content.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  /** Cross-process per-table mutual exclusion around a mutation's whole
    * read→write→pointer-flip span. Reentrant within this instance. A
    * lock older than `lockStaleMs` (crashed holder) is broken by
    * renaming it to a unique grave name first — rename succeeds for
    * exactly one breaker, so two processes can't both "delete stale,
    * create fresh" and end up holding the lock together.
    */
  private def withTableLock[T](name: String)(body: => T): T = {
    if (heldLocks(name)) return body
    val lock = lockFile(name)
    fs.mkdirs(tableDir(name))
    val deadline = System.currentTimeMillis() + lockTimeoutMs
    var acquired = tryAcquire(lock)
    while (!acquired) {
      val heldSinceMs = try {
        Some(System.currentTimeMillis() -
          fs.getFileStatus(lock).getModificationTime)
      } catch { case _: java.io.FileNotFoundException => None }
      if (heldSinceMs.exists(_ > lockStaleMs)) {
        val grave = new Path(lock.getParent,
          s".${lock.getName}.stale.${java.util.UUID.randomUUID().toString.take(8)}")
        // the rename RETURN decides who wins the break race (checked);
        // the grave delete is best-effort cleanup of an already-
        // neutralized tombstone — a leftover .stale.* file is not live
        // state and never consulted again
        try { if (fs.rename(lock, grave)) fs.delete(grave, false) }
        catch { case _: java.io.IOException => () }
      } else if (System.currentTimeMillis() > deadline) {
        throw new IllegalStateException(
          s"could not acquire commit lock for table $name within " +
            s"${lockTimeoutMs}ms — another writer holds $lock " +
            s"(held ${heldSinceMs.getOrElse(0L)}ms; breaks as stale after " +
            s"${lockStaleMs}ms if its holder crashed)")
      } else Thread.sleep(25 + scala.util.Random.nextInt(50))
      acquired = tryAcquire(lock)
    }
    heldLocks += name
    try body
    finally {
      heldLocks -= name
      // must not throw (finally would mask the body's exception) but
      // must not be SILENT either: a false return leaves the lock held
      // and every writer stalled until the stale-break window passes
      try {
        if (!fs.delete(lock, false) && fs.exists(lock))
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"could not release commit lock $lock — writers on this " +
              s"table stall until the ${lockStaleMs}ms stale-break")
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Every public mutation runs under BOTH the instance monitor
    * (in-JVM serialization, reentrancy guard) and the table's
    * cross-process commit lock.
    */
  private def locked[T](name: String)(body: => T): T =
    synchronized { withTableLock(name)(body) }

  def exists(name: String): Boolean =
    fs.exists(pointerFile(name)) || latestVersionDir(name).isDefined

  /** Newest COMMITTED versioned data directory, by name — version names
    * are `v<epochMillis>_<uuid8>`, so lexicographic order is commit
    * order (13-digit millis until year 2286). Crash-recovery fallback
    * only: the pointer file is the normal resolution path.
    */
  private def latestVersionDir(name: String): Option[Path] = {
    if (!fs.exists(tableDir(name))) return None
    fs.listStatus(tableDir(name)).toSeq
      .filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("v"))
      .filter(isCommitted)
      .sortBy(_.getName).lastOption
  }

  /** A version directory counts as a completed commit only when its
    * parquet job finished (`_SUCCESS`) and, if it holds bucket
    * subdirectories, its `_manifest.json` landed (the manifest is
    * written after the parquet job). Without this gate, a crash during
    * a table's FIRST commit (no pointer yet) would leave a partial data
    * directory that the pointer-less fallback resurrects as live data —
    * and a partial first BUCKET commit would be read as plain parquet
    * with `__b=` dirs inferred as a phantom partition column.
    */
  private def isCommitted(dir: Path): Boolean =
    fs.exists(new Path(dir, "_SUCCESS")) && (
      !fs.listStatus(dir).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith("__b=")) ||
      fs.exists(manifestFile(dir)))

  private def currentVersionDir(name: String): Path = {
    if (!fs.exists(pointerFile(name))) {
      // a crash exactly between pointer delete and rename (pre-overwrite-
      // rename code) or a half-written pointer must not brick the table:
      // fall back to the newest fully-written version directory (data
      // dirs are always materialized before the pointer flips).
      return latestVersionDir(name).getOrElse(
        throw new IllegalStateException(s"table $name has no versions"))
    }
    val in = fs.open(pointerFile(name))
    val v = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
    new Path(tableDir(name), v)
  }

  def read(name: String): DataFrame = {
    require(exists(name), s"table $name does not exist")
    readManifest(name) match {
      case None => spark.read.parquet(currentVersionDir(name).toString)
      case Some(m) => readRefs(name, m.refs.values.toSeq, m.schemaDDL)
    }
  }

  /** Committed versions of a table, oldest → newest (version names are
    * `v<epochMillis>_<uuid8>`, so name order is commit order). With a
    * `graceVersions` retention this is the time-travel window; with
    * immediate pruning it is just the live version plus whatever the
    * current manifest still references.
    */
  def versions(name: String): Seq[String] = {
    if (!fs.exists(tableDir(name))) return Nil
    fs.listStatus(tableDir(name)).toSeq
      .filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("v"))
      .filter(isCommitted)
      .map(_.getName).sorted
  }

  def currentVersion(name: String): String = currentVersionDir(name).getName

  /** Time travel: read the table AS OF a specific committed version
    * (any entry of `versions(name)` that vacuum hasn't reclaimed). A
    * manifest version resolves ITS OWN refs — the bucket/log contents
    * as of that commit — not the current pointer's.
    */
  def readVersion(name: String, version: String): DataFrame = {
    val dir = new Path(tableDir(name), version)
    require(fs.exists(dir) && isCommitted(dir),
      s"table $name has no committed version $version (vacuumed or never existed)")
    readManifestAt(dir) match {
      case None => spark.read.parquet(dir.toString)
      case Some(m) =>
        // an old manifest may reference dirs the CURRENT state no
        // longer does — vacuum only protects the live refs, so time
        // travel past a vacuum fails loudly, never reads partial data
        val missing = m.refs.values.map(_.split("/").head).toSet
          .filterNot(v => fs.exists(new Path(tableDir(name), v)))
        require(missing.isEmpty,
          s"version $version of $name references vacuumed dirs: $missing")
        readRefs(name, m.refs.values.toSeq, m.schemaDDL)
    }
  }

  /** Change feed between any two committed versions (within the vacuum
    * retention window): `__op`-tagged rows via [[graft.operators.TableDiff]]
    * over the registered primary key — CDC after the fact, computed
    * from time travel instead of a writer-maintained log.
    */
  def diffVersions(name: String, fromVersion: String,
      toVersion: String): DataFrame = {
    val pks = primaryKey(name)
    require(pks.nonEmpty,
      s"diffVersions requires a registered primary key on $name")
    graft.operators.TableDiff.diff(
      readVersion(name, fromVersion), readVersion(name, toVersion), pks)
  }

  /** O9 create-if-absent: template schema (with PKs) when registered,
    * else all-string from the CSV headers (process-pipeline.py:104-130).
    */
  def createIfAbsent(name: String, schema: StructType,
      primaryKey: Seq[String] = Nil): Unit = locked(name) {
    if (!exists(name)) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      commit(name, empty, primaryKey)
    }
  }

  def allStringSchema(headers: Seq[String]): StructType =
    StructType(headers.map(h => StructField(h, StringType)))

  /** Append = read current + union + commit new version. Control tables
    * are tiny (rows scale with file count, not data volume — SURVEY §7),
    * so the rewrite is cheap; large data tables only ever commit whole
    * new contents through overwrite().
    */
  def append(name: String, df: DataFrame): Unit = locked(name) {
    val merged = if (exists(name)) read(name).unionByName(df) else df
    commit(name, merged, primaryKey(name))
  }

  def overwrite(name: String, df: DataFrame): Unit = locked(name) {
    commit(name, df, primaryKey(name))
  }

  /** O(batch) append for GROWING tables: the new rows land in a fresh
    * version directory and the manifest gains one ref — existing
    * directories are never read or rewritten, so appending to a 100 TB
    * log costs the batch, not the table (`append` above is
    * read+union+rewrite: right for small control tables that also take
    * updates, quadratic for append-only state). Readers still get ONE
    * multi-path scan via the manifest. Fragmentation from many small
    * appends is maintenance: `compactLog` folds the refs back into one
    * directory.
    */
  def appendLog(name: String, df: DataFrame,
      evolveSchema: Boolean = false): Unit = locked(name) {
    require(bucketCount(name).isEmpty,
      s"$name has a PK-bucket layout; its manifest keys are bucket ids, not log refs")
    validateConstraints(name, df) // the BATCH only — appends stay O(batch)
    val prevManifest: Option[Manifest] = if (exists(name))
      Some(readManifest(name).getOrElse(
        throw new IllegalStateException(
          s"$name is a plain table; appendLog requires a log/manifest table")))
    else None
    // the manifest's schemaDDL reads EVERY historical ref, so a batch
    // with a renamed/retyped column would silently null out history —
    // fail fast on drift instead (nullability may differ; names+types
    // may not). With evolveSchema, column ADDS (and a batch missing a
    // stored column) are legal: parquet refs resolve by NAME under the
    // manifest's explicit read schema, so refs lacking a column yield
    // nulls — only same-name type changes stay fatal. The manifest
    // then carries the union schema (stored order first, new columns
    // appended), so history and new batches read as one frame.
    val unionSchema: StructType = prevManifest match {
      case None => df.schema
      case Some(m) =>
        val stored = StructType.fromDDL(m.schemaDDL)
        if (!evolveSchema) {
          val compatible = stored.length == df.schema.length &&
            stored.fields.zip(df.schema.fields).forall { case (a, b) =>
              // .sql ignores nullability (incl. nested containsNull) —
              // exactly the drift classes that matter are name + type
              a.name == b.name && a.dataType.sql == b.dataType.sql }
          require(compatible,
            s"appendLog schema drift for $name: table is [${stored.toDDL}], " +
              s"batch is [${df.schema.toDDL}] (pass evolveSchema=true to " +
              "accept column adds)")
          stored
        } else {
          val byName = df.schema.fields.map(f => f.name -> f).toMap
          stored.fields.foreach { a =>
            byName.get(a.name).foreach { b =>
              require(a.dataType.sql == b.dataType.sql,
                s"appendLog type drift for $name.${a.name}: " +
                  s"${a.dataType.sql} -> ${b.dataType.sql} — evolution " +
                  "covers column adds, never retypes")
            }
          }
          val storedNames = stored.fieldNames.toSet
          StructType(stored.fields ++
            df.schema.fields.filterNot(f => storedNames(f.name))
              .map(_.copy(nullable = true)))
        }
    }
    val prev: Map[Int, String] = prevManifest.map(_.refs).getOrElse(Map.empty)
    val version = newVersionName()
    val dataDir = new Path(tableDir(name), version)
    // NOTE: refs must stay flat parquet — hive-style partition dirs
    // inside refs are unreadable as one multi-path scan (Spark refuses
    // partition inference over multiple roots). Callers that want
    // filtered reads to skip history cluster each batch on the filter
    // column before appending (range-repartition + sort), so row-group
    // min/max stats prune instead — see appendLogClustered.
    df.write.mode("overwrite").parquet(dataDir.toString)
    val refs = prev + ((prev.keySet + (-1)).max + 1 -> version)
    val json = mapper.writeValueAsString(Map(
      "schemaDDL" -> unionSchema.toDDL,
      "buckets" -> refs.map { case (k, v) => k.toString -> v }))
    writeAtomic(manifestFile(dataDir), json)
    writeAtomic(pointerFile(name), version)
    if (!fs.exists(metaFile(name))) writeMeta(name, primaryKey(name))
    pruneUnreferenced(name)
  }

  /** appendLog with the batch range-clustered on `clusterCols`: each
    * ref's files then carry tight min/max row-group statistics on
    * those columns, so filtered reads skip row groups across the
    * entire history — the append-log analogue of overwriteSorted's
    * data skipping (directory partitioning inside refs is impossible,
    * see appendLog), and what keeps a serving read bounded as the log
    * grows.
    */
  def appendLogClustered(name: String, df: DataFrame,
      clusterCols: Seq[String]): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must be non-empty")
    val cols = clusterCols.map(col)
    appendLog(name,
      df.repartitionByRange(cols: _*).sortWithinPartitions(cols: _*))
  }

  /** Fold an append-log table's refs into one directory (one commit,
    * O(table) — run when fragmentation warrants it, like compact());
    * `clusterCols` re-clusters the fold for row-group skipping.
    */
  def compactLog(name: String, clusterCols: Seq[String] = Nil): Unit =
    compactLogWith(name, identity, clusterCols)

  /** compactLog folding the accumulated frame THROUGH a caller
    * transform before the rewrite — the LSM merge-compaction
    * primitive: a log of partial-aggregate deltas collapses to its
    * merged state (IncrementalView), tombstoned rows get physically
    * reclaimed, etc. The transform's output replaces the log's
    * contents in one atomic commit and must keep a schema that future
    * appends remain compatible with (appendLog re-checks on the next
    * append either way).
    */
  def compactLogWith(name: String, transform: DataFrame => DataFrame,
      clusterCols: Seq[String] = Nil): Unit = locked(name) {
    val df0 = transform(read(name))
    val df = if (clusterCols.isEmpty) df0
      else df0.repartitionByRange(clusterCols.map(col): _*)
        .sortWithinPartitions(clusterCols.map(col): _*)
    val version = newVersionName()
    val dataDir = new Path(tableDir(name), version)
    df.write.mode("overwrite").parquet(dataDir.toString)
    val json = mapper.writeValueAsString(Map(
      "schemaDDL" -> df.schema.toDDL,
      "buckets" -> Map("0" -> version)))
    writeAtomic(manifestFile(dataDir), json)
    writeAtomic(pointerFile(name), version)
    pruneUnreferenced(name)
  }

  /** Overwrite with hive-style partition directories (`col=value/…`).
    * Readers resolve the same `_current` pointer; partition-pruned
    * scans then touch only matching subdirectories — the layout that
    * keeps a 100 TB table's time/tenant slices independently readable.
    */
  def overwritePartitioned(name: String, df: DataFrame,
      partitionCols: Seq[String]): Unit = locked(name) {
    commit(name, df, primaryKey(name), partitionCols)
  }

  /** Overwrite globally clustered on `sortCols`: range-repartition then
    * sort within partitions, so each parquet file covers a disjoint
    * key range and every row group's min/max statistics are tight.
    * Selective filters on the sort key then skip whole row groups at
    * scan time (data skipping) — the cheap cousin of directory
    * partitioning for high-cardinality keys, where `col=value` dirs
    * would explode. Asserted by a scan-metrics spec: the same filter
    * reads orders of magnitude fewer rows from a clustered table.
    */
  def overwriteSorted(name: String, df: DataFrame,
      sortCols: Seq[String]): Unit = locked(name) {
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    val cols = sortCols.map(col)
    commit(name,
      df.repartitionByRange(cols: _*).sortWithinPartitions(cols: _*),
      primaryKey(name))
  }

  /** Overwrite with a Z-ORDER (Morton) clustering over numeric `zCols`:
    * a lexicographic sort skips row groups only for filters on the
    * LEADING column — every file spans the full range of the others.
    * Here each column is rank-normalized into 2^bits cells by its
    * approximate quantile boundaries (rank, not width: skew cannot
    * collapse the grid into one cell), the cell indices are
    * bit-interleaved into one Morton key, and the table is
    * range-partitioned + sorted by that key — so every file covers a
    * small hyper-rectangle and parquet min/max stats skip for a
    * selective filter on ANY z-column. The quantile pass is one
    * bounded driver-side sketch per column (2^bits−1 doubles);
    * everything else is a codegen'd projection. `numPartitions` sizes
    * the write fan-out (defaults to the session shuffle parallelism);
    * at warehouse scale pick it so files land near the row-group
    * target, since skipping granularity IS the file/row-group grid.
    */
  def overwriteZOrdered(name: String, df: DataFrame, zCols: Seq[String],
      bits: Int = 4, numPartitions: Option[Int] = None): Unit = locked(name) {
    require(zCols.size >= 2, "z-order needs at least two columns")
    require(bits >= 1 && bits * zCols.size <= 62, "morton key must fit a long")
    val cells = 1 << bits
    val probs = (1 until cells).map(_.toDouble / cells).toArray
    // ONE pass for all columns' sketches — the per-column overload
    // would rescan the whole input zCols.size times
    val splits = df.stat.approxQuantile(zCols.toArray, probs, 0.001).toSeq
    // cell index = #boundaries ≤ value (nulls land in cell 0)
    val cellCols = zCols.zip(splits).map { case (c, bs) =>
      bs.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(c).cast("double") >= lit(b), 1).otherwise(0)
      }
    }
    val z = (0 until bits).flatMap { i =>
      cellCols.zipWithIndex.map { case (cc, j) =>
        shiftright(cc, i).bitwiseAND(lit(1)).cast("long") *
          lit(1L << (i * zCols.size + j))
      }
    }.reduce(_ + _)
    val parts = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val clustered = df.withColumn("__z", z)
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    commit(name, clustered, primaryKey(name))
  }

  /** Overwrite with write-time parquet BLOOM FILTERS on point-lookup
    * columns: min/max row-group stats only skip when the table is
    * clustered by the filtered column — a bloom filter skips row
    * groups for equality probes on a column in ANY physical order, the
    * layout that keeps `lookupByPk`-style point reads cheap on a table
    * sorted/z-ordered by something else entirely. `expectedNdv` sizes
    * each filter (parquet allocates ~1.2 bytes/value at its default 1%
    * FPP); `rowGroupBytes` optionally shrinks the parquet block size,
    * since skipping granularity IS the row-group grid (at warehouse
    * scale leave the 128 MB default — a 100 TB table already has ~10⁶
    * row groups to skip).
    */
  def overwriteWithBloom(name: String, df: DataFrame,
      bloomCols: Seq[String], expectedNdv: Long,
      rowGroupBytes: Option[Long] = None): Unit = locked(name) {
    require(bloomCols.nonEmpty, "bloomCols must be non-empty")
    val opts = bloomCols.flatMap(c => Seq(
      s"parquet.bloom.filter.enabled#$c" -> "true",
      s"parquet.bloom.filter.expected.ndv#$c" -> expectedNdv.toString)).toMap ++
      rowGroupBytes.map(b => "parquet.block.size" -> b.toString)
    commit(name, df, primaryKey(name), Nil, opts)
  }

  // ------------------------------------------------- bucket layout
  // A table may opt into a PK-hash bucket layout: rows live in
  // `bucketCount` hash buckets, each materialized as its own directory,
  // and a per-version `_manifest.json` maps bucket → the version
  // directory that last rewrote it. A mutation then reads and rewrites
  // ONLY the buckets containing its keys — at 100 TB, an approved CSV
  // touches a handful of partitions instead of the whole table — while
  // the `_current` pointer flip stays the single atomic commit point
  // (a manifest references immutable directories; old versions are
  // pruned only once nothing in the current manifest points at them).

  private case class Manifest(refs: Map[Int, String], schemaDDL: String)

  /** Bucket id of a row: pmod(hash(pk…), n) — deterministic Murmur3,
    * computable engine-side with no lookup.
    */
  def bucketOf(pkCols: Seq[String], n: Int): Column =
    pmod(hash(pkCols.map(col): _*), lit(n))

  /** Opt a table into the bucket layout (the layout itself materializes
    * on its next mutation). Requires a registered primary key.
    */
  def registerBucketLayout(name: String, numBuckets: Int): Unit = locked(name) {
    require(numBuckets > 0, "numBuckets must be positive")
    require(primaryKey(name).nonEmpty,
      s"bucket layout for $name requires a registered primary key")
    writeMeta(name, primaryKey(name), Some(numBuckets))
  }

  def bucketCount(name: String): Option[Int] = {
    val node = readMetaNode(name).flatMap(n => Option(n.get("bucketCount")))
    node.map(_.asInt())
  }

  def hasBucketManifest(name: String): Boolean =
    exists(name) && readManifest(name).isDefined

  /** Current bucket → data-directory map (empty when the table has no
    * bucket manifest yet). Introspection for tools and tests.
    */
  def bucketRefs(name: String): Map[Int, String] =
    readManifest(name).map(_.refs).getOrElse(Map.empty)

  /** Read only the given buckets of a manifested table; an unmanifested
    * table is one undivided bucket, so the whole table comes back.
    */
  def readBuckets(name: String, buckets: Seq[Int]): DataFrame =
    readManifest(name) match {
      case Some(m) =>
        readRefs(name, buckets.distinct.flatMap(m.refs.get), m.schemaDDL)
      case None => read(name)
    }

  /** Point read by primary key: on a manifested table the key's bucket
    * is computed DRIVER-SIDE (the same Murmur3 hash `bucketOf` plans,
    * evaluated on the literal key — no job, no lookup) and only that
    * one bucket directory is scanned; 1/numBuckets of the table instead
    * of all of it. Falls back to a filtered full read when no bucket
    * layout exists. `key` values align positionally with primaryKey().
    */
  def lookupByPk(name: String, key: Seq[Any]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Murmur3Hash}
    val pks = primaryKey(name)
    require(pks.nonEmpty, s"table $name has no registered primary key")
    require(key.length == pks.length,
      s"expected ${pks.length} key values for (${pks.mkString(", ")})")
    val pred = pks.zip(key).map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)
    (bucketCount(name), readManifest(name)) match {
      case (Some(n), Some(m)) =>
        val sch = StructType.fromDDL(m.schemaDDL)
        val h = new Murmur3Hash(pks.zip(key).map { case (c, v) =>
          Cast(Literal(v), sch(c).dataType, Some("UTC"))
        }).eval(null).asInstanceOf[Int]
        val bucket = ((h % n) + n) % n
        readRefs(name, m.refs.get(bucket).toSeq, m.schemaDDL).filter(pred)
      case _ => read(name).filter(pred)
    }
  }

  /** Migrate/overwrite the WHOLE table into bucket layout. */
  def overwriteAllBuckets(name: String, df: DataFrame): Unit = locked(name) {
    commitBuckets(name, df, prev = Map.empty, touched = Nil)
  }

  /** Compact fragmented buckets: every bucket whose directory holds
    * more than `maxFilesPerBucket` part-files is rewritten — through
    * the normal bucket-scoped commit path — after a repartition that
    * lands each bucket in one task, i.e. ONE file per bucket.
    * Untouched buckets keep their existing immutable directories, so
    * compaction cost is proportional to the fragmentation, not the
    * table (the small-file problem is maintenance, not a rewrite of
    * 100 TB). Old version directories become unreferenced as their
    * last buckets compact away and are pruned by the commit. Returns
    * the compacted bucket ids.
    */
  def compact(name: String, maxFilesPerBucket: Int = 1): Seq[Int] = locked(name) {
    val m = readManifest(name).getOrElse(throw new IllegalStateException(
      s"$name has no bucket manifest; only bucketed tables compact"))
    val frag = m.refs.filter { case (_, ref) =>
      fs.listStatus(new Path(tableDir(name), ref))
        .count(s => s.isFile && s.getPath.getName.startsWith("part-")) >
        maxFilesPerBucket
    }.keys.toSeq.sorted
    if (frag.nonEmpty) {
      val n = bucketCount(name).get
      val df = readBuckets(name, frag)
        .repartition(frag.length, bucketOf(primaryKey(name), n))
      commitBuckets(name, df, m.refs, frag)
    }
    frag
  }

  /** Rewrite only `touched` buckets: `df` must hold exactly the new
    * contents of those buckets; every other bucket keeps its existing
    * (immutable) directory via the carried-over manifest entry.
    */
  def overwriteBuckets(name: String, df: DataFrame, touched: Seq[Int]): Unit =
    locked(name) {
      val prev = readManifest(name).map(_.refs).getOrElse(
        throw new IllegalStateException(
          s"$name has no bucket manifest; use overwriteAllBuckets first"))
      commitBuckets(name, df, prev, touched)
    }

  // --------------------------------------------- co-located layout
  // Large analytical tables that are repeatedly joined/aggregated on
  // one key want Spark's bucketed layout: bucketBy+sortBy persists a
  // hash-partitioned, sorted file set and registers the spec with the
  // session catalog — the ONLY metadata path the planner consults to
  // elide the shuffle on both sides of a key-equality join. (The
  // versioned bucket-MANIFEST layout above serves mutation workloads;
  // plain parquet reads cannot declare an outputPartitioning, so the
  // two layouts are complementary, not redundant.)

  private def coLocatedIdent(name: String) = s"graft_$name"

  /** Persist `df` as a co-located table: repeated equality joins and
    * aggregations on `bucketCols` between tables sharing (cols, n)
    * plan with no Exchange on either side. Files live under this
    * catalog's root; the spec is introspectable via coLocatedSpec.
    */
  private def coLocatedSpecFile(name: String) =
    new Path(tableDir(name), "_colocated_spec.json")

  def saveCoLocated(name: String, df: DataFrame, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = locked(name) {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val sort = if (sortCols.nonEmpty) sortCols else bucketCols
    df.write
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sort.head, sort.tail: _*)
      .option("path", new Path(tableDir(name), "colocated").toString)
      .mode("overwrite")
      .saveAsTable(coLocatedIdent(name))
    // saveAsTable registers the ident only in the catalog of the
    // session that ran the build. Persist the bucket spec beside the
    // files so readCoLocated can re-attach the metadata from ANY
    // SparkSession (another session in this JVM, or a later process
    // pointed at the same root) instead of failing table-not-found.
    writeAtomic(coLocatedSpecFile(name), mapper.writeValueAsString(Map(
      "schemaDDL" -> df.schema.toDDL,
      "bucketCols" -> bucketCols,
      "sortCols" -> sort,
      "numBuckets" -> numBuckets)))
  }

  /** Read a co-located table WITH its bucket metadata attached (a plain
    * parquet read of the same files would forget the partitioning and
    * reintroduce the shuffle). If this session's catalog lacks the
    * ident — the warehouse was built by a different SparkSession — the
    * table is re-registered from the persisted spec first, as an
    * external table over the existing files (no data is rewritten).
    */
  def readCoLocated(name: String): DataFrame = synchronized {
    val ident = coLocatedIdent(name)
    if (!spark.catalog.tableExists(ident)) {
      val f = coLocatedSpecFile(name)
      if (!fs.exists(f))
        throw new IllegalStateException(
          s"no co-located table '$name' under $root")
      val in = fs.open(f)
      val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
      val node = mapper.readTree(txt)
      def cols(field: String) = node.get(field).elements.asScala
        .map(n => s"`${n.asText()}`").mkString(", ")
      spark.sql(
        s"""CREATE TABLE $ident (${node.get("schemaDDL").asText()})
           |USING PARQUET
           |CLUSTERED BY (${cols("bucketCols")})
           |SORTED BY (${cols("sortCols")})
           |INTO ${node.get("numBuckets").asInt()} BUCKETS
           |LOCATION '${new Path(tableDir(name), "colocated")}'""".stripMargin)
    }
    spark.table(ident)
  }

  def coLocatedSpec(name: String): Option[(Seq[String], Int)] =
    org.apache.spark.sql.graftbridge.PlanBridge
      .bucketSpecOf(spark, coLocatedIdent(name))

  /** Convergence of the two bucket layouts: materialize a manifested
    * (mutation-facing) table as a co-located `bucketBy` table keyed on
    * its primary key. The manifest layout stays the WRITE face — cheap
    * bucket-scoped mutations, versioned commits — and this produces the
    * READ face from it: a session-catalog bucket spec the planner can
    * use to elide the shuffle on PK-equality joins/aggregations. They
    * cannot be one layout: plain parquet reads (the manifest path)
    * cannot declare an outputPartitioning to the planner, and bucketBy
    * tables cannot be rewritten one bucket at a time through a
    * versioned pointer — so the engine keeps both and converts
    * mutation-face → join-face here, typically after a mutation burst
    * settles. Reuses the manifest's bucket count unless overridden.
    */
  def migrateToCoLocated(name: String,
      numBuckets: Option[Int] = None): (Seq[String], Int) = locked(name) {
    val pks = primaryKey(name)
    require(pks.nonEmpty,
      s"co-located migration for $name requires a registered primary key")
    val n = numBuckets.orElse(bucketCount(name)).getOrElse(throw
      new IllegalStateException(
        s"$name has no bucket layout; pass numBuckets explicitly"))
    saveCoLocated(name, read(name), pks, n, pks)
    (pks, n)
  }

  /** All refs of a manifest share its schemaDDL, so they read as ONE
    * multi-path scan — a single FileScan node regardless of bucket
    * count. The earlier per-ref `unionByName` fold built an O(buckets)
    * plan: a 1,024-bucket table became a 1,024-node union tree on every
    * read, with driver-side analysis cost to match.
    */
  private def readRefs(name: String, refs: Seq[String],
      schemaDDL: String): DataFrame =
    if (refs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL(schemaDDL))
    else
      spark.read.schema(StructType.fromDDL(schemaDDL))
        .parquet(refs.sorted.map(r => new Path(tableDir(name), r).toString): _*)

  private def manifestFile(versionDir: Path) = new Path(versionDir, "_manifest.json")

  private def readManifest(name: String): Option[Manifest] =
    readManifestAt(currentVersionDir(name))

  private def readManifestAt(versionDir: Path): Option[Manifest] = {
    val mf = manifestFile(versionDir)
    if (!fs.exists(mf)) return None
    val in = fs.open(mf)
    val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    val node = mapper.readTree(txt)
    val b = node.get("buckets")
    Some(Manifest(
      b.fieldNames.asScala.map(k => k.toInt -> b.get(k).asText()).toMap,
      node.get("schemaDDL").asText()))
  }

  private def commitBuckets(name: String, df: DataFrame,
      prev: Map[Int, String], touched: Seq[Int]): Unit = {
    val pks = primaryKey(name)
    val n = bucketCount(name).getOrElse(
      throw new IllegalStateException(s"$name has no registered bucket layout"))
    val version = newVersionName()
    val dataDir = new Path(tableDir(name), version)
    df.withColumn("__b", bucketOf(pks, n))
      .write.partitionBy("__b").mode("overwrite").parquet(dataDir.toString)
    // which buckets actually materialized (a delete can empty one —
    // its manifest entry must drop, not dangle)
    val written = fs.listStatus(dataDir).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("__b="))
      .map(d => d.stripPrefix("__b=").toInt -> s"$version/$d").toMap
    val refs = (prev -- touched) ++ written
    val json = mapper.writeValueAsString(Map(
      "schemaDDL" -> df.schema.toDDL, "buckets" -> refs.map {
        case (k, v) => k.toString -> v
      }))
    writeAtomic(manifestFile(dataDir), json)
    writeAtomic(pointerFile(name), version)
    if (!fs.exists(metaFile(name))) writeMeta(name, pks)
    pruneUnreferenced(name)
  }

  /** Version GC. Deletes version directories that are neither the
    * `_current` pointer target nor reachable from any live bucket-
    * manifest ref (untouched buckets keep referencing the version that
    * last rewrote them — those must survive any vacuum, so liveness is
    * ref-counted from the manifest, never inferred from age).
    *
    * `keepLast` additionally retains that many of the NEWEST
    * unreferenced versions — a grace window for in-flight readers whose
    * lazy DataFrames resolved the previous pointer. `minAgeMs` guards
    * cross-process races: a version directory younger than this (by the
    * epoch millis in its name) may be another writer's in-flight commit
    * whose pointer flip hasn't landed yet, so it is left alone.
    * Returns the deleted version names.
    */
  def vacuum(name: String, keepLast: Int = 0,
      minAgeMs: Long = 0L): Seq[String] = locked(name) {
    require(keepLast >= 0, "keepLast must be >= 0")
    if (!exists(name)) return Nil
    val cur = currentVersionDir(name).getName
    val referenced = readManifest(name)
      .map(_.refs.values.map(_.split("/").head).toSet)
      .getOrElse(Set.empty) + cur
    val now = System.currentTimeMillis()
    val expendable = fs.listStatus(tableDir(name)).toSeq
      .filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.startsWith("v") && !referenced(p.getName))
      .sortBy(_.getName)
      .dropRight(keepLast)
      .filter(p => versionMillis(p.getName).forall(now - _ >= minAgeMs))
    // report only versions ACTUALLY deleted: a false return must not
    // claim a prune that didn't happen (the dir would linger and the
    // caller's accounting drift)
    expendable.filter(p => fs.delete(p, true)).map(_.getName)
  }

  private def versionMillis(v: String): Option[Long] = {
    val digits = v.stripPrefix("v").takeWhile(_.isDigit)
    if (digits.isEmpty) None else Some(digits.toLong)
  }

  /** Post-commit GC: every surviving directory is reachable from the
    * live table state (or inside the configured grace window).
    */
  private def pruneUnreferenced(name: String): Unit = {
    vacuum(name, keepLast = graceVersions)
    ()
  }

  private def newVersionName(): String =
    s"v${System.currentTimeMillis()}_${java.util.UUID.randomUUID().toString.take(8)}"

  def schema(name: String): StructType = read(name).schema

  def primaryKey(name: String): Seq[String] =
    readMetaNode(name).flatMap(n => Option(n.get("primaryKey"))) match {
      case None => Nil
      case Some(pks) => (0 until pks.size()).map(i => pks.get(i).asText())
    }

  private def readMetaNode(name: String): Option[com.fasterxml.jackson.databind.JsonNode] = {
    if (!fs.exists(metaFile(name))) return None
    val in = fs.open(metaFile(name))
    val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    Some(mapper.readTree(txt))
  }

  def registerPrimaryKey(name: String, pks: Seq[String]): Unit =
    locked(name) { writeMeta(name, pks) }

  def listTables(): Seq[String] =
    if (!fs.exists(new Path(root))) Nil
    else fs.listStatus(new Path(root)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(exists)

  /** Persist table metadata, preserving a previously registered bucket
    * layout unless a new one is given.
    */
  private def writeMeta(name: String, pks: Seq[String],
      buckets: Option[Int] = None,
      constraintsOverride: Option[Map[String, String]] = None): Unit = {
    val bc = buckets.orElse(bucketCount(name))
    val cs = constraintsOverride.getOrElse(constraints(name))
    val m: Map[String, Any] = Map("primaryKey" -> pks) ++
      bc.map(n => "bucketCount" -> n) ++
      (if (cs.nonEmpty) Map("constraints" -> cs) else Map.empty)
    writeAtomic(metaFile(name), mapper.writeValueAsString(m))
  }

  /** Registered CHECK constraints: label → boolean SQL expression. */
  def constraints(name: String): Map[String, String] =
    readMetaNode(name).flatMap(n => Option(n.get("constraints"))) match {
      case None => Map.empty
      case Some(c) =>
        val it = c.fields()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
        b.result()
    }

  /** Register CHECK constraints validated on every subsequent commit
    * (overwrite/append families and appendLog batches): each is a
    * boolean SQL expression over the table's columns; NULL passes, as
    * in ANSI CHECK — spell NOT NULL explicitly (`c IS NOT NULL`).
    * Validation is ONE aggregate pass over the batch counting
    * violations per constraint, and a violating commit fails loudly
    * with per-constraint counts BEFORE any data lands — the write-side
    * quality gate, so a bad upstream batch can't poison a 100 TB
    * table and force a version rollback.
    */
  def registerConstraints(name: String, cs: Map[String, String]): Unit =
    locked(name) {
      writeMeta(name, primaryKey(name), constraintsOverride = Some(cs))
    }

  private def validateConstraints(name: String, df: DataFrame): Unit = {
    val cs = constraints(name).toSeq.sortBy(_._1)
    if (cs.isEmpty) return
    val counts = df.select(cs.map { case (label, sql) =>
      coalesce(sum(when(!coalesce(expr(sql), lit(true)), 1L).otherwise(0L)),
        lit(0L)).as(label)
    }: _*).head()
    val violated = cs.indices.filter(counts.getLong(_) > 0)
      .map(i => s"${cs(i)._1} [${cs(i)._2}]: ${counts.getLong(i)} rows")
    require(violated.isEmpty,
      s"commit to $name rejected by CHECK constraints — ${violated.mkString("; ")}")
  }

  private def commit(name: String, df: DataFrame, pks: Seq[String],
      partitionCols: Seq[String] = Nil,
      writeOptions: Map[String, String] = Map.empty): Unit = {
    validateConstraints(name, df)
    val version = newVersionName()
    val dataDir = new Path(tableDir(name), version)
    // Materialize BEFORE flipping the pointer: df may itself read the
    // current version (read-merge-overwrite), and parquet writes are
    // lazy per partition.
    val writer0 = df.write.options(writeOptions)
    val writer = if (partitionCols.nonEmpty)
      writer0.partitionBy(partitionCols: _*) else writer0
    writer.mode("overwrite").parquet(dataDir.toString)
    writeAtomic(pointerFile(name), version)
    if (pks.nonEmpty || !fs.exists(metaFile(name))) writeMeta(name, pks)
    pruneUnreferenced(name)
  }

  /** Write-temp + rename-with-OVERWRITE: FileContext.rename(…, OVERWRITE)
    * replaces the target in one atomic step on local FS and HDFS — no
    * delete-then-rename window in which a crash would leave the table
    * with no pointer at all (currentVersionDir's newest-version fallback
    * covers tables written by the older two-step code).
    *
    * FileContext requires an AbstractFileSystem binding
    * (`fs.AbstractFileSystem.<scheme>.impl`), which object-store
    * deployments don't always ship. Fall back to delete+rename there:
    * that reopens the tiny no-pointer window, but currentVersionDir's
    * newest-committed-version fallback makes a crash inside it
    * recoverable, not fatal (CrashFaultSpec pins exactly this).
    */
  private def writeAtomic(target: Path, content: String): Unit = {
    val tmp = new Path(target.getParent, s".${target.getName}.tmp${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (fs.exists(target)) fs.delete(target, false)
        if (!fs.rename(tmp, target))
          throw new java.io.IOException(s"rename $tmp -> $target failed")
    }
  }
}
