package graft.catalog

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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
  * renaming the data directory itself. Old versions are pruned on the
  * next successful commit, never at read time.
  */
class Catalog(spark: SparkSession, root: String) {
  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableDir(name: String) = new Path(root, name)
  private def pointerFile(name: String) = new Path(tableDir(name), "_current")
  private def metaFile(name: String) = new Path(tableDir(name), "_meta.json")

  def exists(name: String): Boolean =
    fs.exists(pointerFile(name)) || latestVersionDir(name).isDefined

  /** Newest versioned data directory, by name — version names are
    * `v<epochMillis>_<uuid8>`, so lexicographic order is commit order
    * (13-digit millis until year 2286). Crash-recovery fallback only:
    * the pointer file is the normal resolution path.
    */
  private def latestVersionDir(name: String): Option[Path] = {
    if (!fs.exists(tableDir(name))) return None
    fs.listStatus(tableDir(name)).toSeq
      .filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("v"))
      .sortBy(_.getName).lastOption
  }

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
    spark.read.parquet(currentVersionDir(name).toString)
  }

  /** O9 create-if-absent: template schema (with PKs) when registered,
    * else all-string from the CSV headers (process-pipeline.py:104-130).
    */
  def createIfAbsent(name: String, schema: StructType,
      primaryKey: Seq[String] = Nil): Unit = synchronized {
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
  def append(name: String, df: DataFrame): Unit = synchronized {
    val merged = if (exists(name)) read(name).unionByName(df) else df
    commit(name, merged, primaryKey(name))
  }

  def overwrite(name: String, df: DataFrame): Unit = synchronized {
    commit(name, df, primaryKey(name))
  }

  /** Overwrite with hive-style partition directories (`col=value/…`).
    * Readers resolve the same `_current` pointer; partition-pruned
    * scans then touch only matching subdirectories — the layout that
    * keeps a 100 TB table's time/tenant slices independently readable.
    */
  def overwritePartitioned(name: String, df: DataFrame,
      partitionCols: Seq[String]): Unit = synchronized {
    commit(name, df, primaryKey(name), partitionCols)
  }

  def schema(name: String): StructType = read(name).schema

  def primaryKey(name: String): Seq[String] = {
    if (!fs.exists(metaFile(name))) return Nil
    val in = fs.open(metaFile(name))
    val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    val node = mapper.readTree(txt)
    val pks = node.get("primaryKey")
    if (pks == null) Nil
    else (0 until pks.size()).map(i => pks.get(i).asText())
  }

  def registerPrimaryKey(name: String, pks: Seq[String]): Unit =
    writeMeta(name, pks)

  def listTables(): Seq[String] =
    if (!fs.exists(new Path(root))) Nil
    else fs.listStatus(new Path(root)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(exists)

  private def writeMeta(name: String, pks: Seq[String]): Unit = {
    val json = mapper.writeValueAsString(Map("primaryKey" -> pks))
    writeAtomic(metaFile(name), json)
  }

  private def commit(name: String, df: DataFrame, pks: Seq[String],
      partitionCols: Seq[String] = Nil): Unit = {
    val version = s"v${System.currentTimeMillis()}_${java.util.UUID.randomUUID().toString.take(8)}"
    val dataDir = new Path(tableDir(name), version)
    // Materialize BEFORE flipping the pointer: df may itself read the
    // current version (read-merge-overwrite), and parquet writes are
    // lazy per partition.
    val writer = if (partitionCols.nonEmpty)
      df.write.partitionBy(partitionCols: _*) else df.write
    writer.mode("overwrite").parquet(dataDir.toString)
    val previous = if (exists(name)) Some(currentVersionDir(name)) else None
    writeAtomic(pointerFile(name), version)
    if (pks.nonEmpty || !fs.exists(metaFile(name))) writeMeta(name, pks)
    previous.filter(_.getName != version).foreach(p => fs.delete(p, true))
  }

  /** Write-temp + rename-with-OVERWRITE: FileContext.rename(…, OVERWRITE)
    * replaces the target in one atomic step on local FS and HDFS — no
    * delete-then-rename window in which a crash would leave the table
    * with no pointer at all (currentVersionDir's newest-version fallback
    * covers tables written by the older two-step code).
    */
  private def writeAtomic(target: Path, content: String): Unit = {
    val tmp = new Path(target.getParent, s".${target.getName}.tmp${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.getUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
}
