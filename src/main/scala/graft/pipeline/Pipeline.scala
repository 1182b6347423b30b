package graft.pipeline

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.model._
import graft.notify.Notifier
import graft.ops.{MutationOps, PathOps}

/** The three execution paths of the reference collapsed into Spark jobs
  * (SURVEY §3): E1 file arrival → register + approval request; E3
  * approval → apply insert/upsert/stage-delete + result notification;
  * E4 scheduled execution of staged deletes.
  *
  * All orchestration (guards, dispatch, control-row updates) runs on the
  * driver, mirroring the reference's single-threaded Cloud Functions;
  * all data movement is distributed DataFrame work.
  *
  * @param landingRoot directory standing in for the GCS bucket: CSVs
  *   land under `landingRoot/<bucket>/<operation>/<file>.csv`.
  * @param maxControlRows guard on the control-plane `.collect()`s: the
  *   driver-side orchestration assumes control rows scale with FILE
  *   EVENTS, not data rows (SURVEY §7). That assumption is sound for
  *   this pipeline's design but nothing enforced it — a misuse that
  *   routed data-scale rows through a control path would OOM the
  *   driver with no hint why. Past this many rows, the collect fails
  *   loudly with guidance instead.
  */
final class Pipeline(
    spark: SparkSession,
    val catalog: Catalog,
    notifier: Notifier,
    landingRoot: String,
    approver: String = "owner@example.com",
    val maxControlRows: Int = 1000000) {

  val ControlTable = "processed_files"
  val DeleteControlTable = "delete_control"

  private def nowIso(): String = Instant.now().toString

  /** Driver-side materialization of a CONTROL frame, capped: collects
    * at most `maxControlRows + 1` rows (the limit bounds driver memory
    * even when the input is huge) and fails with guidance when the cap
    * is exceeded — control tables hold file/approval/delete-control
    * rows, so blowing the cap means data rows were routed through a
    * control path, and the fix is the data path, not a bigger driver.
    */
  private def collectControl(df: DataFrame,
      what: String): Array[org.apache.spark.sql.Row] = {
    val rows = df.limit(maxControlRows + 1).collect()
    if (rows.length > maxControlRows)
      throw new IllegalStateException(
        s"control-plane guard: $what exceeded maxControlRows=" +
          s"$maxControlRows. Control rows scale with file events, not " +
          "data volume — route data-scale rows through the distributed " +
          "data path (or raise maxControlRows if this volume of control " +
          "events is intended).")
    rows
  }

  private def ensureControlTables(): Unit = {
    catalog.createIfAbsent(ControlTable, ProcessedFile.schema)
    catalog.createIfAbsent(DeleteControlTable, DeleteControl.schema)
  }

  // ---------------------------------------------------------------- E1

  /** data-query.py:199-239 — register one object-arrival event, version
    * it, and request approval. Returns the assigned version, or None
    * when the path is filtered out (folder markers, unknown operation).
    */
  def registerArrival(ev: FileEvent): Option[Long] = {
    ensureControlTables()
    if (ev.name.endsWith("/")) return None // folder creation event
    val segments = ev.name.split("/").filter(_.nonEmpty)
    if (segments.length < 2) return None
    val operation = segments.head.toLowerCase
    if (!Operation.all.contains(operation)) return None
    val fileName = segments.last
    val tableName = PathOps.deriveTableName(fileName)
    // version keyed by file_name ALONE — the reference's MAX query
    // (data-query.py:74-79) does not filter by operation, so an update
    // re-upload of a previously inserted file continues its history
    val version = PathOps.nextVersion(catalog.read(ControlTable), fileName)
    import spark.implicits._
    val row = Seq(ProcessedFile(fileName, ev.id, version,
      is_processed = false, ev.bucket, operation, Status.Pending, None)).toDF()
    catalog.append(ControlTable, row)
    val ts = nowIso()
    notifier.requestApproval(approver, operation, tableName,
      fileName, ev.id, ev.bucket, version, ts,
      approveUrl = s"https://approvals.local/?event_id=${ev.id}&action=approve",
      rejectUrl = s"https://approvals.local/?event_id=${ev.id}&action=reject")
    Some(version)
  }

  /** Set-based E1: register a whole batch of arrival events in ONE
    * control-table commit — guards and routing as column expressions,
    * versions continued per file with a single window
    * (PathOps.assignVersions) instead of one MAX query per event.
    * Returns (event_id, assigned version); filtered events are absent.
    */
  def registerArrivals(events: Seq[FileEvent]): Map[String, Long] = {
    ensureControlTables()
    if (events.isEmpty) return Map.empty
    import spark.implicits._
    val arrivals = events.toDF("bucket", "name", "id")
      .filter(!col("name").endsWith("/"))
      .withColumn("__segs",
        filter(split(col("name"), "/"), s => length(s) > 0))
      .filter(size(col("__segs")) >= 2)
      .withColumn("operation", lower(element_at(col("__segs"), 1)))
      .filter(graft.ops.PathOps.isValidOperation(col("operation")))
      .withColumn("file_name", element_at(col("__segs"), -1))
    val versioned = collectControl(graft.ops.PathOps.assignVersions(
        catalog.read(ControlTable), arrivals, ord = col("id"))
      .select(col("file_name"), col("id").as("event_id"),
        col("file_version"), lit(false).as("is_processed"),
        col("bucket"), col("operation"), lit(Status.Pending).as("status"),
        lit(null).cast("timestamp").as("approval_timestamp")),
      "registerArrivals' versioned file events")
    if (versioned.isEmpty) return Map.empty
    catalog.append(ControlTable,
      spark.createDataFrame(spark.sparkContext.parallelize(versioned.toSeq, 1),
        graft.model.ProcessedFile.schema))
    val ts = nowIso()
    versioned.foreach { r =>
      val (file, id, op, bucket, version) = (r.getString(0), r.getString(1),
        r.getString(5), r.getString(4), r.getLong(2))
      notifier.requestApproval(approver, op, graft.ops.PathOps.deriveTableName(file),
        file, id, bucket, version, ts,
        approveUrl = s"https://approvals.local/?event_id=$id&action=approve",
        rejectUrl = s"https://approvals.local/?event_id=$id&action=reject")
    }
    versioned.map(r => r.getString(1) -> r.getLong(2)).toMap
  }

  // ---------------------------------------------------------------- E3

  /** process-pipeline.py:436-532 — the approval state machine, one
    * event (single control-table commit, via the batch path).
    */
  def processApproval(ev: ApprovalEvent): Unit = processApprovals(Seq(ev))

  /** Batch-grouped E3: the full per-event state machine (approve →
    * apply + notify, reject, failed-field / failed-op, unknown-action
    * drop, O8 idempotency), but ALL status updates of a micro-batch
    * land in ONE conditional control-table rewrite — a burst of N
    * approvals costs one commit instead of N full-table rewrites
    * (which would be quadratic in control-table size).
    *
    * Events are applied in sequence (the reference handles one Pub/Sub
    * message per invocation — process-pipeline.py:436 — so in-batch
    * order IS arrival order); a duplicate event_id later in the batch
    * is skipped exactly as a replayed message would be.
    */
  def processApprovals(events: Seq[ApprovalEvent]): Unit = {
    ensureControlTables()
    val valid = events.filter(ev =>
      ev.event_id != null && ev.event_id.nonEmpty &&
        ev.action != null && ev.action.nonEmpty)
    if (valid.isEmpty) return
    // O8 idempotency, one control-table read for the whole batch
    val done = alreadyProcessedSet(valid.map(_.event_id))
    val updates = Seq.newBuilder[(String, String, String)]
    val seen = scala.collection.mutable.Set[String]()
    valid.foreach { ev =>
      if (!done(ev.event_id) && !seen(ev.event_id)) {
        val approvalTs =
          ev.approval_timestamp.filter(_.nonEmpty).getOrElse(nowIso())
        // an update CONSUMES the event_id: later in-batch duplicates are
        // skipped exactly as a replayed message would be. An unknown
        // action persists nothing, so it must NOT consume the id — the
        // reference drops the message without marking it processed
        // (process-pipeline.py:469-471), leaving a later valid
        // approve/reject for the same id free to land.
        def consume(status: String): Unit = {
          updates += ((ev.event_id, status, approvalTs))
          seen += ev.event_id
        }
        ev.action.toLowerCase match {
          case "approve" =>
            if (Seq(ev.file_name, ev.bucket, ev.table_name, ev.operation)
                .exists(v => v == null || v.isEmpty)) {
              consume(Status.Failed)
            } else try {
              applyOperation(ev.operation.toLowerCase, ev.bucket, ev.file_name,
                ev.table_name, ev.event_id, approvalTs)
              consume(Status.Approved)
              notifier.reportResult(approver, ev.operation, ev.table_name,
                ev.file_name, ev.event_id, ev.bucket, success = true,
                "Operation completed successfully", approvalTs)
            } catch {
              case e: Exception =>
                consume(Status.Failed)
                notifier.reportResult(approver, ev.operation, ev.table_name,
                  ev.file_name, ev.event_id, ev.bucket, success = false,
                  s"Operation failed: ${e.getMessage}", approvalTs)
            }
          case "reject" =>
            consume(Status.Rejected)
          case _ => () // unknown action: logged & dropped (process-pipeline.py:469-471)
        }
      }
    }
    markControl(updates.result())
  }

  /** O8 — any error reading the control table is treated as "not yet
    * processed" (process-pipeline.py:97-99; a preserved reference quirk).
    */
  def alreadyProcessed(eventId: String): Boolean =
    alreadyProcessedSet(Seq(eventId)).contains(eventId)

  /** O8 for a batch: which of `eventIds` are already processed, in one
    * control-table read. Read errors → "none processed", preserving the
    * reference quirk (process-pipeline.py:97-99).
    */
  private def alreadyProcessedSet(eventIds: Seq[String]): Set[String] =
    try {
      collectControl(catalog.read(ControlTable)
        .filter(col("event_id").isin(eventIds.distinct: _*) && col("is_processed"))
        .select("event_id"), "alreadyProcessed's idempotency lookup")
        .map(_.getString(0)).toSet
    } catch {
      // read errors → "none processed" is the preserved reference
      // quirk, but the guard tripping is NOT a read error — a batch
      // that large must fail loudly, never silently reprocess
      case e: IllegalStateException => throw e
      case _: Exception => Set.empty
    }

  /** Apply a batch of (event_id, status, approval_ts) control updates in
    * ONE rewrite: left-join the (tiny, broadcast) update set against the
    * control table and coalesce the touched columns.
    */
  private def markControl(updates: Seq[(String, String, String)]): Unit = {
    if (updates.isEmpty) return
    import spark.implicits._
    val upd = broadcast(updates.toDF("event_id", "__status", "__ts"))
    catalog.overwrite(ControlTable, catalog.read(ControlTable)
      .join(upd, Seq("event_id"), "left")
      .withColumn("status", coalesce(col("__status"), col("status")))
      .withColumn("is_processed",
        when(col("__status").isNotNull, lit(true)).otherwise(col("is_processed")))
      .withColumn("approval_timestamp",
        coalesce(col("__ts").cast("timestamp"), col("approval_timestamp")))
      .drop("__status", "__ts"))
  }

  /** O1 — CSV scan with validation: header-only schema, all strings;
    * empty or headerless files raise (process-pipeline.py:334-337,
    * Spark would otherwise return an empty frame silently).
    */
  def readLandedCsv(bucket: String, objectPath: String): DataFrame = {
    val path = s"$landingRoot/$bucket/$objectPath"
    val df = spark.read.option("header", "true").csv(path)
    if (df.columns.isEmpty || df.columns.forall(_.startsWith("_c")))
      throw new IllegalArgumentException("CSV file is empty or invalid")
    df
  }

  /** O17 dispatch (+O9 DDL for non-delete) — process-pipeline.py:317-364. */
  private def applyOperation(operation: String, bucket: String,
      objectPath: String, tableName: String, eventId: String,
      approvalTs: String): Unit = {
    val data = readLandedCsv(bucket, objectPath)
    if (data.isEmpty)
      throw new IllegalArgumentException("CSV file contains no data rows")
    val ordered = data.columns.toSeq // header order = batch order (O2)
    // in-batch order: the reference applies rows in file order; tag it
    // before any shuffle so keep-first/keep-last dedup stays file-ordered
    val withOrd = data.withColumn("__ord", monotonically_increasing_id())
    if (operation != Operation.Delete)
      catalog.createIfAbsent(tableName, catalog.allStringSchema(ordered))
    val pks = catalog.primaryKey(tableName)
    operation match {
      case Operation.Insert =>
        mutateData(tableName, withOrd, pks) { current =>
          MutationOps.insertIgnoreDups(
            current, withOrd.select((ordered :+ "__ord").map(col): _*),
            pks, col("__ord")).select(ordered.map(col): _*)
        }
      case Operation.Update =>
        mutateData(tableName, withOrd, pks) { current =>
          MutationOps.upsertByPk(current, withOrd, pks, col("__ord"))
            .select(ordered.map(col): _*)
        }
      case Operation.Delete =>
        val base = PathOps.maxQueryId(catalog.read(DeleteControlTable))
        val staged = MutationOps.stageDeletes(
          catalog.read(DeleteControlTable), withOrd, tableName,
          if (pks.nonEmpty) pks else ordered.filterNot(_ == "__ord"),
          eventId, base, lit(approvalTs), col("__ord"))
        catalog.append(DeleteControlTable, staged)
      case other =>
        throw new IllegalArgumentException(s"Unknown operation: $other")
    }
  }

  /** Read-merge-overwrite a data table through the narrowest commit the
    * catalog's layout allows: with a registered PK-hash bucket layout,
    * only the buckets containing `keyRows`' keys are read and
    * rewritten (the first such mutation migrates the table into the
    * layout); otherwise the whole-table rewrite — the honest fallback
    * when no key partitioning exists.
    */
  private def mutateData(tableName: String, keyRows: DataFrame,
      pks: Seq[String])(mutate: DataFrame => DataFrame): Unit = {
    catalog.bucketCount(tableName) match {
      case Some(n) if pks.nonEmpty =>
        if (catalog.hasBucketManifest(tableName)) {
          val touched = keyRows
            .select(catalog.bucketOf(pks, n).as("__b"))
            .distinct().collect().map(_.getInt(0)).toSeq
          catalog.overwriteBuckets(tableName,
            mutate(catalog.readBuckets(tableName, touched)), touched)
        } else {
          // one-time migration into the bucket layout
          catalog.overwriteAllBuckets(tableName, mutate(catalog.read(tableName)))
        }
      case _ =>
        catalog.overwrite(tableName, mutate(catalog.read(tableName)))
    }
  }

  // ---------------------------------------------------------------- E4

  /** delete-control.py:38-101 — execute staged deletes grouped by table,
    * continue on per-table error, stamp ExecutedDeleteTimestamp.
    * Returns the set of executed QueryIds.
    */
  def executePendingDeletes(): Seq[Long] = {
    ensureControlTables()
    val ctrl = catalog.read(DeleteControlTable)
    val pending = collectControl(
      ctrl.filter(col("DeleteFlag") && !col("ExecutedFlag"))
        .select("QueryId", "target_table", "pk_values"),
      "executePendingDeletes' staged delete rows")
    if (pending.isEmpty) return Nil
    val executed = Seq.newBuilder[Long]
    pending.groupBy(_.getString(1)).foreach { case (table, rows) =>
      try {
        val pks = catalog.primaryKey(table) match {
          case Nil => rows.head.getMap[String, String](2).keys.toSeq.sorted
          case p => p
        }
        val keySchema = org.apache.spark.sql.types.StructType(pks.map(p =>
          org.apache.spark.sql.types.StructField(p, org.apache.spark.sql.types.StringType)))
        val keyRows = rows.toSeq.map { r =>
          val m = r.getMap[String, String](2)
          org.apache.spark.sql.Row.fromSeq(pks.map(p => m.getOrElse(p, null)))
        }
        val keys = spark.createDataFrame(
          spark.sparkContext.parallelize(keyRows, 1), keySchema)
        if (catalog.exists(table)) {
          mutateData(table, keys, pks)(current =>
            MutationOps.deleteByPk(current, keys, pks))
          executed ++= rows.map(_.getLong(0))
        } else {
          // missing target = per-table error path: leave ExecutedFlag
          // false so the staged delete still runs once the table exists
          // (the reference's failed per-table DELETE is not marked
          // executed — delete-control.py:38-101)
          System.err.println(s"[delete-job] table $table does not exist; leaving staged")
        }
      } catch {
        case e: Exception =>
          System.err.println(s"[delete-job] table $table failed: ${e.getMessage}")
      }
    }
    val done = executed.result()
    if (done.nonEmpty) {
      val hit = col("QueryId").isin(done: _*)
      catalog.overwrite(DeleteControlTable, catalog.read(DeleteControlTable)
        .withColumn("ExecutedFlag", when(hit, lit(true)).otherwise(col("ExecutedFlag")))
        .withColumn("ExecutedDeleteTimestamp",
          when(hit, current_timestamp()).otherwise(col("ExecutedDeleteTimestamp"))))
    }
    done
  }
}
