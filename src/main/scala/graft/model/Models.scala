package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Status lifecycle of a registered file event — exact strings from the
  * reference (data-query.py:99 'pending'; process-pipeline.py:468
  * 'approved'/'rejected'; :511 'failed').
  */
object Status {
  val Pending = "pending"
  val Approved = "approved"
  val Rejected = "rejected"
  val Failed = "failed"
}

/** The operations encoded in the first landing-path segment
  * (data-query.py:223-226).
  */
object Operation {
  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"
  val all: Set[String] = Set(Insert, Update, Delete)
}

/** One row of the `processed_files` control table (data-query.py:94-99
  * plus approval_timestamp from process-pipeline.py:485-491).
  */
final case class ProcessedFile(
    file_name: String,
    event_id: String,
    file_version: Long,
    is_processed: Boolean,
    bucket: String,
    operation: String,
    status: String,
    approval_timestamp: Option[Timestamp])

object ProcessedFile {
  val schema: StructType = StructType(Seq(
    StructField("file_name", StringType),
    StructField("event_id", StringType),
    StructField("file_version", LongType),
    StructField("is_processed", BooleanType),
    StructField("bucket", StringType),
    StructField("operation", StringType),
    StructField("status", StringType),
    StructField("approval_timestamp", TimestampType)))
}

/** One staged deferred DELETE (process-pipeline.py:299-305 +
  * ExecutedDeleteTimestamp from delete-control.py:74-79). The reference
  * stores only the rendered SQL string — injectable by design
  * (process-pipeline.py:279-283); we additionally keep the structured
  * (table, pk→value) form and execute from that, keeping the rendered
  * string for display/audit parity (SURVEY §7 hard-parts #3).
  */
final case class DeleteControl(
    QueryId: Long,
    EventId: String,
    DeleteQuery: String,
    DeleteFlag: Boolean,
    ExecutedFlag: Boolean,
    DeletedApprovalTimestamp: Option[Timestamp],
    ExecutedDeleteTimestamp: Option[Timestamp],
    target_table: String,
    pk_values: Map[String, String])

object DeleteControl {
  val schema: StructType = StructType(Seq(
    StructField("QueryId", LongType),
    StructField("EventId", StringType),
    StructField("DeleteQuery", StringType),
    StructField("DeleteFlag", BooleanType),
    StructField("ExecutedFlag", BooleanType),
    StructField("DeletedApprovalTimestamp", TimestampType),
    StructField("ExecutedDeleteTimestamp", TimestampType),
    StructField("target_table", StringType),
    StructField("pk_values", MapType(StringType, StringType))))
}

/** The approval Pub/Sub payload (approval-handler.py:51-62, decoded at
  * process-pipeline.py:443-457). All fields strings on the wire.
  */
final case class ApprovalEvent(
    event_id: String,
    action: String,
    file_name: String,
    table_name: String,
    operation: String,
    bucket: String,
    file_version: Option[Long],
    provided_timestamp: Option[String],
    approval_timestamp: Option[String],
    remote_address: Option[String])

object ApprovalEvent {
  val schema: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("action", StringType),
    StructField("file_name", StringType),
    StructField("table_name", StringType),
    StructField("operation", StringType),
    StructField("bucket", StringType),
    StructField("file_version", LongType),
    StructField("provided_timestamp", StringType),
    StructField("approval_timestamp", StringType),
    StructField("remote_address", StringType)))
}

/** A GCS-style object-arrival event (data-query.py:206-209). */
final case class FileEvent(bucket: String, name: String, id: String)
