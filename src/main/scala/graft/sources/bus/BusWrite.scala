package graft.sources.bus

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.{Base64, UUID}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{LongType, StructType, TimestampType}

/** DSv2 write path for `graftbus` — the publish side of the reference's
  * event-bus boundary (approval-handler.py:72-75 publishes captured
  * approvals to Pub/Sub; here `df.write`/`writeStream.format("graftbus")`
  * publishes into the partitioned log the pipeline consumes from).
  *
  * Commit protocol (two-phase, broker-shaped):
  *  1. Each task writer buffers its rows per bus partition and writes
  *     them as UNCOMMITTED files under `<root>/.staging/` — invisible to
  *     readers, which only list `p*``/NNN.log` segments.
  *  2. The driver's commit renames staged files into live seq-numbered
  *     segments under each partition's publish lock, in deterministic
  *     (task, buffer) order. Per-partition publication is atomic (the
  *     rename); job-level commit is sequential over partitions, the
  *     same guarantee class a real partitioned broker gives.
  *
  * Streaming commits are idempotent per epoch: committed epoch ids are
  * recorded in `<root>/_epochs/<writerId>` and a replayed epoch (the
  * normal restart path — Spark re-runs the last epoch after recovery)
  * is skipped wholesale. Pass a stable `option("writerId", …)` to keep
  * the ledger identity across restarts (defaults to the query id). The
  * crash window between segment rename and ledger append is
  * at-least-once, as with any sink whose visibility point readers can
  * observe directly.
  *
  * Input schema: a `value` string column (required); optional `ts`
  * timestamp/long for the record timestamp; optional `partition` int to
  * route explicitly (defaults to task partition id modulo the bus
  * partition count — the round-robin a keyless producer uses).
  */
object BusWrite {

  final case class Staged(busPartition: Int, path: String, taskPartition: Int)
    extends WriterCommitMessage

  private[bus] def stagingDir(root: String) = Paths.get(root, ".staging")

  final class Builder(root: String, info: LogicalWriteInfo) extends WriteBuilder {
    override def build(): Write = new Write {
      private val schema = info.schema()
      private val writerId = Option(info.options.get("writerId"))
        .getOrElse(info.queryId())
      override def toBatch: BatchWrite = new BusBatchWrite(root, schema)
      override def toStreaming: StreamingWrite =
        new BusStreamingWrite(root, schema, writerId)
    }
  }

  private def fieldIdx(schema: StructType, name: String): Int =
    schema.fieldNames.indexOf(name)

  /** Shared writer: buffers rows per bus partition, stages on commit. */
  private final class TaskWriter(root: String, schema: StructType,
      taskPartition: Int) extends DataWriter[InternalRow] {
    private val valueIdx = fieldIdx(schema, "value")
    require(valueIdx >= 0, "graftbus sink requires a `value` string column")
    private val tsIdx = fieldIdx(schema, "ts")
    private val partIdx = fieldIdx(schema, "partition")
    private val nParts = math.max(BusLog.partitions(root).size, 1)
    private val buffers =
      scala.collection.mutable.Map.empty[Int, StringBuilder]

    override def write(row: InternalRow): Unit = {
      val p =
        if (partIdx >= 0 && !row.isNullAt(partIdx)) row.getInt(partIdx) % nParts
        else taskPartition % nParts
      val ts =
        if (tsIdx < 0 || row.isNullAt(tsIdx)) 0L
        else schema.fields(tsIdx).dataType match {
          case TimestampType => row.getLong(tsIdx) / 1000L // micros → millis
          case LongType => row.getLong(tsIdx)
          case _ => 0L
        }
      val value = row.getUTF8String(valueIdx)
      buffers.getOrElseUpdate(p, new StringBuilder)
        .append(ts).append('\t')
        .append(Base64.getEncoder.encodeToString(value.getBytes))
        .append('\n')
    }

    override def commit(): WriterCommitMessage = {
      val dir = stagingDir(root)
      Files.createDirectories(dir)
      val staged = buffers.toSeq.sortBy(_._1).map { case (p, sb) =>
        val f = dir.resolve(s"stage-${UUID.randomUUID()}")
        Files.write(f, sb.toString.getBytes(StandardCharsets.UTF_8))
        Staged(p, f.toString, taskPartition)
      }
      // one message per task: wrap multi-partition stages
      MultiStaged(staged.toArray)
    }
    override def abort(): Unit = ()
    override def close(): Unit = ()
  }

  final case class MultiStaged(staged: Array[Staged]) extends WriterCommitMessage

  private def commitStaged(root: String, messages: Array[WriterCommitMessage]): Unit = {
    val all = messages.collect { case m: MultiStaged => m.staged.toSeq }.flatten
    // deterministic order: by (bus partition, originating task). Staged
    // files are already in segment format, so commit is a RENAME per
    // file — the driver moves metadata, never bytes (a publish-through-
    // the-driver here would serialize the whole write behind one node).
    all.groupBy(_.busPartition).toSeq.sortBy(_._1).foreach { case (p, stages) =>
      stages.sortBy(_.taskPartition).foreach { st =>
        BusLog.commitSegmentFile(root, p, Paths.get(st.path))
      }
    }
  }

  private def abortStaged(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: MultiStaged => m.staged.toSeq }.flatten
      .foreach(st => Files.deleteIfExists(Paths.get(st.path)))

  /** Ships to executors: must be Serializable and capture nothing but
    * the root path and schema.
    */
  private final case class WriterFactory(root: String, schema: StructType)
      extends DataWriterFactory with StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new TaskWriter(root, schema, partitionId)
    override def createWriter(partitionId: Int, taskId: Long,
        epochId: Long): DataWriter[InternalRow] =
      new TaskWriter(root, schema, partitionId)
  }

  private final class BusBatchWrite(root: String, schema: StructType)
      extends BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      WriterFactory(root, schema)
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      commitStaged(root, messages)
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      abortStaged(messages)
  }

  private final class BusStreamingWrite(root: String, schema: StructType,
      writerId: String) extends StreamingWrite {
    private def ledger = Paths.get(root, "_epochs",
      writerId.replaceAll("[^A-Za-z0-9_-]", "_"))

    private def committedEpochs(): Set[Long] =
      if (Files.exists(ledger))
        Files.readAllLines(ledger, StandardCharsets.UTF_8)
          .asScala.filter(_.nonEmpty).map(_.toLong).toSet
      else Set.empty

    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      WriterFactory(root, schema)

    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      if (committedEpochs().contains(epochId)) {
        // replayed epoch after restart: already published, drop stages
        abortStaged(messages)
      } else {
        commitStaged(root, messages)
        Files.createDirectories(ledger.getParent)
        val tmp = ledger.getParent.resolve(s".tmp-${UUID.randomUUID()}")
        Files.write(tmp, (committedEpochs() + epochId).toSeq.sorted
          .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, ledger, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      }
    }
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      abortStaged(messages)
  }
}
