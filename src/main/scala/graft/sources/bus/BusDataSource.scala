package graft.sources.bus

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graftbus` — a DataSource V2 connector over [[BusLog]], giving the
  * engine a REAL event-bus streaming source (SURVEY §2.b "streaming:
  * source"; the reference's Pub/Sub consumption, modeled until now only
  * as JSON-lines file streams). Micro-batch planning is Kafka-shaped:
  * the offset is a (bus partition → seq) vector, `latestOffset` lists
  * the log, and each trigger plans one InputPartition per bus partition
  * covering (startSeq, endSeq] — so source parallelism follows the bus
  * partition count and a 1000-executor cluster reads 1000 partitions
  * concurrently. Segments are immutable, so a restarted query re-plans
  * an identical range: exactly-once composes from Spark's offset log +
  * deterministic replay (BusSourceSpec pins restart/no-dup/no-loss).
  *
  * Usage: `spark.readStream.format("graftbus").option("path", root)` —
  * also `spark.read` for the batch twin (stream==batch comparisons).
  */
class BusDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftbus"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BusLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "graftbus requires option(\"path\", <bus root>)")
    new BusTable(path)
  }
}

final class BusTable(root: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graftbus(`$root`)"
  override def schema(): StructType = BusLog.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new BusWrite.Builder(root, info)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxSeg = Option(options.get("maxSegmentsPerTrigger")).map(_.toLong)
    new ScanBuilder { override def build(): Scan = new BusScan(root, maxSeg) }
  }
}

final class BusScan(root: String, maxSegmentsPerTrigger: Option[Long]) extends Scan {
  override def readSchema(): StructType = BusLog.schema
  override def toBatch: Batch = new BusBatch(root)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BusMicroBatchStream(root, maxSegmentsPerTrigger)
}

/** Offset = highest consumed seq per bus partition; 0 = nothing. */
final case class BusOffset(seqs: Map[Int, Long]) extends Offset {
  override def json(): String =
    seqs.toSeq.sortBy(_._1)
      .map { case (p, s) => s""""$p":$s""" }.mkString("{", ",", "}")
}

object BusOffset {
  def fromJson(json: String): BusOffset = {
    val body = json.trim.stripPrefix("{").stripSuffix("}").trim
    val seqs =
      if (body.isEmpty) Map.empty[Int, Long]
      else body.split(",").map { kv =>
        val Array(k, v) = kv.split(":").map(_.trim)
        k.stripPrefix("\"").stripSuffix("\"").toInt -> v.toLong
      }.toMap
    BusOffset(seqs)
  }
}

final case class BusInputPartition(root: String, partition: Int,
    fromExclusive: Long, toInclusive: Long) extends InputPartition

final class BusMicroBatchStream(root: String,
    maxSegmentsPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // Trigger.AvailableNow contract: pin the end offset once at query
  // start so the run drains exactly what existed then and terminates,
  // even while publishers keep appending. Admission control
  // (maxSegmentsPerTrigger) still applies per trigger — the run takes
  // several bounded batches to reach the pinned target.
  @volatile private var availableNowTarget: Option[BusOffset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(BusOffset(BusLog.latestSeqs(root)))
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = availableNowTarget.getOrElse(BusOffset(BusLog.latestSeqs(root)))
    maxSegmentsPerTrigger match {
      case None => target
      case Some(cap) =>
        val s = start.asInstanceOf[BusOffset].seqs
        BusOffset(target.seqs.map { case (p, hi) =>
          p -> math.min(hi, s.getOrElse(p, 0L) + cap)
        })
    }
  }
  override def reportLatestOffset(): Offset = BusOffset(BusLog.latestSeqs(root))
  override def latestOffset(): Offset = BusOffset(BusLog.latestSeqs(root))
  override def initialOffset(): Offset =
    BusOffset(BusLog.partitions(root).map(_ -> 0L).toMap)
  override def deserializeOffset(json: String): Offset = BusOffset.fromJson(json)
  // Segments are immutable and retention is an explicit vacuum concern,
  // so there is no broker-side ack to deliver on commit.
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BusOffset].seqs
    val e = end.asInstanceOf[BusOffset].seqs
    e.toSeq.sortBy(_._1).flatMap { case (p, hi) =>
      val lo = s.getOrElse(p, 0L)
      if (hi > lo) Some(BusInputPartition(root, p, lo, hi)) else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new BusReaderFactory
}

final class BusBatch(root: String) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    BusLog.latestSeqs(root).toSeq.sortBy(_._1).flatMap { case (p, hi) =>
      if (hi > 0) Some(BusInputPartition(root, p, 0L, hi)) else None
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory = new BusReaderFactory
}

final class BusReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val bp = partition.asInstanceOf[BusInputPartition]
    new PartitionReader[InternalRow] {
      private val it =
        BusLog.readRange(bp.root, bp.partition, bp.fromExclusive, bp.toInclusive)
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          val (seq, idx, tsMillis, bytes) = it.next()
          current = new GenericInternalRow(Array[Any](
            bp.partition, seq, idx, tsMillis * 1000L,
            UTF8String.fromBytes(bytes)))
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
