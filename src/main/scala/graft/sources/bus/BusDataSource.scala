package graft.sources.bus

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
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
    new BusScanBuilder(root, maxSeg)
  }
}

/** Pushdown surface of the batch scan. `partition` equality/IN prunes
  * whole bus partitions and `seq` range predicates clamp each
  * partition's (from, to] read range — both applied at PLANNING time,
  * so a consumer replaying "partition 3 past seq W" lists and reads
  * only those segment files: I/O ∝ what's consumed, not log size.
  * Every filter is also returned as residual for Spark to re-apply —
  * correctness never depends on the pruning. Column pruning narrows
  * the emitted rows to the requested fields (a `value`-only consumer
  * doesn't materialize the four metadata columns per record).
  */
final class BusScanBuilder(root: String, maxSegmentsPerTrigger: Option[Long])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var required: StructType = BusLog.schema
  private var parts: Option[Set[Int]] = None
  private var seqFromExcl = 0L
  private var seqToIncl = Option.empty[Long]
  private var accepted = Array.empty[Filter]

  private def num(v: Any): Long = v.asInstanceOf[Number].longValue()
  private def clampTo(hi: Long): Unit =
    seqToIncl = Some(seqToIncl.fold(hi)(math.min(_, hi)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val used = filters.filter {
      case EqualTo("partition", v) =>
        val p = Set(num(v).toInt)
        parts = Some(parts.fold(p)(_ intersect p)); true
      case In("partition", vs) =>
        val p = vs.map(num(_).toInt).toSet
        parts = Some(parts.fold(p)(_ intersect p)); true
      case GreaterThan("seq", v) =>
        seqFromExcl = math.max(seqFromExcl, num(v)); true
      case GreaterThanOrEqual("seq", v) =>
        seqFromExcl = math.max(seqFromExcl, num(v) - 1); true
      case LessThan("seq", v) => clampTo(num(v) - 1); true
      case LessThanOrEqual("seq", v) => clampTo(num(v)); true
      case EqualTo("seq", v) =>
        seqFromExcl = math.max(seqFromExcl, num(v) - 1); clampTo(num(v)); true
      case _ => false
    }
    accepted = used
    filters // all residual: Spark re-applies; pruning is an I/O win only
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new BusScan(root, maxSegmentsPerTrigger,
    required, parts, seqFromExcl, seqToIncl)
}

final class BusScan(root: String, maxSegmentsPerTrigger: Option[Long],
    required: StructType = BusLog.schema,
    parts: Option[Set[Int]] = None, seqFromExcl: Long = 0L,
    seqToIncl: Option[Long] = None) extends Scan {
  override def readSchema(): StructType = required
  override def toBatch: Batch =
    new BusBatch(root, required, parts, seqFromExcl, seqToIncl)
  // Streaming ranges are governed by the offset contract (start, end]
  // per trigger — partition/seq pruning must not reshape them, or a
  // checkpointed offset would no longer describe what was read.
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BusMicroBatchStream(root, maxSegmentsPerTrigger, required)
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
    maxSegmentsPerTrigger: Option[Long] = None,
    required: StructType = BusLog.schema)
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
  override def createReaderFactory(): PartitionReaderFactory =
    new BusReaderFactory(required)
}

final class BusBatch(root: String, required: StructType = BusLog.schema,
    parts: Option[Set[Int]] = None, seqFromExcl: Long = 0L,
    seqToIncl: Option[Long] = None) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    BusLog.latestSeqs(root).toSeq.sortBy(_._1).flatMap { case (p, latest) =>
      val lo = seqFromExcl
      val hi = math.min(latest, seqToIncl.getOrElse(latest))
      if (hi > lo && parts.forall(_.contains(p)))
        Some(BusInputPartition(root, p, lo, hi))
      else None
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new BusReaderFactory(required)
}

/** Emits only the scan's pruned columns, resolved by name against the
  * full bus schema once per factory.
  */
final class BusReaderFactory(required: StructType = BusLog.schema)
    extends PartitionReaderFactory {
  private val fieldIdx: Array[Int] =
    required.fieldNames.map(BusLog.schema.fieldIndex)

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val bp = partition.asInstanceOf[BusInputPartition]
    new PartitionReader[InternalRow] {
      private val it =
        BusLog.readRange(bp.root, bp.partition, bp.fromExclusive, bp.toInclusive)
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          val (seq, idx, tsMillis, bytes) = it.next()
          val full = Array[Any](bp.partition, seq, idx, tsMillis * 1000L,
            UTF8String.fromBytes(bytes))
          current = new GenericInternalRow(fieldIdx.map(i => full(i)))
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
