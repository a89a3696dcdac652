package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.functions.NativeExprs

/** `graftgen` — a DataSource V2 table that GENERATES deterministic rows
  * (the remaining rung of SURVEY §4's extension ladder: expression →
  * logical plan/strategy/physical operator → CONNECTOR).
  *
  * Row `i` of `rows` total carries `h = splitmix64(i)` (the repo's
  * canonical mixer, ported to DuckDB — so the whole table is
  * closed-form oracle-able):
  *
  *   - `id`       = i
  *   - `category` = (h >>> 8)  mod 16
  *   - `value`    = (h >>> 16) mod 65536
  *
  * What makes it a real connector rather than a `spark.range` wrapper
  * is the scan-build contract a 100 TB source lives by, all three
  * implemented and spec-pinned (DataSourceV2Spec):
  *
  *   - **Filter pushdown** ([[SupportsPushDownFilters]]): range/equality
  *     predicates on `id` narrow the generated interval BEFORE
  *     planning; fully-absorbed filters return empty from
  *     `pushFilters`, so Catalyst deletes its post-scan Filter node —
  *     the v2 equivalent of parquet's `PushedFilters`.
  *   - **Partition planning**: the narrowed interval splits into
  *     `slices` contiguous [lo, hi) input partitions, EMPTY SLICES
  *     NEVER PLANNED — pushdown prunes tasks, not just rows (the
  *     partition-pruning economics of a sharded remote store).
  *   - **Column pruning** ([[SupportsPushDownRequiredColumns]]): readers
  *     materialize only the pruned schema — `select(category)` never
  *     computes `value`, and `count(*)` reads zero-field rows.
  *
  * Statistics ([[SupportsReportStatistics]]) report the POST-pushdown
  * row count, so the optimizer sizes joins against what the scan will
  * actually produce (a narrowed scan can broadcast).
  *
  * The table is ALSO a micro-batch streaming source
  * ([[GenMicroBatchStream]]): offsets are row positions, batches are
  * admission-controlled to `rowsPerBatch` rows, and the reader's
  * determinism makes replays exactly-once by construction.
  */
class GenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftgen"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GenTable(
      properties.asScala.getOrElse("rows", "1000").toLong,
      properties.asScala.getOrElse("slices", "8").toInt,
      properties.asScala.getOrElse("rowsPerBatch", "1000").toLong,
      properties.asScala.getOrElse("keyGrouped", "false").toBoolean)
}

object GenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("category", IntegerType, nullable = false),
    StructField("value", LongType, nullable = false)))

  /** One generated row's column value, by field name. */
  def field(name: String, i: Long): Any = {
    lazy val h = NativeExprs.mix64(i)
    name match {
      case "id" => i
      case "category" => ((h >>> 8) & 15L).toInt
      case "value" => (h >>> 16) & 0xffffL
    }
  }
}

class GenTable(rows: Long, slices: Int, rowsPerBatch: Long, keyGrouped: Boolean)
  extends Table with SupportsRead {
  require(rows >= 0 && slices > 0 && rowsPerBatch > 0,
    "graftgen needs rows >= 0, slices > 0, rowsPerBatch > 0")
  override def name(): String = s"graftgen($rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, slices, rowsPerBatch, keyGrouped)
}

class GenScanBuilder(rows: Long, slices: Int, rowsPerBatch: Long,
    keyGrouped: Boolean = false) extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GenSource.schema

  /** Absorb what narrows the id interval; everything else stays post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (absorbed, rest) = filters.partition {
      case EqualTo("id", _: Long) => true
      case GreaterThan("id", _: Long) => true
      case GreaterThanOrEqual("id", _: Long) => true
      case LessThan("id", _: Long) => true
      case LessThanOrEqual("id", _: Long) => true
      case IsNotNull("id" | "category" | "value") => true // nothing is ever null
      case _ => false
    }
    absorbed.foreach {
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1)
      case _ => ()
    }
    accepted = absorbed
    rest
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GenScan(rows, math.max(lo, 0L), math.max(hi, lo), slices, required,
      rowsPerBatch, keyGrouped)
}

class GenScan(rows: Long, lo: Long, hi: Long, slices: Int, required: StructType,
    rowsPerBatch: Long, keyGrouped: Boolean = false)
  extends Scan with Batch with SupportsReportStatistics
  with SupportsReportPartitioning {

  override def readSchema(): StructType = required

  override def description(): String = {
    val planned = planInputPartitions().length
    s"graftgen range=[$lo,$hi) slices=$planned/$slices cols=[${required.fieldNames.mkString(",")}]"
  }

  override def toBatch: Batch = this

  /** Shard boundaries are FIXED by the full extent (a remote store's
    * shards don't move when a query filters); the pushed-down interval
    * intersects each shard and non-overlapping shards are never planned
    * as tasks — pruning work, not just rows.
    *
    * In `keyGrouped` mode the table is instead exposed as one partition
    * PER CATEGORY value, each carrying its [[HasPartitionKey]] — the
    * physical layout contract behind storage-partitioned joins.
    */
  override def planInputPartitions(): Array[InputPartition] =
    if (keyGrouped)
      (0 until 16).map(c => GenKeyedSlice(lo, hi, c): InputPartition).toArray
    else (0 until slices).iterator.map { s =>
      val sLo = rows * s / slices
      val sHi = rows * (s + 1) / slices
      GenSlice(math.max(sLo, lo), math.min(sHi, hi))
    }.filter(p => p.hi > p.lo).toArray[InputPartition]

  /** Storage-partitioned-join contract ([[SupportsReportPartitioning]]):
    * in keyGrouped mode the scan reports [[KeyGroupedPartitioning]] on
    * `category`, so two such tables equi-joined on it (or an aggregate
    * grouped by it) need NO shuffle — Spark aligns the key groups
    * instead (`spark.sql.sources.v2.bucketing.enabled`). Reporting
    * requires `category` to survive column pruning; otherwise the scan
    * honestly reports unknown.
    */
  override def outputPartitioning(): Partitioning =
    if (keyGrouped && required.fieldNames.contains("category"))
      new KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions.identity("category")),
        planInputPartitions().length)
    else new UnknownPartitioning(planInputPartitions().length)

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GenMicroBatchStream(lo, hi, slices, required.fieldNames, rowsPerBatch)

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = OptionalLong.of(math.max(hi - lo, 0L) * 24L)
    override def numRows(): OptionalLong = OptionalLong.of(math.max(hi - lo, 0L))
  }
}

case class GenSlice(lo: Long, hi: Long) extends InputPartition

/** One category's rows of the [lo, hi) interval (keyGrouped mode). A
  * real key-grouped store holds these physically contiguous; the
  * generator scans the interval and emits its key's rows, which keeps
  * the CONTRACT exact (every emitted row matches `partitionKey`) at
  * generator cost O(interval) per key.
  */
case class GenKeyedSlice(lo: Long, hi: Long, category: Int)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](category))
}

/** Micro-batch view of the generated interval: an OFFSET is simply the
  * next unemitted id, so any [start, end) replan regenerates the exact
  * same rows — exactly-once across restarts falls out of determinism
  * (the checkpoint stores row positions, the reader is a pure function
  * of them). Admission control caps each batch at `rowsPerBatch` rows
  * ([[ReadLimit.maxRows]]), giving real multi-batch pacing under
  * `Trigger.AvailableNow` without any files or sockets — the same role
  * rate limits play on a partitioned log at scale (per-trigger work
  * bounded regardless of backlog).
  */
class GenMicroBatchStream(lo: Long, hi: Long, slices: Int,
    fields: Array[String], rowsPerBatch: Long)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def at(o: Offset): Long = o.asInstanceOf[GenOffset].n

  override def initialOffset(): Offset = GenOffset(lo)
  override def deserializeOffset(json: String): Offset = GenOffset(json.toLong)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graftgen is admission-controlled; latestOffset(start, limit) is the entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = limit match {
    case m: ReadMaxRows => GenOffset(math.min(hi, at(start) + m.maxRows()))
    case _ => GenOffset(hi)
  }
  override def reportLatestOffset(): Offset = GenOffset(hi)
  override def prepareForTriggerAvailableNow(): Unit = () // extent is static

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (at(start), at(end))
    val n = e - s
    val k = math.max(1L, math.min(slices.toLong, n)).toInt
    (0 until k).iterator.map { i =>
      GenSlice(s + n * i / k, s + n * (i + 1) / k)
    }.filter(p => p.hi > p.lo).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(fields)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class GenOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class GenReaderFactory(fields: Array[String]) extends PartitionReaderFactory {

  private abstract class RowReader extends PartitionReader[InternalRow] {
    protected var i: Long = 0L
    override def get(): InternalRow = {
      val row = new GenericInternalRow(fields.length)
      var c = 0
      while (c < fields.length) {
        row.update(c, GenSource.field(fields(c), i))
        c += 1
      }
      row
    }
    override def close(): Unit = ()
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: GenKeyedSlice => new RowReader {
        i = p.lo - 1
        override def next(): Boolean = {
          i += 1
          while (i < p.hi &&
            ((NativeExprs.mix64(i) >>> 8) & 15L).toInt != p.category) i += 1
          i < p.hi
        }
      }
      case p: GenSlice => new RowReader {
        i = p.lo - 1
        override def next(): Boolean = { i += 1; i < p.hi }
      }
    }
}
