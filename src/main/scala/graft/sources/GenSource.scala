package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => VExpression, Expressions, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => VPredicate}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

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
      properties.asScala.getOrElse("keyGrouped", "false").toBoolean,
      properties.asScala.getOrElse("aggPushdown", "false").toBoolean,
      properties.asScala.getOrElse("columnar", "false").toBoolean)
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

class GenTable(rows: Long, slices: Int, rowsPerBatch: Long, keyGrouped: Boolean,
    aggPushdown: Boolean = false, columnar: Boolean = false)
  extends Table with SupportsRead {
  require(rows >= 0 && slices > 0 && rowsPerBatch > 0,
    "graftgen needs rows >= 0, slices > 0, rowsPerBatch > 0")
  override def name(): String = s"graftgen($rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, slices, rowsPerBatch, keyGrouped, aggPushdown, columnar)
}

/** One accepted pushed-down aggregate: `op` ∈ count/min/max/sum, `field`
  * is the generated column (empty for count(*)).
  */
case class GenAggSpec(op: String, field: String) {
  def outType: org.apache.spark.sql.types.DataType = op match {
    case "count" | "sum" => LongType
    case _ => if (field == "category") IntegerType else LongType
  }
  override def toString: String = if (op == "count") "COUNT(*)" else s"${op.toUpperCase}($field)"
}

/** The pushed aggregation: optional group-by-`category` + the specs, in
  * Spark's requested order.
  */
case class GenAggPush(groupByCategory: Boolean, specs: Seq[GenAggSpec]) {
  /** Scan output schema: grouping columns FIRST, then one column per
    * aggregate — the order `V2ScanRelationPushDown` rewires its final
    * aggregation against.
    */
  def schema: StructType = StructType(
    (if (groupByCategory) Seq(StructField("category", IntegerType, nullable = false))
     else Nil) ++
      specs.zipWithIndex.map { case (s, i) =>
        StructField(s"agg_$i", s.outType, nullable = false)
      })
}

class GenScanBuilder(rows: Long, slices: Int, rowsPerBatch: Long,
    keyGrouped: Boolean = false, aggPushdown: Boolean = false,
    columnar: Boolean = false) extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns
  with SupportsPushDownLimit with SupportsPushDownTopN
  with SupportsPushDownOffset with SupportsPushDownAggregates {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GenSource.schema
  private var pushedAgg: Option[GenAggPush] = None
  private var partialFlag = true

  /** LIMIT n over an arbitrary-order scan: any n generated rows satisfy
    * it, so truncate the interval to its first n ids — FULLY pushed
    * (`isPartiallyPushed` false), Spark drops its own limit and the
    * source never generates a row past it.
    */
  override def pushLimit(n: Int): Boolean =
    if (pushedAgg.nonEmpty) false
    else {
      hi = math.min(hi, if (lo > hi - n) hi else lo + n)
      partialFlag = false
      true
    }

  /** ORDER BY id LIMIT n: the id order is the generation order, so the
    * top-n ids are a PREFIX (ASC) or SUFFIX (DESC) of the interval.
    * Partially pushed — slices return their n-row window but Spark
    * keeps the final sort, since cross-slice order is not a scan
    * guarantee.
    */
  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean = {
    val onId = orders.length == 1 && (orders(0).expression match {
      case f: NamedReference => f.fieldNames.sameElements(Array("id"))
      case _ => false
    })
    if (pushedAgg.nonEmpty || !onId) false
    else {
      if (orders(0).direction == SortDirection.ASCENDING)
        hi = math.min(hi, if (lo > hi - n) hi else lo + n)
      else lo = math.max(lo, if (hi < lo + n) lo else hi - n)
      partialFlag = true
      true
    }
  }

  override def isPartiallyPushed(): Boolean = partialFlag

  /** OFFSET n: skip any n rows — drop the interval's first n ids.
    * Fully pushed; Spark removes its own offset operator.
    */
  override def pushOffset(n: Int): Boolean =
    if (pushedAgg.nonEmpty) false
    else {
      lo = math.min(hi, lo + n)
      true
    }

  /** Aggregate pushdown (opt-in via `aggPushdown`): COUNT(*) / MIN /
    * MAX / non-distinct SUM over generated columns, optionally grouped
    * by `category`, are absorbed; the scan then emits ≤16 pre-aggregated
    * rows per task and Spark's FINAL aggregation merges partials
    * (`supportCompletePushDown` stays false — with multiple slices the
    * scan output is per-task partials, exactly the map-side-combine
    * contract). The 100 TB reading: the source computes per-shard
    * aggregates where the data lives and ships GROUP COUNTS, not rows.
    */
  override def supportCompletePushDown(agg: Aggregation): Boolean = false

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!aggPushdown) return false
    def fieldOf(e: VExpression): Option[String] = e match {
      case f: NamedReference if f.fieldNames.length == 1 &&
        GenSource.schema.fieldNames.contains(f.fieldNames.head) =>
        Some(f.fieldNames.head)
      case _ => None
    }
    val groupOk = agg.groupByExpressions match {
      case Array() => Some(false)
      case Array(g) if fieldOf(g).contains("category") => Some(true)
      case _ => None
    }
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(GenAggSpec("count", ""))
      // count(col) over never-null generated columns ≡ count(*)
      case c: Count if !c.isDistinct => fieldOf(c.column).map(_ => GenAggSpec("count", ""))
      case m: Min => fieldOf(m.column).map(GenAggSpec("min", _))
      case m: Max => fieldOf(m.column).map(GenAggSpec("max", _))
      case s: Sum if !s.isDistinct => fieldOf(s.column).map(GenAggSpec("sum", _))
      case _ => None
    }
    (groupOk, specs.nonEmpty && specs.forall(_.isDefined)) match {
      case (Some(g), true) =>
        pushedAgg = Some(GenAggPush(g, specs.map(_.get)))
        true
      case _ => false
    }
  }

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
      rowsPerBatch, keyGrouped, pushedAgg, columnar)
}

class GenScan(rows: Long, lo: Long, hi: Long, slices: Int, required: StructType,
    rowsPerBatch: Long, keyGrouped: Boolean = false,
    pushedAgg: Option[GenAggPush] = None, columnar: Boolean = false)
  extends Scan with Batch with SupportsReportStatistics
  with SupportsReportPartitioning with SupportsRuntimeV2Filtering {

  override def readSchema(): StructType =
    pushedAgg.map(_.schema).getOrElse(required)

  override def description(): String = {
    val planned = planInputPartitions().length
    val agg = pushedAgg.map(a => s" PushedAggregates=[${a.specs.mkString(",")}]" +
      (if (a.groupByCategory) " PushedGroupBy=[category]" else "")).getOrElse("")
    val rf = runtimeCats.map(cs => s" runtimeCategories=[${cs.toSeq.sorted.mkString(",")}]")
      .getOrElse("")
    s"graftgen range=[$lo,$hi) slices=$planned/$slices cols=[${required.fieldNames.mkString(",")}]$agg$rf"
  }

  /** Runtime (join-driven) filtering, the DSv2 face of dynamic partition
    * pruning: in keyGrouped mode the scan offers `category`, and when a
    * selective join broadcasts its build-side keys Spark hands back an
    * IN/= predicate BEFORE tasks launch — whole category partitions are
    * then never planned. Unparseable predicates are ignored (pruning is
    * an optimization; correctness never depends on it).
    */
  @volatile private var runtimeCats: Option[Set[Int]] = None

  override def filterAttributes(): Array[NamedReference] =
    if (keyGrouped) Array(Expressions.column("category")) else Array.empty

  override def filter(predicates: Array[VPredicate]): Unit = {
    def litInt(e: VExpression): Option[Int] = e match {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        l.value() match {
          case i: java.lang.Integer => Some(i.intValue)
          case i: java.lang.Long => Some(i.intValue)
          case _ => None
        }
      case _ => None
    }
    def isCategory(e: VExpression): Boolean = e match {
      case f: NamedReference => f.fieldNames.sameElements(Array("category"))
      case _ => false
    }
    val parsed = predicates.toSeq.flatMap { p =>
      val kids = p.children()
      p.name() match {
        case "IN" if kids.nonEmpty && isCategory(kids.head) =>
          val vals = kids.tail.map(litInt)
          if (vals.forall(_.isDefined)) Some(vals.flatten.toSet) else None
        case "=" if kids.length == 2 && isCategory(kids.head) =>
          litInt(kids(1)).map(Set(_))
        case _ => None
      }
    }
    if (parsed.nonEmpty) runtimeCats = Some(parsed.reduce(_ intersect _))
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
      (0 until 16).iterator
        .filter(c => runtimeCats.forall(_.contains(c)))
        .map(c => GenKeyedSlice(lo, hi, c): InputPartition).toArray
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
    pushedAgg match {
      case Some(agg) => new GenAggReaderFactory(agg)
      case None => new GenReaderFactory(required.fieldNames, columnar)
    }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GenMicroBatchStream(lo, hi, slices, required.fieldNames, rowsPerBatch)

  override def estimateStatistics(): Statistics = new Statistics {
    private def outRows: Long = pushedAgg match {
      case Some(a) =>
        if (hi <= lo) 0L else if (a.groupByCategory) math.min(16L, hi - lo) else 1L
      case None => math.max(hi - lo, 0L)
    }
    override def sizeInBytes(): OptionalLong = OptionalLong.of(outRows * 24L)
    override def numRows(): OptionalLong = OptionalLong.of(outRows)
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

class GenReaderFactory(fields: Array[String], columnar: Boolean = false)
  extends PartitionReaderFactory {

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

  /** Vectorized path (opt-in via `columnar`): rows are generated straight
    * into on-heap column vectors in 4096-row batches, and the plan gains
    * a `ColumnarToRow` bridge (or feeds columnar-capable operators
    * directly) — the generator's analog of parquet's vectorized reader,
    * where batch-at-a-time beats row-at-a-time on pure iteration cost.
    */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar && partition.isInstanceOf[GenSlice]

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = partition.asInstanceOf[GenSlice]
    val schema = StructType(fields.map(f =>
      GenSource.schema(GenSource.schema.fieldIndex(f))))
    new PartitionReader[ColumnarBatch] {
      private val BatchRows = 4096
      private var i: Long = p.lo
      private var batch: ColumnarBatch = _
      private def closeBatch(): Unit = if (batch != null) { batch.close(); batch = null }
      override def next(): Boolean = {
        closeBatch()
        if (i >= p.hi) return false
        val n = math.min(BatchRows.toLong, p.hi - i).toInt
        val vecs = org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
          .allocateColumns(n, schema)
        var r = 0
        while (r < n) {
          var c = 0
          while (c < fields.length) {
            GenSource.field(fields(c), i + r) match {
              case v: Long => vecs(c).putLong(r, v)
              case v: Int => vecs(c).putInt(r, v)
            }
            c += 1
          }
          r += 1
        }
        i += n
        batch = new ColumnarBatch(vecs.toArray[ColumnVector], n)
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = closeBatch()
    }
  }
}

/** Reader for a scan with a PUSHED aggregation: each task folds its
  * slice into ≤16 (grouped) or 1 (global) accumulator rows and emits
  * those — the shuffle and Spark's final aggregation see group
  * partials, never base rows. Count of a group that the slice does not
  * contain emits nothing (hash-aggregate semantics; Spark's final agg
  * reconstitutes empty-input results itself).
  */
class GenAggReaderFactory(agg: GenAggPush) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val (lo, hi, only) = partition match {
      case p: GenKeyedSlice => (p.lo, p.hi, Some(p.category))
      case p: GenSlice => (p.lo, p.hi, None)
    }
    val nGroups = if (agg.groupByCategory) 16 else 1
    val counts = new Array[Long](nGroups)
    val accs = Array.fill(agg.specs.length)(new Array[Long](nGroups))
    val mins = agg.specs.map(_.op == "min")
    val maxs = agg.specs.map(_.op == "max")
    var s = 0
    while (s < agg.specs.length) {
      if (mins(s)) java.util.Arrays.fill(accs(s), Long.MaxValue)
      if (maxs(s)) java.util.Arrays.fill(accs(s), Long.MinValue)
      s += 1
    }
    var i = lo
    while (i < hi) {
      val h = NativeExprs.mix64(i)
      val cat = ((h >>> 8) & 15L).toInt
      if (only.forall(_ == cat)) {
        val g = if (agg.groupByCategory) cat else 0
        counts(g) += 1L
        var k = 0
        while (k < agg.specs.length) {
          val spec = agg.specs(k)
          if (spec.op != "count") {
            val v = spec.field match {
              case "id" => i
              case "category" => cat.toLong
              case "value" => (h >>> 16) & 0xffffL
            }
            val a = accs(k)
            spec.op match {
              case "min" => if (v < a(g)) a(g) = v
              case "max" => if (v > a(g)) a(g) = v
              case "sum" => a(g) += v
            }
          }
          k += 1
        }
      }
      i += 1
    }
    val out = (0 until nGroups).filter(counts(_) > 0L).map { g =>
      val vals = new Array[Any](agg.schema.length)
      var c = 0
      if (agg.groupByCategory) { vals(0) = g; c = 1 }
      var k = 0
      while (k < agg.specs.length) {
        val spec = agg.specs(k)
        val raw = if (spec.op == "count") counts(g) else accs(k)(g)
        vals(c + k) = if (spec.outType == IntegerType) raw.toInt else raw
        k += 1
      }
      new GenericInternalRow(vals): InternalRow
    }.iterator
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = { val h = out.hasNext; if (h) cur = out.next(); h }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
