package graft.sources

import java.nio.file.Path

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Read-only METADATA companion tables (the Iceberg `table$files` /
  * `table$history` surface, spelled `<table>__files` /
  * `<table>__history` here): the table-format internals as ordinary
  * queryable rows, resolved by [[GraftLakeCatalog.loadTable]] the same
  * way as the `__changes` feed. Both answer from the LOG alone
  * ([[LocalScan]] — no data file opens, no tasks), which is exactly
  * what an operator debugging a 100 TB table wants: census first,
  * scans only when pointed at something.
  */
object LakeMetaTables {
  val FilesSuffix = "__files"
  val HistorySuffix = "__history"

  private def scanOnly(schema0: StructType, rows0: => Seq[InternalRow],
      name0: String): Table = new Table with SupportsRead {
    override def name(): String = name0
    override def schema(): StructType = schema0
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      () => new LocalScan {
        override def readSchema(): StructType = schema0
        override def rows(): Array[InternalRow] = rows0.toArray
        override def description(): String = name0
      }: Scan
  }

  /** One row per LIVE data file of the head snapshot: path, row
    * counts, delete-vector size, partition tuple, streaming origin.
    */
  def filesTable(dir: Path, baseName: String): Table = {
    val schema = StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("dv_rows", LongType, nullable = false),
      StructField("live_rows", LongType, nullable = false),
      StructField("partition", StringType, nullable = true),
      StructField("epoch", LongType, nullable = true),
      StructField("query", StringType, nullable = true)))
    scanOnly(schema, {
      val snap = LakeLog.currentSnapshot(dir).getOrElse(
        throw new IllegalStateException(s"graftlake: $baseName has no committed version"))
      snap.files.map { f =>
        // label the tuple under the FILE's own era's spec
        val fields = LakePartitioning.specOf(snap.props, f.specId)
        val part =
          if (f.part.isEmpty) null
          else UTF8String.fromString(
            fields.map(_.col).zip(f.part)
              .map { case (c, v) => s"$c=${v.getOrElse("null")}" }.mkString("/"))
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(f.path), f.rows, f.dvRows, f.liveRows,
          part,
          f.epoch.map(Long.box).orNull,
          f.query.map(UTF8String.fromString).orNull)): InternalRow
      }
    }, s"graftlake.$baseName:files")
  }

  /** One row per retained log version: commit time, file/row census —
    * folded forward from commit deltas ([[LakeLog.historyCensus]]),
    * each delta read once, instead of reconstructing a full snapshot
    * per version (O(versions × files) on a long-lived table).
    */
  def historyTable(dir: Path, baseName: String): Table = {
    val schema = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = true),
      StructField("n_files", IntegerType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("n_live_rows", LongType, nullable = false)))
    scanOnly(schema, {
      LakeLog.historyCensus(dir).map { case (v, tsMs, nFiles, nRows, nLive) =>
        new GenericInternalRow(Array[Any](
          v,
          tsMs.map(ms => Long.box(ms * 1000L)).orNull,
          nFiles, nRows, nLive)): InternalRow
      }
    }, s"graftlake.$baseName:history")
  }
}
