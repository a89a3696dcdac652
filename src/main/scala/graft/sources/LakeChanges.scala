package graft.sources

import java.nio.file.{Path, Paths}
import java.util.OptionalLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The lake CHANGE FEED: `<table>__changes` is a read-only companion
  * table whose rows are the row-level changes BETWEEN log versions —
  * the `table_changes()` / CDF analog a versioned log gives for free.
  *
  * Feed schema = base table schema + `_change_type` STRING
  * ('insert' | 'delete') + `_commit_version` BIGINT. Per version the
  * diff of adjacent snapshots derives the changes:
  *
  *   - files ADDED → their rows as 'insert'
  *   - a file's delete vector GROWN → the newly-deleted positions,
  *     read back from the data file, as 'delete' (an UPDATE on a MOR
  *     table therefore shows as delete-of-pre-image +
  *     insert-of-post-image in one commit — CDC shape)
  *   - files REMOVED with nothing added (metadata-only DELETE,
  *     TRUNCATE) → their live rows as 'delete'
  *   - a commit that both removes AND adds files (COW rewrite,
  *     compaction) is a PHYSICAL rewrite whose logical change set is
  *     not representable from the log alone: the scan fails unless
  *     `skipChangeCommits=true`, which skips those versions (Delta's
  *     streaming-read contract).
  *
  * Batch reads take `startingVersion`/`endingVersion` options.
  * Streaming ([[LakeChangesStream]]) treats LOG VERSIONS as offsets:
  * resume picks up from the committed version, `maxVersionsPerTrigger`
  * and `maxBytesPerTrigger` bound admission per micro-batch (byte
  * pacing admits whole versions off the log's recorded file sizes —
  * a commit never splits across triggers), and Trigger.AvailableNow
  * pins the head at start ([[SupportsTriggerAvailableNow]]).
  */
class LakeChangesTable(dir: Path, baseName: String) extends Table with SupportsRead {

  private val head: LakeSnapshot = LakeLog.currentSnapshot(dir).getOrElse(
    throw new IllegalStateException(s"graftlake: $baseName has no committed version"))

  /** Current-schema column ids, for per-file physical-name resolution. */
  private val feedCols: Seq[(String, Long)] =
    LakeColIds.cols(head.schema, head.props)

  override def name(): String = s"graftlake.$baseName:changes"
  override def schema(): StructType = head.schema
    .add(StructField(LakeChanges.TypeColumn, StringType, nullable = false))
    .add(StructField(LakeChanges.VersionColumn, LongType, nullable = false))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = schema()
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan =
        new LakeChangesScan(dir, feedCols, required, options)
    }
}

object LakeChanges {
  val TypeColumn = "_change_type"
  val VersionColumn = "_commit_version"
  /** Table-name suffix that routes `loadTable` to the feed. */
  val Suffix = "__changes"

  /** `startingTimestamp` → the first version committed at or after the
    * instant (epoch millis, or any SQL timestamp/date literal parsed in
    * the SESSION timezone — `2024-01-02`, `2024-01-02 03:04:05`, and
    * ISO-8601 `T` forms all accepted). Every retained commit older →
    * start past the head (future commits only). Mutually exclusive with
    * `startingVersion`.
    */
  def resolveStartingVersion(dir: Path,
      options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("startingTimestamp")).map { s =>
      require(options.get("startingVersion") == null,
        "graftlake: startingTimestamp and startingVersion are mutually exclusive")
      val tsMs =
        if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
        else {
          // Session-timezone parse, same literal grammar as CAST(s AS
          // TIMESTAMP) — not Timestamp.valueOf, which is JVM-default-TZ
          // and rejects date-only / 'T' forms.
          val zone = org.apache.spark.sql.catalyst.util.DateTimeUtils
            .getZoneId(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
          val micros = org.apache.spark.sql.catalyst.util.DateTimeUtils
            .stringToTimestamp(org.apache.spark.unsafe.types.UTF8String.fromString(s), zone)
            .getOrElse(throw new IllegalArgumentException(
              s"graftlake: cannot parse option startingTimestamp='$s' — " +
                "expected epoch millis or a timestamp/date literal"))
          Math.floorDiv(micros, 1000L)
        }
      LakeLog.versionAfterTime(dir, tsMs)
        .getOrElse(LakeLog.currentVersion(dir).getOrElse(-1L) + 1L)
    }

  /** Change partitions for ONE version transition `v-1 -> v`.
    * `appendOnly` is the BASE-table streaming contract: only appended
    * files may emit; any delete-vector growth or file removal is a
    * data CHANGE the stream cannot represent and fails (or skips,
    * under `skipChangeCommits`) — stream `<t>__changes` to observe
    * mutations as rows.
    */
  def partitionsFor(dir: Path, feedCols: Seq[(String, Long)],
      required: StructType, v: Long, skipChangeCommits: Boolean,
      appendOnly: Boolean = false): Seq[LakeChangePartition] = {
    val prev =
      if (v == 0L) LakeSnapshot(-1L, StructType(Nil), Seq.empty)
      else LakeLog.snapshotAt(dir, v - 1).getOrElse(throw new IllegalStateException(
        s"graftlake change feed: version ${v - 1} pruned past retention"))
    val cur = LakeLog.snapshotAt(dir, v).getOrElse(throw new IllegalStateException(
      s"graftlake change feed: version $v pruned past retention"))
    val prevByPath = prev.files.map(f => f.path -> f).toMap
    val curByPath = cur.files.map(f => f.path -> f).toMap
    val added = cur.files.filter(f => !prevByPath.contains(f.path))
    val removed = prev.files.filter(f => !curByPath.contains(f.path))
    if (added.nonEmpty && removed.nonEmpty) {
      if (skipChangeCommits) return Seq.empty
      throw new UnsupportedOperationException(
        s"graftlake change feed: version $v rewrites files (COW/compaction) — " +
          "its logical change set is not derivable from the log; " +
          "set skipChangeCommits=true to skip such commits")
    }
    // an EQUALITY-DELETE commit deletes rows the log only names by KEY —
    // expanding them to change rows would mean scanning every older
    // file; fail loudly (or skip), like physical rewrites. The same for
    // a commit that DROPS records with its files intact (a rollback
    // restoring a pre-delete set): that resurrects rows the feed cannot
    // name — dv-shrink resurrection's equality twin
    if (LakeLog.deltaEqChanged(dir, v)) {
      if (skipChangeCommits) return Seq.empty
      throw new UnsupportedOperationException(
        s"graftlake change feed: version $v adds or drops equality-delete " +
          "records — their per-row change set is not derivable from the " +
          "log; set skipChangeCommits=true to skip such commits")
    }
    def rename(f: LakeFile): Map[String, String] =
      required.fieldNames.iterator
        .filter(n => n != TypeColumn && n != VersionColumn)
        .flatMap(n => LakeColIds.physicalName(feedCols, f, n).map(n -> _))
        .toMap
    def fileTypes(f: LakeFile): Map[String, String] =
      LakeColIds.fileTypes(feedCols, f,
        required.fields.toSeq.filter(fd =>
          fd.name != TypeColumn && fd.name != VersionColumn))
    // dv SIDECAR PATHS only — the vectors themselves are read in the
    // TASK ([[LakeChangesReaderFactory]]), so planning stays O(files)
    // driver memory and a million-row DELETE ships bytes-constant
    // partition payloads instead of embedded position arrays
    val inserts = added.map(f => LakeChangePartition(
      dir.toString, f.path, f.rows, rename(f), "insert", v,
      dv = f.dv, prevDv = None, emitDiff = false, fileTypes = fileTypes(f)))
    if (appendOnly) {
      val changed = removed.nonEmpty ||
        cur.files.exists(f => prevByPath.get(f.path).exists(_.dv != f.dv))
      if (changed) {
        if (skipChangeCommits) return Seq.empty
        throw new UnsupportedOperationException(
          s"graftlake: version $v deletes or updates rows — streaming the " +
            "base table is append-only; stream <table>__changes to observe " +
            "mutations, or set skipChangeCommits=true to skip them")
      }
      return inserts
    }
    val dvDeletes = cur.files.flatMap { f =>
      prevByPath.get(f.path) match {
        case Some(pf) if pf.dv != f.dv && f.dvRows >= pf.dvRows =>
          // the task reads both sidecars and sorted-merge-diffs them;
          // dv growth is monotone outside rewrite/rollback commits,
          // so a grown reference always carries new positions
          Some(LakeChangePartition(dir.toString, f.path, f.rows,
            rename(f), "delete", v, dv = f.dv, prevDv = pf.dv,
            emitDiff = true, fileTypes = fileTypes(f)))
        case Some(pf) if pf.dv != f.dv =>
          // dv SHRINK: a rollback restored an ancestor's (strictly
          // smaller) vector — rows came back to life. Same diff
          // kernel with the sidecar roles SWAPPED: positions in the
          // old vector absent from the new one are the resurrected
          // rows, emitted as inserts
          Some(LakeChangePartition(dir.toString, f.path, f.rows,
            rename(f), "insert", v, dv = pf.dv, prevDv = f.dv,
            emitDiff = true, fileTypes = fileTypes(f)))
        case _ => None
      }
    }
    val dropDeletes = removed.map(f => LakeChangePartition(
      dir.toString, f.path, f.rows, rename(f), "delete", v,
      dv = f.dv, prevDv = None, emitDiff = false, fileTypes = fileTypes(f)))
    inserts ++ dvDeletes ++ dropDeletes
  }
}

/** Batch half: all changes in `[startingVersion, endingVersion]`. */
class LakeChangesScan(dir: Path, feedCols: Seq[(String, Long)],
    required: StructType, options: CaseInsensitiveStringMap,
    appendOnly: Boolean = false)
  extends Scan with Batch with SupportsReportStatistics {

  private def opt(k: String, dflt: Long): Long =
    Option(options.get(k)).map(_.toLong).getOrElse(dflt)
  private val skipChangeCommits: Boolean =
    Option(options.get("skipChangeCommits")).exists(_.toBoolean)

  override def readSchema(): StructType = required
  override def description(): String = s"graftlake-changes [${required.fieldNames.mkString(",")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val head = LakeLog.currentVersion(dir).getOrElse(-1L)
    // default 0, not 1: CTAS/RTAS commit their data files AT v0
    val from = opt("startingVersion", 0L)
    val to = math.min(opt("endingVersion", head), head)
    (from to to).flatMap(v =>
      LakeChanges.partitionsFor(dir, feedCols, required, v, skipChangeCommits,
        appendOnly))
      .map(p => p: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    LakeChangesReaderFactory(required.fields.map(f => f.name -> f.dataType))

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = OptionalLong.empty()
    override def numRows(): OptionalLong = OptionalLong.empty()
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LakeChangesStream(dir, feedCols, required,
      startingVersion = LakeChanges.resolveStartingVersion(dir, options)
        .getOrElse(opt("startingVersion", 0L)),
      maxVersionsPerTrigger = opt("maxVersionsPerTrigger", Long.MaxValue),
      maxBytesPerTrigger = opt("maxBytesPerTrigger", Long.MaxValue),
      skipChangeCommits = skipChangeCommits,
      appendOnly = appendOnly)
}

/** Streaming half: offsets are LOG VERSIONS; a batch (start, end]
  * carries the change partitions of each version in the range.
  */
class LakeChangesStream(dir: Path, feedCols: Seq[(String, Long)],
    required: StructType, startingVersion: Long, maxVersionsPerTrigger: Long,
    skipChangeCommits: Boolean, appendOnly: Boolean = false,
    maxBytesPerTrigger: Long = Long.MaxValue)
  extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  @volatile private var preparedHead: Option[Long] = None

  /** The newest version a STREAM may admit. While a write-audit-publish
    * pin is active (branch() wrote the `main` ref), unaudited staged
    * commits must not flow to streaming consumers any more than to
    * batch readers of the same table — the stream's head is capped at
    * the pin and fast-forwards when publish drops it. (Auditors stream
    * staged commits only after publish; `VERSION AS OF '<branch>'`
    * remains the batch audit read.)
    */
  private def head: Long = {
    val h = LakeLog.currentVersion(dir).getOrElse(-1L)
    LakeLog.readRef(dir, "main") match {
      case Some((v, "main")) => math.min(h, v)
      case _ => h
    }
  }

  override def initialOffset(): Offset = LakeVersionOffset(startingVersion - 1)

  override def prepareForTriggerAvailableNow(): Unit = preparedHead = Some(head)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val bound = preparedHead.getOrElse(head)
    val s = start.asInstanceOf[LakeVersionOffset].version
    // overflow-safe admission: advance by at most maxVersionsPerTrigger
    // but never past (or below) the bound — `s + Long.MaxValue` wraps
    val step = math.min(maxVersionsPerTrigger, math.max(0L, bound - s))
    if (step == 0L || maxBytesPerTrigger == Long.MaxValue)
      return LakeVersionOffset(s + step)
    // BYTE-paced admission (the 100 TB backfill knob): admit whole
    // versions while their cumulative ADDED data-file bytes stay under
    // the budget — the log already records every file's size, so the
    // weights are O(1) driver reads of the pending deltas, no file
    // opens. Version boundaries are respected absolutely (a commit
    // never splits across triggers), so a single commit larger than
    // the budget still admits ALONE rather than stalling the stream —
    // the same always-make-progress rule as Delta's maxBytesPerTrigger.
    var v = s
    var admitted = 0L
    var budget = maxBytesPerTrigger
    while (admitted < step) {
      val b = LakeLog.versionAddedBytes(dir, v + 1)
      if (admitted > 0L && b > budget) return LakeVersionOffset(v)
      v += 1; admitted += 1; budget -= b
      if (budget <= 0L) return LakeVersionOffset(v)
    }
    LakeVersionOffset(v)
  }

  override def reportLatestOffset(): Offset = LakeVersionOffset(head)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LakeVersionOffset].version
    val e = end.asInstanceOf[LakeVersionOffset].version
    ((s + 1) to e).flatMap(v =>
      LakeChanges.partitionsFor(dir, feedCols, required, v, skipChangeCommits,
        appendOnly))
      .map(p => p: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    LakeChangesReaderFactory(required.fields.map(f => f.name -> f.dataType))

  override def deserializeOffset(json: String): Offset =
    LakeVersionOffset(LakeVersionOffset.parse(json))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class LakeVersionOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

object LakeVersionOffset {
  private val Re = """\{"version":(-?\d+)\}""".r
  def parse(json: String): Long = json.trim match {
    case Re(v) => v.toLong
    case other => throw new IllegalArgumentException(s"bad lake offset: $other")
  }
}

/** One change partition: the rows of ONE data file contributing to ONE
  * version's change set. Carries only the dv sidecar PATHS — O(1)
  * payload regardless of delete size; the reader loads them task-side.
  * `emitDiff = true` emits exactly the positions of `dv` absent from
  * `prevDv` (dv-growth deletes — or, with the roles swapped by the
  * planner, rollback-resurrected inserts); otherwise every position
  * except those
  * in `dv` (inserts, and whole-file deletes minus the pre-existing
  * vector).
  */
case class LakeChangePartition(tableDir: String, path: String, rows: Long,
    rename: Map[String, String], changeType: String, version: Long,
    dv: Option[String], prevDv: Option[String], emitDiff: Boolean,
    fileTypes: Map[String, String] = Map.empty) extends InputPartition

case class LakeChangesReaderFactory(
    required: Array[(String, DataType)]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LakeChangePartition]
    val tdir = Paths.get(p.tableDir)
    def readDv(rel: Option[String]): Array[Long] =
      rel.map(LakeDv.read(tdir, _)).getOrElse(Array.emptyLongArray)
    // task-side dv materialization: planning shipped only the paths
    val dvCur = readDv(p.dv)
    val include: Option[Array[Long]] =
      if (p.emitDiff) Some(LakeDv.diff(dvCur, readDv(p.prevDv))) else None
    val exclude: Array[Long] = if (p.emitDiff) Array.emptyLongArray else dvCur
    val codes = {
      var pi = 0
      required.map { case (n, _) =>
        if (n == LakeChanges.TypeColumn) -1
        else if (n == LakeChanges.VersionColumn) -2
        else if (!p.rename.contains(n)) -3
        else { val i = pi; pi += 1; i }
      }
    }
    val fileDts: Array[DataType] = required.map { case (n, dt) =>
      p.fileTypes.get(n).map(LakeParquet.typeOf).getOrElse(dt) }
    val physical = required.collect {
      case (n, _) if p.rename.contains(n) => p.rename(n) }
    val reader =
      if (physical.isEmpty) null
      else LakeParquet.openVectorized(
        Paths.get(p.tableDir).resolve(p.path), physical.toSeq)
    val typeValue = UTF8String.fromString(p.changeType)
    new PartitionReader[InternalRow] {
      private var pos = -1L
      private var cursor = 0
      private def emit(i: Long): Boolean = include match {
        case Some(inc) =>
          while (cursor < inc.length && inc(cursor) < i) cursor += 1
          cursor < inc.length && inc(cursor) == i
        case None =>
          while (cursor < exclude.length && exclude(cursor) < i) cursor += 1
          !(cursor < exclude.length && exclude(cursor) == i)
      }
      override def next(): Boolean =
        if (reader == null) {
          pos += 1
          while (pos < p.rows && !emit(pos)) pos += 1
          pos < p.rows
        } else {
          var more = reader.nextKeyValue()
          while (more) {
            pos += 1
            if (emit(pos)) return true
            more = reader.nextKeyValue()
          }
          false
        }
      override def get(): InternalRow = {
        val src =
          if (reader == null) null
          else reader.getCurrentValue.asInstanceOf[InternalRow]
        val vals = new Array[Any](required.length)
        var c = 0
        while (c < required.length) {
          val code = codes(c)
          vals(c) =
            if (code == -1) typeValue
            else if (code == -2) p.version
            else if (code == -3) null
            else if (src.isNullAt(code)) null
            else LakeParquet.upcast(
              src.get(code, fileDts(c)), fileDts(c), required(c)._2)
          c += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = if (reader != null) reader.close()
    }
  }
}
