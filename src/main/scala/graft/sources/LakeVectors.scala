package graft.sources

import org.apache.spark.sql.types.{DataType, Decimal, IntegerType, LongType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarArray, ColumnarMap}
import org.apache.spark.unsafe.types.UTF8String

/** The per-batch row SELECTION a delete vector induces, shared by every
  * wrapped column of the batch: output row `i` reads inner row
  * `map(i)` (`map = null` means identity — no deleted rows in this
  * batch, the common case, which keeps the hot path branch-predictable).
  * [[LakeReaderFactory.createColumnarReader]] rebuilds `map` per batch
  * from the file-absolute delete positions; wrappers see the update
  * through this shared holder.
  */
final class LakeSelection {
  var map: Array[Int] = _
}

/** A zero-copy VIEW over one decoded column vector that applies
  *
  *   - the batch's delete-vector selection (live-row compaction by
  *     index indirection — the Iceberg/Delta live-row pattern without
  *     the copy), and
  *   - the one supported type widening (a file written before an
  *     `ALTER COLUMN ... TYPE BIGINT` decodes as INT; the view answers
  *     `getLong` so the scan's reported schema holds vector-wise).
  *
  * Lake column types are primitives only (bigint/int/double/string/
  * boolean), so the nested accessors simply delegate. The inner vector
  * stays owned by the parquet reader — `close()` is a no-op.
  */
final class LakeSelectVector(inner: ColumnVector, tpe: DataType, sel: LakeSelection)
  extends ColumnVector(tpe) {

  private val widen = inner.dataType() == IntegerType && tpe == LongType

  @inline private def m(i: Int): Int = {
    val mm = sel.map
    if (mm == null) i else mm(i)
  }

  override def close(): Unit = ()
  override def hasNull: Boolean = inner.hasNull
  override def numNulls: Int = inner.numNulls
  override def isNullAt(i: Int): Boolean = inner.isNullAt(m(i))
  override def getBoolean(i: Int): Boolean = inner.getBoolean(m(i))
  override def getByte(i: Int): Byte = inner.getByte(m(i))
  override def getShort(i: Int): Short = inner.getShort(m(i))
  override def getInt(i: Int): Int = inner.getInt(m(i))
  override def getLong(i: Int): Long = {
    val j = m(i)
    if (widen) inner.getInt(j).toLong else inner.getLong(j)
  }
  override def getFloat(i: Int): Float = inner.getFloat(m(i))
  override def getDouble(i: Int): Double = inner.getDouble(m(i))
  override def getArray(i: Int): ColumnarArray = inner.getArray(m(i))
  override def getMap(i: Int): ColumnarMap = inner.getMap(m(i))
  override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
    inner.getDecimal(m(i), precision, scale)
  override def getUTF8String(i: Int): UTF8String = inner.getUTF8String(m(i))
  override def getBinary(i: Int): Array[Byte] = inner.getBinary(m(i))
  override def getChild(ordinal: Int): ColumnVector = inner.getChild(ordinal)
}
