package graft

import java.nio.file.Files

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LakeParquet

/** [[graft.sources.LakeParquet]] — the parquet storage layer under the
  * lake, exercised directly (no Spark session): write through Spark's
  * ParquetWriteSupport, stats off the footer (min/max AND null
  * counts), read back through the vectorized reader in both row and
  * batch mode, constant/partition columns, column pruning.
  */
class LakeParquetSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("cat", IntegerType),
    StructField("s", StringType),
    StructField("d", DoubleType),
    StructField("b", BooleanType)))

  private def writeSample(): java.nio.file.Path = {
    val f = Files.createTempDirectory("lakepq").resolve("f.parquet")
    val w = LakeParquet.createWriter(f, schema)
    for (i <- 0 until 100) {
      val s = if (i % 10 == 0) null else UTF8String.fromString(s"r$i")
      val cat: Any = if (i >= 90) null else i % 4
      w.write(new GenericInternalRow(Array[Any](
        i.toLong + 5L, cat, s, i / 2.0, i % 2 == 0)))
    }
    w.close()
    f
  }

  test("footer stats: row count, integral min/max, null counts per column") {
    val f = writeSample()
    val st = LakeParquet.footerStats(f)
    assert(st.rows == 100L)
    assert(st.stats("id") == (5L, 104L))
    assert(st.stats("cat") == (0L, 3L))
    assert(!st.stats.contains("s") && !st.stats.contains("d"),
      "only integral columns carry skip stats")
    assert(st.nulls("id") == 0L && st.nulls("cat") == 10L && st.nulls("s") == 10L)
    assert(st.nulls("d") == 0L && st.nulls("b") == 0L)
  }

  test("vectorized row read: pruned columns in requested order, nulls intact") {
    val f = writeSample()
    val r = LakeParquet.openVectorized(f, Seq("s", "id"))
    var n = 0
    var nullS = 0
    while (r.nextKeyValue()) {
      val row = r.getCurrentValue.asInstanceOf[InternalRow]
      val id = row.getLong(1)
      assert(id == n.toLong + 5L, "column order must follow the request, not the file")
      if (row.isNullAt(0)) nullS += 1
      else assert(row.getUTF8String(0).toString == s"r$n")
      n += 1
    }
    r.close()
    assert(n == 100 && nullS == 10)
  }

  test("batch read: constant partition columns append, null constants null-fill") {
    val f = writeSample()
    val r = LakeParquet.openVectorized(f, Seq("id"))
    val constSchema = StructType(Seq(
      StructField("_file", StringType, nullable = false),
      StructField("added", LongType)))
    r.initBatch(constSchema,
      new GenericInternalRow(Array[Any](UTF8String.fromString("data/f.parquet"), null)))
    r.enableReturningBatches()
    var rows = 0
    while (r.nextBatch()) {
      val batch = r.getCurrentValue.asInstanceOf[ColumnarBatch]
      assert(batch.numCols == 3, "file column + 2 constants")
      val it = batch.rowIterator()
      while (it.hasNext) {
        val row = it.next()
        assert(row.getLong(0) == rows.toLong + 5L)
        assert(row.getUTF8String(1).toString == "data/f.parquet")
        assert(row.isNullAt(2), "a null constant must null-fill the whole column")
        rows += 1
      }
    }
    r.close()
    assert(rows == 100)
  }
}
