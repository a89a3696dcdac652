package org.apache.spark.sql.execution.datasources.parquet

import org.apache.parquet.column.page.PageReadStore
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.schema.MessageType

/** Package bridge into Spark's vectorized parquet reader (the
  * `PlanBridge` pattern — `ParquetRowGroupReader` is package-private
  * despite the public 4-arg `initialize` overload that consumes it).
  *
  * Lets graft's lake scan drive the SAME vectorized decoder over a
  * CALLER-SELECTED subset of a file's row groups: the wrapped
  * [[ParquetFileReader]] `skipNextRowGroup()`s past pruned blocks, so
  * a pushed predicate that skips a row group never pays its page IO
  * or decode. Spark's own reader does this via Hadoop-conf filter
  * plumbing; this bridge reaches the identical engine seam without a
  * Hadoop `FileSystem` in the loop.
  */
object GraftParquetBridge {

  /** Initialize `r` over exactly the `keep`-marked row groups of
    * `reader` (indices aligned with the footer's block order).
    * `totalRows` must be the kept blocks' row-count sum. Closing `r`
    * closes `reader`.
    */
  def initPruned(r: VectorizedParquetRecordReader, fileSchema: MessageType,
      requested: MessageType, reader: ParquetFileReader,
      keep: Array[Boolean], totalRows: Long): Unit = {
    val rg = new SpecificParquetRecordReaderBase.ParquetRowGroupReader {
      private var i = 0
      override def readNextRowGroup(): PageReadStore = {
        while (i < keep.length && !keep(i)) {
          reader.skipNextRowGroup()
          i += 1
        }
        if (i >= keep.length) null
        else {
          i += 1
          reader.readNextRowGroup()
        }
      }
      override def close(): Unit = reader.close()
    }
    require(totalRows <= Int.MaxValue,
      s"graftlake: $totalRows rows in one file exceed a single reader")
    r.initialize(fileSchema, requested, rg, totalRows.toInt)
  }
}
