package graft.sources

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graftsink` — the WRITE side of the DataSource V2 contract:
  * a sink that DEMANDS a distribution and an ordering
  * ([[RequiresDistributionAndOrdering]]), the way Iceberg/Delta-style
  * tables ask Spark to cluster and sort rows to match the table layout
  * BEFORE the writer ever sees them. Spark's write planning inserts the
  * repartition-by-expression + per-partition sort; the sink just
  * receives rows that already satisfy the layout — at 100 TB this is
  * what keeps writers single-pass (no writer-side re-sort, no
  * one-file-per-key explosion from scattered clustering).
  *
  * Requirements come from options: `clusterBy` (hash-clustered column —
  * every distinct value lands in exactly one task) and `sortBy`
  * (ascending within each task). Committed rows travel to the driver in
  * the [[WriterCommitMessage]]s and are retained per `tag` in
  * [[ClusteredSink.committed]] — a VALIDATION sink (the test double of
  * a layout-requiring table format), not a storage engine; real formats
  * write files in `commit` instead of retaining rows.
  *
  * DataSourceV2Spec pins: clustering (key → exactly one partition),
  * in-partition ordering, exact roundtrip content, and abort-path
  * non-commitment.
  */
class ClusteredSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftsink"
  override def supportsExternalMetadata(): Boolean = true // schema = the DataFrame's
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only source; reads have no schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val p = properties.asScala
    new SinkTable(schema,
      p.getOrElse("clusterBy",
        throw new IllegalArgumentException("graftsink requires option clusterBy")),
      p.getOrElse("sortBy",
        throw new IllegalArgumentException("graftsink requires option sortBy")),
      p.getOrElse("tag", "default"),
      p.get("failOnSortValue").map(_.toLong))
  }
}

object ClusteredSink {
  /** tag → the last committed write's per-task row groups. */
  val committed = new java.util.concurrent.ConcurrentHashMap[String, Array[SinkPartData]]()

  /** (tag, epochId) → that micro-batch's committed per-task row groups.
    * Keyed by epoch so a replayed batch OVERWRITES its own slot instead
    * of duplicating rows — the idempotent-commit half of the streaming
    * exactly-once contract (the source's replayable offsets are the
    * other half).
    */
  val committedEpochs =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Array[SinkPartData]]()
}

/** One writer task's committed rows (values externalized to plain JVM
  * types so the message serializes executor → driver).
  */
case class SinkPartData(partitionId: Int, rows: Seq[Seq[Any]])
  extends WriterCommitMessage

class SinkTable(schema: StructType, clusterBy: String, sortBy: String, tag: String,
    failOnSortValue: Option[Long] = None)
  extends Table with SupportsWrite {
  require(schema.fieldNames.contains(clusterBy) && schema.fieldNames.contains(sortBy),
    s"graftsink clusterBy=$clusterBy sortBy=$sortBy must name columns of ${schema.simpleString}")

  override def name(): String = s"graftsink($tag)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write with RequiresDistributionAndOrdering {
        override def requiredDistribution(): Distribution =
          Distributions.clustered(Array(Expressions.identity(clusterBy)))
        override def requiredOrdering(): Array[SortOrder] =
          Array(Expressions.sort(Expressions.column(sortBy), SortDirection.ASCENDING))
        override def description(): String =
          s"graftsink(cluster=$clusterBy, sort=$sortBy)"
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory =
            SinkWriterFactory(info.schema(),
              failOnSortValue.map(v => (schema.fieldIndex(sortBy), v)))
          override def commit(messages: Array[WriterCommitMessage]): Unit =
            ClusteredSink.committed.put(tag, messages.map(_.asInstanceOf[SinkPartData]))
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }

        /** Micro-batch half: same writers, but commits land per EPOCH —
          * re-committing an epoch replaces its slot (idempotent), which
          * with the source's replayable offsets gives end-to-end
          * exactly-once.
          */
        override def toStreaming: StreamingWrite = new StreamingWrite {
          private val factory = SinkWriterFactory(info.schema(),
            failOnSortValue.map(v => (schema.fieldIndex(sortBy), v)))
          override def createStreamingWriterFactory(
              pi: PhysicalWriteInfo): StreamingDataWriterFactory =
            SinkStreamingWriterFactory(factory)
          override def commit(epochId: Long,
              messages: Array[WriterCommitMessage]): Unit =
            ClusteredSink.committedEpochs.put((tag, epochId),
              messages.map(_.asInstanceOf[SinkPartData]))
          override def abort(epochId: Long,
              messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

/** Streaming adapter over the batch writer factory (top-level so the
  * serialized closure carries no table/plan outers).
  */
case class SinkStreamingWriterFactory(inner: SinkWriterFactory)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    inner.createWriter(partitionId, taskId)
}

/** `failOn` = (sort-column index, planted value): a writer fault for
  * abort-path testing — throwing mid-write exercises Spark's task
  * abort → job abort → `BatchWrite.abort` sequence.
  */
case class SinkWriterFactory(schema: StructType, failOn: Option[(Int, Long)] = None)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = ArrayBuffer[Seq[Any]]()
      override def write(row: InternalRow): Unit = {
        failOn.foreach { case (i, v) =>
          if (row.getLong(i) == v)
            throw new java.io.IOException(s"graftsink planted fault at $v")
        }
        buf += schema.fields.indices.map { i =>
          row.get(i, schema(i).dataType) match {
            case s: UTF8String => s.toString
            case v => v
          }
        }
      }
      override def commit(): WriterCommitMessage = SinkPartData(partitionId, buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
