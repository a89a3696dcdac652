package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary-column) plumbing for image/audio/video payloads.
  *
  * Media are opaque `binary` columns plus typed metadata — the
  * schema/partitioning/batching layer is real and tested; only the codec
  * call is stubbed (media libraries are not on this cluster image), with
  * a deterministic fake so the pipeline shape is exercisable end-to-end.
  *
  * Scale notes: binary payloads ride the normal columnar path (parquet
  * byte arrays); per-record feature extraction runs in `mapPartitions`
  * so a real decoder amortizes init (codec contexts, model weights) once
  * per partition, the Scala analog of batched `mapInPandas`. Keep media
  * rows narrow (content + metadata only) and join features back by id
  * rather than carrying bytes through wide plans.
  */
object Multimodal {

  /** A media record: opaque bytes + the metadata a pipeline must carry. */
  case class MediaRecord(media_id: Long, kind: String, content: Array[Byte],
                         width: Int, height: Int, sample_rate: Int)

  /** Extracted features: fixed-width vector + summary stats. */
  case class MediaFeatures(media_id: Long, kind: String, byte_len: Int,
                           checksum: Long, histogram: Array[Long])

  /** Deterministic fake "decode + featurize": byte histogram over 16
    * buckets + additive checksum. ??? REPLACE WITH REAL CODEC ??? — a
    * real implementation would decode `content` (JPEG/WAV/...) here and
    * emit model-ready features; everything around this call (schema,
    * batching, partition amortization) is production-shaped.
    */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition init happens HERE once (codec context / weights)
      it.map { r =>
        val hist = new Array[Long](16)
        var sum = 0L
        var i = 0
        while (i < r.content.length) {
          hist((r.content(i) & 0xFF) >> 4) += 1
          sum = sum * 31 + (r.content(i) & 0xFF)
          i += 1
        }
        MediaFeatures(r.media_id, r.kind, r.content.length, sum, hist)
      }
    }
  }

  /** Deterministic fake "resize": metadata updated for real, content
    * transformed by a stub (proportional byte resampling).
    * ??? REPLACE WITH REAL CODEC ??? — a real decoder/encoder pair goes
    * here; the schema flow and per-partition batching are the real part.
    */
  def resize(records: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val ratio = if (r.width > 0 && r.height > 0)
          (targetW.toDouble * targetH) / (r.width.toDouble * r.height)
        else 1.0
        val newLen = math.max(1, math.min(r.content.length,
          math.round(r.content.length * ratio).toInt))
        r.copy(content = r.content.take(newLen), width = targetW, height = targetH)
      }
    }
  }

  /** Frame sampling for video-kind payloads: emit every `everyN`-th
    * fixed-size frame slice with its index — the real plumbing (schema,
    * per-record fan-out, ordering column) around a stubbed frame
    * decoder. ??? REPLACE WITH REAL CODEC ???
    */
  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  def frameSample(records: Dataset[MediaRecord], frameSize: Int, everyN: Int): Dataset[Frame] = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      val nFrames = math.max(1, r.content.length / math.max(1, frameSize))
      (0 until nFrames by everyN).map { i =>
        Frame(r.media_id, i, r.content.slice(i * frameSize, (i + 1) * frameSize))
      }
    }
  }

  /** Wrap a text table into media records (UTF-8 bytes as the payload) —
    * lets the binary pipeline be driven by the documents testdata.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        lit("text/utf-8").as("kind"),
        encode(col("text"), "UTF-8").as("content"),
        lit(0).as("width"), lit(0).as("height"), lit(0).as("sample_rate"))
      .as[MediaRecord]
  }
}
