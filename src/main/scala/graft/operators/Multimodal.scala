package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary-column) operators for image/audio/video payloads.
  *
  * Media are opaque `binary` columns plus typed metadata. The image path
  * is a REAL codec: PNG encode/decode via `javax.imageio` (in the JDK —
  * no external jars), so `extractFeatures` and `resize` operate on true
  * decoded pixels. PNG is lossless, so decode(encode(img)) == img and
  * every pixel statistic is an exact integer an independent oracle can
  * recompute. The video path is rawvideo rgb24 (ffmpeg's `rawvideo`
  * layout: frames of `w*h*3` bytes, row-major, R,G,B per pixel) — frame
  * extraction and per-frame channel stats are real decodes of that
  * format.
  *
  * Scale notes: binary payloads ride the normal columnar path (parquet
  * byte arrays); per-record work runs in `mapPartitions` so decoder
  * init amortizes once per partition, the Scala analog of batched
  * `mapInPandas`. Keep media rows narrow (content + metadata only) and
  * join features back by id rather than carrying bytes through wide
  * plans. Synthetic-image generation (`pngFromDocuments` /
  * `rawVideoFromDocuments`) exists to drive the codec path from the
  * text-only testdata; a production pipeline reads its PNG/raw bytes
  * straight from the lake and enters at [[extractFeatures]].
  */
object Multimodal {

  /** A media record: opaque bytes + the metadata a pipeline must carry. */
  case class MediaRecord(media_id: Long, kind: String, content: Array[Byte],
                         width: Int, height: Int, sample_rate: Int)

  /** Extracted features — all exact integers so the whole row is
    * hash-checkable: decoded dims, per-channel pixel sums, and a
    * position-weighted checksum (Σ rgb24 · (y·w + x + 1)) that pins
    * pixel ORDER, not just totals. For non-image kinds the byte-level
    * fallback sets dims/channel sums to 0 and checksums raw bytes.
    */
  case class MediaFeatures(media_id: Long, kind: String, byte_len: Int,
                           width: Int, height: Int,
                           r_sum: Long, g_sum: Long, b_sum: Long,
                           px_checksum: Long)

  /** Closed-form deterministic pixel formula — the shared contract
    * between image GENERATION here and the DuckDB oracle that
    * recomputes the stats of the decoded pixels (possible only because
    * PNG is lossless). All terms are nonnegative, so `%` is a true mod.
    */
  def pixelR(id: Long, x: Int, y: Int): Int = ((id * 7 + x * 3 + y * 5) % 256).toInt
  def pixelG(id: Long, x: Int, y: Int): Int = ((id * 11 + x + y * 2) % 256).toInt
  def pixelB(id: Long, x: Int, y: Int): Int = ((id * 3 + x * y) % 256).toInt

  /** Deterministic media dims derived from the id (kept small so the
    * oracle's per-pixel enumeration stays cheap at test scale).
    */
  def synthWidth(id: Long): Int = (4 + id % 8).toInt
  def synthHeight(id: Long): Int = (3 + id % 5).toInt

  /** Render the formula image and encode it as a real PNG. */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (pixelR(id, x, y) << 16) | (pixelG(id, x, y) << 8) | pixelB(id, x, y))
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def decodePng(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  val PngKind = "image/png"
  val RawVideoKind = "video/rgb24"

  /** documents → real PNG media records, one per doc_id, pixels from the
    * closed-form formula. The text column is deliberately unused — the
    * id alone determines the image, which is what lets an oracle with
    * no PNG decoder verify the decoded stats.
    */
  def pngFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    spreadIds(docs).map { id =>
      val (w, h) = (synthWidth(id), synthHeight(id))
      MediaRecord(id, PngKind, syntheticPng(id, w, h), w, h, 0)
    }
  }

  /** The id frame feeding every synth/codec map: hash-repartitioned so
    * the CPU-heavy per-row codec work spreads across the cluster even
    * when the id source is one small input split (a 1-task scan would
    * serialize the whole encode/decode chain; the ids themselves are 8
    * bytes/row, so the extra exchange is ~free). Deterministic: hash
    * partitioning + per-row pure functions — output is a row set,
    * order restored by each query's tail sort.
    */
  private[graft] def spreadIds(docs: DataFrame): Dataset[Long] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).repartition(col("doc_id")).as[Long]
  }

  /** documents → rawvideo rgb24 records: `2 + id % 3` frames of
    * `w*h*3` bytes each, frame f's pixels from the formula with the
    * frame index folded into the id term (so every frame differs).
    */
  def rawVideoFromDocuments(spark: SparkSession, docs: DataFrame,
                            w: Int, h: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spreadIds(docs).map { id =>
      val nFrames = (2 + id % 3).toInt
      val buf = new Array[Byte](nFrames * w * h * 3)
      var f = 0
      while (f < nFrames) {
        val fid = id + f * 13L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val o = ((f * h + y) * w + x) * 3
            buf(o) = pixelR(fid, x, y).toByte
            buf(o + 1) = pixelG(fid, x, y).toByte
            buf(o + 2) = pixelB(fid, x, y).toByte
            x += 1
          }
          y += 1
        }
        f += 1
      }
      MediaRecord(id, RawVideoKind, buf, w, h, 0)
    }
  }

  /** REAL decode + featurize: PNG payloads are decoded with `ImageIO`
    * and summarized as exact integer pixel stats; other kinds fall back
    * to byte-level stats (dims 0, checksum over raw bytes) so opaque
    * payloads still fingerprint. Runs in `mapPartitions` — a heavier
    * decoder (or model weights) would init once per partition here.
    */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition init happens HERE once (codec context / weights)
      it.map { r =>
        if (r.kind == PngKind) {
          val img = decodePng(r.content)
          val (w, h) = (img.getWidth, img.getHeight)
          var (rs, gs, bs, ck) = (0L, 0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y) & 0xFFFFFF
              rs += (rgb >> 16) & 0xFF
              gs += (rgb >> 8) & 0xFF
              bs += rgb & 0xFF
              ck += rgb.toLong * (y.toLong * w + x + 1)
              x += 1
            }
            y += 1
          }
          MediaFeatures(r.media_id, r.kind, r.content.length, w, h, rs, gs, bs, ck)
        } else {
          var (ck, i) = (0L, 0)
          while (i < r.content.length) {
            ck += (r.content(i) & 0xFF).toLong * (i + 1)
            i += 1
          }
          MediaFeatures(r.media_id, r.kind, r.content.length, 0, 0, 0L, 0L, 0L, ck)
        }
      }
    }
  }

  /** REAL image resize: decode PNG → nearest-neighbor resample →
    * re-encode PNG. The sample map is the fully-specified integer form
    * `src = (dst * srcDim) / dstDim` (floor division) rather than
    * `Graphics2D` drawing, whose nearest-neighbor rounding is an
    * implementation detail — this keeps every resized pixel exactly
    * recomputable by an engine with no JVM. Non-image kinds pass
    * through untouched (resize is an image operation).
    */
  def resize(records: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    require(targetW > 0 && targetH > 0, "need positive target dims")
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        if (r.kind == PngKind) {
          val src = decodePng(r.content)
          val (sw, sh) = (src.getWidth, src.getHeight)
          val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < targetH) {
            val sy = y * sh / targetH
            var x = 0
            while (x < targetW) {
              dst.setRGB(x, y, src.getRGB(x * sw / targetW, sy) & 0xFFFFFF)
              x += 1
            }
            y += 1
          }
          r.copy(content = encodePng(dst), width = targetW, height = targetH)
        } else r
      }
    }
  }

  /** Frame extraction for rawvideo rgb24 payloads: every `everyN`-th
    * `frameSize`-byte slice IS a decoded frame in that format (no
    * container to parse — that's the point of rawvideo). Emits the
    * frame index so downstream keeps temporal order.
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

  /** Per-frame channel stats: interpret each frame's bytes as rgb24 of
    * the given dims (real decode of the rawvideo layout) and emit exact
    * integer channel sums — the frame-level twin of [[extractFeatures]].
    */
  case class FrameStats(media_id: Long, frame_idx: Int,
                        r_sum: Long, g_sum: Long, b_sum: Long)

  def frameChannelStats(frames: Dataset[Frame], w: Int, h: Int): Dataset[FrameStats] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { it =>
      it.map { fr =>
        var (rs, gs, bs, i) = (0L, 0L, 0L, 0)
        val n = math.min(fr.frame_bytes.length, w * h * 3)
        while (i + 3 <= n) {
          rs += fr.frame_bytes(i) & 0xFF
          gs += fr.frame_bytes(i + 1) & 0xFF
          bs += fr.frame_bytes(i + 2) & 0xFF
          i += 3
        }
        FrameStats(fr.media_id, fr.frame_idx, rs, gs, bs)
      }
    }
  }

  /** 64-bit average hash (aHash) of a decoded image as a 64-char bit
    * string: nearest-neighbor downsample to 8×8 (same integer sample
    * map as [[resize]]), per-pixel gray = r+g+b (division-free), bit =
    * gray > floor(mean) — the classic perceptual near-dup fingerprint,
    * here in fully integer form so an oracle with no image library can
    * recompute it from the source pixels. The bit-string (not a packed
    * int64) sidesteps sign-bit overflow in SQL engines.
    */
  def aHashBits(img: BufferedImage): String = {
    val gray = new Array[Long](64)
    var sum = 0L
    var y = 0
    while (y < 8) {
      val sy = y * img.getHeight / 8
      var x = 0
      while (x < 8) {
        val rgb = img.getRGB(x * img.getWidth / 8, sy) & 0xFFFFFF
        val g = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        gray(y * 8 + x) = g
        sum += g
        x += 1
      }
      y += 1
    }
    val mean = sum / 64
    val sb = new StringBuilder(64)
    gray.foreach(g => sb.append(if (g > mean) '1' else '0'))
    sb.toString
  }

  /** Perceptual hashes for PNG media — REAL decode per record, then
    * [[aHashBits]]. Output: (media_id, ahash). Grouping on the hash is
    * image-content dedup: byte-identical payloads are unnecessary —
    * any encodings of the same (or near-same) pixels collide.
    */
  def perceptualHash(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map(r => (r.media_id, aHashBits(decodePng(r.content))))
    }.toDF("media_id", "ahash")
  }

  val WavKind = "audio/wav"

  /** Closed-form 16-bit PCM sample formula — the audio analog of the
    * pixel formula: full-range, nonnegative mod, oracle-replicable.
    */
  def sampleAt(id: Long, i: Int): Int =
    (((id * 31 + i.toLong * 7) % 65536) - 32768).toInt

  /** Render `n` formula samples as a REAL WAV file (RIFF container,
    * 16-bit signed little-endian mono PCM) via `javax.sound.sampled` —
    * like `ImageIO`, in the JDK, zero external jars. PCM in a WAV is
    * lossless, so decoded samples equal the formula exactly.
    */
  def syntheticWav(id: Long, n: Int, rate: Float = 8000f): Array[Byte] = {
    val bytes = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sampleAt(id, i)
      bytes(2 * i) = (s & 0xFF).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** documents → real WAV media records (`400 + id % 100` samples). */
  def wavFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    spreadIds(docs).map { id =>
      val n = (400 + id % 100).toInt
      MediaRecord(id, WavKind, syntheticWav(id, n), 0, 0, 8000)
    }
  }

  /** REAL audio resample by integer decimation: decode the WAV, keep
    * every `factor`-th sample, re-encode at `rate / factor` — the
    * sample-domain analog of the image NN resize (the fully-specified
    * index map `src = dst · factor` instead of an interpolation whose
    * rounding an oracle couldn't replicate). Non-audio kinds pass
    * through untouched.
    */
  def decimate(records: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    require(factor > 0, "need positive decimation factor")
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        if (r.kind == WavKind) {
          val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.content))
          val rate = ais.getFormat.getSampleRate
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          val m = (n + factor - 1) / factor
          val out = new Array[Byte](m * 2)
          var j = 0
          while (j < m) {
            out(2 * j) = bytes(2 * j * factor)
            out(2 * j + 1) = bytes(2 * j * factor + 1)
            j += 1
          }
          val newRate = rate / factor
          val fmt = new AudioFormat(newRate, 16, 1, true, false)
          val enc = new AudioInputStream(new ByteArrayInputStream(out), fmt, m.toLong)
          val bos = new ByteArrayOutputStream()
          AudioSystem.write(enc, AudioFileFormat.Type.WAVE, bos)
          r.copy(content = bos.toByteArray, sample_rate = newRate.toInt)
        } else r
      }
    }
  }

  /** Exact integer stats of a decoded audio payload. */
  case class AudioFeatures(media_id: Long, n_samples: Long, sample_rate: Int,
                           s_sum: Long, s_min: Long, s_max: Long,
                           s_checksum: Long)

  /** REAL audio decode + featurize: `AudioSystem.getAudioInputStream`
    * parses the RIFF/WAV container (format taken from the DECODE, not
    * the metadata), samples are reassembled from the little-endian
    * PCM frames, and the stats are exact integers — sum, min, max,
    * and a position-weighted checksum that pins sample ORDER
    * (|Σ s·(i+1)| ≤ 32768·n² ≈ 2^43 at n=500 — safely int64).
    */
  def extractAudioFeatures(records: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.content))
        val rate = ais.getFormat.getSampleRate.toInt
        val bytes = ais.readAllBytes()
        var (sum, ck) = (0L, 0L)
        var (mn, mx) = (Long.MaxValue, Long.MinValue)
        val n = bytes.length / 2
        var i = 0
        while (i < n) {
          val s = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort.toLong
          sum += s
          ck += s * (i + 1)
          if (s < mn) mn = s
          if (s > mx) mx = s
          i += 1
        }
        AudioFeatures(r.media_id, n.toLong, rate, sum, mn, mx, ck)
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
