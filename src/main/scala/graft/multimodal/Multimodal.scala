package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.b extension): image/audio/
  * video as opaque `binary` columns with typed metadata, processed by
  * per-partition batch functions (the Scala analog of `mapInPandas`
  * batches — one iterator pass per partition, no per-row serialization).
  *
  * The actual codecs (JPEG decode, audio resample, video frame-grab) are
  * STUBBED with deterministic fakes — the image/audio libraries are not
  * in this container — but the Spark-side shape is real and tested:
  * schema, partitioning, batch iteration, and the metadata contract are
  * exactly what a production decode stage plugs into (swap
  * [[StubCodecs]] for real codecs, nothing else changes).
  *
  * Scale notes: `binaryFile` caps file size at
  * `spark.sql.sources.binaryFile.maxLength` (2 GB); one file = one task,
  * so parallelism follows file count, and `maxPartitionBytes` groups
  * small files per task. Feature extraction is map-side only — the wide
  * `content` column must be dropped (not carried) before any shuffle.
  */
object Multimodal {

  final case class MediaMeta(path: String, kind: String, numBytes: Long,
                             width: Int, height: Int, channels: Int,
                             durationMs: Long)
  final case class MediaFeatures(path: String, kind: String,
                                 fingerprint: Long,
                                 histogram: Array[Double])

  /** Infer a media kind from the file extension. */
  def kindOf(path: String): String = {
    val ext = path.reverse.takeWhile(_ != '.').reverse.toLowerCase
    ext match {
      case "jpg" | "jpeg" | "png" | "gif" | "bmp" => "image"
      case "wav" | "mp3" | "flac" | "ogg" => "audio"
      case "mp4" | "avi" | "mkv" | "webm" => "video"
      case _ => "binary"
    }
  }

  /** Read a directory of media files as (path, length, content) rows. */
  def readBinary(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("length"), col("content"))

  /** Per-partition "decode": emit typed metadata per file. Batch shape
    * matches a real decoder: one pass over the partition iterator,
    * resources (a codec context) would be opened once per partition.
    */
  def extractMeta(binary: DataFrame): Dataset[MediaMeta] = {
    import binary.sparkSession.implicits._
    binary.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition codec init would go here
        batch.map { case (path, bytes) =>
          val kind = kindOf(path)
          val (w, h, ch, dur) = StubCodecs.decodeHeader(kind, bytes)
          MediaMeta(path, kind, bytes.length.toLong, w, h, ch, dur)
        }
      }
  }

  /** Per-partition feature extraction: content fingerprint + a fixed-
    * width "embedding" (here: a byte histogram — the stand-in for a
    * model forward pass). Drops `content` in the output, so anything
    * downstream (joins, dedup, ANN) shuffles only small rows.
    */
  def extractFeatures(binary: DataFrame, bins: Int = 16)
      : Dataset[MediaFeatures] = {
    import binary.sparkSession.implicits._
    binary.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (path, bytes) =>
          MediaFeatures(path, kindOf(path),
            graft.functions.PolyHash.hashBytes(bytes),
            StubCodecs.byteHistogram(bytes, bins))
        }
      }
  }

  final case class ResizedImage(path: String, width: Int, height: Int,
                                content: Array[Byte])

  /** Per-partition image resize to a fixed target (the normalization
    * step before a vision model). STUB transform (see [[StubCodecs
    * .resize]]) but the contract is the production one: binary in,
    * binary out, target dims in the row — so downstream batching
    * (e.g. stacking into model-input tensors per partition) is real.
    */
  def resizeImages(binary: DataFrame, width: Int, height: Int)
      : Dataset[ResizedImage] = {
    import binary.sparkSession.implicits._
    binary.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (path, bytes) =>
          ResizedImage(path, width, height,
            StubCodecs.resize(bytes, width, height))
        }
      }
  }

  final case class VideoFrame(path: String, frame_idx: Int,
                              frame_ts_ms: Long, frame: Array[Byte])

  /** Uniform frame sampling from video blobs: one input row fans out to
    * `n` frame rows — the flatMap shape a real ffmpeg-backed sampler
    * has. Frame payloads are STUB slices; timestamps come from the
    * (stub-)decoded duration so the schema carries real timing. The
    * wide source `content` is NOT in the output rows: per-frame rows
    * shuffle small.
    */
  def sampleFrames(binary: DataFrame, n: Int): Dataset[VideoFrame] = {
    import binary.sparkSession.implicits._
    binary.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (path, bytes) =>
          val (_, _, _, durMs) = StubCodecs.decodeHeader("video", bytes)
          (0 until n).iterator.map { i =>
            val tsMs = if (n == 1) 0L else durMs * i / (n - 1)
            VideoFrame(path, i, tsMs, StubCodecs.grabFrame(bytes, i, n))
          }
        }
      }
  }
}

/** Deterministic stand-ins for the real codecs (not in this container).
  * Everything derives from the bytes themselves, so tests are stable and
  * the pipeline is runnable end-to-end.
  */
object StubCodecs {

  /** STUB decode: width/height/channels/duration derived from content
    * length and a stable hash — replace with ImageIO/ffmpeg bindings.
    */
  def decodeHeader(kind: String, bytes: Array[Byte])
      : (Int, Int, Int, Long) = {
    val h = graft.functions.PolyHash.hashBytes(bytes)
    kind match {
      case "image" =>
        (64 + (h % 1024).toInt, 64 + ((h >> 10) % 1024).toInt, 3, 0L)
      case "audio" => (0, 0, (1 + (h % 2)).toInt, bytes.length / 16L)
      case "video" =>
        (320, 240, 3, bytes.length / 1024L)
      case _ => (0, 0, 0, 0L)
    }
  }

  /** STUB resize: deterministic re-hash of the content sized to the
    * target dims — replace with an ImageIO/libvips call.
    */
  def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val out = new Array[Byte](math.min(width * height, 4096))
    var i = 0
    while (i < out.length) {
      out(i) = (if (bytes.isEmpty) 0
        else bytes(i % bytes.length) ^ (i & 0x7f)).toByte
      i += 1
    }
    out
  }

  /** STUB frame grab: a deterministic slice per frame index — replace
    * with an ffmpeg seek+decode.
    */
  def grabFrame(bytes: Array[Byte], idx: Int, n: Int): Array[Byte] =
    if (bytes.isEmpty) Array.emptyByteArray
    else {
      val span = math.max(bytes.length / math.max(n, 1), 1)
      val start = math.min(idx * span, bytes.length - 1)
      java.util.Arrays.copyOfRange(bytes, start,
        math.min(start + span, bytes.length))
    }

  /** Normalized byte-value histogram — the deterministic fake
    * "embedding" for tests.
    */
  def byteHistogram(bytes: Array[Byte], bins: Int): Array[Double] = {
    val counts = new Array[Double](bins)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) & 0xff) * bins / 256) += 1.0
      i += 1
    }
    if (bytes.length > 0) {
      var b = 0
      while (b < bins) { counts(b) /= bytes.length; b += 1 }
    }
    counts
  }
}
