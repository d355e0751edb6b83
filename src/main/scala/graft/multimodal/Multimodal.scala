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
