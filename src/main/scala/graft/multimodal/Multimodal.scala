package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.b extension): image/audio/
  * video as opaque `binary` columns with typed metadata, processed by
  * per-partition batch functions (the Scala analog of `mapInPandas`
  * batches — one iterator pass per partition, no per-row serialization).
  *
  * Image and audio decode are REAL, backed by the public JDK codecs
  * ([[ImageCodecs]]: `javax.imageio` for PNG/BMP/JPEG/GIF headers,
  * pixels, and resize; `javax.sound.sampled` for WAV/AIFF/AU headers).
  * Bytes that no installed reader recognizes fall back to the
  * deterministic [[StubCodecs]] so the pipeline never throws on dirty
  * corpora and synthetic tests stay stable. Video frame-grab remains an
  * honest stub — the JDK ships no video codec and the container has no
  * ffmpeg; the flatMap shape and timing contract are the production
  * ones.
  *
  * Scale notes: `binaryFile` caps file size at
  * `spark.sql.sources.binaryFile.maxLength` (2 GB); one file = one task,
  * so parallelism follows file count, and `maxPartitionBytes` groups
  * small files per task. Feature extraction is map-side only — the wide
  * `content` column must be dropped (not carried) before any shuffle.
  * Header-only metadata ([[extractMeta]]) never decodes pixels: a
  * 100 TB image corpus pays only header reads, not full decode.
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
        // ImageIO reader instances are fetched per call; registry init
        // happens once per executor JVM (static ImageIO scan)
        batch.map { case (path, bytes) =>
          val kind = kindOf(path)
          val (w, h, ch, dur) = Codecs.decodeHeader(kind, bytes)
          MediaMeta(path, kind, bytes.length.toLong, w, h, ch, dur)
        }
      }
  }

  /** Per-partition feature extraction: content fingerprint + a fixed-
    * width "embedding". For decodable images this is a REAL luminance
    * pixel histogram (decode → BT.601 luma → normalized bins); for
    * everything else a byte-value histogram (the stand-in for a model
    * forward pass). Drops `content` in the output, so anything
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
            Codecs.featureHistogram(kindOf(path), bytes, bins))
        }
      }
  }

  final case class ResizedImage(path: String, width: Int, height: Int,
                                content: Array[Byte])

  /** Per-partition image resize to a fixed target (the normalization
    * step before a vision model). REAL for any ImageIO-readable format:
    * decode → bilinear `Graphics2D.drawImage` scale → PNG re-encode
    * (lossless, so tests can assert pixels). Undecodable bytes fall
    * back to the deterministic stub transform. Binary in, binary out,
    * target dims in the row — downstream batching (e.g. stacking into
    * model-input tensors per partition) plugs in unchanged.
    */
  def resizeImages(binary: DataFrame, width: Int, height: Int)
      : Dataset[ResizedImage] = {
    import binary.sparkSession.implicits._
    binary.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (path, bytes) =>
          ResizedImage(path, width, height,
            Codecs.resize(bytes, width, height))
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
          val (_, _, _, durMs) = Codecs.decodeHeader("video", bytes)
          (0 until n).iterator.map { i =>
            val tsMs = if (n == 1) 0L else durMs * i / (n - 1)
            VideoFrame(path, i, tsMs, StubCodecs.grabFrame(bytes, i, n))
          }
        }
      }
  }

  /** Deterministic REAL media blobs derived from an id column — the
    * fixture generator for synthetic corpora that carry no media files:
    * id mod 3 picks PNG / BMP (ImageIO-encoded gradient images whose
    * dims derive from the id) or WAV (`javax.sound` PCM whose duration
    * derives from the id), so the real decode branch of
    * [[extractMeta]]/[[extractFeatures]] is exercised on the query
    * surface, not only in codec unit tests. Encoding runs per-partition
    * on executors (the stand-in for fetching a blob from object
    * storage) — no driver bottleneck at any scale. Returns
    * (path, content) rows; every field a real decoder reads back
    * (width = 8 + id mod 9, height = 8 + id mod 7, WAV duration
    * = 125·(1 + id mod 8) ms) is reproducible from the path's id.
    */
  def syntheticMedia(ids: DataFrame, idCol: String): DataFrame = {
    import ids.sparkSession.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { batch =>
        batch.map { id =>
          (math.floorMod(id, 3L): @unchecked) match {
            case 0L => (s"$id.png", SyntheticMedia.imageBytes(id, "png"))
            case 1L => (s"$id.bmp", SyntheticMedia.imageBytes(id, "bmp"))
            case 2L => (s"$id.wav", SyntheticMedia.wavBytes(id))
          }
        }
      }
      .toDF("path", "content")
  }
}

/** Executor-side encoders for [[Multimodal.syntheticMedia]]: tiny real
  * PNG/BMP/WAV payloads, pure functions of the id.
  */
object SyntheticMedia {
  import java.awt.image.BufferedImage
  import java.io.ByteArrayOutputStream
  import javax.imageio.ImageIO
  import javax.sound.sampled.{AudioFileFormat, AudioFormat,
    AudioInputStream, AudioSystem}

  /** (8 + id mod 9) × (8 + id mod 7) RGB gradient image, really
    * encoded by ImageIO in the given format.
    */
  def imageBytes(id: Long, format: String): Array[Byte] = {
    val w = 8 + (math.floorMod(id, 9L)).toInt
    val h = 8 + (math.floorMod(id, 7L)).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (id + x * 31 + y * 17) & 0xff
      val g = (id * 7 + x * 13 + y * 29) & 0xff
      val b = (id * 13 + x * 5 + y * 43) & 0xff
      img.setRGB(x, y, (r << 16 | g << 8 | b).toInt)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Mono 16-bit 8 kHz PCM WAV, 1000·(1 + id mod 8) frames
    * = 125·(1 + id mod 8) ms, sawtooth samples seeded by the id.
    */
  def wavBytes(id: Long): Array[Byte] = {
    val frames = 1000 * (1 + math.floorMod(id, 8L)).toInt
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = Array.tabulate[Byte](frames * 2)(i =>
      ((id + i * 3) % 97).toByte)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}

/** Codec dispatch: try the real JDK decoder for the media kind, fall
  * back to [[StubCodecs]] when no installed reader recognizes the bytes
  * (dirty corpora must degrade, not throw — at 100 TB a fraction of a
  * percent of corrupt files is millions of rows). Video has no JDK
  * codec, so it is always the stub (honestly so — see Multimodal
  * scaladoc).
  */
object Codecs {

  /** (width, height, channels, durationMs) from the container header
    * only — pixels are never decoded here.
    */
  def decodeHeader(kind: String, bytes: Array[Byte])
      : (Int, Int, Int, Long) = kind match {
    case "image" =>
      ImageCodecs.imageHeader(bytes)
        .map { case (w, h, ch) => (w, h, ch, 0L) }
        .getOrElse(StubCodecs.decodeHeader(kind, bytes))
    case "audio" =>
      ImageCodecs.audioHeader(bytes)
        .map { case (ch, durMs) => (0, 0, ch, durMs) }
        .getOrElse(StubCodecs.decodeHeader(kind, bytes))
    case _ => StubCodecs.decodeHeader(kind, bytes)
  }

  /** Real bilinear resize + PNG re-encode when decodable, stub bytes
    * otherwise.
    */
  def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte] =
    ImageCodecs.resizePng(bytes, width, height)
      .getOrElse(StubCodecs.resize(bytes, width, height))

  /** Normalized histogram feature: luminance over real pixels for
    * decodable images, byte values otherwise.
    */
  def featureHistogram(kind: String, bytes: Array[Byte], bins: Int)
      : Array[Double] =
    (if (kind == "image") ImageCodecs.lumaHistogram(bytes, bins)
     else None).getOrElse(StubCodecs.byteHistogram(bytes, bins))
}

/** Real image/audio codecs over the public JDK — zero extra
  * dependencies. `javax.imageio.ImageIO` reads PNG/BMP/JPEG/GIF/WBMP;
  * `javax.sound.sampled.AudioSystem` parses WAV/AIFF/AU headers. All
  * entry points return None on unrecognized/corrupt bytes so [[Codecs]]
  * can fall back instead of failing the task.
  */
object ImageCodecs {
  import java.awt.RenderingHints
  import java.awt.image.BufferedImage
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
  import javax.imageio.ImageIO
  import javax.sound.sampled.AudioSystem

  /** (width, height, channels) from the image header WITHOUT decoding
    * pixels — `ImageReader.getWidth/getHeight` parse only the header,
    * so metadata extraction over a huge corpus is I/O-bound on headers,
    * not CPU-bound on decode.
    */
  def imageHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          val types = reader.getImageTypes(0)
          val ch =
            if (types.hasNext) types.next().getColorModel.getNumComponents
            else 3
          Some((w, h, ch))
        } finally reader.dispose()
      }
    } catch { case _: Exception => None }
    finally if (iis != null) iis.close()
  }

  /** (channels, durationMs) from the audio file header (WAV/AIFF/AU). */
  def audioHeader(bytes: Array[Byte]): Option[(Int, Long)] =
    try {
      val fileFormat =
        AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
      val format = fileFormat.getFormat
      val frames = fileFormat.getFrameLength
      val durMs =
        if (frames > 0 && format.getFrameRate > 0)
          (frames * 1000.0 / format.getFrameRate).toLong
        else 0L
      Some((format.getChannels, durMs))
    } catch { case _: Exception => None }

  /** Full pixel decode; None when no reader matches. */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Bilinear rescale to (width, height), re-encoded as PNG (lossless,
    * so round-trip pixel assertions hold).
    */
  def resizePng(bytes: Array[Byte], width: Int, height: Int)
      : Option[Array[Byte]] =
    decode(bytes).map { img =>
      val out = new BufferedImage(width, height,
        BufferedImage.TYPE_3BYTE_BGR)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, width, height, null)
      } finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      bos.toByteArray
    }

  /** Normalized BT.601 luminance histogram over real pixels. */
  def lumaHistogram(bytes: Array[Byte], bins: Int): Option[Array[Double]] =
    decode(bytes).map { img =>
      val counts = new Array[Double](bins)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val luma = (((rgb >> 16) & 0xff) * 299 +
            ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          counts(luma * bins / 256) += 1.0
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      if (n > 0) { var b = 0; while (b < bins) { counts(b) /= n; b += 1 } }
      counts
    }
}

/** Deterministic stand-ins used when the real codecs can't read the
  * bytes (and for video, which has no JDK codec). Everything derives
  * from the bytes themselves, so tests are stable and the pipeline is
  * runnable end-to-end on any input.
  */
object StubCodecs {

  /** STUB decode: width/height/channels/duration derived from content
    * length and a stable hash.
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

  /** STUB resize fallback: deterministic re-hash of the content sized
    * to the target dims (used only when ImageIO can't decode).
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

  /** STUB frame grab: a deterministic slice per frame index — the one
    * remaining stub (an ffmpeg seek+decode in production; no JDK codec).
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
