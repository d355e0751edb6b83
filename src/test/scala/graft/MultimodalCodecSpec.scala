package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.multimodal.{ImageCodecs, Multimodal}

/** Real-codec verification: crafted in-test PNG/BMP/WAV fixtures flow
  * through the SAME Spark pipeline entry points as production
  * (`readBinary → extractMeta / extractFeatures / resizeImages`) and
  * come back with REAL dimensions, channel counts, durations, and pixel
  * histograms — proving the decode path is `javax.imageio` /
  * `javax.sound.sampled`, not the deterministic stub fallback.
  */
class MultimodalCodecSpec extends SparkSpec {

  /** 48x32 RGB: left half pure black, right half pure white. */
  private def halfToneImage(): BufferedImage = {
    val img = new BufferedImage(48, 32, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 32; x <- 0 until 48)
      img.setRGB(x, y, if (x < 24) 0x000000 else 0xffffff)
    img
  }

  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, bos), s"no $format writer")
    bos.toByteArray
  }

  /** Mono 16-bit 8 kHz PCM WAV, 4000 frames = exactly 500 ms. */
  private def wavBytes(): Array[Byte] = {
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = Array.tabulate[Byte](4000 * 2)(i => (i % 64).toByte)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 4000L)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("ImageCodecs: header-only decode reads real dims and channels") {
    val png = encode(halfToneImage(), "png")
    assert(ImageCodecs.imageHeader(png).contains((48, 32, 3)))
    val bmp = encode(halfToneImage(), "bmp")
    assert(ImageCodecs.imageHeader(bmp).contains((48, 32, 3)))
    // garbage → None (fallback contract), never an exception
    assert(ImageCodecs.imageHeader("not an image".getBytes).isEmpty)
    assert(ImageCodecs.imageHeader(Array.emptyByteArray).isEmpty)
  }

  test("extractMeta: real PNG/BMP/WAV headers through the Spark path") {
    val dir = java.nio.file.Files.createTempDirectory("realmedia")
    java.nio.file.Files.write(dir.resolve("half.png"),
      encode(halfToneImage(), "png"))
    java.nio.file.Files.write(dir.resolve("half.bmp"),
      encode(halfToneImage(), "bmp"))
    java.nio.file.Files.write(dir.resolve("tone.wav"), wavBytes())

    val binary = Multimodal.readBinary(spark, dir.toString)
    val meta = Multimodal.extractMeta(binary).collect()
      .map(m => m.path.split('/').last -> m).toMap

    assert(meta("half.png").width == 48)
    assert(meta("half.png").height == 32)
    assert(meta("half.png").channels == 3)
    assert(meta("half.bmp").width == 48)
    assert(meta("half.bmp").height == 32)
    assert(meta("tone.wav").channels == 1)
    assert(meta("tone.wav").durationMs == 500L)
  }

  test("extractFeatures: luminance histogram over real pixels") {
    val dir = java.nio.file.Files.createTempDirectory("realfeat")
    java.nio.file.Files.write(dir.resolve("half.png"),
      encode(halfToneImage(), "png"))
    val binary = Multimodal.readBinary(spark, dir.toString)
    val hist = Multimodal.extractFeatures(binary, bins = 4).collect()
      .head.histogram
    // half the pixels are luma 0 (bin 0), half luma 255 (bin 3)
    assert(math.abs(hist(0) - 0.5) < 1e-9)
    assert(hist(1) == 0.0 && hist(2) == 0.0)
    assert(math.abs(hist(3) - 0.5) < 1e-9)
  }

  test("resizeImages: real bilinear resize, PNG round-trip pixels") {
    val dir = java.nio.file.Files.createTempDirectory("realresize")
    java.nio.file.Files.write(dir.resolve("half.png"),
      encode(halfToneImage(), "png"))
    val binary = Multimodal.readBinary(spark, dir.toString)
    val out = Multimodal.resizeImages(binary, 16, 16).collect().head
    assert(out.width == 16 && out.height == 16)

    val img = ImageIO.read(new java.io.ByteArrayInputStream(out.content))
    assert(img != null, "resized content must be a decodable PNG")
    assert(img.getWidth == 16 && img.getHeight == 16)
    // structure survives the scale: left side dark, right side light
    val left = img.getRGB(2, 8) & 0xff
    val right = img.getRGB(13, 8) & 0xff
    assert(left < 32, s"left half should stay dark, got $left")
    assert(right > 223, s"right half should stay light, got $right")
  }

  test("m01 exercises the REAL decode branch on the query surface") {
    // every 50th doc carries a syntheticMedia blob; its decoded dims /
    // duration must match the generator's id-derived formulas — if any
    // real-media row fell through to the stub, widths would be ≥ 64
    // (stub formula) instead of 8..16
    val rows = SparkEntry.queries("m01_media_features")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[String]("path") -> r).toMap
    val media = rows.keys.filter(!_.endsWith(".jpg"))
    assert(media.nonEmpty, "no real-media rows in m01 output")
    media.foreach { path =>
      val id = path.takeWhile(_ != '.').toLong
      val r = rows(path)
      if (path.endsWith(".wav")) {
        assert(r.getAs[String]("kind") == "audio")
        assert(r.getAs[Int]("channels") == 1)
        assert(r.getAs[Long]("duration_ms") == 125L * (1 + id % 8),
          s"$path: stub duration leaked through")
      } else {
        assert(r.getAs[String]("kind") == "image")
        assert(r.getAs[Int]("width") == 8 + (id % 9).toInt,
          s"$path: width must be the real decoded dimension")
        assert(r.getAs[Int]("height") == 8 + (id % 7).toInt)
        assert(r.getAs[Int]("channels") == 3)
      }
    }
    // the fallback branch is still present and still takes the stub
    val jpg = rows.keys.filter(_.endsWith(".jpg"))
    assert(jpg.nonEmpty)
    assert(jpg.forall(p => rows(p).getAs[Int]("width") >= 64))
  }

  test("undecodable bytes degrade to the stub, never throw") {
    val junk = "just some text, not pixels".getBytes("UTF-8")
    val (w, h, ch, _) = graft.multimodal.Codecs.decodeHeader("image", junk)
    assert(w >= 64 && h >= 64 && ch == 3) // stub formula territory
    val resized = graft.multimodal.Codecs.resize(junk, 8, 8)
    assert(resized.length == 64) // stub: min(w*h, 4096)
    val hist = graft.multimodal.Codecs.featureHistogram("image", junk, 4)
    assert(math.abs(hist.sum - 1.0) < 1e-9)
  }
}
