package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Real image decode through the multimodal mapPartitions pipeline:
  * generated PNG payloads come back with true dimensions and exact mean
  * luminance, while non-image payloads take the deterministic fallback.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("PNG payloads decode to real dimensions and exact mean luminance") {
    val grey = pngBytes(8, 6, 0x808080)  // every channel 128
    val dark = pngBytes(3, 5, 0x201008)  // channels 32/16/8 → mean 56/3
    val df = Seq((1L, grey), (2L, dark)).toDF("doc_id", "payload")
    val out = Multimodal.decodePayload(spark, df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((8, 6, 1, 128.0)))
    assert(out(2L) == ((3, 5, 1, 56.0 / 3)))
  }

  test("non-image payloads fall back to the md5-derived deterministic fake") {
    val bytes = "not an image at all".getBytes("UTF-8")
    val df = Seq((7L, bytes)).toDF("doc_id", "payload")
    val row = Multimodal.decodePayload(spark, df, "doc_id", "payload")
      .collect().head
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    assert(row.getInt(1) == 16 + hex(0).toInt % 16)
    assert(row.getInt(2) == 16 + hex(1).toInt % 16)
    assert(row.getInt(3) == 1 + bytes.length % 8)
    assert(row.getDouble(4) == hex.map(_.toInt).sum.toDouble / 32)
  }

  test("truncated image magic bytes degrade to the fallback, not a crash") {
    val junk = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 1, 2, 3)
    val df = Seq((9L, junk)).toDF("doc_id", "payload")
    val out = Multimodal.decodePayload(spark, df, "doc_id", "payload").collect()
    assert(out.length == 1, "undecodable image bytes still yield a row")
    assert(out.head.getInt(3) == 1 + junk.length % 8, "fallback features")
  }

  test("text that matches an image magic prefix falls back instead of " +
    "crashing the job") {
    // 'BM...' satisfies the 2-byte BMP sniff; a reader claims it and then
    // throws on the malformed body — decodeOne must catch and degrade
    val bmText = "BM25 ranking is a bag-of-words retrieval function"
      .getBytes("UTF-8")
    val gifText = "GIF89a-like prose that is not actually an image"
      .getBytes("UTF-8")
    val truncatedJpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0)
    val df = Seq((1L, bmText), (2L, gifText), (3L, truncatedJpeg))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodePayload(spark, df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out(1L) == 1 + bmText.length % 8, "BM-prefixed text → fallback")
    assert(out(2L) == 1 + gifText.length % 8, "GIF-prefixed text → fallback")
    assert(out(3L) == 1 + truncatedJpeg.length % 8,
      "truncated JPEG → fallback")
  }

  test("resize: nearest-neighbor downsample of a half/half PNG hits the " +
    "exact mixed mean; output digest is deterministic and shape-bound") {
    // left half black, right half white, 8x4 → resized 4x2 samples
    // columns 0,2,4,6 → 2 black + 2 white per row → mean exactly 127.5
    val img = new BufferedImage(8, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xFFFFFF)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val halfhalf = bos.toByteArray
    val df = Seq((1L, halfhalf)).toDF("doc_id", "payload")
    def run() = Multimodal.resizePayload(spark, df, "doc_id", "payload",
      outW = 4, outH = 2).collect().head
    val r1 = run(); val r2 = run()
    assert((r1.getInt(1), r1.getInt(2)) == ((8, 4)), "source geometry")
    assert((r1.getInt(3), r1.getInt(4)) == ((4, 2)), "target geometry")
    assert(r1.getDouble(6) == 127.5,
      s"NN sample of half/half must mix exactly: ${r1.getDouble(6)}")
    assert(r1.getString(5) == r2.getString(5),
      "resized-buffer digest is run-stable (the downstream cache key)")
    // different target shape → different digest even for the same input
    val other = Multimodal.resizePayload(spark, df, "doc_id", "payload",
      outW = 2, outH = 2).collect().head
    assert(other.getString(5) != r1.getString(5), "digest binds the shape")
  }

  test("resize fallback mirrors the decode fake's geometry and binds the " +
    "target shape into the digest") {
    val bytes = "not an image at all".getBytes("UTF-8")
    val df = Seq((7L, bytes)).toDF("doc_id", "payload")
    val row = Multimodal.resizePayload(spark, df, "doc_id", "payload")
      .collect().head
    def md5hex(b: Array[Byte]) = java.security.MessageDigest
      .getInstance("MD5").digest(b).map("%02x".format(_)).mkString
    val hex = md5hex(bytes)
    assert(row.getInt(1) == 16 + hex(0).toInt % 16 &&
      row.getInt(2) == 16 + hex(1).toInt % 16,
      "fake src geometry matches decodeOne's formulas")
    assert(row.getString(5) == md5hex((hex + "x32x32").getBytes("UTF-8")))
    assert(row.getDouble(6) == hex.map(_.toInt).sum.toDouble / 32)
  }

  test("frameFeatures windows bytes with hop overlap; short payloads skip") {
    import spark.implicits._
    // 10 bytes, frame 4, hop 2 → frames at 0,2,4,6 (start+4 <= 10)
    val bytes = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    val df = Seq((1L, bytes), (2L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    val out = graft.operators.Multimodal
      .frameFeatures(spark, df, "id", "payload", frameLen = 4, hop = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx")) ->
        (r.getAs[Long]("start_byte"), r.getAs[Long]("energy"), r.getAs[Long]("peak")))
      .toMap
    assert(out.keys.count(_._1 == 1L) == 4, "(10-4)/2+1 = 4 frames")
    assert(out((1L, 0L)) == (0L, 1 + 2 + 3 + 4, 4L))
    assert(out((1L, 1L)) == (2L, 3 + 4 + 5 + 6, 6L), "hop-2 overlap")
    assert(out((1L, 3L)) == (6L, 7 + 8 + 9 + 10, 10L))
    assert(!out.keys.exists(_._1 == 2L), "payload shorter than one frame")
  }

  private def gradientPng(w: Int, h: Int, invert: Boolean): Array[Byte] = {
    // left half dark, right half bright — survives any NN resample with
    // the same 8×8 bit pattern, which is the perceptual-hash point
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val bright = (x * 2 >= w) != invert
      img.setRGB(x, y, if (bright) 0xF0F0F0 else 0x101010)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("perceptual hash: scaled copies of one image collide, different " +
    "content does not, and the dedup verdict keeps the min id per hash") {
    val df = Seq(
      (1L, gradientPng(64, 64, invert = false)),
      (2L, gradientPng(16, 32, invert = false)), // same picture, resized
      (3L, gradientPng(64, 64, invert = true)),  // mirrored content
      (4L, "plain text payload".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = Multimodal.phashDedup(spark, df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L)._1 == out(2L)._1,
      "a resize of the same image must produce the SAME perceptual hash")
    assert(out(1L)._1 != out(3L)._1, "inverted content must differ")
    assert(out(1L)._2 == 2L && out(1L)._3 && !out(2L)._3,
      "the scaled pair is one cluster keeping the min id")
    assert(out(3L)._2 == 1L && out(3L)._3)
    // the fake path matches the documented derivation
    val bytes = "plain text payload".getBytes("UTF-8")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${16 + hex(0).toInt % 16}x${16 + hex(1).toInt % 16}x${1 + bytes.length % 8}"
        .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    assert(out(4L)._1 == expect, "fake phash derivation is the contract")
  }
}
