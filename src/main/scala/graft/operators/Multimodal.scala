package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * steps as partition-batched transforms.
  *
  * The decode step dispatches on the payload's magic bytes:
  *  - real raster images (PNG/JPEG/GIF/BMP) decode through `javax.imageio`
  *    (in the JDK — no external codec needed) into true width/height and
  *    mean luminance;
  *  - anything else (incl. the test corpus's utf-8 stand-in payloads)
  *    falls back to a DETERMINISTIC FAKE whose features are pure functions
  *    of the payload's md5 and byte length — functions an oracle engine
  *    mirrors in SQL, so the fallback path keeps a hash-checked
  *    correctness row while the image path is exercised by unit specs on
  *    generated PNGs.
  *
  * Scale notes: payload bytes stay columnar in parquet; the decode
  * transform is a narrow map (no shuffle) so it scales linearly with
  * executors; `spark.sql.files.maxPartitionBytes` bounds per-task memory
  * for large blobs. Video/audio remain fallback-only (no codec in the
  * JDK); a JNI/FFI decoder plugs into the same `mapPartitions` shape.
  */
object Multimodal {

  /** Binary payload + pure-SQL metadata (real, oracle-checkable): byte
    * length, md5 digest, hex prefix. `payload` here is the utf-8 encoding of
    * the text column — standing in for image bytes.
    */
  def withPayloadMeta(df: DataFrame, textCol: String): DataFrame = {
    val bin = encode(col(textCol), "utf-8")
    df.withColumn("n_bytes", length(bin).cast("long"))
      .withColumn("digest", md5(bin))
      .withColumn("head_hex", hex(substring(bin, 1, 8)))
  }

  case class DecodedFeature(doc_id: Long, width: Int, height: Int,
                            n_frames: Int, hex_mean: Double)

  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      // PNG \x89PNG
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      // JPEG FF D8 FF
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
      // GIF8
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      // BMP
      (b(0) == 'B' && b(1) == 'M'))

  /** Decode one payload: real image decode when the magic bytes say image
    * and imageio can parse it; md5-derived deterministic fake otherwise.
    */
  private def decodeOne(md: java.security.MessageDigest, id: Long,
                        bytes: Array[Byte]): DecodedFeature = {
    if (looksLikeImage(bytes)) {
      // ImageIO returns null when no reader claims the stream but THROWS
      // when a reader claims it by magic bytes and the body is malformed
      // (truncated JPEG, text that happens to start with "BM"/"GIF8"…) —
      // either way the row must degrade to the fallback, not kill the job
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img != null) {
        // mean luminance over all pixels: (r+g+b)/3 averaged. Integer sum
        // first (exact), one division at the end — deterministic.
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        val nPx = img.getWidth.toLong * img.getHeight
        return DecodedFeature(id, img.getWidth, img.getHeight, 1,
          sum.toDouble / (3L * nPx))
      }
    }
    // deterministic fake (oracle mirrors this in SQL via md5/ascii/length)
    md.reset()
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    DecodedFeature(id,
      16 + hex(0).toInt % 16,
      16 + hex(1).toInt % 16,
      1 + bytes.length % 8,
      hex.map(_.toInt).sum.toDouble / 32)
  }

  /** Decode features from a BINARY payload column via `mapPartitions` —
    * one output row per input row, explicit output schema, per-partition
    * decoder state (the production shape for any batch decoder).
    */
  def decodePayload(spark: SparkSession, df: DataFrame, idCol: String,
                    payloadCol: String): DataFrame = {
    import spark.implicits._
    // NULL payloads drop like every SQL-side operator (same contract as
    // frameFeatures — an unguarded bytes.length would NPE the task where
    // an oracle's WHERE just omits the row)
    val src = df.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"))
      .where(col("payload").isNotNull)
    src.as[(Long, Array[Byte])].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no disk-backed temp cache
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, bytes) => decodeOne(md, id, bytes) }
    }.toDF()
  }

  case class ResizedImage(doc_id: Long, src_w: Int, src_h: Int,
                          out_w: Int, out_h: Int, out_digest: String,
                          out_mean: Double)

  /** Resize one payload to (outW, outH): real NEAREST-NEIGHBOR resample
    * for decodable images — NN sampling is bit-exact on every JVM,
    * unlike Graphics2D interpolation, so the output digest is a stable
    * contract — and the md5-derived deterministic fake otherwise (same
    * src_w/src_h formulas as [[decodeOne]], so decode and resize agree
    * on the fake geometry; out_digest binds the input digest to the
    * target shape so different resize targets cannot hash-collide).
    */
  private def resizeOne(md: java.security.MessageDigest, id: Long,
                        bytes: Array[Byte], outW: Int, outH: Int): ResizedImage = {
    if (looksLikeImage(bytes)) {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img != null) {
        val buf = new Array[Byte](outW * outH * 3)
        var sum = 0L
        var i = 0
        var oy = 0
        while (oy < outH) {
          var ox = 0
          while (ox < outW) {
            val sx = (ox.toLong * img.getWidth / outW).toInt
            val sy = (oy.toLong * img.getHeight / outH).toInt
            val rgb = img.getRGB(sx, sy)
            val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            buf(i) = r.toByte; buf(i + 1) = g.toByte; buf(i + 2) = b.toByte
            sum += r + g + b
            i += 3; ox += 1
          }
          oy += 1
        }
        md.reset()
        val dig = md.digest(buf).map("%02x".format(_)).mkString
        return ResizedImage(id, img.getWidth, img.getHeight, outW, outH,
          dig, sum.toDouble / (3L * outW * outH))
      }
    }
    md.reset()
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    md.reset()
    val dig = md.digest((hex + s"x${outW}x${outH}").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    ResizedImage(id, 16 + hex(0).toInt % 16, 16 + hex(1).toInt % 16,
      outW, outH, dig, hex.map(_.toInt).sum.toDouble / 32)
  }

  /** The resize step of an image-preprocessing pipeline (decode →
    * RESIZE → feature-extract), partition-batched like [[decodePayload]]:
    * one output row per payload with the source/target geometry, the
    * resized buffer's digest (the dedup/caching key downstream stages
    * join on), and the mean channel value. Narrow map, no shuffle; the
    * resized buffer itself is transient per-row scratch — only digest +
    * stats leave the task, so 100 TB of images never re-materialize.
    */
  def resizePayload(spark: SparkSession, df: DataFrame, idCol: String,
                    payloadCol: String, outW: Int = 32,
                    outH: Int = 32): DataFrame = {
    require(outW > 0 && outH > 0, s"target must be positive: ${outW}x$outH")
    import spark.implicits._
    val src = df.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"))
      .where(col("payload").isNotNull)
    src.as[(Long, Array[Byte])].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, bytes) => resizeOne(md, id, bytes, outW, outH) }
    }.toDF()
  }

  /** Corpus entry point for the resize step (utf-8 stand-in payloads →
    * the deterministic-fake path, oracle-checked like decodeFeatures).
    */
  def resizeFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                     textCol: String, outW: Int = 32, outH: Int = 32): DataFrame =
    resizePayload(spark,
      df.select(col(idCol), encode(col(textCol), "utf-8").as("__payload")),
      idCol, "__payload", outW, outH)

  case class Frame(doc_id: Long, frame_idx: Long, start_byte: Long,
                   energy: Long, peak: Long)

  /** Frame-sample a payload into overlapping windows with per-frame
    * integer features — the audio/video feature-extraction shape (think
    * PCM frames or video GOPs): `frameLen` bytes per frame advancing by
    * `hop`, per-frame energy (Σ unsigned bytes) and peak. Imperative
    * per-partition loop like [[decodePayload]] — a real codec's
    * frame iterator drops into the same `mapPartitions` slot; output rows
    * are (payload rows × frames), still a narrow map with no shuffle.
    * Payloads shorter than one frame emit nothing (no partial frames).
    */
  def frameFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                    payloadCol: String, frameLen: Int = 64,
                    hop: Int = 32): DataFrame = {
    require(frameLen > 0 && hop > 0,
      s"frameLen and hop must be positive (no-overlap is hop == frameLen), " +
        s"got frameLen=$frameLen hop=$hop")
    import spark.implicits._
    // NULL payloads drop like every SQL-side operator (an unguarded
    // bytes.length would NPE the task where an oracle's WHERE just
    // omits the row)
    val src = df.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"))
      .where(col("payload").isNotNull)
    src.as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val n = bytes.length
        val nFrames = if (n < frameLen) 0 else (n - frameLen) / hop + 1
        (0 until nFrames).iterator.map { f =>
          val start = f * hop
          var sum = 0L
          var peak = 0L
          var k = 0
          while (k < frameLen) {
            val v = bytes(start + k) & 0xFF
            sum += v
            if (v > peak) peak = v
            k += 1
          }
          Frame(id, f, start.toLong, sum, peak)
        }
      }
    }.toDF()
  }

  /** Corpus entry point: the utf-8 bytes of `textCol` stand in for image
    * payloads (they fail the magic-byte sniff, so this exercises the
    * deterministic-fake path end-to-end against the DuckDB oracle).
    */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                     textCol: String): DataFrame =
    decodePayload(spark,
      df.select(col(idCol), encode(col(textCol), "utf-8").as("__payload")),
      idCol, "__payload")

  case class PHashed(doc_id: Long, phash: String)

  /** Perceptual average-hash of one payload. Decodable images take the
    * real aHash: NN-resample to 8×8 (the same bit-exact sampling as
    * [[resizeOne]]), integer Rec.601 luma, threshold each cell at the
    * integer mean → 64 bits, hex-encoded. Two crops/scales of one image
    * produce the SAME hash (that is the point of a perceptual hash — the
    * MultimodalSpec law resizes a gradient PNG and demands equality),
    * while content changes flip bits. Non-images take the deterministic
    * fake derived from [[decodeOne]]'s fake geometry (w × h × n_frames),
    * so "similar-looking" fakes genuinely collide and the dedup verdict
    * binds on the text-payload corpus.
    */
  private def phashOne(md: java.security.MessageDigest, id: Long,
                       bytes: Array[Byte]): PHashed = {
    if (looksLikeImage(bytes)) {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img != null) {
        val lum = new Array[Int](64)
        var sum = 0L
        var i = 0
        var oy = 0
        while (oy < 8) {
          var ox = 0
          while (ox < 8) {
            val sx = (ox.toLong * img.getWidth / 8).toInt
            val sy = (oy.toLong * img.getHeight / 8).toInt
            val rgb = img.getRGB(sx, sy)
            val l = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            lum(i) = l; sum += l
            i += 1; ox += 1
          }
          oy += 1
        }
        val mean = (sum / 64).toInt // integer mean — deterministic
        var bits = 0L
        i = 0
        while (i < 64) { if (lum(i) > mean) bits |= 1L << i; i += 1 }
        return PHashed(id, f"$bits%016x")
      }
    }
    md.reset()
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    val w = 16 + hex(0).toInt % 16
    val h = 16 + hex(1).toInt % 16
    val frames = 1 + bytes.length % 8
    md.reset()
    PHashed(id, md.digest(s"${w}x${h}x$frames".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16))
  }

  /** Perceptual hash per payload row — narrow mapPartitions like
    * [[decodePayload]]; only the 16-hex-char hash leaves the task.
    */
  def phashPayload(spark: SparkSession, df: DataFrame, idCol: String,
                   payloadCol: String): DataFrame = {
    import spark.implicits._
    val src = df.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"))
      .where(col("payload").isNotNull)
    src.as[(Long, Array[Byte])].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, bytes) => phashOne(md, id, bytes) }
    }.toDF()
  }

  /** Image-level dedup on the perceptual hash: keep-first (min id) per
    * hash, with the copy count — [[graft.operators.Dedup.urlDedup]]'s
    * verdict shape applied to the image modality. Scale: the hash is a
    * narrow per-row map; the verdict is ONE hash exchange on a 16-char
    * key (budget-pinned).
    */
  def phashDedup(spark: SparkSession, df: DataFrame, idCol: String,
                 payloadCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("phash"))
    phashPayload(spark, df, idCol, payloadCol)
      .withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(w))
  }

  /** Corpus entry point for the text-payload stand-ins. */
  def phashFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    phashDedup(spark,
      df.select(col(idCol), encode(col(textCol), "utf-8").as("__payload")),
      idCol, "__payload")
}
