package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns with a typed metadata struct.
  *
  * IMAGE decode, resize, and pixel-feature extraction are REAL: the
  * JDK ships codecs for PNG/JPEG/BMP/GIF via `javax.imageio`, so
  * [[decodeImage]]/[[resizeImage]]/[[pixelFeatures]] decode actual
  * bytes — no external libraries. AUDIO decode is REAL too:
  * `javax.sound.sampled` reads WAV/AIFF/AU, so [[decodeAudio]]
  * recovers actual PCM samples ([[encodeWavPcm16]] is the writer
  * half of the round-trip). Only VIDEO remains a STUB
  * ([[decodeStub]], [[sampleFramesStub]] — the JDK has no video
  * codec) with deterministic fake outputs and real
  * schema/partitioning plumbing; swap the stub body for a codec
  * (JNI/FFI batch call) without touching the pipeline shape.
  */
object Multimodal {

  final case class ImageInfo(width: Long, height: Long, channels: Long)

  private def readImage(b: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (b == null) None
    else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
    catch { case _: Exception => None }

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF).
    * Emits a `decoded` struct of (width, height, channels); null or
    * undecodable payloads yield a null struct — the null behavior a
    * production decoder needs so one corrupt image never kills a
    * 100 TB scan. UDF by necessity: no Catalyst built-in decodes
    * image containers. */
  def decodeImage(df: DataFrame, binCol: String): DataFrame = {
    val decode = udf { (b: Array[Byte]) =>
      readImage(b).map(img => ImageInfo(img.getWidth.toLong,
        img.getHeight.toLong, img.getColorModel.getNumComponents.toLong))
    }
    df.withColumn("decoded", decode(col(binCol)))
  }

  /** REAL image resize: decode, scale to (targetW x targetH) with
    * bilinear Graphics2D, re-encode as PNG bytes. Narrow per-row
    * work; heavyweight per-batch codec state belongs in
    * [[mapBatches]] instead. */
  def resizeImage(df: DataFrame, binCol: String,
                  targetW: Int = 8, targetH: Int = 8): DataFrame = {
    val resize = udf { (b: Array[Byte]) =>
      readImage(b).map { img =>
        val out = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }
    df.withColumn("resized", resize(col(binCol)))
  }

  /** REAL pixel features: per-channel mean RGB in [0, 1] as
    * `array<float>` — the minimal honest image embedding, with the
    * exact schema a vision encoder emits, so Similarity/Dedup run
    * unchanged on real pixels (payload -> [[resizeImage]] ->
    * pixelFeatures -> `Similarity.*TopK`). */
  def pixelFeatures(df: DataFrame, binCol: String): DataFrame = {
    val feats = udf { (b: Array[Byte]) =>
      readImage(b).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        var r = 0L; var g = 0L; var bl = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; bl += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble * 255.0
        Array((r / n).toFloat, (g / n).toFloat, (bl / n).toFloat)
      }
    }
    df.withColumn("embedding", feats(col(binCol)))
  }

  final case class AudioDecoded(sample_rate: Long, channels: Long,
                                n_samples: Long, samples: Seq[Int])

  /** REAL WAV (PCM16 mono, little-endian) encoder: canonical 44-byte
    * RIFF header + samples. The writer half of the audio round-trip —
    * [[decodeAudio]] must recover these samples bit-exactly. */
  def encodeWavPcm16(samples: Seq[Int], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled`
    * (WAV/AIFF/AU ship with the JRE — no external codecs): emits a
    * `decoded` struct of (sample_rate, channels, n_samples, samples)
    * where n_samples counts frames per channel and samples are the
    * recovered interleaved PCM16 values. Null or undecodable
    * payloads yield a null struct, same contract as
    * [[decodeImage]]. */
  def decodeAudio(df: DataFrame, binCol: String): DataFrame = {
    val decode = udf { (b: Array[Byte]) =>
      if (b == null) None
      else try {
        val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          // normalize whatever the container held (AIFF/AU are
          // big-endian, WAV may be 8/24-bit or unsigned) to signed
          // 16-bit little-endian PCM before the sample loop — the
          // loop's byte arithmetic is only valid for that layout
          val src = raw.getFormat
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            src.getSampleRate, 16, src.getChannels,
            src.getChannels * 2, src.getSampleRate, false)
          val ais =
            if (src.matches(target)) raw
            else javax.sound.sampled.AudioSystem.getAudioInputStream(target, raw)
          try {
            val fmt = ais.getFormat
            val bytes = ais.readAllBytes()
            val n = bytes.length / 2 // interleaved 16-bit samples
            val samples = new Array[Int](n)
            var i = 0
            while (i < n) {
              samples(i) = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
              i += 1
            }
            Some(AudioDecoded(fmt.getSampleRate.toLong, fmt.getChannels.toLong,
              n.toLong / fmt.getChannels, samples.toSeq))
          } finally ais.close()
        } finally raw.close()
      } catch { case _: Exception => None }
    }
    df.withColumn("decoded", decode(col(binCol)))
  }

  /** Metadata struct computed scan-side from the payload: byte size,
    * SHA-256 content address. Codegen'd; no UDF. */
  def withMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("meta", struct(
      length(col(binCol)).cast("long").as("n_bytes"),
      sha2(col(binCol), 256).as("sha256")))

  final case class VideoInfo(n_frames: Long, width: Long, height: Long)
  final case class FrameFeature(frame_idx: Long,
                                f_r: Float, f_g: Float, f_b: Float)

  /** REAL animated-GIF encoder: one palette-indexed solid-color
    * frame per (r, g, b) entry, all `w` x `h`. GIF is the one
    * multi-frame container the JDK ships a codec for, and indexed
    * palettes round-trip colors byte-exactly (no quantization drift
    * between writer and reader). The writer half of the video
    * round-trip — [[decodeVideo]]/[[sampleFrameFeatures]] must
    * recover frame count and per-frame colors exactly. */
  def encodeGifFrames(w: Int, h: Int,
                      frames: Seq[(Int, Int, Int)]): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { case (r, g, b) =>
        val cm = new java.awt.image.IndexColorModel(8, 2,
          Array(r.toByte, 0.toByte), Array(g.toByte, 0.toByte),
          Array(b.toByte, 0.toByte))
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        // the raster is zero-initialized: every pixel = palette
        // index 0 = (r, g, b) exactly
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Run `f` over an ImageIO reader positioned on `b`'s container;
    * None for null/undecodable payloads (the corrupt-payload
    * contract of [[decodeImage]]). */
  private def withReader[T](b: Array[Byte])(
      f: javax.imageio.ImageReader => T): Option[T] =
    if (b == null) None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val r = readers.next()
        try { r.setInput(iis); Some(f(r)) }
        catch { case _: Exception => None }
        finally { r.dispose(); iis.close() }
      }
    } catch { case _: Exception => None }

  /** REAL video decode via the JDK's multi-frame ImageIO path
    * (animated GIF): emits a `decoded` struct of (n_frames, width,
    * height); null or undecodable payloads yield a null struct.
    * Real-world codecs (H.264/VP9) have no JDK decoder — plug them
    * in through [[mapBatches]], which amortizes codec-context setup
    * per partition; the schema and null contract here are what such
    * a decoder must produce. */
  def decodeVideo(df: DataFrame, binCol: String): DataFrame = {
    val decode = udf { (b: Array[Byte]) =>
      withReader(b) { r =>
        // getWidth/getHeight parse the frame header only — a
        // metadata query never pays for pixel decode
        VideoInfo(r.getNumImages(true).toLong,
          r.getWidth(0).toLong, r.getHeight(0).toLong)
      }
    }
    df.withColumn("decoded", decode(col(binCol)))
  }

  /** REAL frame sampling + per-frame features: decode every
    * `stride`-th frame and emit its mean-RGB feature (the same
    * minimal honest embedding [[pixelFeatures]] computes for
    * images) as an array of (frame_idx, f_r, f_g, f_b) structs —
    * explode downstream for per-frame rows. One narrow UDF per
    * payload; only sampled frames are decoded.
    *
    * Decode contract (like the pluggable-codec note on
    * [[decodeVideo]]): frames are read INDEPENDENTLY via r.read(i),
    * which yields the raw stored raster — exact for full-frame GIFs
    * (the fixtures, and what [[Fixtures]]-style encoders emit), but a
    * GIF using frame disposal/partial (delta) frames would need
    * compositing per its disposal metadata before the mean is the
    * DISPLAYED frame's. A production codec plugged in through
    * [[mapBatches]] must hand this operator composited frames. */
  def sampleFrameFeatures(df: DataFrame, binCol: String,
                          stride: Int = 2): DataFrame = {
    // validated HERE: inside the UDF the withReader catch (broad by
    // design — corrupt GIFs make ImageIO throw RuntimeExceptions,
    // not just IIOException) would turn the bug into null rows
    // indistinguishable from corrupt payloads
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val sample = udf { (b: Array[Byte]) =>
      withReader(b) { r =>
        val n = r.getNumImages(true)
        (0 until n by stride).map { i =>
          val img = r.read(i)
          val (w, h) = (img.getWidth, img.getHeight)
          var rr = 0L; var gg = 0L; var bb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              rr += (p >> 16) & 0xff; gg += (p >> 8) & 0xff; bb += p & 0xff
              x += 1
            }
            y += 1
          }
          val d = (w.toLong * h).toDouble * 255.0
          FrameFeature(i.toLong,
            (rr / d).toFloat, (gg / d).toFloat, (bb / d).toFloat)
        }
      }
    }
    df.withColumn("frames", sample(col(binCol)))
  }

  /** STUB decode for codec-less media (formats with no JDK codec —
    * e.g. H.264/MP4; images use the REAL [[decodeImage]], WAV audio
    * the REAL [[decodeAudio]], animated GIF the REAL
    * [[decodeVideo]]): deterministic fake dimensions derived from
    * payload length (`1 + n % 64`). The column types and null
    * behavior match what a real decoder would produce. */
  def decodeStub(df: DataFrame, binCol: String): DataFrame = {
    val n = length(col(binCol)).cast("long")
    df.withColumn("decoded", struct(
      (lit(1L) + pmod(n, lit(64L))).as("width"),
      (lit(1L) + pmod(n * 7L, lit(64L))).as("height"),
      lit(3L).as("channels")))
  }

  /** Partition-local batch API for heavyweight decoders: the
    * reference shape for anything that must amortize per-batch setup
    * (model weights, codec contexts) — the Scala analog of
    * mapInPandas. Rows stream through one partition at a time;
    * `decode` sees the raw bytes and returns fixed-schema features.
    */
  def mapBatches(df: DataFrame, binCol: String,
                 featureSchema: StructType)(
                 decode: Iterator[Array[Byte]] => Iterator[Row]): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", featureSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // duplicate + lockstep zip keeps memory bounded by the decoder's
      // internal batch (the duplicate gap), NOT the partition size —
      // a fully-buffered partition of binary payloads is exactly what
      // blows an executor at corpus scale
      val (forFeatures, forRows) = rows.duplicate
      val feats = decode(forFeatures.map(_.getAs[Array[Byte]](binIdx)))
      forRows.zip(feats).map { case (r, f) =>
        Row.fromSeq(r.toSeq :+ f)
      }
    }(encoder)
  }

  /** STUB resize for codec-less media (images use the REAL
    * [[resizeImage]]): deterministic truncation of the payload to
    * `targetBytes`, keeping the binary-in/binary-out column contract
    * (narrow, codegen'd). */
  def resizeStub(df: DataFrame, binCol: String, targetBytes: Int = 256): DataFrame =
    df.withColumn("resized", col(binCol).substr(lit(1), lit(targetBytes)))

  /** STUB feature extractor: a deterministic pseudo-embedding
    * (md5-derived floats in [-1, 1)) with the exact schema a real
    * vision/audio encoder would emit (`array<float>`), so the
    * downstream Similarity/Dedup operators run unchanged. Chain:
    * payloads -> [[resizeStub]] -> embedStub -> `Similarity.*TopK`.
    */
  def embedStub(df: DataFrame, binCol: String, dim: Int = 8): DataFrame =
    df.withColumn("embedding",
      transform(sequence(lit(0), lit(dim - 1)),
        j => {
          val x = conv(substring(md5(concat(j.cast("string"), base64(col(binCol)))), 1, 12),
            16, 10).cast("double") / lit((1L << 48).toDouble) * 2.0 - 1.0
          // clamp below 1 (the double->float cast would round values in
          // (1 - 2^-25, 1) up to exactly 1.0f); when/otherwise rather
          // than least() so a NULL payload keeps a NULL element instead
          // of collapsing onto a shared constant vector
          when(x > lit(0.99999994), lit(0.99999994)).otherwise(x).cast("float")
        }))

  /** STUB frame sampler for video-ish payloads: every `stride`-th
    * byte as a "frame id" — stands in for frame extraction while
    * exercising array-of-binary schema. */
  def sampleFramesStub(df: DataFrame, binCol: String, stride: Int = 16): DataFrame =
    df.withColumn("frames",
      transform(sequence(lit(0), floor((length(col(binCol)).cast("int") - 1) / stride).cast("int")),
        i => col(binCol).substr(i * stride + 1, lit(stride))))
}
