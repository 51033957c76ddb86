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
  * half of the round-trip). VIDEO decode is REAL for animated GIF
  * — the one multi-frame container the JDK can read —
  * ([[decodeVideo]], [[sampleFrameFeatures]],
  * [[videoFingerprint64]], with [[encodeGifFrames]] as the writer
  * half of the round-trip). Codecs the JDK lacks (H.264/MP4-class)
  * remain STUBS with deterministic fake outputs and real
  * schema/partitioning plumbing ([[decodeStub]],
  * [[sampleFramesStub]], [[resizeStub]], [[embedStub]]); swap the
  * stub body for a codec (a JNI/FFI [[mapBatches]] call) without
  * touching the pipeline shape.
  */
object Multimodal {

  final case class ImageInfo(width: Long, height: Long, channels: Long)

  /** ImageIO plumbing cost (optimization round 16; global removed in
    * round 17 per the r16 advice): with the default
    * `ImageIO.getUseCache() == true`, EVERY `ImageIO.read`/`write`
    * and `createImage{In,Out}putStream` call backs its stream with a
    * temp FILE — one file create/write/delete per decoded row in a
    * per-row UDF, plus a fresh SPI reader lookup + reader instance
    * per call. Memory-cached streams and per-thread reader reuse
    * decode the same bytes to the same pixels through the same codec
    * classes (ImageIO.read itself is `setInput(stream, true, true);
    * read(0)` on the first SPI reader — replicated verbatim below);
    * only the plumbing goes. Round 16 additionally flipped the
    * PROCESS-WIDE `ImageIO.setUseCache(false)` to cover the encode
    * halves; round 17 removes that JVM-global mutation (a host
    * application relying on disk-backed streams to bound heap for
    * huge images would have been silently reconfigured) and instead
    * wraps every encode/read call site in an explicit
    * MemoryCache stream — same bytes, no global state. */
  private val readerCache =
    ThreadLocal.withInitial[java.util.HashMap[String, javax.imageio.ImageReader]](
      () => new java.util.HashMap())

  /** Container sniff for the formats the fixtures and common crawl
    * payloads actually carry; anything else takes the generic SPI
    * path unchanged. */
  private def formatOf(b: Array[Byte]): String =
    if (b.length >= 4 && (b(0) & 0xff) == 0x89 && b(1) == 'P'.toByte &&
        b(2) == 'N'.toByte && b(3) == 'G'.toByte) "png"
    else if (b.length >= 4 && b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
        b(2) == 'F'.toByte && b(3) == '8'.toByte) "gif"
    else null

  private def cachedReader(fmt: String): javax.imageio.ImageReader = {
    val m = readerCache.get()
    var r = m.get(fmt)
    if (r == null) {
      r = javax.imageio.ImageIO.getImageReadersByFormatName(fmt).next()
      m.put(fmt, r)
    }
    r
  }

  /** PNG re-encode to an in-memory buffer through an explicit
    * memory-cached stream (no ImageIO.getUseCache consultation, no
    * temp file) — the shared encode plumbing of the resize path and
    * the fixture writers. */
  private[graft] def writePng(img: java.awt.image.RenderedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try javax.imageio.ImageIO.write(img, "png", ios)
    finally ios.close() // flushes the cached bytes into bos
    bos.toByteArray
  }

  private def readImage(b: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (b == null) None
    else try {
      val fmt = formatOf(b)
      if (fmt == null)
        // the ImageInputStream overload skips createImageInputStream's
        // getUseCache consultation; same SPI reader selection
        Option(javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(b))))
      else {
        val r = cachedReader(fmt)
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(b))
        // ImageIO.read's exact protocol: seekForwardOnly,
        // ignoreMetadata, frame 0, default param
        try { r.setInput(iis, true, true); Option(r.read(0)) }
        finally { r.reset(); iis.close() }
      }
    } catch { case _: Exception => None }

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
        writePng(out)
      }
    }
    df.withColumn("resized", resize(col(binCol)))
  }

  /** Per-channel mean RGB in [0, 1] via bulk SCANLINE reads: one
    * color-model conversion call per row (`getRGB(0, y, w, 1, ...)`)
    * instead of one bounds-checked conversion per pixel — identical
    * ARGB ints and sums to the per-pixel form (measured ~5-10x less
    * call overhead), byte-identical output. Row-at-a-time keeps the
    * staging buffer at `w` ints however tall the image. */
  private def meanRgb(img: java.awt.image.BufferedImage): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    var r = 0L; var g = 0L; var bl = 0L
    val buf = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, buf, 0, w)
      var x = 0
      while (x < w) {
        val p = buf(x)
        r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; bl += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble * 255.0
    Array((r / n).toFloat, (g / n).toFloat, (bl / n).toFloat)
  }

  /** REAL pixel features: per-channel mean RGB in [0, 1] as
    * `array<float>` — the minimal honest image embedding, with the
    * exact schema a vision encoder emits, so Similarity/Dedup run
    * unchanged on real pixels (payload -> [[resizeImage]] ->
    * pixelFeatures -> `Similarity.*TopK`). */
  def pixelFeatures(df: DataFrame, binCol: String): DataFrame = {
    val feats = udf { (b: Array[Byte]) => readImage(b).map(meanRgb) }
    df.withColumn("embedding", feats(col(binCol)))
  }

  /** 64-bit difference hash (dHash) of REAL decoded pixels — the
    * perceptual fingerprint every large-scale image pipeline computes
    * before near-dup removal (robust to re-encode, scale, and small
    * edits, unlike the byte hash `mm_dedup` groups on). Decode via
    * ImageIO, bilinear-resize to the canonical 9x8 grid when the
    * image isn't already that size, then bit (x, y) = 1 iff
    * green(x+1, y) > green(x, y) — 8 horizontal gradients per row, 8
    * rows, packed little-endian into ONE long (bit index y*8 + x).
    * The green channel is the dominant luminance term and keeps the
    * comparison integer-exact for the SQL oracle; production
    * pipelines use a luma blend, same structure. UDF by necessity
    * (codec); downstream banding/joins are pure narrow Catalyst.
    * Null/undecodable payloads hash to null and fall out of the
    * self-join — one corrupt image never kills the scan.
    * Output: input columns + `phash` (long). */
  def dHash64(df: DataFrame, binCol: String): DataFrame = {
    val hash = udf { (b: Array[Byte]) =>
      readImage(b).map { img0 =>
        val img =
          if (img0.getWidth == 9 && img0.getHeight == 8) img0
          else {
            val out = new java.awt.image.BufferedImage(9, 8,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img0, 0, 0, 9, 8, null)
            } finally g.dispose()
            out
          }
        val buf = new Array[Int](9)
        var bits = 0L
        var y = 0
        while (y < 8) {
          img.getRGB(0, y, 9, 1, buf, 0, 9)
          var x = 0
          while (x < 8) {
            if (((buf(x + 1) >> 8) & 0xff) > ((buf(x) >> 8) & 0xff))
              bits |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        bits
      }
    }
    df.withColumn("phash", hash(col(binCol)))
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

  /** 64-bit acoustic fingerprint of REAL decoded audio — the
    * energy-gradient sketch (the same difference-hash idea as
    * [[dHash64]], on the waveform's frame-energy envelope instead of
    * pixel rows; production systems like Chromaprint fingerprint
    * spectral-band gradients, same structure). The payload decodes
    * through the real `javax.sound` codec ([[decodeAudio]]), then:
    * frame f's energy = sum of |sample| over `frame` consecutive
    * samples; bit b = 1 iff energy(b+1) > energy(b), 64 gradient
    * bits over 65 frames packed into one long. Everything after the
    * codec UDF is pure Catalyst (array expressions + a 64-term
    * literal sum) — integer-exact, so a SQL oracle replays it from
    * the sample-generation arithmetic. Audio shorter than 65 frames
    * (or undecodable) fingerprints to null and falls out of any
    * downstream self-join.
    * Output: input columns + `fp` (long). Near-dup pairs:
    * [[graft.operators.Binary.hammingNearDupPairs]] over `fp`. */
  def audioFingerprint64(df: DataFrame, binCol: String,
                         frame: Int = 4): DataFrame = {
    require(frame >= 1, s"audioFingerprint64: frame must be >= 1, got $frame")
    val energies = transform(sequence(lit(0), lit(64)), f =>
      aggregate(sequence(lit(1), lit(frame)), lit(0L), (acc, j) =>
        acc + abs(element_at(col("decoded.samples"),
          (f * frame + j).cast("int")))))
    val bits = (0 until 64).map(b =>
      when(element_at(col("__e"), b + 2) > element_at(col("__e"), b + 1),
        lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    decodeAudio(df, binCol)
      .withColumn("__e",
        when(col("decoded").isNotNull &&
          size(col("decoded.samples")) >= 65 * frame, energies))
      .withColumn("fp", when(col("__e").isNotNull, bits))
      .drop("__e", "decoded")
  }

  /** Temporal VIDEO fingerprint — the media-dedup ladder's video
    * rung, completing exact-bytes / byte-CDC / image-dHash /
    * audio-envelope: [[dHash64]]'s gradient idea on the TIME axis.
    * The payload decodes through the real GIF compositor
    * ([[sampleFrameFeatures]], stride 1 — disposal/delta semantics
    * included), then bit b = 1 iff mean-green(frame b+1) >
    * mean-green(frame b), 64 gradient bits over the first 65
    * composited frames packed into one long. A re-encoded or
    * lightly-edited copy keeps its brightness ENVELOPE, so it lands
    * within a small Hamming radius; a single re-painted frame flips
    * at most the two gradient bits it participates in. Everything
    * after the codec UDF is pure Catalyst, and solid-palette GIF
    * frames decode to exact c/255 floats (distinct and monotone in
    * the byte level), so a SQL oracle replays the fingerprint from
    * the frame-generation arithmetic. Videos shorter than 65 frames
    * (or undecodable) fingerprint to null and fall out of any
    * downstream self-join.
    * Output: input columns + `fp` (long). Near-dup pairs:
    * [[graft.operators.Binary.hammingNearDupPairs]] over `fp`. */
  def videoFingerprint64(df: DataFrame, binCol: String): DataFrame = {
    val bits = (0 until 64).map(b =>
      when(element_at(col("__fr"), b + 2).getField("f_g") >
           element_at(col("__fr"), b + 1).getField("f_g"),
        lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    sampleFrameFeatures(df, binCol, stride = 1)
      .withColumn("__fr", col("frames"))
      .withColumn("fp",
        when(col("__fr").isNotNull && size(col("__fr")) >= 65, bits))
      .drop("__fr", "frames")
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
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
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

  /** REAL DELTA-frame animated-GIF encoder — the writer half of the
    * compositing contract [[sampleFrameFeatures]] implements: frame 0
    * is a full-canvas solid color; each later frame is a SMALLER
    * solid patch written at an (left, top) offset with disposal
    * `doNotDispose`, so the displayed frame i is the accumulated
    * canvas, not the stored partial raster. This is the layout
    * real-world optimized GIFs use (inter-frame delta encoding).
    * @param patches (r, g, b, left, top, patchW, patchH) per frame
    *                after the base
    * @param disposals optional per-frame disposal methods (index 0 =
    *                  the base frame); frames beyond the seq default
    *                  to `doNotDispose` */
  def encodeGifDeltaFrames(w: Int, h: Int, base: (Int, Int, Int),
      patches: Seq[(Int, Int, Int, Int, Int, Int, Int)],
      disposals: Seq[String] = Seq.empty,
      transparentFrames: Set[Int] = Set.empty): Array[Byte] = {
    import javax.imageio.metadata.IIOMetadataNode
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    // transparent frames: palette index 1 is declared transparent
    // (GCE transparentColorFlag) and fills the frame's TOP HALF — so
    // SrcOver compositing must keep the canvas pixels under it, the
    // delta-frame property the sampler's fast paths must not break
    def solid(fw: Int, fh: Int, r: Int, g: Int, b: Int,
              topHalfTransparent: Boolean) = {
      val cm = new java.awt.image.IndexColorModel(8, 2,
        Array(r.toByte, 0.toByte), Array(g.toByte, 0.toByte),
        Array(b.toByte, 0.toByte))
      val img = new java.awt.image.BufferedImage(fw, fh,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      if (topHalfTransparent) {
        val ras = img.getRaster
        var y = 0
        while (y < fh / 2) {
          var x = 0
          while (x < fw) { ras.setSample(x, y, 0, 1); x += 1 }
          y += 1
        }
      }
      img
    }
    def meta(img: java.awt.image.BufferedImage, left: Int, top: Int,
             disposal: String, transparent: Boolean) = {
      val md = writer.getDefaultImageMetadata(
        javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img), null)
      val root = new IIOMetadataNode(GifImageMeta)
      val desc = new IIOMetadataNode("ImageDescriptor")
      desc.setAttribute("imageLeftPosition", left.toString)
      desc.setAttribute("imageTopPosition", top.toString)
      desc.setAttribute("imageWidth", img.getWidth.toString)
      desc.setAttribute("imageHeight", img.getHeight.toString)
      desc.setAttribute("interlaceFlag", "FALSE")
      root.appendChild(desc)
      val gce = new IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", disposal)
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag",
        if (transparent) "TRUE" else "FALSE")
      gce.setAttribute("delayTime", "10")
      gce.setAttribute("transparentColorIndex", if (transparent) "1" else "0")
      root.appendChild(gce)
      md.setFromTree(GifImageMeta, root)
      md
    }
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      def disp(i: Int): String =
        if (i < disposals.length) disposals(i) else "doNotDispose"
      val b0 = solid(w, h, base._1, base._2, base._3,
        transparentFrames.contains(0))
      writer.writeToSequence(
        new javax.imageio.IIOImage(b0, null,
          meta(b0, 0, 0, disp(0), transparentFrames.contains(0))), null)
      patches.zipWithIndex.foreach { case ((r, g, b, left, top, pw, ph), i) =>
        val tr = transparentFrames.contains(i + 1)
        val img = solid(pw, ph, r, g, b, tr)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null,
            meta(img, left, top, disp(i + 1), tr)), null)
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
      val fmt = formatOf(b)
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(b))
      if (fmt != null) {
        // cached per-thread reader; setInput's metadata flags stay at
        // their defaults (callers read per-frame metadata)
        val r = cachedReader(fmt)
        try { r.setInput(iis); Some(f(r)) }
        catch { case _: Exception => None }
        finally { r.reset(); iis.close() }
      } else {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); None }
        else {
          val r = readers.next()
          try { r.setInput(iis); Some(f(r)) }
          catch { case _: Exception => None }
          finally { r.dispose(); iis.close() }
        }
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

  private val GifImageMeta = "javax_imageio_gif_image_1.0"
  private val GifStreamMeta = "javax_imageio_gif_stream_1.0"

  /** Per-frame GIF HEADER metadata — parsed without LZW pixel decode,
    * so reading it for every frame costs block scanning only.
    * `opaqueFull` marks a KEYFRAME: an untransparent frame covering
    * the whole logical screen overwrites every canvas pixel, so
    * compositing can start there instead of frame 0 — on full-frame
    * GIFs (the common fixture corpus) only sampled frames ever pay
    * pixel decode. */
  private final case class GifFrameInfo(left: Int, top: Int,
      disposal: String, opaqueFull: Boolean)

  private def gifFrameInfo(r: javax.imageio.ImageReader, i: Int,
                           cw: Int, ch: Int): GifFrameInfo =
    try {
      val kids = r.getImageMetadata(i).getAsTree(GifImageMeta).getChildNodes
      var left = 0; var top = 0; var fw = -1; var fh = -1
      var disposal = "none"; var transparent = false
      var k = 0
      while (k < kids.getLength) {
        val node = kids.item(k)
        node.getNodeName match {
          case "ImageDescriptor" =>
            val at = node.getAttributes
            left = at.getNamedItem("imageLeftPosition").getNodeValue.toInt
            top = at.getNamedItem("imageTopPosition").getNodeValue.toInt
            fw = at.getNamedItem("imageWidth").getNodeValue.toInt
            fh = at.getNamedItem("imageHeight").getNodeValue.toInt
          case "GraphicControlExtension" =>
            val at = node.getAttributes
            disposal = at.getNamedItem("disposalMethod").getNodeValue
            transparent = at.getNamedItem("transparentColorFlag")
              .getNodeValue.equalsIgnoreCase("TRUE")
          case _ => ()
        }
        k += 1
      }
      GifFrameInfo(left, top, disposal,
        left == 0 && top == 0 && fw == cw && fh == ch && !transparent)
    } catch {
      // metadata-less containers: composite conservatively from 0
      case _: Exception => GifFrameInfo(0, 0, "none", opaqueFull = false)
    }

  /** Logical-screen canvas size from the GIF stream metadata;
    * frame-0 dimensions when absent. */
  private def gifCanvasSize(r: javax.imageio.ImageReader): (Int, Int) = {
    val fromStream =
      try {
        val kids = r.getStreamMetadata.getAsTree(GifStreamMeta).getChildNodes
        var out: Option[(Int, Int)] = None
        var k = 0
        while (k < kids.getLength && out.isEmpty) {
          val node = kids.item(k)
          if (node.getNodeName == "LogicalScreenDescriptor") {
            val at = node.getAttributes
            out = Some((
              at.getNamedItem("logicalScreenWidth").getNodeValue.toInt,
              at.getNamedItem("logicalScreenHeight").getNodeValue.toInt))
          }
          k += 1
        }
        out
      } catch { case _: Exception => None }
    fromStream.getOrElse((r.getWidth(0), r.getHeight(0)))
  }

  /** REAL frame sampling + per-frame features with DISPOSAL
    * COMPOSITING: frames render in sequence onto a logical-screen
    * canvas per their GIF metadata (offsets + disposal method —
    * doNotDispose accumulates, restoreToBackgroundColor clears the
    * frame's rect, restoreToPrevious reverts the canvas), and every
    * `stride`-th DISPLAYED frame emits its mean-RGB feature (the
    * same minimal honest embedding [[pixelFeatures]] computes) as an
    * array of (frame_idx, f_r, f_g, f_b) structs — explode
    * downstream for per-frame rows. A delta-frame GIF therefore
    * scores what a viewer displays, not the stored partial raster.
    * Pixels no frame ever painted count as black, matching the
    * transparent-background convention.
    *
    * Cost note: compositing reads every frame's HEADER metadata
    * (block scan, no pixel decode), but pixel-decodes only from the
    * latest opaque full-canvas KEYFRAME before each sampled index —
    * a keyframe overwrites every canvas pixel, so earlier state is
    * irrelevant. Full-frame GIFs therefore pixel-decode exactly the
    * sampled frames (the pre-compositing cost) with byte-identical
    * features; only genuinely delta-encoded inputs pay for the
    * intermediate frames their displayed state depends on. The
    * canvas is INT_ARGB so the feature sum reads its backing int[]
    * directly (no per-pixel color-model conversion). */
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
        if (n <= 0) Seq.empty[FrameFeature]
        else {
          val lastSampled = ((n - 1) / stride) * stride
          val (cw, ch) = gifCanvasSize(r)
          val canvas = new java.awt.image.BufferedImage(cw, ch,
            java.awt.image.BufferedImage.TYPE_INT_ARGB)
          val px = canvas.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferInt].getData
          // lazy per-frame HEADER metadata (DOM building is the
          // dominant fixed cost on small frames) and lazy Graphics2D
          // (the keyframe fast path writes the canvas buffer directly)
          val infoCache = new Array[GifFrameInfo](lastSampled + 1)
          def infos(i: Int): GifFrameInfo = {
            if (infoCache(i) == null)
              infoCache(i) = gifFrameInfo(r, i, cw, ch)
            infoCache(i)
          }
          var g2ref: java.awt.Graphics2D = null
          def g2(): java.awt.Graphics2D = {
            if (g2ref == null) g2ref = canvas.createGraphics()
            g2ref
          }
          var prevIdx = -1 // last rendered frame; -1 = apply no disposal
          var prevRect = (0, 0, 0, 0)
          var snapshot: Array[Int] = null
          // false after a fast-path/keyframe skip: the canvas state
          // BEFORE the last rendered frame is stale, so a
          // restoreToPrevious disposal must recompose, not restore
          var snapValid = true
          // does the canvas buffer honestly equal displayed(prevIdx)?
          // False right after a keyframe JUMP (frames between the old
          // position and the keyframe were skipped) until the
          // keyframe's full repaint lands — a snapshot cloned in that
          // gap would capture the stale pre-jump canvas, so snapshot
          // validity is gated on this flag
          var canvasHonest = true
          try {
            /** Composite frames [from, to] in sequence per the GIF
              * presentation model: apply the previous frame's
              * disposal, then draw at the descriptor offset (SrcOver
              * keeps canvas pixels under transparent palette
              * entries). Canvas must honestly hold displayed(from-1)
              * — or `from` must repaint every pixel. `lastImg`
              * supplies an already-decoded image for frame `to`
              * (the fast-path probe decoded it), avoiding a second
              * LZW decode of every sampled delta frame. */
            def render(from: Int, to: Int,
                       lastImg: java.awt.image.BufferedImage): Unit = {
              var i = from
              while (i <= to) {
                if (prevIdx >= 0) infos(prevIdx).disposal match {
                  case "restoreToBackgroundColor" =>
                    val (rx, ry, rw, rh) = prevRect
                    val x0 = math.min(math.max(rx, 0), cw)
                    val x1 = math.min(math.max(rx + rw, 0), cw)
                    var yy = math.max(ry, 0)
                    val yEnd = math.min(ry + rh, ch)
                    while (yy < yEnd) {
                      java.util.Arrays.fill(px, yy * cw + x0, yy * cw + x1, 0)
                      yy += 1
                    }
                  case "restoreToPrevious" =>
                    if (snapshot == null || !snapValid) {
                      // pre-frame state was skipped (restoreToPrevious
                      // after a fast path or keyframe jump —
                      // pathological): recompose displayed(prevIdx)
                      // honestly from 0. Depth-1 recursion: a full
                      // render from a cleared canvas always takes
                      // valid snapshots, so the inner pass never
                      // lands here again.
                      val target = prevIdx
                      java.util.Arrays.fill(px, 0)
                      prevIdx = -1; snapshot = null; snapValid = true
                      canvasHonest = true
                      render(0, target, null)
                    }
                    if (snapshot != null)
                      System.arraycopy(snapshot, 0, px, 0, px.length)
                  case _ => ()
                }
                val info = infos(i)
                if (info.disposal == "restoreToPrevious") {
                  // a clone of a stale canvas must not count as a
                  // restorable snapshot — the recompose branch above
                  // rebuilds it honestly when needed
                  snapshot = px.clone(); snapValid = canvasHonest
                }
                val img = if (i == to && lastImg != null) lastImg
                          else r.read(i)
                g2().drawImage(img, info.left, info.top, null)
                // a full-canvas opaque repaint makes the canvas honest
                // again whatever came before
                if (info.opaqueFull) canvasHonest = true
                prevIdx = i
                prevRect = (info.left, info.top, img.getWidth, img.getHeight)
                i += 1
              }
            }
            val out = Seq.newBuilder[FrameFeature]
            var next = 0 // next frame index needing a render
            var s = 0
            while (s <= lastSampled) {
              // FAST PATH: decode the sampled frame and inspect the
              // IMAGE itself — a full-canvas opaque frame repaints
              // every pixel, so history (and its metadata) is
              // irrelevant; bulk-read its ARGB straight into the
              // canvas buffer, no Graphics2D, no DOM trees. (A
              // canvas-sized frame is at offset (0,0) by the GIF
              // spec — frames may not exceed the logical screen.)
              val img = r.read(s)
              if (img.getWidth == cw && img.getHeight == ch &&
                  img.getColorModel.getTransparency ==
                    java.awt.Transparency.OPAQUE) {
                img.getRGB(0, 0, cw, ch, px, 0, cw)
                prevIdx = s
                prevRect = (0, 0, cw, ch)
                snapshot = null
                snapValid = false // pre-s canvas state was not maintained
                canvasHonest = true // the repaint IS displayed(s)
              } else {
                // composite: start from the latest full-canvas
                // keyframe in [next, s] if any (header check only)
                var j = s
                while (j > next && !infos(j).opaqueFull) j -= 1
                if (j > next && infos(j).opaqueFull) {
                  next = j
                  prevIdx = -1; snapshot = null; snapValid = false
                  canvasHonest = false // frames (old next, j) skipped
                }
                render(next, s, img)
              }
              next = s + 1
              // canvas now holds DISPLAYED frame s
              var rr = 0L; var gg = 0L; var bb = 0L
              var p = 0
              while (p < px.length) {
                val v = px(p)
                rr += (v >> 16) & 0xff; gg += (v >> 8) & 0xff; bb += v & 0xff
                p += 1
              }
              val d = px.length.toDouble * 255.0
              out += FrameFeature(s.toLong,
                (rr / d).toFloat, (gg / d).toFloat, (bb / d).toFloat)
              s += stride
            }
            out.result()
          } finally { if (g2ref != null) g2ref.dispose() }
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
