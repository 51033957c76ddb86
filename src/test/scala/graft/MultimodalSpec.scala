package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Real-image multimodal operators: decode/resize/features run the
  * JDK's actual PNG codec, so these tests assert real codec behavior
  * (dimensions out of the decoder, channel means out of the raster),
  * plus the null-safety a corpus-scale scan needs.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage reads real PNG dimensions and channel count") {
    val df = Seq((1L, png(13, 7, 0x804020)), (2L, png(1, 1, 0xffffff)))
      .toDF("id", "payload")
    val out = Multimodal.decodeImage(df, "payload")
      .select($"id", $"decoded.width", $"decoded.height", $"decoded.channels")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set((1L, 13L, 7L, 3L), (2L, 1L, 1L, 3L)))
  }

  test("decodeImage yields null struct for null and undecodable payloads") {
    val df = Seq((1L, Array[Byte](1, 2, 3)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val out = Multimodal.decodeImage(df, "payload").select($"decoded").collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("resizeImage produces a decodable PNG of the target size") {
    val df = Seq((1L, png(20, 10, 0x123456))).toDF("id", "payload")
    val resized = Multimodal.resizeImage(df, "payload", 8, 8)
    val Row(w: Long, h: Long) =
      Multimodal.decodeImage(resized, "resized")
        .select($"decoded.width", $"decoded.height").head()
    assert((w, h) == (8L, 8L))
  }

  test("pixelFeatures of a solid color equals channel/255 exactly") {
    val df = Seq((1L, png(9, 4, (200 << 16) | (100 << 8) | 50)))
      .toDF("id", "payload")
    val feats = Multimodal.pixelFeatures(df, "payload")
      .select($"embedding").head().getSeq[Float](0)
    assert(feats == Seq((200.0 / 255).toFloat, (100.0 / 255).toFloat,
      (50.0 / 255).toFloat))
  }

  test("resize of a solid color preserves the channel means") {
    val df = Seq((1L, png(33, 21, (10 << 16) | (20 << 8) | 30)))
      .toDF("id", "payload")
    val feats = Multimodal.pixelFeatures(
      Multimodal.resizeImage(df, "payload", 8, 8), "resized")
      .select($"embedding").head().getSeq[Float](0)
    assert(feats == Seq((10.0 / 255).toFloat, (20.0 / 255).toFloat,
      (30.0 / 255).toFloat))
  }

  test("mapBatches runs the REAL codec partition-locally (amortized-decoder shape)") {
    import org.apache.spark.sql.types._
    val df = (1 to 50).map(i => (i.toLong, png(1 + i % 9, 1 + i % 7, i * 31)))
      .toDF("id", "payload")
    val schema = StructType(Seq(
      StructField("w", LongType), StructField("h", LongType)))
    val out = Multimodal.mapBatches(df, "payload", schema) { bytes =>
      // per-partition setup happens HERE once (a real pipeline would
      // hoist codec/model state); each payload decodes with ImageIO
      bytes.map { b =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        Row(img.getWidth.toLong, img.getHeight.toLong)
      }
    }
    val got = out.select($"id", $"features.w", $"features.h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (1 to 50).map(i =>
      (i.toLong, (1 + i % 9).toLong, (1 + i % 7).toLong)).toSet
    assert(got == want)
  }

  test("mm_decode / mm_pixels / mm_knn queries run on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val qs = graft.queries.MultimodalQueries.queries
    assert(qs("mm_decode")(spark, dir).count() > 0)
    assert(qs("mm_pixels")(spark, dir).count() > 0)
    val knn = qs("mm_knn")(spark, dir)
    assert(knn.filter(col("rank") <= 5).count() == knn.count())
    assert(knn.count() > 0)
  }

  test("WAV round-trip: javax.sound decode recovers PCM16 samples bit-exactly") {
    import spark.implicits._
    val samples = Seq(0, 1, -1, 32767, -32768, 12345, -12345, 100, -100)
    val wav = Multimodal.encodeWavPcm16(samples, 16000)
    val df = Seq((1L, wav), (2L, Array[Byte](1, 2, 3)), (3L, null))
      .toDF("id", "payload")
    val got = Multimodal.decodeAudio(df, "payload")
      .select($"id", $"decoded").collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    val d = got(1L).get
    assert(d.getLong(0) == 16000L) // sample_rate
    assert(d.getLong(1) == 1L)     // channels
    assert(d.getLong(2) == samples.length.toLong)
    assert(d.getSeq[Int](3) == samples)
    // corrupt and null payloads yield null structs, never exceptions
    assert(got(2L).isEmpty && got(3L).isEmpty)
  }

  test("AIFF (big-endian) decodes to the same samples as WAV") {
    import spark.implicits._
    import javax.sound.sampled._
    val samples = Seq(0, 1, -1, 32767, -32768, 1234, -4321)
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, /*bigEndian=*/ true)
    val data = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      data(2 * i) = (samples(i) >> 8).toByte
      data(2 * i + 1) = samples(i).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt,
        samples.length.toLong),
      AudioFileFormat.Type.AIFF, bos)
    val df = Seq((1L, bos.toByteArray)).toDF("id", "payload")
    val d = Multimodal.decodeAudio(df, "payload")
      .select($"decoded").head().getStruct(0)
    assert(d.getLong(2) == samples.length.toLong)
    assert(d.getSeq[Int](3) == samples) // byte order normalized, not swapped
  }

  test("GIF video round-trip: frame count, geometry, exact frame colors") {
    val colors = Seq((200, 10, 30), (40, 120, 5), (7, 8, 9), (255, 1, 128))
    val gif = Multimodal.encodeGifFrames(6, 4, colors)
    val df = Seq((1L, gif)).toDF("id", "payload")
    val d = Multimodal.decodeVideo(df, "payload")
      .select($"decoded").head().getStruct(0)
    assert((d.getLong(0), d.getLong(1), d.getLong(2)) == ((4L, 6L, 4L)))
    // stride 2 samples frames 0 and 2; solid indexed colors make the
    // mean exactly c/255
    val frames = Multimodal.sampleFrameFeatures(df, "payload", stride = 2)
      .select(explode($"frames").as("f"))
      .select($"f.frame_idx", $"f.f_r", $"f.f_g", $"f.f_b")
      .collect().map(r => (r.getLong(0), r.getFloat(1), r.getFloat(2), r.getFloat(3)))
    assert(frames.map(_._1).toSeq == Seq(0L, 2L))
    assert(frames(0)._2 == (200.0 / 255).toFloat &&
      frames(0)._3 == (10.0 / 255).toFloat &&
      frames(0)._4 == (30.0 / 255).toFloat)
    assert(frames(1)._2 == (7.0 / 255).toFloat &&
      frames(1)._3 == (8.0 / 255).toFloat &&
      frames(1)._4 == (9.0 / 255).toFloat)
  }

  test("delta-frame GIF: features come from the COMPOSITED displayed frame") {
    // base 6x4 solid red; frame 1 patches a 2x2 green block at (2,1)
    // with disposal doNotDispose — the stored raster for frame 1 is
    // the 4-pixel patch, but the DISPLAYED frame is red with a green
    // hole. Reading frames independently (the pre-compositing bug)
    // would score frame 1 as pure green.
    val gif = Multimodal.encodeGifDeltaFrames(6, 4, (200, 0, 0),
      Seq((0, 250, 0, 2, 1, 2, 2)))
    val df = Seq((1L, gif)).toDF("id", "payload")
    // sanity: the container really is delta-encoded (frame 1 raster
    // is 2x2, not full-canvas)
    val d = Multimodal.decodeVideo(df, "payload")
      .select($"decoded").head().getStruct(0)
    assert(d.getLong(0) == 2L)
    val frames = Multimodal.sampleFrameFeatures(df, "payload", stride = 1)
      .select(explode($"frames").as("f"))
      .select($"f.frame_idx", $"f.f_r", $"f.f_g", $"f.f_b")
      .collect().map(r => (r.getLong(0), r.getFloat(1), r.getFloat(2), r.getFloat(3)))
    assert(frames.map(_._1).toSeq == Seq(0L, 1L))
    // frame 0: solid red
    assert(frames(0)._2 == (200.0 / 255).toFloat && frames(0)._3 == 0f)
    // frame 1 composited: 20 red pixels + 4 green of 24 total
    assert(frames(1)._2 == (20.0 * 200 / (24 * 255)).toFloat,
      s"red mean must reflect the surviving base pixels, got ${frames(1)}")
    assert(frames(1)._3 == (4.0 * 250 / (24 * 255)).toFloat,
      s"green mean must reflect only the 4 patched pixels, got ${frames(1)}")
    assert(frames(1)._4 == 0f)
  }

  test("restoreToPrevious after a keyframe jump recomposes honestly") {
    // frame 0: full red; frame 1: green patch (doNotDispose);
    // frame 2: FULL-canvas blue keyframe whose disposal is
    // restoreToPrevious; frame 3: white patch. Displayed frame 3 =
    // displayed(1) [the restore reverts frame 2] + the white patch.
    // A stale snapshot taken after the keyframe JUMP (sampling 0
    // then 3 with stride 3) would restore displayed(0) instead —
    // losing the green patch.
    val gif = Multimodal.encodeGifDeltaFrames(6, 4, (200, 0, 0),
      Seq((0, 250, 0, 2, 1, 2, 2),   // frame 1: green 2x2 at (2,1)
          (0, 0, 240, 0, 0, 6, 4),   // frame 2: full-canvas blue
          (255, 255, 255, 0, 0, 1, 1)), // frame 3: white 1x1 at (0,0)
      disposals = Seq("doNotDispose", "doNotDispose",
        "restoreToPrevious", "doNotDispose"))
    val df = Seq((1L, gif)).toDF("id", "payload")
    val frames = Multimodal.sampleFrameFeatures(df, "payload", stride = 3)
      .select(explode($"frames").as("f"))
      .select($"f.frame_idx", $"f.f_r", $"f.f_g", $"f.f_b")
      .collect().map(r => (r.getLong(0), r.getFloat(1), r.getFloat(2), r.getFloat(3)))
    assert(frames.map(_._1).toSeq == Seq(0L, 3L))
    // displayed(3): 19 red + 4 green + 1 white of 24 pixels
    val n = 24.0 * 255
    assert(frames(1)._2 == ((19 * 200 + 255) / n).toFloat,
      s"red must come from displayed(1)'s surviving base: ${frames(1)}")
    assert(frames(1)._3 == ((4 * 250 + 255) / n).toFloat,
      s"green patch must survive the restore: ${frames(1)}")
    assert(frames(1)._4 == (255 / n).toFloat,
      s"blue keyframe must be fully reverted: ${frames(1)}")
  }

  test("decodeVideo yields null struct for null and undecodable payloads") {
    val df = Seq((1L, Array[Byte](1, 2, 3)), (2L, null))
      .toDF("id", "payload")
    val out = Multimodal.decodeVideo(df, "payload")
      .select($"decoded").collect()
    assert(out.forall(_.isNullAt(0)))
  }

  private def structuredPng(px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9) {
      val g = px(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash64 matches the gradient-bit definition on decoded pixels") {
    def px(seed: Int)(x: Int, y: Int): Int = (seed * 37 + x * 29 + y * 17 + x * y) % 256
    val seeds = Seq(3, 17, 91)
    val df = seeds.map(s => (s.toLong, structuredPng(px(s))))
      .toDF("id", "payload")
    val got = Multimodal.dHash64(df, "payload")
      .select($"id", $"phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    seeds.foreach { s =>
      var want = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (px(s)(x + 1, y) > px(s)(x, y)) want |= 1L << (y * 8 + x)
      assert(got(s.toLong) == want, s"seed $s")
    }
  }

  test("dHash64 is container-invariant: PNG and BMP encodes of the " +
    "same pixels hash identically") {
    def px(x: Int, y: Int): Int = (x * 53 + y * 19 + x * y * 3) % 256
    val pngBytes = structuredPng(px)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pngBytes))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val df = Seq((1L, pngBytes), (2L, bos.toByteArray)).toDF("id", "payload")
    val hs = Multimodal.dHash64(df, "payload")
      .select($"phash").collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
  }

  test("hammingNearDupPairs == brute force (pigeonhole exactness) " +
    "and excludes pairs beyond the radius") {
    val rng = new scala.util.Random(41)
    val base = Array.fill(60)(rng.nextLong())
    // plant near-dups: flips of 1-3 bits (inside radius) and 5 bits
    // (outside) of random base signatures
    def flipped(sig: Long, k: Int): Long =
      (0 until k).foldLeft(sig)((s, _) => s ^ (1L << rng.nextInt(64)))
    val sigs = (base.zipWithIndex.map { case (s, i) => (i.toLong, s) } ++
      (0 until 25).map(i =>
        (100L + i, flipped(base(i), 1 + rng.nextInt(3)))) ++
      (0 until 10).map(i => (200L + i, flipped(base(i), 5)))).toSeq
    val df = sigs.toDF("id", "sig")
    val got = graft.operators.Binary
      .hammingNearDupPairs(df, "id", "sig", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got == want)
    assert(want.nonEmpty, "planted near-dups must produce pairs")
  }

  test("audioFingerprint64 matches the energy-gradient definition on " +
    "round-tripped WAV samples") {
    val rng = new scala.util.Random(7)
    val samples = Seq.fill(260)(rng.nextInt(65536) - 32768)
    val df = Seq((1L, Multimodal.encodeWavPcm16(samples, 16000)))
      .toDF("id", "payload")
    val got = Multimodal.audioFingerprint64(df, "payload")
      .select($"fp").collect().head.getLong(0)
    val en = (0 until 65).map(f =>
      (0 until 4).map(j => math.abs(samples(f * 4 + j)).toLong).sum)
    var want = 0L
    for (b <- 0 until 64) if (en(b + 1) > en(b)) want |= 1L << b
    assert(got == want)
  }

  test("audioFingerprint64 yields null for short and undecodable audio") {
    val short = Multimodal.encodeWavPcm16(Seq.fill(100)(5), 16000)
    val df = Seq((1L, short), (2L, Array[Byte](1, 2)), (3L, null))
      .toDF("id", "payload")
    val out = Multimodal.audioFingerprint64(df, "payload")
      .select($"fp").collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("dHash64 null/undecodable payloads drop out of the near-dup join") {
    val good = structuredPng((x, y) => (x * 11 + y * 7) % 256)
    val df = Seq((1L, good), (2L, good), (3L, Array[Byte](9, 9)),
      (4L, null)).toDF("id", "payload")
    val pairs = graft.operators.Binary.hammingNearDupPairs(
      Multimodal.dHash64(df, "payload"), "id", "phash")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }
}
