package graft

import scala.util.Random
import javax.imageio.metadata.IIOMetadataNode
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Property test of the GIF delta-frame compositor
  * ([[Multimodal.sampleFrameFeatures]]) against an INDEPENDENT
  * straightforward Graphics2D renderer: no fast paths, no keyframe
  * jumps, no snapshot reuse — just the GIF presentation model
  * (draw at offset with SrcOver, then apply the frame's disposal)
  * replayed per frame. Random offsets x disposals x transparency,
  * exact float equality on the per-frame channel means.
  */
class GifCompositorSpec extends SparkSpec {

  private val GifImage = "javax_imageio_gif_image_1.0"
  private val GifStream = "javax_imageio_gif_stream_1.0"

  /** (left, top, disposal) from the frame's own metadata tree —
    * parsed here independently of Multimodal's gifFrameInfo. */
  private def frameMeta(r: javax.imageio.ImageReader, i: Int): (Int, Int, String) = {
    val tree = r.getImageMetadata(i).getAsTree(GifImage)
      .asInstanceOf[IIOMetadataNode]
    def first(tag: String): Option[IIOMetadataNode] = {
      val ns = tree.getElementsByTagName(tag)
      if (ns.getLength > 0) Some(ns.item(0).asInstanceOf[IIOMetadataNode])
      else None
    }
    val d = first("ImageDescriptor").get
    (d.getAttribute("imageLeftPosition").toInt,
      d.getAttribute("imageTopPosition").toInt,
      first("GraphicControlExtension")
        .map(_.getAttribute("disposalMethod")).getOrElse("none"))
  }

  /** Displayed-frame channel means by the straightforward model:
    * for each frame, draw onto an ARGB canvas at the descriptor
    * offset (SrcOver), record the displayed canvas, then apply the
    * frame's disposal before the next frame. */
  private def referenceFeatures(bytes: Array[Byte],
                                stride: Int): Seq[(Long, Float, Float, Float)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val r = javax.imageio.ImageIO.getImageReaders(iis).next()
    try {
      r.setInput(iis)
      val n = r.getNumImages(true)
      val sm = r.getStreamMetadata.getAsTree(GifStream)
        .asInstanceOf[IIOMetadataNode]
      val lsd = sm.getElementsByTagName("LogicalScreenDescriptor")
        .item(0).asInstanceOf[IIOMetadataNode]
      val cw = lsd.getAttribute("logicalScreenWidth").toInt
      val ch = lsd.getAttribute("logicalScreenHeight").toInt
      val canvas = new java.awt.image.BufferedImage(cw, ch,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      val g = canvas.createGraphics()
      val out = Seq.newBuilder[(Long, Float, Float, Float)]
      try {
        var i = 0
        while (i < n) {
          val img = r.read(i)
          val (left, top, disposal) = frameMeta(r, i)
          val before = canvas.getRGB(0, 0, cw, ch, null, 0, cw)
          g.drawImage(img, left, top, null)
          if (i % stride == 0) {
            val px = canvas.getRGB(0, 0, cw, ch, null, 0, cw)
            var rr = 0L; var gg = 0L; var bb = 0L
            px.foreach { v =>
              rr += (v >> 16) & 0xff; gg += (v >> 8) & 0xff; bb += v & 0xff
            }
            val d = px.length.toDouble * 255.0
            out += ((i.toLong, (rr / d).toFloat, (gg / d).toFloat,
              (bb / d).toFloat))
          }
          disposal match {
            case "restoreToBackgroundColor" =>
              val x0 = math.max(left, 0); val y0 = math.max(top, 0)
              val x1 = math.min(left + img.getWidth, cw)
              val y1 = math.min(top + img.getHeight, ch)
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) { canvas.setRGB(x, y, 0); x += 1 }
                y += 1
              }
            case "restoreToPrevious" =>
              canvas.setRGB(0, 0, cw, ch, before, 0, cw)
            case _ => ()
          }
          i += 1
        }
      } finally g.dispose()
      out.result()
    } finally { r.dispose(); iis.close() }
  }

  private def operatorFeatures(bytes: Array[Byte],
                               stride: Int): Seq[(Long, Float, Float, Float)] = {
    import spark.implicits._
    Multimodal.sampleFrameFeatures(
        Seq(Tuple1(bytes)).toDF("payload"), "payload", stride = stride)
      .select(explode(col("frames")).as("f"))
      .select(col("f.frame_idx"), col("f.f_r"), col("f.f_g"), col("f.f_b"))
      .collect()
      .map(r => (r.getLong(0), r.getFloat(1), r.getFloat(2), r.getFloat(3)))
      .sortBy(_._1).toSeq
  }

  private val Disposals =
    Seq("none", "doNotDispose", "restoreToBackgroundColor", "restoreToPrevious")

  test("compositor == independent renderer on each disposal method alone") {
    Disposals.foreach { disp =>
      val gif = Multimodal.encodeGifDeltaFrames(12, 8, (200, 30, 40),
        patches = Seq((10, 220, 50, 3, 2, 5, 4), (60, 70, 250, 6, 1, 4, 5),
          (130, 130, 20, 0, 3, 7, 3)),
        disposals = Seq("doNotDispose", disp, disp, disp))
      (1 to 3).foreach { stride =>
        assert(operatorFeatures(gif, stride) == referenceFeatures(gif, stride),
          s"disposal=$disp stride=$stride")
      }
    }
  }

  test("compositor == independent renderer on random offsets x disposals x transparency") {
    val rng = new Random(20260814)
    (1 to 40).foreach { trial =>
      val (cw, ch) = (7 + rng.nextInt(12), 5 + rng.nextInt(10))
      val nPatches = 1 + rng.nextInt(6)
      val patches = (0 until nPatches).map { _ =>
        val pw = 1 + rng.nextInt(cw)
        val ph = 1 + rng.nextInt(ch)
        (rng.nextInt(256), rng.nextInt(256), rng.nextInt(256),
          rng.nextInt(cw - pw + 1), rng.nextInt(ch - ph + 1), pw, ph)
      }
      val disposals = (0 to nPatches).map(_ => Disposals(rng.nextInt(Disposals.length)))
      val transparent = (0 to nPatches).filter(_ => rng.nextBoolean()).toSet
      val gif = Multimodal.encodeGifDeltaFrames(cw, ch,
        (rng.nextInt(256), rng.nextInt(256), rng.nextInt(256)),
        patches, disposals, transparent)
      val stride = 1 + rng.nextInt(3)
      val got = operatorFeatures(gif, stride)
      val exp = referenceFeatures(gif, stride)
      assert(got == exp,
        s"trial=$trial canvas=${cw}x$ch disposals=$disposals " +
          s"transparent=$transparent stride=$stride\n got=$got\n exp=$exp")
    }
  }
}
