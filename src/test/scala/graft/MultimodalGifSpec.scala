package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.metadata.IIOMetadataNode
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal

/** Pins the REAL animated-GIF frame path: a GIF synthesized here with
  * JDK's own writer (known frame sizes, offsets, delays, solid lumas)
  * must come back from [[Multimodal.decodeGifFrames]] frame-exact, and
  * [[Multimodal.sampleFrames]] must route GIF payloads through it while
  * non-GIF payloads keep the byte-window stub semantics.
  */
class MultimodalGifSpec extends AnyFunSuite with SparkSpec {

  /** Solid-gray frame; (v,v,v) has luma exactly v (299+587+114=1000). */
  private def solid(w: Int, h: Int, v: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(v, v, v))
    g.fillRect(0, 0, w, h)
    g.dispose()
    img
  }

  /** Animated GIF from (image, delayCs, left, top) frames via the JDK
    * GIF writer, with per-frame GraphicControlExtension delays and
    * ImageDescriptor offsets. */
  private def writeAnimatedGif(
      frames: Seq[(BufferedImage, Int, Int, Int)]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { case (img, delayCs, left, top) =>
      val wp = writer.getDefaultWriteParam
      val md = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromRenderedImage(img), wp)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      def child(name: String): IIOMetadataNode = {
        val list = root.getElementsByTagName(name)
        if (list.getLength > 0) list.item(0).asInstanceOf[IIOMetadataNode]
        else {
          val n = new IIOMetadataNode(name)
          root.appendChild(n)
          n
        }
      }
      val gce = child("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "doNotDispose")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("transparentColorIndex", "0")
      gce.setAttribute("delayTime", delayCs.toString)
      val desc = child("ImageDescriptor")
      desc.setAttribute("imageLeftPosition", left.toString)
      desc.setAttribute("imageTopPosition", top.toString)
      md.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, md), wp)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    baos.toByteArray
  }

  // 20x10 canvas: frame 0 solid 10, frame 1 solid 100, frame 2 a 5x10
  // patch of 200 drawn at x=5 over frame 1's pixels (delta composition)
  private lazy val gifBytes = writeAnimatedGif(Seq(
    (solid(20, 10, 10), 5, 0, 0),
    (solid(20, 10, 100), 5, 0, 0),
    (solid(5, 10, 200), 5, 5, 0)))

  test("decodeGifFrames: frame count, dimensions, per-frame timestamps " +
      "from GCE delays, exact lumas, delta-frame composition at offset") {
    val frames = Multimodal.decodeGifFrames(gifBytes).get
    assert(frames.map(_.frameIdx) == Vector(0, 1, 2))
    assert(frames.forall(f => f.width == 20 && f.height == 10))
    // 5 cs per frame -> 50 ms steps, frame 0 at 0
    assert(frames.map(_.tsMs) == Vector(0L, 50L, 100L))
    assert(frames(0).gray.forall(b => (b & 0xff) == 10))
    assert(frames(1).gray.forall(b => (b & 0xff) == 100))
    // frame 2 composes the 5x10 patch of 200 at x=5 over the 100 canvas
    val f2 = frames(2).gray
    assert(f2.length == 200)
    for (y <- 0 until 10; x <- 0 until 20) {
      val v = f2(y * 20 + x) & 0xff
      val want = if (x >= 5 && x < 10) 200 else 100
      assert(v == want, s"($x,$y): got $v want $want")
    }
  }

  test("decodeGifFrames: non-GIF payloads return None") {
    assert(Multimodal.decodeGifFrames("plain text".getBytes("UTF-8")).isEmpty)
    // GIF magic but garbage body: reader rejects, never throws
    assert(Multimodal.decodeGifFrames(
      "GIF89a-but-not-really".getBytes("UTF-8")).isEmpty)
  }

  test("decodeGifFrames: hostile logical-screen header is refused, not " +
      "allocated") {
    // patch the Logical Screen Descriptor (bytes 6-9, little-endian
    // width/height after the 6-byte magic) to declare 65535x65535 —
    // 4.3G pixels; the decoder must return None (stub fallback) instead
    // of attempting the canvas allocation
    val hostile = gifBytes.clone()
    hostile(6) = 0xff.toByte; hostile(7) = 0xff.toByte
    hostile(8) = 0xff.toByte; hostile(9) = 0xff.toByte
    assert(65535L * 65535L > Multimodal.MaxGifPixels)
    assert(Multimodal.decodeGifFrames(hostile).isEmpty)
  }

  /** Byte offsets of each ImageDescriptor (0x2C separator) found by
    * walking the GIF block structure: header+LSD, optional global
    * color table, extension blocks (0x21 label + length-prefixed
    * sub-blocks), image blocks (descriptor, optional local color
    * table, LZW min code size, length-prefixed data sub-blocks). */
  private def imageDescriptorOffsets(bytes: Array[Byte]): Seq[Int] = {
    val packed = bytes(10) & 0xff
    var pos = 13 + (if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0)
    val out = Seq.newBuilder[Int]
    var done = false
    while (!done && pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x21 =>
          pos += 2
          while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x2c =>
          out += pos
          val ipacked = bytes(pos + 9) & 0xff
          pos += 10
          if ((ipacked & 0x80) != 0) pos += 3 * (1 << ((ipacked & 7) + 1))
          pos += 1 // LZW minimum code size
          while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case _ => done = true
      }
    }
    out.result()
  }

  test("decodeGifFrames: hostile FRAME descriptor (tiny screen, " +
      "65535x65535 frame) is refused before any pixel decode") {
    val offsets = imageDescriptorOffsets(gifBytes)
    assert(offsets.size == 3, s"walker found ${offsets.size} descriptors")
    // keep the 20x10 logical screen; blow up frame 1's own dims
    // (descriptor bytes 5-8 after the 0x2C separator: LE width, height)
    val hostile = gifBytes.clone()
    val d = offsets(1)
    hostile(d + 5) = 0xff.toByte; hostile(d + 6) = 0xff.toByte
    hostile(d + 7) = 0xff.toByte; hostile(d + 8) = 0xff.toByte
    assert(Multimodal.decodeGifFrames(hostile).isEmpty)
  }

  test("decodeGifFrames keep-filter: only kept frames are materialized") {
    var calls = 0
    val kept = Multimodal.decodeGifFrames(gifBytes, (idx, _) => {
      calls += 1
      idx == 1
    }).get
    assert(calls == 3 && kept.map(_.frameIdx) == Vector(1))
    // composition still sees frames 0-1: frame 1's canvas is solid 100
    assert(kept.head.gray.forall(b => (b & 0xff) == 100))
  }

  test("sampleFrames routes GIF payloads through the real decoder and " +
      "keeps the stub for the rest") {
    import spark.implicits._
    val textPayload = Array.tabulate[Byte](150)(i => (i % 251).toByte)
    val media = Seq((1L, gifBytes), (2L, textPayload))
      .toDF("doc_id", "payload")
    val out = Multimodal.sampleFrames(media, targetFps = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getAs[Array[Byte]]("frame"), r.getDouble(4)))
      .toMap
    // GIF at ts 0/50/100 ms resampled to 10 fps (100 ms ticks): frames
    // 0 and 2 survive, with real canvas bytes and exact means
    // (frame 2: 50 px of 200 + 150 px of 100 -> mean 125)
    assert(out.keySet.filter(_._1 == 1L) == Set((1L, 0L), (1L, 2L)))
    val (t0, f0, m0) = out((1L, 0L))
    assert(t0 == 0L && f0.length == 200 && m0 == 10.0)
    val (t2, f2, m2) = out((1L, 2L))
    assert(t2 == 100L && f2.length == 200 && m2 == 125.0)
    // stub path unchanged: 150 bytes, stride 3 keeps frame 0 only
    assert(out.keySet.filter(_._1 == 2L) == Set((2L, 0L)))
    val (st0, sf0, sm0) = out((2L, 0L))
    assert(st0 == 0L && sf0.toSeq == textPayload.slice(0, 64).toSeq)
    assert(sm0 == textPayload.slice(0, 64).map(_ & 0xff).sum.toDouble / 64)
  }

  test("resampleByFps: full-rate keeps every frame; 1 fps keeps one per " +
      "second") {
    val frames = Multimodal.decodeGifFrames(gifBytes).get
    assert(Multimodal.resampleByFps(frames, 20).map(_.frameIdx) ==
      Vector(0, 1, 2))
    assert(Multimodal.resampleByFps(frames, 1).map(_.frameIdx) == Vector(0))
  }
}
