package graft

import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal

/** Pins the REAL MJPEG-in-AVI frame path: an AVI assembled here byte by
  * byte (RIFF container per the public spec, frames JPEG-encoded with
  * the JDK's own writer) must come back from
  * [[Multimodal.decodeAviFrames]] with exact frame indices, timestamps
  * (rate/scale, then dwMicroSecPerFrame, then NativeFps fallback) and
  * near-exact solid-frame lumas (JPEG is lossy; solid gray survives to
  * within quantization error), and [[Multimodal.sampleFrames]] must
  * route AVI payloads through it while non-AVI payloads keep their
  * paths. Hostile containers — lying chunk sizes, truncations, giant
  * declared rasters in avih or inside a frame's own JPEG header — must
  * be refused without a raster allocation or a throw.
  */
class MultimodalAviSpec extends AnyFunSuite with SparkSpec {

  private def solid(w: Int, h: Int, v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(v, v, v))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def le32(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 != 0) Array[Byte](0) else Array.emptyByteArray
    fcc(id) ++ le32(data.length.toLong) ++ data ++ pad
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fcc(listType) ++ body)

  /** Minimal spec-shaped AVI: RIFF(AVI ( hdrl(avih, strl(strh, strf)),
    * movi(00dc...) )). Field layout per the public AVIMAINHEADER /
    * AVISTREAMHEADER / BITMAPINFOHEADER structures. */
  private def writeAvi(
      frames: Seq[Array[Byte]], w: Int, h: Int,
      scale: Long, rate: Long, usPerFrame: Long): Array[Byte] = {
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w.toLong) ++ le32(h.toLong) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(scale) ++ le32(rate) ++ le32(0) ++
      le32(frames.length.toLong) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0)
    val strf = le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++
      Array[Byte](1, 0, 24, 0) ++ fcc("MJPG") ++
      le32(w.toLong * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ le32(body.length.toLong) ++ body
  }

  // 3 solid 16x12 frames at lumas 10/100/200, 5 fps via rate/scale
  private lazy val frameJpegs = Seq(
    solid(16, 12, 10), solid(16, 12, 100), solid(16, 12, 200))
  private lazy val aviBytes =
    writeAvi(frameJpegs, 16, 12, scale = 1, rate = 5, usPerFrame = 0)

  private def meanLuma(gray: Array[Byte]): Double =
    gray.map(_ & 0xff).sum.toDouble / gray.length

  test("decodeAviFrames: frame count, dims, rate/scale timestamps, " +
      "near-exact solid lumas through the real JPEG decode") {
    val frames = Multimodal.decodeAviFrames(aviBytes).get
    assert(frames.map(_.frameIdx) == Vector(0, 1, 2))
    assert(frames.forall(f => f.width == 16 && f.height == 12))
    // 5 fps -> 200 ms steps, integer-exact from rate/scale
    assert(frames.map(_.tsMs) == Vector(0L, 200L, 400L))
    for ((f, want) <- frames.zip(Seq(10, 100, 200)))
      assert(math.abs(meanLuma(f.gray) - want) <= 2.0,
        s"frame ${f.frameIdx}: mean ${meanLuma(f.gray)} want ~$want")
  }

  test("decodeAviFrames: timestamp fallbacks — dwMicroSecPerFrame, then " +
      "NativeFps") {
    val viaUs = Multimodal.decodeAviFrames(
      writeAvi(frameJpegs, 16, 12, scale = 0, rate = 0,
        usPerFrame = 125000)).get
    assert(viaUs.map(_.tsMs) == Vector(0L, 125L, 250L))
    val viaNative = Multimodal.decodeAviFrames(
      writeAvi(frameJpegs, 16, 12, scale = 0, rate = 0, usPerFrame = 0)).get
    assert(viaNative.map(_.tsMs) ==
      Vector(0L, 1000L / Multimodal.NativeFps, 2000L / Multimodal.NativeFps))
  }

  test("decodeAviFrames: non-AVI payloads return None") {
    assert(Multimodal.decodeAviFrames("plain text".getBytes("UTF-8")).isEmpty)
    // RIFF but not AVI (a WAVE header)
    val wave = fcc("RIFF") ++ le32(4) ++ fcc("WAVE")
    assert(Multimodal.decodeAviFrames(wave).isEmpty)
    // AVI magic but garbage body: bounds-checked walk refuses, no throw
    assert(Multimodal.decodeAviFrames(
      (fcc("RIFF") ++ le32(9999) ++ fcc("AVI ") ++
        "garbage".getBytes("UTF-8"))).isEmpty)
  }

  test("decodeAviFrames: hostile avih raster is refused before any " +
      "frame decode") {
    val hostile = writeAvi(frameJpegs, 40000, 40000,
      scale = 1, rate = 5, usPerFrame = 0)
    assert(40000L * 40000L > Multimodal.MaxGifPixels)
    assert(Multimodal.decodeAviFrames(hostile).isEmpty)
  }

  test("decodeAviFrames: a frame JPEG declaring a giant raster inside an " +
      "innocent container is refused header-only") {
    // patch frame 1's SOF0 marker (FF C0 len prec H H W W) to declare
    // 65500x65500 — the bounded reader must refuse via the header probe
    val jpeg = frameJpegs(1).clone()
    val sof = jpeg.indices.dropRight(8).find(i =>
      (jpeg(i) & 0xff) == 0xff && (jpeg(i + 1) & 0xff) == 0xc0).get
    jpeg(sof + 5) = 0xff.toByte; jpeg(sof + 6) = 0xdc.toByte // height 65500
    jpeg(sof + 7) = 0xff.toByte; jpeg(sof + 8) = 0xdc.toByte // width 65500
    val hostile = writeAvi(Seq(frameJpegs(0), jpeg, frameJpegs(2)),
      16, 12, scale = 1, rate = 5, usPerFrame = 0)
    assert(Multimodal.decodeAviFrames(hostile).isEmpty)
  }

  test("decodeAviFrames: truncated and size-lying containers are refused") {
    (0 to 24).foreach(n =>
      assert(Multimodal.decodeAviFrames(aviBytes.take(n)).isEmpty))
    assert(Multimodal.decodeAviFrames(
      aviBytes.take(aviBytes.length / 2)).isEmpty)
    // blow up the hdrl LIST's size field so it points past the payload
    val lying = aviBytes.clone()
    lying(16) = 0xff.toByte; lying(17) = 0xff.toByte
    lying(18) = 0xff.toByte; lying(19) = 0x7f.toByte
    assert(Multimodal.decodeAviFrames(lying).isEmpty)
  }

  test("decodeAviFrames: 0xFFFFFFFF x 0xFFFFFFFF avih dims (Long-wrapping " +
      "product) are refused per-axis") {
    // hand-patch the committed avih chunk: dwWidth/dwHeight at data
    // offsets 32/36; the product wraps Long negative, so only a
    // per-axis guard catches it
    val hostile = aviBytes.clone()
    val avihData = {
      val i = hostile.indices.find(j => j + 4 <= hostile.length &&
        new String(hostile, j, 4, "US-ASCII") == "avih").get
      i + 8
    }
    for (off <- Seq(32, 36); k <- 0 until 4)
      hostile(avihData + off + k) = 0xff.toByte
    assert(Multimodal.decodeAviFrames(hostile).isEmpty)
  }

  test("decodeAviFrames: LISTs nested past MaxRiffDepth are refused " +
      "without a StackOverflowError") {
    // 5000 nested LISTs: each level is LIST + size + 'hdrl' wrapping the
    // next — deep enough to overflow a 1 MB stack if walked recursively
    // without the depth cap
    val depth = 5000
    var inner = Array.emptyByteArray
    for (_ <- 1 to depth) inner = list("hdrl", inner)
    val bomb = fcc("RIFF") ++ le32((4 + inner.length).toLong) ++
      fcc("AVI ") ++ inner
    assert(Multimodal.decodeAviFrames(bomb).isEmpty)
  }

  test("decodeAviFrames: an unfinalized file (dwSize left 0 by a crashed " +
      "recorder) still decodes via the full-payload fallback") {
    val unfinalized = aviBytes.clone()
    unfinalized(4) = 0; unfinalized(5) = 0
    unfinalized(6) = 0; unfinalized(7) = 0
    val frames = Multimodal.decodeAviFrames(unfinalized).get
    assert(frames.map(_.frameIdx) == Vector(0, 1, 2))
  }

  test("decodeAviFrames: trailing junk after the RIFF body is ignored, " +
      "not parsed as chunks") {
    // 8 bytes of junk whose pseudo-size field points past the payload:
    // without the RIFF-size bound this aborted the whole (valid) decode
    val junk = fcc("XXXX") ++ le32(0x7fffffffL)
    val frames = Multimodal.decodeAviFrames(aviBytes ++ junk).get
    assert(frames.map(_.frameIdx) == Vector(0, 1, 2))
  }

  test("decodeAviFrames: an MJPEG stream muxed as stream 01 (audio first) " +
      "decodes via its own strl ordinal") {
    // hdrl with TWO strl lists: stream 00 auds, stream 01 vids; frames
    // stored as 01dc chunks
    val audsStrh = fcc("auds") ++ fcc("    ") ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(8000) ++ le32(0) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val vidsStrh = fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(1) ++ le32(5) ++ le32(0) ++
      le32(frameJpegs.length.toLong) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0)
    val avih = le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frameJpegs.length.toLong) ++ le32(0) ++ le32(2) ++ le32(0) ++
      le32(16) ++ le32(12) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++
        list("strl", chunk("strh", audsStrh)) ++
        list("strl", chunk("strh", vidsStrh)))
    val movi = list("movi",
      frameJpegs.flatMap(f => chunk("01dc", f)).toArray)
    val body = fcc("AVI ") ++ hdrl ++ movi
    val avi = fcc("RIFF") ++ le32(body.length.toLong) ++ body
    val frames = Multimodal.decodeAviFrames(avi).get
    assert(frames.map(_.frameIdx) == Vector(0, 1, 2))
    assert(frames.map(_.tsMs) == Vector(0L, 200L, 400L))
    assert(math.abs(meanLuma(frames(2).gray) - 200) <= 2.0)
  }

  test("decodeAviFrames keep-filter: only kept frames are returned (and " +
      "skipped frames never decode)") {
    var seen = List.empty[Int]
    val kept = Multimodal.decodeAviFrames(aviBytes, (idx, ts) => {
      seen ::= idx
      idx == 2 && ts == 400L
    }).get
    assert(seen.reverse == List(0, 1, 2))
    assert(kept.map(_.frameIdx) == Vector(2))
    assert(math.abs(meanLuma(kept.head.gray) - 200) <= 2.0)
  }

  /** Raw-DIB (BI_RGB) AVI: strf declares biCompression 0 and frames are
    * `00db` chunks of bottom-up BGR24 rows padded to 4 bytes — assembled
    * from an explicit top-down RGB matrix so the expected luma of every
    * pixel is known exactly (integer (299R+587G+114B)/1000, the shared
    * rgbToLuma). */
  private def writeRawDibAvi(
      rgbFrames: Seq[Array[Array[Int]]], w: Int, h: Int,
      scale: Long = 1, rate: Long = 5): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val rasters = rgbFrames.map { px =>
      val raster = new Array[Byte](stride * h)
      for (y <- 0 until h; x <- 0 until w) {
        val p = px(y)(x)
        val off = (h - 1 - y) * stride + x * 3 // bottom-up rows
        raster(off) = (p & 0xff).toByte            // B
        raster(off + 1) = ((p >> 8) & 0xff).toByte // G
        raster(off + 2) = ((p >> 16) & 0xff).toByte// R
      }
      raster
    }
    val avih = le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(rasters.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w.toLong) ++ le32(h.toLong) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fcc("vids") ++ fcc("DIB ") ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(scale) ++ le32(rate) ++ le32(0) ++
      le32(rasters.length.toLong) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0)
    val strf = le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++
      Array[Byte](1, 0, 24, 0) ++ le32(0) ++ // biCompression = BI_RGB
      le32(stride.toLong * h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", rasters.flatMap(f => chunk("00db", f)).toArray)
    val body = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ le32(body.length.toLong) ++ body
  }

  test("decodeAviFrames: raw-DIB (BI_RGB) 00db frames decode luma-EXACT " +
      "through the synthesized-BMP path") {
    val w = 4; val h = 2
    // frame f, pixel (x,y): distinct primaries so BGR order, bottom-up
    // rows and stride padding would each corrupt a known value
    def px(f: Int): Array[Array[Int]] = Array.tabulate(h, w) { (y, x) =>
      ((40 * f + 30 * x) << 16) | ((60 * y + 10 * f) << 8) | (25 * x + 50 * y)
    }
    val frames = Seq(px(0), px(1), px(2))
    val got = Multimodal.decodeAviFrames(writeRawDibAvi(frames, w, h)).get
    assert(got.map(_.frameIdx) == Vector(0, 1, 2))
    assert(got.map(_.tsMs) == Vector(0L, 200L, 400L))
    assert(got.forall(f => f.width == w && f.height == h))
    for ((frame, want) <- got.zip(frames)) {
      val expected = for (y <- 0 until h; x <- 0 until w) yield {
        val p = want(y)(x)
        ((299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
          114 * (p & 0xff)) / 1000).toByte
      }
      assert(frame.gray.toSeq == expected,
        s"frame ${frame.frameIdx} luma must be exact (no JPEG tolerance)")
    }
  }

  test("decodeAviFrames: raw-DIB with a hostile strf raster declaration " +
      "is refused header-only; truncated rasters abort") {
    val w = 4; val h = 2
    val rgb = Array.tabulate(h, w)((y, x) => (x * 40) << 16 | y << 8)
    val good = writeRawDibAvi(Seq(rgb), w, h)
    // patch strf biWidth/biHeight (strf data offsets 4/8) to 40000x40000:
    // the synthesized BMP's header-declared raster must be refused before
    // any allocation
    val strfData = {
      val i = good.indices.find(j => j + 4 <= good.length &&
        new String(good, j, 4, "US-ASCII") == "strf").get
      i + 8
    }
    val hostile = good.clone()
    for (off <- Seq(4, 8); k <- 0 until 4)
      hostile(strfData + off + k) = (if (k < 2) 0x40 else 0).toByte // 0x4040 = 16448
    assert(16448L * 16448 > Multimodal.MaxGifPixels)
    assert(Multimodal.decodeAviFrames(hostile).isEmpty)
    // a 00db chunk holding half a raster: the BMP reader fails the
    // decode, which must abort the sequence, not emit a partial frame
    val truncated = {
      val full = rgb
      val stride = ((w * 3 + 3) / 4) * 4
      val half = new Array[Byte](stride * h / 2)
      val ok = writeRawDibAvi(Seq(full), w, h)
      // rebuild movi with the short chunk
      val moviAt = ok.indices.find(j => j + 4 <= ok.length &&
        new String(ok, j, 4, "US-ASCII") == "movi").get
      ok.take(moviAt - 8) ++
        chunk("LIST", fcc("movi") ++ chunk("00db", half)).drop(0)
    }
    assert(Multimodal.decodeAviFrames(truncated).isEmpty)
  }

  test("sampleFrames routes AVI payloads through the real decoder " +
      "alongside GIF and stub paths") {
    import spark.implicits._
    val textPayload = Array.tabulate[Byte](100)(i => (i % 251).toByte)
    val media = Seq((1L, aviBytes), (2L, textPayload))
      .toDF("doc_id", "payload")
    // 5 fps source resampled to 3 fps (333 ms ticks): ts 0/200/400 keeps
    // frames 0 and 2 (fpsKeeper: 200*3 < 1000 skips frame 1)
    val out = Multimodal.sampleFrames(media, targetFps = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(4)))
      .toMap
    assert(out.keySet.filter(_._1 == 1L) == Set((1L, 0L), (1L, 2L)))
    assert(out((1L, 0L))._1 == 0L)
    assert(out((1L, 2L))._1 == 400L)
    assert(math.abs(out((1L, 0L))._2 - 10) <= 2.0)
    assert(math.abs(out((1L, 2L))._2 - 200) <= 2.0)
    // stub path unchanged for non-media payloads
    assert(out.keySet.filter(_._1 == 2L) == Set((2L, 0L)))
  }
}
