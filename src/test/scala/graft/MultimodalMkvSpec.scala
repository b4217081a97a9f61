package graft

import graft.ext.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Matroska/WebM EBML walk: byte-assembled elements pin the public
  * RFC 8794 + Matroska layouts — vint ids/sizes, Segment/Info
  * (TimestampScale, float Duration), Tracks (CodecID, Video pixel
  * dims), unknown-size Segment tolerance, and the hostile-input
  * refusals (lying sizes, foreign DocType, zero scale, non-finite
  * duration, non-printable codec ids). */
class MultimodalMkvSpec extends AnyFunSuite {

  /** Marked class-id bytes, written as the spec prints them. */
  private def idb(id: Long): Array[Byte] = {
    val n = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
      else if (id <= 0xffffffL) 3 else 4
    (1 to n).map(i => ((id >> (8 * (n - i))) & 0xff).toByte).toArray
  }

  /** Minimal-width size vint (marker in the first byte). */
  private def vint(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && v >= (1L << (7 * n)) - 1) n += 1 // all-ones reserved
    val bytes = new Array[Byte](n)
    var i = 0
    while (i < n) {
      bytes(n - 1 - i) = ((v >> (8 * i)) & 0xff).toByte
      i += 1
    }
    bytes(0) = (bytes(0) | (0x80 >> (n - 1))).toByte
    bytes
  }

  private def el(id: Long, data: Array[Byte]): Array[Byte] =
    idb(id) ++ vint(data.length.toLong) ++ data

  private def uint(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && v >= (1L << (8 * n))) n += 1
    (1 to n).map(i => ((v >> (8 * (n - i))) & 0xff).toByte).toArray
  }

  private def f8(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToRawLongBits(d)
    (1 to 8).map(i => ((bits >> (8 * (8 - i))) & 0xff).toByte).toArray
  }
  private def f4(f: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    (1 to 4).map(i => ((bits >> (8 * (4 - i))) & 0xff).toByte).toArray
  }

  private def s(x: String): Array[Byte] = x.getBytes("ISO-8859-1")

  private def ebml(docType: String = "matroska"): Array[Byte] =
    el(0x1A45DFA3L, el(0x4282L, s(docType)))

  private def info(scale: Option[Long], durTicks: Option[Array[Byte]]) =
    el(0x1549A966L,
      scale.map(v => el(0x2AD7B1L, uint(v))).getOrElse(Array.empty[Byte]) ++
        durTicks.map(b => el(0x4489L, b)).getOrElse(Array.empty[Byte]))

  private def videoTrack(codec: String, w: Long, h: Long): Array[Byte] =
    el(0xAEL, el(0x86L, s(codec)) ++
      el(0xE0L, el(0xB0L, uint(w)) ++ el(0xBAL, uint(h))))
  private def audioTrack(codec: String): Array[Byte] =
    el(0xAEL, el(0x86L, s(codec)))

  private val cluster = el(0x1F43B675L, Array.fill[Byte](64)(0x5a))

  test("decodeMkvMeta: duration, tracks, dims, codec ids — exact over " +
      "byte-assembled elements; Cluster skipped by size") {
    val mkv = ebml() ++ el(0x18538067L,
      info(Some(1000000L), Some(f8(12345.0))) ++
        el(0x1654AE6BL,
          videoTrack("V_VP9", 1920, 1080) ++ audioTrack("A_OPUS")) ++
        cluster)
    val m = Multimodal.decodeMkvMeta(mkv).get
    assert(m.durationMs === 12345L)
    assert(m.nTracks === 2 && m.width === 1920 && m.height === 1080)
    assert(m.codecs === Seq("V_VP9", "A_OPUS"))
    assert(m.docType === "matroska")
    assert(Multimodal.sniffContainer(mkv) === "mkv")
  }

  test("decodeMkvMeta: float4 duration, default and custom timestamp " +
      "scales, webm doctype, audio-only dims, absent duration") {
    // default scale (1e6 ns): 250 ticks = 250 ms; 4-byte float
    val d4 = Multimodal.decodeMkvMeta(ebml("webm") ++ el(0x18538067L,
      info(None, Some(f4(250.0f))) ++
        el(0x1654AE6BL, audioTrack("A_VORBIS")))).get
    assert(d4.durationMs === 250L && d4.docType === "webm")
    assert(d4.width === 0 && d4.height === 0 && d4.nTracks === 1)
    // custom scale: 500000 ns/tick x 1000 ticks = 500 ms
    val cs = Multimodal.decodeMkvMeta(ebml() ++ el(0x18538067L,
      info(Some(500000L), Some(f8(1000.0))) ++
        el(0x1654AE6BL, audioTrack("A_AAC")))).get
    assert(cs.durationMs === 500L)
    // no Duration element (live capture): -1, never 0
    val nd = Multimodal.decodeMkvMeta(ebml() ++ el(0x18538067L,
      info(Some(1000000L), None) ++
        el(0x1654AE6BL, audioTrack("A_AAC")))).get
    assert(nd.durationMs === -1L)
  }

  test("decodeMkvMeta: unknown-size Segment tolerated (clamped to " +
      "end-of-payload), unknown size elsewhere refused") {
    val body = info(Some(1000000L), Some(f8(100.0))) ++
      el(0x1654AE6BL, audioTrack("A_AAC"))
    val unknown = Array[Byte](0x01, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte,
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    val seg = idb(0x18538067L) ++ unknown ++ body
    val m = Multimodal.decodeMkvMeta(ebml() ++ seg).get
    assert(m.durationMs === 100L && m.nTracks === 1)
    // unknown-size Info inside a sized Segment is a lie
    val badInfo = idb(0x1549A966L) ++ unknown ++
      el(0x2AD7B1L, uint(1000000L))
    assert(Multimodal.decodeMkvMeta(ebml() ++
      el(0x18538067L, badInfo)).isEmpty)
  }

  test("decodeMkvMeta: hostile elements are refused without a throw") {
    def seg(body: Array[Byte]) = ebml() ++ el(0x18538067L, body)
    val okTracks = el(0x1654AE6BL, audioTrack("A_AAC"))
    // element size lying past its parent
    assert(Multimodal.decodeMkvMeta(ebml() ++ idb(0x18538067L) ++
      vint(99999L) ++ info(Some(1000000L), None)).isEmpty)
    // vint first byte 0 = longer than 8 bytes = invalid
    assert(Multimodal.decodeMkvMeta(seg(
      idb(0x1549A966L) ++ Array[Byte](0) ++ Array.fill[Byte](8)(0))).isEmpty)
    // zero TimestampScale (division by zero scale is a lie)
    assert(Multimodal.decodeMkvMeta(seg(
      info(Some(0L), Some(f8(10.0))) ++ okTracks)).isEmpty)
    // negative / NaN duration
    assert(Multimodal.decodeMkvMeta(seg(
      info(Some(1000000L), Some(f8(-5.0))) ++ okTracks)).isEmpty)
    assert(Multimodal.decodeMkvMeta(seg(
      info(Some(1000000L), Some(f8(Double.NaN))) ++ okTracks)).isEmpty)
    // oversized (9-byte) duration field is not a legal EBML float
    assert(Multimodal.decodeMkvMeta(seg(
      info(Some(1000000L), Some(Array.fill[Byte](9)(0))) ++
        okTracks)).isEmpty)
    // non-printable CodecID bytes are a lying track table
    assert(Multimodal.decodeMkvMeta(seg(
      info(Some(1000000L), Some(f8(10.0))) ++
        el(0x1654AE6BL, el(0xAEL, el(0x86L,
          Array[Byte](1, 2, 3)))))).isEmpty)
    // foreign DocType
    assert(Multimodal.decodeMkvMeta(ebml("avi") ++ el(0x18538067L,
      info(Some(1000000L), Some(f8(10.0))) ++ okTracks)).isEmpty)
    // missing DocType entirely
    assert(Multimodal.decodeMkvMeta(
      el(0x1A45DFA3L, Array.empty[Byte]) ++ el(0x18538067L,
        info(Some(1000000L), Some(f8(10.0))) ++ okTracks)).isEmpty)
    // non-EBML payloads never enter the walk
    assert(Multimodal.decodeMkvMeta("plain prose".getBytes("UTF-8")).isEmpty)
  }
}
