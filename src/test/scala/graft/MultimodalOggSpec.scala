package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal

/** Pins the REAL Ogg page-walk path: pages assembled here byte by byte
  * per the public layout (OggS capture, version 0, header-type flags,
  * s64-LE granule, serial/sequence, segment lacing) carrying Vorbis or
  * Opus identification headers must come back from
  * [[Multimodal.decodeOggMeta]] with exact granule-derived facts, and
  * hostile streams — bad versions, lying lacing tables, backward
  * granules, unrecognized bitstreams — must refuse without a throw. */
class MultimodalOggSpec extends AnyFunSuite with SparkSpec {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le64(v: Long): Array[Byte] = le32(v & 0xffffffffL) ++ le32(v >>> 32)

  /** One page; every segment here is < 255 bytes (one lacing byte each). */
  private def page(flags: Int, granule: Long, serial: Long, seq: Int,
      segs: Array[Byte]*): Array[Byte] =
    "OggS".getBytes("US-ASCII") ++ Array[Byte](0, flags.toByte) ++
      le64(granule) ++ le32(serial) ++ le32(seq.toLong) ++ le32(0) ++
      Array(segs.length.toByte) ++ segs.map(s => s.length.toByte) ++
      segs.flatten

  private def vorbisId(rate: Int = 44100, channels: Int = 2,
      brMax: Int = 0, brNom: Int = 128000, brMin: Int = 0): Array[Byte] =
    Array[Byte](0x01) ++ "vorbis".getBytes("US-ASCII") ++ le32(0) ++
      Array(channels.toByte) ++ le32(rate.toLong) ++ le32(brMax.toLong) ++
      le32(brNom.toLong) ++ le32(brMin.toLong) ++ Array[Byte](0xb8.toByte, 1)

  private def opusHead(channels: Int = 2, preSkip: Int = 312): Array[Byte] =
    "OpusHead".getBytes("US-ASCII") ++ Array[Byte](1, channels.toByte) ++
      le16(preSkip) ++ le32(48000) ++ le16(0) ++ Array[Byte](0)

  private def audioSeg(n: Int): Array[Byte] = Array.fill[Byte](n)(0x44)

  test("decodeOggMeta: Vorbis — granule-derived duration, stream bytes, " +
      "bitrate-bound VBR verdict; -1 granules carry no time") {
    val ogg = page(0x02, 0, 7, 0, vorbisId()) ++
      page(0, -1L, 7, 1, audioSeg(100)) ++ // no packet finishes here
      page(0, 44100, 7, 2, audioSeg(120)) ++
      page(0x04, 88200, 7, 3, audioSeg(80))
    val m = Multimodal.decodeOggMeta(ogg).get
    assert(m.codec === "vorbis" && m.sampleRate === 44100 && m.channels === 2)
    assert(m.totalSamples === 88200L && m.durationMs === 2000L)
    assert(m.streamBytes === vorbisId().length + 300L)
    assert(m.vbr, "brMax 0 leaves the bitrate unbounded = VBR")
    // declared max == min > 0 pins CBR
    val cbr = page(0x02, 0, 7, 0,
      vorbisId(brMax = 128000, brMin = 128000)) ++
      page(0x04, 44100, 7, 1, audioSeg(50))
    assert(!Multimodal.decodeOggMeta(cbr).get.vbr)
  }

  test("decodeOggMeta: Opus — 48 kHz granules, pre-skip subtracted") {
    val ogg = page(0x02, 0, 9, 0, opusHead()) ++
      page(0x04, 48312, 9, 1, audioSeg(200))
    val m = Multimodal.decodeOggMeta(ogg).get
    assert(m.codec === "opus" && m.sampleRate === 48000)
    assert(m.totalSamples === 48000L && m.durationMs === 1000L)
  }

  test("decodeOggMeta: multiplexed streams — the first RECOGNIZED BOS " +
      "serial wins; other serials' pages contribute nothing") {
    val junkBos = page(0x02, 0, 3, 0, "not a codec id".getBytes("US-ASCII"))
    val ogg = junkBos ++
      page(0x02, 0, 7, 0, vorbisId()) ++
      page(0, 500, 3, 1, audioSeg(999 % 255)) ++ // other serial: ignored
      page(0x04, 44100, 7, 1, audioSeg(60))
    val m = Multimodal.decodeOggMeta(ogg).get
    assert(m.codec === "vorbis" && m.totalSamples === 44100L)
    assert(m.streamBytes === vorbisId().length + 60L)
  }

  test("decodeOggMeta: hostile streams are refused without a throw") {
    val good = page(0x02, 0, 7, 0, vorbisId()) ++
      page(0x04, 44100, 7, 1, audioSeg(50))
    assert(Multimodal.decodeOggMeta(good).isDefined)
    // version != 0
    val badVer = good.clone(); badVer(4) = 1
    assert(Multimodal.decodeOggMeta(badVer).isEmpty)
    // truncated: the lacing table promises more body than exists
    assert(Multimodal.decodeOggMeta(good.dropRight(10)).isEmpty)
    // a second page whose capture bytes are not OggS (desync = refuse)
    assert(Multimodal.decodeOggMeta(
      page(0x02, 0, 7, 0, vorbisId()) ++
        "garbage between pages that is long enough".getBytes("UTF-8")).isEmpty)
    // backward granule mid-serial
    assert(Multimodal.decodeOggMeta(
      page(0x02, 0, 7, 0, vorbisId()) ++
        page(0, 44100, 7, 1, audioSeg(10)) ++
        page(0x04, 22050, 7, 2, audioSeg(10))).isEmpty)
    // no recognized identification packet at all
    assert(Multimodal.decodeOggMeta(
      page(0x02, 0, 3, 0, "prose payload".getBytes("UTF-8")) ++
        page(0x04, 100, 3, 1, audioSeg(10))).isEmpty)
    // zero-rate vorbis id is invalid
    assert(Multimodal.decodeOggMeta(
      page(0x02, 0, 7, 0, vorbisId(rate = 0)) ++
        page(0x04, 100, 7, 1, audioSeg(10))).isEmpty)
    // an 'OggS'-prefixed text sniffs as ogg but cannot parse
    assert(Multimodal.decodeOggMeta(
      "OggS prose after the magic, definitely not pages".getBytes("UTF-8")).isEmpty)
  }

  test("audioMeta: Ogg rows carry page-walk facts with NULL frame count") {
    import spark.implicits._
    val vorbis = page(0x02, 0, 7, 0, vorbisId()) ++
      page(0x04, 88200, 7, 1, audioSeg(100))
    val media = Seq((1L, vorbis)).toDF("doc_id", "payload")
    val r = Multimodal.audioMeta(media).collect().head
    assert(r.getString(1) === "ogg")
    assert(r.getLong(2) === 2000L)
    assert(r.isNullAt(3), "a page stream declares no frame count")
    // (vorbisId().length + 100) bytes * 8 * 44100 / 88200
    assert(r.getLong(4) === (vorbisId().length + 100L) * 8 * 44100 / 88200)
    assert(r.getBoolean(5))
    assert(r.isNullAt(6))
  }
}
