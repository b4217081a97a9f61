package graft

import graft.ext.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** ADTS (raw AAC) frame walk: byte-assembled frames pin the public
  * ISO 13818-7 header layout — syncword + layer-00 routing (vs the MP3
  * sniff), 13-bit frame length (header included), raw-data-block
  * sample accounting, CRC header sizing, the constant
  * rate/channel/profile rule, and the hostile-input refusals. */
class MultimodalAdtsSpec extends AnyFunSuite {

  /** One ADTS frame of `len` total bytes (header included), defaults:
    * MPEG-4 (id 0), no CRC, AAC-LC (profile 1), 44100 (freq index 4),
    * stereo, one raw data block. */
  private def frame(len: Int, freqIdx: Int = 4, profile: Int = 1,
      chan: Int = 2, blocks: Int = 1, protAbsent: Int = 1,
      id: Int = 0): Array[Byte] = {
    val f = Array.fill[Byte](len)(0x33)
    f(0) = 0xFF.toByte
    f(1) = (0xF0 | (id << 3) | protAbsent).toByte
    f(2) = ((profile << 6) | (freqIdx << 2) | ((chan >> 2) & 1)).toByte
    f(3) = (((chan & 3) << 6) | ((len >> 11) & 3)).toByte
    f(4) = ((len >> 3) & 0xFF).toByte
    f(5) = ((len & 7) << 5).toByte
    f(6) = (blocks - 1).toByte
    f
  }

  test("decodeAdtsMeta: constant-length stream — exact frame count, " +
      "duration, mean bitrate; not VBR") {
    val m = Multimodal.decodeAdtsMeta(
      Array.concat(frame(256), frame(256), frame(256))).get
    assert(m.nFrames === 3L && m.sampleRate === 44100 && m.channels === 2)
    assert(m.profile === 1)
    // 3 x 1024 samples at 44100; 768 bytes over 3072 samples
    assert(m.durationMs === 3L * 1024 * 1000 / 44100)
    assert(m.bitrateBps === 768L * 8 * 44100 / 3072)
    assert(!m.vbr)
  }

  test("decodeAdtsMeta: varying frame lengths mark VBR; raw-data-block " +
      "count scales the sample accounting; CRC widens the header") {
    val v = Multimodal.decodeAdtsMeta(
      Array.concat(frame(256), frame(300), frame(256))).get
    assert(v.vbr && v.nFrames === 3L)
    // two raw data blocks per frame = 2048 samples per frame
    val b = Multimodal.decodeAdtsMeta(
      Array.concat(frame(256, blocks = 2), frame(256, blocks = 2))).get
    assert(b.durationMs === 2L * 2048 * 1000 / 44100)
    // CRC present (protection_absent 0): 9-byte header parses...
    val c = Multimodal.decodeAdtsMeta(
      Array.concat(frame(256, protAbsent = 0), frame(256, protAbsent = 0))).get
    assert(c.nFrames === 2L)
    // ...and a frame shorter than its own 9-byte header is a lie
    assert(Multimodal.decodeAdtsMeta(frame(8, protAbsent = 0)).isEmpty)
    // trailing fragment smaller than one header is ignored
    val t = Multimodal.decodeAdtsMeta(
      Array.concat(frame(256), frame(256), Array[Byte](0xFF.toByte, 0xF1.toByte, 0))).get
    assert(t.nFrames === 2L)
  }

  test("decodeAdtsMeta: hostile streams are refused without a throw") {
    // mid-stream sample-rate / channel / profile / version changes
    assert(Multimodal.decodeAdtsMeta(
      Array.concat(frame(256), frame(256, freqIdx = 3))).isEmpty)
    assert(Multimodal.decodeAdtsMeta(
      Array.concat(frame(256), frame(256, chan = 1))).isEmpty)
    assert(Multimodal.decodeAdtsMeta(
      Array.concat(frame(256), frame(256, profile = 2))).isEmpty)
    assert(Multimodal.decodeAdtsMeta(
      Array.concat(frame(256), frame(256, id = 1))).isEmpty)
    // reserved (13, 14) and forbidden (15) sampling frequency indexes
    assert(Multimodal.decodeAdtsMeta(frame(256, freqIdx = 13)).isEmpty)
    assert(Multimodal.decodeAdtsMeta(frame(256, freqIdx = 15)).isEmpty)
    // frame length lying past end-of-payload
    assert(Multimodal.decodeAdtsMeta(frame(256).take(100)).isEmpty)
    // frame length smaller than the 7-byte headerless minimum
    assert(Multimodal.decodeAdtsMeta(frame(256, protAbsent = 1)
      .patch(3, Array[Byte]((2 << 6).toByte), 1).patch(4, Array[Byte](0), 1)
      .patch(5, Array[Byte]((3 << 5).toByte), 1)).isEmpty)
  }

  test("sniff routes layer-00 syncs to aac, nonzero layers to mp3; " +
      "audioMeta surfaces the walk") {
    assert(Multimodal.sniffContainer(frame(256)) === "aac")
    assert(Multimodal.sniffContainer(frame(256, protAbsent = 0)) === "aac")
    assert(Multimodal.sniffContainer(frame(256, id = 1)) === "aac")
    // an MP3 frame (layer bits nonzero) still sniffs mp3: FF FB
    assert(Multimodal.sniffContainer(
      Array[Byte](0xFF.toByte, 0xFB.toByte, 0, 0)) === "mp3")
    // an ADTS payload cannot enter the MP3 walk (layer 00 refused there)
    assert(Multimodal.decodeMp3Meta(frame(256)).isEmpty)
  }
}
