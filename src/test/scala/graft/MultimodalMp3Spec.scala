package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal

/** Pins the REAL MPEG-audio metadata path: MP3 frames assembled here
  * byte by byte per the public header layout (11 sync bits, version /
  * layer / bitrate-index / sample-rate-index / padding fields, the ISO
  * 11172-3 bitrate and sample-rate tables, Layer-specific frame sizing)
  * must come back from [[Multimodal.decodeMp3Meta]] with exact integer
  * durations and mean bitrates, and hostile streams — free-format or
  * invalid bitrate indices, reserved version/layer/sample-rate bits,
  * truncated frames, mid-stream rate changes, lying ID3 sizes — must be
  * refused without a throw. [[Multimodal.audioMeta]] must route parsed
  * MP3s and PCM WAVs into the real columns and everything else to NULL.
  */
class MultimodalMp3Spec extends AnyFunSuite with SparkSpec {

  /** One frame: 4-byte header + junk body out to the length the header
    * declares. b1/b2 are the second and third header bytes (the first
    * is always 0xFF sync, the fourth carries channel mode the walk
    * ignores). */
  private def frame(b1: Int, b2: Int, frameLen: Int): Array[Byte] = {
    val a = Array.fill[Byte](frameLen)(0x11)
    a(0) = 0xff.toByte; a(1) = b1.toByte; a(2) = b2.toByte; a(3) = 0x00
    a
  }

  // MPEG1 Layer III, 44100 Hz: b1 = sync|ver3|layer1|noCRC = FB;
  // 128 kbps = brIdx 9 -> b2 90 (417 bytes), padded 92 (418),
  // 160 kbps = brIdx 10 -> b2 A0 (522 bytes)
  private def v1l3_128(pad: Boolean = false): Array[Byte] =
    if (pad) frame(0xfb, 0x92, 418) else frame(0xfb, 0x90, 417)
  private def v1l3_160: Array[Byte] = frame(0xfb, 0xa0, 522)

  /** ID3v2 header + `tagBytes` of tag body (+ footer when flagged). */
  private def id3v2(tagBytes: Int, footer: Boolean = false): Array[Byte] =
    Array[Byte]('I', 'D', '3', 3, 0, if (footer) 0x10 else 0,
      ((tagBytes >> 21) & 0x7f).toByte, ((tagBytes >> 14) & 0x7f).toByte,
      ((tagBytes >> 7) & 0x7f).toByte, (tagBytes & 0x7f).toByte) ++
      Array.fill[Byte](tagBytes + (if (footer) 10 else 0))(0x22)

  test("decodeMp3Meta: CBR MPEG1 Layer III — exact frame count, duration, " +
      "mean bitrate") {
    val mp3 = Array.concat(Seq.fill(10)(v1l3_128()): _*)
    val m = Multimodal.decodeMp3Meta(mp3).get
    assert(m.nFrames === 10L)
    assert(m.sampleRate === 44100)
    // 10 x 1152 samples -> 11520000/44100 ms; 4170 bytes -> mean bps =
    // 4170*8*44100/11520, both floor-exact
    assert(m.durationMs === 261L)
    assert(m.bitrateBps === 127706L)
    assert(!m.vbr)
  }

  test("decodeMp3Meta: padding bit lengthens the frame by one byte; " +
      "mixed bitrates flag VBR") {
    val padded = Array.concat(v1l3_128(), v1l3_128(pad = true), v1l3_128())
    val mPad = Multimodal.decodeMp3Meta(padded).get
    assert(mPad.nFrames === 3L && !mPad.vbr)
    val vbr = Array.concat(v1l3_128(), v1l3_160, v1l3_128())
    val mVbr = Multimodal.decodeMp3Meta(vbr).get
    assert(mVbr.nFrames === 3L && mVbr.vbr)
    // 1356 bytes, 3456 samples: 1356*8*44100/3456 (exact)
    assert(mVbr.bitrateBps === 138425L)
  }

  test("decodeMp3Meta: MPEG2 Layer III (576 samples/frame) and MPEG1 " +
      "Layer I (384, 4-byte slots) size and time by their own tables") {
    // MPEG2 L3: ver bits 2, 64 kbps (brIdx 8), 24000 Hz (srIdx 1) ->
    // 72*64000/24000 = 192 bytes, 576 samples per frame
    val v2 = Array.concat(Seq.fill(5)(frame(0xf3, 0x84, 192)): _*)
    val m2 = Multimodal.decodeMp3Meta(v2).get
    assert(m2.nFrames === 5L && m2.sampleRate === 24000)
    assert(m2.durationMs === 2880L * 1000 / 24000)
    assert(m2.bitrateBps === 960L * 8 * 24000 / 2880)
    // MPEG1 L1: layer bits 3, 32 kbps (brIdx 1), 32000 Hz (srIdx 2) ->
    // (12*32000/32000)*4 = 48 bytes, 384 samples per frame
    val l1 = Array.concat(Seq.fill(4)(frame(0xff, 0x18, 48)): _*)
    val m1 = Multimodal.decodeMp3Meta(l1).get
    assert(m1.nFrames === 4L && m1.sampleRate === 32000)
    assert(m1.durationMs === 1536L * 1000 / 32000)
  }

  test("decodeMp3Meta: MPEG1 Layer II (1152 samples, byte slots, v1l2 " +
      "table) sizes and times by its own table") {
    // MPEG1 L2: layer bits 2 -> b1 FD; 192 kbps = v1l2 idx 10 -> b2 A0,
    // 44100 Hz -> 144*192000/44100 = 626 bytes, 1152 samples per frame
    val l2 = Array.concat(Seq.fill(4)(frame(0xfd, 0xa0, 626)): _*)
    val m = Multimodal.decodeMp3Meta(l2).get
    assert(m.nFrames === 4L && m.sampleRate === 44100)
    assert(m.durationMs === 4608L * 1000 / 44100)
    assert(m.bitrateBps === 2504L * 8 * 44100 / 4608)
    assert(!m.vbr && m.xingFrames === -1L)
  }

  /** A first frame carrying a Xing/Info block: MPEG1 L3 stereo, no CRC
    * -> the block sits at 4 + 32 bytes; flags declare frames (+bytes). */
  private def xingFrame(tag: String, declaredFrames: Int,
      flags: Int = 0x3): Array[Byte] = {
    val f = v1l3_128()
    tag.getBytes("ISO-8859-1").copyToArray(f, 36)
    f(40) = ((flags >> 24) & 0xff).toByte; f(41) = ((flags >> 16) & 0xff).toByte
    f(42) = ((flags >> 8) & 0xff).toByte; f(43) = (flags & 0xff).toByte
    f(44) = ((declaredFrames >> 24) & 0xff).toByte
    f(45) = ((declaredFrames >> 16) & 0xff).toByte
    f(46) = ((declaredFrames >> 8) & 0xff).toByte
    f(47) = (declaredFrames & 0xff).toByte
    // byte-count field (flag 2) left zero — the walk doesn't read it
    f
  }

  test("decodeMp3Meta: a Xing first frame is metadata — excluded from " +
      "the audio accounting, its count validated, VBR marked") {
    // Xing + 3 audio frames that happen to share one bitrate: the walk
    // alone would read CBR, the Xing tag says VBR
    val vbrStream = Array.concat(
      xingFrame("Xing", 3), v1l3_128(), v1l3_128(), v1l3_128())
    val m = Multimodal.decodeMp3Meta(vbrStream).get
    assert(m.nFrames === 3L && m.xingFrames === 3L && m.vbr)
    // duration/bitrate over the AUDIO frames only (3 x 1152 / 3 x 417)
    assert(m.durationMs === 3456L * 1000 / 44100)
    assert(m.bitrateBps === 1251L * 8 * 44100 / 3456)
    // Info = CBR encoder stamp: recognized, not VBR
    val cbr = Multimodal.decodeMp3Meta(Array.concat(
      xingFrame("Info", 2), v1l3_128(), v1l3_128())).get
    assert(cbr.nFrames === 2L && cbr.xingFrames === 2L && !cbr.vbr)
    // nFrames + 1 is the OTHER real-encoder convention (count includes
    // the Xing frame itself) — accepted, not a lie (r19 ADVICE)
    val incl = Multimodal.decodeMp3Meta(Array.concat(
      xingFrame("Xing", 3), v1l3_128(), v1l3_128())).get
    assert(incl.nFrames === 2L && incl.xingFrames === 3L && incl.vbr)
    // declared frame count disagreeing with the walk beyond that
    // off-by-one = truncated/lying
    assert(Multimodal.decodeMp3Meta(Array.concat(
      xingFrame("Xing", 5), v1l3_128(), v1l3_128())).isEmpty)
    assert(Multimodal.decodeMp3Meta(Array.concat(
      xingFrame("Xing", 1), v1l3_128(), v1l3_128())).isEmpty)
    // flags declaring a TOC that cannot fit inside the frame = lying
    // header: MPEG1 L3 32 kbps @ 48000 is a 96-byte frame, 36 + 8 + 4 +
    // 100 bytes of declared fields overflow it
    val tiny = frame(0xfb, 0x14, 96)
    "Xing".getBytes("ISO-8859-1").copyToArray(tiny, 36)
    tiny(43) = 0x5 // frames + TOC
    // follow-up audio frame at the SAME 48000 Hz so the only refusal
    // cause is the overflowing declared fields
    assert(Multimodal.decodeMp3Meta(
      tiny ++ frame(0xfb, 0x94, 384)).isEmpty)
  }

  test("decodeMp3Meta: ID3v2 tags skip by synchsafe size (footer " +
      "included); a trailing ID3v1 block is tolerated at exactly EOF") {
    val frames = Array.concat(Seq.fill(3)(v1l3_128()): _*)
    assert(Multimodal.decodeMp3Meta(id3v2(200) ++ frames).get.nFrames === 3L)
    assert(Multimodal.decodeMp3Meta(
      id3v2(200, footer = true) ++ frames).get.nFrames === 3L)
    val id3v1 = fccTag()
    assert(Multimodal.decodeMp3Meta(frames ++ id3v1).get.nFrames === 3L)
    // sub-header trailing fragments are ignored, the RIFF-walk lenience
    assert(Multimodal.decodeMp3Meta(
      frames ++ Array[Byte](1, 2, 3)).get.nFrames === 3L)
    // but an ID3v1 block NOT at exactly EOF is a broken stream
    assert(Multimodal.decodeMp3Meta(
      frames ++ id3v1 ++ Array[Byte](0)).isEmpty)
  }

  private def fccTag(): Array[Byte] = {
    val t = Array.fill[Byte](128)(0x20)
    t(0) = 'T'; t(1) = 'A'; t(2) = 'G'
    t
  }

  test("decodeMp3Meta: hostile streams are refused without a throw") {
    // free-format (brIdx 0) cannot be sized from the header
    assert(Multimodal.decodeMp3Meta(frame(0xfb, 0x00, 417)).isEmpty)
    // invalid bitrate index 15, reserved sample-rate index 3
    assert(Multimodal.decodeMp3Meta(frame(0xfb, 0xf0, 417)).isEmpty)
    assert(Multimodal.decodeMp3Meta(frame(0xfb, 0x9c, 417)).isEmpty)
    // reserved version (bits 01) and reserved layer (bits 00)
    assert(Multimodal.decodeMp3Meta(frame(0xeb, 0x90, 417)).isEmpty)
    assert(Multimodal.decodeMp3Meta(frame(0xf9, 0x90, 417)).isEmpty)
    // truncated final frame
    assert(Multimodal.decodeMp3Meta(
      (v1l3_128() ++ v1l3_128()).dropRight(10)).isEmpty)
    // mid-stream sample-rate change (44100 -> 48000, brIdx 9: 417/383)
    assert(Multimodal.decodeMp3Meta(
      v1l3_128() ++ frame(0xfb, 0x94, 384)).isEmpty)
    // mid-stream LAYER change at the same 44100 rate (L3 -> L2): a
    // crafted mixed-layer stream must refuse, not mislabel vbr
    assert(Multimodal.decodeMp3Meta(
      v1l3_128() ++ frame(0xfd, 0xa0, 626)).isEmpty)
    // ID3 with a non-synchsafe size byte, and ID3 with no frames at all
    val badSize = id3v2(10)
    badSize(6) = 0x80.toByte
    assert(Multimodal.decodeMp3Meta(badSize ++ v1l3_128()).isEmpty)
    assert(Multimodal.decodeMp3Meta(
      "ID3 but just prose after it".getBytes("UTF-8")).isEmpty)
    // a WAV payload never enters the walk (sniff routes it away)
    assert(Multimodal.decodeMp3Meta(wav(64)).isEmpty)
  }

  private def wav(nFrames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = Array.tabulate[Byte](nFrames * 2)(i => (i * 7).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** One default-shape ADTS frame (MPEG-4, no CRC, AAC-LC, 44100,
    * stereo) — the MultimodalAdtsSpec builder's happy case, inlined for
    * the surface-routing row. */
  private def adtsFrame(len: Int): Array[Byte] = {
    val f = Array.fill[Byte](len)(0x33)
    f(0) = 0xFF.toByte; f(1) = 0xF1.toByte
    f(2) = ((1 << 6) | (4 << 2)).toByte
    f(3) = ((2 << 6) | ((len >> 11) & 3)).toByte
    f(4) = ((len >> 3) & 0xFF).toByte
    f(5) = ((len & 7) << 5).toByte
    f(6) = 0
    f
  }

  /** Minimal audio-only WebM: EBML(DocType webm) + Segment(Info with a
    * 4-byte-float Duration at the default TimestampScale, Tracks with
    * one A_OPUS entry). */
  private def webmAudio(durTicks: Float): Array[Byte] = {
    def el(id: Array[Int], data: Array[Byte]): Array[Byte] =
      id.map(_.toByte) ++ Array((data.length | 0x80).toByte) ++ data
    val f4 = {
      val b = java.lang.Float.floatToRawIntBits(durTicks)
      (1 to 4).map(i => ((b >> (8 * (4 - i))) & 0xff).toByte).toArray
    }
    el(Array(0x1A, 0x45, 0xDF, 0xA3),
      el(Array(0x42, 0x82), "webm".getBytes("US-ASCII"))) ++
      el(Array(0x18, 0x53, 0x80, 0x67),
        el(Array(0x15, 0x49, 0xA9, 0x66), el(Array(0x44, 0x89), f4)) ++
          el(Array(0x16, 0x54, 0xAE, 0x6B),
            el(Array(0xAE), el(Array(0x86), "A_OPUS".getBytes("US-ASCII")))))
  }

  test("audioMeta: parsed MP3s carry frame-walk facts, PCM WAVs carry " +
      "header facts, everything else carries nulls with its family") {
    import spark.implicits._
    val media = Seq(
      (1L, Array.concat(Seq.fill(10)(v1l3_128()): _*)),
      (2L, wav(800)),
      (3L, "just prose".getBytes("UTF-8")),
      (4L, "ID3 but prose".getBytes("UTF-8")),
      (5L, Array.concat(xingFrame("Xing", 2), v1l3_128(), v1l3_160)),
      (6L, Array.concat(adtsFrame(256), adtsFrame(256))),
      (7L, webmAudio(250.0f)))
      .toDF("doc_id", "payload")
    val rows = Multimodal.audioMeta(media.repartition(2)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getString(1) === "mp3")
    assert(rows(1L).getLong(2) === 261L && rows(1L).getLong(3) === 10L)
    assert(rows(1L).getLong(4) === 127706L && !rows(1L).getBoolean(5))
    assert(rows(1L).isNullAt(6), "no Xing header -> xing_frames null")
    // WAV: 800 frames at 8000 Hz mono 16-bit -> 100 ms, PCM 128000 bps
    assert(rows(2L).getString(1) === "wav")
    assert(rows(2L).getLong(2) === 100L && rows(2L).getLong(3) === 800L)
    assert(rows(2L).getLong(4) === 128000L && !rows(2L).getBoolean(5))
    assert(rows(2L).isNullAt(6))
    assert(rows(3L).getString(1) === "none")
    assert((2 to 6).forall(rows(3L).isNullAt))
    // sniffs mp3 (ID3 magic) but the walk refuses: family kept, nulls
    assert(rows(4L).getString(1) === "mp3")
    assert((2 to 6).forall(rows(4L).isNullAt))
    // Xing-stamped VBR stream: declared count surfaces, meta frame
    // excluded from the audio figures
    assert(rows(5L).getString(1) === "mp3")
    assert(rows(5L).getLong(3) === 2L && rows(5L).getBoolean(5))
    assert(rows(5L).getLong(6) === 2L)
    // ADTS: 2 x 1024 samples at 44100, 512 bytes -> 46 ms, 88200 bps
    assert(rows(6L).getString(1) === "aac")
    assert(rows(6L).getLong(2) === 2L * 1024 * 1000 / 44100)
    assert(rows(6L).getLong(3) === 2L)
    assert(rows(6L).getLong(4) === 512L * 8 * 44100 / 2048)
    assert(!rows(6L).getBoolean(5) && rows(6L).isNullAt(6))
    // WebM audio: the declared container duration surfaces; frame and
    // bitrate facts live inside the codec -> null
    assert(rows(7L).getString(1) === "mkv")
    assert(rows(7L).getLong(2) === 250L)
    assert((3 to 6).forall(rows(7L).isNullAt))
  }
}
