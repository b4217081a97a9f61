package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal

/** Pins the REAL MP4/MOV metadata path: ISO BMFF boxes assembled here
  * byte by byte per the public spec (u32-BE size + fourcc, u64
  * largesize when size==1, to-end when size==0, moov/trak nesting,
  * mvhd v0/v1 timescale+duration, tkhd v0/v1 16.16 display dims) must
  * come back from [[Multimodal.decodeMp4Meta]] with exact integer
  * values, and hostile containers — lying sizes, truncations, box
  * bombs, overflowing u64 fields, zero timescales — must be refused
  * without a throw. [[Multimodal.sniffContainer]] must mirror the
  * q_mm_video_meta oracle's CASE chain on every magic family, and
  * [[Multimodal.containerMeta]] must route only parsed MP4s into the
  * non-null columns.
  */
class MultimodalMp4Spec extends AnyFunSuite with SparkSpec {

  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)

  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def box(typ: String, data: Array[Byte]): Array[Byte] =
    be32(data.length + 8L) ++ fcc(typ) ++ data

  /** mvhd version 0: fullbox header, creation/modification u32,
    * timescale u32, duration u32, then the box's remaining 76 bytes
    * (rate/volume/matrix/next-track) zeroed — real-file length. */
  private def mvhdV0(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ new Array[Byte](76))

  private def mvhdV1(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(timescale) ++ be64(duration) ++ new Array[Byte](76))

  /** tkhd version 0: fullbox header, creation/mod/trackId/reserved/
    * duration u32s, 52 bytes of reserved+layer+volume+matrix, then
    * width/height as 16.16 fixed — 84 data bytes total. */
  private def tkhdV0(w: Int, h: Int): Array[Byte] =
    box("tkhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(1) ++ be32(0) ++ be32(0) ++ new Array[Byte](52) ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))

  private def tkhdV1(w: Int, h: Int): Array[Byte] =
    box("tkhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(1) ++ be32(0) ++ be64(0) ++ new Array[Byte](52) ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))

  private val ftyp = box("ftyp", fcc("isom") ++ be32(512) ++ fcc("isomiso2"))

  /** stts: fullbox v0 + entry_count + (sample_count, sample_delta) pairs. */
  private def stts(entries: (Long, Long)*): Array[Byte] =
    box("stts", Array[Byte](0, 0, 0, 0) ++ be32(entries.length.toLong) ++
      entries.flatMap { case (c, d) => be32(c) ++ be32(d) }.toArray)

  /** stsz with a constant sample_size (no per-sample table follows). */
  private def stszFixed(size: Long, count: Long): Array[Byte] =
    box("stsz", Array[Byte](0, 0, 0, 0) ++ be32(size) ++ be32(count))

  /** stsz with sample_size 0 and one u32 per sample. */
  private def stszVar(sizes: Long*): Array[Byte] =
    box("stsz", Array[Byte](0, 0, 0, 0) ++ be32(0) ++
      be32(sizes.length.toLong) ++ sizes.flatMap(be32(_)).toArray)

  /** The spec nesting a sample table lives under: trak/mdia/minf/stbl. */
  private def mediaChain(stblLeaves: Array[Byte]): Array[Byte] =
    box("mdia", box("minf", box("stbl", stblLeaves)))

  private def stco(offsets: Long*): Array[Byte] =
    box("stco", Array[Byte](0, 0, 0, 0) ++ be32(offsets.length.toLong) ++
      offsets.flatMap(be32(_)).toArray)

  private def co64(offsets: Long*): Array[Byte] =
    box("co64", Array[Byte](0, 0, 0, 0) ++ be32(offsets.length.toLong) ++
      offsets.flatMap(be64).toArray)

  /** stsc entries as (first_chunk, samples_per_chunk); sdi fixed 1. */
  private def stsc(entries: (Long, Long)*): Array[Byte] =
    box("stsc", Array[Byte](0, 0, 0, 0) ++ be32(entries.length.toLong) ++
      entries.flatMap { case (fc, spc) =>
        be32(fc) ++ be32(spc) ++ be32(1L)
      }.toArray)

  /** stsd with one minimal (size + fourcc + pad) entry per codec. */
  private def stsd(codecs: String*): Array[Byte] =
    box("stsd", Array[Byte](0, 0, 0, 0) ++ be32(codecs.length.toLong) ++
      codecs.flatMap(c => be32(16) ++ fcc(c) ++ Array.fill[Byte](8)(0))
        .toArray)

  // timescale 600, duration 3000 -> 5000 ms; video 640x360 (3 samples
  // via per-sample stsz = 6000 bytes) + audio 0x0 (4 samples via
  // fixed-size stsz = 400 bytes)
  private lazy val moovV0: Array[Byte] =
    box("moov", mvhdV0(600, 3000) ++
      box("trak", tkhdV0(640, 360) ++
        mediaChain(stts((2L, 512L), (1L, 256L)) ++
          stszVar(1000L, 2000L, 3000L))) ++
      box("trak", tkhdV0(0, 0) ++
        mediaChain(stts((4L, 441L)) ++ stszFixed(100L, 4L))))
  private lazy val mp4V0: Array[Byte] =
    ftyp ++ moovV0 ++ box("mdat", Array.fill[Byte](32)(0x55))

  test("decodeMp4Meta: v0 mvhd/tkhd — exact duration, track count, video dims") {
    val m = Multimodal.decodeMp4Meta(mp4V0).get
    assert(m.durationMs === 5000L)
    assert(m.nTracks === 2)
    assert(m.width === 640 && m.height === 360)
    // sample tables summed across both traks: (2+1) + 4 samples,
    // (1000+2000+3000) variable + 100x4 fixed bytes
    assert(m.nSamples === 7L)
    assert(m.sampleBytes === 6400L)
  }

  test("decodeMp4Meta: a file with no sample table reports -1, not 0") {
    val bare = ftyp ++ box("moov", mvhdV0(600, 3000) ++ box("trak", tkhdV0(320, 240)))
    val m = Multimodal.decodeMp4Meta(bare).get
    assert(m.nSamples === -1L && m.sampleBytes === -1L)
  }

  test("decodeMp4Meta: hostile sample tables are refused without a scan " +
      "or a wrap") {
    def mp4With(stbl: Array[Byte]): Array[Byte] =
      ftyp ++ box("moov", mvhdV0(600, 3000) ++
        box("trak", tkhdV0(64, 64) ++ mediaChain(stbl)))
    // entry_count lying past the box: must abort BEFORE looping
    assert(Multimodal.decodeMp4Meta(mp4With(
      box("stts", Array[Byte](0, 0, 0, 0) ++ be32(0xffffffffL)))).isEmpty)
    assert(Multimodal.decodeMp4Meta(mp4With(
      box("stsz", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0xffffffffL)))).isEmpty)
    // fixed-size stsz whose size x count overflows Long: multiplyExact aborts
    assert(Multimodal.decodeMp4Meta(mp4With(
      stszFixed(0xffffffffL, 0xffffffffL))).isEmpty)
    // nonzero version bytes are refused (spec defines only version 0)
    assert(Multimodal.decodeMp4Meta(mp4With(
      box("stts", Array[Byte](1, 0, 0, 0) ++ be32(0)))).isEmpty)
    // an stts smuggled outside the stbl spine is ignored, not summed
    val smuggled = ftyp ++ box("moov", mvhdV0(600, 3000) ++
      box("trak", tkhdV0(64, 64) ++ stts((99L, 1L)) ++
        mediaChain(stts((2L, 1L)) ++ stszFixed(10L, 2L))))
    val m = Multimodal.decodeMp4Meta(smuggled).get
    assert(m.nSamples === 2L && m.sampleBytes === 20L)
  }

  test("decodeMp4Meta: stsc/stco/co64 chunk layout — total chunk count, " +
      "offset span; hostile chunk tables refused") {
    def mp4WithChunks(t1: Array[Byte], t2: Array[Byte]): Array[Byte] = {
      val body = ftyp ++ box("moov", mvhdV0(600, 3000) ++
        box("trak", tkhdV0(64, 64) ++ mediaChain(t1)) ++
        box("trak", tkhdV0(0, 0) ++ mediaChain(t2)))
      // mdat padding so every declared chunk offset lands inside the file
      body ++ box("mdat", Array.fill[Byte](600)(0x55))
    }
    val m = Multimodal.decodeMp4Meta(mp4WithChunks(
      stsc((1L, 2L), (3L, 1L)) ++ stco(40L, 140L, 300L),
      co64(500L))).get
    assert(m.nChunks === 4L)
    assert(m.chunkSpanBytes === 500L - 40L)
    // no chunk tables at all -> -1 (NULL), never 0
    val bare = Multimodal.decodeMp4Meta(mp4V0).get
    assert(bare.nChunks === -1L && bare.chunkSpanBytes === -1L)
    // stsc first_chunk not strictly increasing = lying chunk map
    assert(Multimodal.decodeMp4Meta(mp4WithChunks(
      stsc((1L, 2L), (1L, 1L)) ++ stco(40L), stco(60L))).isEmpty)
    assert(Multimodal.decodeMp4Meta(mp4WithChunks(
      stsc((0L, 2L)) ++ stco(40L), stco(60L))).isEmpty)
    // a chunk offset past end-of-payload is NOT a refusal: a moov-first
    // metadata fetch legitimately references an undownloaded mdat. The
    // layout stats degrade to unknown (-1) while every duration/track
    // fact still parses (r19 ADVICE — refusing regressed round-18
    // behavior for prefix-fetched headers)
    val prefix = Multimodal.decodeMp4Meta(mp4WithChunks(
      stco(1000000L), stco(60L))).get
    assert(prefix.nChunks === -1L && prefix.chunkSpanBytes === -1L)
    assert(prefix.durationMs === 5000L && prefix.nTracks === 2)
    // metadata-only payload: moov alone, offsets all beyond the payload
    val metaOnly = Multimodal.decodeMp4Meta(
      ftyp ++ box("moov", mvhdV0(600, 3000) ++
        box("trak", tkhdV0(64, 64) ++ mediaChain(stco(5000L, 9000L))))).get
    assert(metaOnly.nChunks === -1L && metaOnly.chunkSpanBytes === -1L)
    assert(metaOnly.durationMs === 5000L && metaOnly.nTracks === 1)
    // a NEGATIVE co64 offset (u64 wrap) is a lie in any file — refused
    assert(Multimodal.decodeMp4Meta(mp4WithChunks(
      co64(-1L), stco(60L))).isEmpty)
    // entry_count lying past the box aborts BEFORE looping; nonzero
    // version refused (spec defines only version 0)
    assert(Multimodal.decodeMp4Meta(mp4WithChunks(
      box("stco", Array[Byte](0, 0, 0, 0) ++ be32(0xffffffffL)),
      stco(60L))).isEmpty)
    assert(Multimodal.decodeMp4Meta(mp4WithChunks(
      box("co64", Array[Byte](0, 0, 0, 0) ++ be32(0xffffffffL)),
      stco(60L))).isEmpty)
    assert(Multimodal.decodeMp4Meta(mp4WithChunks(
      box("stsc", Array[Byte](0, 0, 0, 0) ++ be32(0xffffffffL)),
      stco(60L))).isEmpty)
    assert(Multimodal.decodeMp4Meta(mp4WithChunks(
      box("stco", Array[Byte](1, 0, 0, 0) ++ be32(0)), stco(60L))).isEmpty)
  }

  test("decodeMp4Meta: stsd codec fourccs surface in file order; lying " +
      "entry tables refused") {
    def mp4With(t1: Array[Byte], t2: Array[Byte]): Array[Byte] =
      ftyp ++ box("moov", mvhdV0(600, 3000) ++
        box("trak", tkhdV0(64, 64) ++ mediaChain(t1)) ++
        box("trak", tkhdV0(0, 0) ++ mediaChain(t2)))
    val m = Multimodal.decodeMp4Meta(
      mp4With(stsd("avc1"), stsd("mp4a", "Opus"))).get
    assert(m.codecs === Seq("avc1", "mp4a", "Opus"))
    // no stsd anywhere -> empty (containerMeta surfaces NULL)
    assert(Multimodal.decodeMp4Meta(mp4V0).get.codecs === Nil)
    // entry size lying past the box
    assert(Multimodal.decodeMp4Meta(mp4With(
      box("stsd", Array[Byte](0, 0, 0, 0) ++ be32(1) ++ be32(9999) ++
        fcc("avc1")), stsd("mp4a"))).isEmpty)
    // entry_count lying past the box aborts BEFORE looping
    assert(Multimodal.decodeMp4Meta(mp4With(
      box("stsd", Array[Byte](0, 0, 0, 0) ++ be32(0xffffffffL)),
      stsd("mp4a"))).isEmpty)
    // a fourcc with non-printable bytes is a lying table
    assert(Multimodal.decodeMp4Meta(mp4With(
      box("stsd", Array[Byte](0, 0, 0, 0) ++ be32(1) ++ be32(16) ++
        Array[Byte](1, 2, 3, 4) ++ Array.fill[Byte](8)(0)),
      stsd("mp4a"))).isEmpty)
    // nonzero version refused
    assert(Multimodal.decodeMp4Meta(mp4With(
      box("stsd", Array[Byte](1, 0, 0, 0) ++ be32(0)), stsd("mp4a"))).isEmpty)
  }

  test("decodeMp4Meta: stsd decoder configs — avcC profile/level/NAL " +
      "size, esds OTI + AAC AudioSpecificConfig; lying configs refused") {
    def stsdRaw(entries: Array[Byte]*): Array[Byte] =
      box("stsd", Array[Byte](0, 0, 0, 0) ++ be32(entries.length.toLong) ++
        entries.flatten.toArray)
    def avc1Entry(children: Array[Byte]): Array[Byte] =
      be32((86 + children.length).toLong) ++ fcc("avc1") ++
        Array.fill[Byte](78)(0) ++ children
    def avcC(version: Int, profile: Int, level: Int, nalM1: Int): Array[Byte] =
      box("avcC", Array[Byte](version.toByte, profile.toByte, 0,
        level.toByte, (0xFC | nalM1).toByte))
    def mp4aEntry(children: Array[Byte]): Array[Byte] =
      be32((36 + children.length).toLong) ++ fcc("mp4a") ++
        Array.fill[Byte](28)(0) ++ children
    // MPEG-4 descriptor stream: ES_Descriptor(0x03) wrapping a
    // DecoderConfigDescriptor(0x04) wrapping a DecoderSpecificInfo(0x05)
    def esds(oti: Int, asc: Array[Byte], twoByteLen: Boolean = false): Array[Byte] = {
      val dsi = if (asc.isEmpty) Array.empty[Byte]
        else Array[Byte](0x05, asc.length.toByte) ++ asc
      val dcd = Array[Byte](oti.toByte, 0x15) ++ Array.fill[Byte](11)(0) ++ dsi
      val tag4 = Array[Byte](0x04, dcd.length.toByte) ++ dcd
      val esBody = Array[Byte](0, 0, 0) ++ tag4
      val esLen = if (twoByteLen)
        Array[Byte](0x80.toByte, esBody.length.toByte)
        else Array[Byte](esBody.length.toByte)
      box("esds", Array[Byte](0, 0, 0, 0) ++
        Array[Byte](0x03) ++ esLen ++ esBody)
    }
    def mp4With(t1: Array[Byte]): Array[Byte] =
      ftyp ++ box("moov", mvhdV0(600, 3000) ++
        box("trak", tkhdV0(64, 64) ++ mediaChain(t1)))
    // AAC-LC (aot 2), 44100 (freq index 4), stereo: 00010 0100 0010 ...
    val aacLc = Array[Byte](0x12, 0x10)
    val m = Multimodal.decodeMp4Meta(mp4With(stsdRaw(
      avc1Entry(avcC(1, 100, 31, 3)), mp4aEntry(esds(0x40, aacLc))))).get
    assert(m.codecs === Seq("avc1", "mp4a"))
    assert(m.codecParams === Seq(
      "avc1:profile=100;level=31;nal=4",
      "mp4a:oti=64;aot=2;rate=44100;ch=2"))
    // hvcC (HEVC): profile_idc from byte 1's low 5 bits, tier from its
    // bit 5, level_idc byte 12, NAL length size byte 21's low 2 bits
    def hevcEntry(children: Array[Byte]): Array[Byte] =
      be32((86 + children.length).toLong) ++ fcc("hev1") ++
        Array.fill[Byte](78)(0) ++ children
    def hvcC(version: Int, tier: Int, profile: Int, level: Int,
        nalM1: Int): Array[Byte] = {
      val rec = Array.fill[Byte](22)(0)
      rec(0) = version.toByte
      rec(1) = ((tier << 5) | profile).toByte
      rec(12) = level.toByte
      rec(21) = (0xFC | nalM1).toByte
      box("hvcC", rec)
    }
    assert(Multimodal.decodeMp4Meta(mp4With(stsdRaw(
      hevcEntry(hvcC(1, 1, 2, 120, 3))))).get.codecParams ===
      Seq("hev1:profile=2;tier=1;level=120;nal=4"))
    // hvcC with a lying version, or truncated under the 22-byte record
    assert(Multimodal.decodeMp4Meta(mp4With(stsdRaw(
      hevcEntry(hvcC(0, 1, 2, 120, 3))))).isEmpty)
    assert(Multimodal.decodeMp4Meta(mp4With(stsdRaw(
      hevcEntry(box("hvcC", Array.fill[Byte](10)(1)))))).isEmpty)
    // multi-byte expandable length (high-bit continuation) parses too
    assert(Multimodal.decodeMp4Meta(mp4With(stsdRaw(mp4aEntry(
      esds(0x40, aacLc, twoByteLen = true))))).get.codecParams ===
      Seq("mp4a:oti=64;aot=2;rate=44100;ch=2"))
    // non-AAC OTI: identity surfaces without a config parse
    assert(Multimodal.decodeMp4Meta(mp4With(stsdRaw(mp4aEntry(
      esds(0x6B, Array.empty))))).get.codecParams === Seq("mp4a:oti=107"))
    // a minimal entry (no room for children) is absent params, not a lie
    val bare = Multimodal.decodeMp4Meta(mp4With(stsd("avc1", "mp4a"))).get
    assert(bare.codecs === Seq("avc1", "mp4a") && bare.codecParams === Nil)
    // avcC configurationVersion != 1 is a lying config — refused
    assert(Multimodal.decodeMp4Meta(mp4With(stsdRaw(
      avc1Entry(avcC(2, 100, 31, 3))))).isEmpty)
    // truncated avcC (under 5 config bytes) refused
    assert(Multimodal.decodeMp4Meta(mp4With(stsdRaw(
      avc1Entry(box("avcC", Array[Byte](1, 100, 0)))))).isEmpty)
    // reserved AAC sampling-frequency index (13) is a lying config
    val badAsc = Array[Byte](0x16, 0x90.toByte) // aot 2, freqIdx 13
    assert(Multimodal.decodeMp4Meta(mp4With(stsdRaw(mp4aEntry(
      esds(0x40, badAsc))))).isEmpty)
    // a child box whose size lies past its entry refuses the walk
    assert(Multimodal.decodeMp4Meta(mp4With(stsdRaw(
      avc1Entry(be32(9999) ++ fcc("avcC"))))).isEmpty)
  }

  test("decodeMp4Meta: v1 mvhd/tkhd (64-bit times) parse at their own offsets") {
    val mp4 = ftyp ++
      box("moov", mvhdV1(90000, 90000L * 123) ++ box("trak", tkhdV1(1920, 1080)))
    val m = Multimodal.decodeMp4Meta(mp4).get
    assert(m.durationMs === 123000L)
    assert(m.nTracks === 1)
    assert(m.width === 1920 && m.height === 1080)
  }

  test("decodeMp4Meta: u64 largesize and size==0 (to-end) boxes walk correctly") {
    val moov = box("moov", mvhdV0(1000, 7500) ++ box("trak", tkhdV0(320, 240)))
    val payload = Array.fill[Byte](64)(0x33)
    // mdat with largesize header (size field 1 + u64), then a trailing
    // free box written with size 0 = extends to end of file
    val mdatLarge = be32(1) ++ fcc("mdat") ++ be64(16L + payload.length) ++ payload
    val freeToEnd = be32(0) ++ fcc("free") ++ Array.fill[Byte](20)(0)
    val m = Multimodal.decodeMp4Meta(ftyp ++ moov ++ mdatLarge ++ freeToEnd).get
    assert(m.durationMs === 7500L && m.width === 320)
  }

  test("decodeMp4Meta: non-MP4 payloads and missing moov/mvhd return None") {
    assert(Multimodal.decodeMp4Meta("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeMp4Meta(ftyp).isEmpty) // no moov
    assert(Multimodal.decodeMp4Meta(
      ftyp ++ box("moov", box("trak", tkhdV0(640, 360)))).isEmpty) // no mvhd
  }

  test("decodeMp4Meta: lying sizes, truncations and short leaf boxes are " +
      "refused without a throw") {
    // a moov whose size points past the payload
    val lying = mp4V0.clone()
    val moovAt = lying.indices.find(i => i + 4 <= lying.length &&
      new String(lying, i, 4, "US-ASCII") == "moov").get - 4
    lying(moovAt) = 0x7f.toByte
    assert(Multimodal.decodeMp4Meta(lying).isEmpty)
    // every truncation of the valid file either refuses (mid-box cut)
    // or IS a valid shorter file — a cut at a top-level box boundary
    // after moov, plus up to 7 trailing bytes (a fragment smaller than
    // a box header is ignored, the RIFF walk's lenience) — and never
    // throws
    val moovEnd = ftyp.length + moovV0.length
    (0 until mp4V0.length).foreach { n =>
      val got = Multimodal.decodeMp4Meta(mp4V0.take(n))
      val validCut = n >= moovEnd && n < moovEnd + 8
      assert(got.isEmpty || validCut,
        s"truncation at $n must refuse, got $got")
    }
    // an mvhd too short for its declared version
    val short = ftyp ++ box("moov",
      box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0)))
    assert(Multimodal.decodeMp4Meta(short).isEmpty)
  }

  test("decodeMp4Meta: leaves bind to their spec parents — an mvhd " +
      "nested inside trak cannot overwrite the movie header") {
    // hostile: valid moov/mvhd (5000 ms), then a trak smuggling a second
    // mvhd with timescale 1 / duration 999999 — parent binding must keep
    // the real header's values and not count nested traks
    val smuggled = ftyp ++
      box("moov", mvhdV0(600, 3000) ++
        box("trak", tkhdV0(640, 360) ++ mvhdV0(1, 999999) ++
          box("trak", tkhdV0(9999, 9999))))
    val m = Multimodal.decodeMp4Meta(smuggled).get
    assert(m.durationMs === 5000L, "smuggled mvhd must not win")
    assert(m.nTracks === 1, "nested trak must not count")
    assert(m.width === 640 && m.height === 360,
      "nested trak's tkhd must not contribute dims")
  }

  test("decodeMp4Meta: box bombs past MaxBoxDepth are refused without " +
      "a StackOverflowError") {
    var inner = mvhdV0(600, 600)
    for (_ <- 1 to 5000) inner = box("moov", inner)
    assert(Multimodal.decodeMp4Meta(ftyp ++ inner).isEmpty)
  }

  test("decodeMp4Meta: zero timescale and Long-overflowing durations abort " +
      "instead of wrapping") {
    assert(Multimodal.decodeMp4Meta(
      ftyp ++ box("moov", mvhdV0(0, 3000))).isEmpty)
    // duration near Long.Max: multiplyExact(d, 1000) overflows -> None
    assert(Multimodal.decodeMp4Meta(
      ftyp ++ box("moov", mvhdV1(600, Long.MaxValue / 2))).isEmpty)
    // u64 largesize beyond Long.MaxValue is refused, not wrapped
    val evil = be32(1) ++ fcc("mdat") ++
      Array.fill[Byte](8)(0xff.toByte)
    assert(Multimodal.decodeMp4Meta(ftyp ++ evil).isEmpty)
  }

  test("sniffContainer mirrors the oracle CASE chain on every magic family") {
    assert(Multimodal.sniffContainer(mp4V0) === "mp4")
    assert(Multimodal.sniffContainer(
      fcc("RIFF") ++ be32(0) ++ fcc("AVI ")) === "avi")
    assert(Multimodal.sniffContainer(
      fcc("RIFF") ++ be32(0) ++ fcc("WAVE")) === "wav")
    assert(Multimodal.sniffContainer(fcc("GIF89a")) === "gif")
    assert(Multimodal.sniffContainer(fcc("GIF87a")) === "gif")
    assert(Multimodal.sniffContainer(
      Array(0x89.toByte) ++ fcc("PNG")) === "png")
    assert(Multimodal.sniffContainer(
      Array(0xff.toByte, 0xd8.toByte)) === "jpeg")
    assert(Multimodal.sniffContainer(fcc("BMxx")) === "bmp")
    assert(Multimodal.sniffContainer(fcc("fLaC") ++ Array[Byte](0)) === "flac")
    assert(Multimodal.sniffContainer(fcc("OggS") ++ Array[Byte](0)) === "ogg")
    assert(Multimodal.sniffContainer(Array(0x1a.toByte, 0x45.toByte,
      0xdf.toByte, 0xa3.toByte)) === "mkv")
    assert(Multimodal.sniffContainer(fcc("ID3") ++ Array[Byte](4, 0, 0)) === "mp3")
    // layer-bits-00 sync pairs are ADTS AAC, carved out before mp3
    assert(Multimodal.sniffContainer(
      Array(0xff.toByte, 0xf1.toByte, 0x50.toByte)) === "aac")
    assert(Multimodal.sniffContainer(
      Array(0xff.toByte, 0xf9.toByte)) === "aac")
    assert(Multimodal.sniffContainer(
      Array(0xff.toByte, 0xfb.toByte, 0x90.toByte)) === "mp3")
    assert(Multimodal.sniffContainer(
      Array(0xff.toByte, 0xe2.toByte)) === "mp3")
    // FF with the sync bits NOT all set is no container at all
    assert(Multimodal.sniffContainer(
      Array(0xff.toByte, 0x7f.toByte)) === "none")
    assert(Multimodal.sniffContainer("plain text".getBytes) === "none")
    assert(Multimodal.sniffContainer(Array.emptyByteArray) === "none")
    // precedence: ftyp at 4 wins even when byte 0 collides with another
    // family ('B','M' prefix + ftyp at 4 must sniff mp4, like the SQL)
    assert(Multimodal.sniffContainer(fcc("BMxx") ++ fcc("ftyp")) === "mp4")
  }

  test("containerMeta: parsed MP4s carry real header facts; everything " +
      "else carries nulls with its sniffed family") {
    import spark.implicits._
    val media = Seq(
      (1L, mp4V0),
      (2L, ftyp), // sniffs mp4 but has no moov: parse fails, nulls
      (3L, "just prose".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val rows = Multimodal.containerMeta(media.repartition(2)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getString(1) === "mp4")
    assert(rows(1L).getLong(2) === 5000L && rows(1L).getLong(3) === 2L)
    assert(rows(1L).getLong(4) === 640L && rows(1L).getLong(5) === 360L)
    // sample-table columns: 7 samples, 6400 bytes, 6400*8*1000/5000 bps
    assert(rows(1L).getLong(6) === 7L)
    assert(rows(1L).getLong(7) === 6400L)
    assert(rows(1L).getLong(8) === 10240L)
    // mp4V0 declares samples but no chunk/stsd tables: those columns NULL
    assert(rows(1L).isNullAt(9) && rows(1L).isNullAt(10) && rows(1L).isNullAt(11))
    assert(rows(2L).getString(1) === "mp4")
    assert(rows(2L).isNullAt(2) && rows(2L).isNullAt(3))
    assert(rows(3L).getString(1) === "none")
    assert((2 to 11).forall(rows(3L).isNullAt))
    // a parsed MP4 without any stbl carries NULL sample columns, not 0
    val bare = ftyp ++ box("moov", mvhdV0(600, 3000) ++ box("trak", tkhdV0(320, 240)))
    val r = Multimodal.containerMeta(Seq((9L, bare)).toDF("doc_id", "payload"))
      .collect().head
    assert(r.getLong(2) === 5000L)
    assert((6 to 11).forall(r.isNullAt))
    // an stsd-carrying file surfaces the comma-joined codec identities
    val withCodecs = ftyp ++ box("moov", mvhdV0(600, 3000) ++
      box("trak", tkhdV0(64, 64) ++ mediaChain(stsd("avc1", "mp4a"))))
    val rc = Multimodal.containerMeta(
      Seq((10L, withCodecs)).toDF("doc_id", "payload")).collect().head
    assert(rc.getString(11) === "avc1,mp4a")
  }
}
