package graft

import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal

/** Hostile-input fuzz for EVERY multimodal decoder (round-15 hardening,
  * generalizing the round-14 hostile-GIF refusal): random bytes,
  * truncated real payloads, and adversarial headers must never throw
  * past the fallback, never trigger a raster allocation beyond
  * [[Multimodal.MaxGifPixels]] (refusal happens on header-declared dims
  * BEFORE any pixel decode), and always land in the documented fallback
  * (None / stub path). Deterministic: scalacheck generators sampled at
  * fixed seeds, same compromise as AsOfPropertySpec. */
class MultimodalFuzzSpec extends AnyFunSuite with SparkSpec {

  // ---- real payloads to truncate/mutate ----------------------------------

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x336699)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def bmp(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  private def gif(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "gif", bos)
    bos.toByteArray
  }

  private def wav(nFrames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = Array.tabulate[Byte](nFrames * 2)(i => (i * 7).toByte)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Every decoder, applied to one payload; throwing fails the test. */
  private def driveAll(payload: Array[Byte]): Unit = {
    Multimodal.decodeImage(payload)
    Multimodal.decodeAudio(payload)
    Multimodal.decodeGifFrames(payload)
    Multimodal.decodeAviFrames(payload)
    Multimodal.decodeMp4Meta(payload)
    Multimodal.decodeMkvMeta(payload)
    Multimodal.decodeMp3Meta(payload)
    Multimodal.decodeAdtsMeta(payload)
    Multimodal.decodeFlacMeta(payload)
    Multimodal.decodeOggMeta(payload)
    Multimodal.sniffContainer(payload)
    Multimodal.decodeStub(payload)
    ()
  }

  private def sampled[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("random and mutated bytes never throw from any decoder") {
    // a small real MP3 stream (3 CBR MPEG1 Layer-III frames) joins the
    // mutation bases so the frame walk sees corrupted headers too
    val mp3 = Array.concat(Seq.fill(3) {
      val f = Array.fill[Byte](417)(0x11)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte; f(2) = 0x90.toByte; f(3) = 0
      f
    }: _*)
    val bases = Seq(png(5, 4), bmp(6, 3), gif(4, 4), wav(64), mp3)
    val genRandom = Gen.choose(0, 512).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Int.MinValue, Int.MaxValue).map(_.toByte)))
    (1L to 40L).foreach { s =>
      driveAll(sampled(genRandom, s).toArray)
    }
    // truncations of every real payload (headers cut mid-field included)
    bases.foreach { b =>
      (0 to 24) ++ Seq(b.length / 2, b.length - 1) foreach { n =>
        driveAll(b.take(n))
      }
    }
    // single-byte mutations at fuzzed offsets: valid magic, corrupt body
    val genOff = Gen.choose(0, 1 << 16)
    bases.foreach { b =>
      (100L to 160L).foreach { s =>
        val m = b.clone()
        val off = sampled(genOff, s) % m.length
        m(off) = (m(off) ^ sampled(Gen.choose(1, 255), s + 1)).toByte
        driveAll(m)
      }
    }
  }

  test("hostile single-image headers (giant declared dims) are refused " +
      "before any raster allocation") {
    // BMP: BITMAPINFOHEADER width/height are LE int32 at offsets 18/22
    val hostileBmp = bmp(6, 3).clone()
    def putLE(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = v.toByte; a(off + 1) = (v >> 8).toByte
      a(off + 2) = (v >> 16).toByte; a(off + 3) = (v >> 24).toByte
    }
    putLE(hostileBmp, 18, 40000)
    putLE(hostileBmp, 22, 40000)
    assert(Multimodal.decodeImage(hostileBmp).isEmpty)

    // PNG: IHDR width/height are BE int32 at offsets 16/20; the declared
    // raster must be refused whether the reader trips on the stale CRC
    // or not — either way: None, no allocation, no throw
    val hostilePng = png(5, 4).clone()
    def putBE(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = (v >> 24).toByte; a(off + 1) = (v >> 16).toByte
      a(off + 2) = (v >> 8).toByte; a(off + 3) = v.toByte
    }
    putBE(hostilePng, 16, 40000)
    putBE(hostilePng, 20, 40000)
    assert(Multimodal.decodeImage(hostilePng).isEmpty)

    // zero/negative declared dims
    putLE(hostileBmp, 18, 0)
    assert(Multimodal.decodeImage(hostileBmp).isEmpty)

    // the good path still decodes after the guard
    assert(Multimodal.decodeImage(png(5, 4)).exists(_._1 == 5))
    assert(Multimodal.decodeImage(bmp(6, 3)).exists(_._2 == 3))
  }

  test("hostile WAV headers never throw; undecodable forms fall to None") {
    val good = wav(64)
    assert(Multimodal.decodeAudio(good).isDefined)
    // fmt chunk of a canonical WAV: channels LE16 at 22, sample rate
    // LE32 at 24, bits-per-sample LE16 at 34
    def mut(off: Int, lo: Int, hi: Int): Array[Byte] = {
      val m = good.clone()
      m(off) = lo.toByte; m(off + 1) = hi.toByte
      m
    }
    Seq(
      mut(22, 0, 0),      // zero channels
      mut(22, 0xff, 0x7f),// 32767 channels
      mut(34, 0, 0),      // zero bits per sample
      mut(34, 64, 0),     // 64-bit PCM (unsupported)
      mut(24, 0, 0)       // sample rate low bytes zeroed
    ).foreach { m =>
      Multimodal.decodeAudio(m) // must not throw; None or bounded is fine
    }
  }

  test("DataFrame operators run to completion over a hostile corpus") {
    val payloads: Seq[Array[Byte]] =
      Seq(png(5, 4), bmp(6, 3), gif(4, 4), wav(64),
        Array.emptyByteArray,
        Array.fill[Byte](257)(0x41),
        png(5, 4).take(9), gif(4, 4).take(7)) ++
        (200L to 210L).map(s => sampled(
          Gen.listOfN(128, Gen.choose(Int.MinValue, Int.MaxValue)
            .map(_.toByte)), s).toArray)
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        payloads.zipWithIndex.map { case (p, i) => Row(i.toLong, p) }, 2),
      schema)
    assert(Multimodal.extractFeatures(df).count() == payloads.length)
    assert(Multimodal.resizeTo(df, 3).count() == payloads.length)
    // perceptualHash/audioFingerprint skip empty payloads by contract
    assert(Multimodal.perceptualHash(df).count() == payloads.length - 1)
    assert(Multimodal.audioFingerprint(df).count() == payloads.length - 1)
    assert(Multimodal.sampleFrames(df, 2).count() > 0)
    assert(Multimodal.containerMeta(df).count() == payloads.length)
  }
}
