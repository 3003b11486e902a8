package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Real media decode through the JDK codecs — image pixels
  * (PNG/JPEG/GIF/BMP), PCM audio (WAV/AIFF), MP4 container metadata, and
  * MJPEG-AVI video frames. The md5-derived generic path remains only as
  * the documented schema/batching testbed for formats the JDK can't parse.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, buf)
    buf.toByteArray
  }

  /** Horizontal black→white gradient: known dims, known mean luma (~127.5). */
  private def gradient(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255) / math.max(1, w - 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private lazy val media = {
    val rows = Seq(
      (1L, encode(gradient(200, 100), "png"), "png"),
      (2L, encode(gradient(64, 64), "jpg"), "jpg"),
      (3L, Array[Byte](1, 2, 3, 4, 5), "png"), // corrupt payload
      (4L, encode(gradient(40, 20), "png"), "png") // already small
    ).toDF("id", "payload", "fmt")
    // canonical (media_id, content, meta) shape
    rows
      .select(
        $"id".as("media_id"),
        $"payload".as("content"),
        struct($"fmt".as("format"), octet_length($"payload").as("byte_len")).as("meta")
      )
  }

  test("decodeImages: true dimensions and luma from real JDK codecs; corrupt rows degrade, never throw") {
    val out = Multimodal.decodeImages(spark, media).collect().map(f => f.mediaId -> f).toMap
    assert(out(1L).ok && out(1L).width == 200 && out(1L).height == 100)
    assert(out(2L).ok && out(2L).width == 64 && out(2L).height == 64)
    // linear gradient: mean luma near mid-gray (jpeg adds compression noise)
    assert(math.abs(out(1L).meanLuma - 127.5) < 10.0, s"png luma ${out(1L).meanLuma}")
    assert(math.abs(out(2L).meanLuma - 127.5) < 15.0, s"jpg luma ${out(2L).meanLuma}")
    // corrupt payload: flagged, not thrown
    assert(!out(3L).ok && out(3L).width == -1 && out(3L).byteLen == 5)
  }

  test("resizeImages: aspect-preserving downscale to maxDim, small images pass through untouched") {
    val resized = Multimodal.resizeImages(spark, media, maxDim = 64)
    val back = Multimodal.decodeImages(spark, resized).collect().map(f => f.mediaId -> f).toMap
    assert(back(1L).ok && back(1L).width == 64 && back(1L).height == 32) // 200x100 -> 64x32
    assert(back(2L).ok && back(2L).width == 64 && back(2L).height == 64) // at bound: untouched
    assert(back(4L).ok && back(4L).width == 40 && back(4L).height == 20) // small: untouched
    // pass-through rows keep their exact original bytes (no re-encode)
    val originalBytes = media.filter($"media_id" === 4L).select($"content").head().getAs[Array[Byte]](0)
    val resizedBytes = resized.filter($"media_id" === 4L).select($"content").head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(originalBytes, resizedBytes))
    // resized rows are re-encoded PNG and carry updated meta
    val fmt1 = resized.filter($"media_id" === 1L).select($"meta.format").head().getString(0)
    assert(fmt1 == "png")
    // resized gradient keeps its luma character (bilinear, not garbage)
    assert(math.abs(back(1L).meanLuma - 127.5) < 12.0)
    // corrupt payload passes through unchanged rather than failing the job
    assert(resized.count() == 4)
  }

  test("encodeSolidPng: lossless round-trip — decode recovers exact dims and gray level") {
    val rows = Seq(
      (1L, Multimodal.encodeSolidPng(33, 21, 0)), // black, odd dims
      (2L, Multimodal.encodeSolidPng(8, 8, 255)), // white, minimum fixture size
      (3L, Multimodal.encodeSolidPng(47, 37, 130)) // mid gray, the q91 max dims
    ).toDF("media_id", "payload")
    val media = Multimodal.toMediaTable(rows, "media_id", "payload", "png")
    val out = Multimodal.decodeImages(spark, media).collect().map(f => f.mediaId -> f).toMap
    assert(out(1L).ok && out(1L).width == 33 && out(1L).height == 21)
    assert(out(2L).ok && out(2L).width == 8 && out(2L).height == 8)
    assert(out(3L).ok && out(3L).width == 47 && out(3L).height == 37)
    // constant image: mean luma rounds to the exact gray level
    assert(math.floor(out(1L).meanLuma + 0.5).toInt == 0)
    assert(math.floor(out(2L).meanLuma + 0.5).toInt == 255)
    assert(math.floor(out(3L).meanLuma + 0.5).toInt == 130)
  }

  test("decodeAudio: real WAV round-trip — header metadata, peak/RMS, corruption flagged not thrown") {
    val rows = Seq(
      (1L, Multimodal.encodePcmWav(8000, 400, 1000)),       // even n: clean square wave
      (2L, Multimodal.encodePcmWav(16000, 401, 30000)),     // odd n, near-full-scale amp
      (3L, Multimodal.encodePcmWav(12000, 100, 0)),         // silence
      (4L, Multimodal.encodePcmWav(8000, 50, 7).take(10)),  // truncated container
      (5L, Array[Byte](1, 2, 3))                            // not audio at all
    ).toDF("media_id", "payload")
    val media = Multimodal.toMediaTable(rows, "media_id", "payload", "wav")
    val out = Multimodal.decodeAudio(spark, media).collect().map(f => f.mediaId -> f).toMap
    assert(out(1L).ok && out(1L).sampleRate == 8000 && out(1L).channels == 1 && out(1L).bits == 16)
    assert(out(1L).nFrames == 400 && out(1L).durationMs == 50L)
    // ±amp square wave: peak = amp, RMS = exactly amp (IEEE-exact squares)
    assert(out(1L).peak == 1000 && out(1L).rmsE2 == 100000L)
    assert(out(2L).ok && out(2L).nFrames == 401 && out(2L).peak == 30000 && out(2L).rmsE2 == 3000000L)
    assert(out(2L).durationMs == 401L * 1000L / 16000L)
    assert(out(3L).ok && out(3L).peak == 0 && out(3L).rmsE2 == 0L)
    // corrupt payloads: flagged with -1 sentinels, never thrown
    assert(!out(4L).ok && out(4L).sampleRate == -1 && out(4L).nFrames == -1L)
    assert(!out(5L).ok && out(5L).rmsE2 == -1L)
  }

  test("decodeAudio: AIFF container parses through the same JDK codec path") {
    // same PCM payload, AIFF container (big-endian samples): the decoder
    // keys on AudioFormat, not the file extension
    val data = new Array[Byte](100 * 2)
    (0 until 100).foreach { i =>
      val v = if (i % 2 == 0) 500 else -500
      data(2 * i) = ((v >> 8) & 0xff).toByte // AIFF is big-endian
      data(2 * i + 1) = (v & 0xff).toByte
    }
    val af = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), af, 100L)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.AIFF, buf)
    val media = Multimodal.toMediaTable(
      Seq((1L, buf.toByteArray)).toDF("media_id", "payload"), "media_id", "payload", "aiff")
    val f = Multimodal.decodeAudio(spark, media).head()
    assert(f.ok && f.sampleRate == 8000 && f.channels == 1 && f.bits == 16)
    assert(f.nFrames == 100L && f.peak == 500 && f.rmsE2 == 50000L)
  }

  test("decodeVideoMeta: real MP4 box walk — brand/duration/dims/tracks, corruption flagged not thrown") {
    val rows = Seq(
      (1L, Multimodal.encodeMp4(640, 360, 600, 1200L, withAudio = false)),
      (2L, Multimodal.encodeMp4(1920, 1080, 90000, 123456L, withAudio = true)),
      (3L, Multimodal.encodeMp4(16, 16, 600, 601L, withAudio = false).take(12)), // truncated
      (4L, Array[Byte](9, 9, 9))                                                  // not a container
    ).toDF("media_id", "payload")
    val media = Multimodal.toMediaTable(rows, "media_id", "payload", "mp4")
    val out = Multimodal.decodeVideoMeta(spark, media).collect().map(f => f.mediaId -> f).toMap
    assert(out(1L).ok && out(1L).brand == "isom" && out(1L).width == 640 && out(1L).height == 360)
    assert(out(1L).durationMs == 2000L && out(1L).nTracks == 1 && out(1L).hasVideo && !out(1L).hasAudio)
    assert(out(2L).ok && out(2L).width == 1920 && out(2L).height == 1080)
    assert(out(2L).durationMs == 123456L * 1000L / 90000L)
    assert(out(2L).nTracks == 2 && out(2L).hasVideo && out(2L).hasAudio)
    assert(!out(3L).ok && out(3L).width == -1 && out(3L).durationMs == -1L)
    assert(!out(4L).ok && out(4L).nTracks == -1)
  }

  test("dHash56: known cell grids hash exactly; banding pairs equal the plain Hamming threshold") {
    // 18x14 px = 9x7 cells of 2x2; a horizontal light-dark alternation has
    // every (cell < right) bit deterministic: bit(r,c)=1 iff cell c is 50
    // and c+1 is 200, i.e. c even -> 0->1 alternating from the parity
    def alt(shift: Int) = Multimodal.encodeGrayPng(18, 14, (x, _) => if ((x / 2 + shift) % 2 == 0) 50 else 200)
    val uniform = Multimodal.encodeGrayPng(18, 14, (_, _) => 99)
    val rows = Seq(
      (1L, alt(0)), (2L, alt(0)),   // identical -> hamming 0
      (3L, alt(1)),                 // inverted alternation -> far from 1/2
      (4L, uniform),                // all comparisons equal -> hash 0
      (5L, Array[Byte](1, 2, 3))    // corrupt -> excluded
    ).toDF("media_id", "payload")
    val media = Multimodal.toMediaTable(rows, "media_id", "payload", "png")
    val hashed = Multimodal.dHash56(spark, media).collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // alternation 50,200,50,...: cells c even = 50 -> bit at even c (c<8)
    val expectedAlt0 = (0 until 7).map(r => Seq(0, 2, 4, 6).map(c => 1L << (r * 8 + c)).sum).sum
    assert(hashed(1L) == (expectedAlt0, true))
    assert(hashed(2L) == (expectedAlt0, true))
    assert(hashed(4L) == (0L, true))
    assert(!hashed(5L)._2)
    // exact-recall banding: output == plain threshold filter over ok rows
    val pairs = Multimodal.imageNearDup(spark, media, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue)).toSet
    val ok = hashed.filter(_._2._2).view.mapValues(_._1).toMap
    val expected = (for {
      a <- ok.keys; b <- ok.keys if a < b
      d = java.lang.Long.bitCount(ok(a) ^ ok(b)) if d <= 3
    } yield (a, b, d)).toSet
    assert(pairs == expected && pairs.contains((1L, 2L, 0)))
  }

  test("decodeVideoFrames: real MJPEG-AVI round-trip — per-frame decode, luma within JPEG tolerance") {
    val grays = Seq(30, 128, 220)
    val avi = Multimodal.encodeMjpegAvi(48, 32, grays)
    val rows = Seq(
      (1L, avi),
      (2L, avi.take(20)), // truncated header
      (3L, Array[Byte](82, 73, 70, 70, 4, 0, 0, 0, 87, 65, 86, 69)) // RIFF but WAVE, not AVI
    ).toDF("media_id", "payload")
    val media = Multimodal.toMediaTable(rows, "media_id", "payload", "avi")
    val out = Multimodal.decodeVideoFrames(spark, media).collect()
    val good = out.filter(f => f.mediaId == 1L).sortBy(_.frameIdx)
    assert(good.length == 3 && good.forall(f => f.ok && f.width == 48 && f.height == 32))
    assert(good.map(_.frameIdx).toSeq == Seq(0, 1, 2))
    // solid-gray JPEG decodes back to (almost exactly) its gray level —
    // allow +-2 levels of DCT/colorspace rounding on the e2-scaled mean
    good.zip(grays).foreach { case (f, g) =>
      assert(math.abs(f.lumaE2 / 100.0 - g) <= 2.0, s"frame ${f.frameIdx}: luma ${f.lumaE2 / 100.0} vs gray $g")
    }
    // malformed payloads: one ok=false sentinel row each, never a throw
    Seq(2L, 3L).foreach { id =>
      val badRows = out.filter(_.mediaId == id)
      assert(badRows.length == 1 && !badRows.head.ok && badRows.head.frameIdx == -1)
    }
  }

  test("parseAviFrames: chunk-walk edge cases — odd-size padding, non-movi chunks skipped, overrun refused") {
    // odd-sized JPEG payloads exercise the even-padding rule
    val avi = Multimodal.encodeMjpegAvi(17, 13, Seq(77))
    val frames = Multimodal.parseAviFrames(avi)
    assert(frames.exists(_.length == 1))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frames.get.head))
    assert(img.getWidth == 17 && img.getHeight == 13)
    // declared RIFF size larger than the actual payload -> refused
    val lying = avi.clone()
    lying(4) = 0xff.toByte; lying(5) = 0xff.toByte; lying(6) = 0xff.toByte; lying(7) = 0xff.toByte
    assert(Multimodal.parseAviFrames(lying).isEmpty)
    assert(Multimodal.parseAviFrames(Array.empty[Byte]).isEmpty)
    intercept[IllegalArgumentException] { Multimodal.encodeMjpegAvi(48, 32, Seq(300)) }
    intercept[IllegalArgumentException] { Multimodal.encodeMjpegAvi(48, 32, Nil) }
  }

  test("parseMp4Meta: mvhd version 1 (64-bit duration) and largesize box headers") {
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(tpe: String, p: Array[Byte]) = be32(p.length + 8L) ++ tpe.getBytes("ISO-8859-1") ++ p
    // largesize variant: size field = 1, 64-bit length after the type
    def bigBox(tpe: String, p: Array[Byte]) =
      be32(1L) ++ tpe.getBytes("ISO-8859-1") ++ be64(p.length + 16L) ++ p
    val ftyp = box("ftyp", "mp42".getBytes("ISO-8859-1") ++ be32(0) ++ "mp42".getBytes("ISO-8859-1"))
    // mvhd v1: ver=1, ctime/mtime u64, timescale u32, duration u64
    val mvhd = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(90000L) ++ be64(4500000L) ++
        be32(0x00010000L) ++ Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++ new Array[Byte](36) ++
        new Array[Byte](24) ++ be32(2))
    val tkhd = box("tkhd",
      be32(7) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(0) ++
        new Array[Byte](16) ++ new Array[Byte](36) ++ be32(320L << 16) ++ be32(240L << 16))
    val hdlr = box("hdlr", be32(0) ++ be32(0) ++ "vide".getBytes("ISO-8859-1") ++ new Array[Byte](13))
    val moov = bigBox("moov", mvhd ++ box("trak", tkhd ++ box("mdia", hdlr)))
    val parsed = Multimodal.parseMp4Meta(ftyp ++ moov)
    assert(parsed.contains(("mp42", 4500000L * 1000L / 90000L, 320, 240, 1, true, false)))
  }
}
