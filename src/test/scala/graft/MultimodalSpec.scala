package graft

import graft.operators.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.{functions => sf}

class MultimodalSpec extends SparkFunSuite {
  import spark.implicits._

  test("asBinary + decodeMeta: deterministic byte-level metadata") {
    val docs = Tables.load(spark, sf001, "documents").filter($"doc_id" < 10)
    val meta = Multimodal.decodeMeta(
      Multimodal.asBinary(docs, "doc_id", "text"), "doc_id").collect()
    val lens = docs.select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    meta.foreach { r =>
      val id = r.getLong(0)
      val byteLen = r.getInt(2)
      assert(byteLen == lens(id))            // ascii corpus: bytes == chars
      assert(r.getInt(3) == byteLen % 640 + 1)
      assert(r.getInt(4) == byteLen * 7 % 480 + 1)
      assert(Set("image", "audio", "video").contains(r.getString(1)))
    }
  }

  test("frameSample emits n frame fingerprints per record") {
    val docs = Tables.load(spark, sf001, "documents").filter($"doc_id" < 5)
    val frames = Multimodal.frameSample(
      Multimodal.asBinary(docs, "doc_id", "text"), "doc_id", nFrames = 4).collect()
    frames.foreach(r => assert(r.getSeq[Long](2).length == 4))
  }

  test("resize stub: deterministic dims, capped size, stable fingerprint") {
    val docs = Tables.load(spark, sf001, "documents").filter($"doc_id" < 5)
    val media = Multimodal.asBinary(docs, "doc_id", "text")
    val r1 = Multimodal.resizeMeta(media, "doc_id", 64, 48).collect()
    val r2 = Multimodal.resizeMeta(media, "doc_id", 64, 48).collect()
    assert(r1.map(_.toSeq).sameElements(r2.map(_.toSeq))) // deterministic
    r1.foreach { r =>
      assert(r.getInt(2) == 64 && r.getInt(3) == 48)
      assert(r.getInt(4) <= 64 * 48 * 3)
    }
    // different target dims -> different fingerprints
    val other = Multimodal.resizeMeta(media, "doc_id", 32, 32).collect()
    assert(r1.map(_.getLong(5)).toSet.intersect(other.map(_.getLong(5)).toSet).isEmpty)
  }

  test("typed decodeFeatures path computes partition-local features") {
    val docs = Tables.load(spark, sf001, "documents").filter($"doc_id" < 5)
    val feats = Multimodal.decodeFeatures(spark,
      Multimodal.asBinary(docs, "doc_id", "text"), "doc_id").collect()
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    feats.foreach { f =>
      val bytes = texts(f.id).getBytes("UTF-8")
      val mean = bytes.map(_ & 0xFF).sum.toDouble / bytes.length
      assert(math.abs(f.meanByte - mean) < 1e-9)
      assert(f.byteLen == bytes.length)
    }
  }

  test("imageDimensions parses real PNG/JPEG/GIF/BMP/WEBP/TIFF container headers") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // PNG: signature + IHDR length/type, then width=640 height=480 BE
    val png = b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 2, 0x80, 0, 0, 1, 0xe0, 8, 6, 0, 0, 0)
    // JPEG: SOI, APP0 (16 bytes), SOF0 with height=333 width=222 BE
    val jpeg = b(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10) ++ new Array[Byte](14) ++
      b(0xff, 0xc0, 0x00, 0x11, 8, 0x01, 0x4d, 0x00, 0xde) ++ new Array[Byte](10)
    // GIF89a: width=320 height=200 LE
    val gif = b('G', 'I', 'F', '8', '9', 'a', 0x40, 0x01, 0xc8, 0x00)
    // BMP: 'BM' header, width=100 at 18, height=-50 (top-down) at 22 LE
    val bmp = b('B', 'M') ++ new Array[Byte](16) ++
      b(100, 0, 0, 0, 0xce, 0xff, 0xff, 0xff) ++ new Array[Byte](4)
    val junk = "not an image at all".getBytes("UTF-8")
    // WEBP lossy VP8: RIFF/WEBP + "VP8 " chunk, 3-byte frame tag,
    // 9D 01 2A sync, then 14-bit LE dims 480x360
    val webpLossy = b('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'E', 'B', 'P',
      'V', 'P', '8', ' ', 0, 0, 0, 0,
      0, 0, 0, 0x9d, 0x01, 0x2a, 0xe0, 0x01, 0x68, 0x01)
    // WEBP lossless VP8L: 0x2F signature then packed (w-1, h-1):
    // 199 | (149 << 14) -> 200x150
    val vp8lBits = 199L | (149L << 14)
    val webpLossless = b('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'E', 'B', 'P',
      'V', 'P', '8', 'L', 0, 0, 0, 0, 0x2f,
      (vp8lBits & 0xff).toInt, ((vp8lBits >> 8) & 0xff).toInt,
      ((vp8lBits >> 16) & 0xff).toInt, ((vp8lBits >> 24) & 0xff).toInt)
    // WEBP extended VP8X: 24-bit LE canvas minus one -> 1024x768
    val webpX = b('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'E', 'B', 'P',
      'V', 'P', '8', 'X', 0, 0, 0, 0, 0, 0, 0, 0,
      0xff, 0x03, 0x00, 0xff, 0x02, 0x00)
    // TIFF little-endian: IFD at 8 with tags 256 (SHORT 800) and
    // 257 (LONG 600); TIFF big-endian: same dims, MM byte order
    val tiffLe = b('I', 'I', 42, 0, 8, 0, 0, 0, 2, 0,
      0x00, 0x01, 3, 0, 1, 0, 0, 0, 0x20, 0x03, 0, 0,
      0x01, 0x01, 4, 0, 1, 0, 0, 0, 0x58, 0x02, 0, 0)
    val tiffBe = b('M', 'M', 0, 42, 0, 0, 0, 8, 0, 2,
      0x01, 0x00, 0, 3, 0, 0, 0, 1, 0x03, 0x20, 0, 0,
      0x01, 0x01, 0, 4, 0, 0, 0, 1, 0, 0, 0x02, 0x58)
    val df = Seq((1L, png), (2L, jpeg), (3L, gif), (4L, bmp), (5L, junk),
      (6L, webpLossy), (7L, webpLossless), (8L, webpX),
      (9L, tiffLe), (10L, tiffBe)).toDF("id", "payload")
    val got = Multimodal.imageDimensions(df, "id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq
    assert(got == Seq(
      (1L, "png", 640, 480),
      (2L, "jpeg", 222, 333),
      (3L, "gif", 320, 200),
      (4L, "bmp", 100, 50), // top-down height reported as magnitude
      (5L, "unknown", -1, -1),
      (6L, "webp", 480, 360),
      (7L, "webp", 200, 150),
      (8L, "webp", 1024, 768),
      (9L, "tiff", 800, 600),
      (10L, "tiff", 800, 600)), s"got $got")
  }

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  test("mediaMetadata parses real WAV/RIFF and MP4 container headers") {
    // WAV: 44.1kHz stereo 16-bit, 352800 data bytes = exactly 2000 ms
    val wav = "RIFF".getBytes ++ le32(36 + 352800) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(44100) ++ le32(176400) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(352800) // sizes only; no payload bytes needed
    // MP4: ftyp + moov(mvhd v0 timescale=600 duration=1800 -> 3000 ms,
    //               trak(tkhd v0 width=1280 height=720 as 16.16 fixed))
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0)
    val mvhd = be32(108) ++ "mvhd".getBytes ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(600) ++ be32(1800) ++ new Array[Byte](108 - 8 - 20)
    val tkhd = be32(92) ++ "tkhd".getBytes ++ new Array[Byte](76) ++
      be32(1280L << 16) ++ be32(720L << 16)
    val trak = be32(8 + tkhd.length) ++ "trak".getBytes ++ tkhd
    val moov = be32(8 + mvhd.length + trak.length) ++ "moov".getBytes ++ mvhd ++ trak
    val mp4 = ftyp ++ moov
    // truncated/corrupt headers must degrade to -1 fields, never throw
    val wavTrunc = "RIFF".getBytes ++ le32(4) ++ "WAVE".getBytes
    val mp4Corrupt = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0) ++
      be32(0xffffff) ++ "junk".getBytes
    val junk = "definitely not media".getBytes
    // FLAC: fLaC + STREAMINFO (type 0, len 34): 44.1kHz stereo 16bps,
    // 88200 total samples = exactly 2000 ms
    val flac = "fLaC".getBytes ++ Array(0x80.toByte, 0, 0, 34).map(_.toByte) ++
      new Array[Byte](10) ++
      Array(0x0a, 0xc4, 0x42, 0xf0).map(_.toByte) ++ be32(88200)
    // MP3: empty ID3v2 (10 bytes), MPEG1 Layer III 128kbps 44.1kHz
    // stereo; 16000 payload bytes at 128 kbps = exactly 1000 ms
    val mp3 = "ID3".getBytes ++ Array(3, 0, 0, 0, 0, 0, 0).map(_.toByte) ++
      Array(0xff, 0xfb, 0x90, 0x00).map(_.toByte) ++ new Array[Byte](16000 - 4)
    // reserved MPEG version bits -> not a valid frame, stays unknown
    val mp3Bad = Array(0xff, 0xeb, 0x90, 0x00).map(_.toByte) ++ new Array[Byte](64)
    val df = Seq((1L, wav), (2L, mp4), (3L, wavTrunc), (4L, mp4Corrupt), (5L, junk),
      (6L, flac), (7L, mp3), (8L, mp3Bad))
      .toDF("id", "payload")
    val got = Multimodal.mediaMetadata(df, "id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == Seq(
      (1L, "wav", 2000L, 44100L, 2L, -1L, -1L),
      (2L, "mp4", 3000L, -1L, -1L, 1280L, 720L),
      (3L, "wav", -1L, -1L, -1L, -1L, -1L),
      (4L, "mp4", -1L, -1L, -1L, -1L, -1L),
      (5L, "unknown", -1L, -1L, -1L, -1L, -1L),
      (6L, "flac", 2000L, 44100L, 2L, -1L, -1L),
      (7L, "mp3", 1000L, 44100L, 2L, -1L, -1L),
      (8L, "unknown", -1L, -1L, -1L, -1L, -1L)), s"got $got")
  }

  test("pgmResize: REAL P5 decode + exact box means, hand-built payload") {
    // 4x2 image, pixels 0..7 row-major, resized to 2x1: block means
    // floor((0+1+4+5)/4)=2 and floor((2+3+6+7)/4)=4 — header carries
    // a comment line to exercise the netpbm comment-skip path
    val pgm = "P5\n# a comment\n4 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 2, 3, 4, 5, 6, 7)
    val junk = "not an image".getBytes("US-ASCII")
    val trunc = "P5\n4 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](0, 1)
    val indivisible = "P5\n5 2\n255\n".getBytes("US-ASCII") ++ new Array[Byte](10)
    val df = Seq((1L, pgm), (2L, junk), (3L, trunc), (4L, indivisible))
      .toDF("id", "payload")
    val got = Multimodal.pgmResize(df, "id", targetW = 2, targetH = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    // malformed payloads contribute zero rows, never nulls or throws
    assert(got == Seq((1L, 0, 0, 2), (1L, 0, 1, 4)), s"got $got")
  }

  test("pgmResize round-trip: synthesized payload decodes to the formula's block means") {
    val media = Seq(7L, 8L).toDF("doc_id")
      .select($"doc_id", graft.functions.pgmSynth($"doc_id", sf.lit(24), sf.lit(16)).as("payload"))
    val got = Multimodal.pgmResize(media, "doc_id", 6, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.length == 2 * 24)
    // independent recompute of the block means from the pixel formula
    for ((d, or, oc, px) <- got) {
      val sum = (for (r <- or * 4 until or * 4 + 4; c <- oc * 4 until oc * 4 + 4)
        yield (d * 31 + r * 7 + c * 13) % 256).sum
      assert(px == sum / 16, s"d=$d or=$or oc=$oc")
    }
  }

  test("imageDHash: decode->resize->dhash replays the formula; malformed -> NULL") {
    val media = Seq(7L, 8L).toDF("doc_id")
      .select($"doc_id", graft.functions.pgmSynthMix(
        $"doc_id", sf.lit(24), sf.lit(16), sf.lit(false)).as("payload"))
      .unionAll(Seq((99L, "junk".getBytes("US-ASCII"))).toDF("doc_id", "payload"))
    val got = Multimodal.imageDHash(media, "doc_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(99L).isEmpty) // undecodable payload surfaces as NULL
    // independent recompute: formula pixels -> 3x2 block means ->
    // wraparound dhash, no kernel code shared
    def px(d: Long, r: Int, c: Int): Long = {
      val pos = r * 24L + c
      java.lang.Math.floorMod(d * (pos + 13L) + pos * pos * 7L, 256L)
    }
    for (d <- Seq(7L, 8L)) {
      val grid = Array.tabulate(8, 8) { (tr, tc) =>
        (for (r <- tr * 2 until tr * 2 + 2; c <- tc * 3 until tc * 3 + 3)
          yield px(d, r, c)).sum / 6
      }
      var bits = 0L
      for (tr <- 0 until 8; tc <- 0 until 8)
        if (grid(tr)(tc) > grid(tr)((tc + 1) % 8)) bits |= 1L << (tr * 8 + tc)
      assert(got(d).contains(bits), s"doc $d")
    }
  }

  test("imageNearDup: every planted one-block perturbed copy is recalled") {
    val ids = (0L until 60L).toDF("doc_id")
    def synth(pert: Boolean) = graft.functions.pgmSynthMix(
      $"doc_id", sf.lit(24), sf.lit(16), sf.lit(pert))
    val base = ids.select($"doc_id".as("img_id"), synth(false).as("payload"))
    val planted = ids.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 1000000L).as("img_id"), synth(true).as("payload"))
    val got = Multimodal.imageNearDup(base.unionAll(planted), "img_id",
        maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // the perturbation is confined to resize block (0,0), so only the
    // 2 dhash bits comparing against that block can move: every
    // planted pair must be found, within the constructive bound
    for (d <- 0L until 60L by 10)
      assert(got.exists(p => p._1 == d && p._2 == d + 1000000L && p._3 <= 2),
        s"planted pair for $d missing in ${got.toSeq}")
  }

  test("audioFrameHash: decode->envelope->hash replays the formula; malformed -> NULL") {
    val media = Seq(3L, 4L).toDF("doc_id")
      .select($"doc_id", graft.functions.wavSynthMix(
        $"doc_id", sf.lit(480), sf.lit(8000), sf.lit(false)).as("payload"))
      .unionAll(Seq((99L, "RIFFjunk".getBytes("US-ASCII"))).toDF("doc_id", "payload"))
    val got = Multimodal.audioFrameHash(media, "doc_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(99L).isEmpty) // undecodable payload surfaces as NULL
    // independent recompute: formula samples -> 8-sample mean-|s|
    // frames -> wraparound gradient hash
    def smp(d: Long, i: Int): Long = (d * 7919L + i * 104729L) % 65536L - 32768L
    for (d <- Seq(3L, 4L)) {
      val env = Array.tabulate(60) { k =>
        (k * 8 until k * 8 + 8).map(i => math.abs(smp(d, i))).sum / 8
      }
      var bits = 0L
      for (k <- 0 until 60) if (env(k) > env((k + 1) % 60)) bits |= 1L << k
      assert(got(d).contains(bits), s"doc $d")
    }
  }

  test("audioNearDup: every planted one-frame perturbed copy is recalled") {
    val ids = (0L until 60L).toDF("doc_id")
    def synth(pert: Boolean) = graft.functions.wavSynthMix(
      $"doc_id", sf.lit(480), sf.lit(8000), sf.lit(pert))
    val base = ids.select($"doc_id".as("clip_id"), synth(false).as("payload"))
    val planted = ids.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 1000000L).as("clip_id"), synth(true).as("payload"))
    val got = Multimodal.audioNearDup(base.unionAll(planted), "clip_id",
        maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // perturbation is confined to frame 0: only the 2 gradient bits
    // touching that frame can move
    for (d <- 0L until 60L by 10)
      assert(got.exists(p => p._1 == d && p._2 == d + 1000000L && p._3 <= 2),
        s"planted pair for $d missing in ${got.toSeq}")
  }

  test("wavStats: REAL PCM16 decode — hand samples, malformed handling") {
    // hand-built 4-sample mono WAV via the synth kernel's layout:
    // samples from the formula with docId=3
    val media = Seq(3L).toDF("doc_id")
      .select($"doc_id", graft.functions.wavSynth($"doc_id", sf.lit(4), sf.lit(8000)).as("payload"))
    val r = Multimodal.wavStats(media, "doc_id").head()
    val samples = (0 until 4).map(i => ((3L * 7919 + i * 104729L) % 65536) - 32768)
    assert(r.getLong(1) == 4L && r.getLong(2) == 8000L && r.getLong(3) == 1L)
    assert(r.getLong(4) == samples.map(math.abs).max)
    val rms = math.sqrt(samples.map(s => s * s).sum.toDouble / 4.0)
    assert(r.getDouble(5) == math.floor(rms * 1e6 + 0.5) / 1e6)
    // malformed payloads surface NULL stats, never throw
    val bad = Seq((9L, "RIFFjunk".getBytes("US-ASCII"))).toDF("doc_id", "payload")
    val b = Multimodal.wavStats(bad, "doc_id").head()
    assert(b.isNullAt(1) && b.isNullAt(4) && b.isNullAt(5))
  }
}
