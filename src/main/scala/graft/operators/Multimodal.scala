package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.{functions => sf}

/** Multimodal column plumbing: media payloads travel as opaque `binary`
  * columns beside typed metadata. Container-HEADER metadata is parsed
  * for real (image: `imageDimensions`; audio/video: `mediaMetadata` —
  * byte arithmetic, no codec). Decode/feature steps that would call an
  * image/audio codec are STUBBED with deterministic byte-level fakes
  * (no codec libraries in this environment) — the Spark-side contract
  * (schema, batch iteration, partition-local decode) is real.
  *
  * Scale notes: payload bytes stay columnar in parquet; metadata
  * extraction is map-only expressions; the typed decode path iterates
  * partition-local batches (the shape a JNI/FFI codec would plug into)
  * without any shuffle.
  */
object Multimodal {

  /** Attach a synthetic binary payload + modality tag to a text corpus
    * (the corpus stands in for a media table; payload = utf8 bytes). */
  def asBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      sf.col(idCol),
      sf.element_at(sf.array(sf.lit("image"), sf.lit("audio"), sf.lit("video")),
        (sf.col(idCol) % 3 + 1).cast("int")).as("modality"),
      sf.col(textCol).cast("binary").as("payload"))

  /** REAL container-header metadata: format + pixel dimensions parsed
    * straight from PNG/JPEG/GIF/BMP header bytes (functions.imageMeta —
    * no codec, no library). This is the pre-decode curation pass at
    * scale: drop tiny/extreme-aspect images and bucket by resolution at
    * scan speed, before any expensive pixel decode runs. Map-only. */
  def imageDimensions(media: DataFrame, idCol: String,
                      payloadCol: String = "payload"): DataFrame = {
    val meta = graft.functions.imageMeta(sf.col(payloadCol))
    media
      .withColumn("__m", meta)
      .select(sf.col(idCol),
        sf.element_at(sf.array(sf.lit("unknown"), sf.lit("png"), sf.lit("jpeg"),
          sf.lit("gif"), sf.lit("bmp"), sf.lit("webp"), sf.lit("tiff")),
          sf.col("__m").getItem(0) + 1).as("format"),
        sf.col("__m").getItem(1).as("width"),
        sf.col("__m").getItem(2).as("height"))
      .orderBy(idCol)
  }

  /** STUB decode: deterministic pseudo-metadata from the payload bytes
    * (a real build would branch per modality into a codec here). */
  def decodeMeta(media: DataFrame, idCol: String): DataFrame =
    media.select(
      sf.col(idCol),
      sf.col("modality"),
      sf.octet_length(sf.col("payload")).as("byte_len"),
      (sf.octet_length(sf.col("payload")) % 640 + 1).as("width"),
      (sf.octet_length(sf.col("payload")) * 7 % 480 + 1).as("height"))
      .orderBy(idCol)

  /** REAL audio/video container metadata: format, duration, sample
    * rate, channels and visual-track dimensions parsed straight from
    * WAV/RIFF, MP4, FLAC, and MP3 header bytes (functions.mediaMeta — no codec,
    * no library), completing the pre-decode curation pass beside
    * `imageDimensions`: drop sub-second clips, bucket by sample rate /
    * resolution at scan speed, before any expensive decode. Map-only;
    * -1 marks fields the container doesn't carry or a truncated header
    * can't supply. */
  def mediaMetadata(media: DataFrame, idCol: String,
                    payloadCol: String = "payload"): DataFrame = {
    val meta = graft.functions.mediaMeta(sf.col(payloadCol))
    media
      .withColumn("__m", meta)
      .select(sf.col(idCol),
        sf.element_at(sf.array(sf.lit("unknown"), sf.lit("wav"), sf.lit("mp4"),
            sf.lit("flac"), sf.lit("mp3")),
          (sf.col("__m").getItem(0) + 1).cast("int")).as("format"),
        sf.col("__m").getItem(1).as("duration_ms"),
        sf.col("__m").getItem(2).as("sample_rate"),
        sf.col("__m").getItem(3).as("channels"),
        sf.col("__m").getItem(4).as("width"),
        sf.col("__m").getItem(5).as("height"))
      .orderBy(idCol)
  }

  /** GENERIC-STUB resize: deterministic pseudo-resize to target
    * dimensions for payloads in COMPRESSED formats (JPEG/PNG/... —
    * no codec library in this environment). The fully-REAL decode +
    * resize path exists for uncompressed formats: [[pgmResize]]
    * below actually parses pixel bytes and computes exact block
    * means, and [[wavStats]] actually decodes PCM samples. Emits the
    * target dims, the pretend output byte size (target pixels x 3
    * channels, capped by the source), and a deterministic content
    * fingerprint of (payload, dims) standing in for the resized
    * bytes. */
  def resizeMeta(media: DataFrame, idCol: String,
                 targetW: Int, targetH: Int): DataFrame = {
    val srcLen = sf.octet_length(sf.col("payload"))
    media.select(
      sf.col(idCol),
      sf.col("modality"),
      sf.lit(targetW).as("width"),
      sf.lit(targetH).as("height"),
      sf.least(srcLen, sf.lit(targetW * targetH * 3)).as("byte_len_out"),
      sf.xxhash64(sf.col("payload"), sf.lit(targetW), sf.lit(targetH))
        .as("resized_fingerprint"))
      .orderBy(idCol)
  }

  /** Frame sampling stub: n evenly-spaced "frames", each fingerprinted
    * by hashing its byte slice — the partitioning/batch shape of real
    * frame extraction. */
  def frameSample(media: DataFrame, idCol: String, nFrames: Int): DataFrame = {
    val len = sf.octet_length(sf.col("payload"))
    val chunk = sf.greatest(len / nFrames, sf.lit(1))
    media.select(
      sf.col(idCol), sf.col("modality"),
      sf.transform(sf.sequence(sf.lit(0), sf.lit(nFrames - 1)),
        i => sf.xxhash64(sf.col("payload").substr(i * chunk + 1, chunk)))
        .as("frame_hashes"))
      .orderBy(idCol)
  }

  case class MediaRow(id: Long, modality: String, payload: Array[Byte])
  case class DecodedFeature(id: Long, modality: String, byteLen: Int, meanByte: Double)

  /** Typed partition-local decode path — the mapPartitions shape a real
    * codec (per-partition init, batched decode) would use. The "decode"
    * itself is a deterministic fake (mean byte value). */
  def decodeFeatures(spark: SparkSession, media: DataFrame, idCol: String): Dataset[DecodedFeature] = {
    import spark.implicits._
    media.select(sf.col(idCol).cast("long").as("id"), sf.col("modality"), sf.col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // real impl: initialize codec once per partition here
        rows.map { r =>
          val bytes = r.payload
          val mean = if (bytes.isEmpty) 0.0
            else bytes.foldLeft(0L)((a, b) => a + (b & 0xFF)).toDouble / bytes.length
          DecodedFeature(r.id, r.modality, bytes.length, mean)
        }
      }
  }

  /** FULLY-REAL image decode + resize for uncompressed payloads —
    * binary PGM (netpbm P5) in, exact box-filter-resized pixels out,
    * one row per output pixel (doc, row, col, value). The decoder
    * (functions.pgmResizePixels) parses the actual header and pixel
    * bytes in a codegen kernel — no library, no stub — and the
    * integer block-mean resize is bit-replayable by an independent
    * oracle. Malformed payloads decode to zero rows (the empty-array
    * contract) instead of nulls or errors.
    *
    * Scale shape: map-only decode + one bounded posexplode (tw*th
    * rows per payload — the RESIZED size, chosen small, never the
    * source pixel count); no shuffle, no driver involvement. */
  def pgmResize(media: DataFrame, idCol: String, targetW: Int, targetH: Int,
                payloadCol: String = "payload"): DataFrame = {
    require(targetW >= 1 && targetH >= 1,
      s"pgmResize: bad target ${targetW}x$targetH")
    media
      .select(sf.col(idCol),
        sf.posexplode(graft.functions.pgmResizePixels(sf.col(payloadCol),
          sf.lit(targetW), sf.lit(targetH))).as(Seq("__i", "px")))
      .select(sf.col(idCol),
        sf.expr(s"__i div $targetW").cast("int").as("out_row"),
        sf.pmod(sf.col("__i"), sf.lit(targetW)).cast("int").as("out_col"),
        sf.col("px"))
      .orderBy(sf.col(idCol), sf.col("out_row"), sf.col("out_col"))
  }

  /** FULLY-REAL audio decode for uncompressed payloads — WAV PCM16 in,
    * exact per-payload sample statistics out: n_samples, sample_rate,
    * channels, peak = max |s|, and RMS from the exact integer
    * sum-of-squares (one pinned sqrt + division, 1e-6). The decoder
    * (functions.wavPcmStats) walks the real RIFF chunks and decodes
    * the real int16 samples in a codegen kernel. Malformed or
    * non-PCM16 payloads surface as NULL stats (empty-array contract),
    * kept so curation can count them. Map-only at any corpus size. */
  def wavStats(media: DataFrame, idCol: String,
               payloadCol: String = "payload"): DataFrame = {
    val s = graft.functions.wavPcmStats(sf.col(payloadCol))
    media
      .withColumn("__s", s)
      .select(sf.col(idCol),
        sf.when(sf.size(sf.col("__s")) === 5, sf.col("__s").getItem(0))
          .as("n_samples"),
        sf.when(sf.size(sf.col("__s")) === 5, sf.col("__s").getItem(1))
          .as("sample_rate"),
        sf.when(sf.size(sf.col("__s")) === 5, sf.col("__s").getItem(2))
          .as("channels"),
        sf.when(sf.size(sf.col("__s")) === 5, sf.col("__s").getItem(3))
          .as("peak"),
        sf.when(sf.size(sf.col("__s")) === 5 && sf.col("__s").getItem(0) > 0,
          graft.functions.roundAt(
            sf.sqrt(sf.col("__s").getItem(4).cast("double") /
              sf.col("__s").getItem(0).cast("double")), 6))
          .as("rms"))
      .orderBy(idCol)
  }

  /** Perceptual audio hash per payload — the REAL WAV-PCM decode
    * (functions.wavFrameAbsMeans) folded to an `nFrames`-point mean-
    * absolute-amplitude envelope, then the wraparound gradient hash
    * (functions.dhash64 with h = 1): bit i = env(i) > env((i+1) mod
    * nFrames) — the loudness-contour sign map, robust to gain and
    * format-level re-encodes the way dHash is to brightness. Integer-
    * only end to end, so a SQL oracle replays it bit-exactly from the
    * sample formula. Malformed payloads surface as NULL ahash.
    *
    * Scale shape: map-only — decode, frame and hash fuse into one
    * codegen stage per row; no shuffle at any corpus size. */
  def audioFrameHash(media: DataFrame, idCol: String, nFrames: Int = 60,
                     payloadCol: String = "payload"): DataFrame = {
    require(nFrames >= 2 && nFrames <= 64,
      s"audioFrameHash: nFrames must be in [2, 64], got $nFrames")
    media
      .withColumn("__env", graft.functions.wavFrameAbsMeans(
        sf.col(payloadCol), sf.lit(nFrames)))
      .select(sf.col(idCol),
        sf.when(sf.size(sf.col("__env")) === nFrames,
          graft.functions.dhash64(sf.col("__env"), sf.lit(nFrames), sf.lit(1)))
          .as("ahash"))
      .orderBy(idCol)
  }

  /** Audio near-duplicate pairs — [[audioFrameHash]] signatures fed
    * to the pigeonhole Hamming-banded machinery (Dedup.hammingNearDup),
    * the audio member of the perceptual-dedup family ([[imageNearDup]]
    * is the image member): candidate pairs come from an equi-join on
    * signature slices, never an O(n²) comparison; undecodable payloads
    * drop. Output (a_id, b_id, hamming). */
  def audioNearDup(media: DataFrame, idCol: String, maxHamming: Int = 3,
                   nFrames: Int = 60,
                   payloadCol: String = "payload"): DataFrame =
    Dedup.hammingNearDup(
      audioFrameHash(media, idCol, nFrames, payloadCol)
        .filter(sf.col("ahash").isNotNull),
      idCol, "ahash", maxHamming)

  /** Perceptual image hash per payload — the REAL PGM decode + box
    * resize (functions.pgmResizePixels) down to a gridW x gridH
    * thumbnail, then the wraparound 64-bit difference hash
    * (functions.dhash64): bit r·w+c = px(r,c) > px(r,(c+1) mod w),
    * the horizontal-gradient sign map. Integer-only end to end, so a
    * SQL oracle replays it bit-exactly from the pixel formula.
    * Malformed payloads (the decoder's empty-array contract) surface
    * as NULL dhash, kept so curation can count them.
    *
    * Scale shape: map-only — decode, resize and hash fuse into one
    * codegen stage per row; no shuffle at any corpus size. */
  def imageDHash(media: DataFrame, idCol: String, gridW: Int = 8,
                 gridH: Int = 8, payloadCol: String = "payload"): DataFrame = {
    require(gridW >= 2 && gridH >= 1 && gridW * gridH <= 64,
      s"imageDHash: grid ${gridW}x$gridH must have 2 <= w, w*h <= 64")
    media
      .withColumn("__px", graft.functions.pgmResizePixels(sf.col(payloadCol),
        sf.lit(gridW), sf.lit(gridH)))
      .select(sf.col(idCol),
        sf.when(sf.size(sf.col("__px")) === gridW * gridH,
          graft.functions.dhash64(sf.col("__px"), sf.lit(gridW), sf.lit(gridH)))
          .as("dhash"))
      .orderBy(idCol)
  }

  /** Image near-duplicate pairs — [[imageDHash]] signatures fed to the
    * pigeonhole Hamming-banded candidate machinery
    * (Dedup.hammingNearDup): re-encodes, brightness tweaks and small
    * local edits leave the gradient-sign thumbnail almost unchanged,
    * so near-identical images land within `maxHamming` bits and are
    * found by an equi-join on signature slices — never a pixel-space
    * or O(n²) hash comparison. Undecodable payloads drop (NULL dhash
    * can't rank as near anything). Output (a_id, b_id, hamming).
    *
    * Scale shape: the map-only hash + hammingNearDup's bounded
    * posexplode and slice equi-join; constant-brightness families
    * (every gradient equal) are the skew risk and exactly what the
    * mixing synthesizer avoids planting in demos. */
  def imageNearDup(media: DataFrame, idCol: String, maxHamming: Int = 3,
                   gridW: Int = 8, gridH: Int = 8,
                   payloadCol: String = "payload"): DataFrame =
    Dedup.hammingNearDup(
      imageDHash(media, idCol, gridW, gridH, payloadCol)
        .filter(sf.col("dhash").isNotNull),
      idCol, "dhash", maxHamming)
}
