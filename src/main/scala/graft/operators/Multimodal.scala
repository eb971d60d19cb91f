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

  /** STUB resize: deterministic pseudo-resize to target dimensions — a
    * real build would decode, scale, re-encode here. Emits the target
    * dims, the pretend output byte size (target pixels x 3 channels,
    * capped by the source), and a deterministic content fingerprint of
    * (payload, dims) standing in for the resized bytes. */
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
}
