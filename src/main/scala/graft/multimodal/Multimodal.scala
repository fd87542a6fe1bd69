package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed
  * partition-wise.
  *
  * The Spark-side plumbing here is REAL and tested — schema, per-partition
  * iteration (one codec init per partition, the expensive part with real
  * codecs), repartitioning by media_id so heavy decodes spread evenly, and
  * frame fan-out shapes. The decode layer is REAL for uncompressed binary
  * PPM images ([[PpmCodec]]: pure-JVM parse → grid-mean featurize →
  * nearest-neighbour resize, used by [[extractPpmFeatures]] /
  * [[resizePpmImages]]), for compressed images (JPEG/PNG/BMP/GIF via the
  * JDK's own ImageIO — [[ImageIoCodec]], used by [[extractImageFeatures]]
  * / [[resizeCompressedImages]]), and for PCM WAV audio ([[WavCodec]]).
  * Compressed-media CONTAINERS are real too: [[Mp4Meta]] parses the
  * ISO-BMFF box tree for duration/track dimensions
  * ([[probeMp4Metadata]]) and [[Mp3Meta]] walks MPEG audio frame headers
  * for duration/rate/bitrate ([[probeMp3Metadata]]). Only the FRAME
  * decode of compressed audio/video (MP3 subbands, H.264) goes through
  * the clearly-marked deterministic STUB ([[FakeCodec]]) because those
  * codec libraries don't exist in this environment. Swapping in a real
  * codec changes only FakeCodec.
  */
object Multimodal {

  /** One media object: payload + typed metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, content: Array[Byte],
      width: Int, height: Int, sample_rate_hz: Int, duration_ms: Int)

  final case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])

  final case class MediaFrame(
      media_id: Long, frame_idx: Int, ts_ms: Int, frame: Array[Byte])

  /** ======== STUB ======== deterministic stand-in for the decode layer.
    * Every function is a pure hash of its inputs: same bytes → same
    * output, everywhere, forever — so tests and plans are exercisable
    * without codecs. Replace with the real decoder at deployment. */
  object FakeCodec {
    private def mix(h0: Long, bytes: Array[Byte]): Long = {
      var h = h0
      var i = 0
      while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
      h
    }

    /** STUB decode → feature vector (pretends to be an image/audio encoder). */
    def decodeToFeatures(content: Array[Byte], dim: Int): Array[Float] = {
      val base = mix(1469598103934665603L, content)
      Array.tabulate(dim)(i => {
        val h = base * (i * 2 + 1) + i
        ((h % 2000) / 1000.0f) - 1.0f
      })
    }

    /** STUB resize: returns a payload of plausible size for (w, h). */
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val seed = mix(w.toLong * 31 + h, content)
      Array.tabulate(math.max(16, (w * h) / 64))(i => ((seed >> (i % 8 * 8)) & 0xFF).toByte)
    }

    /** Frame timestamps for sampling every `everyMs` (real logic, no stub). */
    def frameTimestamps(durationMs: Int, everyMs: Int): Seq[Int] =
      0 to durationMs by everyMs
  }

  /** Feature extraction: repartition by media_id (uniform spread of heavy
    * decodes), then one pass per partition — the shape a real codec wants
    * (init once per partition, stream the rows). */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16,
      partitions: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.repartition(partitions, col("media_id")).as[MediaRow]
      .mapPartitions { rows =>
        // real codec: initialize decoder context here, once per partition
        rows.map(m => MediaFeatures(m.media_id, m.kind,
          FakeCodec.decodeToFeatures(m.content, dim)))
      }
  }

  /** REAL decode path for P6 PPM payloads: per-channel grid-mean features
    * (3·grid² floats) via the pure-JVM [[PpmCodec]] — the same
    * partition-wise shape as [[extractFeatures]], with nothing stubbed. */
  def extractPpmFeatures(spark: SparkSession, media: DataFrame, grid: Int = 4,
      partitions: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.filter(col("kind") === "image/ppm")
      .repartition(partitions, col("media_id")).as[MediaRow]
      .mapPartitions(_.map(m => MediaFeatures(m.media_id, m.kind,
        PpmCodec.gridMeanFeatures(m.content, grid))))
  }

  /** REAL resize path for P6 PPM payloads (nearest neighbour, re-encoded
    * as P6); metadata updated alongside. */
  def resizePpmImages(spark: SparkSession, media: DataFrame, w: Int,
      h: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.filter(col("kind") === "image/ppm").as[MediaRow]
      .mapPartitions(_.map(m =>
        m.copy(content = PpmCodec.resizeNearest(m.content, w, h),
          width = w, height = h)))
  }

  /** REAL decode path for compressed images (JPEG/PNG/BMP/GIF) via the
    * JDK's ImageIO ([[ImageIoCodec]]) — same grid-mean feature contract and
    * core as [[extractPpmFeatures]], so identical pixels give identical
    * features regardless of container. Nothing stubbed. */
  def extractImageFeatures(spark: SparkSession, media: DataFrame, grid: Int = 4,
      partitions: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.filter(col("kind").isin("image/jpeg", "image/png", "image/bmp", "image/gif"))
      .repartition(partitions, col("media_id")).as[MediaRow]
      .mapPartitions(_.map(m => MediaFeatures(m.media_id, m.kind,
        ImageIoCodec.gridMeanFeatures(m.content, grid))))
  }

  /** Perceptual hashes ([[Phash]]) for every image payload, PPM or
    * compressed — one 64-bit signature per image, the image analogue of
    * the text corpus's SimHash column. Partition-wise decode like every
    * media path; the result is a slim (media_id, phash) frame that
    * downstream dedup joins on without ever reshuffling pixel data. */
  def imagePhashes(spark: SparkSession, media: DataFrame,
      partitions: Int = 32): DataFrame = {
    import spark.implicits._
    media.filter(col("kind")
        .isin("image/ppm", "image/jpeg", "image/png", "image/bmp", "image/gif"))
      .repartition(partitions, col("media_id")).as[MediaRow]
      .mapPartitions(_.map(m => (m.media_id, Phash.phashPayload(m.kind, m.content))))
      .toDF("media_id", "phash")
  }

  /** Image near-duplicates: pHash signatures through the SAME pigeonhole
    * banded Hamming join as text SimHash
    * ([[graft.dedup.Dedup.hammingNearPairs]] — full recall at the radius,
    * equi-join-shaped candidates). Catches re-encodes (a JPEG of the same
    * pixels), light noise, and small edits; output (m1, m2, hamming). At
    * 100 TB the pixel decode happens once in [[imagePhashes]] and only the
    * 8-byte signatures shuffle. */
  def imageNearDuplicates(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 6, partitions: Int = 32): DataFrame =
    graft.dedup.Dedup
      .hammingNearPairs(imagePhashes(spark, media, partitions),
        "media_id", "phash", maxHamming)
      .withColumnRenamed("d1", "m1")
      .withColumnRenamed("d2", "m2")

  /** REAL resize path for compressed images: nearest-neighbour on decoded
    * pixels, re-encoded PNG (lossless — reproducible artifacts), metadata
    * and kind updated alongside. Repartitions by media_id like every
    * other decode path — a single-partition input would otherwise funnel
    * all decode+re-encode work through one core. */
  def resizeCompressedImages(spark: SparkSession, media: DataFrame, w: Int,
      h: Int, partitions: Int = 32): Dataset[MediaRow] = {
    import spark.implicits._
    media.filter(col("kind").isin("image/jpeg", "image/png", "image/bmp", "image/gif"))
      .repartition(partitions, col("media_id")).as[MediaRow]
      .mapPartitions(_.map(m =>
        m.copy(content = ImageIoCodec.resizeNearest(m.content, w, h),
          kind = "image/png", width = w, height = h)))
  }

  /** REAL decode path for PCM WAV payloads: windowed-RMS loudness features
    * via the pure-JVM [[WavCodec]] — same partition-wise shape as
    * [[extractPpmFeatures]], nothing stubbed. */
  def extractWavFeatures(spark: SparkSession, media: DataFrame,
      windows: Int = 8, partitions: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.filter(col("kind") === "audio/wav")
      .repartition(partitions, col("media_id")).as[MediaRow]
      .mapPartitions(_.map(m => MediaFeatures(m.media_id, m.kind,
        WavCodec.rmsFeatures(m.content, windows))))
  }

  /** Perceptual audio fingerprints ([[AudioFp]] — Haitsma–Kalker band
    * double-differences): 8 bytes per clip, decoded once per row like
    * every other codec path here. */
  def audioFingerprints(spark: SparkSession, media: DataFrame,
      partitions: Int = 32): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "audio/wav")
      .repartition(partitions, col("media_id")).as[MediaRow]
      .mapPartitions(_.map(m =>
        (m.media_id, AudioFp.fingerprintPayload(m.content))))
      .toDF("media_id", "afp")
  }

  /** Audio near-duplicates: fingerprints through the SAME pigeonhole
    * banded Hamming join as image pHash and text SimHash — only the
    * 8-byte signatures shuffle; decode happens once in
    * [[audioFingerprints]]. Zero fingerprints (clips too short to frame)
    * are excluded — "no signal" must not near-dup everything else that
    * lacks signal. */
  def audioNearDuplicates(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 6, partitions: Int = 32): DataFrame =
    graft.dedup.Dedup
      .hammingNearPairs(
        audioFingerprints(spark, media, partitions)
          .filter(col("afp") =!= 0L),
        "media_id", "afp", maxHamming)
      .withColumnRenamed("d1", "m1")
      .withColumnRenamed("d2", "m2")

  /** REAL resample path for PCM WAV payloads (nearest sample, re-encoded);
    * metadata recomputed from the RESAMPLED audio — flooring the frame
    * count can shorten non-integer rate ratios by up to 1 ms, and metadata
    * must agree with the payload it describes. */
  def resampleWav(spark: SparkSession, media: DataFrame,
      targetHz: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.filter(col("kind") === "audio/wav").as[MediaRow]
      .mapPartitions(_.map { m =>
        val out = WavCodec.resampleAudio(WavCodec.decode(m.content), targetHz)
        m.copy(content = WavCodec.encode(out),
          sample_rate_hz = targetHz, duration_ms = out.durationMs)
      })
  }

  /** Image resize over the binary column; metadata updated alongside. */
  def resizeImages(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(m =>
      m.copy(content = FakeCodec.resize(m.content, w, h), width = w, height = h)))
  }

  /** REAL metadata probe for MP4/MOV payloads ([[Mp4Meta]]): duration and
    * video-track dimensions re-derived from the CONTAINER instead of
    * trusting ingest-supplied columns — the validation step a media
    * pipeline runs first, because downstream sampling plans budget by
    * these numbers (a wrong duration mis-sizes the frame fan-out).
    * Partition-wise like every codec path; frame decode remains the
    * documented stub, container arithmetic does not need it. */
  def probeMp4Metadata(spark: SparkSession, media: DataFrame,
      partitions: Int = 32): Dataset[MediaRow] = {
    import spark.implicits._
    media.filter(col("kind") === "video/mp4")
      .repartition(partitions, col("media_id")).as[MediaRow]
      .mapPartitions(_.map { m =>
        val info = Mp4Meta.parse(m.content)
        val v = info.videoTracks.headOption
        m.copy(duration_ms = info.durationMs.toInt,
          width = v.map(_.width).getOrElse(m.width),
          height = v.map(_.height).getOrElse(m.height))
      })
  }

  /** REAL metadata probe for MP3 payloads ([[Mp3Meta]]): duration, sample
    * rate and mean bitrate re-derived from the frame headers (ID3v2
    * skipped, VBR summed frame-by-frame) — same contract and shape as
    * [[probeMp4Metadata]]; subband decode stays the documented stub. */
  def probeMp3Metadata(spark: SparkSession, media: DataFrame,
      partitions: Int = 32): Dataset[MediaRow] = {
    import spark.implicits._
    media.filter(col("kind") === "audio/mp3")
      .repartition(partitions, col("media_id")).as[MediaRow]
      .mapPartitions(_.map { m =>
        val info = Mp3Meta.parse(m.content)
        m.copy(duration_ms = info.durationMs.toInt,
          sample_rate_hz = info.sampleRateHz)
      })
  }

  /** Frame sampling: one row per sampled frame — fan-out via flatMap, so a
    * 2-hour video explodes inside the executors, never on the driver. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      everyMs: Int): Dataset[MediaFrame] = {
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRow]
      .flatMap(m => FakeCodec.frameTimestamps(m.duration_ms, everyMs)
        .zipWithIndex.map { case (ts, i) =>
          MediaFrame(m.media_id, i, ts, FakeCodec.resize(m.content, 32, 32))
        })
  }
}
