package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic multimodal fixture corpus + the m-family golden queries
  * (r9 verdict #6: the m-family was the only one with neither oracle
  * rows nor committed goldens — spec-only coverage). Every payload is
  * synthesized in code from fixed parameters — structured PPM gradients,
  * their lossless PNG re-encodes, PCM WAV tones/steps, hand-assembled
  * ISO-BMFF and MPEG-frame containers — so the same bytes regenerate on
  * every run and the feature tables they decode to are exact golden
  * material for [[graft.Goldens]] / NoOracleGoldenSpec, keyed to a
  * fingerprint of the fixture frame itself (the committed-input
  * discipline the text/ANN goldens use, with the fixture standing in
  * for the driver-generated corpus).
  *
  * The golden surface exercises every REAL decode path end-to-end
  * through the DataFrame plumbing: pHash over both containers, the
  * banded Hamming near-dup join, PPM grid-mean features, WAV RMS
  * features and audio fingerprints, MP4 box-tree and MP3 frame-header
  * metadata probes. Only the documented [[Multimodal.FakeCodec]] stub
  * paths stay out — a golden over a stub would pin the stub, not the
  * engine. */
object MultimodalFixtures {

  import Multimodal.MediaRow

  /** Structured two-axis gradient with a seed-positioned bright block —
    * enough low-frequency structure for a stable pHash, varied enough
    * that different seeds hash apart. */
  private def gradientImage(w: Int, h: Int, seed: Int): PpmCodec.Image = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 3
        val inBlock = x > w / 4 + (seed % 3) && x < w / 2 &&
          y > h / 3 && y < 2 * h / 3
        val base = (x * 255 / w + y * 128 / h) % 256
        rgb(s) = (if (inBlock) 250 else base).toByte
        rgb(s + 1) = (base / 2).toByte
        rgb(s + 2) = ((x + y + seed) % 77).toByte
        x += 1
      }
      y += 1
    }
    PpmCodec.Image(w, h, rgb)
  }

  /** ±1 per-pixel perturbation — a near-duplicate within pHash radius. */
  private def noisy(img: PpmCodec.Image): PpmCodec.Image =
    PpmCodec.Image(img.width, img.height,
      img.rgb.zipWithIndex.map { case (b, i) =>
        (((b & 0xFF) + (i % 3) - 1).max(0).min(255)).toByte })

  /** PCM WAV: `frames` samples stepping through a fixed square pattern. */
  private def stepWav(sampleRate: Int, frames: Int, amp: Int,
      period: Int, channels: Int = 1): Array[Byte] = {
    val mono = Array.tabulate(frames)(i =>
      (if ((i / period) % 2 == 0) amp else -amp).toShort)
    val inter = mono.flatMap(s => Array.fill(channels)(s))
    WavCodec.encode(WavCodec.Audio(sampleRate, channels, inter))
  }

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
    b.array()
  }

  /** Minimal ISO-BMFF: ftyp + moov(mvhd, trak(tkhd, mdia(hdlr))). */
  private def tinyMp4(timescale: Int, duration: Int, w: Int,
      h: Int): Array[Byte] = {
    val ftyp = box("ftyp", "isom0000isom".getBytes("US-ASCII"))
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(duration)
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(4 + 20 + 52 + 8)
      b.position(4 + 20 + 52)
      b.putInt(w << 16).putInt(h << 16)
      box("tkhd", b.array())
    }
    val hdlr = {
      val b = java.nio.ByteBuffer.allocate(4 + 4 + 4 + 12)
      b.position(8); b.put("vide".getBytes("US-ASCII"))
      box("hdlr", b.array())
    }
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd ++ box("mdia", hdlr)))
  }

  /** ID3v2 prefix + `nFrames` MPEG-1 Layer III mono frame headers. */
  private def tinyMp3(nFrames: Int, kbps: Int): Array[Byte] = {
    val brIdx = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320).indexOf(kbps)
    require(brIdx > 0, s"unsupported fixture bitrate $kbps")
    def frame(padding: Int): Array[Byte] = {
      val f = Array.fill[Byte](144 * kbps * 1000 / 44100 + padding)(0x55)
      f(0) = 0xFF.toByte
      f(1) = 0xFB.toByte // MPEG1, Layer III, no CRC
      f(2) = ((brIdx << 4) | (padding << 1)).toByte // 44100 Hz
      f(3) = 0xC0.toByte // mono
      f
    }
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 12) ++
      Array.fill[Byte](12)(1)
    id3 ++ (1 to nFrames).flatMap(i => frame(i % 2)).toArray
  }

  /** The fixed fixture corpus — 15 rows spanning every real codec path.
    * Independent of the SF directory on purpose: the payloads ARE the
    * input, and the golden fingerprint hashes this frame. */
  def media(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val imgs = (0 until 4).map(s => gradientImage(64, 48, s))
    Seq(
      // PPM originals
      MediaRow(1L, "image/ppm", PpmCodec.encode(imgs(0)), 64, 48, 0, 0),
      MediaRow(2L, "image/ppm", PpmCodec.encode(imgs(1)), 64, 48, 0, 0),
      MediaRow(3L, "image/ppm", PpmCodec.encode(imgs(2)), 64, 48, 0, 0),
      MediaRow(4L, "image/ppm", PpmCodec.encode(imgs(3)), 64, 48, 0, 0),
      // lossless re-encode + noisy variant of image 1: the near-dup pair
      MediaRow(5L, "image/png", ImageIoCodec.encodePng(imgs(0)), 64, 48, 0, 0),
      MediaRow(6L, "image/png", ImageIoCodec.encodePng(noisy(imgs(0))),
        64, 48, 0, 0),
      // WAV: three mono square tones + one stereo
      MediaRow(10L, "audio/wav", stepWav(8000, 400, 16384, 50), 0, 0, 8000, 50),
      MediaRow(11L, "audio/wav", stepWav(16000, 800, 8192, 25), 0, 0, 16000, 50),
      MediaRow(12L, "audio/wav", stepWav(8000, 400, 4096, 100), 0, 0, 8000, 50),
      MediaRow(13L, "audio/wav", stepWav(8000, 400, 16384, 50, channels = 2),
        0, 0, 8000, 50),
      // MP4 containers: 90 kHz clock, distinct durations/dims
      MediaRow(20L, "video/mp4", tinyMp4(90000, 315000, 1280, 720), 0, 0, 0, 0),
      MediaRow(21L, "video/mp4", tinyMp4(90000, 90000, 640, 360), 0, 0, 0, 0),
      // MP3 streams: distinct frame counts / bitrates
      MediaRow(30L, "audio/mp3", tinyMp3(38, 128), 0, 0, 0, 0),
      MediaRow(31L, "audio/mp3", tinyMp3(10, 64), 0, 0, 0, 0),
      // an opaque row every kind-filter must exclude
      MediaRow(99L, "application/opaque", "not-media".getBytes, 0, 0, 0, 0))
      .toDS().toDF()
  }

  /** Long-form float features rounded to 6 dp — array columns flattened
    * so the golden hash reads scalar cells (the labelCentroids shape). */
  private def longForm(feats: DataFrame): DataFrame =
    feats.select(col("media_id"), posexplode(col("features")))
      .select(col("media_id"), col("pos"),
        round(col("col").cast("double"), 6).as("value"))
      .orderBy("media_id", "pos")

  /** The m-family golden queries — (SparkSession, sfDir) => DataFrame to
    * fit the [[graft.SparkEntry]] registry; the sfDir is ignored (the
    * fixture is the input, and the golden fingerprint covers it). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_image_phash" -> ((s, _) =>
      Multimodal.imagePhashes(s, media(s)).orderBy("media_id")),
    "m02_ppm_feats" -> ((s, _) =>
      longForm(Multimodal.extractPpmFeatures(s, media(s), grid = 2).toDF())),
    "m03_audio_fp" -> ((s, _) =>
      Multimodal.audioFingerprints(s, media(s)).orderBy("media_id")),
    "m04_mp4_meta" -> ((s, _) =>
      Multimodal.probeMp4Metadata(s, media(s)).toDF()
        .select("media_id", "duration_ms", "width", "height")
        .orderBy("media_id")),
    "m05_mp3_meta" -> ((s, _) =>
      Multimodal.probeMp3Metadata(s, media(s)).toDF()
        .select("media_id", "duration_ms", "sample_rate_hz")
        .orderBy("media_id")),
    "m06_image_neardup" -> ((s, _) =>
      Multimodal.imageNearDuplicates(s, media(s), maxHamming = 6)
        .orderBy("m1", "m2")),
    "m07_wav_rms" -> ((s, _) =>
      longForm(Multimodal.extractWavFeatures(s, media(s), windows = 4)
        .toDF())))
}
