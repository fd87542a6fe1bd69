package graft.multimodal

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._
  import Multimodal._

  private lazy val media = Seq(
    MediaRow(1L, "image", "img-one".getBytes, 640, 480, 0, 0),
    MediaRow(2L, "image", "img-two".getBytes, 1024, 768, 0, 0),
    MediaRow(3L, "audio", "aud-one".getBytes, 0, 0, 16000, 2500),
    MediaRow(4L, "video", "vid-one".getBytes, 1920, 1080, 48000, 1000))
    .toDS().toDF()

  test("feature extraction is deterministic with the declared shape") {
    val f1 = extractFeatures(spark, media, dim = 16, partitions = 4)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = extractFeatures(spark, media, dim = 16, partitions = 2)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1.keySet == Set(1L, 2L, 3L, 4L))
    assert(f1.values.forall(_.length == 16))
    assert(f1 == f2) // partitioning must not change results
    assert(f1(1L) != f1(2L)) // different payloads -> different features
  }

  test("resize rewrites payload and metadata together") {
    val out = resizeImages(spark, media, 64, 64).collect()
    assert(out.forall(m => m.width == 64 && m.height == 64))
    val orig = media.as[MediaRow].collect().map(m => m.media_id -> m.content.toSeq).toMap
    assert(out.forall(m => m.content.toSeq != orig(m.media_id)))
  }

  test("frame sampling fans out one row per sampled timestamp") {
    val frames = sampleFrames(spark, media, everyMs = 250).collect()
    assert(frames.forall(_.media_id == 4L)) // only the video row
    assert(frames.map(_.ts_ms).sorted.toSeq == Seq(0, 250, 500, 750, 1000))
    assert(frames.map(_.frame_idx).sorted.toSeq == (0 to 4))
  }

  // ---- REAL codec path: P6 PPM, hand-computable pixel values

  /** 2×2 P6 image: (R,G,B) = red, green / blue, white. */
  private def tinyPpm: Array[Byte] = PpmCodec.encode(PpmCodec.Image(2, 2,
    Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)))

  test("ppm codec: decode handles comments, roundtrips, rejects garbage") {
    val withComment = ("P6\n# a comment line\n2 2\n255\n").getBytes("US-ASCII") ++
      tinyPpm.drop("P6\n2 2\n255\n".length)
    val img = PpmCodec.decode(withComment)
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == PpmCodec.decode(tinyPpm).rgb.toSeq)
    assert(PpmCodec.decode(PpmCodec.encode(img)).rgb.toSeq == img.rgb.toSeq)
    intercept[IllegalArgumentException](PpmCodec.decode("P5 1 1 255 x".getBytes))
    intercept[IllegalArgumentException](PpmCodec.decode("P6 9 9 255 ".getBytes))
  }

  test("ppm grid features are exact channel means, normalized") {
    // grid=1: one cell covering all 4 pixels → mean per channel
    val f = PpmCodec.gridMeanFeatures(tinyPpm, grid = 1)
    val expect = Seq((255 + 0 + 0 + 255) / 4.0 / 255.0,
      (0 + 255 + 0 + 255) / 4.0 / 255.0,
      (0 + 0 + 255 + 255) / 4.0 / 255.0).map(_.toFloat)
    assert(f.toSeq == expect)
    // grid=2: one cell per pixel → exact normalized pixel values
    val f2 = PpmCodec.gridMeanFeatures(tinyPpm, grid = 2)
    assert(f2.toSeq == Seq(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f, 1f, 1f, 1f, 1f))
  }

  test("ppm nearest resize picks the floor-convention source pixel") {
    val up = PpmCodec.decode(PpmCodec.resizeNearest(tinyPpm, 4, 4))
    assert(up.width == 4 && up.height == 4)
    // top-left quadrant of the 4×4 output must be the red source pixel
    assert((up.rgb(0) & 0xFF, up.rgb(1) & 0xFF, up.rgb(2) & 0xFF) == ((255, 0, 0)))
    val down = PpmCodec.decode(PpmCodec.resizeNearest(tinyPpm, 1, 1))
    assert(down.rgb.map(_ & 0xFF).toSeq == Seq(255, 0, 0)) // floor → (0,0)
  }

  test("real ppm pipeline: partition-wise decode over a DataFrame") {
    val ppmMedia = Seq(
      MediaRow(10L, "image/ppm", tinyPpm, 2, 2, 0, 0),
      MediaRow(11L, "image", "opaque".getBytes, 8, 8, 0, 0)) // not ppm → excluded
      .toDS().toDF()
    val feats = extractPpmFeatures(spark, ppmMedia, grid = 1, partitions = 2)
      .collect()
    assert(feats.map(_.media_id).toSeq == Seq(10L))
    assert(feats.head.features.length == 3)
    assert(feats.head.features(0) == ((255 + 255) / 4.0 / 255.0).toFloat)
    val resized = resizePpmImages(spark, ppmMedia, 1, 1).collect()
    assert(resized.length == 1 && resized.head.width == 1)
    assert(PpmCodec.decode(resized.head.content).rgb.map(_ & 0xFF).toSeq
      == Seq(255, 0, 0))
  }

  // ---- REAL codec path: compressed images via the JDK's ImageIO

  /** The tiny 2×2 fixture (red, green / blue, white) as PNG bytes. */
  private def tinyPng: Array[Byte] =
    ImageIoCodec.encodePng(PpmCodec.decode(tinyPpm))

  test("imageio codec: PNG decode reproduces the exact pixels (golden)") {
    val img = ImageIoCodec.decode(tinyPng)
    assert(img.width == 2 && img.height == 2)
    // PNG is lossless: decoded RGB must equal the PPM source exactly
    assert(img.rgb.toSeq == PpmCodec.decode(tinyPpm).rgb.toSeq)
    // identical pixels → identical features, whatever the container
    assert(ImageIoCodec.gridMeanFeatures(tinyPng, grid = 2).toSeq ==
      PpmCodec.gridMeanFeatures(tinyPpm, grid = 2).toSeq)
    intercept[IllegalArgumentException](
      ImageIoCodec.decode("not an image".getBytes))
  }

  test("imageio codec: JPEG decodes through the same core within lossy tolerance") {
    // encode the fixture as JPEG via the JDK (encoder-dependent bytes, so
    // assert approximate pixel recovery, not a byte golden)
    val bi = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    bi.setRGB(0, 0, 0xFF0000); bi.setRGB(1, 0, 0x00FF00)
    bi.setRGB(0, 1, 0x0000FF); bi.setRGB(1, 1, 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", out)
    val f = ImageIoCodec.gridMeanFeatures(out.toByteArray, grid = 1)
    val expect = PpmCodec.gridMeanFeatures(tinyPpm, grid = 1)
    f.zip(expect).foreach { case (got, want) =>
      assert(math.abs(got - want) < 0.25, s"jpeg decode too far off: $got vs $want")
    }
  }

  test("real compressed-image pipeline: featurize + resize over a DataFrame") {
    val rows = Seq(
      MediaRow(30L, "image/png", tinyPng, 2, 2, 0, 0),
      MediaRow(31L, "image", "opaque".getBytes, 8, 8, 0, 0)) // excluded
      .toDS().toDF()
    val feats = extractImageFeatures(spark, rows, grid = 2, partitions = 2)
      .collect()
    assert(feats.map(_.media_id).toSeq == Seq(30L))
    assert(feats.head.features.toSeq ==
      PpmCodec.gridMeanFeatures(tinyPpm, grid = 2).toSeq)
    val res = resizeCompressedImages(spark, rows, 4, 4).collect()
    assert(res.length == 1 && res.head.kind == "image/png"
      && res.head.width == 4 && res.head.height == 4)
    // PNG re-encode is lossless: decoded resize equals the PPM-side resize
    assert(ImageIoCodec.decode(res.head.content).rgb.toSeq ==
      PpmCodec.decode(PpmCodec.resizeNearest(tinyPpm, 4, 4)).rgb.toSeq)
  }

  // 100 frames of silence then 100 frames of constant amplitude 16384
  private def stepWav(channels: Int = 1): Array[Byte] = {
    val frames = Array.fill(100)(0.toShort) ++ Array.fill(100)(16384.toShort)
    val inter = frames.flatMap(s => Array.fill(channels)(s))
    WavCodec.encode(WavCodec.Audio(8000, channels, inter))
  }

  test("wav codec: roundtrip, duration, and loud rejection of garbage") {
    val a = WavCodec.decode(stepWav())
    assert(a.sampleRate == 8000 && a.channels == 1 && a.frames == 200)
    assert(a.durationMs == 25) // 200 frames at 8 kHz
    assert(WavCodec.decode(WavCodec.encode(a)).samples.toSeq == a.samples.toSeq)
    intercept[IllegalArgumentException](WavCodec.decode("nope".getBytes))
  }

  // hand-assemble an 8-bit G.711 WAV (format 6 = A-law, 7 = mu-law)
  private def g711Wav(format: Int, data: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(format.toShort).putShort(1).putInt(8000)
      .putInt(8000).putShort(1).putShort(8)
    buf.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    buf.array()
  }

  test("wav codec: G.711 mu-law and A-law expand to the ITU anchor values") {
    // mu-law: 0x00 = full-scale negative, 0x80 = full-scale positive,
    // 0xFF = zero — the published G.711 extremes
    val u = WavCodec.decode(g711Wav(7,
      Array(0x00, 0x80, 0xFF).map(_.toByte)))
    assert(u.sampleRate == 8000 && u.samples.toSeq == Seq(-32124, 32124, 0))
    // A-law: 0x55 = -8 (smallest negative), 0xD5 = +8, 0xAA = +32256 (max)
    val a = WavCodec.decode(g711Wav(6,
      Array(0x55, 0xD5, 0xAA).map(_.toByte)))
    assert(a.samples.toSeq == Seq(-8, 8, 32256))
    // an unsupported compression code still fails loudly
    intercept[IllegalArgumentException](
      WavCodec.decode(g711Wav(2, Array(0x00.toByte))))
  }

  test("wav codec: IMA ADPCM block decodes to the hand-stepped samples") {
    // mono block: predictor=100, stepIndex=0, nibbles 3,7 then 0,0xF
    // (low nibble first). Stepping the published tables by hand:
    //   3 at step 7 → +4 (104), 7 at step 7 → +11 (115, index→8),
    //   0 at step 16 → +2 (117, index→7), F at step 14 → −25 (92)
    val data = java.nio.ByteBuffer.allocate(6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(100).put(0.toByte).put(0.toByte)
      .put(0x73.toByte).put(0xF0.toByte).array()
    val buf = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(0x11).putShort(1).putInt(8000)
      .putInt(4000).putShort(8).putShort(4)
    buf.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    val a = WavCodec.decode(buf.array())
    assert(a.samples.toSeq == Seq(100, 104, 115, 117, 92))
    // stereo ADPCM is out of scope and must refuse loudly, not decode noise
    val stereo = buf.array().clone()
    stereo(22) = 2 // channel count lives at offset 22
    intercept[IllegalArgumentException](WavCodec.decode(stereo))
    // a fact chunk caps the output: the final block's padding nibbles are
    // not audio and must not surface as trailing samples
    val withFact = java.nio.ByteBuffer.allocate(44 + 12 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    withFact.put("RIFF".getBytes("US-ASCII")).putInt(48 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
    withFact.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(0x11).putShort(1).putInt(8000)
      .putInt(4000).putShort(8).putShort(4)
    withFact.put("fact".getBytes("US-ASCII")).putInt(4).putInt(3)
    withFact.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    assert(WavCodec.decode(withFact.array()).samples.toSeq ==
      Seq(100, 104, 115))
  }

  test("wav rms features: silence 0, constant A/32768, full-scale stays <= 1") {
    Seq(1, 2).foreach { ch =>
      val f = WavCodec.rmsFeatures(stepWav(ch), nWindows = 2)
      assert(f(0) == 0f, s"ch=$ch silence half")
      assert(f(1) == 0.5f, s"ch=$ch loud half") // 16384/32768 exactly
    }
    val fullNeg = WavCodec.encode(WavCodec.Audio(8000, 1,
      Array.fill(64)(Short.MinValue)))
    val f = WavCodec.rmsFeatures(fullNeg, nWindows = 1)
    assert(f(0) == 1f) // |Short.MinValue|/32768 — the documented range cap
  }

  test("wav resample halves frames at half rate; duration preserved") {
    val out = WavCodec.decode(WavCodec.resampleNearest(stepWav(), 4000))
    assert(out.sampleRate == 4000 && out.frames == 100)
    assert(out.durationMs == 25)
    // step edge survives: first half silent, second half constant
    assert(out.samples.take(50).forall(_ == 0))
    assert(out.samples.drop(50).forall(_ == 16384))
  }

  test("real wav pipeline: partition-wise decode + resample over a DataFrame") {
    val rows = Seq(
      MediaRow(20L, "audio/wav", stepWav(), 0, 0, 8000, 25),
      MediaRow(21L, "audio", "opaque".getBytes, 0, 0, 44100, 99)) // not wav → excluded
      .toDS().toDF()
    val feats = extractWavFeatures(spark, rows, windows = 2, partitions = 2).collect()
    assert(feats.map(_.media_id).toSeq == Seq(20L))
    assert(feats.head.features.length == 2 && feats.head.features(0) == 0f)
    val res = resampleWav(spark, rows, 4000).collect()
    assert(res.length == 1 && res.head.sample_rate_hz == 4000)
    assert(WavCodec.decode(res.head.content).frames == 100)
    assert(res.head.duration_ms == 25)
    // non-integer ratio: floored frame count -> metadata tracks the payload
    val odd = resampleWav(spark, rows, 7999).collect().head
    assert(odd.duration_ms == WavCodec.decode(odd.content).durationMs)
    assert(odd.duration_ms == 24)
  }

  // ---- hand-assembled minimal ISO-BMFF file: ftyp + moov(mvhd, trak(tkhd, mdia(hdlr)))
  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
    b.array()
  }
  private def tinyMp4(timescale: Int, duration: Int, w: Int, h: Int): Array[Byte] = {
    val ftyp = box("ftyp", "isom0000isom".getBytes("US-ASCII"))
    val mvhd = { // version 0: ver/flags, creation, modification, timescale, duration
      val b = java.nio.ByteBuffer.allocate(4 + 4 + 4 + 4 + 4 + 80)
      b.putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(duration)
      box("mvhd", b.array())
    }
    val tkhd = { // version 0: 20 bytes of times/ids, 52 bytes to dims, w/h 16.16
      val b = java.nio.ByteBuffer.allocate(4 + 20 + 52 + 8)
      b.position(4 + 20 + 52)
      b.putInt(w << 16).putInt(h << 16)
      box("tkhd", b.array())
    }
    val hdlr = { // ver/flags, pre_defined, handler_type, 12 reserved
      val b = java.nio.ByteBuffer.allocate(4 + 4 + 4 + 12)
      b.position(8); b.put("vide".getBytes("US-ASCII"))
      box("hdlr", b.array())
    }
    val trak = box("trak", tkhd ++ box("mdia", hdlr))
    ftyp ++ box("moov", mvhd ++ trak)
  }

  test("mp4 metadata probe reads duration and video dims from the container") {
    // 90 kHz clock (the MPEG standard timescale), 3.5 s of it
    val payload = tinyMp4(timescale = 90000, duration = 315000, w = 1280, h = 720)
    val info = Mp4Meta.parse(payload)
    assert(info.durationMs == 3500)
    assert(info.timescale == 90000L)
    assert(info.videoTracks == Seq(Mp4Meta.Track("video", 1280, 720)))
    // the DataFrame path overrides ingest-supplied metadata with the truth
    val rows = Seq(
      MediaRow(30L, "video/mp4", payload, 0, 0, 0, 999), // lying metadata
      MediaRow(31L, "video", "not-bmff".getBytes, 1, 1, 0, 1)) // excluded by kind
      .toDS().toDF()
    val probed = probeMp4Metadata(spark, rows, partitions = 2).collect()
    assert(probed.map(_.media_id).toSeq == Seq(30L))
    assert(probed.head.duration_ms == 3500)
    assert(probed.head.width == 1280 && probed.head.height == 720)
    // garbage fails loudly, not with half-parsed numbers
    intercept[IllegalArgumentException](Mp4Meta.parse("mp3junk!!".getBytes))
  }

  // ---- hand-assembled MP3: ID3v2 prefix + N MPEG-1 Layer III frames
  private def mp3Frame(kbps: Int, padding: Int): Array[Byte] = {
    // sync(11) version=3(2) layer=01(2) noCRC(1) | brIdx(4) srIdx=00->44100(2) pad(1) priv(1) | mode=11 mono(2)...
    val brIdx = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
      .indexOf(kbps)
    val frameLen = 144 * kbps * 1000 / 44100 + padding
    val f = Array.fill[Byte](frameLen)(0x55)
    f(0) = 0xFF.toByte
    f(1) = 0xFB.toByte // 1111 1011: MPEG1, Layer III, no CRC
    f(2) = ((brIdx << 4) | (0 << 2) | (padding << 1)).toByte
    f(3) = 0xC0.toByte // mono
    f
  }
  private def tinyMp3(nFrames: Int): Array[Byte] = {
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 12) ++
      Array.fill[Byte](12)(1) // 12-byte synchsafe-sized tag body
    id3 ++ (1 to nFrames).flatMap(i => mp3Frame(128, i % 2)).toArray
  }

  test("mp3 metadata probe reads duration/rate/bitrate from frame headers") {
    val payload = tinyMp3(nFrames = 38) // 38 * 1152 / 44100 ≈ 992.6 ms
    val info = Mp3Meta.parse(payload)
    assert(info.frames == 38)
    assert(info.sampleRateHz == 44100)
    assert(info.bitrateKbps == 128)
    assert(info.channels == 1)
    assert(info.durationMs == 38L * 1152 * 1000 / 44100)
    val rows = Seq(
      MediaRow(40L, "audio/mp3", payload, 0, 0, 0, 0),
      MediaRow(41L, "audio/wav", stepWav(), 0, 0, 8000, 25)) // excluded by kind
      .toDS().toDF()
    val probed = probeMp3Metadata(spark, rows, partitions = 2).collect()
    assert(probed.map(_.media_id).toSeq == Seq(40L))
    assert(probed.head.duration_ms == 992)
    assert(probed.head.sample_rate_hz == 44100)
    intercept[IllegalArgumentException](Mp3Meta.parse("RIFFnope".getBytes))
    // trailing junk that HAPPENS to carry sync bits (0xFF padding) after
    // valid frames must not reject the file — stop, keep what parsed
    val padded = tinyMp3(nFrames = 3) ++ Array.fill[Byte](7)(0xFF.toByte)
    assert(Mp3Meta.parse(padded).frames == 3)
    // ID3v2.4 footer flag: the 10-byte footer is skipped too
    val withFooter = {
      val body = Array.fill[Byte](12)(1)
      Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 0, 12) ++ body ++
        Array[Byte]('3', 'D', 'I', 4, 0, 0x10, 0, 0, 0, 12) ++
        mp3Frame(128, 0) ++ mp3Frame(128, 0)
    }
    assert(Mp3Meta.parse(withFooter).frames == 2)
  }

  // ---- perceptual hash (pHash) + banded Hamming image near-dup

  /** Deterministic structured test image: smooth two-axis gradient with a
    * bright block — enough low-frequency structure for a stable pHash. */
  private def gradientImage(w: Int, h: Int, seed: Int): PpmCodec.Image = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val s = (y * w + x) * 3
      val inBlock = x > w / 4 + (seed % 3) && x < w / 2 && y > h / 3 && y < 2 * h / 3
      val base = (x * 255 / w + y * 128 / h) % 256
      rgb(s) = (if (inBlock) 250 else base).toByte
      rgb(s + 1) = (base / 2).toByte
      rgb(s + 2) = ((x + y + seed) % 77).toByte
    }
    PpmCodec.Image(w, h, rgb)
  }

  test("phash: container-invariant, noise-tolerant, structure-sensitive") {
    val img = gradientImage(64, 48, 0)
    // identical pixels, different containers → identical hash
    assert(Phash.phash64(img) ==
      Phash.phashPayload("image/png", ImageIoCodec.encodePng(img)))
    assert(Phash.phash64(img) ==
      Phash.phashPayload("image/ppm", PpmCodec.encode(img)))
    // light per-pixel noise → small Hamming distance
    val noisy = PpmCodec.Image(img.width, img.height,
      img.rgb.zipWithIndex.map { case (b, i) =>
        (((b & 0xFF) + (i % 3) - 1).max(0).min(255)).toByte })
    val dNoise = java.lang.Long.bitCount(Phash.phash64(img) ^ Phash.phash64(noisy))
    assert(dNoise <= 6, s"noise moved the hash $dNoise bits")
    // luma inversion exactly negates every AC coefficient AND the AC mean,
    // so every hash bit flips (up to coeff==mean ties): distance ≈ 63
    val inverted = PpmCodec.Image(img.width, img.height,
      img.rgb.map(b => (255 - (b & 0xFF)).toByte))
    assert(java.lang.Long.bitCount(Phash.phash64(img) ^ Phash.phash64(inverted)) > 40)
  }

  test("image near-dup: banded join finds the re-encode, not the stranger") {
    val a = gradientImage(64, 48, 0)
    val noisy = PpmCodec.Image(a.width, a.height,
      a.rgb.zipWithIndex.map { case (b, i) =>
        (((b & 0xFF) + (i % 3) - 1).max(0).min(255)).toByte })
    val stranger = PpmCodec.Image(64, 48,
      gradientImage(64, 48, 0).rgb.map(b => (255 - (b & 0xFF)).toByte))
    val media = Seq(
      MediaRow(1L, "image/ppm", PpmCodec.encode(a), 64, 48, 0, 0),
      MediaRow(2L, "image/png", ImageIoCodec.encodePng(noisy), 64, 48, 0, 0),
      MediaRow(3L, "image/ppm", PpmCodec.encode(stranger), 64, 48, 0, 0))
      .toDS().toDF()
    val pairs = imageNearDuplicates(spark, media, maxHamming = 6, partitions = 2)
      .collect().map(r => (r.getAs[Long]("m1"), r.getAs[Long]("m2"))).toSet
    assert(pairs == Set((1L, 2L)))
    // pigeonhole banding agrees with the exhaustive O(n²) check
    val hashes = imagePhashes(spark, media, partitions = 2).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("phash")).toMap
    val brute = (for {
      (i, hi) <- hashes; (j, hj) <- hashes if i < j
      if java.lang.Long.bitCount(hi ^ hj) <= 6
    } yield (i, j)).toSet
    assert(pairs == brute)
  }

  // 9-segment "melody" aligned with AudioFp's 9 frames: each segment one
  // tone, so band energies genuinely evolve and the double-difference
  // bits carry signal (a steady tone is the degenerate near-tie case)
  private def melody(freqs: Seq[Double], sr: Int = 8000,
      perSeg: Int = 1800, amp: Int = 8000): WavCodec.Audio = {
    val samples = freqs.flatMap(f => (0 until perSeg).map(i =>
      (amp * math.sin(2 * math.Pi * f * i / sr)).toShort)).toArray
    WavCodec.Audio(sr, 1, samples)
  }
  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("audio fingerprint: deterministic, noise-robust, resample-stable, melody-discriminating") {
    val fa = Seq(300.0, 700, 1500, 400, 3000, 900, 2000, 500, 1200)
    val fb = Seq(2800.0, 350, 1900, 3100, 600, 2500, 800, 1700, 450)
    val a = melody(fa)
    val fpA = AudioFp.fingerprint(a)
    assert(fpA == AudioFp.fingerprint(melody(fa))) // pure function
    // deterministic ±50 pseudo-noise (~0.6% of amplitude): few bits move
    val noisy = a.copy(samples = a.samples.zipWithIndex.map { case (s, i) =>
      (s + (i * 2654435761L % 101).toInt - 50).toShort })
    assert(hamming(fpA, AudioFp.fingerprint(noisy)) <= 6)
    // canonical-rate analysis: a 2× upsampled copy canonicalizes back to
    // the identical sample stream, so the fingerprint is EXACTLY stable
    // under integer-ratio rate changes (non-integer nearest-sample
    // resampling aliases — a genuinely different signal, out of scope)
    assert(hamming(fpA,
      AudioFp.fingerprint(WavCodec.resampleAudio(a, 16000))) == 0)
    // a different melody is far away
    assert(hamming(fpA, AudioFp.fingerprint(melody(fb))) > 16)
    // too short to frame → the sentinel zero
    assert(AudioFp.fingerprint(
      WavCodec.Audio(8000, 1, Array.fill(4)(100.toShort))) == 0L)
  }

  test("audio near-duplicates: planted noisy copy found, stranger and short clips excluded") {
    val fa = Seq(300.0, 700, 1500, 400, 3000, 900, 2000, 500, 1200)
    val a = melody(fa)
    val noisy = a.copy(samples = a.samples.zipWithIndex.map { case (s, i) =>
      (s + (i * 2654435761L % 101).toInt - 50).toShort })
    val stranger = melody(Seq(2800.0, 350, 1900, 3100, 600, 2500, 800, 1700, 450))
    val tiny = WavCodec.Audio(8000, 1, Array.fill(4)(100.toShort))
    val media = Seq(
      MediaRow(1L, "audio/wav", WavCodec.encode(a), 0, 0, 8000, a.durationMs),
      MediaRow(2L, "audio/wav", WavCodec.encode(noisy), 0, 0, 8000, noisy.durationMs),
      MediaRow(3L, "audio/wav", WavCodec.encode(stranger), 0, 0, 8000, stranger.durationMs),
      MediaRow(4L, "audio/wav", WavCodec.encode(tiny), 0, 0, 8000, tiny.durationMs),
      MediaRow(5L, "audio/wav", WavCodec.encode(tiny), 0, 0, 8000, tiny.durationMs))
      .toDS().toDF()
    val pairs = audioNearDuplicates(spark, media, maxHamming = 6, partitions = 2)
      .collect().map(r => (r.getAs[Long]("m1"), r.getAs[Long]("m2"))).toSet
    // the two zero-fingerprint shorts (4,5) must NOT pair up
    assert(pairs == Set((1L, 2L)))
  }
}
