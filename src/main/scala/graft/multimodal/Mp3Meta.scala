package graft.multimodal

/** Pure-JVM MP3 (MPEG audio) frame-header metadata parser — the audio
  * counterpart of [[Mp4Meta]]: bitrate, sample rate, channel mode, frame
  * count and duration, read from the frame headers (ISO/IEC 11172-3 §2.4
  * header syntax) without touching a single subband sample. Frame DECODE
  * stays the honest stub ([[Multimodal.FakeCodec]]); header arithmetic is
  * what duration-budgeting and ingest validation actually need.
  *
  * Handles: ID3v2 prefix skip (size is a 28-bit synchsafe int), MPEG-1/2
  * Layer III bitrate/samplerate tables, padding, VBR (per-frame bitrate —
  * duration sums frame times; `bitrateKbps` reports the mean rounded to
  * the nearest kbps). A payload with no valid sync raises a
  * self-describing IllegalArgumentException.
  */
object Mp3Meta {

  final case class Info(frames: Int, durationMs: Long, sampleRateHz: Int,
      bitrateKbps: Int, channels: Int)

  // MPEG-1 Layer III bitrates (kbps), index 1-14; MPEG-2/2.5 halves the table
  private val BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val BitrateV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
  private val SampleRateV1 = Array(44100, 48000, 32000, 0)
  private val SampleRateV2 = Array(22050, 24000, 16000, 0)
  private val SampleRateV25 = Array(11025, 12000, 8000, 0)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"not an MPEG audio payload: $msg")

  /** Bytes to skip for an ID3v2 tag at `pos`, or 0. The v2.4 footer flag
    * (flags bit 0x10) adds 10 bytes the size field deliberately excludes. */
  private def id3Size(b: Array[Byte], pos: Int): Int =
    if (pos + 10 <= b.length && b(pos) == 'I' && b(pos + 1) == 'D' && b(pos + 2) == '3') {
      // 4 synchsafe bytes (7 bits each) after the 6-byte header
      val sz = ((b(pos + 6) & 0x7F) << 21) | ((b(pos + 7) & 0x7F) << 14) |
        ((b(pos + 8) & 0x7F) << 7) | (b(pos + 9) & 0x7F)
      val footer = if ((b(pos + 5) & 0x10) != 0) 10 else 0
      10 + sz + footer
    } else 0

  def parse(bytes: Array[Byte]): Info = {
    var pos = id3Size(bytes, 0)
    var frames = 0
    var samplesAcc = 0L   // total samples (for duration)
    var rateHz = 0
    var channels = 0
    var bitAcc = 0L       // Σ per-frame bitrate for the VBR mean
    // any malformed header is fatal only BEFORE the first valid frame; after
    // one, it's trailing junk (tag remnants, 0xFF padding that happens to
    // carry sync bits) and parsing stops with what was read — rejecting a
    // file whose real frames all parsed would quarantine valid audio
    def badHeader(msg: String): Unit =
      if (frames == 0) fail(msg) else pos = bytes.length

    while (pos + 4 <= bytes.length) {
      val h = ((bytes(pos) & 0xFF) << 24) | ((bytes(pos + 1) & 0xFF) << 16) |
        ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
      if ((h >>> 21) != 0x7FF) {
        badHeader(f"no frame sync at offset $pos (header 0x$h%08x)")
      } else {
        val versionBits = (h >>> 19) & 3  // 0=2.5, 2=MPEG2, 3=MPEG1
        val layerBits = (h >>> 17) & 3    // 1=Layer III
        if (versionBits == 1 || layerBits != 1) {
          badHeader(s"unsupported version/layer bits at $pos")
        } else {
          val brIdx = (h >>> 12) & 0xF
          val srIdx = (h >>> 10) & 3
          val padding = (h >>> 9) & 1
          val chMode = (h >>> 6) & 3
          val v1 = versionBits == 3
          val kbps = (if (v1) BitrateV1L3 else BitrateV2L3)(brIdx)
          val sr = (versionBits match {
            case 3 => SampleRateV1
            case 2 => SampleRateV2
            case _ => SampleRateV25
          })(srIdx)
          if (kbps == 0 || sr == 0) {
            badHeader(s"free/bad bitrate or samplerate at $pos")
          } else {
            val samplesPerFrame = if (v1) 1152 else 576
            val frameLen = samplesPerFrame / 8 * kbps * 1000 / sr + padding
            frames += 1
            samplesAcc += samplesPerFrame
            bitAcc += kbps
            rateHz = sr
            channels = if (chMode == 3) 1 else 2
            pos += frameLen
          }
        }
      }
    }
    if (frames == 0) fail("no frames")
    Info(frames, samplesAcc * 1000 / rateHz, rateHz,
      ((bitAcc + frames / 2) / frames).toInt, channels)
  }
}
