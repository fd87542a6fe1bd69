package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL (non-stub) codec for RIFF/WAVE audio — a pure-JVM parser, no
  * audio libraries required, giving the multimodal pipeline a fully-real
  * audio path (decode → windowed-RMS featurize → resample) next to
  * [[PpmCodec]]'s image path. Four sample codings are supported: 16-bit
  * PCM (format 1), the two ITU-T G.711 companded telephony codings —
  * 8-bit μ-law (format 7) and 8-bit A-law (format 6) — expanded to
  * 16-bit linear via the published G.711 segment/quantization formulas,
  * and mono IMA ADPCM (format 0x11), a REAL 4:1 compressed format
  * decoded block-by-block with the published step/index tables.
  * Perceptual codecs (MP3/AAC/OGG) remain behind [[Multimodal.FakeCodec]]
  * because those decoders don't exist in this environment.
  *
  * RIFF layout: `RIFF <size> WAVE`, then tagged chunks; we need `fmt `
  * and `data` (interleaved little-endian samples). Unknown chunks
  * (LIST, fact, …) are skipped by their declared size.
  */
object WavCodec {

  /** G.711 μ-law byte → 16-bit linear (ITU G.711 §4.2; the classic
    * bias-0x84 segment expansion). Full-scale anchors: 0x00 → −32124,
    * 0x80 → +32124, 0xFF → 0. */
  def ulawToLinear(b: Byte): Short = {
    val u = ~b & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** G.711 A-law byte → 16-bit linear (ITU G.711 §4.1; XOR-0x55 mask,
    * segment 0/1 special cases). Anchors: 0x55 → −8, 0xD5 → +8,
    * 0xAA → +32256. */
  def alawToLinear(b: Byte): Short = {
    val a = (b & 0xff) ^ 0x55
    val seg = (a & 0x70) >> 4
    val base = (a & 0x0f) << 4
    val t = seg match {
      case 0 => base + 8
      case 1 => base + 0x108
      case _ => (base + 0x108) << (seg - 1)
    }
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def frames: Int = if (channels == 0) 0 else samples.length / channels
    def durationMs: Int =
      if (sampleRate == 0) 0 else (frames.toLong * 1000L / sampleRate).toInt
  }

  // IMA ADPCM tables (IMA Recommended Practices / Microsoft WAV format
  // 0x11): 89-entry step-size table + per-nibble index adjustment
  private val imaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val imaIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Decode one mono IMA ADPCM block: 4-byte header (int16 predictor,
    * uint8 step index, reserved), then two 4-bit samples per byte,
    * low nibble first. The header's predictor IS the block's first
    * output sample. */
  private def imaDecodeBlock(buf: ByteBuffer, blockBytes: Int,
      out: java.util.ArrayList[Short]): Unit = {
    var pred: Int = buf.getShort.toInt
    var index: Int = buf.get() & 0xff
    buf.get() // reserved
    require(index <= 88, s"ADPCM step index $index out of range")
    out.add(pred.toShort)
    var i = 4
    while (i < blockBytes) {
      val byte = buf.get() & 0xff
      var half = 0
      while (half < 2) {
        val n = if (half == 0) byte & 0x0f else (byte >> 4) & 0x0f
        val step = imaStepTable(index)
        var diff = step >> 3
        if ((n & 1) != 0) diff += step >> 2
        if ((n & 2) != 0) diff += step >> 1
        if ((n & 4) != 0) diff += step
        pred = if ((n & 8) != 0) pred - diff else pred + diff
        if (pred > 32767) pred = 32767
        if (pred < -32768) pred = -32768
        index = math.max(0, math.min(88, index + imaIndexTable(n)))
        out.add(pred.toShort)
        half += 1
      }
      i += 1
    }
  }

  /** Parse a WAV payload. Throws on malformed/unsupported input — a
    * training pipeline wants loud per-record failures it can route to
    * quarantine, not silently wrong audio. */
  def decode(content: Array[Byte]): Audio = {
    val buf = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF file")
    buf.getInt // riff size; trust chunk walking, not this
    require(tag() == "WAVE", "not a WAVE file")
    var sampleRate = 0
    var channels = 0
    var format = 0
    var blockAlign = 0
    var factSamples = -1L
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val id = tag()
      val size = buf.getInt
      id match {
        case "fact" =>
          // true per-channel sample count for compressed formats — the
          // final ADPCM block's padding nibbles are NOT audio and must
          // not be emitted as trailing samples
          val factEnd = buf.position() + size + (size & 1)
          factSamples = buf.getInt.toLong & 0xffffffffL
          buf.position(factEnd)
        case "fmt " =>
          val fmtEnd = buf.position() + size
          format = buf.getShort.toInt
          require(format == 1 || format == 6 || format == 7 || format == 0x11,
            s"unsupported WAV format $format (want PCM=1, A-law=6, mu-law=7, IMA ADPCM=17)")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt // byte rate
          blockAlign = buf.getShort.toInt
          val bits = buf.getShort
          format match {
            case 1 =>
              require(bits == 16, s"unsupported PCM bit depth $bits (want 16)")
            case 0x11 =>
              require(bits == 4, s"IMA ADPCM requires 4-bit samples, found $bits")
              require(channels == 1, "IMA ADPCM decode supports mono only")
              require(blockAlign >= 4, s"ADPCM block align $blockAlign too small")
            case _ =>
              require(bits == 8, s"G.711 requires 8-bit samples, found $bits")
          }
          buf.position(fmtEnd)
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          samples =
            if (format == 1) {
              val out = new Array[Short](size / 2)
              var i = 0
              while (i < out.length) { out(i) = buf.getShort; i += 1 }
              out
            } else if (format == 0x11) {
              val out = new java.util.ArrayList[Short]()
              var left = size
              while (left >= 4) {
                imaDecodeBlock(buf, math.min(blockAlign, left), out)
                left -= math.min(blockAlign, left)
              }
              val n =
                if (factSamples >= 0) math.min(out.size().toLong, factSamples).toInt
                else out.size()
              val arr = new Array[Short](n)
              var i = 0
              while (i < arr.length) { arr(i) = out.get(i); i += 1 }
              arr
            } else {
              val out = new Array[Short](size)
              var i = 0
              while (i < out.length) {
                val b = buf.get()
                out(i) = if (format == 7) ulawToLinear(b) else alawToLinear(b)
                i += 1
              }
              out
            }
        case _ => // LIST, fact, … — skip (chunks are word-aligned)
          buf.position(buf.position() + size + (size & 1))
      }
    }
    require(samples != null, "no data chunk")
    Audio(sampleRate, channels, samples)
  }

  /** Write a standard 44-byte-header PCM WAV. */
  def encode(a: Audio): Array[Byte] = {
    val dataBytes = a.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(a.channels.toShort).putInt(a.sampleRate)
      .putInt(a.sampleRate * a.channels * 2)
      .putShort((a.channels * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    a.samples.foreach(buf.putShort)
    buf.array()
  }

  /** Windowed loudness profile: mono-mix, split into `nWindows` equal
    * spans, RMS of each normalized to [0,1] — the fixed-size feature
    * vector an audio-quality filter or a silence detector consumes.
    * Normalized by 32768 (|Short.MinValue|), so a full-scale NEGATIVE
    * signal maps to exactly 1.0 and the documented range is never
    * exceeded (÷32767 would yield 1.00003 on such input). */
  def rmsFeatures(content: Array[Byte], nWindows: Int): Array[Float] = {
    val a = decode(content)
    val n = a.frames
    Array.tabulate(nWindows) { w =>
      val lo = (w.toLong * n / nWindows).toInt
      val hi = ((w + 1).toLong * n / nWindows).toInt
      if (hi <= lo) 0f
      else {
        var acc = 0.0
        var f = lo
        while (f < hi) {
          // mono mix of the interleaved channels
          var s = 0.0
          var c = 0
          while (c < a.channels) { s += a.samples(f * a.channels + c); c += 1 }
          val m = s / a.channels
          acc += m * m
          f += 1
        }
        (math.sqrt(acc / (hi - lo)) / 32768.0).toFloat
      }
    }
  }

  /** Nearest-sample resample to `targetHz` (per channel, deterministic) —
    * the normalization step before feature extraction when a corpus mixes
    * sample rates. The frame count floors, so for non-integer rate ratios
    * the result can be up to one source frame shorter — read duration off
    * the RESULT ([[Audio.durationMs]]), not the input. */
  def resampleAudio(a: Audio, targetHz: Int): Audio = {
    val outFrames = (a.frames.toLong * targetHz / a.sampleRate).toInt
    val out = new Array[Short](outFrames * a.channels)
    var f = 0
    while (f < outFrames) {
      val src = (f.toLong * a.sampleRate / targetHz).toInt
      var c = 0
      while (c < a.channels) {
        out(f * a.channels + c) = a.samples(src * a.channels + c)
        c += 1
      }
      f += 1
    }
    Audio(targetHz, a.channels, out)
  }

  def resampleNearest(content: Array[Byte], targetHz: Int): Array[Byte] =
    encode(resampleAudio(decode(content), targetHz))
}
