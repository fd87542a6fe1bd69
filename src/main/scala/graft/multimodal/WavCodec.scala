package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL (non-stub) codec for RIFF/WAVE 16-bit PCM audio — a pure-JVM
  * parser, no audio libraries required, giving the multimodal pipeline a
  * fully-real audio path (decode → windowed-RMS featurize → resample) next
  * to [[PpmCodec]]'s image path. Compressed audio (MP3/AAC/OGG) remains
  * behind [[Multimodal.FakeCodec]] because those codecs don't exist in
  * this environment.
  *
  * RIFF layout: `RIFF <size> WAVE`, then tagged chunks; we need `fmt `
  * (PCM format 1, 16-bit) and `data` (interleaved little-endian samples).
  * Unknown chunks (LIST, fact, …) are skipped by their declared size.
  */
object WavCodec {

  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def frames: Int = if (channels == 0) 0 else samples.length / channels
    def durationMs: Int =
      if (sampleRate == 0) 0 else (frames.toLong * 1000L / sampleRate).toInt
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
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val id = tag()
      val size = buf.getInt
      id match {
        case "fmt " =>
          val fmtEnd = buf.position() + size
          val audioFormat = buf.getShort
          require(audioFormat == 1, s"unsupported WAV format $audioFormat (want PCM=1)")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt   // byte rate
          buf.getShort // block align
          val bits = buf.getShort
          require(bits == 16, s"unsupported bit depth $bits (want 16)")
          buf.position(fmtEnd)
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort; i += 1 }
          samples = out
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
