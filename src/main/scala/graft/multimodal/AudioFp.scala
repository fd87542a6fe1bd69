package graft.multimodal

/** 64-bit perceptual audio fingerprint — the audio-side analogue of the
  * image pHash ([[Phash]]) and text SimHash: perceptually-close audio
  * (re-encodes, mild noise, nearest-sample resampling) lands within a few
  * bits of Hamming distance, so audio near-duplicate detection reuses the
  * SAME pigeonhole banded join ([[graft.dedup.Dedup.hammingNearPairs]]).
  *
  * Construction (Haitsma & Kalker, "A Highly Robust Audio Fingerprinting
  * System", ISMIR 2002, reduced to a fixed 64-bit code): mono mix → 9
  * equal time frames → per frame, Goertzel spectral energy at 9 fixed
  * log-spaced speech-band frequencies (300–3400 Hz) → bit (t, b) is the
  * sign of the TIME-DIFFERENCE of the BAND-DIFFERENCE,
  * `(E(t+1,b)−E(t+1,b+1)) − (E(t,b)−E(t,b+1)) > 0` — the
  * double-difference from the paper, which survives volume scaling,
  * gentle filtering, and re-encoding where absolute energies don't.
  * Audio is first brought to a CANONICAL 8 kHz (the Chromaprint
  * approach — resample before analysis rather than letting the rate
  * shift every Goertzel window): integer-ratio rate changes then cancel
  * EXACTLY under the nearest-sample resampler. Non-integer ratios alias
  * (nearest-sample has no low-pass) — that is a genuinely different
  * signal, and a production deployment swaps in a windowed-sinc
  * resampler behind the same canonicalization point. All arithmetic is
  * IEEE double in a fixed order — the same bytes hash identically on
  * any JVM. */
object AudioFp {

  private val Bands = 9  // 8 band-pairs
  private val Frames = 9 // 8 time deltas × 8 band-pairs = 64 bits
  /** Log-spaced band centers over the classic telephony speech band. */
  private[multimodal] val bandHz: Array[Double] =
    Array.tabulate(Bands)(b => 300.0 * math.pow(3400.0 / 300.0, b / 8.0))

  /** Goertzel energy of `mono(from until until)` at frequency `hz`. */
  private def goertzel(mono: Array[Double], sampleRate: Int,
      from: Int, until: Int, hz: Double): Double = {
    val w = 2.0 * math.Pi * hz / sampleRate
    val coeff = 2.0 * math.cos(w)
    var q1 = 0.0
    var q2 = 0.0
    var f = from
    while (f < until) {
      val q0 = coeff * q1 - q2 + mono(f)
      q2 = q1
      q1 = q0
      f += 1
    }
    q1 * q1 + q2 * q2 - coeff * q1 * q2
  }

  private val CanonicalHz = 8000

  /** 64-bit fingerprint of decoded audio; 0 for audio too short to frame
    * (callers treat it as "no signal", never a near-dup of anything). */
  def fingerprint(a0: WavCodec.Audio): Long = {
    if (a0.channels == 0) return 0L
    val a = if (a0.sampleRate == CanonicalHz) a0
      else WavCodec.resampleAudio(a0, CanonicalHz)
    if (a.frames < Frames) return 0L
    // mono mix ONCE (channel sum + divide per sample), not once per
    // (frame, band) — 9× less mixing work on the corpus decode path
    val mono = new Array[Double](a.frames)
    var f = 0
    while (f < a.frames) {
      var s = 0.0
      var c = 0
      while (c < a.channels) { s += a.samples(f * a.channels + c); c += 1 }
      mono(f) = s / a.channels
      f += 1
    }
    // integer frame boundaries: frame t = [t·n/Frames, (t+1)·n/Frames)
    val energies = Array.ofDim[Double](Frames, Bands)
    var t = 0
    while (t < Frames) {
      val from = t * a.frames / Frames
      val until = (t + 1) * a.frames / Frames
      var b = 0
      while (b < Bands) {
        energies(t)(b) = goertzel(mono, a.sampleRate, from, until, bandHz(b))
        b += 1
      }
      t += 1
    }
    var fp = 0L
    var bit = 0
    t = 0
    while (t < Frames - 1) {
      var b = 0
      while (b < Bands - 1) {
        val d1 = energies(t + 1)(b) - energies(t + 1)(b + 1)
        val d0 = energies(t)(b) - energies(t)(b + 1)
        if (d1 - d0 > 0) fp |= 1L << bit
        bit += 1
        b += 1
      }
      t += 1
    }
    fp
  }

  def fingerprintPayload(content: Array[Byte]): Long =
    fingerprint(WavCodec.decode(content))
}
