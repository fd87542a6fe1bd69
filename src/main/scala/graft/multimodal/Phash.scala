package graft.multimodal

/** 64-bit DCT perceptual hash (pHash) for images — the image-side analogue
  * of the text SimHash: near-identical pixels (re-encodes, light noise,
  * small edits) land within a few bits of Hamming distance, so image
  * near-duplicate detection reuses the SAME pigeonhole banded join as text
  * ([[graft.dedup.Dedup.hammingNearPairs]]).
  *
  * Pipeline (the classic pHash construction, public domain — see Zauner,
  * "Implementation and Benchmarking of Perceptual Image Hash Functions",
  * 2010): luma → area-mean downsample to 32×32 → 2-D DCT-II → keep the
  * low-frequency 8×8 block → each AC coefficient's bit is whether it
  * exceeds the block's AC mean. Every step is integer/IEEE-deterministic:
  * the same pixels produce the same hash on any JVM, and a PNG and a PPM
  * of identical pixels hash identically (both decode to the same
  * [[PpmCodec.Image]]).
  */
object Phash {

  private val N = 32 // downsample grid; DCT input size
  private val K = 8  // low-frequency block kept

  /** cos((2x+1)·u·π/(2N)) table, u-major. */
  private val cosTable: Array[Double] = {
    val t = new Array[Double](N * N)
    var u = 0
    while (u < N) {
      var x = 0
      while (x < N) {
        t(u * N + x) = math.cos((2 * x + 1) * u * math.Pi / (2.0 * N))
        x += 1
      }
      u += 1
    }
    t
  }

  /** Area-mean luma downsample to N×N. Integer box boundaries: cell (i,j)
    * averages the source box [⌊j·h/N⌋,⌊(j+1)·h/N⌋) × [⌊i·w/N⌋,⌊(i+1)·w/N⌋)
    * (at least one pixel), so every source pixel contributes to exactly one
    * cell when dimensions divide evenly and the map is deterministic always. */
  private[multimodal] def lumaGrid(img: PpmCodec.Image): Array[Double] = {
    val g = new Array[Double](N * N)
    var j = 0
    while (j < N) {
      val y0 = j * img.height / N
      val y1 = math.max(y0 + 1, (j + 1) * img.height / N)
      var i = 0
      while (i < N) {
        val x0 = i * img.width / N
        val x1 = math.max(x0 + 1, (i + 1) * img.width / N)
        var sum = 0.0
        var y = y0
        while (y < math.min(y1, img.height)) {
          var x = x0
          while (x < math.min(x1, img.width)) {
            val s = (y * img.width + x) * 3
            // integer Rec.601 luma (exact in double): 299R + 587G + 114B
            sum += 299 * (img.rgb(s) & 0xFF) + 587 * (img.rgb(s + 1) & 0xFF) +
              114 * (img.rgb(s + 2) & 0xFF)
            x += 1
          }
          y += 1
        }
        val np = (math.min(y1, img.height) - y0) * (math.min(x1, img.width) - x0)
        g(j * N + i) = sum / (1000.0 * math.max(np, 1))
        i += 1
      }
      j += 1
    }
    g
  }

  /** Separable 2-D DCT-II of the N×N grid; only the first K rows/cols are
    * materialized (that's all the hash reads). */
  private[multimodal] def dctLowFreq(g: Array[Double]): Array[Double] = {
    // row pass: rows(y*K + u) = Σ_x g(y,x)·cos[u,x] for u < K
    val rows = new Array[Double](N * K)
    var y = 0
    while (y < N) {
      var u = 0
      while (u < K) {
        var acc = 0.0
        var x = 0
        while (x < N) { acc += g(y * N + x) * cosTable(u * N + x); x += 1 }
        rows(y * K + u) = acc
        u += 1
      }
      y += 1
    }
    // column pass over the row-transformed data, v < K
    val out = new Array[Double](K * K)
    var v = 0
    while (v < K) {
      var u = 0
      while (u < K) {
        var acc = 0.0
        var yy = 0
        while (yy < N) { acc += rows(yy * K + u) * cosTable(v * N + yy); yy += 1 }
        out(v * K + u) = acc
        u += 1
      }
      v += 1
    }
    out
  }

  /** pHash of a decoded image: bit (v·8+u) set iff DCT coefficient (u,v)
    * exceeds the mean of the 63 AC coefficients (the DC bit, position 0,
    * is always 0 — it would otherwise be a constant 1 and waste a bit of
    * the Hamming budget). */
  def phash64(img: PpmCodec.Image): Long = {
    val d = dctLowFreq(lumaGrid(img))
    var mean = 0.0
    var i = 1
    while (i < K * K) { mean += d(i); i += 1 }
    mean /= (K * K - 1)
    var h = 0L
    i = 1
    while (i < K * K) {
      if (d(i) > mean) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Decode-and-hash for any supported payload: P6 PPM through
    * [[PpmCodec]], compressed formats (PNG/JPEG/BMP/GIF) through
    * [[ImageIoCodec]] — identical pixels, identical hash, whatever the
    * container. */
  def phashPayload(kind: String, content: Array[Byte]): Long =
    if (kind == "image/ppm") phash64(PpmCodec.decode(content))
    else phash64(ImageIoCodec.decode(content))
}
