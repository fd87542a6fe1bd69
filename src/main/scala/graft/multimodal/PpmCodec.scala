package graft.multimodal

/** REAL (non-stub) codec for binary PPM (P6) images — a pure-JVM parser,
  * no imaging libraries required, so the multimodal pipeline has one
  * fully-real decode → featurize → resize path end to end. Compressed
  * formats (JPEG/PNG/audio/video) remain behind [[Multimodal.FakeCodec]]
  * because their codecs don't exist in this environment.
  *
  * P6 layout: ASCII header `P6 <width> <height> <maxval>` (tokens
  * separated by whitespace, `#` comments run to end-of-line), a single
  * whitespace byte, then `width*height*3` raw RGB bytes (maxval 255).
  */
object PpmCodec {

  final case class Image(width: Int, height: Int, rgb: Array[Byte])

  /** Parse a P6 PPM payload. Throws on malformed input — a training
    * pipeline wants loud per-record failures it can route to quarantine,
    * not silently wrong pixels. */
  def decode(content: Array[Byte]): Image = {
    var pos = 0
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < content.length) {
        val c = content(pos)
        if (c == '#') { while (pos < content.length && content(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
        else go = false
      }
    }
    def token(): String = {
      skipWsAndComments()
      val start = pos
      while (pos < content.length && !isWs(content(pos))) pos += 1
      new String(content, start, pos - start, "US-ASCII")
    }
    require(token() == "P6", "not a binary PPM (P6) payload")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    require(maxval == 255, s"unsupported maxval $maxval (only 8-bit supported)")
    pos += 1 // exactly one whitespace byte separates header from raster
    val need = w * h * 3
    require(content.length - pos >= need,
      s"truncated raster: need $need bytes, have ${content.length - pos}")
    Image(w, h, java.util.Arrays.copyOfRange(content, pos, pos + need))
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t'

  /** Encode raw RGB back to a P6 payload. */
  def encode(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Real featurization: per-channel mean over a grid×grid tiling,
    * normalized to [0,1] — 3·grid² features in raster order (cell-major,
    * then R,G,B). The classic cheap visual descriptor. */
  def gridMeanFeatures(content: Array[Byte], grid: Int): Array[Float] =
    gridMean(decode(content), grid)

  /** [[gridMeanFeatures]] on an already-decoded image — the shared core,
    * so every decoder ([[PpmCodec]], [[ImageIoCodec]]) featurizes
    * identically: the same pixels give the same features regardless of
    * the container format they arrived in. */
  def gridMean(img: Image, grid: Int): Array[Float] = {
    val out = new Array[Float](3 * grid * grid)
    val counts = new Array[Int](grid * grid)
    val sums = new Array[Long](3 * grid * grid)
    var y = 0
    while (y < img.height) {
      val gy = math.min(grid - 1, y * grid / img.height)
      var x = 0
      while (x < img.width) {
        val gx = math.min(grid - 1, x * grid / img.width)
        val cell = gy * grid + gx
        val p = (y * img.width + x) * 3
        sums(cell * 3) += img.rgb(p) & 0xFF
        sums(cell * 3 + 1) += img.rgb(p + 1) & 0xFF
        sums(cell * 3 + 2) += img.rgb(p + 2) & 0xFF
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    var c = 0
    while (c < grid * grid) {
      val n = math.max(1, counts(c))
      var ch = 0
      while (ch < 3) {
        out(c * 3 + ch) = (sums(c * 3 + ch).toDouble / n / 255.0).toFloat
        ch += 1
      }
      c += 1
    }
    out
  }

  /** Real nearest-neighbour resize: source pixel (x·w/w2, y·h/h2), the
    * floor convention, re-encoded as P6. */
  def resizeNearest(content: Array[Byte], w2: Int, h2: Int): Array[Byte] =
    encode(resizeNearestImage(decode(content), w2, h2))

  /** Nearest-neighbour resize on a decoded image — shared by all codecs. */
  def resizeNearestImage(img: Image, w2: Int, h2: Int): Image = {
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      val sy = y * img.height / h2
      var x = 0
      while (x < w2) {
        val sx = x * img.width / w2
        val s = (sy * img.width + sx) * 3
        val d = (y * w2 + x) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Image(w2, h2, out)
  }
}
