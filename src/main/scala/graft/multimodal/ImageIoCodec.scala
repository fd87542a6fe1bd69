package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** REAL codec for compressed image containers (JPEG, PNG, BMP, GIF) via
  * the JDK's own `javax.imageio` — pure JVM, zero added dependencies, so
  * the multimodal path decodes the formats real corpora actually carry
  * instead of stubbing them. Decoded pixels flow into the SAME
  * [[PpmCodec.Image]] representation and the same featurize/resize cores,
  * so a JPEG and a PPM of identical pixels produce identical features.
  *
  * Re-encode policy: resized images are written back as PNG — lossless, so
  * resize→decode round-trips are exact and testable. (A JPEG re-encode
  * would be encoder- and quality-dependent: wrong default for a pipeline
  * that wants reproducible artifacts.)
  */
object ImageIoCodec {

  /** Decode any ImageIO-supported payload into raw RGB. Throws on
    * undecodable bytes — loud per-record failure for the quarantine path,
    * never silently wrong pixels. */
  def decode(content: Array[Byte]): PpmCodec.Image = {
    val img = ImageIO.read(new ByteArrayInputStream(content))
    require(img != null,
      "undecodable image payload (not a JPEG/PNG/BMP/GIF the JDK can read)")
    val w = img.getWidth
    val h = img.getHeight
    val rgb = new Array[Byte](w * h * 3)
    val row = new Array[Int](w) // one getRGB call per row, not per pixel
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        val d = (y * w + x) * 3
        rgb(d) = ((p >> 16) & 0xFF).toByte
        rgb(d + 1) = ((p >> 8) & 0xFF).toByte
        rgb(d + 2) = (p & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    PpmCodec.Image(w, h, rgb)
  }

  /** Encode raw RGB as PNG (lossless — see the re-encode policy above). */
  def encodePng(img: PpmCodec.Image): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](img.width)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        row(x) = ((img.rgb(s) & 0xFF) << 16) |
          ((img.rgb(s + 1) & 0xFF) << 8) | (img.rgb(s + 2) & 0xFF)
        x += 1
      }
      bi.setRGB(0, y, img.width, 1, row, 0, img.width)
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(bi, "png", out)
    out.toByteArray
  }

  /** Grid-mean features of a compressed payload — same contract and same
    * core as [[PpmCodec.gridMeanFeatures]]. */
  def gridMeanFeatures(content: Array[Byte], grid: Int): Array[Float] =
    PpmCodec.gridMean(decode(content), grid)

  /** Nearest-neighbour resize of a compressed payload, re-encoded PNG. */
  def resizeNearest(content: Array[Byte], w2: Int, h2: Int): Array[Byte] =
    encodePng(PpmCodec.resizeNearestImage(decode(content), w2, h2))
}
