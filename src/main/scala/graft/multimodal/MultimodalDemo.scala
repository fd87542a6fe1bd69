package graft.multimodal

import graft.Engine

/** Runnable multimodal-plumbing demo: builds binary media rows (including
  * a REAL PNG written to disk and read back — the ImageIO decode path on an
  * actual file), extracts features, resizes, and samples frames — printing
  * shapes for eyeball verification. Only compressed audio/video still use
  * the deterministic stub (see FakeCodec). */
object MultimodalDemo {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-multimodal-demo")
    import spark.implicits._
    import Multimodal._

    // a real compressed image file on disk: 16×16 gradient, PNG-encoded
    val gradient = PpmCodec.Image(16, 16, Array.tabulate(16 * 16 * 3) { i =>
      val px = i / 3; ((px * 255) / (16 * 16)).toByte
    })
    val pngPath = java.nio.file.Files.createTempFile("graft_demo", ".png")
    java.nio.file.Files.write(pngPath, ImageIoCodec.encodePng(gradient))
    val pngBytes = java.nio.file.Files.readAllBytes(pngPath)

    val media = Seq(
      MediaRow(1L, "image", "img-one".getBytes, 640, 480, 0, 0),
      MediaRow(2L, "audio", "aud-one".getBytes, 0, 0, 16000, 2500),
      MediaRow(3L, "video", "vid-one".getBytes, 1920, 1080, 48000, 1500),
      MediaRow(4L, "image/png", pngBytes, 16, 16, 0, 0))
      .toDS().toDF()

    val real = extractImageFeatures(spark, media, grid = 2).collect()
    real.foreach(f => println(
      s"MM real-decode id=${f.media_id} kind=${f.kind} file=$pngPath " +
        s"features=${f.features.map(v => f"$v%.3f").mkString(",")}"))
    val rr = resizeCompressedImages(spark, media, 8, 8).collect()
    rr.foreach(m => println(
      s"MM real-resize id=${m.media_id} ${m.width}x${m.height} " +
        s"kind=${m.kind} bytes=${m.content.length}"))
    val feats = extractFeatures(spark, media, dim = 8).collect()
    feats.foreach(f => println(
      s"MM features id=${f.media_id} kind=${f.kind} " +
        s"dim=${f.features.length} head=${f.features.take(3).mkString(",")}"))
    val rs = resizeImages(spark, media, 64, 64).collect()
    rs.foreach(m => println(s"MM resized id=${m.media_id} ${m.width}x${m.height} bytes=${m.content.length}"))
    val fr = sampleFrames(spark, media, everyMs = 500).collect()
    println(s"MM frames n=${fr.length} ts=${fr.map(_.ts_ms).sorted.mkString(",")}")
    spark.stop()
  }
}
