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

    // a real MP4 container (box tree only — no frames needed for metadata):
    // 90 kHz clock, 2 s, one 640×360 video track, written to disk and read back
    def bmffBox(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val mvhd = { val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0).putInt(90000).putInt(180000); bmffBox("mvhd", b.array()) }
    val tkhd = { val b = java.nio.ByteBuffer.allocate(84)
      b.position(76); b.putInt(640 << 16).putInt(360 << 16); bmffBox("tkhd", b.array()) }
    val hdlr = { val b = java.nio.ByteBuffer.allocate(20)
      b.position(8); b.put("vide".getBytes("US-ASCII")); bmffBox("hdlr", b.array()) }
    val mp4Bytes = bmffBox("ftyp", "isom0000isom".getBytes("US-ASCII")) ++
      bmffBox("moov", mvhd ++ bmffBox("trak", tkhd ++ bmffBox("mdia", hdlr)))
    val mp4Path = java.nio.file.Files.createTempFile("graft_demo", ".mp4")
    java.nio.file.Files.write(mp4Path, mp4Bytes)

    val media = Seq(
      MediaRow(1L, "image", "img-one".getBytes, 640, 480, 0, 0),
      MediaRow(2L, "audio", "aud-one".getBytes, 0, 0, 16000, 2500),
      MediaRow(3L, "video", "vid-one".getBytes, 1920, 1080, 48000, 1500),
      MediaRow(4L, "image/png", pngBytes, 16, 16, 0, 0),
      MediaRow(5L, "video/mp4",
        java.nio.file.Files.readAllBytes(mp4Path), 0, 0, 0, 0))
      .toDS().toDF()

    val probed = probeMp4Metadata(spark, media).collect()
    probed.foreach(m => println(
      s"MM mp4-probe id=${m.media_id} file=$mp4Path " +
        s"duration_ms=${m.duration_ms} ${m.width}x${m.height}"))

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
