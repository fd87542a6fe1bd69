package graft.multimodal

import graft.Engine

/** Runnable multimodal-plumbing demo: builds binary media rows, extracts
  * features, resizes, and samples frames — printing shapes for eyeball
  * verification. Codec layer is the deterministic stub (see FakeCodec). */
object MultimodalDemo {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-multimodal-demo")
    import spark.implicits._
    import Multimodal._
    val media = Seq(
      MediaRow(1L, "image", "img-one".getBytes, 640, 480, 0, 0),
      MediaRow(2L, "audio", "aud-one".getBytes, 0, 0, 16000, 2500),
      MediaRow(3L, "video", "vid-one".getBytes, 1920, 1080, 48000, 1500))
      .toDS().toDF()
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
