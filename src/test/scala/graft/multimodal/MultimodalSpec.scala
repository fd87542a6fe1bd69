package graft.multimodal

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._
  import Multimodal._

  private lazy val media = Seq(
    MediaRow(1L, "image", "img-one".getBytes, 640, 480, 0, 0),
    MediaRow(2L, "image", "img-two".getBytes, 1024, 768, 0, 0),
    MediaRow(3L, "audio", "aud-one".getBytes, 0, 0, 16000, 2500),
    MediaRow(4L, "video", "vid-one".getBytes, 1920, 1080, 48000, 1000))
    .toDS().toDF()

  test("feature extraction is deterministic with the declared shape") {
    val f1 = extractFeatures(spark, media, dim = 16, partitions = 4)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = extractFeatures(spark, media, dim = 16, partitions = 2)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1.keySet == Set(1L, 2L, 3L, 4L))
    assert(f1.values.forall(_.length == 16))
    assert(f1 == f2) // partitioning must not change results
    assert(f1(1L) != f1(2L)) // different payloads -> different features
  }

  test("resize rewrites payload and metadata together") {
    val out = resizeImages(spark, media, 64, 64).collect()
    assert(out.forall(m => m.width == 64 && m.height == 64))
    val orig = media.as[MediaRow].collect().map(m => m.media_id -> m.content.toSeq).toMap
    assert(out.forall(m => m.content.toSeq != orig(m.media_id)))
  }

  test("frame sampling fans out one row per sampled timestamp") {
    val frames = sampleFrames(spark, media, everyMs = 250).collect()
    assert(frames.forall(_.media_id == 4L)) // only the video row
    assert(frames.map(_.ts_ms).sorted.toSeq == Seq(0, 250, 500, 750, 1000))
    assert(frames.map(_.frame_idx).sorted.toSeq == (0 to 4))
  }
}
