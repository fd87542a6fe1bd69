package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkTestBase

/** Stream-stream interval join: closed-input results must equal the batch
  * join, out-of-window pairs must not match, and matches must arrive
  * without waiting for the watermark (inner-join semantics). */
class StreamJoinsSpec extends SparkTestBase {
  import spark.implicits._

  private val hour = 3600000L
  private val base = 19724L * 86400000L // large base: epoch-0 dies at watermark 0

  private val impRows = Seq( // (imp_id, imp_user, tms)
    (100L, 1L, base),
    (101L, 1L, base + 3 * hour),
    (102L, 2L, base + 1 * hour))
  private val clickRows = Seq( // (click_id, click_user, tms)
    (200L, 1L, base + hour / 2), //      30 min after imp 100 -> attributed
    (201L, 1L, base + 2 * hour), //      2 h after imp 100 -> outside lookback
    (202L, 2L, base + hour + hour / 4), // 15 min after imp 102 -> attributed
    (203L, 3L, base + hour)) //          no impressions for user 3

  test("interval join on streams equals the batch join; lookback respected") {
    val impDir = Files.createTempDirectory("graft_imps").toString
    val clickDir = Files.createTempDirectory("graft_clicks").toString
    val ckpt = Files.createTempDirectory("graft_join_ckpt").toString

    impRows.toDF("imp_id", "imp_user", "tms")
      .select($"imp_id", $"imp_user", timestamp_millis($"tms").as("imp_ts"))
      .coalesce(1).write.mode("append").parquet(impDir)
    clickRows.toDF("click_id", "click_user", "tms")
      .select($"click_id", $"click_user", timestamp_millis($"tms").as("click_ts"))
      .coalesce(1).write.mode("append").parquet(clickDir)

    val imps = spark.readStream.schema(new StructType()
        .add("imp_id", "long").add("imp_user", "long").add("imp_ts", "timestamp"))
      .parquet(impDir)
    val clicks = spark.readStream.schema(new StructType()
        .add("click_id", "long").add("click_user", "long").add("click_ts", "timestamp"))
      .parquet(clickDir)

    val q = StreamJoins.attribution(imps, clicks)
      .select("click_id", "imp_id")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("attrib_out").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("attrib_out").as[(Long, Long)].collect().toSet
    assert(got == Set((200L, 100L), (202L, 102L)), s"got $got")

    // batch equivalence on the same frames
    val batch = impRows.toDF("imp_id", "imp_user", "tms")
      .select($"imp_id", $"imp_user", timestamp_millis($"tms").as("imp_ts"))
      .join(clickRows.toDF("click_id", "click_user", "tms")
          .select($"click_id", $"click_user", timestamp_millis($"tms").as("click_ts")),
        $"click_user" === $"imp_user" &&
          $"imp_ts" >= $"click_ts" - expr("INTERVAL 1 hour") &&
          $"imp_ts" <= $"click_ts")
      .select($"click_id", $"imp_id").as[(Long, Long)].collect().toSet
    assert(got == batch)
  }
}
