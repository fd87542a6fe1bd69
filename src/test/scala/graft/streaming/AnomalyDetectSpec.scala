package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Streaming anomaly monitor vs its batch twin: on the same closed input,
  * the stateful stream must reproduce q45's rows EXACTLY for every day
  * the final watermark finalizes — same integer stats, same rounded z,
  * same flag. */
class AnomalyDetectSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming scores equal batch q45 for every watermark-finalized day") {
    val dir = Files.createTempDirectory("graft_anom").toString
    Files.copy(java.nio.file.Paths.get(sf("sf0.001") + "/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = graft.Tables.streamEvents(spark, dir)
    val q = AnomalyDetect.scores(spark, stream, delay = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_out").start()
    q.processAllAvailable()
    q.stop()
    def key(t: (String, String, Long, Long, Double, Double, Boolean)) = t
    val streamed = spark.table("anom_out").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toSet
    // batch reference, restricted to days whose END the final watermark
    // (delay 0 ⇒ max event time) passed — the last open day per type
    // stays in state, exactly as an unfinished day should
    val maxTs = graft.Tables(spark, sf("sf0.001"), "events")
      .agg(max(unix_millis(col("ts")))).head().getLong(0)
    val expected = graft.operators.Relational
      .q45RollingAnomaly(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
      .filter { t =>
        val epochDay = java.time.LocalDate.parse(t._2).toEpochDay
        (epochDay + 1) * 86400000L <= maxTs
      }.toSet
    assert(expected.nonEmpty, "fixture degenerate: no finalized scored days")
    assert(streamed == expected,
      s"stream != batch; onlyStream=${streamed -- expected}, " +
        s"onlyBatch=${expected -- streamed}")
    // the unfinalized tail really is only the last open day(s)
    val unfinalized = graft.operators.Relational
      .q45RollingAnomaly(spark, sf("sf0.001")).count() - expected.size
    assert(unfinalized >= 0 && unfinalized <= 5,
      s"more than one open day per type unaccounted: $unfinalized")
  }

  test("incremental arrival: scores emit as the watermark crosses each day") {
    import org.apache.spark.sql.functions.timestamp_millis
    val dir = Files.createTempDirectory("graft_anom_inc").toString
    val ckpt = Files.createTempDirectory("graft_anom_ck").toString
    val day = 86400000L
    val t0 = 1700000000000L - (1700000000000L % day) // midnight boundary
    // 16 days alternating 9/11 events (variance > 0 so the guard passes),
    // then a 30-event spike day; minObs 3 so scoring starts early
    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("tms", "event_type")
        .select(timestamp_millis($"tms").as("ts"), $"event_type",
          lit(1L).as("event_id"), lit(1L).as("user_id"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("append").parquet(dir)
    val steady = (0 until 16).flatMap { d =>
      val cnt = if (d % 2 == 0) 9 else 11
      (0 until cnt).map(i => (t0 + d * day + i * 1000L, "ping"))
    }
    val spike = (0 until 30).map(i => (t0 + 16 * day + i * 1000L, "ping"))
    val closer = Seq((t0 + 17 * day + 1000L, "ping")) // advances watermark
    write(steady ++ spike ++ closer)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = AnomalyDetect.scores(spark, stream, delay = "0 seconds",
        minObs = 3, lookback = 28)
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .format("memory").queryName("anom_inc").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("anom_inc").collect()
      .map(r => r.getDate(1).toString ->
        ((r.getLong(2), r.getLong(3), r.getDouble(5), r.getBoolean(6)))).toMap
    // an ordinary alternation day: right count, |z| around 1, no flag
    val d10 = java.time.LocalDate.ofEpochDay(t0 / day + 10).toString
    assert(rows(d10)._1 == 9L && !rows(d10)._4, s"day10 wrong: ${rows(d10)}")
    // the spike day: 30 vs a 9/11 history → huge z, flagged
    val dSpike = java.time.LocalDate.ofEpochDay(t0 / day + 16).toString
    assert(rows(dSpike)._1 == 30L && rows(dSpike)._3 > 10 && rows(dSpike)._4,
      s"spike not flagged: ${rows.get(dSpike)}")
  }
}
