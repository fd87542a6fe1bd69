package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.Tables

/** The three sessionization forms must agree: declarative window form,
  * typed flatMapGroups form, and the stateful streaming form (closed
  * sessions emit on arrival; open tails emit exactly when the event-time
  * watermark passes their gap boundary, evicting their state). */
class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val events = Tables(spark, sf("sf0.001"), "events")

  test("typed flatMapGroups sessions equal the declarative window sessions") {
    val declarative = Sessionize.batchSessions(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).sorted.toSeq
    val typed = Sessionize.typedSessions(spark, events)
      .collect().map(s => (s.user_id, s.session_seq, s.n_events,
        s.start_ms, s.end_ms, s.total_value)).sorted.toSeq
    assert(declarative.nonEmpty)
    assert(declarative == typed)
  }

  test("native session_window form groups exactly like the other forms") {
    val batch = Sessionize.batchSessions(events)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet // drop session_seq
    // same gapMs as the other forms — the >=-vs-> boundary convention is
    // normalized inside sessionWindowSessions
    val native = Sessionize.sessionWindowSessions(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(batch.nonEmpty)
    assert(native == batch)
  }

  test("sessions are consistent: counts conserve events, bounds ordered") {
    val sessions = Sessionize.batchSessions(events)
    val total = sessions.agg(org.apache.spark.sql.functions.sum("n_events"))
      .head.getLong(0)
    assert(total == events.count())
    assert(sessions.filter($"end_ms" < $"start_ms").count() == 0)
  }

  test("stateful streaming emits exactly the closed sessions on closed input") {
    val dir = Files.createTempDirectory("graft_sess").toString
    Files.copy(java.nio.file.Paths.get(sf("sf0.001") + "/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = graft.Tables.streamEvents(spark, dir)
    val q = Sessionize.statefulSessions(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    // expected: every batch session except each user's LAST (still open) —
    // PLUS the open tails whose gap boundary the final watermark passed
    // (they time out, emit as final, and leave state). Watermark fires
    // strictly: timeoutTs (= end + gap) < maxTs - delay.
    val all = Sessionize.batchSessions(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val lastPerUser = all.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val wmFinal = all.map(_._5).max - Sessionize.DefaultGapMs
    val expectedClosed = all.filterNot(s => s._2 == lastPerUser(s._1)).toSet
    val expectedTimedOut = all.filter(s => s._2 == lastPerUser(s._1) &&
      s._5 + Sessionize.DefaultGapMs < wmFinal).toSet
    assert(streamed == (expectedClosed ++ expectedTimedOut))
    assert(expectedTimedOut.nonEmpty, "fixture should exercise the timeout path")
  }

  test("event-time timeout emits the final open session and clears state") {
    import org.apache.spark.sql.functions.timestamp_millis
    val dir = Files.createTempDirectory("graft_sess_to").toString
    val ckpt = Files.createTempDirectory("graft_sess_to_ck").toString
    val gap = 10000L
    // keep event times away from epoch 0: the engine's initial watermark is
    // 0, and rows at-or-before the watermark are discarded as late
    def t(x: Long): Long = 1000000000000L + x
    def write(rows: (Long, Long, Double)*): Unit =
      rows.toSeq.toDF("user_id", "tms", "value")
        .select($"user_id", timestamp_millis($"tms").as("ts"), $"value")
        .coalesce(1).write.mode("append").parquet(dir)
    write((1L, t(0), 1.0), (1L, t(5000), 1.0), (2L, t(0), 1.0))
    val stream = spark.readStream
      .schema(new org.apache.spark.sql.types.StructType()
        .add("user_id", "long").add("ts", "timestamp").add("value", "double"))
      .parquet(dir)
    val q = Sessionize.statefulSessions(spark, stream, gapMs = gap,
      watermarkDelayMs = gap)
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .format("memory").queryName("sess_timeout").start()
    q.processAllAvailable()
    // watermark → t(90000), passing user 1's last+gap → session times out
    write((2L, t(100000), 1.0))
    q.processAllAvailable()
    // user 1 returns: state was evicted, so seq restarts at 1;
    // watermark → t(190000) times out user 2's open session
    write((1L, t(200000), 5.0))
    q.processAllAvailable()
    // watermark → t(390000) flushes user 1's rejoined session
    write((2L, t(400000), 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_timeout")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(rows.contains((1L, 1L, 2L, t(0), t(5000), 2.0)), // timeout emission
      s"got $rows")
    assert(rows.contains((2L, 1L, 1L, t(0), t(0), 1.0))) // closed by arrival
    assert(rows.contains((2L, 2L, 1L, t(100000), t(100000), 1.0))) // timeout
    assert(rows.contains((1L, 1L, 1L, t(200000), t(200000), 5.0)), // seq restart
      "state must be cleared on timeout: rejoined user starts at seq 1")
    assert(rows.size == 4) // user 2's last session is still open, not emitted
  }
}
