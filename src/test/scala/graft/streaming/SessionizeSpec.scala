package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.Tables

/** The three sessionization forms must agree: declarative window form,
  * typed flatMapGroups form, and the stateful streaming form (closed
  * sessions on a closed input; the open tail stays in state). */
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

  test("sessions are consistent: counts conserve events, bounds ordered") {
    val sessions = Sessionize.batchSessions(events)
    val total = sessions.agg(org.apache.spark.sql.functions.sum("n_events"))
      .head.getLong(0)
    assert(total == events.count())
    assert(sessions.filter($"end_ms" < $"start_ms").count() == 0)
  }

  test("stateful streaming emits exactly the closed sessions on closed input") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = Files.createTempDirectory("graft_sess").toString
    Files.copy(java.nio.file.Paths.get(sf("sf0.001") + "/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = spark.readStream
      .schema(new org.apache.spark.sql.types.StructType()
        .add("event_id", "long").add("ts", "long").add("user_id", "long")
        .add("event_type", "string").add("value", "double").add("props", "string"))
      .parquet(dir)
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    val q = Sessionize.statefulSessions(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    // expected: every batch session except each user's LAST (still open)
    val all = Sessionize.batchSessions(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val lastPerUser = all.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expectedClosed = all.filterNot(s => s._2 == lastPerUser(s._1)).toSet
    assert(streamed == expectedClosed)
  }
}
