package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Gap-based sessionization of the events stream — the session-window
  * operator a streaming warehouse needs beyond the reference's daily grain
  * (the reference has nothing session-shaped; SURVEY §2.10).
  *
  * Four forms, one semantic (events at most `gapMs` apart share a
  * session; SessionizeSpec asserts they agree):
  *   - [[batchSessions]] — declarative: per-user lag/gap flag/running sum.
  *     The window partitions by user, so work distributes by user key.
  *   - [[typedSessions]] — the same via `groupByKey.flatMapGroups` (typed
  *     KeyValueGroupedDataset path); demonstrates per-group imperative
  *     logic when expression form gets awkward. Must equal batchSessions.
  *   - [[sessionWindowSessions]] — Spark's native `session_window`
  *     aggregation (no custom state; batch or streaming), the gap-boundary
  *     convention normalized to match the others.
  *   - [[statefulSessions]] — Structured Streaming `flatMapGroupsWithState`
  *     keeping one open session per user across micro-batches; closed
  *     sessions emit as soon as the closing event arrives, open tails when
  *     the watermark passes their gap boundary (state evicted).
  */
object Sessionize {

  val DefaultGapMs: Long = 30L * 60 * 1000

  /** Declarative sessionization. Output grain: (user_id, session_seq). */
  def batchSessions(events: DataFrame, gapMs: Long = DefaultGapMs): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("is_new").over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ms")).as("start_ms"),
        max(col("ms")).as("end_ms"),
        round(sum(col("value").cast(DecimalType(18, 4))), 2).cast("double")
          .as("total_value"))
      .orderBy("user_id", "session_seq")
  }

  /** Fourth agreeing form: Spark's NATIVE `session_window` aggregation —
    * no custom state, works in batch and streaming alike. `gapMs` means
    * the same thing as in the other three forms (events exactly `gapMs`
    * apart SHARE a session): session_window itself splits when the gap is
    * merely reached (diff >= duration), so the duration passed to it is
    * `gapMs + 1` ms — normalized here, not at call sites. No per-user
    * session numbering (native windows are identified by their time
    * range), and the window's own end is last-event + gap, so start/end
    * are re-derived as min/max event time for comparability. */
  def sessionWindowSessions(events: DataFrame,
      gapMs: Long = DefaultGapMs): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${gapMs + 1} milliseconds"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_millis(col("ts"))).as("start_ms"),
        max(unix_millis(col("ts"))).as("end_ms"),
        round(sum(col("value").cast(DecimalType(18, 4))), 2).cast("double")
          .as("total_value"))
      .select(col("user_id"), col("n_events"), col("start_ms"), col("end_ms"),
        col("total_value"))

  final case class Event(user_id: Long, ms: Long, value: Double)
  final case class Session(user_id: Long, session_seq: Long, n_events: Long,
      start_ms: Long, end_ms: Long, total_value: Double)

  /** Typed per-group sessionization; semantically identical to
    * [[batchSessions]] (asserted in SessionizeSpec). Events per user are
    * sorted in-memory — fine while per-user event counts are bounded;
    * for unbounded users use the windowed form (external sort). */
  def typedSessions(spark: SparkSession, events: DataFrame,
      gapMs: Long = DefaultGapMs): Dataset[Session] = {
    import spark.implicits._
    events
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        sessionsOf(uid, it.toSeq.sortBy(_.ms), gapMs, firstSeq = 1L)
      }
  }

  private def sessionsOf(uid: Long, sorted: Seq[Event], gapMs: Long,
      firstSeq: Long): Iterator[Session] = {
    if (sorted.isEmpty) Iterator.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer[Session]()
      var seq = firstSeq
      var start = sorted.head.ms
      var last = sorted.head.ms
      var n = 0L
      var value = BigDecimal(0)
      def close(): Unit = {
        out += Session(uid, seq, n, start, last,
          value.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
        seq += 1
      }
      sorted.foreach { e =>
        if (n > 0 && e.ms - last > gapMs) { close(); start = e.ms; n = 0; value = 0 }
        n += 1
        value += BigDecimal(e.value).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        last = e.ms
      }
      close()
      out.iterator
    }
  }

  /** Open-session state. `value4` is the running total in scale-4 fixed
    * point (ten-thousandths) — storing a Double here would lose the exact
    * decimal accumulation the batch/typed forms use and could round a
    * cross-batch session's total differently at a half-cent boundary. */
  final case class OpenSession(session_seq: Long, start_ms: Long, last_ms: Long,
      n: Long, value4: Long)

  /** Event row carrying the watermarked timestamp column through to the
    * stateful operator (the watermark must be declared on the stream that
    * feeds `flatMapGroupsWithState` for event-time timeouts). */
  final case class TimedEvent(user_id: Long, ts: java.sql.Timestamp,
      ms: Long, value: Double)

  private def totalOf(value4: Long): Double =
    BigDecimal(value4, 4).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Streaming form: one open session per user lives in the state store;
    * arriving events either extend it or close it (emitting the closed
    * session) and open the next.
    *
    * State is bounded by an EVENT-TIME timeout: each update arms the
    * timeout at `last event + gapMs`, so once the watermark (lagging
    * `watermarkDelayMs` behind max event time) passes a session's gap
    * boundary, the open session emits as final and its state is REMOVED.
    * That emission is semantically exact, not a heuristic: the watermark
    * guarantees no event older than it will arrive, and any later event is
    * past the gap and would have opened a new session anyway. Without this,
    * open-session state grows monotonically with user churn — every user
    * who ever appeared would hold a state-store row forever.
    *
    * After eviction a returning user restarts at `session_seq = 1`
    * (remembering per-user counters forever is exactly the unbounded state
    * this timeout exists to evict); at warehouse scale the stable session
    * identity is `(user_id, start_ms)`, which is unique regardless. */
  def statefulSessions(spark: SparkSession, events: DataFrame,
      gapMs: Long = DefaultGapMs,
      watermarkDelayMs: Long = DefaultGapMs): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", s"$watermarkDelayMs milliseconds")
      .select(col("user_id"), col("ts"), unix_millis(col("ts")).as("ms"),
        col("value"))
      .as[TimedEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[TimedEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: the open session is final
            val open = state.get
            state.remove()
            Iterator.single(Session(uid, open.session_seq, open.n,
              open.start_ms, open.last_ms, totalOf(open.value4)))
          } else {
            val sorted = it.toSeq.sortBy(_.ms)
            if (sorted.isEmpty) Iterator.empty
            else {
              val open = state.getOption
              var seq = open.map(_.session_seq).getOrElse(1L)
              var start = open.map(_.start_ms).getOrElse(sorted.head.ms)
              var last = open.map(_.last_ms).getOrElse(Long.MinValue)
              var n = open.map(_.n).getOrElse(0L)
              var value4 = open.map(_.value4).getOrElse(0L)
              val out = scala.collection.mutable.ArrayBuffer[Session]()
              sorted.foreach { e =>
                if (n > 0 && e.ms - last > gapMs) {
                  out += Session(uid, seq, n, start, last, totalOf(value4))
                  seq += 1; start = e.ms; n = 0; value4 = 0
                }
                if (n == 0) start = e.ms
                n += 1
                value4 += BigDecimal(e.value)
                  .setScale(4, BigDecimal.RoundingMode.HALF_UP).underlying
                  .unscaledValue.longValueExact
                last = e.ms
              }
              state.update(OpenSession(seq, start, last, n, value4))
              // arm the expiry; must stay ahead of the current watermark
              // (an update landing exactly at the boundary would otherwise
              // throw), so a boundary session times out next batch instead
              state.setTimeoutTimestamp(
                math.max(last + gapMs, state.getCurrentWatermarkMs + 1))
              out.iterator
            }
          }
      }
  }
}
