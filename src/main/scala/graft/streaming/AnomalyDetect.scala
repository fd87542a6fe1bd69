package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling z-score anomaly detection — the q45 monitor
  * ([[graft.operators.Relational.q45RollingAnomaly]]) as a stateful
  * stream, for the deployment where "yesterday's volume was 4σ off" must
  * page before tonight's batch run would notice.
  *
  * Architecture: one stateful operator keyed by event_type whose state
  * holds (a) OPEN per-day counts still inside the watermark and (b) the
  * FINALIZED trailing history (≤ `lookback` days). Spark's
  * `flatMapGroupsWithState` cannot sit downstream of a streaming windowed
  * aggregation in append mode, so the daily aggregation happens inside
  * the operator: arriving events bump their day's open counter, and a day
  * finalizes — scores against the history, emits, and joins it — exactly
  * when the event-time watermark passes its end, in ascending day order.
  * The watermark makes that finalization semantically exact (no event for
  * a finalized day can still arrive), the same guarantee
  * [[Sessionize.statefulSessions]] leans on for session close.
  *
  * Scoring replicates q45's arithmetic bit-for-bit: trailing `lookback`
  * OBSERVED days excluding the current one; COUNT/SUM/SUM² as exact
  * Longs; mean/z through the identical double-operation shape; 4-dp
  * round via BigDecimal.valueOf (Spark's own double-rounding semantics);
  * the flag tests the rounded z. AnomalySpec asserts stream == q45 batch
  * on the same closed input for every finalized day.
  *
  * State is bounded by construction: per event_type, ≤ `lookback`
  * finalized entries plus open days inside the watermark horizon — no
  * timeout-based eviction needed for correctness; the event-time timeout
  * exists so a day whose LAST event arrived mid-batch still finalizes
  * promptly (on the no-data batch after the watermark advances) instead
  * of waiting for the next event of its type.
  *
  * Scale note: events reach the operator partitioned by event_type (the
  * monitored-series key), so per-partition volume is the series' own
  * event rate; at volumes where even that is too hot, the production
  * shape is the q16-style append-mode window feeding batch q45 scoring
  * via foreachBatch — this operator is the low-latency alerting form.
  */
object AnomalyDetect {

  /** Carries the watermarked `ts` column into the stateful operator —
    * event-time timeouts require the watermark column to survive the
    * projection (same contract as [[Sessionize.TimedEvent]]). */
  final case class Ev(event_type: String, ts: java.sql.Timestamp, ms: Long)
  final case class Score(event_type: String, d: java.sql.Date, n: Long,
      m: Long, mean: Double, z: Double, is_anomaly: Boolean)
  /** open: epochDay → running count; hist: finalized (epochDay, n),
    * ascending, trimmed to the lookback. */
  final case class TypeState(open: Map[Long, Long], hist: List[(Long, Long)])

  private val DayMs = 86400000L

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Score `n` on day `d` against the finalized history (q45 arithmetic,
    * identical operation order). None while warming up / zero variance. */
  private def scoreOf(hist: List[(Long, Long)], d: Long, n: Long,
      minObs: Int): Option[(Long, Double, Double)] = {
    val m = hist.size.toLong
    if (m < minObs) None
    else {
      val s1 = hist.iterator.map(_._2).sum
      val s2 = hist.iterator.map(x => x._2 * x._2).sum
      if (m * s2 <= s1 * s1) None
      else {
        val md = m.toDouble
        val s1d = s1.toDouble
        val mean = round4(s1d / md)
        val z = round4((n.toDouble - s1d / md) /
          math.sqrt((md * s2 - s1d * s1) / (md * (m - 1))))
        Some((m, mean, z))
      }
    }
  }

  /** The streaming monitor over a watermarked event stream with `ts` and
    * `event_type` columns. Emits one [[Score]] per (type, day) as the
    * watermark finalizes the day, ascending per type. */
  def scores(spark: SparkSession, events: DataFrame, delay: String,
      minObs: Int = 14, lookback: Int = 28): Dataset[Score] = {
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .select(col("event_type"), col("ts"), unix_millis(col("ts")).as("ms"))
      .as[Ev]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[TypeState, Score](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (etype: String, it: Iterator[Ev], state: GroupState[TypeState]) =>
          val st0 = state.getOption.getOrElse(TypeState(Map.empty, Nil))
          // 1. fold arriving events into their open day counters
          var open = st0.open
          it.foreach { e =>
            val day = Math.floorDiv(e.ms, DayMs)
            open = open.updated(day, open.getOrElse(day, 0L) + 1L)
          }
          // 2. finalize every day the watermark has passed, ASCENDING —
          // each join into the history before the next day scores, so the
          // trailing window always matches the batch ROWS frame
          val wm = state.getCurrentWatermarkMs()
          var hist = st0.hist
          val out = scala.collection.mutable.ArrayBuffer[Score]()
          open.keys.toSeq.sorted.takeWhile(d => (d + 1) * DayMs <= wm)
            .foreach { d =>
              val n = open(d)
              scoreOf(hist, d, n, minObs).foreach { case (m, mean, z) =>
                out += Score(etype,
                  java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d)),
                  n, m, mean, z, math.abs(z) >= 2)
              }
              hist = (hist :+ (d, n)).takeRight(lookback)
              open = open - d
            }
          state.update(TypeState(open, hist))
          // 3. arm finalization for the earliest still-open day so it
          // emits on the watermark's no-data batch, not on the next event
          if (open.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              (open.keys.min + 1) * DayMs, state.getCurrentWatermarkMs + 1))
          out.iterator
      }
  }
}
