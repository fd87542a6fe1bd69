package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state.
  *
  * A naive stream-stream equi-join must buffer EVERY past row of both
  * sides forever — state grows without bound. The interval form (Flink's
  * interval join, the ad-attribution primitive) adds an event-time range
  * to the join condition; with watermarks on both inputs Spark derives how
  * long a buffered row can still find partners and evicts it the moment
  * the watermark passes that horizon, so steady-state memory is
  * (input rate × interval width), independent of stream age.
  */
object StreamJoins {

  /** Inner interval join: pairs rows with equal keys where
    * `rightTs ∈ [leftTs - before, leftTs + after]`. `delay` is each side's
    * watermark delay (out-of-orderness bound). Matches emit on arrival —
    * inner joins never wait for the watermark; the watermark only bounds
    * state. Column names must be disjoint across the two sides. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      delay: String, before: String, after: String): DataFrame = {
    val cond: Column =
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $before") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $after")
    left.withWatermark(leftTs, delay)
      .join(right.withWatermark(rightTs, delay), cond)
  }

  /** Click-to-impression attribution: every click joined to the same
    * user's impressions in the preceding `lookback` — the canonical
    * interval-join deployment (clicks attribute backward in time only). */
  def attribution(impressions: DataFrame, clicks: DataFrame,
      delay: String = "10 minutes", lookback: String = "1 hour"): DataFrame =
    intervalJoin(clicks, impressions,
      leftKey = "click_user", rightKey = "imp_user",
      leftTs = "click_ts", rightTs = "imp_ts",
      delay = delay, before = lookback, after = "0 seconds")
}
