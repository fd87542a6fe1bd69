package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's validation suite (`loadAnalyticsDB.PractII.VarmaA
  * .R:626-753`) made FATAL: the reference printed PASS/FAIL and never
  * aborted (SURVEY §5.1); here any violation throws. */
object Validate {

  final case class ValidationError(msg: String) extends RuntimeException(msg)

  /** Source-vs-fact conservation (R:691-721), exact rather than the
    * reference's `< 100` tolerance: every valid input row is counted once. */
  def conservation(fact: DataFrame, expectedValidRows: Long): Unit = {
    // coalesce: sum() is NULL on an empty fact, which must compare as 0
    val loaded = fact.agg(coalesce(sum("transaction_count"), lit(0L)))
      .head.getLong(0)
    if (loaded != expectedValidRows)
      throw ValidationError(
        s"conservation: fact holds $loaded transactions, expected $expectedValidRows")
  }

  /** ISO week ∈ [1,53] and the other date parts in range (R:723-736). */
  def weekRange(fact: DataFrame): Unit = {
    val bad = fact.filter(
      col("week") < 1 || col("week") > 53 ||
        col("quarter") < 1 || col("quarter") > 4 ||
        col("month") < 1 || col("month") > 12).count()
    if (bad != 0) throw ValidationError(s"weekRange: $bad rows out of range")
  }

  /** NULL audit on the grain keys and measures (R:738-753). */
  def nullAudit(fact: DataFrame): Unit = {
    val keyCols = Seq("date_id", "country_id", "sport_name",
      "transaction_count", "total_minutes_streamed")
    val bad = fact.filter(keyCols.map(col(_).isNull).reduce(_ || _)).count()
    if (bad != 0) throw ValidationError(s"nullAudit: $bad rows with NULL keys")
  }

  /** Grain uniqueness: one row per (date_id, country_id, sport_name) — the
    * PK the reference enforced in MySQL (createStarSchema R:149). */
  def grainUnique(fact: DataFrame): Unit = {
    val dupes = fact.groupBy("date_id", "country_id", "sport_name")
      .count().filter(col("count") > 1).count()
    if (dupes != 0) throw ValidationError(s"grainUnique: $dupes duplicate grain keys")
  }

  def all(fact: DataFrame, expectedValidRows: Long): Unit = {
    conservation(fact, expectedValidRows)
    weekRange(fact)
    nullAudit(fact)
    grainUnique(fact)
  }
}
