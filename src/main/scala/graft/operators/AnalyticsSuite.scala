package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.{Analytics, TpchStar}

/** Driver-contract entry points putting the Analytics suite — the
  * reference's primary query surface (`reports/BusinessAnalysis.PractII
  * .VarmaA.Rmd:63-479`) — under the DuckDB oracle, over the
  * [[graft.etl.TpchStar]] star fixture that the oracle reproduces from the
  * same parquet tables. a00 checks the star derivation itself; a01–a11
  * cover every function in [[graft.etl.Analytics]]. */
object AnalyticsSuite {

  private def star(spark: SparkSession, dir: String): TpchStar.Star =
    TpchStar(spark, dir)

  /** The materialized fact itself — pins the grain, measures, and types the
    * rest of the suite aggregates over. */
  def a00StarFact(spark: SparkSession, dir: String): DataFrame =
    star(spark, dir).fact
      .orderBy("date_id", "country_id", "sport_name")

  def a01ExecutiveSummary(spark: SparkSession, dir: String): DataFrame =
    Analytics.executiveSummary(star(spark, dir).fact)

  def a02GrowthYearSport(spark: SparkSession, dir: String): DataFrame =
    Analytics.growthByYearSport(star(spark, dir).fact)

  def a03WeeklyMaxYear(spark: SparkSession, dir: String): DataFrame =
    Analytics.weeklyForMaxYear(star(spark, dir).fact)

  def a04SportAnalysis(spark: SparkSession, dir: String): DataFrame =
    Analytics.sportAnalysis(star(spark, dir).fact)

  def a05CountryAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val s = star(spark, dir)
    Analytics.countryAnalysis(s.fact, s.dimCountry)
  }

  def a06DayOfWeek(spark: SparkSession, dir: String): DataFrame = {
    val s = star(spark, dir)
    Analytics.dayOfWeekAnalysis(s.fact, s.dimDate)
  }

  def a07PeakDayBySport(spark: SparkSession, dir: String): DataFrame = {
    val s = star(spark, dir)
    Analytics.peakDayBySport(s.fact, s.dimDate)
  }

  def a08SportShare(spark: SparkSession, dir: String): DataFrame =
    Analytics.sportShare(star(spark, dir).fact)

  def a09YoyGrowth(spark: SparkSession, dir: String): DataFrame =
    Analytics.yoyGrowth(star(spark, dir).fact)

  def a10PivotSportYear(spark: SparkSession, dir: String): DataFrame =
    Analytics.pivotSportByYear(star(spark, dir).fact, Seq(1999, 2000, 2001))

  def a11PeakDayByCountry(spark: SparkSession, dir: String): DataFrame = {
    val s = star(spark, dir)
    Analytics.peakDayByCountry(s.fact, s.dimDate, s.dimCountry)
  }
}
