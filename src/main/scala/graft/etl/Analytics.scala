package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The analytics suite from the R Markdown report
  * (`reports/BusinessAnalysis.PractII.VarmaA.Rmd`, entry point 3 in SURVEY
  * §3.3), with the R-side post-processing (pivot, argmax-per-group, YoY
  * scalar math) moved INTO the plan as pivot / row_number / lag.
  *
  * All queries read the pre-aggregated fact (≤ date×country×sport rows), so
  * each is a small-data aggregate; joins to dims are broadcasts. `year`
  * predicates prune the fact's year partitions.
  */
object Analytics {

  /** Executive summary (Rmd:63-72, A5): one row of totals. */
  def executiveSummary(fact: DataFrame): DataFrame =
    fact.agg(
      sum("transaction_count").as("total_transactions"),
      sum("total_minutes_streamed").as("total_minutes"),
      sum("completed_streams").as("total_completed"),
      countDistinct("date_id").as("days"),
      countDistinct("country_id").as("countries"),
      countDistinct("sport_name").as("sports"),
      min("year").as("first_year"),
      max("year").as("last_year"))

  /** Streaming events by year × sport (Rmd:110-120). */
  def growthByYearSport(fact: DataFrame): DataFrame =
    fact.groupBy("year", "sport_name")
      .agg(
        sum("transaction_count").as("streaming_events"),
        round(sum("total_minutes_streamed") / 60.0, 1).as("total_hours"))
      .orderBy("year", "sport_name")

  /** dcast(sport ~ year) pivot (R1, Rmd:126-136), years pinned by caller. */
  def pivotSportByYear(fact: DataFrame, years: Seq[Int]): DataFrame =
    fact.groupBy("sport_name")
      .pivot("year", years)
      .agg(sum("transaction_count"))
      .na.fill(0L)
      .orderBy("sport_name")

  /** Weekly pattern for the most recent year (Rmd:216-227, A11+P6) —
    * parameterized in-plan via a broadcast 1-row max-year aggregate. */
  def weeklyForMaxYear(fact: DataFrame): DataFrame = {
    val mx = fact.agg(max("year").as("max_year"))
    fact.join(broadcast(mx), col("year") === col("max_year"))
      .groupBy("week")
      .agg(sum("transaction_count").as("transactions"))
      .orderBy("week")
  }

  /** By-sport analysis (Rmd:264-273): both average semantics preserved —
    * A7's avg-of-stored-avgs AND A8's correct ratio-of-sums. */
  def sportAnalysis(fact: DataFrame): DataFrame =
    fact.groupBy("sport_name")
      .agg(
        sum("transaction_count").as("transactions"),
        round(sum("total_minutes_streamed") / 60.0, 1).as("total_hours"),
        // avg-of-stored-avgs (A7's deliberate semantic) through an exact
        // decimal sum: avg(double) folds in partition order and can drift
        // an ulp across plans/engines; the decimal sum cannot
        round((sum(col("avg_minutes_per_stream").cast(DecimalType(18, 4)))
          .cast("double") / count(col("avg_minutes_per_stream"))), 2)
          .as("avg_of_avgs"),
        round(sum("total_minutes_streamed") / sum("transaction_count")
          .cast("double"), 1).as("minutes_per_stream"))
      .orderBy(desc("transactions"))

  /** By-country analysis with dim_country name resolution (Rmd:315-325, J5). */
  def countryAnalysis(fact: DataFrame, dimCountry: DataFrame): DataFrame =
    fact.join(broadcast(dimCountry), Seq("country_id"))
      .groupBy("country_name")
      .agg(
        sum("transaction_count").as("transactions"),
        round(sum("total_minutes_streamed") / 60.0, 1).as("total_hours"),
        round(sum("total_minutes_streamed") / sum("transaction_count")
          .cast("double"), 1).as("minutes_per_stream"))
      .orderBy(desc("transactions"))

  /** Day-of-week totals via dim_date (Rmd:376-386, J6). */
  def dayOfWeekAnalysis(fact: DataFrame, dimDate: DataFrame): DataFrame =
    fact.join(dimDate.select("date_id", "day_of_week"), Seq("date_id"))
      .groupBy("day_of_week")
      .agg(sum("transaction_count").as("transactions"),
        sum("total_minutes_streamed").as("total_minutes"))
      .orderBy("day_of_week")

  /** W1: peak day-of-week per sport (Rmd:440-447) — argmax via row_number,
    * tie-break pinned to lowest day (R's which.max takes the first index). */
  def peakDayBySport(fact: DataFrame, dimDate: DataFrame): DataFrame = {
    val byDow = fact.join(dimDate.select("date_id", "day_of_week"), Seq("date_id"))
      .groupBy("sport_name", "day_of_week")
      .agg(sum("total_minutes_streamed").as("total_minutes"))
    val w = Window.partitionBy("sport_name")
      .orderBy(desc("total_minutes"), asc("day_of_week"))
    byDow.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("sport_name")
  }

  /** W1 variant: peak day-of-week per country (Rmd:472-479). */
  def peakDayByCountry(fact: DataFrame, dimDate: DataFrame,
      dimCountry: DataFrame): DataFrame = {
    val byDow = fact
      .join(dimDate.select("date_id", "day_of_week"), Seq("date_id"))
      .join(broadcast(dimCountry), Seq("country_id"))
      .groupBy("country_name", "day_of_week")
      .agg(sum("total_minutes_streamed").as("total_minutes"))
    val w = Window.partitionBy("country_name")
      .orderBy(desc("total_minutes"), asc("day_of_week"))
    byDow.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("country_name")
  }

  /** A12: share-of-total percentages (the Rmd's R-side `x/sum(x)*100`,
    * Rmd:416-421), in-plan via an unpartitioned window over the per-sport
    * aggregate — a handful of rows, so the single partition is safe. */
  def sportShare(fact: DataFrame): DataFrame = {
    val bySport = fact.groupBy("sport_name")
      .agg(sum("transaction_count").as("transactions"))
    bySport
      .withColumn("pct_share",
        round(col("transactions") * 100.0 /
          sum("transactions").over(Window.partitionBy()), 1))
      .orderBy(desc("transactions"))
  }

  /** W2: year-over-year growth via lag (Rmd:196-203; README.md:229-235). */
  def yoyGrowth(fact: DataFrame): DataFrame = {
    val byYear = fact.groupBy("year")
      .agg(sum("transaction_count").as("transactions"))
    val w = Window.orderBy("year")
    byYear
      .withColumn("prev", lag(col("transactions"), 1).over(w))
      .select(col("year"), col("transactions"),
        round((col("transactions") - col("prev")) * 100.0 /
          when(col("prev") === 0, null).otherwise(col("prev")), 1)
          .as("yoy_pct"))
      .orderBy("year")
  }
}
