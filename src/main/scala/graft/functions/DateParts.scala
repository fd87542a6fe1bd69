package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-part derivation (reference F2, `loadAnalyticsDB.PractII.VarmaA
  * .R:76-81,209-218`) and the date spine (F3, R:204).
  *
  * Conventions pinned to the reference: `date_id` is the yyyyMMdd integer;
  * `week` is ISO-8601 (R's `%V` == Spark's weekofyear); `day_of_week` is
  * 1=Sunday..7=Saturday (R's `%w + 1` == Spark's dayofweek). All native
  * column expressions — whole-stage codegen, no UDFs.
  */
object DateParts {

  def dateId(d: Column): Column = date_format(d, "yyyyMMdd").cast("int")

  /** Append the reference's six date parts to `df` for date column `d`. */
  def withDateParts(df: DataFrame, d: Column): DataFrame = df
    .withColumn("date_id", dateId(d))
    .withColumn("year", year(d))
    .withColumn("quarter", quarter(d))
    .withColumn("month", month(d))
    .withColumn("week", weekofyear(d))
    .withColumn("day_of_month", dayofmonth(d))
    .withColumn("day_of_week", dayofweek(d))

  /** Dense daily spine [from, to] — in-plan sequence+explode, no driver
    * loop; a century of dates is ~36 K rows so the single-row source is not
    * a bottleneck at any scale. */
  def spine(spark: SparkSession, from: Column, to: Column): DataFrame =
    spark.range(1).select(
      explode(sequence(from, to, expr("interval 1 day"))).as("full_date"))
}
