package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** The SportsTV star schema derived deterministically from the driver's
  * TPC-H-analog tables (role mapping per FIXTURES.md §1: lineitem/orders →
  * streaming_txns, customer→nation → subscriber geography, part → assets):
  * a `fact_streaming_summary` at the reference's (date, country, sport)
  * grain (`src/createStarSchema.PractII.VarmaA.R:104-117`) plus `dim_date`
  * and `dim_country`, so the Analytics suite — the reference's primary
  * query surface (`reports/BusinessAnalysis.PractII.VarmaA.Rmd:63-479`) —
  * runs under the driver's DuckDB oracle, which can reproduce this exact
  * derivation from the same parquet tables.
  *
  * Built once per (application, sfDir) and persisted: the reference's
  * report queries read a PRE-AGGREGATED fact table, so the analytics
  * queries sharing one materialized star mirrors its execution model
  * (and keeps an 11-query suite from re-running the rollup 11 times).
  *
  * Every measure keeps exact integer/decimal types so downstream
  * re-aggregation is partition-order-invariant and engine-portable:
  * minutes are ints (sums are longs), the only double —
  * `avg_minutes_per_stream` — is a deterministic round of an exact ratio.
  */
object TpchStar {

  final case class Star(fact: DataFrame, dimDate: DataFrame, dimCountry: DataFrame)

  private val cache =
    scala.collection.concurrent.TrieMap[(String, String), Star]()

  def apply(spark: SparkSession, dir: String): Star =
    cache.getOrElseUpdate((spark.sparkContext.applicationId, dir),
      build(spark, dir))

  /** Shared p_name→sport classification — q10/q17's cascade (kept in
    * lockstep with `Relational.pnameBucket` and both DuckDB oracles). */
  private def bucket(c: org.apache.spark.sql.Column) =
    graft.operators.Relational.pnameBucket(c)

  private def build(spark: SparkSession, dir: String): Star = {
    val l = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        to_date(col("l_shipdate")).as("ship_d"),
        // the bench ETL's deterministic column mapping: quantities are
        // integral in the testdata, so the int cast is exact
        (col("l_quantity").cast("int") + 1).as("minutes"),
        (col("l_orderkey") % 2).as("completed"))
    val o = Tables(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = Tables(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val p = Tables(spark, dir, "part")
      .select(col("p_partkey"), bucket(col("p_name")).as("sport_name"))

    val fact = l
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(p, l("l_partkey") === p("p_partkey"))
      .groupBy(col("ship_d"), col("c_nationkey").as("country_id"), col("sport_name"))
      .agg(
        count(lit(1)).as("transaction_count"),
        countDistinct(col("o_custkey")).as("unique_user_count"),
        sum(col("minutes")).as("total_minutes_streamed"),
        sum(col("completed")).as("completed_streams"),
        round(sum(col("minutes")).cast("double") / count(lit(1)), 2)
          .as("avg_minutes_per_stream"))
      .select(
        date_format(col("ship_d"), "yyyyMMdd").cast("int").as("date_id"),
        year(col("ship_d")).as("year"),
        weekofyear(col("ship_d")).as("week"),
        col("country_id"), col("sport_name"), col("transaction_count"),
        col("unique_user_count"), col("total_minutes_streamed"),
        col("completed_streams"), col("avg_minutes_per_stream"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val dimDate = Tables(spark, dir, "lineitem")
      .select(to_date(col("l_shipdate")).as("d")).distinct()
      .select(
        date_format(col("d"), "yyyyMMdd").cast("int").as("date_id"),
        dayofweek(col("d")).as("day_of_week")) // Sunday=1, the reference's convention
      .persist(StorageLevel.MEMORY_AND_DISK)

    val dimCountry = Tables(spark, dir, "nation")
      .select(col("n_nationkey").as("country_id"), col("n_name").as("country_name"))

    Star(fact, dimDate, dimCountry)
  }
}
