package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.SparkTestBase

/** Golden-value checks for the analytics suite over a hand-computed fact
  * (the Rmd query family, SURVEY §3.3). */
class AnalyticsSpec extends SparkTestBase {

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  // grain rows: (date_id, country, sport, cnt, uniq, minutes, completed, avg, y, q, m, w)
  private lazy val fact = df(Schemas.factStreamingSummary,
    Row(20210101, 1, "Ice Hockey", 10L, 5L, 300L, 6L, 30.0, 2021, 1, 1, 53),
    Row(20210102, 1, "Ice Hockey", 20L, 8L, 400L, 10L, 20.0, 2021, 1, 1, 53),
    Row(20210102, 2, "Ski Jumping", 5L, 3L, 250L, 2L, 50.0, 2021, 1, 1, 53),
    Row(20220101, 1, "Ice Hockey", 30L, 9L, 900L, 15L, 30.0, 2022, 1, 1, 52),
    Row(20220102, 2, "Ski Jumping", 15L, 6L, 150L, 8L, 10.0, 2022, 1, 1, 52))

  private lazy val dimDate = df(Schemas.dimDate,
    Row(20210101, java.sql.Date.valueOf("2021-01-01"), 2021, 1, 1, 53, 1, 6),
    Row(20210102, java.sql.Date.valueOf("2021-01-02"), 2021, 1, 1, 53, 2, 7),
    Row(20220101, java.sql.Date.valueOf("2022-01-01"), 2022, 1, 1, 52, 1, 7),
    Row(20220102, java.sql.Date.valueOf("2022-01-02"), 2022, 1, 1, 52, 2, 1))

  private lazy val dimCountry = df(Schemas.dimCountry,
    Row(1, "Norway"), Row(2, "Finland"))

  test("executive summary totals") {
    val r = Analytics.executiveSummary(fact).head()
    assert(r.getAs[Long]("total_transactions") == 80L)
    assert(r.getAs[Long]("total_minutes") == 2000L)
    assert(r.getAs[Long]("days") == 4L)
    assert(r.getAs[Int]("first_year") == 2021 && r.getAs[Int]("last_year") == 2022)
  }

  test("sport analysis keeps both average semantics distinct") {
    val ice = Analytics.sportAnalysis(fact)
      .filter(org.apache.spark.sql.functions.col("sport_name") === "Ice Hockey").head()
    assert(ice.getAs[Double]("avg_of_avgs") == 26.67) // (30+20+30)/3
    assert(ice.getAs[Double]("minutes_per_stream") == 26.7) // 1600/60
  }

  test("weekly for max year uses only 2022") {
    val rows = Analytics.weeklyForMaxYear(fact).collect()
    assert(rows.map(_.getAs[Long]("transactions")).sum == 45L)
  }

  test("yoy growth computes the lag percentage") {
    val rows = Analytics.yoyGrowth(fact).collect()
      .map(r => r.getAs[Int]("year") ->
        Option(r.getAs[java.lang.Double]("yoy_pct")).map(_.toDouble)).toMap
    assert(rows(2021).isEmpty)
    assert(rows(2022).contains(28.6)) // (45-35)/35*100
  }

  test("peak day per sport is the argmax day-of-week with tie-break") {
    val rows = Analytics.peakDayBySport(fact, dimDate).collect()
      .map(r => r.getAs[String]("sport_name") -> r.getAs[Int]("day_of_week")).toMap
    // Ice Hockey: dow 6 has 300, dow 7 has 400+900=1300 -> 7
    assert(rows("Ice Hockey") == 7)
    // Ski Jumping: dow 7 has 250, dow 1 has 150 -> 7
    assert(rows("Ski Jumping") == 7)
  }

  test("country analysis resolves names and aggregates") {
    val rows = Analytics.countryAnalysis(fact, dimCountry).collect()
      .map(r => r.getAs[String]("country_name") -> r.getAs[Long]("transactions")).toMap
    assert(rows == Map("Norway" -> 60L, "Finland" -> 20L))
  }

  test("sport share percentages sum to 100") {
    val shares = Analytics.sportShare(fact).collect()
      .map(_.getAs[Double]("pct_share"))
    assert(math.abs(shares.sum - 100.0) < 0.2)
    assert(shares.max == 75.0) // Ice Hockey 60/80
  }

  test("pivot fills missing year cells with zero") {
    val p = Analytics.pivotSportByYear(fact, Seq(2021, 2022, 2023)).collect()
      .map(r => r.getAs[String]("sport_name") ->
        (r.getAs[Long]("2021"), r.getAs[Long]("2022"), r.getAs[Long]("2023"))).toMap
    assert(p("Ice Hockey") == ((30L, 30L, 0L)))
    assert(p("Ski Jumping") == ((5L, 15L, 0L)))
  }
}
