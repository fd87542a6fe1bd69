package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** F2/F3 conventions pinned by the reference (SURVEY §2.8): yyyyMMdd int
  * date_id, ISO-8601 week (R `%V`), Sunday=1 day-of-week (R `%w+1`), with
  * the year-boundary dates called out in SURVEY §5.2. */
class DatePartsSpec extends SparkTestBase {
  import spark.implicits._

  private def partsOf(date: String) = {
    val df = Seq(date).toDF("d").select(to_date($"d").as("d"))
    DateParts.withDateParts(df, col("d")).head()
  }

  test("date_id is the yyyyMMdd integer") {
    assert(partsOf("2024-03-05").getAs[Int]("date_id") == 20240305)
  }

  test("ISO week at year boundaries") {
    // Dec 29-31 2020 belong to 2020-W53; Jan 1-3 2021 stay in W53.
    assert(partsOf("2020-12-29").getAs[Int]("week") == 53)
    assert(partsOf("2021-01-01").getAs[Int]("week") == 53)
    assert(partsOf("2021-01-03").getAs[Int]("week") == 53)
    assert(partsOf("2021-01-04").getAs[Int]("week") == 1)
    // Dec 31 2024 (Tuesday) already belongs to 2025-W1.
    assert(partsOf("2024-12-31").getAs[Int]("week") == 1)
    // 2022-01-01 (Saturday) belongs to 2021-W52.
    assert(partsOf("2022-01-01").getAs[Int]("week") == 52)
  }

  test("day_of_week is 1=Sunday..7=Saturday") {
    assert(partsOf("2024-01-07").getAs[Int]("day_of_week") == 1) // Sunday
    assert(partsOf("2024-01-08").getAs[Int]("day_of_week") == 2) // Monday
    assert(partsOf("2024-01-13").getAs[Int]("day_of_week") == 7) // Saturday
  }

  test("quarter derivation matches (month-1)/3+1") {
    assert(partsOf("2024-03-31").getAs[Int]("quarter") == 1)
    assert(partsOf("2024-04-01").getAs[Int]("quarter") == 2)
    assert(partsOf("2024-12-31").getAs[Int]("quarter") == 4)
  }

  test("spine is dense and inclusive of both bounds") {
    val days = DateParts.spine(spark,
      to_date(lit("2020-12-28")), to_date(lit("2021-01-05")))
      .orderBy("full_date").collect().map(_.getDate(0).toString)
    assert(days.length == 9)
    assert(days.head == "2020-12-28" && days.last == "2021-01-05")
  }
}
