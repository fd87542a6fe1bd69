package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("alpha"), 5.0),
    (2L, Some("beta"), 50.0),
    (2L, None, 500.0), // duplicate key, null text, out-of-range value
    (4L, Some("gamma"), 25.0))
    .toDF("id", "text", "v")

  test("metrics and pass flags are exact on a known fixture") {
    val got = Expectations.run(df, Seq(
      Expectations.uniqueKey("id_unique", col("id")),
      Expectations.complete("text_complete", col("text")),
      Expectations.inRange("v_in_range", col("v"), 0, 100),
      Expectations.satisfies("v_positive", col("v") > 0),
      Expectations.atLeastRows("min_rows_2", 2),
      Expectations.atLeastRows("min_rows_10", 10)))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getBoolean(3)))).toMap
    assert(got("id_unique") == ((0.75, false)))
    assert(got("text_complete") == ((0.75, false)))
    assert(got("v_in_range") == ((0.75, false)))
    assert(got("v_positive") == ((1.0, true)))
    assert(got("min_rows_2") == ((1.0, true)))
    assert(got("min_rows_10") == ((0.4, false)))
  }

  test("a null predicate result is a failing row, not a dropped one") {
    val got = Expectations.run(df,
      Seq(Expectations.satisfies("text_is_alpha", col("text") === "alpha")))
      .head()
    assert(got.getDouble(1) == 0.25) // the null-text row counts in the denominator
  }

  test("the whole suite is one scan: a single aggregate, no joins/unions") {
    val plan = Expectations.run(df, Seq(
      Expectations.complete("a", col("text")),
      Expectations.inRange("b", col("v"), 0, 100),
      Expectations.atLeastRows("c", 1)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Union"),
      s"expected a single-pass plan, got:\n$plan")
  }

  test("a sub-rounding-grain violation still fails: passed uses the raw metric") {
    // metric 1 - 1e-9 displays as 1.000000 after the 6-dp report rounding,
    // but the exact-threshold decision must still be false — two duplicate
    // keys in ten million rows may not round their way past uniqueKey
    val got = Expectations.run(df,
      Seq(Expectations.Expect("nearly", max(lit(1.0) - lit(1e-9)), 1.0)))
      .head()
    assert(got.getDouble(1) == 1.0) // the displayed metric rounds up
    assert(!got.getBoolean(3)) // the decision does not
  }

  test("grouped run catches a slice failing while the global run passes") {
    val sliced = Seq(
      ("en", Some("a")), ("en", Some("b")), ("en", Some("c")),
      ("de", Some("x")), ("de", None)) // de has a null text
      .toDF("lang", "text")
    val global = Expectations.run(sliced,
      Seq(Expectations.complete("text_complete", col("text"), threshold = 0.75)))
      .head()
    assert(global.getBoolean(3)) // 4/5 = 0.8 ≥ 0.75 → green globally
    val byLang = Expectations.runGrouped(sliced, Seq("lang"),
      Seq(Expectations.complete("text_complete", col("text"), threshold = 0.75)))
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(byLang == Map("en" -> true, "de" -> false)) // the slice is red
  }

  test("duplicate check names are rejected loudly") {
    intercept[IllegalArgumentException] {
      Expectations.run(df, Seq(
        Expectations.complete("x", col("text")),
        Expectations.satisfies("x", col("v") > 0)))
    }
  }
}
