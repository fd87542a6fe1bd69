package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Declarative data-quality expectations evaluated in ONE pass — the
  * validation layer every production pipeline runs between ingest and
  * publish (the reference eyeballs the same properties ad hoc in its
  * load scripts: row counts, null checks, FK resolution rates).
  *
  * Each expectation compiles to one aggregate expression; the whole suite
  * is a single `agg(...)` over one scan of the input — adding a check adds
  * a column, never a job. The scalar results then melt into one long
  * report row per check: `(check, metric, threshold, passed)` —
  * `passed = metric >= threshold`, with every metric oriented so that
  * bigger is better (rates in [0,1]; bound checks report the fraction of
  * rows inside the bound).
  *
  * Scale: the aggregate state is a handful of scalars per check
  * regardless of input size; everything partial-aggregates map-side.
  * [[Expectations.uniqueKey]] is the one exception — exact distinct needs
  * a shuffle of the key column; use it deliberately (it is the check that
  * matters most at publish time), or gate it behind a sampled run.
  */
object Expectations {

  /** One expectation: a name, an aggregate producing the metric in
    * "bigger is better" orientation, and the pass threshold. */
  final case class Expect(name: String, metric: Column, threshold: Double)

  /** Fraction of rows where `c` is non-null (completeness). */
  def complete(name: String, c: Column, threshold: Double = 1.0): Expect =
    Expect(name, avg(when(c.isNotNull, 1.0d).otherwise(0.0d)), threshold)

  /** Fraction of rows satisfying an arbitrary row predicate; null
    * predicate results count as failures (unknown is not compliant). */
  def satisfies(name: String, pred: Column, threshold: Double = 1.0): Expect =
    Expect(name, avg(when(coalesce(pred, lit(false)), 1.0d).otherwise(0.0d)),
      threshold)

  /** Fraction of rows whose `c` lies in [lo, hi] (nulls fail). */
  def inRange(name: String, c: Column, lo: Double, hi: Double,
      threshold: Double = 1.0): Expect =
    satisfies(name, c >= lo && c <= hi, threshold)

  /** Fraction of rows whose `c` is one of the accepted values. */
  def inSet(name: String, c: Column, accepted: Seq[String],
      threshold: Double = 1.0): Expect =
    satisfies(name, c.isin(accepted.map(lit): _*), threshold)

  /** distinct(key)/count — 1.0 iff `c` is a unique key. The one check
    * that costs a shuffle (exact distinct on the key). */
  def uniqueKey(name: String, c: Column, threshold: Double = 1.0): Expect =
    Expect(name,
      countDistinct(c).cast("double") / count(lit(1)).cast("double"),
      threshold)

  /** At-least row-count floor, reported as min(count/floor, 1). */
  def atLeastRows(name: String, floor: Long): Expect =
    Expect(name, least(count(lit(1)).cast("double") / lit(floor.toDouble),
      lit(1.0d)), 1.0)

  /** Evaluate the suite in one aggregate pass and melt to one row per
    * check: (check, metric, threshold, passed). The REPORTED metric
    * rounds to 6 dp through DECIMAL so the report replays identically
    * across engines, but `passed` compares the UNROUNDED metric: at
    * corpus scale a violation rate below 5e-7 would otherwise round to
    * 1.000000 and falsely pass an exact-threshold check (two duplicate
    * keys in ten million rows must still fail `uniqueKey`). */
  def run(df: DataFrame, checks: Seq[Expect]): DataFrame =
    runGrouped(df, Nil, checks)

  /** Same suite, evaluated per group — the per-slice quality report
    * (per language, per source, per ingest partition) that catches a
    * check passing globally while one slice is broken. Still one
    * aggregate pass: the group-by grain shuffle is the only exchange,
    * and the melt multiplies rows only at the tiny report grain. */
  def runGrouped(df: DataFrame, groupCols: Seq[String],
      checks: Seq[Expect]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_.name)}")
    val aggs = checks.map(e => e.metric.cast("double").as(e.name))
    val one =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val long = checks.map(e =>
      struct(lit(e.name).as("check"),
        round(col(e.name).cast(DecimalType(28, 10)), 6).cast("double")
          .as("metric"),
        lit(e.threshold).as("threshold"),
        (col(e.name) >= e.threshold).as("passed")))
    one
      .select(groupCols.map(col) :+ explode(array(long: _*)).as("r"): _*)
      .select(groupCols.map(col) ++ Seq(col("r.check"), col("r.metric"),
        col("r.threshold"), col("r.passed")): _*)
  }
}
