package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for aggregations whose group keys are hot.
  *
  * Spark's map-side partial aggregation already absorbs most key skew for
  * hash aggregates, and AQE splits skewed JOIN partitions — but a grouped
  * aggregate whose hot key floods one reducer (e.g. a single country with
  * 40% of all events, or high-cardinality partial states like distinct
  * sets) still bottlenecks. [[saltedAggregate]] is the classic two-phase
  * fix: aggregate per (key, salt) first — spreading each hot key over
  * `buckets` reducers — then combine the partials per key. Correct for any
  * algebraic aggregate (sum/count/min/max); NOT for countDistinct (use the
  * raw-regroup or HLL paths instead).
  */
object Skew {

  /** Row salt: deterministic spread, independent of the group key. Salt
    * values only affect placement, never results (sum associativity). */
  private def salt(buckets: Int): Column =
    pmod(monotonically_increasing_id(), lit(buckets.toLong))

  /** Two-phase salted sum/count aggregation.
    * @param sumCols columns to SUM (output name `sum_<col>`); a `cnt`
    *                count rides along. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
      buckets: Int = 16): DataFrame = {
    val partials =
      count(lit(1)).as("__cnt") +: sumCols.map(c => sum(col(c)).as(s"__sum_$c"))
    val partial = df
      .withColumn("__salt", salt(buckets))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    val finals =
      sum(col("__cnt")).as("cnt") +: sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }
}
