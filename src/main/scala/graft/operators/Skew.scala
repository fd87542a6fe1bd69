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

  /** Salted equi-join for a hot probe-side key joining a (small-ish) build
    * side: the probe key is extended with a salt in [0, buckets), the build
    * side is replicated once per salt value, and the join runs on
    * (key, salt) — a hot key's rows spread over `buckets` reducers instead
    * of flooding one. Results are salt-invariant (every probe row still
    * meets every matching build row exactly once).
    *
    * AQE's skew-join split covers most shuffled-join skew at runtime; the
    * explicit form remains the tool when AQE can't act — a skewed stream
    * side in a stream-static join, deterministic partition layouts, or
    * build sides just over the broadcast threshold. Build-side cost is
    * `buckets`× replication: keep `buckets` at the skew factor, not
    * higher. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    val salted = probe.withColumn("__salt", salt(buckets).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
