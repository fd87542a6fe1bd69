package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The config-gated COUNT(DISTINCT) → HLL++ rewrite: off by default
  * (exact semantics for oracle runs), one conf flip away for interactive
  * workloads, scoped to exactly the single-column distinct-count shape. */
class ApproxDistinctRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private def flag(on: Boolean): Unit =
    spark.conf.set("spark.graft.approxDistinct", on.toString)

  private lazy val df = (1 to 10000)
    .map(i => (i.toLong, (i % 997).toLong, i % 5)).toDF("id", "v", "g")

  private def optimized(q: org.apache.spark.sql.DataFrame): String =
    q.queryExecution.optimizedPlan.toString

  test("off by default: exact distinct count, no sketch in the plan") {
    flag(false)
    val q = df.groupBy("g").agg(countDistinct(col("v")).as("d"))
    assert(!optimized(q).contains("approx_count_distinct"))
    assert(q.collect().map(_.getLong(1)).forall(_ == 997L)) // exact
  }

  test("flag on: plan takes the HLL++ path and the estimate is within rsd") {
    flag(true)
    try {
      val q = df.groupBy("g").agg(countDistinct(col("v")).as("d"))
      val plan = optimized(q)
      assert(plan.contains("approx_count_distinct"), s"no rewrite in:\n$plan")
      assert(!plan.contains("count(distinct"), s"exact path survived:\n$plan")
      // rsd 0.05 default; 997 true NDV → generous 4σ acceptance
      q.collect().map(_.getLong(1)).foreach(est =>
        assert(math.abs(est - 997L) <= 997 * 0.2, s"estimate $est"))
      // SQL-first users get the same rewrite (the extension's point)
      df.createOrReplaceTempView("adr_t")
      val sq = spark.sql("SELECT g, COUNT(DISTINCT v) FROM adr_t GROUP BY g")
      assert(optimized(sq).contains("approx_count_distinct"))
    } finally flag(false)
  }

  test("scope guards: plain counts and multi-column distincts pass through") {
    flag(true)
    try {
      val plain = df.groupBy("g").agg(count(col("v")).as("n"))
      assert(!optimized(plain).contains("approx_count_distinct"))
      assert(plain.collect().map(_.getLong(1)).forall(_ == 2000L)) // exact
      val multi = df.groupBy("g")
        .agg(countDistinct(col("v"), col("id")).as("d"))
      assert(!optimized(multi).contains("approx_count_distinct"))
      assert(multi.collect().map(_.getLong(1)).forall(_ == 2000L)) // exact
    } finally flag(false)
  }
}
