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

  test("scope guards: plain counts pass through") {
    flag(true)
    try {
      val plain = df.groupBy("g").agg(count(col("v")).as("n"))
      assert(!optimized(plain).contains("approx_count_distinct"))
      assert(plain.collect().map(_.getLong(1)).forall(_ == 2000L)) // exact
    } finally flag(false)
  }

  test("multi-column COUNT DISTINCT struct-packs into the sketch with tuple-null semantics") {
    // r7/r8 verdict: previously a prose-only exclusion. Nulls planted in
    // EACH argument position: SQL's COUNT(DISTINCT a, b) skips a row when
    // ANY argument is null, and a naive struct(a, b) would count it.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("g", IntegerType),
      StructField("a", LongType), StructField("b", StringType)))
    val rows = (1 to 2000).map { i =>
      val a: java.lang.Long = if (i % 7 == 0) null else (i % 211).toLong
      val b: String = if (i % 11 == 0) null else s"s${i % 53}"
      Row(i % 2, a, b)
    }
    val nf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    flag(false)
    val exact = nf.groupBy("g").agg(countDistinct(col("a"), col("b")).as("d"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    flag(true)
    try {
      val q = nf.groupBy("g").agg(countDistinct(col("a"), col("b")).as("d"))
      val plan = optimized(q)
      assert(plan.contains("approx_count_distinct"), s"no rewrite in:\n$plan")
      assert(!plan.contains("count(distinct"), s"exact path survived:\n$plan")
      q.collect().foreach { r =>
        val (g, est) = (r.getInt(0), r.getLong(1))
        // true NDV is a few hundred — rsd 0.05, generous 4σ acceptance;
        // an un-nulled struct would overcount by the ~400 null-bearing
        // tuples per group, far outside this band
        assert(math.abs(est - exact(g)) <= exact(g) * 0.2,
          s"g=$g estimate $est vs exact ${exact(g)}")
      }
      // SQL-first users get the same multi-column rewrite
      nf.createOrReplaceTempView("adr_nulls")
      val sq = spark.sql(
        "SELECT g, COUNT(DISTINCT a, b) FROM adr_nulls GROUP BY g")
      assert(optimized(sq).contains("approx_count_distinct"))
    } finally flag(false)
  }
}
