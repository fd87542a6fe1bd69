package graft.operators

import org.apache.spark.sql.DataFrame

import graft.{SparkTestBase, Tables}

/** The SQL entry point is a first-class modality (the reference is
  * SQL-first: BusinessAnalysis Rmd:91 runs every report through
  * `dbGetQuery`): `Tables.registerAll` views + `spark.sql` must produce
  * row-identical results to the DataFrame plans for representative §2.12
  * queries — same session, so equality is exact, not approximate. */
class SqlSurfaceSpec extends SparkTestBase {

  private lazy val dir = {
    val d = sf("sf0.001")
    Tables.registerAll(spark, d)
    d
  }

  private def assertSameRows(sql: String, df: DataFrame): Unit = {
    val viaSql = spark.sql(sql).collect().toSeq
    val viaDf = df.collect().toSeq
    assert(viaDf.nonEmpty)
    assert(viaSql == viaDf)
  }

  test("q02 agg rollup: SQL equals the DataFrame plan") {
    assertSameRows(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base,
        |  CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc,
        |  COUNT(*) AS cnt,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 2) AS ratio_of_sums
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      Relational.q02AggRollup(spark, dir))
  }

  test("q05 top-k: SQL equals the DataFrame plan") {
    assertSameRows(
      """SELECT c_name,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_name ORDER BY revenue DESC, c_name LIMIT 10""".stripMargin,
      Relational.q05TopK(spark, dir))
  }

  test("q06 argmax window: SQL equals the DataFrame plan") {
    assertSameRows(
      """SELECT * FROM (
        |  SELECT n_name, o_orderpriority, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY n_name
        |                       ORDER BY cnt DESC, o_orderpriority) AS rn
        |  FROM (SELECT n_name, o_orderpriority, COUNT(*) AS cnt
        |        FROM orders
        |        JOIN customer ON o_custkey = c_custkey
        |        JOIN nation ON c_nationkey = n_nationkey
        |        GROUP BY n_name, o_orderpriority))
        |WHERE rn = 1 ORDER BY n_name""".stripMargin,
      Relational.q06ArgmaxWindow(spark, dir))
  }

  test("q22 ROLLUP grouping sets: SQL equals the DataFrame plan") {
    assertSameRows(
      """SELECT yr, o_orderpriority,
        |  CAST(GROUPING(yr) AS INT) AS g_yr,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
        |  COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM (SELECT year(o_orderdate) AS yr, o_orderpriority, o_totalprice FROM orders)
        |GROUP BY ROLLUP(yr, o_orderpriority)
        |ORDER BY g_yr, g_pri, yr, o_orderpriority""".stripMargin,
      Relational.q22Rollup(spark, dir))
  }

  test("q28 CUBE lattice: SQL equals the DataFrame plan, margins reconcile") {
    assertSameRows(
      """SELECT n_name AS nation, yr,
        |  CAST(GROUPING(n_name) AS INT) AS g_nation,
        |  CAST(GROUPING(yr) AS INT) AS g_yr,
        |  COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM (SELECT n_name, year(o_orderdate) AS yr, o_totalprice
        |      FROM orders
        |      JOIN customer ON o_custkey = c_custkey
        |      JOIN nation ON c_nationkey = n_nationkey)
        |GROUP BY CUBE(n_name, yr)
        |ORDER BY g_nation, g_yr, nation, yr""".stripMargin,
      Relational.q28Cube(spark, dir))
    // the lattice must reconcile: every margin's n sums to the grand total
    val rows = Relational.q28Cube(spark, dir).collect()
    def tot(gn: Int, gy: Int) = rows
      .filter(r => r.getAs[Int]("g_nation") == gn && r.getAs[Int]("g_yr") == gy)
      .map(_.getAs[Long]("n")).sum
    val grand = tot(1, 1)
    assert(grand > 0)
    assert(tot(0, 0) == grand) // detail cells
    assert(tot(0, 1) == grand) // per-nation margin
    assert(tot(1, 0) == grand) // per-year margin
  }

  test("q25 SCD2 validity ranges: SQL equals the DataFrame plan") {
    assertSameRows(
      """WITH perday AS (
        |  SELECT o_custkey AS key, CAST(o_orderdate AS DATE) AS d,
        |         MAX(o_orderpriority) AS attr
        |  FROM orders GROUP BY 1, 2)
        |SELECT key, attr, d AS valid_from,
        |  LEAD(d) OVER (PARTITION BY key ORDER BY d) AS valid_to,
        |  LEAD(d) OVER (PARTITION BY key ORDER BY d) IS NULL AS is_current
        |FROM perday ORDER BY key, valid_from""".stripMargin,
      Relational.q25Scd2(spark, dir))
  }

  test("q17 flagship star rollup: SQL equals the DataFrame plan") {
    assertSameRows(
      """SELECT CAST(l_shipdate AS DATE) AS d, n_name,
        |  CASE WHEN p_name LIKE 'a%' OR p_name LIKE 'b%' THEN 'AB'
        |       WHEN p_name LIKE 'c%' THEN 'C'
        |       ELSE 'OTHER' END AS bucket,
        |  COUNT(*) AS transaction_count,
        |  COUNT(DISTINCT o_custkey) AS unique_user_count,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 2) AS avg_qty_per_txn
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
      Relational.q17EtlStarRollup(spark, dir))
  }

  test("injected SQL functions reach the custom Catalyst expressions") {
    dir // force view registration
    // codegen'd float-vector dot
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .head.getDouble(0)
    assert(dot == 11.0)
    // SQL cosine over embeddings == the Column-API cosine, bit-exact
    val viaSql = spark.sql(
      """SELECT vec_id, graft_dot(embedding, embedding) AS sq
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val viaCol = emb.select(org.apache.spark.sql.functions.col("vec_id"),
      graft.plans.VectorExpressions.dot(
        org.apache.spark.sql.functions.col("embedding"),
        org.apache.spark.sql.functions.col("embedding")).as("sq"))
      .orderBy("vec_id").limit(5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaCol)
    // winnowing fingerprints: identical text -> identical fingerprint sets
    val fps = spark.sql(
      """SELECT graft_winnowing_fps('the quick brown fox jumps', 8, 4) AS f,
        |       graft_winnowing_fps('the quick brown fox jumps', 8, 4) AS g""".stripMargin)
      .head
    assert(fps.getSeq[Long](0) == fps.getSeq[Long](1) && fps.getSeq[Long](0).nonEmpty)
    // srp buckets: fixed shape, deterministic
    val b = spark.sql(
      "SELECT graft_srp_buckets(array(1.0F, -2.0F), 8, 4, 2, 42) AS b").head
    assert(b.getSeq[Int](0).length == 4)
    // non-literal structural params are rejected loudly, not mis-planned
    val err = intercept[Exception](spark.sql(
      "SELECT graft_winnowing_fps('x', CAST(rand()*8 AS INT), 4)").head)
    assert(err.getMessage.contains("literal"))
  }

  test("INTERSECT/EXCEPT plans agree with the q27 churn statuses") {
    val churn = Relational.q27CustomerChurn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def custs(q: Int) =
      s"""SELECT o_custkey FROM orders
         |WHERE year(CAST(o_orderdate AS DATE)) = 1995
         |  AND quarter(CAST(o_orderdate AS DATE)) = $q""".stripMargin
    // INTERSECT == retained, EXCEPT both ways == churned / acquired —
    // Spark plans these as (left-)semi/anti joins; counts must agree with
    // the full-outer formulation exactly
    val retained = spark.sql(s"${custs(1)} INTERSECT ${custs(2)}").count()
    val churned = spark.sql(s"${custs(1)} EXCEPT ${custs(2)}").count()
    val acquired = spark.sql(s"${custs(2)} EXCEPT ${custs(1)}").count()
    assert(retained == churn.getOrElse("retained", 0L))
    assert(churned == churn.getOrElse("churned", 0L))
    assert(acquired == churn.getOrElse("acquired", 0L))
  }

  test("q26 hopping window: SQL window() equals the DataFrame plan") {
    assertSameRows(
      """SELECT window.start AS win_start, window.end AS win_end, event_type,
        |  COUNT(*) AS events,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY window(ts, '6 hours', '1 hour'), event_type
        |ORDER BY win_start, event_type""".stripMargin,
      Relational.q26HoppingWindow(spark, dir))
  }
}
