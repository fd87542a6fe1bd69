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
