package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic checks of the query suite beyond the DuckDB hash-match (which
  * the driver owns): invariants that must hold on any input. */
class RelationalSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  test("q06 argmax yields exactly one row per group, rn always 1") {
    val rows = Relational.q06ArgmaxWindow(spark, dir).collect()
    assert(rows.map(_.getAs[String]("n_name")).distinct.length == rows.length)
    assert(rows.forall(_.getAs[Int]("rn") == 1))
  }

  test("q09 date spine is dense (count == max-min+1)") {
    val ds = Relational.q09DateSpine(spark, dir)
    val n = ds.count()
    val mm = ds.agg(min("d").as("lo"), max("d").as("hi")).head()
    val span = java.time.temporal.ChronoUnit.DAYS.between(
      mm.getDate(0).toLocalDate, mm.getDate(1).toLocalDate) + 1
    assert(n == span)
  }

  test("q13 union rollup equals the same aggregate over the plain table") {
    val viaUnion = Relational.q13UnionRollup(spark, dir)
      .orderBy("l_returnflag").collect().toSeq
    val plain = spark.read.parquet(dir + "/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_quantity").cast("decimal(18,4)")), 2).cast("double").as("qty"))
      .orderBy("l_returnflag").collect().toSeq
    assert(viaUnion == plain)
  }

  test("q05 top-k is correctly ordered and bounded") {
    val rows = Relational.q05TopK(spark, dir).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("SQL surface: registered views answer the oracle's own SQL shape") {
    graft.Tables.registerAll(spark, dir)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val viaDf = Relational.q02AggRollup(spark, dir)
      .select("l_returnflag", "l_linestatus", "cnt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(viaSql == viaDf)
  }

  test("approx_percentile tracks exact percentile within its accuracy bound") {
    // the streaming/mergeable quantile path (t05's exact percentile can't
    // run incrementally): with accuracy a, rank error is bounded by n/a
    val li = graft.Tables(spark, dir, "lineitem")
    val row = li.agg(
      expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("exact"),
      expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000)")
        .as("approx"),
      count(lit(1)).as("n"),
      min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi")).head()
    val exact = row.getSeq[Double](0)
    val approx = row.getSeq[Double](1)
    val span = row.getDouble(4) - row.getDouble(3)
    exact.zip(approx).foreach { case (e, a) =>
      // loose value-space sanity bound: the sketch must land in the right
      // neighborhood (rank-space guarantees don't map directly to values)
      assert(math.abs(e - a) <= span * 0.05, s"exact=$e approx=$a span=$span")
    }
  }

  test("q29 spend deciles: balanced buckets, monotone spend bands, conserved mass") {
    val rows = Relational.q29SpendDeciles(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    // NTILE balance: bucket sizes differ by at most 1
    val sizes = rows.map(_.getAs[Long]("n_customers"))
    assert(sizes.max - sizes.min <= 1)
    // deciles are spend-ordered: each band sits at or above the previous max
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi.getAs[Double]("min_spend") >= lo.getAs[Double]("max_spend"))
    }
    // mass conservation vs the source at cent precision
    val total = rows.map(_.getAs[Double]("total_spend")).sum
    val src = spark.read.parquet(dir + "/orders.parquet")
      .agg(sum(col("o_totalprice"))).head().getDouble(0)
    assert(math.abs(total - src) < 1.0)
  }

  test("q30 funnel counts only strictly-ordered stage sequences") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val events = Seq(
      // u1: the full ordered path
      (1L, t(1), 10L, "view"), (2L, t(2), 10L, "click"), (3L, t(3), 10L, "purchase"),
      // u2: all three types but in REVERSE order — only the view counts
      (4L, t(1), 20L, "purchase"), (5L, t(2), 20L, "click"), (6L, t(3), 20L, "view"),
      // u3: click precedes its view, purchase follows — chain broken at step 2
      (7L, t(1), 30L, "click"), (8L, t(2), 30L, "view"), (9L, t(3), 30L, "purchase"),
      // u4: view then purchase, no click — chain broken at step 3
      (10L, t(1), 40L, "view"), (11L, t(2), 40L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val tmp = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    // Tables' events branch expects the driver layout: int64 NANOS ts
    events.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Relational.q30EventFunnel(spark, tmp).head()
    assert(r.getAs[Long]("n_users") == 4)
    assert(r.getAs[Long]("n_viewed") == 4)
    assert(r.getAs[Long]("n_clicked_after_view") == 1)
    assert(r.getAs[Long]("n_purchased_after_click") == 1)
    assert(r.getAs[Double]("view_to_purchase_rate") == 0.25)
  }

  test("q34 times first view → first qualifying purchase, converters only") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def t(s: Int) = new java.sql.Timestamp(t0 + s * 1000L)
    val events = (Seq(
      // three converters with durations 60, 120, 600 s
      (1L, t(0), 10L, "view"), (2L, t(30), 10L, "click"), (3L, t(60), 10L, "purchase"),
      (4L, t(0), 20L, "view"), (5L, t(30), 20L, "click"), (6L, t(120), 20L, "purchase"),
      (7L, t(0), 30L, "view"), (8L, t(30), 30L, "click"), (9L, t(600), 30L, "purchase"),
      // out-of-order user must NOT count
      (10L, t(0), 40L, "purchase"), (11L, t(30), 40L, "view")))
      .toDF("event_id", "ts", "user_id", "event_type")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ttc").toString
    events.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Relational.q34TimeToConvert(spark, tmp).head()
    assert(r.getAs[Long]("n_converted") == 3)
    assert(r.getAs[Long]("min_sec") == 60)
    // p50: rank ⌊.5·2⌋+1 = 2 → 120; p90: ⌊.9·2⌋+1 = 2 → 120
    assert(r.getAs[Long]("p50_sec") == 120)
    assert(r.getAs[Long]("p90_sec") == 120)
    assert(r.getAs[Long]("max_sec") == 600)
    assert(r.getAs[Double]("mean_sec") == 260.0)
  }

  test("q31 cohorts form on the first active week; retention is vs own cohort") {
    import spark.implicits._
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 12:00:00")
    // Mondays: W0=2024-01-01 W1=01-08 W2=01-15 W3=01-22; events land
    // mid-week so the Monday truncation is actually exercised
    val events = Seq(
      (1L, ts("2024-01-03"), 1L), (2L, ts("2024-01-10"), 1L), // u1: W0 W1 W3
      (3L, ts("2024-01-24"), 1L), (4L, ts("2024-01-04"), 1L), // u1 twice in W0
      (5L, ts("2024-01-05"), 2L),                             // u2: W0 only
      (6L, ts("2024-01-09"), 3L), (7L, ts("2024-01-17"), 3L)) // u3: W1 W2
      .toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("view"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_cohort").toString
    events.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Relational.q31CohortRetention(spark, tmp).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_week").toString,
        r.getAs[Int]("weeks_since"), r.getAs[Long]("n_active"),
        r.getAs[Long]("cohort_size"), r.getAs[Double]("retention"))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-01", 3, 1L, 2L, 0.5),
      ("2024-01-08", 0, 1L, 1L, 1.0),
      ("2024-01-08", 1, 1L, 1L, 1.0)))
  }

  test("q33 winsorizes at nearest-rank bounds, duplicates handled exactly") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows =
      (1 to 16).map(i => ("a", i.toDouble)) ++ // n=16: ranks 1 and 15
        Seq(5.0, 5.0, 5.0, 5.0, 6.0, 7.0, 8.0, 9.0).map(("b", _)) // dup run at lo
    val events = rows.zipWithIndex
      .map { case ((t, v), i) => (i.toLong, ts0, i.toLong, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("graft_wins").toString
    events.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Relational.q33WinsorizedStats(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    // a: k_lo=⌊.0625·15⌋+1=1 → 1.0; k_hi=⌊.9375·15⌋+1=15 → 15.0;
    //    only 16 clamps high; mean = (1+..+15 + 15)/16 = 135/16
    assert(got("a") == ((16L, 1.0, 15.0, 0L, 1L, 8.4375)))
    // b: k_lo=1 → 5.0 (inside the duplicate run); k_hi=⌊.9375·7⌋+1=7 → 8.0
    assert(got("b") == ((8L, 5.0, 8.0, 0L, 1L, 6.125)))
  }

  test("q17 flagship grain is unique and conserves transactions") {
    val f = Relational.q17EtlStarRollup(spark, dir)
    val dupes = f.groupBy("d", "n_name", "bucket").count()
      .filter(col("count") > 1).count()
    assert(dupes == 0)
    val total = f.agg(sum("transaction_count")).head().getLong(0)
    val source = spark.read.parquet(dir + "/lineitem.parquet").count()
    assert(total == source) // every lineitem resolves all dims in testdata
  }

  test("q37 sufficient-stats regression agrees with Spark's built-ins") {
    // the decimal-moment algebra must reproduce the streaming-moment
    // built-ins to float tolerance (they differ only in summation order)
    val got = Relational.q37RegressionStats(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val ref = spark.read.parquet(dir + "/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        regr_slope(col("l_extendedprice"), col("l_quantity")).as("sl"),
        regr_intercept(col("l_extendedprice"), col("l_quantity")).as("ic"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, g) =>
      assert(math.abs(g.getAs[Double]("corr") - ref(k).getAs[Double]("c")) < 1e-6)
      assert(math.abs(g.getAs[Double]("covar_samp") - ref(k).getAs[Double]("cv")) < 1e-2)
      assert(math.abs(g.getAs[Double]("slope") - ref(k).getAs[Double]("sl")) < 1e-4)
      assert(math.abs(g.getAs[Double]("intercept") - ref(k).getAs[Double]("ic")) < 1e-2)
      assert(math.abs(g.getAs[Double]("corr")) <= 1.0)
    }
  }

  test("q38 set ops equal the explicit semi/anti join formulation") {
    def custs(yr: Int) = spark.read.parquet(dir + "/orders.parquet")
      .filter(year(col("o_orderdate")) === yr).select("o_custkey").distinct()
    val viaJoins = custs(1995)
      .join(custs(1996), Seq("o_custkey"), "left_semi")
      .join(custs(1997), Seq("o_custkey"), "left_anti")
      .orderBy("o_custkey").collect().toSeq
    assert(Relational.q38SetOps(spark, dir).collect().toSeq == viaJoins)
  }

  test("q39 gap fill: dense per-user spine, LOCF never null, endpoints observed") {
    val g = Relational.q39GapFill(spark, dir)
    assert(g.filter(col("filled").isNull).count() == 0)
    // per user: row count == day span; first and last rows are observed
    val perUser = g.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      datediff(max("d"), min("d")).as("span"),
      min(struct(col("d"), col("observed"))).as("first"),
      max(struct(col("d"), col("observed"))).as("last")).collect()
    perUser.foreach { r =>
      assert(r.getAs[Long]("n") == r.getAs[Int]("span") + 1)
      assert(r.getAs[org.apache.spark.sql.Row]("first").getAs[Boolean]("observed"))
      assert(r.getAs[org.apache.spark.sql.Row]("last").getAs[Boolean]("observed"))
    }
    // observed rows reproduce the plain daily aggregate
    val observed = g.filter(col("observed")).count()
    val daily = graft.Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().count()
    assert(observed == daily)
  }

  test("q40 transition matrix: rows normalize to 1, counts conserve adjacencies") {
    val m = Relational.q40EventTransitions(spark, dir)
    val rowSums = m.groupBy("event_type").agg(sum("p").as("sp")).collect()
    rowSums.foreach(r => assert(math.abs(r.getAs[Double]("sp") - 1.0) < 1e-3))
    val totalN = m.agg(sum("n")).head().getLong(0)
    val ev = graft.Tables(spark, dir, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(totalN == expected) // n-1 adjacencies per user stream
  }

  test("q41 HLL sketch: exact counts verified, monthly-merged estimate within budget") {
    val rows = Relational.q41HllDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    // the verdict column IS the accuracy check: lgK=12 HLL at these
    // cardinalities sits well inside 3%
    rows.foreach(r => assert(r.getAs[Boolean]("within_3pct"),
      s"sketch drifted past 3%: $r"))
    // n_exact reconciles with a direct COUNT(DISTINCT)
    val o = graft.Tables(spark, dir, "orders")
    val direct = o.groupBy(year(col("o_orderdate")).as("yr"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("n_exact") == direct(r.getAs[Int]("yr"))))
    // union-merge associativity: monthly sketches unioned per year give
    // the same estimate as one sketch built directly at year grain
    val yearly = o.select(year(col("o_orderdate")).as("yr"), col("o_custkey"))
      .groupBy("yr").agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))").as("est"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val merged = o.select(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"), col("o_custkey"))
      .groupBy("yr", "mo").agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
      .groupBy("yr").agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged == yearly)
  }

  test("q42 KLL sketch: merged estimates hold their rank guarantee, counts reconcile") {
    val rows = Relational.q42KllQuantiles(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_rank_ok"), s"p50 rank drift: $r")
      assert(r.getAs[Boolean]("p90_rank_ok"), s"p90 rank drift: $r")
    }
    val byFlag = graft.Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("n_rows") == byFlag(r.getString(0))))
  }

  test("q43 RANGE frame excludes calendar gaps where a ROWS frame would not") {
    import spark.implicits._
    // one series with a 10-day hole: the trailing-7-DAY range after the
    // hole must see ONLY the current day, while a 7-ROWS frame would
    // stretch back across the gap
    val daily = Seq(
      ("2000-01-01", 1L, 10L), ("2000-01-02", 1L, 20L),
      ("2000-01-03", 1L, 30L), ("2000-01-20", 1L, 5L))
      .toDF("ds", "country_id", "n")
      .select(to_date($"ds").as("d"), $"country_id", $"n")
      .withColumn("day_no", datediff($"d", lit("1970-01-01")).cast("long"))
    val range7 = org.apache.spark.sql.expressions.Window
      .partitionBy("country_id").orderBy("day_no").rangeBetween(-6L, 0L)
    val rows7 = org.apache.spark.sql.expressions.Window
      .partitionBy("country_id").orderBy("day_no").rowsBetween(-6, 0)
    val got = daily.select($"d", sum("n").over(range7).as("range_sum"),
        sum("n").over(rows7).as("rows_sum"))
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("2000-01-03") == ((60L, 60L))) // dense prefix: frames agree
    assert(got("2000-01-20") == ((5L, 65L))) // after the gap: RANGE resets, ROWS drags history
    // and the contract query's frame can never span more than 7 calendar days
    Relational.q43RangeFrame(spark, dir).collect().foreach { r =>
      assert(r.getAs[Long]("days_observed") <= 7L)
      assert(r.getAs[Long]("trail7") >= r.getAs[Long]("n"))
    }
  }

  test("q44 division equals the textbook double-NOT-EXISTS formulation") {
    import spark.implicits._
    // hand fixture: divisor {a,b,c}; k1 covers all, k2 misses c, k3 covers
    // all plus an attr OUTSIDE the divisor (must still divide), k4 covers
    // only d (outside) — and duplicates must not inflate the count
    val dividend = Seq(
      1 -> "a", 1 -> "b", 1 -> "c", 1 -> "a",
      2 -> "a", 2 -> "b",
      3 -> "a", 3 -> "b", 3 -> "c", 3 -> "d",
      4 -> "d").toDF("k", "attr")
    val divisor = Seq("a", "b", "c").toDF("attr")
    val got = Relational.divide(dividend, Seq("k"), "attr", divisor)
      .orderBy("k").collect().map(r => r.getInt(0) -> r.getLong(1))
    assert(got.toSeq == Seq(1 -> 3L, 3 -> 3L))
    // equivalence with the textbook algebra: ÷ = K − π_k((K × V) − D)
    // (Spark rejects the doubly-correlated NOT-EXISTS-NOT-EXISTS form)
    val keysDf = dividend.select("k").distinct()
    val missing = keysDf.crossJoin(divisor)
      .except(dividend.select("k", "attr").distinct())
    val viaAlgebra = keysDf.except(missing.select("k"))
      .orderBy("k").collect().map(_.getInt(0)).toSeq
    assert(viaAlgebra == Seq(1, 3))
    // contract query: every divider covers the full observed priority set
    val q = Relational.q44RelationalDivision(spark, dir).collect()
    assert(q.nonEmpty)
    val nPrio = spark.read.parquet(dir + "/orders.parquet")
      .select("o_orderpriority").distinct().count()
    assert(q.forall(_.getAs[Long]("n_priorities") == nPrio))
  }

  test("q46 attribution: lookback boundary is inclusive at exactly 1 h, exclusive past it") {
    import spark.implicits._
    // crafted events dir: the boundary cases real data won't hit
    val tmp = java.nio.file.Files.createTempDirectory("graft_attr").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val t0 = "2024-03-01 12:00:00"
    Seq(
      // user 1: click at the same instant as the purchase → attributed, 0 min
      (100L, ts(t0), 1L, "click", 0.0, "{}"),
      (101L, ts(t0), 1L, "purchase", 5.0, "{}"),
      // user 2: click exactly 1 h before → still attributed (inclusive), 60 min
      (200L, ts("2024-03-01 11:00:00"), 2L, "purchase", 5.0, "{}"),
      (199L, ts("2024-03-01 10:00:00"), 2L, "click", 0.0, "{}"),
      // user 3: click just over 1 h before → outside the window, unattributed
      (300L, ts("2024-03-01 11:00:00"), 3L, "purchase", 5.0, "{}"),
      (299L, ts("2024-03-01 09:58:59"), 3L, "click", 0.0, "{}"),
      // user 4: two clicks in-window at the SAME ts → max event_id wins
      (400L, ts(t0), 4L, "purchase", 5.0, "{}"),
      (397L, ts("2024-03-01 11:30:00"), 4L, "click", 0.0, "{}"),
      (398L, ts("2024-03-01 11:30:00"), 4L, "click", 0.0, "{}"),
      // user 5: no click at all
      (500L, ts(t0), 5L, "purchase", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(tmp + "/events.parquet")
    val got = Relational.q46Attribution(spark, tmp).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("mins_before")).map(_.toDouble),
          r.getAs[Boolean]("attributed")))).toMap
    assert(got(101L) == ((Some(100L), Some(0.0), true)))
    assert(got(200L) == ((Some(199L), Some(60.0), true)))
    assert(got(300L) == ((None, None, false)))
    assert(got(400L) == ((Some(398L), Some(30.0), true))) // tie → max id
    assert(got(500L) == ((None, None, false)))
  }

  test("q45 anomaly: warm-up rows absent; flag matches the rounded-z contract") {
    val rows = Relational.q45RollingAnomaly(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("m") >= 14), "warm-up row leaked through")
    assert(rows.forall(r =>
      r.getAs[Boolean]("is_anomaly") == (math.abs(r.getAs[Double]("z")) >= 2)))
  }

  test("q61 streaks: totals conserve active days; one user replayed in scala") {
    val s = Relational.q61LongestStreak(spark, dir)
    val rows = s.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("longest_streak") <= r.getAs[Long]("n_active_days"))
      assert(r.getAs[Long]("n_streaks") <= r.getAs[Long]("n_active_days"))
    }
    val activeDays = graft.Tables(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_active_days")).sum == activeDays)
    // replay the islands logic in plain scala for the busiest user
    val uid = rows.maxBy(_.getAs[Long]("n_active_days")).getAs[Long]("user_id")
    val days = graft.Tables(spark, dir, "events")
      .filter(col("user_id") === uid)
      .select(to_date(col("ts")).as("day")).distinct()
      .collect().map(_.getDate(0).toLocalDate.toEpochDay).sorted
    var longest = 1L; var cur = 1L; var streaks = 1L
    days.sliding(2).foreach {
      case Array(a, b) =>
        if (b == a + 1) { cur += 1; longest = math.max(longest, cur) }
        else { cur = 1; streaks += 1 }
      case _ => ()
    }
    val got = rows.find(_.getAs[Long]("user_id") == uid).get
    assert(got.getAs[Long]("longest_streak") == longest)
    assert(got.getAs[Long]("n_streaks") == streaks)
  }
}
