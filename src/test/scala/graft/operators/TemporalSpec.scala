package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** As-of and range join semantics on hand-built fixtures (boundary
  * inclusivity, no-match nulls, bin-spanning intervals) plus plan-shape
  * assertions: neither operator may plan a BroadcastNestedLoopJoin — that
  * is the entire point of their construction. */
class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private lazy val quotes = Seq(
    (1L, d("2024-01-01"), 10.0),
    (1L, d("2024-01-10"), 20.0),
    (2L, d("2024-01-05"), 99.0))
    .toDF("qkey", "qd", "px")

  private lazy val trades = Seq(
    (100L, 1L, d("2023-12-31")), // before any quote -> null
    (101L, 1L, d("2024-01-01")), // equal ts -> inclusive, px=10
    (102L, 1L, d("2024-01-09")), // between -> px=10
    (103L, 1L, d("2024-01-10")), // equal second -> px=20
    (104L, 1L, d("2024-02-01")), // after all -> px=20
    (105L, 2L, d("2024-01-06")), // other key -> 99
    (106L, 3L, d("2024-01-06"))) // key with no quotes -> null
    .toDF("trade_id", "tkey", "td")

  test("asofJoin: backward inclusive match per key, nulls when no prior row") {
    val got = Temporal.asofJoin(trades, quotes, "tkey", "qkey", "td", "qd",
        valueCols = Seq("qd", "px"))
      .orderBy("trade_id")
      .select("trade_id", "px")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq == Seq(
      100L -> None, 101L -> Some(10.0), 102L -> Some(10.0), 103L -> Some(20.0),
      104L -> Some(20.0), 105L -> Some(99.0), 106L -> None))
  }

  test("asofJoin forward: earliest right row at-or-after, inclusive") {
    val got = Temporal.asofJoin(trades, quotes, "tkey", "qkey", "td", "qd",
        valueCols = Seq("px"), direction = "forward")
      .orderBy("trade_id")
      .select("trade_id", "px")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq == Seq(
      100L -> Some(10.0), // before first quote -> next is 01-01
      101L -> Some(10.0), // equal ts inclusive
      102L -> Some(20.0), // next quote is 01-10
      103L -> Some(20.0), // equal second
      104L -> None, //       after all quotes
      105L -> None, //       key 2's only quote (01-05) is BEFORE this trade
      106L -> None))
  }

  test("asofJoin: plan is one window pass — no join operator at all") {
    val plan = Temporal.asofJoin(trades, quotes, "tkey", "qkey", "td", "qd",
      valueCols = Seq("px")).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested-loop join in plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"asof should be joinless:\n$plan")
    assert(plan.contains("Window"), s"expected a window operator:\n$plan")
  }

  private lazy val points = Seq(
    (1L, 7L, d("2024-01-01")),
    (2L, 7L, d("2024-03-15")), // crosses the 64-day bin boundary of iv 20
    (3L, 7L, d("2024-04-30")), // == hi of iv 21 -> excluded (half-open)
    (4L, 8L, d("2024-01-15")), // key mismatch vs iv 20/21
    (5L, 7L, d("2023-12-31"))) // == lo - 1 day of iv 20 -> excluded
    .toDF("pid", "pkey", "pd")

  private lazy val intervals = Seq(
    (20L, 7L, d("2024-01-01"), d("2024-03-20")), // long: spans several bins
    (21L, 7L, d("2024-03-01"), d("2024-04-30")), // overlaps iv 20
    (22L, 8L, d("2024-01-01"), d("2024-02-01")))
    .toDF("iid", "ikey", "lo", "hi")

  test("rangeJoin: half-open containment per key, intervals spanning bins") {
    val got = Temporal.rangeJoin(points, intervals, "pkey", "ikey",
        "pd", "lo", "hi", binDays = 64)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    // brute force over the same fixtures
    val want = points.collect().flatMap { p =>
      intervals.collect().collect {
        case i if p.getLong(1) == i.getLong(1) &&
          !p.getDate(2).before(i.getDate(2)) && p.getDate(2).before(i.getDate(3)) =>
          (p.getLong(0), i.getLong(0))
      }
    }.toSet
    assert(got == want)
    assert(got.contains((2L, 20L)) && got.contains((2L, 21L))) // overlap hit twice
    assert(!got.exists(_._1 == 3L) && !got.exists(_._1 == 5L)) // boundary exclusions
  }

  test("rangeJoin: plans as a hash/sort-merge equi-join, never nested-loop") {
    val plan = Temporal.rangeJoin(points, intervals, "pkey", "ikey",
      "pd", "lo", "hi", binDays = 64).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested-loop join in plan:\n$plan")
    assert(plan.contains("Join"), s"expected an equi-join:\n$plan")
  }

  test("asofJoin agrees with a driver-side reference on random data, both directions") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      // right side unique per (key, ts) by construction
      val rightRows = (for (k <- 0 to 4) yield {
        rnd.shuffle((0 to 60).toList).take(8).map(t => (k.toLong, t, rnd.nextInt(1000)))
      }).flatten
      val leftRows = Seq.fill(60)(
        (rnd.nextLong().abs % 10000, rnd.nextInt(6).toLong, rnd.nextInt(70)))
      val right = rightRows.toDF("rkey", "rts", "v")
      val left = leftRows.toDF("lid", "lkey", "lts")

      def reference(forward: Boolean): Map[(Long, Long, Int), Option[Int]] =
        leftRows.map { case (id, k, t) =>
          val cands =
            if (forward) rightRows.filter(r => r._1 == k && r._2 >= t)
            else rightRows.filter(r => r._1 == k && r._2 <= t)
          val pick =
            if (forward) cands.sortBy(_._2).headOption
            else cands.sortBy(_._2).lastOption
          (id, k, t) -> pick.map(_._3)
        }.toMap

      for (dir <- Seq("backward", "forward")) {
        val got = Temporal.asofJoin(left, right, "lkey", "rkey", "lts", "rts",
            valueCols = Seq("v"), direction = dir)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)) ->
            (if (r.isNullAt(3)) None else Some(r.getInt(3))))
          .toMap
        assert(got == reference(dir == "forward"), s"direction=$dir")
      }
    }
  }

  test("asofJoin: null field in the matched row travels with it — never backfilled from an older row") {
    // the matched (most recent) quote has v1 = NULL; per-column fills would
    // skip it and carry v1 from 01-01 while v2 comes from 01-10, mixing two
    // right rows — true as-of returns the matched row wholesale
    val right = Seq(
      (1L, d("2024-01-01"), Option(10.0), Option("a")),
      (1L, d("2024-01-10"), Option.empty[Double], Option("b")))
      .toDF("rk", "rd", "v1", "v2")
    val left = Seq((1L, 1L, d("2024-01-15"))).toDF("lid", "lk", "ld")
    val row = Temporal.asofJoin(left, right, "lk", "rk", "ld", "rd",
      valueCols = Seq("v1", "v2")).select("v1", "v2").head()
    assert(row.isNullAt(0), "matched row's null v1 must be preserved")
    assert(row.getString(1) == "b")
  }

  test("rangeJoin: fixture-scale result equals the naive theta join on testdata") {
    val q21 = Relational.q21RangeJoin(spark, "/root/testdata/sf0.001")
    val o = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
    val ship = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("ship_id"),
        col("o_custkey").as("skey"), to_date(col("l_shipdate")).as("d"))
    val win = o.select(col("o_orderkey").as("win_id"), col("o_custkey").as("wkey"),
      to_date(col("o_orderdate")).as("lo"),
      date_add(to_date(col("o_orderdate")), 60).as("hi"))
    val naive = ship.join(win, col("skey") === col("wkey") &&
        col("d") >= col("lo") && col("d") < col("hi"))
      .select(col("ship_id"), col("win_id"), col("skey"), col("d"), col("lo"))
    assert(q21.count() > 0)
    assert(q21.exceptAll(naive).isEmpty && naive.exceptAll(q21).isEmpty)
  }
}
