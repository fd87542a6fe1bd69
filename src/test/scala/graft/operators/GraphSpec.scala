package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Graph.pageRank]] semantics on hand-checkable graphs, plus the q57
  * contract wrapper's conservation properties on the real corpus. */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("symmetric 2-cycle is the uniform fixed point at every iteration") {
    val edges = Seq(("a", "b", 1.0), ("b", "a", 1.0)).toDF("src", "dst", "w")
    val r = Graph.pageRank(edges, damping = 0.85, iters = 7)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // 0.5 is exactly representable and the update maps it to itself:
    // 0.15/2 + 0.85*0.5 = 0.5 in exact arithmetic AND in doubles
    assert(r("a") == 0.5 && r("b") == 0.5)
  }

  test("asymmetric graph matches a driver-side replay of the same arithmetic") {
    // a: half to b, half to itself; b: all to a — NOT uniform
    val edges = Seq(
      ("a", "a", 0.5), ("a", "b", 0.5), ("b", "a", 1.0))
      .toDF("src", "dst", "w")
    val iters = 9
    val got = Graph.pageRank(edges, damping = 0.85, iters = iters)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // replicate: decimal-exact inflow sums, double combine — the same
    // arithmetic the operator promises
    var (ra, rb) = (0.5, 0.5)
    for (_ <- 1 to iters) {
      val inA = (BigDecimal(ra * 0.5).setScale(18, BigDecimal.RoundingMode.HALF_UP) +
        BigDecimal(rb * 1.0).setScale(18, BigDecimal.RoundingMode.HALF_UP)).toDouble
      val inB = BigDecimal(ra * 0.5).setScale(18, BigDecimal.RoundingMode.HALF_UP).toDouble
      // (1 - 0.85) in doubles is 0.15000000000000002, not 0.15 — the
      // replay must take the operator's exact arithmetic path
      ra = (1 - 0.85) / 2 + 0.85 * inA
      rb = (1 - 0.85) / 2 + 0.85 * inB
    }
    assert(got("a") == ra, s"a: ${got("a")} vs replay $ra")
    assert(got("b") == rb)
    assert(got("a") > got("b")) // a receives b's whole mass plus its own half
  }

  test("dangling nodes refuse loudly instead of leaking mass") {
    val edges = Seq(("a", "b", 1.0)).toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException](
      Graph.pageRank(edges, iters = 1))
    assert(e.getMessage.contains("dangling"))
  }

  test("dangling selfloop mode == explicit self-loop pre-normalization") {
    // a → b with b a sink; selfloop mode must equal the hand-normalized
    // graph run through the strict path — same arithmetic, same ranks
    val edges = Seq(("a", "b", 1.0)).toDF("src", "dst", "w")
    val normalized = Seq(("a", "b", 1.0), ("b", "b", 1.0))
      .toDF("src", "dst", "w")
    val got = Graph.pageRank(edges, iters = 6, dangling = "selfloop")
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val want = Graph.pageRank(normalized, iters = 6)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(got == want)
    assert(got("b") > got("a")) // the sink accumulates and holds mass
  }

  test("dangling uniform mode conserves total mass and matches a replay") {
    val edges = Seq(("a", "b", 1.0)).toDF("src", "dst", "w")
    val iters = 5
    val got = Graph.pageRank(edges, iters = iters, dangling = "uniform")
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // driver-side replay of the exact arithmetic: decimal inflow + the
    // decimal sink-mass scalar, double combine
    var (ra, rb) = (0.5, 0.5)
    for (_ <- 1 to iters) {
      val inB = BigDecimal(ra * 1.0)
        .setScale(18, BigDecimal.RoundingMode.HALF_UP).toDouble
      val dm = BigDecimal(rb)
        .setScale(18, BigDecimal.RoundingMode.HALF_UP).toDouble
      val t = (1 - 0.85) / 2
      val (na, nb) = (t + 0.85 * (0.0 + dm / 2), t + 0.85 * (inB + dm / 2))
      ra = na; rb = nb
    }
    assert(got("a") == ra, s"a: ${got("a")} vs replay $ra")
    assert(got("b") == rb, s"b: ${got("b")} vs replay $rb")
    assert(math.abs(got("a") + got("b") - 1.0) < 1e-12)
  }

  test("label propagation: clamped seeds, majority vote, smallest-label ties, multi-hop reach") {
    // a(seed 1) ← c → b(seed 2): tie at c breaks to label 1.
    // d reads only b → 2. e reads only d → unlabeled after round 1,
    // inherits 2 on round 2. Seed a reads b but stays clamped to 1.
    val edges = Seq(
      ("c", "a"), ("c", "b"), ("d", "b"), ("e", "d"), ("a", "b"))
      .toDF("src", "dst")
    val seeds = Seq(("a", 1), ("b", 2)).toDF("id", "label")
    val out = Graph.labelPropagation(edges, seeds, iters = 3)
      .collect().map(r => r.getString(0) ->
        ((r.get(1), r.getBoolean(2)))).toMap
    assert(out("a") == ((1, true)))
    assert(out("b") == ((2, true)))
    assert(out("c") == ((1, false))) // tie → smallest label
    assert(out("d") == ((2, false)))
    assert(out("e") == ((2, false))) // reached on the second hop
  }

  test("s14: propagation saturates the pool; seeds stay clamped to truth") {
    // The synthetic corpus assigns labels INDEPENDENTLY of geometry
    // (measured 1-NN label agreement ≈ 0.14 ≈ chance over 10 classes),
    // so propagated accuracy on non-seeds is ~chance BY CONSTRUCTION —
    // that is the honest reading the accuracy columns exist to surface
    // (a labeling pipeline must measure this before trusting spread
    // labels). What the operator owes: labels REACH the pool through
    // the 5-NN graph, and clamped seeds never drift.
    val rows = TrainingData.s14LabelPropagation(spark, sf("sf0.001")).collect()
    val (seedRows, rest) = rows.partition(_.getAs[Boolean]("is_seed"))
    assert(seedRows.nonEmpty && rest.nonEmpty)
    seedRows.foreach(r => assert(
      r.getAs[Int]("propagated") == r.getAs[Int]("true_label")))
    val labeled = rest.filter(_.getAs[Int]("propagated") != -1)
    assert(labeled.length >= rest.length / 2, "propagation barely spread")
  }

  test("q57: ranks are a probability distribution over event types") {
    val out = Relational.q57PageRank(spark, sf("sf0.001")).collect()
    assert(out.length >= 3)
    val total = out.map(_.getAs[Double]("rank")).sum
    // rounded to 6 dp each; sum within rounding slack of 1
    assert(math.abs(total - 1.0) < 1e-5 * out.length, s"ranks sum to $total")
    out.foreach(r => assert(r.getAs[Double]("rank") > 0))
  }
}
