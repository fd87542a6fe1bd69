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

  test("q57: ranks are a probability distribution over event types") {
    val out = Relational.q57PageRank(spark, sf("sf0.001")).collect()
    assert(out.length >= 3)
    val total = out.map(_.getAs[Double]("rank")).sum
    // rounded to 6 dp each; sum within rounding slack of 1
    assert(math.abs(total - 1.0) < 1e-5 * out.length, s"ranks sum to $total")
    out.foreach(r => assert(r.getAs[Double]("rank") > 0))
  }
}
