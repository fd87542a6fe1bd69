package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property tests for every rounded-ratio emitter's rounding rule, over
  * ADVERSARIAL tie values — the half-ulp boundaries (x.xxx050 patterns)
  * where r5's t12 regression lived: three sf0.1 documents landed exactly
  * on a .00005 tie and Spark/DuckDB double rounding disagreed by 1e-4.
  * The fix was exact scaled-integer arithmetic; these properties pin that
  * arithmetic to its mathematical spec (BigDecimal/BigInt references
  * computed OUTSIDE Spark), so a future testdata regeneration can't land
  * on an untested tie:
  *
  *  - ppm half-up: `(num * 2000000 + den) div (den * 2)` — t32 ttr_ppm,
  *    t35 novelty_ppm, d09 ppm variants. Every generated batch includes
  *    CONSTRUCTED exact ties (num odd, den = 2e6·k → ratio ppm ends .5).
  *  - t12 avg_logp: `-((a*2 + n) div (2*n))/10000.0` (a = −10⁴·Σlp ≥ 0)
  *    must equal half-AWAY-FROM-ZERO of the exact average at 4 dp.
  *  - round(double, 4) — d09 overlap_frac, t20 dsir_score: Spark rounds
  *    the double's SHORTEST DECIMAL REPRESENTATION (BigDecimal.valueOf →
  *    HALF_UP), NOT its exact binary value: round(4.68145, 4) = 4.6815
  *    even though the binary value is 4.68144999…. The property pins
  *    that semantic, including doubles whose ×10⁴ is an EXACT binary .5
  *    tie (odd/32 — the only dyadic rationals that tie at 4 dp) and
  *    near-tie neighbors one ulp either side of (2m+1)/20000. DuckDB's
  *    double round was empirically checked against the same three
  *    families (4.68145 and ±1 ulp, (2m+1)/20000, odd/32) and matches
  *    the shortest-repr-half-up answer on all of them, which is what
  *    keeps d09/t20 oracle-parable; anything where that equivalence is
  *    load-bearing at more precision should move to the integer path.
  *
  * Cross-engine note: for the integer formulas the oracle SQL uses the
  * IDENTICAL integer expression (`//` = div on non-negatives), so Spark ==
  * BigInt reference implies Spark == DuckDB by construction; only the
  * round(double) emitters rely on both engines rounding the same IEEE
  * double the same way, which is exactly why the integer path exists for
  * every ppm/average emitter.
  */
class RoundingParitySpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(0xCAFEL + i))).distinct

  test("property: integer ppm formula == BigDecimal HALF_UP ppm, ties included") {
    val random = for {
      den <- Gen.choose(1L, 1000000000L)
      num <- Gen.choose(0L, den)
    } yield (num, den)
    // constructed exact .5-ppm ties: num = k(2m+1), den = 2e6·k →
    // ppm = (2m+1)/2 = m.5 exactly
    val tie = for {
      k <- Gen.choose(1L, 100000L)
      m <- Gen.choose(0L, 1000000L)
    } yield (k * (2 * m + 1), 2000000L * k)
    val cases = (sample(random, 120) ++ sample(tie, 120)).distinct
    val got = cases.toDF("num", "den")
      .select(col("num"), col("den"),
        expr("(num * 2000000L + den) div (den * 2)").as("ppm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (num, den) =>
      val want = BigDecimal(num) * 1000000 / BigDecimal(den)
      val ref = want.setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(got((num, den)) == ref,
        s"ppm($num/$den): spark=${got((num, den))} exact-half-up=$ref")
    }
  }

  test("property: t12 scaled-integer average == half-away-from-zero at 4 dp") {
    val random = for {
      n <- Gen.choose(1L, 100000L)
      a <- Gen.choose(0L, 4000000000L) // −10⁴·Σlp for lp ≤ 0
    } yield (a, n)
    // constructed exact ties: a = q·n + n/2 for even n → a/n ends in .5
    val tie = for {
      half <- Gen.choose(1L, 500000L)
      q <- Gen.choose(0L, 100000L)
    } yield (q * 2 * half + half, 2 * half)
    val cases = (sample(random, 120) ++ sample(tie, 120)).distinct
    val got = cases.toDF("a", "n")
      .select(col("a"), col("n"),
        (-expr("(a * 2 + n) div (2 * n)").cast("double") / 10000.0)
          .as("avg"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    cases.foreach { case (a, n) =>
      // avg_logp = −(a/n)/10⁴ rounded half-away-from-zero at 4 dp; with
      // a ≥ 0 that is HALF_UP on the magnitude, negated
      val ref = -(BigDecimal(a) / BigDecimal(n))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 10000.0
      assert(got((a, n)) == ref,
        s"avg($a/$n): spark=${got((a, n))} exact=$ref")
    }
  }

  test("property: Spark round(double,4) == shortest-repr BigDecimal HALF_UP") {
    // exact binary ties at 4 dp: x = odd/32 → x·10⁴ = odd·312.5 ends .5
    val dyadicTie = Gen.choose(0L, 300L).map(m => (2 * m + 1) / 32.0)
    // near-ties: the double closest to (2m+1)/20000 and its ulp neighbors
    val nearTie = for {
      m <- Gen.choose(0L, 100000L)
      bump <- Gen.oneOf(-1, 0, 1)
    } yield {
      val x = (2 * m + 1).toDouble / 20000.0
      bump match {
        case -1 => Math.nextDown(x)
        case 1  => Math.nextUp(x)
        case _  => x
      }
    }
    val plain = Gen.choose(0.0, 10.0)
    val cases =
      (sample(dyadicTie, 80) ++ sample(nearTie, 120) ++ sample(plain, 60))
        .distinct
    val got = cases.toDF("x")
      .select(col("x"), round(col("x"), 4).as("r"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    cases.foreach { x =>
      // BigDecimal.valueOf(double) is Double.toString's shortest decimal
      // repr — Spark's actual Round semantic (NOT the exact binary value:
      // new BigDecimal(4.68145).setScale(4, HALF_UP) gives 4.6814, Spark
      // and DuckDB both give 4.6815)
      val ref = java.math.BigDecimal.valueOf(x)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(got(x) == ref, s"round($x, 4): spark=${got(x)} shortest-repr=$ref")
    }
  }
}
