package graft.etl

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** The reference's implicit invariant across its 24 micro-batches
  * (SURVEY §5.2a): aggregating any partition of the input and additively
  * combining the partials equals the global aggregate. This is what makes
  * the `ON DUPLICATE KEY UPDATE cnt = cnt + VALUES(cnt)` load (S7) correct
  * and order-insensitive — and what Spark's partial+final hash aggregate
  * relies on. (countDistinct is deliberately NOT additive — the reference's
  * unique_user_count caveat, SURVEY A2 — so the property covers the
  * additive measures only.)
  */
class MergeAssociativitySpec extends SparkTestBase {
  import spark.implicits._

  test("partition-aggregate-combine == global aggregate on real data") {
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select($"l_returnflag", $"l_quantity", $"l_orderkey")
    val global = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("qty"))
    val parts = (0 to 2).map(k => li.filter($"l_orderkey" % 3 === k)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("qty")))
    val combined = parts.reduce(_ unionByName _)
      .groupBy("l_returnflag")
      .agg(sum("cnt").as("cnt"), sum("qty").as("qty"))
    val a = global.orderBy("l_returnflag").collect().toSeq
    val b = combined.orderBy("l_returnflag").collect().toSeq
    assert(a == b)
  }

  test("property: additive merge is split-invariant for generated data") {
    val rowGen = for {
      key <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0, 1000)
      split <- Gen.choose(0, 3)
    } yield (key, v, split)
    val listGen = Gen.listOfN(60, rowGen)
    Seq(1L, 42L, 2026L).foreach { seed =>
      val rows = listGen(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"generator exhausted for seed $seed"))
      val df = rows.toDF("key", "v", "split")
      val global = df.groupBy("key")
        .agg(count(lit(1)).as("cnt"), sum("v").as("s"))
        .orderBy("key").collect().toSeq
      val combined = (0 to 3)
        .map(k => df.filter($"split" === k).groupBy("key")
          .agg(count(lit(1)).as("cnt"), sum("v").as("s")))
        .reduce(_ unionByName _)
        .groupBy("key").agg(sum("cnt").as("cnt"), sum("s").as("s"))
        .orderBy("key").collect().toSeq
      assert(global == combined, s"seed=$seed")
    }
  }
}
