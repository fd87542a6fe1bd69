package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.etl.Bucketing

class SkewAndBucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("salted aggregate equals direct aggregate on skewed data") {
    // 90% of rows share one hot key
    val skewed = spark.range(0, 20000)
      .select(
        when($"id" % 10 < 9, "hot").otherwise(concat(lit("k"), $"id" % 7))
          .as("key"),
        ($"id" % 100).as("v"))
    val direct = skewed.groupBy("key")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
      .orderBy("key").collect().toSeq
    val salted = Skew.saltedAggregate(skewed, Seq("key"), Seq("v"), buckets = 8)
      .orderBy("key").collect().toSeq
    assert(direct == salted)
  }

  test("salted join equals the plain join on a hot-keyed probe side") {
    val probe = spark.range(0, 20000)
      .select(
        when($"id" % 10 < 9, "hot").otherwise(concat(lit("k"), $"id" % 7))
          .as("key"),
        $"id".as("pid"))
    val build = Seq(("hot", 100), ("k0", 0), ("k3", 3), ("missing", -1))
      .toDF("key", "bval")
    val plain = probe.join(build, "key")
      .select("key", "pid", "bval").as[(String, Long, Int)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(probe, build, "key", buckets = 8)
      .select("key", "pid", "bval").as[(String, Long, Int)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("count-min sketch never underestimates; overestimate bounded by eps·N") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val eps = 0.001
    val cms = Sketches.tokenCountSketch(docs, eps = eps)
    val exact = docs
      .select(explode(graft.text.TextAnalysis.tokens($"text")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).limit(30)
      .as[(String, Long)].collect()
    val total = exact.map(_._2).sum // lower bound on N is fine for the check
    val n = docs.select(sum(graft.text.TextAnalysis.tokenCount($"text")))
      .head.getLong(0)
    exact.foreach { case (tok, cnt) =>
      val est = cms.estimateCount(tok)
      assert(est >= cnt, s"$tok: est $est < exact $cnt")
      assert(est <= cnt + (eps * n).ceil.toLong + 1,
        s"$tok: est $est exceeds exact $cnt + eps*N")
    }
    assert(total > 0 && cms.totalCount() == n)
  }

  test("bucketed-by-key join plans without an Exchange") {
    // the session catalog is fresh per JVM but the warehouse dir persists;
    // clear both so saveAsTable can't trip over a stale location
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    val o = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val l = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(o, "orders_b", "o_orderkey", buckets = 8)
    Bucketing.writeBucketed(l, "lineitem_b", "l_orderkey", buckets = 8)
    val joined = spark.conf.get("spark.sql.autoBroadcastJoinThreshold") match {
      case _ =>
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try Bucketing.read(spark, "lineitem_b")
          .join(Bucketing.read(spark, "orders_b"),
            col("l_orderkey") === col("o_orderkey"))
        finally ()
    }
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle; plan:\n$plan")
    // correctness unchanged vs the unbucketed join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val expected = l.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)
  }
}
