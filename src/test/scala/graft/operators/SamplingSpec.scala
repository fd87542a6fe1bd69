package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {

  private lazy val docs = spark.read
    .parquet(sf("sf0.001") + "/documents.parquet")

  test("hash split is deterministic, total, and near the 80/10/10 cuts") {
    val once = docs.select(col("doc_id"),
      Sampling.split(col("doc_id")).as("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val again = docs.select(col("doc_id"),
      Sampling.split(col("doc_id")).as("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once == again) // pure function of the key, not of the run
    val n = once.size.toDouble
    val frac = once.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.80) < 0.08, s"train=${frac("train")}")
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.10) < 0.06)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.10) < 0.06)
    // growing the corpus never moves an existing row between splits:
    // membership depends only on doc_id, checked by the subset property
    val subset = docs.filter(col("doc_id") < 100)
      .select(col("doc_id"), Sampling.split(col("doc_id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.foreach { case (id, s) => assert(once(id) == s) }
  }

  test("fine hash bucket: in range, deterministic, consistent with hashBucket") {
    val rows = docs.select(col("doc_id"),
      Sampling.fineHashBucket(col("doc_id")).as("b"),
      Sampling.hashBucket(col("doc_id")).as("b100")).collect()
    rows.foreach { r =>
      val b = r.getLong(1)
      assert(b >= 0 && b < 1000000)
      // both are (same 32-bit prefix) mod N — congruence need not align,
      // but the construction must be pure: recompute matches
    }
    val again = docs.select(Sampling.fineHashBucket(col("doc_id")).as("b"))
      .collect().map(_.getLong(0))
    assert(rows.map(_.getLong(1)).toSeq == again.toSeq)
  }

  test("rebalance sample keeps all of the smallest group, downsamples the rest") {
    val out = TrainingData.t18RebalanceSample(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    val minGrp = out.minBy(_.getAs[Long]("grp_tokens"))
    // the smallest group's cut is exactly 1e6 -> every bucket passes
    assert(minGrp.getAs[Double]("target_rate") == 1.0)
    assert(minGrp.getAs[Long]("n_kept") == minGrp.getAs[Long]("n_docs"))
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("target_rate") <= 1.0)
      // realized tracks target within hash-sampling noise — only
      // meaningful on groups large enough for the law of large numbers
      // (sf0.001 has (source, lang) cells of a handful of docs)
      if (r.getAs[Long]("n_docs") >= 25) {
        val diff = math.abs(
          r.getAs[Double]("realized_rate") - r.getAs[Double]("target_rate"))
        assert(diff < 0.25,
          s"${r.getAs[String]("source")}/${r.getAs[String]("lang")}: $diff")
      }
    }
  }

  test("stratified sample honors per-stratum fractions, seeded-deterministic") {
    val fractions = Map("en" -> 0.5, "de" -> 0.1)
    val s1 = Sampling.stratified(docs, "lang", fractions, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.stratified(docs, "lang", fractions, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    val byLang = docs.filter(col("doc_id").isInCollection(s1))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // strata not in the fraction map are dropped entirely
    assert(byLang.keySet.subsetOf(Set("en", "de")))
    assert(math.abs(byLang("en").toDouble / totals("en") - 0.5) < 0.2)
    assert(byLang.getOrElse("de", 0L).toDouble / totals("de") < 0.35)
  }

  test("stratifiedTopK: exact min(k,n) per stratum; growth never evicts unfairly") {
    import spark.implicits._
    val docs = ((0 until 300).map(i => (i.toLong, "en")) ++
      (1000 until 1010).map(i => (i.toLong, "fr"))).toDF("doc_id", "lang")
    val got = Sampling.stratifiedTopK(docs, "lang", "doc_id", k = 20)
    val byLang = got.collect().groupBy(_.getAs[String]("lang"))
    assert(byLang("en").length == 20)
    assert(byLang("fr").length == 10) // stratum smaller than k: keep all
    assert(byLang("en").map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 20))
    // determinism + stability: re-running and ADDING rows never changes
    // which of the ORIGINAL rows would win against the same competitors
    val again = Sampling.stratifiedTopK(docs, "lang", "doc_id", k = 20)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(again == got.collect().map(_.getAs[Long]("doc_id")).toSet)
    val grownIds = Sampling.stratifiedTopK(
      docs.union(Seq((5000L, "en")).toDF("doc_id", "lang")),
      "lang", "doc_id", k = 20)
      .filter(col("lang") === "en").collect().map(_.getAs[Long]("doc_id")).toSet
    val origIds = byLang("en").map(_.getAs[Long]("doc_id")).toSet
    // the newcomer either displaced exactly the largest-hash winner or
    // nothing — the original selection minus at most one member survives
    assert((origIds -- grownIds).size <= 1)
  }

  test("stratifiedTopK refuses loudly when the prune margin clips a stratum") {
    import spark.implicits._
    val docs = (0 until 5000).map(i => (i.toLong, "en")).toDF("doc_id", "lang")
    // construction must stay LAZY — the refusal fires at the first action
    val plan = Sampling.stratifiedTopK(docs, "lang", "doc_id", k = 20,
      margin = 0.01)
    val e = intercept[Exception](plan.count())
    def chain(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} | ${chain(t.getCause)}"
    assert(chain(e).contains("raise margin"))
  }

  test("stratifiedTopK refuses even when the prune empties EVERY stratum") {
    import spark.implicits._
    // ADVICE r8: the row-riding guard never evaluates on an all-empty
    // result (empty crossJoin carries no row to assert on) — the old
    // form silently returned an empty frame here. A margin this small
    // prunes every row of every stratum, so nothing survives to the
    // window; only the sentinel branch can carry the refusal.
    val docs = ((0 until 2000).map(i => (i.toLong, "en")) ++
      (5000 until 7000).map(i => (i.toLong, "fr"))).toDF("doc_id", "lang")
    val plan = Sampling.stratifiedTopK(docs, "lang", "doc_id", k = 5,
      salt = "allclip", margin = 1e-9)
    def chain(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} | ${chain(t.getCause)}"
    val e = intercept[Exception](plan.count())
    assert(chain(e).contains("raise margin"),
      s"all-strata clip went silent: ${chain(e)}")
    // and collect() — the action that would have returned the silent
    // empty frame — detonates too
    val e2 = intercept[Exception](
      Sampling.stratifiedTopK(docs, "lang", "doc_id", k = 5,
        salt = "allclip2", margin = 1e-9).collect())
    assert(chain(e2).contains("raise margin"))
  }

  test("stratifiedTopK construction fires no Spark jobs") {
    import spark.implicits._
    val docs = ((0 until 300).map(i => (i.toLong, "en")) ++
      (1000 until 1010).map(i => (i.toLong, "fr"))).toDF("doc_id", "lang")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    Sampling.stratifiedTopK(docs, "lang", "doc_id", k = 7, salt = "lazyprobe")
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "stratifiedTopK ran eager jobs at construction")
  }
}
