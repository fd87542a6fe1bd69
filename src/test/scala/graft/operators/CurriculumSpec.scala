package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Mixture-design and governance operators added in round 7: token-budget
  * waterfilling (t43), curriculum interleave (t44), k-anonymity audit
  * (t45) and the key-skew report (q54). Each is checked on a corpus small
  * enough to verify the algebra by hand — the cross-engine hash parity is
  * the driver's job; these pin the SEMANTICS. */
class CurriculumSpec extends SparkTestBase {
  import spark.implicits._

  /** documents.parquet with exact token counts 1 / 2 / 9 per source. */
  private lazy val waterDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("waterfill").toString
    Seq(
      (0L, "a", "en", "srcA"),
      (1L, "a b", "en", "srcB"),
      (2L, "a b c d e f g h i", "en", "srcC"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t43: waterfill saturates small sources and levels the rest; allocations exhaust the budget") {
    // availability (1, 2, 9), budget = 12/2 = 6 → ascending scan: level
    // candidates 6/3=2 (>1, invalid), 5/2=2.5 (>2, invalid), 3/1=3 (≤9,
    // valid) → level 3: srcA/srcB saturate at full mass, srcC gets 3.
    val out = TrainingData.t43BudgetWaterfill(spark, waterDir)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("available"), r.getAs[Double]("allocated"),
          r.getAs[Boolean]("saturated")))).toMap
    assert(out("srcA") == ((1L, 1.0, true)))
    assert(out("srcB") == ((2L, 2.0, true)))
    assert(out("srcC") == ((9L, 3.0, false)))
    assert(out.values.map(_._2).sum == 6.0) // exactly the budget
  }

  test("t43: budget above every source's mass allocates everything (all saturated)") {
    // same corpus but check the closed form's other regime by scaling:
    // with only two tiny sources the level lands between them
    val dir = java.nio.file.Files.createTempDirectory("waterfill2").toString
    Seq((0L, "a b c", "en", "s0"), (1L, "a b c d e", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // availability (3, 5), budget 4 → level candidates 4/2=2 (≤3 valid)
    // → both get 2.0, neither saturated
    val out = TrainingData.t43BudgetWaterfill(spark, dir)
      .collect().map(r => (r.getAs[Double]("allocated"),
        r.getAs[Boolean]("saturated")))
    assert(out.toSeq == Seq((2.0, false), (2.0, false)))
  }

  test("t44: formula positions equal the global (rank, source) row_number") {
    // unequal sources, so round-robin skips exhausted ones — the regime
    // where a naive `(r-1)*n_src + idx` formula breaks
    val out = TrainingData.t44CurriculumInterleave(spark, waterDir)
      .select("pos", "source", "src_rank", "doc_id")
      .collect()
    // the reference ordering, computed the naive way on the driver
    val expect = Seq( // (src_rank, source) lexicographic
      (1L, "srcA", 0L), (1L, "srcB", 1L), (1L, "srcC", 2L))
    assert(out.length == 3)
    out.zip(expect).zipWithIndex.foreach { case ((row, (r, s, d)), i) =>
      assert(row.getAs[Long]("pos") == i + 1)
      assert(row.getAs[Int]("src_rank") == r)
      assert(row.getAs[String]("source") == s)
      assert(row.getAs[Long]("doc_id") == d)
    }
  }

  test("t44: positions are the exact global row_number on the real corpus") {
    // cross-check the distributed formula against a driver-side sort of
    // the same ranked frame at sf0.001 (500 docs — bounded)
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("source"),
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("score"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ranked = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      rows.sortBy(r => (-r._3, r._1)).zipWithIndex
        .map { case ((id, s, sc), i) => (i + 1L, s, id, sc) }
    }.sortBy(r => (r._1, r._2))
    val expect = ranked.take(100).zipWithIndex
      .map { case ((r, s, id, sc), i) => (i + 1L, s, r, id, sc) }
    val got = TrainingData.t44CurriculumInterleave(spark, sf("sf0.001"))
      .collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("source"),
        r.getAs[Int]("src_rank").toLong, r.getAs[Long]("doc_id"),
        r.getAs[Long]("score")))
    assert(got.toSeq == expect)
  }

  test("q54: report values match hand-computed counts") {
    val dir = java.nio.file.Files.createTempDirectory("skewrep").toString
    // per-user event counts 1, 1, 2, 4 → n_rows 8, keys 4, max 4,
    // sorted counts [1,1,2,4]: p50 = rank 2 → 1, p90/p99 = rank 3 → 2
    val rows = Seq((10L, 1), (11L, 1), (12L, 2), (13L, 4)).flatMap {
      case (u, n) => (0 until n).map(i => (u * 100 + i, u, "view", 1.0, "{}"))
    }
    rows.toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Relational.q54KeySkewReport(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_rows") == 8L)
    assert(row.getAs[Long]("n_keys") == 4L)
    assert(row.getAs[Long]("max_cnt") == 4L)
    assert(row.getAs[Long]("p50_cnt") == 1L)
    assert(row.getAs[Long]("p90_cnt") == 2L)
    assert(row.getAs[Long]("p99_cnt") == 2L)
    assert(row.getAs[Double]("skew_x") == 2.0) // 4 / (8/4)
    assert(row.getAs[Long]("top_key") == 13L)
    assert(row.getAs[Long]("top_ppm") == 500000L) // 4/8 round-half-up
  }

  test("q55: join size, amplification and hot share from planted key counts") {
    val dir = java.nio.file.Files.createTempDirectory("joinsize").toString
    // partkey counts 1, 2, 3 → self-join rows 1 + 4 + 9 = 14
    Seq((1L, 100L), (2L, 200L), (3L, 200L), (4L, 300L), (5L, 300L), (6L, 300L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.q55JoinSizePlanner(spark, dir).collect().head
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("join_rows") == 14L)
    assert(r.getAs[Long]("max_c") == 3L)
    assert(r.getAs[Double]("amplification") == 2.3333)
    assert(r.getAs[Long]("top_key") == 300L)
    assert(r.getAs[Long]("hot_share_ppm") == 642857L) // round(9e6/14)
  }

  test("d20: shared 5-token prefixes cluster; unique prefixes drop") {
    val dir = java.nio.file.Files.createTempDirectory("boiler").toString
    Seq(
      (0L, "Sign in to continue reading this article about storks", "en", "srcA"),
      (1L, "sign in to continue reading something else entirely here", "en", "srcB"),
      (2L, "SIGN IN TO CONTINUE READING the park gazette daily", "en", "srcB"),
      (3L, "a totally unique document body with no template", "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TrainingData.d20PrefixBoilerplate(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("prefix") == "sign in to continue reading")
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Long]("first_doc") == 0L)
  }

  test("q56: signed-partial merge equals the full recompute over final membership") {
    val orders = graft.Tables(spark, sf("sf0.001"), "orders")
    val fin = orders.filter(
      col("o_orderkey") % 10 === 0 ||
        (col("o_orderkey") % 10 =!= 0 && col("o_orderkey") % 7 =!= 0))
    val direct = fin.groupBy(year(col("o_orderdate")).as("yr"),
        col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 4))), 2)
          .cast("double").as("revenue"))
      .orderBy("yr", "status")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val ivm = Relational.q56IvmRollup(spark, sf("sf0.001"))
      .collect().map(r => (r.getAs[Int]("yr"), r.getAs[String]("status"),
        r.getAs[Long]("n"), r.getAs[Double]("revenue"))).toSeq
    assert(ivm == direct)
    // retractions really removed something: some group differs from the
    // pre-retraction world
    val pre = orders.groupBy(year(col("o_orderdate")), col("o_orderstatus"))
      .count().collect().map(_.getLong(2)).sum
    assert(ivm.map(_._3).sum < pre)
  }

  test("t46: sweep is monotone in the threshold and anchored to the d02 pair table") {
    val sweep = TrainingData.t46ThresholdSweep(spark, sf("sf0.001"))
      .collect().map(r => (r.getAs[Double]("th"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_removed")))
    assert(sweep.map(_._1).toSeq == (2 to 9).map(_ / 10.0))
    // a higher bar can only cut pairs/docs/removals
    sweep.zip(sweep.tail).foreach { case (lo, hi) =>
      assert(lo._2 >= hi._2 && lo._3 >= hi._3 && lo._4 >= hi._4) }
    // the 0.2 row IS the d02 frame
    val d02 = TrainingData.d02NgramJaccard(spark, sf("sf0.001")).count()
    assert(sweep.head._2 == d02)
    assert(sweep.head._4 < sweep.head._3) // keep-lowest keeps ≥1 doc per pair-set
  }

  test("d21: signature estimates calibrate against exact Jaccard") {
    val r = TrainingData.d21MinhashCalibration(spark, sf("sf0.001")).collect().head
    assert(r.getAs[Long]("n_pairs") ==
      TrainingData.d02NgramJaccard(spark, sf("sf0.001")).count())
    assert(r.getAs[Boolean]("mae_within_015"))
    assert(r.getAs[Boolean]("bias_within_010"))
  }

  test("t47: schedule starts at natural shares, ends uniform, normalizes per epoch") {
    val out = TrainingData.t47MixSchedule(spark, sf("sf0.001"))
      .collect().map(r => (r.getAs[Int]("epoch"), r.getAs[String]("source"),
        r.getAs[Double]("weight")))
    val byEpoch = out.groupBy(_._1)
    assert(byEpoch.keySet == Set(0, 1, 2, 3, 4))
    // every epoch's weights are a distribution (6-dp rounding slack)
    byEpoch.values.foreach { rows =>
      assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4 * rows.size) }
    // epoch 4 is the uniform target
    val n = byEpoch(4).size
    byEpoch(4).foreach { case (_, _, w) =>
      assert(math.abs(w - 1.0 / n) < 1e-4) }
    // epoch 0 is the natural token share: biggest source carries the
    // biggest weight, and the spread strictly shrinks toward uniform
    def spread(e: Int): Double =
      byEpoch(e).map(_._3).max - byEpoch(e).map(_._3).min
    assert(spread(0) > spread(2) && spread(2) > spread(4))
  }

  test("q58: exact top-10 with CMS guarantees holding on the real corpus") {
    val out = TrainingData.q58HeavyHitters(spark, sf("sf0.001")).collect()
    assert(out.length == 10)
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to 10))
    val cnts = out.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    out.foreach { r =>
      assert(r.getAs[Boolean]("never_under"), "CMS underestimated — impossible")
      assert(r.getAs[Boolean]("within_eps"), "CMS blew the 2eN budget")
    }
  }

  test("q59: arm counts partition the population; z replays driver-side; A/A sanity") {
    val r = Relational.q59AbTest(spark, sf("sf0.001")).collect()
    assert(r.length == 1)
    val row = r.head
    val (an, ac) = (row.getAs[Long]("a_n"), row.getAs[Long]("a_conv"))
    val (bn, bc) = (row.getAs[Long]("b_n"), row.getAs[Long]("b_conv"))
    val users = graft.Tables(spark, sf("sf0.001"), "events")
      .select(col("user_id")).distinct().count()
    assert(an + bn == users)
    assert(ac <= an && bc <= bn && an > 0 && bn > 0)
    // replay the pooled two-proportion z from the four counts
    val (pa, pb) = (ac.toDouble / an, bc.toDouble / bn)
    val p = (ac + bc).toDouble / (an + bn)
    val z = (pa - pb) / math.sqrt(p * (1.0 - p) * (1.0 / an + 1.0 / bn))
    assert(row.getAs[Double]("z") == math.rint(z * 1e4) / 1e4 ||
      math.abs(row.getAs[Double]("z") - z) < 1e-3)
    assert(row.getAs[Boolean]("significant") == (math.abs(z) > 1.96))
    // no A/A-null assertion: the flag is deterministic PER CORPUS, but a
    // regenerated fixture re-rolls the 5% tail — the driver's oracle
    // hash (which recomputes the same flag) is the right lock, not a
    // spec that would flake once every ~20 regenerations
  }

  test("t45: groups below k are flagged, sensitive diversity counted") {
    val dir = java.nio.file.Files.createTempDirectory("kanon").toString
    // combo (1, SEG-A): 12 members in 2 balance bands — safe, l_div 2;
    // combo (2, SEG-B): 3 members in 3 bands — re-identifiable at k=10
    val rows =
      (0 until 12).map(i => (i.toLong, s"c$i", 1, if (i < 6) 500.0 else 1500.0, "SEG-A")) ++
      Seq((20L, "x", 2, -100.0, "SEG-B"), (21L, "y", 2, 2500.0, "SEG-B"),
        (22L, "z", 2, 7300.0, "SEG-B"))
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = TrainingData.t45KAnonymity(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("l_div"),
          r.getAs[Boolean]("at_risk")))).toMap
    assert(out((1, "SEG-A")) == ((12L, 2L, false)))
    // bands floor(-100/1000) = -1, floor(2500/1000) = 2, floor(7300/1000) = 7
    assert(out((2, "SEG-B")) == ((3L, 3L, true)))
  }
}
