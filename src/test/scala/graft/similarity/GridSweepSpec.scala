package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Similarity.gridSweep]] — the one-pass nprobe×rerank recall grid for
  * the IVF-PQ composite probe. The operator rests on an identity (a true
  * top-k neighbour is retrieved at (p, s) iff its cell ranks ≤ p AND its
  * ADC rank within the p-dial candidate set is ≤ s), so the spec
  * RE-DERIVES the whole grid the expensive way — one real
  * [[Similarity.ivfPqTopK]] run per cell, intersected with brute force —
  * and asserts equality at every cell; plus the two shared boundaries
  * with the independent sweeps (rerank=∞ column ≡ dialSweep, full-dial
  * row ≡ pqRerankSweep) and both corpora-guard directions. */
class GridSweepSpec extends SparkTestBase {

  private lazy val emb = spark.read
    .parquet(sf("sf0.001") + "/embeddings.parquet")

  private lazy val ivf = Similarity.buildIvfIndex(emb)
  private lazy val pq = Similarity.buildPqIndex(emb)

  private val qf = col("vec_id") < 10
  private val k = 5
  private val ladder = Seq(3, 10, 50, Int.MaxValue)

  private lazy val nlist = ivf.centroids.count().toInt

  private lazy val grid = Similarity
    .gridSweep(ivf, pq, emb, qf, k, maxNprobe = nlist, ladder)
    .collect()
    .map(r => (r.getAs[Int]("nprobe"), r.getAs[Int]("rerank")) -> r)
    .toMap

  private lazy val exact = Similarity.bruteForceTopK(emb, qf, k)
    .select("qid", "nid").collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("identity-derived hit counts equal a real composite probe at EVERY cell") {
    for (p <- 1 to nlist; s <- ladder) {
      val probed = Similarity.ivfPqTopK(ivf, pq, emb, qf, k,
          nprobe = p, rerank = s)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val measured = probed.count(exact)
      val row = grid((p, s))
      assert(row.getAs[Long]("n_hits") == measured.toLong,
        s"cell ($p, $s): grid says ${row.getAs[Long]("n_hits")} hits, " +
          s"probe measured $measured")
      assert(row.getAs[Long]("n_exact") == exact.size.toLong)
    }
  }

  test("rerank=∞ column reproduces dialSweep; full-dial row reproduces pqRerankSweep") {
    val dial = ivf.dialSweep(emb, qf, k, maxNprobe = nlist).collect()
      .map(r => r.getAs[Int]("nprobe") -> r.getAs[Long]("n_hits")).toMap
    (1 to nlist).foreach { p =>
      assert(grid((p, Int.MaxValue)).getAs[Long]("n_hits") == dial(p),
        s"dial $p: grid's ∞ column diverges from dialSweep")
    }
    val rs = Similarity.pqRerankSweep(pq, emb, qf, k, ladder).collect()
      .map(r => r.getAs[Int]("rerank") -> r.getAs[Long]("n_hits")).toMap
    ladder.foreach { s =>
      assert(grid((nlist, s)).getAs[Long]("n_hits") == rs(s),
        s"step $s: grid's full-dial row diverges from pqRerankSweep")
    }
  }

  test("grid shape: rerank-monotone at every dial, corner exact") {
    (1 to nlist).foreach { p =>
      ladder.sliding(2).foreach { case Seq(a, b) =>
        assert(grid((p, b)).getAs[Long]("n_hits") >=
          grid((p, a)).getAs[Long]("n_hits"),
          s"dial $p: recall not monotone from rerank $a to $b")
      }
    }
    val corner = grid((nlist, Int.MaxValue))
    assert(corner.getAs[Long]("n_hits") == corner.getAs[Long]("n_exact"),
      "the (full dial, whole corpus) corner must recall every true neighbour")
    assert(corner.getAs[Double]("recall_at_k") == 1.0)
  }

  test("s21 contract row: every claim true, one row per grid cell") {
    val rows = graft.operators.TrainingData
      .s21GridSweep(spark, sf("sf0.001")).collect()
    assert(rows.length == 16) // 4 dials (nlist=4 index) × 4 ladder steps
    rows.foreach { r =>
      assert(r.getAs[Boolean]("grid_matches_probe"))
      assert(r.getAs[Boolean]("rerank_monotone"))
      assert(r.getAs[Boolean]("full_rerank_matches_dial"))
      assert(r.getAs[Boolean]("corner_recall_one"))
    }
  }

  test("gridFrontierFor returns exactly the Pareto-minimal SLA cells") {
    val sweepDf = Similarity
      .gridSweep(ivf, pq, emb, qf, k, maxNprobe = nlist, ladder)
      .localCheckpoint()
    val cells = sweepDf.collect().map(r => ((r.getAs[Int]("nprobe"),
      r.getAs[Int]("rerank")), r.getAs[Double]("recall_at_k"))).toMap
    val target = 0.9
    val got = Similarity.gridFrontierFor(sweepDf, target).collect()
      .map(r => (r.getAs[Int]("nprobe"), r.getAs[Int]("rerank")))
    // plain-scala replay of the frontier definition
    val ok = cells.filter(_._2 >= target).keySet
    val want = ok.filter(c => !ok.exists(d =>
      d._1 <= c._1 && d._2 <= c._2 && d != c)).toSeq.sorted
    assert(got.toSeq == want)
    assert(got.nonEmpty, "the exact corner always attains any recall ≤ 1")
    // an unattainable SLA answers with the honest empty frontier
    assert(Similarity.gridFrontierFor(sweepDf, 1.1).collect().isEmpty)
  }

  test("gridSweep validates its dial range and ladder") {
    assertThrows[IllegalArgumentException] {
      Similarity.gridSweep(ivf, pq, emb, qf, k, maxNprobe = 0, ladder)
    }
    assertThrows[IllegalArgumentException] {
      Similarity.gridSweep(ivf, pq, emb, qf, k, nlist, Seq(10, 5))
    }
  }

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)

  test("gridSweep refuses corpora divergence in either direction") {
    // emb grown past the indexes: true neighbours (clones) missing
    val grownEmb = emb.unionByName(emb.filter(qf)
      .withColumn("vec_id", col("vec_id") + 100000L))
    val e1 = intercept[Exception] {
      Similarity.gridSweep(ivf, pq, grownEmb, qf, k, nlist, ladder).collect()
    }
    assert(messages(e1).exists(_.contains("SAME corpus")))
    // IVF assignment grown past emb (codes still match emb): superset
    val grownIvf = ivf.addBatch(emb.filter(qf)
      .withColumn("vec_id", col("vec_id") + 100000L))
    try {
      val e2 = intercept[Exception] {
        Similarity.gridSweep(grownIvf, pq, emb, qf, k, nlist, ladder)
          .collect()
      }
      assert(messages(e2).exists(_.contains("SAME corpus")))
    } finally grownIvf.release()
  }
}
