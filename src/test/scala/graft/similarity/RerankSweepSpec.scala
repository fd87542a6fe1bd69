package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Similarity.pqRerankSweep]] — the PQ twin of the IVF dial sweep. As
  * with DialSweepSpec, the identity the operator rests on (a true top-k
  * neighbour survives at shortlist size s iff its ADC rank ≤ s) is
  * re-derived the expensive way: one real `pqProbe(rerank = s)` run per
  * ladder step, intersected with brute force, asserted equal. */
class RerankSweepSpec extends SparkTestBase {

  private lazy val emb = spark.read
    .parquet(sf("sf0.001") + "/embeddings.parquet")

  private lazy val pq = Similarity.buildPqIndex(emb)

  private val qf = col("vec_id") < 10
  private val k = 5
  private val ladder = Seq(1, 3, 5, 10, 40, Int.MaxValue)

  private lazy val sweep =
    Similarity.pqRerankSweep(pq, emb, qf, k, ladder)
      .collect().sortBy(_.getAs[Int]("rerank"))

  test("identity-derived hit counts equal a real rerank probe at EVERY ladder step") {
    val exact = Similarity.bruteForceTopK(emb, qf, k)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    ladder.zipWithIndex.foreach { case (s, i) =>
      val probed = Similarity.pqProbe(pq, emb, qf, topK = k, rerank = s)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val measured = probed.count(exact)
      val row = sweep(i)
      assert(row.getAs[Int]("rerank") == s)
      assert(row.getAs[Long]("n_hits") == measured.toLong,
        s"step $s: sweep says ${row.getAs[Long]("n_hits")}, probe measured $measured")
      assert(row.getAs[Long]("n_exact") == exact.size.toLong)
    }
  }

  test("curve shape: monotone recall, exact at the whole-corpus step, honest costs") {
    sweep.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_hits") >= a.getAs[Long]("n_hits"))
      assert(b.getAs[Long]("rerank_rows") >= a.getAs[Long]("rerank_rows"))
    }
    val last = sweep.last
    assert(last.getAs[Long]("n_hits") == last.getAs[Long]("n_exact"),
      "the whole-corpus rerank must recall every true neighbour")
    assert(last.getAs[Double]("recall_at_k") == 1.0)
    assert(last.getAs[Long]("rerank_rows") == emb.count() - 1)
    sweep.foreach { r =>
      assert(r.getAs[Long]("rerank_rows")
        == math.min(r.getAs[Int]("rerank").toLong, emb.count() - 1))
    }
  }

  test("s20 contract row: every claim true, one row per ladder step") {
    val rows = graft.operators.TrainingData
      .s20PqRerankSweep(spark, sf("sf0.001")).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("sweep_matches_probe"))
      assert(r.getAs[Boolean]("recall_monotone"))
      assert(r.getAs[Boolean]("full_rerank_recall_one"))
    }
  }

  test("cheapestRerankFor picks the smallest step meeting the SLA, null when unattainable") {
    val sweepDf = Similarity.pqRerankSweep(pq, emb, qf, k, ladder)
      .localCheckpoint()
    val curve = sweepDf.collect().sortBy(_.getAs[Int]("rerank"))
    val target = 0.9
    val want = curve.find(_.getAs[Double]("recall_at_k") >= target)
    val got = Similarity.cheapestRerankFor(sweepDf, target).collect()(0)
    want match {
      case Some(row) =>
        assert(got.getAs[Int]("rerank") == row.getAs[Int]("rerank"))
      case None => assert(got.isNullAt(got.fieldIndex("rerank")))
    }
    // the whole-corpus step always attains recall 1.0; an impossible
    // SLA answers with the honest null
    assert(!Similarity.cheapestRerankFor(sweepDf, 1.0).collect()(0).isNullAt(0))
    assert(Similarity.cheapestRerankFor(sweepDf, 1.1).collect()(0).isNullAt(0))
  }

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)

  test("pqRerankSweep refuses when emb holds vectors the index lacks") {
    // the DialSweepSpec construction: clone the query vectors past the
    // index, so every query's true nearest neighbour is missing from
    // the codes table and the lazy corpora guard must fire
    val grownEmb = emb.unionByName(emb.filter(qf)
      .withColumn("vec_id", col("vec_id") + 100000L))
    val e = intercept[Exception] {
      Similarity.pqRerankSweep(pq, grownEmb, qf, k, ladder).collect()
    }
    assert(messages(e).exists(_.contains("emb holds vectors the index lacks")))
  }

  test("pqRerankSweep refuses when the index holds codes emb lacks (superset)") {
    // the r10-advice direction: sweep the pre-growth corpus against an
    // index that encoded MORE vectors. The n_exact identity passes (all
    // brute pairs survive the arank join when |emb| > k), yet the real
    // probe's ADC shortlist would carry the index-only candidates — only
    // the direct cardinality check catches it
    val grownPq = pq.copy(codes = pq.codes.unionByName(
      Similarity.encodeWithCodebooks(
        emb.filter(qf).withColumn("vec_id", col("vec_id") + 100000L),
        pq.codebooks)))
    val e = intercept[Exception] {
      Similarity.pqRerankSweep(grownPq, emb, qf, k, ladder).collect()
    }
    assert(messages(e).exists(_.contains("the index holds codes emb lacks")))
  }

  test("pqRerankSweep refuses an unsorted or non-positive ladder") {
    assertThrows[IllegalArgumentException] {
      Similarity.pqRerankSweep(pq, emb, qf, k, Seq(10, 5))
    }
    assertThrows[IllegalArgumentException] {
      Similarity.pqRerankSweep(pq, emb, qf, k, Seq(0, 5))
    }
    assertThrows[IllegalArgumentException] {
      Similarity.pqRerankSweep(pq, emb, qf, k, Nil)
    }
  }
}
