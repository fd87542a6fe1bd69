package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Similarity.IvfIndex.dialSweep]] — the one-pass nprobe→(recall, scan
  * cost) curve. The operator's whole value rests on an identity (a true
  * top-k neighbour is retrieved at dial p iff its cell ranks ≤ p), so
  * the spec RE-DERIVES the curve the expensive way — one real probe per
  * dial, intersected with brute force — and asserts equality at every
  * dial, for both the recall and the scan-cost axes. */
class DialSweepSpec extends SparkTestBase {

  private lazy val emb = spark.read
    .parquet(sf("sf0.001") + "/embeddings.parquet")

  private lazy val ivf = Similarity.buildIvfIndex(emb)

  private val qf = col("vec_id") < 10
  private val k = 5

  private lazy val nlist = ivf.centroids.count().toInt

  private lazy val sweep = ivf.dialSweep(emb, qf, k, maxNprobe = nlist)
    .collect().sortBy(_.getAs[Int]("nprobe"))

  test("identity-derived hit counts equal a real probe run at EVERY dial") {
    val exact = Similarity.bruteForceTopK(emb, qf, k)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (1 to nlist).foreach { p =>
      val probed = ivf.topK(qf, k, nprobe = p)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val measured = probed.count(exact)
      val row = sweep(p - 1)
      assert(row.getAs[Long]("n_hits") == measured.toLong,
        s"dial $p: sweep says ${row.getAs[Long]("n_hits")} hits, probe measured $measured")
      assert(row.getAs[Long]("n_exact") == exact.size.toLong)
    }
  }

  test("scan cost equals the probe's real non-self candidate count at every dial") {
    val nQueries = emb.filter(qf).count()
    (1 to nlist).foreach { p =>
      // probedNonSelfCount is the probe's own occupancy certificate
      // (corpus rows in probed cells, self excluded); summing it IS the
      // per-dial scanned-candidate total
      val candidates = ivf.probedNonSelfCount(qf, nprobe = p)
        .agg(sum("n_cand")).collect()(0).getLong(0)
      val row = sweep(p - 1)
      val meanScanned = row.getAs[Double]("mean_scanned")
      assert(math.abs(meanScanned - candidates.toDouble / nQueries) < 0.005 + 1e-9,
        s"dial $p: sweep mean_scanned $meanScanned vs probe's ${candidates.toDouble / nQueries}")
    }
  }

  test("curve shape: monotone recall, monotone scan, exact at the full dial") {
    sweep.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_hits") >= a.getAs[Long]("n_hits"))
      assert(b.getAs[Double]("mean_scanned") >= a.getAs[Double]("mean_scanned"))
    }
    val last = sweep.last
    assert(last.getAs[Long]("n_hits") == last.getAs[Long]("n_exact"),
      "full dial must recall every true neighbour")
    assert(last.getAs[Double]("recall_at_k") == 1.0)
    sweep.foreach { r =>
      val frac = r.getAs[Double]("scan_frac")
      assert(frac > 0.0 && frac <= 1.0)
    }
  }

  test("s18 contract row: every claim true, one row per built cell") {
    val rows = graft.operators.TrainingData
      .s18IvfDialSweep(spark, sf("sf0.001")).collect()
    assert(rows.length == 16 || rows.length == nlist)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("sweep_matches_probe"))
      assert(r.getAs[Boolean]("recall_monotone"))
      assert(r.getAs[Boolean]("scan_monotone"))
      assert(r.getAs[Boolean]("full_dial_recall_one"))
    }
  }

  test("dialSweep refuses a non-positive dial range") {
    assertThrows[IllegalArgumentException] {
      ivf.dialSweep(emb, qf, k, maxNprobe = 0)
    }
  }

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)

  test("dialSweep refuses when emb holds vectors the index lacks") {
    // grow emb past the index with CLONES of the query vectors: each
    // query's nearest neighbour (cosine 1) is then its own clone, which
    // the stale index has never assigned — the exact silent-recall-
    // inflation scenario the lazy corpora guard must detonate on
    val grownEmb = emb.unionByName(emb.filter(qf)
      .withColumn("vec_id", col("vec_id") + 100000L))
    val e = intercept[Exception] {
      ivf.dialSweep(grownEmb, qf, k, maxNprobe = nlist).collect()
    }
    assert(messages(e).exists(_.contains("emb holds vectors the index lacks")))
  }

  test("dialSweep refuses when the index holds vectors emb lacks (superset)") {
    // the REVERSE direction (r10 advice): sweep the pre-growth corpus
    // against an index that has since ingested more vectors. With
    // |emb| > k every brute pair still survives the nid join — the
    // n_exact identity alone passes — yet the real probe ranks the
    // index-only vectors as candidates that can push true emb-neighbours
    // out of its top-k, so only the direct cardinality check catches it
    val grown = ivf.addBatch(emb.filter(qf)
      .withColumn("vec_id", col("vec_id") + 100000L))
    try {
      val e = intercept[Exception] {
        grown.dialSweep(emb, qf, k, maxNprobe = nlist).collect()
      }
      assert(messages(e).exists(_.contains("the index holds vectors emb lacks")))
    } finally grown.release()
  }
}
