package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Similarity.IvfIndex.driftReport]] — the index-health summary an
  * operator trends to schedule rebuilds — and
  * [[Similarity.cheapestDialFor]], the SLA read of a dial-sweep curve.
  * The drift test does what production does: grows a frozen-centroid
  * index with a deliberately shifted batch and watches quantization
  * error rise. */
class DriftReportSpec extends SparkTestBase {

  private lazy val emb = spark.read
    .parquet(sf("sf0.001") + "/embeddings.parquet")

  test("occupancy facts reconcile with the assignment table exactly") {
    val idx = Similarity.buildIvfIndex(emb)
    try {
      val r = idx.driftReport().collect()(0)
      assert(r.getAs[Long]("n_cells") == idx.centroids.count())
      assert(r.getAs[Long]("n_vectors") == emb.count())
      val occupied = idx.assigned.select("cell").distinct().count()
      assert(r.getAs[Long]("empty_cells") == idx.centroids.count() - occupied)
      val maxN = idx.assigned.groupBy("cell").count()
        .agg(max("count")).collect()(0).getLong(0)
      assert(r.getAs[Long]("max_cell_n") == maxN)
      assert(r.getAs[Double]("cell_skew") >= 1.0)
      assert(r.getAs[Double]("mean_sq_dist") >= 0.0)
    } finally idx.release()
  }

  test("a drifted ingest batch raises quantization error against frozen centroids") {
    val seed = Similarity.buildIvfIndex(emb)
    val before = seed.driftReport().collect()(0).getAs[Double]("mean_sq_dist")
    // the drifted batch: every vector displaced by +10 per coordinate —
    // far outside the corpus's spread, so its distance to ANY frozen
    // centroid dominates the seed reading
    val shifted = emb.select(
      (col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"), x => x + lit(10.0f)).as("embedding"))
    val grown = seed.addBatch(shifted)
    try {
      val after = grown.driftReport().collect()(0).getAs[Double]("mean_sq_dist")
      assert(after > before,
        s"drifted batch must raise mean_sq_dist (before=$before after=$after)")
      // occupancy still conserves: seed + batch
      assert(grown.driftReport().collect()(0).getAs[Long]("n_vectors")
        == 2 * emb.count())
    } finally { grown.release(); seed.release() }
  }

  test("cheapestDialFor picks the smallest dial meeting the SLA, null when unattainable") {
    val idx = Similarity.buildIvfIndex(emb)
    try {
      val nlist = idx.centroids.count().toInt
      val sweep = idx.dialSweep(emb, col("vec_id") < 10, k = 5,
        maxNprobe = nlist).localCheckpoint()
      val curve = sweep.collect().sortBy(_.getAs[Int]("nprobe"))
      val target = 0.9
      val want = curve.find(_.getAs[Double]("recall_at_k") >= target)
      val got = Similarity.cheapestDialFor(sweep, target).collect()(0)
      want match {
        case Some(row) =>
          assert(got.getAs[Int]("nprobe") == row.getAs[Int]("nprobe"))
          assert(got.getAs[Double]("recall_at_k")
            == row.getAs[Double]("recall_at_k"))
        case None => assert(got.isNullAt(got.fieldIndex("nprobe")))
      }
      // full dial always reaches recall 1.0, so an attainable SLA exists
      assert(!Similarity.cheapestDialFor(sweep, 1.0).collect()(0)
        .isNullAt(0))
      // an impossible SLA answers with the honest null
      assert(Similarity.cheapestDialFor(sweep, 1.1).collect()(0)
        .isNullAt(0))
    } finally idx.release()
  }
}
