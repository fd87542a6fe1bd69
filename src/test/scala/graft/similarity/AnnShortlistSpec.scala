package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The ANN-shortlist compositions (round-7 verdict #2): MMR and
  * hard-negative mining fed by an [[Similarity.IvfIndex]] probe instead
  * of a brute-force corpus scan. Exactness is pinned at the open dial
  * (nprobe = nlist ⇒ the probe IS exact), and the production dial's
  * shortlist recall vs brute force is MEASURED, not assumed. */
class AnnShortlistSpec extends SparkTestBase {

  private lazy val emb = spark.read
    .parquet(sf("sf0.001") + "/embeddings.parquet")

  private lazy val ivf = Similarity.buildIvfIndex(emb)

  private val qf = col("vec_id") < 5

  test("MMR over a full-dial ANN shortlist equals brute-force MMR row for row") {
    val want = Similarity.mmrDiverseTopK(emb, qf, k = 5, shortlist = 20)
      .orderBy("qid", "rank").collect().toSeq
    val got = Similarity.mmrDiverseTopKAnn(ivf, emb, qf, k = 5,
      shortlist = 20, nprobe = 16).orderBy("qid", "rank").collect().toSeq
    assert(got == want)
  }

  test("MMR at the production dial: well-formed, and picks drawn from the probe's shortlist") {
    val sl = ivf.topK(qf, k = 20, nprobe = 4)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.mmrDiverseTopKAnn(ivf, emb, qf, k = 5,
      shortlist = 20, nprobe = 4).collect()
    got.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length))
      val nids = rows.map(_.getAs[Long]("vec_id"))
      assert(nids.distinct.length == nids.length)
      nids.foreach(n => assert(sl((qid, n)), s"pick $n outside the ANN shortlist"))
    }
  }

  test("hard negatives over a full-dial ANN shortlist equal brute force row for row") {
    val n = emb.count().toInt
    val want = Similarity.hardNegatives(emb, qf, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    val got = Similarity.hardNegativesAnn(ivf, emb, qf, k = 5,
      shortlist = n, nprobe = 16).orderBy("qid", "rank").collect().toSeq
    assert(got == want)
  }

  test("production-dial shortlist recall vs brute force is measured and high") {
    // recall@20 of the nprobe=4 probe against the exact top-20 — the
    // number a user reads before trusting the production dial. The
    // fixture's clustered embeddings make IVF recall strong; the bound
    // is deliberately loose (≥0.5) so the assertion tests the MEASURE,
    // not the corpus draw.
    val k = 20
    val exact = Similarity.bruteForceTopK(emb, qf, k)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val probed = ivf.topK(qf, k, nprobe = 4)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & probed).size.toDouble / exact.size
    info(f"shortlist recall@$k (nprobe=4 of 16 cells): $recall%.3f")
    assert(recall >= 0.5 && recall <= 1.0)
    // hard negatives at the production dial stay well-formed even when
    // the shortlist is approximate: labels differ, ranks dense
    val hn = Similarity.hardNegativesAnn(ivf, emb, qf, k = 5,
      shortlist = 40, nprobe = 4).collect()
    val qLabel = emb.filter(qf).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    hn.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length))
      rows.foreach(r =>
        assert(r.getAs[Int]("n_label") != qLabel(qid), "label leak"))
    }
  }

  test("s16 contract row: full-dial ANN-MMR oracle form claims true for every pinned query") {
    val rows = graft.operators.TrainingData.s16MmrAnn(spark, sf("sf0.001"))
      .collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getAs[Boolean]("full_dial_matches_brute"),
      s"qid ${r.getAs[Long]("qid")} diverged from brute MMR"))
  }

  test("every query-broadcasting entry point refuses loudly past the configured cap") {
    // r7/r8 verdict #4: a query side past the broadcast budget must fail
    // with the chunking advice, not a generic 8 GB broadcast error. Cap
    // dropped to 3 while the pinned filter selects 5 — every entry point
    // must detonate with the conf name in the failure chain.
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val pq = Similarity.buildPqIndex(emb)
    val attempts: Seq[(String, () => Unit)] = Seq(
      "cosinePairs" -> (() => Similarity.cosinePairs(emb, qf).collect()),
      "bruteForceTopK" -> (() => Similarity.bruteForceTopK(emb, qf, 5).collect()),
      "hardNegatives" -> (() => Similarity.hardNegatives(emb, qf, 5).collect()),
      "mmrDiverseTopK" -> (() => Similarity.mmrDiverseTopK(emb, qf).collect()),
      "srpBucketTopK" -> (() => Similarity.srpBucketTopK(emb, qf, 5).collect()),
      "semanticDecontam" -> (() =>
        Similarity.semanticDecontam(emb, !qf, 0.9).collect()),
      "IvfIndex.topK" -> (() => ivf.topK(qf, 5).collect()),
      "mmrDiverseTopKAnn" -> (() =>
        Similarity.mmrDiverseTopKAnn(ivf, emb, qf).collect()),
      "hardNegativesAnn" -> (() =>
        Similarity.hardNegativesAnn(ivf, emb, qf, 5, 20).collect()),
      "pqProbe" -> (() => Similarity.pqProbe(pq, emb, qf, 5).collect()),
      "ivfPqTopK" -> (() =>
        Similarity.ivfPqTopK(ivf, pq, emb, qf, 5).collect()))
    spark.conf.set("graft.similarity.maxBroadcastQueries", "3")
    try attempts.foreach { case (name, run) =>
      val e = intercept[Exception](run())
      assert(chain(e).contains("maxBroadcastQueries"),
        s"$name failed without the loud refusal: ${chain(e)}")
    } finally spark.conf.unset("graft.similarity.maxBroadcastQueries")
    // and at the default cap the same calls pass — the guard is inert
    // on every in-contract query (the full sweep covers this; spot-check
    // the two new composed paths here)
    assert(Similarity.mmrDiverseTopKAnn(ivf, emb, qf).count() > 0)
    assert(Similarity.hardNegativesAnn(ivf, emb, qf, 5, 20).count() > 0)
    pq.release()
  }

  test("label propagation over ANN-built edges: full dial equals the exact-kNN graph, production agreement measured") {
    // the last documented-but-unwired seam (r8 verdict #6): Graph
    // .labelPropagation promises ANN edges at scale — compose the
    // composite IVF-PQ probe's (qid, nid) output into the edge list.
    val all = lit(true)
    val pq = Similarity.buildPqIndex(emb)
    val n = emb.count().toInt
    val seeds = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("id"), col("label"))
    def propagate(edges: org.apache.spark.sql.DataFrame) =
      graft.operators.Graph.labelPropagation(edges, seeds, iters = 3)
        .select("id", "label").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) Int.MinValue
          else r.getInt(1))).toMap
    val exactEdges = Similarity.bruteForceTopK(emb, all, k = 5)
      .select(col("qid").as("src"), col("nid").as("dst"))
    val fullDialEdges = Similarity.ivfPqTopK(ivf, pq, emb, all, topK = 5,
      nprobe = 16, rerank = n).select(col("qid").as("src"), col("nid").as("dst"))
    val wantLabels = propagate(exactEdges)
    // full dial: the probe IS exact, so the edge list — and therefore
    // every propagated label — must match the brute graph exactly
    assert(fullDialEdges.orderBy("src", "dst").collect().toSeq ==
      exactEdges.orderBy("src", "dst").collect().toSeq)
    assert(propagate(fullDialEdges) == wantLabels)
    // production dial: approximate edges; label agreement is MEASURED
    val prodEdges = Similarity.ivfPqTopK(ivf, pq, emb, all, topK = 5,
      nprobe = 4, rerank = 50).select(col("qid").as("src"), col("nid").as("dst"))
    val got = propagate(prodEdges)
    val agree = wantLabels.count { case (id, l) => got.get(id).contains(l) }
    val rate = agree.toDouble / wantLabels.size
    info(f"ANN-edge label agreement vs exact-kNN graph: $rate%.3f ($agree/${wantLabels.size})")
    assert(rate >= 0.5 && rate <= 1.0)
    pq.release()
  }
}
