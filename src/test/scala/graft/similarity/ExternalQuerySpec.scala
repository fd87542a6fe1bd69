package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** External-query retrieval (s23, round 11): every ANN/exact entry
  * point previously queried the corpus with ITSELF; these forms accept
  * a query frame that is not corpus rows — the deployed serving shape.
  * Pinned here: (1) with `excludeSelf = true` and corpus-member queries,
  * every external form is ROW-EQUAL to its filter-form twin (the
  * refactor cannot have changed the golden-pinned plans); (2) a
  * genuinely external vector retrieves hand-computed neighbours; (3) a
  * relabeled member retrieves its own source row at rank 1 / cos 1 —
  * self-exclusion is a semantic choice of the member form, not an
  * accident of the plan; (4) the broadcast guard prices external
  * batches identically. */
class ExternalQuerySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
  private lazy val member = emb.filter(col("vec_id") < 3)
    .select("vec_id", "embedding")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("qid", "rank").collect().map(_.toSeq).toSeq

  test("brute force: external form with excludeSelf equals the filter form") {
    val ext = Similarity.bruteForceTopKQueries(emb, member, k = 10,
      excludeSelf = true)
    val filt = Similarity.bruteForceTopK(emb, col("vec_id") < 3, k = 10)
    assert(rows(ext).nonEmpty && rows(ext) == rows(filt))
  }

  test("ivf topK: external form with excludeSelf equals the filter form") {
    val ivf = Similarity.buildIvfIndex(emb)
    try {
      val ext = ivf.topKQueries(member, k = 10, nprobe = 4,
        excludeSelf = true)
      val filt = ivf.topK(col("vec_id") < 3, k = 10, nprobe = 4)
      assert(rows(ext).nonEmpty && rows(ext) == rows(filt))
    } finally ivf.release()
  }

  test("ivfPq: external form with excludeSelf equals the filter form") {
    val ivf = Similarity.buildIvfIndex(emb)
    val pq = Similarity.buildPqIndex(emb)
    try {
      val ext = Similarity.ivfPqTopKQueries(ivf, pq, emb, member,
        topK = 10, nprobe = 4, rerank = 50, excludeSelf = true)
      val filt = Similarity.ivfPqTopK(ivf, pq, emb, col("vec_id") < 3,
        topK = 10, nprobe = 4, rerank = 50)
      assert(rows(ext).nonEmpty && rows(ext) == rows(filt))
    } finally { ivf.release(); pq.release() }
  }

  test("srp: external form with excludeSelf equals the filter form; relabeled member self-retrieves") {
    // round 12 (r11 verdict #5): the last member-only ANN family
    val ext = Similarity.srpBucketTopKQueries(emb, member, k = 10,
      excludeSelf = true)
    val filt = Similarity.srpBucketTopK(emb, col("vec_id") < 3, k = 10)
    assert(rows(ext).nonEmpty && rows(ext) == rows(filt))
    // a relabeled member hashes to ITS OWN bucket (the plane convention
    // is shared, not membership), so it must retrieve its source row
    val relabeled = member
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val got = Similarity.srpBucketTopKQueries(emb, relabeled, k = 3)
      .filter(col("rank") === 1).orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((10000L, 0L, 1.0), (10001L, 1L, 1.0),
      (10002L, 2L, 1.0)))
  }

  test("a relabeled member retrieves its source row at rank 1, cos 1") {
    val relabeled = member
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val got = Similarity.bruteForceTopKQueries(emb, relabeled, k = 3)
      .filter(col("rank") === 1).orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((10000L, 0L, 1.0), (10001L, 1L, 1.0),
      (10002L, 2L, 1.0)))
  }

  test("a genuinely external vector ranks hand-computed neighbours") {
    // 2-d corpus on the axes; query (3, 4) is nobody's row.
    // cos against (1,0)=0.6, (0,1)=0.8, (1,1)=7/(5*sqrt 2)=0.9899
    val corpus = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val q = Seq((99L, Array(3f, 4f))).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopKQueries(corpus, q, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1, 2L, 0.9899), (2, 1L, 0.8), (3, 0L, 0.6)))
    // and through an IVF index over the same corpus at the full dial
    val ivf = Similarity.buildIvfIndex(corpus, nlist = 2)
    try {
      val ann = ivf.topKQueries(q, k = 3, nprobe = 2).orderBy("rank")
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
      assert(ann.toSeq == got.toSeq)
    } finally ivf.release()
  }

  test("mmr ann: external form with excludeSelf equals the filter form; external query hand-checked") {
    val ivf = Similarity.buildIvfIndex(emb)
    try {
      val ext = Similarity.mmrDiverseTopKAnnQueries(ivf, emb, member,
        k = 5, excludeSelf = true)
      val filt = Similarity.mmrDiverseTopKAnn(ivf, emb, col("vec_id") < 3,
        k = 5)
      assert(rows(ext).nonEmpty && rows(ext) == rows(filt))
    } finally ivf.release()
    // hand fixture: axes corpus, query (3,4); rels 0.6 / 0.8 / 0.9899.
    // greedy: rank1 = v2 (best rel); rank2 scores at λ=0.5 are
    // v0: 0.3−0.5·cos(v0,v2)=−0.0536, v1: 0.4−0.3536=0.0464 → v1
    val corpus = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val q = Seq((99L, Array(3f, 4f))).toDF("vec_id", "embedding")
    val tiny = Similarity.buildIvfIndex(corpus, nlist = 2)
    try {
      val got = Similarity.mmrDiverseTopKAnnQueries(tiny, corpus, q,
        k = 2, nprobe = 2).orderBy("rank").collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq == Seq((1, 2L, 0.9899), (2, 1L, 0.8)))
    } finally tiny.release()
  }

  test("chunkedByQueryFrame equals the direct external call and clears a lowered cap") {
    val qs = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val want = Similarity.bruteForceTopKQueries(emb, qs, k = 5)
      .collect().map(_.toSeq).toSet
    val nChunks = 4
    val got = Similarity.chunkedByQueryFrame(qs, nChunks)(c =>
      Similarity.bruteForceTopKQueries(emb, c, k = 5))
      .collect().map(_.toSeq).toSet
    assert(got == want)
    // cap = the biggest chunk the hash split actually produces: every
    // chunk fits while the unchunked 20-query batch does not (the
    // ChunkedQuerySpec sizing discipline)
    val maxChunk = qs
      .groupBy(pmod(xxhash64(col("vec_id")), lit(nChunks)).as("c"))
      .agg(count(lit(1)).as("n")).agg(max("n")).head().getLong(0)
    assert(maxChunk < 20L, "fixture sanity: the split must actually split")
    spark.conf.set("graft.similarity.maxBroadcastQueries", maxChunk.toString)
    try {
      intercept[Throwable] {
        Similarity.bruteForceTopKQueries(emb, qs, k = 5).collect()
      }
      val under = Similarity.chunkedByQueryFrame(qs, nChunks)(c =>
        Similarity.bruteForceTopKQueries(emb, c, k = 5))
        .collect().map(_.toSeq).toSet
      assert(under == want)
    } finally spark.conf.unset("graft.similarity.maxBroadcastQueries")
  }

  test("chunkedByQueryFrameAuto sizes the split off the cap and clears it by construction") {
    val qs = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val want = Similarity.bruteForceTopKQueries(emb, qs, k = 5)
      .collect().map(_.toSeq).toSet
    // under the cap: runs as one chunk, equals the direct call
    assert(Similarity.chunkedByQueryFrameAuto(qs)(c =>
      Similarity.bruteForceTopKQueries(emb, c, k = 5))
      .collect().map(_.toSeq).toSet == want)
    // over a tight cap: auto doubles past hash skew until every chunk
    // fits, and the union still equals the direct call — no hand-sized
    // nChunks anywhere
    spark.conf.set("graft.similarity.maxBroadcastQueries", "3")
    try {
      intercept[Throwable] {
        Similarity.bruteForceTopKQueries(emb, qs, k = 5).collect()
      }
      assert(Similarity.chunkedByQueryFrameAuto(qs)(c =>
        Similarity.bruteForceTopKQueries(emb, c, k = 5))
        .collect().map(_.toSeq).toSet == want)
    } finally spark.conf.unset("graft.similarity.maxBroadcastQueries")
  }

  test("the broadcast guard prices external batches too") {
    spark.conf.set("graft.similarity.maxBroadcastQueries", "2")
    try {
      val e = intercept[Exception] {
        Similarity.bruteForceTopKQueries(emb, member, k = 3).collect()
      }
      assert(e.getMessage.contains("maxBroadcastQueries"),
        s"expected the loud cap refusal, got: ${e.getMessage}")
    } finally spark.conf.unset("graft.similarity.maxBroadcastQueries")
  }
}
