package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet(sf("sf0.001") + "/embeddings.parquet")

  test("cosine: unit parallel=1, orthogonal=0, antiparallel=-1") {
    val df = Seq(
      (Array(1f, 0f), Array(2f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 3f), 0.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0))
      .toDF("a", "b", "expect")
    val got = df.select(Similarity.cosine($"a", $"b").as("c"), $"expect").collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("SRP at zero planes equals brute force exactly (the s03a dial)") {
    val bf = Similarity.bruteForceTopK(emb, col("vec_id") < 5, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    val full = Similarity.srpBucketTopK(emb, col("vec_id") < 5, k = 5,
      numPlanes = 0).orderBy("qid", "rank").collect().toSeq
    assert(full == bf)
  }

  test("PQ exact-rerank over the whole corpus equals brute force (the s07a dial)") {
    val bf = Similarity.bruteForceTopK(emb, col("vec_id") < 5, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    val rr = Similarity.pqTopK(emb, col("vec_id") < 5, topK = 5,
      rerank = Int.MaxValue).orderBy("qid", "rank").collect().toSeq
    assert(rr == bf)
  }

  test("PQ rerank with a small shortlist keeps the bruteForceTopK output shape") {
    val rr = Similarity.pqTopK(emb, col("vec_id") < 3, topK = 3, rerank = 10)
      .collect()
    assert(rr.length == 9)
    rr.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 3))
      assert(!rows.exists(_.getAs[Long]("nid") == qid))
      val cs = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("semantic dedup manifest: one row per vector, keepers are cluster minima, pairs co-clustered") {
    val m = graft.operators.TrainingData.d15SemanticDedup(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(m.size == emb.count()) // every vector appears exactly once
    m.foreach { case (id, (keeper, isK)) =>
      assert(keeper <= id) // keeper is the cluster minimum
      assert(isK == (keeper == id))
      assert(m(keeper)._1 == keeper) // the keeper keeps itself
    }
    // every near-duplicate pair resolved into one cluster (0.45 = the
    // operator's own bar; assert the evidence is non-vacuous first)
    val pairs = Similarity.cosineNearDuplicates(emb, threshold = 0.45)
      .select("d1", "d2").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(m(r.getLong(0))._1 == m(r.getLong(1))._1)
    }
  }

  test("brute-force top-k: k rows per query, descending, self excluded") {
    val top = Similarity.bruteForceTopK(emb, col("vec_id") < 3, k = 5).collect()
    assert(top.length == 15)
    top.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5))
      assert(!rows.exists(_.getAs[Long]("nid") == qid))
      val cs = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("SRP ANN returns a correctly-ranked subset of the brute-force scores") {
    val bf = Similarity.bruteForceTopK(emb, col("vec_id") < 5, k = 500)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) ->
        r.getAs[Double]("cos")).toMap
    val ann = Similarity.srpBucketTopK(emb, col("vec_id") < 5, k = 5).collect()
    ann.foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      assert(bf.contains(key))
      assert(math.abs(bf(key) - r.getAs[Double]("cos")) < 1e-9,
        s"ANN cosine must equal brute-force cosine for $key")
    }
    // every returned neighbour shares the query's bucket by construction;
    // ranks within a query must be 1..n without gaps
    ann.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length))
    }
  }

  test("matryoshka overlap: full sub-dimension agrees exactly; truncation bounded by k") {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    // subDim = dim is the identity truncation — overlap must be k for
    // every query (both rankings are the same frame)
    val ident = Similarity.matryoshkaOverlap(emb, col("vec_id") < 5,
      k = 10, subDim = dim).collect()
    assert(ident.length == 5)
    ident.foreach { r =>
      assert(r.getAs[Long]("n_overlap") == 10L)
      assert(r.getAs[Double]("overlap_ratio") == 1.0)
    }
    // a real truncation: one row per query, overlap within [0, k]
    val cut = Similarity.matryoshkaOverlap(emb, col("vec_id") < 5,
      k = 10, subDim = 16).collect()
    assert(cut.map(_.getAs[Long]("qid")).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    cut.foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 0L && n <= 10L)
      assert(r.getAs[Double]("overlap_ratio") == n / 10.0)
    }
  }

  test("anisotropy: |S|²−n identity equals the brute-force pairwise mean; zero vectors excluded") {
    // label 0: unit vectors (1,0), (0,1), (1,0) → pair cosines 0, 1, 0
    // → mean 1/3; a zero vector must not poison the statistic.
    // label 1: two antiparallel vectors → mean −1. label 2: singleton,
    // dropped (no pairs).
    val df = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0f, 1f), 0),
      (2L, Array(1f, 0f), 0), (3L, Array(0f, 0f), 0),
      (4L, Array(2f, 0f), 1), (5L, Array(-3f, 0f), 1),
      (6L, Array(1f, 1f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.anisotropyProfile(df).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mean_norm"),
          r.getAs[Double]("mean_pair_cos")))).toMap
    assert(out.keySet == Set(0, 1))
    assert(out(0) == ((3L, 1.0, 0.3333)))
    assert(out(1) == ((2L, 2.5, -1.0)))
  }

  test("hard negatives: labels always differ, ranks dense, scores descending") {
    val labels = emb.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Similarity.hardNegatives(emb, col("vec_id") < 5, k = 5).collect()
    assert(out.length == 25)
    out.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5))
      rows.foreach { r =>
        assert(r.getAs[Int]("n_label") != labels(qid),
          s"negative shares query $qid's label")
        assert(labels(r.getAs[Long]("nid")) == r.getAs[Int]("n_label"))
      }
      val cos = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF addBatch: batch lands on its nearest existing centroid; probe covers the union") {
    val idx = Similarity.buildIvfIndex(emb.filter(col("vec_id") < 400))
    val idx2 = idx.addBatch(emb.filter(col("vec_id") >= 400))
    assert(idx2.assigned.count() == emb.count())
    // every batch row's cell re-derived driver-side with the operator's
    // exact arithmetic (three index-order double dots)
    val cents = idx2.centroids.collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    def dot2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    idx2.assigned.filter(col("vec_id") >= 400).collect().foreach { r =>
      val v = r.getSeq[Float](1)
      val best = cents.toSeq.map { case (c, cent) =>
        (dot2(v, v) + dot2(cent, cent) - 2.0 * dot2(v, cent), c)
      }.min._2
      assert(r.getAs[Int]("cell") == best, s"vec ${r.getLong(0)}")
    }
    // the updated index at full probe equals brute force over the union —
    // new vectors are immediately retrievable
    val bf = Similarity.bruteForceTopK(emb, col("vec_id") < 5, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(idx2.topK(col("vec_id") < 5, 5, nprobe = 16)
      .orderBy("qid", "rank").collect().toSeq == bf)
    idx2.release(); idx.release()
  }

  test("IVF-PQ composite: full dial equals brute force; production dial well-formed") {
    val ivf = Similarity.buildIvfIndex(emb)
    val pq = Similarity.buildPqIndex(emb)
    val bf = Similarity.bruteForceTopK(emb, col("vec_id") < 5, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    val full = Similarity.ivfPqTopK(ivf, pq, emb, col("vec_id") < 5,
      topK = 5, nprobe = 16, rerank = Int.MaxValue)
      .orderBy("qid", "rank").collect().toSeq
    assert(full == bf)
    val prod = Similarity.ivfPqTopK(ivf, pq, emb, col("vec_id") < 5, topK = 5)
      .collect()
    prod.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length))
      rows.foreach(r => assert(r.getAs[Long]("nid") != qid))
      // rerank scores are TRUE cosines, so every returned row must also
      // appear in the full-corpus exact ranking at equal-or-later rank
      val cos = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    ivf.release(); pq.release()
  }

  test("knn label agreement is 1.0 on perfectly separated clusters") {
    val sep = Seq(
      (0L, Array(1f, 0.00f), 0), (1L, Array(1f, 0.01f), 0),
      (2L, Array(1f, 0.02f), 0),
      (3L, Array(0.00f, 1f), 1), (4L, Array(0.01f, 1f), 1),
      (5L, Array(0.02f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelAgreement(sep, col("vec_id") < 6, k = 2)
      .collect().map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_queries"), r.getAs[Double]("agree_rate"))).toMap
    assert(out(0) == ((3L, 1.0)))
    assert(out(1) == ((3L, 1.0)))
  }

  test("knn label agreement detects a mislabeled point") {
    // vec 2 sits in cluster A's direction but carries label 1: its own
    // neighbours are label-0 (0 hits), and it pollutes every other
    // query's neighbour list with a wrong label
    val sep = Seq(
      (0L, Array(1f, 0.0f), 0), (1L, Array(1f, 0.1f), 0),
      (2L, Array(1f, 0.2f), 1),
      (3L, Array(0.0f, 1f), 1), (4L, Array(0.1f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelAgreement(sep, col("vec_id") < 5, k = 2)
      .collect().map(r => r.getAs[Int]("label") ->
        r.getAs[Double]("agree_rate")).toMap
    // label-0 queries 0,1: each sees {the other label-0, vec 2} → 1 of 2
    assert(out(0) == 0.5)
    // label-1: vec 2's neighbours are 1,0 (0 hits); 3 and 4 each see
    // {the other true label-1, vec 2} (2 hits) → (0+2+2)/6 ≈ 0.6667
    assert(out(1) == 0.6667)
  }

  test("centroid distance profile: tight clusters score ~1, a planted outlier drags min_cos") {
    val sep = Seq(
      (0L, Array(1f, 0.00f), 0), (1L, Array(1f, 0.01f), 0),
      (2L, Array(1f, 0.02f), 0),
      (3L, Array(0.00f, 1f), 1), (4L, Array(0.01f, 1f), 1),
      (5L, Array(1f, 0.02f), 1)) // outlier: points at cluster 0's direction
      .toDF("vec_id", "embedding", "label")
    // 0.7 gate: the outlier drags label 1's centroid toward cluster 0, so
    // the CLEAN members' cosines also sag (to ~0.89) — the gate must sit
    // below them but above the outlier's ~0.47
    val out = Similarity.centroidDistanceProfile(sep, lowCos = 0.7)
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    // label 0 is tight: every member hugs its centroid
    assert(out(0).getAs[Long]("n_vecs") == 3)
    assert(out(0).getAs[Double]("min_cos") > 0.99)
    assert(out(0).getAs[Long]("n_low") == 0)
    // label 1 contains the planted outlier: its min collapses and exactly
    // one member falls below the gate; the clean members keep the mean up
    assert(out(1).getAs[Double]("min_cos") < 0.8)
    assert(out(1).getAs[Long]("n_low") == 1)
    assert(out(1).getAs[Double]("mean_cos") > out(1).getAs[Double]("min_cos"))
  }

  test("IVF with full probe equals brute force exactly") {
    val bf = Similarity.bruteForceTopK(emb, col("vec_id") < 5, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    val full = Similarity.ivfTopK(emb, col("vec_id") < 5, k = 5,
      nlist = 8, nprobe = 8)
      .orderBy("qid", "rank").collect().toSeq
    assert(full == bf)
  }

  test("IVF with partial probe returns correctly-scored ranked candidates") {
    val bfAll = Similarity.cosinePairs(emb, col("vec_id") < 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) ->
        r.getAs[Double]("cos")).toMap
    val ivf = Similarity.ivfTopK(emb, col("vec_id") < 5, k = 5,
      nlist = 8, nprobe = 2).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      assert(math.abs(bfAll(key) - r.getAs[Double]("cos")) < 1e-4)
    }
    ivf.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length))
    }
  }

  test("near-duplicate pairs are symmetric-free and above threshold") {
    val nd = Similarity.cosineNearDuplicates(emb, threshold = 0.4).collect()
    assert(nd.forall(r => r.getAs[Long]("d1") < r.getAs[Long]("d2")))
    assert(nd.forall(_.getAs[Double]("cos") >= 0.4))
  }

  test("SRP-gated near-duplicates equal the exact all-pairs result") {
    def asSet(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
        r.getAs[Double]("cos"))).toSet
    val gated = asSet(Similarity.cosineNearDuplicates(emb, threshold = 0.4).collect())
    val exact = asSet(Similarity.cosineNearDuplicatesExact(emb, threshold = 0.4).collect())
    assert(exact.nonEmpty)
    assert(gated == exact,
      s"missed=${(exact -- gated).size} spurious=${(gated -- exact).size}")
  }

  test("PQ on a lossless fixture: ADC scores equal true dot products exactly") {
    // every subvector is one of 4 well-separated patterns, and k = 4, so
    // KMeans recovers the patterns exactly and encoding loses NOTHING —
    // ADC must then equal the true dot product, rank for rank
    val patterns = Array(Array(3f, 0f), Array(0f, 3f), Array(-3f, 0f), Array(0f, -3f))
    val vecs = (0 until 40).map { i =>
      (i.toLong, (0 until 4).flatMap(s => patterns((i + s * 7) % 4)).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(df, col("vec_id") < 3, topK = 5, m = 4, k = 4)
      .collect()
    assert(got.length == 15)
    val byId = vecs.toMap
    got.foreach { r =>
      val (qid, nid) = (r.getLong(0), r.getLong(2))
      val trueDot = byId(qid).zip(byId(nid))
        .map { case (a, b) => a.toDouble * b.toDouble }.sum
      assert(r.getDouble(3) == trueDot,
        s"q$qid n$nid: adc=${r.getDouble(3)} true=$trueDot")
    }
    // ranking is by (approx_dot desc, vec_id) — verify it is sound
    got.groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("PQ at 100+ queries: exact on the lossless fixture, plan free of the per-query literal blowup") {
    val patterns = Array(Array(3f, 0f), Array(0f, 3f), Array(-3f, 0f), Array(0f, -3f))
    val vecs = (0 until 120).map { i =>
      (i.toLong, (0 until 4).flatMap(s => patterns((i + s * 7) % 4)).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val many = Similarity.pqTopK(df, col("vec_id") < 100, topK = 5, m = 4, k = 4)
    val got = many.collect()
    assert(got.length == 500)
    val byId = vecs.toMap
    got.foreach { r =>
      val trueDot = byId(r.getLong(0)).zip(byId(r.getLong(2)))
        .map { case (a, b) => a.toDouble * b.toDouble }.sum
      assert(r.getDouble(3) == trueDot)
    }
    // the ADC tables must travel as broadcast DATA, not as one literal
    // expression per query: the plan may not grow with the query count
    // (the old typedlit form embedded O(|queries|·m·k) doubles in the
    // expression tree and its generated code)
    val few = Similarity.pqTopK(df, col("vec_id") < 2, topK = 5, m = 4, k = 4)
    val lenMany = many.queryExecution.executedPlan.treeString.length
    val lenFew = few.queryExecution.executedPlan.treeString.length
    assert(lenMany < lenFew * 3,
      s"plan grows with query count: $lenFew chars for 2 queries, $lenMany for 100")
  }

  test("PQ on real embeddings: dense ranks, descending scores, self excluded") {
    val got = Similarity.pqTopK(emb, col("vec_id") < 3, topK = 5).collect()
    assert(got.length == 15)
    got.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 5))
      assert(!rows.exists(_.getLong(2) == qid))
    }
  }

  test("quantization profile: known codes, error bound, zero-vector safety") {
    val df = Seq(
      (0L, Array(1f, -0.5f, 0f)),
      (1L, Array(0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.quantizationProfile(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    // scale 1.0 -> q = (127, round(-63.5) = -64 away from zero, 0)
    assert(got(0L) == ((3, 1.0, 191L, 0.001312)))
    assert(got(1L) == ((3, 0.0, 0L, 0.0)))
    // real embeddings: per-element error can never exceed scale/254 + ulp,
    // so the MEAN error must respect the same bound
    val real = Similarity.quantizationProfile(emb).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val (scale, err) = (r.getDouble(2), r.getDouble(4))
      assert(err <= scale / 254 + 1e-9, s"vec ${r.getLong(0)}: err=$err scale=$scale")
    }
  }

  test("label centroids: one row per (label, dim), near the plain double mean") {
    val cents = Similarity.labelCentroids(emb).collect()
    val labels = emb.select("label").distinct().count()
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    assert(cents.length == labels * dim)
    // quantized-exact centroid stays within quantization error of the
    // straight double mean
    val plain = emb.select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos").agg(avg(col("col").cast("double")).as("m"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    cents.foreach { r =>
      val want = plain((r.getInt(0), r.getInt(1)))
      assert(math.abs(r.getDouble(3) - want) < 1e-3)
      assert(r.getLong(2) > 0)
    }
  }

  test("gated near-duplicate plan contains no nested-loop join") {
    val plan = Similarity.cosineNearDuplicates(emb, threshold = 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("mmrDiverseTopK: first pick is the relevance argmax; picks distinct; diversity bites") {
    val got = Similarity.mmrDiverseTopK(emb, col("vec_id") < 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    val top = Similarity.bruteForceTopK(emb, col("vec_id") < 3, 5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("nid")))
    val topByQ = top.groupBy(_._1)
    byQ.foreach { case (q, picks) =>
      val ids = picks.sortBy(_._2).map(_._3)
      assert(ids.distinct.length == 5, s"repeat pick for query $q")
      // rank 1 must be the plain relevance argmax (empty selected set)
      assert(ids.head == topByQ(q).minBy(_._2)._3)
      // every pick comes from the relevance shortlist universe
      val shortlist = Similarity.bruteForceTopK(emb, col("vec_id") === q, 20)
        .collect().map(_.getAs[Long]("nid")).toSet
      assert(ids.forall(shortlist.contains))
    }
    // the operator's reason to exist: for at least one query, the diverse
    // pick differs from the plain top-5
    val differs = byQ.exists { case (q, picks) =>
      picks.sortBy(_._2).map(_._3).toSeq !=
        topByQ(q).sortBy(_._2).map(_._3).toSeq
    }
    assert(differs, "MMR degenerated to plain top-k on this corpus")
  }

  test("semanticDecontam: struct-max argmax equals the brute-force window argmax") {
    import org.apache.spark.sql.expressions.Window
    val benchFilter = col("vec_id") % 17 === 0
    val got = Similarity.semanticDecontam(emb, benchFilter, threshold = 0.4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    // reference: all pairs + explicit (cos desc, nid asc) window pick
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    val ref = emb.filter(benchFilter)
      .select(col("vec_id").as("nid"), col("embedding").as("nv"))
      .crossJoin(emb.filter(!benchFilter)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")))
      .select(col("qid"), col("nid"),
        Similarity.cosine(col("qv"), col("nv")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect()
      .map(r => r.getAs[Long]("qid") ->
        ((r.getAs[Long]("nid"), math.rint(r.getAs[Double]("cos") * 1e4) / 1e4)))
      .toMap
    assert(got.keySet == ref.keySet, "qid coverage differs")
    // argmax id must match exactly; cosine to the same 4-dp contract
    got.foreach { case (q, (nid, cos, flagged)) =>
      assert(nid == ref(q)._1, s"qid $q picked nid $nid, reference ${ref(q)._1}")
      assert(math.abs(cos - ref(q)._2) <= 1e-4)
      assert(flagged == (cos >= 0.4))
    }
    val benchIds = emb.filter(benchFilter).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(got.values.forall(v => benchIds.contains(v._1)))
  }
}
