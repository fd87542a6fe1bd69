package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *   - [[cosine]] — double-precision cosine as a native higher-order-
  *     function expression (zip_with + aggregate), summed in index order so
  *     values are bit-reproducible across engines.
  *   - [[bruteForceTopK]] — exact top-k per query via broadcast of the
  *     query set + per-query row_number window: the baseline, linear in
  *     |corpus|×|queries|, and the correct choice whenever the query set is
  *     small relative to the corpus.
  *   - [[srpBucketTopK]] — signed-random-projection LSH: corpus and queries
  *     hash to sign-pattern buckets, candidates meet on an equi-join, so
  *     the scan cost per query drops from |corpus| to a bucket. The scale
  *     path when both sides are large; recall is probabilistic and is
  *     measured against brute force in SimilaritySpec.
  */
object Similarity {

  /** Double-precision cosine similarity between two float-array columns.
    * Built on the codegen'd [[graft.plans.FloatVectorDot]] expression;
    * accumulation order matches the equivalent zip_with/aggregate plan, so
    * values are bit-identical to the interpreted form (oracle-safe). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dot(a, b)

  /** Broadcast-regime guard for every s-family entry point that ships
    * its QUERY side to the executors as a broadcast relation (r7/r8
    * verdict #4): a `queryFilter` that selects more rows than
    * `graft.similarity.maxBroadcastQueries` (spark conf, default 1 M)
    * must refuse LOUDLY with the chunking advice — not die deep inside
    * the exchange on the 8 GB broadcast limit with a generic error.
    *
    * The guard is LAZY and rides the broadcast side itself: a 1-row
    * count subquery cross-joins onto the query frame and an
    * `assert_true` filter detonates on the FIRST query row the
    * broadcast build materializes — guaranteed to fire before the
    * oversized relation finishes collecting, with zero extra jobs at
    * call time (the stratifiedTopK lazy-guard discipline; an eager
    * `count()` here would charge every composed contract query an
    * extra scan). A violating frame always has rows, so the
    * empty-branch blind spot the sampling guard needed a sentinel for
    * cannot occur. */
  private def guardedQueries(q: DataFrame, what: String): DataFrame = {
    val cap = q.sparkSession.conf
      .get("graft.similarity.maxBroadcastQueries", "1000000").toLong
    val n = q.agg(count(lit(1)).as("__nq"))
    q.crossJoin(broadcast(n))
      .filter(assert_true(col("__nq") <= cap,
        concat(lit(s"$what broadcasts the query side, and queryFilter selects "),
          col("__nq"),
          lit(s" rows > graft.similarity.maxBroadcastQueries = $cap — " +
            "chunk the query batch (Similarity.chunkedByQuery runs " +
            "per-chunk and unions the results) or raise the conf if the " +
            "cluster's broadcast budget allows"))
      ).isNull)
      .drop("__nq")
  }

  /** The executor for the advice every [[guardedQueries]] refusal
    * prints (r10 verdict #3 — the cap told the user to "run per-chunk
    * and union" but made them build it): split the query set into
    * `nChunks` hash-disjoint chunks, run the wrapped entry point once
    * per chunk, union the results.
    *
    * Correct for any PER-QUERY-DECOMPOSABLE operator — one whose output
    * rows for query q depend only on q and the corpus, never on other
    * queries — which is every qid-keyed shortlist/top-k entry point
    * here ([[bruteForceTopK]], [[IvfIndex.topK]], [[pqProbe]],
    * [[ivfPqTopK]], …): the pmod(xxhash64) split is disjoint and
    * complete over the filtered query rows, so the union equals the
    * unchunked call row-for-row (up to row order). Tuners that
    * aggregate ACROSS queries (dialSweep, gridSweep) are NOT in scope:
    * their per-chunk curves would need a weighted merge, not a union.
    *
    * Scale shape: each chunk broadcasts ≤ |queries|/nChunks rows — size
    * nChunks so that fits the broadcast cap — and pays the operator's
    * corpus-side probe once, so total cost is O(nChunks) probe passes
    * with BOUNDED memory: exactly the time-for-memory trade a query
    * batch beyond the 8 GB broadcast budget has to make. The chunks run
    * sequentially in plan order; on a real cluster each is itself fully
    * parallel, so this bounds memory without idling executors. */
  def chunkedByQuery(queryFilter: Column, nChunks: Int,
      idCol: String = "vec_id")(run: Column => DataFrame): DataFrame = {
    require(nChunks >= 1, s"nChunks must be >= 1 (got $nChunks)")
    (0 until nChunks).map { i =>
      run(queryFilter &&
        pmod(xxhash64(col(idCol)), lit(nChunks)) === i)
    }.reduce(_.unionByName(_))
  }

  /** [[chunkedByQuery]] for an EXTERNAL query frame (s23): the same
    * hash-disjoint split and union, applied to the frame the
    * `…Queries` entry points take instead of a member filter — so a
    * query batch past the broadcast cap chunks identically whether it
    * lives in the corpus or arrived from an encoder. Same
    * per-query-decomposability contract and O(nChunks)-passes trade. */
  def chunkedByQueryFrame(queries: DataFrame, nChunks: Int,
      idCol: String = "vec_id")(run: DataFrame => DataFrame): DataFrame = {
    require(nChunks >= 1, s"nChunks must be >= 1 (got $nChunks)")
    (0 until nChunks).map { i =>
      run(queries.filter(
        pmod(xxhash64(col(idCol)), lit(nChunks)) === i))
    }.reduce(_.unionByName(_))
  }

  /** [[chunkedByQueryFrame]] with the chunk count DERIVED from the cap
    * (round 12 — the refusal told users to chunk but left the sizing
    * arithmetic to them): nChunks starts at ceil(n / cap) against the
    * SAME conf the guard reads (an optional `capOverride` tightens it,
    * e.g. to budget for per-query expansion like BM25's term explode),
    * then — because hash chunks are balanced only in expectation —
    * the ACTUAL split's biggest chunk is measured and nChunks doubles
    * until every chunk clears the cap, so the executor clears by
    * construction the exact cap whose refusal named it. Doubling may
    * legitimately pass n: at a tiny cap a singleton-chunk split is a
    * birthday problem needing MORE buckets than ids (round 13 — the
    * old `nChunks < n` stop refused batches it could have split), so
    * the search runs to a generous 64·n before declaring the ids
    * irreducible (duplicate ids pin the biggest chunk at their
    * multiplicity and can never clear a smaller cap — the refusal's
    * actual target). Sizing costs a few aggregate jobs over the
    * request-sized frame (never the corpus). A batch already under the
    * cap runs as ONE chunk — the direct call, no sizing jobs at all. */
  def chunkedByQueryFrameAuto(queries: DataFrame,
      idCol: String = "vec_id", capOverride: Option[Long] = None)(
      run: DataFrame => DataFrame): DataFrame = {
    val cap = capOverride.getOrElse(queries.sparkSession.conf
      .get("graft.similarity.maxBroadcastQueries", "1000000").toLong)
    require(cap >= 1, s"cap must be >= 1 (got $cap)")
    val n = queries.count()
    if (n <= cap) return chunkedByQueryFrame(queries, 1, idCol)(run)
    def maxChunk(nc: Long): Long = queries
      .groupBy(pmod(xxhash64(col(idCol)), lit(nc)).as("__c"))
      .agg(count(lit(1)).as("n")).agg(max("n")).head().getLong(0)
    // the search tracks nChunks as a LONG bounded by `limit` (round 14,
    // r13 ADVICE): at a tiny cap over a huge batch the doubling past an
    // Int could overflow negative and feed pmod a non-positive modulus;
    // the bound keeps the loop finite, the final count Int-safe for
    // chunkedByQueryFrame's 0-until loop, and the 64·n birthday budget
    // intact wherever it is the smaller term
    val limit = math.min(64L * n, Int.MaxValue.toLong / 2)
    var nChunks: Long = math.min((n + cap - 1) / cap, limit)
    var biggest = maxChunk(nChunks)
    while (biggest > cap && nChunks < limit) {
      nChunks = math.min(nChunks * 2, limit)
      biggest = maxChunk(nChunks)
    }
    require(biggest <= cap,
      s"cannot split $n query rows into chunks of <= $cap by hashing " +
        s"$idCol — are the ids distinct?")
    chunkedByQueryFrame(queries, nChunks.toInt, idCol)(run)
  }

  /** All (query, corpus) cosine pairs for a broadcast query subset. Norms
    * are computed once per ROW (not once per pair) before the join. */
  def cosinePairs(emb: DataFrame, queryFilter: Column): DataFrame =
    cosinePairsOver(emb, guardedQueries(emb.filter(queryFilter)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qn")),
      "cosinePairs"))

  /** The pair scan shared by the corpus-member and EXTERNAL query forms:
    * `q` is an already-guarded `(qid, qv, qn)` frame. */
  private def cosinePairsOver(emb: DataFrame, q: DataFrame): DataFrame =
    emb.select(col("vec_id").as("nid"), col("embedding").as("nv"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nn"))
      .join(broadcast(q))
      .select(col("qid"), col("nid"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"))

  /** An EXTERNAL query frame `(idCol, vecCol)` normalized to the guarded
    * broadcast shape every query path consumes — the serving-side twin
    * of the `emb.filter(queryFilter)` corpus-member convention. Shared
    * by [[bruteForceTopKQueries]] / [[ivfPqTopKQueries]] /
    * [[IvfIndex.topKQueries]], so the guard (and its chunked-execution
    * advice) applies to external batches identically. */
  private def externalQueries(queries: DataFrame, idCol: String,
      vecCol: String, what: String): DataFrame =
    guardedQueries(queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        sqrt(dot(col(vecCol), col(vecCol))).as("qn")), what)

  /** Semantic decontamination against a benchmark set: every non-benchmark
    * vector's single nearest benchmark vector by exact cosine, flagged at
    * `threshold` — the embedding-space twin of the n-gram decontamination
    * family (a training item can leak an eval item's CONTENT with zero
    * shared n-grams; cosine proximity is the detector).
    *
    * Scale shape mirrors [[cosinePairs]]: the benchmark side — bounded by
    * the eval suite, never the corpus — broadcasts with precomputed norms,
    * and the corpus streams through one codegen'd dot-product scan. The
    * per-query argmax is a struct-MAX aggregate (cos, then −nid so ties
    * break to the SMALLEST benchmark id), which partial-aggregates
    * map-side: the |corpus|×|bench| pair stream collapses to |corpus|
    * rows inside the scan stage and only those shuffle — an argmax WINDOW
    * here would shuffle every pair. When the benchmark outgrows
    * broadcast, the SRP gate ([[cosineNearDuplicates]]) bounds candidates
    * first — same exact-verify discipline. The flag tests the ROUNDED
    * cosine so the threshold boundary can't disagree across engines. */
  def semanticDecontam(emb: DataFrame, benchFilter: Column,
      threshold: Double): DataFrame = {
    val bench = guardedQueries(emb.filter(benchFilter)
      .select(col("vec_id").as("nid"), col("embedding").as("nv"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nn")),
      "semanticDecontam")
    val train = emb.filter(!benchFilter)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qn"))
    train.join(broadcast(bench))
      .select(col("qid"),
        struct(
          (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"),
          (-col("nid")).as("negnid")).as("cand"))
      .groupBy("qid").agg(max(col("cand")).as("b"))
      .select(col("qid"), (-col("b.negnid")).as("nearest_bench"),
        round(col("b.cos"), 4).as("max_cos"),
        (round(col("b.cos"), 4) >= threshold).as("flagged"))
  }

  /** MMR (maximal marginal relevance, Carbonell & Goldstein 1998) diverse
    * top-k: greedily pick the candidate maximizing
    * `λ·rel − (1−λ)·max-sim-to-selected` — the retrieval operator that
    * returns RELEVANT-AND-DIFFERENT results where plain top-k returns k
    * near-copies of the best hit (the difference between "5 views of the
    * duplicate cluster" and "5 distinct training examples").
    *
    * Scale shape: the corpus work is exactly [[bruteForceTopK]]'s one
    * scan (shortlist per query by unrounded cosine, self excluded,
    * deterministic (rel desc, nid) order); the O(k·shortlist²) greedy
    * then runs EXECUTOR-side, one `flatMapGroups` group per query with
    * ≤`shortlist` rows of state — queries distribute across the cluster,
    * nothing query-sized touches the driver (at production scale the
    * shortlist comes from the ANN index, s03/s04/s07, not brute force).
    * Selection compares unrounded doubles with ties to the smaller id,
    * and every cosine accumulates in index order ([[FloatVectorDot]]'s
    * convention), so the DuckDB recursive-CTE oracle replays the
    * identical greedy choice sequence. */
  def mmrDiverseTopK(emb: DataFrame, queryFilter: Column, k: Int = 5,
      shortlist: Int = 20, lambda: Double = 0.5): DataFrame = {
    val q = guardedQueries(emb.filter(queryFilter)
      .select(col("vec_id").as("qid"), col("embedding").as("qv")),
      "mmrDiverseTopK")
    val w = Window.partitionBy("qid").orderBy(desc("rel"), asc("nid"))
    val cand = emb.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      .join(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        cosine(col("qv"), col("nv")).as("rel"), col("nv"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= shortlist)
    mmrGreedy(cand, k, lambda)
  }

  /** MMR over an ANN-provided shortlist — the production-scale
    * composition the round-7 verdict flagged as documented-but-unwired:
    * the corpus scan that [[mmrDiverseTopK]] spends on brute-force
    * shortlisting is replaced by an [[IvfIndex]] probe (nprobe/nlist of
    * the corpus per query), and ONLY the ≤`shortlist`-row-per-query
    * result is re-hydrated with vectors for the executor-side greedy.
    * With every dial open (`nprobe = nlist`) the probe is exact by
    * construction, so this equals [[mmrDiverseTopK]] row for row — the
    * s03a/s04a dial discipline, asserted in AnnShortlistSpec and
    * oracle-checked as the `s16_mmr_ann` contract row
    * ([[graft.operators.TrainingData.s16MmrAnn]]); at the production
    * dial the shortlist is approximate and the greedy re-ranks whatever
    * the index surfaces (timed as the bench `s16r_mmr_ann` entry).
    *
    * Relevance is RECOMPUTED unrounded from the stored vectors (the
    * probe's 4-dp rounded score would perturb greedy tie-breaks), via
    * two broadcast joins of the tiny shortlist — never a corpus
    * shuffle. */
  def mmrDiverseTopKAnn(idx: IvfIndex, emb: DataFrame, queryFilter: Column,
      k: Int = 5, shortlist: Int = 20, lambda: Double = 0.5,
      nprobe: Int = 4): DataFrame = {
    val sl = idx.topK(queryFilter, shortlist, nprobe).select("qid", "nid")
    val q = guardedQueries(emb.filter(queryFilter)
      .select(col("vec_id").as("qid"), col("embedding").as("qv")),
      "mmrDiverseTopKAnn")
    val cand = emb.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      .join(broadcast(sl), "nid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("nid"),
        cosine(col("qv"), col("nv")).as("rel"), col("nv"))
    mmrGreedy(cand, k, lambda)
  }

  /** [[mmrDiverseTopKAnn]] for an EXTERNAL query batch (s23) — diverse
    * SERVING: relevant-and-different results for requests that are not
    * corpus rows, the retrieval pattern a RAG deployment runs right
    * after plain top-k. The shortlist comes from
    * [[IvfIndex.topKQueries]], relevance recomputes unrounded against
    * the external vector, and the executor-side greedy is the shared
    * [[mmrGreedy]] — the external path cannot drift from the
    * oracle-checked member form because everything after the query
    * frame is the same code. */
  def mmrDiverseTopKAnnQueries(idx: IvfIndex, emb: DataFrame,
      queries: DataFrame, k: Int = 5, shortlist: Int = 20,
      lambda: Double = 0.5, nprobe: Int = 4, excludeSelf: Boolean = false,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sl = idx.topKQueries(queries, shortlist, nprobe, excludeSelf,
      idCol, vecCol).select("qid", "nid")
    val q = guardedQueries(queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv")),
      "mmrDiverseTopKAnnQueries")
    val cand = emb.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      .join(broadcast(sl), "nid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("nid"),
        cosine(col("qv"), col("nv")).as("rel"), col("nv"))
    mmrGreedy(cand, k, lambda)
  }

  /** The executor-side MMR greedy over a prepared candidate frame
    * `(qid, nid, rel, nv)` — shared verbatim by the brute-force and
    * ANN-shortlist front ends so the two paths cannot drift. */
  private def mmrGreedy(cand: DataFrame, k: Int,
      lambda: Double): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    def dotD(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0; val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def cosD(a: Array[Float], b: Array[Float]): Double =
      dotD(a, b) / (math.sqrt(dotD(a, a)) * math.sqrt(dotD(b, b)))
    // the O(k·shortlist²) greedy runs EXECUTOR-side, one group per query
    // via flatMapGroups: per-group state is the ≤`shortlist`-row slice,
    // so a 10 M-row queryFilter distributes across the cluster instead of
    // materializing on the driver (the r6 audit's silent-OOM hole). The
    // selection rule is order-independent (strictly-greater-or-smaller-id
    // wins), so the group iterator's arrival order cannot change a pick.
    cand.select("qid", "nid", "rel", "nv")
      .as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double, Array[Float])]) =>
        var selected = Vector.empty[(Long, Array[Float])]
        val remaining =
          scala.collection.mutable.ArrayBuffer.from(it.map(c => (c._2, c._3, c._4)))
        val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Double)]()
        while (selected.size < k && remaining.nonEmpty) {
          val best = remaining.map { case (nid, rel, v) =>
            val maxSim =
              if (selected.isEmpty) 0.0
              else selected.map(s => cosD(v, s._2)).max
            (nid, rel, v, lambda * rel - (1 - lambda) * maxSim)
          }.reduceLeft((a, b) =>
            if (b._4 > a._4 || (b._4 == a._4 && b._1 < a._1)) b else a)
          out += ((qid, selected.size + 1, best._1, best._2))
          selected = selected :+ ((best._1, best._3))
          remaining.filterInPlace(_._1 != best._1)
        }
        out.iterator
      }
      .toDF("qid", "rank", "vec_id", "rel0")
      .select(col("qid"), col("rank"), col("vec_id"),
        round(col("rel0"), 4).as("rel"))
      .orderBy("qid", "rank")
  }

  /** Hard-negative mining for contrastive training: each query's top-`k`
    * most-similar items carrying a DIFFERENT label — the near-miss
    * examples a metric-learning objective needs (easy negatives are
    * already far away and contribute no gradient; random sampling finds
    * almost none of these). Same broadcast-queries × corpus scan as
    * [[bruteForceTopK]] with the label inequality applied INSIDE the
    * scan (before any shuffle), so mined negatives cost exactly one
    * corpus pass per query batch; at 100 TB the query side is the
    * sampled training batch, refreshed per epoch. */
  def hardNegatives(emb: DataFrame, queryFilter: Column, k: Int): DataFrame = {
    val q = guardedQueries(emb.filter(queryFilter)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qn"),
        col("label").as("q_label")),
      "hardNegatives")
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    emb.select(col("vec_id").as("nid"), col("embedding").as("nv"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nn"),
        col("label").as("n_label"))
      .join(broadcast(q))
      .filter(col("n_label") =!= col("q_label"))
      .select(col("qid"), col("nid"), col("n_label"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"),
        col("n_label"), round(col("cos"), 4).as("cos"))
      .orderBy("qid", "rank")
  }

  /** Hard-negative mining over an ANN-provided shortlist — the
    * [[mmrDiverseTopKAnn]] composition applied to [[hardNegatives]]:
    * the index probe surfaces each query's `shortlist` nearest
    * neighbours (any label), the label-inequality filter and final
    * top-`k` run on that tiny frame, and cosines are recomputed
    * unrounded from the stored vectors so ranking ties break exactly as
    * the brute path's. With `nprobe = nlist` and `shortlist` ≥ corpus
    * the probe is exact and this EQUALS [[hardNegatives]] row for row
    * (asserted in SimilaritySpec); at production dials, size
    * `shortlist` several × `k` — a query whose near neighbourhood is
    * dominated by its own label otherwise yields fewer than `k`
    * negatives (the standard ANN-mining oversampling rule). */
  def hardNegativesAnn(idx: IvfIndex, emb: DataFrame, queryFilter: Column,
      k: Int, shortlist: Int, nprobe: Int = 4): DataFrame = {
    val sl = idx.topK(queryFilter, shortlist, nprobe).select("qid", "nid")
    val q = guardedQueries(emb.filter(queryFilter)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        sqrt(dot(col("embedding"), col("embedding"))).as("qn"),
        col("label").as("q_label")),
      "hardNegativesAnn")
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    emb.select(col("vec_id").as("nid"), col("embedding").as("nv"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nn"),
        col("label").as("n_label"))
      .join(broadcast(sl), "nid")
      .join(broadcast(q), "qid")
      .filter(col("n_label") =!= col("q_label"))
      .select(col("qid"), col("nid"), col("n_label"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"),
        col("n_label"), round(col("cos"), 4).as("cos"))
      .orderBy("qid", "rank")
  }

  /** Exact top-k nearest neighbours (excluding self) for each query. */
  def bruteForceTopK(emb: DataFrame, queryFilter: Column, k: Int): DataFrame =
    rankPairs(cosinePairs(emb, queryFilter), k, excludeSelf = true)

  /** [[bruteForceTopK]] for an EXTERNAL query batch — query vectors that
    * are NOT corpus rows (the actual serving shape: a RAG system's query
    * embeddings arrive from an encoder, not from the indexed corpus).
    * `queries` carries `(idCol, vecCol)` in its own id space; nothing
    * couples a qid to corpus membership, so there is no self row to
    * exclude by default (`excludeSelf = true` restores the corpus-member
    * semantics when the caller's id spaces deliberately coincide —
    * ExternalQuerySpec pins that setting row-equal to the filter form).
    * Same scale shape as the filter form: queries broadcast through the
    * shared guard, the corpus streams through one codegen'd dot scan. */
  def bruteForceTopKQueries(emb: DataFrame, queries: DataFrame, k: Int,
      excludeSelf: Boolean = false, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    rankPairs(cosinePairsOver(emb,
      externalQueries(queries, idCol, vecCol, "bruteForceTopKQueries")),
      k, excludeSelf)

  /** The shared (cos DESC, nid ASC) per-query ranking over a pair frame. */
  private def rankPairs(pairs: DataFrame, k: Int,
      excludeSelf: Boolean): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    (if (excludeSelf) pairs.filter(col("qid") =!= col("nid")) else pairs)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 4).as("cos"))
  }

  /** Matryoshka truncation eval: for each query, exact top-`k` by
    * full-dimension cosine vs top-`k` by the first-`subDim` coordinates
    * only, reported as overlap@k — the measurement behind
    * Matryoshka-style dimension reduction (Kusupati et al., NeurIPS
    * 2022): how much retrieval quality survives storing/searching a
    * prefix of the vector. A high overlap licenses running ANN (and its
    * memory) at `subDim` with a full-dim rerank; a low one says the
    * embedding model doesn't front-load information and truncation must
    * be trained, not sliced.
    *
    * Cost is two [[bruteForceTopK]] passes (broadcast queries × corpus,
    * no corpus shuffle) whose q·k outputs join driver-free; at 100 TB
    * the eval runs over a sampled query set exactly like
    * [[knnLabelAgreement]]. The truncated pass slices the stored vector
    * in the scan projection — no second copy of the corpus. */
  def matryoshkaOverlap(emb: DataFrame, queryFilter: Column, k: Int,
      subDim: Int): DataFrame = {
    val full = bruteForceTopK(emb, queryFilter, k).select("qid", "nid")
    val trunc = bruteForceTopK(
        emb.withColumn("embedding", slice(col("embedding"), 1, subDim)),
        queryFilter, k)
      .select(col("qid"), col("nid"), lit(1L).as("hit"))
    full.join(trunc, Seq("qid", "nid"), "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      .select(col("qid"), lit(k).cast("int").as("k"), col("n_overlap"),
        round(col("n_overlap").cast("double") / k, 4).as("overlap_ratio"))
      .orderBy("qid")
  }

  /** Embedding-space anisotropy profile (Ethayarajh, EMNLP 2019): per
    * label, the MEAN PAIRWISE COSINE across all vector pairs — without
    * enumerating pairs. With unit-normalized vectors x̂ and their sum
    * S = Σ x̂, the identity `Σ_{i≠j} cos(i,j) = |S|² − n` turns the
    * O(n²) statistic into one O(n·d) pass: explode unit components to
    * (label, dim) scalars, sum per dim, square and re-sum. High
    * anisotropy (vectors crowd a narrow cone) means raw cosine has
    * little dynamic range — thresholds like d05/d15/d18's must be
    * calibrated against this baseline, and centering is worth it;
    * near-zero means the space is isotropic and cosine behaves.
    *
    * Component sums are DECIMAL — exact and order-invariant, so the
    * statistic is bit-stable across partitionings and engines (the dsum
    * discipline); the quadratic combine happens on the d-row frame.
    * Shuffle volume is (labels × dims) scalars, never vectors. */
  def anisotropyProfile(emb: DataFrame): DataFrame = {
    val unit = emb.select(col("label"),
      sqrt(dot(col("embedding"), col("embedding"))).as("norm"),
      col("embedding"))
      .filter(col("norm") > 0) // a zero vector has no direction to count
    val comps = unit
      .select(col("label"), col("norm"),
        posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("label"), col("d"),
        (col("x").cast("double") / col("norm")).cast("decimal(38,18)").as("u"),
        // carry the per-row norm once per component; dividing by dims
        // later recovers the per-vector mean without a second aggregate
        col("norm").cast("decimal(38,18)").as("nrm"))
    comps.groupBy("label", "d")
      .agg(sum(col("u")).as("s"), count(lit(1)).as("n"),
        sum(col("nrm")).as("nrm_sum"))
      .groupBy("label")
      .agg(max(col("n")).as("n"),
        // S_d² re-enters DECIMAL before the cross-dim sum so the d-row
        // combine is order-invariant too — the whole statistic is then
        // bit-stable across partitionings and engines
        sum((col("s").cast("double") * col("s").cast("double"))
          .cast("decimal(38,12)")).cast("double").as("s2"),
        (sum(col("nrm_sum")).cast("double") /
          (max(col("n")) * count(lit(1)))).as("mean_norm0"),
        count(lit(1)).as("dims"))
      .filter(col("n") >= 2)
      .select(col("label"), col("n"), col("dims").cast("int").as("dims"),
        round(col("mean_norm0"), 4).as("mean_norm"),
        round((col("s2") - col("n")) / (col("n") * (col("n") - 1)), 4)
          .as("mean_pair_cos"))
      .orderBy("label")
  }

  /** Neighbor-label agreement — the standard intrinsic eval of an
    * embedding space (does cosine proximity predict the label?): for each
    * query vector, its exact top-`k` cosine neighbours (excluding self)
    * are fetched and the fraction sharing the query's label is aggregated
    * per label. High agreement ⇒ the space clusters by label and
    * label-centroid routing ([[labelCentroids]], IVF cells) is trustworthy;
    * a label with low agreement is where ANN recall will degrade first.
    *
    * Built on [[bruteForceTopK]] (same broadcast-queries × corpus scan —
    * one pass, no shuffle on the corpus side); the tiny q·k pair frame is
    * broadcast back against the label projection, so the corpus is never
    * shuffled. At 100 TB the eval runs over a sampled query set (the
    * `queryFilter`), which is how kNN-recall evals are run in practice. */
  def knnLabelAgreement(emb: DataFrame, queryFilter: Column, k: Int): DataFrame = {
    val nbrLabels = emb.select(col("vec_id").as("nid"), col("label").as("n_label"))
    val qryLabels = emb.select(col("vec_id").as("qid"), col("label").as("q_label"))
    val pairs = bruteForceTopK(emb, queryFilter, k).select("qid", "nid")
    // both label lookups broadcast the tiny q·k side, so the corpus-sized
    // label projection is scanned (twice, 2 columns) but never shuffled
    val withNbr = nbrLabels.join(broadcast(pairs), "nid")
    qryLabels.join(broadcast(withNbr), "qid")
      .groupBy(col("q_label").as("label"))
      .agg(countDistinct(col("qid")).as("n_queries"),
        sum(when(col("n_label") === col("q_label"), 1L).otherwise(0L))
          .as("n_hits"))
      .select(col("label"), col("n_queries"), col("n_hits"),
        round(col("n_hits").cast("double") / (col("n_queries") * k), 4)
          .as("agree_rate"))
      .orderBy("label")
  }

  /** Retrieval-quality evaluation — per-label Recall@k, MRR@k and nDCG@k
    * of exact cosine retrieval, with relevance = "neighbour shares the
    * query's label". The standard IR metric suite (Järvelin & Kekäläinen
    * 2002 for nDCG) run as an embedding-space eval: where
    * [[knnLabelAgreement]] reports raw precision@k, this adds the
    * rank-sensitive views a retrieval system is actually tuned on — MRR
    * rewards the first relevant hit being early, nDCG rewards the whole
    * ranking, recall normalizes by what was reachable (`min(k, |label|−1)`
    * relevant items exist for a query).
    *
    * Cross-engine determinism: per-rank DCG gains `1/log2(rank+1)` are a
    * FIXED table for rank ≤ k, so they are inlined as integer micro-unit
    * literals (×10⁶, half-up) in both engines rather than recomputed —
    * a 1-ulp `log2` disagreement between libm and the JVM could otherwise
    * flip a rounded value. Per-query metrics become exact integer
    * micro-units, per-label means are integer sums divided once at the
    * end — order-invariant, so the aggregate hash-matches the oracle
    * regardless of row order (the A7 avg-of-avgs discipline).
    *
    * Scale shape = [[knnLabelAgreement]]: one [[bruteForceTopK]] pass
    * (broadcast queries × corpus scan, corpus never shuffles), the q·k
    * judged frame broadcast back against the label projection, and a
    * label-cardinality broadcast for the recall/IDCG denominators. At
    * 100 TB the eval runs over a sampled query set via `queryFilter`.
    * Queries whose label has no OTHER member (no relevant item exists)
    * are excluded — the TREC convention — keeping every emitted number
    * well-defined on any regenerated corpus. */
  /** The pinned rank-1..10 DCG gains the s17 oracle inlines as literals
    * — [[dcgGains]] must reproduce them exactly (spec-asserted), so the
    * generated table and the cross-engine contract cannot drift. */
  private[similarity] val pinnedGains = Seq(1000000L, 630930L, 500000L,
    430677L, 386853L, 356207L, 333333L, 315465L, 301030L, 289065L)

  /** gain(r) = round(1e6 / log2(r+1)) for r in 1..k — the micro-unit DCG
    * gain table, GENERATED for any k (r9 verdict watch item: a
    * production eval at k=100 must not wait on a hand-extended list).
    * Determinism: the table is driver-side Scala arithmetic — identical
    * on every JVM (strictfp-irrelevant here: Math.log is quasi-exact and
    * the ×1e6 half-up round gives ulp-level slack of ~1e-10 against the
    * nearest .5 boundary) — and enters both engines as LITERALS, so the
    * cross-engine contract never recomputes a log. The first 10 values
    * are additionally pinned against the s17 oracle's inlined literals. */
  private[similarity] def dcgGains(k: Int): Seq[Long] =
    (1 to k).map(r =>
      math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))

  def retrievalEval(emb: DataFrame, queryFilter: Column, k: Int): DataFrame = {
    require(k >= 1, s"retrievalEval needs k >= 1 (got $k)")
    val gains = dcgGains(k)
    val cums = gains.scanLeft(0L)(_ + _).tail
    val gainAt = element_at(array(gains.take(k).map(lit): _*), col("rank"))
    val idcgAt = element_at(array(cums.take(k).map(lit): _*),
      col("rq").cast("int"))
    val nbrLabels = emb.select(col("vec_id").as("nid"), col("label").as("n_label"))
    val qryLabels = emb.select(col("vec_id").as("qid"), col("label").as("q_label"))
    val members = emb.groupBy(col("label").as("q_label"))
      .agg(count(lit(1)).as("n_members"))
    val pairs = bruteForceTopK(emb, queryFilter, k).select("qid", "rank", "nid")
    // both label lookups broadcast the tiny q·k side (knnLabelAgreement's
    // shape): the corpus label projection is scanned but never shuffled
    val withNbr = nbrLabels.join(broadcast(pairs), "nid")
    val judged = qryLabels.join(broadcast(withNbr), "qid")
      .withColumn("rel", col("n_label") === col("q_label"))
    val perQuery = judged.groupBy("qid", "q_label")
      .agg(
        sum(when(col("rel"), 1L).otherwise(0L)).as("hits"),
        min(when(col("rel"), col("rank"))).as("first_rel"),
        sum(when(col("rel"), gainAt).otherwise(0L)).as("dcg_u"))
      .join(broadcast(members), "q_label")
      .withColumn("rq", least(lit(k.toLong), col("n_members") - 1L))
      .filter(col("rq") >= 1L) // no relevant item can exist: TREC-exclude
      .select(col("q_label"),
        // exact integer micro-units: ratios of small integers divide
        // identically under IEEE in every engine, then round half-up
        round(lit(1e6) * col("hits") / col("rq"), 0).cast("long").as("recall_u"),
        coalesce(round(lit(1e6) / col("first_rel"), 0).cast("long"), lit(0L))
          .as("mrr_u"),
        round(lit(1e6) * col("dcg_u") / idcgAt, 0).cast("long").as("ndcg_u"))
    perQuery.groupBy(col("q_label").as("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum("recall_u").as("r_u"), sum("mrr_u").as("m_u"), sum("ndcg_u").as("n_u"))
      .select(col("label"), col("n_queries"),
        round(col("r_u") / (col("n_queries") * 1e6), 4).as("recall_at_k"),
        round(col("m_u") / (col("n_queries") * 1e6), 4).as("mrr_at_k"),
        round(col("n_u") / (col("n_queries") * 1e6), 4).as("ndcg_at_k"))
      .orderBy("label")
  }

  /** Deterministic ±1 hyperplanes (Rademacher signed random projection),
    * seeded so every run and every executor derives the same planes — the
    * SINGLE source of the plane convention, shared with
    * [[graft.plans.SrpBandBuckets]] so bucket assignments from the two
    * SRP paths can never silently diverge. */
  private[graft] def planes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f))
  }

  /** SRP bucket id: the sign pattern of `numPlanes` projections, packed
    * into an int. Same expression applied to both sides of the join.
    * Zero planes is the exact dial: every row lands in bucket 0, the
    * candidate equi-join degenerates to the brute-force broadcast scan,
    * and the whole SRP pipeline becomes hash-checkable against the
    * brute-force oracle (the s03a audit). */
  private def srpBucket(v: Column, ps: Seq[Array[Float]]): Column =
    ps.zipWithIndex.map { case (p, i) =>
      val proj = dot(v, array(p.map(lit).toIndexedSeq: _*))
      when(proj >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduceOption(_ + _).getOrElse(lit(0))

  /** Approximate top-k: candidates restricted to the query's SRP bucket.
    * `numPlanes` trades recall for bucket size (16 planes ≈ 64 K buckets). */
  def srpBucketTopK(emb: DataFrame, queryFilter: Column, k: Int,
      numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val ps = planes(numPlanes, dim)
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      srpBucket(col("embedding"), ps).as("bucket"))
    val q = guardedQueries(bucketed.filter(queryFilter)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("bucket")),
      "srpBucketTopK")
    srpTopKOver(bucketed, q, k, excludeSelf = true)
  }

  /** [[srpBucketTopK]] for an EXTERNAL query batch (round 12, r11
    * verdict #5 — the one ANN family still member-only after s23):
    * query vectors hash to their sign-pattern bucket with the SAME
    * seeded planes the corpus side uses, so an encoder-produced vector
    * lands in exactly the bucket its corpus twin would — membership was
    * never consulted on the query side, only the plane convention. Same
    * broadcast guard, same candidate equi-join; no self row exists
    * unless the caller's id spaces deliberately coincide. */
  def srpBucketTopKQueries(emb: DataFrame, queries: DataFrame, k: Int,
      numPlanes: Int = 8, dim: Int = 64, excludeSelf: Boolean = false,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ps = planes(numPlanes, dim)
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      srpBucket(col("embedding"), ps).as("bucket"))
    val q = guardedQueries(queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        srpBucket(col(vecCol), ps).as("bucket")),
      "srpBucketTopKQueries")
    srpTopKOver(bucketed, q, k, excludeSelf)
  }

  /** The bucket-join + rank shared by the corpus-member and external
    * SRP forms — one plan body, so the member form's golden-pinned plan
    * cannot drift from the serving twin (the s23 extracted-core
    * discipline). `q` is an already-guarded `(qid, qv, bucket)` frame. */
  private def srpTopKOver(bucketed: DataFrame, q: DataFrame, k: Int,
      excludeSelf: Boolean): DataFrame = {
    val cand0 = bucketed
      .select(col("vec_id").as("nid"), col("embedding").as("nv"), col("bucket"))
      .join(broadcast(q), "bucket")
    val cand = if (excludeSelf) cand0.filter(col("qid") =!= col("nid"))
      else cand0
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    cand
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 4).as("cos"))
  }

  /** A built IVF index: cell-assigned corpus + centroid table, reusable
    * across many top-k probes — the real usage pattern (indexes are built
    * once and queried for their lifetime; rebuilding per query would make
    * the build dominate). `assigned` is persisted by [[buildIvfIndex]];
    * call [[release]] when done with the index. */
  final case class IvfIndex private[similarity] (
      assigned: DataFrame, centroids: DataFrame) {

    /** The probe's cell routing, shared by [[topK]] and
      * [[probedNonSelfCount]] so the occupancy gate can never drift from
      * the probe it vouches for: each query's `nprobe` nearest cells by
      * euclidean distance (KMeans' metric), ||q−c||² = q·q + c·c − 2 q·c,
      * all via the codegen'd dot, ties to the smaller cell id. */
    private[similarity] def probedCells(queryFilter: Column, nprobe: Int): DataFrame =
      probedCellsOver(guardedQueries(assigned.filter(queryFilter)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          sqrt(dot(col("embedding"), col("embedding"))).as("qn")),
        "IvfIndex.topK"), nprobe)

    /** The routing over an already-guarded `(qid, qv, qn)` frame —
      * shared by the corpus-member and external-query probes. */
    private[similarity] def probedCellsOver(q: DataFrame, nprobe: Int): DataFrame = {
      val wCells = Window.partitionBy("qid").orderBy(asc("d2"), asc("cell"))
      q.crossJoin(broadcast(centroids))
        .withColumn("d2",
          dot(col("qv"), col("qv")) + dot(col("centroid"), col("centroid"))
            - lit(2.0) * dot(col("qv"), col("centroid")))
        .withColumn("cr", row_number().over(wCells))
        .filter(col("cr") <= nprobe)
        .select(col("qid"), col("qv"), col("qn"), col("cell"), col("cr"))
    }

    /** Per query, how many NON-query vectors its `nprobe` probed cells
      * hold — the occupancy certificate behind the s04 `prod_nonempty`
      * claim (ADVICE r8): [[topK]] self-excludes, so "the probe visits
      * ≥1 real cell" does NOT imply a non-empty result when the probed
      * cells contain only the query itself; a claim gated on this count
      * is deterministically true for ANY regenerated corpus. Routed by
      * the same [[probedCells]] the probe itself uses. */
    def probedNonSelfCount(queryFilter: Column, nprobe: Int = 4): DataFrame =
      assigned
        .select(col("vec_id").as("nid"), col("cell"))
        .join(broadcast(probedCells(queryFilter, nprobe).select("qid", "cell")),
          "cell")
        .filter(col("qid") =!= col("nid"))
        .groupBy("qid").agg(count(lit(1)).as("n_cand"))

    /** Approximate top-k for the filtered query rows, probing each
      * query's `nprobe` nearest cells. */
    def topK(queryFilter: Column, k: Int, nprobe: Int = 4): DataFrame =
      topKFromProbed(probedCells(queryFilter, nprobe), k,
        excludeSelf = true)

    /** [[topK]] for an EXTERNAL query batch `(idCol, vecCol)` — vectors
      * that are not index rows route to their `nprobe` nearest cells
      * exactly like members (the routing never consulted the assignment
      * on the query side); no self row exists, so nothing is excluded
      * unless the caller's id spaces deliberately coincide
      * (`excludeSelf = true`). */
    def topKQueries(queries: DataFrame, k: Int, nprobe: Int = 4,
        excludeSelf: Boolean = false, idCol: String = "vec_id",
        vecCol: String = "embedding"): DataFrame =
      topKFromProbed(probedCellsOver(
        externalQueries(queries, idCol, vecCol, "IvfIndex.topKQueries"),
        nprobe), k, excludeSelf)

    private def topKFromProbed(probed: DataFrame, k: Int,
        excludeSelf: Boolean): DataFrame = {
      val cand0 = assigned
        .select(col("vec_id").as("nid"), col("embedding").as("nv"), col("cell"),
          sqrt(dot(col("embedding"), col("embedding"))).as("nn"))
        .join(broadcast(probed), "cell")
      val cand = if (excludeSelf) cand0.filter(col("qid") =!= col("nid"))
        else cand0
      val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
      cand
        .select(col("qid"), col("nid"),
          (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 4).as("cos"))
    }

    /** One-pass recall/cost curve over every probe dial `1..maxNprobe` —
      * the tuner that picks `nprobe` for a recall SLA (the ANN analog of
      * the t46 threshold sweep). Per dial: Recall@k of [[topK]] against
      * exact cosine retrieval, plus the mean candidate count the probe
      * scans — the two axes of the IVF trade-off.
      *
      * The whole curve costs ONE exact pass + ONE cell-ranking, not
      * `maxNprobe` probe runs, via an exact identity: a true top-k
      * neighbour `nb` of query `q` is returned by `topK(q, k, p)` iff
      * `nb`'s cell ranks ≤ p among `q`'s nearest cells. (⇐: every probed
      * candidate ranked above `nb` under the shared (cos DESC, nid ASC)
      * total order is also above it GLOBALLY — [[bruteForceTopK]] and
      * [[topK]] compute the identical cosine expression — and `nb` being
      * global top-k means fewer than k such candidates exist, so `nb`
      * survives the candidate-set window. ⇒: an unprobed cell's vectors
      * are never candidates.) So the needed dial per true neighbour is
      * just its cell's rank, and every dial's recall is a conditional
      * count over one tiny (q·k)-row frame. DialSweepSpec re-derives the
      * curve by brute-running the probe at every dial and asserts
      * equality; the s18 contract row does the same per dial at sf scale.
      *
      * Scale shape: the exact side is [[bruteForceTopK]] (broadcast
      * queries, corpus never shuffles); cell ranks ride the probe's own
      * [[probedCells]] routing (queries × nlist, broadcast); cell sizes
      * are one `nlist`-row aggregate. Everything after the two corpus
      * passes is query-sample-sized. `mean_scanned` counts NON-SELF
      * candidates (the probe self-excludes, so the query's own row is
      * subtracted — gated on whether its cell actually ranks within the
      * dial); `scan_frac` normalizes by the corpus's other `N−1`
      * vectors. */
    def dialSweep(emb: DataFrame, queryFilter: Column, k: Int,
        maxNprobe: Int): DataFrame = {
      require(maxNprobe >= 1, s"dialSweep needs maxNprobe >= 1 (got $maxNprobe)")
      val dials = broadcast(emb.sparkSession.range(1L, maxNprobe + 1L)
        .select(col("id").cast("int").as("nprobe")))
      val ranked = probedCells(queryFilter, maxNprobe)
        .select(col("qid"), col("cell"), col("cr"))
      // needed dial per (query, true-neighbour): the neighbour cell's
      // rank; null ⇒ the cell sits beyond maxNprobe and the pair is a
      // miss at every swept dial
      val needed = Similarity.bruteForceTopK(emb, queryFilter, k)
        .select("qid", "nid")
        .join(assigned.select(col("vec_id").as("nid"), col("cell")), "nid")
        .join(ranked, Seq("qid", "cell"), "left")
        .select(col("qid"), col("cr"))
      val hits = needed.crossJoin(dials)
        .groupBy("nprobe")
        .agg(sum(when(col("cr") <= col("nprobe"), 1L).otherwise(0L)).as("n_hits"),
          count(lit(1)).as("n_exact"))
      val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("cell_n"))
      // exact candidate count per (query, dial): Σ probed-cell sizes,
      // minus the query's OWN row iff its cell is among the probed ones
      // (cr of the own cell is 1 in practice — it is the argmin — but the
      // subtraction is gated on the computed rank, not that assumption)
      val selfCr = assigned.filter(queryFilter)
        .select(col("vec_id").as("qid"), col("cell"))
        .join(ranked, Seq("qid", "cell"), "left")
        .select(col("qid"), coalesce(col("cr"), lit(Int.MaxValue)).as("self_cr"))
      val scanned = ranked
        .join(broadcast(sizes), "cell")
        .crossJoin(dials)
        .filter(col("cr") <= col("nprobe"))
        .groupBy("nprobe", "qid").agg(sum(col("cell_n")).as("q_scanned"))
        .join(broadcast(selfCr), "qid")
        .select(col("nprobe"), (col("q_scanned") -
          when(col("self_cr") <= col("nprobe"), 1L).otherwise(0L)).as("q_scanned"))
        .groupBy("nprobe")
        .agg(sum(col("q_scanned")).as("tot_scanned"))
      val totals = broadcast(
        assigned.agg(count(lit(1)).as("n_corpus"))
          .crossJoin(assigned.filter(queryFilter)
            .agg(count(lit(1)).as("n_queries")))
          .crossJoin(emb.agg(count(lit(1)).as("n_emb"))))
      hits.join(scanned, "nprobe")
        .crossJoin(totals)
        // corpora-match guard, BOTH directions (r9 review + r10 advice):
        // (a) a true neighbour missing from `assigned` (emb grown past
        // the index, or the wrong corpus passed) would vanish through
        // the nid join and SHRINK both n_hits and n_exact — recall would
        // read high over a silently smaller denominator; with matching
        // corpora every query emits exactly min(k, N−1) exact pairs, all
        // surviving the join, so divergence breaks the n_exact identity.
        // (b) the REVERSE direction — the index holding a SUPERSET of
        // emb — slips past that identity when |emb| > k (every brute
        // pair still survives the nid join), yet the real probe ranks
        // index-only vectors as candidates that can evict true
        // emb-neighbours from its top-k, so the identity-derived recall
        // would silently overstate the probe's; caught by the direct
        // cardinality check n_corpus = n_emb. Both detonate lazily
        // (the stratifiedTopK refusal discipline).
        .filter(assert_true(
          col("n_exact") ===
            col("n_queries") * least(lit(k.toLong), col("n_corpus") - 1L),
          lit("IvfIndex.dialSweep: emb holds vectors the index lacks — " +
            "a true neighbour or query is missing from the assigned " +
            "table; sweep the index's own corpus or rebuild")).isNull)
        // one-directional on purpose: the grown-emb (subset) direction
        // already fires the n_exact identity above, and a two-sided
        // equality here would race it for the error message after
        // Catalyst merges the filters
        .filter(assert_true(col("n_corpus") <= col("n_emb"),
          lit("IvfIndex.dialSweep: the index holds vectors emb lacks — " +
            "the real probe would rank index-only candidates that can " +
            "evict true emb-neighbours, so the identity-derived recall " +
            "would overstate the probe's; sweep the index's own corpus " +
            "or rebuild")).isNull)
        .select(col("nprobe"), col("n_queries"), col("n_hits"), col("n_exact"),
          round(col("n_hits").cast("double") / col("n_exact"), 4)
            .as("recall_at_k"),
          round(col("tot_scanned").cast("double") / col("n_queries"), 2)
            .as("mean_scanned"),
          round(col("tot_scanned").cast("double")
            / (col("n_queries") * (col("n_corpus") - 1L)), 4).as("scan_frac"))
        .orderBy("nprobe")
    }

    /** Incremental index maintenance: assign a NEW vector batch to the
      * EXISTING centroids and return an index over the union — the
      * daily-ingest path (the d11 incremental-dedup / q56 IVM shape
      * applied to ANN): cost scales with the BATCH, the standing corpus
      * is never re-assigned and KMeans never retrains. Assignment uses
      * the same squared-euclidean argmin as the trainer, expressed as a
      * struct-MIN aggregate over the broadcast centroid table (map-side
      * partials — no window over the batch×centroid stream). Centroids
      * drift as the distribution does; the accepted practice is periodic
      * REBUILD when probe recall decays, which [[buildIvfIndex]] does
      * from scratch — this method is the cheap path between rebuilds.
      * The previous index's cache is left to the caller to release
      * after the swap (the VersionedFactSink pointer-swap discipline). */
    def addBatch(batch: DataFrame): IvfIndex = {
      val grown = assigned.unionByName(
        Similarity.assignToCells(batch, centroids))
      IvfIndex(
        // same registry discipline as buildIvfIndex: plan-keyed, so the
        // seed index and every grown generation coexist until released
        graft.Caches.persistReplacing(
          s"ivf_assigned_${grown.queryExecution.analyzed.semanticHash()}",
          grown),
        centroids)
    }

    /** Index-health summary — the measurement behind the "retrain when
      * recall decays" discipline [[addBatch]] and the streamed ingests
      * document but could not previously observe: between rebuilds the
      * centroids are FROZEN while the data drifts, and this one-row
      * report is what an operator trends per ingest batch to decide when
      * the rebuild is due, instead of waiting for a probe-recall
      * regression in production.
      *
      *   - `n_cells` / `n_vectors` / `empty_cells` — occupancy; empty
      *     cells mean the quantizer no longer spans the data.
      *   - `max_cell_n` / `cell_skew` (max/mean) — probe-cost balance: a
      *     hot cell makes every probe that routes to it scan a
      *     corpus-sized posting list (the q54 key-skew failure mode in
      *     index form). Freshly trained KMeans sits near 1–3; growth
      *     concentrating in one cell drives it up.
      *   - `mean_sq_dist` — quantization error (mean squared euclidean
      *     distance to the assigned centroid, the KMeans objective per
      *     vector). Rising against the build-time reading = drift.
      *
      * One corpus pass (broadcast centroid join, the [[topK]] d2
      * expression), one nlist-row aggregate — trivially cheap next to
      * the ingest that triggers it. */
    def driftReport(): DataFrame = {
      val d2 = assigned
        .join(broadcast(centroids), "cell")
        .select(col("cell"),
          (dot(col("embedding"), col("embedding"))
            + dot(col("centroid"), col("centroid"))
            - lit(2.0) * dot(col("embedding"), col("centroid"))).as("d2"))
      val perCell = d2.groupBy("cell")
        .agg(count(lit(1)).as("cell_n"), sum(col("d2")).as("sq"))
      // LEFT from centroids so cells the corpus abandoned still count
      val occ = centroids.select("cell")
        .join(perCell, Seq("cell"), "left")
      occ.agg(
          count(lit(1)).as("n_cells"),
          coalesce(sum(col("cell_n")), lit(0L)).as("n_vectors"),
          sum(when(col("cell_n").isNull, 1L).otherwise(0L)).as("empty_cells"),
          coalesce(max(col("cell_n")), lit(0L)).as("max_cell_n"),
          coalesce(sum(col("sq")), lit(0.0)).as("__sq"))
        .select(col("n_cells"), col("n_vectors"), col("empty_cells"),
          col("max_cell_n"),
          round(col("max_cell_n") * col("n_cells")
            / greatest(col("n_vectors").cast("double"), lit(1.0)), 2)
            .as("cell_skew"),
          round(col("__sq")
            / greatest(col("n_vectors").cast("double"), lit(1.0)), 6)
            .as("mean_sq_dist"))
    }

    /** Drop the cached assignment (the index is unusable afterwards). */
    def release(): Unit = { assigned.unpersist(); () }
  }

  /** The production read of a [[IvfIndex.dialSweep]] curve: the SMALLEST
    * dial whose measured Recall@k meets `minRecall`, with its recall and
    * scan cost — one row. A NULL `nprobe` is the honest "unattainable"
    * answer (no swept dial reaches the SLA): the actionable response is
    * raising `maxNprobe`/nlist or relaxing the target, and a loud null
    * beats silently returning the best-effort dial as if it complied.
    * Pure curve post-processing — reads the nlist-row sweep frame, never
    * the corpus. */
  def cheapestDialFor(sweep: DataFrame, minRecall: Double): DataFrame =
    sweep.filter(col("recall_at_k") >= minRecall)
      .agg(min(struct(col("nprobe"), col("recall_at_k"),
        col("mean_scanned"), col("scan_frac"))).as("pick"))
      .select(col("pick.nprobe").as("nprobe"),
        col("pick.recall_at_k").as("recall_at_k"),
        col("pick.mean_scanned").as("mean_scanned"),
        col("pick.scan_frac").as("scan_frac"))

  /** The production read of a [[gridSweep]] curve: the PARETO FRONTIER
    * of grid cells meeting `minRecall` — every SLA-compliant (nprobe,
    * rerank) cell not dominated by another compliant cell that is ≤ on
    * both cost axes and < on one. The grid's two costs are
    * incommensurable (nprobe buys corpus scan, rerank buys exact
    * rescores; their price ratio is a deployment fact the engine cannot
    * know), so unlike [[cheapestDialFor]]'s single-axis minimum the
    * honest answer is the frontier, ordered by nprobe — the operator
    * picks the endpoint matching their scan-vs-rescore budget. Empty
    * result = no swept cell attains the SLA (widen the grid or relax
    * the target — never silently under-deliver). Pure curve
    * post-processing over the (maxNprobe·|ladder|)-row sweep frame; the
    * self-join is grid-sized, never corpus-sized. */
  def gridFrontierFor(sweep: DataFrame, minRecall: Double): DataFrame = {
    val ok = sweep.filter(col("recall_at_k") >= minRecall)
      .select(col("nprobe"), col("rerank"), col("recall_at_k"))
    val dominators = ok.select(col("nprobe").as("p2"), col("rerank").as("s2"))
    ok.join(dominators,
        col("p2") <= col("nprobe") && col("s2") <= col("rerank") &&
          (col("p2") < col("nprobe") || col("s2") < col("rerank")),
        "left_anti")
      .orderBy("nprobe", "rerank")
  }

  /** [[cheapestDialFor]]'s twin for a [[pqRerankSweep]] curve: the
    * smallest rerank-shortlist size meeting the Recall@k SLA, with its
    * recall and per-query exact-rescore row count; NULL `rerank` when no
    * swept size attains the target (grow the ladder or relax the SLA —
    * never silently under-deliver). */
  def cheapestRerankFor(sweep: DataFrame, minRecall: Double): DataFrame =
    sweep.filter(col("recall_at_k") >= minRecall)
      .agg(min(struct(col("rerank"), col("recall_at_k"),
        col("rerank_rows"))).as("pick"))
      .select(col("pick.rerank").as("rerank"),
        col("pick.recall_at_k").as("recall_at_k"),
        col("pick.rerank_rows").as("rerank_rows"))

  /** Assign a vector batch to the nearest of the given centroids — the
    * [[IvfIndex.addBatch]] kernel, shared with the streaming
    * [[graft.streaming.VectorIngest]] path so batch and streaming
    * assignment can never drift: the same squared-euclidean argmin the
    * KMeans trainer uses, expressed as a struct-MIN aggregate over the
    * broadcast centroid table (map-side partials — no window over the
    * batch×centroid stream), ties to the smaller cell id. Cost scales
    * with the BATCH; the standing corpus is never touched. */
  private[graft] def assignToCells(batch: DataFrame,
      centroids: DataFrame): DataFrame =
    batch
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"),
        struct(
          (dot(col("embedding"), col("embedding"))
            + dot(col("centroid"), col("centroid"))
            - lit(2.0) * dot(col("embedding"), col("centroid"))).as("d2"),
          col("cell")).as("sc"))
      .groupBy("vec_id")
      .agg(first(col("embedding")).as("embedding"),
        min(col("sc"))("cell").as("cell"))

  /** Build an IVF (inverted-file) index: KMeans partitions the corpus into
    * `nlist` Voronoi cells; a probe then scans only nprobe/nlist of the
    * corpus per query. The other classic scale path next to SRP-LSH —
    * better recall on clustered data, needs a (cheap, sampled) training
    * pass. Deterministic via fixed KMeans/sampling seeds.
    *
    * The coarse quantizer trains on a bounded sample (`maxTrainRows`,
    * classic IVF practice — FAISS trains on ~256 vectors/cell): every
    * KMeans iteration is a full pass over its input, so fitting on the
    * whole corpus would make the INDEX BUILD, not the queries, the
    * dominant cost at scale. Assignment still covers the full corpus in
    * one pass and is persisted for the index's lifetime. Corpora at or
    * below the cap train on everything (the sample job is skipped, not
    * run at fraction 1.0). */
  def buildIvfIndex(emb: DataFrame, nlist: Int = 16,
      maxTrainRows: Int = 100000): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val spark = emb.sparkSession
    val featured = emb.withColumn("features",
      array_to_vector(col("embedding").cast("array<double>")))
    val corpusRows = featured.count()
    require(corpusRows > 0, "cannot build an IVF index over an empty corpus")
    val train =
      if (corpusRows <= maxTrainRows) featured.select("features")
      else featured.select("features")
        .sample(withReplacement = false, maxTrainRows.toDouble / corpusRows, seed = 42L)
    // nlist is a CAP: a corpus smaller than nlist trains one cell per
    // point (the flat-index limit) — the faiss ntrain >= k requirement
    // applied by clamping instead of crashing, so a small seeding
    // micro-batch (VectorIngest's first trigger) cannot brick the stream
    // with KMeans' opaque ArrayIndexOutOfBounds
    val k = math.min(nlist.toLong, corpusRows).toInt
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features").fit(train)
    // registered in the shared cache registry (plan-keyed, so
    // concurrently-held indexes never clobber each other) instead of a
    // bare persist: contract entries build indexes they don't release,
    // and the registry is what lets a workload-boundary releaseAll
    // reclaim those abandoned assignment caches (r9 review)
    val assignedPlan = model.transform(featured)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))
    val assigned = graft.Caches.persistReplacing(
      s"ivf_assigned_${assignedPlan.queryExecution.analyzed.semanticHash()}",
      assignedPlan)

    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "centroid")
    IvfIndex(assigned, centroids)
  }

  /** One-shot IVF top-k (the driver-contract s04 entry): build, probe,
    * release — results identical to probing a held [[IvfIndex]]. */
  def ivfTopK(emb: DataFrame, queryFilter: Column, k: Int,
      nlist: Int = 16, nprobe: Int = 4, maxTrainRows: Int = 100000): DataFrame = {
    val idx = buildIvfIndex(emb, nlist, maxTrainRows)
    idx.topK(queryFilter, k, nprobe)
  }

  /** Embedding near-duplicate pairs above a cosine threshold — the default,
    * SRP-banded path: candidate pairs meet on an equi-join over
    * (band, bucket) keys from [[graft.plans.SrpBandBuckets]] (an OR over
    * `bands` AND-constructions of `bandBits` hyperplane signs), then every
    * candidate is verified with the exact codegen'd cosine, so precision is
    * exact and only recall is probabilistic. No all-pairs enumeration
    * anywhere in the plan — the join is hash-shaped, not nested-loop.
    *
    * Parameter choice is threshold-driven. Collision probability per plane
    * for a pair at angle θ is 1−θ/π; per band it is (1−θ/π)^bandBits, and a
    * pair is missed with ((1−(1−θ/π)^bandBits))^bands. At production
    * thresholds (≥0.8) wide bands (bandBits 12–16) prune candidates by
    * orders of magnitude; near the random-pair regime (threshold ≈ 0.4,
    * where θ/π ≈ 0.37 vs 0.5 for random) the LSH gap collapses (ρ → 1) and
    * NO hashing scheme prunes much — the defaults here (4-bit bands × 64,
    * seed 42) are tuned for full recall at that adversarially-low
    * threshold, verified against the exact form on every fixture
    * (SimilaritySpec). For large corpora raise `bandBits` toward
    * log2(corpus / target bucket size) so per-band buckets stay bounded. */
  def cosineNearDuplicates(emb: DataFrame, threshold: Double,
      bandBits: Int = 4, bands: Int = 64, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val buckets = emb.select(col("vec_id"),
      posexplode(graft.plans.VectorExpressions.srpBandBuckets(
        col("embedding"), bandBits, bands, dim, seed)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"))
      .distinct()
    val normed = emb.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    cand
      .join(normed.select(col("vec_id").as("d1"), col("embedding").as("e1"),
        col("nrm").as("n1")), "d1")
      .join(normed.select(col("vec_id").as("d2"), col("embedding").as("e2"),
        col("nrm").as("n2")), "d2")
      .select(col("d1"), col("d2"),
        (dot(col("e1"), col("e2")) / (col("n1") * col("n2"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("d1"), col("d2"), round(col("cos"), 4).as("cos"))
  }

  /** Per-label centroids (class prototypes / cluster means) in LONG form —
    * one row per (label, dimension). posexplode + groupBy is the
    * distributed formulation: dimension rows shuffle once and every
    * executor aggregates a slice, where an array-valued fold would buffer
    * whole groups in single tasks. Elements are quantized to 4 decimals
    * and summed EXACTLY (decimal), so the centroid is partition-order- and
    * engine-invariant: a double can never sit exactly on a 4-dp half-way
    * point (5·10⁻⁵ has no finite binary expansion), so the quantization
    * itself rounds identically in every engine. */
  def labelCentroids(emb: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    emb.select(col(labelCol), posexplode(col(vecCol)))
      .groupBy(col(labelCol), col("pos"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(round(col("col").cast("double"), 4)
            .cast(org.apache.spark.sql.types.DecimalType(18, 4))).cast("double")
          / count(lit(1)), 6).as("c"))

  /** Per-label centroid-distance profile — the outlier signal
    * embedding-curation pipelines prune on (a vector far from its own
    * label's centroid is a mislabel, an encoder failure, or genuinely
    * hard data; SemDeDup-style semantic pruning keys on exactly this
    * distance): for each label, the count, mean and minimum cosine of
    * its members to the label centroid, plus how many members fall below
    * `lowCos`. Complements [[knnLabelAgreement]]: agreement says whether
    * neighbourhoods respect labels, this says how tight each label's
    * cluster is and which labels carry pruning candidates.
    *
    * Scale shape: centroids derive from [[labelCentroids]] (one grain
    * shuffle over the exploded components) and collapse to |labels| rows
    * that broadcast back onto the corpus — the corpus itself is scanned
    * once and never shuffled; the final profile is a |labels|-row
    * aggregate. Determinism: the dot products fold in array-index order
    * (higher-order `aggregate`, same order DuckDB's list sum uses),
    * per-vector cosines round to 6 dp before the DECIMAL mean, and the
    * outlier comparison runs on the rounded value so cut boundaries
    * cannot drift by an ulp between engines. */
  def centroidDistanceProfile(emb: DataFrame, lowCos: Double = 0.5): DataFrame = {
    val sorted = array_sort(collect_list(struct(col("pos"), col("c"))))
    val cent = labelCentroids(emb)
      .groupBy("label")
      .agg(transform(sorted, s => s.getField("c")).as("centroid"))
    val dotCol = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val v = emb
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
      .join(broadcast(cent), "label")
    val cos = round(
      dotCol(col("v"), col("centroid")) /
        (sqrt(dotCol(col("v"), col("v"))) *
          sqrt(dotCol(col("centroid"), col("centroid")))), 6)
    v.select(col("label"), cos.as("cos"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        round(sum(col("cos").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double") / count(lit(1)), 4).as("mean_cos"),
        min(col("cos")).as("min_cos"),
        sum(when(col("cos") < lowCos, 1L).otherwise(0L)).as("n_low"))
      .orderBy("label")
  }

  /** Exact all-pairs form of [[cosineNearDuplicates]] — O(n²) by
    * construction; the ground truth the gated path's recall is measured
    * against in SimilaritySpec, and the right tool only when the corpus is
    * small enough that n² pairs are affordable. */
  /** Product-quantization index (Jégou et al., TPAMI 2011): the embedding
    * splits into `m` subspaces, each with its own `k`-centroid codebook
    * trained on a bounded sample, and every vector compresses to `m` small
    * codes — m·log2(k) bits instead of 4·dim bytes, the compression that
    * lets a 100 TB embedding corpus live in cluster memory. Codes are
    * assigned by `m` chained ML transforms (one KMeans predict per
    * subspace) in a single pass over the corpus. */
  final case class PqIndex(codes: DataFrame,
      codebooks: Array[Array[Array[Float]]]) {
    def release(): Unit = { codes.unpersist(); () }
  }

  def buildPqIndex(emb: DataFrame, m: Int = 8, k: Int = 16,
      maxTrainRows: Int = 100000): PqIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m

    // every subspace trains on the SAME bounded sample (one sample job,
    // m cheap fits) — classic PQ practice, same rationale as the IVF
    // coarse quantizer above
    val corpusRows = emb.count()
    require(corpusRows > 0, "cannot build a PQ index over an empty corpus")
    // k is a CAP, the buildIvfIndex discipline: a corpus smaller than k
    // trains one centroid per point instead of crashing a seeding
    // micro-batch with KMeans' opaque ArrayIndexOutOfBounds
    val kEff = math.min(k.toLong, corpusRows).toInt
    val sampled =
      if (corpusRows <= maxTrainRows) emb
      else emb.sample(withReplacement = false,
        maxTrainRows.toDouble / corpusRows, seed = 42L)
    val trainAll = sampled.select(
      (0 until m).map(i => array_to_vector(
        slice(col("embedding"), i * dsub + 1, dsub).cast("array<double>"))
        .as(s"f$i")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // The m subquantizer fits are independent jobs over the SAME cached
    // sample — launch them concurrently from the driver so they share the
    // executor pool instead of serializing m× the per-fit scheduling +
    // iteration latency (determinism is unaffected: each fit is seeded
    // per-subspace and reads an immutable cached frame).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    trainAll.count() // materialize the cache once, BEFORE the concurrent fits
    val models = Await.result(
      Future.sequence((0 until m).map { i => Future {
        new KMeans().setK(kEff).setSeed(42L + i).setMaxIter(10)
          .setFeaturesCol(s"f$i").setPredictionCol(s"c$i").fit(trainAll)
      }}), Duration.Inf)
    trainAll.unpersist()

    val featured = emb.select(col("vec_id") +:
      (0 until m).map(i => array_to_vector(
        slice(col("embedding"), i * dsub + 1, dsub).cast("array<double>"))
        .as(s"f$i")): _*)
    // registered in the shared cache registry (replace-on-change, freed by
    // Caches.releaseAll) so the cache outlives this call — the returned
    // index's frame is lazy and must stay cached until the CALLER's action
    val coded = graft.Caches.persistReplacing("pq_codes",
      models.zipWithIndex
        .foldLeft(featured) { case (df, (model, _)) => model.transform(df) }
        .select(col("vec_id"),
          array((0 until m).map(i => col(s"c$i")): _*).as("code")))

    val books = models.map(_.clusterCenters.map(_.toArray.map(_.toFloat)))
    PqIndex(coded, books.toArray)
  }

  /** Encode a vector batch against STANDING codebooks — the PQ analog of
    * [[assignToCells]], shared with the streaming
    * [[graft.streaming.PqIngest]] path: per subspace the code is the
    * squared-euclidean argmin over that subspace's k centroids, ties to
    * the smaller code (the trainer's tie direction). The codebooks enter
    * as ONE literal (m·k·dsub floats, bounded by index geometry, never
    * the corpus) and the whole encode is native fold expressions over it
    * — per row, no crossJoin, no aggregation, stays inside whole-stage
    * codegen; cost scales with the BATCH. Arithmetic mirrors the
    * trainer's feature path (float widened to double, subspace elements
    * accumulated in index order), so re-encoding the training batch
    * reproduces its original codes — spec-asserted. */
  private[graft] def encodeWithCodebooks(batch: DataFrame,
      codebooks: Array[Array[Array[Float]]]): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val cb = typedlit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    batch.select(col("vec_id"),
      transform(sequence(lit(1), lit(m)), i => {
        val dists = transform(element_at(cb, i), cent =>
          aggregate(sequence(lit(1), lit(dsub)), lit(0.0d), (acc, d) => {
            val diff =
              element_at(col("embedding"), (i - lit(1)) * dsub + d)
                .cast("double") - element_at(cent, d).cast("double")
            acc + diff * diff
          }))
        (array_position(dists, array_min(dists)) - 1).cast("int")
      }).as("code"))
  }

  /** PQ approximate top-k via asymmetric distance computation: per query,
    * the m·k dot products query-subvector · centroid are precomputed into
    * a tiny per-row table (in-plan — only the codebooks live on the
    * driver after training), and the corpus scan scores each vector by m
    * table lookups on its CODES, never touching the original floats. The
    * lookup is a native fold expression over a literal table —
    * codegen-friendly, no UDF, and the scan reads m ints per row instead
    * of dim floats. */
  def pqTopK(emb: DataFrame, queryFilter: Column, topK: Int, m: Int = 8,
      k: Int = 16, maxTrainRows: Int = 100000, rerank: Int = 0): DataFrame = {
    val idx = buildPqIndex(emb, m, k, maxTrainRows)
    pqProbe(idx, emb, queryFilter, topK, rerank = rerank)
  }

  /** Probe a HELD [[PqIndex]] — the production shape (build once, probe
    * for the index's lifetime); [[pqTopK]] is the one-shot composition the
    * driver contract times. Benchmarked separately (s07_build/s07_probe)
    * so the sampled KMeans fits aren't charged to query latency.
    *
    * `rerank > 0` adds the standard FAISS-style refine step: the ADC scan
    * shortlists the top-`rerank` candidates per query, which are then
    * re-scored EXACTLY (true cosine against the stored vectors — one
    * broadcast-side join of the tiny shortlist back to the corpus) and the
    * final top-`topK` is taken from the exact scores. Output columns
    * switch to (qid, rank, nid, cos) — the [[bruteForceTopK]] shape —
    * because the scores ARE exact cosines; with `rerank` ≥ the corpus
    * size the shortlist is the whole corpus and the result equals brute
    * force, which is the oracle dial the s07a audit row uses. */
  def pqProbe(idx: PqIndex, emb: DataFrame, queryFilter: Column,
      topK: Int, rerank: Int = 0): DataFrame = {
    // both geometry parameters come from the INDEX — a caller-supplied m
    // that disagreed with the codebooks would silently score a truncated
    // ADC distance (review finding, round 7)
    val scored = adcScored(idx, emb, queryFilter, "pqProbe")
      val w = adcOrder
      if (rerank <= 0)
        scored.withColumn("rank", row_number().over(w).cast("int"))
          .filter(col("rank") <= topK)
          .select(col("qid"), col("rank"), col("vec_id").as("nid"),
            round(col("approx_dot"), 4).as("approx_dot"))
      else {
        // refine: exact cosine over the ADC shortlist only — the corpus
        // join touches `rerank` rows per query, not the whole table
        val shortlist = scored
          .withColumn("arank", row_number().over(w).cast("int"))
          .filter(col("arank") <= rerank)
          .select(col("qid"), col("vec_id").as("nid"))
        val qv = guardedQueries(emb.filter(queryFilter)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
          "pqProbe")
        val exact = shortlist
          .join(emb.select(col("vec_id").as("nid"), col("embedding").as("nv")), "nid")
          .join(broadcast(qv), "qid")
          .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos"))
        val we = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
        exact.withColumn("rank", row_number().over(we).cast("int"))
          .filter(col("rank") <= topK)
          .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 4).as("cos"))
      }
    // no release here: the result is LAZY and still references the codes
    // frame — releasing before the caller's action would throw the cache
    // away unused; the shared registry reclaims it at workload boundaries
  }

  /** The one ADC ranking order — (approx_dot DESC, vec_id ASC) — shared
    * by [[pqProbe]]'s shortlist window and [[pqRerankSweep]]'s rank
    * derivation, so the sweep provably ranks the SAME order the probe
    * cuts its shortlist from. */
  private def adcOrder =
    Window.partitionBy("qid").orderBy(desc("approx_dot"), asc("vec_id"))

  /** The ADC-scored candidate stream (qid, vec_id, approx_dot), self
    * excluded — [[pqProbe]]'s scoring stage extracted so
    * [[pqRerankSweep]] ranks the same scores the probe ranks.
    *
    * ADC tables are built IN-PLAN: the codebooks (m·k·dsub floats — a
    * few KB of driver state bounded by the INDEX, never by the corpus
    * or the query count) enter as one complex literal, and each query
    * row derives its own m×k table qtab[i][c] = dot(query subvector i,
    * centroid c) with native fold expressions — float operands widened
    * to double and accumulated in index order, the same arithmetic the
    * old driver loop ran. Nothing query-sized is ever collected, so a
    * 10 M-row queryFilter stays distributed end to end (the r6 audit's
    * silent-driver-OOM hole). Each query's table still rides the
    * broadcast frame as DATA, not as one literal expression: a typedlit
    * of ALL tables would grow the generated code O(|queries|·m·k), while
    * the per-row column keeps codegen constant-size and the broadcast a
    * few KB per query. Geometry comes from the INDEX — a caller-supplied
    * m that disagreed with the codebooks would silently score a
    * truncated ADC distance (review finding, round 7). */
  private def adcScored(idx: PqIndex, emb: DataFrame, queryFilter: Column,
      caller: String): DataFrame = {
    val m = idx.codebooks.length
    val dsub = idx.codebooks(0)(0).length
    val cb = typedlit(idx.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val qdf = guardedQueries(emb.filter(queryFilter)
      .select(col("vec_id").as("qid"),
        transform(sequence(lit(1), lit(m)), i =>
          transform(element_at(cb, i), cent =>
            aggregate(sequence(lit(1), lit(dsub)), lit(0.0d), (acc, d) =>
              acc + element_at(col("embedding"), (i - lit(1)) * dsub + d)
                .cast("double") * element_at(cent, d).cast("double"))))
          .as("qtab")),
      caller)
    idx.codes.crossJoin(broadcast(qdf))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("approx_dot",
        aggregate(sequence(lit(1), lit(m)), lit(0.0d), (acc, i) =>
          acc + element_at(
            element_at(col("qtab"), i),
            element_at(col("code"), i) + 1)))
  }

  /** One-pass recall/cost curve over PQ rerank-shortlist sizes — the PQ
    * twin of [[IvfIndex.dialSweep]]: per `ladder` step s, Recall@k of
    * `pqProbe(…, rerank = s)` against exact cosine retrieval, plus the
    * exact-rescore row count the refine stage pays per query.
    *
    * Same exact-identity shape as the IVF sweep: a true top-k neighbour
    * `nb` is returned by the rerank probe at shortlist size s iff its
    * ADC rank ≤ s. (⇐: the refine stage ranks the shortlist by the same
    * (cos DESC, nid ASC) total order as [[bruteForceTopK]] — the s07a
    * contract pins refine ≡ brute at full rerank — and every shortlist
    * candidate ranked above `nb` is also above it globally, of which
    * fewer than k exist. ⇒: a candidate outside the ADC shortlist never
    * reaches the refine stage.) So the needed shortlist size per true
    * neighbour is just its rank in the ONE ADC ordering the probe
    * itself cuts from ([[adcOrder]] over [[adcScored]]), and the whole
    * curve costs one ADC pass + one exact pass instead of one probe run
    * per ladder step. RerankSweepSpec re-derives every step with real
    * probe runs; the s20 contract row does the same at sf scale.
    *
    * Scale shape: the ADC pass is the probe's own (broadcast per-query
    * tables, codes never shuffled more than the probe already does);
    * the exact side is [[bruteForceTopK]]; everything downstream of the
    * two windows is query-sample-sized. `rerank_rows` = min(s, N−1) is
    * the refine stage's per-query exact-rescore row count — the cost
    * axis the ladder trades against recall. */
  def pqRerankSweep(idx: PqIndex, emb: DataFrame, queryFilter: Column,
      k: Int, ladder: Seq[Int]): DataFrame = {
    require(ladder.nonEmpty && ladder.forall(_ >= 1) &&
      ladder == ladder.distinct.sorted,
      s"ladder must be distinct ascending positive sizes (got $ladder)")
    val spark = emb.sparkSession
    import spark.implicits._
    val steps = broadcast(ladder.toDF("rerank"))
    val aranks = adcScored(idx, emb, queryFilter, "pqRerankSweep")
      .withColumn("arank", row_number().over(adcOrder))
      .select(col("qid"), col("vec_id").as("nid"), col("arank"))
    val exactPairs = bruteForceTopK(emb, queryFilter, k).select("qid", "nid")
    // every true pair HAS an ADC rank (the scan covers all non-self
    // candidates), so the inner join loses nothing
    val needed = aranks.join(broadcast(exactPairs), Seq("qid", "nid"))
      .select(col("qid"), col("arank"))
    val hits = needed.crossJoin(steps)
      .groupBy("rerank")
      .agg(sum(when(col("arank") <= col("rerank"), 1L).otherwise(0L)).as("n_hits"),
        count(lit(1)).as("n_exact"))
    val totals = broadcast(
      emb.agg(count(lit(1)).as("n_corpus"))
        .crossJoin(emb.filter(queryFilter).agg(count(lit(1)).as("n_queries")))
        .crossJoin(idx.codes.agg(count(lit(1)).as("n_codes"))))
    hits.crossJoin(totals)
      // corpora-match guard, BOTH directions (the dialSweep discipline):
      // a true neighbour absent from `codes` would vanish through the
      // arank join and inflate recall over a shrunken denominator (the
      // n_exact identity catches it); an index holding a SUPERSET of emb
      // slips past that identity when |emb| > k, yet the real probe's
      // ADC shortlist would carry index-only candidates that can evict
      // true emb-neighbours — caught by the direct cardinality check
      .filter(assert_true(
        col("n_exact") ===
          col("n_queries") * least(lit(k.toLong), col("n_corpus") - 1L),
        lit("pqRerankSweep: emb holds vectors the index lacks — a true " +
          "neighbour is missing from the codes table; sweep the " +
          "index's own corpus or re-encode")).isNull)
      // one-directional, the dialSweep rationale: the subset direction
      // is the n_exact identity's to report
      .filter(assert_true(col("n_codes") <= col("n_corpus"),
        lit("pqRerankSweep: the index holds codes emb lacks — the real " +
          "probe's ADC shortlist would carry index-only candidates " +
          "that can evict true emb-neighbours, so the identity-derived " +
          "recall would overstate the probe's; sweep the index's own " +
          "corpus or re-encode")).isNull)
      .select(col("rerank"), col("n_queries"), col("n_hits"), col("n_exact"),
        round(col("n_hits").cast("double") / col("n_exact"), 4)
          .as("recall_at_k"),
        least(col("rerank").cast("long"), col("n_corpus") - 1L)
          .as("rerank_rows"))
      .orderBy("rerank")
  }

  /** The full nprobe×rerank recall grid for the IVF-PQ composite probe
    * ([[ivfPqTopK]]) — the cross terms the two independent sweeps
    * deliberately bound from each side (SCALING.md r9: `dialSweep` fixes
    * rerank=∞ on the routing axis, [[pqRerankSweep]] fixes routing=full
    * on the shortlist axis; a deployment tuning BOTH dials at once needs
    * the grid). One row per (nprobe ∈ 1..maxNprobe, rerank ∈ ladder)
    * with Recall@k of `ivfPqTopK(…, nprobe, rerank)` against exact
    * cosine retrieval.
    *
    * Exact identity, extending the two sweeps': a true top-k neighbour
    * `nb` is returned by the composite probe at (p, s) iff its cell
    * ranks ≤ p among the query's nearest cells AND its rank in the ADC
    * ordering of the p-dial candidate set is ≤ s. (Routing confines
    * candidates to probed cells — the dialSweep ⇒ direction; within
    * them, the shortlist cut and exact refine are pqRerankSweep's
    * argument verbatim, because [[ivfPqTopK]] ranks by the same
    * (approx_dot DESC, vec_id ASC) / (cos DESC, nid ASC) total orders.)
    * Unlike the rerank axis alone, the candidate set CHANGES with p, so
    * `nb`'s ADC rank at dial p is 1 + the number of candidates ahead of
    * it whose own cell ranks ≤ p — computed once per (true pair,
    * candidate-cell-rank band) and prefix-summed over p. Note recall is
    * therefore NOT monotone in nprobe at a fixed finite rerank: opening
    * a cell can add ADC-overranked candidates that evict a true
    * neighbour from the shortlist — the exact trade-off the grid exists
    * to expose. It IS monotone in rerank at every fixed p (nested
    * shortlists over a fixed candidate set).
    *
    * Cost: one exact brute pass + one ADC pass over the p=maxNprobe
    * candidate stream (the probe's own widest-dial cost) + one more
    * pass of that stream against the broadcast q·k true pairs for the
    * ahead-counts — NOT maxNprobe·|ladder| probe runs. Everything
    * downstream of those passes is (q·k·maxNprobe)-row post-processing.
    * GridSweepSpec re-derives every grid cell with real probe runs; the
    * s21 contract row does the same at sf scale. */
  def gridSweep(ivf: IvfIndex, pq: PqIndex, emb: DataFrame,
      queryFilter: Column, k: Int, maxNprobe: Int,
      ladder: Seq[Int]): DataFrame = {
    require(maxNprobe >= 1, s"gridSweep needs maxNprobe >= 1 (got $maxNprobe)")
    require(ladder.nonEmpty && ladder.forall(_ >= 1) &&
      ladder == ladder.distinct.sorted,
      s"ladder must be distinct ascending positive sizes (got $ladder)")
    val spark = emb.sparkSession
    import spark.implicits._
    val dials = broadcast(spark.range(1L, maxNprobe + 1L)
      .select(col("id").cast("int").as("nprobe")))
    val steps = broadcast(ladder.toDF("rerank"))
    // per-query routed cells at the WIDEST dial, each carrying the
    // query's in-plan ADC table (the ivfPqTopK probe head — geometry
    // from the index, nothing query-sized on the driver)
    val m = pq.codebooks.length
    val dsub = pq.codebooks(0)(0).length
    val cb = typedlit(pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val ranked = ivf.probedCells(queryFilter, maxNprobe)
      .withColumn("qtab", transform(sequence(lit(1), lit(m)), i =>
        transform(element_at(cb, i), cent =>
          aggregate(sequence(lit(1), lit(dsub)), lit(0.0d), (acc, d) =>
            acc + element_at(col("qv"), (i - lit(1)) * dsub + d)
              .cast("double") * element_at(cent, d).cast("double")))))
      .select(col("qid"), col("cell"), col("cr"), col("qtab"))
    // ADC-scored candidate stream over the widest dial's cells, each
    // candidate tagged with its cell's rank for this query — exactly
    // ivfPqTopK's scoring stage with `cr` carried through
    val codesWithCell = pq.codes
      .join(ivf.assigned.select(col("vec_id"), col("cell")), "vec_id")
    val scored = codesWithCell.join(broadcast(ranked), "cell")
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("approx_dot",
        aggregate(sequence(lit(1), lit(m)), lit(0.0d), (acc, i) =>
          acc + element_at(
            element_at(col("qtab"), i),
            element_at(col("code"), i) + 1)))
      .select(col("qid"), col("vec_id"), col("cr").as("cand_cr"),
        col("approx_dot"))
    val exactPairs = bruteForceTopK(emb, queryFilter, k).select("qid", "nid")
      .localCheckpoint() // tiny (q·k), feeds two branches — cut lineage
    // each true pair's own ADC score + cell rank; a pair whose cell
    // ranks beyond maxNprobe never appears here and the left join below
    // keeps it as a miss at every swept dial
    val nbScored = scored.withColumnRenamed("vec_id", "nid")
      .join(broadcast(exactPairs), Seq("qid", "nid"))
      .select(col("qid"), col("nid"), col("cand_cr").as("nb_cr"),
        col("approx_dot").as("nb_dot"))
    // candidates strictly ahead of each true pair under the ONE ADC
    // total order, banded by the candidate's cell rank — the only other
    // corpus-sized pass; collapses map-side to ≤ q·k·maxNprobe rows
    val ahead = scored.join(broadcast(nbScored), "qid")
      .filter(col("approx_dot") > col("nb_dot") ||
        (col("approx_dot") === col("nb_dot") && col("vec_id") < col("nid")))
      .groupBy(col("qid"), col("nid"), col("cand_cr"))
      .agg(count(lit(1)).as("n_ahead"))
    // prefix-sum the bands over the dial axis: nb's ADC rank at dial p
    // counts only candidates whose own cell ranks ≤ p
    val aheadAt = ahead.crossJoin(dials)
      .filter(col("cand_cr") <= col("nprobe"))
      .groupBy("qid", "nid", "nprobe")
      .agg(sum(col("n_ahead")).as("n_ahead_p"))
    // both right sides are query-sample-sized (q·k and q·k·maxNprobe
    // rows) — broadcast them so the tiny left joins never shuffle
    val pairsCr = exactPairs
      .join(broadcast(nbScored.select("qid", "nid", "nb_cr")),
        Seq("qid", "nid"), "left")
    val perDial = pairsCr.crossJoin(dials)
      .join(broadcast(aheadAt), Seq("qid", "nid", "nprobe"), "left")
      .select(col("qid"), col("nid"), col("nprobe"), col("nb_cr"),
        (lit(1L) + coalesce(col("n_ahead_p"), lit(0L))).as("arank"))
    val hits = perDial.crossJoin(steps)
      .groupBy("nprobe", "rerank")
      .agg(sum(when(col("nb_cr") <= col("nprobe") &&
          col("arank") <= col("rerank"), 1L).otherwise(0L)).as("n_hits"),
        count(lit(1)).as("n_exact"))
    val totals = broadcast(
      emb.agg(count(lit(1)).as("n_corpus"))
        .crossJoin(emb.filter(queryFilter).agg(count(lit(1)).as("n_queries")))
        .crossJoin(ivf.assigned.agg(count(lit(1)).as("n_assigned")))
        .crossJoin(pq.codes.agg(count(lit(1)).as("n_codes"))))
    hits.crossJoin(totals)
      // corpora-match guard, both directions over BOTH index tables
      // (the dialSweep/pqRerankSweep discipline): n_exact catches emb
      // outgrowing an index, the cardinality checks catch the superset
      // direction the identity alone cannot see
      .filter(assert_true(
        col("n_exact") ===
          col("n_queries") * least(lit(k.toLong), col("n_corpus") - 1L) &&
          col("n_corpus") === col("n_assigned") &&
          col("n_corpus") === col("n_codes"),
        lit("gridSweep: emb, the IVF assignment and the PQ codes must " +
          "hold the SAME corpus — a divergence makes the identity-" +
          "derived recall misstate the real probe's; sweep the indexes' " +
          "own corpus or rebuild")).isNull)
      .select(col("nprobe"), col("rerank"), col("n_queries"),
        col("n_hits"), col("n_exact"),
        round(col("n_hits").cast("double") / col("n_exact"), 4)
          .as("recall_at_k"))
      .orderBy("nprobe", "rerank")
  }

  /** PQ index-health report — the code twin of
    * [[IvfIndex.driftReport]]: between codebook retrains the m
    * subquantizers are FROZEN while the data drifts, and the signal is
    * RECONSTRUCTION error (‖x − decode(code(x))‖², the PQ training
    * objective per vector — by the argmin-encode construction this is
    * also each row's distance to its nearest representable point, so a
    * rising mean means the codebooks no longer span the data and ADC
    * rankings degrade). Takes the VECTORS alongside the index because a
    * PQ store holds codes only; in the shared-drop-dir topology they
    * come from the [[graft.streaming.VectorIngest]] twin.
    *
    * One pass: vectors ⋈ codes on vec_id, per-row decode via native
    * fold expressions over the codebook literal (the ADC discipline —
    * nothing corpus-sized on the driver), one 1-row aggregate. The
    * report also carries the coverage counts (`n_vectors`, `n_coded`):
    * a vector without a code is invisible to every ADC probe, so a
    * divergence is itself the [[gridSweep]] corpora alarm. */
  /** Per-row squared reconstruction error ‖x − decode(code(x))‖² as a
    * native fold expression over the codebook literal (reads the row's
    * `embedding` and `code` columns) — the PQ training objective per
    * vector, shared by [[pqDriftReport]] and the
    * [[graft.streaming.PqIngest]] door telemetry so the corpus-cycle
    * and per-batch measurements can never drift. */
  private[graft] def sqReconstructionError(
      codebooks: Array[Array[Array[Float]]]): Column = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val cb = typedlit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    aggregate(sequence(lit(1), lit(m)), lit(0.0d), (acc, i) =>
      acc + aggregate(sequence(lit(1), lit(dsub)), lit(0.0d), (a2, d) => {
        val x = element_at(col("embedding"), (i - lit(1)) * dsub + d)
          .cast("double")
        val c = element_at(
          element_at(element_at(cb, i), element_at(col("code"), i) + 1), d)
          .cast("double")
        a2 + (x - c) * (x - c)
      }))
  }

  def pqDriftReport(idx: PqIndex, vectors: DataFrame): DataFrame = {
    val sq = sqReconstructionError(idx.codebooks)
    val joined = vectors.select(col("vec_id"), col("embedding"))
      .join(idx.codes, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("code").isNotNull, sq).as("sq"))
    joined.agg(
        count(lit(1)).as("n_vectors"),
        count(col("sq")).as("n_coded"),
        coalesce(sum(col("sq")), lit(0.0)).as("__sq"),
        coalesce(max(col("sq")), lit(0.0)).as("__mx"))
      .select(col("n_vectors"), col("n_coded"),
        round(col("__sq") /
          greatest(col("n_coded").cast("double"), lit(1.0)), 6)
          .as("mean_sq_err"),
        round(col("__mx"), 6).as("max_sq_err"))
  }

  /** IVF-PQ composite probe — the production ANN topology (FAISS's
    * default IndexIVFPQ): IVF routing confines each query to `nprobe`
    * Voronoi cells, PQ asymmetric-distance scoring ranks ONLY those
    * cells' code rows (never their float vectors), and the ADC shortlist
    * is exact-reranked from stored vectors. At 100 TB this is the only
    * dial that holds both axes down: routing caps the SCAN at
    * nprobe/nlist of the corpus, codes cap the BYTES at m bytes/vector,
    * and the exact rerank touches `rerank` float rows per query.
    *
    * Per-query ADC tables derive in-plan from the codebook literal (the
    * [[pqProbe]] discipline — nothing query-sized on the driver); the
    * codes⋈cell join is vec_id-co-partitioned here, and a production
    * layout stores codes WITH the cell id (one table, partitioned by
    * cell) so routing becomes partition pruning instead of a join. With
    * `nprobe` = nlist and `rerank` ≥ the corpus, the result provably
    * equals [[bruteForceTopK]] — the dial the s15 contract pins to the
    * cross-engine oracle. */
  def ivfPqTopK(ivf: IvfIndex, pq: PqIndex, emb: DataFrame,
      queryFilter: Column, topK: Int, nprobe: Int = 4,
      rerank: Int = 50): DataFrame =
    ivfPqTopKOver(ivf, pq, emb,
      qProbe = guardedQueries(ivf.assigned.filter(queryFilter)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        "ivfPqTopK"),
      // the rerank's query-vector broadcast is the same filtered frame —
      // guarded too, so whichever exchange the scheduler builds first
      // carries the loud refusal rather than the generic broadcast error
      qRerank = guardedQueries(emb.filter(queryFilter)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        "ivfPqTopK"),
      excludeSelf = true, topK = topK, nprobe = nprobe, rerank = rerank)

  /** [[ivfPqTopK]] for an EXTERNAL query batch — the production serving
    * shape: query embeddings that are NOT corpus rows probe the same
    * composite plan (cell routing → per-subspace ADC tables → banded
    * shortlist → exact rerank), with one `(idCol, vecCol)` frame feeding
    * both the probe and the rerank sides. No self row exists, so nothing
    * is excluded unless the caller's id spaces deliberately coincide
    * (`excludeSelf = true` restores member semantics — ExternalQuerySpec
    * pins that setting row-equal to the filter form). */
  def ivfPqTopKQueries(ivf: IvfIndex, pq: PqIndex, emb: DataFrame,
      queries: DataFrame, topK: Int, nprobe: Int = 4, rerank: Int = 50,
      excludeSelf: Boolean = false, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = guardedQueries(queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv")),
      "ivfPqTopKQueries")
    ivfPqTopKOver(ivf, pq, emb, qProbe = q, qRerank = q,
      excludeSelf = excludeSelf, topK = topK, nprobe = nprobe,
      rerank = rerank)
  }

  /** The composite probe over already-guarded `(qid, qv)` query frames
    * (`qProbe` routes + builds ADC tables, `qRerank` feeds the exact
    * rescore — the filter form derives them from the assignment and
    * `emb` respectively; the external form passes one frame twice). */
  private def ivfPqTopKOver(ivf: IvfIndex, pq: PqIndex, emb: DataFrame,
      qProbe: DataFrame, qRerank: DataFrame, excludeSelf: Boolean,
      topK: Int, nprobe: Int, rerank: Int): DataFrame = {
    // geometry from the index, never the caller (see pqProbe)
    val m = pq.codebooks.length
    val dsub = pq.codebooks(0)(0).length
    val cb = typedlit(pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val wCells = Window.partitionBy("qid").orderBy(asc("d2"), asc("cell"))
    val probed = qProbe.crossJoin(broadcast(ivf.centroids))
      .withColumn("d2",
        dot(col("qv"), col("qv")) + dot(col("centroid"), col("centroid"))
          - lit(2.0) * dot(col("qv"), col("centroid")))
      .withColumn("cr", row_number().over(wCells))
      .filter(col("cr") <= nprobe)
      .withColumn("qtab", transform(sequence(lit(1), lit(m)), i =>
        transform(element_at(cb, i), cent =>
          aggregate(sequence(lit(1), lit(dsub)), lit(0.0d), (acc, d) =>
            acc + element_at(col("qv"), (i - lit(1)) * dsub + d)
              .cast("double") * element_at(cent, d).cast("double")))))
      .select("qid", "cell", "qtab")
    val codesWithCell = pq.codes
      .join(ivf.assigned.select(col("vec_id"), col("cell")), "vec_id")
    val scored0 = codesWithCell.join(broadcast(probed), "cell")
    val scored = (if (excludeSelf)
        scored0.filter(col("qid") =!= col("vec_id"))
      else scored0)
      .withColumn("approx_dot",
        aggregate(sequence(lit(1), lit(m)), lit(0.0d), (acc, i) =>
          acc + element_at(
            element_at(col("qtab"), i),
            element_at(col("code"), i) + 1)))
    val w = Window.partitionBy("qid").orderBy(desc("approx_dot"), asc("vec_id"))
    val shortlist = scored
      .withColumn("arank", row_number().over(w).cast("int"))
      .filter(col("arank") <= rerank)
      .select(col("qid"), col("vec_id").as("nid"))
    val exact = shortlist
      .join(emb.select(col("vec_id").as("nid"), col("embedding").as("nv")), "nid")
      .join(broadcast(qRerank), "qid")
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos"))
    val we = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    exact.withColumn("rank", row_number().over(we).cast("int"))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank"), col("nid"),
        round(col("cos"), 4).as("cos"))
  }

  /** Symmetric int8 scalar quantization profile per vector: the 4×
    * memory-compression step an ANN index applies before sharding, plus
    * the reconstruction-error audit that decides whether int8 is safe for
    * the corpus. Per vector: `scale` = max |component| (so q = round(v /
    * scale · 127) spans the full int8 range), the L1 mass of the quantized
    * codes (an integer — an exact cross-engine fingerprint of the code
    * assignment), and the mean absolute dequantization error, folded in
    * index order for bit-reproducibility.
    *
    * Pure per-row projection — no shuffle, no state; scales to any corpus
    * the scan scales to. Zero vectors quantize to all-zero codes. */
  def quantizationProfile(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val asD = transform(col(vecCol), x => x.cast("double"))
    emb.select(col(idCol), asD.as("v"))
      .withColumn("dim", size(col("v")).cast("int"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))))
      .withColumn("q", when(col("scale") === 0d,
          transform(col("v"), _ => lit(0)))
        .otherwise(transform(col("v"),
          x => round(x / col("scale") * 127).cast("int"))))
      .withColumn("q_l1",
        aggregate(col("q"), lit(0L), (a, x) => a + abs(x).cast("long")))
      .withColumn("err", round(
        aggregate(
          zip_with(col("v"), col("q"),
            (x, qi) => abs(x - qi.cast("double") * col("scale") / 127)),
          lit(0d), (a, e) => a + e) / col("dim"), 6))
      .select(col(idCol), col("dim"), round(col("scale"), 6).as("scale"),
        col("q_l1"), col("err"))
  }

  def cosineNearDuplicatesExact(emb: DataFrame, threshold: Double): DataFrame = {
    val normed = emb.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    normed.as("a").join(normed.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"),
        (dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("d1"), col("d2"), round(col("cos"), 4).as("cos"))
  }
}
