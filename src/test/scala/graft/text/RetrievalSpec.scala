package graft.text

import org.apache.spark.sql.functions.{col, countDistinct, max, min}

import graft.SparkTestBase

/** [[Retrieval.bm25TopK]] (t48): probe-term choice, ranking, and one
  * hand-computed score on a 4-document corpus. */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  // df: z=3 > x=2 = y=2 (ties by term asc) -> probes z, x, y
  private lazy val docs = Seq(
    (0L, "x x y"), (1L, "x z"), (2L, "y z"), (3L, "z z z z"))
    .toDF("doc_id", "text")

  test("probe terms are the highest-df terms; per-term ranking is correct") {
    val got = Retrieval.bm25TopK(docs).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // z: d3 (tf 4) outranks the tf-1 docs; d1/d2 tie on score -> doc order
    // x: d0 (tf 2) over d1;  y: shorter d2 over d0 (same tf, smaller dl)
    assert(got.toSeq == Seq(
      ("x", 1, 0L), ("x", 2, 1L),
      ("y", 1, 2L), ("y", 2, 0L),
      ("z", 1, 3L), ("z", 2, 1L), ("z", 3, 2L)))
  }

  test("hand-computed BM25 score for (z, doc 3)") {
    // N=4, avgdl=11/4; idf_z = ln(1.5/3.5 + 1); tf=4, dl=4:
    //   0.3566749... * 8.8 / (4 + 1.2*(0.25 + 0.75*4/2.75)) = 0.55958...
    val s = Retrieval.bm25TopK(docs).where("term = 'z' AND doc_id = 3")
      .collect()(0).getDouble(3)
    assert(math.abs(s - 0.5596) < 5e-4)
  }

  test("two-phase per-term top-k equals the naive single-window ranking") {
    // 40 docs sharing one hot term: the salted local phase must not lose
    // any global top-k row (every global winner ranks <= k in its bucket)
    val many = (0L until 40L).map(i =>
      (i, ("w " * (1 + (i % 7).toInt)).trim)).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(many, nTerms = 1, k = 10).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    // naive expectation, same formula replayed in plain scala: tf = dl
    // here (one repeated word), df = N, ties in score -> doc_id asc
    val dls = (0L until 40L).map(i => 1L + (i % 7))
    val avg = dls.sum.toDouble / 40
    val idf = math.log((40 - 40 + 0.5) / (40 + 0.5) + 1)
    def score(tf: Long, dl: Long): Double =
      idf * (tf * (1.2 + 1)) / (tf + 1.2 * (0.25 + 0.75 * dl / avg))
    val expectHead = (0L until 40L)
      .sortBy(i => (-score(dls(i.toInt), dls(i.toInt)), i)).take(10)
    assert(got.map(_._2).toSeq == expectHead)
    assert(got.map(_._1).toSeq == (1 to 10))
  }

  // ---- multi-term queries (t49)

  test("multi-term score is the sum of that query's single-term scores") {
    val queries = Seq((0, "x y"), (1, "z"), (2, "w q")).toDF(
      "query_id", "query_text")
    val got = Retrieval.bm25QueryTopK(docs, queries).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    // single-term reference scores over the same corpus, per (term, doc)
    val single = Retrieval.bm25TopK(docs, nTerms = 3, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(2)) -> r.getDouble(3)).toMap
    // query 0 = {x, y}: d0 matches both (x: tf2 + y: tf1), d1 x only,
    // d2 y only — n_terms_hit and the rounded sum must line up
    val q0 = got.filter(_._1 == 0)
    assert(q0.map(g => (g._3, g._5)).toSet == Set((0L, 2L), (1L, 1L), (2L, 1L)))
    val d0 = q0.find(_._3 == 0L).get
    assert(math.abs(d0._4 - (single(("x", 0L)) + single(("y", 0L)))) < 2e-4)
    // query 1 = {z}: identical ranking to the single-term probe for z
    assert(got.filter(_._1 == 1).map(g => (g._2, g._3)).toSeq ==
      Seq((1, 3L), (2, 1L), (3, 2L)))
    // query 2: no term exists in the corpus -> zero result rows
    assert(!got.exists(_._1 == 2))
  }

  test("duplicate query terms collapse; order within the query is irrelevant") {
    val q1 = Seq((0, "y x x y")).toDF("query_id", "query_text")
    val q2 = Seq((0, "x y")).toDF("query_id", "query_text")
    val r1 = Retrieval.bm25QueryTopK(docs, q1).collect().map(_.toSeq).toSeq
    val r2 = Retrieval.bm25QueryTopK(docs, q2).collect().map(_.toSeq).toSeq
    assert(r1 == r2)
  }

  test("probeQueries chunks the top-df terms into deterministic query strings") {
    val qs = Retrieval.probeQueries(docs, nQueries = 1, termsPerQuery = 3)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    // df: z=3, x=2, y=2 -> the single query is the three terms sorted
    assert(qs.toSeq == Seq((0, "x y z")))
    val two = Retrieval.probeQueries(docs, nQueries = 3, termsPerQuery = 1)
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(two.toSeq == Seq((0, "z"), (1, "x"), (2, "y")))
  }

  // ---- persisted index (t50/t51)

  test("store-backed scorers equal the from-scratch plans, including a zero-token doc") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bm25_idx").toString
    // the empty doc has NO tf rows but must still count in N and sum_dl
    // (dl = 0) — the from-scratch path prices it through tokenCount, and
    // a store that derived dl from tf would lose it
    val corpus = docs.unionByName(Seq((4L, "   ")).toDF("doc_id", "text"))
    Retrieval.buildIndex(spark, corpus, dir)
    val scratch = Retrieval.bm25TopK(corpus).collect().toSeq
    val stored = Retrieval.bm25TopKFromStore(spark, dir).collect().toSeq
    assert(stored == scratch)
    val queries = Seq((0, "x y"), (1, "z")).toDF("query_id", "query_text")
    val scratchQ = Retrieval.bm25QueryTopK(corpus, queries).collect().toSeq
    val storedQ = Retrieval.bm25QueryTopKFromStore(spark, dir, queries)
      .collect().toSeq
    assert(storedQ == scratchQ)
    // probe derivation agrees too (same df table either way)
    assert(Retrieval.probeQueriesFromStore(spark, dir).collect().toSeq ==
      Retrieval.probeQueries(corpus).collect().toSeq)
  }

  test("rebuilding the index over changed docs replaces it atomically") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bm25_idx2").toString
    Retrieval.buildIndex(spark, docs, dir)
    val grown = docs.unionByName(
      Seq((9L, "z z q q q")).toDF("doc_id", "text"))
    Retrieval.buildIndex(spark, grown, dir)
    assert(Retrieval.bm25TopKFromStore(spark, dir).collect().toSeq ==
      Retrieval.bm25TopK(grown).collect().toSeq)
  }

  test("stored frames amortize: a repeat query call reads the registered cache; a mutated store re-keys") {
    // round 12 (r11 verdict #1): storedFrames registers tf/dl/df/stats
    // in the plan-keyed cache registry keyed on the store STATE, so an
    // unchanged store serves query batches from the materialized frames
    // instead of re-aggregating df/(N, Σdl) over the full index per call
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bm25_cache").toString
    Retrieval.buildIndex(spark, docs, dir)
    val queries = Seq((0, "x y"), (1, "z")).toDF("query_id", "query_text")
    val first = Retrieval.bm25QueryTopKFromStore(spark, dir, queries)
    val want = first.collect().toSeq // materializes the registered frames
    val second = Retrieval.bm25QueryTopKFromStore(spark, dir, queries)
    assert(second.queryExecution.executedPlan.toString
      .contains("InMemoryTableScan"),
      "an unchanged store must serve from the registered frames")
    assert(second.collect().toSeq == want)
    // ANY store mutation re-keys: the rebuilt index must serve fresh
    // content, never the predecessor state's materialized cache
    val grown = docs.unionByName(
      Seq((9L, "z z q q q q q q")).toDF("doc_id", "text"))
    Retrieval.buildIndex(spark, grown, dir)
    assert(Retrieval.bm25QueryTopKFromStore(spark, dir, queries)
      .collect().toSeq ==
      Retrieval.bm25QueryTopK(grown, queries).collect().toSeq,
      "a mutated store served stale cached frames")
  }

  test("term-bucket pruning: pruned scan keeps exactly the query buckets; results equal the unpruned plan; old-layout stores serve unpruned") {
    // round 12: the posting-list read — the stored scoring scan prunes
    // to the buckets of the query's terms via a pushed IN on the tb
    // data column written by indexRows
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bm25_tb").toString
    // enough distinct terms that the probe terms cannot cover every
    // bucket (50 fillers + the scored x/y/z spread over 64 buckets)
    val wide = docs.unionByName(
      (0 until 50).map(i => (100L + i, s"filler$i")).toDF("doc_id", "text"))
    Retrieval.buildIndex(spark, wide, dir)
    val queries = Seq((0, "x y"), (1, "z")).toDF("query_id", "query_text")
    val want = Retrieval.bm25QueryTopK(wide, queries).collect().toSeq
    assert(Retrieval.bm25QueryTopKFromStore(spark, dir, queries)
      .collect().toSeq == want)
    // the pruned frame holds exactly the query terms' buckets, and
    // strictly fewer rows than the full table (the fillers pruned away)
    val tf = spark.read.option("basePath", s"$dir/tf")
      .parquet(s"$dir/tf").drop("batch")
    val qTerms = Seq("x", "y", "z").toDF("term")
    val wantBuckets = qTerms
      .select(Retrieval.termBucket(col("term")).as("tb"))
      .distinct().collect().map(_.getInt(0)).toSet
    val pruned = Retrieval.prunedTf(tf, qTerms)
    assert(pruned.select("tb").distinct().collect()
      .map(_.getInt(0)).toSet.subsetOf(wantBuckets))
    assert(pruned.count() < tf.count(),
      "pruning must actually drop the other buckets' postings")
    // the escape hatch serves the identical result unpruned
    spark.conf.set("graft.retrieval.pruneTermBuckets", "false")
    try assert(Retrieval.bm25QueryTopKFromStore(spark, dir, queries)
      .collect().toSeq == want)
    finally spark.conf.unset("graft.retrieval.pruneTermBuckets")
    // a store written before the tb column existed reads unprunable and
    // serves the same answers (the upgrade path is maintainCorpus →
    // reindex, which rewrites tf with the column)
    val oldTf = tf.drop("tb").localCheckpoint()
    val f = new org.apache.hadoop.fs.Path(s"$dir/tf")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(s"$dir/tf"), true)
    oldTf.write.parquet(s"$dir/tf/batch=-1")
    assert(Retrieval.bm25QueryTopKFromStore(spark, dir, queries)
      .collect().toSeq == want)
    // MIXED layout (round 13, the r12 ADVICE hole): the old-layout
    // store then receives a BUCKETED commit — one directory, both
    // layouts. Under the merged schema the old slices read tb = null,
    // and a bare IN would silently drop every one of their postings;
    // the null-safe predicate must keep them, so the store still
    // matches the from-scratch scorer over the union corpus.
    val extra = Seq((200L, "z y z extra")).toDF("doc_id", "text")
    val (tfNew, dlNew) = Retrieval.indexRows(extra)
    tfNew.write.parquet(s"$dir/tf/batch=0")
    dlNew.write.parquet(s"$dir/dl/batch=0")
    val mixedWant = Retrieval.bm25QueryTopK(wide.unionByName(extra), queries)
      .collect().toSeq
    assert(Retrieval.bm25QueryTopKFromStore(spark, dir, queries)
      .collect().toSeq == mixedWant,
      "a mixed-layout tf store dropped old-slice postings under pruning")
  }

  test("the sparse query broadcast is capped like the dense one, in QUERY-row units, and the auto-chunker clears it") {
    // round 12: the one query-shaped broadcast that was still uncapped.
    // Round 13 (r12 ADVICE): the guard prices QUERY rows — the same
    // unit every other consumer of the conf uses — so a batch the
    // auto-chunker sized to the cap clears this guard by construction,
    // with no capOverride arithmetic.
    val queries = Seq((0, "x y"), (1, "z"), (2, "x z"), (3, "y"))
      .toDF("query_id", "query_text")
    val want = Retrieval.bm25QueryTopK(docs, queries)
      .collect().map(_.toSeq).toSet
    spark.conf.set("graft.similarity.maxBroadcastQueries", "1")
    try {
      val e = intercept[Exception] {
        Retrieval.bm25QueryTopK(docs, queries).collect()
      }
      assert(e.getMessage.contains("maxBroadcastQueries"),
        s"expected the loud cap refusal, got: ${e.getMessage}")
      // the prescribed executor sizes itself off the SAME conf the
      // guard reads, so each chunk holds <= 1 query and clears the cap
      val chunked = graft.similarity.Similarity.chunkedByQueryFrameAuto(
        queries, idCol = "query_id")(c =>
        Retrieval.bm25QueryTopK(docs, c))
        .collect().map(_.toSeq).toSet
      assert(chunked == want)
    } finally spark.conf.unset("graft.similarity.maxBroadcastQueries")
  }

  test("PRF expansion: feedback docs nominate a new term, the requery reaches docs the query never matched, store equals scratch") {
    // round 13: query "a" matches d0/d1 only; their top terms nominate
    // "b" (rate 2/3 from d0 beats "c" at 1/2 from d1), and the
    // expanded query {a, b} reaches d2 ("b b b") — recall the original
    // query structurally cannot have
    val corpus = Seq(
      (0L, "a b b"), (1L, "a c"), (2L, "b b b"), (3L, "c c q"))
      .toDF("doc_id", "text")
    val q = Seq((0, "a")).toDF("query_id", "query_text")
    val base = Retrieval.bm25QueryTopK(corpus, q).collect()
    assert(!base.map(_.getLong(2)).contains(2L),
      "fixture sanity: the unexpanded query must not reach d2")
    val prf = Retrieval.bm25PrfTopK(corpus, q, fbDocs = 2, fbTerms = 1)
    val rows = prf.collect()
    assert(rows.map(_.getLong(2)).contains(2L),
      "the expanded query must reach the b-only document")
    // d0 hits both terms of the expanded query, d2 only the expansion
    val hits = rows.map(r => r.getLong(2) -> r.getLong(4)).toMap
    assert(hits(0L) == 2L && hits(2L) == 1L)
    // the query's own term is excluded from expansion: with "a" the
    // only candidate term in d1 besides a is c — had "a" been eligible
    // it would win on weight 1/2 + 1/3; reaching d2 proves b won
    // fbTerms = 0 degrades to the plain multi-term scorer exactly
    assert(Retrieval.bm25PrfTopK(corpus, q, fbDocs = 2, fbTerms = 0)
      .collect().toSeq == Retrieval.bm25QueryTopK(corpus, q).collect().toSeq)
    // the persisted-index twin is bit-identical (shared arithmetic)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bm25_prf").toString
    Retrieval.buildIndex(spark, corpus, dir)
    assert(Retrieval.bm25PrfTopKFromStore(spark, dir, q, fbDocs = 2,
      fbTerms = 1).collect().toSeq == rows.toSeq)
  }

  test("forward index: fwd is tf ⋈ dl doc-bucketed; PRF serves identically through fwd, the escape hatch, and a pre-fwd store") {
    // round 14 (r13 verdict top item): the PRF fixture corpus again —
    // three code paths for stage 2's feedback-term fetch must be
    // bit-identical: the doc-keyed fwd seek (the default on a round-14
    // store), the conf escape hatch, and the pre-fwd store's tf-scan
    // fallback
    val corpus = Seq(
      (0L, "a b b"), (1L, "a c"), (2L, "b b b"), (3L, "c c q"))
      .toDF("doc_id", "text")
    val q = Seq((0, "a")).toDF("query_id", "query_text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fwd").toString
    Retrieval.buildIndex(spark, corpus, dir)
    // shape: one fwd row per tf posting, the doc's length denormalized
    // in, the doc bucket a DATA column in the clustering range
    val fwd = spark.read.option("basePath", s"$dir/fwd")
      .parquet(s"$dir/fwd")
    assert(fwd.columns.toSet ==
      Set("doc_id", "term", "tf", "dl", "db", "batch"))
    assert(fwd.count() ==
      spark.read.option("basePath", s"$dir/tf").parquet(s"$dir/tf").count())
    val dbRange = fwd.agg(min("db"), max("db")).head()
    assert(dbRange.getInt(0) >= 0 && dbRange.getInt(1) < 64)
    // one doc's rows all share one bucket (it IS a doc hash)
    assert(fwd.groupBy("doc_id").agg(countDistinct("db").as("n"))
      .filter(col("n") =!= 1).count() == 0L)
    val withFwd = Retrieval.bm25PrfTopKFromStore(spark, dir, q,
      fbDocs = 2, fbTerms = 1).collect().toSeq
    assert(withFwd.nonEmpty)
    // escape hatch: useForwardIndex=false forces the r13 scan path
    spark.conf.set("graft.retrieval.useForwardIndex", "false")
    try assert(Retrieval.bm25PrfTopKFromStore(spark, dir, q,
      fbDocs = 2, fbTerms = 1).collect().toSeq == withFwd)
    finally spark.conf.unset("graft.retrieval.useForwardIndex")
    // a store predating fwd/ (round ≤ 13) falls back to the same scan
    val p = new org.apache.hadoop.fs.Path(s"$dir/fwd")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    assert(Retrieval.bm25PrfTopKFromStore(spark, dir, q,
      fbDocs = 2, fbTerms = 1).collect().toSeq == withFwd)
  }

  test("rankEval: a judged query the run never served surfaces as a zero-metric row, not a dropped one") {
    // round 14 (r13 ADVICE): query 2 is judged (n_rel = 2) but absent
    // from the run — averaging consumers must see its zeros, or every
    // mean silently overstates. Query 0 stays the exact single-hit case.
    val run = Seq((0L, 10L, 1)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((0L, 10L, 1L), (2L, 50L, 1L), (2L, 60L, 2L))
      .toDF("query_id", "doc_id", "grade")
    val rows = Retrieval.rankEval(run, qrels, k = 3).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 2L))
    val q0 = rows(0)
    assert(q0.getDouble(1) == 1.0 && q0.getDouble(2) == 1.0 &&
      q0.getDouble(3) == 1.0 && q0.getDouble(4) == 1.0 &&
      q0.getLong(5) == 1L)
    val q2 = rows(1)
    assert(q2.getDouble(1) == 0.0 && q2.getDouble(2) == 0.0 &&
      q2.getDouble(3) == 0.0 && q2.getDouble(4) == 0.0,
      s"judged-but-unserved query must read zero metrics: $q2")
    assert(q2.getLong(5) == 2L, "with its TRUE judgment count attached")
  }

  test("Dirichlet query likelihood: hand-computed score, ranking, store equals scratch") {
    // query "z" over the suite corpus: N=4, |C|=11, ctf_z=6, mu=2000.
    // d3 (tf 4, dl 4): ln(1 + 44/12000) + ln(2000/2004) = 0.0016620...
    // d1/d2 (tf 1, dl 2) tie at ln(1 + 11/12000) + ln(2000/2002) < 0
    // -> ranking d3, d1, d2 (tie to the smaller doc_id)
    val q = Seq((0, "z")).toDF("query_id", "query_text")
    val rows = Retrieval.lmTopK(docs, q).collect()
    assert(rows.map(r => (r.getInt(1), r.getLong(2))).toSeq ==
      Seq((1, 3L), (2, 1L), (3, 2L)))
    val expect = math.log(1 + 44.0 / 12000.0) + math.log(2000.0 / 2004.0)
    assert(math.abs(rows(0).getDouble(3) -
      math.rint(expect * 1e4) / 1e4) < 1e-9)
    // a doc with NO query term is not a candidate (documented convention)
    assert(rows.length == 3)
    // the persisted-index twin is bit-identical
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lm_store").toString
    Retrieval.buildIndex(spark, docs, dir)
    assert(Retrieval.lmTopKFromStore(spark, dir, q).collect().toSeq ==
      rows.toSeq)
  }

  test("rankEval: hand-computed nDCG/MRR/recall; judgment-free queries report NULL, not fake zeros") {
    val run = Seq((0L, 10L, 1), (0L, 20L, 2), (0L, 30L, 3),
      (1L, 10L, 1)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((0L, 20L, 2L), (0L, 40L, 1L))
      .toDF("query_id", "doc_id", "grade")
    val rows = Retrieval.rankEval(run, qrels, k = 3).collect()
    val q0 = rows.find(_.getLong(0) == 0L).get
    // DCG = 2/log2(3); IDCG = 2/log2(2) + 1/log2(3)
    val dcg = 2.0 / (math.log(3) / math.log(2))
    val idcg = 2.0 + 1.0 / (math.log(3) / math.log(2))
    assert(math.abs(q0.getDouble(1) - dcg / idcg) < 1e-5)
    assert(q0.getDouble(2) == 0.5) // first relevant at rank 2
    assert(q0.getDouble(3) == 0.5 && q0.getLong(5) == 2L) // 1 of 2 rel in k
    // AP: one relevant hit at rank 2 -> precision 1/2; / n_rel 2 = 0.25
    assert(q0.getDouble(4) == 0.25)
    // a query with no positive judgment: metrics that would divide by
    // zero read NULL (reported, not silently 0); MRR is honestly 0
    val q1 = rows.find(_.getLong(0) == 1L).get
    assert(q1.isNullAt(1) && q1.getDouble(2) == 0.0 && q1.isNullAt(3) &&
      q1.isNullAt(4) && q1.getLong(5) == 0L)
  }

  test("a store without BM25 tables refuses loudly with the repair op named") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bm25_none").toString
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25TopKFromStore(spark, dir).collect()
    }
    assert(e.getMessage.contains("reindex") ||
      e.getMessage.contains("buildIndex"))
  }

  // ---- dense+sparse fusion (t52)

  test("rrfFuse: hand-computed fusion, one-list docs, tie-break, n_lists") {
    val dense = Seq((0L, 1, 100L), (0L, 2, 101L), (1L, 1, 300L))
      .toDF("query_id", "rank", "doc_id")
      .select($"query_id", $"rank", $"doc_id")
    val sparse = Seq((0L, 1, 101L), (0L, 2, 200L), (1L, 1, 301L))
      .toDF("query_id", "rank", "doc_id")
    val got = Retrieval.rrfFuse(dense, sparse, k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getAs[java.lang.Integer](4), r.getAs[java.lang.Integer](5),
        r.getInt(6)))
    // query 0: doc 101 in BOTH lists (1/62 + 1/61 = .032522) wins over
    // dense-rank-1 doc 100 (1/61 = .016393) and sparse-rank-2 doc 200
    // (1/62 = .016129)
    assert(got.filter(_._1 == 0L).toSeq == Seq(
      (0L, 1, 101L, 0.032522, Integer.valueOf(2), Integer.valueOf(1), 2),
      (0L, 2, 100L, 0.016393, Integer.valueOf(1), null, 1),
      (0L, 3, 200L, 0.016129, null, Integer.valueOf(2), 1)))
    // query 1: docs 300 (dense only) and 301 (sparse only) tie at 1/61
    // exactly -> smaller doc_id first
    assert(got.filter(_._1 == 1L).map(r => (r._2, r._3)).toSeq ==
      Seq((1, 300L), (2, 301L)))
  }

  test("rrfFuseAll: two lists bit-match rrfFuse; three lists fuse a hand fixture") {
    val dense = Seq((0L, 1, 100L), (0L, 2, 101L), (1L, 1, 300L))
      .toDF("query_id", "rank", "doc_id")
    val sparse = Seq((0L, 1, 101L), (0L, 2, 200L), (1L, 1, 301L))
      .toDF("query_id", "rank", "doc_id")
    val two = Retrieval.rrfFuseAll(Seq(dense, sparse), k = 10)
      .select("query_id", "rank", "doc_id", "rrf", "n_lists")
      .collect().map(_.toSeq).toSeq
    val ref = Retrieval.rrfFuse(dense, sparse, k = 10)
      .select("query_id", "rank", "doc_id", "rrf", "n_lists")
      .collect().map(_.toSeq).toSeq
    assert(two == ref, "two-list rrfFuseAll must bit-match rrfFuse")
    // three lists: doc 101 ranked by all three at ranks 2/1/1 →
    // 1/62 + 1/61 + 1/61 = .048916; doc 100 by dense rank 1 + recency
    // rank 2 → 1/61 + 1/62 = .032522; doc 200 sparse-only at 1/62
    val recency = Seq((0L, 1, 101L), (0L, 2, 100L)).toDF("query_id", "rank", "doc_id")
    val three = Retrieval.rrfFuseAll(Seq(dense, sparse, recency), k = 10)
      .filter($"query_id" === 0L).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(three.toSeq == Seq(
      (1, 101L, 0.048916, 3),
      (2, 100L, 0.032522, 2),
      (3, 200L, 0.016129, 1)))
  }

  test("rrfFuse is rank-driven: score scales never matter, k caps per query") {
    // identical ranks under wildly different scores fuse identically —
    // feed the real scorers' outputs for shape compatibility
    val queries = Seq((0, "x y"), (1, "z")).toDF("query_id", "query_text")
    val sparse = Retrieval.bm25QueryTopK(docs, queries)
    val dense = sparse.select($"query_id", $"rank", $"doc_id") // rank-equal twin
    val fused = Retrieval.rrfFuse(dense, sparse, k = 2)
    val rows = fused.collect()
    assert(rows.forall(_.getInt(6) == 2), "rank-equal lists fuse every doc from both")
    // fused order == either list's order (same ranks both sides)
    val want = sparse.filter($"rank" <= 2).select($"query_id", $"rank",
      $"doc_id").collect().map(r => (r.getInt(0).toLong, r.getInt(1),
      r.getLong(2))).toSet
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      == want)
  }

  test("t49 contract row shape at sf0.001") {
    val rows = graft.operators.TrainingData
      .t49Bm25MultiTerm(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getInt(0))
    assert(byQ.keySet.subsetOf(Set(0, 1, 2)))
    byQ.values.foreach { qr =>
      assert(qr.map(_.getInt(1)).sorted.toSeq == (1 to qr.length)) // dense ranks
      assert(qr.forall(r => r.getLong(4) >= 1L && r.getLong(4) <= 3L))
    }
  }
}
