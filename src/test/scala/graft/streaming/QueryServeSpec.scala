package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.{IndexStore, Similarity}
import graft.text.Retrieval

/** Streamed hybrid serving ([[QueryServe]]): micro-batched requests
  * answered off the persisted stores must equal one direct serve over
  * the same requests (per-query decomposability IS the micro-batch
  * split), a crash-replay of a batch rewrites its own slice
  * byte-identically, and the high-water guard refuses a
  * fresh-checkpoint stream pointed at an existing results store. */
class QueryServeSpec extends SparkTestBase {
  import spark.implicits._

  // persisted stores over sf0.001, built once for the suite
  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_qserve").toString
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
    Retrieval.buildIndex(spark, docs, s"$r/corpus")
    val ivf = Similarity.buildIvfIndex(emb)
    val pq = Similarity.buildPqIndex(emb)
    IndexStore.saveIvf(ivf, s"$r/ivf")
    IndexStore.savePq(pq, s"$r/pq")
    ivf.release(); pq.release()
    r
  }

  /** Requests in their own id space: member text + member vectors of
    * the same row, re-labeled — the shape an encoder produces. */
  private lazy val requests: DataFrame = {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
    docs.filter(col("doc_id") < 6)
      .select((col("doc_id") + 900L).as("query_id"),
        col("text").as("query_text"))
      .join(emb.filter(col("vec_id") < 6)
        .select((col("vec_id") + 900L).as("query_id"), col("embedding")),
        "query_id")
  }

  private def served(resultsDir: String) =
    QueryServe.results(spark, resultsDir)
      .select("query_id", "rank", "doc_id", "rrf")
      .collect().map(_.toSeq).toSet

  test("stream equals batch: micro-batched serve == one direct serve") {
    val dropDir = Files.createTempDirectory("graft_qserve_drop").toString
    val resultsDir = Files.createTempDirectory("graft_qserve_res").toString
    val ckpt = Files.createTempDirectory("graft_qserve_ckpt").toString
    // two files -> the file source may batch them together or apart;
    // either way the union of slices must equal the direct serve
    requests.filter(col("query_id") < 903L).coalesce(1)
      .write.mode("append").parquet(dropDir)
    requests.filter(col("query_id") >= 903L).coalesce(1)
      .write.mode("append").parquet(dropDir)

    val q = QueryServe.start(spark, dropDir, s"$root/corpus", s"$root/ivf",
      s"$root/pq", resultsDir, ckpt)
    q.processAllAvailable()
    q.stop()

    val direct = Retrieval.hybridTopKFromStoresExternal(spark,
      s"$root/corpus", s"$root/ivf", s"$root/pq", requests)
      .select("query_id", "rank", "doc_id", "rrf")
      .collect().map(_.toSeq).toSet
    assert(direct.nonEmpty && served(resultsDir) == direct)
  }

  test("compaction folds slices content-identically; prune drops consumed history without resurrection") {
    val resultsDir = Files.createTempDirectory("graft_qserve_cp").toString
    val server = new QueryServe.Server(spark, s"$root/corpus",
      s"$root/ivf", s"$root/pq", resultsDir)
    val b0 = requests.filter(col("query_id") < 903L)
    val b1 = requests.filter(col("query_id") >= 903L)
    server.serveBatch(b0, 0L)
    server.serveBatch(b1, 1L)
    // retention first: consumed batch 0 drops, batch 1 stays, and the
    // high-water marker still refuses a replay of the pruned batch
    val batch1 = QueryServe.results(spark, resultsDir)
      .filter(col("batch") === 1L)
      .select("query_id", "rank", "doc_id", "rrf")
      .collect().map(_.toSeq).toSet
    QueryServe.prune(spark, resultsDir, keepFrom = 1L)
    assert(served(resultsDir) == batch1, "prune must drop exactly batch 0")
    intercept[IllegalArgumentException](server.serveBatch(b0, 0L))
    // compaction: content identical, slices folded to the consolidated one
    val before = served(resultsDir)
    QueryServe.compact(spark, resultsDir)
    assert(served(resultsDir) == before)
    val slices = new org.apache.hadoop.fs.Path(s"$resultsDir/served")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(new org.apache.hadoop.fs.Path(s"$resultsDir/served"))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).toSet
    assert(slices == Set("batch=-1"), s"expected one consolidated slice, got $slices")
    // provenance survives the fold: the consolidated slice still says
    // which request batch delivered each row (round 12)
    assert(QueryServe.results(spark, resultsDir).select("req_batch")
      .distinct().collect().map(_.getLong(0)).toSet == Set(1L))
    // a crash-replay of the FOLDED high-water batch must refuse — its
    // rows live in batch=-1 now, and a rewrite would duplicate them
    // (ADVICE r11: the replay-convergence invariant across a compaction)
    val straddle = intercept[IllegalArgumentException](server.serveBatch(b1, 1L))
    assert(straddle.getMessage.contains("batch=-1"))
    // and the store still serves NEW batches: the guard survived the fold
    server.serveBatch(b0.limit(1), 2L)
    assert(served(resultsDir).size > before.size)
  }

  test("results() on a store nothing has reached is an empty typed frame, not an error") {
    val resultsDir = Files.createTempDirectory("graft_qserve_empty").toString
    // missing entirely
    val r0 = QueryServe.results(spark, resultsDir)
    assert(r0.isEmpty && r0.columns.contains("req_batch"))
    // only an EMPTY batch committed: marker published, no slice written
    val server = new QueryServe.Server(spark, s"$root/corpus",
      s"$root/ivf", s"$root/pq", resultsDir)
    server.serveBatch(requests.limit(0), 0L)
    assert(BatchMarker.maxCommitted(spark, resultsDir) == 0L)
    assert(QueryServe.results(spark, resultsDir).isEmpty)
    // pruned to zero slices: still an empty frame, still no resurrection
    server.serveBatch(requests.filter(col("query_id") === 900L), 1L)
    QueryServe.prune(spark, resultsDir, keepFrom = 2L)
    assert(QueryServe.results(spark, resultsDir).isEmpty)
    intercept[IllegalArgumentException](
      server.serveBatch(requests.filter(col("query_id") === 900L), 0L))
  }

  test("maintainResults: a serve loop with scheduled retention keeps storage bounded by the window") {
    val resultsDir = Files.createTempDirectory("graft_qserve_ret").toString
    val server = new QueryServe.Server(spark, s"$root/corpus",
      s"$root/ivf", s"$root/pq", resultsDir)
    def oneReq(i: Long) = requests.filter(col("query_id") === 900L + i)
    var bid = 0L
    (0 until 3).foreach { _ =>
      // serve session: two one-request batches, then the scheduled
      // maintenance window (stream stopped, like every maintenance op)
      server.serveBatch(oneReq(bid % 6), bid); bid += 1
      server.serveBatch(oneReq(bid % 6), bid); bid += 1
      val rep = QueryServe.maintainResults(spark, resultsDir,
        retainLast = 2).head()
      assert(rep.getAs[Boolean]("executed"))
      assert(rep.getAs[Long]("high_water") == bid - 1)
      assert(rep.getAs[Long]("slices_after") == 1L,
        "the cycle must leave ONE consolidated slice")
      // BOUNDED: the consolidated slice holds only the retention
      // window's request batches — prior folds' rows aged out by
      // req_batch, not carried forever
      val kept = QueryServe.results(spark, resultsDir)
        .select("req_batch").distinct().collect()
        .map(_.getLong(0)).toSet
      assert(kept == Set(bid - 2, bid - 1),
        s"retention window must be the last 2 batches, got $kept")
    }
    // replay discipline intact across the cycles: the folded high-water
    // batch refuses (straddle), an aged-out batch refuses (high water)
    val e1 = intercept[IllegalArgumentException](
      server.serveBatch(oneReq((bid - 1) % 6), bid - 1))
    assert(e1.getMessage.contains("batch=-1"))
    val e2 = intercept[IllegalArgumentException](
      server.serveBatch(oneReq(0), 0L))
    assert(e2.getMessage.contains("high-water mark"))
    // and the loop continues: the next real batch serves normally
    server.serveBatch(oneReq(3), bid)
    assert(QueryServe.results(spark, resultsDir)
      .filter(col("req_batch") === bid).count() > 0)
  }

  test("ServingStatus: one metadata-only report over all four stores") {
    val resultsDir = Files.createTempDirectory("graft_qserve_stat").toString
    val server = new QueryServe.Server(spark, s"$root/corpus",
      s"$root/ivf", s"$root/pq", resultsDir)
    server.serveBatch(requests.filter(col("query_id") < 903L), 0L)
    server.serveBatch(requests.filter(col("query_id") >= 903L), 1L)
    val r = ServingStatus.report(spark, s"$root/corpus", s"$root/ivf",
      s"$root/pq", resultsDir).head()
    assert(r.getAs[Boolean]("corpus_exists") &&
      r.getAs[Boolean]("tf_present") && r.getAs[Boolean]("dl_present"))
    assert(r.getAs[Boolean]("tf_bucketed"),
      "a round-12 buildIndex store must read as bucketed")
    assert(r.getAs[Boolean]("fwd_present"),
      "a round-14 buildIndex store carries the doc-keyed forward index")
    assert(r.isNullAt(r.fieldIndex("dials_ndcg")) &&
      r.isNullAt(r.fieldIndex("dials_ap")),
      "no judgments ran for this fixture — eval columns must read null")
    assert(r.getAs[Boolean]("ivf_exists") && r.getAs[Boolean]("pq_exists"))
    assert(!r.getAs[Boolean]("pq_retrain_inflight"))
    // saveIvf/savePq stores are not streamed: high water −1
    assert(r.getAs[Long]("ivf_high_water") == -1L)
    assert(r.isNullAt(r.fieldIndex("dials_nprobe")),
      "no recommendation persisted for this fixture")
    assert(r.getAs[Long]("results_high_water") == 1L &&
      r.getAs[Int]("results_slices") == 2 &&
      !r.getAs[Boolean]("results_consolidated"))
    // round 13 footprint fields: the corpus tf slice count the serve
    // path reasons about, and the delivery log's retained rows +
    // req_batch resume window
    assert(r.getAs[Int]("tf_slices") >= 1)
    assert(r.getAs[Long]("results_retained_rows") ==
      QueryServe.results(spark, resultsDir).count())
    assert(r.getAs[Long]("results_req_batch_min") == 0L &&
      r.getAs[Long]("results_req_batch_max") == 1L)
    // after a maintenance fold the footprint reads consolidated
    QueryServe.maintainResults(spark, resultsDir, retainLast = 2)
    val r2 = ServingStatus.report(spark, s"$root/corpus", s"$root/ivf",
      s"$root/pq", resultsDir).head()
    assert(r2.getAs[Int]("results_slices") == 0 &&
      r2.getAs[Boolean]("results_consolidated"))
    assert(r2.getAs[Long]("results_retained_rows") > 0L &&
      r2.getAs[Long]("results_req_batch_max") == 1L,
      "the fold must not change the retained req_batch window")
    // a deletion shows up as a live tombstone slice until purged
    import graft.similarity.IndexStore
    IndexStore.delete(spark, s"$root/ivf", Seq(9999L).toDF("vec_id"))
    try {
      assert(ServingStatus.report(spark, s"$root/corpus", s"$root/ivf",
        s"$root/pq", resultsDir).head().getAs[Int]("ivf_tombstones") == 1)
    } finally IndexStore.purgeDeletes(spark, s"$root/ivf")
  }

  test("dial precedence: explicit args beat the persisted _dials, which beat the defaults") {
    def servedDials(rd: String): (Int, Int, Int) = {
      val r = QueryServe.results(spark, rd)
        .select("nprobe", "rerank", "k_rrf")
        .distinct().collect()
      assert(r.length == 1, s"expected one dial tuple, got ${r.length}")
      (r(0).getInt(0), r(0).getInt(1), r(0).getInt(2))
    }
    val oneReq = requests.filter(col("query_id") === 900L)
    // no _dials table: the (4, 50, 60) defaults
    val rd1 = Files.createTempDirectory("graft_qserve_d1").toString
    new QueryServe.Server(spark, s"$root/corpus", s"$root/ivf",
      s"$root/pq", rd1).serveBatch(oneReq, 0L)
    assert(servedDials(rd1) == (4, 50, 60))
    // a maintenance recommendation persisted beside the IVF index is
    // read at server construction (= stream start); one WITHOUT a kRrf
    // (a dense-only SLA, or a pre-round-13 table) leaves the fusion
    // default standing
    IndexMaintenance.writeDials(spark, s"$root/ivf", 6, 80, 0.93)
    try {
      val rd2 = Files.createTempDirectory("graft_qserve_d2").toString
      new QueryServe.Server(spark, s"$root/corpus", s"$root/ivf",
        s"$root/pq", rd2).serveBatch(oneReq, 0L)
      assert(servedDials(rd2) == (6, 80, 60))
      // a recommendation carrying the sparse half's dial serves it
      // (round 13: the _dials row resolves BOTH halves)
      IndexMaintenance.writeDials(spark, s"$root/ivf", 6, 80, 0.93,
        kRrf = Some(30))
      val rd2b = Files.createTempDirectory("graft_qserve_d2b").toString
      new QueryServe.Server(spark, s"$root/corpus", s"$root/ivf",
        s"$root/pq", rd2b).serveBatch(oneReq, 0L)
      assert(servedDials(rd2b) == (6, 80, 30))
      // explicit args always win
      val rd3 = Files.createTempDirectory("graft_qserve_d3").toString
      new QueryServe.Server(spark, s"$root/corpus", s"$root/ivf",
        s"$root/pq", rd3, nprobe = Some(2), rerank = Some(10),
        kRrf = Some(90))
        .serveBatch(oneReq, 0L)
      assert(servedDials(rd3) == (2, 10, 90))
    } finally {
      // the suite's other servers must keep resolving the defaults
      val p = new org.apache.hadoop.fs.Path(s"$root/ivf/_dials")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("an over-cap request batch serves CHUNKED — degraded, not dead — byte-identical to the direct serve") {
    // round 13, r11 verdict #1 (top item): a request file past the
    // broadcast cap used to detonate the guard inside serveBatch and
    // crash-loop the stream on the same poison batch at every restart;
    // the server now degrades to the auto-chunked executor
    val rdA = Files.createTempDirectory("graft_qserve_ckA").toString
    val rdB = Files.createTempDirectory("graft_qserve_ckB").toString
    new QueryServe.Server(spark, s"$root/corpus", s"$root/ivf",
      s"$root/pq", rdA).serveBatch(requests, 0L)
    val want = QueryServe.results(spark, rdA).drop("batch")
      .collect().map(_.toSeq).toSet
    spark.conf.set("graft.similarity.maxBroadcastQueries", "2")
    try {
      // 6 requests > cap 2: the direct library call refuses loudly...
      intercept[Throwable] {
        Retrieval.hybridTopKFromStoresExternal(spark, s"$root/corpus",
          s"$root/ivf", s"$root/pq", requests).collect()
      }
      // ...but the SERVER chunks and the slice is byte-identical
      val server = new QueryServe.Server(spark, s"$root/corpus",
        s"$root/ivf", s"$root/pq", rdB)
      server.serveBatch(requests, 0L)
      assert(QueryServe.results(spark, rdB).drop("batch")
        .collect().map(_.toSeq).toSet == want)
      // replay idempotence survives the chunked path
      server.serveBatch(requests, 0L)
      assert(QueryServe.results(spark, rdB).drop("batch")
        .collect().map(_.toSeq).toSet == want)
    } finally spark.conf.unset("graft.similarity.maxBroadcastQueries")
  }

  test("maintenance refuses to fold a slice the stream never committed") {
    // round 13, r12 ADVICE (medium): crash AFTER the slice write but
    // BEFORE the marker publish, then a compaction — folding the orphan
    // would duplicate its rows against the replay's rewrite
    val rd = Files.createTempDirectory("graft_qserve_orph").toString
    val server = new QueryServe.Server(spark, s"$root/corpus",
      s"$root/ivf", s"$root/pq", rd)
    server.serveBatch(requests.filter(col("query_id") < 903L), 0L)
    server.serveBatch(requests.filter(col("query_id") >= 903L), 1L)
    // simulate the crash window: a written-but-unpublished batch=2
    val orphan = spark.read.parquet(s"$rd/served/batch=1")
    orphan.write.parquet(s"$rd/served/batch=2")
    assert(BatchMarker.maxCommitted(spark, rd) == 1L)
    val e1 = intercept[IllegalArgumentException](QueryServe.compact(spark, rd))
    assert(e1.getMessage.contains("high-water"))
    val e2 = intercept[IllegalArgumentException](
      QueryServe.maintainResults(spark, rd, retainLast = 10))
    assert(e2.getMessage.contains("high-water"))
    // the stream's own replay rewrites AND COMMITS the batch; then
    // maintenance folds normally with no duplication
    server.serveBatch(requests.filter(col("query_id") >= 903L), 2L)
    val before = served(rd)
    QueryServe.compact(spark, rd)
    assert(served(rd) == before)
    val dup = QueryServe.results(spark, rd)
      .groupBy("query_id", "doc_id", "req_batch").count()
      .filter(col("count") > 1).count()
    assert(dup == 0L, "the fold duplicated served rows")
  }

  test("serve modes: dense-only and sparse-only off the same stores, one result schema") {
    // round 13, r12 verdict #4 — rrfFuseAll's serving consumers
    val rdD = Files.createTempDirectory("graft_qserve_md").toString
    val rdS = Files.createTempDirectory("graft_qserve_ms").toString
    new QueryServe.Server(spark, s"$root/corpus", s"$root/ivf",
      s"$root/pq", rdD, lists = Seq("dense")).serveBatch(requests, 0L)
    new QueryServe.Server(spark, s"$root/corpus", s"$root/ivf",
      s"$root/pq", rdS, lists = Seq("sparse")).serveBatch(requests, 0L)
    val d = QueryServe.results(spark, rdD)
    val s = QueryServe.results(spark, rdS)
    // provenance names the list set; the absent list's rank is null
    assert(d.select("fused_lists").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("dense"))
    assert(s.select("fused_lists").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("sparse"))
    assert(d.filter(col("sparse_rank").isNotNull).count() == 0L &&
      d.filter(col("n_lists") =!= 1).count() == 0L)
    assert(s.filter(col("dense_rank").isNotNull).count() == 0L)
    // a single list's RRF transform is monotone: the served ranks ARE
    // the retriever's ranks
    assert(d.filter(col("rank") =!= col("dense_rank")).count() == 0L)
    assert(s.filter(col("rank") =!= col("sparse_rank")).count() == 0L)
    // and each mode equals the library's direct single-list serve
    val dWant = Retrieval.hybridTopKFromStoresExternal(spark,
      s"$root/corpus", s"$root/ivf", s"$root/pq", requests,
      lists = Seq("dense")).collect().map(_.toSeq).toSet
    assert(d.select("query_id", "rank", "doc_id", "rrf", "dense_rank",
      "sparse_rank", "lm_rank", "n_lists").collect().map(_.toSeq)
      .toSet == dWant)
    val sWant = Retrieval.hybridTopKFromStoresExternal(spark,
      s"$root/corpus", s"$root/ivf", s"$root/pq", requests,
      lists = Seq("sparse")).collect().map(_.toSeq).toSet
    assert(s.select("query_id", "rank", "doc_id", "rrf", "dense_rank",
      "sparse_rank", "lm_rank", "n_lists").collect().map(_.toSeq)
      .toSet == sWant)
    // a single-list deployment needs only ITS stores: dense-only never
    // touches the corpus store (t54 pins the mirror: sparse-only never
    // touches the IVF/PQ stores)
    val rdD2 = Files.createTempDirectory("graft_qserve_md2").toString
    new QueryServe.Server(spark, s"$root/absent_corpus", s"$root/ivf",
      s"$root/pq", rdD2, lists = Seq("dense")).serveBatch(requests, 0L)
    assert(QueryServe.results(spark, rdD2)
      .select("query_id", "rank", "doc_id", "rrf").collect().map(_.toSeq)
      .toSet ==
      d.select("query_id", "rank", "doc_id", "rrf").collect().map(_.toSeq)
        .toSet)
  }

  test("serve modes: lm-only and the full 3-list fusion; the tri serve equals the composition of its three store-served shortlists") {
    // round 14, r13 verdict #2 — the LM scorer and N-list fusions get a
    // serving consumer: t60 proved the 3-list fusion as an oracle
    // contract; here the SERVER runs it end to end off the same stores
    val rdL = Files.createTempDirectory("graft_qserve_ml").toString
    val rdT = Files.createTempDirectory("graft_qserve_mt").toString
    // lm-only needs only the corpus store — the dense paths are
    // deliberately non-existent (the t54 property widened to lm)
    new QueryServe.Server(spark, s"$root/corpus", s"$root/absent_ivf",
      s"$root/absent_pq", rdL, lists = Seq("lm")).serveBatch(requests, 0L)
    new QueryServe.Server(spark, s"$root/corpus", s"$root/ivf",
      s"$root/pq", rdT, lists = Seq("dense", "sparse", "lm"))
      .serveBatch(requests, 0L)
    val l = QueryServe.results(spark, rdL)
    val t = QueryServe.results(spark, rdT)
    assert(l.select("fused_lists").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("lm"))
    assert(t.select("fused_lists").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("dense+sparse+lm"))
    // lm-only: the other lists' provenance is null, the monotone RRF
    // reshape preserves the retriever's own ranks exactly
    assert(l.filter(col("dense_rank").isNotNull ||
      col("sparse_rank").isNotNull).count() == 0L)
    assert(l.filter(col("n_lists") =!= 1).count() == 0L &&
      l.filter(col("rank") =!= col("lm_rank")).count() == 0L)
    // and it equals the library's direct lm-only serve
    val lWant = Retrieval.hybridTopKFromStoresExternal(spark,
      s"$root/corpus", s"$root/absent_ivf", s"$root/absent_pq", requests,
      lists = Seq("lm")).collect().map(_.toSeq).toSet
    assert(l.select("query_id", "rank", "doc_id", "rrf", "dense_rank",
      "sparse_rank", "lm_rank", "n_lists").collect().map(_.toSeq)
      .toSet == lWant)
    // the tri serve's rows fuse all three lists (docs two or three
    // retrievers agree on carry multi-list provenance somewhere)
    assert(t.filter(col("n_lists") > 1).count() > 0L)
    // and equal the hand composition: the three shortlists served off
    // the SAME stores, fused by rrfFuseNamed in canonical order (the
    // t63 discipline, store-backed end to end)
    val ivf = IndexStore.loadIvf(spark, s"$root/ivf")
    val pq = IndexStore.loadPq(spark, s"$root/pq")
    val dense = Similarity.ivfPqTopKQueries(ivf, pq,
        ivf.assigned.select("vec_id", "embedding"),
        requests.select("query_id", "embedding"), topK = 10,
        nprobe = 4, rerank = 50, idCol = "query_id")
      .select(col("qid").as("query_id"), col("rank"),
        col("nid").as("doc_id"))
    val sparse = Retrieval.bm25QueryTopKFromStore(spark, s"$root/corpus",
        requests.select("query_id", "query_text"))
      .select("query_id", "rank", "doc_id")
    val lm = Retrieval.lmTopKFromStore(spark, s"$root/corpus",
        requests.select("query_id", "query_text"))
      .select("query_id", "rank", "doc_id")
    val tWant = Retrieval.rrfFuseNamed(
      Seq("dense" -> dense, "sparse" -> sparse, "lm" -> lm))
      .collect().map(_.toSeq).toSet
    assert(tWant.nonEmpty &&
      t.select("query_id", "rank", "doc_id", "rrf", "dense_rank",
        "sparse_rank", "lm_rank", "n_lists").collect().map(_.toSeq)
        .toSet == tWant)
  }

  test("a results store spanning engine rounds reads one imposed schema, in any file order") {
    // round 14, r13 ADVICE (medium): a long-lived results store holds
    // pre-round-14 slices (no lm_rank) beside new ones; results() and
    // the maintenance fold must resolve the SAME columns regardless of
    // which footer Spark would have inferred from — old rows read null
    // for the columns their slice predates
    val resultsDir = Files.createTempDirectory("graft_qserve_mix").toString
    // batch 0 through the default 2-list server, batch 1 through the
    // round-14 tri server (non-null lm_rank rows for contrast); both
    // COMMITTED through the real door so maintenance accepts them
    new QueryServe.Server(spark, s"$root/corpus", s"$root/ivf",
      s"$root/pq", resultsDir)
      .serveBatch(requests.filter(col("query_id") < 903L), 0L)
    new QueryServe.Server(spark, s"$root/corpus", s"$root/ivf",
      s"$root/pq", resultsDir, lists = Seq("dense", "sparse", "lm"))
      .serveBatch(requests.filter(col("query_id") >= 903L), 1L)
    // rewrite batch 0's slice as a genuine pre-round-14 one: the same
    // rows with NO lm_rank column in the footer at all
    val servedDir = s"$resultsDir/served"
    val oldRows = QueryServe.results(spark, resultsDir)
      .filter(col("batch") === 0L).drop("batch", "lm_rank")
      .localCheckpoint()
    val fsys = new org.apache.hadoop.fs.Path(servedDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(s"$servedDir/batch=0"), true)
    oldRows.write.parquet(s"$servedDir/batch=0")
    // the slice was rewritten outside the door — drop the session's
    // cached file listing for the store before re-reading it
    spark.catalog.refreshByPath(servedDir)
    val mixed = QueryServe.results(spark, resultsDir)
    // every row resolves every servedSchema column: the old slice's
    // rows read a DETERMINISTIC null lm_rank, the new slice keeps its
    // non-null provenance — in ANY file order
    assert(mixed.filter(col("batch") === 0L).count() == oldRows.count())
    assert(mixed.filter(col("batch") === 0L)
      .filter(col("lm_rank").isNotNull).count() == 0L)
    assert(mixed.filter(col("batch") === 1L)
      .filter(col("lm_rank").isNotNull).count() > 0L)
    val mixedCount = mixed.count() // before the fold replaces the files
    // the maintenance fold carries the union schema: after compaction
    // the consolidated slice still has the column, old-row nulls and
    // new-row values both preserved
    QueryServe.compact(spark, resultsDir)
    val folded = QueryServe.results(spark, resultsDir)
    assert(folded.columns.contains("lm_rank"))
    assert(folded.filter(col("req_batch") === 0L)
      .filter(col("lm_rank").isNotNull).count() == 0L)
    assert(folded.filter(col("req_batch") === 1L)
      .filter(col("lm_rank").isNotNull).count() > 0L)
    assert(folded.count() == mixedCount)
  }

  test("maxFilesPerTrigger bounds the batch; resultsSince resumes on the req_batch watermark") {
    val dropDir = Files.createTempDirectory("graft_qserve_mft").toString
    val resultsDir = Files.createTempDirectory("graft_qserve_mftr").toString
    val ckpt = Files.createTempDirectory("graft_qserve_mftc").toString
    requests.filter(col("query_id") < 903L).coalesce(1)
      .write.mode("append").parquet(dropDir)
    requests.filter(col("query_id") >= 903L).coalesce(1)
      .write.mode("append").parquet(dropDir)
    // a 1-file trigger bound turns the 2-file backlog into 2 committed
    // batches instead of one giant one (the cold-start admission
    // control in front of the chunked executor)
    val q = QueryServe.start(spark, dropDir, s"$root/corpus", s"$root/ivf",
      s"$root/pq", resultsDir, ckpt, maxFilesPerTrigger = Some(1))
    q.processAllAvailable()
    q.stop()
    assert(BatchMarker.maxCommitted(spark, resultsDir) >= 1L,
      "two files under maxFilesPerTrigger=1 must commit >= 2 batches")
    val direct = Retrieval.hybridTopKFromStoresExternal(spark,
      s"$root/corpus", s"$root/ivf", s"$root/pq", requests)
      .select("query_id", "rank", "doc_id", "rrf")
      .collect().map(_.toSeq).toSet
    assert(served(resultsDir) == direct)
    // the consumer resume read: everything after its persisted
    // req_batch watermark, nothing before it, and the union of the
    // watermarked read and the consumed prefix is the whole store
    val hw = BatchMarker.maxCommitted(spark, resultsDir)
    val since = QueryServe.resultsSince(spark, resultsDir, hw - 1)
    assert(since.count() > 0 &&
      since.filter(col("req_batch") <= hw - 1).count() == 0L)
    assert(QueryServe.resultsSince(spark, resultsDir, -1L).count() ==
      QueryServe.results(spark, resultsDir).count())
  }

  test("replay rewrites its own slice byte-identically; high-water refuses a fresh stream") {
    val resultsDir = Files.createTempDirectory("graft_qserve_rp").toString
    val server = new QueryServe.Server(spark, s"$root/corpus",
      s"$root/ivf", s"$root/pq", resultsDir)
    val b0 = requests.filter(col("query_id") < 903L)
    val b1 = requests.filter(col("query_id") >= 903L)
    server.serveBatch(b0, 0L)
    server.serveBatch(b1, 1L)
    val before = served(resultsDir)
    // crash-replay of the LAST batch (the only one foreachBatch can
    // replay): converges to the same results store
    server.serveBatch(b1, 1L)
    assert(served(resultsDir) == before)
    // a fresh-checkpoint stream restarting from batch 0 must refuse
    val err = intercept[IllegalArgumentException](server.serveBatch(b0, 0L))
    assert(err.getMessage.contains("high-water mark"))
    // an empty batch commits the marker and serves nothing
    server.serveBatch(b0.limit(0), 2L)
    assert(served(resultsDir) == before)
    assert(BatchMarker.maxCommitted(spark, resultsDir) == 2L)
  }
}
