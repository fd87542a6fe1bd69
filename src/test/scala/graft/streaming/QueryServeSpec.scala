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
    assert(r.getAs[Boolean]("ivf_exists") && r.getAs[Boolean]("pq_exists"))
    assert(!r.getAs[Boolean]("pq_retrain_inflight"))
    // saveIvf/savePq stores are not streamed: high water −1
    assert(r.getAs[Long]("ivf_high_water") == -1L)
    assert(r.isNullAt(r.fieldIndex("dials_nprobe")),
      "no recommendation persisted for this fixture")
    assert(r.getAs[Long]("results_high_water") == 1L &&
      r.getAs[Int]("results_slices") == 2 &&
      !r.getAs[Boolean]("results_consolidated"))
    // after a maintenance fold the footprint reads consolidated
    QueryServe.maintainResults(spark, resultsDir, retainLast = 2)
    val r2 = ServingStatus.report(spark, s"$root/corpus", s"$root/ivf",
      s"$root/pq", resultsDir).head()
    assert(r2.getAs[Int]("results_slices") == 0 &&
      r2.getAs[Boolean]("results_consolidated"))
    // a deletion shows up as a live tombstone slice until purged
    import graft.similarity.IndexStore
    IndexStore.delete(spark, s"$root/ivf", Seq(9999L).toDF("vec_id"))
    try {
      assert(ServingStatus.report(spark, s"$root/corpus", s"$root/ivf",
        s"$root/pq", resultsDir).head().getAs[Int]("ivf_tombstones") == 1)
    } finally IndexStore.purgeDeletes(spark, s"$root/ivf")
  }

  test("dial precedence: explicit args beat the persisted _dials, which beat the defaults") {
    def servedDials(rd: String): (Int, Int) = {
      val r = QueryServe.results(spark, rd).select("nprobe", "rerank")
        .distinct().collect()
      assert(r.length == 1, s"expected one dial pair, got ${r.length}")
      (r(0).getInt(0), r(0).getInt(1))
    }
    val oneReq = requests.filter(col("query_id") === 900L)
    // no _dials table: the (4, 50) defaults
    val rd1 = Files.createTempDirectory("graft_qserve_d1").toString
    new QueryServe.Server(spark, s"$root/corpus", s"$root/ivf",
      s"$root/pq", rd1).serveBatch(oneReq, 0L)
    assert(servedDials(rd1) == (4, 50))
    // a maintenance recommendation persisted beside the IVF index is
    // read at server construction (= stream start)
    IndexMaintenance.writeDials(spark, s"$root/ivf", 6, 80, 0.93)
    try {
      val rd2 = Files.createTempDirectory("graft_qserve_d2").toString
      new QueryServe.Server(spark, s"$root/corpus", s"$root/ivf",
        s"$root/pq", rd2).serveBatch(oneReq, 0L)
      assert(servedDials(rd2) == (6, 80))
      // explicit args always win
      val rd3 = Files.createTempDirectory("graft_qserve_d3").toString
      new QueryServe.Server(spark, s"$root/corpus", s"$root/ivf",
        s"$root/pq", rd3, nprobe = Some(2), rerank = Some(10))
        .serveBatch(oneReq, 0L)
      assert(servedDials(rd3) == (2, 10))
    } finally {
      // the suite's other servers must keep resolving the defaults
      val p = new org.apache.hadoop.fs.Path(s"$root/ivf/_dials")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
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
