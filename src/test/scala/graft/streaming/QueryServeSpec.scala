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
    // and the store still serves: the guard survived the fold
    server.serveBatch(b0.limit(1), 2L)
    assert(served(resultsDir).size > before.size)
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
