package graft.text

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TrainingData
import graft.similarity.{IndexStore, Similarity}
import graft.streaming.CorpusIngest

/** The fully-persisted hybrid serving path (t53, round 11):
  * [[Retrieval.hybridTopKFromStores]] must (1) equal the in-memory
  * composition bit-for-bit — a saved-and-loaded index pair plus the
  * stored BM25 frames can never rank differently from the frames they
  * were built from — and (2) honor the deletion cascade: one opt-out id
  * tombstoned on all three stores vanishes from BOTH retrieval halves
  * and from the fusion with no rebuild, the sparse side's df/N
  * re-derive as if the doc never existed, and the physical purge leaves
  * served results bit-identical to the masked ones. */
class HybridStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def fused(df: DataFrame): Seq[(Long, Int, Long)] =
    df.select("query_id", "rank", "doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("stored serve equals the in-memory t52r composition at sf0.001") {
    val store = TrainingData.t53HybridStoreServe(spark, sf("sf0.001"))
    val mem = TrainingData.t52RawHybridAnn(spark, sf("sf0.001"))
    assert(store.columns.toSeq == mem.columns.toSeq)
    // full-row comparison including the fused score and per-list ranks
    val a = store.collect().map(_.toSeq).toSeq
    val b = mem.collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b,
      "persisted serve diverged from the in-memory hybrid composition")
  }

  test("external hybrid serve equals the composition of its published halves") {
    val root = Files.createTempDirectory("graft_hybrid_ext").toString
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
    Retrieval.buildIndex(spark, docs, s"$root/corpus")
    val ivfB = Similarity.buildIvfIndex(emb)
    val pqB = Similarity.buildPqIndex(emb)
    IndexStore.saveIvf(ivfB, s"$root/ivf")
    IndexStore.savePq(pqB, s"$root/pq")
    ivfB.release(); pqB.release()
    // an external request batch in a disjoint id space: member text +
    // member vectors re-labeled (+500) — text and vector of the SAME
    // request, the shape an encoder produces
    val qText = docs.filter(col("doc_id") < 3)
      .select((col("doc_id") + 500L).as("query_id"),
        col("text").as("query_text"))
    val qVec = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 500L).as("query_id"), col("embedding"))
    val queries = qText.join(qVec, "query_id")
    val gotDf = Retrieval.hybridTopKFromStoresExternal(spark,
      s"$root/corpus", s"$root/ivf", s"$root/pq", queries)
    // round 14: the serving fusion carries EVERY possible list's rank —
    // the LM list was not requested, so its column is all-null
    assert(gotDf.columns.toSeq == Seq("query_id", "rank", "doc_id",
      "rrf", "dense_rank", "sparse_rank", "lm_rank", "n_lists"))
    assert(gotDf.filter(col("lm_rank").isNotNull).count() == 0L)
    val got = gotDf.drop("lm_rank").collect().map(_.toSeq).toSeq
    // expectation: the two halves composed by hand — dense through the
    // loaded pair's external probe, sparse FROM SCRATCH over the raw
    // docs (already proven ≡ the stored frames), fused by rrfFuse (the
    // round-12 fusion — the serving path must stay VALUE-identical to
    // it on the default 2-list mode)
    val ivf = IndexStore.loadIvf(spark, s"$root/ivf")
    val pq = IndexStore.loadPq(spark, s"$root/pq")
    val dense = Similarity.ivfPqTopKQueries(ivf, pq,
        ivf.assigned.select("vec_id", "embedding"), qVec, topK = 10,
        nprobe = 4, rerank = 50, idCol = "query_id")
      .select(col("qid").as("query_id"), col("rank"),
        col("nid").as("doc_id"))
    val sparse = Retrieval.bm25QueryTopK(docs, qText)
      .select(col("query_id"), col("rank"), col("doc_id"))
    val want = Retrieval.rrfFuse(dense, sparse, k = 10)
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want)
    // sanity: each request's dense half found its own source vector
    // (rank-1 cos 1 — no self row is excluded on the external path)
    val rank1 = got.filter(r => r(4) == 1)  // dense_rank == 1
    assert(rank1.map(r => (r(0), r(2))).toSet ==
      Set((500L, 0L), (501L, 1L), (502L, 2L)))
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("external serve plan shape: no cartesian, every window query-partitioned") {
    val root = Files.createTempDirectory("graft_hybrid_plan").toString
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
    Retrieval.buildIndex(spark, docs, s"$root/corpus")
    val ivfB = Similarity.buildIvfIndex(emb)
    val pqB = Similarity.buildPqIndex(emb)
    IndexStore.saveIvf(ivfB, s"$root/ivf")
    IndexStore.savePq(pqB, s"$root/pq")
    ivfB.release(); pqB.release()
    val queries = docs.filter(col("doc_id") < 3)
      .select((col("doc_id") + 500L).as("query_id"),
        col("text").as("query_text"))
      .join(emb.filter(col("vec_id") < 3)
        .select((col("vec_id") + 500L).as("query_id"), col("embedding")),
        "query_id")
    val plan = Retrieval.hybridTopKFromStoresExternal(spark,
      s"$root/corpus", s"$root/ivf", s"$root/pq", queries)
      .queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan
        case p => p
      }
    // a shuffle-side cross join in the SERVE path would scale with
    // requests × corpus — the one shape a serving tier cannot carry
    // (the deliberate 1-row/centroid broadcasts plan as
    // BroadcastNestedLoopJoin, which is allowed)
    assert(!plan.toString.contains("CartesianProduct"),
      "cartesian product in the serve plan")
    val unpart = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty,
      s"unpartitioned window in the serve plan: $unpart")
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("deletion cascade: a tombstoned doc leaves both halves, df/N follow, purge is invisible") {
    val root = Files.createTempDirectory("graft_hybrid_rtbf").toString
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
    Retrieval.buildIndex(spark, docs, s"$root/corpus")
    val ivf = Similarity.buildIvfIndex(emb)
    val pq = Similarity.buildPqIndex(emb)
    IndexStore.saveIvf(ivf, s"$root/ivf")
    IndexStore.savePq(pq, s"$root/pq")
    ivf.release(); pq.release()

    // freeze the query batch OUTSIDE the store so deletion can't change
    // the fixture mid-test (probe terms re-derive from the masked df)
    val queryRows = Retrieval
      .probeQueriesFromStore(spark, s"$root/corpus").collect()
      .map(r => (r.getInt(0).toLong, r.getString(1))).toSeq
    def queries = queryRows.toDF("query_id", "query_text")
    def serve() = Retrieval.hybridTopKFromStores(spark, s"$root/corpus",
      s"$root/ivf", s"$root/pq", queries, col("vec_id") < 3,
      nprobe = 4, rerank = 50)

    val before = serve().collect().map(_.toSeq).toSeq
    // kill a doc the serve actually returned (not one of the query
    // vectors 0-2, which would remove the query itself)
    val kill = before.map(r => r(2).asInstanceOf[Long])
      .find(_ >= 3L).getOrElse(fail("no non-query doc in the shortlist"))
    CorpusIngest.delete(spark, s"$root/corpus", Seq(kill).toDF("doc_id"))
    IndexStore.delete(spark, s"$root/ivf", Seq(kill).toDF("vec_id"))
    IndexStore.delete(spark, s"$root/pq", Seq(kill).toDF("vec_id"))

    val masked = serve().collect().map(_.toSeq).toSeq
    assert(masked.nonEmpty)
    assert(!masked.exists(_(2) == kill),
      s"deleted doc $kill still served after the tombstone cascade")
    // the sparse half must now score EXACTLY as if the doc never
    // existed — df and N re-derive from the masked tf/dl, so the stored
    // path must equal a from-scratch run over the filtered corpus
    val storeSide = Retrieval.bm25QueryTopKFromStore(spark,
      s"$root/corpus", queries).collect().map(_.toSeq).toSeq
    val scratchSide = Retrieval.bm25QueryTopK(
      docs.filter(col("doc_id") =!= kill), queries)
      .collect().map(_.toSeq).toSeq
    assert(storeSide == scratchSide,
      "stored BM25 after deletion diverged from scratch over the filtered corpus")

    // physical purge on all three stores must not change what is served
    CorpusIngest.purge(spark, s"$root/corpus")
    IndexStore.purgeDeletes(spark, s"$root/ivf")
    IndexStore.purgeDeletes(spark, s"$root/pq")
    val purged = serve().collect().map(_.toSeq).toSeq
    assert(purged == masked,
      "purge changed served results — mask and physical delete disagree")
    // and the rows must be physically gone, not merely masked
    assert(spark.read.parquet(s"$root/ivf/assigned")
      .filter(col("vec_id") === kill).count() == 0L)
    assert(spark.read.parquet(s"$root/corpus/tf")
      .filter(col("doc_id") === kill).count() == 0L)

    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
