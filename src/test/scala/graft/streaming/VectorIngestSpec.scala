package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.{IndexStore, Similarity}

/** Vector ingest-at-the-door (r8 verdict #3): streamed embedding batches
  * are cell-assigned against the standing IVF centroids as they arrive,
  * so they are retrievable IMMEDIATELY at full probe; replays converge
  * instead of double-inserting; and the on-disk layout is a standard
  * [[IndexStore]] IVF directory any session can open. */
class VectorIngestSpec extends SparkTestBase {
  import spark.implicits._

  // clustered deterministic vectors: label l points along axis l with a
  // small per-vector wiggle, so KMeans cells are stable and meaningful
  private def vecs(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map { i =>
      val l = i % 4
      val e = Array.tabulate(8)(d =>
        (if (d == l) 1.0f else 0.0f) + 0.01f * ((i * 7 + d) % 10))
      (i.toLong, e, l)
    }.toDF("vec_id", "embedding", "label")

  test("streamed vectors are retrievable at full probe the moment their batch commits") {
    val dir = Files.createTempDirectory("graft_vecidx").toString
    val m = new VectorIngest.Merger(spark, dir, nlist = 4)

    val b0 = vecs(0 until 40)
    m.mergeBatch(b0, 0L)
    val b1 = vecs(40 until 60)
    m.mergeBatch(b1, 1L)

    // the streamed index answers a full-probe (exact-dial) query over
    // the WHOLE ingested corpus — including the batch committed a line
    // ago — identically to brute force over that corpus
    val corpus = b0.unionByName(b1)
    val qf = col("vec_id").isin(3L, 45L)
    val idx = m.index()
    val got = idx.topK(qf, k = 5, nprobe = 4)
      .orderBy("qid", "rank").collect().toSeq
    val want = Similarity.bruteForceTopK(corpus, qf, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(got == want, "streamed index diverged from brute force at full probe")
    idx.release()

    // the layout IS an IndexStore IVF dir: a cold session opens it with
    // the standard loader (kind-checked manifest and all)
    val reloaded = IndexStore.loadIvf(spark, dir)
    assert(reloaded.assigned.count() == 60)
    reloaded.release()
  }

  test("replay converges and cross-batch redelivery cannot double-insert") {
    val dir = Files.createTempDirectory("graft_vecidx_replay").toString
    val m = new VectorIngest.Merger(spark, dir, nlist = 4)
    m.mergeBatch(vecs(0 until 40), 0L)
    // batch 1 redelivers vec 10 (already ingested in batch 0) + 10 new
    val b1 = vecs(40 until 50).unionByName(vecs(10 until 11))
    m.mergeBatch(b1, 1L)
    val idx1 = m.index()
    val counts1 = idx1.assigned.groupBy("vec_id").count()
      .filter(col("count") > 1).count()
    assert(counts1 == 0, "cross-batch redelivery double-inserted")
    assert(idx1.assigned.count() == 50)
    val content1 = idx1.assigned.select("vec_id", "cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    idx1.release()
    // foreachBatch crash-replay of batch 1: the per-batch overwrite
    // converges to the identical slice, never appends
    m.mergeBatch(b1, 1L)
    val idx2 = m.index()
    assert(idx2.assigned.count() == 50)
    val content2 = idx2.assigned.select("vec_id", "cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(content2 == content1)
    idx2.release()
  }

  test("a fresh-checkpoint stream cannot overwrite an existing index") {
    val dir = Files.createTempDirectory("graft_vecidx_guard").toString
    val m = new VectorIngest.Merger(spark, dir, nlist = 4)
    m.mergeBatch(vecs(0 until 40), 0L)
    m.mergeBatch(vecs(40 until 50), 1L)
    val e = intercept[IllegalArgumentException](
      m.mergeBatch(vecs(100 until 110), 0L))
    assert(e.getMessage.contains("high-water"))
  }

  test("file-source stream assigns across micro-batches end to end") {
    val dropDir = Files.createTempDirectory("graft_vec_drop").toString
    val dir = Files.createTempDirectory("graft_vecidx_stream").toString
    val ckpt = Files.createTempDirectory("graft_vec_ckpt").toString
    vecs(0 until 40).write.mode("overwrite").parquet(dropDir)
    val q = VectorIngest.start(spark, dropDir, dir, ckpt, nlist = 4)
    try {
      q.processAllAvailable()
      vecs(40 until 55).write.mode("append").parquet(dropDir)
      q.processAllAvailable()
    } finally q.stop()
    val idx = m2(dir)
    assert(idx.assigned.count() == 55)
    // immediately retrievable: full probe equals brute force
    val got = idx.topK(col("vec_id") === 50L, k = 3, nprobe = 4)
      .orderBy("rank").collect().toSeq
    val want = Similarity.bruteForceTopK(vecs(0 until 55),
      col("vec_id") === 50L, k = 3).orderBy("rank").collect().toSeq
    assert(got == want)
    idx.release()
  }

  private def m2(dir: String) = IndexStore.loadIvf(spark, dir)
}
