package graft.similarity

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-trip parity for the persisted ANN indexes: a probe from a
  * RELOADED index must equal the in-session result bit for bit — the
  * whole point of the store is amortizing the build, which only holds
  * if the reloaded index answers identically. */
class IndexStoreSpec extends SparkTestBase {

  private lazy val emb = spark.read
    .parquet(sf("sf0.001") + "/embeddings.parquet")

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-idx-$name").toString

  test("IVF save/load: reloaded probes equal in-session at both dials (s04 parity)") {
    val idx = Similarity.buildIvfIndex(emb)
    val dir = tmp("ivf")
    IndexStore.saveIvf(idx, dir, overwrite = true)
    val re = IndexStore.loadIvf(spark, dir)
    for (nprobe <- Seq(4, 16)) {
      val want = idx.topK(col("vec_id") < 5, k = 5, nprobe)
        .orderBy("qid", "rank").collect().toSeq
      val got = re.topK(col("vec_id") < 5, k = 5, nprobe)
        .orderBy("qid", "rank").collect().toSeq
      assert(got == want, s"nprobe=$nprobe diverged after reload")
    }
    re.release(); idx.release()
  }

  test("PQ save/load: reloaded ADC + rerank probes equal in-session (s07 parity)") {
    val idx = Similarity.buildPqIndex(emb)
    val dir = tmp("pq")
    IndexStore.savePq(idx, dir, overwrite = true)
    val re = IndexStore.loadPq(spark, dir)
    // codebooks must survive the long-form round trip exactly
    assert(re.codebooks.length == idx.codebooks.length)
    for (m <- idx.codebooks.indices; k <- idx.codebooks(m).indices)
      assert(re.codebooks(m)(k).toSeq == idx.codebooks(m)(k).toSeq,
        s"codebook ($m,$k) diverged")
    for (rerank <- Seq(0, Int.MaxValue)) {
      val want = Similarity.pqProbe(idx, emb, col("vec_id") < 5,
        topK = 5, rerank).orderBy("qid", "rank").collect().toSeq
      val got = Similarity.pqProbe(re, emb, col("vec_id") < 5,
        topK = 5, rerank).orderBy("qid", "rank").collect().toSeq
      assert(got == want, s"rerank=$rerank diverged after reload")
    }
    re.release(); idx.release()
  }

  test("IVF-PQ composite from two reloaded indexes equals in-session (s15 parity)") {
    val ivf = Similarity.buildIvfIndex(emb)
    val pq = Similarity.buildPqIndex(emb)
    val (di, dp) = (tmp("ivf2"), tmp("pq2"))
    IndexStore.saveIvf(ivf, di); IndexStore.savePq(pq, dp)
    val (ri, rp) = (IndexStore.loadIvf(spark, di), IndexStore.loadPq(spark, dp))
    val want = Similarity.ivfPqTopK(ivf, pq, emb, col("vec_id") < 5, topK = 5)
      .orderBy("qid", "rank").collect().toSeq
    val got = Similarity.ivfPqTopK(ri, rp, emb, col("vec_id") < 5, topK = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(got == want)
    ri.release(); rp.release(); ivf.release(); pq.release()
  }

  test("store refuses: kind mismatch, double-save without overwrite, not-an-index dir") {
    val ivf = Similarity.buildIvfIndex(emb)
    val dir = tmp("refuse")
    IndexStore.saveIvf(ivf, dir)
    // a second save without overwrite must refuse, not clobber
    val e1 = intercept[IllegalArgumentException](IndexStore.saveIvf(ivf, dir))
    assert(e1.getMessage.contains("overwrite"))
    // an IVF directory passed to the PQ loader must refuse by KIND
    val e2 = intercept[IllegalArgumentException](IndexStore.loadPq(spark, dir))
    assert(e2.getMessage.contains("kind"))
    // a directory that is not an index at all refuses on the manifest
    val e3 = intercept[IllegalArgumentException](
      IndexStore.loadIvf(spark, tmp("empty")))
    assert(e3.getMessage.contains("_graft_index.json"))
    ivf.release()
  }
}
