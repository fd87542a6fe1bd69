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

  test("manifest is parsed strictly: version prefixes, both-kinds, extra fields all refuse") {
    val ivf = Similarity.buildIvfIndex(emb)
    val dir = tmp("strict")
    IndexStore.saveIvf(ivf, dir)
    val meta = java.nio.file.Paths.get(dir, "_graft_index.json")
    def putMeta(s: String): Unit = {
      // drop the Hadoop checksum sidecar too — the NIO rewrite below
      // would otherwise fail the read on a crc mismatch, not the parse
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(dir, "._graft_index.json.crc"))
      java.nio.file.Files.writeString(meta, s)
    }
    // a FUTURE version whose decimal rendering merely starts with 1 must
    // refuse (ADVICE r8: the old substring check accepted 10, 11, ...)
    putMeta("""{"format_version": 10, "kind": "ivf"}""")
    val e1 = intercept[IllegalArgumentException](IndexStore.loadIvf(spark, dir))
    assert(e1.getMessage.contains("version"), e1.getMessage)
    // a manifest naming BOTH kinds is ambiguous — refuse, don't pick one
    putMeta("""{"format_version": 1, "kind": "ivf", "kind": "pq"}""")
    val e2 = intercept[IllegalArgumentException](IndexStore.loadIvf(spark, dir))
    assert(e2.getMessage.contains("well-formed"), e2.getMessage)
    // extra fields mean a writer this build doesn't understand — refuse
    putMeta("""{"format_version": 1, "kind": "ivf", "shards": 4}""")
    val e3 = intercept[IllegalArgumentException](IndexStore.loadIvf(spark, dir))
    assert(e3.getMessage.contains("well-formed"), e3.getMessage)
    // the exact written form (round-tripped) still loads
    putMeta("""{"format_version": 1, "kind": "ivf"}""")
    IndexStore.loadIvf(spark, dir).release()
    ivf.release()
  }

  test("overwrite is invalidate-first: cross-kind replace strands nothing and half-states refuse") {
    val ivf = Similarity.buildIvfIndex(emb)
    val pq = Similarity.buildPqIndex(emb)
    val dir = tmp("atomic")
    IndexStore.saveIvf(ivf, dir)
    // replace the IVF store with a PQ index: the old kind's component
    // dirs must be cleared (ADVICE r8: a partial overwrite previously
    // left stale meta validating a mixed directory)
    IndexStore.savePq(pq, dir, overwrite = true)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "assigned")), "stale IVF components strand")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "centroids")), "stale IVF components strand")
    intercept[IllegalArgumentException](IndexStore.loadIvf(spark, dir))
    IndexStore.loadPq(spark, dir).release()
    // crash-window simulation: an overwrite that died after invalidation
    // but before publish leaves NO manifest — every loader refuses
    // loudly instead of serving a stale-meta mix
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_graft_index.json"))
    val e = intercept[IllegalArgumentException](IndexStore.loadPq(spark, dir))
    assert(e.getMessage.contains("_graft_index.json"))
    ivf.release(); pq.release()
  }
}
