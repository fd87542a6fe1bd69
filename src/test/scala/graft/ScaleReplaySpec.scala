package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.similarity.Similarity

/** The 10× replay corpus ([[ScaleReplay]]) is only evidence if the
  * replication preserves what it claims: per-key join selectivity, and a
  * duplicate-pair structure that scales ×factor instead of exploding
  * quadratically. Checked here at factor 2 on sf0.001. */
class ScaleReplaySpec extends SparkTestBase {

  private lazy val outDir: String = {
    val dir = Files.createTempDirectory("graft_replay_spec").toString + "/x2"
    ScaleReplay.replicate(spark, sf("sf0.001"), dir, factor = 2)
    dir
  }

  /** doc_id re-key stride = max(doc_id)+1 — recover it for shard math. */
  private lazy val docOff: Long = spark.read
    .parquet(sf("sf0.001") + "/documents.parquet")
    .agg(max(col("doc_id"))).head.getLong(0) + 1

  test("row counts scale exactly ×factor; copied dims stay fixed") {
    def n(dir: String, t: String): Long =
      spark.read.parquet(s"$dir/$t.parquet").count()
    Seq("lineitem", "orders", "customer", "part", "documents", "embeddings")
      .foreach { t =>
        assert(n(outDir, t) == 2 * n(sf("sf0.001"), t), s"$t not ×2")
      }
    Seq("nation", "region").foreach { t =>
      assert(n(outDir, t) == n(sf("sf0.001"), t), s"dim $t must not replicate")
    }
  }

  test("join selectivity per key is preserved: lineitem-per-order histogram unchanged") {
    def hist(dir: String): Map[Long, Long] = spark.read
      .parquet(s"$dir/lineitem.parquet")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .groupBy("n").agg(count(lit(1)).as("orders"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = hist(sf("sf0.001"))
    val big = hist(outDir)
    assert(big == base.map { case (k, v) => k -> v * 2 },
      "per-order lineitem fanout must replicate, not skew")
  }

  test("document copies are shingle-disjoint shards with isomorphic duplicate structure") {
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    // pairs on the replicated corpus: every pair must stay INSIDE one
    // copy (shard isolation — no cross-copy near-dup leakage) …
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.2)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(a / docOff == b / docOff, s"cross-copy pair ($a,$b) — shards leak")
    }
    // … and each copy must reproduce the ORIGINAL pair structure exactly
    // (the ×factor-not-quadratic property the scale factors rely on)
    val basePairs = Dedup.ngramJaccardPairs(
      spark.read.parquet(sf("sf0.001") + "/documents.parquet"), threshold = 0.2)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 2).foreach { i =>
      val shard = pairs.filter(_._1 / docOff == i)
        .map { case (a, b) => (a - i * docOff, b - i * docOff) }.toSet
      assert(shard == basePairs, s"copy $i pair structure diverged")
    }
  }

  test("partial replica records its tables; a broader reuse request refuses") {
    val dir = Files.createTempDirectory("graft_replay_spec").toString + "/docs_only"
    ScaleReplay.replicate(spark, sf("sf0.001"), dir, factor = 2,
      only = Some(Set("documents")))
    assert(Files.exists(java.nio.file.Paths.get(dir, "documents.parquet")))
    assert(!Files.exists(java.nio.file.Paths.get(dir, "lineitem.parquet")),
      "filtered replica must not write unrequested tables")
    // same-or-narrower request reuses the standing replica …
    ScaleReplay.replicate(spark, sf("sf0.001"), dir, factor = 2,
      only = Some(Set("documents")))
    // … a broader one must refuse loudly, not silently time missing tables
    val e = intercept[IllegalArgumentException] {
      ScaleReplay.replicate(spark, sf("sf0.001"), dir, factor = 2)
    }
    assert(e.getMessage.contains("holds only"))
  }

  test("embedding copies: rotation matrix orthonormal; within-copy cosine structure preserved") {
    // orthonormality of the per-copy rotation (cosine invariance hinges on it)
    val q = ScaleReplay.orthogonal(16, seed = 7)
    for (a <- 0 until 16; b <- 0 until 16) {
      val dot = (0 until 16).map(d => q(a)(d) * q(b)(d)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9,
        s"Q row $a . row $b = $dot")
    }
    // copy 1 is rotated + re-quantized to float: its EXACT near-dup pair
    // set must equal the base corpus's (offset-normalized). Pairs within
    // 1e-3 of the threshold are excluded on both sides — float
    // re-quantization moves a cosine by ~1e-6, never 1e-3 — so the check
    // cannot flake on a boundary pair.
    val emb = spark.read.parquet(s"$outDir/embeddings.parquet")
    val base = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val vOff = base.agg(max(col("vec_id"))).head.getLong(0) + 1
    def pairSet(df: org.apache.spark.sql.DataFrame, off: Long) =
      Similarity.cosineNearDuplicatesExact(df, 0.45).collect()
        .filter(r => math.abs(r.getAs[Double]("cos") - 0.45) > 1e-3)
        .map(r => (r.getAs[Long]("d1") - off, r.getAs[Long]("d2") - off)).toSet
    val basePairs = pairSet(base, 0)
    assert(basePairs.nonEmpty)
    assert(pairSet(emb.filter(col("vec_id") >= vOff), vOff) == basePairs)
  }
}
