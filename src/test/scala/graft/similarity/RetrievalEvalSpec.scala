package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Similarity.retrievalEval]] (s17): hand-computed Recall@k / MRR@k /
  * nDCG@k on fixtures small enough to rank by eye. */
class RetrievalEvalSpec extends SparkTestBase {
  import spark.implicits._

  test("perfectly clustered labels score 1.0 on all three metrics") {
    // two well-separated clusters: every query's nearest neighbours are
    // exactly its own label's other members, in some order
    val emb = Seq(
      (0L, Array(1f, 0f, 0f), 1), (1L, Array(0.99f, 0.01f, 0f), 1),
      (2L, Array(0.98f, 0.02f, 0f), 1),
      (3L, Array(0f, 1f, 0f), 2), (4L, Array(0.01f, 0.99f, 0f), 2),
      (5L, Array(0.02f, 0.98f, 0f), 2))
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.retrievalEval(emb, lit(true), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      (1, 3L, 1.0, 1.0, 1.0),
      (2, 3L, 1.0, 1.0, 1.0)))
  }

  test("hand-computed metrics on a 2-per-label fixture; singleton label excluded") {
    // per-query rankings (exact cosine, ties to smaller nid):
    //   q0 (A): v2(B) .995, v3(B) .0995, v1(A) 0, v4(C) 0  -> first A hit rank 3
    //   q1 (A): v3, v2, v0, v4                              -> rank 3
    //   q2 (B): v0 .995, v3 .198, v1 .0995, v4 0            -> first B hit rank 2
    //   q3 (B): v1, v2, v0, v4                              -> rank 2
    // rq = min(10, 2-1) = 1 for A and B; label C has one member -> excluded
    val emb = Seq(
      (0L, Array(1f, 0f, 0f), 1), (1L, Array(0f, 1f, 0f), 1),
      (2L, Array(1f, 0.1f, 0f), 2), (3L, Array(0.1f, 1f, 0f), 2),
      (4L, Array(0f, 0f, 1f), 3))
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.retrievalEval(emb, lit(true), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // A: recall 1/1; MRR mean(1/3, 1/3) = 0.3333; nDCG mean(g3/g1) = 0.5
    // B: recall 1/1; MRR mean(1/2, 1/2) = 0.5; nDCG g2/g1 = 630930/1e6
    assert(rows.toSeq == Seq(
      (1, 2L, 1.0, 0.3333, 0.5),
      (2, 2L, 1.0, 0.5, 0.6309)))
  }

  test("generated DCG gains reproduce the oracle-pinned literals; big k works") {
    // the s17 oracle inlines micro-unit literals for ranks 1..10; the
    // generator must reproduce them exactly or the cross-engine contract
    // silently drifts (r9 verdict watch item: the table is generated now,
    // not hand-extended, so a k=100 production eval just works)
    assert(Similarity.dcgGains(10) == Similarity.pinnedGains)
    assert(Similarity.dcgGains(100).length == 100)
    // monotone decreasing, positive, correctly anchored
    val g = Similarity.dcgGains(100)
    assert(g.head == 1000000L)
    assert(g.sliding(2).forall { case Seq(a, b) => b <= a && b > 0 })
    // a k=100 eval runs end-to-end and stays well-formed
    val emb = (0L until 30L).map { i =>
      val l = (i % 3).toInt
      (i, Array.tabulate(4)(d =>
        (if (d == l) 1.0f else 0.0f) + 0.01f * ((i * 13 + d) % 7)), l)
    }.toDF("vec_id", "embedding", "label")
    val rows = Similarity.retrievalEval(emb, lit(true), k = 100).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      Seq(2, 3, 4).foreach { c =>
        val v = r.getDouble(c)
        assert(v >= 0.0 && v <= 1.0, s"metric out of range: $r")
      }
      // k=100 covers the whole 10-per-label cluster: recall must be 1
      assert(r.getDouble(2) == 1.0)
    }
    val e = intercept[IllegalArgumentException](
      Similarity.retrievalEval(emb, lit(true), k = 0))
    assert(e.getMessage.contains("k >= 1"))
  }
}
