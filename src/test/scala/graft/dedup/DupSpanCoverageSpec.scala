package graft.dedup

import graft.SparkTestBase

/** [[Dedup.dupSpanCoverage]] (d22): interval-union coverage on a corpus
  * small enough to mark up by hand. */
class DupSpanCoverageSpec extends SparkTestBase {
  import spark.implicits._

  test("overlapping duplicated 3-gram spans union; short and empty docs are 0") {
    // dup grams: "a b c" (docs 0,1) and "b c d" (docs 0,2)
    //   doc 0 intervals [1,3] + [2,4] union to [1,4] -> 4/5
    //   doc 1 [1,3] -> 3/5;  doc 2 [3,5] -> 3/5
    //   doc 3 has < n tokens (no grams); doc 4 is empty (0 tokens)
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c x y"),
      (2L, "q q b c d"),
      (3L, "zz"),
      (4L, ""))
      .toDF("doc_id", "text")
    val rows = Dedup.dupSpanCoverage(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (0L, 5L, 4L, 0.8),
      (1L, 5L, 3L, 0.6),
      (2L, 5L, 3L, 0.6),
      (3L, 1L, 0L, 0.0),
      (4L, 0L, 0L, 0.0)))
  }

  test("a corpus with no repeated grams scores 0 everywhere") {
    val docs = Seq((0L, "a b c d"), (1L, "e f g h")).toDF("doc_id", "text")
    val rows = Dedup.dupSpanCoverage(docs).collect()
    assert(rows.forall(r => r.getLong(2) == 0L && r.getDouble(3) == 0.0))
  }

  test("a passed-in shingle table gives the same answer as self-derived") {
    val docs = Seq(
      (0L, "a b c d e"), (1L, "a b c x y"), (2L, "q q b c d"))
      .toDF("doc_id", "text")
    val viaTable = Dedup.dupSpanCoverage(docs,
      shingles = Some(Dedup.shingleTable(docs))).collect().toSeq
    val direct = Dedup.dupSpanCoverage(docs).collect().toSeq
    assert(viaTable == direct)
  }
}
