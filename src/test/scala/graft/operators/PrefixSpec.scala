package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The two-phase distributed prefix scan must agree exactly with the
  * single-task window form — on crafted multi-group fixtures, across
  * partition counts (partition boundaries must never show in the output),
  * and on real testdata. */
class PrefixSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val rows = Seq(
    ("a", 1L, 10), ("b", 1L, 100), ("a", 2L, 20), ("b", 2L, 200),
    ("a", 3L, 30), ("b", 3L, 300), ("a", 4L, 40), ("c", 1L, 7))
    .toDF("g", "ord", "v")

  test("two-phase cum sum equals the window form on a crafted fixture") {
    val want = Prefix.cumSumWindow(rows, Seq("g"), Seq("ord"), "v")
      .select("g", "ord", "cum").as[(String, Long, Long)].collect().toSet
    assert(want.contains(("a", 4L, 100L)) && want.contains(("b", 3L, 600L)) &&
      want.contains(("c", 1L, 7L)))
    for (np <- Seq(1, 3, 8)) {
      val got = Prefix.cumSumTwoPhase(rows, Seq("g"), Seq("ord"), "v", np)
        .select("g", "ord", "cum").as[(String, Long, Long)].collect().toSet
      assert(got == want, s"mismatch at numPartitions=$np")
    }
  }

  test("two-phase cum sum matches the window form on the documents corpus") {
    val d = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"), col("n_chars").cast("int").as("v"))
    val want = Prefix.cumSumWindow(d, Seq("lang"), Seq("doc_id"), "v")
    val got = Prefix.cumSumTwoPhase(d, Seq("lang"), Seq("doc_id"), "v", 8)
    assert(want.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("two-phase run is deterministic across invocations") {
    val a = Prefix.cumSumTwoPhase(rows, Seq("g"), Seq("ord"), "v", 3)
      .select("g", "ord", "cum").as[(String, Long, Long)].collect().sorted.toSeq
    val b = Prefix.cumSumTwoPhase(rows, Seq("g"), Seq("ord"), "v", 3)
      .select("g", "ord", "cum").as[(String, Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("sequence packing: hand-checked manifest, conservation, full interior fill") {
    // 5 docs of 4/7/10/3/6 tokens, L=10 → concat stream of 30 tokens
    // = 3 full sequences. Doc offsets 0,4,11,21,24:
    //   seq 0: docs 1,2 start, doc 2 straddles out    → 2 docs, 2 start
    //   seq 1: doc 2 straddles in, doc 3 starts (10..19) and straddles out
    //   seq 2: doc 3 straddles in, docs 4,5 start, ends exactly at 30
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d e f g"),
      (3L, "a b c d e f g h i j"), (4L, "a b c"),
      (5L, "a b c d e f"), (6L, "   "))          // blank doc must drop out
      .toDF("doc_id", "text")
    val m = TrainingData.sequencePackManifest(docs, 10L)
      .select("seq_id", "n_docs", "n_starting", "n_tokens_filled")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(m == Seq((0L, 2L, 2L, 10L), (1L, 2L, 1L, 10L), (2L, 3L, 2L, 10L)))
  }

  test("sequence packing on the corpus: token conservation and fill invariants") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val total = docs.select(
      sum(graft.text.TextAnalysis.tokenCount(col("text")).cast("long")))
      .as[Long].head()
    val m = TrainingData.sequencePackManifest(docs, 2048L).collect()
    val filled = m.map(_.getAs[Long]("n_tokens_filled")).sum
    assert(filled == total, "every token must land in exactly one sequence")
    // every sequence except the last is exactly full; starts are ≤ docs
    m.dropRight(1).foreach(r =>
      assert(r.getAs[Long]("n_tokens_filled") == 2048L))
    m.foreach(r => assert(
      r.getAs[Long]("n_starting") <= r.getAs[Long]("n_docs")))
    // seq ids are dense 0..n-1
    assert(m.map(_.getAs[Long]("seq_id")).toSeq == m.indices.map(_.toLong))
  }
}
