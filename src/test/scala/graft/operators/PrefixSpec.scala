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
}
