package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MergeSpec extends SparkTestBase {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "name", "v")

  test("merge fires every branch: update, insert, delete, passthrough") {
    val batch = Seq(
      (2L, "b2", 25.0, false), // update: replaces k=2 wholesale
      (9L, "new", 90.0, false), // insert: no match
      (3L, "whatever", 0.0, true), // delete: removes k=3
      (8L, "ghost", 0.0, true)) // delete of an absent key: no-op
      .toDF("k", "name", "v", "is_delete")
    val got = Merge.merge(target, batch, Seq("k"),
        deleteWhen = Some(col("is_delete")), dropCols = Seq("is_delete"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq(
      (1L, "a", 10.0), // untouched
      (2L, "b2", 25.0), // updated whole-row
      (4L, "d", 40.0), // untouched
      (9L, "new", 90.0))) // inserted
  }

  test("merge without deleteWhen is a plain upsert") {
    val batch = Seq((1L, "a2", 11.0), (5L, "e", 50.0)).toDF("k", "name", "v")
    val got = Merge.merge(target, batch, Seq("k"))
      .orderBy("k").collect().map(_.getString(1)).toSeq
    assert(got == Seq("a2", "b", "c", "d", "e"))
  }

  test("merge keeps the target unshuffled: anti-join broadcasts the batch keys") {
    val plan = Merge.merge(target, target.limit(2), Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast left_anti join, got:\n$plan")
  }

  test("a null deleteWhen mark means not-a-delete, not row loss") {
    val batch = Seq((2L, "b2", 25.0, Option.empty[Boolean]),
      (3L, "c2", 35.0, Some(true)))
      .toDF("k", "name", "v", "is_delete")
    val got = Merge.merge(target, batch, Seq("k"),
        deleteWhen = Some(col("is_delete")), dropCols = Seq("is_delete"))
      .orderBy("k").collect().map(_.getString(1)).toSeq
    assert(got == Seq("a", "b2", "d"))
  }
}
