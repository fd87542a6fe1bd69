package graft.etl

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The persisted incremental sketch store: estimates track exact NDV
  * within the lgK error budget, slice updates are idempotent, dynamic
  * overwrite touches only the updated partitions, and range queries
  * read O(partitions) sketches. */
class SketchStoreSpec extends SparkTestBase {
  import spark.implicits._

  // three "days" of user activity with known overlap: day d sees users
  // [100·d, 100·d + 150) — 150/day, 50 shared with the next day
  private def day(d: Int) =
    (0 until 150).map(i => (d, (100 * d + i).toLong))
      .toDF("day", "user_id")

  private def files(dir: String): Set[String] = {
    val p = new Path(dir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.Set[String]()
    val it = f.listFiles(p, true)
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.endsWith(".parquet"))
        out += s.getPath.toString + "@" + s.getModificationTime
    }
    out.toSet
  }

  test("incremental build: estimates track exact NDV, grouped and ranged") {
    val dir = Files.createTempDirectory("graft_sketch").toString
    (0 until 3).foreach(d =>
      SketchStore.update(spark, dir, day(d), Seq("day"), "user_id"))
    // whole-store NDV: 3 days × 150 users, 50 shared at each seam
    val all = SketchStore.estimate(spark, dir).head.getLong(0)
    val exactAll = day(0).union(day(1)).union(day(2))
      .select("user_id").distinct().count()
    assert(math.abs(all - exactAll) <= exactAll * 0.03,
      s"store NDV $all vs exact $exactAll")
    // per-day grouping: each day's sketch stands alone
    val perDay = SketchStore.estimate(spark, dir, groupBy = Seq("day"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until 3).foreach(d =>
      assert(math.abs(perDay(d) - 150L) <= 150 * 0.03, s"day $d: $perDay"))
    // range query: days 1-2 only — partition filter, not a rescan
    val range = SketchStore
      .estimate(spark, dir, where = col("day") >= 1)
      .head.getLong(0)
    val exactRange = day(1).union(day(2))
      .select("user_id").distinct().count()
    assert(math.abs(range - exactRange) <= exactRange * 0.03)
  }

  test("slice update is idempotent and touches only its own partitions") {
    val dir = Files.createTempDirectory("graft_sketch_idem").toString
    SketchStore.update(spark, dir, day(0), Seq("day"), "user_id")
    SketchStore.update(spark, dir, day(1), Seq("day"), "user_id")
    val day0Before = files(s"$dir/day=0")
    val estBefore = SketchStore.estimate(spark, dir).head.getLong(0)
    // redelivery of day 1 (the streamed-ingest replay scenario)
    SketchStore.update(spark, dir, day(1), Seq("day"), "user_id")
    assert(files(s"$dir/day=0") == day0Before,
      "dynamic overwrite must not rewrite a neighbor partition")
    assert(SketchStore.estimate(spark, dir).head.getLong(0) == estBefore,
      "re-updating the same slice must converge, not accumulate")
    // and the session's overwrite mode was restored (not left dynamic)
    assert(!spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .exists(_.equalsIgnoreCase("dynamic")))
  }

  test("q60 contract row: every year's verdict is true") {
    val out = SketchStore.q60SketchNdv(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("within_3pct")),
      "a sketch drifted past its 7.5-sigma error budget")
  }
}
