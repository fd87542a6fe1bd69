package graft

/** Times selected queries in isolation (same noop-sink materialization as
  * [[Bench]]) — the per-query iteration loop while optimizing, without the
  * full-suite wall time.
  *
  * Usage: runMain graft.Time <query>[,query…] [sfDir] [reps]
  */
object Time {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-time")
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    // warmup on the smallest SF so classload/codegen lands outside timings
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").format("noop").save())
    for (_ <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      println(f"[time] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
