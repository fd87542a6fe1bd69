package graft

/** Times selected queries in isolation (same noop-sink materialization as
  * [[Bench]]) — the per-query iteration loop while optimizing, without the
  * full-suite wall time. The pseudo-queries `etl_sportstv` and
  * `stream_ingest` rep the two end-to-end bench bodies: single runs on
  * this box swing ±20–30%, so regression claims need reps.
  *
  * Usage: runMain graft.Time <query>[,query…] [sfDir] [reps]
  */
object Time {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-time")
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)  // bench-only <id>r keys also resolve
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(1)

    def runOnce(name: String, d: String): Double = name match {
      case "etl_sportstv"  => Bench.etlOnce(spark, d)._2
      case "stream_ingest" => Bench.streamIngestOnce(spark, d)._2
      case q =>
        val t0 = System.nanoTime()
        Goldens.allQueries(q)(spark, d)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
    }

    // warmup on the smallest SF so classload/codegen lands outside timings
    names.foreach(n => runOnce(n, "/root/testdata/sf0.001"))
    val timings = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; name <- names) {
      val sec = runOnce(name, dir)
      timings(name) :+= sec
      println(f"[time] $name $sec%.2f s")
    }
    if (reps > 1) names.foreach { n =>
      val ts = timings(n).sorted
      // true median: mean of the two middles on even counts — taking the
      // upper middle would report the MAX as "median" for reps=2
      val med =
        if (ts.size % 2 == 1) ts(ts.size / 2)
        else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2
      println(f"[time] $n summary min=${ts.min}%.2f s " +
        f"median=$med%.2f s max=${ts.max}%.2f s")
    }
    spark.stop()
  }
}
