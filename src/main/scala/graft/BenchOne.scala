package graft

/** Fresh-JVM isolated re-time of named bench entries (round 14) — the
  * manual arm of the placement instrument: when a committed full-map
  * reading looks implausible, the honest check is the same entry in a
  * process that has run NOTHING else (the in-JVM "isolated" re-time
  * still shares the session's accumulated SQL/AQE state, which is
  * exactly what a placement artifact hides in). Usage:
  *
  *   sbt "runMain graft.BenchOne <sfDir> <name>[,<name>…] [reps]"
  *
  * Names are registry keys plus the Bench synthetics
  * (`stream_ingest_bulk`, `stream_ingest`). Each entry runs `reps`
  * times (default 2 — first pays classload/codegen, both print). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).getOrElse("stream_ingest_bulk").split(',').toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Engine.session("graft-bench-one")
    names.foreach { name =>
      (1 to reps).foreach { i =>
        Caches.releaseAll(blocking = true)
        graft.operators.Prefix.releaseAll(blocking = true)
        System.gc()
        val sec = name match {
          case "stream_ingest_bulk" =>
            Bench.streamIngestOnce(spark, sfDir, filesPerTrigger = None)._2
          case "stream_ingest" =>
            Bench.streamIngestOnce(spark, sfDir)._2
          case q =>
            val t0 = System.nanoTime()
            Goldens.allQueries(q)(spark, sfDir)
              .write.mode("overwrite").format("noop").save()
            (System.nanoTime() - t0) / 1e9
        }
        println(f"[bench-one] $name%-24s rep=$i sec=$sec%7.2f")
      }
    }
    spark.stop()
  }
}
