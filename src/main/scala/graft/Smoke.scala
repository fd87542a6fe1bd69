package graft

/** Local smoke: drives the driver contract exactly as the driver does —
  * `SparkEntry.entry` on sf0.001 must return rows, and every `queries` key
  * must have a matching `oracleSql` entry (keys without oracle are listed,
  * not failed — the driver records a weaker rows-only check for those). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-smoke")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n " + (if (n > 0) "OK" else "FAIL"))
    if (n == 0) sys.exit(1) // the gate must gate
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val danglingOracle = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    println(s"SMOKE queries=${SparkEntry.queries.size} rowsOnly=${noOracle.toSeq.sorted.mkString(",")}")
    if (danglingOracle.nonEmpty) {
      println(s"SMOKE FAIL dangling oracle keys: ${danglingOracle.mkString(",")}")
      sys.exit(1)
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.lift(1) // optional substring filter
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(n.contains) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"SMOKE $name%-28s rows=$rows%-8d sec=$sec%.1f")
      }
    spark.stop()
  }
}
