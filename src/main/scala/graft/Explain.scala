package graft

/** Prints the formatted physical plan for one or all queries — the
  * plan-review loop: check PushedFilters/ReadSchema on scans, broadcast vs
  * shuffle joins, WholeStageCodegen spans.
  *
  * Usage: runMain graft.Explain [queryName] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-explain")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    // resolve through the FULL registry so bench-only raw forms
    // (<id>r keys, m-family) are explainable too; no-arg default stays
    // the contract queries
    val names = args.headOption
      .map(Seq(_)).getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    names.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.all(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
