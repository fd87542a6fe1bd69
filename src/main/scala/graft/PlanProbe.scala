package graft

import org.apache.spark.sql.DataFrame

/** Dumps the formatted physical plans of the retrieval SERVE stages the
  * registry's store-backed entries (t50/t51/t54/t56/t59/t61/t62, the
  * hybrid serves) run internally — those entries' own returned frames
  * are eagerly collected bounded results (the overBm25Store temp-store
  * discipline), so `graft.Explain` on them shows only the local
  * re-materialization, not the plan that did the work. This main builds
  * one throwaway store the way the entries do and explains each serve
  * call against it; the optimization round's plan evidence (the
  * `_before.txt` / `_after.txt` files under `plans/r14`) is captured
  * with it.
  *
  * Usage: runMain graft.PlanProbe [sfDir] [outDir]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("plans/r14")
    val suffix = args.lift(2).getOrElse("before")
    val spark = Engine.session("graft-plan-probe")
    import graft.text.Retrieval
    val store = java.nio.file.Files
      .createTempDirectory("graft_plan_probe").toString
    val docs = Tables(spark, dir, "documents")
    Retrieval.buildIndex(spark, docs, store)
    val queries = Retrieval.probeQueriesFromStore(spark, store)

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    def dump(name: String, df: => DataFrame): Unit = {
      val plan = try {
        // explain("formatted") prints; capture via the same API it calls
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      } catch { case e: Throwable => s"FAILED to plan: ${e.getMessage}" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out, s"${name}_$suffix.txt"),
        (s"// $name — internal serve-stage plan over a store built from " +
          s"$dir (registry entry returns a collected bounded frame; this " +
          "is the plan that does the work)\n" + plan + "\n")
          .getBytes("UTF-8"))
      System.err.println(s"[plan-probe] wrote $out/${name}_$suffix.txt")
    }

    dump("t50_bm25_store_topk",
      Retrieval.bm25TopKFromStore(spark, store))
    dump("t51_bm25_store_multiterm",
      Retrieval.bm25QueryTopKFromStore(spark, store, queries))
    dump("t56_prf_store",
      Retrieval.bm25PrfTopKFromStore(spark, store, queries))
    dump("t59_lm_store",
      Retrieval.lmTopKFromStore(spark, store, queries))
    dump("t54_sparse_serve",
      Retrieval.hybridTopKFromStoresExternal(spark, store,
        ivfDir = s"$store/no_ivf", pqDir = s"$store/no_pq", queries,
        lists = Seq("sparse")))
    dump("t61_lm_serve",
      Retrieval.hybridTopKFromStoresExternal(spark, store,
        ivfDir = s"$store/no_ivf", pqDir = s"$store/no_pq", queries,
        lists = Seq("lm")))
    dump("t62_sparse_lm_serve",
      Retrieval.hybridTopKFromStoresExternal(spark, store,
        ivfDir = s"$store/no_ivf", pqDir = s"$store/no_pq", queries,
        lists = Seq("sparse", "lm")))

    val p = new org.apache.hadoop.fs.Path(store)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
