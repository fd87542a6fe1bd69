package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Measures what [[graft.streaming.IndexMaintenance]] costs — the
  * numbers behind the drift→retrain loop's SCALING.md cost note:
  *
  *  - a NOOP maintenance cycle (the per-ingest-session steady state):
  *    drift report + misassignment count, ~2 broadcast-centroid corpus
  *    passes;
  *  - a RETRAIN cycle on a deliberately drifted store (half the corpus
  *    rotated far from the seed distribution): decision + bounded-sample
  *    KMeans refit + centroid swap + consolidated reassignment rewrite +
  *    baseline re-pin;
  *  - the per-query probe cost before/after, so the retrain's recall
  *    recovery (IndexMaintenanceSpec pins it functionally) is priced.
  *
  * Usage: runMain graft.MaintenanceReplay [sfDir] [workDir]
  */
object MaintenanceReplay {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-maintenance-replay")
    import spark.implicits._
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("/tmp/graft_maintenance_replay")

    val f = new Path(workDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(workDir), true)
    val indexDir = s"$workDir/index"

    val emb = Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val dim = emb.select(size(col("embedding"))).head.getInt(0)

    def timed(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[maint] $label%-28s $s%7.2f s")
      s
    }

    // seed the streamed store with the first half of the corpus
    val merger = new graft.streaming.VectorIngest.Merger(spark, indexDir)
    merger.mergeBatch(emb.filter(col("vec_id") < n / 2), 0L)
    timed("maintain noop (+pin)") {
      graft.streaming.IndexMaintenance.maintain(spark, indexDir).collect()
    }
    timed("maintain noop (steady)") {
      graft.streaming.IndexMaintenance.maintain(spark, indexDir).collect()
    }

    // drift: the second half arrives ROTATED far from the seed region
    // (scaled + shifted per coordinate — quantization error explodes
    // against the frozen centroids, the retrain trigger)
    val drifted = emb.filter(col("vec_id") >= n / 2)
      .select(col("vec_id"),
        transform(col("embedding"),
          (x, i) => (x * 3.0f - i.cast("float") % lit(dim.toFloat)))
          .as("embedding"))
    merger.mergeBatch(drifted, 1L)
    val report = graft.streaming.IndexMaintenance
      .maintain(spark, indexDir, execute = false).head()
    println(s"[maint] drifted decision=${report.getAs[String]("decision")} " +
      s"msd=${report.getAs[Double]("mean_sq_dist")} " +
      s"baseline=${report.getAs[Double]("baseline_msd")}")
    timed("maintain retrain")(
      graft.streaming.IndexMaintenance.maintain(spark, indexDir).collect())
    timed("maintain noop (post)")(
      graft.streaming.IndexMaintenance.maintain(spark, indexDir).collect())

    // probe cost on the retrained store, for scale context
    val idx = graft.similarity.IndexStore.loadIvf(spark, indexDir)
    timed("probe topK(5q, k=5)")(
      idx.topK(col("vec_id") < 5, 5).write
        .mode("overwrite").format("noop").save())
    idx.release()
    emb.unpersist()
    f.delete(new Path(workDir), true)
    spark.stop()
  }
}
