package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The high-water batch marker shared by every per-batch ingest
  * ([[CorpusIngest]], [[VectorIngest]], [[PqIngest]]) — one file,
  * `<root>/_max_batch`, holding the highest batch id ever committed.
  *
  * Why it exists: Structured Streaming only ever replays the LATEST
  * uncommitted batch, so a batch id BELOW the recorded high water can
  * only mean a stream restarted against a FRESH checkpoint — which
  * renumbers from 0 and would Overwrite (destroy) the original seed
  * partition. The guard turns that silent data loss into a loud refusal.
  *
  * Publish is write-then-atomic-rename (the VersionedFactSink protocol):
  * `create(marker, overwrite = true)` truncates FIRST, so writing in
  * place could leave an empty marker after a crash and permanently brick
  * the ingest; and a crash between the old marker's delete and the
  * rename leaves only the tmp marker, which [[maxCommitted]] recovers
  * the guard from rather than silently reporting "no store". */
private[graft] object BatchMarker {

  private def fs(spark: SparkSession, path: String) = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def marker(rootDir: String) = new Path(s"$rootDir/_max_batch")

  /** Highest committed batch id, −1 for a fresh store. A corrupt marker
    * is a LOUD, self-describing failure naming the file to repair. */
  def maxCommitted(spark: SparkSession, rootDir: String): Long = {
    val f = fs(spark, rootDir)
    val m = marker(rootDir)
    if (!f.exists(m)) {
      val root = new Path(rootDir)
      if (!f.exists(root)) -1L
      else f.listStatus(root).map(_.getPath.getName)
        .filter(_.startsWith("_max_batch.tmp"))
        .map(_.stripPrefix("_max_batch.tmp").toLong)
        .foldLeft(-1L)(math.max)
    } else {
      val in = f.open(m)
      val raw = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
      require(raw.nonEmpty && raw.forall(_.isDigit),
        s"corrupt high-water marker $m (content: '$raw') — restore it to " +
          "the highest committed batch id or delete it if the store dirs " +
          "are known-consistent")
      raw.toLong
    }
  }

  /** Refuse a batch id below the high water (fresh-checkpoint stream
    * pointed at an existing store); returns the high water read ONCE for
    * the caller to thread through to [[publish]]. */
  def guard(spark: SparkSession, rootDir: String, batchId: Long): Long = {
    val highWater = maxCommitted(spark, rootDir)
    require(batchId >= highWater,
      s"batch $batchId below the high-water mark $highWater — a " +
        s"fresh-checkpoint stream must not overwrite $rootDir; use a new " +
        "store dir or restore the original checkpoint")
    highWater
  }

  /** Publish the new high water via write-then-atomic-rename. */
  def publish(spark: SparkSession, rootDir: String, batchId: Long,
      highWater: Long): Unit = {
    val f = fs(spark, rootDir)
    val tmp = new Path(s"$rootDir/_max_batch.tmp$batchId")
    val out = f.create(tmp, true)
    try out.write(math.max(batchId, highWater).toString.getBytes("UTF-8"))
    finally out.close()
    f.delete(marker(rootDir), false)
    require(f.rename(tmp, marker(rootDir)),
      s"could not publish high-water marker ${marker(rootDir)}")
  }
}

/** Write-aside + atomic-rename publish for a write-once seed table
  * (IVF centroids, PQ codebooks): the artifact is written to a `.tmp`
  * sibling, its `_SUCCESS` marker required, then renamed into place —
  * so the final directory either doesn't exist (replay re-seeds) or is
  * complete; existence IS readiness. A direct write would leave the
  * readiness probe a partial table after a mid-commit crash. */
private[graft] object SeedPublish {
  def publish(spark: SparkSession, df: org.apache.spark.sql.DataFrame,
      finalDir: String): Unit = {
    val f = new Path(finalDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(finalDir + ".tmp")
    df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(tmp.toString)
    require(f.exists(new Path(tmp, "_SUCCESS")),
      s"seed write of $finalDir left no _SUCCESS marker — aborting " +
        "before the publish; re-run the seeding batch")
    require(f.rename(tmp, new Path(finalDir)),
      s"could not publish seed table $finalDir")
  }
}
