package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Table-maintenance operations for parquet stores.
  *
  * Micro-batch ingest (StreamingIngest's per-batch staging) and
  * fine-grained partition writes accumulate files far below the parquet
  * sweet spot; every later scan then pays per-file open/footer cost and
  * the driver pays per-file listing. Compaction is the standing fix —
  * table formats run it as a service; on raw parquet it is a rewrite. */
object Maintenance {

  /** Rewrite `dir` into ~`targetFileBytes` files. The target partition
    * count derives from the CURRENT on-disk byte size (compressed), so the
    * rewrite is size-aware rather than guessing; `repartition` (not
    * `coalesce`) so oversized inputs are SPLIT as well as merged and the
    * write itself parallelizes. The rewrite lands in a sibling temp dir
    * and swaps in via two renames — the window where `dir` is absent is
    * two metadata ops, and a crash leaves either the old or the new
    * directory intact (plus at worst an orphan temp to sweep), never a
    * half-merged store. Returns (files before, files after). */
  def compactParquet(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.listFiles(path, true)
    var nBefore = 0
    var bytes = 0L
    while (before.hasNext) {
      val f = before.next()
      if (f.getPath.getName.endsWith(".parquet")) { nBefore += 1; bytes += f.getLen }
    }
    val parts = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)

    val tmp = new Path(path.getParent, s".${path.getName}__compacting")
    fs.delete(tmp, true)
    spark.read.parquet(dir)
      .repartition(parts)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val old = new Path(path.getParent, s".${path.getName}__old")
    fs.delete(old, true)
    require(fs.rename(path, old), s"compact: could not move $path aside")
    require(fs.rename(tmp, path), s"compact: could not promote $tmp")
    fs.delete(old, true)

    val after = fs.listFiles(path, true)
    var nAfter = 0
    while (after.hasNext) {
      if (after.next().getPath.getName.endsWith(".parquet")) nAfter += 1
    }
    (nBefore, nAfter)
  }
}
