package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

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

    // a partitioned store (year=, batch=) compacted WITHOUT partitionBy
    // would flatten partition dirs into data columns: later dynamic
    // partition-overwrite merges stop replacing old partitions (duplicated
    // facts) and new partitioned writes produce a mixed layout — so detect
    // the hive layout and rewrite with the same spec
    val partCols = partitionColumnsOf(fs, path)
    val tmp = new Path(path.getParent, s".${path.getName}__compacting")
    fs.delete(tmp, true)
    val df = spark.read.parquet(dir)
    val writer =
      if (partCols.isEmpty) df.repartition(parts).write
      else df.repartition(parts, partCols.map(col): _*)
        .write.partitionBy(partCols: _*)
    writer.mode(SaveMode.Overwrite).parquet(tmp.toString)
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

  /** Hive-style partition columns of `path`, outermost first: at each level
    * every visible subdirectory must be `k=v` with one shared `k`; the walk
    * descends the first match until the layout stops. Empty for a flat
    * store. A mixed level (some `k=v`, some not) fails fast rather than
    * guessing — compacting such a layout silently would corrupt it. */
  private def partitionColumnsOf(fs: FileSystem, root: Path): Seq[String] = {
    val cols = Seq.newBuilder[String]
    var level = root
    var done = false
    while (!done) {
      val subdirs = fs.listStatus(level)
        .filter(_.isDirectory)
        .map(_.getPath)
        .filterNot(p => p.getName.startsWith(".") || p.getName.startsWith("_"))
      val keys = subdirs.map(_.getName.split("=", 2))
      if (subdirs.isEmpty || keys.exists(_.length < 2)) {
        require(keys.forall(_.length < 2),
          s"$level mixes partition (k=v) and plain subdirectories — " +
            "refusing to compact an ambiguous layout")
        done = true
      } else {
        val names = keys.map(_.head).distinct
        require(names.length == 1,
          s"$level has conflicting partition keys ${names.mkString(", ")}")
        cols += names.head
        level = subdirs.head
      }
    }
    cols.result()
  }
}
