package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for the streamed per-batch layouts — the
  * maintenance operation the ingest-at-the-door design defers: both
  * [[CorpusIngest]] (docs/fps/shingles) and [[VectorIngest]] (assigned)
  * write ONE immutable `batch=<N>` directory per micro-batch, which is
  * what makes replays idempotent — but at production trigger rates that
  * is thousands of parquet directories per table per day, and at 100 TB
  * the file-listing and per-file open costs of a scan come to dominate
  * long before the data does (the classic small-file problem every
  * log-structured table format pairs with a compactor: Delta OPTIMIZE,
  * Iceberg rewrite_data_files).
  *
  * [[compactTable]] folds every committed slice into ONE consolidated
  * `batch=-1` slice, sized by bytes, with the publish discipline the rest
  * of this repo uses (write aside, swap atomically, clean up last):
  *
  *  1. the consolidated slice is written to a `.compact_tmp` SIBLING of
  *     the table dir (never inside it — a reader of the live table can
  *     never see half a compaction), and its `_SUCCESS` marker is
  *     required before anything is touched;
  *  2. the live dir is renamed to `.compact_old`, the tmp dir renamed
  *     into place — two atomic directory renames;
  *  3. `.compact_old` is deleted.
  *
  * Every crash window is recoverable by [[recoverTable]], which
  * [[compactTable]] also runs first so a re-run after any crash is the
  * complete repair procedure:
  *  - tmp only (crash before the swap): delete tmp — the live table was
  *    never touched;
  *  - old present, live missing (crash between the renames): roll
  *    FORWARD when tmp carries `_SUCCESS` (the swap finishes), roll back
  *    to old otherwise;
  *  - old and live both present (crash after publish): delete the
  *    leftovers.
  *
  * `batch=-1` is chosen because Structured Streaming batch ids are
  * nonnegative: the ingests' redelivery exclusion (`batch =!= batchId`)
  * can never match it, so compacted rows always count as standing
  * corpus — a replayed micro-batch after compaction still classifies its
  * prior admissions as already-present instead of re-admitting them, and
  * a fresh write can never collide with the consolidated slice. Content
  * is untouched (same rows, one layout), so probes, dedup decisions, and
  * [[graft.similarity.IndexStore.loadIvf]] results are provably
  * unchanged — spec-asserted in CompactionSpec.
  *
  * The stream MUST be stopped while compacting (the same offline
  * contract as [[graft.etl.VersionedFactSink.vacuum]]): both ingests
  * refuse to merge a batch while compaction leftovers exist, naming this
  * class, so a stream resumed against a mid- or crashed-compaction table
  * fails loudly instead of racing the swap.
  */
object Compaction {

  private def fsFor(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmpDir(tableDir: String) = new Path(tableDir + ".compact_tmp")
  private def oldDir(tableDir: String) = new Path(tableDir + ".compact_old")
  private def tmpComplete(f: org.apache.hadoop.fs.FileSystem,
      tableDir: String): Boolean =
    f.exists(new Path(tmpDir(tableDir), "batch=-1/_SUCCESS"))

  /** True when a compaction of `tableDir` is in flight or crashed —
    * the ingests' merge guard. */
  def inProgress(spark: SparkSession, tableDir: String): Boolean = {
    val f = fsFor(spark, tableDir)
    f.exists(tmpDir(tableDir)) || f.exists(oldDir(tableDir))
  }

  /** Repair `tableDir` after a crashed [[compactTable]] — idempotent,
    * safe on a healthy table (no-op), and total: every reachable crash
    * state maps to exactly one action (see the class doc). */
  def recoverTable(spark: SparkSession, tableDir: String): Unit = {
    val f = fsFor(spark, tableDir)
    val live = new Path(tableDir)
    val tmp = tmpDir(tableDir)
    val old = oldDir(tableDir)
    if (f.exists(old)) {
      if (f.exists(live)) { // crash after publish: leftovers only
        f.delete(old, true)
        f.delete(tmp, true)
      } else if (tmpComplete(f, tableDir)) { // mid-swap: finish it
        require(f.rename(tmp, live),
          s"could not roll forward crashed compaction of $tableDir")
        f.delete(old, true)
      } else { // mid-swap with an incomplete tmp: restore the original
        require(f.rename(old, live),
          s"could not roll back crashed compaction of $tableDir")
        f.delete(tmp, true)
      }
    } else if (f.exists(tmp)) { // crash before the swap: live untouched
      f.delete(tmp, true)
    }
  }

  /** Fold all `batch=<N>` slices of `tableDir` into one consolidated
    * `batch=-1` slice of ~`targetPartitionBytes` output partitions.
    * No-op on a missing or empty table; idempotent (re-compacting a
    * compacted table rewrites the same single slice). The caller must
    * have stopped any stream writing to this table.
    *
    * `dropIds` is the physical-purge hook ([[graft.etl.Tombstones]]):
    * `(ids, idCol)` rows are anti-joined away during the rewrite, so a
    * purge costs nothing beyond the compaction it rides — the Delta
    * DELETE-at-OPTIMIZE shape. The caller clears the tombstone log only
    * AFTER this returns; a crash mid-compaction leaves the log masking
    * the not-yet-purged rows, and the re-run applies it again
    * (anti-joining ids that are already gone is a no-op). */
  def compactTable(spark: SparkSession, tableDir: String,
      targetPartitionBytes: Long = 128L * 1024 * 1024,
      dropIds: Option[(org.apache.spark.sql.DataFrame, String)] = None,
      sortBy: Seq[String] = Nil): Unit = {
    require(targetPartitionBytes > 0,
      s"targetPartitionBytes must be positive, got $targetPartitionBytes")
    val f = fsFor(spark, tableDir)
    recoverTable(spark, tableDir)
    val live = new Path(tableDir)
    if (!f.exists(live)) return
    // a NON-batch layout (e.g. IndexStore.saveIvf's plain `assigned/`) is
    // one logical slice: fold it into batch=-1 the same way, so a purge
    // over a non-streamed store still REWRITES before the tombstone log
    // is cleared — skipping here would let the caller clear the log with
    // the rows physically present, silently resurrecting deleted ids
    val bytes = f.getContentSummary(live).getLength
    if (bytes == 0L) return

    // size the consolidated slice by BYTES, not by slice count — the
    // whole point is that thousands of tiny slices collapse into however
    // few target-sized files the data actually fills
    val nParts = math.max(1L,
      (bytes + targetPartitionBytes - 1) / targetPartitionBytes).toInt

    // mergeSchema (round 14): a MIXED-layout table — slices written
    // before a data column existed (tf's `tb`, served results'
    // round-13/14 provenance) beside slices that carry it — must fold
    // to the UNION of columns, not to whichever single footer Spark
    // happens to infer from (which could silently drop the column from
    // every row). Old-slice rows read null for the columns they
    // predate; the footer sweep is O(slice files), the same cost class
    // as the compaction's own listing.
    val all = spark.read.option("basePath", tableDir)
      .option("mergeSchema", "true").parquet(tableDir)
      .drop("batch")
    val kept = dropIds match {
      case Some((ids, idCol)) => all.join(
        ids.select(idCol).distinct(), Seq(idCol), "left_anti")
      case None => all
    }
    // a sort request over a column the table predates (an old-layout
    // store being compacted by new code) degrades to the unshaped write
    publishSlice(spark, tableDir, kept, nParts,
      sortBy.filter(kept.columns.contains))
  }

  /** Publish `df` as `tableDir`'s single consolidated `batch=-1` slice
    * with the write-aside + atomic-swap + cleanup-last discipline —
    * the publish step of [[compactTable]], exposed for maintenance ops
    * that REBUILD a table's content rather than fold its slices
    * ([[CorpusIngest.reindex]]). Uses the same tmp/old markers, so
    * [[recoverTable]] repairs a crash here identically. A missing live
    * table (rebuilding a lost derived table — the recovery use case) is
    * legal: the swap degrades to a single publish rename. The caller
    * must have stopped any stream writing to this table. */
  def publishSlice(spark: SparkSession, tableDir: String,
      df: org.apache.spark.sql.DataFrame, nParts: Int,
      sortBy: Seq[String] = Nil): Unit = {
    require(nParts > 0, s"nParts must be positive, got $nParts")
    val f = fsFor(spark, tableDir)
    recoverTable(spark, tableDir)
    val live = new Path(tableDir)
    val tmp = tmpDir(tableDir)
    // `sortBy` clusters the consolidated slice (hash-repartition on the
    // sort key + sort within each file), so each file's row groups cover
    // narrow key ranges and a pushed IN/range filter on the key skips
    // files and row groups at the scan — the layout that makes the BM25
    // tf table's term-bucket pruning an IO saving, not just a row filter
    val shaped =
      if (sortBy.isEmpty) df.repartition(nParts)
      else df.repartition(nParts, sortBy.map(col): _*)
        .sortWithinPartitions(sortBy.map(col): _*)
    shaped
      .write.mode(SaveMode.Overwrite)
      .parquet(new Path(tmp, "batch=-1").toString)
    require(tmpComplete(f, tableDir),
      s"consolidated write of $tableDir left no _SUCCESS marker — aborting " +
        "before the swap; the live table is untouched")

    if (f.exists(live))
      require(f.rename(live, oldDir(tableDir)),
        s"could not stage $tableDir aside for the compaction swap")
    require(f.rename(tmp, live),
      s"could not publish the compacted $tableDir — run recoverTable to " +
        "repair (the consolidated slice is complete, recovery rolls forward)")
    f.delete(oldDir(tableDir), true)
  }
}
