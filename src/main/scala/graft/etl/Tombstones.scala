package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only tombstone log for targeted deletion — the opt-out /
  * right-to-be-forgotten primitive a training-data store cannot ship
  * without (reference scope stops at load-and-query; a 100 TB corpus
  * additionally has a legal clock ticking on every removal request).
  *
  * The design is the standard log-structured split every deletion-capable
  * table format uses (Delta DELETE + VACUUM, Iceberg delete files):
  *
  *  - **logical delete now**: deleting rewrites nothing — it appends the
  *    banned ids to a tiny sibling log, `<root>/_tombstones/del=<n>/`,
  *    one immutable parquet slice per request, published by
  *    write-aside + atomic rename (a crashed add leaves only an ignorable
  *    tmp dir, never a half-visible slice). Every reader masks through
  *    [[filterLive]], so the rows vanish from query results immediately —
  *    at the cost of one anti-join against an opt-out-request-sized frame
  *    (AQE broadcasts it in the common case; a worst-case huge ban list
  *    degrades to a shuffled anti-join, which is still the right shape);
  *  - **physical purge later**: compaction applies the log (drops the
  *    rows while rewriting) and only THEN clears exactly the slices it
  *    applied — so a crash at any point leaves the log covering every row
  *    not yet physically gone, and re-running the purge is the complete
  *    repair. Slices added concurrently with a purge survive it and apply
  *    on the next one.
  *
  * The log stores ids under the table's own id column name plus a
  * `reason` audit column — the deletion manifest a compliance review asks
  * for is the log itself (and [[clear]] only ever removes slices whose
  * rows are already physically absent, so a retained copy of the log
  * remains truthful history, never a resurrection vector).
  */
object Tombstones {

  private val LogName = "_tombstones"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(root: String) = s"$root/$LogName"

  /** Append one tombstone slice banning `ids` (a frame carrying `idCol`;
    * extra columns are dropped, duplicates collapsed). `reason` is
    * recorded on every row — audit trail, not behavior. */
  def add(spark: SparkSession, root: String, ids: DataFrame,
      idCol: String, reason: String = "optout"): Unit = {
    require(ids.columns.contains(idCol),
      s"tombstone frame has no '$idCol' column — found " +
        ids.columns.mkString(", "))
    val f = fs(spark, root)
    val log = new Path(logDir(root))
    val n = if (!f.exists(log)) 0L
      else f.listStatus(log).map(_.getPath.getName)
        .filter(_.startsWith("del="))
        .map(_.stripPrefix("del=").toLong).foldLeft(-1L)(math.max) + 1L
    // write aside, publish by rename: a reader listing del= slices can
    // never see a partially written one. The tmp path carries a
    // per-writer nonce — two concurrent adds both computing slice n
    // must not share it, or writer B's Overwrite clobbers A's tmp and
    // A's rename publishes B's ids while A's own request is silently
    // lost; with distinct tmps the slower rename fails loudly instead
    val tmp = new Path(log,
      s".add_tmp_${n}_${java.util.UUID.randomUUID().toString}")
    ids.select(col(idCol)).distinct()
      .withColumn("reason", lit(reason))
      .coalesce(1) // request-sized, one slice file
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val dst = new Path(log, s"del=$n")
    require(f.rename(tmp, dst),
      s"could not publish tombstone slice $dst — a concurrent delete " +
        "may have taken the slice number; retry")
  }

  /** The committed tombstone slice directories, absolute, sorted. */
  def slices(spark: SparkSession, root: String): Seq[String] = {
    val f = fs(spark, root)
    val log = new Path(logDir(root))
    if (!f.exists(log)) Seq.empty
    else f.listStatus(log).map(_.getPath)
      .filter(_.getName.startsWith("del="))
      .map(_.toString).sorted.toSeq
  }

  /** All banned ids (one column, `idCol`), or None when no log exists —
    * callers skip the anti-join entirely in the common no-deletions case. */
  def ids(spark: SparkSession, root: String,
      idCol: String): Option[DataFrame] =
    idsIn(spark, slices(spark, root), idCol)

  /** Banned ids from exactly `slicePaths` — the purge reads the snapshot
    * it will later [[clear]], so concurrent adds neither shift what a
    * running purge applies nor get cleared unapplied. */
  def idsIn(spark: SparkSession, slicePaths: Seq[String],
      idCol: String): Option[DataFrame] =
    if (slicePaths.isEmpty) None
    else Some(spark.read.parquet(slicePaths: _*)
      .select(col(idCol)).distinct())

  /** `df` minus tombstoned rows — identity when no log exists. */
  def filterLive(spark: SparkSession, root: String, df: DataFrame,
      idCol: String): DataFrame =
    ids(spark, root, idCol) match {
      case Some(banned) => df.join(banned, Seq(idCol), "left_anti")
      case None => df
    }

  /** Delete exactly `slicePaths` — called by a purge AFTER every table
    * holding the ids has been physically rewritten. Idempotent; deleting
    * slice-by-slice is safe because any crash leaves the remaining
    * slices masking ids that are (at worst) already gone. */
  def clear(spark: SparkSession, root: String,
      slicePaths: Seq[String]): Unit = {
    val f = fs(spark, root)
    slicePaths.foreach(p => f.delete(new Path(p), true))
  }

  // ---------------------------------------------- the replay-safe purge
  // A purge that simply CLEARED the log would leave one hole (r9 review):
  // the latest store-committed micro-batch may still crash-replay (its
  // source offsets can lag the store commit), and a replay after
  // delete+purge would find the banned id in neither the standing corpus
  // (physically purged) nor the log (cleared) — silently resurrecting
  // opted-out content. So a purge RETIRES slices instead of deleting
  // them: `del=<n>` → `applied=<n>_hw=<H>` with H the store's high-water
  // batch id at purge time. Readers ignore applied slices (their rows
  // are physically gone); the ingest door keeps banning their ids for
  // any batchId ≤ H — exactly the replayable window, since batches are
  // serial and a store-committed id > H proves every batch ≤ H has its
  // offsets committed — and sweeps them once the high water passes H.

  private def appliedSlices(spark: SparkSession,
      root: String): Seq[(String, Long)] = {
    val f = fs(spark, root)
    val log = new Path(logDir(root))
    if (!f.exists(log)) Seq.empty
    else f.listStatus(log).map(_.getPath)
      .filter(_.getName.startsWith("applied="))
      .map(p => (p.toString, p.getName.split("_hw=")(1).toLong)).toSeq
  }

  /** Retire exactly `slicePaths` after a physical purge: with
    * `highWater < 0` (no streaming marker — a non-streamed store where
    * no replay can exist) they are deleted outright; otherwise renamed
    * to `applied=` slices that keep the door ban alive for the
    * still-replayable batch. */
  def retire(spark: SparkSession, root: String, slicePaths: Seq[String],
      highWater: Long): Unit =
    if (highWater < 0L) clear(spark, root, slicePaths)
    else {
      val f = fs(spark, root)
      slicePaths.foreach { p =>
        val src = new Path(p)
        val n = src.getName.stripPrefix("del=")
        require(f.rename(src,
          new Path(src.getParent, s"applied=${n}_hw=$highWater")),
          s"could not retire tombstone slice $p")
      }
    }

  /** Ids banned from admission in batch `batchId`: every live tombstone
    * plus every applied slice whose purge-time high water is ≥ `batchId`
    * (i.e. the batch is a replay from the still-replayable window). */
  def bannedAt(spark: SparkSession, root: String, idCol: String,
      batchId: Long): Option[DataFrame] = {
    val live = slices(spark, root)
    val applied = appliedSlices(spark, root)
      .filter(_._2 >= batchId).map(_._1)
    idsIn(spark, live ++ applied, idCol)
  }

  /** Drop applied slices whose replayable window has closed — every
    * batch ≤ hw has provably committed its offsets once the store's
    * high water exceeds hw. Called by the ingests after each commit;
    * driver-side listing only. */
  def sweepApplied(spark: SparkSession, root: String,
      maxCommitted: Long): Unit = {
    val f = fs(spark, root)
    appliedSlices(spark, root).filter(_._2 < maxCommitted)
      .foreach { case (p, _) => f.delete(new Path(p), true) }
  }
}
