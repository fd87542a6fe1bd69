package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One read-only health report over the whole serving stack (round 12)
  * — the `DESCRIBE` / healthz endpoint an operator reads before (or
  * instead of) paging through four stores by hand: the text corpus
  * store, the IVF and PQ index stores, and the results delivery log,
  * each summarized from METADATA only (directory listings, the 1-row
  * marker/baseline/dials tables) — no corpus-sized scan, so it is safe
  * to poll from a dashboard at any store size.
  *
  * What each field answers:
  *  - `*_high_water` — the replay guard's watermark per store (−1 =
  *    never written / not a streamed store);
  *  - `*_tombstones` — live deletion-log slices awaiting a purge;
  *  - `tf_present`/`dl_present`/`tf_bucketed` — can the sparse side
  *    serve from the store, and is its scoring scan postings-sized
  *    (an un-bucketed tf is [[IndexMaintenance.maintainCorpus]]'s
  *    `tf_unbucketed` reindex trigger);
  *  - `*_baseline` — the drift anchor a maintenance cycle would judge
  *    growth against (NaN-free: null = not pinned yet);
  *  - `dials_*` — the persisted recommendation [[QueryServe]] serves at
  *    (null = defaults);
  *  - `pq_retrain_inflight` — a crashed [[IndexMaintenance.retrainPq]]
  *    swap awaiting the roll-forward re-encode;
  *  - `results_*` — delivery-log footprint: per-batch slices standing,
  *    whether consolidated history exists.
  *
  * The report DESCRIBES; the maintenance entries DECIDE
  * ([[IndexMaintenance.maintain]]/[[IndexMaintenance.maintainPq]]/
  * [[IndexMaintenance.maintainCorpus]]/[[QueryServe.maintainResults]]).
  * Safe while streams run (pure reads; a concurrent commit moves a
  * number, never corrupts the read). */
object ServingStatus {

  private final case class Status(
      corpus_exists: Boolean, corpus_high_water: Long,
      corpus_docs_slices: Int, corpus_tombstones: Int,
      tf_present: Boolean, tf_bucketed: Boolean, dl_present: Boolean,
      ivf_exists: Boolean, ivf_high_water: Long, ivf_tombstones: Int,
      ivf_baseline: Option[Double],
      dials_nprobe: Option[Int], dials_rerank: Option[Int],
      dials_recall: Option[Double],
      pq_exists: Boolean, pq_high_water: Long, pq_tombstones: Int,
      pq_baseline: Option[Double], pq_retrain_inflight: Boolean,
      results_exists: Boolean, results_high_water: Long,
      results_slices: Int, results_consolidated: Boolean)

  def report(spark: SparkSession, corpusDir: String, ivfDir: String,
      pqDir: String, resultsDir: String): DataFrame = {
    def fs(p: String) = new Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(p: String) = fs(p).exists(new Path(p))
    def slices(dir: String): Seq[String] =
      if (!exists(dir)) Seq.empty
      else fs(dir).listStatus(new Path(dir)).map(_.getPath.getName).toSeq
        .filter(_.startsWith("batch="))
    def hasColumn(dir: String, colName: String): Boolean =
      exists(dir) && spark.read.option("basePath", dir).parquet(dir)
        .columns.contains(colName)

    val dials = IndexMaintenance.readDials(spark, ivfDir)
    val resultSlices = slices(s"$resultsDir/served")
    import spark.implicits._
    Seq(Status(
      // a corpus store is either door-managed (docs + derived tables)
      // or a buildIndex-only BM25 store (tf/dl without docs) — both
      // count as present; corpus_docs_slices says which
      corpus_exists = exists(s"$corpusDir/docs") ||
        exists(s"$corpusDir/tf") || exists(s"$corpusDir/dl"),
      corpus_high_water = BatchMarker.maxCommitted(spark, corpusDir),
      corpus_docs_slices = slices(s"$corpusDir/docs").size,
      corpus_tombstones =
        graft.etl.Tombstones.slices(spark, corpusDir).size,
      tf_present = exists(s"$corpusDir/tf"),
      tf_bucketed = hasColumn(s"$corpusDir/tf", "tb"),
      dl_present = exists(s"$corpusDir/dl"),
      ivf_exists = exists(s"$ivfDir/_graft_index.json"),
      ivf_high_water = BatchMarker.maxCommitted(spark, ivfDir),
      ivf_tombstones = graft.etl.Tombstones.slices(spark, ivfDir).size,
      ivf_baseline = IndexMaintenance.baselineMsd(spark, ivfDir),
      dials_nprobe = dials.map(_._1),
      dials_rerank = dials.map(_._2),
      dials_recall = dials.map(_._3),
      pq_exists = exists(s"$pqDir/_graft_index.json"),
      pq_high_water = BatchMarker.maxCommitted(spark, pqDir),
      pq_tombstones = graft.etl.Tombstones.slices(spark, pqDir).size,
      pq_baseline = IndexMaintenance.baselineMsd(spark, pqDir),
      pq_retrain_inflight = IndexMaintenance.retrainInflight(spark, pqDir),
      results_exists = exists(s"$resultsDir/served"),
      results_high_water = BatchMarker.maxCommitted(spark, resultsDir),
      results_slices = resultSlices.count(_ != "batch=-1"),
      results_consolidated = resultSlices.contains("batch=-1")))
      .toDF()
  }
}
