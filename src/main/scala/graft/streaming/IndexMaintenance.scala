package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.{IndexStore, Similarity}

/** The consumer of [[graft.similarity.Similarity.IvfIndex.driftReport]]
  * (r9 verdict #5 — the report existed, nothing acted on it): a
  * maintenance policy that reads the streamed index's health against a
  * pinned baseline and DECIDES {noop, reassign, retrain}, then executes
  * the decision against the [[VectorIngest]] store with the ingest
  * paths' crash-safety discipline.
  *
  * Why three actions, not two:
  *
  *  - **reassign** (cheap: one assignment pass, no KMeans) repairs rows
  *    whose STORED cell is not the argmin cell under the standing
  *    centroids. The ingest paths can't produce this state — assignment
  *    at the door is always argmin — so a nonzero `misassigned` count
  *    means slice corruption, manual surgery, or a crash inside a prior
  *    RETRAIN (see below); recomputing assignments is the complete and
  *    proportionate repair.
  *  - **retrain** (expensive: sampled KMeans refit + full reassignment)
  *    answers DISTRIBUTION drift, which no reassignment can fix because
  *    the centroids themselves no longer span the data: quantization
  *    error (`mean_sq_dist`) growing past `maxMsdGrowth`× the baseline,
  *    probe-cost balance collapsing (`cell_skew` past `maxCellSkew`),
  *    or the quantizer going sparse (`empty_frac` past `maxEmptyFrac`).
  *  - **noop** otherwise — the common case; [[maintain]] costs one
  *    corpus pass (the drift report + misassignment count share the
  *    same broadcast-centroid scan) and is meant to run after every
  *    ingest session, NOT every batch.
  *
  * Baseline discipline: the reference `mean_sq_dist` lives in
  * `<indexDir>/_drift_baseline` (one row), pinned by the FIRST
  * [[maintain]] call (run one right after seeding) and re-pinned after
  * every retrain — drift is "worse than the quantizer's own fit at
  * train time", not an absolute constant, so thresholds transfer
  * across corpora and dimensions.
  *
  * Retrain crash-safety (the VersionedFactSink pointer-swap discipline,
  * ordered to SELF-HEAL): the new centroids swap in FIRST, then the new
  * assignment publishes through [[Compaction.publishSlice]] (write-aside
  * + `_SUCCESS`-gated atomic swap). A crash between the two leaves the
  * standing assignment inconsistent with the NEW centroids — which is
  * exactly a nonzero `misassigned` count, so the next [[maintain]]
  * decides `reassign` and completes the retrain's second half against
  * the already-published centroids (the reverse order would "repair"
  * the new assignment back onto the OLD centroids, undoing the
  * retrain). The stream must be STOPPED, as for every maintenance op.
  *
  * The PQ twin ([[PqIngest]]) stores codes, not vectors, so it cannot
  * measure its own drift; in the shared-drop-dir topology the two
  * ingests see the SAME distribution, so this store's retrain decision
  * is the trigger for [[retrainPq]] too, which re-seeds the codebooks
  * from the vector store's rows under the same swap discipline.
  */
object IndexMaintenance {

  final case class Thresholds(
      maxMsdGrowth: Double = 1.5,
      maxCellSkew: Double = 4.0,
      maxEmptyFrac: Double = 0.5)

  private val BaselineName = "_drift_baseline"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def baselineMsd(spark: SparkSession,
      indexDir: String): Option[Double] = {
    val p = s"$indexDir/$BaselineName"
    if (!fs(spark, p).exists(new Path(p))) None
    else Some(spark.read.parquet(p).head().getAs[Double]("metric"))
  }

  private def pinBaseline(spark: SparkSession, indexDir: String,
      metric: Double): Unit = {
    import spark.implicits._
    val p = s"$indexDir/$BaselineName"
    val f = fs(spark, p)
    // replace-in-place via tmp + swap: the baseline is one row, but a
    // half-written table would poison every later decision
    val tmp = new Path(p + ".swap_tmp")
    Seq(metric).toDF("metric").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(tmp.toString)
    val live = new Path(p)
    if (f.exists(live)) f.delete(live, true)
    require(f.rename(tmp, live), s"could not publish drift baseline $p")
  }

  /** The pure policy — spec-able without a store. Precedence: a
    * structural inconsistency (misassigned rows) is repaired before
    * drift is judged, because drift metrics over a mis-assigned table
    * are themselves unreliable. With no pinned baseline the msd-growth
    * rule abstains (skew/empty still judge — they are absolute). */
  def decide(misassigned: Long, msd: Double, baseline: Option[Double],
      cellSkew: Double, emptyFrac: Double,
      th: Thresholds = Thresholds()): String =
    if (misassigned > 0L) "reassign"
    else if (baseline.exists(b => msd > b * th.maxMsdGrowth) ||
      cellSkew > th.maxCellSkew || emptyFrac > th.maxEmptyFrac) "retrain"
    else "noop"

  /** One maintenance cycle against a [[VectorIngest]]-layout store (also
    * any [[IndexStore.saveIvf]] directory): measure → decide → execute →
    * return the 1-row decision report
    * `(decision, executed, misassigned, mean_sq_dist, baseline_msd,
    * cell_skew, empty_frac, n_vectors)`. First call pins the baseline
    * and never retrains on the msd rule. `execute = false` is the
    * dry-run (report the decision, touch nothing — baseline still pins
    * on first contact so the NEXT cycle can judge growth). The stream
    * must be stopped. */
  def maintain(spark: SparkSession, indexDir: String,
      th: Thresholds = Thresholds(), execute: Boolean = true,
      targetPartitionBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(!Compaction.inProgress(spark, s"$indexDir/assigned"),
      s"compaction leftovers exist beside $indexDir/assigned — run " +
        "Compaction.recoverTable first")
    val idx = IndexStore.loadIvf(spark, indexDir)
    try {
      val report = idx.driftReport().head()
      val nVectors = report.getAs[Long]("n_vectors")
      val msd = report.getAs[Double]("mean_sq_dist")
      val skew = report.getAs[Double]("cell_skew")
      val emptyFrac = report.getAs[Long]("empty_cells").toDouble /
        math.max(report.getAs[Long]("n_cells"), 1L)
      // stored cell vs argmin cell under the standing centroids — one
      // more broadcast-centroid pass (assignToCells is the door's own
      // kernel, so "misassigned" can never disagree with what ingest
      // would have written)
      val misassigned = idx.assigned.select(col("vec_id"), col("cell"))
        .join(Similarity.assignToCells(
          idx.assigned.select("vec_id", "embedding"), idx.centroids)
          .select(col("vec_id"), col("cell").as("want")), "vec_id")
        .filter(col("cell") =!= col("want"))
        .count()
      val base = baselineMsd(spark, indexDir)
      val decision = decide(misassigned, msd, base, skew, emptyFrac, th)
      if (base.isEmpty) pinBaseline(spark, indexDir, msd)

      if (execute) decision match {
        case "reassign" =>
          val fixed = Similarity.assignToCells(
            idx.assigned.select("vec_id", "embedding"), idx.centroids)
            .select("vec_id", "embedding", "cell")
          Compaction.publishSlice(spark, s"$indexDir/assigned", fixed,
            nPartsFor(spark, s"$indexDir/assigned", targetPartitionBytes))
        case "retrain" =>
          val nlist = idx.centroids.count().toInt
          val fresh = Similarity.buildIvfIndex(
            idx.assigned.select("vec_id", "embedding"), nlist)
          // publish the plan's rows BEFORE any swap: both new tables
          // derive from the OLD assigned table, and publishSlice would
          // otherwise re-read a table it is replacing mid-swap
          val newAssigned = fresh.assigned
            .select("vec_id", "embedding", "cell").localCheckpoint()
          val newCentroids = fresh.centroids.localCheckpoint()
          // centroids first (see scaladoc: a crash between the swaps
          // self-heals as a `reassign` on the next cycle)
          replaceDir(spark, s"$indexDir/centroids",
            newCentroids.select("cell", "centroid"))
          Compaction.publishSlice(spark, s"$indexDir/assigned",
            newAssigned,
            nPartsFor(spark, s"$indexDir/assigned", targetPartitionBytes))
          fresh.release()
          val retrained = IndexStore.loadIvf(spark, indexDir)
          try pinBaseline(spark, indexDir,
            retrained.driftReport().head().getAs[Double]("mean_sq_dist"))
          finally retrained.release()
        case _ => ()
      }

      import spark.implicits._
      Seq((decision, execute, misassigned, msd,
        base.getOrElse(Double.NaN), skew, emptyFrac, nVectors))
        .toDF("decision", "executed", "misassigned", "mean_sq_dist",
          "baseline_msd", "cell_skew", "empty_frac", "n_vectors")
    } finally idx.release()
  }

  /** The PQ twin of [[maintain]] (giving the code store its OWN
    * measured trigger instead of borrowing the IVF report): measure
    * [[graft.similarity.Similarity.pqDriftReport]] over the store's
    * codes and the supplied `vectors` (the vector twin's rows — a PQ
    * store holds no floats) → decide {noop, reencode, retrain} →
    * execute. `reencode` is the reassign analog: vectors the code table
    * LACKS (invisible to every ADC probe — slice corruption or a
    * crashed retrain's second half) get encoded against the standing
    * codebooks and the table consolidates; `retrain` answers
    * reconstruction-error growth past `th.maxMsdGrowth`× the pinned
    * baseline via [[retrainPq]] (codebooks swap first — a crash between
    * the swaps leaves codes stale against new books, which the next
    * cycle reads as uncoded/misfit rows and repairs forward). Baseline
    * pinned at first contact, re-pinned after every retrain. Returns
    * `(decision, executed, n_vectors, n_coded, mean_sq_err,
    * baseline_err)`. The stream must be stopped. */
  def maintainPq(spark: SparkSession, indexDir: String, vectors: DataFrame,
      th: Thresholds = Thresholds(), execute: Boolean = true,
      m: Int = 8, k: Int = 16,
      targetPartitionBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(!Compaction.inProgress(spark, s"$indexDir/codes"),
      s"compaction leftovers exist beside $indexDir/codes — run " +
        "Compaction.recoverTable first")
    val idx = IndexStore.loadPq(spark, indexDir)
    try {
      val rep = Similarity.pqDriftReport(idx, vectors).head()
      val nVectors = rep.getAs[Long]("n_vectors")
      val nCoded = rep.getAs[Long]("n_coded")
      val err = rep.getAs[Double]("mean_sq_err")
      val base = baselineMsd(spark, indexDir)
      val decision = decide(nVectors - nCoded, err, base,
        cellSkew = 1.0, emptyFrac = 0.0, th) match {
        case "reassign" => "reencode" // the PQ repair action's real name
        case d => d
      }
      if (base.isEmpty) pinBaseline(spark, indexDir, err)

      if (execute) decision match {
        case "reencode" =>
          val missing = vectors.select("vec_id", "embedding")
            .join(idx.codes.select("vec_id"), Seq("vec_id"), "left_anti")
          val repaired = idx.codes.select("vec_id", "code").unionByName(
            Similarity.encodeWithCodebooks(missing, idx.codebooks))
            .localCheckpoint()
          Compaction.publishSlice(spark, s"$indexDir/codes", repaired,
            nPartsFor(spark, s"$indexDir/codes", targetPartitionBytes))
        case "retrain" =>
          retrainPq(spark, indexDir, vectors, m, k, targetPartitionBytes)
          val fresh = IndexStore.loadPq(spark, indexDir)
          try pinBaseline(spark, indexDir,
            Similarity.pqDriftReport(fresh, vectors).head()
              .getAs[Double]("mean_sq_err"))
          finally fresh.release()
        case _ => ()
      }

      import spark.implicits._
      Seq((decision, execute, nVectors, nCoded, err,
        base.getOrElse(Double.NaN)))
        .toDF("decision", "executed", "n_vectors", "n_coded",
          "mean_sq_err", "baseline_err")
    } finally idx.release()
  }

  /** Re-seed a [[PqIngest]]-layout store's codebooks from `vectors`
    * (the vector twin's rows — the PQ store holds codes only) and
    * re-encode everything, under the retrain swap discipline: codebooks
    * first, codes second, so a crash between the swaps leaves codes
    * stale against NEW codebooks and re-running completes the job.
    * Triggered by the vector store's [[maintain]] retrain decision in
    * the shared-drop-dir topology. The stream must be stopped. */
  def retrainPq(spark: SparkSession, indexDir: String, vectors: DataFrame,
      m: Int = 8, k: Int = 16,
      targetPartitionBytes: Long = 128L * 1024 * 1024): Unit = {
    require(!Compaction.inProgress(spark, s"$indexDir/codes"),
      s"compaction leftovers exist beside $indexDir/codes — run " +
        "Compaction.recoverTable first")
    val fresh = Similarity.buildPqIndex(vectors, m, k)
    val newCodes = fresh.codes.select("vec_id", "code").localCheckpoint()
    replaceDir(spark, s"$indexDir/codebooks",
      IndexStore.codebooksDf(spark, fresh.codebooks))
    Compaction.publishSlice(spark, s"$indexDir/codes", newCodes,
      nPartsFor(spark, s"$indexDir/codes", targetPartitionBytes))
    fresh.release()
  }

  /** Baseline-normalized read of the per-batch drift LOG
    * ([[VectorIngest.driftLog]], written opt-in at the ingest door for
    * O(batch) per trigger): each committed batch's quantization error
    * against the standing centroids as a ratio of the SEED batch's own
    * fit, with the `retrain_due` flag at `th.maxMsdGrowth` — the trend
    * table an operator pages on BETWEEN [[maintain]] cycles, telling
    * them when to schedule one without paying even the two-corpus-pass
    * measurement. The log and the cycle answer different questions: the
    * log prices each ARRIVING batch against the quantizer (drift of the
    * incoming distribution), the cycle prices the standing corpus
    * (health of the whole index); both read the same growth threshold. */
  def driftTrend(spark: SparkSession, indexDir: String,
      th: Thresholds = Thresholds()): DataFrame = {
    import org.apache.spark.sql.functions._
    val log = VectorIngest.driftLog(spark, indexDir)
    val seed = broadcast(log.orderBy("batch").limit(1)
      .select(col("mean_sq_dist").as("__seed")))
    log.crossJoin(seed)
      .select(col("batch"), col("n_vectors"), col("mean_sq_dist"),
        round(col("mean_sq_dist") /
          greatest(col("__seed"), lit(1e-12)), 4).as("ratio_vs_seed"),
        (col("mean_sq_dist") > col("__seed") * th.maxMsdGrowth)
          .as("retrain_due"))
      .orderBy("batch")
  }

  /** The text-corpus analog of [[maintain]], completing the maintenance
    * policy across all three streamed stores: the dedup index's derived
    * tables (fps, shingles) must cover exactly the standing docs — a
    * doc missing from fps is INVISIBLE to exact-dup admission and a
    * redelivered copy of it would be admitted twice (the d01 invariant
    * broken silently), while the repair op ([[CorpusIngest.reindex]])
    * existed with nothing deciding WHEN to run it. Measure: live doc
    * ids anti-joined against each derived table's ids (two id-column
    * scans, no text touched). Decide: any uncovered doc → `reindex`
    * (executed); clean → `noop`. Per-doc fingerprints are
    * deterministic functions of the text, so there is no drift axis
    * here — coverage is the whole health signal, and reindex is the
    * complete repair. Returns `(decision, executed, n_docs,
    * fps_missing, shingles_missing)`. The stream must be stopped. */
  def maintainCorpus(spark: SparkSession, corpusDir: String,
      execute: Boolean = true,
      targetPartitionBytes: Long = 128L * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.functions.col
    val docs = new CorpusIngest.Merger(spark, corpusDir).corpus()
      .select("doc_id")
    def missing(sub: String): Long = {
      val p = s"$corpusDir/$sub"
      if (!fs(spark, p).exists(new Path(p))) docs.count()
      else docs.join(
        spark.read.option("basePath", p).parquet(p).select("doc_id"),
        Seq("doc_id"), "left_anti").count()
    }
    val nDocs = docs.count()
    val fpsMissing = missing("fps")
    val shMissing = missing("shingles")
    val decision =
      if (fpsMissing > 0L || shMissing > 0L) "reindex" else "noop"
    if (execute && decision == "reindex")
      CorpusIngest.reindex(spark, corpusDir, targetPartitionBytes)
    import spark.implicits._
    Seq((decision, execute, nDocs, fpsMissing, shMissing))
      .toDF("decision", "executed", "n_docs", "fps_missing",
        "shingles_missing")
  }

  /** Byte-sized partition count for a consolidated rewrite — the
    * [[Compaction.compactTable]] sizing rule over the CURRENT table. */
  private def nPartsFor(spark: SparkSession, tableDir: String,
      targetPartitionBytes: Long): Int = {
    val f = fs(spark, tableDir)
    val p = new Path(tableDir)
    val bytes = if (f.exists(p)) f.getContentSummary(p).getLength else 0L
    math.max(1L,
      (bytes + targetPartitionBytes - 1) / targetPartitionBytes).toInt
  }

  /** Replace a small fixed table (centroids, codebooks) atomically:
    * write aside with `_SUCCESS` gate, stage the live dir away, rename
    * in, drop the staged copy — a crash leaves either the old table or
    * the complete new one, with the `.old` copy recoverable by hand in
    * the one-rename window between. */
  private def replaceDir(spark: SparkSession, dir: String,
      df: DataFrame): Unit = {
    val f = fs(spark, dir)
    val live = new Path(dir)
    val tmp = new Path(dir + ".swap_tmp")
    val old = new Path(dir + ".swap_old")
    f.delete(tmp, true); f.delete(old, true)
    df.coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(tmp.toString)
    require(f.exists(new Path(tmp, "_SUCCESS")),
      s"rewrite of $dir left no _SUCCESS marker — aborting before the swap")
    if (f.exists(live))
      require(f.rename(live, old), s"could not stage $dir aside")
    require(f.rename(tmp, live), s"could not publish $dir — the staged " +
      s"previous table is at $old")
    f.delete(old, true)
  }
}
