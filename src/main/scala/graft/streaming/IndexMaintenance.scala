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

  /** The caller's retrieval SLA for the post-retrain dial
    * recommendation (r10 verdict #4): after [[maintain]] retrains, the
    * PQ twin at `pqDir` retrains too (the shared-topology trigger the
    * scaladoc documents) and ONE [[Similarity.gridSweep]] over the
    * retrained pair is read into the Pareto-minimal (nprobe, rerank)
    * meeting Recall@`k` ≥ `minRecall` for the probe queries
    * `queryFilter` selects — so the report hands back servable dials
    * instead of leaving the re-tune by hand. */
  final case class DialSla(
      pqDir: String,
      queryFilter: org.apache.spark.sql.Column,
      k: Int = 10,
      minRecall: Double = 0.9,
      ladder: Seq[Int] = Seq(10, 50, 200, Int.MaxValue),
      m: Int = 8,
      pqK: Int = 16,
      kRrf: Option[Int] = None,
      qrels: Option[org.apache.spark.sql.DataFrame] = None)

  /** The persisted dial row a serving tier resolves (round 13): the
    * dense half's swept recommendation plus the SPARSE half's one real
    * dial — `kRrf`, the RRF fusion constant, a pass-through from
    * [[DialSla.kRrf]] (the sweep optimizes the dense geometry; fusion
    * damping is an operator policy, so it persists verbatim when set).
    * BM25's k1/b are deliberately EXCLUDED from the dial path: they are
    * scoring SEMANTICS — changing them changes what "relevance" means
    * for the deployment, not how much it costs to attain — so they are
    * fixed by contract at the API defaults (overridable per call, never
    * swept or persisted). The same ruling covers the LM scorer's
    * Dirichlet `mu` and PRF's `fbDocs`/`fbTerms` (round 14, r13 verdict
    * #7): all three redefine what the deployment MEANS by relevance
    * (how much smoothing, how aggressive the expansion), not what a
    * given relevance level costs, so they are contract defaults —
    * per-call overridable, never persisted, never recommended.
    *
    * `ndcg`/`ap` (round 14, r13 verdict #4): when the retrain's
    * [[DialSla]] carried a `qrels` judgment set, the recommendation was
    * EVAL-GATED — [[graft.text.Retrieval.rankEval]] ran over the
    * recommended dials' own serve and its mean nDCG@k / AP@k persist
    * beside the sweep's recall proxy, so the handoff records what the
    * deployment's judgments (not just the geometric recall ladder)
    * said about the dials it is about to serve. None = no judgments
    * supplied (pre-round-14 tables read None too). */
  final case class Dials(nprobe: Int, rerank: Int, recallAtK: Double,
      kRrf: Option[Int] = None, ndcg: Option[Double] = None,
      ap: Option[Double] = None)

  private val BaselineName = "_drift_baseline"
  private val DialsName = "_dials"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Persist a dial recommendation beside the IVF index as a 1-row
    * `_dials` table (through the same staged swap as the baseline, so
    * [[recoverSwap]] repairs a crash here too) — the handoff that closes
    * the maintenance→serving loop (r11 verdict #2): [[maintain]] writes
    * it after an executed retrain with a [[DialSla]], and
    * [[graft.streaming.QueryServe]] reads it at stream start. */
  private[graft] def writeDials(spark: SparkSession, indexDir: String,
      nprobe: Int, rerank: Int, recall: Double,
      kRrf: Option[Int] = None, ndcg: Option[Double] = None,
      ap: Option[Double] = None): Unit = {
    import spark.implicits._
    replaceDir(spark, s"$indexDir/$DialsName",
      Seq((nprobe, rerank, recall, kRrf, ndcg, ap))
        .toDF("nprobe", "rerank", "recall_at_k", "k_rrf", "ndcg_at_k",
          "ap_at_k"))
  }

  /** The persisted dial recommendation, if any. Repairs a crashed swap
    * first, the [[maintain]] entry discipline. Columns a table predates
    * read as None — a pre-round-13 `_dials` has no `k_rrf` (the server
    * serves the fusion default), a pre-round-14 one no eval columns. */
  def readDials(spark: SparkSession,
      indexDir: String): Option[Dials] = {
    val p = s"$indexDir/$DialsName"
    recoverSwap(spark, p)
    if (!fs(spark, p).exists(new Path(p))) None
    else {
      val df = spark.read.parquet(p)
      val r = df.head()
      def opt[T](name: String): Option[T] =
        if (df.columns.contains(name) && !r.isNullAt(r.fieldIndex(name)))
          Some(r.getAs[T](name))
        else None
      Some(Dials(r.getAs[Int]("nprobe"), r.getAs[Int]("rerank"),
        r.getAs[Double]("recall_at_k"), opt[Int]("k_rrf"),
        opt[Double]("ndcg_at_k"), opt[Double]("ap_at_k")))
    }
  }

  private[streaming] def baselineMsd(spark: SparkSession,
      indexDir: String): Option[Double] = {
    val p = s"$indexDir/$BaselineName"
    if (!fs(spark, p).exists(new Path(p))) None
    else Some(spark.read.parquet(p).head().getAs[Double]("metric"))
  }

  private def pinBaseline(spark: SparkSession, indexDir: String,
      metric: Double): Unit = {
    import spark.implicits._
    // the baseline is one row, but a half-written (or half-swapped) table
    // would poison every later decision — ride the same staged swap as
    // the centroid/codebook tables, so [[recoverSwap]] repairs it too
    replaceDir(spark, s"$indexDir/$BaselineName",
      Seq(metric).toDF("metric"))
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
    * cell_skew, empty_frac, n_vectors)`. The baseline pins on the first
    * CLEAN (noop) cycle, never on a cycle that decided a repair (r10
    * advice #1: msd measured over a mis-assigned or drifted table is
    * itself unreliable, and pinning it would durably inflate the growth
    * threshold every later cycle reads); an EXECUTED repair re-measures
    * the repaired store and pins that instead, while a dry-run repair
    * decision pins nothing and leaves the pin to the next clean cycle.
    * `execute = false` is the dry-run (report the decision, touch
    * nothing beyond a clean first-contact pin). The stream must be
    * stopped. */
  def maintain(spark: SparkSession, indexDir: String,
      th: Thresholds = Thresholds(), execute: Boolean = true,
      targetPartitionBytes: Long = 128L * 1024 * 1024,
      recommend: Option[DialSla] = None): DataFrame = {
    require(!Compaction.inProgress(spark, s"$indexDir/assigned"),
      s"compaction leftovers exist beside $indexDir/assigned — run " +
        "Compaction.recoverTable first")
    // a crashed centroid/baseline swap is repaired HERE, not discovered
    // as a missing-dir read failure deep inside loadIvf (r10 advice #2);
    // recoverSwap is idempotent and a no-op on a healthy store
    recoverSwap(spark, s"$indexDir/centroids")
    recoverSwap(spark, s"$indexDir/$BaselineName")
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
      // first-contact pin ONLY on a clean cycle — see the scaladoc
      if (base.isEmpty && decision == "noop")
        pinBaseline(spark, indexDir, msd)

      var rec: Option[(Int, Int, Double)] = None
      if (execute) decision match {
        case "reassign" =>
          val fixed = Similarity.assignToCells(
            idx.assigned.select("vec_id", "embedding"), idx.centroids)
            .select("vec_id", "embedding", "cell")
          Compaction.publishSlice(spark, s"$indexDir/assigned", fixed,
            nPartsFor(spark, s"$indexDir/assigned", targetPartitionBytes))
          // first contact that needed a repair: pin the REPAIRED table's
          // own fit, not the corrupted measurement taken above. The
          // outer idx's persisted PRE-repair assignment would otherwise
          // be served to the same-plan re-read (cache staleness after a
          // publish swap — caught by IndexMaintenanceSpec's poison
          // test), so release it and refresh the path first.
          if (base.isEmpty) {
            idx.release()
            spark.catalog.refreshByPath(s"$indexDir/assigned")
            val repaired = IndexStore.loadIvf(spark, indexDir)
            try pinBaseline(spark, indexDir,
              repaired.driftReport().head().getAs[Double]("mean_sq_dist"))
            finally repaired.release()
          }
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
          // same cache-staleness discipline as the reassign pin: the
          // pre-retrain assignment is still persisted on this plan
          idx.release()
          spark.catalog.refreshByPath(s"$indexDir/assigned")
          val retrained = IndexStore.loadIvf(spark, indexDir)
          try pinBaseline(spark, indexDir,
            retrained.driftReport().head().getAs[Double]("mean_sq_dist"))
          finally retrained.release()
          // post-retrain dial recommendation (r10 verdict #4): the
          // drift that refit the coarse quantizer also invalidated the
          // PQ twin's codebooks (the shared-topology trigger this
          // scaladoc documents), so retrain them from this store's
          // retrained rows, re-pin that store's baseline on its own
          // fresh fit, and read ONE gridSweep over the retrained pair
          // into servable dials — no corpus passes beyond the sweep's
          // own three
          // any standing _dials were tuned for the quantizer this
          // retrain just replaced — stale dials must not outlive it,
          // whether or not a DialSla re-derives fresh ones below
          recoverSwap(spark, s"$indexDir/$DialsName")
          fs(spark, indexDir).delete(new Path(s"$indexDir/$DialsName"), true)
          recommend.foreach { sla =>
            val post = IndexStore.loadIvf(spark, indexDir)
            try {
              val vecs = post.assigned.select("vec_id", "embedding")
              retrainPq(spark, sla.pqDir, vecs, sla.m, sla.pqK,
                targetPartitionBytes)
              spark.catalog.refreshByPath(s"${sla.pqDir}/codes")
              val pqFresh = IndexStore.loadPq(spark, sla.pqDir)
              try pinBaseline(spark, sla.pqDir,
                Similarity.pqDriftReport(pqFresh, vecs).head()
                  .getAs[Double]("mean_sq_err"))
              finally pqFresh.release()
            } finally post.release()
            rec = recommendDials(spark, indexDir, sla.pqDir,
              sla.queryFilter, sla.k, sla.minRecall, sla.ladder)
              .collect().headOption
              .map(r => (r.getAs[Int]("nprobe"), r.getAs[Int]("rerank"),
                r.getAs[Double]("recall_at_k")))
            // persist the recommendation where the serving tier reads
            // it (QueryServe.start) — nothing attained the SLA → no
            // table, and the server falls back to its defaults
            rec.foreach { case (p2, s2, r2) =>
              // eval gate (round 14, r13 verdict #4): with judgments in
              // hand, the handoff grades the recommended dials' OWN
              // serve against them — one rankEval over a probe run at
              // (p2, s2) — and persists mean nDCG/AP beside the sweep's
              // recall proxy: the sweep's geometric recall PICKED the
              // dials, the deployment's judgments GRADE them, and both
              // land in the one _dials row the server resolves.
              val eval: Option[(Option[Double], Option[Double])] =
                sla.qrels.map { qr =>
                  val post2 = IndexStore.loadIvf(spark, indexDir)
                  val pq2 = IndexStore.loadPq(spark, sla.pqDir)
                  try {
                    val run = Similarity.ivfPqTopK(post2, pq2,
                        post2.assigned.select("vec_id", "embedding"),
                        sla.queryFilter, topK = sla.k, nprobe = p2,
                        rerank = s2)
                      .select(col("qid").as("query_id"), col("rank"),
                        col("nid").as("doc_id"))
                    // means over JUDGED queries: rankEval emits
                    // zero-metric rows for judged queries the run
                    // missed entirely (round 14), so the averages
                    // cannot overstate; no-positive-judgment queries
                    // carry NULL metrics and avg() skips them
                    val m = graft.text.Retrieval.rankEval(run, qr, sla.k)
                      .agg(avg("ndcg_at_k"), avg("ap_at_k")).head()
                    (if (m.isNullAt(0)) None else Some(m.getDouble(0)),
                      if (m.isNullAt(1)) None else Some(m.getDouble(1)))
                  } finally { post2.release(); pq2.release() }
                }
              // the sparse half's dial rides along verbatim (round 13):
              // the sweep recommends the dense geometry; kRrf is the
              // SLA author's fusion policy, persisted with it so the
              // server resolves BOTH halves from one _dials row
              writeDials(spark, indexDir, p2, s2, r2, sla.kRrf,
                eval.flatMap(_._1), eval.flatMap(_._2)) }
          }
        case _ => ()
      }

      import spark.implicits._
      val out = Seq((decision, execute, misassigned, msd,
        base.getOrElse(Double.NaN), skew, emptyFrac, nVectors))
        .toDF("decision", "executed", "misassigned", "mean_sq_dist",
          "baseline_msd", "cell_skew", "empty_frac", "n_vectors")
      // rec_* columns appear only when a DialSla was passed: the
      // scan-lean endpoint of the Pareto frontier (smallest nprobe; the
      // rescore-lean end and everything between come from
      // recommendDials), NULL when no executed retrain happened or no
      // swept cell attains the SLA (widen the grid or relax the target)
      recommend match {
        case None => out
        case Some(_) => rec match {
          case Some((p, s2, r2)) => out
            .withColumn("rec_nprobe", lit(p))
            .withColumn("rec_rerank", lit(s2))
            .withColumn("rec_recall", lit(r2))
          case None => out
            .withColumn("rec_nprobe", lit(null).cast("int"))
            .withColumn("rec_rerank", lit(null).cast("int"))
            .withColumn("rec_recall", lit(null).cast("double"))
        }
      }
    } finally idx.release()
  }

  /** The on-demand form of the post-retrain recommendation (r10 verdict
    * #4): ONE [[Similarity.gridSweep]] over the two stores' shared
    * corpus — three corpus passes total, the sweep's own — read by
    * [[Similarity.gridFrontierFor]] into every Pareto-minimal
    * (nprobe, rerank) meeting Recall@`k` ≥ `minRecall`, ordered by
    * nprobe (scan-lean endpoint first). Empty = no swept cell attains
    * the SLA. Materialized eagerly (grid-sized) so the result outlives
    * the released indexes. */
  def recommendDials(spark: SparkSession, ivfDir: String, pqDir: String,
      queryFilter: org.apache.spark.sql.Column, k: Int = 10,
      minRecall: Double = 0.9,
      ladder: Seq[Int] = Seq(10, 50, 200, Int.MaxValue)): DataFrame = {
    val ivf = IndexStore.loadIvf(spark, ivfDir)
    val pq = IndexStore.loadPq(spark, pqDir)
    try {
      val emb = ivf.assigned.select("vec_id", "embedding")
      val maxNprobe = ivf.centroids.count().toInt
      Similarity.gridFrontierFor(
        Similarity.gridSweep(ivf, pq, emb, queryFilter, k, maxNprobe,
          ladder), minRecall)
        .localCheckpoint()
    } finally { ivf.release(); pq.release() }
  }

  /** The PQ twin of [[maintain]] (giving the code store its OWN
    * measured trigger instead of borrowing the IVF report): measure
    * [[graft.similarity.Similarity.pqDriftReport]] over the store's
    * codes and the supplied `vectors` (the vector twin's rows — a PQ
    * store holds no floats) → decide {noop, reencode, retrain} →
    * execute. `reencode` is the reassign analog: vectors the code table
    * LACKS (invisible to every ADC probe — slice corruption) get
    * encoded against the standing codebooks and the table consolidates;
    * `retrain` answers reconstruction-error growth past
    * `th.maxMsdGrowth`× the pinned baseline via [[retrainPq]].
    *
    * A crash between retrainPq's two swaps (codebooks published, codes
    * still the old encoding) leaves codes that are STALE yet fully
    * covering — the coverage rule counts uncoded rows only and cannot
    * see it (r10 advice #3), and the msd-growth rule abstains until a
    * baseline exists. The window is therefore detected STRUCTURALLY:
    * [[retrainPq]] raises a `_retrain_inflight` marker before its first
    * swap and lowers it after its last, and a cycle that finds the
    * marker standing decides `reencode` and (when executing) re-encodes
    * EVERYTHING against the published codebooks — rolling the crashed
    * retrain forward — before lowering the marker.
    *
    * Baseline pinned on the first CLEAN (noop) cycle only; an executed
    * repair re-measures and pins the repaired store (the [[maintain]]
    * discipline — never pin a measurement taken over a store that
    * needed repair). Re-pinned after every retrain. Returns
    * `(decision, executed, n_vectors, n_coded, mean_sq_err,
    * baseline_err)`. The stream must be stopped. */
  def maintainPq(spark: SparkSession, indexDir: String, vectors: DataFrame,
      th: Thresholds = Thresholds(), execute: Boolean = true,
      m: Int = 8, k: Int = 16,
      targetPartitionBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(!Compaction.inProgress(spark, s"$indexDir/codes"),
      s"compaction leftovers exist beside $indexDir/codes — run " +
        "Compaction.recoverTable first")
    recoverSwap(spark, s"$indexDir/codebooks")
    recoverSwap(spark, s"$indexDir/$BaselineName")
    val crashedRetrain = retrainInflight(spark, indexDir)
    val idx = IndexStore.loadPq(spark, indexDir)
    try {
      val rep = Similarity.pqDriftReport(idx, vectors).head()
      val nVectors = rep.getAs[Long]("n_vectors")
      val nCoded = rep.getAs[Long]("n_coded")
      val err = rep.getAs[Double]("mean_sq_err")
      val base = baselineMsd(spark, indexDir)
      // the standing marker overrides the metric rules: codes may be
      // stale against the published codebooks, a state the coverage
      // count cannot see and err over which is unreliable (scaladoc)
      val decision =
        if (crashedRetrain) "reencode"
        else decide(nVectors - nCoded, err, base,
          cellSkew = 1.0, emptyFrac = 0.0, th) match {
          case "reassign" => "reencode" // the PQ repair action's real name
          case d => d
        }
      if (base.isEmpty && decision == "noop")
        pinBaseline(spark, indexDir, err)

      if (execute) decision match {
        case "reencode" =>
          val repaired = (if (crashedRetrain) {
            // roll the crashed retrain forward: every code re-derives
            // from the published codebooks (stale rows are
            // indistinguishable from fresh ones, so all rows re-encode)
            Similarity.encodeWithCodebooks(
              vectors.select("vec_id", "embedding"), idx.codebooks)
          } else {
            val missing = vectors.select("vec_id", "embedding")
              .join(idx.codes.select("vec_id"), Seq("vec_id"), "left_anti")
            idx.codes.select("vec_id", "code").unionByName(
              Similarity.encodeWithCodebooks(missing, idx.codebooks))
          }).localCheckpoint()
          Compaction.publishSlice(spark, s"$indexDir/codes", repaired,
            nPartsFor(spark, s"$indexDir/codes", targetPartitionBytes))
          if (crashedRetrain) lowerRetrainMarker(spark, indexDir)
          // first contact that needed a repair: pin the repaired store's
          // own reconstruction error, not the pre-repair measurement
          // (release + refresh first — the cache-staleness discipline)
          if (base.isEmpty) {
            idx.release()
            spark.catalog.refreshByPath(s"$indexDir/codes")
            val fresh = IndexStore.loadPq(spark, indexDir)
            try pinBaseline(spark, indexDir,
              Similarity.pqDriftReport(fresh, vectors).head()
                .getAs[Double]("mean_sq_err"))
            finally fresh.release()
          }
        case "retrain" =>
          retrainPq(spark, indexDir, vectors, m, k, targetPartitionBytes)
          idx.release()
          spark.catalog.refreshByPath(s"$indexDir/codes")
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
    * first, codes second. The two swaps are bracketed by a
    * `_retrain_inflight` marker (raised before the first, lowered after
    * the last): a crash between them leaves codes stale against the NEW
    * codebooks — fully covering, so no metric rule can see it — and the
    * standing marker is what tells the next [[maintainPq]] cycle to
    * re-encode everything and finish the job (r10 advice #3; re-running
    * retrainPq itself also completes it). Triggered by the vector
    * store's [[maintain]] retrain decision in the shared-drop-dir
    * topology. The stream must be stopped. */
  def retrainPq(spark: SparkSession, indexDir: String, vectors: DataFrame,
      m: Int = 8, k: Int = 16,
      targetPartitionBytes: Long = 128L * 1024 * 1024): Unit = {
    require(!Compaction.inProgress(spark, s"$indexDir/codes"),
      s"compaction leftovers exist beside $indexDir/codes — run " +
        "Compaction.recoverTable first")
    recoverSwap(spark, s"$indexDir/codebooks")
    val fresh = Similarity.buildPqIndex(vectors, m, k)
    val newCodes = fresh.codes.select("vec_id", "code").localCheckpoint()
    raiseRetrainMarker(spark, indexDir)
    replaceDir(spark, s"$indexDir/codebooks",
      IndexStore.codebooksDf(spark, fresh.codebooks))
    Compaction.publishSlice(spark, s"$indexDir/codes", newCodes,
      nPartsFor(spark, s"$indexDir/codes", targetPartitionBytes))
    lowerRetrainMarker(spark, indexDir)
    fresh.release()
  }

  private val RetrainMarker = "_retrain_inflight"

  /** True while a [[retrainPq]] swap pair is (or crashed) in flight. */
  def retrainInflight(spark: SparkSession, indexDir: String): Boolean =
    fs(spark, indexDir).exists(new Path(s"$indexDir/$RetrainMarker"))

  private def raiseRetrainMarker(spark: SparkSession,
      indexDir: String): Unit = {
    val p = new Path(s"$indexDir/$RetrainMarker")
    val out = fs(spark, indexDir).create(p, true)
    out.close()
  }

  private def lowerRetrainMarker(spark: SparkSession,
      indexDir: String): Unit = {
    fs(spark, indexDir).delete(new Path(s"$indexDir/$RetrainMarker"), false)
    ()
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
      th: Thresholds = Thresholds()): DataFrame =
    trendOver(spark, indexDir, VectorIngest.driftLog(spark, indexDir), th)

  /** [[driftTrend]]'s PQ twin over [[PqIngest.driftLog]] (r10 verdict
    * #5): the same anchor discipline and growth flag, with the metric
    * under its honest name — per-batch RECONSTRUCTION error against the
    * standing codebooks, the same number [[maintainPq]] measures
    * corpus-wide and pins as this store's `_drift_baseline`, so the
    * trend and the cycle read one threshold against one anchor. */
  def driftTrendPq(spark: SparkSession, indexDir: String,
      th: Thresholds = Thresholds()): DataFrame =
    trendOver(spark, indexDir,
      PqIngest.driftLog(spark, indexDir)
        .withColumnRenamed("mean_sq_err", "mean_sq_dist"), th)
      .withColumnRenamed("mean_sq_dist", "mean_sq_err")

  /** The shared trend arithmetic, explicit about WHICH number anchors
    * the ratios (r10 advice #5 — normalizing against whatever row
    * happens to be earliest silently rebases onto an already-drifted
    * batch when the log starts late or batch 0's slice is lost): the
    * anchor is the pinned `_drift_baseline` when one exists (a
    * [[maintain]]/[[maintainPq]] clean-cycle or post-retrain fit —
    * exactly the number the cycle's own growth rule reads, so the trend
    * and the cycle agree); otherwise the log's batch-0 row (the seed
    * fit), and a log whose earliest row is NOT batch 0 fails loudly
    * instead of quietly reading every ratio against a drifted batch. */
  private def trendOver(spark: SparkSession, indexDir: String,
      dlog: DataFrame, th: Thresholds): DataFrame = {
    import org.apache.spark.sql.functions._
    val seedVal: Double = baselineMsd(spark, indexDir).getOrElse {
      val first = dlog.orderBy("batch")
        .select(col("batch").cast("long"), col("mean_sq_dist")).head()
      require(first.getLong(0) == 0L,
        s"drift log under $indexDir starts at batch ${first.getLong(0)} " +
          "and no _drift_baseline is pinned — ratios would read against " +
          "an already-drifted batch; run a clean maintain cycle to pin a " +
          "baseline, or enable drift logging from batch 0")
      first.getDouble(1)
    }
    dlog.select(col("batch"), col("n_vectors"), col("mean_sq_dist"),
        round(col("mean_sq_dist") /
          greatest(lit(seedVal), lit(1e-12)), 4).as("ratio_vs_seed"),
        (col("mean_sq_dist") > lit(seedVal) * th.maxMsdGrowth)
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
    * complete repair. The BM25 tables (tf, dl — r10 verdict #1) are
    * covered the same way: a doc missing from them is invisible to
    * every `bm25*FromStore` scorer AND silently deflates df/N in every
    * other doc's score, so their coverage gates the same reindex; a
    * store predating the BM25 index reads as all-docs-missing, making
    * reindex the upgrade path. A zero-token doc legitimately has no tf
    * rows, so tf coverage measures against dl-eligible docs (dl > 0).
    * A tf table predating the term-bucket column (round 12) is flagged
    * `tf_unbucketed` and gates the same reindex — correct-but-
    * index-sized query scans are a measured health signal, not a
    * latent surprise. The doc-keyed forward index (fwd — round 14) is
    * covered like tf: a missing doc would silently shrink a stored-PRF
    * serve's feedback-term fetch, and a pre-fwd store reads as
    * all-missing, making this reindex its upgrade path. Returns
    * `(decision, executed, n_docs, fps_missing, shingles_missing,
    * tf_missing, dl_missing, fwd_missing, tf_unbucketed)`. The stream
    * must be stopped. */
  def maintainCorpus(spark: SparkSession, corpusDir: String,
      execute: Boolean = true,
      targetPartitionBytes: Long = 128L * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.functions.col
    val docs = new CorpusIngest.Merger(spark, corpusDir).corpus()
      .select("doc_id")
    def missingFrom(expected: DataFrame, sub: String): Long = {
      val p = s"$corpusDir/$sub"
      if (!fs(spark, p).exists(new Path(p))) expected.count()
      else expected.join(
        spark.read.option("basePath", p).parquet(p).select("doc_id"),
        Seq("doc_id"), "left_anti").count()
    }
    val nDocs = docs.count()
    val fpsMissing = missingFrom(docs, "fps")
    val shMissing = missingFrom(docs, "shingles")
    // a doc with zero tokens has no tf rows by construction — only docs
    // the dl table prices as non-empty are expected in tf
    val tfExpected = {
      val dlDir = s"$corpusDir/dl"
      if (!fs(spark, dlDir).exists(new Path(dlDir))) docs
      else docs.join(
        spark.read.option("basePath", dlDir).parquet(dlDir)
          .filter(col("dl") > 0L).select("doc_id"),
        Seq("doc_id"), "left_semi")
    }
    val tfMissing = missingFrom(tfExpected, "tf")
    val dlMissing = missingFrom(docs, "dl")
    // the doc-keyed forward index (round 14) covers the same docs tf
    // does (zero-token docs legitimately have no rows in either); a doc
    // missing from it silently degrades every stored-PRF serve's stage
    // 2 back to a partial fetch, and a store predating fwd/ reads as
    // all-missing — making the same reindex the upgrade path, exactly
    // as tf/dl entered in r10
    val fwdMissing = missingFrom(tfExpected, "fwd")
    // a tf table written before the term-bucket column existed (round
    // 12) serves CORRECT but unprunable scans — every query pays an
    // index-sized read a reindex would make postings-sized. That is a
    // health signal, not a latent surprise: the cycle measures it and
    // the same reindex that repairs coverage rewrites tf bucketed.
    // MIXED layouts count too (round 13, the r12 ADVICE hole): a
    // pre-bucket store that received bucketed door commits holds both —
    // its old slices read `tb = null` under the merged schema, so the
    // probe is a null count over the merged read (one tf scan, the same
    // cost class as the coverage anti-joins above), not a whole-table
    // schema guess that a single new slice could flip to "bucketed".
    val tfDir = s"$corpusDir/tf"
    val tfUnbucketed = fs(spark, tfDir).exists(new Path(tfDir)) && {
      val tf = spark.read.option("basePath", tfDir)
        .option("mergeSchema", "true").parquet(tfDir)
      !tf.columns.contains("tb") ||
        tf.filter(col("tb").isNull).count() > 0L
    }
    val decision =
      if (fpsMissing > 0L || shMissing > 0L ||
        tfMissing > 0L || dlMissing > 0L || fwdMissing > 0L ||
        tfUnbucketed) "reindex"
      else "noop"
    if (execute && decision == "reindex")
      CorpusIngest.reindex(spark, corpusDir, targetPartitionBytes)
    import spark.implicits._
    Seq((decision, execute, nDocs, fpsMissing, shMissing, tfMissing,
      dlMissing, fwdMissing, tfUnbucketed))
      .toDF("decision", "executed", "n_docs", "fps_missing",
        "shingles_missing", "tf_missing", "dl_missing", "fwd_missing",
        "tf_unbucketed")
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

  /** Replace a small fixed table (centroids, codebooks, the drift
    * baseline) atomically: write aside with `_SUCCESS` gate, stage the
    * live dir away, rename in, drop the staged copy — a crash leaves
    * either the old table or the complete new one plus `.swap_*`
    * markers, and [[recoverSwap]] maps every reachable crash state back
    * to a healthy table (roll forward when the new table is complete,
    * roll back otherwise). [[maintain]]/[[maintainPq]]/[[retrainPq]]
    * run it on entry, so the one-rename no-live-dir window no longer
    * needs by-hand recovery (r10 advice #2). */
  private def replaceDir(spark: SparkSession, dir: String,
      df: DataFrame): Unit = {
    val f = fs(spark, dir)
    val live = new Path(dir)
    val tmp = new Path(dir + ".swap_tmp")
    val old = new Path(dir + ".swap_old")
    // a crashed PREVIOUS swap is repaired before its markers are
    // destroyed — deleting blindly here would discard the only rollback
    // copy of a table the last crash left without a live dir
    recoverSwap(spark, dir)
    f.delete(tmp, true); f.delete(old, true)
    df.coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(tmp.toString)
    require(f.exists(new Path(tmp, "_SUCCESS")),
      s"rewrite of $dir left no _SUCCESS marker — aborting before the swap")
    if (f.exists(live))
      require(f.rename(live, old), s"could not stage $dir aside")
    require(f.rename(tmp, live), s"could not publish $dir — run " +
      "IndexMaintenance.recoverSwap to repair")
    f.delete(old, true)
  }

  /** Repair a crashed [[replaceDir]] swap of `dir` — idempotent, a
    * no-op on a healthy table, and total over the swap's crash states
    * (the [[Compaction.recoverTable]] discipline, r10 advice #2):
    *
    *  - live dir present → any `.swap_*` leftovers are post-publish
    *    debris; drop them.
    *  - live missing, staged write complete (`.swap_tmp/_SUCCESS`) →
    *    the crash hit between the two renames; roll FORWARD (publish
    *    the complete new table).
    *  - live missing, tmp incomplete, `.swap_old` present → roll BACK
    *    (restore the staged previous table).
    *  - neither → a crash before anything was staged; drop the partial
    *    tmp. */
  def recoverSwap(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val live = new Path(dir)
    val tmp = new Path(dir + ".swap_tmp")
    val old = new Path(dir + ".swap_old")
    if (f.exists(live)) {
      f.delete(tmp, true); f.delete(old, true)
    } else if (f.exists(new Path(tmp, "_SUCCESS"))) {
      require(f.rename(tmp, live),
        s"could not roll forward crashed swap of $dir")
      f.delete(old, true)
    } else if (f.exists(old)) {
      require(f.rename(old, live),
        s"could not roll back crashed swap of $dir")
      f.delete(tmp, true)
    } else {
      f.delete(tmp, true)
    }
    ()
  }
}
