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
  *  - `tf_present`/`dl_present`/`fwd_present`/`tf_bucketed` — can the
  *    sparse side serve from the store, is its scoring scan
  *    postings-sized, and does PRF's stage 2 have its doc-keyed seek
  *    path (round 14). `tf_bucketed` means FULLY bucketed — a MIXED
  *    store (old un-bucketed slices beside bucketed ones) reads false,
  *    in exact agreement with [[IndexMaintenance.maintainCorpus]]'s
  *    `tf_unbucketed` reindex trigger; the probe is a pushed-IsNull
  *    read that parquet null-count stats answer from footers alone on
  *    a healthy store;
  *  - `*_baseline` — the drift anchor a maintenance cycle would judge
  *    growth against (NaN-free: null = not pinned yet);
  *  - `dials_*` — the persisted recommendation [[QueryServe]] serves at
  *    (null = defaults; `dials_k_rrf` is the sparse half's fusion dial,
  *    round 13);
  *  - `pq_retrain_inflight` — a crashed [[IndexMaintenance.retrainPq]]
  *    swap awaiting the roll-forward re-encode;
  *  - `results_*` — delivery-log footprint: per-batch slices standing,
  *    whether consolidated history exists, retained rows, and the
  *    `req_batch` window a consumer can still resume over (round 13 —
  *    the row count reads footers; the window is one aggregate over a
  *    store [[QueryServe.maintainResults]] bounds by the retention
  *    window, so polling stays cheap at any uptime).
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
      tf_present: Boolean, tf_bucketed: Boolean, tf_slices: Int,
      dl_present: Boolean, fwd_present: Boolean,
      ivf_exists: Boolean, ivf_high_water: Long, ivf_tombstones: Int,
      ivf_baseline: Option[Double],
      dials_nprobe: Option[Int], dials_rerank: Option[Int],
      dials_recall: Option[Double], dials_k_rrf: Option[Int],
      dials_ndcg: Option[Double], dials_ap: Option[Double],
      pq_exists: Boolean, pq_high_water: Long, pq_tombstones: Int,
      pq_baseline: Option[Double], pq_retrain_inflight: Boolean,
      results_exists: Boolean, results_high_water: Long,
      results_slices: Int, results_consolidated: Boolean,
      results_retained_rows: Long,
      results_req_batch_min: Option[Long],
      results_req_batch_max: Option[Long])

  def report(spark: SparkSession, corpusDir: String, ivfDir: String,
      pqDir: String, resultsDir: String): DataFrame = {
    def fs(p: String) = new Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(p: String) = fs(p).exists(new Path(p))
    def slices(dir: String): Seq[String] =
      if (!exists(dir)) Seq.empty
      else fs(dir).listStatus(new Path(dir)).map(_.getPath.getName).toSeq
        .filter(_.startsWith("batch="))
    // footer reads, not a data scan — but an existing-yet-EMPTY dir (a
    // concurrent first ingest between mkdir and the first file landing)
    // would throw unable-to-infer-schema and crash the dashboard poll
    // (r12 ADVICE): gate on a non-empty leaf parquet listing and treat
    // any schema-inference failure as "not bucketed", never an error.
    // The schema MERGES across footers (round 14, r13 ADVICE): a single
    // inferred footer made the answer for a MIXED-layout table depend
    // on file order — true or false by luck of the listing.
    def hasColumn(dir: String, colName: String): Boolean =
      exists(dir) && {
        val it = fs(dir).listFiles(new Path(dir), true)
        var hasParquet = false
        while (!hasParquet && it.hasNext)
          hasParquet = it.next().getPath.getName.endsWith(".parquet")
        hasParquet && (try spark.read.option("basePath", dir)
          .option("mergeSchema", "true").parquet(dir)
          .columns.contains(colName)
        catch { case _: org.apache.spark.sql.AnalysisException => false })
      }
    // FULLY bucketed = the column exists in the merged schema AND no
    // slice predates it (round 14, completing the r13 ADVICE item): a
    // mixed store reads `tb = null` on its old slices, and this probe —
    // the same null test IndexMaintenance.maintainCorpus decides reindex
    // on — keeps the dashboard and the maintenance decision in exact
    // agreement. Dashboard-cheap by parquet stats: the pushed IsNull
    // skips every row group whose footer records null_count = 0, so a
    // healthy bucketed store answers from metadata alone and a mixed
    // one short-circuits on its first old-layout row group.
    def fullyBucketed(dir: String, colName: String): Boolean =
      hasColumn(dir, colName) && {
        try spark.read.option("basePath", dir)
          .option("mergeSchema", "true").parquet(dir)
          .filter(org.apache.spark.sql.functions.col(colName).isNull)
          .isEmpty
        catch { case _: org.apache.spark.sql.AnalysisException => false }
      }

    val dials = IndexMaintenance.readDials(spark, ivfDir)
    val resultSlices = slices(s"$resultsDir/served")
    // the delivery log's live footprint (round 13, r12 verdict #7):
    // row count reads parquet footers; the req_batch window — the
    // retention span a consumer can still resume over — is one
    // min/max aggregate over a store maintainResults keeps BOUNDED by
    // the retention window, so polling it stays cheap at any uptime
    val (retainedRows, reqBatchMin, reqBatchMax) =
      if (resultSlices.isEmpty) (0L, None, None)
      else {
        val served = QueryServe.results(spark, resultsDir)
        val w = served.agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.min("req_batch"),
          org.apache.spark.sql.functions.max("req_batch")).head()
        (w.getLong(0),
          if (w.isNullAt(1)) None else Some(w.getLong(1)),
          if (w.isNullAt(2)) None else Some(w.getLong(2)))
      }
    val st = Status(
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
      tf_bucketed = fullyBucketed(s"$corpusDir/tf", "tb"),
      tf_slices = slices(s"$corpusDir/tf").size,
      dl_present = exists(s"$corpusDir/dl"),
      fwd_present = exists(s"$corpusDir/fwd"),
      ivf_exists = exists(s"$ivfDir/_graft_index.json"),
      ivf_high_water = BatchMarker.maxCommitted(spark, ivfDir),
      ivf_tombstones = graft.etl.Tombstones.slices(spark, ivfDir).size,
      ivf_baseline = IndexMaintenance.baselineMsd(spark, ivfDir),
      dials_nprobe = dials.map(_.nprobe),
      dials_rerank = dials.map(_.rerank),
      dials_recall = dials.map(_.recallAtK),
      dials_k_rrf = dials.flatMap(_.kRrf),
      dials_ndcg = dials.flatMap(_.ndcg),
      dials_ap = dials.flatMap(_.ap),
      pq_exists = exists(s"$pqDir/_graft_index.json"),
      pq_high_water = BatchMarker.maxCommitted(spark, pqDir),
      pq_tombstones = graft.etl.Tombstones.slices(spark, pqDir).size,
      pq_baseline = IndexMaintenance.baselineMsd(spark, pqDir),
      pq_retrain_inflight = IndexMaintenance.retrainInflight(spark, pqDir),
      results_exists = exists(s"$resultsDir/served"),
      results_high_water = BatchMarker.maxCommitted(spark, resultsDir),
      results_slices = resultSlices.count(_ != "batch=-1"),
      results_consolidated = resultSlices.contains("batch=-1"),
      results_retained_rows = retainedRows,
      results_req_batch_min = reqBatchMin,
      results_req_batch_max = reqBatchMax)
    // the 31-field Status is past the 22-field line where the product
    // ENCODER's generated code can resolve the constructor — Janino
    // fails and every report would fall back to interpreted mode with
    // an ERROR in the log. The schema still derives from the case class
    // (pure reflection, no codegen); the one row converts explicitly.
    val schema = org.apache.spark.sql.Encoders.product[Status].schema
    val row = org.apache.spark.sql.Row.fromSeq(st.productIterator.map {
      case Some(x) => x
      case None => null
      case x => x
    }.toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), schema)
  }
}
