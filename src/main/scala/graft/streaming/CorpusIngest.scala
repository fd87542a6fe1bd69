package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.Dedup

/** Streaming corpus growth with deduplication at the door — the
  * continuous form of [[Dedup.incrementalDedup]]: every micro-batch of
  * documents is classified against the standing corpus and only genuinely
  * NEW documents are admitted, so the corpus stays deduplicated by
  * construction instead of requiring periodic re-clustering.
  *
  * The corpus ships with its own MATERIALIZED dedup index — fingerprints
  * and size-annotated shingle postings, appended per admitted batch — so
  * classification scans the compact 8-byte-keyed index instead of
  * re-tokenizing and re-shingling the entire text corpus on every
  * micro-batch (the cost model that survives a 100 TB corpus with a
  * 0.1% daily increment).
  *
  * Per micro-batch:
  *  1. batch-internal dedup: exact fingerprint keepers, then greedy
  *     near-dedup (the smaller doc_id of every near-pair survives) — the
  *     same page crawled twice in one batch cannot slip in as a permanent
  *     near-dup pair;
  *  2. [[Dedup.incrementalDedupAgainstIndex]] over the index, EXCLUDING
  *     the batch's own partitions — a replayed batch (foreachBatch
  *     redelivers after a crash) would otherwise classify its prior
  *     admissions as duplicates of themselves and silently delete them;
  *  3. docs with verdict `new` (plus their index rows) land under
  *     per-batch directories, OVERWRITTEN on write, so replays converge
  *     instead of double-appending.
  */
object CorpusIngest {

  final class Merger(spark: SparkSession, corpusDir: String,
      threshold: Double = 0.2,
      qualityMin: Option[Double] = None) extends Serializable {

    private def part(sub: String) = s"$corpusDir/$sub"

    def corpus(): DataFrame =
      spark.read.option("basePath", part("docs")).parquet(part("docs"))
        .drop("batch")

    // the reader sees the index as of the batch's admission decision:
    // every partition EXCEPT the batch's own. A missing dir means "no
    // corpus yet" (first batch seeds); any OTHER failure — corrupt files,
    // an index rewritten without batch= partitions — must fail the batch
    // loudly, not silently admit everything undeduplicated.
    private def fs(path: String) = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def readExcluding(sub: String, batchId: Long): Option[DataFrame] =
      if (!fs(part(sub)).exists(new org.apache.hadoop.fs.Path(part(sub))))
        None
      else Some(
        spark.read.option("basePath", part(sub)).parquet(part(sub))
          .filter(col("batch") =!= batchId).drop("batch"))

    // highest batch id ever committed — a stream restarted against a FRESH
    // checkpoint re-numbers batches from 0, and without this guard its
    // batch 0 would Overwrite (destroy) the original seed partition
    private def maxBatchMarker =
      new org.apache.hadoop.fs.Path(s"$corpusDir/_max_batch")
    private def maxCommitted: Long = {
      val f = fs(corpusDir)
      if (!f.exists(maxBatchMarker)) {
        // a crash between the marker delete and the rename below leaves
        // only the tmp marker — recover the guard from it rather than
        // silently reporting "no corpus"
        val root = new org.apache.hadoop.fs.Path(corpusDir)
        if (!f.exists(root)) -1L
        else f.listStatus(root).map(_.getPath.getName)
          .filter(_.startsWith("_max_batch.tmp"))
          .map(_.stripPrefix("_max_batch.tmp").toLong)
          .foldLeft(-1L)(math.max)
      } else {
        val in = f.open(maxBatchMarker)
        val raw = try scala.io.Source.fromInputStream(in).mkString.trim
          finally in.close()
        // an unparsable marker must be a LOUD, self-describing failure —
        // "".toLong would brick every subsequent batch with a bare
        // NumberFormatException and no pointer to the file to repair
        require(raw.nonEmpty && raw.forall(_.isDigit),
          s"corrupt high-water marker $maxBatchMarker (content: '$raw') — " +
            "restore it to the highest committed batch id or delete it " +
            "if the corpus dirs are known-consistent")
        raw.toLong
      }
    }

    def mergeBatch(rawBatch: DataFrame, batchId: Long): Unit = {
      // a compaction in flight (or crashed) owns the component tables:
      // the swap below the reader's feet would race the per-batch writes
      CorpusIngest.Tables.foreach { sub =>
        require(!Compaction.inProgress(spark, part(sub)),
          s"compaction leftovers exist beside ${part(sub)} — the stream " +
            "must stay stopped while the corpus is compacted; run " +
            "Compaction.recoverTable first if the compaction crashed")
      }
      // curation-at-ingest: the quality gate runs BEFORE any dedup work,
      // so junk neither costs shingle joins nor poisons the standing
      // index (a junk doc admitted once would shadow every future clean
      // near-dup of it). Stateless per row — identical semantics batch
      // or streaming, asserted in CorpusIngestSpec.
      val batch = qualityMin match {
        case Some(q) => rawBatch.filter(
          graft.text.TextAnalysis.qualityScore(col("text")) >= q)
        case None => rawBatch
      }
      // read ONCE up front: the marker rewrite at the end truncates the
      // file first, so a later re-read mid-method would see it empty
      val highWater = maxCommitted
      // Structured Streaming only ever replays the LATEST uncommitted
      // batch; a batchId BELOW the recorded high-water mark means a new
      // stream (fresh checkpoint) is pointed at an existing corpus
      require(batchId >= highWater,
        s"batch $batchId below the corpus high-water mark $highWater — " +
          s"a fresh-checkpoint stream must not overwrite $corpusDir; use a " +
          "new corpus dir or restore the original checkpoint")
      // 1. within-batch dedup: exact keepers (one per fingerprint), then
      // greedy near-dedup — of every near-pair, the smaller doc_id
      // survives, so a page crawled twice in one batch can't enter the
      // corpus as a permanent near-dup pair
      val keepers = Dedup.exactGroups(batch)
        .select(col("keeper_doc_id").as("doc_id"))
      val exactDistinct = graft.Caches.persistReplacing("ingestBatch",
        batch.join(keepers, "doc_id"))
      val nearLosers = Dedup.ngramJaccardPairs(exactDistinct, threshold)
        .select(col("d2").as("doc_id")).distinct()
      val distinctBatch = exactDistinct.join(nearLosers, Seq("doc_id"), "left_anti")
      // 2. classify against the standing INDEX; 3. admit the new
      val admitted =
        (readExcluding("fps", batchId), readExcluding("shingles", batchId)) match {
          case (Some(fps), Some(postings)) =>
            distinctBatch.join(
              Dedup.incrementalDedupAgainstIndex(fps,
                postings.select(col("doc_id").as("cdoc"), col("g"), col("sz").as("csz")),
                distinctBatch, threshold)
                .filter(col("status") === "new").select("doc_id"),
              "doc_id")
          case _ => distinctBatch // first batch seeds the corpus
        }
      // safe to write lazily: every read excludes batch=`batchId`, so the
      // write targets and the files the plan reads are disjoint
      admitted.write.mode(SaveMode.Overwrite)
        .parquet(s"${part("docs")}/batch=$batchId")
      // 4. extend the index with exactly what was admitted — read back the
      // committed batch so the index derives from the same rows readers see
      val committed = spark.read.parquet(s"${part("docs")}/batch=$batchId")
      val (fps, postings) = Dedup.indexRows(committed)
      fps.write.mode(SaveMode.Overwrite)
        .parquet(s"${part("fps")}/batch=$batchId")
      postings.write.mode(SaveMode.Overwrite)
        .parquet(s"${part("shingles")}/batch=$batchId")
      // publish the new high-water mark via write-then-atomic-rename (the
      // VersionedFactSink protocol): create(marker, overwrite=true)
      // truncates FIRST, so a crash between create and write would leave an
      // empty marker that permanently bricks the ingest
      val f = fs(corpusDir)
      val tmpMarker =
        new org.apache.hadoop.fs.Path(s"$corpusDir/_max_batch.tmp$batchId")
      val out = f.create(tmpMarker, true)
      try out.write(math.max(batchId, highWater).toString.getBytes("UTF-8"))
      finally out.close()
      f.delete(maxBatchMarker, false)
      require(f.rename(tmpMarker, maxBatchMarker),
        s"could not publish high-water marker $maxBatchMarker")
    }
  }

  /** The corpus's per-batch component tables, in compaction order. */
  private[streaming] val Tables = Seq("docs", "fps", "shingles")

  /** Fold every per-batch slice of the corpus (docs, fingerprints,
    * shingle postings) into one consolidated slice per table —
    * [[Compaction.compactTable]] applied per component; the stream must
    * be STOPPED. Each table swaps independently and atomically, and a
    * crash between tables leaves every table internally complete
    * (compaction moves rows, it never changes them), so dedup decisions
    * and `corpus()` content are unchanged whichever subset compacted. */
  def compact(spark: SparkSession, corpusDir: String,
      targetPartitionBytes: Long = 128L * 1024 * 1024): Unit =
    Tables.foreach(sub => Compaction.compactTable(spark,
      s"$corpusDir/$sub", targetPartitionBytes))

  /** Start the ingest over a drop-directory of parquet document files. */
  def start(spark: SparkSession, dropDir: String, corpusDir: String,
      checkpointDir: String, threshold: Double = 0.2,
      qualityMin: Option[Double] = None): StreamingQuery = {
    val merger = new Merger(spark, corpusDir, threshold, qualityMin)
    spark.readStream
      .schema(graft.etl.Schemas.documents)
      .parquet(dropDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) => merger.mergeBatch(b, id))
      .start()
  }
}
