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
  *  1. batch-internal exact dedup (fingerprint keepers — micro-batches
  *     are small, so the expensive near-dup machinery is reserved for the
  *     corpus check);
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
      threshold: Double = 0.2) extends Serializable {

    private def part(sub: String) = s"$corpusDir/$sub"

    def corpus(): DataFrame =
      spark.read.option("basePath", part("docs")).parquet(part("docs"))
        .drop("batch")

    private def readExcluding(sub: String, batchId: Long): Option[DataFrame] =
      try {
        val c = spark.read.option("basePath", part(sub)).parquet(part(sub))
          .filter(col("batch") =!= batchId).drop("batch")
        c.head(1) // force: empty/missing dirs must fall to the None arm
        Some(c)
      } catch {
        // ONLY "no corpus yet" maps to the seed arm — a corrupt or
        // unreadable index must fail the batch loudly, not silently admit
        // everything undeduplicated
        case _: org.apache.spark.sql.AnalysisException => None
      }

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = {
      // 1. within-batch exact keepers (one per normalized fingerprint)
      val keepers = Dedup.exactGroups(batch)
        .select(col("keeper_doc_id").as("doc_id"))
      val distinctBatch = batch.join(keepers, "doc_id")
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
    }
  }

  /** Start the ingest over a drop-directory of parquet document files. */
  def start(spark: SparkSession, dropDir: String, corpusDir: String,
      checkpointDir: String, threshold: Double = 0.2): StreamingQuery = {
    val merger = new Merger(spark, corpusDir, threshold)
    spark.readStream
      .schema(graft.etl.Schemas.documents)
      .parquet(dropDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) => merger.mergeBatch(b, id))
      .start()
  }
}
