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
  * Per micro-batch:
  *  1. batch-internal exact dedup (fingerprint keepers — micro-batches
  *     are small, so the expensive near-dup machinery is reserved for the
  *     corpus check);
  *  2. [[Dedup.incrementalDedup]] against the standing corpus — cost
  *     scales with the batch, never corpus pair counts;
  *  3. docs with verdict `new` append under a per-batch directory,
  *     OVERWRITTEN on write — a replayed batch (foreachBatch redelivers
  *     after a crash) lands in the same directory instead of
  *     double-appending, the same idempotence discipline as
  *     [[StreamingIngest.FactMerger]].
  */
object CorpusIngest {

  final class Merger(spark: SparkSession, corpusDir: String,
      threshold: Double = 0.2) extends Serializable {

    def corpus(): DataFrame =
      spark.read.option("basePath", corpusDir).parquet(corpusDir)
        .drop("batch")

    // the corpus as batch `batchId` must see it: WITHOUT its own prior
    // output — a replayed batch (foreachBatch redelivers after a crash)
    // would otherwise classify its own admissions as duplicates of
    // themselves and overwrite the partition with nothing, silently
    // DELETING the documents it admitted the first time
    private def corpusExcluding(batchId: Long): Option[DataFrame] =
      try {
        val c = spark.read.option("basePath", corpusDir).parquet(corpusDir)
          .filter(col("batch") =!= batchId).drop("batch")
        c.head(1) // force: empty/missing dirs must fall to the None arm
        Some(c)
      } catch { case _: Exception => None }

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = {
      // 1. within-batch exact keepers (one per normalized fingerprint)
      val keepers = Dedup.exactGroups(batch)
        .select(col("keeper_doc_id").as("doc_id"))
      val distinctBatch = batch.join(keepers, "doc_id")
      // 2. classify against the standing corpus; 3. admit the new
      val admitted = corpusExcluding(batchId) match {
        case Some(c) =>
          distinctBatch.join(
            Dedup.incrementalDedup(c, distinctBatch, threshold)
              .filter(col("status") === "new").select("doc_id"),
            "doc_id")
        case None => distinctBatch // first batch seeds the corpus
      }
      // safe to write lazily: the corpus read excludes batch=`batchId`,
      // so the write target and the files the plan reads are disjoint
      admitted.write.mode(SaveMode.Overwrite)
        .parquet(s"$corpusDir/batch=$batchId")
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
