package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streamed hybrid SERVING (round 11) — the read-side twin of the
  * streamed ingests: retrieval requests arrive as parquet files in a
  * drop directory (`(query_id, query_text, embedding)` —
  * [[graft.etl.Schemas.queryRequests]]), each micro-batch is answered
  * off the PERSISTED stores alone
  * ([[graft.text.Retrieval.hybridTopKFromStoresExternal]]: saved IVF-PQ
  * pair + stored BM25 frames + RRF), and the fused shortlists append to
  * a results store as replay-idempotent per-batch slices.
  *
  * Why this is the right shape at 100 TB: the corpus-sized costs live
  * entirely in the stores the INGEST side maintains — a serving batch
  * pays the PQ probe over stored codes, term-keyed integer aggregates
  * over stored tf/dl, and a shortlist-sized fusion, all request-bounded
  * work that scales with the query stream, not the corpus. Store loads
  * amortize across batches for free: the loaded assignment persists in
  * the plan-keyed cache registry, and an unchanged store re-resolves to
  * the same persisted frame on the next trigger.
  *
  * Durability follows the ingest discipline exactly:
  *  - each batch's results land as `served/batch=<id>` via an
  *    idempotent per-slice overwrite — a foreachBatch crash-replay
  *    rewrites its own slice and converges;
  *  - the [[BatchMarker]] high-water guard refuses a fresh-checkpoint
  *    stream pointed at an existing results store;
  *  - results carry the request batch id, so downstream consumers can
  *    resume from any watermark.
  *
  * Serving is NOT registered as idempotent against corpus change — two
  * serves of one query across a store mutation legitimately differ
  * (that is what serving means); what is pinned is replay idempotence
  * (same batch, same store state → byte-identical slice) and
  * stream ≡ batch (the union of streamed slices equals one direct serve
  * over the same requests — per-query decomposability, the
  * chunkedByQuery property, is exactly what a micro-batch split is).
  * QueryServeSpec pins both plus the high-water refusal. */
object QueryServe {

  /** The per-batch server; shared by [[start]] and direct calls in
    * specs/replays (the Merger discipline). */
  final class Server(spark: SparkSession, corpusDir: String,
      ivfDir: String, pqDir: String, resultsDir: String,
      k: Int = 10, nprobe: Int = 4, rerank: Int = 50, kRrf: Int = 60) {

    def serveBatch(batch: DataFrame, batchId: Long): Unit = {
      val highWater = BatchMarker.guard(spark, resultsDir, batchId)
      if (batch.isEmpty) { BatchMarker.publish(spark, resultsDir, batchId,
        highWater); return }
      val out = graft.text.Retrieval.hybridTopKFromStoresExternal(spark,
        corpusDir, ivfDir, pqDir, batch, k = k, nprobe = nprobe,
        rerank = rerank, kRrf = kRrf)
      out.write.mode(SaveMode.Overwrite)
        .parquet(s"$resultsDir/served/batch=$batchId")
      BatchMarker.publish(spark, resultsDir, batchId, highWater)
    }
  }

  /** Start serving a drop-directory of parquet request files. */
  def start(spark: SparkSession, dropDir: String, corpusDir: String,
      ivfDir: String, pqDir: String, resultsDir: String,
      checkpointDir: String, k: Int = 10, nprobe: Int = 4,
      rerank: Int = 50, kRrf: Int = 60): StreamingQuery = {
    val server = new Server(spark, corpusDir, ivfDir, pqDir, resultsDir,
      k, nprobe, rerank, kRrf)
    spark.readStream
      .schema(graft.etl.Schemas.queryRequests)
      .parquet(dropDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) => server.serveBatch(b, id))
      .start()
  }

  /** All served results, batch column included (the consumer's resume
    * watermark). Empty frame for a store no batch has reached. */
  def results(spark: SparkSession, resultsDir: String): DataFrame = {
    val p = s"$resultsDir/served"
    val f = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.exists(new org.apache.hadoop.fs.Path(p)),
      s"$p does not exist — no serving batch has committed here yet")
    spark.read.option("basePath", p).parquet(p)
  }

  /** Fold the per-trigger result slices into one byte-sized consolidated
    * slice (the [[Compaction.compactTable]] discipline — a long-lived
    * serving stream otherwise accumulates one small-file slice per
    * trigger). The per-row content is unchanged; compacted history reads
    * as `batch = -1`, so consumers resuming by batch watermark should
    * consume (or [[prune]]) before compacting. The replay guard is
    * untouched — the high water lives in the `_max_batch` marker, not
    * the column. The stream must be STOPPED. */
  def compact(spark: SparkSession, resultsDir: String,
      targetPartitionBytes: Long = 128L * 1024 * 1024): Unit =
    Compaction.compactTable(spark, s"$resultsDir/served",
      targetPartitionBytes)

  /** Retention: drop the served slices of batches BELOW `keepFrom` —
    * results are a delivery log, not a system of record, and consumed
    * history is dead weight a serving tier prunes on a schedule. Only
    * real per-batch slices (`batch >= 0`) are pruned; a consolidated
    * `batch=-1` slice holds mixed history and never matches. The
    * high-water marker survives, so a crash-replay of a pruned batch is
    * still REFUSED rather than resurrected. The stream must be
    * STOPPED. */
  def prune(spark: SparkSession, resultsDir: String, keepFrom: Long): Unit = {
    require(keepFrom >= 0, s"keepFrom must be >= 0 (got $keepFrom)")
    val p = new org.apache.hadoop.fs.Path(s"$resultsDir/served")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return
    f.listStatus(p).map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .filter { d =>
        val id = d.getName.stripPrefix("batch=").toLong
        id >= 0 && id < keepFrom
      }
      .foreach(d => f.delete(d, true))
  }
}
