package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.{Chunking, TextAnalysis}

/** The end-to-end corpus curation pipeline — the composed form of the
  * t/d-operator families, in the order a production training-data run
  * executes them:
  *
  *  1. quality gate  — composite heuristic score ≥ `minQuality`;
  *  2. deduplication — [[Dedup.dedupManifest]] keep/drop decision, keepers
  *     survive (exact + near evidence, connected-component resolution);
  *  3. decontamination — documents sharing ≥ `contamThreshold` of their
  *     n-gram shingles with the benchmark corpus are dropped;
  *  4. chunking — survivors split into `chunkSize`-token windows
  *     ([[Chunking.chunkTokens]]);
  *  5. sharded write — [[CorpusStore.writeShards]] layout, one writer task
  *     per (lang, shard), ready for a sequential tokenizer/packer.
  *
  * Every stage is the already-verified operator — this object only wires
  * them, so the funnel numbers it returns are exactly what the per-stage
  * oracles verified. One action per stage boundary (the funnel counts);
  * the data path itself is lazy until the final write.
  */
object CurationPipeline {

  final case class CurationStats(
      docs: Long, afterQuality: Long, afterDedup: Long, afterDecontam: Long,
      chunks: Long) {
    def kept: Double = if (docs == 0) 0.0 else afterDecontam.toDouble / docs
  }

  def run(spark: SparkSession, docs: DataFrame, benchmark: DataFrame,
      outDir: String, minQuality: Double = 0.3, dedupThreshold: Double = 0.2,
      contamThreshold: Double = 0.5, chunkSize: Int = 64,
      overlap: Int = 8, shards: Int = 16): CurationStats = {

    val total = docs.count()

    val quality = docs
      .filter(TextAnalysis.qualityScore(col("text")) >= minQuality)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nQuality = quality.count()

    val keepers = Dedup.dedupManifest(quality, dedupThreshold)
      .filter(col("is_keeper")).select("doc_id")
    val deduped = quality.join(keepers, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDeduped = deduped.count()

    val clean = deduped.join(
      Dedup.contamination(deduped, benchmark, contamThreshold)
        .filter(col("contaminated")).select("doc_id"),
      Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nClean = clean.count()

    val chunks = Chunking.chunkTokens(clean, chunkSize, overlap)
      .join(clean.select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("shard", pmod(xxhash64(col("doc_id")), lit(shards)).cast("int"))
    CorpusStore.writeShards(chunks, outDir)
    val nChunks = CorpusStore.readShards(spark, outDir).count()

    quality.unpersist(); deduped.unpersist(); clean.unpersist()
    CurationStats(total, nQuality, nDeduped, nClean, nChunks)
  }
}
