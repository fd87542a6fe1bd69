package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus sink for training shards: the physical layout a downstream
  * tokenizer/packer consumes sequentially.
  *
  * Layout contract: `lang=<l>/shard=<s>/` directories (partition pruning
  * lets a trainer read one shard without touching the rest), files inside a
  * shard internally sorted by `doc_id`, capped at `maxRecordsPerFile` rows.
  *
  * The `repartition(partition keys)` BEFORE the write matters at scale:
  * without it every upstream task opens a writer into every (lang, shard)
  * directory it happens to touch — the small-file explosion (tasks ×
  * partitions files). With it, exactly one task owns each (lang, shard)
  * and emits one sorted run, split only by the records-per-file cap. */
object CorpusStore {

  def writeShards(shards: DataFrame, dir: String,
      maxRecordsPerFile: Int = 1000000): Unit =
    shards
      .repartition(col("lang"), col("shard"))
      .sortWithinPartitions("lang", "shard", "doc_id")
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("lang", "shard")
      .parquet(dir)

  /** Snapshot diff — the corpus-versioning primitive (what changed
    * between two crawls/exports): per document id, `added` (only in the
    * new snapshot), `removed` (only in the old), `modified` (present in
    * both, normalized-content fingerprints differ), or `unchanged`.
    * One full-outer equi-join on the id over two shuffle-free fingerprint
    * projections — content comparison rides 16-byte fingerprints, never
    * the text, so the join carries fixed-width rows at any corpus size
    * and the diff of two 100 TB snapshots moves only ids + hashes. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.text.TextAnalysis
    def fp(df: DataFrame, as: String) = df.select(
      col(idCol), TextAnalysis.fingerprint(col(textCol)).as(as))
    fp(oldSnap, "fp_old").join(fp(newSnap, "fp_new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "modified")
          .otherwise("unchanged").as("status"))
  }

  def readShards(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
