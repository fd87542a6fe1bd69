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

  def readShards(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
