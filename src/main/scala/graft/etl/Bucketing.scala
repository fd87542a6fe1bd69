package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables: pre-shuffled storage so repeated co-located joins and
  * aggregations on the bucket key skip their Exchange entirely — the
  * standing answer to "this join shuffles 100 TB every day".
  *
  * The reference's analog is its composite secondary indexes (SURVEY §4):
  * both are write-time layouts bought once and cashed per query. Bucketing
  * lives in the session catalog (`saveAsTable`); both join sides must
  * bucket on the join key with the same bucket count.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int = 32, sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .format("parquet")
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
