package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The vector-ingest admission-funnel log shared by [[VectorIngest]] and
  * [[PqIngest]]: one row per committed batch under
  * `<root>/_ingest_log/batch=<N>` (underscore dir — no table scan or
  * compaction sweeps it; overwrite per slice — replay-idempotent).
  * Exact accounting: arrived = banned + redelivered + inserted, with the
  * ban stage FIRST (the [[CorpusIngest]] funnel order, so a
  * tombstoned-and-redelivered id reads as a door refusal in both logs).
  *
  * [[writeStages]] is the single copy of the stage arithmetic for both
  * twins: it counts the batch, the post-ban frame (skipped when no ban
  * list existed — the stage provably changed nothing), and reads
  * `inserted` back from the slice just written instead of re-running
  * the anti-join pipeline a second time (assignment/encoding are 1:1,
  * so the slice count IS the post-exclusion count). */
private[streaming] object IngestLog {

  /** Count the funnel off the already-built stages and write the row.
    * `afterBan` = the batch after the tombstone door-ban anti-join, or
    * None when no ban list existed this batch. */
  def writeStages(spark: SparkSession, rootDir: String, batchId: Long,
      batch: DataFrame, afterBan: Option[DataFrame],
      sliceDir: String): Unit = {
    val arrived = batch.count()
    val postBan = afterBan.map(_.count()).getOrElse(arrived)
    val inserted = spark.read.parquet(sliceDir).count()
    write(spark, rootDir, batchId, arrived,
      redelivered = postBan - inserted,
      banned = arrived - postBan, inserted = inserted)
  }

  def write(spark: SparkSession, rootDir: String, batchId: Long,
      arrived: Long, redelivered: Long, banned: Long,
      inserted: Long): Unit = {
    import spark.implicits._
    Seq((arrived, redelivered, banned, inserted))
      .toDF("arrived", "redelivered", "banned", "inserted")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$rootDir/_ingest_log/batch=$batchId")
  }

  def read(spark: SparkSession, rootDir: String): DataFrame =
    spark.read.option("basePath", s"$rootDir/_ingest_log")
      .parquet(s"$rootDir/_ingest_log").orderBy("batch")
}
