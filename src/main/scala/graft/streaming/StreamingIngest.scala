package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.etl.{Schemas, StarStore, Transform}

/** Incremental/streaming ingestion — the generalization of the reference's
  * hand-rolled 50 K-row micro-batch loop with `ON DUPLICATE KEY UPDATE`
  * additive merge (`loadAnalyticsDB.PractII.VarmaA.R:305-428`, SURVEY
  * §2.10): a Structured Streaming file source over a transactions
  * drop-directory, the SAME batch Transform (code shared, not duplicated),
  * and a `foreachBatch` merge into the partitioned star schema.
  *
  * Merge contract (no transactional table format in this environment):
  * valid enriched rows append to a year-partitioned staging store; the fact
  * is then recomputed from staging FOR THE AFFECTED YEARS ONLY and those
  * year partitions are dynamically overwritten. This keeps the declared
  * exact `unique_user_count` semantic (SURVEY §5.2) — an additive fold of
  * per-batch distinct counts would double-count across batches, the
  * reference's acknowledged approximation — and makes late data for any
  * past date fold into its grain row, i.e. unbounded lateness tolerance
  * like the reference. Cost scales with the affected years' raw volume,
  * not total history. A transactional MERGE sink can replace this by
  * swapping [[FactMerger.mergeBatch]].
  */
object StreamingIngest {

  /** Per-batch merge logic, usable from foreachBatch or called directly.
    * The fact store is reached only through the [[graft.etl.FactSink]]
    * contract; `sink` defaults to the year-partitioned parquet
    * implementation and is the seam where a transactional `MERGE` slots
    * in. */
  final class FactMerger(
      spark: SparkSession,
      storeDir: String,
      userCountryMap: DataFrame,
      assetSportMap: DataFrame,
      sink: graft.etl.FactSink = null) extends Serializable {

    private val factSink: graft.etl.FactSink =
      Option(sink).getOrElse(new graft.etl.ParquetFactSink(storeDir))

    private val stagingDir = s"$storeDir/staging_valid_txns"

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = {
      val enriched = Transform.enrich(batch, userCountryMap, assetSportMap)
      val valid = Transform.qualityGate(enriched)
        .withColumn("year", year(col("event_date")))
      // one directory per micro-batch, overwritten on write: a replayed
      // batch (foreachBatch redelivers after a crash) lands in the same
      // directory instead of double-appending — idempotent merge
      val batchDir = s"$stagingDir/batch=$batchId"
      valid.write.mode(SaveMode.Overwrite).partitionBy("year").parquet(batchDir)

      // affected years: read the year= partition directories just written —
      // re-deriving them from `valid` would run the whole enrichment twice
      val fs = new org.apache.hadoop.fs.Path(batchDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val years = fs.listStatus(new org.apache.hadoop.fs.Path(batchDir))
        .map(_.getPath.getName)
        .filter(_.startsWith("year="))
        .map(_.stripPrefix("year=").toInt)
      if (years.nonEmpty) {
        val raw = spark.read
          .option("basePath", stagingDir).parquet(stagingDir)
          .filter(col("year").isin(years.map(Integer.valueOf): _*))
          .drop("year", "batch")
        factSink.mergePartitions(Transform.rollup(raw))
      }
    }
  }

  /** Start the ingest stream over a drop-directory of parquet transaction
    * files. Dimension maps are resolved once at start (the reference loads
    * its lookup maps once per run, R:243-268). */
  def start(spark: SparkSession, dropDir: String, storeDir: String,
      assets: DataFrame, subscribers: DataFrame, postal2city: DataFrame,
      cities: DataFrame, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val merger = new FactMerger(spark, storeDir,
      Transform.userCountry(subscribers, postal2city, cities),
      Transform.assetSport(assets))
    val reader = spark.readStream
      .schema(Schemas.streamingTxns)
    // bounds each micro-batch (AvailableNow honors source read limits) —
    // a closed input then drains as several batches, exercising the merge
    // path the way a live stream would instead of as one giant batch
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(dropDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, id: Long) => merger.mergeBatch(batch, id))
      .start()
  }

  /** Streaming exact dedup on `keys` with BOUNDED state: duplicates
    * arriving within `delay` of the watermark are dropped, and key state
    * older than the watermark is evicted — the ingest-side guard a training
    * pipeline puts in front of the corpus store (re-delivered files,
    * at-least-once upstream queues). Unlike plain `dropDuplicates` on a
    * stream (state grows forever), the watermark variant holds each key
    * only for the re-delivery horizon. Rows are emitted on first arrival —
    * no watermark-wait latency. */
  def dedupedStream(events: DataFrame, delay: String, keys: String*): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Q16's streaming form: tumbling daily event-time window over the events
    * stream. On a closed input this must produce exactly the batch rows
    * (asserted in StreamingSpec). `watermark` bounds state for continuous
    * runs; the default mirrors the reference's unbounded lateness. */
  def dailyEventRollup(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val withWm = watermark.fold(events)(w => events.withWatermark("ts", w))
    withWm
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("events"),
        // exact countDistinct is not supported inside a streaming agg;
        // HLL++ is the streaming-native answer (SURVEY §2.11 upgrade path)
        approx_count_distinct(col("user_id")).as("approx_uniq_users"),
        // decimal sum: result independent of micro-batch arrival order
        round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))), 2)
          .cast("double").as("total_value"))
      .select(col("window.start").cast("date").as("day"), col("event_type"),
        col("events"), col("approx_uniq_users"), col("total_value"))
  }

  /** Trending detection: hopping (sliding) event-time windows — each event
    * lands in length/hop overlapping windows, so a burst is visible the
    * moment its FIRST hop closes instead of a full tumbling period later.
    * Same shape batch or streaming; with a watermark, state is bounded to
    * (lateness + length)/hop open windows per key. */
  def hoppingEventCounts(events: DataFrame, length: String = "6 hours",
      hop: String = "1 hour", watermark: Option[String] = None): DataFrame = {
    val withWm = watermark.fold(events)(w => events.withWatermark("ts", w))
    withWm
      .groupBy(window(col("ts"), length, hop), col("event_type"))
      .agg(count(lit(1)).as("events"),
        round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))), 2)
          .cast("double").as("total_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("events"), col("total_value"))
  }
}
