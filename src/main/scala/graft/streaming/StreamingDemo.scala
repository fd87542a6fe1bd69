package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.Engine
import graft.etl.{Schemas, StarStore}

/** Runnable streaming-ingest demo: drops three out-of-order transaction
  * files (including late data for an already-loaded day), runs the
  * AvailableNow ingest, and prints the merged star-schema fact. */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-streaming-demo")
    def df(schema: StructType, rows: Row*) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

    val dropDir = Files.createTempDirectory("graft_drop").toString
    val storeDir = Files.createTempDirectory("graft_store").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString

    val arrivals = Seq(
      Seq(Row(1L, "u1", "DEL-001", "2021-12-31", 30, 1),
        Row(2L, "u2", "SKJ-001", "2022-01-01", 40, 1)),
      Seq(Row(3L, "u2", "DEL-001", "2022-01-02", 20, 0),
        Row(4L, "u1", "OXXX-9", "2022-01-02", 10, 1)),
      Seq(Row(5L, "u1", "DEL-001", "2021-12-31", 50, 1),
        Row(6L, "u2", "DEL-001", "2022-01-01", 25, 1)))
    arrivals.foreach(rows =>
      df(Schemas.streamingTxns, rows: _*).coalesce(1)
        .write.mode("append").parquet(dropDir))

    val q = StreamingIngest.start(spark, dropDir, storeDir,
      assets = df(Schemas.assets,
        Row("DEL-001", "Ice Hockey"), Row("SKJ-001", "Ski Jumping")),
      subscribers = df(Schemas.subscribers, Row("u1", "P1"), Row("u2", "P2")),
      postal2city = df(Schemas.postal2city, Row("P1", 10), Row("P2", 20)),
      cities = df(Schemas.cities, Row(10, 1), Row(20, 2)),
      checkpointDir = ckpt)
    q.processAllAvailable()
    q.stop()

    println(s"STREAM store=$storeDir")
    StarStore.readFact(spark, storeDir)
      .orderBy("date_id", "country_id", "sport_name")
      .show(truncate = false)
    spark.stop()
  }
}
