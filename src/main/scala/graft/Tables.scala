package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver testdata (TESTDATA.md / FIXTURES.md §1).
  *
  * One parquet file per table under `/root/testdata/sf*`/. Reading through
  * `spark.read.parquet` keeps the scan declarative so Catalyst pushes
  * filters/projections into the parquet reader (PushedFilters / ReadSchema).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a temp view so the SQL surface
    * (`spark.sql("SELECT ... FROM lineitem ...")`) mirrors the reference's
    * SQL-first style — the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
    case _ =>
      spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) across testdata generations,
    * so branch on the *loaded* schema rather than assuming a physical type:
    *  - NANOS (+ the nanosAsLong conf): the raw int64 converts losslessly
    *    via integer division (a double division would lose precision at
    *    1e18).
    *  - MICROS/NTZ: Spark reads TIMESTAMP_NTZ natively; cast to the
    *    session-TZ timestamp (sessions here run UTC) so window()/
    *    date_trunc/to_date semantics match the NANOS-era behavior and the
    *    DuckDB oracle's naive-timestamp calendar. */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already a session-TZ timestamp
    }
  }

  /** The events table as a STREAM (file source over a directory of events
    * parquet). The file source needs an explicit schema, which must match
    * whatever physical type the files carry — so it is taken from a batch
    * read of the same directory, and `ts` then normalizes through the same
    * schema-adaptive branch as the batch table. */
  def streamEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir).schema
    normalizeEventTs(spark.readStream.schema(schema).parquet(dir))
  }
}
