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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read the raw int64 nanos and convert losslessly via
      // integer division (a double division would lose precision at 1e18).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    case _ =>
      spark.read.parquet(s"$dir/$name.parquet")
  }
}
