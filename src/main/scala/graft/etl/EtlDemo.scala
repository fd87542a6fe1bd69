package graft.etl

import org.apache.spark.sql.Row

import graft.Engine

/** Runnable end-to-end ETL demo: builds a small SportsTV source set
  * in-memory (every data-quality path represented), runs the full pipeline,
  * writes the star schema to a temp dir, re-reads it, validates, and runs
  * the analytics suite. Exits non-zero on any validation failure. */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-etl-demo")
    import org.apache.spark.sql.types.StructType
    def df(schema: StructType, rows: Row*) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

    val countries = df(Schemas.countries,
      Row(1, "Norway"), Row(2, "Cote d'Azur"), Row(3, "Finland"), Row(4, "Iceland"))
    val cities = df(Schemas.cities, Row(10, 1), Row(20, 2), Row(30, 3))
    val postal2city = df(Schemas.postal2city, Row("P1", 10), Row("P2", 20), Row("P3", 30))
    val subscribers = df(Schemas.subscribers,
      Row("u1", "P1"), Row("u2", "P2"), Row("u3", "P3"), Row("u4", "P1"))
    val assets = df(Schemas.assets,
      Row("DEL-001", "Ice Hockey"), Row("SKJ-001", "Ski Jumping"),
      Row("XX-001", "Curling"), Row("BAD-01", null))
    val sqliteTxns = df(Schemas.streamingTxns,
      Row(1L, "u1", "DEL-001", "2021-12-31", 30, 1),
      Row(2L, "u1", "AHL-77", "2022-01-01", 60, 0),
      Row(3L, "u2", "SKJ-001", "2022-01-01", 45, 1),
      Row(4L, "u2", "FIS-9", "2022-01-01", 15, 1),
      Row(5L, "u3", "ICEHL-5", "2022-01-02", null, null),
      Row(6L, "u4", "OXXX-1", "2022-01-02", 10, 1))
    val csvTxns = Pipeline.normalizeCsv(df(Schemas.csvExport,
      Row(7L, "s1", "u5", "DEL-001", "2022-01-02", "10:00", 10, "tv", "HD", "1"),
      Row(8L, "s2", "u1", "MSL-2", "2022-01-03", "11:00", 5, "mobile", "SD", "0"),
      Row(9L, "s3", "u2", "DEL-001", null, "12:00", 20, "tv", "HD", "1"),
      Row(10L, "s4", "u4", "DEL-001", "2021-12-31", "13:00", 50, "web", "HD", "1"),
      Row(11L, "s5", "u1", "XX-001", "2022-01-03", "14:00", 25, "tv", "4K", "1"),
      Row(12L, "s6", "u3", "BAD-01", "2022-01-03", "15:00", 10, "tv", "SD", "1")))

    // U1: the two sources are one UNION ALL feeding one plan.
    val txns = sqliteTxns.unionByName(csvTxns)
    val result = Pipeline.run(spark, txns, assets, subscribers,
      postal2city, cities, countries)
    println(s"ETL stats: ${result.stats}")
    println(f"ETL retention: ${result.stats.retention * 100}%.1f%%")

    val out = java.nio.file.Files.createTempDirectory("graft_star").toString
    StarStore.writeFact(result.fact, out)
    StarStore.writeDims(result.dimDate, result.dimCountry, result.dimSport, out)
    val fact = StarStore.readFact(spark, out)
    Validate.all(fact, expectedValidRows = result.stats.valid)
    println(s"ETL validate: PASS (fact rows=${fact.count()}, dir=$out)")

    println("ETL analytics:")
    Analytics.executiveSummary(fact).show(truncate = false)
    Analytics.sportAnalysis(fact).show(truncate = false)
    Analytics.peakDayBySport(fact, StarStore.readDimDate(spark, out)).show(truncate = false)
    Analytics.yoyGrowth(fact).show(truncate = false)
    spark.stop()
  }
}
