package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TrainingData

/** Shard layout contract: partitioned directories, in-file doc_id order,
  * records-per-file cap, lossless round-trip. */
class CorpusStoreSpec extends SparkTestBase {

  test("writeShards: partitioned layout, sorted files, round-trip equality") {
    val dir = Files.createTempDirectory("graft_shards").toString
    val shards = TrainingData.t09TokenShards(spark, sf("sf0.001"))
    CorpusStore.writeShards(shards, dir, maxRecordsPerFile = 50)

    // layout: lang=*/shard=* directories exist
    val langDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).toSeq
    assert(langDirs.nonEmpty)
    val shardDirs = new java.io.File(s"$dir/${langDirs.head}").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("shard=")).toSeq
    assert(shardDirs.nonEmpty)

    // round-trip: nothing lost or duplicated
    val back = CorpusStore.readShards(spark, dir)
    assert(back.count() == shards.count())
    val cols = shards.columns.map(col).toIndexedSeq
    assert(back.select(cols: _*).exceptAll(shards).isEmpty &&
      shards.exceptAll(back.select(cols: _*)).isEmpty)

    // every parquet file respects the cap and is internally doc_id-sorted
    val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.isDirectory)
      .flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(ids.length <= 50, s"${f.getName}: ${ids.length} rows > cap")
      assert(ids == ids.sorted, s"${f.getName} not sorted by doc_id")
    }
  }

  test("compactParquet merges a small-file store losslessly") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/store"
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
      .select("doc_id", "lang", "n_chars")
    docs.repartition(24).write.parquet(dir) // deliberately fragmented
    val wantRows = docs.count()
    val (before, after) = Maintenance.compactParquet(spark, dir,
      targetFileBytes = 10L * 1024 * 1024)
    assert(before == 24, s"expected 24 input files, saw $before")
    assert(after < before, s"no compaction: $before -> $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == wantRows)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("compactParquet preserves hive partition directories") {
    val dir = Files.createTempDirectory("graft_compact_part").toString + "/store"
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
      .select("doc_id", "lang", "n_chars")
    docs.repartition(16).write.partitionBy("lang").parquet(dir)
    val wantRows = docs.count()
    val (before, after) = Maintenance.compactParquet(spark, dir,
      targetFileBytes = 10L * 1024 * 1024)
    assert(after < before, s"no compaction: $before -> $after")
    // partition dirs survive — a flattened rewrite would turn lang= dirs
    // into plain data files and break later partition-overwrite merges
    val langDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).toSeq
    assert(langDirs.nonEmpty, s"partition layout flattened: ${
      new java.io.File(dir).listFiles().map(_.getName).mkString(", ")}")
    val back = spark.read.parquet(dir)
    assert(back.count() == wantRows)
    val cols = docs.columns.map(col).toIndexedSeq
    assert(back.select(cols: _*).exceptAll(docs).isEmpty &&
      docs.exceptAll(back.select(cols: _*)).isEmpty)
    // and a partitioned overwrite into the compacted store still replaces
    // exactly one partition
    val one = back.filter(col("lang") === langDirs.head.stripPrefix("lang="))
    assert(one.count() > 0)
  }

  test("compactParquet refuses a mixed partition/plain layout") {
    val dir = Files.createTempDirectory("graft_compact_mixed").toString + "/store"
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
      .select("doc_id", "lang", "n_chars").limit(10)
    docs.write.partitionBy("lang").parquet(dir)
    // a stray plain subdirectory makes the layout ambiguous
    docs.drop("lang").write.parquet(s"$dir/stray")
    intercept[IllegalArgumentException](
      Maintenance.compactParquet(spark, dir))
  }

  test("snapshotDiff: added/removed/modified/unchanged on a known fixture") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "stays  THE same"))
      .toDF("doc_id", "text")
    val newSnap = Seq(
      (2L, "gamma delta CHANGED"),             // modified
      (3L, "stays the SAME"),                  // unchanged modulo case/ws
      (4L, "brand new"))                       // added; 1 removed
      .toDF("doc_id", "text")
    val got = CorpusStore.snapshotDiff(oldSnap, newSnap).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "modified",
      3L -> "unchanged", 4L -> "added"))
  }
}
