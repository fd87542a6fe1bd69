package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CurationPipelineSpec extends SparkTestBase {

  test("curation funnel: each stage only narrows; chunks cover survivors") {
    val all = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val corpus = all.filter(col("doc_id") % 17 =!= 0)
    val benchmark = all.filter(col("doc_id") % 17 === 0)
    val out = Files.createTempDirectory("graft_curated").toString

    val stats = CurationPipeline.run(spark, corpus, benchmark, out)

    assert(stats.docs == corpus.count())
    assert(stats.afterQuality <= stats.docs)
    assert(stats.afterDedup < stats.afterQuality,
      "fixture contains near-duplicates; dedup must drop some")
    assert(stats.afterDecontam <= stats.afterDedup)
    assert(stats.afterDecontam > 0 && stats.kept > 0.5,
      s"curation dropped implausibly much: $stats")
    // every surviving doc has >= 10 tokens, so >= 1 chunk each
    assert(stats.chunks >= stats.afterDecontam)

    // layout contract: lang/shard partition dirs, chunk schema intact
    val shards = CorpusStore.readShards(spark, out)
    assert(shards.columns.toSet ==
      Set("doc_id", "chunk", "n_tokens", "fp", "lang", "shard"))
    assert(shards.select("shard").distinct().count() > 1)
    val docsOut = shards.select("doc_id").distinct().count()
    assert(docsOut == stats.afterDecontam)

    // the pipeline is deterministic end to end — release every cache
    // (including the manifest registry) first, so the second run actually
    // recomputes every stage instead of proving cache stability
    graft.Caches.releaseAll()
    val again = CurationPipeline.run(spark, corpus, benchmark, out)
    assert(again == stats)
  }
}
