package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Golden-result hashes for the 7 RAW probabilistic bench-only queries
  * (d03r/d04r/d06r/d10r LSH-family dedup, s03r/s04r/s07r ANN top-k):
  * their candidate sets are seeded-hash / sketch products that no SQL
  * oracle can reproduce, so the CONTRACT keys carry oracle-checkable
  * verdict forms (see [[SparkEntry.benchOnly]]) and the raw forms live
  * outside the driver sweep. What the verdicts and audits can't catch is
  * a SILENT behavior change in the probabilistic path itself (a seed, a
  * banding constant, a quantizer default) that still passes them — the
  * golden hash pins the exact output.
  *
  * Because the driver REGENERATES the testdata parquet between rounds, a
  * raw committed hash would false-alarm on every regeneration (the d06a
  * lesson). Each golden is therefore keyed to a FINGERPRINT of the input
  * table it was computed from; the spec ([[graft.operators.NoOracleGoldenSpec]])
  * verifies the fingerprint first and CANCELS loudly (not fails) when the
  * corpus has changed, telling the operator to refresh:
  *
  *   sbt "runMain graft.Goldens"          # rewrites the goldens file
  *
  * Canonicalization mirrors the driver's compare: columns sorted by name,
  * every value rendered to a string (shortest-repr doubles), rows sorted,
  * MD5 over the joined block. Results are contract-query outputs (tens to
  * hundreds of rows), so the collect is bounded by construction. */
object Goldens {

  val queries: Seq[String] = Seq(
    "d03r_lsh_pairs", "d04r_simhash_pairs", "d06r_winnow_pairs",
    "d10r_manifest_lsh", "s03r_srp_topk", "s04r_ivf_topk",
    "s07r_pq_topk", "s15r_ivfpq_topk", "s16r_mmr_ann",
    "s13r_hardneg_ann", "s18r_dial_sweep", "s20r_rerank_sweep",
    "s21r_grid_sweep", "s22r_grid_frontier", "t52r_hybrid_ann",
    "t53_hybrid_store", "t63_tri_store", "s23r_external_ivfpq") ++
    graft.multimodal.MultimodalFixtures.queries.keys.toSeq.sorted

  /** Contract + bench-only entry points, for golden resolution. */
  def allQueries: Map[String, (SparkSession, String) => DataFrame] =
    SparkEntry.all

  /** documents for the d-family, embeddings for the s-family; the
    * m-family's input is the code-generated fixture corpus itself
    * (sentinel resolved by [[tableFingerprint]]). */
  val MultimodalInput = "multimodal-fixture"

  def inputTable(query: String): String =
    // the hybrid fusion reads BOTH corpora — fingerprint both, so a
    // regeneration of either cancels (refresh prompt) instead of failing
    if (query == "t52r_hybrid_ann" || query == "t53_hybrid_store" ||
      query == "t63_tri_store")
      "documents+embeddings"
    else if (query.startsWith("s")) "embeddings"
    else if (query.startsWith("m")) MultimodalInput
    else "documents"

  val goldensPath = "src/test/resources/no_oracle_goldens.json"

  /** Order-invariant content fingerprint of one input table: row count +
    * sum of per-row xxhash64 over the full row (via to_json so nested
    * arrays fingerprint too). Catches any regeneration, insertion, or
    * value drift; immune to file layout and read order. */
  def tableFingerprint(spark: SparkSession, dir: String, table: String): String = {
    if (table.contains("+"))
      return table.split('+').map(t =>
        s"$t{${tableFingerprint(spark, dir, t)}}").mkString(";")
    // the m-family's input is the fixture frame itself: fingerprinting it
    // makes a fixture-generator change CANCEL (refresh prompt) instead of
    // failing as a phantom engine regression — the same contract the
    // driver-regenerated tables get
    val df =
      if (table == MultimodalInput)
        graft.multimodal.MultimodalFixtures.media(spark)
      else Tables(spark, dir, table)
    val row = df
      .select(xxhash64(to_json(struct(df.columns.map(col): _*))).as("h"))
      // decimal sum: a long sum of ~2^63-scale hashes overflows ANSI mode
      .agg(count(lit(1)).as("n"), sum(col("h").cast("decimal(38,0)")).as("s"))
      .head()
    s"n=${row.getLong(0)},s=${row.getDecimal(1).toBigInteger}"
  }

  /** Canonical MD5 of a bounded result frame (driver-compare shaped). */
  def resultHash(df: DataFrame): String = {
    val cols = df.columns.sorted
    val rows = df.select(cols.map(col): _*).collect().map { r =>
      cols.indices.map { i =>
        val v = r.get(i)
        if (v == null) "NULL" else v.toString
      }.mkString("|")
    }.sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(rows.mkString("\n").getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    val sfDirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-goldens")
    val entries = for {
      dir <- sfDirs
      q <- queries
    } yield {
      val fp = tableFingerprint(spark, dir, inputTable(q))
      val h = resultHash(allQueries(q)(spark, dir))
      System.err.println(s"[goldens] $dir $q input{$fp} hash=$h")
      s"""  "${dir.split('/').last}/$q": {"input": "$fp", "hash": "$h"}"""
    }
    val json = entries.mkString("{\n", ",\n", "\n}\n")
    val p = java.nio.file.Paths.get(goldensPath)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, json)
    System.err.println(s"[goldens] wrote ${entries.size} entries to $goldensPath")
    spark.stop()
  }
}
