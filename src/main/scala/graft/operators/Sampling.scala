package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-splitting and sampling for training-data pipelines.
  *
  * [[hashBucket]]/[[split]] assign each row to a 0–99 bucket (and
  * train/val/test label) from the md5 of its key — a pure function of the
  * data, so the assignment is reproducible across runs, engines, and
  * cluster layouts, new documents never move existing ones between splits
  * (the property a seeded `rand()` split lacks), and membership can be
  * recomputed anywhere without storing it. This is the standard held-out
  * discipline for corpora that grow over time.
  *
  * [[stratified]] is per-stratum Bernoulli sampling (seeded) — rebalancing
  * a training mix by language/source without a shuffle: the sampler is a
  * per-row filter, preserving the input partitioning.
  */
object Sampling {

  /** Deterministic 0–99 bucket: first 8 md5 hex digits of the key as an
    * int, mod 100. Engine-portable (the DuckDB oracle reproduces it). */
  def hashBucket(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100)
      .cast("int")

  /** [[hashBucket]] at micro resolution: 0–999999, for per-group sampling
    * rates as fine as 1e-6 — the grain a source-mix rebalancer needs when
    * one web crawl outweighs a curated source 10⁵:1. Same engine-portable
    * md5-prefix construction. */
  def fineHashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000000

  /** train/val/test label with the given percentage cut points. */
  def split(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(key)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Stratified sample without replacement: per-stratum keep fractions,
    * seeded and deterministic. Strata absent from `fractions` are dropped
    * (fraction 0) — `sampleBy` semantics. */
  def stratified(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)
}
