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

  /** Exact per-stratum k-sample: for every stratum, the k rows with the
    * smallest engine-portable hash `md5(key ‖ '-' ‖ salt)` (full-hex
    * lexicographic order — fixed-width lowercase hex, so string order IS
    * numeric order — ties to the key). A fixed QUOTA per class where
    * [[stratified]] gives a fixed rate: the balanced-eval-set /
    * per-language-probe sampler, deterministic like every sampler here
    * (new rows never displace a selected row unless they hash below it).
    *
    * Scale shape: a per-stratum rank window alone would pull each
    * stratum through one task — and strata are Zipfian (one language is
    * most of a crawl). Instead the hash PREFIX (first 8 hex digits as a
    * uniform u ∈ (0,1)) is thresholded map-side at `margin·k/n` per
    * stratum (per-stratum counts ride a broadcast), so the window ranks
    * an expected `margin·k` survivors per stratum, not the corpus. The
    * prune is provably safe unless a stratum's k-th-smallest hash falls
    * above the threshold — probability ≈ e^{-k(margin−1)²/(2·margin)}
    * (Chernoff), ~10⁻¹⁰ at k=20, margin=4 — and that tail is handled by
    * a LOUD refusal (the [[graft.dedup.Dedup.dedupClusters]] discipline:
    * never silently wrong), telling the caller to raise `margin`.
    *
    * Construction is LAZY: the sufficiency check rides the returned plan
    * as an `assert_true` filter over a broadcast 1-row violation count —
    * it throws at the caller's first action, not while the plan is being
    * built, so composing this operator into a larger lazy pipeline never
    * fires eager Spark jobs (ADVICE r7; the same finding the q58 review
    * note records). The internal persist is keyed on every parameter
    * that changes the pruned frame, so interleaved calls with different
    * strata/keys/salts/k never clobber each other's cache. */
  def stratifiedTopK(df: DataFrame, strataCol: String, keyCol: String,
      k: Int, salt: String = "graft", margin: Double = 4.0): DataFrame = {
    val hex = md5(concat(col(keyCol).cast("string"), lit(s"-$salt")))
    val u = (conv(substring(hex, 1, 8), 16, 10).cast("long").cast("double")
      + lit(0.5)) / lit(4294967296.0)
    val hashed = df.withColumn("__hex", hex).withColumn("__u", u)
    val counts = hashed.groupBy(strataCol)
      .agg(count(lit(1)).as("__n"))
    // persisted: the sufficiency-check branch and the caller's final
    // action both ride this frame instead of re-hashing the corpus;
    // keyed on every parameter AND the input plan's semantic hash, so
    // concurrent variants — including same-parameter calls on DIFFERENT
    // inputs — never evict each other (ADVICE r8); BOUNDED, so a
    // long-lived session feeding ever-new inputs doesn't pin one cached
    // frame per input forever (r9 review)
    val inputKey = df.queryExecution.analyzed.semanticHash()
    val pruned = graft.Caches.persistReplacingBounded("stratified_pruned",
      s"${strataCol}_${keyCol}_${salt}_${k}_${margin}_$inputKey",
      hashed
        .join(broadcast(counts), strataCol)
        .filter(col("__u") <= least(lit(1.0),
          lit(margin * k) / col("__n").cast("double"))))
    // sufficiency: every stratum must keep min(k, n) rows after the
    // prune, or the threshold clipped a potential winner — refuse loudly.
    // LEFT from counts: a stratum the prune emptied ENTIRELY has no row
    // in `pruned` at all, and an inner join would silently drop exactly
    // the worst offender from the check
    val kept = pruned.groupBy(strataCol).agg(count(lit(1)).as("__kept"))
    val short = counts.join(kept, Seq(strataCol), "left")
      .filter(coalesce(col("__kept"), lit(0L)) <
        least(lit(k.toLong), col("__n")))
      .agg(count(lit(1)).as("__short"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(col("__hex"), col(keyCol))
    val msg = s"stratifiedTopK prune clipped a stratum below k=$k — " +
      s"raise margin ($margin)"
    val data = pruned
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      // the guard lives in a FILTER (not a projected column the optimizer
      // would prune away): assert_true is NULL when the claim holds, so
      // the predicate keeps every row — and detonates the job with the
      // refusal message the moment any stratum was clipped
      .crossJoin(broadcast(short))
      .filter(assert_true(col("__short") === 0L, lit(msg)).isNull)
      .drop("__hex", "__u", "__n", "__short")
    // The row-riding guard above never evaluates when the prune emptied
    // EVERY stratum (empty data ⇒ empty crossJoin ⇒ no row carries the
    // assert) — the one path where the refusal would go silent (ADVICE
    // r8). This sentinel branch rides the always-1-row `short` aggregate
    // instead: when __short ≠ 0 its row SURVIVES the filter, so the
    // projection must be evaluated to emit it, and the non-foldable
    // assert (its condition references the column, so constant folding
    // can't pre-evaluate it) detonates before the row reaches the
    // output; when __short = 0 the filter drops the row and the branch
    // contributes nothing. Either way the union's output is exactly
    // `data` — the sentinel only ever throws, never yields rows.
    val sentinel = short
      .filter(col("__short") =!= 0L)
      .select(data.schema.fields.zipWithIndex.map { case (f, i) =>
        val c = if (i == 0) assert_true(col("__short") === 0L, lit(msg))
        else lit(null)
        c.cast(f.dataType).as(f.name)
      }.toSeq: _*)
    data.unionByName(sentinel)
  }
}
