package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deduplication operators for a training-data pipeline, each chosen for a
  * different scale/recall trade-off:
  *
  *   - [[exactGroups]] — hash-groupBy, one shuffle, finds byte-identical
  *     (modulo whitespace) copies.
  *   - [[ngramJaccardPairs]] — exact n-gram Jaccard via an inverted-index
  *     self-join on shingles: no O(n²) pair enumeration; cost is bounded by
  *     shingle-bucket sizes (posting lists), the classic scalable form.
  *   - [[minhashSignatures]]/[[minhashNearDuplicates]] — MinHash + LSH
  *     banding (Broder's resemblance sketches, 1997): candidates meet only
  *     when a band collides, so the join is equi-join-shaped and survives
  *     arbitrarily large corpora where even posting lists blow up.
  *   - [[simhash64]]/[[simhashNearDuplicates]] — 64-bit SimHash (Charikar
  *     2002) with banded hamming search for near-identical text.
  *   - [[winnowingNearDuplicates]] — winnowing fingerprints (Schleimer,
  *     Wilkerson & Aiken 2003) for shared-substring evidence at ~1/w the
  *     storage of full shingling.
  *
  * Everything is expression-level Spark (explode / groupBy / equi-join);
  * no driver-side loops, no UDFs.
  */
object Dedup {

  // keyed replace-on-change persist — shared JVM-wide cache registry.
  // LAZY deliberately (optimization round 14, measured): a lazily-
  // registered cache lets independent consumer branches race the build,
  // but on a wide executor those duplicated builds OVERLAP on idle
  // cores — flipping this module wholesale to the eager form made d08
  // (manifest) ~1.7× SLOWER fresh-JVM (serialized count() jobs replaced
  // overlapped work) while helping only the one frame whose race sits
  // on the critical path. That frame (minhash_sigs, ~5 concurrent
  // consumers of a 64-hash aggregation) opts into eager individually.
  private def persistReplacing(key: String, df: DataFrame): DataFrame =
    graft.Caches.persistReplacing(key, df)

  // ------------------------------------------------------------ exact
  /** Exact duplicate groups on the normalized-content fingerprint. */
  def exactGroups(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("copies"), min(col("doc_id")).as("keeper_doc_id"))

  // ------------------------------------------------------------ shingles
  /** Exploded (doc_id, shingle) rows BEFORE set-dedup — the shared gram
    * construction; callers choose what to dedup on (full strings for exact
    * Jaccard, 64-bit hashes for MinHash). Guarded so documents shorter
    * than n tokens produce no shingles (Spark's `sequence` would otherwise
    * count DOWN when start > stop). */
  private def shingleGrams(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col(textCol)).as("t"))
      .select(col("doc_id"), explode(gramArray(n)).as("shingle"))

  /** Per-row array of a document's n-gram strings in token order, over a
    * token array bound as `t` — the ONE source of gram identity.
    * [[shingleGrams]] (set-dedup stream) and [[shingleGramsPos]]
    * (positional stream) both explode THIS expression, so the two streams
    * can never drift apart — [[dupSpanCoverage]]'s equi-join of their
    * hashes relies on byte-identical gram strings, and a divergence would
    * not error, just silently stop matching. */
  private def gramArray(n: Int): Column = {
    val gram = transform(sequence(lit(1), size(col("t")) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(col("t"), i + j)): _*))
    when(size(col("t")) >= n, gram).otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-gram shingles per document. */
  def shingles(docs: DataFrame, textCol: String = "text", n: Int = 3): DataFrame =
    shingleGrams(docs, textCol, n).distinct()

  /** Distinct shingles collapsed to 8-byte hashes — the slim form every
    * join-heavy consumer ([[contamination]], [[incrementalDedup]]) moves
    * through shuffles instead of n-word strings. */
  private[graft] def hashedShingleSets(docs: DataFrame, textCol: String,
      n: Int): DataFrame =
    shingleGrams(docs, textCol, n)
      .select(col("doc_id"), xxhash64(col("shingle")).as("g"))
      .distinct()

  /** [[shingleGrams]] with the gram's 1-based token POSITION kept and the
    * gram collapsed to its 8-byte hash — the positional stream
    * [[dupSpanCoverage]]'s interval math rides (the set-dedup forms above
    * deliberately drop position). */
  private def shingleGramsPos(docs: DataFrame, textCol: String,
      n: Int): DataFrame =
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col(textCol)).as("t"))
      .select(col("doc_id"), posexplode(gramArray(n)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        xxhash64(col("col")).as("g"))

  /** Duplicated-span coverage (d22) — per document, the fraction of its
    * token positions lying inside an n-gram that also occurs in ANOTHER
    * document. The RefinedWeb/MassiveText "duplicate n-gram coverage"
    * curation signal: near-dup PAIR detection (d02/d03) finds documents to
    * drop, while this scores how much of each KEPT document is recycled
    * text — boilerplate headers, syndicated fragments, quotations — the
    * per-doc quality feature a filtering model consumes.
    *
    * Scale shape: gram document-frequencies come from the per-doc DISTINCT
    * hashed shingle set ([[shingleTable]] — pass the session's cached
    * table via `shingles` so a curation run reuses the one corpus pass);
    * the duplicated-gram keys (8-byte hashes) equi-join back against the
    * positional gram stream (map-side explode, no set-dedup), and the
    * per-doc interval union is ONE window over each doc's surviving
    * intervals — bounded by doc length, partitioned by doc_id, so no task
    * ever sees more than one document's spans. Coverage arithmetic is a
    * running-max sweep (new_cover = end − max(start−1, prev_max_end),
    * clamped at 0), not a distinct-position explode — the n× position
    * blowup never materializes.
    *
    * Gram identity is the 64-bit xxhash64 (the d02 slimming discipline):
    * results equal the string-gram form modulo collisions, which at any
    * realistic corpus sit orders of magnitude below the metric's 4-dp
    * resolution. */
  def dupSpanCoverage(docs: DataFrame, textCol: String = "text", n: Int = 3,
      minDf: Int = 2, shingles: Option[DataFrame] = None): DataFrame = {
    val sh = shingles.getOrElse(hashedShingleSets(docs, textCol, n))
    val dupG = sh.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select("g")
    // one row per (doc, pos): g is a function of pos and dupG is distinct
    // on g, so the join cannot duplicate intervals
    val iv = shingleGramsPos(docs, textCol, n)
      .join(dupG, "g")
      .select(col("doc_id"), col("pos"), (col("pos") + (n - 1)).as("e"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val covered = iv
      .withColumn("pm", coalesce(max(col("e")).over(w), lit(0)))
      .select(col("doc_id"),
        greatest(lit(0), col("e") - greatest(col("pos") - 1, col("pm")))
          .as("newcov"))
      .groupBy("doc_id").agg(sum("newcov").as("covered_tokens"))
    docs
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(round(
            coalesce(col("covered_tokens"), lit(0L)).cast("double")
              / col("n_tokens"), 4))
          .as("dup_coverage"))
      .orderBy("doc_id")
  }

  /** The corpus SHINGLE TABLE — per-doc distinct hashed n-gram sets
    * (doc_id, g), persisted once for the session. A multi-stage curation
    * run (quality gate → dedup → decontam) materializes this once over the
    * whole corpus and derives every stage's shingle view from it by
    * doc_id semi-join, instead of re-exploding the text per stage — at
    * 100 TB the explode+set-dedup is a full-corpus scan+shuffle, so this
    * is the difference between one such pass and one per stage. Pass
    * filtered views into [[ngramJaccardPairs]] / [[dedupManifest]] /
    * [[contamination]] via their `shingles` parameters. */
  def shingleTable(docs: DataFrame, textCol: String = "text",
      n: Int = 3): DataFrame =
    persistReplacing(s"shingle_table_n$n", hashedShingleSets(docs, textCol, n))

  // ------------------------------------------------------------ n-gram Jaccard
  /** Exact Jaccard over shingle sets for every pair sharing ≥1 shingle.
    * The self-join on `shingle` is an inverted index: a pair is generated
    * once per common shingle and collapsed by the groupBy, so disjoint
    * documents never meet.
    *
    * Shingles are collapsed to a single 64-bit xxhash64 BEFORE the
    * set-dedup shuffle and the self-join — the same slimming
    * [[minhashSignatures]] applies: the distinct and the inverted-index
    * join move fixed 8-byte keys instead of n-word strings. Set identity
    * (and therefore Jaccard) is preserved modulo 64-bit collisions, which
    * at any realistic corpus are orders of magnitude below the threshold's
    * own resolution (a collision would need ~2^32 DISTINCT shingles inside
    * ONE document pair's union to become likely).
    *
    * `maxDf` caps posting-list length (same rationale as
    * [[winnowingNearDuplicates]]): a shingle present in more than `maxDf`
    * documents is corpus boilerplate, contributes near-zero Jaccard
    * evidence, and makes the self-join quadratic in its list length — one
    * boilerplate header shared by 1% of a 10^9-doc corpus would otherwise
    * emit 10^13 pairs on its own. Sizes are computed over the capped sets,
    * consistently on both sides of the ratio. The default is far above any
    * fixture's max df (25 at sf0.1), so small-corpus results are exact. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double,
      textCol: String = "text", n: Int = 3, maxDf: Int = 1000,
      shingles: Option[DataFrame] = None): DataFrame = {
    // the explode+distinct is the expensive subtree and feeds the df-cap
    // aggregate, the sizes aggregate, and both sides of the self-join —
    // persist it once instead of recomputing per branch. A caller that has
    // already materialized the corpus shingle table (the curation funnel
    // computes it ONCE and derives every stage from it — the "shingle
    // table materialized once" shape a 100 TB pipeline runs) passes the
    // (doc_id, g) frame for exactly `docs` via `shingles` and the explode
    // is skipped; df-cap and sizes still compute over the passed set, so
    // results are identical to the self-computed path.
    val shAll = shingles.getOrElse(persistReplacing("ngram_shingles",
      hashedShingleSets(docs, textCol, n)))
    val rare = shAll.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("g")
    // the df-capped set feeds the sizes aggregate AND both sides of the
    // self-join — persist it so the cap join over the cached shingles
    // runs once, not three times
    val sh = persistReplacing("ngram_sh_capped", shAll.join(rare, "g"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val common = sh.as("a")
      .join(sh.as("b"), col("a.g") === col("b.g") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
    // the OUTPUT is tiny (near-dup pairs) but costs the whole inverted-index
    // self-join — persist it so every consumer that re-derives the same
    // pair set (cluster resolution, the recall audits, the manifest) pays
    // the join once per input, not once per consumer
    persistReplacing("ngram_pairs", common
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        (col("c").cast("double") / (col("s1.sz") + col("s2.sz") - col("c")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard")))
  }

  /** Containment near-duplicate pairs: |A∩B| / min(|A|,|B|) over the same
    * hashed shingle sets as [[ngramJaccardPairs]]. Containment is the
    * partial-copy detector symmetric Jaccard misses — a short document
    * pasted verbatim inside a much longer one scores ~1.0 here while its
    * Jaccard (÷ by the UNION) can sit far below any dedup threshold
    * (Broder 1997 distinguishes resemblance from containment for exactly
    * this case). Identical inverted-index join shape and `maxDf`
    * boilerplate cap; the only change is the denominator, so the pair
    * generation cost is shared via the `ngram_shingles`/`ngram_pairs`-style
    * persists when both run in one session. Emits both scores so a
    * curation policy can distinguish "same page" (high Jaccard) from
    * "one contains the other" (high containment, low Jaccard). */
  def containmentPairs(docs: DataFrame, threshold: Double,
      textCol: String = "text", n: Int = 3, maxDf: Int = 1000): DataFrame = {
    val shAll = persistReplacing("ngram_shingles",
      hashedShingleSets(docs, textCol, n))
    val rare = shAll.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("g")
    // same persist as [[ngramJaccardPairs]] — plan-equal, so whichever of
    // the two runs first materializes it and the other reuses it
    val sh = persistReplacing("ngram_sh_capped", shAll.join(rare, "g"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val common = sh.as("a")
      .join(sh.as("b"), col("a.g") === col("b.g") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        (col("c").cast("double") / least(col("s1.sz"), col("s2.sz")))
          .as("containment"),
        (col("c").cast("double") / (col("s1.sz") + col("s2.sz") - col("c")))
          .as("jaccard"))
      .filter(col("containment") >= threshold)
      .select(col("d1"), col("d2"),
        round(col("containment"), 4).as("containment"),
        round(col("jaccard"), 4).as("jaccard"))
  }

  // ------------------------------------------------------------ winnowing
  /** Near-duplicate pairs by shared winnowing fingerprints: the same
    * inverted-index join shape as [[ngramJaccardPairs]] but over the ~1/w
    * compressed fingerprint sets — the storage/IO-efficient exact-substring
    * evidence path.
    *
    * `maxDf` caps posting-list length: a fingerprint present in more than
    * `maxDf` documents is corpus boilerplate, contributes ~zero Jaccard
    * evidence, and would make the self-join quadratic in its list length
    * (the classic hot-key blowup — on shared-vocabulary corpora a single
    * common substring can pair half the corpus). Jaccard is computed over
    * the capped sets, consistently on both sides of the ratio. */
  def winnowingNearDuplicates(docs: DataFrame, minJaccard: Double = 0.2,
      textCol: String = "text", k: Int = 8, w: Int = 4,
      maxDf: Int = 20): DataFrame = {
    val fpAll = docs
      .select(col("doc_id"),
        explode(graft.text.TextAnalysis.winnowingFingerprints(col(textCol), k, w))
          .as("fp"))
      .distinct()
    val rare = fpAll.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("fp")
    val fp = fpAll.join(rare, "fp")
    val sizes = fp.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val common = fp.as("a")
      .join(fp.as("b"), col("a.fp") === col("b.fp") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
    // tiny output, expensive join — same rationale as ngramJaccardPairs
    persistReplacing("winnow_pairs", common
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"),
        (col("c").cast("double") / (col("s1.sz") + col("s2.sz") - col("c")))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard")))
  }

  // ------------------------------------------------------------ MinHash + LSH
  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * min over the document's shingles — computed as `numHashes` min-aggs in
    * ONE pass over the exploded shingles (no per-hash shuffle).
    *
    * Shingles are collapsed to a single 64-bit xxhash64 BEFORE the
    * set-dedup shuffle, so the distinct moves fixed 8-byte keys instead of
    * full shingle strings (~4× fewer shuffle bytes) and the seeded hash
    * family re-hashes a long, not a variable-length string, per position.
    * Hash function i is therefore `xxhash64(xxhash64(shingle), i)`; a
    * base-hash collision merges two shingles — noise far below MinHash's
    * own estimation variance (and DedupSpec's recall bound guards it). */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 64,
      textCol: String = "text", n: Int = 3,
      shingles: Option[DataFrame] = None): DataFrame = {
    // `shingles`: a pre-built (doc_id, g) set to sign INSTEAD of deriving
    // one — the caller's tool for keeping signatures consistent with a
    // df-capped exact side (d21's calibration audit must estimate the
    // SAME Jaccard the capped pair generator computes, or a binding cap
    // reads as sketch bias)
    val sh = shingles.getOrElse(
      shingleGrams(docs, textCol, n)
        .select(col("doc_id"), xxhash64(col("shingle")).as("g"))
        .distinct())
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(col("g"), lit(i))).as(s"h$i"))
    sh.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH banding: split the signature into `bands` bands of r rows; two
    * documents are candidates iff some band hashes equal. Equi-join shaped:
    * scales to corpora where pairwise comparison is impossible.
    *
    * The join and the dedup `.distinct()` carry ONLY `(d1, d2)` — round 1
    * carried both 64-element signature arrays through them, shuffling ~1 KB
    * per candidate for a key that is two longs; callers re-attach
    * signatures with two cheap equi-joins afterwards.
    *
    * `maxBucket` drops band-buckets holding more than that many documents:
    * one hot band value (boilerplate-heavy corpora, mass-duplicated
    * templates) otherwise goes quadratic in its bucket size — the same
    * blowup [[winnowingNearDuplicates]] caps with `maxDf`. Run
    * [[exactGroups]] dedup FIRST so identical documents (which collide in
    * EVERY band by construction) never form giant buckets; the default cap
    * is far above any fixture bucket, so small-corpus results are exact. */
  def lshCandidates(sigs: DataFrame, bands: Int = 16, numHashes: Int = 64,
      maxBucket: Int = 5000): DataFrame = {
    val r = numHashes / bands
    val buckets = sigs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        hash(slice(col("sig"), b * lit(r) + 1, lit(r)), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val cool = buckets.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucket)
      .select("band", "bucket")
    val kept = buckets.join(cool, Seq("band", "bucket"))
    kept.as("a")
      .join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** MinHash near-duplicates: LSH candidates filtered by the signature
    * Jaccard estimate (fraction of agreeing positions). Signatures are
    * computed once and persisted for the run — they feed candidate
    * generation AND both sides of the estimate re-join, and recomputing
    * the shingle aggregation three times dominates everything else (at
    * warehouse scale you would materialize the signature table instead;
    * the replace-on-next-call persist is the single-job analog). */
  def minhashNearDuplicates(docs: DataFrame, threshold: Double = 0.5,
      numHashes: Int = 64, bands: Int = 32): DataFrame = {
    // bands=32 (r=2): collision prob at J=0.5 is 1-(1-0.25)^32 ≈ 1.0, at
    // J=0.2 ≈ 0.73 — recall-biased; the estimate filter prunes false hits.
    // EAGER (optimization round 14, measured): the signature table feeds
    // ~5 concurrent subtrees (band explode → both self-join sides, plus
    // both estimate re-attach joins), and its build — the full shingle
    // explode/distinct + 64 min-hash aggregation — is the plan's
    // critical path: lazily registered, the cold call raced it under
    // every branch (fresh-JVM d03 15.6 s); built once eagerly it reads
    // 9.3 s. The module default stays lazy (see persistReplacing).
    val sigs = graft.Caches.persistReplacingEager("minhash_sigs",
      minhashSignatures(docs, numHashes))
    val est = aggregate(
      zip_with(col("sig1"), col("sig2"), (a, b) =>
        when(a === b, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes
    // tiny output, banded-join cost — same rationale as ngramJaccardPairs
    persistReplacing("minhash_pairs", lshCandidates(sigs, bands, numHashes)
      .join(sigs.select(col("doc_id").as("d1"), col("sig").as("sig1")), "d1")
      .join(sigs.select(col("doc_id").as("d2"), col("sig").as("sig2")), "d2")
      .select(col("d1"), col("d2"), est.as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold))
  }

  // ------------------------------------------------------------ clusters
  /** Duplicate-cluster resolution: the step between "near-duplicate PAIRS
    * found" and "corpus deduplicated". Pairs form an undirected graph;
    * each connected component is one duplicate cluster, labeled by its
    * minimum doc_id — which is also the canonical keeper (the same
    * min-keeper rule [[exactGroups]] uses). Output: one row per clustered
    * document `(doc_id, cluster_id)`; unpaired documents are implicitly
    * their own cluster and are not emitted.
    *
    * Algorithm: iterative min-label propagation (Pregel-style hop
    * relaxation) — per round one equi-join + min-aggregate, all
    * distributed; the driver only conducts and reads a 1-row convergence
    * count. Rounds needed = graph diameter (duplicate clusters are
    * near-cliques in practice, so a handful). Each round persists its
    * labels and localCheckpoints to cut the growing lineage — without
    * that, round k re-executes rounds 1..k-1. For graphs with
    * pathological diameters the large-star/small-star variant (Kiveris
    * et al. 2014) halves rounds to O(log n); not needed for near-dup
    * clusters. */
  def dedupClusters(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed with least(id, min neighbor) — exactly what round 1 would
    // produce from identity labels, for one aggregate instead of a full
    // join+checkpoint+convergence round (symmetrized edges ⇒ every node
    // appears as src, so this also enumerates the nodes)
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("mn"))
      .select(col("id"), least(col("id"), col("mn")).as("label"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("id").as("nid"), col("label")),
          edges("dst") === col("nid"))
        .groupBy(col("src").as("id"))
        .agg(min("label").as("nlabel"))
      val updated = labels.select(col("id"), col("label").as("old"))
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("old"),
          least(col("old"), coalesce(col("nlabel"), col("old"))).as("label"))
        .localCheckpoint(true) // eager: round i materializes here
      converged = updated.filter(col("label") =!= col("old")).limit(1).count() == 0L
      // re-binding drops the only reference to round i-1's checkpoint; its
      // blocks are reclaimed by Spark's ContextCleaner after GC, so rounds
      // don't accumulate storage (Dataset.unpersist can't release a
      // localCheckpoint — it only knows cacheManager entries)
      labels = updated.select("id", "label")
      i += 1
    }
    edges.unpersist()
    // a silent cap-exit would return a component split into several
    // clusters — wrong answers, loudly refused instead (raise maxIter for
    // graphs whose diameter genuinely exceeds it)
    require(converged,
      s"dedupClusters did not converge within $maxIter rounds — component diameter exceeds maxIter")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Connected components in O(log n) rounds via alternating
    * large-star / small-star edge rewrites (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014) — the variant
    * [[dedupClusters]]'s scaladoc pointed at for graphs whose component
    * DIAMETER is pathological. Min-label propagation pays one round per
    * hop, so a 200-node chain needs 200 rounds (and the loud maxIter
    * refusal fires); the star rewrites contract every component toward
    * its minimum at doubling speed regardless of shape.
    *
    *  - large-star: every node connects its LARGER neighbors to the
    *    minimum of its neighborhood (self included);
    *  - small-star: every node connects its smaller-or-equal neighbors
    *    to that minimum.
    *
    * Both steps preserve connectivity exactly (each rewritten edge stays
    * inside the component) and strictly shrink the potential; at the
    * fixed point the edge set IS the star forest {(v, component-min)}.
    * Each round is two groupBy+join passes over the canonical edge list —
    * all distributed, fixed-width keys, no driver state beyond the 1-row
    * convergence checksum. Output contract matches [[dedupClusters]]:
    * one row per participating doc, `cluster_id` = component minimum,
    * keeper included as (m, m).
    *
    * Default for dedup stays [[dedupClusters]] (near-dup components are
    * shallow stars, where one-hop propagation converges in 2-3 rounds and
    * each round is ONE join instead of two); this is the drop-in for
    * corpora whose duplicate graph chains — asserted result-equal in
    * DedupSpec, including a chain the propagation form refuses. */
  def dedupClustersLogStar(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    def canon(e: DataFrame): DataFrame = e
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("hi"),
        least(col("u"), col("v")).as("lo"))
      .distinct()
    // (count, order-invariant hash-sum) — the convergence checksum; the
    // edge set is distinct so multiset equality reduces to set equality
    def checksum(e: DataFrame): (Long, BigDecimal) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("hi"), col("lo"))
          .cast("decimal(38,0)")), lit(BigDecimal(0)))).head
      (r.getLong(0), BigDecimal(r.getDecimal(1)))
    }
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val m = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      canon(sym.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
    }
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy("hi").agg(min(col("lo")).as("m"))
      val rewired = e.join(m, "hi")
        .select(col("lo").as("u"), col("m").as("v"))
        .union(m.select(col("hi").as("u"), col("m").as("v")))
      canon(rewired)
    }
    var edges = canon(pairs.select(col("d1").as("u"), col("d2").as("v")))
      .localCheckpoint(true)
    var sig = checksum(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nsig = checksum(next)
      converged = nsig == sig
      edges = next; sig = nsig
      i += 1
    }
    require(converged,
      s"dedupClustersLogStar did not converge within $maxIter rounds")
    edges.select(col("hi").as("doc_id"), col("lo").as("cluster_id"))
      .union(edges.select(col("lo"), col("lo")).distinct()
        .toDF("doc_id", "cluster_id"))
      // intermediate mins that another star absorbed appear only as a
      // hi-edge; keep each doc's final (minimum) label
      .groupBy("doc_id").agg(min(col("cluster_id")).as("cluster_id"))
  }

  // ------------------------------------------------------------ contamination
  /** Benchmark decontamination: for each training document, the fraction
    * of its distinct n-gram shingles that appear anywhere in the benchmark
    * corpus — the standard eval-leakage check run before training (a
    * training doc that contains a benchmark's n-grams inflates the score).
    *
    * Scale shape: the benchmark side collapses to DISTINCT 8-byte shingle
    * hashes (eval suites are a few million n-grams even when the training
    * corpus is 100 TB), so the semi-join broadcasts under AQE and the
    * training side is never shuffled; if the benchmark outgrows the
    * broadcast threshold the same plan degrades to a linear hash semi-join
    * on fixed-width keys, not a pair blowup. Documents shorter than `n`
    * tokens have no shingles and are absent from the output, matching
    * [[ngramJaccardPairs]]. */
  def contamination(train: DataFrame, benchmark: DataFrame,
      threshold: Double = 0.5, textCol: String = "text",
      n: Int = 3, trainShingles: Option[DataFrame] = None,
      benchShingles: Option[DataFrame] = None): DataFrame = {
    // referenced twice (sizes + hits) — cache so shingling runs once; keys
    // carry the gram width so a 3-gram consumer (d09, the funnel) and a
    // 13-gram consumer (d13) don't evict each other's frames. Either side
    // accepts a precomputed [[hashedShingleSets]]-shaped (doc_id, g) frame
    // so a funnel that already built the corpus shingle table doesn't
    // re-explode the text (contract: the frame covers exactly that side's
    // documents).
    val trainSh = persistReplacing(s"contamTrain_n$n",
      trainShingles.getOrElse(hashedShingleSets(train, textCol, n))
        .withColumnRenamed("g", "h"))
    // membership only — ONE distinct on the bare hash (a per-doc set-dedup
    // first would shuffle the benchmark side twice for the same result);
    // cached: several consumers gate different train sets against the SAME
    // benchmark (the standalone check, the curation funnel)
    val benchSh = persistReplacing(s"contamBench_n$n",
      benchShingles.map(_.select(col("g").as("h")))
        .getOrElse(shingleGrams(benchmark, textCol, n)
          .select(xxhash64(col("shingle")).as("h")))
        .distinct())
    val sizes = trainSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val hits = trainSh.join(benchSh, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    sizes.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("overlap_frac",
        round(col("n_overlap").cast("double") / col("n_shingles"), 4))
      .withColumn("contaminated", col("overlap_frac") >= threshold)
  }

  // ------------------------------------------------------------ incremental
  /** Incremental dedup: classify a NEW batch of documents against an
    * existing (already-deduplicated) corpus — the production shape for a
    * growing corpus, where re-clustering 100 TB for a daily 0.1% increment
    * is not an option. Per batch document:
    *
    *   - `exact_dup` — its normalized fingerprint exists in the corpus
    *     (`dup_of` = smallest such corpus doc; `jaccard` null);
    *   - `near_dup` — some corpus doc shares ≥ `threshold` n-gram Jaccard
    *     (`dup_of` = the best-scoring corpus doc, ties to the smallest id);
    *   - `new` — neither.
    *
    * The near check is the cross-corpus inverted-index join: batch
    * shingles meet corpus shingles on an equi-join of 8-byte hashes, so
    * cost is posting-list-bounded and scales with the BATCH size, not the
    * corpus pair count. Batch-internal duplicates are [[dedupManifest]]'s
    * job on the batch alone. */
  def incrementalDedup(corpus: DataFrame, batch: DataFrame,
      threshold: Double = 0.2, textCol: String = "text",
      n: Int = 3): DataFrame = {
    val (fps, postings) = indexRows(corpus, textCol, n, "incrCorpusSh")
    incrementalDedupAgainstIndex(fps,
      postings.select(col("doc_id").as("cdoc"), col("g"),
        col("sz").as("csz")),
      batch, threshold, textCol, n)
  }

  /** Index form of [[incrementalDedup]] — the per-batch cost model a
    * CONTINUOUS ingest needs: the corpus side arrives as its materialized
    * dedup index (fingerprints + size-annotated shingle postings, both
    * maintained incrementally by the admitter), so classifying a batch
    * scans the compact 8-byte-keyed index instead of re-tokenizing and
    * re-shingling the entire text corpus on every micro-batch. */
  def incrementalDedupAgainstIndex(corpusFps: DataFrame,
      corpusPostings: DataFrame, batch: DataFrame,
      threshold: Double = 0.2, textCol: String = "text",
      n: Int = 3): DataFrame = {
    val bfp = batch.select(col("doc_id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val cfp = corpusFps.select(col("doc_id").as("cdoc"), col("fp"))
    val exact = bfp.join(cfp, "fp")
      .groupBy("doc_id").agg(min(col("cdoc")).as("exact_of"))

    val bs = persistReplacing("incrBatchSh",
      hashedShingleSets(batch, textCol, n))
    val bsz = bs.groupBy("doc_id").agg(count(lit(1)).as("bsz"))
    val near = bs.join(corpusPostings, "g")
      .groupBy("doc_id", "cdoc", "csz").agg(count(lit(1)).as("c"))
      .join(bsz, "doc_id")
      .withColumn("j",
        col("c").cast("double") / (col("bsz") + col("csz") - col("c")))
      .filter(col("j") >= threshold)
    // deterministic best match: unrounded score order is identical across
    // engines because j derives from identical integer counts
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("j"), asc("cdoc"))
    val best = near.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cdoc").as("near_of"),
        round(col("j"), 4).as("near_j"))

    batch.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_of").isNotNull, lit("exact_dup"))
          .when(col("near_of").isNotNull, lit("near_dup"))
          .otherwise(lit("new")).as("status"),
        coalesce(col("exact_of"), col("near_of")).as("dup_of"),
        when(col("exact_of").isNull, col("near_j")).as("jaccard"))
  }

  /** The (doc_id, fp) and (doc_id, g, sz) index rows for `docs` — what a
    * continuous admitter persists per admitted batch so future batches
    * classify against the index, not the raw text. THE single source of
    * the index-row construction ([[incrementalDedup]] derives its corpus
    * side from here too, so the two can never drift). The shingle frame
    * feeds both the postings and the size aggregate — cached under
    * `cacheKey` so the text is tokenized once. */
  def indexRows(docs: DataFrame, textCol: String = "text", n: Int = 3,
      cacheKey: String = "indexRowsSh"): (DataFrame, DataFrame) = {
    val fps = docs.select(col("doc_id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val sh = persistReplacing(cacheKey, hashedShingleSets(docs, textCol, n))
    val postings = sh
      .join(sh.groupBy("doc_id").agg(count(lit(1)).as("sz")), "doc_id")
    (fps, postings)
  }

  // ------------------------------------------------------------ manifest
  /** The end-to-end dedup decision: combine exact-duplicate evidence
    * (shared content fingerprint) with near-duplicate evidence (n-gram
    * Jaccard pairs), resolve connected components, and emit one row per
    * document with its canonical keeper — the keep/drop manifest a corpus
    * pipeline actually ships downstream. Unclustered documents keep
    * themselves. */
  /** Finished manifests, keyed by (parameters, ANALYZED INPUT plan): a
    * manifest is the kind of artifact a pipeline materializes once per
    * corpus and reads many times (the cluster-size QA report, the shard
    * writer, the drop executor all consume the SAME decision), and its
    * closure-built plan contains run-specific checkpoints that defeat
    * output-plan-equality caching — so identity is the input. A hit is
    * confirmed with `sameResult` on the stored input plan (a hash alone
    * could collide and silently serve another corpus's manifest).
    * Staleness semantics equal Spark's own `.persist`: cached results
    * outlive in-place rewrites of the underlying files until released —
    * [[graft.Caches.releaseAll]] clears this registry too (hook below). */
  private val manifestCache = new java.util.concurrent.ConcurrentHashMap[
    (Double, String, String),
    List[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame)]]()
  graft.Caches.onReleaseAll { blocking =>
    manifestCache.values.forEach(_.foreach(_._2.unpersist(blocking)))
    manifestCache.clear()
  }
  private def cachedManifest(docs: DataFrame, threshold: Double,
      textCol: String, variant: String)(build: => DataFrame): DataFrame =
    manifestCache.synchronized {
      val key = (threshold, textCol, variant)
      val plan = docs.queryExecution.analyzed
      val entries = manifestCache.getOrDefault(key, Nil)
      entries.find(_._1.sameResult(plan)).map(_._2).getOrElse {
        val built = build
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        manifestCache.put(key, (plan, built) :: entries)
        built
      }
    }

  def dedupManifest(docs: DataFrame, threshold: Double = 0.2,
      textCol: String = "text",
      shingles: Option[DataFrame] = None): DataFrame =
    cachedManifest(docs, threshold, textCol, "exact") {
      manifestFromPairs(docs, textCol)(
        // precomputed shingle table: restrict to the exact-group
        // representatives with a semi-join (rides the table's cache)
        // instead of re-exploding their text — identical pairs either way
        reps => ngramJaccardPairs(reps, threshold, textCol,
          shingles = shingles.map(
            _.join(reps.select("doc_id"), Seq("doc_id"), "left_semi")))
          .select("d1", "d2"))
    }

  /** Re-pick each duplicate cluster's keeper by a QUALITY score instead
    * of the manifest's min-doc_id convention — the policy real curation
    * runs want: of k copies, keep the best one (longest, highest quality
    * gate score, freshest crawl), not the first-seen. Ties break to the
    * smallest doc_id so the decision replays deterministically.
    * `manifest` is a [[dedupManifest]] result (its `keeper_id` is the
    * cluster label); `scores` maps doc_id → score. One equi-join to
    * attach scores, a per-cluster window (clusters are near-cliques —
    * small — so the sort is bounded), one join back.
    *
    * Scores attach with a LEFT join and sort nulls-last: a doc missing
    * from `scores` (callers often score a filtered subset) keeps its
    * manifest row — it just can never win keeper unless the whole
    * cluster is unscored (then the doc_id tie-break decides). An inner
    * join here would silently DELETE unscored docs from the manifest,
    * breaking the every-doc-appears-once invariant. */
  def keeperByScore(manifest: DataFrame, scores: DataFrame): DataFrame = {
    val m = manifest.select(col("doc_id"), col("keeper_id").as("cluster_id"))
      .join(scores, Seq("doc_id"), "left")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(desc_nulls_last("score"), asc("doc_id"))
    val keepers = m.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("cluster_id"), col("doc_id").as("keeper_id"))
    m.join(keepers, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("keeper_id"),
        (col("doc_id") === col("keeper_id")).as("is_keeper"), col("score"))
  }

  /** The 100 TB form of [[dedupManifest]]: near-duplicate evidence comes
    * from MinHash+LSH banding instead of the exact inverted-index Jaccard
    * join, so candidate generation stays equi-join-shaped on corpora where
    * even df-capped posting lists blow up. Same manifest contract; recall
    * vs the exact manifest is measured in DedupSpec. */
  def dedupManifestApprox(docs: DataFrame, threshold: Double = 0.2,
      textCol: String = "text"): DataFrame =
    cachedManifest(docs, threshold, textCol, "lsh") {
      manifestFromPairs(docs, textCol)(
        reps => minhashNearDuplicates(reps, threshold).select("d1", "d2"))
    }

  /** Shared manifest skeleton. Exact evidence enters as star edges
    * member→group-keeper, not an fp self-join: a group of k exact copies
    * contributes k-1 edges instead of k(k-1)/2 — identical connected
    * components, linear output even for pathological duplicate groups.
    * Near evidence is computed over the fp-group REPRESENTATIVES only
    * (one doc per exact group): exact copies have identical shingle sets,
    * so representative pairs reach every member through the star edges —
    * components are unchanged, and the near path (LSH banding especially,
    * whose buckets assume exact dedup ran first) never sees a
    * million-copy boilerplate group as a million colliding signatures. */
  private def manifestFromPairs(docs: DataFrame, textCol: String)(
      nearPairsFor: DataFrame => DataFrame): DataFrame = {
    val fp = docs.select(col("doc_id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val keepers = fp.groupBy("fp").agg(min(col("doc_id")).as("keeper"))
    val exactPairs = fp.join(keepers, "fp")
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("keeper").as("d1"), col("doc_id").as("d2"))
    val reps = docs.join(
      keepers.select(col("keeper").as("doc_id")), "doc_id")
    val clusters = dedupClusters(
      exactPairs.unionByName(nearPairsFor(reps)))
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("keeper_id"))
      .withColumn("is_keeper", col("doc_id") === col("keeper_id"))
  }

  // ------------------------------------------------------------ SimHash
  /** 64-bit SimHash over token hashes: per bit, the sign of the ±1 vote sum
    * across tokens — 64 conditional sums in one aggregation pass. */
  def simhash64(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitVotes = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"v$i")
    }
    val assembled = (0 until 64).map(i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)
    toks.groupBy("doc_id")
      .agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("doc_id"), assembled.as("simhash"))
  }

  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Pigeonhole banded Hamming search over ANY 64-bit signature column
    * (text SimHash, image pHash, …): the signature splits into
    * `maxHamming + 1` chunks, so any pair within the distance bound shares
    * at least one untouched chunk — full recall AT the radius — and the
    * candidate join is equi-join-shaped on (chunk index, chunk value).
    * Candidates verify by exact `bit_count(xor)`. One shuffle on the chunk
    * key; output columns (d1, d2, hamming). */
  def hammingNearPairs(sigs: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int): DataFrame = {
    val nChunks = maxHamming + 1
    val width = (64 + nChunks - 1) / nChunks
    // rename FIRST, explode in a separate select: a generator referencing
    // an alias from its own select trips lateral-column-alias resolution
    val chunks = sigs
      .select(col(idCol).as("__id"), col(hashCol).as("__sig"))
      .select(col("__id"), col("__sig"),
        posexplode(array((0 until nChunks).map(i =>
          shiftright(col("__sig"), i * width)
            .bitwiseAND((1L << math.min(width, 64 - i * width)) - 1)): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "ck")
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("d1"), col("b.__id").as("d2"),
        hammingDistance(col("a.__sig"), col("b.__sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash near-duplicates: the signature splits into `maxHamming + 1`
    * chunks, so by pigeonhole any pair within the distance bound shares at
    * least one untouched chunk (full recall guarantee AT the hamming
    * radius), then candidates are verified by exact hamming distance.
    *
    * Scope note (measured, locked in DedupSpec): the hamming radius is a
    * reliable near-identical test only for documents long enough for the
    * signature to concentrate — with ~40 tokens each bit is a small ±1
    * vote sum and one token swap flips several bits (a J=0.976 pair of
    * 42-token docs measured at hamming 7). For short-document corpora
    * prefer [[minhashNearDuplicates]], whose banding probability depends
    * on the Jaccard itself, not the feature count. */
  def simhashNearDuplicates(docs: DataFrame, maxHamming: Int = 3,
      textCol: String = "text"): DataFrame =
    hammingNearPairs(simhash64(docs, textCol), "doc_id", "simhash", maxHamming)

  // ------------------------------------------------------------- bloom gate
  /** Exact n-gram decontamination through a Bloom-filter pre-gate — the
    * 100 TB-shaped twin of [[contamination]]'s plain semi-join.
    *
    * [[contamination]] ships the benchmark's distinct shingle hashes to
    * the semi-join as a broadcast SET — exact, but the broadcast grows
    * with the benchmark and EVERY training shingle flows into the join
    * operator. Here the benchmark side collapses further, into Bloom bits
    * (`fpp` default 1%, ~1.2 bytes/item): a codegen'd
    * [[graft.plans.BloomMightContainLong]] probe filters the training
    * shingle stream inside its scan stage, and only the survivors — true
    * hits plus the fpp tail — reach the exact verify semi-join. Because a
    * Bloom filter has no false negatives, the verified result is exactly
    * the ungated one (asserted frame-equal in DedupSpec), so the oracle
    * for this query is the same exact SQL as d13's; the gate only changes
    * WHERE the data dies (in the scan, before the shuffle).
    *
    * The filter is built distributed (`stat.bloomFilter` runs
    * treeAggregate over the benchmark partitions); only the merged bits —
    * sized by the benchmark's distinct-shingle count, never the corpus —
    * land on the driver, same bounded-driver-state discipline as the PQ
    * codebooks. */
  def bloomDecontam(train: DataFrame, benchmark: DataFrame,
      textCol: String = "text", n: Int = 5,
      fpp: Double = 0.01): DataFrame = {
    import graft.plans.BloomMightContainLong
    import org.apache.spark.sql.graftbridge.ColumnBridge

    val trainSh = persistReplacing(s"bloomTrain_n$n",
      hashedShingleSets(train, textCol, n).withColumnRenamed("g", "h"))
    val benchSh = persistReplacing(s"bloomBench_n$n",
      shingleGrams(benchmark, textCol, n)
        .select(xxhash64(col("shingle")).as("h")).distinct())
    // expectedNumItems sizes the bit array; the count is one job over the
    // (persisted) benchmark side — bounded by the eval suite, not the corpus
    val nBench = math.max(benchSh.count(), 1L)
    val bloom = benchSh.stat.bloomFilter("h", nBench, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val gate = ColumnBridge.column(
      BloomMightContainLong(ColumnBridge.expression(col("h")), bos.toByteArray))

    val sizes = trainSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val hits = trainSh.filter(gate)
      .join(benchSh, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    sizes.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= 1)
  }

  // ---------------------------------------------------------- record linkage
  /** Fuzzy record linkage over a string attribute: pairs of DISTINCT
    * attribute values within `maxDist` Levenshtein edits, each link
    * carrying both values' row multiplicities.
    *
    * The scale architecture is the point. Edit distance doesn't hash, so
    * a naive formulation is an O(rows²) theta join — at sf0.1 the part
    * table alone holds 3.1 M row-level name pairs at distance 0. Instead:
    *
    *  1. collapse rows to DISTINCT values first (`groupBy(attr)`, one
    *     shuffle). Attribute vocabularies are Heaps-bounded — they grow
    *     sublinearly in rows — so every later stage works on a frame that
    *     stays small as the fact grows 1000×;
    *  2. block the self-join on a cheap equivalence proxy (default: the
    *     value's first whitespace token) — an EQUI-join, so Catalyst
    *     plans a hash join, never BroadcastNestedLoopJoin;
    *  3. inside a block, a length-difference prefilter (|len a − len b| ≤
    *     maxDist, a necessary condition for edit distance) kills most
    *     survivors before the O(len²) Levenshtein evaluates.
    *
    * Blocking is part of the operator's CONTRACT, not an approximation
    * hack: a link is reported iff the pair shares a block AND is within
    * `maxDist` (the recall boundary — e.g. a typo in the first token — is
    * documented behavior, mirrored exactly by the oracle). `a < b`
    * canonicalizes pair order. */
  def fuzzyLinks(rows: DataFrame, attrCol: String, maxDist: Int,
      blockExpr: Column => Column = split_part(_, lit(" "), lit(1))): DataFrame = {
    val names = rows.groupBy(col(attrCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("blk", blockExpr(col("name")))
    names.as("a").join(names.as("b"),
        col("a.blk") === col("b.blk") && col("a.name") < col("b.name") &&
          abs(length(col("a.name")) - length(col("b.name"))) <= maxDist)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        levenshtein(col("a.name"), col("b.name")).as("dist"),
        col("a.n_rows").as("rows_a"), col("b.n_rows").as("rows_b"))
      .filter(col("dist") <= maxDist)
  }
}
