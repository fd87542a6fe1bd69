package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Query entry points for the training-data pipeline operators (text
  * analysis, dedup, similarity search) over the `documents` and
  * `embeddings` tables. Thresholds are pinned here so the driver's oracle
  * and the bench run the same plans. */
object TrainingData {

  /** Token/punctuation/stopword counts + composite quality score. */
  def t01TextStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.punctCount(col("text")).as("n_punct"),
        TextAnalysis.stopwordCount(col("text")).as("n_stopwords"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** Language-ID confusion: labeled lang × predicted lang counts. */
  def t02LangIdConfusion(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("lang").as("actual"),
        TextAnalysis.predictedLang(col("text")).as("predicted"))
      .groupBy("actual", "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("actual", "predicted")

  /** Normalized-content fingerprint per document. */
  def t03Fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Exact corpus-wide top-50 tokens by frequency (ties broken by token) —
    * the vocabulary profile boilerplate/stopword discovery reads. */
  def t06TopTokens(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))
      .limit(50)

  /** Deterministic hash-based train/val/test assignment per document:
    * a pure function of doc_id (md5 bucket), so held-out membership is
    * stable as the corpus grows. */
  def t04DocSplit(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        graft.operators.Sampling.hashBucket(col("doc_id")).as("bucket"),
        graft.operators.Sampling.split(col("doc_id")).as("split"))
      .orderBy("doc_id")

  /** Per-language document-length quartiles (exact percentile — dyadic
    * quantiles only, where linear interpolation is bit-exact across
    * engines) plus counts: the length profile quality filters cut on. */
  def t05LengthQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(expr("percentile(n_chars, 0.25)"), 4).as("p25"),
        round(expr("percentile(n_chars, 0.5)"), 4).as("p50"),
        round(expr("percentile(n_chars, 0.75)"), 4).as("p75"))
      .orderBy("lang")

  /** Gopher-style repetition metrics per document (Rae et al. 2021 §A1.1):
    * distinct-token ratio, most-frequent-token share, duplicate-2-gram
    * fraction — the signals that catch templated/looping text a length or
    * stopword filter misses.
    *
    * Shuffle-free form: per-document token frequencies need no corpus-wide
    * explode+groupBy (which shuffles |corpus tokens| rows — the first
    * version of this query spent 20 s there at sf0.1); sorting the token
    * array puts equal tokens adjacent, so ONE linear fold computes the max
    * run length (= max token frequency) and the run-boundary count
    * (= distinct tokens). O(n log n) per document, embarrassingly parallel,
    * zero exchanges before the final sort. Documents with no tokens are
    * dropped (same as the inner-join semantics of the groupBy form and the
    * oracle). */
  def t07Repetition(spark: SparkSession, dir: String): DataFrame = {
    val sorted = array_sort(TextAnalysis.tokens(col("text")))
    val acc0 = struct(lit(null).cast("string").as("prev"), lit(0).as("run"),
      lit(0).as("mx"), lit(0).as("u"), lit(0).as("n"))
    val folded = aggregate(sorted, acc0,
      (a, x) => {
        // null prev (first token) compares null === x -> null -> otherwise
        val run1 = when(a.getField("prev") === x, a.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run1.as("run"),
          greatest(a.getField("mx"), run1).as("mx"),
          when(a.getField("prev") === x, a.getField("u"))
            .otherwise(a.getField("u") + 1).as("u"),
          (a.getField("n") + 1).as("n"))
      },
      a => struct(a.getField("n").as("n"), a.getField("u").as("u"),
        a.getField("mx").as("mx")))
    // inline(array(...)) is a Generate node — a CollapseProject BARRIER.
    // Referencing folded's fields from a plain projection would re-inline
    // (and re-evaluate) the whole sort+fold once PER FIELD ACCESS; through
    // the Generate the fold runs exactly once per row.
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.dupBigramFraction(col("text")).as("dup_2gram_frac"),
        inline(array(folded)))
      .filter(col("n") > 0)
      .select(col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        round(col("u").cast("double") / col("n"), 4).as("distinct_ratio"),
        round(col("mx").cast("double") / col("n"), 4).as("top_token_frac"),
        col("dup_2gram_frac"))
      .orderBy("doc_id")
  }

  /** PII-style redaction over the event payloads (the JSON props column is
    * the only testdata surface with digit content): the email → IP → number
    * cascade plus per-category counts, all native regexp expressions in one
    * scan. Counts are taken at each cascade stage so categories never
    * double-count (an IP's digit runs are gone before numbers are
    * counted). */
  def t08PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val afterEmail = regexp_replace(col("props"), TextAnalysis.EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, TextAnalysis.Ipv4Re, "<IP>")
    Tables(spark, dir, "events")
      .select(col("event_id"),
        TextAnalysis.redactPii(col("props")).as("redacted"),
        regexp_count(col("props"), lit(TextAnalysis.EmailRe)).as("n_email"),
        regexp_count(afterEmail, lit(TextAnalysis.Ipv4Re)).as("n_ip"),
        regexp_count(afterIp, lit(TextAnalysis.NumberRe)).as("n_num"))
      .orderBy("event_id")
  }

  /** Whitespace vs BPE-ish token budgets per document: the subword count is
    * what an LLM's context budget actually consumes; the ratio profiles how
    * symbol/number-heavy a corpus slice is. One projection, no shuffle. */
  def t10BpeishTokens(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_ws"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_bpeish"))
      .filter(col("n_ws") > 0)
      .select(col("doc_id"), col("n_ws"), col("n_bpeish"),
        round(col("n_bpeish").cast("double") / col("n_ws"), 4).as("subword_ratio"))
      .orderBy("doc_id")

  /** Token-offset sharding for training: per language, documents in stable
    * doc_id order are assigned a running token offset and a 2000-token
    * shard id — the deterministic corpus → fixed-token-budget shard map a
    * packing/tokenization pipeline consumes. Runs on the two-phase
    * distributed prefix scan ([[Prefix.cumSumTwoPhase]]): language
    * cardinality is tiny, so the per-language window form would serialize
    * each language through one task at corpus scale. */
  def t09TokenShards(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    Prefix.cumSumTwoPhase(d, Seq("lang"), Seq("doc_id"), "n_tokens")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("tok_offset"),
        expr("(cum - n_tokens) div 2000").as("shard"))
      .orderBy("doc_id")
  }

  /** Top-5 TF-IDF terms per document — the classic salience profile a
    * keyword extractor or boilerplate detector reads. One explode+groupBy
    * shuffle builds term frequencies; document frequency derives from the
    * SAME cached frame (no second pass over the text); the vocabulary-sized
    * df side joins back on `token` and the corpus count broadcasts as a
    * 1-row frame. Ranking compares the ROUNDED score (ties broken by
    * token), so order is stable across engines' last-ulp `ln` differences. */
  def t11TfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val tf = graft.Caches.persistReplacing("tfidf_tf",
      docs.select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("tfidf"), asc("token"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 5)
      .select("doc_id", "rank", "token", "tf", "df", "tfidf")
      .orderBy("doc_id", "rank")
  }

  /** Corpus-bigram language-model score per document: add-one-smoothed
    * bigram log-probability ln((C(w1,w2)+1)/(C(w1·)+V)) averaged over the
    * document — the KenLM-style fluency filter that separates natural text
    * from token soup, built from the corpus itself (no external model).
    * C(w1·) counts bigrams starting with w1; V is the corpus vocabulary.
    *
    * One explode builds the bigram stream (cached — it feeds the bigram
    * counts, the unigram counts, the vocabulary, and the scoring join);
    * the per-bigram log-probs are 4-dp-quantized and summed as DECIMAL so
    * the average is order-independent and hash-matches the oracle. */
  /** The (doc_id, w1, w2) adjacent-bigram stream, cached under ONE key so
    * t12 (LM scoring) and t28 (PMI collocations) share the explode. */
  private def bigramStream(docs: DataFrame): DataFrame =
    graft.Caches.persistReplacing("lm_bigrams",
      docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("t")) - 1),
            i => struct(element_at(col("t"), i).as("w1"),
              element_at(col("t"), i + 1).as("w2")))).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2")))

  def t12LmBigramScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val bi = bigramStream(docs)
    val big = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uni = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = bi.select(col("w1").as("w"))
      .union(bi.select(col("w2").as("w")))
      .agg(countDistinct("w").as("v"))
    bi.join(big, Seq("w1", "w2")).join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("lp",
        round(log((col("c12") + 1).cast("double") / (col("c1") + col("v"))), 4)
          .cast("decimal(18,4)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        // a = -10^4·Σlp as an exact integer (lp ≤ 0 always: the smoothed
        // probability is < 1). The average then rounds HALF-AWAY-FROM-ZERO
        // in pure integer arithmetic: round(sum/n,4) as a DOUBLE division
        // put three sf0.1 docs exactly on the .00005 tie, where Spark's
        // BigDecimal-on-double and DuckDB's round disagree by 1e-4 — the
        // q33 hazard again. Integers agree by construction; the final
        // ÷10⁴ is one IEEE division of the same operands in both engines.
        (sum(col("lp")) * -10000).cast("long").as("a"))
      .select(col("doc_id"), col("n_bigrams"),
        (-expr("(a * 2 + n_bigrams) div (2 * n_bigrams)").cast("double")
          / 10000.0).as("avg_logp"))
      .orderBy("doc_id")
  }

  /** PMI collocation mining — the top strongly-associated adjacent word
    * pairs (word2vec's phrase-detection preprocessing, collocation
    * extraction in corpus linguistics): PMI = ln(p(w1,w2)/(p1(w1)p2(w2)))
    * over the positional bigram distribution, min-support 5 to kill
    * one-off pairs. Shares the cached bigram explode with t12; the three
    * count frames are grain aggregates of it, counts are cast to DOUBLE
    * before multiplying so the ratio can't overflow at corpus scale, and
    * the ranking orders on the 4-dp-ROUNDED score with a (w1, w2)
    * tie-break so top-50 is engine-stable. */
  def t28PmiCollocations(spark: SparkSession, dir: String): DataFrame =
    pmiCollocations(Tables(spark, dir, "documents"))

  /** See [[t28PmiCollocations]]; `minSupport`/`topK` are the two policy
    * dials (support floor kills one-off pairs; k bounds the report). */
  def pmiCollocations(docs: DataFrame, minSupport: Long = 5,
      topK: Int = 50): DataFrame = {
    val bi = bigramStream(docs)
    val big = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val p1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val p2 = bi.groupBy("w2").agg(count(lit(1)).as("c2"))
    val n = bi.agg(count(lit(1)).as("n"))
    big.filter(col("c12") >= minSupport)
      .join(p1, "w1").join(p2, "w2")
      .crossJoin(broadcast(n))
      .withColumn("pmi",
        round(log(col("c12").cast("double") * col("n")
          / (col("c1").cast("double") * col("c2").cast("double"))), 4))
      .select(col("w1"), col("w2"), col("c12"), col("pmi"))
      .orderBy(desc("pmi"), asc("w1"), asc("w2"))
      .limit(topK)
  }

  /** Context-length chunking: overlapping 64-token windows (8-token
    * overlap) per document, fingerprinted for downstream packing/dedup. */
  def t13Chunks(spark: SparkSession, dir: String): DataFrame =
    graft.text.Chunking.chunkTokens(
      Tables(spark, dir, "documents"), size = 64, overlap = 8)
      .orderBy("doc_id", "chunk")

  /** Source-mix curation report: per (source, lang) document and token
    * tallies, their corpus shares, and the downsampling rate that would
    * equalize every group to the smallest group's token budget — the table
    * a training-mix rebalancer executes. One grain shuffle; the totals join
    * back as a broadcast 1-row frame. */
  def t14SourceMix(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables(spark, dir, "documents")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"))
    val tot = g.agg(sum("n_docs").as("tot_docs"),
      sum("n_tokens").as("tot_tokens"), min("n_tokens").as("min_tokens"))
    g.crossJoin(broadcast(tot))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_docs").cast("double") / col("tot_docs"), 4).as("doc_share"),
        round(col("n_tokens").cast("double") / col("tot_tokens"), 4).as("token_share"),
        round(col("min_tokens").cast("double") / col("n_tokens"), 4).as("uniform_rate"))
      .orderBy("source", "lang")
  }

  /** The whole curation funnel as one oracle-checkable row: corpus size,
    * survivors of the quality gate, of the dedup manifest, of
    * decontamination, and the chunk count the survivors would emit —
    * the same stage composition as [[graft.etl.CurationPipeline]], counted
    * lazily without the shard write. The strongest single check in the
    * suite: DuckDB must reproduce four chained operators to match it. */
  def t15CurationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables(spark, dir, "documents")
    val corpus = all.filter(col("doc_id") % 17 =!= 0)
    val benchmark = all.filter(col("doc_id") % 17 === 0)
    // every stage feeds several branches (the next stage, its own funnel
    // counter, and for `quality` the dedup manifest) — persist each once so
    // the funnel costs ONE corpus scan per stage; the naive lazy form
    // re-runs the regex-heavy quality gate in four separate count branches
    // (4–5 full corpus scans at 100 TB where one suffices)
    val quality = graft.Caches.persistReplacing("t15Quality", corpus
      .filter(TextAnalysis.qualityScore(col("text")) >= 0.3))
    // ONE shingle table over the whole documents set (train + benchmark),
    // semi-join-filtered per stage — the dedup manifest, the contamination
    // train side, and the benchmark side all ride this single
    // explode+set-dedup instead of re-shingling their slice of the corpus
    val shingles = Dedup.shingleTable(all)
    val keepers = Dedup.dedupManifest(quality, threshold = 0.2,
        shingles = Some(shingles.join(
          quality.select("doc_id"), Seq("doc_id"), "left_semi")))
      .filter(col("is_keeper")).select("doc_id")
    val deduped = graft.Caches.persistReplacing("t15Deduped",
      quality.join(keepers, "doc_id"))
    val clean = graft.Caches.persistReplacing("t15Clean", deduped.join(
      Dedup.contamination(deduped, benchmark, threshold = 0.5,
        trainShingles = Some(shingles.join(
          deduped.select("doc_id"), Seq("doc_id"), "left_semi")),
        benchShingles = Some(shingles.join(
          benchmark.select("doc_id"), Seq("doc_id"), "left_semi")))
        .filter(col("contaminated")).select("doc_id"),
      Seq("doc_id"), "left_anti"))
    val chunkCounts = clean.select(
      graft.text.Chunking.chunkCount(
        TextAnalysis.tokenCount(col("text")), size = 64, overlap = 8).as("nc"))
    corpus.agg(count(lit(1)).as("docs"))
      .crossJoin(quality.agg(count(lit(1)).as("after_quality")))
      .crossJoin(deduped.agg(count(lit(1)).as("after_dedup")))
      .crossJoin(clean.agg(count(lit(1)).as("after_decontam")))
      .crossJoin(chunkCounts.agg(sum(col("nc").cast("long")).as("chunks")))
  }

  /** Chunk-level duplicate profile: window fingerprints repeated across
    * the corpus — the boilerplate signal document-level dedup misses (two
    * different pages sharing one copied section collide here, not in d01).
    * Top-50 most-repeated chunks with their document spread. */
  def t16ChunkDups(spark: SparkSession, dir: String): DataFrame =
    graft.text.Chunking.chunkTokens(
      Tables(spark, dir, "documents"), size = 64, overlap = 8)
      .groupBy("fp")
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_chunks") > 1)
      .orderBy(desc("n_chunks"), asc("fp"))
      .limit(50)

  /** EXECUTE t14's rebalance plan: deterministically downsample every
    * (source, lang) group to the smallest group's token budget via the
    * engine-portable md5 micro-bucket — doc kept iff its bucket falls
    * under the group's cut, so membership is a pure function of doc_id
    * (reproducible anywhere, stable as the corpus grows; a seeded rand()
    * sample is neither). Cuts are exact integer arithmetic
    * (min_tokens·10⁶ div grp_tokens), no float rounding divergence.
    * Two passes over a slim 4-column projection (group budgets need the
    * global min before per-row decisions — inherent); the per-group rate
    * frame broadcasts. Emits per-group kept counts vs target rate. */
  def t18RebalanceSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("b", Sampling.fineHashBucket(col("doc_id")))
    val g = d.groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("grp_tokens"))
    val m = g.agg(min("grp_tokens").as("min_tokens"))
    val r = g.crossJoin(broadcast(m))
      .withColumn("cut", expr("min_tokens * 1000000 div grp_tokens"))
    d.join(broadcast(r), Seq("source", "lang"))
      .groupBy("source", "lang", "n_docs", "grp_tokens", "cut")
      .agg(sum(when(col("b") < col("cut"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("source"), col("lang"), col("n_docs"), col("grp_tokens"),
        col("n_kept"),
        round(col("cut").cast("double") / 1000000, 4).as("target_rate"),
        round(col("n_kept").cast("double") / col("n_docs"), 4).as("realized_rate"))
      .orderBy("source", "lang")
  }

  /** Gopher-style quality-rule flags per document (Rae et al. 2021 §A1.1,
    * the word-level subset — this corpus has no line structure): word
    * count in [50, 100000], mean word length in [3, 10], ≥80% of words
    * containing a letter, ≥2 English stopwords, and the conjunction as the
    * `keep` decision a curation gate executes. One projection per document,
    * no shuffle — the filter shape that runs unchanged over 100 TB. The
    * alpha and stopword rules are English-centric by design (zh documents
    * fail them), which is exactly how these filters behave in production
    * English-corpus pipelines. */
  def t17QualityRules(spark: SparkSession, dir: String): DataFrame = {
    val okLength = col("n_words") >= 50 && col("n_words") <= 100000
    val okMeanLen = col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0
    val okAlpha = col("frac_alpha_words") >= 0.8
    val okStop = col("n_stopwords") >= 2
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_words"),
        TextAnalysis.meanWordLen(col("text")).as("mean_word_len"),
        TextAnalysis.alphaWordFraction(col("text")).as("frac_alpha_words"),
        TextAnalysis.stopwordCount(col("text")).as("n_stopwords"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("lang"), col("n_words"),
        col("mean_word_len"), col("frac_alpha_words"), col("n_stopwords"),
        okLength.as("ok_length"), okMeanLen.as("ok_mean_word_len"),
        okAlpha.as("ok_alpha"), okStop.as("ok_stop"),
        (okLength && okMeanLen && okAlpha && okStop).as("keep"))
      .orderBy("doc_id")
  }

  /** Usable-token inventory: per (source, lang), total vs quality-gated
    * documents and tokens — the capacity-planning table that answers "how
    * many trainable tokens does each slice actually hold" before any
    * mixing math runs (t14/t18/t22 budgets assume all tokens are usable;
    * this is the corrected numerator). Gate = t17's Gopher conjunction,
    * recomputed inline as a per-row projection — one scan, one grain
    * shuffle, no joins. */
  def t25TokenInventory(spark: SparkSession, dir: String): DataFrame = {
    val okLength = col("n_words") >= 50 && col("n_words") <= 100000
    val okMeanLen = col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0
    val okAlpha = col("frac_alpha_words") >= 0.8
    val okStop = col("n_stopwords") >= 2
    Tables(spark, dir, "documents")
      .select(col("source"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_words"),
        TextAnalysis.meanWordLen(col("text")).as("mean_word_len"),
        TextAnalysis.alphaWordFraction(col("text")).as("frac_alpha_words"),
        TextAnalysis.stopwordCount(col("text")).as("n_stopwords"))
      .filter(col("n_words") > 0)
      .withColumn("keep", okLength && okMeanLen && okAlpha && okStop)
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        sum(col("n_words").cast("long")).as("tokens_total"),
        sum(when(col("keep"), col("n_words").cast("long")).otherwise(0L))
          .as("tokens_usable"))
      .select(col("source"), col("lang"), col("n_docs"), col("n_keep"),
        col("tokens_total"), col("tokens_usable"),
        round(col("tokens_usable").cast("double") / col("tokens_total"), 4)
          .as("usable_rate"))
      .orderBy("source", "lang")
  }

  /** Declarative data-quality gate over the corpus: seven expectations
    * (key uniqueness, completeness, accepted languages, metadata/content
    * consistency, bounds, mix share, row floor) evaluated in ONE
    * aggregate pass and reported one row per check. The english_share
    * check is deliberately thresholded above the corpus's real share so
    * the FAILING branch of the report is exercised (and oracle-pinned)
    * too. See [[graft.etl.Expectations]]. */
  def t26Expectations(spark: SparkSession, dir: String): DataFrame = {
    import graft.etl.Expectations._
    run(Tables(spark, dir, "documents"), Seq(
      uniqueKey("doc_id_unique", col("doc_id")),
      complete("text_complete", col("text")),
      inSet("lang_accepted", col("lang"), Seq("de", "en", "es", "fr", "zh")),
      satisfies("chars_match_text", col("n_chars") === length(col("text"))),
      inRange("chars_in_range", col("n_chars"), 1, 10000),
      satisfies("english_share", col("lang") === "en", threshold = 0.5),
      atLeastRows("min_rows", 100)))
      .orderBy("check")
  }

  /** The same expectation machinery per language slice — the report that
    * catches "passes globally, broken in one slice" (the usual failure
    * mode of multilingual corpus refreshes: a tail language's ingest
    * silently degrades while the corpus-wide averages stay green). The
    * doc-floor and long-doc-share checks genuinely differ per language
    * here, so both report branches appear. */
  def t27ExpectationsByLang(spark: SparkSession, dir: String): DataFrame = {
    import graft.etl.Expectations._
    runGrouped(Tables(spark, dir, "documents"), Seq("lang"), Seq(
      complete("text_complete", col("text")),
      satisfies("chars_match_text", col("n_chars") === length(col("text"))),
      inRange("chars_in_range", col("n_chars"), 1, 10000),
      atLeastRows("doc_floor_100", 100),
      satisfies("long_doc_share", col("n_chars") >= 100, threshold = 0.8)))
      .orderBy("lang", "check")
  }

  /** Split-leakage audit: near-duplicate pairs (d02's exact n-gram
    * Jaccard evidence — exact copies score 1.0 and are included) joined
    * against the t04 hash split, counted per unordered split pair. Any
    * row with `leaks = true` is train/eval contamination that survives
    * doc-level dedup-then-split done in the wrong order — THE reason
    * dedup must run before splitting, and the audit that proves whether
    * it did. Pair evidence is |near-dup pairs| rows (tiny next to the
    * corpus); the split frame is a pure hash projection, so the join
    * costs two slim equi-joins. */
  def t29SplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.2)
      .select(col("d1"), col("d2"))
    val splits = docs.select(col("doc_id"),
      graft.operators.Sampling.split(col("doc_id")).as("split"))
    pairs
      .join(splits.select(col("doc_id").as("d1"), col("split").as("s1")), "d1")
      .join(splits.select(col("doc_id").as("d2"), col("split").as("s2")), "d2")
      .select(least(col("s1"), col("s2")).as("split_a"),
        greatest(col("s1"), col("s2")).as("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaks", col("split_a") =!= col("split_b"))
      .orderBy("split_a", "split_b")
  }

  /** Quality-aware dedup manifest: the d08 clusters with each keeper
    * RE-PICKED as the cluster's longest document (n_chars score, doc_id
    * tie-break) — "keep the best copy", the policy production curation
    * uses where d08's min-id convention keeps whichever copy crawled
    * first. Shares the cached manifest, so the marginal cost is one
    * score join + a bounded per-cluster window. */
  def t30QualityDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    Dedup.keeperByScore(
      Dedup.dedupManifest(docs),
      docs.select(col("doc_id"), col("n_chars").cast("long").as("score")))
      .orderBy("doc_id")
  }

  /** Exact duplicate groups (hash-groupBy dedup). */
  def d01ExactDupGroups(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(Tables(spark, dir, "documents"))
      .orderBy("fp")

  /** Exact 3-gram Jaccard near-duplicate pairs (inverted-index join). */
  def d02NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables(spark, dir, "documents"), threshold = 0.2)
      .orderBy("d1", "d2")

  /** Margin above which MinHash+LSH recall is effectively CERTAIN per
    * pair, so a deterministic contract may claim it on ANY regenerated
    * corpus: at J ≥ 0.6 the banding miss probability is
    * (1 − J²)³² ≈ 6e-7 and the 64-hash estimate filter's miss
    * (est < 0.2 given mean 0.6·64 = 38.4, σ ≈ 3.9) is a 6.5σ tail —
    * joint per-pair miss < 1e-6, negligible across thousands of pairs.
    * Below it, banding recall at the J = 0.2 threshold is only ~0.73 and
    * the estimate has σ ≈ 0.06, so near-threshold pairs are legitimately
    * probabilistic and must not be pinned pair-for-pair. */
  private val LshCertainJaccard = 0.6

  /** Mid margin for the aggregate recall claim: at J ≥ 0.35 the joint
    * catch probability is ≈ 0.98 per pair (banding 0.985 × estimate
    * 0.994), so ≥ 85% recall over that subset holds with overwhelming
    * probability for any subset size — the d06 recall_85pct discipline. */
  private val LshMidJaccard = 0.35

  /** MinHash+LSH contract row, VERDICT form: one row per EXACT Jaccard
    * pair (the set DuckDB recomputes) with three always-claimable flags —
    * `(d1, d2, caught_or_marginal, recall_85_mid, no_spurious_explosion)`.
    * Per pair, `caught_or_marginal` claims the LSH path recovered it OR
    * its Jaccard sits below [[LshCertainJaccard]] (where banding recall
    * is probabilistic by design — pinning those pair-for-pair would make
    * a regenerated near-threshold corpus a false alarm, the round-7
    * fragility this form replaces). The two constant columns carry the
    * aggregate claims that keep the marginal band honest: ≥ 85% recall
    * over pairs with J ≥ [[LshMidJaccard]], and the spurious-pair count
    * (LSH pairs outside the exact set — estimate noise admits a few just
    * under threshold) bounded by n_exact + 20, which a broken estimate
    * filter (admitting every banding candidate) blows past immediately.
    * All margin arithmetic is Spark-side; the oracle recomputes only the
    * exact pair set and emits literal TRUEs, so no cross-engine float
    * threshold exists. Raw pair set ships as bench-only `d03r`. */
  def d03MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.2)
    val lsh = Dedup.minhashNearDuplicates(docs, threshold = 0.2).select("d1", "d2")
    val flagged = exact
      .join(lsh.withColumn("in_lsh", lit(true)), Seq("d1", "d2"), "left")
      .select(col("d1"), col("d2"), col("jaccard"),
        coalesce(col("in_lsh"), lit(false)).as("in_lsh"))
    val scalars = flagged
      .agg(
        // both sums are NULL when no pair clears the mid margin — the
        // claim is then vacuously TRUE, the d04 fp_full_recall precedent
        coalesce(
          sum(when(col("jaccard") >= LshMidJaccard,
            col("in_lsh").cast("long"))).cast("double") >=
            sum(when(col("jaccard") >= LshMidJaccard, lit(1L))) * 0.85,
          lit(true)).as("recall_85_mid"),
        count(lit(1)).as("__n_exact"))
      .crossJoin(lsh.join(exact.select("d1", "d2"), Seq("d1", "d2"), "left_anti")
        .agg(count(lit(1)).as("__n_spurious")))
      .select(col("recall_85_mid"),
        (col("__n_spurious") <= col("__n_exact") + 20)
          .as("no_spurious_explosion"))
    flagged
      .crossJoin(broadcast(scalars))
      .select(col("d1"), col("d2"),
        (col("in_lsh") || col("jaccard") < LshCertainJaccard)
          .as("caught_or_marginal"),
        col("recall_85_mid"), col("no_spurious_explosion"))
      .orderBy("d1", "d2")
  }

  /** Raw MinHash+LSH pair set (bench + golden entry; the d03 contract row
    * is the oracle-checkable verdict form above). */
  def d03RawPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDuplicates(Tables(spark, dir, "documents"), threshold = 0.2)
      .orderBy("d1", "d2")

  /** Audit row for d03, count form: `(n_exact, certain_full_recall,
    * recall_85_mid, no_spurious_explosion)`. DuckDB recomputes the exact
    * pair count; the three flags are the same margin-aware claims the
    * per-pair d03 carries (full recall is asserted only where it is
    * deterministic — pairs at J ≥ [[LshCertainJaccard]]; the marginal
    * band gets the 85%-over-mid aggregate plus the spurious-count bound).
    * The round-7 form claimed n_lsh = n_both = n_exact exactly, which a
    * regenerated corpus with one near-threshold pair would fail as a
    * false alarm — the same fragility ADVICE r7 flagged on d03. */
  def d03aLshRecall(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.2)
    val lsh = Dedup.minhashNearDuplicates(docs, threshold = 0.2).select("d1", "d2")
    val flagged = exact
      .join(lsh.withColumn("in_lsh", lit(true)), Seq("d1", "d2"), "left")
      .select(col("jaccard"), coalesce(col("in_lsh"), lit(false)).as("in_lsh"))
    flagged.agg(
      count(lit(1)).as("n_exact"),
      coalesce(min(when(col("jaccard") >= LshCertainJaccard, col("in_lsh"))),
        lit(true)).as("certain_full_recall"),
      coalesce(
        sum(when(col("jaccard") >= LshMidJaccard,
          col("in_lsh").cast("long"))).cast("double") >=
          sum(when(col("jaccard") >= LshMidJaccard, lit(1L))) * 0.85,
        lit(true)).as("recall_85_mid"))
      .crossJoin(lsh.join(exact.select("d1", "d2"), Seq("d1", "d2"), "left_anti")
        .agg(count(lit(1)).as("__n_spurious")))
      .select(col("n_exact"), col("certain_full_recall"), col("recall_85_mid"),
        (col("__n_spurious") <= col("n_exact") + 20)
          .as("no_spurious_explosion"))
  }

  /** SimHash contract row, VERDICT form: one hash-checkable row —
    * `(n_fp_pairs, fp_full_recall, hamming_in_range, pairs_canonical)`.
    * Equal content fingerprints (lower-case + whitespace-collapse) mean
    * identical token streams, bit-equal SimHashes, hamming 0, and
    * CERTAIN recovery by the pigeonhole banding — the oracle recomputes
    * the fp-pair count in DuckDB and claims full recall (vacuously true
    * on a generation without exact dups, which is why the row also
    * carries claims that always bite: every emitted pair's verified
    * hamming within [0, maxHamming] and canonical d1 < d2 form).
    * Near-pairs beyond the fingerprint relation carry no recall
    * guarantee (see [[Dedup.simhashNearDuplicates]]) and ship as the
    * bench-only `d04r` raw entry pinned by its golden. */
  def d04Simhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val fp = docs.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    val exactPairs = fp.as("a")
      .join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
    val sim = Dedup.simhashNearDuplicates(docs, maxHamming = 6)
    exactPairs.agg(count(lit(1)).as("n_fp_pairs"))
      .crossJoin(broadcast(exactPairs
        .join(sim.select("d1", "d2"), Seq("d1", "d2")).agg(count(lit(1)).as("nr"))))
      .crossJoin(broadcast(sim.agg(
        coalesce(min(col("hamming").between(0, 6)), lit(true))
          .as("hamming_in_range"),
        coalesce(min(col("d1") < col("d2")), lit(true))
          .as("pairs_canonical"))))
      .select(col("n_fp_pairs"),
        (col("nr") === col("n_fp_pairs")).as("fp_full_recall"),
        col("hamming_in_range"), col("pairs_canonical"))
  }

  /** Raw SimHash pair set (bench + golden entry; the d04 contract row is
    * the oracle-checkable verdict form above). */
  def d04RawPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDuplicates(Tables(spark, dir, "documents"), maxHamming = 6)
      .orderBy("d1", "d2")

  /** Audit row for d04: SimHash recall of the EXACT-duplicate pairs.
    * Two documents with equal content fingerprints (d01's normalization:
    * lower-case + whitespace-collapse) tokenize identically — `tokens` is
    * itself lower-cased and whitespace-split — so their SimHashes are
    * bit-equal, hamming 0, and the pigeonhole banding recovers them with
    * certainty. The oracle recomputes the exact-pair count in DuckDB and
    * claims n_recovered = n_exact; a dropped pair (a banding or
    * verification bug) breaks the row hash. Recall-at-radius only —
    * near-pairs beyond the fingerprint relation have no such guarantee
    * (see the scope note on [[Dedup.simhashNearDuplicates]]). */
  def d04aSimhashRecall(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val fp = docs.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    val exactPairs = fp.as("a")
      .join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
    val sim = Dedup.simhashNearDuplicates(docs, maxHamming = 6)
      .select("d1", "d2")
    exactPairs.agg(count(lit(1)).as("n_exact"))
      .crossJoin(exactPairs.join(sim, Seq("d1", "d2"), "left_semi")
        .agg(count(lit(1)).as("n_recovered")))
  }

  /** Winnowing contract row, VERDICT form: one hash-checkable row —
    * `(n_exact, recall_85pct, scores_in_range, pairs_canonical)`. The
    * oracle recomputes the exact-Jaccard pair count and claims all three
    * booleans TRUE: recall of the exact pairs ≥ 85% (the margin rationale
    * lives on [[d06aWinnowRecall]] — winnowing only GUARANTEES shared
    * fingerprints for ≥ k+w−1-char contiguous runs, so full recall is
    * corpus-dependent and the bar sits under the observed 93.8–100%
    * generation band), every emitted sampled-Jaccard within [minJaccard,
    * 1], and every pair in canonical d1 < d2 form. The raw pair set
    * (xxhash64 fingerprints, no SQL form) ships as the bench-only `d06r`
    * entry pinned by its golden. */
  def d06Winnowing(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.2).select("d1", "d2")
    val win = Dedup.winnowingNearDuplicates(docs, minJaccard = 0.2)
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(exact.join(win.select("d1", "d2"), Seq("d1", "d2"))
        .agg(count(lit(1)).as("nr"))))
      .crossJoin(broadcast(win.agg(
        coalesce(min(col("jaccard").between(0.2, 1.0)), lit(true))
          .as("scores_in_range"),
        coalesce(min(col("d1") < col("d2")), lit(true))
          .as("pairs_canonical"))))
      .select(col("n_exact"),
        (col("nr") * 20 >= col("n_exact") * 17).as("recall_85pct"),
        col("scores_in_range"), col("pairs_canonical"))
  }

  /** Raw winnowing pair set (bench + golden entry; the d06 contract row
    * is the oracle-checkable verdict form above). */
  def d06RawPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowingNearDuplicates(Tables(spark, dir, "documents"), minJaccard = 0.2)
      .orderBy("d1", "d2")

  /** Audit row for d06: winnowing's recall of the exact Jaccard pairs,
    * pinned as a ≥85% verdict. Winnowing GUARANTEES a shared fingerprint
    * only for contiguous matching runs of ≥ k+w−1 characters; a J≥0.2
    * pair whose overlap is many scattered short n-grams can legitimately
    * carry no common fingerprint, so full recall is corpus-dependent —
    * the bar is set from the algorithm's behavior margin, not one
    * measured corpus: generations have landed 93.8–100%, and the driver
    * regenerates parquet between rounds, so pinning 90% (r5) left the
    * verdict one unlucky regeneration from a false alarm. 85% still
    * catches any real collapse (a winnowing bug drops recall far below
    * the guarantee regime, not a few points). The oracle recomputes
    * n_exact and claims the verdict true. Recall only: winnowing
    * legitimately flags extra pairs whose sampled-fingerprint Jaccard
    * clears the bar while full 3-gram Jaccard doesn't, so precision is
    * not claimed. */
  def d06aWinnowRecall(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.2).select("d1", "d2")
    val win = Dedup.winnowingNearDuplicates(docs, minJaccard = 0.2).select("d1", "d2")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(exact.join(win, Seq("d1", "d2"))
        .agg(count(lit(1)).as("n_recovered")))
      .select(col("n_exact"),
        (col("n_recovered") * 20 >= col("n_exact") * 17).as("recall_85pct"))
  }

  /** Duplicate-cluster resolution over the exact Jaccard pairs: connected
    * components labeled by min doc_id (= the canonical keeper). */
  def d07DedupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupClusters(
      Dedup.ngramJaccardPairs(Tables(spark, dir, "documents"), threshold = 0.2))
      .orderBy("doc_id")

  /** d07's components via the O(log n) large-star/small-star rewrite
    * ([[Dedup.dedupClustersLogStar]]) — same answer against the same
    * recursive-CTE oracle, with a round count independent of component
    * diameter (the chain-shaped-graph insurance d07's scaladoc cites). */
  def d19ClustersLogStar(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupClustersLogStar(
      Dedup.ngramJaccardPairs(Tables(spark, dir, "documents"), threshold = 0.2))
      .orderBy("doc_id")

  /** End-to-end dedup manifest: exact + near-dup evidence resolved to one
    * keeper per document — the corpus keep/drop decision. */
  def d08DedupManifest(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupManifest(Tables(spark, dir, "documents"), threshold = 0.2)
      .orderBy("doc_id")

  /** Scale-path dedup manifest contract row, VERDICT form: the
    * LSH-evidence manifest per document, annotated with its agreement
    * against the exact manifest DuckDB recomputes via recursive CTE —
    * `(doc_id, keeper_id, is_keeper, agrees_exact)` where `keeper_id` /
    * `is_keeper` come from the APPROXIMATE path. The oracle produces the
    * exact manifest and claims `agrees_exact = TRUE` everywhere, so a
    * document the LSH path assigns to a different cluster fails BOTH the
    * keeper_id value and the flag — the per-document strengthening of the
    * d10a count audit. The raw approximate manifest ships as the
    * bench-only `d10r` entry pinned by its golden. */
  def d10DedupManifestApprox(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val approx = Dedup.dedupManifestApprox(docs, threshold = 0.2)
    val exact = Dedup.dedupManifest(docs, threshold = 0.2)
      .select(col("doc_id"), col("keeper_id").as("k_exact"))
    approx.join(exact, "doc_id")
      .select(col("doc_id"), col("keeper_id"), col("is_keeper"),
        (col("keeper_id") === col("k_exact")).as("agrees_exact"))
      .orderBy("doc_id")
  }

  /** Raw LSH-evidence manifest (bench + golden entry; the d10 contract
    * row is the oracle-checkable verdict form above). */
  def d10RawManifest(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupManifestApprox(Tables(spark, dir, "documents"), threshold = 0.2)
      .orderBy("doc_id")

  /** Audit row for d10: keeper agreement between the LSH-evidence manifest
    * and the exact manifest DuckDB recomputes via its recursive CTE —
    * (n_docs, n_agree), oracle claims full agreement. Any document the
    * approximate path assigns to a different cluster keeper fails the
    * hash compare. */
  def d10aManifestAgreement(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val e = Dedup.dedupManifest(docs, threshold = 0.2)
      .select(col("doc_id"), col("keeper_id").as("k_exact"))
    val l = Dedup.dedupManifestApprox(docs, threshold = 0.2)
      .select(col("doc_id"), col("keeper_id").as("k_lsh"))
    e.join(l, "doc_id").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("k_exact") === col("k_lsh"), 1L).otherwise(0L)).as("n_agree"))
  }

  /** Incremental dedup: the doc_id ≡ 0 mod 17 slice plays the daily
    * batch; the rest is the standing corpus. */
  def d11IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    Dedup.incrementalDedup(
      docs.filter(col("doc_id") % 17 =!= 0),
      docs.filter(col("doc_id") % 17 === 0),
      threshold = 0.2)
      .orderBy("doc_id")
  }

  /** Dedup QA report: distribution of d08-manifest cluster sizes — how
    * many clusters of each size exist and how many rows committing the
    * manifest would drop. Derived from the manifest itself (exact + near
    * evidence, singletons included as size-1 clusters), so the report's
    * would_drop tally is exactly the manifest's drop count and
    * Σ(cluster_size · n_clusters) conserves the corpus row count. */
  def d12ClusterSizes(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupManifest(Tables(spark, dir, "documents"), threshold = 0.2)
      .groupBy("keeper_id").agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("sz") - 1).as("would_drop"))
      .orderBy("cluster_size")

  /** Per-source duplication report: the dedup manifest joined back to
    * document provenance — which sources are duplicate factories and what
    * fraction of each survives the manifest. The table a curation owner
    * reads before deciding crawl or licensing changes. Reuses the cached
    * d08 manifest (plan-equal `Caches` hit when both run in a session);
    * the join adds one broadcast of the slim (doc_id, source) projection
    * cost — at scale the manifest side shuffles on doc_id instead, still
    * one equi-join. */
  def t23SourceDupReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    Dedup.dedupManifest(docs, threshold = 0.2)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("is_keeper"), 1L).otherwise(0L)).as("n_keepers"),
        sum(when(col("is_keeper"), 0L).otherwise(1L)).as("n_dropped"))
      .select(col("source"), col("n_docs"), col("n_keepers"), col("n_dropped"),
        round(col("n_dropped").cast("double") / col("n_docs"), 4).as("dup_rate"))
      .orderBy("source")
  }

  /** Benchmark decontamination: shingle-overlap fraction of each training
    * document against a deterministic benchmark holdout (doc_id ≡ 0 mod
    * 17) — the eval-leakage check run before training. */
  def d09Contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    Dedup.contamination(
      docs.filter(col("doc_id") % 17 =!= 0),
      docs.filter(col("doc_id") % 17 === 0),
      threshold = 0.5)
      .orderBy("doc_id")
  }

  /** Exact 13-gram decontamination (the GPT-3 appendix-C form: a training
    * document is contaminated if it shares ANY exact 13-gram with the
    * benchmark, no Jaccard threshold) — the companion to [[d09Contamination]]'s
    * fraction-based check. Same scale shape: the benchmark collapses to
    * distinct 8-byte hashes and broadcasts; the training side never
    * shuffles. Documents under 13 tokens have no 13-grams and are absent,
    * matching the oracle. */
  def d13ExactNgramDecontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    Dedup.contamination(
      docs.filter(col("doc_id") % 17 =!= 0),
      docs.filter(col("doc_id") % 17 === 0),
      threshold = 1.0, n = 13)
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        (col("n_overlap") >= 1).as("contaminated"))
      .orderBy("doc_id")
  }

  /** Embedding-cosine near-duplicate pairs — the SRP-banded gate + exact
    * verify path (no all-pairs join in the plan); band parameters are the
    * defaults tuned for full recall at this threshold, so the rows equal
    * the exact all-pairs oracle. */
  def d05CosineNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDuplicates(Tables(spark, dir, "embeddings"), threshold = 0.4)
      .orderBy("d1", "d2")

  /** Semantic dedup manifest (SemDeDup, Abbas et al. 2023,
    * arXiv:2303.09540): near-duplicate evidence comes from EMBEDDING
    * cosine instead of lexical shingles — paraphrases and translations
    * that share no n-grams still land in one cluster. Pairs above the
    * cosine bar (the same SRP-gated generator d05 hash-verifies against
    * exact cosine) resolve to connected components via the shared
    * [[Dedup.dedupClusters]] min-label propagation, and every vector gets
    * a manifest row (vec_id, keeper_id, is_keeper) — the d08 contract on
    * the embeddings table. Keeper = cluster-minimum vec_id (the house
    * deterministic convention; SemDeDup's centroid-distance keeper is the
    * [[Dedup.keeperByScore]] policy swap). */
  def d15SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    // 0.45, deliberately ABOVE d05's 0.4 pair bar: on this synthetic
    // corpus 0.4 admits ~920 edges among 2000 vectors and the components
    // sprawl into long chains (min-label propagation rounds = component
    // diameter — measured 48 s in the suite); at 0.45 the graph is 121
    // tight clusters of ≤4 with trivial diameter. The threshold is a
    // per-corpus dial: for real unit-normalized text embeddings SemDeDup
    // uses 0.95+, which produces exactly this tight-cluster regime.
    val pairs = Similarity.cosineNearDuplicates(emb, threshold = 0.45)
      .select(col("d1"), col("d2"))
    val clusters = Dedup.dedupClusters(pairs)
      .withColumnRenamed("doc_id", "vec_id")
    emb.select(col("vec_id"))
      .join(clusters, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("keeper_id"))
      .withColumn("is_keeper", col("vec_id") === col("keeper_id"))
      .orderBy("vec_id")
  }

  /** All (query, corpus) cosine scores for the pinned query subset. */
  def s01CosinePairs(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosinePairs(Tables(spark, dir, "embeddings"), col("vec_id") < 5)
      .select(col("qid"), col("nid"), round(col("cos"), 4).as("cos"))
      .orderBy("qid", "nid")

  /** Exact brute-force top-5 neighbours per query. */
  def s02TopKBruteForce(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(Tables(spark, dir, "embeddings"),
      col("vec_id") < 5, k = 5)
      .orderBy("qid", "rank")

  /** Shared ANN contract-verdict skeleton (s03/s04/s07): one row per
    * pinned query with every column an oracle-claimable constant —
    * `(qid, prod_ranks_dense, prod_self_excluded, [prod_scores_match,]
    * <dial column>)`.
    *
    * The PRODUCTION-dial result is checked structurally (ranks are a
    * dense 1..n, self never returned) and — where the index scores with
    * true cosine (SRP, IVF) — every returned score is re-derived from the
    * stored vectors and must match within 2e-4 (the score is exact by
    * construction; the tolerance only absorbs 1-ulp float-association
    * drift, the same budget SimilaritySpec uses). The EXACT-dial run
    * (zero planes / full probe / whole-corpus rerank) is compared
    * row-for-row against [[Similarity.bruteForceTopK]] — the frame the
    * driver separately hash-verifies against DuckDB as s02 — so the
    * `<dial>` flag chains the whole index pipeline to the cross-engine
    * oracle. Every claim is DETERMINISTICALLY true for a correct engine
    * regardless of how the driver regenerates the corpus: nothing here
    * pins the probabilistic candidate sets themselves (those ship as the
    * bench-only `s03r`/`s04r`/`s07r` entries pinned by goldens).
    *
    * Queries with an empty production bucket (possible for SRP at 8
    * planes) still emit their row: structural checks are vacuously TRUE
    * on a LEFT join, while a missing dial comparison coalesces to FALSE —
    * loud, because brute force always returns rows.
    *
    * `prodNonEmpty = true` additionally emits a `prod_nonempty` claim
    * per query, so an empty production result fails the contract
    * instead of passing the structural checks vacuously (ADVICE r7 —
    * only SRP may legitimately land in an empty bucket). The claim must
    * hold for a CORRECT engine on any regenerated corpus, and the probe
    * self-excludes — so "the probe visits real cells" is only a valid
    * argument when those cells hold a non-query vector (ADVICE r8: an
    * IVF query alone in a singleton cell correctly returns empty).
    * `prodNonEmptyGate` supplies that occupancy certificate — a
    * `(qid, n_cand)` frame counting non-self candidates the production
    * probe can reach, computed by the probe's OWN routing
    * ([[graft.similarity.Similarity.IvfIndex.probedNonSelfCount]]) —
    * and the claim becomes "n_cand ≥ 1 ⇒ result non-empty". PQ's ADC
    * scan reaches the whole code table, so its gate is the corpus
    * itself minus self (always satisfied on the ≥2-vector test corpus);
    * it passes `None` and keeps the unconditional claim. */
  private def annVerdict(emb: DataFrame, queryFilter: Column, k: Int,
      prod: DataFrame, checkScores: Boolean,
      exactDial: DataFrame, dialColName: String,
      prodNonEmpty: Boolean = false,
      prodNonEmptyGate: Option[DataFrame] = None): DataFrame = {
    val queries = emb.filter(queryFilter).select(col("vec_id").as("qid"))
    val scoreOk: Column =
      if (checkScores)
        min(abs(col("cos").cast("double") -
          Similarity.cosine(col("qv"), col("nv"))) <= 2e-4)
      else min(lit(true)) // vacuous for score-approximate indexes (PQ ADC)
    val prodChecks0 = prod
      .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qv")), "qid")
      .join(emb.select(col("vec_id").as("nid"), col("embedding").as("nv")), "nid")
      .groupBy("qid").agg(
        (sort_array(collect_list(col("rank"))) ===
          sequence(lit(1), count(lit(1)).cast("int"))).as("prod_ranks_dense"),
        min(col("nid") =!= col("qid")).as("prod_self_excluded"),
        scoreOk.as("prod_scores_match"))
    val fd = exactDial.select("qid", "rank", "nid", "cos")
      .withColumn("in_fd", lit(true))
    val bf = Similarity.bruteForceTopK(emb, queryFilter, k)
      .select("qid", "rank", "nid", "cos").withColumn("in_bf", lit(true))
    val dial = fd.join(bf, Seq("qid", "rank", "nid", "cos"), "full_outer")
      .groupBy("qid")
      .agg(min(col("in_fd").isNotNull && col("in_bf").isNotNull).as("dial_ok"))
    val base0 = queries
      .join(prodChecks0, Seq("qid"), "left")
      .join(dial, Seq("qid"), "left")
    val base = prodNonEmptyGate match {
      case Some(gate) => base0.join(
        gate.select(col("qid"), col("n_cand").as("__gate_cand")),
        Seq("qid"), "left")
      case None => base0
    }
    val cols = Seq(col("qid")) ++
      // absence of a prodChecks0 row IS the empty production result —
      // claimed non-empty where the index topology guarantees it; with a
      // gate, only where the probed cells verifiably hold a non-query
      // candidate (a missing/zero gate row makes the claim vacuous-true:
      // a correct engine DOES return empty there)
      (if (prodNonEmpty && prodNonEmptyGate.isDefined)
        Seq((coalesce(col("__gate_cand"), lit(0L)) === 0L ||
          col("prod_ranks_dense").isNotNull).as("prod_nonempty"))
      else if (prodNonEmpty)
        Seq(col("prod_ranks_dense").isNotNull.as("prod_nonempty"))
      else Nil) ++
      Seq(
        coalesce(col("prod_ranks_dense"), lit(true)).as("prod_ranks_dense"),
        coalesce(col("prod_self_excluded"), lit(true)).as("prod_self_excluded")) ++
      (if (checkScores)
        Seq(coalesce(col("prod_scores_match"), lit(true)).as("prod_scores_match"))
      else Nil) :+
      coalesce(col("dial_ok"), lit(false)).as(dialColName)
    base.select(cols: _*).orderBy("qid")
  }

  /** SRP-LSH contract row, VERDICT form (see [[annVerdict]]): production
    * 8-plane run checked structurally + score-exactly, zero-plane dial
    * checked equal to brute force. Raw top-k is the bench-only `s03r`. */
  def s03SrpAnnTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val qf = col("vec_id") < 5
    annVerdict(emb, qf, k = 5,
      prod = Similarity.srpBucketTopK(emb, qf, k = 5), checkScores = true,
      exactDial = Similarity.srpBucketTopK(emb, qf, k = 5, numPlanes = 0),
      dialColName = "zero_plane_matches_brute")
  }

  /** Raw SRP-LSH approximate top-5 (bench + golden entry; the s03
    * contract row is the oracle-checkable verdict form above). */
  def s03RawTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.srpBucketTopK(Tables(spark, dir, "embeddings"),
      col("vec_id") < 5, k = 5)
      .orderBy("qid", "rank")

  /** SRP with ZERO planes: one bucket, so the candidate equi-join visits
    * the whole corpus and the result is exact by construction — the same
    * full-dial audit as s04a, hash-checking the entire SRP pipeline
    * (bucket expression, candidate join, ranking) against the brute-force
    * DuckDB oracle. s03 keeps the production 8-plane setting. */
  def s03aSrpFullDial(spark: SparkSession, dir: String): DataFrame =
    Similarity.srpBucketTopK(Tables(spark, dir, "embeddings"),
      col("vec_id") < 5, k = 5, numPlanes = 0)
      .orderBy("qid", "rank")

  /** IVF contract row, VERDICT form (see [[annVerdict]]): the
    * PRODUCTION-geometry run (nlist=16, nprobe=4 — the exact dials the
    * raw `s04r` entry ships, so the verdict exercises the geometry
    * production uses, not a friendlier one) checked structurally +
    * score-exactly, and the full-probe dial (every one of the 16 cells
    * visited ⇒ exact by construction) checked equal to brute force. One
    * index build serves both probes (the production shape). */
  def s04IvfAnnTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val qf = col("vec_id") < 5
    val idx = Similarity.buildIvfIndex(emb, nlist = 16)
    annVerdict(emb, qf, k = 5,
      prod = idx.topK(qf, k = 5, nprobe = 4), checkScores = true,
      exactDial = idx.topK(qf, k = 5, nprobe = 16),
      dialColName = "full_probe_matches_brute", prodNonEmpty = true,
      prodNonEmptyGate = Some(idx.probedNonSelfCount(qf, nprobe = 4)))
  }

  /** Raw IVF approximate top-5 (bench + golden entry; the s04 contract
    * row is the oracle-checkable verdict form above). */
  def s04RawTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(Tables(spark, dir, "embeddings"),
      col("vec_id") < 5, k = 5)
      .orderBy("qid", "rank")

  /** IVF at FULL probe: every cell visited ⇒ exact by construction, so
    * the whole IVF pipeline (sampled-KMeans quantizer, cell routing, the
    * per-cell scan) becomes hash-checkable against the same DuckDB
    * brute-force oracle as s02 — the audit row that turns "IVF is tested"
    * into "IVF is oracle-verified with the approximation dial at exact".
    * s04 keeps the production nprobe<nlist setting as the rows-only entry. */
  def s04aIvfFullProbe(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(Tables(spark, dir, "embeddings"),
      col("vec_id") < 5, k = 5, nlist = 8, nprobe = 8)
      .orderBy("qid", "rank")

  /** Per-label embedding centroids (class prototypes) in long form. */
  def s05LabelCentroids(spark: SparkSession, dir: String): DataFrame =
    Similarity.labelCentroids(Tables(spark, dir, "embeddings"))
      .orderBy("label", "pos")

  /** Int8 scalar-quantization profile per embedding: scale, integer code
    * mass, mean reconstruction error — the compression-safety audit. */
  def s06QuantizationProfile(spark: SparkSession, dir: String): DataFrame =
    Similarity.quantizationProfile(Tables(spark, dir, "embeddings"))
      .orderBy("vec_id")

  /** PQ contract row, VERDICT form (see [[annVerdict]]): production
    * ADC-only run checked structurally (ADC scores are approximate by
    * design, so no score claim), whole-corpus-rerank dial checked equal
    * to brute force. One codebook build serves both probes. Raw ADC
    * top-k is the bench-only `s07r`. */
  def s07PqTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val qf = col("vec_id") < 5
    val idx = Similarity.buildPqIndex(emb)
    annVerdict(emb, qf, k = 5,
      prod = Similarity.pqProbe(idx, emb, qf, topK = 5), checkScores = false,
      exactDial = Similarity.pqProbe(idx, emb, qf, topK = 5, rerank = Int.MaxValue),
      dialColName = "rerank_matches_brute", prodNonEmpty = true)
  }

  /** Raw PQ ADC-only top-5 (bench + golden entry; the s07 contract row is
    * the oracle-checkable verdict form above). */
  def s07RawTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.pqTopK(Tables(spark, dir, "embeddings"),
      col("vec_id") < 5, topK = 5)
      .orderBy("qid", "rank")

  /** PQ with the exact-rerank dial at the whole corpus: the ADC scan
    * shortlists everything, the refine step re-scores every candidate with
    * true cosine, so the result equals brute force and hash-checks against
    * the same DuckDB oracle as s02 — the audit row that oracle-verifies
    * the PQ machinery end to end (codebook assignment, ADC table routing,
    * shortlist join, exact refine), the same dial trick as s03a/s04a.
    * s07 keeps the production ADC-only setting as the rows-only entry. */
  def s07aPqRerankExact(spark: SparkSession, dir: String): DataFrame =
    Similarity.pqTopK(Tables(spark, dir, "embeddings"),
      col("vec_id") < 5, topK = 5, rerank = Int.MaxValue)
      .orderBy("qid", "rank")

  /** IVF-PQ composite at the production dial (nprobe 4 of 16 cells, PQ
    * ADC scoring, 50-deep exact rerank) — bench-only raw form, pinned by
    * a committed golden. See [[graft.similarity.Similarity.ivfPqTopK]]. */
  def s15RawTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val (ivf, pq) = buildIvfPqConcurrently(emb)
    Similarity.ivfPqTopK(ivf, pq, emb, col("vec_id") < 5, topK = 5)
      .orderBy("qid", "rank")
  }

  /** The two coarse/fine quantizer trainings are independent driver-
    * blocking KMeans fits over the same corpus, each leaving most of the
    * executor pool idle at contract scale — run them concurrently (the
    * [[Similarity.buildPqIndex]] subquantizer discipline applied one
    * level up). Determinism is unaffected: both builds are seeded and
    * read the same immutable input. */
  private def buildIvfPqConcurrently(
      emb: DataFrame): (Similarity.IvfIndex, Similarity.PqIndex) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fi = Future(Similarity.buildIvfIndex(emb))
    val fp = Future(Similarity.buildPqIndex(emb))
    (Await.result(fi, Duration.Inf), Await.result(fp, Duration.Inf))
  }

  /** ANN-shortlisted MMR contract row (s16, r8 verdict #5): with the
    * probe dial fully open (`nprobe = nlist` — the IVF shortlist is
    * exact by construction, the s03a/s04a discipline), the composed
    * [[graft.similarity.Similarity.mmrDiverseTopKAnn]] must equal the
    * brute-force [[graft.similarity.Similarity.mmrDiverseTopK]] ROW FOR
    * ROW — (qid, rank, vec_id, rel) all compared, so the whole composed
    * pipeline (index routing, shortlist re-hydration, executor-side
    * greedy) chains to the DuckDB-replayable MMR semantics. A query
    * missing from the comparison coalesces to FALSE — loud, because
    * brute MMR always returns rows. The production dial ships as the
    * bench/golden-only `s16r_mmr_ann`. */
  def s16MmrAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val qf = col("vec_id") < 5
    val idx = Similarity.buildIvfIndex(emb, nlist = 16)
    val ann = Similarity.mmrDiverseTopKAnn(idx, emb, qf,
        k = 5, shortlist = 20, nprobe = 16)
      .withColumn("in_ann", lit(true))
    val brute = Similarity.mmrDiverseTopK(emb, qf, k = 5, shortlist = 20)
      .withColumn("in_brute", lit(true))
    val cmp = ann
      .join(brute, Seq("qid", "rank", "vec_id", "rel"), "full_outer")
      .groupBy("qid")
      .agg(min(col("in_ann").isNotNull && col("in_brute").isNotNull).as("ok"))
    emb.filter(qf).select(col("vec_id").as("qid"))
      .join(cmp, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("ok"), lit(false)).as("full_dial_matches_brute"))
      .orderBy("qid")
  }

  /** Raw production-dial ANN-MMR (bench + golden entry; the s16 contract
    * row is the full-dial verdict form above): nprobe = 4 of 16 cells,
    * shortlist 20 — the approximate shortlist the greedy re-ranks. */
  def s16RawMmrAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val idx = Similarity.buildIvfIndex(emb, nlist = 16)
    Similarity.mmrDiverseTopKAnn(idx, emb, col("vec_id") < 5,
      k = 5, shortlist = 20, nprobe = 4)
  }

  /** Raw production-dial ANN hard negatives (bench + golden entry; the
    * full-dial ≡ brute equality lives in AnnShortlistSpec): shortlist
    * 4× k oversampling, the standard ANN-mining rule. */
  def s13RawHardNegAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val idx = Similarity.buildIvfIndex(emb, nlist = 16)
    Similarity.hardNegativesAnn(idx, emb, col("vec_id") < 5,
      k = 5, shortlist = 20, nprobe = 4)
  }

  /** IVF-PQ with every dial open — all 16 cells probed, whole-corpus
    * rerank — which provably equals brute force: the contract row that
    * chains the COMPOSITE routing+coding+rerank pipeline to the same
    * DuckDB oracle as s02 (the s04a/s07a discipline applied to the
    * production topology). */
  def s15IvfPqRerankExact(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val (ivf, pq) = buildIvfPqConcurrently(emb)
    Similarity.ivfPqTopK(ivf, pq, emb, col("vec_id") < 5, topK = 5,
      nprobe = 16, rerank = Int.MaxValue)
      .orderBy("qid", "rank")
  }

  /** Sequence-packing manifest: documents concatenated in global doc_id
    * order and cut into fixed `seqLen`-token training sequences (the
    * standard "concat-and-chunk" LLM pretraining layout — docs straddle
    * boundaries rather than being padded). One row per sequence: how many
    * docs touch it, how many START in it (the rest straddle in from the
    * previous sequence), and its token fill (only the final sequence may
    * be partial).
    *
    * Scale shape: the global running offset is ONE total order — the
    * degenerate case for a window scan (every row through a single task) —
    * so it runs on [[Prefix.cumSumTwoPhase]] with an empty group key. The
    * explode fans each doc out to the sequences it overlaps (factor
    * ≈ 1 + doc_tokens/seqLen, ~1.5 for web corpora at 2048), then one
    * hash groupBy on seq_id. No step holds more than a partition slice. */
  def sequencePackManifest(docs: DataFrame, seqLen: Long): DataFrame = {
    val d = docs
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    Prefix.cumSumTwoPhase(d, Seq.empty, Seq("doc_id"), "n_tokens")
      .select(col("doc_id"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("start_off"))
      .withColumn("seq_first", expr(s"start_off div ${seqLen}L"))
      .withColumn("seq_last",
        expr(s"(start_off + n_tokens - 1) div ${seqLen}L"))
      .select(col("n_tokens"), col("start_off"), col("seq_first"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq_id"))
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("seq_id") === col("seq_first"), 1L).otherwise(0L))
          .as("n_starting"),
        sum(least((col("seq_id") + 1) * seqLen, col("start_off") + col("n_tokens"))
          - greatest(col("seq_id") * seqLen, col("start_off")))
          .as("n_tokens_filled"))
      .withColumn("fill_ratio",
        round(col("n_tokens_filled") / seqLen.toDouble, 4))
      .orderBy("seq_id")
  }

  /** Driver entry: 2048-token sequences over the documents corpus. */
  def t19SequencePack(spark: SparkSession, dir: String): DataFrame =
    sequencePackManifest(Tables(spark, dir, "documents"), 2048L)

  /** Containment (partial-copy) near-duplicate pairs — the asymmetric
    * complement to d02's symmetric Jaccard (see
    * [[graft.dedup.Dedup.containmentPairs]]). Threshold 0.6: a pair where
    * ≥60% of the smaller document's shingles appear in the larger one. */
  def d14Containment(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables(spark, dir, "documents"), threshold = 0.6)
      .orderBy("d1", "d2")

  /** kNN label-agreement eval over a 200-query sample (k=5). */
  def s08KnnLabelAgreement(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnLabelAgreement(Tables(spark, dir, "embeddings"),
      col("vec_id") < 200, k = 5)

  /** Per-label Recall@10 / MRR@10 / nDCG@10 of exact cosine retrieval
    * over the same 200-query sample (see
    * [[graft.similarity.Similarity.retrievalEval]]). */
  def s17RetrievalEval(spark: SparkSession, dir: String): DataFrame =
    Similarity.retrievalEval(Tables(spark, dir, "embeddings"),
      col("vec_id") < 200, k = 10)

  /** IVF dial-sweep contract row, VERDICT form: the one-pass
    * recall/cost curve ([[graft.similarity.Similarity.IvfIndex.dialSweep]])
    * is re-derived EMPIRICALLY per dial — the probe actually runs at
    * every `nprobe` in 1..nlist and its true-neighbour hit count must
    * equal the sweep's identity-derived one — plus the three structural
    * claims that hold on any corpus: recall and scan cost are monotone in
    * the dial (candidate sets are nested), and the full dial recalls
    * everything (every cell probed ⇒ probe ≡ brute force). All claims
    * are deterministically TRUE for any regenerated corpus, so the
    * oracle asserts them per dial row. Raw curve = bench-only `s18r`. */
  def s18IvfDialSweep(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val qf = col("vec_id") < 50
    val k = 5
    val nlist = 16
    val idx = Similarity.buildIvfIndex(emb, nlist = nlist)
    // the swept dial range is the BUILT cell count: a corpus smaller
    // than nlist trains one cell per vector (buildIvfIndex clamps), and
    // dials past the last real cell would add vacuous duplicate rows
    val builtCells = idx.centroids.count().toInt
    // both frames are tiny (nlist rows / q·k rows) but feed several
    // branches below — localCheckpoint cuts the lineage so the corpus
    // passes behind them run once, not once per consumer (the q57
    // edge-rewrite discipline; this row is invoked directly, so the
    // eager cut is its own first action)
    val sweep = idx.dialSweep(emb, qf, k, maxNprobe = builtCells)
      .localCheckpoint()
    val exact = Similarity.bruteForceTopK(emb, qf, k).select("qid", "nid")
      .localCheckpoint()
    // the empirical side: one real probe per dial; the 16 probe outputs
    // union BEFORE the exact-join and hit-count aggregate, so those run
    // once over the combined (dial, qid, nid) stream instead of once per
    // dial — a dial can drop out here when its probe finds zero true
    // neighbours, which the left join below restores as m_hits = 0
    val measured = (1 to builtCells).map { p =>
      idx.topK(qf, k, nprobe = p)
        .select(lit(p).as("nprobe"), col("qid"), col("nid"))
    }.reduce(_ unionByName _)
      .join(exact, Seq("qid", "nid"))
      .groupBy("nprobe").agg(count(lit(1)).as("m_hits"))
    val full = broadcast(sweep.filter(col("nprobe") === builtCells)
      .select(col("n_hits").as("full_hits"), col("n_exact").as("full_exact")))
    val prev = sweep.select((col("nprobe") + 1).as("nprobe"),
      col("n_hits").as("prev_hits"), col("mean_scanned").as("prev_scanned"))
    sweep
      .join(broadcast(measured), Seq("nprobe"), "left")
      .join(prev, Seq("nprobe"), "left")
      .crossJoin(full)
      .select(col("nprobe"),
        (col("n_hits") === coalesce(col("m_hits"), lit(0L)))
          .as("sweep_matches_probe"),
        coalesce(col("n_hits") >= col("prev_hits"), lit(true))
          .as("recall_monotone"),
        coalesce(col("mean_scanned") >= col("prev_scanned"), lit(true))
          .as("scan_monotone"),
        (col("full_hits") === col("full_exact")).as("full_dial_recall_one"))
      .orderBy("nprobe")
  }

  /** Raw IVF dial-sweep curve (bench + golden entry; the s18 contract
    * row is the oracle-checkable verdict form above). */
  def s18RawDialSweep(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val idx = Similarity.buildIvfIndex(emb, nlist = 16)
    idx.dialSweep(emb, col("vec_id") < 50, k = 5,
      maxNprobe = idx.centroids.count().toInt)
  }

  /** IVF drift-report contract row
    * ([[graft.similarity.Similarity.IvfIndex.driftReport]]): the
    * occupancy facts the oracle can recompute (cell count is the built
    * nlist, vector count is the corpus), plus the structural claims that
    * hold on any corpus — occupancy conserves the corpus exactly, the
    * hottest cell is at least average (integer arithmetic, no rounding
    * in the claim), quantization error is non-negative, and the
    * empty-cell count stays inside [0, n_cells]. */
  def s19IvfDriftReport(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val idx = Similarity.buildIvfIndex(emb, nlist = 16)
    val corpus = broadcast(emb.agg(count(lit(1)).as("__corpus")))
    idx.driftReport()
      .crossJoin(corpus)
      .select(col("n_cells"), col("n_vectors"),
        (col("n_vectors") === col("__corpus")).as("count_matches_corpus"),
        (col("max_cell_n") * col("n_cells") >= col("n_vectors"))
          .as("skew_ge_one"),
        (col("mean_sq_dist") >= 0.0).as("msd_nonneg"),
        (col("empty_cells") >= 0L && col("empty_cells") <= col("n_cells"))
          .as("empty_in_range"))
  }

  /** PQ rerank-sweep contract row, VERDICT form (the
    * [[s18IvfDialSweep]] discipline applied to the PQ axis): the
    * one-pass curve's hit counts are re-measured by REAL
    * `pqProbe(rerank = s)` runs at every ladder step, recall must be
    * monotone in the shortlist size (nested shortlists), and the
    * whole-corpus step must recall everything (s07a's refine ≡ brute).
    * All claims deterministically TRUE on any regenerated corpus. */
  def s20PqRerankSweep(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val qf = col("vec_id") < 50
    val k = 5
    // Int.MaxValue = the whole-corpus step (pqProbe's s07a dial): its
    // recall is exactly 1 by construction, anchoring the curve's top
    val ladder = Seq(5, 10, 20, 80, 320, Int.MaxValue)
    val idx = Similarity.buildPqIndex(emb)
    val sweep = Similarity.pqRerankSweep(idx, emb, qf, k, ladder)
      .localCheckpoint()
    val exact = Similarity.bruteForceTopK(emb, qf, k).select("qid", "nid")
      .localCheckpoint()
    val measured = ladder.map { s =>
      Similarity.pqProbe(idx, emb, qf, topK = k, rerank = s)
        .select(lit(s).as("rerank"), col("qid"), col("nid"))
    }.reduce(_ unionByName _)
      .join(exact, Seq("qid", "nid"))
      .groupBy("rerank").agg(count(lit(1)).as("m_hits"))
    val full = broadcast(sweep.filter(col("rerank") === Int.MaxValue)
      .select(col("n_hits").as("full_hits"), col("n_exact").as("full_exact")))
    import spark.implicits._
    val stepsDf = broadcast(ladder.zipWithIndex.toDF("rerank", "step"))
    val sw = sweep.join(stepsDf, "rerank")
    val prev = sw.select((col("step") + 1).as("step"),
      col("n_hits").as("prev_hits"))
    sw.join(broadcast(measured), Seq("rerank"), "left")
      .join(prev, Seq("step"), "left")
      .crossJoin(full)
      .select(col("rerank"),
        (col("n_hits") === coalesce(col("m_hits"), lit(0L)))
          .as("sweep_matches_probe"),
        coalesce(col("n_hits") >= col("prev_hits"), lit(true))
          .as("recall_monotone"),
        (col("full_hits") === col("full_exact")).as("full_rerank_recall_one"))
      .orderBy("rerank")
  }

  /** Raw PQ rerank-sweep curve (bench + golden entry; the s20 contract
    * row is the oracle-checkable verdict form above). */
  def s20RawRerankSweep(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    Similarity.pqRerankSweep(Similarity.buildPqIndex(emb), emb,
      col("vec_id") < 50, k = 5,
      ladder = Seq(5, 10, 20, 80, 320, Int.MaxValue))
  }

  /** nprobe×rerank grid-sweep contract row, VERDICT form (the s18/s20
    * discipline on the composite axis): every one of the 4×4 grid cells'
    * identity-derived hit counts is re-measured by a REAL
    * `ivfPqTopK(nprobe = p, rerank = s)` run; recall must be monotone in
    * the rerank ladder at every fixed dial (nested shortlists over a
    * fixed candidate set — deliberately NOT claimed across dials, where
    * opening a cell can evict a true neighbour from the shortlist); the
    * rerank=∞ column must reproduce [[graft.similarity.Similarity.IvfIndex.dialSweep]]
    * over the same index (the shared boundary with the routing-axis
    * sweep); and the (full dial, whole corpus) corner recalls everything.
    * The IVF index is built with nlist=4 so the swept dials REACH the
    * full-dial corner (built cells = 4 at every driver SF ≥ 4 vectors);
    * all claims deterministically TRUE on any regenerated corpus. */
  def s21GridSweep(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val qf = col("vec_id") < 50
    val k = 5
    val ladder = Seq(5, 20, 320, Int.MaxValue)
    val ivf = Similarity.buildIvfIndex(emb, nlist = 4)
    val builtCells = ivf.centroids.count().toInt
    val pq = Similarity.buildPqIndex(emb)
    val grid = Similarity.gridSweep(ivf, pq, emb, qf, k,
      maxNprobe = builtCells, ladder).localCheckpoint()
    val exact = Similarity.bruteForceTopK(emb, qf, k).select("qid", "nid")
      .localCheckpoint()
    // the empirical side: one real composite probe per grid cell; the 16
    // probe outputs union BEFORE the exact-join and hit aggregate (the
    // s18 shape) — a cell whose probe finds zero true neighbours drops
    // out here and the left join below restores it as m_hits = 0
    val measured = (for { p <- 1 to builtCells; s <- ladder } yield
      Similarity.ivfPqTopK(ivf, pq, emb, qf, k, nprobe = p, rerank = s)
        .select(lit(p).as("nprobe"), lit(s).as("rerank"),
          col("qid"), col("nid")))
      .reduce(_ unionByName _)
      .join(exact, Seq("qid", "nid"))
      .groupBy("nprobe", "rerank").agg(count(lit(1)).as("m_hits"))
    import spark.implicits._
    val stepsDf = broadcast(ladder.zipWithIndex.toDF("rerank", "step"))
    val g = grid.join(stepsDf, "rerank")
    val prev = g.select(col("nprobe"), (col("step") + 1).as("step"),
      col("n_hits").as("prev_hits"))
    val dial = ivf.dialSweep(emb, qf, k, maxNprobe = builtCells)
      .select(col("nprobe"), col("n_hits").as("dial_hits"))
    val corner = broadcast(grid
      .filter(col("nprobe") === builtCells &&
        col("rerank") === Int.MaxValue)
      .select(col("n_hits").as("corner_hits"),
        col("n_exact").as("corner_exact")))
    g.join(broadcast(measured), Seq("nprobe", "rerank"), "left")
      .join(prev, Seq("nprobe", "step"), "left")
      .join(broadcast(dial), "nprobe")
      .crossJoin(corner)
      .select(col("nprobe"), col("rerank"),
        (col("n_hits") === coalesce(col("m_hits"), lit(0L)))
          .as("grid_matches_probe"),
        coalesce(col("n_hits") >= col("prev_hits"), lit(true))
          .as("rerank_monotone"),
        (col("rerank") =!= Int.MaxValue || col("n_hits") === col("dial_hits"))
          .as("full_rerank_matches_dial"),
        (col("corner_hits") === col("corner_exact")).as("corner_recall_one"))
      .orderBy("nprobe", "rerank")
  }

  /** Raw nprobe×rerank grid curve at the production geometry (nlist 16 —
    * bench + golden entry; the s21 contract row above is the
    * oracle-checkable verdict form at the corner-reachable nlist=4). */
  def s21RawGridSweep(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val ivf = Similarity.buildIvfIndex(emb, nlist = 16)
    Similarity.gridSweep(ivf, Similarity.buildPqIndex(emb), emb,
      col("vec_id") < 50, k = 5, maxNprobe = ivf.centroids.count().toInt,
      ladder = Seq(5, 10, 20, 80, 320, Int.MaxValue))
  }

  /** Pareto frontier over the s21 grid (r10 verdict #6 — the number a
    * deployment actually reads, promoted to a driver-visible row): the
    * SLA-compliant undominated (nprobe, rerank) cells at minRecall 0.9.
    * The verdict form emits INVARIANTS (one row of booleans, so the
    * oracle is exact regardless of how many cells the frontier holds on
    * a regenerated corpus), each checked against an INDEPENDENT plain-
    * Scala re-derivation over the collected grid — 16 rows, bounded by
    * construction:
    *  - `frontier_nonempty`: the (nlist, ∞) corner has recall 1 ≥ any
    *    SLA, so a correct frontier can never be empty;
    *  - `matches_rederivation`: the frontier set equals the definition
    *    replayed in Scala (compliant ∧ no compliant cell ≤/< it);
    *  - `all_meet_sla`, `subset_of_grid`: every emitted cell is a real
    *    compliant grid cell;
    *  - `antichain_order`: sorted by nprobe the reranks strictly
    *    decrease — the 2-D antichain shape a Pareto frontier must have. */
  def s22GridFrontier(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val qf = col("vec_id") < 50
    val minRecall = 0.9
    val ladder = Seq(5, 20, 320, Int.MaxValue)
    val ivf = Similarity.buildIvfIndex(emb, nlist = 4)
    val pq = Similarity.buildPqIndex(emb)
    val grid = Similarity.gridSweep(ivf, pq, emb, qf, 5,
      maxNprobe = ivf.centroids.count().toInt, ladder).localCheckpoint()
    val frontier = Similarity.gridFrontierFor(grid, minRecall)
      .collect().map(r =>
        (r.getAs[Int]("nprobe"), r.getAs[Int]("rerank"),
          r.getAs[Double]("recall_at_k")))
    val cells = grid.collect().map(r =>
      (r.getAs[Int]("nprobe"), r.getAs[Int]("rerank"),
        r.getAs[Double]("recall_at_k")))
    val compliant = cells.filter(_._3 >= minRecall)
    val want = compliant.filter(c => !compliant.exists(d =>
      d._1 <= c._1 && d._2 <= c._2 && (d._1 < c._1 || d._2 < c._2)))
      .map(c => (c._1, c._2)).toSet
    val got = frontier.map(f => (f._1, f._2)).toSet
    val byNprobe = frontier.sortBy(_._1)
    import spark.implicits._
    Seq((
      frontier.nonEmpty,
      got == want,
      frontier.forall(_._3 >= minRecall),
      got.subsetOf(compliant.map(c => (c._1, c._2)).toSet),
      byNprobe.map(_._1).distinct.length == byNprobe.length &&
        byNprobe.map(_._2).toSeq.sliding(2).forall(w =>
          w.length < 2 || w(0) > w(1))))
      .toDF("frontier_nonempty", "matches_rederivation", "all_meet_sla",
        "subset_of_grid", "antichain_order")
  }

  /** The frontier at the production geometry over the s21r grid —
    * bench + golden entry pinning the actual recommended cells. */
  def s22RawGridFrontier(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val ivf = Similarity.buildIvfIndex(emb, nlist = 16)
    Similarity.gridFrontierFor(
      Similarity.gridSweep(ivf, Similarity.buildPqIndex(emb), emb,
        col("vec_id") < 50, k = 5,
        maxNprobe = ivf.centroids.count().toInt,
        ladder = Seq(5, 10, 20, 80, 320, Int.MaxValue)),
      minRecall = 0.9)
  }

  /** Per-document duplicated-3-gram span coverage (see
    * [[graft.dedup.Dedup.dupSpanCoverage]]); rides the session's cached
    * corpus shingle table so the sweep shares d02's one explode pass. */
  def d22DupSpanCoverage(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    Dedup.dupSpanCoverage(docs,
      shingles = Some(Dedup.shingleTable(docs)))
  }

  /** BM25 top-10 per probe term (the corpus's 3 highest-df terms — a
    * deterministic fixture on any regenerated corpus; see
    * [[graft.text.Retrieval.bm25TopK]]). */
  def t48Bm25TopK(spark: SparkSession, dir: String): DataFrame =
    graft.text.Retrieval.bm25TopK(Tables(spark, dir, "documents"))

  /** Multi-term BM25 top-10 per probe QUERY (three 3-word queries chunked
    * from the corpus's 9 highest-df terms — deterministic on any
    * regenerated corpus; see [[graft.text.Retrieval.bm25QueryTopK]]). */
  def t49Bm25MultiTerm(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    graft.text.Retrieval.bm25QueryTopK(docs,
      graft.text.Retrieval.probeQueries(docs))
  }

  /** Build a throwaway persisted BM25 index from `documents`, run
    * `body` against it, materialize the bounded result eagerly, and
    * delete the store (the q60 temp-store discipline — the returned
    * frame must not depend on files this method removes).
    *
    * `withFwd` (round 14, optimization): the doc-keyed forward index
    * has exactly one reader — PRF stage 2 — so the one-shot entries
    * whose single query never runs PRF skip its build (tf ⋈ dl join +
    * sorted write) in the store they are about to delete; t56 (the PRF
    * serve) opts in. Results are unchanged by construction: the skipped
    * table is never scanned. Long-lived stores keep `buildIndex`'s
    * default (full index). */
  private def overBm25Store(spark: SparkSession, dir: String,
      withFwd: Boolean = false)(
      body: String => DataFrame): DataFrame = {
    val store = java.nio.file.Files
      .createTempDirectory("graft_bm25_store").toString
    graft.text.Retrieval.buildIndex(spark,
      Tables(spark, dir, "documents"), store, withFwd = withFwd)
    val out = body(store)
    val rows = out.collect().toSeq
    val p = new org.apache.hadoop.fs.Path(store)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), out.schema)
  }

  /** t48 through the PERSISTED BM25 index (r10 verdict #1): build the
    * tf/dl store from the documents table — the one tokenize every
    * later query call skips — then score entirely from the stored
    * frames. Must hash-match the from-scratch t48 plan and the same
    * DuckDB oracle: [[graft.text.Retrieval.indexRows]] is the single
    * tokenize source and df/N re-derive through the shared
    * `framesFrom`, so stored-vs-scratch divergence is structurally
    * impossible rather than merely tested. */
  def t50Bm25StoreTopK(spark: SparkSession, dir: String): DataFrame =
    overBm25Store(spark, dir)(store =>
      graft.text.Retrieval.bm25TopKFromStore(spark, store))

  /** t49 through the persisted index — the production RAG read path:
    * probe queries derive from the STORE's df table, the query side
    * tokenizes (request-sized), the corpus text is never touched. */
  def t51Bm25StoreMultiTerm(spark: SparkSession, dir: String): DataFrame =
    overBm25Store(spark, dir)(store =>
      graft.text.Retrieval.bm25QueryTopKFromStore(spark, store,
        graft.text.Retrieval.probeQueriesFromStore(spark, store)))

  /** Dense+sparse hybrid retrieval via RRF (r10 verdict #2): fuse the
    * exact-cosine top-10 for queries vec_id ∈ {0,1,2} (the
    * SQL-expressible dense side, so DuckDB can replay the whole
    * composition) with the t49 multi-term BM25 top-10 for probe queries
    * 0–2. Fixture convention: the dense qid and the sparse query_id
    * spaces are aligned numerically (query 0 ↔ vec 0 …), and doc ids
    * fuse across the two tables by value — production calls pass two
    * shortlists over one aligned id space instead. */
  def t52HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val docs = Tables(spark, dir, "documents")
    val dense = Similarity.bruteForceTopK(emb, col("vec_id") < 3, 10)
      .select(col("qid").as("query_id"), col("rank"),
        col("nid").as("doc_id"))
    val sparse = graft.text.Retrieval.bm25QueryTopK(docs,
      graft.text.Retrieval.probeQueries(docs))
      .select(col("query_id"), col("rank"), col("doc_id"))
    graft.text.Retrieval.rrfFuse(dense, sparse, k = 10)
  }

  /** t55 (round 13): BM25 with pseudo-relevance-feedback query
    * expansion — each probe query's top-3 documents nominate expansion
    * terms (within-document rate, the query's own terms excluded, top
    * 2 per query), and the union term set re-scores through the same
    * Okapi arithmetic ([[graft.text.Retrieval.bm25PrfTopK]]). Every
    * step is exact integer/double arithmetic, so DuckDB replays the
    * whole two-pass pipeline. */
  def t55PrfExpansion(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    graft.text.Retrieval.bm25PrfTopK(docs,
      graft.text.Retrieval.probeQueries(docs))
  }

  /** t55 through the persisted index (the t50/t51 discipline: same
    * oracle text, so stored-vs-scratch divergence is structurally
    * impossible); the two scoring passes prune to their term sets'
    * buckets. */
  def t56PrfStore(spark: SparkSession, dir: String): DataFrame =
    overBm25Store(spark, dir, withFwd = true)(store =>
      graft.text.Retrieval.bm25PrfTopKFromStore(spark, store,
        graft.text.Retrieval.probeQueriesFromStore(spark, store)))

  /** t57 (round 13): ranked-list evaluation
    * ([[graft.text.Retrieval.rankEval]]) — nDCG@10 / MRR / Recall@10 of
    * the t49 BM25 run against graded judgments derived from the corpus
    * itself (grade = how many of the query's terms the document
    * contains — deterministic on any regenerated corpus, exactly
    * recomputable in SQL). The offline eval a retrieval deployment
    * runs on every index or dial change. */
  def t57RankEval(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.{Retrieval, TextAnalysis}
    val docs = Tables(spark, dir, "documents")
    val queries = Retrieval.probeQueries(docs)
    val run = Retrieval.bm25QueryTopK(docs, queries)
      .select("query_id", "rank", "doc_id")
    val qterms = queries.select(col("query_id"),
      explode(array_distinct(TextAnalysis.tokens(col("query_text"))))
        .as("term"))
    // the qrels' tf is the SAME session-cached frame the run's scorer
    // reads (round 14): one corpus tokenize feeds run and judgments
    val (tf, _) = Retrieval.cachedIndexRows(docs)
    val qrels = qterms.join(tf, "term")
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("grade"))
    Retrieval.rankEval(run, qrels, k = 10)
  }

  /** t58 (round 13): query-likelihood retrieval with Dirichlet
    * smoothing over the probe queries
    * ([[graft.text.Retrieval.lmTopK]]) — the second lexical scoring
    * family next to BM25, same fixture, same determinism discipline. */
  def t58LmDirichlet(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    graft.text.Retrieval.lmTopK(docs,
      graft.text.Retrieval.probeQueries(docs))
  }

  /** t58 through the persisted index (shared oracle text, the t50/t51
    * discipline); ctf amortizes in the state-keyed cache like df. */
  def t59LmStore(spark: SparkSession, dir: String): DataFrame =
    overBm25Store(spark, dir)(store =>
      graft.text.Retrieval.lmTopKFromStore(spark, store,
        graft.text.Retrieval.probeQueriesFromStore(spark, store)))

  /** t60 (round 13): THREE-list reciprocal-rank fusion — exact-cosine
    * dense + BM25 + Dirichlet query likelihood through
    * [[graft.text.Retrieval.rrfFuseAll]], the N-list generalization's
    * oracle-checkable form (its 2-list bit-equality to rrfFuse is
    * spec-pinned; this row makes the N>2 path itself a DuckDB-replayed
    * contract). Same aligned-id fixture convention as t52. */
  def t60TriFusion(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val docs = Tables(spark, dir, "documents")
    val queries = graft.text.Retrieval.probeQueries(docs)
    val dense = Similarity.bruteForceTopK(emb, col("vec_id") < 3, 10)
      .select(col("qid").as("query_id"), col("rank"),
        col("nid").as("doc_id"))
    val sparse = graft.text.Retrieval.bm25QueryTopK(docs, queries)
      .select(col("query_id"), col("rank"), col("doc_id"))
    val lm = graft.text.Retrieval.lmTopK(docs, queries)
      .select(col("query_id"), col("rank"), col("doc_id"))
    graft.text.Retrieval.rrfFuseAll(Seq(dense, sparse, lm), k = 10)
  }

  /** t54 (round 13, r12 verdict #4): the SPARSE-ONLY serve mode — the
    * same [[graft.text.Retrieval.hybridTopKFromStoresExternal]] entry
    * the server runs, with `lists = Seq("sparse")`: only the BM25
    * retriever executes (the IVF/PQ store paths are passed but never
    * touched — deliberately non-existent here, pinning that a
    * sparse-only deployment needs no dense stores), and the shortlist
    * reshapes through the monotone RRF transform into the unified
    * serving schema (dense_rank null, n_lists 1). SQL-expressible end
    * to end, so DuckDB replays the whole mode. */
  def t54SparseServe(spark: SparkSession, dir: String): DataFrame =
    overBm25Store(spark, dir)(store =>
      graft.text.Retrieval.hybridTopKFromStoresExternal(spark, store,
        ivfDir = s"$store/no_ivf", pqDir = s"$store/no_pq",
        graft.text.Retrieval.probeQueriesFromStore(spark, store),
        lists = Seq("sparse")))

  /** t61 (round 14, r13 verdict #2): the LM-ONLY serve mode — the same
    * serving entry with `lists = Seq("lm")`: only the Dirichlet
    * query-likelihood retriever runs (dense store paths deliberately
    * non-existent, the t54 property), and the shortlist reshapes
    * through the monotone RRF transform into the unified serving schema
    * (dense/sparse ranks null, `lm_rank` = rank, n_lists 1). */
  def t61LmServe(spark: SparkSession, dir: String): DataFrame =
    overBm25Store(spark, dir)(store =>
      graft.text.Retrieval.hybridTopKFromStoresExternal(spark, store,
        ivfDir = s"$store/no_ivf", pqDir = s"$store/no_pq",
        graft.text.Retrieval.probeQueriesFromStore(spark, store),
        lists = Seq("lm")))

  /** t62 (round 14): the SPARSE+LM 2-list serve — a genuinely FUSED
    * N-list mode with no dense half at all (the store paths are never
    * touched): BM25 and Dirichlet QL shortlists off ONE persisted
    * postings store, fused through [[graft.text.Retrieval.rrfFuseNamed]]
    * in canonical list order with both ranks carried as provenance.
    * SQL-expressible end to end, so DuckDB replays the entire mode —
    * the oracle-checkable form of the N-list serving path whose 3-list
    * shape t63 golden-pins with a real ANN dense list. */
  def t62SparseLmServe(spark: SparkSession, dir: String): DataFrame =
    overBm25Store(spark, dir)(store =>
      graft.text.Retrieval.hybridTopKFromStoresExternal(spark, store,
        ivfDir = s"$store/no_ivf", pqDir = s"$store/no_pq",
        graft.text.Retrieval.probeQueriesFromStore(spark, store),
        lists = Seq("sparse", "lm")))

  /** t63 (round 14, bench + golden): the full THREE-list serve off
    * persisted stores — IVF-PQ dense + BM25 + Dirichlet QL fused
    * through the one serving fusion path — the t53 discipline extended
    * to the round's widened `lists`. External requests are the probe
    * queries paired with the aligned query vectors (the t52 fixture
    * convention). Golden-pinned because the dense shortlist is a
    * seeded-KMeans product no SQL oracle reproduces; QueryServeSpec
    * additionally pins the served rows EQUAL to the rrfFuseNamed
    * composition of the three store-served shortlists. */
  def t63TriStoreServe(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_tri_store").toString
    val docs = Tables(spark, dir, "documents")
    val emb = Tables(spark, dir, "embeddings")
    // one-shot temp store, no PRF in the serve: skip the forward index
    // (the overBm25Store withFwd ruling)
    graft.text.Retrieval.buildIndex(spark, docs, s"$root/corpus",
      withFwd = false)
    val (ivf, pq) = buildIvfPqConcurrently(emb)
    graft.similarity.IndexStore.saveIvf(ivf, s"$root/ivf")
    graft.similarity.IndexStore.savePq(pq, s"$root/pq")
    ivf.release(); pq.release()
    val queries = graft.text.Retrieval
      .probeQueriesFromStore(spark, s"$root/corpus")
      .join(emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding")),
        "query_id")
    val out = graft.text.Retrieval.hybridTopKFromStoresExternal(spark,
      s"$root/corpus", s"$root/ivf", s"$root/pq", queries,
      nprobe = 4, rerank = 50, lists = Seq("dense", "sparse", "lm"))
    // q60 temp-store discipline: materialize the bounded result, then
    // drop the stores it was served from
    val rows = out.collect().toSeq
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), out.schema)
  }

  /** t64 (round 14, r13 ADVICE): [[graft.text.Retrieval.rankEval]]'s
    * judged-but-unserved contract — the t57 eval with the RUN restricted
    * to queries 0–1 while the judgments still cover all three probe
    * queries, so query 2 is judged yet absent from the run and must
    * surface as a zero-metric row (its true n_rel attached) instead of
    * vanishing and inflating every mean a consumer takes. */
  def t64RankEvalHoldout(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.{Retrieval, TextAnalysis}
    val docs = Tables(spark, dir, "documents")
    val queries = Retrieval.probeQueries(docs)
    val run = Retrieval.bm25QueryTopK(docs, queries)
      .filter(col("query_id") < 2)
      .select("query_id", "rank", "doc_id")
    val qterms = queries.select(col("query_id"),
      explode(array_distinct(TextAnalysis.tokens(col("query_text"))))
        .as("term"))
    // the qrels' tf is the SAME session-cached frame the run's scorer
    // reads (round 14): one corpus tokenize feeds run and judgments
    val (tf, _) = Retrieval.cachedIndexRows(docs)
    val qrels = qterms.join(tf, "term")
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("grade"))
    Retrieval.rankEval(run, qrels, k = 10)
  }

  /** The production-geometry raw form (bench + golden): the dense side
    * is the real IVF-PQ composite probe over the built indexes, the
    * sparse side the multi-term BM25 scorer — the hybrid a deployment
    * actually serves; golden-pinned because the ANN shortlist is a
    * seeded-KMeans product no SQL oracle can reproduce. */
  def t52RawHybridAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val docs = Tables(spark, dir, "documents")
    val (ivf, pq) = buildIvfPqConcurrently(emb)
    val dense = Similarity.ivfPqTopK(ivf, pq, emb, col("vec_id") < 3,
      topK = 10, nprobe = 4, rerank = 50)
      .select(col("qid").as("query_id"), col("rank"),
        col("nid").as("doc_id"))
    val sparse = graft.text.Retrieval.bm25QueryTopK(docs,
      graft.text.Retrieval.probeQueries(docs))
      .select(col("query_id"), col("rank"), col("doc_id"))
    graft.text.Retrieval.rrfFuse(dense, sparse, k = 10)
  }

  /** The t52r hybrid served ENTIRELY from persisted stores (round 11) —
    * the end state the whole index discipline builds toward: the BM25
    * tf/dl frames, the IVF assignment, and the PQ codes/codebooks are
    * all built ONCE and saved ([[graft.text.Retrieval.buildIndex]],
    * [[graft.similarity.IndexStore]]), then one
    * [[graft.text.Retrieval.hybridTopKFromStores]] call serves the
    * probe-query batch off the loaded stores alone — no raw text, no
    * embeddings table, no quantizer fit at query time. Golden-pinned
    * (the dense half is a seeded-KMeans product no SQL oracle can
    * reproduce); HybridStoreSpec additionally pins it EQUAL to the
    * in-memory t52r composition, so the persisted serve can never
    * drift from the plans the goldens and the t52 oracle already
    * vouch for. */
  def t53HybridStoreServe(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_hybrid_store").toString
    val docs = Tables(spark, dir, "documents")
    val emb = Tables(spark, dir, "embeddings")
    // one-shot temp store, no PRF in the serve: skip the forward index
    // (the overBm25Store withFwd ruling)
    graft.text.Retrieval.buildIndex(spark, docs, s"$root/corpus",
      withFwd = false)
    val (ivf, pq) = buildIvfPqConcurrently(emb)
    graft.similarity.IndexStore.saveIvf(ivf, s"$root/ivf")
    graft.similarity.IndexStore.savePq(pq, s"$root/pq")
    ivf.release(); pq.release()
    val out = graft.text.Retrieval.hybridTopKFromStores(spark,
      s"$root/corpus", s"$root/ivf", s"$root/pq",
      graft.text.Retrieval.probeQueriesFromStore(spark, s"$root/corpus"),
      col("vec_id") < 3, nprobe = 4, rerank = 50)
    // q60 temp-store discipline: materialize the bounded result, then
    // drop the stores it was served from
    val rows = out.collect().toSeq
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), out.schema)
  }

  /** External-query retrieval contract (s23, round 11): until now every
    * ANN/exact entry point queried the corpus with ITSELF (`queryFilter`
    * over the indexed rows) — but a deployed retrieval system's queries
    * arrive from an encoder, not from the corpus. Fixture: corpus
    * vectors 0–2 re-labeled into a DISJOINT id space (+10000), served
    * through [[graft.similarity.Similarity.bruteForceTopKQueries]] with
    * no self-exclusion — so each query's rank-1 hit is its own source
    * row at cos 1.0, proving (a) nothing couples a qid to corpus
    * membership and (b) the member-form's self-exclusion really is a
    * semantic choice, not an accident of the plan. DuckDB replays the
    * whole thing (the s02 oracle minus the `qid <> nid` filter, ids
    * offset). */
  def s23ExternalTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    Similarity.bruteForceTopKQueries(emb, queries, k = 10)
      .orderBy("qid", "rank")
  }

  /** s24 (round 12, r11 verdict #5): the SRP external-query pipeline —
    * the one ANN family still member-only after s23 — at the ZERO-plane
    * dial: one bucket, so the candidate equi-join visits the whole
    * corpus and the result is exact by construction (the s03a audit
    * applied to [[graft.similarity.Similarity.srpBucketTopKQueries]]).
    * DuckDB's external brute oracle hash-checks the external side's
    * bucket hashing, candidate join, and ranking end to end; the
    * production 8-plane setting is pinned by ExternalQuerySpec's
    * row-equality against the golden-covered member form. */
  def s24ExternalSrp(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    Similarity.srpBucketTopKQueries(emb, queries, k = 10, numPlanes = 0)
      .orderBy("qid", "rank")
  }

  /** The production-geometry raw form (bench + golden): the same
    * external query batch through the persisted-topology composite probe
    * ([[graft.similarity.Similarity.ivfPqTopKQueries]] — cell routing,
    * ADC tables, banded shortlist, exact rerank — with ONE external
    * frame feeding both the probe and rerank sides). */
  def s23RawExternalIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val (ivf, pq) = buildIvfPqConcurrently(emb)
    val queries = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    Similarity.ivfPqTopKQueries(ivf, pq, emb, queries, topK = 10,
      nprobe = 4, rerank = 50).orderBy("qid", "rank")
  }

  /** Per-label centroid-distance outlier profile (see
    * [[graft.similarity.Similarity.centroidDistanceProfile]]). */
  def s09CentroidDistance(spark: SparkSession, dir: String): DataFrame =
    Similarity.centroidDistanceProfile(Tables(spark, dir, "embeddings"))

  /** DSIR-flavoured importance weights (Xie et al. 2023, hashed-ngram
    * importance resampling, simplified to smoothed unigram LMs — the
    * feature hashing exists to bound vocabulary, which the add-one
    * smoothing over the observed vocab already does here): per document,
    * the mean log-likelihood ratio of its tokens under a target-domain
    * unigram LM (`source = 'src0'` stands in for the curated target) vs
    * the raw-corpus LM. Positive ⇒ the doc looks more like the target
    * than the average corpus doc; ranking by this score and keeping the
    * top mass IS importance resampling for pretraining-data selection.
    *
    * Scale shape: one token explode feeds BOTH distributions (the target
    * tally rides the same aggregate as the raw tally — target ⊆ corpus,
    * so a `when(source=target)` conditional sum avoids a second scan);
    * the vocab-sized ratio frame joins back to the exploded tokens on the
    * token key (plain equi-join — vocab is ≪ corpus but can exceed
    * broadcast limits at 100 TB, so no broadcast hint: AQE picks one when
    * it fits). Per-token ratios are rounded to 6 dp and summed as
    * DECIMAL(18,6) — exact, order-invariant arithmetic, so the score
    * hash-matches any engine regardless of partition order.
    *
    * ln() is not an IEEE correctly-rounded primitive (unlike the √ t22
    * restricts itself to), so a 1-ulp JVM-vs-libm difference could in
    * principle flip a 6-dp llr boundary. The exposure at the COMPARED
    * value is smaller than it looks: a flipped llr shifts `sum_llr` by
    * 1e-6, the per-doc mean by 1e-6/n_tokens ≈ 1e-8, which changes the
    * 4-dp `dsir_score` only when the mean also sits within 1e-8 of a
    * 5e-5 rounding boundary — a double coincidence at ~1e-9 per corpus.
    * Accepted and documented rather than re-formulated, because the LLR
    * IS the DSIR statistic. */
  def t20ImportanceWeights(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.Caches.persistReplacing("t20Toks",
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("tok")))
    // the vocab tally feeds BOTH the 1-row totals and the ratio frame —
    // persist it so the corpus-wide token aggregation runs once
    val counts = graft.Caches.persistReplacing("t20Counts",
      toks.groupBy("tok").agg(
        count(lit(1)).as("n_raw"),
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("n_tgt")))
    val tot = counts.agg(sum("n_raw").as("nr"), sum("n_tgt").as("nt"),
      count(lit(1)).as("v"))
    val ratio = counts.crossJoin(broadcast(tot))
      .select(col("tok"),
        round(log(((col("n_tgt") + 1).cast("double") / (col("nt") + col("v")))
          / ((col("n_raw") + 1).cast("double") / (col("nr") + col("v")))), 6)
          .cast("decimal(18,6)").as("llr"))
    toks.join(ratio, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("llr").as("sum_llr"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("sum_llr").cast("double") / col("n_tokens"), 4)
          .as("dsir_score"))
      .orderBy("doc_id")
  }

  /** Temperature-sampled language mixing (the multilingual-pretraining
    * rebalance of mT5/XLM-R: sample languages ∝ p^α instead of p, lifting
    * low-resource languages without flattening the mix): per language,
    * the temperature share q_l = √n_l / Σ√n_m (α = 0.5 — chosen because
    * √ is an IEEE-correctly-rounded primitive in every engine, unlike
    * pow(x, 0.3), so the cut replays bit-identically anywhere), the
    * document sampling rate min(1, q_l·N/n_l) (capped — this operator
    * only downsamples; upsampling is a repetition decision for the data
    * loader), and the realized keep count under the same md5 micro-bucket
    * rule as t18. Σ√n_m is summed as rounded DECIMAL so the normalizer is
    * order-invariant — a 1-ulp drift there would flip cut boundaries.
    * Same two-pass shape as t18: per-group budgets need the global
    * normalizer before per-row decisions; the rate frame broadcasts. */
  def t22TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("b", Sampling.fineHashBucket(col("doc_id")))
    val g = d.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("grp_tokens"))
      .withColumn("rt",
        round(sqrt(col("grp_tokens").cast("double")), 6).cast("decimal(18,6)"))
    val tot = g.agg(sum("grp_tokens").as("nn"), sum("rt").as("z"))
    val r = g.crossJoin(broadcast(tot))
      .withColumn("temp_share",
        col("rt").cast("double") / col("z").cast("double"))
      .withColumn("rate",
        least(lit(1.0), col("temp_share") * col("nn") / col("grp_tokens")))
      .withColumn("cut", floor(col("rate") * 1000000).cast("long"))
    d.join(broadcast(r), Seq("lang"))
      .groupBy("lang", "n_docs", "grp_tokens", "nn", "temp_share", "rate", "cut")
      .agg(sum(when(col("b") < col("cut"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("lang"), col("n_docs"), col("grp_tokens"),
        round(col("grp_tokens").cast("double") / col("nn"), 4).as("raw_share"),
        round(col("temp_share"), 4).as("temp_share"),
        round(col("rate"), 4).as("sample_rate"),
        col("n_kept"))
      .orderBy("lang")
  }

  /** t22's temperature mix with the budget t25 says it SHOULD consume:
    * language weights computed over USABLE tokens only (t17's Gopher
    * conjunction as the per-row gate), unusable docs dropped before any
    * budget math. On corpora where quality rates differ by language —
    * the normal case — mixing on raw token counts systematically
    * over-allocates the noisy languages; this is the corrected operator.
    * Same two-pass broadcast shape and decimal-pinned √-normalizer as
    * t22. */
  def t31UsableTemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val okLength = col("n_words") >= 50 && col("n_words") <= 100000
    val okMeanLen = col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0
    val okAlpha = col("frac_alpha_words") >= 0.8
    val okStop = col("n_stopwords") >= 2
    val d0 = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_words"),
        TextAnalysis.meanWordLen(col("text")).as("mean_word_len"),
        TextAnalysis.alphaWordFraction(col("text")).as("frac_alpha_words"),
        TextAnalysis.stopwordCount(col("text")).as("n_stopwords"))
      .filter(col("n_words") > 0)
      .withColumn("keep", okLength && okMeanLen && okAlpha && okStop)
    val totals = d0.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val usable = d0.filter(col("keep"))
      .select(col("doc_id"), col("lang"), col("n_words").cast("long").as("n_tok"))
      .withColumn("b", Sampling.fineHashBucket(col("doc_id")))
    val g = usable.groupBy("lang")
      .agg(count(lit(1)).as("usable_docs"), sum("n_tok").as("usable_tokens"))
      .withColumn("rt",
        round(sqrt(col("usable_tokens").cast("double")), 6).cast("decimal(18,6)"))
    val tot = g.agg(sum("usable_tokens").as("nn"), sum("rt").as("z"))
    val r = g.crossJoin(broadcast(tot))
      .withColumn("temp_share",
        col("rt").cast("double") / col("z").cast("double"))
      .withColumn("rate",
        least(lit(1.0), col("temp_share") * col("nn") / col("usable_tokens")))
      .withColumn("cut", floor(col("rate") * 1000000).cast("long"))
    val kept = usable.join(broadcast(r), Seq("lang"))
      .groupBy("lang", "usable_docs", "usable_tokens", "temp_share", "rate", "cut")
      .agg(sum(when(col("b") < col("cut"), 1L).otherwise(0L)).as("n_kept"))
    // drive the report from TOTALS: a language whose every doc fails the
    // gate must surface as a zero row (the degraded-slice alarm), not
    // vanish — t24's "emptied cells kept as zero rows" convention
    totals.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("usable_docs"), lit(0L)).as("usable_docs"),
        coalesce(col("usable_tokens"), lit(0L)).as("usable_tokens"),
        round(coalesce(col("temp_share"), lit(0.0)), 4).as("temp_share"),
        round(coalesce(col("rate"), lit(0.0)), 4).as("sample_rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("lang")
  }

  /** The SELECTION funnel composed end to end — the companion to t15's
    * cleaning funnel, for the other half of curation (not "is this doc
    * good" but "how much of each slice do we take"): per (source, lang),
    * documents surviving (1) the per-source quota (t21's md5-order cap,
    * here 15) and then (2) temperature-sampled language mixing (t22's
    * α=0.5 cut, recomputed over the quota survivors — rates must reflect
    * what the quota left, not the raw corpus). One row per group with the
    * population at each stage; DuckDB must reproduce the chained window
    * rank + √-share cut to match, which makes this the hardest selection
    * check in the suite. Same scale shapes as its parts: a slim-projection
    * rank, one re-aggregation for the post-quota language budgets, and a
    * broadcast rate frame — the corpus text is never read at all. */
  def t24SelectionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(Sampling.fineHashBucket(col("doc_id")), col("doc_id"))
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("b", Sampling.fineHashBucket(col("doc_id")))
    // the capped frame feeds BOTH the language budgets and the survivor
    // counts — persist it so the rank (the expensive subtree) runs once,
    // not once per branch (same rule as t15's stage persists)
    val capped = graft.Caches.persistReplacing("t24Capped",
      d.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 15))
    val g = capped.groupBy("lang").agg(sum("n_tok").as("grp_tokens"))
      .withColumn("rt",
        round(sqrt(col("grp_tokens").cast("double")), 6).cast("decimal(18,6)"))
    val tot = g.agg(sum("grp_tokens").as("nn"), sum("rt").as("z"))
    val r = g.crossJoin(broadcast(tot))
      .withColumn("rate",
        least(lit(1.0), (col("rt").cast("double") / col("z").cast("double"))
          * col("nn") / col("grp_tokens")))
      .withColumn("cut", floor(col("rate") * 1000000).cast("long"))
      .select("lang", "cut")
    // LEFT join: a (source, lang) cell the quota emptied entirely still
    // belongs in the funnel — with zero survivors, not a missing row
    d.groupBy("source", "lang").agg(count(lit(1)).as("n_docs"))
      .join(
        capped.join(broadcast(r), Seq("lang"))
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("after_cap"),
            sum(when(col("b") < col("cut"), 1L).otherwise(0L)).as("after_temp")),
        Seq("source", "lang"), "left")
      .na.fill(0L, Seq("after_cap", "after_temp"))
      .orderBy("source", "lang")
  }

  /** Per-source document cap (C4/RefinedWeb-style per-domain quota): keep
    * at most `cap` documents per source, chosen by the engine-portable md5
    * micro-bucket (then doc_id) — membership is a pure function of the
    * document, reproducible anywhere and stable under corpus growth
    * (docs only leave a source's quota when a smaller-bucket doc arrives,
    * never because partitioning changed). The rank runs over a slim
    * 2-column projection; at 100 TB the per-source sort is the classic
    * per-group top-K — bounded output (cap·n_sources rows), skew-safe
    * because the window sorts WITHIN each source's partitions after a
    * hash exchange on a low-cardinality key whose groups are independent. */
  def t21SourceCap(spark: SparkSession, dir: String, cap: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(Sampling.fineHashBucket(col("doc_id")), col("doc_id"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .orderBy("source", "rn")
  }

  /** Vocabulary-growth (Heaps'-law) curve: at each corpus decile (docs
    * taken in doc_id order), cumulative token count vs cumulative DISTINCT
    * token count — the saturation curve that tells a data-mixing run how
    * much lexical novelty each additional corpus slice buys. Computed
    * without any cumulative distinct scan: a token's contribution to the
    * running vocabulary is fully described by its FIRST occurrence
    * (min doc_id per token — one shuffle on token), and per-doc token
    * totals are a second grain aggregate; both then count conditionally
    * against the 10 broadcast decile cutoffs, so the curve costs two
    * shuffles regardless of corpus size, never a 10-pass re-scan. */
  def t32VocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
    // doc_ids are the contiguous ingest sequence 0..N-1 (TESTDATA.md), so
    // decile d covers doc_id < ceil(N*d/10) — exact integer arithmetic
    val cuts = Tables(spark, dir, "documents")
      .agg(count(lit(1)).as("n_docs"))
      .select(explode(sequence(lit(1), lit(10))).as("decile"), col("n_docs"))
      .select(col("decile"),
        expr("(n_docs * decile + 9) div 10").as("cutoff"))
    val vocab = toks.groupBy("token").agg(min(col("doc_id")).as("first_doc"))
      .crossJoin(broadcast(cuts))
      .filter(col("first_doc") < col("cutoff"))
      .groupBy("decile", "cutoff")
      .agg(count(lit(1)).as("vocab"))
    val total = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
      .crossJoin(broadcast(cuts.select("decile", "cutoff")))
      .filter(col("doc_id") < col("cutoff"))
      .groupBy("decile")
      .agg(sum(col("n_tok")).as("tokens"))
    // Ratio emitted as exact parts-per-million (round-half-up integer
    // arithmetic: (2·v·1e6 + t) div 2t) — a double division rounded to 6dp
    // here diverged from DuckDB in the low-order float bits (r4's one hash
    // mismatch); integers agree across engines by construction.
    vocab.join(total, Seq("decile"))
      .select(col("decile"), col("cutoff").as("n_docs"), col("tokens"),
        col("vocab"),
        expr("(vocab * 2000000L + tokens) div (tokens * 2)").as("ttr_ppm"))
      .orderBy("decile")
  }

  /** Zipf's-law fit of the corpus token-frequency distribution: OLS of
    * ln(freq) on ln(rank) over the top `topN` tokens — the slope (ideally
    * ≈ −1 for natural text) is the one-number summary of lexical skew that
    * data-mixing reports track, and a near-flat slope flags synthetic or
    * template-heavy corpora. Ranks are deterministic (freq desc, token
    * asc). Same sufficient-statistics discipline as q37: per-row ln() is
    * one libm call on the same double in either engine, the sums run at
    * DecimalType so they are order-invariant, and the closed-form
    * slope/intercept/r² round at 4 dp — far above any last-ulp libm
    * divergence. One token-grain shuffle + one topN-row window; the
    * aggregate is six numbers regardless of vocabulary size. */
  def t33ZipfFit(spark: SparkSession, dir: String, topN: Int = 100): DataFrame = {
    val tf = Tables(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    // top-N cut as orderBy+limit — Spark plans it TakeOrderedAndProject
    // (per-partition heaps, fully parallel), so the 100M-row vocabulary a
    // 100 TB corpus implies never funnels through one sorted task; only
    // the ≤topN survivors see a window, and that window declares a
    // partition (single constant key over ≤topN rows) so no global-sort
    // WindowExec appears anywhere in the plan
    val top = tf.orderBy(desc("freq"), asc("token")).limit(topN)
    val wr = Window.partitionBy(lit(0)).orderBy(desc("freq"), asc("token"))
    val ranked = top.withColumn("rank", row_number().over(wr))
      .select(log(col("rank").cast("double")).as("x"),
        log(col("freq").cast("double")).as("y"))
    val dec = DecimalType(27, 12)
    val m = ranked.agg(
      count(lit(1)).cast("double").as("nn"),
      sum(col("x").cast(dec)).cast("double").as("sx"),
      sum(col("y").cast(dec)).cast("double").as("sy"),
      sum((col("x") * col("y")).cast(dec)).cast("double").as("sxy"),
      sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx"),
      sum((col("y") * col("y")).cast(dec)).cast("double").as("syy"))
    val covN = col("nn") * col("sxy") - col("sx") * col("sy")
    val varX = col("nn") * col("sxx") - col("sx") * col("sx")
    val varY = col("nn") * col("syy") - col("sy") * col("sy")
    m.select(
      col("nn").cast("long").as("n_tokens"),
      round(covN / varX, 4).as("zipf_slope"),
      round((col("sy") - (covN / varX) * col("sx")) / col("nn"), 4)
        .as("intercept"),
      round((covN * covN) / (varX * varY), 4).as("r2"))
  }

  /** N-gram novelty curve: per corpus decile (docs in doc_id order), how
    * much of the decile's shingle mass is NEW — first seen in that decile
    * — vs recycled from earlier slices. The memorization/diversity
    * companion to t32's vocabulary curve at phrase granularity: a decile
    * whose novelty collapses is re-crawled or templated content that
    * dedup should reclaim. Same two-shuffle shape as t32 (min-doc_id per
    * shingle + per-doc set sizes, both counted against 10 broadcast
    * cutoffs); per-decile deltas come from a lag window over the 10-row
    * aggregate; the novelty ratio is exact half-up integer ppm, immune to
    * engine float drift. Rides the session [[Dedup.shingleTable]]. */
  def t35NgramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val sh = Dedup.shingleTable(docs)
    val cuts = docs.agg(count(lit(1)).as("n_docs"))
      .select(explode(sequence(lit(1), lit(10))).as("decile"), col("n_docs"))
      .select(col("decile"), expr("(n_docs * decile + 9) div 10").as("cutoff"))
    // cumulative distinct shingles (first occurrence before each cutoff)
    val firstDoc = sh.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    val cumNew = firstDoc.crossJoin(broadcast(cuts))
      .filter(col("first_doc") < col("cutoff"))
      .groupBy("decile", "cutoff").agg(count(lit(1)).as("cum_distinct"))
    // cumulative shingle SLOTS (per-doc distinct set sizes)
    val cumSlots = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      .crossJoin(broadcast(cuts.select("decile", "cutoff")))
      .filter(col("doc_id") < col("cutoff"))
      .groupBy("decile").agg(sum(col("n_sh")).as("cum_slots"))
    val w = Window.orderBy("decile")
    // left-join from the 10-row cuts frame: a decile where NO shingle's
    // first_doc (or no doc) falls below the cutoff — e.g. every doc in
    // the first slice shorter than 3 tokens — must still appear as a
    // zero row, not silently drop off the curve (the oracle mirrors this)
    cuts.select(col("decile"), col("cutoff"))
      .join(cumNew.select("decile", "cum_distinct"), Seq("decile"), "left")
      .join(cumSlots, Seq("decile"), "left")
      .select(col("decile"), col("cutoff").as("n_docs"),
        coalesce(col("cum_slots"), lit(0L)).as("cum_slots"),
        coalesce(col("cum_distinct"), lit(0L)).as("cum_distinct"))
      .select(col("decile"), col("n_docs"),
        col("cum_slots"), col("cum_distinct"),
        (col("cum_distinct") -
          coalesce(lag(col("cum_distinct"), 1).over(w), lit(0L)))
          .as("new_shingles"),
        (col("cum_slots") -
          coalesce(lag(col("cum_slots"), 1).over(w), lit(0L)))
          .as("slots"))
      .select(col("decile"), col("n_docs"), col("cum_slots"),
        col("cum_distinct"), col("new_shingles"), col("slots"),
        expr("case when slots = 0 then 0L else " +
          "(new_shingles * 2000000L + slots) div (slots * 2) end")
          .as("novelty_ppm"))
      .orderBy("decile")
  }

  /** Per-source KL divergence from the corpus token distribution — the
    * drift/distinctiveness monitor a mixing run reads before reweighting
    * (a source with near-zero KL duplicates the corpus voice; an extreme
    * KL is jargon or noise). KL(p_source ‖ p_corpus) = Σ p_s·ln(p_s/p_c),
    * finite by construction since every source token is in the corpus.
    * Two shuffles — (source, token) grain then token grain — with the
    * source totals broadcast back; the ln terms follow the t33 decimal
    * discipline (identical IEEE inputs per engine, order-invariant
    * DECIMAL sums, 4 dp output). */
  def t36SourceKlDrift(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("token"))
    val st = toks.groupBy("source", "token").agg(count(lit(1)).as("cnt"))
    val stot = st.groupBy("source")
      .agg(sum(col("cnt")).as("tot_s"), count(lit(1)).as("vocab_s"))
    val ct = st.groupBy("token").agg(sum(col("cnt")).as("ccnt"))
    val ctot = st.agg(sum(col("cnt")).as("ctot"))
    val dec = DecimalType(27, 12)
    val ps = col("cnt").cast("double") / col("tot_s")
    val pc = col("ccnt").cast("double") / col("ctot")
    st.join(ct, "token")
      .join(broadcast(stot), "source")
      .crossJoin(broadcast(ctot))
      .select(col("source"), col("tot_s"), col("vocab_s"),
        (ps * log(ps / pc)).cast(dec).as("term"))
      .groupBy("source", "tot_s", "vocab_s")
      .agg(round(sum(col("term")).cast("double"), 4).as("kl_vs_corpus"))
      .select(col("source"), col("tot_s").as("n_tokens"),
        col("vocab_s").as("vocab"), col("kl_vs_corpus"))
      .orderBy("source")
  }

  /** Cross-source n-gram overlap matrix: Jaccard between each source
    * pair's DISTINCT shingle sets — the corpus-composition diagnostic that
    * finds sources mirroring each other (a crawl and its re-crawl, two
    * dumps of the same site) before per-document dedup spends a corpus
    * self-join on them. Shingle sets collapse to (source, hash) — one
    * explode + distinct at source grain — and the pair join is an
    * inverted index over hashes, so cost scales with shared-shingle
    * volume, never |src1|·|src2|; output is at most (n_sources choose 2)
    * rows. Rides the session [[Dedup.shingleTable]] cache when a funnel
    * already built it. */
  def t34SourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val srcSh = Dedup.shingleTable(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select(col("source"), col("g")).distinct()
    val sizes = srcSh.groupBy("source").agg(count(lit(1)).as("sz"))
    val common = srcSh.as("a")
      .join(srcSh.as("b"), col("a.g") === col("b.g") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("source").as("s1"), col("sz").as("z1")), "s1")
      .join(sizes.select(col("source").as("s2"), col("sz").as("z2")), "s2")
      .select(col("s1"), col("s2"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("z1") + col("z2") - col("n_common")), 4).as("jaccard"))
      .orderBy("s1", "s2")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res,
    * IPL 2006): each doc draws key ln(u)/w — u uniform, w its weight —
    * and the k largest keys are a weighted sample without replacement.
    * Here w is the token count (sample proportional to training mass) and
    * u is derived from the md5 of doc_id instead of a live RNG, making
    * the draw a PURE FUNCTION of the data: reproducible across runs,
    * engines and cluster layouts, and — like [[Sampling.hashBucket]] —
    * replayable anywhere without storing the sample. The top-k is
    * orderBy+limit (TakeOrderedAndProject: per-partition heaps of k, one
    * k-row merge — no global sort, no shuffle of the corpus), and the
    * rank window runs over the ≤k-row result, the t33 discipline. */
  def t37WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val k = 100
    val keyed = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        greatest(TextAnalysis.tokenCount(col("text")).cast("long"), lit(1L))
          .as("weight"))
      // u in (0,1): 32-bit md5 prefix + 0.5, over 2^32 — exactly the
      // engine-portable t04 construction, at full 32-bit resolution
      .withColumn("u",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long").cast("double") + lit(0.5)) / lit(4294967296.0))
      .withColumn("key", log(col("u")) / col("weight").cast("double"))
    val top = keyed.orderBy(desc("key"), asc("doc_id")).limit(k)
    // rank over the ≤k-row result; partitionBy(lit(0)) declares the single
    // partition (t33 discipline — never an unpartitioned WindowExec)
    top
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
          .orderBy(desc("key"), asc("doc_id"))).cast("int"))
      .select(col("rank"), col("doc_id"), col("weight"),
        round(col("key"), 6).as("key"))
      .orderBy("rank")
  }

  /** Exact per-language k-quota sample ([[Sampling.stratifiedTopK]]):
    * the 20 smallest-hashed documents per language — the balanced
    * eval-set draw. Deterministic md5 ranking, so the DuckDB oracle
    * replays the identical selection; the map-side prune + loud
    * sufficiency refusal keep Zipfian strata off the single-task path. */
  def t41StratifiedQuota(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedTopK(
      Tables(spark, dir, "documents").select("doc_id", "lang"),
      strataCol = "lang", keyCol = "doc_id", k = 20)
      .select(col("lang"), col("rank"), col("doc_id"))
      .orderBy("lang", "rank")

  /** Corpus snapshot diff ([[graft.etl.CorpusStore.snapshotDiff]]): per
    * document, added/removed/modified/unchanged between two deterministic
    * synthetic snapshots of the corpus (old = ids ∉ 9ℤ; new = ids ∉ 7ℤ
    * with every 5th document's text revised) — the crawl-over-crawl CDC
    * report. Content comparison rides 16-byte fingerprints, never text. */
  def t42SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val oldSnap = docs.filter(col("doc_id") % 9 =!= 0)
    val newSnap = docs.filter(col("doc_id") % 7 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
    graft.etl.CorpusStore.snapshotDiff(oldSnap, newSnap)
      .orderBy("doc_id")
  }

  /** Token-budget waterfilling across sources: given each source's
    * available token mass and a global budget (half the corpus here),
    * allocate `min(available, L)` per source with the water level `L`
    * chosen so allocations exactly exhaust the budget — the
    * max-min-fair split a mixture designer starts from before applying
    * priors (t22's temperature reweighting is the *biased* cousin; this
    * is the neutral baseline that never lets one giant source starve the
    * rest). Closed form, no iteration: with sources sorted by
    * availability ascending, the level is `(B − cum_before) / #remaining`
    * at the FIRST source whose availability covers it — sources below
    * the level saturate, sources above share the remainder equally.
    *
    * Scale shape: one corpus aggregate to per-source token sums, then
    * everything runs on the #sources-row frame (window explicitly
    * single-partition over that bounded frame — sources are a catalog,
    * not data) and the 1-row level broadcasts back. The corpus is
    * scanned once. */
  def t43BudgetWaterfill(spark: SparkSession, dir: String): DataFrame = {
    val avail = Tables(spark, dir, "documents")
      .groupBy("source")
      .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long"))
        .as("available"))
    val tot = avail.agg(expr("sum(available) div 2").as("budget"),
      count(lit(1)).as("n_src"))
    val w = Window.partitionBy(lit(0)).orderBy(asc("available"), asc("source"))
    val ranked = avail.crossJoin(broadcast(tot))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("cum_before", coalesce(
        sum(col("available")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("cand",
        (col("budget") - col("cum_before")).cast("double") /
          (col("n_src") - col("i") + 1))
    val level = ranked.filter(col("cand") <= col("available").cast("double"))
      .agg(min_by(col("cand"), col("i")).as("level"))
    avail.crossJoin(broadcast(level))
      .select(col("source"), col("available"),
        round(least(col("available").cast("double"), col("level")), 2)
          .as("allocated"),
        (col("available").cast("double") <= col("level")).as("saturated"))
      .orderBy("source")
  }

  /** Curriculum interleave: every source's documents ranked by a quality
    * proxy (token mass, ties to doc_id), then merged round-robin — the
    * ordering that feeds trainers their best documents early WITHOUT
    * letting the largest source monopolize the head of the stream. The
    * first 100 global positions are reported.
    *
    * The scale point is what is NOT here: the global position is a pure
    * FORMULA over (within-source rank, per-source counts) — the rank of
    * `(r, source)` in lexicographic order, i.e.
    * `Σ_s' min(c_s', r−1) + |{s' ≤ s : c_s' ≥ r}|` — so the corpus is
    * never globally sorted and no unpartitioned window exists. The
    * per-source rank is a correctly-partitioned window; candidates for
    * the first `limit` positions are exactly those with `r ≤ limit`
    * (a global position can only exceed the within-source rank), a
    * ≤ limit·#sources-row frame that then cross-joins the broadcast
    * #sources-row count table to evaluate the formula. Emitting the FULL
    * curriculum at 100 TB is the same formula as a projection — a write
    * ordered by `(r, source)`, which range-partitions. */
  def t44CurriculumInterleave(spark: SparkSession, dir: String): DataFrame = {
    val limit = 100
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("score"))
    val wSrc = Window.partitionBy("source").orderBy(desc("score"), asc("doc_id"))
    val counts = docs.groupBy(col("source").as("src2"))
      .agg(count(lit(1)).as("c"))
    docs.withColumn("r", row_number().over(wSrc).cast("long"))
      .filter(col("r") <= limit)
      .crossJoin(broadcast(counts))
      .groupBy("doc_id", "source", "score", "r")
      .agg((sum(least(col("c"), col("r") - 1)) +
        sum(when(col("c") >= col("r") && col("src2") <= col("source"), 1L)
          .otherwise(0L))).as("pos"))
      .filter(col("pos") <= limit)
      .select(col("pos"), col("source"), col("r").cast("int").as("src_rank"),
        col("doc_id"), col("score"))
      .orderBy("pos")
  }

  /** k-anonymity / l-diversity audit over the customer dimension: for
    * each quasi-identifier combination (nation × market segment), the
    * group size, the diversity of a sensitive attribute (distinct
    * thousand-dollar balance bands), and whether the group is
    * re-identifiable at k=10 — the governance gate a training-data
    * release runs before shipping anything derived from user records
    * (a group smaller than k means those members are linkable from the
    * quasi-identifiers alone; low l means the sensitive value leaks even
    * without linkage). One groupBy at the quasi-identifier grain; the
    * distinct-band count partial-aggregates map-side. */
  def t45KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val k = 10
    Tables(spark, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("band")).as("l_div"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
        col("l_div"), (col("n") < k).as("at_risk"))
      .orderBy("c_nationkey", "c_mktsegment")
  }

  /** Matryoshka truncation eval for the pinned query set: overlap@10
    * between full-dimension and first-16-coordinate retrieval. See
    * [[graft.similarity.Similarity.matryoshkaOverlap]]. */
  def s11MatryoshkaOverlap(spark: SparkSession, dir: String): DataFrame =
    Similarity.matryoshkaOverlap(Tables(spark, dir, "embeddings"),
      col("vec_id") < 5, k = 10, subDim = 16)

  /** Embedding-space anisotropy profile per label. See
    * [[graft.similarity.Similarity.anisotropyProfile]]. */
  def s12AnisotropyProfile(spark: SparkSession, dir: String): DataFrame =
    Similarity.anisotropyProfile(Tables(spark, dir, "embeddings"))

  /** Hard-negative mining for the pinned query set: top-5 most similar
    * items with a DIFFERENT label. See
    * [[graft.similarity.Similarity.hardNegatives]]. */
  def s13HardNegatives(spark: SparkSession, dir: String): DataFrame =
    Similarity.hardNegatives(Tables(spark, dir, "embeddings"),
      col("vec_id") < 5, k = 5)

  /** Semi-supervised label propagation over the exact 5-NN graph of a
    * pinned 500-vector pool: every 5th vector seeds its true label, 5
    * majority-vote rounds spread them ([[graft.operators.Graph.labelPropagation]]),
    * and the output carries the true label so the row itself IS the
    * accuracy record — the weak-supervision eval a labeling pipeline
    * runs before trusting propagated labels at corpus scale (where the
    * kNN edges come from the ANN index, not brute force; the pool is
    * pinned so the oracle's exact-kNN replay stays bounded at any SF). */
  def s14LabelPropagation(spark: SparkSession, dir: String): DataFrame = {
    val pool = Tables(spark, dir, "embeddings").filter(col("vec_id") < 500)
    val knn = Similarity.bruteForceTopK(pool, lit(true), k = 5)
      .select(col("qid").as("src"), col("nid").as("dst"))
    val seeds = pool.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("id"), col("label"))
    Graph.labelPropagation(knn, seeds, iters = 5)
      .join(pool.select(col("vec_id").as("id"),
        col("label").as("true_label")), "id")
      .select(col("id").as("vec_id"),
        coalesce(col("label"), lit(-1)).cast("int").as("propagated"),
        col("true_label"), col("is_seed"))
      .orderBy("vec_id")
  }

  /** Dedup threshold-sensitivity sweep: the d02 exact-Jaccard pair table
    * re-cut at every candidate threshold 0.2…0.9, reporting pairs, docs
    * touched, and docs a keep-lowest-id policy would remove — the table
    * a curator reads to PICK the near-dup threshold before committing a
    * 100 TB dedup pass to it (t38's rule-ablation, aimed at the dedup
    * knob). Costs ONE inverted-index pair generation (the shared
    * `ngram_pairs` persist); the sweep itself is an 8× explode of the
    * near-dup pair table, which is output-sized, not corpus-sized. */
  def t46ThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(Tables(spark, dir, "documents"),
      threshold = 0.2)
    val ths = array((2 to 9).map(i => lit(i / 10.0)): _*)
    pairs.select(col("d1"), col("d2"), col("jaccard"),
        explode(ths).as("th"))
      .filter(col("jaccard") >= col("th"))
      .select(col("th"), explode(array(
        struct(col("d1").as("doc"), lit(0).as("side")),
        struct(col("d2").as("doc"), lit(1).as("side")))).as("e"))
      .select(col("th"), col("e.doc").as("doc"), col("e.side").as("side"))
      .groupBy("th")
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("n_pairs"),
        countDistinct(col("doc")).as("n_docs"),
        countDistinct(when(col("side") === 1, col("doc"))).as("n_removed"))
      .orderBy("th")
  }

  /** Epoch-annealed mixture schedule: per training epoch, source weights
    * interpolate GEOMETRICALLY from the corpus's natural token shares to
    * the uniform target (`w ∝ p0^(1−α)·p1^α`, α = epoch/(E−1)) — the
    * "start where the data is, end where you want to be" curriculum a
    * mixture designer anneals over a run (the DoReMi-family shape with a
    * fixed uniform reference). Everything runs on the #sources catalog
    * frame after one corpus aggregate; per-epoch normalizers sum 6-dp
    * DECIMAL terms (the t22 discipline), so pow's last-ulp engine
    * differences are absorbed before the ratio. */
  def t47MixSchedule(spark: SparkSession, dir: String): DataFrame = {
    val epochs = 5
    val avail = Tables(spark, dir, "documents")
      .groupBy("source")
      .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long"))
        .as("tokens"))
    val tot = avail.agg(sum(col("tokens")).as("nn"), count(lit(1)).as("n_src"))
    val sched = avail.crossJoin(broadcast(tot))
      .select(col("source"), col("tokens"),
        (col("tokens").cast("double") / col("nn")).as("p0"),
        (lit(1.0) / col("n_src")).as("p1"),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("alpha", col("epoch").cast("double") / (epochs - 1))
      .withColumn("w_raw",
        round(pow(col("p0"), lit(1.0) - col("alpha")) *
          pow(col("p1"), col("alpha")), 6).cast("decimal(18,6)"))
    val z = sched.groupBy(col("epoch").as("e2"))
      .agg(sum(col("w_raw")).as("z"))
    sched.join(broadcast(z), col("epoch") === col("e2"))
      .select(col("epoch").cast("int").as("epoch"), col("source"),
        round(col("w_raw").cast("double") / col("z").cast("double"), 6)
          .as("weight"))
      .orderBy("epoch", "source")
  }

  /** Count-Min heavy hitters, verdict form (q41 discipline): the exact
    * top-10 keys by event count, each annotated with the sketch
    * guarantees the CMS estimate must satisfy — never an underestimate
    * (structural), and within 2·⌈ε·N⌉ above truth (depth from
    * confidence 0.9999, so a budget excursion means a broken sketch,
    * not an unlucky seed).
    *
    * FULLY LAZY — nothing executes at construction (review finding,
    * round 7: an eager collect here made the plan audit inspect a
    * localized 10-row frame instead of the corpus subtrees). The exact
    * top-10 is TakeOrderedAndProject; the sketch is ONE mergeable
    * aggregate whose 1-row binary result broadcasts; the per-key
    * estimate lookup is a Scala UDF evaluated on the ≤10-row joined
    * frame ONLY (there is no built-in point-query function for a CMS
    * binary — the no-UDF-in-the-hot-path rule is about corpus scans,
    * and the corpus side here is pure aggregates). The rank window runs
    * above the top-10 cut (t33/t37 discipline). */
  def q58HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    val eps = 0.0005
    val ev = Tables(spark, dir, "events").select(col("user_id"))
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("user_id")).limit(10)
    val sk = ev
      .agg(expr(s"count_min_sketch(user_id, ${eps}d, 0.9999d, 42)").as("sk"))
    val est = udf((bytes: Array[Byte], u: Long) =>
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
        .estimateCount(java.lang.Long.valueOf(u)))
    val total = udf((bytes: Array[Byte]) =>
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
        .totalCount())
    val w = Window.partitionBy(lit(0)).orderBy(desc("cnt"), asc("user_id"))
    top.crossJoin(broadcast(sk))
      .withColumn("est", est(col("sk"), col("user_id")))
      .withColumn("slack",
        lit(2L) * ceil(lit(eps) * total(col("sk"))).cast("long"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .select(col("rank"), col("user_id"), col("cnt"),
        (col("est") >= col("cnt")).as("never_under"),
        (col("est") <= col("cnt") + col("slack")).as("within_eps"))
      .orderBy("rank")
  }

  /** MinHash calibration audit, verdict form (q41 discipline): over the
    * exact near-dup pairs, the 64-hash signature estimate of Jaccard
    * (fraction of agreeing positions) must track the true value — mean
    * absolute error ≤ 0.15 (per-pair σ = √(j(1−j)/64) ≤ 0.0625, so the
    * bound is ~3× the expected MAE) and |mean signed error| ≤ 0.10 (the
    * estimator is unbiased; the bound is ~8σ of the mean over the
    * fixture's pair count, and TIGHTENS as corpora grow). The oracle
    * recomputes the exact pair count and claims both booleans — this
    * chains d03's signatures to exact Jaccard VALUES, where d03a's
    * recall audit only chains the candidate SETS. Signature join is
    * pair-bounded; signatures build in one corpus groupBy. */
  def d21MinhashCalibration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    // ONE df-capped shingle table feeds BOTH sides: the exact pair
    // generator and the signatures. Signing the uncapped sets while the
    // exact side caps at maxDf would make the audit measure the cap, not
    // the sketch, on any corpus where a shingle's df actually exceeds the
    // cap (boilerplate-heavy corpora — exactly where calibration runs).
    // At fixture dfs the cap never binds, so results equal the uncapped
    // form and the oracle is unchanged.
    val shAll = Dedup.hashedShingleSets(docs, "text", n = 3)
    val rare = shAll.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 1000).select("g")
    val capped = shAll.join(rare, "g")
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.2,
      shingles = Some(capped))
    val sigs = Dedup.minhashSignatures(docs, shingles = Some(capped))
    exact
      .join(sigs.select(col("doc_id").as("d1"), col("sig").as("s1")), "d1")
      .join(sigs.select(col("doc_id").as("d2"), col("sig").as("s2")), "d2")
      .select(col("jaccard"),
        (aggregate(zip_with(col("s1"), col("s2"),
          (a, b) => when(a === b, 1).otherwise(0)), lit(0), _ + _)
          .cast("double") / 64).as("est"))
      .agg(count(lit(1)).as("n_pairs"),
        (avg(abs(col("est") - col("jaccard"))) <= 0.15).as("mae_within_015"),
        (abs(avg(col("est") - col("jaccard"))) <= 0.10).as("bias_within_010"))
  }

  /** Boilerplate-prefix clustering: documents grouped by their first-5
    * normalized tokens, clusters of ≥ 2 reported with their source
    * spread — the cheap detector for templated intros ("sign in to
    * continue", license headers, scaffold text) that near-dup passes
    * with document-level thresholds don't flag because the BODY differs.
    * A prefix shared across many sources is near-certain boilerplate; a
    * prefix confined to one source is that source's template. One
    * groupBy on a ≤5-token string (bounded bytes per key, Zipf-headed —
    * AQE's skew split handles the giant "the quick brown" bucket);
    * everything downstream of the groupBy is cluster-sized. Surviving
    * docs are NOT enumerated per cluster — `first_doc` is the exemplar,
    * and a remover joins back on the prefix projection, exactly like
    * d01's fingerprint discipline. */
  def d20PrefixBoilerplate(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        array_join(slice(TextAnalysis.tokens(col("text")), 1, 5), " ")
          .as("prefix"))
      .groupBy("prefix")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(desc("n_docs"), asc("prefix"))

  /** Bloom-gated exact 5-gram decontamination — [[d13ExactNgramDecontam]]'s
    * scale-path twin (same benchmark split, shorter grams so mid-length
    * docs participate): the benchmark's distinct shingle hashes collapse
    * into Bloom bits probed by a codegen'd expression INSIDE the training
    * scan, so only Bloom survivors reach the exact verify semi-join. No
    * false negatives ⇒ the result is exactly the ungated one; the oracle
    * is the plain exact SQL. See [[graft.dedup.Dedup.bloomDecontam]]. */
  def d16BloomDecontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    Dedup.bloomDecontam(
      docs.filter(col("doc_id") % 17 =!= 0),
      docs.filter(col("doc_id") % 17 === 0),
      n = 5)
      .orderBy("doc_id")
  }

  /** Fuzzy record linkage over part names: distinct-value collapse →
    * first-token blocking → length prefilter → Levenshtein ≤ 4, reported
    * with each side's row multiplicity. The entity-resolution operator a
    * warehouse needs when the "same" dimension member arrives spelled
    * differently across feeds. See [[graft.dedup.Dedup.fuzzyLinks]] for
    * the scale argument (vocabulary-sized, equi-join-blocked). */
  def d17FuzzyLinks(spark: SparkSession, dir: String): DataFrame =
    Dedup.fuzzyLinks(Tables(spark, dir, "part"), "p_name", maxDist = 4)
      .select(col("name_a"), col("name_b"), col("dist").cast("int").as("dist"),
        col("rows_a"), col("rows_b"))
      .orderBy("name_a", "name_b")

  /** Semantic (embedding-space) decontamination: each train vector's
    * nearest benchmark vector by exact cosine, flagged at 0.4 — catches
    * the paraphrased eval leak n-gram checks (d13/d16) can't see. Same
    * benchmark split convention as d09/d13/d16 (`vec_id % 17`). See
    * [[graft.similarity.Similarity.semanticDecontam]] for the
    * broadcast-benchmark scale shape. */
  def d18SemanticDecontam(spark: SparkSession, dir: String): DataFrame =
    Similarity.semanticDecontam(Tables(spark, dir, "embeddings"),
      col("vec_id") % 17 === 0, threshold = 0.4)
      .orderBy("qid")

  /** MMR diverse retrieval for 3 query vectors: relevant-AND-different
    * top-5 from a 20-candidate exact shortlist. See
    * [[graft.similarity.Similarity.mmrDiverseTopK]]; the DuckDB oracle
    * replays the greedy selection with a recursive CTE. */
  def s10MmrDiverse(spark: SparkSession, dir: String): DataFrame =
    Similarity.mmrDiverseTopK(Tables(spark, dir, "embeddings"),
      col("vec_id") < 3)

  /** Quality-rule ablation: per gate rule, how many documents it fails
    * outright and how many it is the SOLE blocker for (docs passing every
    * other rule) — the marginal-cost table that tells a curator which
    * rule to tune when the funnel is too aggressive. A rule with a large
    * `n_fail` but near-zero `n_sole_blocker` is redundant (its kills are
    * all co-blocked); a large sole-blocker count is exactly the data a
    * threshold change would recover.
    *
    * One corpus scan: t17's per-doc rule booleans feed a single 10-way
    * aggregate (partial map-side), and the 1-row result unstacks to the
    * 4-row report — no second pass, no join, nothing corpus-sized moves. */
  /** Dedup-cluster-aware train/val/test split — the REMEDY for the
    * leakage t29 measures: hashing each DOCUMENT into a split
    * (t04) lets near-duplicate pairs straddle train/test, silently
    * inflating eval; hashing the document's dedup-cluster KEEPER instead
    * moves whole clusters atomically, so cross-split near-dup leakage is
    * zero by construction. The report shows both worlds: per-split
    * doc/cluster/token masses under the cluster split, the straddling
    * cluster count the naive split WOULD have produced
    * (`naive_leak_clusters`, the operator's reason to exist), and the
    * cluster split's own straddle count (`cluster_leak_clusters`,
    * provably 0 — in the contract so a future split-keying change breaks
    * the hash loudly, same discipline as d16's gate).
    *
    * Cost is the d08 manifest's (persisted once per session, shared with
    * t23/t30); everything after is one join + two grain aggregates. */
  def t39ClusterSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val manifest = Dedup.dedupManifest(docs, threshold = 0.2)
    val base = manifest
      .join(docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tok")), Seq("doc_id"))
      .select(col("doc_id"), col("keeper_id"), col("n_tok"),
        Sampling.split(col("keeper_id")).as("split"),
        Sampling.split(col("doc_id")).as("naive_split"))
    def straddlers(splitCol: String, out: String) = base
      .groupBy("keeper_id")
      .agg(countDistinct(col(splitCol)).as("ns"))
      .filter(col("ns") > 1)
      .agg(count(lit(1)).as(out))
    base.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("keeper_id")).as("n_clusters"),
        sum(col("n_tok")).as("n_tokens"))
      .crossJoin(broadcast(straddlers("naive_split", "naive_leak_clusters")))
      .crossJoin(broadcast(straddlers("split", "cluster_leak_clusters")))
      .orderBy("split")
  }

  /** Per-source dataset card — the one-table datasheet a training run
    * reads before mixing: volume (docs, tokens, languages), exact-dup
    * mass (normalized-fingerprint d01 convention), quality pass rate
    * (t17's Gopher gate), and benchmark contamination (d16's exact 5-gram
    * check over the %17 split, rated against the source's TRAIN docs).
    * Rates are exact half-up integer ppm (the t32 idiom), so the row is
    * bit-stable across engines.
    *
    * One corpus scan builds the per-doc enriched frame; the contamination
    * column rides the same broadcast semi-join as d16; everything else is
    * one grain aggregate. The operator families this composes are each
    * oracle-anchored on their own — this is the composition a curator
    * actually consults. */
  def t40DatasetCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val gate = col("n_words") >= 50 && col("n_words") <= 100000 &&
      col("mwl") >= 3.0 && col("mwl") <= 10.0 &&
      col("faw") >= 0.8 && col("n_stop") >= 2
    val base = docs.select(col("doc_id"), col("source"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_words"),
        TextAnalysis.meanWordLen(col("text")).as("mwl"),
        TextAnalysis.alphaWordFraction(col("text")).as("faw"),
        TextAnalysis.stopwordCount(col("text")).as("n_stop"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .withColumn("keep", col("n_words") > 0 && gate)
    val contam = Dedup.contamination(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 17 === 0), threshold = 1.0, n = 5)
      .select(col("doc_id"), (col("n_overlap") >= 1).as("contam"))
    base.join(contam, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words").cast("long")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        (count(lit(1)) - countDistinct(col("fp"))).as("dup_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("keep_docs"),
        sum(when(col("doc_id") % 17 === 0, 1L).otherwise(0L)).as("bench_docs"),
        sum(when(coalesce(col("contam"), lit(false)), 1L).otherwise(0L))
          .as("contam_docs"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_langs"),
        col("dup_docs"),
        expr("(dup_docs * 2000000L + n_docs) div (n_docs * 2)").as("dup_ppm"),
        col("keep_docs"),
        expr("(keep_docs * 2000000L + n_docs) div (n_docs * 2)").as("keep_ppm"),
        col("bench_docs"), col("contam_docs"),
        // a source whose docs are ALL benchmark rows has zero training
        // docs — the rate's denominator vanishes; report 0 explicitly on
        // both sides (Spark `div` would yield NULL, DuckDB `//` would
        // ERROR, so an unguarded divide diverges cross-engine)
        when(col("n_docs") > col("bench_docs"),
          expr("""(contam_docs * 2000000L + (n_docs - bench_docs))
            div ((n_docs - bench_docs) * 2)"""))
          .otherwise(lit(0L)).as("contam_ppm"))
      .orderBy("source")
  }

  def t38RuleAblation(spark: SparkSession, dir: String): DataFrame = {
    val f = t17QualityRules(spark, dir)
    def fails(rule: String): org.apache.spark.sql.Column =
      sum(when(!col(rule), 1L).otherwise(0L))
    def sole(rule: String, others: String*): org.apache.spark.sql.Column =
      sum(when(!col(rule) && others.map(col).reduce(_ && _), 1L).otherwise(0L))
    f.agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        fails("ok_length").as("f_len"),
        sole("ok_length", "ok_mean_word_len", "ok_alpha", "ok_stop").as("s_len"),
        fails("ok_mean_word_len").as("f_mwl"),
        sole("ok_mean_word_len", "ok_length", "ok_alpha", "ok_stop").as("s_mwl"),
        fails("ok_alpha").as("f_alp"),
        sole("ok_alpha", "ok_length", "ok_mean_word_len", "ok_stop").as("s_alp"),
        fails("ok_stop").as("f_stp"),
        sole("ok_stop", "ok_length", "ok_mean_word_len", "ok_alpha").as("s_stp"))
      .selectExpr("n_docs", "n_keep",
        """stack(4,
          |  'alpha', f_alp, s_alp,
          |  'length', f_len, s_len,
          |  'mean_word_len', f_mwl, s_mwl,
          |  'stop', f_stp, s_stp) AS (rule, n_fail, n_sole_blocker)""".stripMargin)
      .select(col("rule"), col("n_fail"), col("n_sole_blocker"),
        col("n_docs"), col("n_keep"))
      .orderBy("rule")
  }
}
