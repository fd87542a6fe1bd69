package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline: token counting,
  * quality scoring, language ID, and content fingerprinting — all native
  * column expressions (codegen'd, fully distributed, no UDFs), so they run
  * unchanged over 100 TB of documents.
  *
  * Cross-engine discipline: every derived number comes from integer counts
  * via IEEE double arithmetic written in the same association order as the
  * DuckDB oracle SQL, so values hash-match exactly.
  */
object TextAnalysis {

  /** Whitespace-delimited tokens of the lower-cased text. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(trim(text)), lit("\\S+"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword segmentation (GPT-2-style pretokenizer, simplified to
    * what RE2 AND java.util.regex both support — no lookahead): runs of
    * letters, runs of digits, runs of other non-space symbols, each with an
    * optional leading space. Counts approximate LLM token budgets far
    * better than whitespace words (punctuation and numbers split off). */
  val BpeishRe = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+"

  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(BpeishRe), lit(0))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** Count of sentence/clause punctuation characters. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,!?;:]", ""))

  val EnglishStopwords = "\\b(the|and|of|to|in|is|that|it|was|for)\\b"

  def stopwordCount(text: Column, pattern: String = EnglishStopwords): Column =
    size(regexp_extract_all(lower(text), lit(pattern), lit(0)))

  /** Composite quality score in [0,1]: length saturation + stopword ratio +
    * punctuation sanity. The exact formula is arbitrary (quality scoring
    * always is); what matters is that it is deterministic, cheap, and
    * computed in one scan. */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val stops = stopwordCount(text).cast("double")
    val punct = punctCount(text).cast("double")
    val chars = length(text).cast("double")
    round(
      least(lit(1.0), toks / 50.0) * 0.4 +
        when(toks > 0, stops / toks).otherwise(0.0) * 0.4 +
        (lit(1.0) - when(chars > 0, punct / chars).otherwise(0.0)) * 0.2,
      6)
  }

  // ------------------------------------------------------ quality rules
  /** Mean word length: non-whitespace characters / whitespace tokens —
    * one regex strip instead of a per-token array fold (the total length
    * of all tokens IS the non-space character count). Gopher §A1.1 gates
    * this to [3, 10]; callers guard the zero-token case. */
  def meanWordLen(text: Column): Column =
    round(length(regexp_replace(text, "\\s+", "")).cast("double") /
      tokenCount(text), 4)

  /** Fraction of words containing at least one ASCII letter (post-lower) —
    * Gopher's ≥0.8-alphabetic rule; symbol/number soup scores low. */
  def alphaWordFraction(text: Column): Column = {
    val t = tokens(text)
    round(size(filter(t, w => w.rlike("[a-z]"))).cast("double") / size(t), 4)
  }

  /** Content fingerprint: hash of the whitespace-normalized, lower-cased
    * text — the exact-dedup key that survives formatting noise. */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Winnowing document fingerprints (rolling-hash family, Schleimer et al.
    * 2003): any shared substring of length ≥ k+w-1 yields a shared
    * fingerprint, at ~1/w the storage of full k-gram shingling. Backed by
    * the custom rolling-hash expression in graft.plans — an array-
    * expression formulation re-evaluates the gram array per window after
    * CollapseProject and goes O(n²) per document. */
  def winnowingFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    graft.plans.WinnowingExpression.winnowingFingerprints(text, k, w)

  // ------------------------------------------------------------- repetition
  /** Word 2-grams of the token array — the repetition-metric unit (empty
    * for documents under two tokens).
    *
    * Built with `zip_with` over two slices, NOT `transform(sequence, i =>
    * element_at(t, i)…)`: expressions passed as HOF *arguments* evaluate
    * once, but an array expression referenced *inside* a lambda body is
    * re-inlined and re-evaluated PER ELEMENT — the transform form
    * re-tokenized the document for every bigram position (O(n²) regex work;
    * measured 20 s vs sub-second on the sf0.1 corpus). */
  def bigrams(text: Column): Column = {
    val t = tokens(text)
    val n = size(t)
    when(n >= 2,
      zip_with(slice(t, lit(1), n - 1), slice(t, lit(2), n - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
  }

  /** Duplicate-2-gram fraction: 1 − |distinct 2-grams| / |2-grams| — the
    * Gopher-style repetition signal (Rae et al. 2021 §A1.1: heavily
    * templated/looping text scores high). Pure array expressions, one
    * projection, no shuffle. 0 for documents too short to have 2-grams.
    * The bigram count is |tokens|−1 by construction, so the bigram array
    * itself is referenced exactly once (each reference re-inlines the
    * whole construction). */
  def dupBigramFraction(text: Column): Column = {
    val n1 = size(tokens(text)) - 1
    when(n1 <= 0, 0.0)
      .otherwise(round(lit(1.0) -
        size(array_distinct(bigrams(text))).cast("double") / n1, 4))
  }

  // ------------------------------------------------------------------ PII
  /** PII-style pattern cascade: emails, then IPv4 addresses, then numbers —
    * ordered so a broader pattern never eats a narrower one's match (an IP
    * is four digit runs; redacting numbers first would destroy it). The
    * same three patterns drive [[redactPii]] and the per-category counts,
    * and the DuckDB oracle applies the identical cascade. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val NumberRe = "-?[0-9]+(\\.[0-9]+)?"

  /** Text with emails → `<EMAIL>`, IPv4s → `<IP>`, numbers → `<NUM>`. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      NumberRe, "<NUM>")

  /** Language ID by stopword/script evidence. Scores are per-language
    * match counts; prediction is the argmax with alphabetical tie-break,
    * `unknown` when no evidence. A heuristic, not a model — but the shape
    * (N regex counts + argmax in one projection) is the scalable one. */
  val LangPatterns: Seq[(String, String)] = Seq(
    "de" -> "\\b(der|die|das|und|ist|nicht|mit|ein|zu|den)\\b",
    "en" -> "\\b(the|and|of|to|in|is|that|it|was|for)\\b",
    "es" -> "\\b(el|los|las|que|es|por|con|para|del|una)\\b",
    "fr" -> "\\b(le|les|est|dans|que|pour|une|des|du|il)\\b",
    "zh" -> "[一-龥]")

  def langScore(text: Column, pattern: String): Column =
    size(regexp_extract_all(lower(text), lit(pattern), lit(0)))

  def predictedLang(text: Column): Column = {
    val scores = LangPatterns.map { case (l, p) => l -> langScore(text, p) }
    val mx = greatest(scores.map(_._2): _*)
    scores.foldLeft(when(mx === 0, "unknown")) { case (acc, (l, s)) =>
      acc.when(s === mx, l)
    }.otherwise(lit(null).cast("string"))
  }
}
