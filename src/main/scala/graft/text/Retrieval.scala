package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the document corpus — the sparse half of a
  * training-data / RAG pipeline's retrieval stack (the dense half is
  * [[graft.similarity.Similarity]]): BM25 scoring (Robertson & Walker's
  * Okapi formula, the Lucene `k1`/`b` parameterization with the
  * non-negative `ln(1 + (N − df + 0.5)/(df + 0.5))` idf) as one
  * declarative plan — no per-query loop, no driver-side index.
  */
object Retrieval {

  /** BM25 top-`k` documents for each of the corpus's `nTerms` highest-df
    * terms (single-term probe queries derived from the data itself, so the
    * fixture is deterministic on any regenerated corpus; production calls
    * pass real query terms through the same tf/df frames).
    *
    * Scale shape: ONE token explode builds the (doc, term) tf table —
    * term df and document length both derive from it or from a
    * projection-only scan, so the corpus is tokenized exactly once. The
    * probe terms (nTerms rows) and the corpus-constant (N, Σdl) 1-row
    * aggregate broadcast; the only corpus-sized shuffle is the tf groupBy
    * itself. The per-term top-k is TWO-PHASE: a frequent term's posting
    * list is corpus-sized, so a single per-term window would pull it
    * through one task — instead scored rows rank first within
    * (term, salt) buckets (64-way, crc32 of doc_id) keeping ≤k each,
    * and the global per-term window ranks only the ≤64·k salt winners.
    * Every global top-k row ranks ≤k inside its own bucket, so the
    * two-phase result equals the single-window form exactly (the
    * stratifiedTopK prune discipline, but lossless — no margin needed).
    * Ties in score break to the smaller doc_id so rankings are total.
    *
    * Cross-engine determinism: tf/df/dl are exact integers; the score is
    * one fixed-association double expression over them (mirrored
    * token-for-token in the DuckDB oracle), rounded to 4 dp only for
    * display — ranks order on the unrounded double, the s02 discipline. */
  def bm25TopK(docs: DataFrame, nTerms: Int = 3, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75, textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val topTerms = df.orderBy(desc("df"), asc("term")).limit(nTerms)
    val dl = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1)
    val norm = lit(1 - b) +
      lit(b) * col("dl") / (col("sum_dl").cast("double") / col("n_docs"))
    val score = idf * (col("tf") * lit(k1 + 1)) / (col("tf") + lit(k1) * norm)
    val wLocal = Window.partitionBy("term", "salt")
      .orderBy(desc("score"), asc("doc_id"))
    val wGlobal = Window.partitionBy("term").orderBy(desc("score"), asc("doc_id"))
    tf.join(broadcast(topTerms), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("score", score)
      .withColumn("salt", pmod(crc32(col("doc_id").cast("string")), lit(64)))
      .withColumn("lrank", row_number().over(wLocal))
      .filter(col("lrank") <= k)
      .withColumn("rank", row_number().over(wGlobal).cast("int"))
      .filter(col("rank") <= k)
      .select(col("term"), col("rank"), col("doc_id"),
        round(col("score"), 4).as("bm25"))
      .orderBy("term", "rank")
  }
}
