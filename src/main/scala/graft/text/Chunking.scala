package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-length chunking: split each document into overlapping
  * fixed-token windows — the preprocessing step that turns variable-length
  * documents into model-sized training sequences.
  *
  * Chunk starts step by `size - overlap`; the chunk count is
  * `ceil((len - overlap) / step)` (min 1), so the final window always
  * reaches the last token and no window consists only of overlap. Pure
  * per-row array arithmetic (sequence/transform/slice) — no shuffle, no
  * UDFs; scales exactly as far as the scan does.
  */
object Chunking {

  /** Number of windows `chunkTokens` emits for a document of `nTokens`
    * tokens — THE formula, shared with every count-only consumer (the
    * curation funnel) so the two can never drift. */
  def chunkCount(nTokens: Column, size: Int = 64, overlap: Int = 8): Column = {
    require(size > overlap && overlap >= 0,
      s"need size > overlap >= 0, got size=$size overlap=$overlap")
    greatest(ceil((nTokens - overlap).cast("double") / (size - overlap))
      .cast("int"), lit(1))
  }

  /** One row per (doc, window): 0-based chunk index, the window's token
    * count, and an md5 fingerprint of the window text (the id a packing
    * or chunk-level dedup step joins on). */
  def chunkTokens(docs: DataFrame, size: Int = 64, overlap: Int = 8,
      textCol: String = "text"): DataFrame = {
    require(size > overlap && overlap >= 0,
      s"need size > overlap >= 0, got size=$size overlap=$overlap")
    val step = size - overlap
    val toks = docs
      .select(col("doc_id"), TextAnalysis.tokens(col(textCol)).as("t"))
      .filter(size_(col("t")) >= 1)
    toks
      .withColumn("n_chunks", chunkCount(size_(col("t")), size, overlap))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk"))
      .withColumn("w", slice(col("t"), col("chunk") * step + 1, lit(size)))
      .select(col("doc_id"), col("chunk").cast("int").as("chunk"),
        size_(col("w")).as("n_tokens"),
        md5(concat_ws(" ", col("w"))).as("fp"))
  }

  // functions.size shadowed by the `size` parameter above
  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)
}
