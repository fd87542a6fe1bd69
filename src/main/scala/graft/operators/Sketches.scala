package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.text.TextAnalysis

/** Mergeable frequency sketches — the fixed-memory relatives of the exact
  * t06 vocabulary profile, for when the corpus (or the stream) is too large
  * to shuffle every token and only point estimates of hot items are needed.
  *
  * Count-Min Sketch (Cormode & Muthukrishnan 2005): one pass, associative
  * merge across partitions (Spark's `count_min_sketch` aggregate does the
  * map-side/merge plumbing), ε·N additive overestimate with probability
  * ≥ confidence, never an underestimate. Pairs with HLL++ (used by
  * `Transform.rollupApprox`) as the approximate-aggregation family. */
object Sketches {

  /** CMS over every token of the corpus. eps bounds the additive error
    * (ε·total-token-count); width/depth derive from (eps, confidence). */
  def tokenCountSketch(docs: DataFrame, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42): CountMinSketch = {
    val bytes = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(expr(s"count_min_sketch(tok, ${eps}d, ${confidence}d, $seed)"))
      .head.getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }
}
