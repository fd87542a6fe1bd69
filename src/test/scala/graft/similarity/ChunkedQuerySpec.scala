package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Similarity.chunkedByQuery]] (r10 verdict #3): the chunked execution
  * of a broadcast-capped entry point equals the unchunked plan exactly,
  * and succeeds past a cap where the direct call refuses loudly. */
class ChunkedQuerySpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8

  private lazy val emb: DataFrame = {
    val rnd = new scala.util.Random(19L)
    (0L until 60L).map { i =>
      (i, Array.tabulate(dim)(d =>
        (math.sin(i * 0.7 + d) + rnd.nextDouble() * 0.1).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def asPairs(df: DataFrame): Set[(Long, Int, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getDouble(3))).toSet

  test("chunked(ivfPqTopK) equals the direct call row-for-row") {
    val ivf = Similarity.buildIvfIndex(emb, nlist = 4)
    val pq = Similarity.buildPqIndex(emb, m = 4, k = 8)
    try {
      val qf = col("vec_id") < 20
      val direct = asPairs(
        Similarity.ivfPqTopK(ivf, pq, emb, qf, topK = 5))
      val chunked = asPairs(Similarity.chunkedByQuery(qf, nChunks = 4)(
        f => Similarity.ivfPqTopK(ivf, pq, emb, f, topK = 5)))
      assert(chunked == direct)
      assert(direct.map(_._1) == (0L until 20L).toSet,
        "every query must appear in exactly one chunk")
    } finally { ivf.release(); pq.release() }
  }

  test("past a lowered cap: direct refuses with the chunking advice, chunked succeeds and matches") {
    val ivf = Similarity.buildIvfIndex(emb, nlist = 4)
    val pq = Similarity.buildPqIndex(emb, m = 4, k = 8)
    val qf = col("vec_id") < 20
    // the reference result, computed under the default (ample) cap
    val want = asPairs(Similarity.ivfPqTopK(ivf, pq, emb, qf, topK = 5))
    // the biggest chunk the 4-way hash split actually produces for
    // these ids — the cap is set to exactly that, so every chunk fits
    // while the unchunked 20-query batch does not
    val nChunks = 4
    val maxChunk = emb.filter(qf)
      .groupBy(pmod(xxhash64(col("vec_id")), lit(nChunks)).as("c"))
      .agg(count(lit(1)).as("n")).agg(max("n")).head().getLong(0)
    assert(maxChunk < 20L, "fixture sanity: the split must actually split")
    spark.conf.set("graft.similarity.maxBroadcastQueries",
      maxChunk.toString)
    try {
      val e = intercept[Throwable] {
        Similarity.ivfPqTopK(ivf, pq, emb, qf, topK = 5).collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("chunkedByQuery")),
        s"the refusal must name the chunked executor, got: $e")
      val got = asPairs(Similarity.chunkedByQuery(qf, nChunks)(
        f => Similarity.ivfPqTopK(ivf, pq, emb, f, topK = 5)))
      assert(got == want,
        "chunked execution under the cap must equal the uncapped plan")
    } finally {
      spark.conf.unset("graft.similarity.maxBroadcastQueries")
      ivf.release(); pq.release()
    }
  }

  test("nChunks = 1 degenerates to the direct call; invalid nChunks refuses") {
    val ivf = Similarity.buildIvfIndex(emb, nlist = 4)
    try {
      val qf = col("vec_id") < 10
      val direct = asPairs(ivf.topK(qf, 3))
      val one = asPairs(Similarity.chunkedByQuery(qf, nChunks = 1)(
        f => ivf.topK(f, 3)))
      assert(one == direct)
      intercept[IllegalArgumentException] {
        Similarity.chunkedByQuery(qf, nChunks = 0)(f => ivf.topK(f, 3))
      }
    } finally ivf.release()
  }
}
