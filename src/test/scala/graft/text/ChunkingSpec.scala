package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  test("chunking: window starts, lengths, and fingerprints") {
    val words = (1 to 20).map(i => s"w$i")
    val docs = Seq((0L, words.mkString(" ")), (1L, "solo")).toDF("doc_id", "text")
    val got = Chunking.chunkTokens(docs, size = 8, overlap = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getString(3))))
      .toMap
    // 20 tokens, step 5 -> ceil(17/5) = 4 chunks at starts 1,6,11,16
    assert(got.keySet.filter(_._1 == 0L).map(_._2) == Set(0, 1, 2, 3))
    assert(got((0L, 0))._1 == 8 && got((0L, 1))._1 == 8 && got((0L, 3))._1 == 5)
    def fp(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got((0L, 0))._2 == fp(words.take(8).mkString(" ")))
    assert(got((0L, 3))._2 == fp(words.drop(15).mkString(" ")))
    // a short doc still yields exactly one (complete) window
    assert(got((1L, 0)) == ((1, fp("solo"))))
  }

  test("chunking: every token is covered and consecutive windows overlap") {
    val real = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val n = real.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = Chunking.chunkTokens(real, size = 64, overlap = 8).collect()
      .groupBy(_.getLong(0))
    assert(chunks.keySet == n.keySet.filter(n(_) >= 1))
    chunks.foreach { case (id, rows) =>
      val total = rows.map(_.getInt(2)).sum
      val k = rows.length
      // windows tile the doc: sum of sizes = n + overlap re-counted k-1 times
      assert(total == n(id) + 8 * (k - 1),
        s"doc $id: $k windows sum $total vs ${n(id)} tokens")
      rows.foreach(r => assert(r.getInt(2) <= 64))
    }
  }

  test("chunking tiling invariant holds across (size, overlap, length) sweep") {
    val lens = Seq(1, 5, 9, 10, 11, 63, 64, 65, 100, 137)
    val docs = lens.zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(j => s"t$j").mkString(" ")) }
      .toDF("doc_id", "text")
    for ((size, ov) <- Seq((10, 0), (10, 3), (64, 8), (5, 4), (100, 10))) {
      val step = size - ov
      val rows = Chunking.chunkTokens(docs, size, ov).collect()
        .groupBy(_.getLong(0))
      lens.zipWithIndex.foreach { case (n, i) =>
        val r = rows(i.toLong).sortBy(_.getInt(1))
        val expectChunks = math.max(math.ceil((n - ov).toDouble / step).toInt, 1)
        assert(r.length == expectChunks, s"len=$n size=$size ov=$ov")
        // tiling: sizes sum to n plus the re-counted overlaps
        assert(r.map(_.getInt(2)).sum == n + ov * (r.length - 1),
          s"len=$n size=$size ov=$ov")
        // every window except possibly the last is full
        assert(r.dropRight(1).forall(_.getInt(2) == size))
        assert(r.last.getInt(2) <= size && r.last.getInt(2) >= 1)
      }
    }
  }

  test("lm bigram score matches a driver-side reference model") {
    val real = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val got = graft.operators.TrainingData
      .t12LmBigramScore(spark, sf("sf0.001")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    // reference: same add-one-smoothed bigram model, computed imperatively
    val toksByDoc = real.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty))
      .toMap
    val bigrams = toksByDoc.toSeq.flatMap { case (id, t) =>
      t.zip(t.drop(1)).map(b => (id, b))
    }
    val c12 = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val c1 = bigrams.groupBy(_._2._1).view.mapValues(_.size).toMap
    val v = bigrams.flatMap(b => Seq(b._2._1, b._2._2)).distinct.size
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    toksByDoc.filter(_._2.size >= 2).foreach { case (id, t) =>
      val lps = t.zip(t.drop(1)).map(b =>
        BigDecimal(r4(math.log((c12(b) + 1.0) / (c1(b._1) + v)))))
      val expect = r4((lps.sum / lps.size).toDouble)
      assert(got(id)._1 == lps.size.toLong, s"doc $id bigram count")
      assert(got(id)._2 == expect, s"doc $id: got ${got(id)._2} expect $expect")
    }
  }
}
