package graft.text

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("token count handles leading/trailing/multiple whitespace") {
    val n = one("  hello   big\tworld \n")
      .select(TextAnalysis.tokenCount(col("text"))).head.getInt(0)
    assert(n == 3)
  }

  test("quality score is bounded in [0,1] and deterministic") {
    val q = one("the cat sat on the mat. it was good, for a cat!")
      .select(TextAnalysis.qualityScore(col("text"))).head.getDouble(0)
    assert(q >= 0.0 && q <= 1.0)
    val empty = one("").select(TextAnalysis.qualityScore(col("text"))).head.getDouble(0)
    assert(empty >= 0.0 && empty <= 1.0)
  }

  test("fingerprint is whitespace- and case-invariant") {
    val fps = Seq("Hello  World", "hello world", "  HELLO\tWORLD ")
      .toDF("text").select(TextAnalysis.fingerprint(col("text"))).collect()
      .map(_.getString(0)).toSet
    assert(fps.size == 1)
  }

  test("language ID picks the dominant stopword evidence") {
    val preds = Seq(
      ("the cat and the dog sat in the house", "en"),
      ("der hund und die katze ist nicht mit dem haus", "de"),
      ("el perro y los gatos que es por la casa para todos", "es"),
      ("le chien est dans la maison pour une promenade des amis", "fr"),
      ("这 是 一个 中文 句子 测试", "zh"),
      ("xyzzy plugh qwerty", "unknown"))
      .toDF("text", "expect")
      .select(TextAnalysis.predictedLang(col("text")).as("got"), col("expect"))
      .collect()
    preds.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(1)} got ${r.getString(0)}"))
  }

  test("duplicate-2-gram fraction flags looping text, 0 for short docs") {
    def frac(s: String) =
      one(s).select(TextAnalysis.dupBigramFraction(col("text"))).head.getDouble(0)
    // "a a a a": 3 bigrams, 1 distinct -> 1 - 1/3
    assert(math.abs(frac("a a a a") - 0.6667) < 1e-9)
    assert(frac("all words here are different") == 0.0)
    assert(frac("solo") == 0.0) // no bigrams -> defined as 0, not 1
    assert(frac("") == 0.0)
  }

  test("mean word length is nonspace chars over words") {
    // "ab cde f" -> 6 nonspace chars / 3 words = 2.0
    val m = one(" ab  cde\tf ")
      .select(TextAnalysis.meanWordLen(col("text"))).head.getDouble(0)
    assert(m == 2.0)
  }

  test("alpha-word fraction counts words containing a letter") {
    // "abc 123 a1 !!" -> 2 of 4 words contain [a-z]
    val f = one("abc 123 a1 !!")
      .select(TextAnalysis.alphaWordFraction(col("text"))).head.getDouble(0)
    assert(f == 0.5)
    val zh = one("这是 中文 句子")
      .select(TextAnalysis.alphaWordFraction(col("text"))).head.getDouble(0)
    assert(zh == 0.0) // CJK-only words carry no ASCII letter
  }

  test("BPE-ish tokens split punctuation and digit runs off words") {
    val n = one("Don't panic 123!!")
      .select(TextAnalysis.bpeishTokenCount(col("text"))).head.getInt(0)
    // don | ' | t | _panic | _123 | !!
    assert(n == 6)
    val ws = one("Don't panic 123!!")
      .select(TextAnalysis.tokenCount(col("text"))).head.getInt(0)
    assert(ws == 3)
  }

  test("tfidf top terms: dense ranks per doc, scores non-increasing, idf sane") {
    val got = graft.operators.TrainingData
      .t11TfidfTopTerms(spark, sf("sf0.001")).collect()
    assert(got.nonEmpty)
    val nDocs = spark.read.parquet(sf("sf0.001") + "/documents.parquet").count()
    got.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rows) =>
      val byRank = rows.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length),
        s"doc $id ranks not dense")
      val scores = byRank.map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    got.foreach { r =>
      val (tf, df) = (r.getAs[Long]("tf"), r.getAs[Long]("df"))
      assert(tf >= 1 && df >= 1 && df <= nDocs)
      // idf >= 0 always; a corpus-universal token scores exactly 0
      assert(r.getAs[Double]("tfidf") >= 0.0)
    }
  }

  test("PII cascade redacts emails before IPs before bare numbers") {
    val got = one("mail bob.smith+x@example.co.uk or 10.0.0.255 port 8080 at -3.5")
      .select(TextAnalysis.redactPii(col("text"))).head.getString(0)
    assert(got == "mail <EMAIL> or <IP> port <NUM> at <NUM>")
    // an IP must not be shredded into four <NUM>s
    assert(!got.contains("<NUM>.<NUM>"))
  }

  test("PMI collocations: hand-computed scores, exclusive pair on top") {
    // bigram stream: (a b)(b a)(a b) from doc 1, (c d) from doc 2 → N=4
    val docs = Seq((1L, "a b a b"), (2L, "c d")).toDF("doc_id", "text")
    val got = graft.operators.TrainingData
      .pmiCollocations(docs, minSupport = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSeq
    // b-a and c-d are both positionally exclusive (b opens once, a closes
    // once): ln(1·4/(1·1)) = ln 4, tie broken by w1; a-b co-occurs twice
    // but both slots are busy (a opens 2, b closes 2): ln(2·4/(2·2)) = ln 2
    assert(got == Seq(
      ("b", "a", 1L, 1.3863),
      ("c", "d", 1L, 1.3863),
      ("a", "b", 2L, 0.6931)))
  }
}
