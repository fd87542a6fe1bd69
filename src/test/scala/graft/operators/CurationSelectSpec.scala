package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Data-selection operators: DSIR importance weights (t20) and the
  * per-source document cap (t21). */
class CurationSelectSpec extends SparkTestBase {
  import spark.implicits._

  // a corpus whose target domain (src0) speaks a distinct vocabulary, so
  // importance scores must separate the domains cleanly
  private lazy val mixDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("curation_sel").toString
    val docs = (
      (0 until 10).map(i => (i.toLong, "alpha beta gamma alpha beta", "en", "src0")) ++
      (10 until 20).map(i => (i.toLong, "delta epsilon zeta delta zeta", "en", "src1")) ++
      Seq((20L, "alpha beta gamma", "en", "src1"))) // src1 doc in target voice
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("importance weights rank target-domain language above the rest") {
    val out = TrainingData.t20ImportanceWeights(spark, mixDir)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("dsir_score"))).toMap
    assert(out.size == 21) // every doc scored, token counts intact
    assert(out(0L)._1 == 5)
    val tgt = (0L until 10L).map(out(_)._2)
    val oth = (10L until 20L).map(out(_)._2)
    // target-vocabulary docs score strictly positive, the disjoint
    // domain strictly negative — the resampling ranking is separable
    assert(tgt.forall(_ > 0), s"target scores: $tgt")
    assert(oth.forall(_ < 0), s"other scores: $oth")
    // a doc is scored by its CONTENT, not its source label: the src1 doc
    // written in target vocabulary must score with the target cluster
    assert(out(20L)._2 > 0)
    // identical text ⇒ identical score (pure function of content)
    assert(tgt.distinct.size == 1)
  }

  test("temperature mix lifts low-resource languages monotonically") {
    val rows = TrainingData.t22TemperatureMix(spark, sf("sf0.001")).collect()
    assert(rows.length >= 3)
    // α=0.5 sampling rate is strictly decreasing in corpus size: the
    // biggest language is downsampled hardest, the smallest least
    val bySize = rows.sortBy(_.getAs[Long]("grp_tokens"))
    val rates = bySize.map(_.getAs[Double]("sample_rate"))
    rates.zip(rates.tail).foreach { case (small, big) => assert(small >= big) }
    // the dominant language must actually be cut; shares stay a simplex
    assert(rates.last < 1.0)
    val shares = rows.map(_.getAs[Double]("temp_share")).sum
    assert(math.abs(shares - 1.0) < 0.001)
    // temperature compresses the mix: the big language's temp share sits
    // below its raw share, the smallest language's above
    val big = bySize.last
    assert(big.getAs[Double]("temp_share") < big.getAs[Double]("raw_share"))
    val small = bySize.head
    assert(small.getAs[Double]("temp_share") > small.getAs[Double]("raw_share"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
  }

  test("selection funnel: monotone stages, quota honored per source") {
    val rows = TrainingData.t24SelectionFunnel(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, cap, temp) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("after_cap"), r.getAs[Long]("after_temp"))
      assert(cap <= n, s"cap stage grew: $r")
      assert(temp <= cap, s"temperature stage grew: $r")
    }
    // the per-source quota binds across languages: ≤15 per source total
    rows.groupBy(_.getAs[String]("source")).foreach { case (s, rs) =>
      val kept = rs.map(_.getAs[Long]("after_cap")).sum
      assert(kept <= 15, s"source $s over quota: $kept")
    }
    // every (source, lang) cell of the corpus appears, even if emptied
    val base = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("source", "lang").distinct().count()
    assert(rows.length.toLong == base)
  }

  test("token inventory reconciles with the quality-rule gate") {
    val real = sf("sf0.001")
    val inv = TrainingData.t25TokenInventory(spark, real).collect()
    assert(inv.nonEmpty)
    inv.foreach { r =>
      assert(r.getAs[Long]("n_keep") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("tokens_usable") <= r.getAs[Long]("tokens_total"))
    }
    // the inventory's keep count must equal t17's per-document decisions
    val keepTotal = inv.map(_.getAs[Long]("n_keep")).sum
    val t17Keep = TrainingData.t17QualityRules(spark, real)
      .filter(col("keep")).count()
    assert(keepTotal == t17Keep)
  }

  test("source dup report reconciles with the manifest's totals") {
    val real = sf("sf0.001")
    val report = TrainingData.t23SourceDupReport(spark, real).collect()
    assert(report.nonEmpty)
    report.foreach { r =>
      assert(r.getAs[Long]("n_keepers") + r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_docs"))
      val rate = r.getAs[Double]("dup_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // per-source drops sum to the corpus-wide manifest drop count
    val totalDropped = report.map(_.getAs[Long]("n_dropped")).sum
    val manifestDropped = graft.dedup.Dedup.dedupManifest(
      spark.read.parquet(s"$real/documents.parquet"), threshold = 0.2)
      .filter(!col("is_keeper")).count()
    assert(totalDropped == manifestDropped)
  }

  test("source cap keeps at most N per source, deterministically") {
    val real = sf("sf0.001")
    val out = TrainingData.t21SourceCap(spark, real, cap = 3).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (s, rows) =>
      assert(rows.length <= 3, s"source $s over cap")
      assert(rows.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to rows.length))
    }
    // deterministic: a second run picks the same documents
    val again = TrainingData.t21SourceCap(spark, real, cap = 3)
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == again)
    // monotone under cap growth: the cap-3 winners are a subset of the
    // cap-5 winners (quota selection is a prefix of one fixed order, so
    // raising the quota never evicts a previously kept doc)
    val wider = TrainingData.t21SourceCap(spark, real, cap = 5)
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet.subsetOf(wider))
  }

  test("usable-token mix corrects the budget of a garbage-heavy language") {
    val dir = java.nio.file.Files.createTempDirectory("usable_mix").toString
    val good = Array.fill(8)("the quick brown fox jumps over the lazy dog")
      .mkString(" ") // 72 words, stopword-rich, all-alpha: passes the gate
    val junk = "zz 11 22" // 3 words: fails the length rule
    val docs = (
      (0 until 10).map(i => (i.toLong, good, "aa")) ++
      (10 until 20).map(i => (i.toLong, good, "bb")) ++
      (20 until 50).map(i => (i.toLong, junk, "bb")) ++ // bb is garbage-heavy
      (50 until 55).map(i => (i.toLong, junk, "cc"))) // cc is ALL garbage
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t31 = TrainingData.t31UsableTemperatureMix(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    // the junk never reaches the budget: bb's usable mass equals aa's
    assert(t31("bb").getAs[Long]("usable_docs") == 10)
    assert(t31("bb").getAs[Long]("usable_tokens") ==
      t31("aa").getAs[Long]("usable_tokens"))
    assert(t31("bb").getAs[Long]("n_docs") == 40) // but the report shows the raw pool
    assert(t31("aa").getAs[Double]("temp_share") ==
      t31("bb").getAs[Double]("temp_share"))
    // a fully-degraded language surfaces as a ZERO row — the alarm —
    // instead of silently vanishing from the report
    assert(t31.contains("cc"))
    assert(t31("cc").getAs[Long]("n_docs") == 5)
    assert(t31("cc").getAs[Long]("usable_docs") == 0)
    assert(t31("cc").getAs[Long]("n_kept") == 0)
    assert(t31("cc").getAs[Double]("sample_rate") == 0.0)
    // raw-token mixing would have over-allocated bb (its raw mass is larger)
    val t22 = TrainingData.t22TemperatureMix(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("temp_share")).toMap
    assert(t22("bb") > t22("aa"))
  }

  test("t32 vocabulary growth: exact curve on a constructed corpus") {
    val dir = java.nio.file.Files.createTempDirectory("vocab_growth").toString
    // doc i contributes exactly one NEW token t<i> plus the shared 'common'
    // → decile d (docs 0..d-1): vocab = d+1, tokens = 2d, ttr = (d+1)/(2d)
    (0 until 10).map(i => (i.toLong, s"t$i common", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TrainingData.t32VocabGrowth(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val d = r.getAs[Int]("decile")
      assert(r.getAs[Long]("n_docs") == d)
      assert(r.getAs[Long]("tokens") == 2L * d)
      assert(r.getAs[Long]("vocab") == d + 1)
      // exact half-up integer ppm: (2·v·1e6 + t) div 2t with v=d+1, t=2d
      assert(r.getAs[Long]("ttr_ppm") ==
        ((d + 1) * 2000000L + 2L * d) / (4L * d))
    }
    // and on real data the curve is monotone with decile 10 = global totals
    val real = TrainingData.t32VocabGrowth(spark, sf("sf0.001")).collect()
    val (vs, ts) = (real.map(_.getAs[Long]("vocab")),
      real.map(_.getAs[Long]("tokens")))
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
    assert(ts.zip(ts.tail).forall { case (a, b) => a < b })
  }

  test("t33 zipf fit: slope -1, r2 = 1 on a perfect power-law corpus") {
    val dir = java.nio.file.Files.createTempDirectory("zipf_fit").toString
    // frequencies 12/rank: ln(freq) = ln 12 - 1·ln(rank), an exact fit
    val text = ("a " * 12 + "b " * 6 + "c " * 4 + "d " * 3).trim
    Seq((0L, text, "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TrainingData.t33ZipfFit(spark, dir).collect().head
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Double]("zipf_slope") == -1.0)
    assert(r.getAs[Double]("intercept") ==
      BigDecimal(math.log(12.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("t35 ngram novelty: all-novel first decile, pure-recycle decile scores 0") {
    val dir = java.nio.file.Files.createTempDirectory("novelty").toString
    // 10 docs; doc 5 repeats doc 0's text exactly → its decile adds slots
    // but zero new shingles; every other doc is 3 fresh tokens = 1 shingle
    val texts = (0 until 10).map {
      case 5 => "w0a w0b w0c"
      case i => s"w${i}a w${i}b w${i}c"
    }
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.Caches.releaseAll()
    val rows = TrainingData.t35NgramNovelty(spark, dir).collect()
      .map(r => r.getAs[Int]("decile") -> r).toMap
    assert(rows.size == 10)
    // decile 1 = doc 0 alone: 1 slot, 1 new shingle, fully novel
    assert(rows(1).getAs[Long]("new_shingles") == 1L)
    assert(rows(1).getAs[Long]("novelty_ppm") == 1000000L)
    // decile 6 = doc 5, the exact repeat: 1 slot, 0 new
    assert(rows(6).getAs[Long]("slots") == 1L)
    assert(rows(6).getAs[Long]("new_shingles") == 0L)
    assert(rows(6).getAs[Long]("novelty_ppm") == 0L)
    // cumulative distinct ends at 9 (10 docs, one repeated text)
    assert(rows(10).getAs[Long]("cum_distinct") == 9L)
  }

  test("t36 KL drift: clone of the corpus voice scores near zero, disjoint source high") {
    val dir = java.nio.file.Files.createTempDirectory("kl_drift").toString
    // srcA and srcB share one distribution; srcC speaks disjoint jargon
    val common = "alpha beta gamma delta alpha beta"
    ((0 until 5).map(i => (i.toLong, common, "en", "srcA")) ++
     (5 until 10).map(i => (i.toLong, common, "en", "srcB")) ++
     (10 until 12).map(i => (i.toLong, "zeta eta theta zeta eta zeta", "en", "srcC")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kl = TrainingData.t36SourceKlDrift(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("kl_vs_corpus")).toMap
    assert(kl.keySet == Set("srcA", "srcB", "srcC"))
    // identical distributions → identical (small, positive) divergence
    assert(kl("srcA") == kl("srcB"))
    assert(kl("srcA") >= 0.0)
    // the disjoint-vocabulary source diverges far more
    assert(kl("srcC") > kl("srcA") + 0.5)
  }

  test("t34 source overlap: hand-computed Jaccard between two sources") {
    val dir = java.nio.file.Files.createTempDirectory("src_overlap").toString
    // srcA shingles {w1 w2 w3, w2 w3 w4}; srcB {w1 w2 w3, w2 w3 x}
    // → common 1, union 3, jaccard 0.3333; srcC shares nothing → no row
    Seq((0L, "w1 w2 w3 w4", "en", "srcA"),
        (1L, "w1 w2 w3 x", "en", "srcB"),
        (2L, "p q r s", "en", "srcC"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TrainingData.t34SourceOverlap(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getString(0), r.getString(1)) == ("srcA", "srcB"))
    assert(r.getAs[Long]("n_common") == 1L)
    assert(r.getAs[Double]("jaccard") == 0.3333)
  }

  test("t37 weighted sample: A-Res invariants + key formula replay") {
    val dir = sf("sf0.001")
    val rows = TrainingData.t37WeightedSample(spark, dir).collect()
    assert(rows.length == 100)
    // ranks are exactly 1..k and keys non-increasing along them
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 100))
    val keys = rows.map(_.getAs[Double]("key"))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
    // every key is ln(u)/w with u ∈ (0,1) and w ≥ 1 → strictly negative
    assert(keys.forall(_ < 0))
    // replay the draw for the top doc outside Spark: same md5-prefix u,
    // same ln(u)/w key (to the emitted 6-dp rounding)
    val top = rows.head
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(top.getAs[Long]("doc_id").toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val u = (java.lang.Long.parseLong(md5hex.take(8), 16) + 0.5) / 4294967296.0
    val expect = BigDecimal(math.log(u) / top.getAs[Long]("weight"))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.getAs[Double]("key") == expect)
    // the draw is a pure function of the data: a second run is identical
    val again = TrainingData.t37WeightedSample(spark, dir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("t39 cluster split: clusters move atomically; totals reconcile") {
    val dir = sf("sf0.001")
    val rows = TrainingData.t39ClusterSplit(spark, dir).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "val"))
    // the whole point: keeper-keyed hashing can never straddle a cluster
    assert(rows.forall(_.getAs[Long]("cluster_leak_clusters") == 0L))
    // doc mass conservation vs the corpus
    val nDocs = spark.read.parquet(dir + "/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // independent straddle check straight from the manifest + doc-hash split
    val manifest = graft.dedup.Dedup.dedupManifest(
      graft.Tables(spark, dir, "documents"), threshold = 0.2)
    val naive = manifest
      .select(col("keeper_id"), Sampling.split(col("doc_id")).as("s"))
      .groupBy("keeper_id").agg(countDistinct(col("s")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(rows.forall(_.getAs[Long]("naive_leak_clusters") == naive))
    // and the operator's reason to exist: the naive split DOES leak here
    assert(naive > 0, "fixture degenerate: naive split leaked nothing")
  }

  test("t40 dataset card: per-source rows reconcile with the component operators") {
    val dir = sf("sf0.001")
    val card = TrainingData.t40DatasetCard(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val docs = graft.Tables(spark, dir, "documents")
    // volume columns straight off the corpus
    val vol = docs.groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(graft.text.TextAnalysis.tokenCount(col("text")).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(card.keySet == vol.keySet)
    card.foreach { case (s, r) =>
      assert(r.getAs[Long]("n_docs") == vol(s)._1)
      assert(r.getAs[Long]("n_tokens") == vol(s)._2)
      // rate sanity: ppm fields derive from their count fields
      val n = r.getAs[Long]("n_docs")
      def ppm(x: Long, d: Long) = (x * 2000000L + d) / (d * 2)
      assert(r.getAs[Long]("dup_ppm") == ppm(r.getAs[Long]("dup_docs"), n))
      assert(r.getAs[Long]("keep_ppm") == ppm(r.getAs[Long]("keep_docs"), n))
      val train = n - r.getAs[Long]("bench_docs")
      assert(r.getAs[Long]("contam_ppm") ==
        ppm(r.getAs[Long]("contam_docs"), train))
      assert(r.getAs[Long]("keep_docs") <= n &&
        r.getAs[Long]("contam_docs") <= train)
    }
    // corpus-level keep mass equals the t17 gate's keeper count
    val keepTotal = card.values.map(_.getAs[Long]("keep_docs")).sum
    assert(keepTotal ==
      TrainingData.t17QualityRules(spark, dir).filter(col("keep")).count())
    // exact-dup mass equals the d01 grouping's surplus copies
    val dupTotal = card.values.map(_.getAs[Long]("dup_docs")).sum
    val d01Surplus = graft.dedup.Dedup.exactGroups(docs)
      .agg(sum(col("copies") - 1)).head().getLong(0)
    // per-source fp dedup can only find duplicates WITHIN a source, so the
    // card's dup mass is bounded by the corpus-wide surplus
    assert(dupTotal <= d01Surplus)
  }

  test("t38 rule ablation: counts reconcile with the t17 per-doc flags") {
    val dir = sf("sf0.001")
    val report = TrainingData.t38RuleAblation(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(report.keySet ==
      Set("alpha", "length", "mean_word_len", "stop"))
    val flags = TrainingData.t17QualityRules(spark, dir)
      .select("ok_length", "ok_mean_word_len", "ok_alpha", "ok_stop", "keep")
      .collect()
    val nDocs = flags.length.toLong
    val nKeep = flags.count(_.getAs[Boolean]("keep")).toLong
    report.values.foreach { case (nFail, nSole, d, k) =>
      assert(d == nDocs && k == nKeep)
      assert(nSole <= nFail, "a sole blocker must also be a failure")
      assert(nFail <= nDocs - nKeep || nFail == 0,
        "more failures than rejected docs")
    }
    // per-rule recount straight from the flags
    def recount(ok: String, others: String*): (Long, Long) = (
      flags.count(r => !r.getAs[Boolean](ok)).toLong,
      flags.count(r => !r.getAs[Boolean](ok) &&
        others.forall(r.getAs[Boolean](_))).toLong)
    assert(report("length") ==
      ((recount("ok_length", "ok_mean_word_len", "ok_alpha", "ok_stop")._1,
        recount("ok_length", "ok_mean_word_len", "ok_alpha", "ok_stop")._2,
        nDocs, nKeep)))
    assert(report("stop") ==
      ((recount("ok_stop", "ok_length", "ok_mean_word_len", "ok_alpha")._1,
        recount("ok_stop", "ok_length", "ok_mean_word_len", "ok_alpha")._2,
        nDocs, nKeep)))
  }
}
