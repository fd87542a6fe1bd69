package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Dedup operator semantics: the approximate paths (MinHash+LSH, SimHash)
  * validated against exact ground truth — synthetic fixtures with known
  * duplicates, plus recall vs the exact Jaccard join on real testdata. */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"

  private lazy val docs = Seq(
    (0L, base),
    (1L, base), //                       exact copy of 0
    (2L, "  " + base.toUpperCase + "  "), // whitespace/case copy of 0
    (3L, base.replace("pi", "PHI")), //  near-dup of 0 (one token changed)
    (4L, "totally different words entirely here nothing shared at all " +
      "zebra yak xylophone walrus vulture unicorn tiger snake rabbit quail"),
    (5L, "short doc")) //               < 3 tokens → no shingles
    .toDF("doc_id", "text")

  test("exact groups collapse byte-identical and whitespace/case variants") {
    val groups = Dedup.exactGroups(docs).collect()
    val dupGroup = groups.filter(_.getAs[Long]("copies") == 3)
    assert(dupGroup.length == 1)
    assert(dupGroup.head.getAs[Long]("keeper_doc_id") == 0L)
  }

  test("shingles: short docs yield none; counts are |tokens|-2") {
    val sh = Dedup.shingles(docs)
    assert(sh.filter($"doc_id" === 5L).count() == 0)
    assert(sh.filter($"doc_id" === 4L).count() == 17) // 19 tokens -> 17 shingles
  }

  test("exact ngram jaccard finds the near-dup pair with the right score") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) == 1.0) // lower-cased + trimmed before shingling
    // one token changed in 20 kills 3 of 18 shingles: J = 15/21 ≈ 0.7143
    assert(pairs((0L, 3L)) == 0.7143)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("containment flags a partial copy that symmetric Jaccard misses") {
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val partial = Seq(
      (10L, base), //                    20 tokens -> 18 shingles
      (11L, base + " " + filler), //     10's shingles are a subset of 11's
      (12L, filler)) //                  shares filler with 11, not with 10
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(partial, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("containment"), r.getAs[Double]("jaccard"))).toMap
    // every shingle of 10 appears in 11: containment 1.0, but the union
    // denominator dilutes Jaccard far below any dedup threshold
    val (c1011, j1011) = pairs((10L, 11L))
    assert(c1011 == 1.0)
    assert(j1011 < 0.3)
    // the same asymmetry holds for the suffix copy (12 in 11)
    assert(pairs((11L, 12L))._1 > 0.9)
    // disjoint docs never pair
    assert(!pairs.contains((10L, 12L)))
    // cross-check: containment >= jaccard always (min <= union)
    pairs.values.foreach { case (c, j) => assert(c >= j) }
  }

  test("minhash+LSH recalls every exact pair with J >= 0.6 on testdata") {
    val real = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val exact = Dedup.ngramJaccardPairs(real, threshold = 0.6)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Dedup.minhashNearDuplicates(real, threshold = 0.4)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain high-jaccard pairs")
    val missed = exact -- approx
    assert(missed.isEmpty, s"LSH missed high-similarity pairs: $missed")
  }

  test("dedup clusters: transitive closure with min-id keeper labels") {
    // chain a-b, b-c plus isolated pair x-y: {a,b,c} must share one cluster
    // even though (a,c) was never a pair — closure, not pairwise grouping
    val pairs = Seq((10L, 20L), (20L, 30L), (50L, 60L)).toDF("d1", "d2")
    val got = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 50L -> 50L, 60L -> 50L))
  }

  test("dedup clusters on real pairs: every pair co-clustered, labels are members") {
    val real = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(real, threshold = 0.2)
    val clusters = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ps = pairs.select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ps.nonEmpty)
    ps.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.foreach { case (id, label) =>
      assert(label <= id && clusters(label) == label,
        s"cluster label $label must be its own (minimal) member")
    }
  }

  test("log-star components equal propagation on fixtures and real pairs") {
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixture = Seq((10L, 20L), (20L, 30L), (50L, 60L)).toDF("d1", "d2")
    assert(asMap(Dedup.dedupClustersLogStar(fixture)) ==
      Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 50L -> 50L, 60L -> 50L))
    val real = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(real, threshold = 0.2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(asMap(Dedup.dedupClustersLogStar(pairs)) ==
      asMap(Dedup.dedupClusters(pairs)))
    pairs.unpersist()
  }

  test("log-star resolves the chain graph the propagation form refuses") {
    // a 201-node path has diameter 200: one-hop min-label propagation
    // needs 200 rounds and must REFUSE at its cap rather than return a
    // split component; the star rewrite contracts it in O(log n) rounds
    val chain = (0 until 200).map(i => (i.toLong, i + 1L)).toDF("d1", "d2")
    val labels = Dedup.dedupClustersLogStar(chain).collect()
    assert(labels.length == 201)
    assert(labels.forall(_.getLong(1) == 0L), "chain must be ONE cluster")
    val refusal = intercept[IllegalArgumentException](
      Dedup.dedupClusters(chain, maxIter = 20))
    assert(refusal.getMessage.contains("did not converge"))
  }

  test("dedup manifest: exact + near evidence resolve to one keeper per doc") {
    val got = Dedup.dedupManifest(docs, threshold = 0.2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // 0,1 byte-identical; 2 case/ws copy; 3 near-dup (J=0.71) — one cluster
    assert(got(0L) == ((0L, true)))
    assert(got(1L) == ((0L, false)))
    assert(got(2L) == ((0L, false)))
    assert(got(3L) == ((0L, false)))
    // 4 distinct, 5 too short to shingle — both keep themselves
    assert(got(4L) == ((4L, true)))
    assert(got(5L) == ((5L, true)))
    assert(got.size == 6) // exactly one row per input doc
  }

  test("manifest and contamination from a precomputed shingle table equal the self-computed path") {
    val table = Dedup.shingleTable(docs)
    val direct = Dedup.dedupManifest(docs, threshold = 0.2).collect().toSet
    graft.Caches.releaseAll() // drop the manifest cache so the next call really rebuilds
    val viaTable = Dedup.dedupManifest(docs, threshold = 0.2,
      shingles = Some(Dedup.shingleTable(docs))).collect().toSet
    assert(viaTable == direct)
    val train = docs.filter($"doc_id" < 4)
    val bench = docs.filter($"doc_id" >= 4)
    val directC = Dedup.contamination(train, bench).collect().toSet
    graft.Caches.releaseAll()
    val t2 = Dedup.shingleTable(docs)
    val viaTableC = Dedup.contamination(train, bench,
      trainShingles = Some(t2.join(train.select("doc_id"), Seq("doc_id"), "left_semi")),
      benchShingles = Some(t2.join(bench.select("doc_id"), Seq("doc_id"), "left_semi")))
      .collect().toSet
    assert(viaTableC == directC)
  }

  test("simhash recovers every fingerprint-equal pair (the d04a guarantee)") {
    // docs 0/1/2 share one content fingerprint (byte copy + case/ws copy):
    // identical normalized text tokenizes identically, so their simhashes
    // are bit-equal and the banding must surface all three pairs
    val fp = docs.select($"doc_id",
      graft.text.TextAnalysis.fingerprint($"text").as("fp"))
    val expect = fp.as("a")
      .join(fp.as("b"), col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    assert(expect == Set((0L, 1L), (0L, 2L), (1L, 2L)))
    val sim = Dedup.simhashNearDuplicates(docs, maxHamming = 6)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(expect.subsetOf(sim))
  }

  test("approx manifest: exact-dup groups identical, near-dup keepers high recall") {
    // the sf0.001 fixture has near-dups but no byte-identical copies —
    // add exact copies of three docs so the deterministic star-edge path
    // is genuinely exercised, not vacuously true
    val real = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select($"doc_id", $"text")
    val copies = real.filter($"doc_id".isin(0L, 1L, 2L))
      .select(($"doc_id" + 100000L).as("doc_id"), $"text")
    val corpus = real.union(copies)
    val exact = Dedup.dedupManifest(corpus, threshold = 0.2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Dedup.dedupManifestApprox(corpus, threshold = 0.2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet) // one row per doc, both forms
    // every exact-duplicate (same fingerprint) group must co-cluster in
    // the APPROX manifest — that evidence path is deterministic star
    // edges, not LSH-probabilistic
    val fpGroups = corpus.select(
      graft.text.TextAnalysis.fingerprint(col("text")).as("fp"), col("doc_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).values.map(_.map(_._2).toSeq).filter(_.size > 1).toSeq
    assert(fpGroups.nonEmpty, "fixture should contain exact duplicates")
    fpGroups.foreach { g =>
      assert(g.map(approx).distinct.size == 1,
        s"exact-fp group $g split across approx clusters")
    }
    // LSH recall on the full keeper assignment: banding may miss
    // borderline-Jaccard pairs, but must agree on the vast majority
    val agree = exact.count { case (id, k) => approx(id) == k }
    assert(agree.toDouble / exact.size >= 0.95,
      s"approx manifest diverges: $agree/${exact.size}")
  }

  test("incremental dedup classifies a batch against a standing corpus") {
    val corpus = docs.filter($"doc_id".isin(0L, 4L, 5L))
    val batch = docs.filter($"doc_id".isin(1L, 2L, 3L))
      .union(Seq((6L, "completely fresh content with nothing shared anywhere " +
        "whale violin umbrella torch sunflower river quartz planet ocean nebula"))
        .toDF("doc_id", "text"))
    val got = Dedup.incrementalDedup(corpus, batch, threshold = 0.2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got(1L) == (("exact_dup", Some(0L), None))) // byte-identical
    assert(got(2L) == (("exact_dup", Some(0L), None))) // ws/case variant
    assert(got(3L) == (("near_dup", Some(0L), Some(0.7143))))
    assert(got(6L) == (("new", None, None)))
    assert(got.size == 4)
  }

  test("contamination: overlap fraction vs a benchmark holdout") {
    val bench = Seq((100L, base)).toDF("doc_id", "text")
    val train = docs.filter($"doc_id".isin(3L, 4L, 5L))
    val got = Dedup.contamination(train, bench, threshold = 0.5).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // doc 3: one token of 20 changed -> 15 of its 18 shingles still match
    assert(got(3L) == ((18L, 15L, 0.8333, true)))
    // doc 4 shares nothing; doc 5 has no shingles and is absent
    assert(got(4L) == ((17L, 0L, 0.0, false)))
    assert(!got.contains(5L))
    assert(got.size == 2)
  }

  test("exact 13-gram decontamination: any shared 13-gram flags, 12 does not") {
    // base has 20 tokens; a doc sharing its first 13 tokens collides on
    // exactly one 13-gram; one sharing only 12 consecutive tokens cannot
    val toks = base.split(" ")
    val share13 = toks.take(13).mkString(" ") +
      " padding words so the doc has enough tokens to shingle"
    val share12 = toks.take(12).mkString(" ") +
      " padding words so the doc has enough tokens to shingle too"
    val bench = Seq((100L, base)).toDF("doc_id", "text")
    val train = Seq((1L, share13), (2L, share12)).toDF("doc_id", "text")
    val got = Dedup.contamination(train, bench, threshold = 1.0, n = 13)
      .select(col("doc_id"), col("n_overlap"), (col("n_overlap") >= 1).as("c"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(1L) == ((1L, true)))
    assert(got(2L) == ((0L, false)))
  }

  test("winnowing: copies share all fingerprints, near-dups most, distinct none") {
    val pairs = Dedup.winnowingNearDuplicates(docs, minJaccard = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) == 1.0) // normalization: case + whitespace
    assert(pairs((0L, 3L)) > 0.5 && pairs((0L, 3L)) < 1.0)
    assert(!pairs.contains((0L, 4L)))
  }

  test("simhash: identical docs at hamming 0, near-dups close, distinct far") {
    val sigs = Dedup.simhash64(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) == sigs(2L)) // tokens lower-cased first
    val near = java.lang.Long.bitCount(sigs(0L) ^ sigs(3L))
    val far = java.lang.Long.bitCount(sigs(0L) ^ sigs(4L))
    assert(near < far, s"near=$near far=$far")
    val nd = Dedup.simhashNearDuplicates(docs, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd.contains((0L, 1L)) && nd.contains((0L, 2L)) && nd.contains((1L, 2L)))
    assert(!nd.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash recall on testdata: complete at J>=0.8, graceful below") {
    // no parameter-backed guarantee maps Jaccard to a Hamming bound
    // (unlike MinHash banding), so this is MEASURED recall on the fixed
    // corpus — the empirical evidence behind d04's rows-only driver
    // entry. SimHash's contract is NEAR-IDENTICAL text: at J >= 0.8
    // recall must be complete; at J >= 0.6 it degrades, but the missed
    // pairs must sit just outside the radius (signal, not noise — a
    // random unrelated pair is at hamming ~32 of 64).
    val real = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val exact = Dedup.ngramJaccardPairs(real, threshold = 0.6)
      .select("d1", "d2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sim = Dedup.simhashNearDuplicates(real, maxHamming = 6)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = Dedup.simhash64(real).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // short docs are SimHash's known weak spot: with ~40 features each of
    // the 64 bits is a small weighted sum, so one token swap flips several
    // bits (measured here: a J=0.976 pair of 42-token docs at hamming 7).
    // The completeness claim is therefore scoped to docs long enough for
    // the signature to concentrate.
    val nTok = real.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")
        .trim.split("\\s+").length).toMap
    val strong = exact.filter { case ((a, b), j) =>
      j >= 0.8 && nTok(a) >= 60 && nTok(b) >= 60 }.keySet
    assert(strong.nonEmpty && (strong -- sim).isEmpty,
      s"simhash missed near-identical long-doc pairs: ${strong -- sim}")
    val all = exact.keySet
    val recall = (all & sim).size.toDouble / all.size
    assert(recall >= 0.85, s"J>=0.6 recall $recall below floor")
    (all -- sim).foreach { case (a, b) =>
      val h = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      assert(h <= 12, s"missed pair ($a,$b) at hamming $h — noise, not near-miss")
    }
  }

  test("keeperByScore: best copy wins, min-id breaks ties, singletons keep") {
    // d08-shaped manifest: cluster {1,2,3} labelled by min id 1; singleton 9
    val manifest = Seq((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (9L, 9L, true)).toDF("doc_id", "keeper_id", "is_keeper")
    val scores = Seq((1L, 100L), (2L, 400L), (3L, 400L), (9L, 50L))
      .toDF("doc_id", "score")
    val got = Dedup.keeperByScore(manifest, scores).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    // docs 2 and 3 tie on score 400 → the smaller id 2 becomes keeper
    assert(got(1L) == ((2L, false)))
    assert(got(2L) == ((2L, true)))
    assert(got(3L) == ((2L, false)))
    assert(got(9L) == ((9L, true))) // singleton keeps itself
  }

  test("keeperByScore keeps unscored docs in the manifest, never as keeper") {
    val manifest = Seq((1L, 1L, true), (2L, 1L, false), (3L, 1L, false))
      .toDF("doc_id", "keeper_id", "is_keeper")
    val scores = Seq((2L, 10L)).toDF("doc_id", "score") // 1 and 3 unscored
    val got = Dedup.keeperByScore(manifest, scores).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // nobody silently deleted
    assert(got.values.forall(_._1 == 2L)) // the only scored doc wins
    assert(got(2L)._2 && !got(1L)._2 && !got(3L)._2)
  }

  test("bloomDecontam: the Bloom gate is exact — result equals the ungated semi-join") {
    // real-data check on sf0.001 with the d16 split: the Bloom prefilter
    // must be a pure physical optimization (no false negatives), so the
    // gated result and the plain contamination semi-join are frame-equal
    val docs = graft.Tables(spark, sf("sf0.001"), "documents")
    val train = docs.filter(col("doc_id") % 17 =!= 0)
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val gated = Dedup.bloomDecontam(train, bench, n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    val exact = Dedup.contamination(train, bench, threshold = 1.0, n = 5)
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        (col("n_overlap") >= 1).as("contaminated"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(gated == exact, "Bloom gate changed the exact result")
    assert(exact.exists(_._4) && exact.exists(!_._4),
      "fixture degenerate: need both contaminated and clean docs")
  }

  test("bloom filter: no false negatives on members; fpp holds on non-members") {
    import org.apache.spark.util.sketch.BloomFilter
    val members = (0L until 10000L).map(_ * 2654435761L)
    val bloom = BloomFilter.create(members.size.toLong, 0.01)
    members.foreach(bloom.putLong)
    assert(members.forall(bloom.mightContainLong),
      "Bloom filter dropped a true member — the exactness argument breaks")
    val nonMembers = (1L to 100000L).map(_ * 7046029254386353131L + 13L)
      .filterNot(members.toSet)
    val fp = nonMembers.count(bloom.mightContainLong).toDouble / nonMembers.size
    assert(fp < 0.03, s"false-positive rate $fp way past the 1% design point")
  }

  test("fuzzyLinks: blocked edit-distance linkage on a known fixture") {
    val rows = Seq(
      "acme corp", "acme corp", "acme corp", // 3 rows, one value
      "acme corpp",  //                   dist 1 from "acme corp"
      "acme co",     //                   dist 2 from "acme corp"
      "acmee corp",  //                   FIRST token differs → other block
      "beta llc")    //                   unrelated
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
    val links = Dedup.fuzzyLinks(rows, "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    // pairs sharing the "acme" block within 2 edits, with multiplicities
    assert(links(("acme corp", "acme corpp")) == ((1, 3L, 1L)))
    assert(links(("acme co", "acme corp")) == ((2, 1L, 3L)))
    // dist("acme co","acme corpp") = 3 → over budget, absent
    assert(!links.contains(("acme co", "acme corpp")))
    // the blocking contract: a typo in the FIRST token lands in another
    // block and is not linked, however close — documented recall boundary
    assert(!links.keySet.exists(p => p._1 == "acmee corp" || p._2 == "acmee corp"))
    assert(!links.keySet.exists(p => p._1.startsWith("beta") || p._2.startsWith("beta")))
  }
}
