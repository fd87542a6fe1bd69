package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.etl.Tombstones
import graft.similarity.{IndexStore, Similarity}

/** Targeted deletion over the streamed layouts: logical delete is
  * immediate (reads mask, content stops shadowing, ids are banned at the
  * door), physical purge rides compaction and clears the log last, every
  * crash window re-runs to completion, and a post-purge re-submission is
  * a fresh document again. */
class TombstonesSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
    "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val other = "entirely different words live here walrus vulture " +
    "unicorn tiger snake rabbit quail panda otter newt mole lynx koala"
  private val third = "completely fresh content whale violin umbrella " +
    "torch sunflower river quartz planet ocean nebula comet glacier meadow"

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))

  private def fs(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def corpusIds(m: CorpusIngest.Merger): Set[Long] =
    m.corpus().select("doc_id").collect().map(_.getLong(0)).toSet

  private def rawIds(table: String): Set[Long] =
    spark.read.parquet(table).select("doc_id")
      .collect().map(_.getLong(0)).toSet

  // ---- corpus side -------------------------------------------------------

  test("corpus delete: immediate mask, content stops shadowing, id banned") {
    val dir = Files.createTempDirectory("graft_ts_corpus").toString
    val m = new CorpusIngest.Merger(spark, dir)
    m.mergeBatch(docs((0L, base), (1L, other)), 0L)
    assert(corpusIds(m) == Set(0L, 1L))

    CorpusIngest.delete(spark, dir, Seq(0L).toDF("doc_id"))

    // masked from reads immediately, physical rows untouched
    assert(corpusIds(m) == Set(1L))
    assert(rawIds(s"$dir/docs") == Set(0L, 1L),
      "logical delete must not rewrite the docs table")

    // the deleted doc's content no longer shadows: an exact copy under a
    // NEW id is admitted (pre-delete it would be refused as a duplicate)
    m.mergeBatch(docs((10L, base)), 1L)
    assert(corpusIds(m) == Set(1L, 10L),
      "a copy of a deleted doc must be admissible — the deleted content " +
        "must not influence admission")

    // the deleted ID is banned at the door until purged
    m.mergeBatch(docs((0L, third)), 2L)
    assert(corpusIds(m) == Set(1L, 10L),
      "a tombstoned doc_id must be refused re-admission before the purge")
  }

  test("corpus purge: physical removal from all tables, log cleared, id free again") {
    val dir = Files.createTempDirectory("graft_ts_purge").toString
    val m = new CorpusIngest.Merger(spark, dir)
    m.mergeBatch(docs((0L, base), (1L, other)), 0L)
    m.mergeBatch(docs((2L, third)), 1L)
    CorpusIngest.delete(spark, dir, Seq(0L).toDF("doc_id"))

    CorpusIngest.purge(spark, dir)

    CorpusIngest.Tables.foreach { sub =>
      assert(!rawIds(s"$dir/$sub").contains(0L),
        s"purge must physically remove doc 0 from $sub")
    }
    assert(Tombstones.slices(spark, dir).isEmpty,
      "an applied tombstone log must be cleared")
    assert(corpusIds(m) == Set(1L, 2L))
    // purge rides compaction: single consolidated slice per table
    CorpusIngest.Tables.foreach { sub =>
      val slices = fs(dir).listStatus(new Path(s"$dir/$sub"))
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("batch=")).toSet
      assert(slices == Set("batch=-1"), s"$sub not compacted: $slices")
    }

    // after the purge the id is free: a deliberate re-submission of
    // doc_id 0 is a fresh document again
    m.mergeBatch(docs((0L, base)), 2L)
    assert(corpusIds(m) == Set(0L, 1L, 2L))
  }

  test("purge crash window: log outlives a partial purge; re-run completes") {
    val dir = Files.createTempDirectory("graft_ts_crash").toString
    val m = new CorpusIngest.Merger(spark, dir)
    m.mergeBatch(docs((0L, base), (1L, other)), 0L)
    CorpusIngest.delete(spark, dir, Seq(1L).toDF("doc_id"))

    // simulate a purge that crashed after the FIRST table: apply the
    // tombstones to docs only, leave fps/shingles and the log untouched
    val ids = Tombstones.ids(spark, dir, "doc_id").get
    Compaction.compactTable(spark, s"$dir/docs",
      dropIds = Some((ids, "doc_id")))

    assert(!rawIds(s"$dir/docs").contains(1L))
    assert(rawIds(s"$dir/fps").contains(1L),
      "fixture: the crash left fps unpurged")
    assert(Tombstones.slices(spark, dir).nonEmpty,
      "the log must survive a partial purge — it still masks fps/shingles")
    assert(corpusIds(m) == Set(0L), "reads must stay masked mid-crash")

    // re-running the purge is the complete repair
    CorpusIngest.purge(spark, dir)
    CorpusIngest.Tables.foreach(sub =>
      assert(!rawIds(s"$dir/$sub").contains(1L)))
    assert(Tombstones.slices(spark, dir).isEmpty)
  }

  test("tombstones added during a purge survive it and apply on the next") {
    val dir = Files.createTempDirectory("graft_ts_concurrent").toString
    val m = new CorpusIngest.Merger(spark, dir)
    m.mergeBatch(docs((0L, base), (1L, other), (2L, third)), 0L)
    CorpusIngest.delete(spark, dir, Seq(0L).toDF("doc_id"))
    val snapshot = Tombstones.slices(spark, dir)
    val ids = Tombstones.idsIn(spark, snapshot, "doc_id").get
    // a second delete lands while the purge below is "running"
    CorpusIngest.delete(spark, dir, Seq(1L).toDF("doc_id"))
    CorpusIngest.Tables.foreach(sub => Compaction.compactTable(spark,
      s"$dir/$sub", dropIds = Some((ids, "doc_id"))))
    Tombstones.clear(spark, dir, snapshot)

    assert(Tombstones.slices(spark, dir).size == 1,
      "the concurrently added slice must not be cleared unapplied")
    assert(corpusIds(m) == Set(2L), "doc 1 still logically deleted")
    CorpusIngest.purge(spark, dir)
    assert(!rawIds(s"$dir/docs").contains(1L))
    assert(Tombstones.slices(spark, dir).isEmpty)
  }

  // ---- vector-index side -------------------------------------------------

  private def vecs(ids: Range) =
    ids.map { i =>
      val l = i % 4
      val e = Array.tabulate(8)(d =>
        (if (d == l) 1.0f else 0.0f) + 0.01f * ((i * 7 + d) % 10))
      (i.toLong, e, l)
    }.toDF("vec_id", "embedding", "label")

  private def probeIds(dir: String, qf: org.apache.spark.sql.Column): Set[Long] = {
    val idx = IndexStore.loadIvf(spark, dir)
    val out = idx.topK(qf, k = 40, nprobe = 4)
      .select("nid").collect().map(_.getLong(0)).toSet
    idx.release()
    out
  }

  test("vector delete: masked from every probe, banned from redelivery, purge frees") {
    val dir = Files.createTempDirectory("graft_ts_vec").toString
    val m = new VectorIngest.Merger(spark, dir, nlist = 4)
    m.mergeBatch(vecs(0 until 20), 0L)
    m.mergeBatch(vecs(20 until 40), 1L)
    val qf = col("vec_id") === 3L
    assert(probeIds(dir, qf).contains(7L))

    VectorIngest.delete(spark, dir, Seq(7L).toDF("vec_id"))
    assert(!probeIds(dir, qf).contains(7L),
      "a deleted vector must vanish from loadIvf probes immediately")
    assert(spark.read.parquet(s"$dir/assigned").filter($"vec_id" === 7L)
      .count() == 1, "logical delete must not rewrite the assigned table")

    // redelivery of the banned id (its physical row sits in batch 1's
    // own partition, which the replay excludes) must not readmit it
    m.mergeBatch(vecs(20 until 40), 1L)
    VectorIngest.delete(spark, dir, Seq(25L).toDF("vec_id"))
    m.mergeBatch(vecs(20 until 40), 1L)
    assert(spark.read.parquet(s"$dir/assigned").filter($"vec_id" === 25L)
      .count() == 0, "a tombstoned vec_id redelivered into its own " +
        "replayed batch must be refused at the door")

    VectorIngest.purge(spark, dir)
    assert(spark.read.parquet(s"$dir/assigned").filter($"vec_id" === 7L)
      .count() == 0, "purge must physically remove the vector")
    assert(Tombstones.slices(spark, dir).isEmpty)
    val postPurge = probeIds(dir, qf)
    assert(!postPurge.contains(7L))
    assert(postPurge.contains(11L), "other vectors unaffected")

    // the id is free again: re-ingested in a fresh batch, retrievable
    m.mergeBatch(vecs(7 until 8), 2L)
    assert(probeIds(dir, qf).contains(7L))
  }

  private def appliedDirs(root: String): Set[String] = {
    val log = new Path(s"$root/_tombstones")
    if (!fs(root).exists(log)) Set.empty
    else fs(root).listStatus(log).map(_.getPath.getName)
      .filter(_.startsWith("applied=")).toSet
  }

  test("a crash-replay after delete+purge cannot resurrect opted-out vectors") {
    val dir = Files.createTempDirectory("graft_ts_resurrect").toString
    val m = new VectorIngest.Merger(spark, dir, nlist = 4)
    m.mergeBatch(vecs(0 until 20), 0L)
    // batch 1 commits to the STORE, but its source offsets may lag —
    // Structured Streaming would replay it after a crash
    m.mergeBatch(vecs(20 until 40), 1L)
    VectorIngest.delete(spark, dir, Seq(25L).toDF("vec_id"))
    VectorIngest.purge(spark, dir)
    assert(spark.read.parquet(s"$dir/assigned").filter($"vec_id" === 25L)
      .count() == 0)
    assert(appliedDirs(dir).size == 1,
      "purge must RETIRE the slice, not delete it — the ban must outlive " +
        "the purge for the still-replayable batch")

    // the crash-replay: batch 1 redelivers vec 25 — it is in neither the
    // standing corpus (purged) nor the live log (retired); only the
    // retired slice's ban keeps it out
    m.mergeBatch(vecs(20 until 40), 1L)
    assert(spark.read.parquet(s"$dir/assigned").filter($"vec_id" === 25L)
      .count() == 0,
      "a crash-replay after purge resurrected an opted-out vector")

    // a later batch commits -> the replayable window closes and the
    // retired slice is swept
    m.mergeBatch(vecs(40 until 45), 2L)
    assert(appliedDirs(dir).isEmpty,
      "the retired slice must be swept once a later batch commits")
    // after which the id is genuinely free for deliberate re-submission
    m.mergeBatch(vecs(25 until 26), 3L)
    assert(spark.read.parquet(s"$dir/assigned").filter($"vec_id" === 25L)
      .count() == 1)
  }

  test("purge racing a concurrent ingest commit: refusal fires or both effects survive") {
    // r9 verdict #8 — the untested window: a purge's compaction swap
    // interleaving with a mergeBatch COMMIT on the same streamed table.
    // The design resolves the race by REFUSAL (the merge's inProgress
    // gate), so the spec drives the table through both mid-purge crash
    // states, asserts the concurrent commit refuses loudly in each, then
    // completes the designed repair (recoverTable + purge re-run) and
    // proves no silent row loss: every non-banned row from both sides of
    // the race survives.
    val dir = Files.createTempDirectory("graft_ts_race").toString
    val m = new VectorIngest.Merger(spark, dir, nlist = 4)
    m.mergeBatch(vecs(0 until 20), 0L)
    m.mergeBatch(vecs(20 until 40), 1L)
    // the banned id sits in batch 1 — the LATEST committed batch, the
    // only one still inside the replay window (BatchMarker refuses older
    // ids as fresh-checkpoint misuse)
    VectorIngest.delete(spark, dir, Seq(25L).toDF("vec_id"))
    val table = s"$dir/assigned"
    val f = fs(dir)
    def vecIds(t: String): Set[Long] =
      spark.read.parquet(t).select("vec_id").collect().map(_.getLong(0)).toSet

    // (a) purge crashed BEFORE its swap (incomplete tmp, live intact):
    // the concurrent commit must refuse, not interleave with the swap
    f.mkdirs(new Path(table + ".compact_tmp/batch=-1"))
    val e1 = intercept[IllegalArgumentException] {
      m.mergeBatch(vecs(40 until 45), 2L)
    }
    assert(e1.getMessage.contains("compaction leftovers"))
    assert(vecIds(table) == (0L until 40L).toSet,
      "the refused commit must leave the table untouched")
    Compaction.recoverTable(spark, table) // rolls back the junk tmp

    // (b) purge crashed MID-SWAP: rewrite complete (banned id dropped,
    // _SUCCESS present), live staged aside, log not yet retired — the
    // exact state between compactTable's two renames
    val kept = spark.read.option("basePath", table).parquet(table)
      .filter($"vec_id" =!= 25L).drop("batch").localCheckpoint()
    kept.repartition(1).write.parquet(table + ".compact_tmp/batch=-1")
    assert(f.rename(new Path(table), new Path(table + ".compact_old")))
    val e2 = intercept[IllegalArgumentException] {
      m.mergeBatch(vecs(40 until 45), 2L)
    }
    assert(e2.getMessage.contains("compaction leftovers"))

    // the designed repair: recovery rolls the complete rewrite forward,
    // the log (crash happened before retire) still masks, and re-running
    // the purge retires it — then the refused commit goes through
    Compaction.recoverTable(spark, table)
    assert(vecIds(table) == (0L until 40L).toSet - 25L)
    assert(Tombstones.slices(spark, dir).nonEmpty,
      "a purge that crashed before retiring must leave the log masking")
    VectorIngest.purge(spark, dir)
    assert(Tombstones.slices(spark, dir).isEmpty)

    // the banned id stays out of a crash-replay of its ORIGINAL batch
    // while that batch is still inside the replay window (the purge
    // retired the slice against the high water instead of deleting it)
    m.mergeBatch(vecs(20 until 40), 1L)
    assert(!vecIds(table).contains(25L),
      "a replayed batch readmitted a purged id inside the replay window")

    // the refused commit finally goes through: no silent row loss
    // anywhere in the interleaving — both the pre-race corpus (minus
    // the banned id) and the racing batch landed exactly once
    m.mergeBatch(vecs(40 until 45), 2L)
    assert(vecIds(table) == (0L until 45L).toSet - 25L)
  }

  test("a crash-replay after delete+purge cannot resurrect opted-out docs") {
    val dir = Files.createTempDirectory("graft_ts_resurrect_doc").toString
    val m = new CorpusIngest.Merger(spark, dir)
    m.mergeBatch(docs((0L, base)), 0L)
    m.mergeBatch(docs((1L, other), (2L, third)), 1L)
    CorpusIngest.delete(spark, dir, Seq(2L).toDF("doc_id"))
    CorpusIngest.purge(spark, dir)
    m.mergeBatch(docs((1L, other), (2L, third)), 1L) // crash-replay
    assert(corpusIds(m) == Set(0L, 1L),
      "a crash-replay after purge resurrected an opted-out document")
    m.mergeBatch(docs((9L, "brand new closing content beacon anchor " +
      "harbor lighthouse breaker jetty marina drydock wharf pier")), 2L)
    assert(appliedDirs(dir).isEmpty)
    assert(corpusIds(m) == Set(0L, 1L, 9L))
  }

  test("saveIvf overwrite clears a stale tombstone log") {
    val dir = Files.createTempDirectory("graft_ts_overwrite").toString
    val idx = Similarity.buildIvfIndex(vecs(0 until 20), nlist = 4)
    IndexStore.saveIvf(idx, dir)
    VectorIngest.delete(spark, dir, Seq(5L).toDF("vec_id"))
    assert(!probeIds(dir, col("vec_id") === 1L).contains(5L))

    // a REPLACED index may recycle vec_ids — the old ban must not
    // silently mask the new index's vector 5
    IndexStore.saveIvf(idx, dir, overwrite = true)
    assert(probeIds(dir, col("vec_id") === 1L).contains(5L),
      "overwrite must clear the stale tombstone log")
    idx.release()
  }

  test("purge on a NON-streamed saveIvf store rewrites before clearing the log") {
    // the layout here has no batch= slices — a purge that skipped the
    // rewrite but cleared the log would silently resurrect the vector
    val dir = Files.createTempDirectory("graft_ts_plain").toString
    val idx = Similarity.buildIvfIndex(vecs(0 until 20), nlist = 4)
    IndexStore.saveIvf(idx, dir)
    idx.release()
    IndexStore.delete(spark, dir, Seq(5L).toDF("vec_id"))
    IndexStore.purgeDeletes(spark, dir)
    assert(spark.read.parquet(s"$dir/assigned").filter($"vec_id" === 5L)
      .count() == 0, "purge must physically rewrite a plain-layout store")
    assert(Tombstones.slices(spark, dir).isEmpty)
    assert(!probeIds(dir, col("vec_id") === 1L).contains(5L))
    assert(probeIds(dir, col("vec_id") === 1L).contains(6L))
  }

  test("PQ store: delete masks every loadPq scan; purge removes physically") {
    val dir = Files.createTempDirectory("graft_ts_pq").toString
    val emb = vecs(0 until 32)
    val idx = Similarity.buildPqIndex(emb)
    IndexStore.savePq(idx, dir)
    IndexStore.delete(spark, dir, Seq(9L).toDF("vec_id"))
    assert(IndexStore.loadPq(spark, dir).codes
      .filter($"vec_id" === 9L).count() == 0,
      "a deleted vector must vanish from loadPq immediately")
    IndexStore.purgeDeletes(spark, dir)
    assert(spark.read.parquet(s"$dir/codes").filter($"vec_id" === 9L)
      .count() == 0)
    assert(Tombstones.slices(spark, dir).isEmpty)
    // the untouched codes still load and carry every other vector
    val reloaded = IndexStore.loadPq(spark, dir)
    assert(reloaded.codes.count() == 31)
    idx.release(); reloaded.release()
  }

  test("delete refuses a directory that is not a graft index") {
    val dir = Files.createTempDirectory("graft_ts_notidx").toString
    val err = intercept[IllegalArgumentException](
      IndexStore.delete(spark, dir, Seq(1L).toDF("vec_id")))
    assert(err.getMessage.contains("not a graft index"))
  }

  test("the tombstone mask's anti-join broadcasts the request-sized ban list") {
    // SCALING.md's deletion design rests on this plan shape: the ban
    // list is opt-out-request-sized, so the reader-side mask must be a
    // BROADCAST anti-join (per-row probe riding the existing scan),
    // never a shuffle of the corpus. Asserted on the EXECUTED plan —
    // AQE's runtime re-plan included — not just the optimizer's guess.
    val dir = Files.createTempDirectory("graft_ts_plan").toString
    val m = new VectorIngest.Merger(spark, dir, nlist = 4)
    m.mergeBatch(vecs(0 until 40), 0L)
    VectorIngest.delete(spark, dir, Seq(7L).toDF("vec_id"))
    val idx = IndexStore.loadIvf(spark, dir)
    idx.assigned.collect() // materialize so AQE finalizes the plan
    val p = idx.assigned.queryExecution.executedPlan.toString
    idx.release()
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"tombstone mask did not broadcast the ban list:\n$p")
  }

  test("tombstone add: distinct ids, audit reason, crash leaves no half slice") {
    val dir = Files.createTempDirectory("graft_ts_log").toString
    Tombstones.add(spark, dir, Seq(1L, 1L, 2L).toDF("doc_id"), "doc_id",
      reason = "dmca")
    Tombstones.add(spark, dir, Seq(2L, 3L).toDF("doc_id"), "doc_id")
    val log = spark.read.parquet(Tombstones.slices(spark, dir): _*)
    assert(log.filter($"reason" === "dmca").count() == 2)
    assert(Tombstones.ids(spark, dir, "doc_id").get
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // a crashed add (tmp dir left behind) is invisible to readers
    fs(dir).mkdirs(new Path(s"$dir/_tombstones/.add_tmp_99"))
    assert(Tombstones.slices(spark, dir).size == 2)
    // and a frame without the id column refuses loudly
    val err = intercept[IllegalArgumentException](
      Tombstones.add(spark, dir, Seq(1L).toDF("wrong"), "doc_id"))
    assert(err.getMessage.contains("doc_id"))
  }
}
