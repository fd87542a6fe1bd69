package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.{IndexStore, Similarity}

/** Small-file compaction of the streamed per-batch layouts: content is
  * provably unchanged (probe/dedup/corpus results identical), the layout
  * collapses to one `batch=-1` slice, every crash window of the atomic
  * swap recovers, replays after compaction stay safe, and a stream
  * racing a compaction is refused. */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def fs(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def batchDirs(table: String): Set[String] =
    fs(table).listStatus(new Path(table))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).toSet

  // ---- vector-index side -------------------------------------------------

  private def vecs(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map { i =>
      val l = i % 4
      val e = Array.tabulate(8)(d =>
        (if (d == l) 1.0f else 0.0f) + 0.01f * ((i * 7 + d) % 10))
      (i.toLong, e, l)
    }.toDF("vec_id", "embedding", "label")

  private def ingestedIndex(nBatches: Int): (String, VectorIngest.Merger) = {
    val dir = Files.createTempDirectory("graft_compact_idx").toString
    val m = new VectorIngest.Merger(spark, dir, nlist = 4)
    (0 until nBatches).foreach(b =>
      m.mergeBatch(vecs(b * 20 until (b + 1) * 20), b.toLong))
    (dir, m)
  }

  test("index compaction: one slice, probes identical, loadIvf intact, idempotent") {
    val (dir, m) = ingestedIndex(3)
    val qf = col("vec_id").isin(3L, 45L)
    val before = m.index()
    val want = before.topK(qf, k = 5, nprobe = 4)
      .orderBy("qid", "rank").collect().toSeq
    before.release()
    assert(batchDirs(s"$dir/assigned") == Set("batch=0", "batch=1", "batch=2"))

    VectorIngest.compact(spark, dir)
    assert(batchDirs(s"$dir/assigned") == Set("batch=-1"),
      "compaction must fold every slice into the single batch=-1 slice")
    val after = IndexStore.loadIvf(spark, dir)
    val got = after.topK(qf, k = 5, nprobe = 4)
      .orderBy("qid", "rank").collect().toSeq
    assert(got == want, "compaction changed probe results")
    assert(after.assigned.count() == 60)
    after.release()

    // idempotent: compacting a compacted table is a clean rewrite
    VectorIngest.compact(spark, dir)
    assert(batchDirs(s"$dir/assigned") == Set("batch=-1"))
    val again = IndexStore.loadIvf(spark, dir)
    assert(again.assigned.count() == 60)
    again.release()
  }

  test("replay and fresh batches stay safe after compaction") {
    val (dir, m) = ingestedIndex(2)
    VectorIngest.compact(spark, dir)
    // crash-replay of the last committed batch: its rows are already in
    // the consolidated slice (batch=-1 is outside the exclusion's id
    // range), so the replay admits nothing and content is unchanged
    m.mergeBatch(vecs(20 until 40), 1L)
    val idx = m.index()
    assert(idx.assigned.count() == 40, "replay after compaction lost or duplicated rows")
    assert(idx.assigned.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0)
    idx.release()
    // and the stream continues: a genuinely new batch lands and is
    // immediately retrievable alongside the compacted corpus
    m.mergeBatch(vecs(40 until 60), 2L)
    val idx2 = m.index()
    assert(idx2.assigned.count() == 60)
    val got = idx2.topK(col("vec_id") === 50L, k = 3, nprobe = 4)
      .orderBy("rank").collect().toSeq
    val want = Similarity.bruteForceTopK(vecs(0 until 60),
      col("vec_id") === 50L, k = 3).orderBy("rank").collect().toSeq
    assert(got == want)
    idx2.release()
  }

  test("every crash window of the swap recovers; merge refuses mid-compaction") {
    val (dir, m) = ingestedIndex(2)
    val table = s"$dir/assigned"
    val f = fs(table)
    val content = () => IndexStore.loadIvf(spark, dir).assigned
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = content()

    // (a) crash BEFORE the swap: tmp exists, live untouched -> tmp deleted
    f.mkdirs(new Path(table + ".compact_tmp/batch=-1"))
    assert(Compaction.inProgress(spark, table))
    val e = intercept[IllegalArgumentException](
      m.mergeBatch(vecs(100 until 110), 2L))
    assert(e.getMessage.contains("compaction"),
      "merge during compaction must name the compaction guard")
    Compaction.recoverTable(spark, table)
    assert(!Compaction.inProgress(spark, table) && content() == want)

    // (b) crash MID-SWAP with a COMPLETE tmp: roll forward to the
    // consolidated slice. Build the complete tmp the way compact does.
    spark.read.option("basePath", table).parquet(table).drop("batch")
      .repartition(1).write.parquet(table + ".compact_tmp/batch=-1")
    assert(f.rename(new Path(table), new Path(table + ".compact_old")))
    Compaction.recoverTable(spark, table)
    assert(!Compaction.inProgress(spark, table))
    assert(batchDirs(table) == Set("batch=-1") && content() == want,
      "roll-forward must finish the swap with identical content")

    // (c) crash MID-SWAP with an INCOMPLETE tmp (no _SUCCESS): roll back
    assert(f.rename(new Path(table), new Path(table + ".compact_old")))
    f.mkdirs(new Path(table + ".compact_tmp/batch=-1")) // junk, no _SUCCESS
    Compaction.recoverTable(spark, table)
    assert(!Compaction.inProgress(spark, table) && content() == want,
      "roll-back must restore the original table")

    // (d) crash AFTER publish: live is the new table, old remains -> cleanup
    f.mkdirs(new Path(table + ".compact_old"))
    Compaction.recoverTable(spark, table)
    assert(!Compaction.inProgress(spark, table) && content() == want)

    // compactTable itself runs recovery first: a crashed state does not
    // block the next compaction
    f.mkdirs(new Path(table + ".compact_tmp/batch=-1"))
    Compaction.compactTable(spark, table)
    assert(batchDirs(table) == Set("batch=-1") && content() == want)
  }

  // ---- corpus side -------------------------------------------------------

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
    "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val other = "entirely different words live here walrus vulture " +
    "unicorn tiger snake rabbit quail panda otter newt mole lynx koala"

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))

  test("corpus compaction preserves content and the standing dedup index") {
    val corpusDir = Files.createTempDirectory("graft_compact_corpus").toString
    val m = new CorpusIngest.Merger(spark, corpusDir)
    val fresh = "completely fresh content whale violin umbrella torch " +
      "sunflower river quartz planet ocean nebula comet glacier meadow"
    m.mergeBatch(docs((0L, base), (2L, other)), 0L)
    m.mergeBatch(docs((12L, fresh)), 1L)

    CorpusIngest.compact(spark, corpusDir)
    CorpusIngest.Tables.foreach(t =>
      assert(batchDirs(s"$corpusDir/$t") == Set("batch=-1"),
        s"$t must collapse to the consolidated slice"))
    assert(m.corpus().select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(0L, 2L, 12L))

    // the compacted fingerprint/shingle index still SEES its documents:
    // a later batch redelivering corpus content is rejected as duplicate,
    // only the genuinely new doc is admitted
    val fresher = "yet another disjoint vocabulary zeppelin yacht xylophone " +
      "wagon violet tunnel summit ridge prairie orchard nectar mesa lagoon"
    m.mergeBatch(docs(
      (20L, base), //                      exact dup of compacted doc 0
      (21L, base.replace("pi", "PHI")), // near-dup of compacted doc 0
      (22L, fresher)), 2L)
    assert(m.corpus().select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(0L, 2L, 12L, 22L),
      "compacted index must still dedup against standing documents")
  }
}
