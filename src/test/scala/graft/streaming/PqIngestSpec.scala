package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.etl.Tombstones
import graft.similarity.{IndexStore, Similarity}

/** Streamed PQ ingest: codes written at the door are exactly what the
  * trainer would assign (encode-kernel parity), the streamed index is
  * ADC-scorable immediately and equals brute force at the exact-rerank
  * dial, replays converge, the fresh-checkpoint guard holds, and
  * compaction + tombstone deletion compose unchanged over the layout. */
class PqIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map { i =>
      val l = i % 4
      val e = Array.tabulate(8)(d =>
        (if (d == l) 1.0f else 0.0f) + 0.01f * ((i * 7 + d) % 10))
      (i.toLong, e, l)
    }.toDF("vec_id", "embedding", "label")

  private def fs(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("streamed codes are immediately scorable; exact-rerank dial equals brute force") {
    val dir = Files.createTempDirectory("graft_pqidx").toString
    val m = new PqIngest.Merger(spark, dir, m = 4, k = 8)
    val b0 = vecs(0 until 40)
    val b1 = vecs(40 until 60)
    m.mergeBatch(b0, 0L)
    m.mergeBatch(b1, 1L)

    val corpus = b0.unionByName(b1)
    val qf = col("vec_id").isin(3L, 45L)
    val idx = m.index()
    assert(idx.codes.count() == 60)
    // with rerank covering the corpus, the ADC shortlist is exact-scored
    // in full — equality with brute force holds whatever the codes are
    val got = Similarity.pqProbe(idx, corpus, qf, topK = 5,
      rerank = Int.MaxValue).orderBy("qid", "rank").collect().toSeq
    val want = Similarity.bruteForceTopK(corpus, qf, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(got == want, "streamed PQ index diverged at the exact dial")
    idx.release()
  }

  test("encode kernel reproduces the trainer's own codes") {
    val dir = Files.createTempDirectory("graft_pqidx_enc").toString
    val m = new PqIngest.Merger(spark, dir, m = 4, k = 8)
    val b0 = vecs(0 until 40)
    m.mergeBatch(b0, 0L) // seed: codes written by the trainer's transform
    val books = IndexStore.readCodebooks(spark, dir)
    val want = spark.read
      .parquet(s"$dir/codes/batch=0")
      .select("vec_id", "code").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val got = Similarity.encodeWithCodebooks(b0, books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got == want,
      "encodeWithCodebooks disagrees with the trainer's assignment")
  }

  test("replay converges; fresh-checkpoint stream refused") {
    val dir = Files.createTempDirectory("graft_pqidx_replay").toString
    val m = new PqIngest.Merger(spark, dir, m = 4, k = 8)
    m.mergeBatch(vecs(0 until 40), 0L)
    // cross-batch redelivery: batch 1 re-delivers 10 ingested ids
    m.mergeBatch(vecs(30 until 50), 1L)
    m.mergeBatch(vecs(30 until 50), 1L) // and replays after a crash
    val codes = spark.read.option("basePath", s"$dir/codes")
      .parquet(s"$dir/codes")
    assert(codes.count() == 50, "replay or redelivery changed the corpus")
    assert(codes.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0)
    val e = intercept[IllegalArgumentException](
      m.mergeBatch(vecs(90 until 95), 0L))
    assert(e.getMessage.contains("high-water"))
  }

  test("compaction and tombstone deletion compose over the streamed PQ layout") {
    val dir = Files.createTempDirectory("graft_pqidx_maint").toString
    val m = new PqIngest.Merger(spark, dir, m = 4, k = 8)
    m.mergeBatch(vecs(0 until 20), 0L)
    m.mergeBatch(vecs(20 until 40), 1L)
    val corpus = vecs(0 until 40)
    val qf = col("vec_id") === 3L
    def probe(): Seq[org.apache.spark.sql.Row] = {
      val idx = IndexStore.loadPq(spark, dir)
      val out = Similarity.pqProbe(idx, corpus, qf, topK = 5,
        rerank = Int.MaxValue).orderBy("qid", "rank").collect().toSeq
      idx.release(); out
    }
    val want = probe()

    PqIngest.compact(spark, dir)
    val slices = fs(dir).listStatus(new Path(s"$dir/codes"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).toSet
    assert(slices == Set("batch=-1"))
    assert(probe() == want, "compaction changed ADC probe results")

    // kind-aware deletion: loadPq masks, purge rewrites codes physically
    IndexStore.delete(spark, dir, Seq(7L).toDF("vec_id"))
    val masked = IndexStore.loadPq(spark, dir)
    assert(masked.codes.filter($"vec_id" === 7L).count() == 0)
    masked.release()
    IndexStore.purgeDeletes(spark, dir)
    assert(spark.read.parquet(s"$dir/codes").filter($"vec_id" === 7L)
      .count() == 0)
    assert(Tombstones.slices(spark, dir).isEmpty)

    // and the stream resumes safely after maintenance
    m.mergeBatch(vecs(40 until 45), 2L)
    val idx2 = IndexStore.loadPq(spark, dir)
    assert(idx2.codes.count() == 44) // 40 − deleted 7 + 5 new
    idx2.release()
  }

  test("vector funnel log: exact accounting across seed, redelivery, and ban") {
    def funnel(dir: String,
        merge: (org.apache.spark.sql.DataFrame, Long) => Unit,
        del: org.apache.spark.sql.DataFrame => Unit,
        log: () => org.apache.spark.sql.DataFrame): Unit = {
      merge(vecs(0 until 20), 0L) // seed: all inserted
      del(Seq(30L).toDF("vec_id"))
      // batch 1 (21 rows): 10-19 redelivered, 30 banned, 20-29 inserted
      merge(vecs(10 until 31), 1L)
      // an id that is BOTH tombstoned and already standing reads as a
      // door refusal (ban stage first — the CorpusIngest funnel order),
      // never as a redelivery
      del(Seq(15L).toDF("vec_id"))
      merge(vecs(15 until 16), 2L)
      val rows = log().collect().map(r => r.getAs[Long]("batch") ->
        (r.getAs[Long]("arrived"), r.getAs[Long]("redelivered"),
          r.getAs[Long]("banned"), r.getAs[Long]("inserted"))).toMap
      assert(rows(0L) == ((20L, 0L, 0L, 20L)), s"seed: ${rows(0L)}")
      assert(rows(1L) == ((21L, 10L, 1L, 10L)), s"batch 1: ${rows(1L)}")
      assert(rows(2L) == ((1L, 0L, 1L, 0L)), s"batch 2: ${rows(2L)}")
      rows.values.foreach { case (a, r, b, i) => assert(a == r + b + i) }
    }
    val ivfDir = Files.createTempDirectory("graft_funnel_ivf").toString
    val mi = new VectorIngest.Merger(spark, ivfDir, nlist = 4,
      logStats = true)
    funnel(ivfDir, mi.mergeBatch,
      ids => VectorIngest.delete(spark, ivfDir, ids),
      () => VectorIngest.ingestLog(spark, ivfDir))
    val pqDir = Files.createTempDirectory("graft_funnel_pq").toString
    val mp = new PqIngest.Merger(spark, pqDir, m = 4, k = 8,
      logStats = true)
    funnel(pqDir, mp.mergeBatch,
      ids => IndexStore.delete(spark, pqDir, ids),
      () => PqIngest.ingestLog(spark, pqDir))
  }

  test("the full IVF-PQ production probe runs off the two streamed stores") {
    // the topology claim the twin ingests exist for: a vector streamed a
    // moment ago is IVF-routable AND ADC-scorable with no offline
    // rebuild — the composed probe over the two streamed stores equals
    // brute force at the exact dial (nprobe = nlist, rerank ≥ corpus)
    val ivfDir = Files.createTempDirectory("graft_tw_ivf").toString
    val pqDir = Files.createTempDirectory("graft_tw_pq").toString
    val mi = new VectorIngest.Merger(spark, ivfDir, nlist = 4)
    val mp = new PqIngest.Merger(spark, pqDir, m = 4, k = 8)
    Seq(0 until 20, 20 until 40).zipWithIndex.foreach { case (r, b) =>
      mi.mergeBatch(vecs(r), b.toLong); mp.mergeBatch(vecs(r), b.toLong)
    }
    val corpus = vecs(0 until 40)
    val qf = col("vec_id").isin(3L, 25L)
    val ivf = IndexStore.loadIvf(spark, ivfDir)
    val pq = IndexStore.loadPq(spark, pqDir)
    val got = Similarity.ivfPqTopK(ivf, pq, corpus, qf, topK = 5,
      nprobe = 4, rerank = Int.MaxValue)
      .orderBy("qid", "rank").collect().toSeq
    val want = Similarity.bruteForceTopK(corpus, qf, k = 5)
      .orderBy("qid", "rank").collect().toSeq
    assert(got == want,
      "composed probe over the two streamed stores diverged from brute force")
    ivf.release(); pq.release()
  }

  test("file-source stream end-to-end; cold session opens with loadPq") {
    val dropDir = Files.createTempDirectory("graft_pq_drop").toString
    val dir = Files.createTempDirectory("graft_pq_out").toString
    val ckpt = Files.createTempDirectory("graft_pq_ckpt").toString
    vecs(0 until 40).coalesce(1).write.mode("append").parquet(dropDir)
    val q = PqIngest.start(spark, dropDir, dir, ckpt, m = 4, k = 8)
    try {
      q.processAllAvailable()
      vecs(40 until 55).coalesce(1).write.mode("append").parquet(dropDir)
      q.processAllAvailable()
    } finally q.stop()
    val idx = IndexStore.loadPq(spark, dir)
    assert(idx.codes.count() == 55)
    val got = Similarity.pqProbe(idx, vecs(0 until 55),
      col("vec_id") === 50L, topK = 3, rerank = Int.MaxValue)
      .orderBy("rank").collect().toSeq
    val want = Similarity.bruteForceTopK(vecs(0 until 55),
      col("vec_id") === 50L, k = 3).orderBy("rank").collect().toSeq
    assert(got == want)
    idx.release()
  }
}
