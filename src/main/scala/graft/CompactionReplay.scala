package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Measures what [[graft.streaming.Compaction]] buys: the same streamed
  * index probed before and after its per-batch slices collapse into one.
  *
  * The cost compaction removes is NOT data volume — content is unchanged —
  * but the per-file fixed costs a fragmented layout pays on every scan:
  * directory listing, footer reads, one reader open per tiny file. Those
  * costs scale with BATCH COUNT, not bytes, which is why a 100 TB corpus
  * ingested at a 1-minute trigger (~1,440 slices/day/table) degrades even
  * while total bytes stay flat, and why every log-structured format pairs
  * appends with a compactor. This harness makes that cost visible at
  * contract scale: the sf embedding corpus ingested as `nBatches`
  * micro-batches, scan + full-probe timed fragmented vs compacted.
  * Numbers land in SCALING.md next to the heap rehearsal.
  *
  * Usage: runMain graft.CompactionReplay [sfDir] [workDir] [nBatches] [reps]
  */
object CompactionReplay {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-compaction-replay")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("/tmp/graft_compaction_replay")
    val nBatches = args.lift(2).map(_.toInt).getOrElse(200)
    val reps = args.lift(3).map(_.toInt).getOrElse(5)

    val emb = Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding", "label")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val per = math.max(1L, (n + nBatches - 1) / nBatches)

    val indexDir = s"$workDir/index"
    val f = new Path(indexDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(workDir), true)
    val merger = new graft.streaming.VectorIngest.Merger(spark, indexDir)
    (0 until nBatches).foreach { b =>
      val lo = b * per
      merger.mergeBatch(
        emb.filter(col("vec_id") >= lo && col("vec_id") < lo + per), b.toLong)
    }

    def files(dir: String): Long =
      f.getContentSummary(new Path(dir)).getFileCount
    def med(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size/2 - 1) + s(s.size/2)) / 2
    }
    // per-rep cache-free timings: the fixed costs under test (listing,
    // footer reads, per-file opens) are exactly what caching would hide
    def timeScan(): Double = med((1 to reps).map { _ =>
      val t0 = System.nanoTime()
      spark.read.parquet(s"$indexDir/assigned").count()
      (System.nanoTime() - t0) / 1e9
    })
    def timeProbe(): Double = med((1 to reps).map { _ =>
      val idx = graft.similarity.IndexStore.loadIvf(spark, indexDir)
      val t0 = System.nanoTime()
      idx.topK(col("vec_id") < 5, k = 5, nprobe = 4)
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      idx.release()
      sec
    })

    val filesBefore = files(s"$indexDir/assigned")
    val scanBefore = timeScan()
    val probeBefore = timeProbe()
    val tCompact0 = System.nanoTime()
    graft.streaming.VectorIngest.compact(spark, indexDir)
    val compactSec = (System.nanoTime() - tCompact0) / 1e9
    val filesAfter = files(s"$indexDir/assigned")
    val scanAfter = timeScan()
    val probeAfter = timeProbe()

    println(f"[compaction] rows=$n batches=$nBatches " +
      f"files $filesBefore -> $filesAfter | " +
      f"scan $scanBefore%.2f s -> $scanAfter%.2f s | " +
      f"full-probe $probeBefore%.2f s -> $probeAfter%.2f s " +
      f"(medians of $reps) | compact $compactSec%.2f s")

    // the purge leg: the claim under test is that deletion costs nothing
    // beyond the rewrite the layout needed anyway — so the comparison
    // must hold the LAYOUT fixed. Both measurements below run on the
    // same already-compacted single-slice table: a plain re-compaction
    // (the fold the table would run regardless) vs a purge (the same
    // fold with the tombstone anti-join in it). Comparing the purge to
    // compactSec above would be apples-to-oranges — that number is
    // dominated by the 400-file listing/open cost the first fold paid.
    val tRecompact0 = System.nanoTime()
    graft.streaming.VectorIngest.compact(spark, indexDir)
    val recompactSec = (System.nanoTime() - tRecompact0) / 1e9
    val toDelete = emb.filter(col("vec_id") % 100 === 0).select("vec_id")
    val nDelete = toDelete.count()
    graft.streaming.VectorIngest.delete(spark, indexDir, toDelete)
    val tPurge0 = System.nanoTime()
    graft.streaming.VectorIngest.purge(spark, indexDir)
    val purgeSec = (System.nanoTime() - tPurge0) / 1e9
    val rowsLeft = spark.read.parquet(s"$indexDir/assigned").count()
    println(f"[purge] deleted=$nDelete rowsLeft=$rowsLeft " +
      f"purge $purgeSec%.2f s vs same-layout recompact $recompactSec%.2f s")
    spark.stop()
  }
}
