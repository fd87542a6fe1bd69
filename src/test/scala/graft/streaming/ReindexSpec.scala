package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Rebuilding the corpus's derived dedup index from the standing docs:
  * the rebuilt rows equal what per-batch ingest wrote, admission
  * decisions are unchanged, a post-reindex crash-replay cannot destroy
  * documents, and tombstoned docs stay out of the rebuilt index. */
class ReindexSpec extends SparkTestBase {
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

  test("reindex rebuilds a destroyed index identically; admissions unchanged") {
    val dir = Files.createTempDirectory("graft_reindex").toString
    val m = new CorpusIngest.Merger(spark, dir)
    m.mergeBatch(docs((0L, base), (1L, other)), 0L)
    m.mergeBatch(docs((2L, third)), 1L)

    def snap(table: String, cols: String*): Set[Seq[Any]] =
      spark.read.option("basePath", s"$dir/$table").parquet(s"$dir/$table")
        .select(cols.map(col): _*)
        .collect().map(_.toSeq).toSet
    val fpsWant = snap("fps", "doc_id", "fp")
    val shWant = snap("shingles", "doc_id", "g", "sz")

    // the corruption scenario: both derived tables lost outright
    fs(dir).delete(new Path(s"$dir/fps"), true)
    fs(dir).delete(new Path(s"$dir/shingles"), true)

    CorpusIngest.reindex(spark, dir)
    assert(snap("fps", "doc_id", "fp") == fpsWant,
      "rebuilt fingerprints differ from what ingest wrote")
    assert(snap("shingles", "doc_id", "g", "sz") == shWant,
      "rebuilt postings differ from what ingest wrote")

    // admission decisions over the rebuilt index are unchanged: exact
    // dup and near dup refused, fresh admitted
    m.mergeBatch(docs(
      (10L, base), //                        exact dup of corpus doc 0
      (11L, other.replace("koala", "KOALA")), // near dup of corpus doc 1
      (12L, "sailboat horizon compass lantern ember harbor castle bridge " +
        "meadow forest canyon valley summit ridge prairie tundra")), 2L)
    val ids = m.corpus().select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(10L) && !ids.contains(11L) && ids.contains(12L),
      s"admissions changed after reindex: $ids")
  }

  test("a crash-replay after reindex cannot destroy documents") {
    val dir = Files.createTempDirectory("graft_reindex_replay").toString
    val m = new CorpusIngest.Merger(spark, dir)
    m.mergeBatch(docs((0L, base)), 0L)
    m.mergeBatch(docs((1L, other)), 1L)
    CorpusIngest.reindex(spark, dir)
    // docs were folded to batch=-1 first — the slice a replay would
    // overwrite no longer holds the documents
    val slices = fs(dir).listStatus(new Path(s"$dir/docs"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).toSet
    assert(slices == Set("batch=-1"), s"docs not folded: $slices")

    m.mergeBatch(docs((1L, other)), 1L) // redelivery of the last batch
    val ids = m.corpus().select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 1L), s"replay after reindex lost documents: $ids")
  }

  test("tombstoned docs stay out of the rebuilt index") {
    val dir = Files.createTempDirectory("graft_reindex_ts").toString
    val m = new CorpusIngest.Merger(spark, dir)
    m.mergeBatch(docs((0L, base), (1L, other)), 0L)
    CorpusIngest.delete(spark, dir, Seq(0L).toDF("doc_id"))
    CorpusIngest.reindex(spark, dir)
    assert(spark.read.parquet(s"$dir/fps").filter($"doc_id" === 0L)
      .count() == 0, "a deleted doc's fingerprint must not be rebuilt")
    assert(spark.read.parquet(s"$dir/shingles").filter($"doc_id" === 0L)
      .count() == 0)
    // and its content still does not shadow: a copy under a new id lands
    m.mergeBatch(docs((5L, base)), 1L)
    assert(m.corpus().select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 5L))
  }
}
