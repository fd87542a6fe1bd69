package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Transactional [[FactSink]] on plain parquet: the commit protocol a
  * table format provides, hand-built from two primitives every filesystem
  * has — immutable data directories and an atomic rename.
  *
  * Layout under `dir`:
  * {{{
  *   data/<uuid>/            one immutable parquet dir per written slice
  *   _versions/v<N>.json     manifest: year -> data dir for that version
  *   _latest                 pointer file, swapped by atomic rename
  * }}}
  *
  * A writer prepares data and a manifest FIRST, and publishes with one
  * `rename(_latest.tmp, _latest)` LAST: readers see the old complete
  * version or the new complete version, never a half-written mix — a
  * crash before the swap leaves an orphaned data dir that [[vacuum]]
  * reclaims, not a corrupt table. Merges are copy-on-write at year
  * granularity (untouched years keep their existing data dirs), replaying
  * the same slice converges to the same content (idempotent), and every
  * published version remains readable ([[readVersion]] — time travel)
  * until vacuumed. Single-writer, like any log-structured format without
  * an external lock service; the seam a real Delta/Iceberg `MERGE`
  * replaces wholesale.
  */
final class VersionedFactSink(dir: String) extends FactSink {

  private def versionsDir = Paths.get(dir, "_versions")
  private def latestPtr = Paths.get(dir, "_latest")

  // ---------------------------------------------------------- manifest IO
  // manifest format: one "year<TAB>path" line per year (stable order)
  private def writeManifest(v: Int, m: Map[Int, String]): Path = {
    Files.createDirectories(versionsDir)
    val body = m.toSeq.sorted.map { case (y, p) => s"$y\t$p" }.mkString("\n")
    Files.write(versionsDir.resolve(f"v$v%05d.json"),
      body.getBytes(StandardCharsets.UTF_8))
  }

  private def readManifest(v: Int): Map[Int, String] = {
    val p = versionsDir.resolve(f"v$v%05d.json")
    require(Files.exists(p), s"version $v does not exist under $dir")
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).map { l =>
        val Array(y, path) = l.split("\t", 2); y.toInt -> path
      }.toMap
  }

  /** The committed version, or -1 for an empty table. */
  def currentVersion: Int =
    if (!Files.exists(latestPtr)) -1
    else new String(Files.readAllBytes(latestPtr), StandardCharsets.UTF_8)
      .trim.toInt

  private def publish(v: Int): Unit = {
    val tmp = Paths.get(dir, s"_latest.tmp$v")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    // the ONE atomic step — everything before this is invisible to readers
    Files.move(tmp, latestPtr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // ---------------------------------------------------------- data IO
  /** Write `slice` as one immutable dir per year; `year` column kept IN
    * the files (manifests map years to dirs, so partition directories are
    * unnecessary and each year dir stands alone). */
  private def writeSlice(slice: DataFrame): Map[Int, String] = {
    val uuid = java.util.UUID.randomUUID().toString
    val base = s"$dir/data/$uuid"
    val years = slice.select("year").distinct().collect()
      .map(_.getInt(0)).sorted
    years.map { y =>
      val p = s"$base/y$y"
      slice.filter(col("year") === y)
        .write.mode(SaveMode.ErrorIfExists).parquet(p)
      y -> p
    }.toMap
  }

  // ---------------------------------------------------------- FactSink
  def writeFull(fact: DataFrame): Unit = synchronized {
    val v = currentVersion + 1
    writeManifest(v, writeSlice(fact))
    publish(v)
  }

  def mergePartitions(factSlice: DataFrame): Unit = synchronized {
    val prev = if (currentVersion < 0) Map.empty[Int, String]
      else readManifest(currentVersion)
    val v = currentVersion + 1
    writeManifest(v, prev ++ writeSlice(factSlice)) // copy-on-write by year
    publish(v)
  }

  def read(spark: SparkSession): DataFrame = readVersion(spark, currentVersion)

  /** Time travel: read any still-retained published version. */
  def readVersion(spark: SparkSession, v: Int): DataFrame = {
    require(v >= 0, s"no committed version under $dir")
    spark.read.parquet(readManifest(v).values.toSeq.sorted: _*)
  }

  /** Drop manifests older than `keepVersions` and delete every data dir no
    * retained manifest references — including orphans from crashed
    * (never-published) writes. Returns the deleted data dirs. */
  def vacuum(keepVersions: Int = 1): Seq[String] = synchronized {
    val cur = currentVersion
    require(keepVersions >= 1, "must retain at least the current version")
    if (cur < 0) return Seq.empty
    val keepFrom = math.max(0, cur - keepVersions + 1)
    val retained = (keepFrom to cur)
      .flatMap(v => readManifest(v).values).toSet
    // manifests below the horizon go first, so a concurrent reader can't
    // resolve a version whose data is about to disappear
    Files.list(versionsDir).iterator().asScala
      .filter(_.getFileName.toString < f"v$keepFrom%05d.json")
      .toSeq.foreach(Files.delete)
    val dataRoot = Paths.get(dir, "data")
    if (!Files.exists(dataRoot)) return Seq.empty
    val doomed = Files.list(dataRoot).iterator().asScala
      .flatMap(u => Files.list(u).iterator().asScala)
      .filter(p => !retained.contains(p.toString))
      .toSeq
    doomed.foreach(deleteRecursively)
    // remove emptied uuid dirs
    Files.list(dataRoot).iterator().asScala.toSeq
      .filter(u => !Files.list(u).iterator().hasNext)
      .foreach(Files.delete)
    doomed.map(_.toString)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.delete(p)
  }
}
