package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout optimization: Z-order (Morton-order) file clustering.
  *
  * At 100 TB the scan is the query cost, and the scan's cost is decided by
  * how much the reader can SKIP: parquet keeps min/max statistics per file
  * and row group, so a filter prunes exactly when the data is laid out so
  * that each file covers a narrow range of the filtered column. Sorting
  * clusters one column perfectly and later columns not at all; interleaving
  * the bits of several columns (the Morton curve — the same layout behind
  * Delta/Iceberg OPTIMIZE ZORDER) gives every interleaved column
  * locality ∝ 2^-bits, so filters on ANY of them prune.
  *
  * Everything here is plain Column arithmetic over one pass of the data —
  * no UDF, no driver-side loop: one tiny min/max aggregate per key (the
  * only action), then bucketize → interleave → range-partition on the
  * z-value → sort within partitions → write. The range partitioner splits
  * the curve into `numFiles` contiguous segments, so file boundaries ARE
  * curve boundaries and per-file min/max windows stay tight. */
object Layout {

  /** Morton z-value of `cols`, each normalized to `bits` buckets over its
    * [min, max] range (mins/maxs are 1-row-aggregate results, passed in so
    * the caller controls the one action). Bit `b` of bucket `j` lands at
    * position `b * n + j` — the canonical interleave. */
  private[etl] def zValue(cols: Seq[Column], mins: Seq[Double],
      maxs: Seq[Double], bits: Int): Column = {
    val n = cols.size
    // Java's long shift wraps mod 64 — positions past bit 62 would alias
    // into low bits and silently scramble the curve, so refuse instead
    require(n * bits <= 63,
      s"z-value needs $n*$bits=${n * bits} bits; at most 63 fit a long — " +
        "lower `bits` or cluster on fewer columns")
    val buckets = cols.zipWithIndex.map { case (c, j) =>
      val lo = mins(j)
      val span = math.max(maxs(j) - lo, java.lang.Double.MIN_NORMAL)
      least(lit((1 << bits) - 1), greatest(lit(0),
        floor((c.cast("double") - lo) / span * ((1 << bits) - 1)).cast("int")))
    }
    (for (b <- 0 until bits; j <- 0 until n) yield
      (shiftright(buckets(j), b).bitwiseAND(1).cast("long") * (1L << (b * n + j))): Column)
      .reduce(_ + _)
  }

  /** Order-preserving numeric view of a column: dates as days since
    * epoch, timestamps (tz or ntz) as seconds since epoch — Spark forbids
    * a direct CAST(date AS double), so the docstring's "date/timestamp"
    * promise needs this bridge. Everything else passes through. */
  private def epochBridge(c: Column,
      t: org.apache.spark.sql.types.DataType): Column = t match {
    case org.apache.spark.sql.types.DateType =>
      datediff(c, to_date(lit("1970-01-01")))
    case org.apache.spark.sql.types.TimestampType =>
      unix_timestamp(c)
    case org.apache.spark.sql.types.TimestampNTZType =>
      unix_timestamp(c.cast("timestamp"))
    case _ => c
  }

  /** Rewrite `inDir` into `outDir` as `numFiles` files z-ordered on
    * `clusterCols` (numeric or date/timestamp — anything castable to
    * double preserving order). Row content is unchanged; only placement
    * moves. Use on a star's fact partition (or any large scan target)
    * whose queries filter on more than one dimension key. */
  def clusterBy(spark: SparkSession, inDir: String, outDir: String,
      clusterCols: Seq[String], numFiles: Int, bits: Int = 8): Unit = {
    val df = spark.read.parquet(inDir)
    // dates can't CAST to double directly; bridge order-preservingly
    // through days/seconds-since-epoch so the docstring's "date/timestamp"
    // promise actually holds
    val numeric: Map[String, Column] =
      clusterCols.map(c => c -> epochBridge(col(c), df.schema(c).dataType)).toMap
    val statExprs = clusterCols.flatMap(c => Seq(
      min(numeric(c).cast("double")).as(s"min_$c"),
      max(numeric(c).cast("double")).as(s"max_$c")))
    val stats = df.agg(statExprs.head, statExprs.tail: _*).head()
    val mins = clusterCols.indices.map(i => stats.getDouble(2 * i))
    val maxs = clusterCols.indices.map(i => stats.getDouble(2 * i + 1))
    df.withColumn("__z",
        zValue(clusterCols.map(numeric), mins, maxs, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(outDir)
  }

  /** Compact a parquet directory's small files toward `targetBytes` per
    * output file — the small-file remedy every long-lived table needs:
    * micro-batch ingest (streaming sinks, the 50 K-row upsert cadence the
    * reference runs) accretes files far below a sane scan unit, and at
    * 100 TB the resulting per-file open/footer/seek overhead and starved
    * row-group statistics dominate scan cost long before data volume
    * does.
    *
    * File count = ceil(current on-disk bytes / targetBytes), computed
    * from the directory listing (no data pass); the rewrite itself is one
    * scan + repartition — round-robin with no shuffle key by default, or
    * RANGE-partitioned on `sortBy` (+ sortWithinPartitions) to restore
    * row-group min/max pruning on a key the ingest cadence scattered.
    * Under `sortBy` the file count is best-effort: range boundaries come
    * from sampling, so low key cardinality can legally yield fewer output
    * files than the byte-derived target. Returns (filesBefore,
    * filesAfter); an empty or absent input directory returns (0, 0)
    * without writing. Overwrite-into-place is deliberately NOT offered:
    * compaction targets a fresh directory and the caller swaps pointers,
    * the same publish discipline as [[graft.etl.StarStore]]. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      sortBy: Seq[String] = Nil): (Int, Int) = {
    // Hadoop FS listing, not java.io — the same call works on HDFS/object
    // stores where production compaction actually runs
    def listParquet(dir: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    }
    val parts = listParquet(inDir)
    // empty/absent input: nothing to compact — return instead of letting
    // spark.read.parquet throw "unable to infer schema" on the scan
    if (parts.isEmpty) return (0, 0)
    val totalBytes = parts.map(_.getLen).sum
    val numFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inDir)
    val out =
      if (sortBy.isEmpty) df.repartition(numFiles)
      else df.repartitionByRange(numFiles, sortBy.map(col): _*)
        .sortWithinPartitions(sortBy.map(col): _*)
    out.write.mode(SaveMode.Overwrite).parquet(outDir)
    (parts.length, listParquet(outDir).length)
  }

  /** Write `df` with parquet BLOOM FILTERS on `bloomCols` — the pruning
    * primitive for point lookups on high-cardinality, scatter-valued keys
    * (user ids, asset ids) where min/max windows are useless because every
    * file spans the whole domain and z-ordering them would waste curve
    * bits. Readers (Spark included) consult the bloom before touching a
    * row group: an equality probe skips every group that definitely lacks
    * the key. `ndv` sizes the filters (expected distinct values per file).
    * Complements [[clusterBy]]: z-order for range/multi-key locality,
    * blooms for needle-in-haystack equality.
    *
    * Dictionary encoding is disabled FOR THE BLOOM COLUMNS ONLY:
    * parquet-mr deliberately skips the bloom when a chunk is fully
    * dictionary-encoded (the dictionary already answers membership
    * exactly) — but dictionaries only form on low-cardinality chunks,
    * and low-cardinality keys are precisely the ones that should NOT get
    * a bloom. Forcing plain encoding keeps the layout honest for the
    * high-cardinality point-lookup keys this exists for. */
  def writeWithBloom(df: DataFrame, outDir: String, bloomCols: Seq[String],
      numFiles: Int, ndv: Long = 100000L): Unit = {
    val w = df.repartition(numFiles)
      .write.mode(SaveMode.Overwrite)
    bloomCols.foreach { c =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
      w.option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
      w.option(s"parquet.enable.dictionary#$c", "false")
    }
    w.parquet(outDir)
  }

  /** Which columns of a parquet file carry a bloom filter — the audit for
    * [[writeWithBloom]], read from the column-chunk metadata via the
    * parquet-hadoop footer API (no data pages touched). */
  def bloomColumns(spark: SparkSession, file: String): Seq[String] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file),
      spark.sparkContext.hadoopConfiguration)
    val reader = ParquetFileReader.open(in)
    try {
      reader.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
        .filter(_.getBloomFilterOffset >= 0)
        .map(_.getPath.toDotString).distinct.toSeq
    } finally reader.close()
  }

  /** Per-file [min, max] of `keyCol` across the files of a parquet dir —
    * the clustering-quality audit: tight, mostly-disjoint windows mean
    * min/max pruning works; windows spanning the global range mean the
    * layout defeats it. Reads footer-sized amounts per file. */
  def fileRanges(spark: SparkSession, dir: String,
      keyCol: String): Seq[(String, Double, Double)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    files.toSeq.map { f =>
      val df = spark.read.parquet(f)
      val k = epochBridge(col(keyCol), df.schema(keyCol).dataType)
      val r = df.agg(min(k.cast("double")), max(k.cast("double"))).head()
      (f, r.getDouble(0), r.getDouble(1))
    }
  }
}
