package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Distributed prefix (cumulative) sums.
  *
  * The window form (`cumSumWindow`) is the right tool when group
  * cardinality is high: Spark runs each group in one task, and millions of
  * groups parallelize perfectly. Its failure mode is the opposite corpus —
  * a handful of giant groups (or ONE global ordering), where every row of a
  * group funnels through a single task: the classic "WindowExec: No
  * Partition Defined" scale-killer.
  *
  * `cumSumTwoPhase` is the scan-algorithm fix (Blelloch-style two-phase
  * prefix scan): range-partition on (group, order) so each task holds a
  * contiguous sorted slice, compute per-(partition, group) sums, turn that
  * TINY table (numPartitions × groups-per-partition rows — the one
  * justified driver collect) into per-partition starting offsets, broadcast
  * them back, and let each task produce its slice's running sums locally.
  * Every phase is parallel; no task ever sees more than its slice.
  */
object Prefix {

  private val lastPersisted =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.rdd.RDD[_]]()
  private def persistReplacingRdd[T](key: String,
      rdd: org.apache.spark.rdd.RDD[T]): org.apache.spark.rdd.RDD[T] = {
    val p = rdd.persist(StorageLevel.MEMORY_AND_DISK)
    Option(lastPersisted.put(key, p)).foreach(_.unpersist(false))
    p
  }

  /** Release the cached partitioned RDDs (see [[graft.Caches.releaseAll]];
    * same blocking semantics — bench boundaries pass `true` so cleanup
    * lands between timers, not inside the next family's first query). */
  private[graft] def releaseAll(blocking: Boolean = false): Unit = {
    val it = lastPersisted.entrySet().iterator()
    while (it.hasNext) { it.next().getValue.unpersist(blocking); it.remove() }
  }

  /** Per-group running sum of `valueCol` in `orderCols` order, as window
    * aggregation — use when groups are numerous and individually small. */
  def cumSumWindow(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(col(valueCol).cast("long")).over(w))
  }

  /** Two-phase distributed scan — same result as [[cumSumWindow]], built
    * for FEW huge groups (or one global order). `orderCols` must be a total
    * order within each group (ties would make the running sum
    * partition-placement-dependent); `valueCol` must be non-null.
    *
    * Partition identity comes from `mapPartitionsWithIndex`, NOT
    * `TaskContext.getPartitionId`/`spark_partition_id()`: the latter is the
    * TASK's index in its stage, which stops matching the RDD's own
    * partition index the moment the plan embeds this subtree under a
    * multi-child stage (e.g. `exceptAll` rewrites to an aggregate over a
    * UNION — the second child's tasks run as stage partitions N..2N-1 and
    * every offset lookup would miss). The RDD index is structural and
    * survives any consuming plan shape. */
  def cumSumTwoPhase(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
      valueCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val np = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sortCols: Seq[Column] = (groupCols ++ orderCols).map(col)
    val gIdx = groupCols.map(df.schema.fieldIndex)
    val vIdx = df.schema.fieldIndex(valueCol)

    // phase 0 — one shuffle: contiguous sorted slices per partition
    val rdd = persistReplacingRdd("prefix_parted",
      df.repartitionByRange(np, sortCols: _*).sortWithinPartitions(sortCols: _*).rdd)

    // phase 1: per-(partition, group) totals — numPartitions × resident
    // groups rows, collected to the driver (this is the scan algorithm's
    // reduction tree, not a data collect; with low-cardinality groups it is
    // a few hundred rows regardless of input size)
    val totals: Array[(Int, Seq[Any], Long)] = rdd
      .mapPartitionsWithIndex { (pid, rows) =>
        val sums = scala.collection.mutable.LinkedHashMap[Seq[Any], Long]()
        rows.foreach { r =>
          val k = gIdx.map(r.get)
          sums.update(k, sums.getOrElse(k, 0L) + r.getAs[Number](vIdx).longValue())
        }
        sums.iterator.map { case (k, s) => (pid, k, s) }
      }
      .collect()
    val offsets: Map[(Int, Seq[Any]), Long] = totals
      .groupBy(_._2)
      .flatMap { case (g, rows) =>
        val byPid = rows.sortBy(_._1)
        val excl = byPid.scanLeft(0L)((acc, r) => acc + r._3).init
        byPid.map(_._1).zip(excl).map { case (pid, off) => ((pid, g), off) }
      }
    val bc = spark.sparkContext.broadcast(offsets)

    // phase 2: local running sums seeded with the broadcast offset; groups
    // are contiguous within the sorted slice, so one accumulator suffices
    val outSchema = df.schema.add("cum", LongType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { (pid, rows) =>
      var curKey: Seq[Any] = null
      var acc = 0L
      rows.map { r =>
        val k = gIdx.map(r.get)
        if (k != curKey) {
          curKey = k
          acc = bc.value.getOrElse((pid, k), 0L)
        }
        acc += r.getAs[Number](vIdx).longValue()
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    spark.createDataFrame(out, outSchema)
  }
}
