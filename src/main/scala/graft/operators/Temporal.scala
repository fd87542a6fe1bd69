package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no native form for — as-of
  * (point-in-time) joins and interval (range) joins — each re-expressed so
  * the planner runs shuffle/hash machinery instead of the
  * BroadcastNestedLoopJoin a raw inequality join degenerates to.
  *
  * Both are first-class warehouse operators (DuckDB `ASOF JOIN`, pandas
  * `merge_asof`, kdb `aj`, Flink interval joins); at 100 TB the difference
  * between an equi-shaped plan and a nested-loop plan is the difference
  * between a join and a non-terminating job.
  */
object Temporal {

  /** As-of (backward) join: each left row picks up the values of the single
    * most recent right row with `rightTs <= leftTs` for the same key; left
    * rows with no prior right row keep nulls (LEFT ASOF semantics).
    *
    * Form: no join at all. Both sides are unioned with a side tag and ONE
    * `last(_, ignoreNulls)` window per key ordered by (ts, tag) carries the
    * latest right-hand values forward onto each left row — a single shuffle
    * on the key, whole-stage-codegen'd, unbounded-preceding running state
    * (so the window needs no buffering beyond the current row). A
    * right-side row at the same timestamp IS visible (inclusive >=): the
    * tag orders right (0) before left (1) within equal timestamps.
    *
    * Right rows must be unique per (key, ts) — pre-aggregate first; with
    * ties "the most recent row" is ill-defined and the result would be
    * partition-order-dependent.
    *
    * `valueCols` are the right-side columns to carry (may include
    * `rightTs` itself to expose the matched timestamp); their names must
    * not collide with left columns.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      valueCols: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    require(valueCols.forall(!leftCols.contains(_)),
      s"valueCols ${valueCols.filter(leftCols.contains)} collide with left columns")
    // forward ("the NEXT right row at-or-after") is backward mirrored in
    // time: descending timestamp order; the tag still sorts right (0)
    // before left (1) inside equal timestamps so equality stays inclusive
    val tsOrder =
      if (direction == "backward") col("__ts").asc else col("__ts").desc
    // valueCols travel as ONE struct: filling each column independently with
    // last(ignoreNulls) would skip a null field in the matched row and carry
    // an OLDER row's value for that column — mixing columns from different
    // right rows. A null field keeps the struct itself non-null, so the fill
    // picks the matched row wholesale (true as-of semantics: DuckDB ASOF /
    // merge_asof return the matched row's values, nulls included).
    val valStruct = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)))
    val lTagged = left.select(
      Seq(col(leftKey).as("__k"), col(leftTs).as("__ts"), lit(1).as("__tag")) ++
        leftCols.map(col) :+
        lit(null).cast(valStruct).as("__vals"): _*)
    val rTagged = right.select(
      Seq(col(rightKey).as("__k"), col(rightTs).as("__ts"), lit(0).as("__tag")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valueCols.map(col): _*).as("__vals"): _*)
    val w = Window.partitionBy("__k").orderBy(tsOrder, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .withColumn("__vals", last(col("__vals"), ignoreNulls = true).over(w))
    filled.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("__vals").getField(c).as(c)): _*)
  }

  /** Interval (range) join: pairs each point row with every interval row of
    * the same key satisfying `lo <= point < hi` (half-open, the
    * event-in-validity-window containment SQL writes as a BETWEEN theta
    * join).
    *
    * Form: an EQUI-join on (key, coarse time bin) plus a residual range
    * filter. Each interval is exploded onto every `binDays`-wide bin it
    * overlaps (⌈len/binDays⌉+1 rows — pick binDays ≥ the typical interval
    * length so the fan-out stays ~2×); each point computes its single bin.
    * The planner then runs a plain shuffled/broadcast HASH join keyed on
    * (key, bin) — a point only ever meets intervals sharing its bin —
    * instead of the nested-loop scan of every interval a raw inequality
    * join plans as.
    *
    * Output: all point columns then all interval columns (no duplicates of
    * the internal bin). Point/interval column names must be disjoint.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
      pointKey: String, intervalKey: String,
      ptCol: String, loCol: String, hiCol: String,
      binDays: Int = 64): DataFrame = {
    require(binDays > 0, "binDays must be positive")
    val epoch = lit("1970-01-01").cast("date")
    def binOf(c: Column): Column = floor(datediff(c, epoch) / binDays)
    val p = points.withColumn("__bin", binOf(col(ptCol))).as("p")
    val iv = intervals
      .withColumn("__bin", explode(sequence(binOf(col(loCol)), binOf(col(hiCol)))))
      .as("i")
    p.join(iv,
        col("p.__bin") === col("i.__bin") &&
          col(s"p.$pointKey") === col(s"i.$intervalKey") &&
          col(s"p.$ptCol") >= col(s"i.$loCol") &&
          col(s"p.$ptCol") < col(s"i.$hiCol"))
      .select(points.columns.map(c => col(s"p.$c")).toSeq ++
        intervals.columns.map(c => col(s"i.$c")).toSeq: _*)
  }
}
