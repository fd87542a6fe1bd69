package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** General MERGE semantics (the warehouse `MERGE INTO` statement) as one
  * declarative plan — the DML dual of the reference's load-then-update
  * cycle (`loadOperationalDB` upserts row batches into MySQL with
  * ON DUPLICATE KEY semantics; here the whole batch merges in one pass).
  *
  * Branch semantics, matching ANSI MERGE:
  *   - source row matches a target key → target row is REPLACED by the
  *     source row (update = delete old + insert new, whole-row);
  *   - source row matches nothing → INSERTED;
  *   - source row satisfies `deleteWhen` and matches → target row is
  *     DELETED (a delete-marked row that matches nothing is a no-op);
  *   - target rows untouched by any source key pass through unchanged.
  *
  * Plan shape: ONE left_anti equi-join on the keys (target vs the source
  * key set) + a union with the surviving source rows. No full-outer join,
  * no per-column coalesce: the anti-join build side is just the source
  * KEYS (projected before the join, so a wide source costs nothing), and
  * when the batch is small relative to the target — the only case batch
  * merging makes sense at 100 TB — it broadcasts, leaving the target
  * unshuffled. Storage-side, partition-scoped merging (rewrite only the
  * partitions the batch touches) is [[graft.etl.FactSink.mergePartitions]]
  * / [[graft.etl.VersionedFactSink]]'s copy-on-write year merge; this
  * operator is the row-level semantics those file-level protocols commit.
  */
object Merge {

  /** Merge `source` into `target` on equi-`keys`. `deleteWhen` (evaluated
    * against source rows) marks delete rows; they remove their match and
    * are not re-inserted. Source must carry the same schema as target
    * (extra bookkeeping columns are allowed and dropped — pass them in
    * `dropCols`). Duplicate keys WITHIN the batch are the caller's bug:
    * resolve them first (e.g. keep-latest window) — this operator inserts
    * what it is given. */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
      deleteWhen: Option[Column] = None,
      dropCols: Seq[String] = Nil): DataFrame = {
    val touchedKeys = source.select(keys.map(col): _*)
    val survivors = deleteWhen match {
      case Some(d) => source.filter(!coalesce(d, lit(false)))
      case None => source
    }
    target
      .join(touchedKeys, keys, "left_anti")
      .unionByName(survivors.drop(dropCols: _*))
  }
}
