package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic partition scoping: restrict a table scan to the partitions
  * enumerated by a (small) `pending` frame whose columns ARE the partition
  * columns.
  *
  * Two regimes, picked by pending-set size:
  *  - small (≤ `literalThreshold`): collect and emit a literal predicate —
  *    Catalyst folds it into static partition pruning, so only the pending
  *    directories are listed/read at all;
  *  - large: broadcast semi-join — no driver materialization, dynamic
  *    partition pruning scopes the scan at runtime.
  *
  * All comparisons are NULL-SAFE: a null partition value
  * (`__HIVE_DEFAULT_PARTITION__`) must match its partition — a plain
  * equality would silently drop those rows, and a downstream dynamic
  * overwrite would then erase the partition's data.
  */
object PartitionScope {

  def scopeTo(df: DataFrame, pending: DataFrame, literalThreshold: Int = 256): DataFrame = {
    val cols = pending.columns.toSeq
    val head = pending.limit(literalThreshold + 1).collect()
    if (head.length <= literalThreshold) {
      if (head.isEmpty) df.limit(0)
      else {
        val pred: Column = head.map { r =>
          cols.map { c =>
            val v = r.getAs[Any](c)
            if (v == null) col(c).isNull else col(c) === lit(v)
          }.reduce(_ && _)
        }.reduce(_ || _)
        df.filter(pred)
      }
    } else {
      val cond = cols.map(c => df(c) <=> pending(c)).reduce(_ && _)
      df.join(broadcast(pending), cond, "left_semi")
    }
  }
}
