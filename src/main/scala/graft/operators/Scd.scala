package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: keep every historical version of a
  * dimension row with its validity interval, instead of overwriting
  * ([[MergeByKey]] is the type-1 overwrite).
  */
object Scd {

  /** Rebuild a key's SCD2 timeline from `history` (existing version rows)
    * plus `updates` (new observations). Both sides carry the key columns,
    * the tracked attribute columns, and `fromCol` — the effective
    * timestamp of that version. Output: one row per SURVIVING version with
    * `valid_to` = the next version's `fromCol` (null while open) and
    * `is_current`.
    *
    * Semantics, stated precisely:
    *  - same key and same `fromCol` on both sides → the UPDATE wins (the
    *    re-observation replaces the stored version, [[MergeByKey]]'s
    *    ties-to-updates rule);
    *  - consecutive versions with identical tracked values COMPRESS: a
    *    re-observation that changes nothing must not split an interval
    *    (null-safe comparison, so null attribute values compress too);
    *  - `valid_to` / `is_current` are DERIVED, never trusted from input —
    *    feeding yesterday's output back in with new updates is the
    *    intended loop and cannot double-close an interval.
    *
    * Scale shape: one union, then all three steps (same-ts pick, run
    * compression, interval derivation) ride windows over ONE partitioning
    * — (key…) ordered by `fromCol` — so the whole rebuild is a single
    * shuffle; per-key state is the version count, never corpus-sized. */
  def scd2Apply(history: DataFrame, updates: DataFrame, keyCols: Seq[String],
                trackedCols: Seq[String], fromCol: String): DataFrame = {
    require(keyCols.nonEmpty && trackedCols.nonEmpty,
      "keyCols and trackedCols must be non-empty")
    val reserved = Seq("_src", "_rn", "_prev", "valid_to", "is_current")
    val inCols = keyCols ++ trackedCols :+ fromCol
    require(!reserved.exists(inCols.contains),
      s"reserved columns ${reserved.mkString(", ")} must not appear in inputs")
    val proj = inCols.map(col)
    val all = history.select(proj: _*).withColumn("_src", lit(0))
      .unionByName(updates.select(proj: _*).withColumn("_src", lit(1)))
    val keys = keyCols.map(col)
    // same (key, from): the update replaces the stored version; two
    // UPDATES colliding on (key, from) pick the smallest tracked tuple —
    // an arbitrary-but-DETERMINISTIC winner (row_number over a tie would
    // otherwise pick by partition arrival order and flap across runs)
    val trackedOrd = struct(trackedCols.map(col): _*)
    val pickW = Window.partitionBy(keys :+ col(fromCol): _*)
      .orderBy(col("_src").desc, trackedOrd.asc)
    val ordW = Window.partitionBy(keys: _*).orderBy(col(fromCol))
    val tracked = struct(trackedCols.map(col): _*)
    val compressed = all
      .withColumn("_rn", row_number().over(pickW)).filter(col("_rn") === 1)
      .withColumn("_prev", lag(tracked, 1).over(ordW))
      .filter(col("_prev").isNull || !(col("_prev") <=> tracked))
    compressed
      .withColumn("valid_to", lead(col(fromCol), 1).over(ordW))
      .withColumn("is_current", col("valid_to").isNull)
      .select(proj ++ Seq(col("valid_to"), col("is_current")): _*)
  }
}
