package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling with forward fill — gap repair for
  * per-key metric series (training-data feature tables want one row per
  * (key, slot), not whatever slots happened to have events).
  *
  * Shape: per-key span (one aggregate) → `sequence(lo, hi, step)` exploded
  * into the complete grid → left join back to the observations → `last(...,
  * ignoreNulls)` over a running window to carry the previous value across
  * empty slots.
  *
  * Scale notes: the grid explode emits span/step rows per key — linear in
  * the output, no shuffle beyond the one the join needs; the fill window
  * partitions by key, so one key's grid must fit a task (pre-split
  * degenerate keys by coarse time range first, same caveat as Sessionize).
  */
object Resample {

  /** Fill `df` out to a complete per-key grid of `tsCol` values stepping by
    * `step` (e.g. `expr("INTERVAL 1 DAY")`) from each key's min to max slot,
    * forward-filling `valCols` across the introduced gaps.
    *
    * `df` must already be at grid granularity — exactly one row per
    * (keys, tsCol), with tsCol aligned to slot boundaries (aggregate first,
    * e.g. `date_trunc`): duplicate slots would fan out the grid join.
    */
  def forwardFill(df: DataFrame, keys: Seq[String], tsCol: String,
                  valCols: Seq[String], step: Column): DataFrame = {
    require(keys.nonEmpty, "forwardFill needs at least one partition key")
    require(valCols.nonEmpty, "forwardFill needs at least one value column")
    require(!df.columns.contains("_lo") && !df.columns.contains("_hi"),
      "input must not contain the reserved columns _lo/_hi")
    val k = keys.map(col)
    val grid = df.groupBy(k: _*)
      .agg(min(col(tsCol)).as("_lo"), max(col(tsCol)).as("_hi"))
      .select(k :+ explode(sequence(col("_lo"), col("_hi"), step)).as(tsCol): _*)
    val w = Window.partitionBy(k: _*).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valCols.foldLeft(grid.join(df, keys :+ tsCol, "left")) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
