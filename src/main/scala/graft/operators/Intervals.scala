package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over (start, end) row spans — "how much time did
  * this user actually cover, counting overlaps once" (session stitching,
  * SLA uptime, sensor coverage).
  */
object Intervals {

  /** Union length per group: merge overlapping-or-touching `[start, end]`
    * intervals into islands (the gaps-and-islands sweep: running max of
    * `end` over the start-ordered series; an interval whose start
    * exceeds everything before it opens a new island) and return
    * `(…group, n_intervals, n_islands, covered)` with `covered =
    * Σ_islands (max(end) − min(start))` — each overlapped stretch
    * counted exactly once.
    *
    * Contract: `startCol`/`endCol` are integer-valued (cast to long —
    * epoch micros/seconds, offsets; timestamps convert via
    * `unix_micros` first), so every boundary compare and the covered
    * sum are exact on any engine. Touching intervals (`start = prev
    * end`) MERGE — the union of `[1,2]` and `[2,3]` covers 2, not a
    * 2-island split; zero-length points merge into any island that
    * contains them and contribute 0 alone. Rows with a null group/
    * start/end or with `end < start` (malformed) are excluded.
    * Ordering ties on identical `(start, end)` rows are
    * permutation-invariant: island extents and counts don't depend on
    * which duplicate the window visits first.
    *
    * Scale shape: ONE shuffle on the group key — the island window,
    * the per-island collapse, and the per-group sum all reuse the same
    * partitioning (group-prefixed keys). Per-group work is a sort +
    * O(1)-state sweep; a firehose group serializes into one task by
    * the window's nature (the [[Sessionize.transitionMatrixBucketed]]
    * caveat applies if one group carries the table). */
  def unionLength(df: DataFrame, groupCols: Seq[String], startCol: String,
                  endCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    val s = col(startCol).cast("long")
    val e = col(endCol).cast("long")
    val base = df
      .filter(groupCols.map(col(_).isNotNull).reduce(_ && _) &&
        s.isNotNull && e.isNotNull && e >= s)
      .select(groupCols.map(col) ++ Seq(s.as("_s"), e.as("_e")): _*)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("_s"), col("_e"))
    val prevMax = max(col("_e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val withIsland = base
      .withColumn("_new",
        when(prevMax.isNull || col("_s") > prevMax, 1L).otherwise(0L))
      .withColumn("_island", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withIsland
      .groupBy(groupCols.map(col) :+ col("_island"): _*)
      .agg(count(lit(1)).as("_k"), min(col("_s")).as("_ms"),
        max(col("_e")).as("_me"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("_k")).cast("long").as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("_me") - col("_ms")).cast("long").as("covered"))
  }
}
