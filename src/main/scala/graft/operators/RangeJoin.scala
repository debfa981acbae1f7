package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._

/** Binned range join: point-in-interval inner join without a cartesian pass.
  *
  * Spark has no native interval-join operator; the naive formulation
  * (`a.join(b, pred)` with only range predicates) plans as
  * BroadcastNestedLoopJoin — O(|A|·|B|) and a driver OOM once neither side
  * broadcasts. The standard scale shape is bin bucketing:
  *
  *  - every interval `[start, end]` is exploded to the bins it covers
  *    (`start DIV w .. end DIV w`);
  *  - every point lands in exactly ONE bin (`p DIV w`);
  *  - the join runs as a plain shuffled equi-join on (equiKeys…, bin), with
  *    the exact range predicate re-checked after the match.
  *
  * Because the point maps to a single bin and an interval covers each of its
  * bins once, a qualifying (point, interval) pair meets exactly once — no
  * dedup stage. The binning is exact floor division in long arithmetic
  * (integral divide, minus one when the remainder is negative) — no
  * doubles and no intermediate that can overflow, so the full long domain
  * (nanosecond epochs beyond 2^53 included) bins correctly, and negative
  * coordinates floor rather than truncate.
  *
  * Scale notes: shuffle volume is |points| + Σ bins-per-interval rows; pick
  * `binWidth` ≥ the typical interval length so most intervals hit 1-2 bins.
  * Skewed bins (hot time ranges) fall out of the equi-join shape, so AQE's
  * skew-join split — or [[SkewJoin]] salting — applies unchanged.
  */
object RangeJoin {

  /** Inner join of `points` to every interval in `intervals` whose
    * `[startCol, endCol]` (inclusive both ends) contains `pointCol`, with
    * optional extra equality keys. All three coordinate columns must be
    * integral (e.g. `unix_micros` for timestamps). Column names must be
    * disjoint across the two sides apart from `equiKeys` — alias before
    * calling for self-joins. Intervals with `start > end` match nothing
    * (dropped up front — Spark's `sequence` would otherwise step backwards
    * and fabricate bins).
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    checkInputs(binWidth, points, intervals)
    val pts = points.withColumn("_bin", bin(col(pointCol), binWidth))
    pts.join(explodeBins(intervals, startCol, endCol, binWidth), equiKeys :+ "_bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bin")
  }

  /** Inner join of `left` intervals `[lStart, lEnd]` to every `right`
    * interval `[rStart, rEnd]` they overlap (both inclusive; touching
    * endpoints overlap), with optional extra equality keys — same binning
    * machinery as [[pointInInterval]], same column-name rules.
    *
    * Two overlapping intervals can share MANY bins; to keep each pair
    * exactly once without a dedup shuffle, a pair is accepted only in its
    * CANONICAL bin — the bin of `greatest(lStart, rStart)`, a value both
    * sides cover, computable per matched row. Emitted exactly once because
    * that bin is unique per pair. */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      binWidth: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    checkInputs(binWidth, left, right)
    explodeBins(left, lStart, lEnd, binWidth)
      .join(explodeBins(right, rStart, rEnd, binWidth), equiKeys :+ "_bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        bin(greatest(col(lStart), col(rStart)), binWidth) === col("_bin"))
      .drop("_bin")
  }

  /** Exact floor(c / binWidth) over the FULL long domain: integral divide
    * truncates toward zero, so subtract one when the remainder is negative.
    * (The remainder-based form never builds `c - pmod(c, w)`, whose
    * subtraction overflows for c within binWidth of Long.MinValue.) This is
    * THE binning contract both joins share — exactness and monotonicity are
    * what make bin(p) ∈ [bin(start), bin(end)] for any covered point. */
  private def bin(c: Column, binWidth: Long): Column = {
    val q = GraftColumnBridge.column(IntegralDivide(
      GraftColumnBridge.expression(c),
      GraftColumnBridge.expression(lit(binWidth))))
    q - when(c % binWidth < 0, 1L).otherwise(0L)
  }

  /** Intervals exploded to one row per covered bin; `start > end` rows are
    * dropped (Spark's `sequence` would otherwise step backwards and
    * fabricate bins). */
  private def explodeBins(df: DataFrame, s: String, e: String, binWidth: Long) = df
    .filter(col(s) <= col(e))
    .withColumn("_bin", explode(sequence(bin(col(s), binWidth), bin(col(e), binWidth))))

  private def checkInputs(binWidth: Long, a: DataFrame, b: DataFrame): Unit = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!a.columns.contains("_bin") && !b.columns.contains("_bin"),
      "inputs must not contain the reserved column _bin")
  }
}
