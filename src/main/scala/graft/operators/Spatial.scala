package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Planar spatial joins over integer point coordinates — "which
  * station/sensor pairs are within R of each other" without a
  * cartesian product.
  */
object Spatial {

  /** Exact floor division (toward −∞) of an integer column — SQL `/`
    * on longs is a DOUBLE divide (inexact past 2⁵³) and `div`
    * truncates toward 0, which would split a grid cell at the
    * origin. */
  private def floorDiv(x: Column, d: Long): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    GraftColumnBridge.column(IntegralDivide(
      GraftColumnBridge.expression(x - ((x % d + d) % d)),
      GraftColumnBridge.expression(lit(d))))
  }

  /** Radius join: every (left, right) point pair with Euclidean
    * distance ≤ `radius`, as `(l_id, r_id, dist_sq)` — WITHOUT the
    * cross product. Both inputs carry `(idCol, xCol, yCol)`.
    *
    * Grid bucketing: with cell size = radius, any qualifying pair's
    * cells differ by at most 1 per axis — so the LEFT point keys on
    * its own cell and each RIGHT point is replicated to its 3×3 cell
    * neighborhood; an equi-join on the cell key then sees every
    * qualifying pair EXACTLY ONCE (the left point has one cell; the
    * right copies are distinct cells), and the exact integer
    * `dx² + dy² ≤ radius²` filter drops same-neighborhood misses. No
    * dedup pass is needed, and the differential oracle (brute-force
    * cross join) checks the bucketing loses nothing.
    *
    * Determinism/overflow contract: coordinates are integer-valued
    * (cast to long) with |x|,|y| < 2³¹ and 1 ≤ radius < 2³⁰, so every
    * intermediate stays an exact long: cell-joined pairs differ by
    * < 2·radius per axis, hence the dist_sq the filter evaluates is
    * < 8·radius² < 2⁶³. Cell floor division rounds toward −∞
    * (negative coordinates don't fold onto the origin cell). Null
    * id/x/y rows are excluded.
    *
    * Scale shape: ONE equi-join shuffle on the cell key (9× the right
    * side, 1× the left) — pass the SMALLER table as `right` so the
    * replication lands on the cheap side, where AQE can broadcast it.
    * Density skew (all points in one cell) degrades to that cell's
    * local product — the inherent output bound — while every other
    * cell proceeds in parallel. */
  def radiusJoin(left: DataFrame, right: DataFrame, idCol: String,
                 xCol: String, yCol: String, radius: Long): DataFrame = {
    require(radius >= 1L, s"radius ($radius) must be >= 1")
    def pts(df: DataFrame, p: String): DataFrame = df
      .filter(col(idCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(idCol).as(s"${p}_id"),
        col(xCol).cast("long").as(s"${p}x"),
        col(yCol).cast("long").as(s"${p}y"))
    val l = pts(left, "l")
      .withColumn("_cx", floorDiv(col("lx"), radius))
      .withColumn("_cy", floorDiv(col("ly"), radius))
    val r = pts(right, "r")
      .withColumn("_cx",
        explode(array(Seq(-1L, 0L, 1L).map(d =>
          floorDiv(col("rx"), radius) + lit(d)): _*)))
      .withColumn("_cy",
        explode(array(Seq(-1L, 0L, 1L).map(d =>
          floorDiv(col("ry"), radius) + lit(d)): _*)))
    val dx = col("lx") - col("rx")
    val dy = col("ly") - col("ry")
    l.join(r, Seq("_cx", "_cy"))
      .withColumn("dist_sq", dx * dx + dy * dy)
      .filter(col("dist_sq") <= lit(radius) * lit(radius))
      .select("l_id", "r_id", "dist_sq")
  }

  /** k nearest neighbors WITHIN `radius` per left point — the bounded
    * form of the spatial kNN join ("closest k stations within R"):
    * [[radiusJoin]]'s exactly-once grid candidates ranked per left
    * point by exact integer `(dist_sq, r_id)` (total order — ties
    * break on the neighbor id) and cut at `k`.
    *
    * Bounded by construction: a left point with more than k neighbors
    * inside R keeps the k nearest; one with fewer keeps them all (no
    * ring expansion — an UNBOUNDED kNN search is a different operator
    * with data-dependent work per point; at scale you pick R from the
    * answer density you need). The per-left window is bounded by the
    * in-radius candidate count, and Spark's WindowGroupLimit prunes to
    * k per partition before the full sort.
    *
    * Output: `(l_id, rank, r_id, dist_sq)`, rank 1-based. */
  def knnWithinRadius(left: DataFrame, right: DataFrame, idCol: String,
                      xCol: String, yCol: String, radius: Long,
                      k: Int): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_id").orderBy(col("dist_sq"), col("r_id"))
    radiusJoin(left, right, idCol, xCol, yCol, radius)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("l_id"), col("rank"), col("r_id"), col("dist_sq"))
  }
}
