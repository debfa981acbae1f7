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

  /** DBSCAN density clustering (Ester, Kriegel, Sander & Xu, KDD 1996)
    * over integer planar points, relational and grid-bucketed — no
    * cartesian product, no driver-side graph:
    *   - ε-neighborhood sizes from ONE self [[radiusJoin]] (the
    *     neighborhood includes the point itself, the paper's |N_ε(p)|);
    *   - `core` ⇔ n_nbrs ≥ `minPts`;
    *   - clusters = connected components over core–core ε-pairs via
    *     [[DupClusters.components]] (large-star/small-star, ≤ 2·log₂n
    *     rounds) — cluster id = the component's minimum point id;
    *   - `border` = non-core within ε of ≥ 1 core, assigned the MINIMUM
    *     cluster id among its core neighbors (the paper leaves border
    *     assignment order-dependent; the min pins it so two engines
    *     agree);
    *   - everything else is `noise` (null cluster).
    *
    * Determinism: every quantity is an exact integer or a min over
    * integers — no floats anywhere. Coordinate/radius bounds are
    * [[radiusJoin]]'s.
    *
    * Scale shape: the ε-pair table is built once (grid equi-join,
    * checkpointed) and reused for counts, core–core edges, and border
    * assignment; neighbor counts and border mins are map-side-combined
    * aggregations; components is the repo's scale-proof CC. Density
    * skew (a dense blob in one cell) degrades to that cell's local
    * product — DBSCAN's inherent output bound — while all other cells
    * proceed in parallel.
    *
    * Output: `(id, n_nbrs, role ∈ {core,border,noise}, cluster)`. */
  def dbscan(points: DataFrame, idCol: String, xCol: String, yCol: String,
             eps: Long, minPts: Int): DataFrame = {
    require(minPts >= 1, s"minPts ($minPts) must be >= 1")
    val pts = points
      .filter(col(idCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(idCol).as("id"), col(xCol).as("_x"), col(yCol).as("_y"))
      .localCheckpoint(true) // radius join sides + the full-point spine
    val pairs = radiusJoin(pts, pts, "id", "_x", "_y", eps)
      .filter(col("l_id") =!= col("r_id"))
      .select("l_id", "r_id")
      .localCheckpoint(true) // counts + core edges + border assignment
    val flags = pts.select(col("id"))
      .join(pairs.groupBy(col("l_id").as("id"))
        .agg(count(lit(1)).as("_c")), Seq("id"), "left")
      .select(col("id"), (coalesce(col("_c"), lit(0L)) + 1L).as("n_nbrs"))
      .withColumn("is_core", col("n_nbrs") >= minPts)
      .localCheckpoint(true)
    val cores = flags.filter(col("is_core")).select("id")
    val coreEdges = pairs
      .join(cores.withColumnRenamed("id", "l_id"), Seq("l_id"))
      .join(cores.withColumnRenamed("id", "r_id"), Seq("r_id"))
      .select(col("l_id").as("id_a"), col("r_id").as("id_b"))
    // isolated cores (no core neighbor) are their own singleton cluster
    val coreClusters = cores
      .join(DupClusters.components(coreEdges), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("_cl"))
      .localCheckpoint(true) // read by output join + border assignment
    val borderMin = pairs
      .join(coreClusters.select(col("id").as("r_id"), col("_cl").as("_rc")),
        Seq("r_id"))
      .groupBy(col("l_id").as("id")).agg(min(col("_rc")).as("_bc"))
    flags
      .join(coreClusters, Seq("id"), "left")
      .join(borderMin, Seq("id"), "left")
      .select(col("id"), col("n_nbrs"),
        when(col("is_core"), lit("core"))
          .when(col("_bc").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        when(col("is_core"), col("_cl")).otherwise(col("_bc")).as("cluster"))
  }
}
