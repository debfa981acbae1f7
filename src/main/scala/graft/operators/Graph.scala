package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge tables (co-occurrence graphs: parts bought
  * together, suppliers sharing orders, near-dup doc links). The scale
  * discipline mirrors the rest of the repo: never materialize a hub's
  * neighborhood², orient first.
  */
object Graph {

  /** Per-node triangle participation counts via DEGREE-ORDERED wedge
    * closing (Schank & Wagner's node-iterator++ / the standard
    * MapReduce formulation, Suri & Vassilvitskii WWW'11): orient every
    * edge from its (degree, id)-smaller endpoint to the larger, build
    * wedges only from a node's OUT-neighbors, close each wedge against
    * the oriented edge set. Every triangle has exactly one apex (its
    * rank-minimum), so each is found once — no /3 correction, no
    * double counting.
    *
    * Why orientation matters at 100 TB: out-degree under (degree, id)
    * order is bounded by O(√m) on ANY graph, so wedge fan-out is
    * O(m^1.5) worst-case instead of the hub's degree² — a celebrity
    * node with 10⁸ neighbors contributes zero wedges from its own
    * adjacency (every neighbor out-ranks nothing through it; its edges
    * point INTO it only when it out-ranks the other end, which a
    * max-degree node never does).
    *
    * Input edges are cleaned first: undirected canonicalization
    * (u < v), self-loops dropped, duplicates collapsed. Output: one row
    * per node that participates in ≥ 1 triangle — `(node,
    * n_triangles)`; nodes in no triangle are absent (join back to the
    * node table where zeros matter).
    *
    * Scale shape: degree aggregation is one map-side-combined shuffle;
    * the wedge self-join and closing join both key on node ids (shuffle
    * joins, AQE-splittable); the per-node rollup is map-side combined.
    * Nothing driver-side, nothing windowed. */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val reserved = Seq("_u", "_v", "_deg", "_src", "_dst", "_w1", "_w2", "node")
    require(!edges.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    val canon = edges
      .select(least(col(aCol), col(bCol)).as("_u"),
        greatest(col(aCol), col(bCol)).as("_v"))
      .filter(col("_u") =!= col("_v") && col("_u").isNotNull)
      .distinct()
    val deg = canon
      .select(explode(array(col("_u"), col("_v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("_deg"))
    // orient by (degree, id): strict total order, so exactly one direction
    val withDeg = canon
      .join(deg.select(col("node").as("_u"), col("_deg").as("_du")), "_u")
      .join(deg.select(col("node").as("_v"), col("_deg").as("_dv")), "_v")
    val oriented = withDeg.select(
      when(col("_du") < col("_dv") ||
        (col("_du") === col("_dv") && col("_u") < col("_v")),
        struct(col("_u").as("_src"), col("_v").as("_dst")))
        .otherwise(struct(col("_v").as("_src"), col("_u").as("_dst")))
        .as("_e"))
      .select(col("_e._src").as("_src"), col("_e._dst").as("_dst"))
    // wedges from a shared apex; _w1 < _w2 canonicalizes the wedge so the
    // closing edge is probed in ONE canonical direction
    val wedges = oriented.select(col("_src"), col("_dst").as("_w1"))
      .join(oriented.select(col("_src"), col("_dst").as("_w2")), "_src")
      .filter(col("_w1") < col("_w2"))
    // the closing edge between two out-neighbors, in canonical (u < v)
    // form, lives in `canon` — probe it there (its orientation between
    // the two is irrelevant: both out-rank the apex)
    val triangles = wedges.join(canon,
      col("_w1") === col("_u") && col("_w2") === col("_v"))
      .select(col("_src"), col("_w1"), col("_w2"))
    triangles
      .select(explode(array(col("_src"), col("_w1"), col("_w2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** k-core decomposition by iterative peeling (Seidman 1983; the
    * distributed formulation of Montresor et al.): repeatedly drop every
    * node whose CURRENT degree is below `k` (and its edges) until the
    * survivors all have degree ≥ k — the maximal subgraph where everyone
    * keeps k neighbors, the standard "dense engaged core vs peripheral
    * tendrils" cut. Output: surviving `(node, degree)` with degree
    * measured INSIDE the core.
    *
    * Each round is one degree aggregation + two anti-joins, with a
    * lazy localCheckpoint per round so lineage stays flat
    * ([[graft.operators.DupClusters.componentsWithRounds]]'s loop
    * discipline) and a cheap emptiness probe for convergence. Rounds are
    * bounded by how deep the peeling cascades — small on real
    * heavy-tailed graphs, but a k-long path peels one layer per round,
    * so `maxIters` throws rather than looping silently. Cleaning
    * (canonicalize, self-loop drop, dedup) matches [[triangleCounts]].
    *
    * Scale shape: every step is key-partitioned (degree counts map-side
    * combined; anti-joins on node ids); nothing driver-side but the
    * 1-row convergence probes. */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
            maxIters: Int = 50): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val reserved = Seq("_u", "_v", "node", "degree")
    require(!edges.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    var cur = edges
      .select(least(col(aCol), col(bCol)).as("_u"),
        greatest(col(aCol), col(bCol)).as("_v"))
      .filter(col("_u") =!= col("_v") && col("_u").isNotNull)
      .distinct().localCheckpoint(true)
    def degrees = cur
      .select(explode(array(col("_u"), col("_v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    var i = 0
    var converged = false
    while (!converged && i < maxIters) {
      val bad = degrees.filter(col("degree") < k)
        .select(col("node")).localCheckpoint(false)
      if (bad.isEmpty) converged = true
      else cur = cur
        .join(bad.withColumnRenamed("node", "_u"), Seq("_u"), "left_anti")
        .join(bad.withColumnRenamed("node", "_v"), Seq("_v"), "left_anti")
        .localCheckpoint(false)
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore did not converge in $maxIters rounds — raise maxIters")
    degrees
  }
}
