package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** WEIGHTED core decomposition — the s-core (Eidsaa & Almaas 2013,
    * Phys. Rev. E): iteratively drop every node whose current STRENGTH
    * (sum of incident edge weights) is below `s` until the survivors all
    * hold strength ≥ s. With w ≡ 1 this is exactly [[kCore]]; with real
    * weights it keeps a node that [[kCore]] would peel when its few
    * edges are heavy (one weight-5 link ≥ five weight-1 links) — the
    * discrimination the weighted family exists for.
    *
    * Weighted-family contract (the [[pageRank]]/[[louvain]] conventions):
    * integer weights ≥ 1 enforced with an in-plan never-dropping
    * `assert_true` (NULL/zero/negative weights fail loudly — a silently
    * vanished weight would under-peel); parallel edges SUM; null
    * endpoints and self-loops dropped; undirected canonicalization by
    * (least, greatest). Strengths are exact long sums.
    *
    * Same loop discipline as [[kCore]]: one strength aggregation + two
    * anti-joins per round, lazy per-round localCheckpoints, a cheap
    * emptiness probe, loud `maxIters`. Output: surviving
    * `(node, strength)` with strength measured INSIDE the core. */
  def sCore(edges: DataFrame, aCol: String, bCol: String, wCol: String,
            s: Long, maxIters: Int = 50): DataFrame = {
    require(s >= 1L, s"s ($s) must be >= 1")
    val reserved = Seq("_u", "_v", "_w", "node", "strength")
    require(!edges.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    var cur = edges
      .filter(assert_true(col(wCol) >= 1,
        lit(s"sCore: $wCol must be a positive integer weight")).isNull)
      .select(least(col(aCol), col(bCol)).as("_u"),
        greatest(col(aCol), col(bCol)).as("_v"),
        col(wCol).cast("long").as("_w"))
      .filter(col("_u") =!= col("_v") && col("_u").isNotNull)
      .groupBy("_u", "_v").agg(sum(col("_w")).as("_w"))
      .localCheckpoint(true)
    def strengths = cur
      .select(explode(array(
        struct(col("_u").as("node"), col("_w")),
        struct(col("_v").as("node"), col("_w")))).as("e"))
      .groupBy(col("e.node").as("node")).agg(sum(col("e._w")).as("strength"))
    var i = 0
    var converged = false
    while (!converged && i < maxIters) {
      val bad = strengths.filter(col("strength") < s)
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
        s"sCore did not converge in $maxIters rounds — raise maxIters")
    strengths
  }

  /** Fixed-point rank scale of [[pageRank]]: ranks are carried as exact
    * integers in units of 10⁻¹², so a rank of 1.0 (all the mass on one
    * node) is `1e12`. */
  val RankScale: Long = 1000000000000L

  /** Largest aggregated per-edge weight the weighted-walk family accepts:
    * rank (≤ [[RankScale]] = 1e12) × weight must stay under decimal(38,0)'s
    * 1e38 ceiling, where Spark (ANSI off) turns overflow into silent NULL. */
  private val WeightCap: java.math.BigDecimal =
    new java.math.BigDecimal(java.math.BigInteger.TEN.pow(25))

  /** PageRank (Brin & Page 1998) over a DIRECTED edge list, computed in
    * EXACT integer fixed-point so two engines replaying the same rounds
    * agree bit-for-bit — no float accumulation order anywhere.
    *
    * Arithmetic contract (every step is integer, every division an
    * integral floor-divide of non-negative operands, so truncation ==
    * floor and both Spark's `div` and DuckDB's `//` implement it):
    *   - ranks live in micro⁻²-units of [[RankScale]] (10⁻¹²);
    *     `r₀ = RankScale div n` for every node;
    *   - a node of out-degree d sends `r div d` along each out-edge
    *     (the ≤ d floor remainder is retired, deterministically);
    *   - dangling mass D (ranks of nodes with no out-edges) is
    *     redistributed uniformly as `D div n` per node;
    *   - update: `r' = (1−α)·RankScale div n  +  α·(inflow + D div n)`
    *     with α = `dampNum/dampDen` applied as
    *     `(dampNum · x) div dampDen` — default 85/100.
    * Floor retirement means total mass shrinks by ≤ (m + 2n) units of
    * 10⁻¹² per round — invisible at double precision, and identical on
    * every replay. Runs a FIXED `iters` rounds (no convergence probe):
    * bounded, deterministic, oracle-replayable.
    *
    * Cleaning: null endpoints and self-loops dropped, parallel edges
    * collapsed (simple-graph PageRank). Undirected graphs: pass both
    * orientations.
    *
    * Output: `(node, rank_e12, pagerank)` for EVERY node — `rank_e12`
    * the exact integer, `pagerank` its double rendering (one exact
    * cast + one division; rank_e12 < 2⁵³ so the cast is exact).
    *
    * Scale shape: per round, ONE shuffle join of ranks against the edge
    * list on the source key + one map-side-combined inflow sum on the
    * destination key + a 1-row dangling-mass aggregate (the only
    * driver-side value, the bounded-collect convention of
    * [[graft.operators.Coreset]]); ranks are localCheckpoint'd per
    * round so lineage stays flat. A hub destination is just a heavy
    * reduce key — partial aggregation absorbs it map-side. The edge
    * table is checkpointed once and reused by all rounds. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, dampNum: Long = 85L,
               dampDen: Long = 100L,
               wCol: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters ($iters) must be >= 1")
    require(dampNum >= 0 && dampDen > 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen must be a fraction in [0, 1]")
    val reserved = Seq("_s", "_d", "_od", "_r", "_in", "_w", "node")
    require(!edges.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    // WEIGHTED variant (wCol): a node of out-weight W sends
    // `(r·w) div W` along an edge of weight w — the rank splits
    // proportionally to edge weight instead of uniformly, still exact
    // integer (the product rides decimal(38,0); IntegralDivide lands a
    // long ≤ r). Parallel edges SUM; weights must be POSITIVE integers
    // (counts — a zero would make a node's total out-weight divisible
    // to zero and its division NULL, silently retiring its whole mass,
    // so the guard rejects w < 1 loudly). Unweighted keeps the original
    // `r div out-degree` expression verbatim — w ≡ 1 reduces to it.
    val e = (wCol match {
      case None =>
        edges
          .select(col(srcCol).as("_s"), col(dstCol).as("_d"))
          .filter(col("_s").isNotNull && col("_d").isNotNull &&
            col("_s") =!= col("_d"))
          .distinct()
      case Some(c) =>
        edges
          .filter(assert_true(col(c) >= 1,
            lit(s"pageRank: $c must be a positive integer weight")).isNull)
          .select(col(srcCol).as("_s"), col(dstCol).as("_d"),
            col(c).cast("decimal(38,0)").as("_w"))
          .filter(col("_s").isNotNull && col("_d").isNotNull &&
            col("_s") =!= col("_d"))
          .groupBy("_s", "_d").agg(sum(col("_w")).as("_w"))
          // overflow guard: the share product CAST(_r,38,0)·_w saturates
          // Spark's decimal precision at 38 and (ANSI off) an overflow is
          // a silent NULL — the edge's share would just vanish from the
          // inflow sum. _r ≤ RankScale = 1e12, so capping the aggregated
          // per-pair weight at 1e25 keeps the product < 1e37, exact.
          .filter(assert_true(col("_w") <= lit(WeightCap),
            lit(s"pageRank: aggregated weight of a (_s,_d) pair exceeds" +
              " 1e25 — the rank*weight product would overflow" +
              " decimal(38,0) and silently NULL the share")).isNull)
    }).localCheckpoint(true)
    val nodes = e.select(col("_s").as("node"))
      .union(e.select(col("_d").as("node")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    if (n == 0L)
      return nodes.select(col("node"), lit(0L).as("rank_e12"),
        lit(0.0).as("pagerank"))
    val outdeg = (wCol match {
      case None => e.groupBy(col("_s")).agg(count(lit(1)).as("_od"))
      case Some(_) => e.groupBy(col("_s")).agg(sum(col("_w")).as("_od"))
    }).localCheckpoint(true)
    val tele = ((dampDen - dampNum) * RankScale) / (dampDen * n)
    var r = nodes.select(col("node"), lit(RankScale / n).as("_r"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      // dangling mass: 1-row bounded aggregate (empty sum → 0)
      val dang = r.join(outdeg.withColumnRenamed("_s", "node"),
          Seq("node"), "left_anti")
        .agg(coalesce(sum(col("_r")), lit(0L)))
        .collect()(0).getLong(0)
      val dangShare = dang / n
      val share =
        if (wCol.isEmpty) expr("_r div _od")
        else expr("(CAST(_r AS DECIMAL(38,0)) * _w) div _od")
      val inflow = e
        .join(r.withColumnRenamed("node", "_s"), Seq("_s"))
        .join(outdeg, Seq("_s"))
        .select(col("_d"), share.as("_share"))
        .groupBy(col("_d")).agg(sum(col("_share")).as("_in"))
      r = nodes
        .join(inflow.withColumnRenamed("_d", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(tele) +
            expr(s"($dampNum * (coalesce(_in, 0L) + $dangShare)) div $dampDen")
          ).as("_r"))
        .localCheckpoint(false)
    }
    r.select(col("node"), col("_r").as("rank_e12"),
      (col("_r").cast("double") / lit(RankScale.toDouble)).as("pagerank"))
  }

  /** Personalized PageRank (Page et al. 1999's biased-teleport variant;
    * the relatedness/recommendation primitive — "rank every node by
    * random walks that restart at MY seed set"): [[pageRank]]'s exact
    * integer fixed-point with the teleport vector concentrated
    * uniformly on `seeds` instead of all nodes.
    *
    * Arithmetic contract (identical to [[pageRank]] except where the
    * mass lands, S = |distinct seeds|):
    *   - `r₀ = RankScale div S` on seeds, 0 elsewhere;
    *   - teleport `(1−α)·RankScale div S` is added to SEEDS only;
    *   - dangling mass D redistributes as `D div S` to SEEDS only
    *     (the standard PPR convention — a walk that falls off the
    *     graph restarts at a seed);
    *   - non-seed update is pure inflow: `α·inflow`.
    * Seeds not present in the edge list are kept as isolated nodes
    * (they hold teleport mass that leaks only through damping — the
    * correct semantics for a seed with no out-edges yet). Null seeds
    * are dropped; an empty seed set fails loudly.
    *
    * Output `(node, rank_e12, ppr)`; scale shape identical to
    * [[pageRank]] (one rank⋈edges shuffle + one inflow sum + a 1-row
    * dangling aggregate per round). */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String,
                           iters: Int = 3, dampNum: Long = 85L,
                           dampDen: Long = 100L,
                           wCol: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters ($iters) must be >= 1")
    require(dampNum >= 0 && dampDen > 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen must be a fraction in [0, 1]")
    val reserved = Seq("_s", "_d", "_od", "_r", "_in", "_w", "node", "_seed")
    require(!edges.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    // weighted walk: identical to [[pageRank]]'s wCol contract — shares
    // split (r·w) div out-weight, weights are POSITIVE integers, the
    // unweighted expression is kept verbatim as the w ≡ 1 case
    val e = (wCol match {
      case None =>
        edges
          .select(col(srcCol).as("_s"), col(dstCol).as("_d"))
          .filter(col("_s").isNotNull && col("_d").isNotNull &&
            col("_s") =!= col("_d"))
          .distinct()
      case Some(c) =>
        edges
          .filter(assert_true(col(c) >= 1,
            lit(s"personalizedPageRank: $c must be a positive integer" +
              " weight")).isNull)
          .select(col(srcCol).as("_s"), col(dstCol).as("_d"),
            col(c).cast("decimal(38,0)").as("_w"))
          .filter(col("_s").isNotNull && col("_d").isNotNull &&
            col("_s") =!= col("_d"))
          .groupBy("_s", "_d").agg(sum(col("_w")).as("_w"))
          // same decimal(38,0) share-product overflow guard as [[pageRank]]
          .filter(assert_true(col("_w") <= lit(WeightCap),
            lit(s"personalizedPageRank: aggregated weight of a (_s,_d)" +
              " pair exceeds 1e25 — the rank*weight product would" +
              " overflow decimal(38,0) and silently NULL the share")).isNull)
    }).localCheckpoint(true)
    val sd = seeds.select(col(seedCol).as("node"))
      .filter(col("node").isNotNull)
      .distinct().localCheckpoint(true)
    val sCount = sd.count()
    require(sCount > 0, "personalizedPageRank: the seed set is empty")
    val nodes = e.select(col("_s").as("node"))
      .union(e.select(col("_d").as("node")))
      .union(sd.select(col("node")))
      .distinct()
      .join(sd.select(col("node"), lit(true).as("_seed")), Seq("node"), "left")
      .select(col("node"), coalesce(col("_seed"), lit(false)).as("_seed"))
      .localCheckpoint(true)
    val outdeg = (wCol match {
      case None => e.groupBy(col("_s")).agg(count(lit(1)).as("_od"))
      case Some(_) => e.groupBy(col("_s")).agg(sum(col("_w")).as("_od"))
    }).localCheckpoint(true)
    val tele = ((dampDen - dampNum) * RankScale) / (dampDen * sCount)
    var r = nodes.select(col("node"), col("_seed"),
        when(col("_seed"), lit(RankScale / sCount)).otherwise(lit(0L)).as("_r"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val dang = r.join(outdeg.withColumnRenamed("_s", "node"),
          Seq("node"), "left_anti")
        .agg(coalesce(sum(col("_r")), lit(0L)))
        .collect()(0).getLong(0)
      val dangShare = dang / sCount
      val share =
        if (wCol.isEmpty) expr("_r div _od")
        else expr("(CAST(_r AS DECIMAL(38,0)) * _w) div _od")
      val inflow = e
        .join(r.select(col("node").as("_s"), col("_r")), Seq("_s"))
        .join(outdeg, Seq("_s"))
        .select(col("_d"), share.as("_share"))
        .groupBy(col("_d")).agg(sum(col("_share")).as("_in"))
      r = nodes
        .join(inflow.withColumnRenamed("_d", "node"), Seq("node"), "left")
        .select(col("node"), col("_seed"),
          (when(col("_seed"), lit(tele)).otherwise(lit(0L)) +
            expr(s"($dampNum * (coalesce(_in, 0L) + " +
              s"IF(_seed, ${dangShare}L, 0L))) div $dampDen")
          ).as("_r"))
        .localCheckpoint(false)
    }
    r.select(col("node"), col("_r").as("rank_e12"),
      (col("_r").cast("double") / lit(RankScale.toDouble)).as("ppr"))
  }

  /** Breadth-first hop distance from a LANDMARK set over a directed
    * edge list, bounded at `maxHops` — the graph-feature primitive
    * ("distance to nearest seed/spam node/hub") and the building block
    * of landmark-based shortest-path estimation (Potamias et al.,
    * CIKM'09). Returns `(node, hops)` for every node reachable within
    * `maxHops`: sources at 0 (emitted even if isolated — a landmark is
    * at distance 0 from itself by definition), and otherwise the
    * MINIMUM hop count, guaranteed by construction: a node joins the
    * frontier the first round it is seen and is anti-joined away from
    * all later rounds.
    *
    * Per round: frontier ⋈ edges on the source key (shuffle join),
    * distinct, anti-join against the visited set, union — all
    * node-keyed, map-side combinable, lazily checkpointed so lineage
    * stays flat ([[kCore]]'s loop discipline). Rounds are bounded by
    * `maxHops` with an early exit on an empty frontier (1-row probe).
    * The visited set grows to at most |V| rows — node-sized, never
    * edge-sized. Null endpoints are dropped; parallel edges collapse;
    * self-loops are harmless (a visited node never re-enters). */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              sources: DataFrame, sourceCol: String,
              maxHops: Int = 4): DataFrame = {
    require(maxHops >= 0, s"maxHops ($maxHops) must be >= 0")
    val e = edges
      .select(col(srcCol).as("_s"), col(dstCol).as("_d"))
      .filter(col("_s").isNotNull && col("_d").isNotNull)
      .distinct().localCheckpoint(true)
    var visited = sources
      .select(col(sourceCol).as("node")).filter(col("node").isNotNull)
      .distinct()
      .select(col("node"), lit(0).as("hops"))
      .localCheckpoint(false)
    var frontier = visited
    var h = 0
    var done = maxHops == 0
    while (!done) {
      h += 1
      val next = frontier
        .join(e.withColumnRenamed("_s", "node"), Seq("node"))
        .select(col("_d").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .select(col("node"), lit(h).as("hops"))
        .localCheckpoint(false)
      if (next.isEmpty) done = true
      else {
        visited = visited.unionByName(next).localCheckpoint(false)
        frontier = next
        if (h >= maxHops) done = true
      }
    }
    visited
  }

  /** Degree assortativity coefficient (Newman, "Assortative mixing in
    * networks", PRL 2002) of an UNDIRECTED graph: the Pearson
    * correlation of the degree pairs at the two ends of every edge,
    * each edge counted in both orientations (the standard symmetric
    * convention — Σx = Σy by construction). Positive: hubs link to
    * hubs (social graphs); negative: hubs link to leaves
    * (supplier/part, web). Cleaning matches [[triangleCounts]]:
    * canonicalize, drop self-loops, collapse duplicates.
    *
    * Determinism: degrees are exact integers; the five sufficient sums
    * run in decimal(38,0) (degree ≤ n < 10⁹ keeps Σd² · 2m inside the
    * exact range for any graph whose directed edge count < 10²⁰), and
    * the closed form combines one correctly-rounded double per sum in
    * fixed order — `r = (M·Σxy − Σx·Σy) / (M·Σxx − (Σx)²)` with
    * M = 2m (the symmetric denominator; null for a regular graph,
    * where degree variance is zero and mixing is undefined).
    *
    * Scale shape: one degree aggregation (map-side combined), two
    * node-keyed joins to attach end degrees (a 100 TB edge list
    * shuffles twice on node ids, AQE-splittable), ONE aggregation to
    * five sums. Output is a single row `(n_nodes, m_edges,
    * assortativity)`. */
  /** Local clustering coefficient (Watts & Strogatz, Nature 1998) per
    * node: `C(v) = 2·T(v) / (deg(v)·(deg(v)−1))` — the fraction of a
    * node's neighbor pairs that are themselves connected; the
    * community-tightness feature next to raw [[triangleCounts]].
    * Degree-1 (and isolated-by-cleaning) nodes have no neighbor pairs:
    * C is reported as 0.0 — the usual convention, stated rather than
    * NaN'd. Cleaning matches [[triangleCounts]] (canonicalize, drop
    * self-loops, collapse duplicates); every node of the cleaned graph
    * appears, zero-triangle nodes included.
    *
    * Determinism: T and deg are exact integers; C is one double
    * division of exact products (`2T < 2⁵³`, `d(d−1) < 2⁵³`).
    *
    * Scale shape: [[triangleCounts]]'s oriented O(m^1.5) wedge plan +
    * one degree aggregation + one node-keyed left join — nothing new
    * shuffles beyond those. Output: `(node, degree, n_triangles,
    * clustering_coeff)`. */
  /** Multi-source weighted shortest paths by `rounds` Bellman–Ford
    * relaxations (Bellman 1958, Ford 1956): every node reachable from
    * the source set within `rounds` EDGES reports the exact minimum
    * path weight among paths of at most `rounds` edges — the bounded
    * semantics stated, truncation identical on every engine (the
    * [[pageRank]] fixed-rounds discipline; a true unbounded SSSP needs
    * rounds ≥ longest shortest path's edge count, ≤ |V|−1).
    *
    * Weights: `wCol` cast to long, must be ≥ 0 (negative weights make
    * "shortest within k edges" non-monotone in k — rejected loudly via
    * a planted assert). Parallel edges collapse to their MIN weight;
    * self-loops drop (never improve a distance). Distances are exact
    * long sums — no floating point anywhere.
    *
    * Per round: dist ⋈ edges on the source key (shuffle join), union
    * with the standing distances, min per node — node-keyed, map-side
    * combinable, lazily checkpointed ([[kCore]]'s loop discipline).
    * The dist set is node-sized; total work is O(rounds·m) relax
    * candidates. Output: `(node, dist)` for reached nodes. */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
                    wCol: String, sources: DataFrame, sourceCol: String,
                    rounds: Int = 4): DataFrame = {
    require(rounds >= 0, s"rounds ($rounds) must be >= 0")
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(wCol).isNotNull && col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("_s"), col(dstCol).as("_d"),
        assert_true(col(wCol) >= 0,
          lit(s"shortestPaths: negative $wCol")).as("_guard"),
        col(wCol).cast("long").as("_w"))
      .groupBy("_s", "_d").agg(min(col("_w")).as("_w"),
        first(col("_guard")).as("_g"))
      .localCheckpoint(true)
    var dist = sources
      .select(col(sourceCol).as("node")).filter(col("node").isNotNull)
      .distinct()
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      dist = dist
        .unionByName(dist
          .join(e.withColumnRenamed("_s", "node"), Seq("node"))
          .select(col("_d").as("node"), (col("dist") + col("_w")).as("dist")))
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .localCheckpoint(false)
    }
    dist
  }

  def clusteringCoefficient(edges: DataFrame, aCol: String,
                            bCol: String): DataFrame = {
    val cleaned = edges
      .select(least(col(aCol), col(bCol)).as("ca"),
        greatest(col(aCol), col(bCol)).as("cb"))
      .filter(col("ca") =!= col("cb") && col("ca").isNotNull)
      .distinct().localCheckpoint(true)
    val deg = cleaned
      .select(explode(array(col("ca"), col("cb"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val tri = triangleCounts(cleaned, "ca", "cb")
      .withColumnRenamed("n_triangles", "_t")
    deg.join(tri, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("_t"), lit(0L)).as("n_triangles"),
        when(col("degree") < 2L, lit(0.0))
          .otherwise((coalesce(col("_t"), lit(0L)) * 2L).cast("double") /
            (col("degree") * (col("degree") - 1L)).cast("double"))
          .as("clustering_coeff"))
  }

  /** WEIGHTED clustering coefficient (Barrat, Barthélemy, Pastor-Satorras
    * & Vespignani 2004, PNAS): per node,
    * `c_w(i) = (Σ_{triangles ijh} (w_ij + w_ih)) / (s_i · (k_i − 1))` —
    * the fraction of a node's strength engaged in closed triangles. With
    * w ≡ 1 it reduces EXACTLY to [[clusteringCoefficient]]'s
    * `2T/(k(k−1))`; with real weights it discounts a node whose heavy
    * edges point OUT of its triangles — the weighted-family
    * discrimination.
    *
    * Weighted-family contract: integer weights ≥ 1 (in-plan
    * never-dropping assert), parallel edges SUM, canonicalization and
    * self-loop handling as [[triangleCounts]]. All masses are exact
    * integer sums; the coefficient is ONE double division.
    *
    * Scale shape: triangle enumeration reuses the degree-ordered
    * orientation (a hub contributes O(√m) wedges, not degree²) with the
    * weight riding each edge; contributions explode 3 rows per triangle
    * into one map-side-combined rollup. Output: `(node, degree,
    * strength, tri_mass, weighted_clustering)` for EVERY node (k < 2 →
    * 0.0). */
  def clusteringCoefficientWeighted(edges: DataFrame, aCol: String,
                                    bCol: String, wCol: String): DataFrame = {
    val reserved = Seq("_u", "_v", "_w", "_deg", "_du", "_dv", "_src", "_dst",
      "_w1", "_w2", "_ws1", "_ws2", "_w12", "node")
    require(!edges.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    val canon = edges
      .filter(assert_true(col(wCol) >= 1,
        lit(s"clusteringCoefficientWeighted: $wCol must be a positive" +
          " integer weight")).isNull)
      .select(least(col(aCol), col(bCol)).as("_u"),
        greatest(col(aCol), col(bCol)).as("_v"),
        col(wCol).cast("long").as("_w"))
      .filter(col("_u") =!= col("_v") && col("_u").isNotNull)
      .groupBy("_u", "_v").agg(sum(col("_w")).as("_w"))
      .localCheckpoint(true)
    val deg = canon
      .select(explode(array(
        struct(col("_u").as("node"), col("_w")),
        struct(col("_v").as("node"), col("_w")))).as("e"))
      .groupBy(col("e.node").as("node"))
      .agg(count(lit(1)).as("degree"), sum(col("e._w")).as("strength"))
    val withDeg = canon
      .join(deg.select(col("node").as("_u"), col("degree").as("_du")), "_u")
      .join(deg.select(col("node").as("_v"), col("degree").as("_dv")), "_v")
    val oriented = withDeg.select(
      when(col("_du") < col("_dv") ||
        (col("_du") === col("_dv") && col("_u") < col("_v")),
        struct(col("_u").as("_src"), col("_v").as("_dst"), col("_w")))
        .otherwise(struct(col("_v").as("_src"), col("_u").as("_dst"),
          col("_w")))
        .as("_e"))
      .select(col("_e._src").as("_src"), col("_e._dst").as("_dst"),
        col("_e._w").as("_w"))
    val wedges = oriented
      .select(col("_src"), col("_dst").as("_w1"), col("_w").as("_ws1"))
      .join(oriented.select(col("_src"), col("_dst").as("_w2"),
        col("_w").as("_ws2")), "_src")
      .filter(col("_w1") < col("_w2"))
    val triangles = wedges.join(
      canon.select(col("_u"), col("_v"), col("_w").as("_w12")),
      col("_w1") === col("_u") && col("_w2") === col("_v"))
      .select(col("_src"), col("_w1"), col("_w2"),
        col("_ws1"), col("_ws2"), col("_w12"))
    val triMass = triangles
      .select(explode(array(
        struct(col("_src").as("node"), (col("_ws1") + col("_ws2")).as("m")),
        struct(col("_w1").as("node"), (col("_ws1") + col("_w12")).as("m")),
        struct(col("_w2").as("node"), (col("_ws2") + col("_w12")).as("m"))))
        .as("c"))
      .groupBy(col("c.node").as("node")).agg(sum(col("c.m")).as("_tm"))
    deg.join(triMass, Seq("node"), "left")
      .select(col("node"), col("degree"), col("strength"),
        coalesce(col("_tm"), lit(0L)).as("tri_mass"),
        when(col("degree") < 2L, lit(0.0))
          .otherwise(coalesce(col("_tm"), lit(0L)).cast("double") /
            (col("strength") * (col("degree") - 1L)).cast("double"))
          .as("weighted_clustering"))
  }

  def degreeAssortativity(edges: DataFrame, aCol: String,
                          bCol: String): DataFrame = {
    val cleaned = edges
      .select(least(col(aCol), col(bCol)).as("_u"),
        greatest(col(aCol), col(bCol)).as("_v"))
      .filter(col("_u") =!= col("_v") && col("_u").isNotNull)
      .distinct()
    val both = cleaned
      .unionByName(cleaned.select(col("_v").as("_u"), col("_u").as("_v")))
      .localCheckpoint(true)
    val deg = both.groupBy(col("_u").as("_n"))
      .agg(count(lit(1)).as("_deg")).localCheckpoint(true)
    val d19 = "decimal(19,0)"
    val pairs = both
      .join(deg.select(col("_n").as("_u"), col("_deg").as("_dx")), Seq("_u"))
      .join(deg.select(col("_n").as("_v"), col("_deg").as("_dy")), Seq("_v"))
    val sums = pairs.agg(
      count(lit(1)).as("_m2"),
      sum(col("_dx").cast(d19)).as("_sx"),
      sum(col("_dx").cast(d19) * col("_dx").cast(d19)).as("_sxx"),
      sum(col("_dx").cast(d19) * col("_dy").cast(d19)).as("_sxy"))
    def dbl(c: String): Column = col(c).cast("double")
    val mD = col("_m2").cast("double")
    val num = mD * dbl("_sxy") - dbl("_sx") * dbl("_sx")
    val den = mD * dbl("_sxx") - dbl("_sx") * dbl("_sx")
    sums
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
      .select(col("n_nodes"), (col("_m2") / 2).cast("long").as("m_edges"),
        when(col("_m2") === 0L || den === 0.0, lit(null))
          .otherwise(num / den).as("assortativity"))
  }

  /** WEIGHTED (strength) assortativity (Leung & Chau 2007, Physica A):
    * the weighted Pearson correlation of connected endpoints' STRENGTHS,
    * each directed stub weighted by its edge weight —
    * `r_w = (W·Σw·s_u·s_v − (Σw·s_u)²) / (W·Σw·s_u² − (Σw·s_u)²)` over
    * both orientations (so the x/y marginals coincide, as in
    * [[degreeAssortativity]]). With w ≡ 1 strength = degree and this is
    * exactly [[degreeAssortativity]]; with real weights a heavy edge
    * between mismatched hubs moves r_w where edge counting cannot.
    *
    * Weighted-family contract: integer weights ≥ 1 (in-plan loud
    * assert), parallel edges SUM, nulls/self-loops dropped. Sufficient
    * statistics accumulate exactly in decimal(38,0) (w·s·s stays inside
    * 38 digits up to w, s ≈ 10¹²; ANSI overflow is loud); the final
    * correlation is the same fixed-order double chain as the unweighted
    * operator. Output: `(n_nodes, w_edges, assortativity)` — `w_edges`
    * the total undirected edge weight; null when degenerate.
    *
    * Scale shape: one canonicalizing aggregation, one strength
    * aggregation, two key-partitioned joins, a single-row total. */
  def assortativityWeighted(edges: DataFrame, aCol: String, bCol: String,
                            wCol: String): DataFrame = {
    val reserved = Seq("_u", "_v", "_w", "_n", "_sx", "_sy", "node")
    require(!edges.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    val canon = edges
      .filter(assert_true(col(wCol) >= 1,
        lit(s"assortativityWeighted: $wCol must be a positive integer" +
          " weight")).isNull)
      .select(least(col(aCol), col(bCol)).as("_u"),
        greatest(col(aCol), col(bCol)).as("_v"),
        col(wCol).cast("long").as("_w"))
      .filter(col("_u") =!= col("_v") && col("_u").isNotNull)
      .groupBy("_u", "_v").agg(sum(col("_w")).as("_w"))
      .localCheckpoint(true)
    val d38 = "decimal(38,0)"
    val strength = canon
      .select(explode(array(
        struct(col("_u").as("node"), col("_w")),
        struct(col("_v").as("node"), col("_w")))).as("e"))
      .groupBy(col("e.node").as("node")).agg(sum(col("e._w")).as("_s"))
      .localCheckpoint(true)
    val both = canon
      .unionByName(canon.select(col("_v").as("_u"), col("_u").as("_v"),
        col("_w")))
    val pairs = both
      .join(strength.select(col("node").as("_u"), col("_s").as("_su")), "_u")
      .join(strength.select(col("node").as("_v"), col("_s").as("_sv")), "_v")
    val sums = pairs.agg(
      sum(col("_w").cast(d38)).as("_w2"),
      sum(col("_w").cast(d38) * col("_su").cast(d38)).as("_sx"),
      sum(col("_w").cast(d38) * col("_su").cast(d38) * col("_su").cast(d38))
        .as("_sxx"),
      sum(col("_w").cast(d38) * col("_su").cast(d38) * col("_sv").cast(d38))
        .as("_sxy"))
    def dbl(c: String): Column = col(c).cast("double")
    val wD = dbl("_w2")
    val num = wD * dbl("_sxy") - dbl("_sx") * dbl("_sx")
    val den = wD * dbl("_sxx") - dbl("_sx") * dbl("_sx")
    sums
      .crossJoin(broadcast(strength.agg(count(lit(1)).as("n_nodes"))))
      .select(col("n_nodes"),
        (col("_w2") / 2).cast("long").as("w_edges"),
        when(col("_w2").isNull || col("_w2") === 0 || den === 0.0, lit(null))
          .otherwise(num / den).as("assortativity"))
  }

  /** HITS hubs and authorities (Kleinberg, "Authoritative sources in a
    * hyperlinked environment", JACM 1999) over a DIRECTED edge list, in
    * [[pageRank]]'s exact integer fixed-point — the classic bipartite
    * use (buyers → products) ranks hubs and authorities jointly where
    * PageRank's single score cannot separate the two roles.
    *
    * Arithmetic contract (all integer; divisions are floor-divides of
    * non-negative operands, so Spark `div` ≡ DuckDB `//`):
    *   - `h₀ = RankScale div n` for every node;
    *   - authority inflow `a_raw(v) = Σ_{u→v} h(u)` accumulated in
    *     decimal(38,0) (a hub destination is a heavy reduce key, never
    *     an overflow);
    *   - L1 renormalization `a = (a_raw · RankScale) div Σ a_raw` —
    *     exact 38-digit multiply-then-divide, so Σa returns to
    *     RankScale minus ≤ n floor-retired units;
    *   - hub outflow `h_raw(u) = Σ_{u→v} a(v)`, renormalized the same
    *     way. (The classical L2 norm needs a square root and would
    *     break integer exactness; with a fixed iteration count the L1
    *     scaling ranks identically.)
    * Runs a FIXED `iters` rounds — bounded, deterministic,
    * oracle-replayable. Cleaning as [[pageRank]] (nulls, self-loops,
    * parallel edges). Requires n < 10¹³ so the renormalization multiply
    * stays inside 38 digits (ANSI overflow fails loudly, not silently).
    *
    * Output `(node, authority_e12, hub_e12, authority, hub)` for every
    * node — sinks carry hub 0, sources authority 0.
    *
    * Scale shape: per round, two rank⋈edges shuffle joins (one per
    * direction) with map-side-combined sums, and two 1-row totals that
    * ride broadcast crossJoins — nothing node-sized on the driver. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters ($iters) must be >= 1")
    val reserved = Seq("_s", "_d", "_h", "_a", "_ar", "_hr", "_at", "_ht", "node")
    require(!edges.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    val e = edges
      .select(col(srcCol).as("_s"), col(dstCol).as("_d"))
      .filter(col("_s").isNotNull && col("_d").isNotNull &&
        col("_s") =!= col("_d"))
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("_s").as("node"))
      .union(e.select(col("_d").as("node")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    if (n == 0L)
      return nodes.select(col("node"), lit(0L).as("authority_e12"),
        lit(0L).as("hub_e12"), lit(0.0).as("authority"), lit(0.0).as("hub"))
    val d38 = "decimal(38,0)"
    def renorm(raw: String, tot: String): Column =
      expr(s"(CAST($raw AS DECIMAL(38,0)) * " +
        s"CAST($RankScale AS DECIMAL(38,0))) div $tot")
    var h = nodes.select(col("node"), lit(RankScale / n).as("_h"))
      .localCheckpoint(false)
    var a = nodes.select(col("node"), lit(0L).as("_a"))
    for (_ <- 1 to iters) {
      val araw = e.join(h.withColumnRenamed("node", "_s"), Seq("_s"))
        .groupBy(col("_d")).agg(sum(col("_h").cast(d38)).as("_ar"))
        .localCheckpoint(false) // total + renormalized read
      val atot = araw.agg(sum(col("_ar")).as("_at"))
      a = nodes
        .join(araw.withColumnRenamed("_d", "node"), Seq("node"), "left")
        .crossJoin(broadcast(atot))
        .select(col("node"),
          when(col("_ar").isNull, lit(0L))
            .otherwise(renorm("_ar", "_at")).as("_a"))
        .localCheckpoint(false)
      val hraw = e.join(a.withColumnRenamed("node", "_d"), Seq("_d"))
        .groupBy(col("_s")).agg(sum(col("_a").cast(d38)).as("_hr"))
        .localCheckpoint(false)
      val htot = hraw.agg(sum(col("_hr")).as("_ht"))
      h = nodes
        .join(hraw.withColumnRenamed("_s", "node"), Seq("node"), "left")
        .crossJoin(broadcast(htot))
        .select(col("node"),
          when(col("_hr").isNull, lit(0L))
            .otherwise(renorm("_hr", "_ht")).as("_h"))
        .localCheckpoint(false)
    }
    a.join(h, Seq("node"))
      .select(col("node"), col("_a").as("authority_e12"),
        col("_h").as("hub_e12"),
        (col("_a").cast("double") / lit(RankScale.toDouble)).as("authority"),
        (col("_h").cast("double") / lit(RankScale.toDouble)).as("hub"))
  }

  /** Newman modularity of a node partition (Newman & Girvan, Phys. Rev.
    * E 2004): `Q = Σ_c [e_c/m − (deg_c/2m)²]` — how much denser the
    * communities are than a degree-preserving random rewiring; THE
    * quality score for [[labelPropagation]]'s output (Q near 0 ⇒ the
    * partition found nothing).
    *
    * EXACT INTEGER form: `Q·4m² = Σ_c [4m·e_c − deg_c²]` — every term
    * a product of exact counts, accumulated in decimal(38,0) and folded
    * in COMMUNITY ORDER; `modularity` is the single double division at
    * the end. Cleaning matches [[triangleCounts]] (canonicalize,
    * self-loops dropped, dedup); nodes missing from `labels` fail
    * loudly (a partial partition would silently skew deg_c).
    *
    * Output: ONE row `(n_nodes, m_edges, n_communities, q_num_e,
    * modularity)` with `q_num_e` the exact Q·4m² numerator.
    *
    * Scale shape: one degree aggregation, one two-sided label join over
    * the edge list, one community-sized rollup, a 1-row fold. */
  def modularity(edges: DataFrame, aCol: String, bCol: String,
                 labels: DataFrame, nodeCol: String,
                 labelCol: String): DataFrame = {
    val canon = edges
      .select(least(col(aCol), col(bCol)).as("_u"),
        greatest(col(aCol), col(bCol)).as("_v"))
      .filter(col("_u") =!= col("_v") && col("_u").isNotNull)
      .distinct().localCheckpoint(true) // degrees + the label join
    val lbl = labels.select(col(nodeCol).as("node"), col(labelCol).as("_l"))
      .localCheckpoint(true)
    val nodes = canon.select(explode(array(col("_u"), col("_v"))).as("node"))
      .distinct()
    val missing = nodes.join(lbl, Seq("node"), "left_anti").limit(1).collect()
    require(missing.isEmpty,
      s"node ${missing.headOption.map(_.get(0)).getOrElse("")} has no label" +
        " — modularity needs a TOTAL partition")
    val deg = canon.select(explode(array(col("_u"), col("_v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("_d"))
    val degC = deg.join(lbl, Seq("node"))
      .groupBy(col("_l")).agg(sum(col("_d")).as("_degc"),
        count(lit(1)).as("_nc"))
    val intra = canon
      .join(lbl.select(col("node").as("_u"), col("_l").as("_lu")), Seq("_u"))
      .join(lbl.select(col("node").as("_v"), col("_l").as("_lv")), Seq("_v"))
      .filter(col("_lu") === col("_lv"))
      .groupBy(col("_lu").as("_l")).agg(count(lit(1)).as("_ec"))
    val m = canon.count()
    val d38 = "decimal(38,0)"
    val per = degC.join(intra, Seq("_l"), "left")
      .select(col("_l"), col("_nc"), col("_degc"),
        coalesce(col("_ec"), lit(0L)).as("_ec"))
    per
      .agg(count(lit(1)).as("n_communities"),
        sum(col("_nc")).as("n_nodes"),
        sort_array(collect_list(struct(col("_l"), col("_ec"),
          col("_degc")))).as("_t"))
      .select(col("n_nodes"), lit(m).as("m_edges"), col("n_communities"),
        aggregate(col("_t"), lit(0L).cast(d38), (acc, t) =>
          acc + (lit(4L * m).cast(d38) * t("_ec").cast(d38)
            - t("_degc").cast(d38) * t("_degc").cast(d38))).as("q_num_e"))
      .select(col("n_nodes"), col("m_edges"), col("n_communities"),
        // decimal accumulation, long surface: |Q·4m²| ≤ 4m² + Σdeg² ≤ 8m²
        // fits a long through ~10⁹ edges — plenty; overflow would null
        // under the cast, never silently wrap
        col("q_num_e").cast("long").as("q_num_e"),
        when(lit(m) === 0L, lit(null))
          .otherwise(col("q_num_e").cast("double") /
            (lit(4.0) * lit(m.toDouble) * lit(m.toDouble)))
          .as("modularity"))
  }

  /** WEIGHTED Newman modularity — [[modularity]]'s exact-integer form
    * generalized to weighted edges (Newman, Phys. Rev. E 2004 §V:
    * replace edge counts with weight sums):
    *
    *   Q·4W² = Σ_c [4W·w_c − S_c²]
    *
    * with W = total canonical edge weight (parallel edges SUM — the
    * [[louvainMoveRounds]] convention), w_c = intra-community weight,
    * S_c = Σ weighted degree. Exact while weights are non-negative
    * integers (counts — enforced in-plan); `modularity` is the single
    * double division at the end. Self-loops are dropped like
    * [[modularity]]. Output: ONE row `(n_nodes, w_total,
    * n_communities, q_num_e, modularity)`.
    *
    * Scale shape: identical to [[modularity]] — one degree aggregation,
    * one two-sided label join, a community-sized rollup, a 1-row fold. */
  def modularityWeighted(edges: DataFrame, aCol: String, bCol: String,
                         wCol: String, labels: DataFrame, nodeCol: String,
                         labelCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val canon = edges
      // guard as a never-dropping filter (the q83 pattern — a filter
      // cannot be column-pruned away, unlike an unused guard column)
      .filter(assert_true(col(wCol) >= 0,
        lit(s"modularityWeighted: negative $wCol")).isNull)
      .select(least(col(aCol), col(bCol)).as("_u"),
        greatest(col(aCol), col(bCol)).as("_v"),
        col(wCol).cast(d38).as("_w"))
      .filter(col("_u") =!= col("_v") && col("_u").isNotNull)
      .groupBy("_u", "_v").agg(sum(col("_w")).as("_w"))
      .localCheckpoint(true) // degrees + the label join + W
    val lbl = labels.select(col(nodeCol).as("node"), col(labelCol).as("_l"))
      .localCheckpoint(true)
    val nodes = canon.select(explode(array(col("_u"), col("_v"))).as("node"))
      .distinct()
    val missing = nodes.join(lbl, Seq("node"), "left_anti").limit(1).collect()
    require(missing.isEmpty,
      s"node ${missing.headOption.map(_.get(0)).getOrElse("")} has no label" +
        " — modularity needs a TOTAL partition")
    // W: exact decimal surfaced as long (fails loudly past 2⁶³)
    val w0 = canon.agg(coalesce(sum(col("_w")), lit(0L).cast(d38))
      .cast("long")).collect()(0).getLong(0)
    val deg = canon.select(explode(array(
        struct(col("_u").as("node"), col("_w")),
        struct(col("_v").as("node"), col("_w")))).as("_e"))
      .select(col("_e.node").as("node"), col("_e._w").as("_w"))
      .groupBy("node").agg(sum(col("_w")).as("_d"))
    val degC = deg.join(lbl, Seq("node"))
      .groupBy(col("_l")).agg(sum(col("_d")).as("_degc"),
        count(lit(1)).as("_nc"))
    val intra = canon
      .join(lbl.select(col("node").as("_u"), col("_l").as("_lu")), Seq("_u"))
      .join(lbl.select(col("node").as("_v"), col("_l").as("_lv")), Seq("_v"))
      .filter(col("_lu") === col("_lv"))
      .groupBy(col("_lu").as("_l")).agg(sum(col("_w")).as("_wc"))
    val per = degC.join(intra, Seq("_l"), "left")
      .select(col("_l"), col("_nc"), col("_degc"),
        coalesce(col("_wc"), lit(0L).cast(d38)).as("_wc"))
    per
      .agg(count(lit(1)).as("n_communities"),
        sum(col("_nc")).as("n_nodes"),
        sort_array(collect_list(struct(col("_l"), col("_wc"),
          col("_degc")))).as("_t"))
      .select(col("n_nodes"), lit(w0).as("w_total"), col("n_communities"),
        aggregate(col("_t"), lit(0L).cast(d38), (acc, t) =>
          acc + (lit(4L * w0).cast(d38) * t("_wc").cast(d38)
            - t("_degc").cast(d38) * t("_degc").cast(d38))).as("q_num_e"))
      .select(col("n_nodes"), col("w_total"), col("n_communities"),
        col("q_num_e").cast("long").as("q_num_e"),
        when(lit(w0) === 0L, lit(null))
          .otherwise(col("q_num_e").cast("double") /
            (lit(4.0) * lit(w0.toDouble) * lit(w0.toDouble)))
          .as("modularity"))
  }

  /** Harmonic centrality (Boldi & Vigna, "Axioms for centrality",
    * Internet Mathematics 2014 — the closeness variant that handles
    * disconnected graphs: unreachable nodes contribute 0, not ∞) for a
    * bounded LANDMARK set: `H(l) = Σ_{v ≠ l, d(v) ≤ maxHops} 1/d(v)`
    * with d from [[bfsHops]]' level-synchronous frontier.
    *
    * Exact-H at 100 TB needs all-pairs distances; the landmark form is
    * the standard practical cut (k seeds × bounded BFS) and the k here
    * is an explicit Scala argument — the caller owns the driver-side
    * loop bound, the frontier never leaves the cluster.
    *
    * Determinism: per-hop counts are exact integers; the score folds
    * `cnt_h / h` in ASCENDING hop order over a sorted collect (hop
    * count ≤ maxHops terms), so the double chain is order-pinned
    * cross-engine.
    *
    * Output: `(landmark, n_reached, harmonic)` — one row per landmark,
    * zero row values for landmarks absent from the graph. */
  def harmonicCentrality(edges: DataFrame, srcCol: String, dstCol: String,
                         landmarks: Seq[Long],
                         maxHops: Int = 4): DataFrame = {
    require(landmarks.nonEmpty, "at least one landmark is required")
    val spark = edges.sparkSession
    import spark.implicits._
    val perLandmark = landmarks.distinct.sorted.map { l =>
      val src = Seq(l).toDF("node")
      bfsHops(edges, srcCol, dstCol, src, "node", maxHops)
        .filter(col("hops") > 0)
        .groupBy(col("hops")).agg(count(lit(1)).as("_c"))
        .agg(coalesce(sum(col("_c")), lit(0L)).as("n_reached"),
          coalesce(aggregate(
            sort_array(collect_list(struct(col("hops"), col("_c")))),
            lit(0.0),
            (acc, t) => acc + t("_c").cast("double") / t("hops").cast("double")),
            lit(0.0)).as("harmonic"))
        .select(lit(l).as("landmark"), col("n_reached"), col("harmonic"))
    }
    perLandmark.reduce(_.unionByName(_))
  }

  /** WEIGHTED harmonic centrality from a landmark set — the
    * weighted-distance sibling of [[harmonicCentrality]] (Marchiori &
    * Latora's harmonic sum over Boldi–Vigna's centrality, with edge
    * weights as lengths): per landmark,
    * `H_w(l) = Σ_{v ≠ l reached} 1 / dist_w(l, v)` where `dist_w` is the
    * EXACT integer shortest-path length from [[shortestPaths]]'s bounded
    * Bellman–Ford (paths of ≤ `rounds` edges — the same bounded-horizon
    * contract as q215; a longer-but-lighter path beyond the horizon is
    * out of scope by construction and the bound is part of the
    * definition being gated).
    *
    * Determinism: distances are exact longs; the 1/d fold runs in
    * distance order over per-distance counts (the [[harmonicCentrality]]
    * device), so the double sum is order-pinned cross-engine. An absent
    * landmark reaches nothing and reports (0, 0.0) rather than vanishing.
    *
    * Scale shape: one relaxation join per round per landmark batch over
    * the collapsed edge table; the fold input is per-DISTINCT-DISTANCE
    * counts (≤ rounds·maxW rows), never node-sized. */
  def harmonicCentralityWeighted(edges: DataFrame, srcCol: String,
                                 dstCol: String, wCol: String,
                                 landmarks: Seq[Long],
                                 rounds: Int = 4): DataFrame = {
    require(landmarks.nonEmpty, "at least one landmark is required")
    val spark = edges.sparkSession
    import spark.implicits._
    val perLandmark = landmarks.distinct.sorted.map { l =>
      val src = Seq(l).toDF("node")
      shortestPaths(edges, srcCol, dstCol, wCol, src, "node", rounds)
        .filter(col("dist") > 0)
        .groupBy(col("dist")).agg(count(lit(1)).as("_c"))
        .agg(coalesce(sum(col("_c")), lit(0L)).as("n_reached"),
          coalesce(aggregate(
            sort_array(collect_list(struct(col("dist"), col("_c")))),
            lit(0.0),
            (acc, t) => acc + t("_c").cast("double") / t("dist").cast("double")),
            lit(0.0)).as("harmonic_w"))
        .select(lit(l).as("landmark"), col("n_reached"), col("harmonic_w"))
    }
    perLandmark.reduce(_.unionByName(_))
  }

  /** Synchronous label propagation community detection (Raghavan et al.,
    * "Near linear time algorithm to detect community structures in
    * large-scale networks", Phys. Rev. E 2007), made DETERMINISTIC: every
    * node starts with its own id as label; each round every node adopts
    * the most frequent label among its neighbors, ties broken by the
    * SMALLEST label (the original's random tie-break is replaced so two
    * engines replaying the rounds agree exactly), all nodes updating
    * simultaneously from the previous round's labels. Runs a FIXED
    * `iters` rounds — the async/convergence variant is
    * non-deterministic by construction and cannot be oracle-gated.
    *
    * Input is undirected: edges are symmetrized, nulls/self-loops
    * dropped, parallel edges collapsed. Labels inherit the node id type
    * (any orderable key).
    *
    * Output: `(node, label)` — nodes sharing a label after the fixed
    * rounds are one detected community.
    *
    * Scale shape: per round, ONE labels⋈edges shuffle join on the
    * neighbor key + a map-side-combined (node, label) count + a
    * per-node argmax as `min(struct(−count, label))` — an aggregate,
    * NEVER a per-node sort window; a celebrity node is a heavy reduce
    * key with partial aggregation, not a single-task sort. Labels are
    * localCheckpoint'd per round so lineage stays flat. */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
                       iters: Int = 3,
                       wCol: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters ($iters) must be >= 1")
    val reserved = Seq("_a", "_b", "_l", "_c", "_m", "_w", "node", "label")
    require(!edges.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    // WEIGHTED variant (wCol): a node adopts the label with the largest
    // incident WEIGHT sum instead of the largest neighbor count —
    // Raghavan et al.'s §IV weighted form. The family contract holds:
    // weights are positive integers guarded in-plan (a NULL/zero weight
    // would silently vanish from the sum), parallel edges SUM, and
    // symmetrization sums both directions; exact decimal(38,0) keeps the
    // argmax bit-replayable. Unweighted keeps the original count
    // expressions verbatim — w ≡ 1 over distinct edges reduces to it.
    val sym = (wCol match {
      case None =>
        val half = edges
          .select(col(aCol).as("_a"), col(bCol).as("_b"))
          .filter(col("_a").isNotNull && col("_b").isNotNull &&
            col("_a") =!= col("_b"))
        half
          .union(half.select(col("_b").as("_a"), col("_a").as("_b")))
          .distinct()
      case Some(c) =>
        val half = edges
          .filter(assert_true(col(c) >= 1,
            lit(s"labelPropagation: $c must be a positive integer weight")).isNull)
          .select(col(aCol).as("_a"), col(bCol).as("_b"),
            col(c).cast("decimal(38,0)").as("_w"))
          .filter(col("_a").isNotNull && col("_b").isNotNull &&
            col("_a") =!= col("_b"))
        half
          .union(half.select(col("_b").as("_a"), col("_a").as("_b"), col("_w")))
          .groupBy("_a", "_b").agg(sum(col("_w")).as("_w"))
    }).localCheckpoint(true)
    val nodes = sym.select(col("_a").as("node"))
      .distinct().localCheckpoint(true)
    var lbl = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val counts = sym
        .join(lbl.select(col("node").as("_b"), col("label").as("_l")),
          Seq("_b"))
        .groupBy(col("_a"), col("_l"))
        .agg((wCol match {
          case None => count(lit(1))
          case Some(_) => sum(col("_w"))
        }).as("_c"))
      lbl = counts
        .groupBy(col("_a"))
        .agg(min(struct((-col("_c")).as("nc"), col("_l").as("l"))).as("_m"))
        .select(col("_a").as("node"), col("_m.l").as("label"))
        .localCheckpoint(false)
    }
    lbl
  }

  /** Louvain community detection, level-1 local-move phase (Blondel,
    * Guillaume, Lambiotte & Lefebvre, "Fast unfolding of communities in
    * large networks", J. Stat. Mech. 2008), made DETERMINISTIC and
    * synchronous so two engines replaying the rounds agree exactly:
    * every node starts in its own community; each round every node
    * simultaneously evaluates, against the PREVIOUS round's assignment,
    * the modularity gain of moving to each neighboring community and
    * takes the best strictly-positive move (ties → smallest target
    * label). The gain is kept in EXACT integers — scaled by 2m² it is
    *   `gain·2m² = 2m·(k_{i,C} − k_{i,c\i}) − k_i·(Σtot_C − Σtot_{c\i})`
    * (k_{i,C} = weight from i into C, Σtot_C = total degree of C,
    * `c\i` = i's current community with i removed) — every term a
    * product of exact counts, so the argmax is bit-replayable with no
    * float anywhere.
    *
    * Synchronous updates can 2-cycle when two mutually-adjacent
    * singletons each see the other as the best move (the classic swap
    * oscillation); the published fix is Lu, Halappanavar &
    * Kalyanaraman's singleton minimum-label heuristic ("Parallel
    * heuristics for scalable community detection", Parallel Computing
    * 2015, §4.1): a singleton may move into another SINGLETON community
    * only when the target label is smaller than its own. Non-singleton
    * moves are unrestricted.
    *
    * Runs a FIXED `rounds` rounds (convergence probes are
    * non-replayable); final communities are relabeled canonically by
    * their minimum member so the output is layout-independent. Weighted
    * edges (`wCol`) support the multi-level composition: feed
    * [[louvainCoarsen]]'s super-graph (weights + self-loops) back in
    * for level 2. Self-loops contribute 2w to their node's degree and
    * never to any gain (moving a node carries its self-loop along —
    * the Blondel et al. convention).
    *
    * Output: `(node, label)`, label = the community's minimum member.
    *
    * Scale shape (the [[labelPropagation]] discipline): per round, ONE
    * edges⋈labels shuffle for the (node, neighbor-community) weights, a
    * community-sized Σtot aggregation, and a per-node argmax as
    * `min(struct(−gain, C))` — an aggregate, never a per-node sort
    * window; labels are localCheckpoint'd per round so lineage stays
    * flat. 2m is ONE scalar collected once (exact long; the decimal
    * accumulation fails loudly on overflow, never wraps). */
  def louvainMoveRounds(edges: DataFrame, aCol: String, bCol: String,
                        rounds: Int = 3,
                        wCol: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds ($rounds) must be >= 1")
    val reserved = Seq("_a", "_b", "_w", "_k", "_l", "_c", "_t", "_s",
      "node", "label")
    require(!edges.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    val d38 = "decimal(38,0)"
    val w = wCol.map(c => col(c).cast(d38)).getOrElse(lit(1L).cast(d38))
    // canonical weighted edges: parallel edges collapse by SUMMING weight
    // (unweighted input: multiplicity), self-loops kept separately for
    // degrees only
    val canon = edges
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(least(col(aCol), col(bCol)).as("_a"),
        greatest(col(aCol), col(bCol)).as("_b"), w.as("_w"))
      .groupBy("_a", "_b").agg(sum(col("_w")).as("_w"))
      .localCheckpoint(true)
    val nonLoop = canon.filter(col("_a") =!= col("_b"))
    // pre-partitioned on the JOIN key before the checkpoint (guide §2.4:
    // two operations keyed the same way share one exchange): every round's
    // edges⋈labels join then reuses this layout instead of re-shuffling the
    // EDGE-SIZED table once per round — the one remaining edge-sized
    // exchange per round is the (node, neighbor-community) aggregation.
    val sym = nonLoop
      .union(nonLoop.select(col("_b").as("_a"), col("_a").as("_b"),
        col("_w")))
      .repartition(col("_b"))
      .localCheckpoint(true)
    // k_i = Σ incident weight + 2·self-loop weight
    val deg = sym.select(col("_a").as("node"), col("_w"))
      .union(canon.filter(col("_a") === col("_b"))
        .select(col("_a").as("node"), (col("_w") * 2).as("_w")))
      .groupBy("node").agg(sum(col("_w")).as("_k"))
      .localCheckpoint(true)
    // 2m = Σ k_i: exact decimal, surfaced as long (fails loudly past
    // 2⁶³ — ~4.6e18 total weight, far beyond any real corpus graph)
    val m2 = deg.agg(coalesce(sum(col("_k")), lit(0L).cast(d38))
      .cast("long")).collect()(0).getLong(0)
    // labels CARRY k_i across rounds: Σtot and the per-node self-view
    // otherwise each re-join deg every round (two node-sized shuffles a
    // round, removed outright — guide §2.4)
    var lbl = deg.select(col("node"), col("node").as("label"), col("_k"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      // Σtot + size per community, under the previous round's labels
      val tot = lbl
        .groupBy(col("label")).agg(sum(col("_k")).as("_t"),
          count(lit(1)).as("_s"))
      // weight from each node into each neighboring community
      val kic = sym
        .join(lbl.select(col("node").as("_b"), col("label").as("_l")),
          Seq("_b"))
        .groupBy(col("_a"), col("_l")).agg(sum(col("_w")).as("_w"))
      // per-node view of its own community: k_i, Σtot_own, size_own,
      // k_{i,own} (0 when i has no intra-community edge)
      val self = lbl
        .join(tot, Seq("label"))
        .join(kic.select(col("_a").as("node"), col("_l").as("label"),
          col("_w").as("_wown")), Seq("node", "label"), "left")
        .select(col("node"), col("label"), col("_k"),
          col("_t").as("_town"), col("_s").as("_sown"),
          coalesce(col("_wown"), lit(0L).cast(d38)).as("_wcur"))
      // join order: candidate-community Σtot first (tot is partitioned on
      // its grouping key — exchange reused), the node-keyed self-view
      // second, so the final per-node argmax groups on the join key it
      // already has — no extra exchange between the join and the argmax
      val best = kic
        .join(tot.select(col("label").as("_l"), col("_t").as("_tc"),
          col("_s").as("_sc")), Seq("_l"))
        .join(self.withColumnRenamed("node", "_a"), Seq("_a"))
        .filter(col("_l") =!= col("label"))
        .select(col("_a"), col("_l"),
          (lit(m2).cast(d38) * (col("_w") - col("_wcur"))
            - col("_k") * (col("_tc") - (col("_town") - col("_k"))))
            .as("_g"),
          col("_sown"), col("_sc"), col("label"))
        // strictly-positive gain, singleton→singleton only downhill in
        // label space (the Lu et al. swap guard)
        .filter(col("_g") > 0 &&
          !(col("_sown") === 1L && col("_sc") === 1L &&
            col("_l") > col("label")))
        .groupBy(col("_a"))
        .agg(min(struct((-col("_g")).as("ng"), col("_l").as("l"))).as("_m"))
        .select(col("_a").as("node"), col("_m.l").as("_lnew"))
      lbl = lbl.join(best, Seq("node"), "left")
        .select(col("node"), coalesce(col("_lnew"), col("label")).as("label"),
          col("_k"))
        .localCheckpoint(false)
    }
    // canonical relabel: each community named by its minimum member
    val canonLbl = lbl.groupBy(col("label"))
      .agg(min(col("node")).as("_c"))
    lbl.join(canonLbl, Seq("label"))
      .select(col("node"), col("_c").as("label"))
  }

  /** Louvain phase-2 graph coarsening (Blondel et al. 2008): collapse
    * each community of `labels` to one super-node; inter-community
    * edge weights SUM, intra-community weight becomes the super-node's
    * self-loop. Feeding the result back into [[louvainMoveRounds]]
    * (with `wCol = Some("weight")`) is one full Louvain level; the
    * caller composes levels and carries the node→community membership
    * map. Input edges are canonicalized like [[louvainMoveRounds]]
    * (null endpoints dropped, parallel edges summed); nodes missing
    * from `labels` fail loudly (a partial partition would mis-wire the
    * super-graph).
    *
    * Output: `(a, b, weight)` canonical (a ≤ b; a = b is a self-loop).
    *
    * Scale shape: two label-map joins over the edge list + one
    * community²-bounded rollup — no driver-side state. */
  /** Full multi-level Louvain (Blondel et al. 2008): alternate
    * [[louvainMoveRounds]] (local moves) and [[louvainCoarsen]] (collapse
    * communities to super-nodes) for a FIXED `levels` levels. The second
    * level is what makes this a modularity ASCENT in practice: a set of
    * communities the node-at-a-time dynamics cannot improve can still
    * merge pairwise once each community is a super-node — on a dense
    * structureless graph the level-1 moves can even land below Q = 0,
    * and level 2 is what merges the fragments back out of the hole
    * (measured on the sf0.01 co-supplier graph: level 1 alone
    * Q = −0.0113, with level 2 Q = 0 — the optimum for that graph).
    *
    * Labels compose canonically: each level names communities by their
    * minimum member, so the final label is the minimum ORIGINAL node id
    * of the merged community — layout- and level-independent.
    *
    * Output: `(node, label)` over the original node ids.
    *
    * Scale shape: level ≥ 2 runs on the community graph (≤ communities²
    * edges, usually tiny); all heavy lifting is level 1's edge-sized
    * joins, which [[louvainMoveRounds]] documents. */
  def louvain(edges: DataFrame, aCol: String, bCol: String,
              levels: Int = 2, rounds: Int = 3,
              wCol: Option[String] = None): DataFrame = {
    require(levels >= 1, s"levels ($levels) must be >= 1")
    // weighted input (wCol): parallel edges SUM their weights, exactly the
    // unweighted multiplicity convention with w = 1 — Blondel et al.'s
    // weighted form is the general case, the level-2 super-graph already
    // runs it, and gains stay exact decimal(38,0) integers either way
    val w0 = wCol.map(c => col(c).cast("decimal(38,0)"))
      .getOrElse(lit(1L).cast("decimal(38,0)"))
    // same never-dropping w >= 1 contract as the rest of the weighted
    // family (pageRank/personalizedPageRank/modularityWeighted): a NULL
    // weight would silently vanish from the sum and a non-positive one
    // corrupts the gain arithmetic — both fail LOUDLY in-plan instead.
    val guarded = wCol match {
      case Some(c) => edges.filter(assert_true(col(c) >= 1,
        lit(s"louvain: $c must be a positive integer weight")).isNull)
      case None => edges
    }
    var g = guarded
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"),
        w0.as("weight"))
      .groupBy("a", "b").agg(sum(col("weight")).as("weight"))
      // checkpointed like every later level's coarsened graph: level 1's g
      // otherwise re-derives the caller's (possibly join-heavy) edge
      // lineage once for the move rounds AND once for the coarsening
      .localCheckpoint(false)
    var membership: DataFrame = null
    for (_ <- 1 to levels) {
      // one materialization feeds the membership compose AND the coarsen
      // (its total-partition check plus two label joins)
      val lbl = louvainMoveRounds(g, "a", "b", rounds, wCol = Some("weight"))
        .localCheckpoint(false)
      membership =
        if (membership == null) lbl
        else membership
          .join(lbl.select(col("node").as("label"), col("label").as("_l2")),
            Seq("label"))
          .select(col("node"), col("_l2").as("label"))
      membership = membership.localCheckpoint(false)
      g = louvainCoarsen(g, "a", "b", lbl, "node", "label",
        wCol = Some("weight"))
        .select(col("a"), col("b"), col("weight"))
        .localCheckpoint(false)
    }
    membership
  }

  /** Landmark betweenness centrality (Brandes, J. Math. Sociol. 2001's
    * dependency accumulation, restricted to a pivot set per Brandes &
    * Pich, "Centrality Estimation in Large Networks", 2007): for each
    * landmark s, a level-synchronous BFS computes exact shortest-path
    * counts σ_s(v) (integers — sums over predecessors), then the
    * backward pass folds dependencies level by level:
    *
    *   δ_s(v) = Σ_{w ∈ succ(v)} (σ_s(v)/σ_s(w)) · (1 + δ_s(w))
    *
    * and the reported score is Σ_s δ_s(v) — the exact betweenness when
    * `landmarks` is every vertex, the Brandes–Pich estimator (up to
    * their n/k rescale, left to the caller) otherwise. Paths longer
    * than `maxHops` are excluded — the bounded-BFS truncation
    * [[harmonicCentrality]] already trades on; document the bound when
    * quoting scores.
    *
    * Determinism: σ is exact integer; each δ fold orders its successor
    * terms by node id, and the cross-landmark sum orders by landmark id
    * — fixed IEEE chains both ends, no rounding anywhere. The σ ratio
    * divides two exact longs (keep graphs with > 2⁵³ shortest paths to
    * a landmark out — that is astronomically beyond any real corpus
    * graph at maxHops ≤ 4).
    *
    * Scale shape: ALL landmarks run in one batched pass keyed by
    * (landmark, node) — maxHops forward rounds (one edges⋈frontier
    * shuffle each, map-side-combined σ sums, anti-join against the
    * visited set) and maxHops backward rounds (one edges⋈level join
    * each), every round checkpointed so lineage stays hop-bounded.
    * State is the visited set: O(k · reachable), never the graph ×
    * graph product. A celebrity hub inflates one frontier round's
    * fan-out, which AQE splits — there is no per-node neighborhood²
    * term anywhere.
    *
    * Output: `(node, n_landmarks, betweenness)` — nodes at 1..maxHops
    * from ≥ 1 landmark (landmarks score through OTHER landmarks' BFS
    * trees only, per the v ≠ s convention); `n_landmarks` counts the
    * landmarks whose tree reached the node. A landmark absent from the
    * graph contributes nothing. */
  def betweennessFromLandmarks(edges: DataFrame, aCol: String, bCol: String,
                               landmarks: Seq[Long],
                               maxHops: Int = 4): DataFrame = {
    require(landmarks.nonEmpty, "at least one landmark is required")
    require(maxHops >= 1, s"maxHops ($maxHops) must be >= 1")
    val reserved = Seq("_cu", "_cv", "_s", "_d", "_lm", "_lmw", "_w", "_sw",
      "_dw", "node", "sigma")
    require(!edges.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    val spark = edges.sparkSession
    import spark.implicits._
    val canon = edges
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(least(col(aCol), col(bCol)).as("_cu"),
        greatest(col(aCol), col(bCol)).as("_cv"))
      .filter(col("_cu") =!= col("_cv"))
      .distinct()
    val adj = canon.select(col("_cu").as("_s"), col("_cv").as("_d"))
      .unionByName(canon.select(col("_cv").as("_s"), col("_cu").as("_d")))
      .localCheckpoint(false)
    val lvl = new scala.collection.mutable.ArrayBuffer[DataFrame]()
    lvl += landmarks.distinct.sorted.toDF("_lm")
      .select(col("_lm"), col("_lm").as("node"), lit(1L).as("sigma"))
      .localCheckpoint(false)
    var visited = lvl(0)
    for (h <- 1 to maxHops) {
      val next = lvl(h - 1).join(adj, col("node") === col("_s"))
        .groupBy(col("_lm"), col("_d").as("node"))
        .agg(sum(col("sigma")).as("sigma"))
        .join(visited.select("_lm", "node"), Seq("_lm", "node"), "left_anti")
        .localCheckpoint(false)
      lvl += next
      visited = visited.unionByName(next).localCheckpoint(false)
    }
    // backward accumulation: δ at the deepest level is 0; each level's δ
    // folds (σv/σw)·(1+δw) over its dist+1 successors in node-id order
    val delta = new Array[DataFrame](maxHops + 1)
    delta(maxHops) = lvl(maxHops)
      .select(col("_lm"), col("node"), col("sigma"), lit(0.0).as("_delta"))
    for (h <- (maxHops - 1) to 0 by -1) {
      val succ = delta(h + 1).select(col("_lm").as("_lmw"),
        col("node").as("_w"), col("sigma").as("_sw"), col("_delta").as("_dw"))
      val folded = lvl(h).join(adj, col("node") === col("_s"))
        .join(succ, col("_d") === col("_w") && col("_lm") === col("_lmw"))
        .groupBy(col("_lm"), col("node"))
        .agg(aggregate(
          sort_array(collect_list(struct(col("_w"),
            ((col("sigma").cast("double") / col("_sw").cast("double")) *
              (lit(1.0) + col("_dw"))).as("_x")))),
          lit(0.0), (a, s) => a + s("_x")).as("_dnew"))
      delta(h) = lvl(h)
        .join(folded, Seq("_lm", "node"), "left")
        .select(col("_lm"), col("node"), col("sigma"),
          coalesce(col("_dnew"), lit(0.0)).as("_delta"))
        .localCheckpoint(false)
    }
    (1 to maxHops).map(delta(_)).reduce(_.unionByName(_))
      .groupBy("node")
      .agg(count(lit(1)).as("n_landmarks"),
        aggregate(
          sort_array(collect_list(struct(col("_lm"), col("_delta").as("_x")))),
          lit(0.0), (a, s) => a + s("_x")).as("betweenness"))
  }

  /** Neighborhood-overlap link prediction (Liben-Nowell & Kleinberg
    * CIKM'03; resource allocation: Zhou, Lü & Zhang 2009) — score
    * NON-edges (u, w) by the neighbors they share:
    *
    *   cn          = |Γ(u) ∩ Γ(w)|                 (common neighbors)
    *   jaccard_e12 = ⌊10¹²·cn / (deg_u + deg_w − cn)⌋
    *   ra_e12      = Σ_{v ∈ Γ(u)∩Γ(w)} ⌊10¹²/deg_v⌋ (resource allocation)
    *
    * Adamic–Adar is RA with ln(deg_v) in the denominator; RA is kept as
    * the exact-integer member of the family (no transcendental seam) and
    * empirically the stronger predictor (Zhou et al.).
    *
    * Candidate pairs are generated as open wedges through their shared
    * KEPT centers, so the output is the non-edge pairs witnessed by ≥
    * `minCommon` centers under the cap (with no cap biting, exactly the
    * non-edge pairs with cn ≥ minCommon); nothing is ever scored against
    * the whole vertex set.
    *
    * Scale shape: the wedge self-join fans out deg(v)² per center v — a
    * celebrity hub would dominate the whole job, so centers with deg >
    * `maxCenterDegree` are dropped WHOLE (the q217 itemNeighbors cap
    * discipline: a 10⁸-degree hub's wedge set is ~10¹⁶ pairs of mostly
    * meaningless weak ties; its endpoints still pair through their other,
    * bounded-degree shared neighbors — but cn/ra then UNDERCOUNT paths
    * through dropped hubs, which the caller prices via the cap).
    * ra_e12 sums in decimal(38,0) and lands as a long — exact while
    * cn < 2·10⁷ (each term ≤ 5·10¹¹), far above any sane cap regime.
    * Everything else is key-partitioned: one degree aggregation
    * (map-side combined), the wedge join on the center id
    * (AQE-splittable), the (u, w) score rollup (map-side combined), one
    * anti-join against the edge set at pair cardinality, two degree
    * joins at node cardinality. No windows, no driver state.
    *
    * Degrees (and the jaccard denominator) are computed on the FULL
    * cleaned graph — the cap only limits which wedges generate
    * candidates, never a node's own degree. ra_e12 is a decimal(38,0)
    * sum (a pair sharing 2·10⁷ neighbors would overflow a long).
    * Output: `(u, w, cn, deg_u, deg_w, jaccard_e12, ra_e12)`, u < w. */
  def linkPrediction(edges: DataFrame, aCol: String, bCol: String,
                     maxCenterDegree: Int = 256,
                     minCommon: Long = 2L): DataFrame = {
    require(maxCenterDegree >= 2, s"maxCenterDegree ($maxCenterDegree) must be >= 2")
    require(minCommon >= 1L, s"minCommon ($minCommon) must be >= 1")
    val reserved = Seq("_u", "_v", "_c", "_n", "_a", "_b", "_dc", "_pu",
      "_pv", "node", "cn")
    require(!edges.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    val canon = edges
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(least(col(aCol), col(bCol)).as("_u"),
        greatest(col(aCol), col(bCol)).as("_v"))
      .filter(col("_u") =!= col("_v"))
      .distinct()
    val deg = canon
      .select(explode(array(col("_u"), col("_v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("_deg"))
    val adj = canon.select(col("_u").as("_c"), col("_v").as("_n"))
      .unionByName(canon.select(col("_v").as("_c"), col("_u").as("_n")))
    val centers = adj
      .join(deg.select(col("node").as("_c"), col("_deg").as("_dc"))
        .filter(col("_deg") <= maxCenterDegree), "_c")
    val pairs = centers.select(col("_c"), col("_dc"), col("_n").as("_a"))
      .join(centers.select(col("_c"), col("_n").as("_b")), "_c")
      .filter(col("_a") < col("_b"))
    // integral DIV throughout: `/` on longs is DOUBLE division in Spark,
    // and a decimal cast would round HALF_UP — both cross-engine seams;
    // Spark DIV and DuckDB integer // both truncate toward zero
    // (-7 // 2 = -3 in DuckDB too), so they agree on ALL signs — and the
    // operands here are non-negative anyway
    val scored = pairs
      .groupBy(col("_a").as("_pu"), col("_b").as("_pv"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("CAST(1000000000000 DIV _dc AS DECIMAL(38,0))"))
          .as("ra_e12"))
      .filter(col("cn") >= minCommon)
    scored
      .join(canon.select(col("_u").as("_pu"), col("_v").as("_pv")),
        Seq("_pu", "_pv"), "left_anti")
      .join(deg.select(col("node").as("_pu"), col("_deg").as("deg_u")), "_pu")
      .join(deg.select(col("node").as("_pv"), col("_deg").as("deg_w")), "_pv")
      .select(col("_pu").as("u"), col("_pv").as("w"), col("cn"),
        col("deg_u"), col("deg_w"),
        expr("CAST(CAST(cn AS DECIMAL(38,0)) * 1000000000000" +
          " DIV CAST(deg_u + deg_w - cn AS DECIMAL(38,0)) AS BIGINT)")
          .as("jaccard_e12"),
        col("ra_e12").cast("long").as("ra_e12"))
  }

  def louvainCoarsen(edges: DataFrame, aCol: String, bCol: String,
                     labels: DataFrame, nodeCol: String, labelCol: String,
                     wCol: Option[String] = None): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = wCol.map(c => col(c).cast(d38)).getOrElse(lit(1L).cast(d38))
    val canon = edges
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(least(col(aCol), col(bCol)).as("_u"),
        greatest(col(aCol), col(bCol)).as("_v"), w.as("_w"))
      .groupBy("_u", "_v").agg(sum(col("_w")).as("_w"))
      // consumed twice (total-partition check + the label joins): one
      // materialization instead of two executions of the edge lineage
      .localCheckpoint(false)
    val lbl = labels.select(col(nodeCol).as("_n"), col(labelCol).as("_l"))
    val nodes = canon.select(explode(array(col("_u"), col("_v"))).as("_n"))
      .distinct()
    val missing = nodes.join(lbl, Seq("_n"), "left_anti").limit(1).collect()
    require(missing.isEmpty,
      s"node ${missing.headOption.map(_.get(0)).getOrElse("")} has no label" +
        " — coarsening needs a TOTAL partition")
    canon
      .join(lbl.select(col("_n").as("_u"), col("_l").as("_lu")), Seq("_u"))
      .join(lbl.select(col("_n").as("_v"), col("_l").as("_lv")), Seq("_v"))
      .select(least(col("_lu"), col("_lv")).as("a"),
        greatest(col("_lu"), col("_lv")).as("b"), col("_w"))
      .groupBy("a", "b").agg(sum(col("_w")).as("weight"))
  }
}
