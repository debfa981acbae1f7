package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV ("k minimum values") distinct sketches with SET-OPERATION
  * estimates — Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD 2007 (the construction behind
  * Apache DataSketches' theta sketch). A slice's sketch is the `k`
  * smallest `md5(key:domain)` values of its key set; from two sketches
  * alone — no join, no rescan — the union, intersection and Jaccard of
  * two 100 TB corpora are estimable: the k smallest hashes of A ∪ B are
  * computable from the two sketches (merge, dedup, keep k), and the
  * fraction of them present in BOTH input sketches estimates the Jaccard
  * (every union-sketch element is a uniform sample of A ∪ B).
  *
  * This closes the set-algebra gap in the sketch family: HLL (q82)
  * estimates distinct counts and unions but CANNOT intersect;
  * [[TextAnalysis.sourceOverlapMatrix]] intersects EXACTLY but joins the
  * corpora. KMV intersects from per-slice summaries a few KB wide.
  *
  * Estimators (`u_k` = the k-th smallest hash as a fraction of the hash
  * space): distinct `D ≈ (k−1)/u_k` when the sketch is full, EXACT
  * (= sketch size) below capacity; `jaccard ≈ |union-k ∩ A ∩ B| / |union-k|`;
  * `intersection ≈ jaccard · D(union-k)`. Relative error ~1/√k.
  *
  * Determinism: everything is a pure function of the data — the hashes
  * are md5 (the `Sampling.sampleKPerGroup` ordering contract: bottom-k
  * by hex string), `u_k` is an exact power-of-two division of a 52-bit
  * integer, and the estimate arithmetic is a fixed expression over exact
  * doubles — so a DuckDB oracle replays the ESTIMATES exactly, no
  * tolerance band needed. Sketch elements are the hex strings themselves
  * (lexicographic hex order == numeric hash order), making the sketches
  * engine-portable.
  *
  * Scale shape: one sketch per slice is ONE bounded-state aggregation
  * (the [[graft.functions.BottomKDistinctAgg]] ordered set, capped at k,
  * map-side partials — dedup happens inside the buffer, so there is no
  * pre-dedup shuffle); the pairwise-overlap matrix then works on
  * |slices|² sketch ROWS — a few KB each — never touching the corpus
  * again. NULL keys hash to NULL and are excluded. */
object SetSketch {

  private val TwoPow52 = 4503599627370496.0 // 2^52, exact in a double

  private def hex(key: Column, domain: String): Column =
    md5(concat(key.cast("string"), lit(":" + domain)))

  private def h1(hexCol: Column): Column = Sampling.hex52(hexCol, 1)
  private def h2(hexCol: Column): Column = Sampling.hex52(hexCol, 14)

  /** The KMV sketch of a key column as an aggregate Column: the ascending
    * array of the `k` smallest DISTINCT `md5(key:domain)` hex strings.
    * Deduplication happens INSIDE the bounded aggregation buffer
    * ([[graft.functions.BottomKDistinctAgg]]), so a grouped sketch build
    * is one aggregation with map-side partials — no pre-dedup shuffle.
    * SQL: `kmv_sketch(key, k)`. */
  def kmvSketch(key: Column, k: Int, domain: String = "kmv"): Column = {
    require(k >= 2, s"k ($k) must be >= 2")
    org.apache.spark.sql.GraftColumnBridge.column(graft.functions.BottomKDistinctAgg(
      org.apache.spark.sql.GraftColumnBridge.expression(hex(key, domain)), k)
      .toAggregateExpression())
  }

  /** Union of KMV sketches as an aggregate Column: per-slice sketches
    * roll up to the sketch of the union without touching the data again
    * (merge, dedup, keep k — Beyer et al. §4). SQL: `kmv_merge(kmv, k)`. */
  def kmvMerge(sketch: Column, k: Int): Column = {
    require(k >= 2, s"k ($k) must be >= 2")
    org.apache.spark.sql.GraftColumnBridge.column(graft.functions.BottomKDistinctAgg(
      org.apache.spark.sql.GraftColumnBridge.expression(sketch), k, mergeArrays = true)
      .toAggregateExpression())
  }

  /** Per-group KMV sketch: the group columns + `kmv`, the ascending array
    * of the `k` smallest DISTINCT `md5(key:domain)` hex strings
    * ([[kmvSketch]] applied per group — one aggregation, bounded
    * buffers, duplicates never occupy sketch slots). */
  def kmvPerGroup(df: DataFrame, groupCols: Seq[String], keyCol: String,
                  k: Int, domain: String = "kmv"): DataFrame = {
    require(!groupCols.contains("kmv") && keyCol != "kmv",
      "group/key columns must not use the reserved output name kmv")
    df.groupBy(groupCols.map(col): _*)
      .agg(kmvSketch(col(keyCol), k, domain).as("kmv"))
  }

  /** Distinct-count estimate of a [[kmvPerGroup]] sketch column: exact
    * size below capacity `k`, else `(k−1)/u_k` — deterministic (u_k is an
    * exact 52-bit integer over 2^52). */
  def kmvDistinct(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (h1(element_at(kmv, k)).cast("double") / lit(TwoPow52)))

  /** Pairwise overlap estimates from per-group sketches: for every
    * unordered pair of groups `(a, b)` with `a < b` by the group key,
    * `(ga, gb, est_distinct_a, est_distinct_b, est_jaccard,
    * est_intersect)` — all rounded to 4 decimals, all computed from the
    * two sketch rows alone. `groupCol` must be a single column here (the
    * pair matrix needs a scalar key to order the pairs). */
  def kmvOverlapMatrix(sketches: DataFrame, groupCol: String,
                       k: Int): DataFrame = {
    val a = sketches.select(col(groupCol).as("ga"), col("kmv").as("ka"))
    val b = sketches.select(col(groupCol).as("gb"), col("kmv").as("kb"))
    a.join(b, col("ga") < col("gb"))
      .select(col("ga"), col("gb"), col("ka"), col("kb"),
        slice(array_sort(array_distinct(concat(col("ka"), col("kb")))),
          1, k).as("mk"))
      .select(col("ga"), col("gb"),
        round(kmvDistinct(col("ka"), k), 4).as("est_distinct_a"),
        round(kmvDistinct(col("kb"), k), 4).as("est_distinct_b"),
        col("mk"),
        when(size(col("mk")) > 0, // both slices empty -> no estimate
          size(filter(col("mk"), e =>
            array_contains(col("ka"), e) && array_contains(col("kb"), e)))
            .cast("double") / size(col("mk")).cast("double")).as("_rho"))
      .select(col("ga"), col("gb"),
        col("est_distinct_a"), col("est_distinct_b"),
        round(col("_rho"), 4).as("est_jaccard"),
        round(col("_rho") * kmvDistinct(col("mk"), k), 4)
          .as("est_intersect"))
  }

  /** Shared row hash of the count-min pair: depth-salted md5 → 32-bit
    * integer → bucket. */
  private def cmsBucket(key: Column, depthCol: Column, width: Int,
                        domain: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(s":$domain:"),
      depthCol.cast("string"))), 1, 8), 16, 10).cast("long") % width

  /** Count-min sketch TABLE (Cormode & Muthukrishnan, "An improved data
    * stream summary: the count-min sketch and its applications",
    * J. Algorithms 2005) built relationally: one row per (depth, bucket)
    * with the exact collision-bucket count — `depth × width` rows total,
    * a few KB summarizing any key cardinality. Mergeable by construction
    * (same-(depth,bucket) rows ADD — build per partition/day and sum),
    * the frequency companion to the KMV/HLL distinct sketches.
    *
    * Relationship to [[graft.functions.Sketches.countMin]]: that is the
    * STREAMING form — an O(depth·width) TypedImperativeAggregate over
    * xxhash64, usable inside watermarked windows but spec-only (xxhash64
    * has no cross-engine twin). This relational form rides the md5 lane
    * so a DuckDB oracle replays the table integer-for-integer — it is
    * what gives the count-min family its CORRECTNESS row (q256), the
    * same upgrade q238 gave the streaming family.
    *
    * Determinism: buckets come from depth-salted md5 (the repo's grid
    * idiom), counts are exact longs — an engine replaying the same
    * hashes reproduces the table integer-for-integer.
    *
    * Scale shape: a map-only depth-explode (×depth rows) into ONE
    * map-side-combined aggregation of bounded (depth × width)
    * cardinality — heavy keys are heavy reduce keys, absorbed by
    * partial aggregation; output size is independent of input size. */
  def cmsTable(df: DataFrame, keyCol: String, depth: Int = 4,
               width: Int = 64, domain: String = "cms"): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth ($depth) out of range")
    require(width >= 2, s"width ($width) must be >= 2")
    df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("_k"),
        explode(array((0 until depth).map(lit): _*)).as("depth"))
      .select(col("depth"),
        cmsBucket(col("_k"), col("depth"), width, domain).as("bucket"))
      .groupBy("depth", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a [[cmsTable]]: for each query key,
    * `estimate = min over depths of its bucket count` — the classic
    * one-sided bound (estimate ≥ true count, over-estimation bounded by
    * the collision mass e·N/width with probability 1 − e^−depth). The
    * (depth, width, domain) triple MUST match the build. Keys hashing
    * to empty buckets estimate 0.
    *
    * Scale shape: the query-key side explodes ×depth and joins the
    * bounded sketch table (broadcast-sized by construction); the min is
    * a per-key aggregate. */
  def cmsEstimate(cms: DataFrame, keys: DataFrame, keyCol: String,
                  depth: Int, width: Int,
                  domain: String = "cms"): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth ($depth) out of range")
    keys.filter(col(keyCol).isNotNull).select(col(keyCol)).distinct()
      .select(col(keyCol),
        explode(array((0 until depth).map(lit): _*)).as("depth"))
      .select(col(keyCol), col("depth"),
        cmsBucket(col(keyCol), col("depth"), width, domain).as("bucket"))
      .join(broadcast(cms), Seq("depth", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("estimate"))
  }
}
