package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - brute force: broadcast the (small) query set against the corpus, score
  *    every pair, per-query top-k via a window. Exact; the oracle baseline.
  *    At 100 TB the corpus side stays partition-parallel and the only
  *    shuffle is the final per-query top-k (rows ≤ corpus, cut to k early
  *    by scoring in the map stage).
  *  - random-hyperplane LSH: per-row signed projection onto h deterministic
  *    pseudo-random hyperplanes → bucket id; queries probe only their own
  *    bucket. Bucketing is a single shuffle on the bucket key; recall is
  *    traded via `planes`. Hyperplane weights derive from xxhash64(plane,
  *    dim) so both engines (and reruns) see identical planes — no RNG state.
  */
object Similarity {

  /** Exact per-query top-k by cosine. `queries` must carry (query_id,
    * query_vec). Rank order is reproducible across engines because the
    * score doubles are bit-identical (VecDot folds left-to-right like the
    * oracle's list_inner_product); ties break on corpus id. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, k: Int): DataFrame = {
    // norms are precomputed per side (below the join), so each pair costs
    // exactly one codegen'd dot product; score = dot/(na*nb) keeps the
    // oracle's operation order bit-for-bit
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      l2Norm(col(vecCol)).as("c_norm"))
    val q = queries.select(col("query_id"), col("query_vec"),
      l2Norm(col("query_vec")).as("q_norm"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("c_vec"), col("query_vec")) / (col("c_norm") * col("q_norm"))).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Deterministic hyperplane weight for (plane, dim): xxhash64 folded into
    * [-1, 1). Same formula is reproducible anywhere — no fitted model. */
  private def planeWeight(plane: Int, dim: Column): Column =
    pmod(xxhash64(lit(plane) * 100000 + dim), lit(2000001L)).cast("double") / 1000000.0 - 1.0

  /** Signed-projection LSH bucket id over `planes` hyperplanes. */
  def lshBucket(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeWeight(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k: candidates are corpus rows sharing the query's LSH bucket;
    * exact cosine re-rank within the bucket. Returns the same schema as
    * [[bruteForceTopK]] (a query whose bucket has < k members returns fewer
    * rows — the recall/latency tradeoff made explicit). */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, k: Int, planes: Int = 8): DataFrame = {
    val bucketed = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      l2Norm(col(vecCol)).as("c_norm"), lshBucket(col(vecCol), planes).as("bucket"))
    val q = queries.select(col("query_id"), col("query_vec"),
      l2Norm(col("query_vec")).as("q_norm"), lshBucket(col("query_vec"), planes).as("bucket"))
    val scored = bucketed.join(broadcast(q), Seq("bucket"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("c_vec"), col("query_vec")) / (col("c_norm") * col("q_norm"))).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Sign-bit binary quantization: `vec` → `ceil(dims/64)` packed longs,
    * bit d set iff `vec[d] >= 0` (zero counts as positive — one fixed,
    * engine-agnostic rule). The 1-bit code of a float32 embedding is 32×
    * smaller, which is the whole point at 100 TB: a full-corpus Hamming
    * scan reads ~3% of the bytes a float scan reads. */
  def signBits(vec: Column): Column =
    transform(sequence(lit(0), ((size(vec) - lit(1)) / 64).cast("int")), w =>
      aggregate(
        sequence(w * 64, least(w * 64 + 63, size(vec) - 1)),
        lit(0L),
        (acc, d) => when(element_at(vec, d + 1) >= 0,
          acc.bitwiseOR(call_function("shiftleft", lit(1L),
            (d % 64).cast("int")))).otherwise(acc)))

  /** Binary-quantized ANN (the vector-DB "BQ" serving mode): Hamming
    * distance over [[signBits]] codes picks a `shortlistFactor·k`
    * shortlist per query (ties on neighbor_id), exact cosine re-ranks
    * the shortlist — same output schema as [[bruteForceTopK]].
    *
    * Scale shape vs the alternatives: like brute force this SCANS the
    * corpus per query batch (no index build, no recall cliff from a
    * bucketing choice), but each candidate pair costs `dims/64`
    * XOR+popcounts on packed longs instead of `dims` multiply-adds, and
    * the float vectors are touched only for the shortlist — the
    * memory-bandwidth profile that makes BQ the default first-stage
    * filter in embedding stores. Hamming of sign bits approximates
    * angle (it IS 1-bit SimHash); the exact re-rank restores precision
    * within the shortlist, and recall is tunable via `shortlistFactor`
    * with zero rebuild. */
  def hammingTopK(corpus: DataFrame, idCol: String, vecCol: String,
                  queries: DataFrame, k: Int,
                  shortlistFactor: Int = 4): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    require(shortlistFactor >= 1,
      s"shortlistFactor ($shortlistFactor) must be >= 1")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      l2Norm(col(vecCol)).as("c_norm"), signBits(col(vecCol)).as("c_bits"))
    val q = queries.select(col("query_id"), col("query_vec"),
      l2Norm(col("query_vec")).as("q_norm"), signBits(col("query_vec")).as("q_bits"))
    val ham = c.crossJoin(broadcast(q))
      .withColumn("_h", aggregate(
        zip_with(col("c_bits"), col("q_bits"),
          (a, b) => bit_count(a.bitwiseXOR(b)).cast("int")),
        lit(0), (acc, x) => acc + x))
    val ws = Window.partitionBy("query_id").orderBy(col("_h"), col("neighbor_id"))
    val short = ham.withColumn("_r", row_number().over(ws))
      .filter(col("_r") <= shortlistFactor * k)
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    short.select(col("query_id"), col("neighbor_id"),
        (dot(col("c_vec"), col("query_vec")) / (col("c_norm") * col("q_norm"))).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Multiprobe [[lshTopK]]: each query probes its own bucket PLUS every
    * bucket at Hamming distance 1 (one hyperplane sign flipped) —
    * `planes + 1` probes total. Signed-projection LSH loses a true
    * neighbor exactly when some projection straddles zero between the
    * query and the neighbor, which flips one bucket bit; probing the
    * Hamming-1 shell recovers precisely those single-flip misses, the
    * dominant failure mode at moderate `planes`. Candidates are a strict
    * superset of single-probe, so recall can only improve, at ~(planes+1)×
    * the candidate cost — the classic multiprobe trade (Lv et al., VLDB
    * '07) without building extra tables.
    *
    * Scale shape: the probe fan-out rides the SMALL (broadcast query)
    * side — the corpus is still bucketed exactly once and never
    * duplicated; each (query, corpus row) pair meets at most once because
    * a corpus row has one bucket and a query's probe set is distinct. */
  def lshTopKMultiprobe(corpus: DataFrame, idCol: String, vecCol: String,
                        queries: DataFrame, k: Int, planes: Int = 8): DataFrame = {
    val bucketed = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      l2Norm(col(vecCol)).as("c_norm"), lshBucket(col(vecCol), planes).as("bucket"))
    // probe masks: 0 (home bucket) and each single-bit flip
    val masks = array((lit(0L) +: (0 until planes).map(p => lit(1L << p))): _*)
    val q = queries.select(col("query_id"), col("query_vec"),
        l2Norm(col("query_vec")).as("q_norm"),
        lshBucket(col("query_vec"), planes).as("_home"))
      .select(col("query_id"), col("query_vec"), col("q_norm"), col("_home"),
        explode(masks).as("_m"))
      .withColumn("bucket", col("_home").bitwiseXOR(col("_m")))
      .drop("_home", "_m")
    val scored = bucketed.join(broadcast(q), Seq("bucket"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("c_vec"), col("query_vec")) / (col("c_norm") * col("q_norm"))).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Embedding near-duplicate pairs, blocked by LSH bucket so the pair
    * space stays sub-quadratic — the only shape that survives a large
    * corpus. This is the APPROXIMATE path: blocking is a candidate filter,
    * so a genuine near-dup pair whose `planes`-bit LSH signatures differ
    * is not compared and not returned (reported scores are still exact
    * cosines). Callers needing more recall add planes-adjacent recall via
    * fewer `planes`, or verify through [[bruteForceTopK]] on a bounded
    * query set.
    *
    * The exact/approximate choice is deliberately NOT a boolean parameter:
    * an earlier `blocked: Boolean = true` default silently flipped call
    * sites between exact and approximate recall across versions. Use
    * [[cosineNearDupPairsExact]] explicitly for the small-data baseline. */
  def cosineNearDupPairsBlocked(corpus: DataFrame, idCol: String, vecCol: String,
                                threshold: Double, planes: Int = 8): DataFrame =
    nearDupPairs(corpus, idCol, vecCol, threshold,
      vec => lshBucket(vec, planes))

  /** Exact all-pairs embedding near-duplicates: every pair compared
    * through a single constant join key — ONE shuffle partition, O(n²)
    * pair space. Exists as the small-data differential baseline for specs
    * and bounded corpora ONLY; it cannot survive a large corpus. Use
    * [[cosineNearDupPairsBlocked]] for production paths. */
  def cosineNearDupPairsExact(corpus: DataFrame, idCol: String, vecCol: String,
                              threshold: Double): DataFrame =
    nearDupPairs(corpus, idCol, vecCol, threshold, _ => lit(0L))

  private def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                           threshold: Double, bucketOf: Column => Column): DataFrame = {
    val withKey = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      l2Norm(col(vecCol)).as("norm"), bucketOf(col(vecCol)).as("bucket"))
    val l = withKey.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"),
      col("norm").as("norm_a"))
    val r = withKey.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"),
      col("norm").as("norm_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("vec_a"), col("vec_b")) / (col("norm_a") * col("norm_b"))).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Per-group element-wise embedding centroids, emitted as one row per
    * (group, dimension) — `(keyCol, pos, c, n_vecs)` with 0-based `pos`.
    * The class-prototype computation behind label smoothing, IVF seeding
    * and embedding-space drift monitoring.
    *
    * Exactness across engines: a naive double mean is order-dependent
    * (parallel partial sums), and double→DECIMAL conversion is NOT
    * portable (engines disagree on scaled-double vs exact-BigDecimal
    * rounding — measured mismatches at scale 20). Instead each element is
    * quantized to an integer at 1/`quantScale` — `floor(v * scale + 0.5)`,
    * pure IEEE double ops that every engine computes bit-identically — and
    * the integers are summed exactly (decimal accumulator). The SUM must
    * also stay below 2^53 so its own cast back to double is exact on every
    * engine (int128→double rounding is engine-specific above that —
    * measured 1-ulp drift): with |v| ≤ vMax the default 1e10 scale is
    * exact for groups up to 2^53/(vMax·1e10) rows (~1.7M rows at vMax
    * ≈ 0.5); larger corpora lower `quantScale`. 1e-10 sits well below
    * float32 input ulp (~7e-9 at |v| ≈ 0.1), so the quantized mean is
    * numerically the mean. The final divisions are per-row double ops on
    * bit-identical values.
    *
    * Scale shape: posexplode fans each vector into (key, pos, v) rows —
    * a map stage; the one shuffle is the (key, pos)-keyed partial-sum
    * aggregate, whose result cardinality is groups × dims, independent of
    * corpus size. */
  def centroids(df: DataFrame, keyCol: String, vecCol: String,
                quantScale: Double = 1.0e10): DataFrame =
    df.select(col(keyCol), posexplode(col(vecCol)).as(Seq("pos", "_v")))
      .groupBy(col(keyCol), col("pos"))
      .agg(
        (sum(floor(col("_v").cast("double") * lit(quantScale) + lit(0.5))
            .cast("decimal(38,0)")).cast("double") /
          count(lit(1)).cast("double") / lit(quantScale)).as("c"),
        count(lit(1)).as("n_vecs"))

  /** Pairwise cosine similarity between per-group [[centroids]] — the
    * embedding-space DRIFT matrix ("how far has source B's embedding
    * distribution rotated from source A's?"), the semantic companion to
    * [[graft.operators.Profile.psiDrift]]'s per-feature view. One row
    * per unordered group pair `(key_a < key_b)` with both group sizes
    * quoted.
    *
    * Determinism: centroid elements are [[centroids]]' bit-identical
    * quantized means; the dot product and the two norms fold the
    * (groups × dims)-sized centroid table in POSITION order via one
    * sorted collect per pair — parallel double sums would be
    * order-dependent, a pos-ordered fold is not. `sqrt` is IEEE-exact;
    * degenerate all-zero centroids yield null cosine rather than NaN.
    *
    * Scale shape: [[centroids]]' one corpus-sized shuffle, then
    * everything downstream is (groups × dims)-sized — the pair join,
    * the sorted collects, the folds. At 100 TB the matrix costs one
    * pass over the vectors plus vocabulary-sized work. */
  def centroidCosineMatrix(df: DataFrame, keyCol: String, vecCol: String,
                           quantScale: Double = 1.0e10): DataFrame = {
    val c = centroids(df, keyCol, vecCol, quantScale)
      .select(col(keyCol).as("_k"), col("pos"), col("c"), col("n_vecs"))
      .localCheckpoint(false) // both sides of the pair join
    val pairs = c.select(col("_k").as("key_a"), col("pos"),
        col("c").as("_ca"), col("n_vecs").as("n_a"))
      .join(c.select(col("_k").as("key_b"), col("pos"),
        col("c").as("_cb"), col("n_vecs").as("n_b")), Seq("pos"))
      .filter(col("key_a") < col("key_b"))
    def fold(t: Column, f: (Column, Column) => Column): Column =
      aggregate(t, lit(0.0), (acc, e) => acc + f(e("_ca"), e("_cb")))
    pairs.groupBy("key_a", "key_b")
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sort_array(collect_list(struct(col("pos"), col("_ca"),
          col("_cb")))).as("_t"))
      .select(col("key_a"), col("key_b"), col("n_a"), col("n_b"),
        fold(col("_t"), (a, b) => a * b).as("_dot"),
        fold(col("_t"), (a, _) => a * a).as("_qa"),
        fold(col("_t"), (_, b) => b * b).as("_qb"))
      .select(col("key_a"), col("key_b"), col("n_a"), col("n_b"),
        when(col("_qa") === 0.0 || col("_qb") === 0.0, lit(null))
          .otherwise(col("_dot") / (sqrt(col("_qa")) * sqrt(col("_qb"))))
          .as("cosine"))
  }

  /** Dominant principal direction of an embedding corpus by POWER
    * ITERATION on the (uncentered) Gram matrix XᵀX (Mises &
    * Pollaczek-Geiringer 1929; the PCA workhorse — never materialize
    * XᵀX, only the two matvecs X(Xᵀv)), in EXACT integer fixed-point so
    * two engines replaying the rounds agree bit-for-bit:
    *   - elements quantize once: `q = floor(x·quantScale + 0.5)` (pure
    *     IEEE double ops, bit-identical everywhere);
    *   - `v₀ = vScale` on every dimension;
    *   - per round: `w_i = Σ_p q_ip·v_p` then `u_p = Σ_i w_i·q_ip`,
    *     both in decimal(38,0) — exact, order-free;
    *   - renormalize by the max component: `v′ = sign(u)·((|u|·vScale)
    *     div max|u|)` — both engines' integer division truncates toward
    *     zero (DuckDB `//` included: −7 // 2 = −3, same as Spark `div`;
    *     the cross-engine contract [[graft.operators.Trend]].holtLinear
    *     documents), so the sign-split is semantically a no-op; it is
    *     kept only so the division visibly runs on non-negative
    *     operands, independent of any engine's rounding convention.
    * A FIXED `iters` rounds (no convergence probe) keeps it bounded and
    * oracle-replayable; the max-norm scaling makes the largest |v| =
    * vScale each round, so magnitudes never drift. Degenerate all-zero
    * input yields the zero vector, not a division error.
    *
    * Overflow bound: |u|·vScale must stay inside 38 digits —
    * rows · dims · (|x|·quantScale)² · vScale² < 10³⁸, ~10¹³ rows at
    * the defaults with |x| ≤ 1 — and fails LOUDLY under ANSI, never
    * silently.
    *
    * Output: `(pos, component_e6, component)` — the direction up to the
    * iteration count's convergence (sign fixed by the uniform init).
    *
    * Scale shape: the quantized triple table is checkpointed ONCE; per
    * round, the dims-sized v broadcasts into a map-side product, the
    * w-aggregation shuffles on the vector id, the u-aggregation on pos
    * (dims-sized result), and the renorm is a 1-row broadcast back.
    * Nothing dims×dims, nothing driver-side. */
  def powerIterationTop(df: DataFrame, idCol: String, vecCol: String,
                        iters: Int = 3, quantScale: Double = 1.0e6,
                        vScale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"iters ($iters) must be >= 1")
    require(quantScale > 0 && vScale >= 1, "scales must be positive")
    val d38 = "decimal(38,0)"
    val e = df
      .select(col(idCol).as("_i"), posexplode(col(vecCol)).as(Seq("pos", "_vf")))
      .select(col("_i"), col("pos"),
        floor(col("_vf").cast("double") * lit(quantScale) + lit(0.5))
          .cast("long").as("_q"))
      .localCheckpoint(true) // re-read twice per round
    var v = e.select("pos").distinct()
      .select(col("pos"), lit(vScale).as("_v"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val w = e.join(broadcast(v), Seq("pos"))
        .groupBy("_i")
        .agg(sum(col("_q").cast(d38) * col("_v")).as("_w"))
      val u = e.join(w, Seq("_i"))
        .groupBy("pos").agg(sum(col("_w") * col("_q")).as("_u"))
      val m = u.agg(max(abs(col("_u"))).as("_m"))
      v = u.crossJoin(broadcast(m))
        .select(col("pos"),
          when(col("_m") === 0, lit(0L)).otherwise(
            when(col("_u") < 0, lit(-1L)).otherwise(lit(1L)) *
              expr(s"(abs(_u) * CAST($vScale AS DECIMAL(38,0))) div _m"))
            .as("_v"))
        .localCheckpoint(false)
    }
    v.select(col("pos"), col("_v").as("component_e6"),
      (col("_v").cast("double") / lit(vScale.toDouble)).as("component"))
  }

  /** Per-DIMENSION standardization (z-score) of an embedding column — the
    * preprocessing step before distance-based ANN/clustering when feature
    * scales differ. Output is exploded `(idCol, pos, v, z)` (reassemble
    * with a sorted `collect_list` keyed by id if arrays are needed).
    *
    * Exactness across engines uses [[centroids]]' quantization scheme
    * extended to SECOND moments: elements quantize to integers at
    * 1/`quantScale`, and both Σq and Σq² are summed exactly (decimal
    * accumulator), so mean and variance derive from bit-identical doubles
    * with one fixed operation order; `sqrt` is IEEE-exact everywhere, and
    * the final `(v − mean)/std` is per-row double math. The q² term makes
    * the 2^53 exact-cast bound bind sooner than in centroids:
    * `rows · (vMax·quantScale)² < 2^53` — the default 1e5 covers ~2.7M
    * rows at |v| ≤ 0.6 (this corpus); larger corpora lower `quantScale`
    * (the statistics are then coarser, never wrong). Zero-variance
    * dimensions (and tiny negative variances from double rounding, both
    * clamped via `greatest(·, 0)`) emit z = 0 rather than NaN.
    *
    * Scale shape: identical to [[centroids]] — posexplode map stage, one
    * (pos)-keyed aggregation of dims-sized output, broadcast back. */
  def standardizeDims(df: DataFrame, idCol: String, vecCol: String,
                      quantScale: Double = 1.0e5): DataFrame = {
    require(quantScale > 0, s"quantScale must be positive: $quantScale")
    val s = lit(quantScale)
    val e = df.select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "_vf")))
      .withColumn("_v", col("_vf").cast("double"))
      .withColumn("_q", floor(col("_v") * s + lit(0.5)).cast("decimal(38,0)"))
    val stats = e.groupBy("pos")
      .agg(sum(col("_q")).cast("double").as("_s1"),
        sum(col("_q") * col("_q")).cast("double").as("_s2"),
        count(lit(1)).cast("double").as("_n"))
      // fixed op order — the oracle restates these expressions verbatim
      .withColumn("_mean", col("_s1") / col("_n") / s)
      .withColumn("_std", sqrt(greatest(
        col("_s2") / col("_n") / (s * s) - col("_mean") * col("_mean"),
        lit(0.0))))
      .select("pos", "_mean", "_std")
    e.join(broadcast(stats), Seq("pos"))
      .select(col(idCol), col("pos"), col("_v").as("v"),
        when(col("_std") === 0.0, 0.0)
          .otherwise((col("_v") - col("_mean")) / col("_std")).as("z"))
  }

  /** Recall evaluation for ANN results: per-query `|approx ∩ exact| /
    * |exact|` — the standard quality gate before an approximate index
    * replaces the exact path in a retrieval pipeline. Both inputs carry
    * `(qCol, idCol)` per retrieved row (extra columns ignored); `exact` is
    * the ground-truth top-k (e.g. [[bruteForceTopK]] on a held-out query
    * sample), so every query in `exact` gets a row — recall 0.0 if the
    * approximate side missed it entirely. Output: `(qCol, n_hit, n_true,
    * recall)` with recall rounded to 6 decimals.
    *
    * Scale shape: both sides are per-query top-k tables (queries × k rows,
    * corpus-independent); the semi-join and both aggregates are query-
    * sized, so evaluating recall costs nothing at any corpus scale. */
  def recallAtK(approx: DataFrame, exact: DataFrame,
                qCol: String = "query_id",
                idCol: String = "neighbor_id"): DataFrame = {
    val hits = approx.select(col(qCol), col(idCol))
      .join(exact.select(col(qCol), col(idCol)), Seq(qCol, idCol), "left_semi")
      .groupBy(qCol).agg(count(lit(1)).as("n_hit"))
    val truth = exact.groupBy(qCol).agg(count(lit(1)).as("n_true"))
    truth.join(hits, Seq(qCol), "left")
      .select(col(qCol), coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        col("n_true"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double")
          / col("n_true").cast("double"), 6).as("recall"))
  }

  /** Hard-negative mining for contrastive training: per query, the top-k
    * most-cosine-similar corpus rows whose label DIFFERS from the query's
    * — the near-boundary negatives that dominate the contrastive gradient
    * (the ANN negative mining of DPR, Karpukhin et al., EMNLP 2020; a
    * random negative is trivially separable, a same-label neighbor is a
    * positive, so the valuable rows are exactly "similar but differently
    * labeled"). `queries` carries `(query_id, query_vec, query_label)`.
    *
    * Output: `(query_id, rank, neighbor_id, neighbor_label, score)`,
    * rank 1..k by score desc, ties on neighbor id.
    *
    * Scale shape = [[bruteForceTopK]]: queries broadcast, the corpus side
    * scores partition-parallel with the label inequality applied in the
    * same map stage (before any shuffle — a mismatched-label row never
    * leaves its partition), then one per-query top-k window. For corpora
    * past brute force, shortlist with [[lshTopK]] / [[graft.operators.IvfIndex]]
    * and apply the same label filter to the shortlist.
    *
    * Null-label contract (SQL `<>` semantics): a null-label corpus row is
    * never a negative for anyone, and a null-label query gets NO negatives
    * — label your rows, or coalesce nulls to a sentinel label upstream if
    * "unlabeled" should count as "different". */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("neighbor_label"), col(vecCol).as("c_vec"),
      l2Norm(col(vecCol)).as("c_norm"))
    val q = queries.select(col("query_id"), col("query_vec"),
      col("query_label"), l2Norm(col("query_vec")).as("q_norm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_label") =!= col("query_label"))
      .select(col("query_id"), col("neighbor_id"), col("neighbor_label"),
        (dot(col("c_vec"), col("query_vec")) / (col("c_norm") * col("q_norm"))).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "neighbor_label", "score")
  }

  /** Item-item collaborative-filtering neighbors (Sarwar et al.,
    * "Item-based collaborative filtering recommendation algorithms",
    * WWW 2001 — the Amazon-style recommender primitive): from
    * (user, item) interactions, each ordered item pair sharing a user
    * gets `co = |U_a ∩ U_b|` and `jaccard = co / (|U_a| + |U_b| − co)`;
    * per item, the top-`k` neighbors by `(jaccard DESC, neighbor ASC)`.
    *
    * Skew guard: users with more than `maxBasket` distinct items are
    * DROPPED WHOLE before pairing (the [[Linkage.blockedPairs]]
    * junk-block discipline — a 10⁶-item crawler account contributes
    * 10¹² pairs and no signal); item set sizes are counted AFTER the
    * cap so the Jaccard is exact within the kept universe. Pairs below
    * `minCo` co-occurrences are cut before the scoring joins.
    *
    * Determinism: all counts exact longs off distinct (user, item);
    * jaccard is one double division of exact longs; ranking ties break
    * on the neighbor id. Null user/item rows are excluded.
    *
    * Scale shape: distinct + basket sizes + the pair self-join all key
    * on USER (one exchange, reused); pair counts and the two
    * item-count attachments key on items (gated broadcast when the
    * item vocabulary fits); the rank window partitions per item —
    * never global. Pair fan-out is Σ_u basket(u)², bounded by
    * maxBasket·|interactions|. Output: `(item, rank, neighbor, co,
    * jaccard)`. */
  def itemNeighbors(df: DataFrame, userCol: String, itemCol: String,
                    k: Int = 5, minCo: Long = 2L, maxBasket: Int = 1000,
                    maxBroadcastRows: Long = 50000000L): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    require(minCo >= 1L, s"minCo ($minCo) must be >= 1")
    require(maxBasket >= 2, s"maxBasket ($maxBasket) must be >= 2")
    val capped = cappedBaskets(df, userCol, itemCol, maxBasket)
    val itemGate = Gates.countedBroadcast(
      capped.groupBy(col("_i")).agg(count(lit(1)).as("_ci")),
      maxBroadcastRows)
    val pairs = capped
      .join(capped.select(col("_u"), col("_i").as("_j")), Seq("_u"))
      .filter(col("_i") =!= col("_j"))
      .groupBy("_i", "_j").agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
    val scored = pairs
      .join(itemGate.of(itemGate.pinned), Seq("_i"))
      .join(itemGate.of(itemGate.pinned
        .select(col("_i").as("_j"), col("_ci").as("_cj"))), Seq("_j"))
      .select(col("_i").as("item"), col("_j").as("neighbor"), col("co"),
        (col("co").cast("double") /
          (col("_ci") + col("_cj") - col("co")).cast("double"))
          .as("jaccard"))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("jaccard").desc, col("neighbor"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("item"), col("rank").cast("int").as("rank"),
        col("neighbor"), col("co"), col("jaccard"))
  }

  /** Distinct (user, item) interactions with over-sized baskets DROPPED
    * WHOLE — the shared skew guard of [[itemNeighbors]] and
    * [[associationRules]] (a crawler basket of n items fans out n² pairs
    * and no signal). Checkpointed once: every consumer reads the capped
    * table for sizes AND both self-join sides. */
  private def cappedBaskets(df: DataFrame, userCol: String, itemCol: String,
                            maxBasket: Int): DataFrame = {
    val inter = df
      .filter(col(userCol).isNotNull && col(itemCol).isNotNull)
      .select(col(userCol).as("_u"), col(itemCol).as("_i"))
      .distinct()
      .localCheckpoint(false) // sizes + capped re-read
    val kept = inter.groupBy("_u").agg(count(lit(1)).as("_bs"))
      .filter(col("_bs") <= maxBasket)
      .select("_u")
    // pin the layout to the cluster's core count before the checkpoint:
    // AQE coalesces this table by BYTES, but its next consumer is the
    // basket self-join whose output is quadratic in basket size — a
    // bytes-right 2-partition layout serializes the n² pair fan-out on two
    // cores (measured: 1.9 s of q217's 4.4 s in one 2-task stage). The _u
    // key keeps both self-join sides co-partitioned (no exchange), and
    // defaultParallelism is the total executor core count, so the pin
    // scales with the cluster.
    inter.join(kept, Seq("_u"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("_u"))
      .localCheckpoint(false) // item counts + both pair sides
  }

  /** Market-basket association rules (Agrawal & Srikant, "Fast algorithms
    * for mining association rules", VLDB 1994 — the support/confidence
    * framework; lift per Brin et al. SIGMOD 1997): for each ordered item
    * pair (a → b) co-occurring in ≥ `minCo` baskets,
    * `support = n_ab / N`, `confidence = n_ab / n_a`, and
    * `lift = (n_ab · N) / (n_a · n_b)` — lift > 1 means b is
    * over-represented in a's baskets vs its base rate.
    *
    * Baskets are distinct items per `userCol` key; the [[itemNeighbors]]
    * skew guard applies verbatim (baskets over `maxBasket` dropped whole,
    * all counts exact within the kept universe — the quoted counts
    * `n_a`/`n_b`/`n_baskets` make the denominators auditable).
    *
    * Determinism: every count is an exact long; the three ratios are
    * fixed-order double arithmetic over them — bit-identical
    * cross-engine.
    *
    * Scale shape: identical to [[itemNeighbors]] — the pair fan-out is
    * Σ_u basket(u)² bounded by maxBasket·|interactions|, the item-count
    * attachments are gated broadcasts, and the scalar basket count rides
    * a 1-row broadcast. Output: `(antecedent, consequent, n_ab, n_a,
    * n_b, n_baskets, support, confidence, lift)`. */
  def associationRules(df: DataFrame, userCol: String, itemCol: String,
                       minCo: Long = 2L, maxBasket: Int = 1000,
                       maxBroadcastRows: Long = 50000000L): DataFrame = {
    require(minCo >= 1L, s"minCo ($minCo) must be >= 1")
    require(maxBasket >= 2, s"maxBasket ($maxBasket) must be >= 2")
    val capped = cappedBaskets(df, userCol, itemCol, maxBasket)
    val nBaskets = capped.select("_u").distinct()
      .agg(count(lit(1)).as("_nb"))
    val itemGate = Gates.countedBroadcast(
      capped.groupBy(col("_i")).agg(count(lit(1)).as("_ci")),
      maxBroadcastRows)
    val pairs = capped
      .join(capped.select(col("_u"), col("_i").as("_j")), Seq("_u"))
      .filter(col("_i") =!= col("_j"))
      .groupBy("_i", "_j").agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
    def dbl(c: Column): Column = c.cast("double")
    pairs
      .join(itemGate.of(itemGate.pinned), Seq("_i"))
      .join(itemGate.of(itemGate.pinned
        .select(col("_i").as("_j"), col("_ci").as("_cj"))), Seq("_j"))
      .crossJoin(broadcast(nBaskets))
      .select(col("_i").as("antecedent"), col("_j").as("consequent"),
        col("co").as("n_ab"), col("_ci").as("n_a"), col("_cj").as("n_b"),
        col("_nb").as("n_baskets"),
        (dbl(col("co")) / dbl(col("_nb"))).as("support"),
        (dbl(col("co")) / dbl(col("_ci"))).as("confidence"),
        (dbl(col("co")) * dbl(col("_nb")) / (dbl(col("_ci")) * dbl(col("_cj"))))
          .as("lift"))
  }
}
