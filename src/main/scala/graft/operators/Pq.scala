package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for vector search (Jégou, Douze & Schmid,
  * "Product quantization for nearest neighbor search", TPAMI 2011): cut
  * each d-dim vector into `m` contiguous sub-vectors, k-means each
  * sub-space into `k` cells, and store per vector only the m cell codes
  * — d·4 bytes collapse to m·log₂k bits (64-dim float → 4 bytes at
  * m = 4, k = 16), the memory step between this repo's int8 index
  * ([[IvfIndex.topKQuantized]], 4×) and full precision. Queries score
  * by ASYMMETRIC distance (ADC): one m×k lookup table of exact
  * query-sub-vector→centroid distances per query, then a vector's
  * approximate distance is m table lookups summed — no corpus-side
  * float math at all. An exact re-rank over the ADC shortlist restores
  * true scores, so quantization can only affect WHICH candidates
  * surface, never their reported values ([[IvfIndex.topKQuantized]]'s
  * contract).
  *
  * Determinism: codebooks come from [[IvfIndex.centroids]]' determinist
  * k-means per block; code assignment argmins break ties on cell_id;
  * ADC sums fold per (query, vector) over BLOCK order. The final
  * ranking is the exact cosine with (score DESC, neighbor_id) ties —
  * identical to every other top-k operator here.
  *
  * Scale shape: training touches m × (corpus-width/m) sub-vectors with
  * the bounded Lloyd machinery; encoding is one broadcast join against
  * m·k centroids + a per-vector argmin aggregate; serving joins the
  * code table against a BROADCAST m·k-row LUT per query and sums —
  * map-side combinable — then re-ranks shortlistFactor·k rows exactly.
  */
object Pq {

  private def asD(c: Column): Column = transform(c, x => x.cast("double"))

  /** Squared L2 between two equal-length double arrays — one zip_with
    * fold, the same elementwise shape the k-means assignment uses. */
  private def d2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, t) => acc + t)

  /** Per-block codebooks: `(block, cell_id, centroid)` — m·k rows,
    * broadcast-sized. `dim` must split evenly into `m` blocks. */
  def train(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
            m: Int, k: Int = 16, iters: Int = 2): DataFrame = {
    require(m >= 1 && dim >= m && dim % m == 0,
      s"dim ($dim) must split into m ($m) equal blocks")
    val w = dim / m
    (0 until m).map { b =>
      IvfIndex.centroids(
        corpus.select(col(idCol), slice(asD(col(vecCol)), b * w + 1, w)
          .as("_sub")),
        idCol, "_sub", nCells = k, iters = iters)
        .select(lit(b).as("block"), col("cell_id"), col("centroid"))
    }.reduce(_.unionByName(_))
  }

  /** Code table: `(idCol, block, code)` — each vector's nearest cell
    * per block (ties → smaller cell_id). m rows per vector; keep it
    * EXPLODED by block: that is exactly the shape the ADC join wants,
    * and a wide array column would just be re-exploded at serve time. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
             m: Int, codebooks: DataFrame): DataFrame = {
    require(m >= 1 && dim >= m && dim % m == 0,
      s"dim ($dim) must split into m ($m) equal blocks")
    val w = dim / m
    val subs = corpus.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        b => slice(asD(col(vecCol)), b * lit(w) + lit(1), lit(w)))))
      .select(col(idCol), col("pos").cast("int").as("block"),
        col("col").as("_sub"))
    subs.join(broadcast(codebooks), Seq("block"))
      .groupBy(col(idCol), col("block"))
      .agg(min(struct(d2(col("_sub"), col("centroid")).as("d"),
        col("cell_id").as("c"))).as("_m"))
      .select(col(idCol), col("block"), col("_m.c").as("code"))
  }

  /** ADC top-k with exact re-rank. Output schema, scores and tie-breaks
    * match [[IvfIndex.topK]]: `(query_id, rank, neighbor_id, score)`,
    * score the EXACT cosine. `shortlistFactor·k` bounds the re-rank
    * set; a factor covering the corpus makes the result exactly brute
    * force (the oracle regime — quantization then only reorders a
    * shortlist that contains everything). */
  def topK(corpus: DataFrame, idCol: String, vecCol: String,
           queries: DataFrame, k: Int, dim: Int, m: Int = 4,
           kCells: Int = 16, iters: Int = 2,
           shortlistFactor: Int = 4): DataFrame = {
    require(k >= 1 && shortlistFactor >= 1, "k and shortlistFactor >= 1")
    val books = train(corpus, idCol, vecCol, dim, m, kCells, iters)
      .localCheckpoint(true) // encode + LUT both read it
    val codes = encode(corpus, idCol, vecCol, dim, m, books)
    val w = dim / m
    // per-query LUT: exact distance from each query sub-vector to each
    // centroid — m·kCells rows per query, broadcast
    val lut = queries.select(col("query_id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          b => slice(asD(col("query_vec")), b * lit(w) + lit(1), lit(w)))))
      .select(col("query_id"), col("pos").cast("int").as("block"),
        col("col").as("_qsub"))
      .join(broadcast(books), Seq("block"))
      .select(col("query_id"), col("block"), col("cell_id").as("code"),
        d2(col("_qsub"), col("centroid")).as("_d"))
    val approx = codes.join(broadcast(lut), Seq("block", "code"))
      .groupBy(col("query_id"), col(idCol))
      // block-count-bounded sum of exact doubles; fold order irrelevant
      // to the SHORTLIST contract (ties below break on id), and the
      // reported score is the exact re-rank anyway
      .agg(sum(col("_d")).as("_approx"))
    val aw = Window.partitionBy("query_id")
      .orderBy(col("_approx").asc, col(idCol))
    val shortlist = approx.withColumn("_ar", row_number().over(aw))
      .filter(col("_ar") <= k * shortlistFactor)
      .select(col("query_id"), col(idCol).as("neighbor_id"))
    val exact = shortlist
      .join(corpus.select(col(idCol).as("neighbor_id"),
        asD(col(vecCol)).as("_cv")), Seq("neighbor_id"))
      .join(queries.select(col("query_id"), asD(col("query_vec")).as("_qv")),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (graft.functions.VecDot.dot(col("_cv"), col("_qv")) /
          (sqrt(graft.functions.VecDot.dot(col("_cv"), col("_cv"))) *
            sqrt(graft.functions.VecDot.dot(col("_qv"), col("_qv")))))
          .as("score"))
    val rw = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }
}
