package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{dot, l2Norm}

/** IVF (inverted-file) approximate nearest neighbor: partition the corpus
  * into `nCells` Voronoi cells around k-means centroids; queries probe only
  * the `nProbe` nearest cells and re-rank exactly inside them.
  *
  * Everything is DataFrame-native and deterministic:
  *  - init: the k vectors with smallest xxhash64(id) (a seeded, order-free
  *    pseudo-random sample — no RNG state, same result on any cluster);
  *  - Lloyd iterations: assign = broadcast-centroids argmin (one codegen
  *    dot per (vector, centroid)); update = posexplode to (cell, dim) →
  *    mean → rebuild arrays via sorted collect_list. Each iteration is two
  *    shuffles of O(rows × dims) — linear, no driver-side data;
  *  - search: probe assignment broadcasts centroids to the query side only.
  *
  * Compared to [[Similarity.lshTopK]]: IVF adapts to the data distribution
  * (cells follow density) where hyperplane LSH is data-oblivious; the cost
  * is the index-build pass. Both cut the scanned fraction to ~nProbe/nCells.
  */
object IvfIndex {

  /** Deterministic k-means centroids as (cell_id, centroid: array<double>). */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String,
                nCells: Int, iters: Int = 2): DataFrame = {
    val asDouble = transform(col(vecCol), x => x.cast("double"))
    var cents = corpus
      .select(col(idCol).as("cid"), asDouble.as("centroid"))
      .withColumn("_h", xxhash64(col("cid")))
      .orderBy("_h").limit(nCells)
      .select((row_number().over(Window.orderBy("_h")) - 1).as("cell_id"), col("centroid"))
      .localCheckpoint(true)
    val vecs = corpus.select(col(idCol).as("vid"), asDouble.as("v"))
    (1 to iters).foreach { _ =>
      val assigned = assignCells(vecs, cents, "v", "vid")
      // checkpoint truncates the lineage: without it each iteration (and
      // each downstream consumer) re-executes every previous Lloyd pass
      cents = assigned
        .select(col("cell_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell_id", "pos").agg(avg("x").as("m"))
        .groupBy("cell_id")
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
        .localCheckpoint(true)
    }
    cents
  }

  /** Attach `cell_id` = argmin centroid distance (ties break on cell_id);
    * `uniqueCol` identifies rows so the per-row argmin window is exact.
    * Centroids are broadcast — one narrow pass over the data. */
  private def assignCells(df: DataFrame, cents: DataFrame, vecCol: String,
                          uniqueCol: String): DataFrame = {
    val w = Window.partitionBy(col(uniqueCol)).orderBy(col("_dist"), col("cell_id"))
    df.crossJoin(broadcast(cents))
      .withColumn("_dist",
        graft.functions.VectorFunctions.l2Distance(col(vecCol), col("centroid")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_dist", "_rn", "centroid")
  }

  /** ANN top-k: probe the `nProbe` nearest cells per query, exact cosine
    * re-rank within them. Output schema matches the other top-k operators. */
  def topK(corpus: DataFrame, idCol: String, vecCol: String,
           queries: DataFrame, k: Int, nCells: Int = 16, nProbe: Int = 4,
           iters: Int = 2): DataFrame = {
    val cents = centroids(corpus, idCol, vecCol, nCells, iters)
    val indexed = assignCells(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        l2Norm(col(vecCol)).as("c_norm")), cents, "c_vec", "neighbor_id")
    val probeW = Window.partitionBy("query_id").orderBy(col("_dist"), col("cell_id"))
    val probes = queries
      .select(col("query_id"), col("query_vec"), l2Norm(col("query_vec")).as("q_norm"))
      .crossJoin(broadcast(cents))
      .withColumn("_dist",
        graft.functions.VectorFunctions.l2Distance(col("query_vec"), col("centroid")))
      .withColumn("_rn", row_number().over(probeW))
      .filter(col("_rn") <= nProbe)
      .select("query_id", "query_vec", "q_norm", "cell_id")
    val scored = indexed.join(probes, Seq("cell_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("c_vec"), col("query_vec")) / (col("c_norm") * col("q_norm"))).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }
}
