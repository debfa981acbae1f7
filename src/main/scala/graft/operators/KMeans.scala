package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecDot

/** Distributed Lloyd k-means over an embedding column — the centroid
  * trainer for the IVF family ([[IvfIndex]] routes by nearest centroid;
  * here is where those centroids come from) and the workhorse of
  * cluster-balanced curation (Lloyd, "Least squares quantization in PCM",
  * IEEE Trans. IT 1982; the k-means|| scale analysis in Bahmani et al.,
  * PVLDB 2012 motivates the bounded-iteration shape).
  *
  * Determinism contract (the [[Coreset]] arguments, applied iteratively):
  *   - vectors QUANTIZE up front — `floor(x·scale + 0.5)` per element as
  *     exact longs — so every per-cluster dimension sum is INTEGER
  *     arithmetic: no dependence on partial-aggregation order, exact on
  *     any cluster layout.
  *   - a centroid dimension is ONE double division of exact integers
  *     (sum/count) — correctly rounded, bit-identical cross-engine.
  *   - assignment distance is `qq − 2·dot + cc` over [[VecDot]]'s fixed
  *     ascending fold; the argmin breaks ties on the smaller cluster id.
  *   - init is the `k` lowest-id vectors (clusters numbered in id order)
  *     — deterministic, and replayable by the oracle's `LIMIT k`.
  *
  * Scale shape for 100 TB: per iteration, ONE broadcast of the k×dims
  * centroid table into a map-side distance argmin (no shuffle for
  * assignment — the k-way "join" is a broadcast nested loop over k rows),
  * then ONE (cluster, dim)-keyed integer aggregation (map-side combinable;
  * k·dims output rows). The quantized corpus projection is
  * `localCheckpoint`ed once and re-read from executor-local blocks each
  * iteration; each iteration's centroid table is checkpointed to keep the
  * lineage flat. Clusters that capture no points drop out of the output
  * (with sane init this means k was set above the data's support).
  *
  * Output: one row per surviving (cluster, dimension):
  * `(cluster INT, n BIGINT, dim INT, c DOUBLE)` — `n` the cluster size
  * after the last assignment, `c` the centroid coordinate in QUANTIZED
  * units (divide by `scale` for the original embedding space; kept raw so
  * every emitted double is a single exact-integer division). */
object KMeans {

  def lloyd(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
            iters: Int, scale: Int = 1000): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(scale >= 1, s"scale must be >= 1: $scale")
    val base = corpus
      .select(col(idCol).cast("long").as("_id"),
        transform(col(vecCol), x =>
          floor(x.cast("double") * lit(scale.toDouble) + lit(0.5))
            .cast("long")).as("_q"))
      .withColumn("_qd", transform(col("_q"), v => v.cast("double")))
      .withColumn("_qq", VecDot.dot(col("_qd"), col("_qd")))
      .localCheckpoint(true)
    val n = base.count()
    require(n >= k, s"k-means: corpus has $n rows but k = $k")

    val initW = Window.orderBy(col("_id"))
    var cent = base.orderBy("_id").limit(k)
      .withColumn("_cl", (row_number().over(initW) - 1).cast("int"))
      .select(col("_cl"), col("_qd").as("_c"))
      .localCheckpoint(true)
    var last: DataFrame = null

    for (_ <- 1 to iters) {
      val withCc = cent.withColumn("_cc", VecDot.dot(col("_c"), col("_c")))
      val assigned = base.crossJoin(broadcast(withCc))
        .withColumn("_d2",
          col("_qq") - lit(2.0) * VecDot.dot(col("_qd"), col("_c")) +
            col("_cc"))
        .groupBy("_id")
        .agg(min(struct(col("_d2"), col("_cl"))).as("_m"))
        .select(col("_id"), col("_m")("_cl").as("_cl"))
      val sums = assigned.join(base, Seq("_id"))
        .select(col("_cl"), posexplode(col("_q")))
        .groupBy("_cl", "pos")
        .agg(sum(col("col")).as("_s"), count(lit(1)).as("_n"))
      last = sums
        .withColumn("_cv", col("_s").cast("double") / col("_n").cast("double"))
        .groupBy("_cl")
        .agg(max(col("_n")).as("_n"),
          transform(
            sort_array(collect_list(struct(col("pos"), col("_cv")))),
            s => s("_cv")).as("_c"))
        .localCheckpoint(true)
      cent = last.select(col("_cl"), col("_c"))
    }

    last.select(col("_cl").as("cluster"), col("_n").as("n"),
        posexplode(col("_c")))
      .select(col("cluster"), col("n"), col("pos").as("dim"),
        col("col").as("c"))
  }
}
