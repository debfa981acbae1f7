package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

import graft.functions.VecDot

/** Coreset selection over an embedding column — pick a small, maximally
  * spread subset that covers the corpus geometry. The k-center greedy /
  * farthest-point-sampling rule (Gonzalez, "Clustering to minimize the
  * maximum intercluster distance", TCS 1985; the selection backbone of
  * coreset active learning, Sener & Savarese ICLR 2018, and of diverse
  * data-subset selection in curation pipelines): start from a seed, then
  * repeatedly add the point FARTHEST from everything selected so far.
  * Greedy is a proven 2-approximation of the optimal k-center cover —
  * the best any polynomial algorithm guarantees (Gonzalez §3).
  *
  * Determinism contract: the seed is the minimum id; every squared
  * distance is `vn2 + sn2 − 2·dot` over [[VecDot]]'s fixed ascending
  * fold (bit-identical to the oracle's `list_inner_product` chain); the
  * per-step argmax breaks ties on the smaller id; `min` over the
  * selected set is order-invariant (comparison, not accumulation). No
  * rounding anywhere — every emitted double is bit-exact cross-engine.
  *
  * Scale shape for 100 TB: the selected set is k vectors — it rides the
  * driver and broadcasts as one packed array row, so each of the k
  * iterations is ONE narrow map-reduce over the corpus (distance
  * projection + a single `max(struct)` aggregation; no shuffle, no
  * window, no per-row join). The corpus projection is `localCheckpoint`ed
  * once — k passes read executor-local blocks, not parquet. Total work is
  * O(k²·n/p) dot products (the per-step scan recomputes min-distance
  * against all selected — k ≤ a few hundred in practice, and recompute
  * keeps the lineage flat instead of k chained checkpoints).
  */
object Coreset {

  /** Greedy k-center selection: returns exactly `k` rows
    * `(step INT, vec_id BIGINT, d2 DOUBLE)` in selection order — `step 0`
    * is the min-id seed (`d2` NULL), and each later row is the corpus
    * point with the LARGEST squared distance to its nearest already-
    * selected point, that distance in `d2`. `d2` of the last row is the
    * k-center coverage radius² of the selection (monotone non-increasing
    * in `step` — a spec-checked invariant). Throws if the corpus has
    * fewer than `k` rows (a silent short selection would look like a
    * converged one). */
  def kCenterGreedy(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = corpus.sparkSession
    // one projection pass; vn2 rides along so each step's distance is one
    // dot product per selected point
    val base = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("vn2", VecDot.dot(col("v"), col("v")))
      .localCheckpoint(true)
    val n = base.count()
    require(n >= k, s"k-center: corpus has $n rows but k = $k")

    val seed = base.orderBy("id").limit(1).collect().head
    def vecOf(r: Row, i: Int): Seq[Double] =
      r.getSeq[Any](i).map {
        case f: Float => f.toDouble
        case d: Double => d
      }
    // (id, sv, sn2) of everything selected so far — k×dims doubles, driver
    var selected = Vector((seed.getLong(0), vecOf(seed, 1), seed.getDouble(2)))
    val picks = Vector.newBuilder[(Int, Long, Option[Double])]
    picks += ((0, seed.getLong(0), None))

    for (step <- 1 until k) {
      import spark.implicits._
      val selDf = selected.toDF("sid", "sv", "sn2")
        .agg(collect_list(struct(col("sv"), col("sn2"))).as("_sel"))
      val ids = selected.map(_._1)
      val win = base
        .filter(!col("id").isInCollection(ids))
        .crossJoin(broadcast(selDf))
        .select(max(struct(
          array_min(transform(col("_sel"), s =>
            col("vn2") + s.getField("sn2") -
              lit(2.0) * VecDot.dot(col("v"), s.getField("sv")))).as("mind2"),
          (-col("id")).as("negid"),
          col("v").as("v"),
          col("vn2").as("vn2"))).as("w"))
        .select(col("w.mind2"), col("w.negid"), col("w.v"), col("w.vn2"))
        .collect().head
      val id = -win.getLong(1)
      selected = selected :+ ((id, vecOf(win, 2), win.getDouble(3)))
      picks += ((step, id, Some(win.getDouble(0))))
    }

    val rows = picks.result().map { case (s, id, d2) =>
      Row(s, id, d2.map(java.lang.Double.valueOf).orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("step", IntegerType, nullable = false),
        StructField("vec_id", LongType, nullable = false),
        StructField("d2", DoubleType, nullable = true))))
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein,
    * "The use of MMR, diversity-based reranking…", SIGIR 1998): start
    * from the most relevant point, then repeatedly add
    * `argmax λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` — the
    * relevance/diversity trade-off behind diverse retrieval and
    * diverse training-subset selection. `sim` is the raw inner product
    * (IP-MMR; normalize the vectors first for cosine semantics).
    * [[Retrieval.mmrSelect]] is the PER-QUERY retrieval form — cosine
    * relevance to each query vector, many queries batched, the greedy
    * loop all-Spark over bounded shortlists.
    *
    * Determinism mirrors [[kCenterGreedy]]: the seed is the
    * `(rel DESC, id ASC)` argmax; every dot is [[VecDot]]'s fixed
    * ascending fold; `λ` and `1−λ` are planted as the SAME two double
    * literals the oracle text carries (1−λ is computed ONCE in Scala —
    * `1.0 − 0.7` is not the double `0.3`); max over the selected set
    * is a comparison, order-invariant; per-step ties break on the
    * smaller id. Throws if the corpus has fewer than `k` rows.
    *
    * Scale shape is [[kCenterGreedy]]'s verbatim: the selected set
    * rides the driver (k×dims doubles) and broadcasts; each step is
    * one narrow map-reduce over the checkpointed projection — no
    * shuffle, no window. Output: `(step INT, vec_id BIGINT,
    * score DOUBLE)` in pick order, seed score NULL. */
  def mmrSelect(corpus: DataFrame, idCol: String, vecCol: String,
                relCol: String, k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(lambda > 0.0 && lambda <= 1.0,
      s"lambda ($lambda) must be in (0, 1]")
    val mu = 1.0 - lambda
    val spark = corpus.sparkSession
    val base = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        col(relCol).cast("double").as("rel"))
      .filter(col("id").isNotNull && col("rel").isNotNull)
      .localCheckpoint(true)
    val n = base.count()
    require(n >= k, s"mmr: corpus has $n rows but k = $k")

    def vecOf(r: Row, i: Int): Seq[Double] =
      r.getSeq[Any](i).map {
        case f: Float => f.toDouble
        case d: Double => d
      }
    val seed = base
      .select(max(struct(col("rel"), (-col("id")).as("negid"),
        col("v").as("v"))).as("w"))
      .select(col("w.rel"), col("w.negid"), col("w.v"))
      .collect().head
    var selected = Vector((-seed.getLong(1), vecOf(seed, 2)))
    val picks = Vector.newBuilder[(Int, Long, Option[Double])]
    picks += ((0, -seed.getLong(1), None))

    for (step <- 1 until k) {
      import spark.implicits._
      val selDf = selected.toDF("sid", "sv")
        .agg(collect_list(col("sv")).as("_sel"))
      val ids = selected.map(_._1)
      val win = base
        .filter(!col("id").isInCollection(ids))
        .crossJoin(broadcast(selDf))
        .select(max(struct(
          (lit(lambda) * col("rel") - lit(mu) *
            array_max(transform(col("_sel"),
              sv => VecDot.dot(col("v"), sv)))).as("score"),
          (-col("id")).as("negid"),
          col("v").as("v"))).as("w"))
        .select(col("w.score"), col("w.negid"), col("w.v"))
        .collect().head
      val id = -win.getLong(1)
      selected = selected :+ ((id, vecOf(win, 2)))
      picks += ((step, id, Some(win.getDouble(0))))
    }

    val rows = picks.result().map { case (s, id, sc) =>
      Row(s, id, sc.map(java.lang.Double.valueOf).orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("step", IntegerType, nullable = false),
        StructField("vec_id", LongType, nullable = false),
        StructField("score", DoubleType, nullable = true))))
  }
}
