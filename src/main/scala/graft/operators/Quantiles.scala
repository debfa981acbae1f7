package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact quantiles at scale.
  *
  * Spark's built-in exact `percentile()` aggregate buffers EVERY value in
  * the aggregation state — partial buffers hold whole partitions, and the
  * final merge concentrates the entire column on one reducer. Fine at
  * spec-test sizes, OOM at 100 TB. The scale-correct shape is a
  * distributed range sort plus order-statistic selection: sort the column
  * (range exchange — each task sorts its slice), derive each row's GLOBAL
  * index from broadcast per-partition offsets (range partitions are in key
  * order, so partition-major order IS value order), and fetch only the two
  * order statistics each requested quantile interpolates between — a
  * driver collect bounded by 2·|ps| rows, never the column.
  *
  * Interpolation is R-7 (`h = (n−1)p`, linear between floor/ceil ranks) —
  * the same rule as Spark's `percentile()` and DuckDB's `quantile_cont`,
  * so results are oracle-comparable (QuantilesSpec asserts equality with
  * the built-in on random data).
  */
object Quantiles {

  /** One row per requested quantile: `(p, value)`. Nulls and NaNs in the
    * value column are ignored (matching `percentile()`); an empty input
    * yields null values. Runs a count job plus the selection; the sorted
    * column is pinned with a lazy localCheckpoint so the per-partition
    * offsets are ALWAYS computed against the exact partitioning they index
    * into — do not remove it: without the pin, correctness would hinge on
    * exchange reuse deduping two independently-sampled range sorts (see
    * the in-body comment). */
  def exact(df: DataFrame, valueCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "at least one quantile is required")
    ps.foreach(p => require(p >= 0.0 && p <= 1.0, s"quantile out of range: $p"))
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
    val n = vals.count()
    if (n == 0L)
      return ps.map(p => (p, Option.empty[Double])).toDF("p", "value")
    val targets = ps.map { p =>
      val h = (n - 1) * p
      (p, h, math.floor(h).toLong, math.ceil(h).toLong)
    }
    val need = targets.flatMap(t => Seq(t._3, t._4)).distinct
    // the lazy localCheckpoint pins ONE physical range partitioning: the
    // offsets subplan and the row_number subplan below both read the same
    // materialized RDD, so the per-partition offsets always index the
    // partitioning they were counted against. Without it, correctness
    // would hinge on exchange reuse deduping two independently-sampled
    // range sorts. (Durability: pure derivation — executor loss fails the
    // job, a rerun rebuilds from intact inputs.)
    val sorted = vals.orderBy("v").withColumn("_pid", spark_partition_id())
      .localCheckpoint(false)
    // range partitions are in key order: broadcast per-partition row counts
    // become global starting offsets, and a within-partition row_number
    // completes the global index — no single-partition window anywhere.
    // Ties may split across partition boundaries; their relative order is
    // arbitrary but the VALUES at each rank are unaffected.
    // the offsets window runs on one partition by construction — its input
    // is one row per shuffle partition; the constant partitionBy only
    // silences Spark's single-partition warning for this bounded case
    val offsets = sorted.groupBy("_pid").count()
      .withColumn("_off", coalesce(
        sum("count").over(Window.partitionBy(lit(0)).orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("count")
    val inPart = Window.partitionBy("_pid").orderBy("v")
    val picked = sorted
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn("_i", col("_off") + row_number().over(inPart) - 1)
      .filter(col("_i").isin(need: _*))
      .select("_i", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = targets.map { case (p, h, lo, hi) =>
      val vLo = picked(lo); val vHi = picked(hi)
      // Spark's percentile() interpolates with the two-weight form — use
      // the identical expression so results are bit-compatible with the
      // built-in (the algebraically-equal vLo + w·(vHi−vLo) differs by ulps)
      val v = if (hi == lo) vLo else (hi - h) * vLo + (h - lo) * vHi
      (p, Some(v))
    }
    rows.toDF("p", "value")
  }
}
