package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column statistics for data-quality triage over a
  * (possibly huge) table. One aggregate job per profiled column, each a
  * partial+final HashAggregate — profiling cost is one scan per column,
  * trivially parallel, no driver state. */
object Profile {

  /** Numeric-column profile: count / nulls / exact distinct / min / max /
    * sum (rounded at `sumScale` decimals — callers pick a scale the data
    * makes exact) / mean derived from the rounded sum (keeps the value
    * bit-comparable across engines). */
  def numericProfile(df: DataFrame, cols: Seq[String], sumScale: Int = 2): DataFrame =
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n"),
        count(when(col(c).isNull, 1)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("double").as("min_v"),
        max(col(c)).cast("double").as("max_v"),
        round(sum(col(c)), sumScale).as("sum_v"))
        .withColumn("col_name", lit(c))
        // mean over the observed (non-null) values; all-null column -> null
        .withColumn("mean_v",
          when(col("n") > col("n_null"), col("sum_v") / (col("n") - col("n_null"))))
        .select("col_name", "n", "n_null", "n_distinct", "min_v", "max_v", "sum_v", "mean_v")
    }.reduce(_ unionByName _)
}
