package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column statistics for data-quality triage over a
  * (possibly huge) table — ALL columns in one aggregate over ONE scan
  * (k separate agg jobs would read a 100 TB table k times). The exact
  * distinct counts make Catalyst plan an Expand (one duplicated stream per
  * distinct column) — CPU inside a single pass, never extra I/O. */
object Profile {

  /** Numeric-column profile: count / nulls / exact distinct / min / max /
    * sum (rounded at `sumScale` decimals — callers pick a scale the data
    * makes exact) / mean derived from the rounded sum (keeps the value
    * bit-comparable across engines).
    *
    * Shape: one wide aggregation row (5 stats × column), unpivoted to the
    * per-column layout through a one-row explode — no shuffle, no extra
    * scan, no driver loop. */
  def numericProfile(df: DataFrame, cols: Seq[String], sumScale: Int = 2): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"__${c}__n_null"),
        countDistinct(col(c)).as(s"__${c}__n_distinct"),
        min(col(c)).cast("double").as(s"__${c}__min_v"),
        max(col(c)).cast("double").as(s"__${c}__max_v"),
        round(sum(col(c)), sumScale).as(s"__${c}__sum_v"))
    }
    val perCol = cols.map { c =>
      struct(
        lit(c).as("col_name"), col("n"),
        col(s"__${c}__n_null").as("n_null"),
        col(s"__${c}__n_distinct").as("n_distinct"),
        col(s"__${c}__min_v").as("min_v"),
        col(s"__${c}__max_v").as("max_v"),
        col(s"__${c}__sum_v").as("sum_v"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(perCol: _*)).as("p"))
      .select("p.*")
      // mean over the observed (non-null) values; all-null column -> null
      .withColumn("mean_v",
        when(col("n") > col("n_null"), col("sum_v") / (col("n") - col("n_null"))))
  }
}
