package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row whose
  * order key is ≤ the left row's (per join key) — the time-series "latest
  * state at event time" join.
  *
  * Spark has no native as-of operator. Rather than a range join (which
  * explodes into an O(n·m) theta-join or needs a custom SparkPlan), this
  * composes built-ins: tag both sides, union, and take a running
  * `last(payload, ignoreNulls)` over (key, ord, side). One shuffle + sort,
  * linear in total rows — the shape that survives arbitrarily large sides.
  * Right rows sort before left rows at equal `ord`, giving the standard
  * inclusive (≥) as-of semantics (DuckDB `ASOF JOIN`'s default).
  *
  * Determinism contract: callers must ensure at most one right row per
  * (key, ord) — pre-aggregate otherwise — since "which same-timestamp row
  * wins" is undefined in every as-of implementation.
  */
object AsOf {

  /** Left as-of join. `payload` columns from `right` are attached to every
    * `left` row as `asof_<name>` (null when no right row precedes).
    *
    * The payload travels as ONE struct through a single
    * `last(ignoreNulls)` — per-column lasts would mix values from
    * different right rows whenever the most recent row has a null in one
    * payload column (an as-of row that never existed). */
  def joinLastBefore(left: DataFrame, right: DataFrame, keyCol: String,
                     ordCol: String, payload: Seq[String]): DataFrame = {
    val reserved = Set("_side", "_asof", "_asof_payload")
    require(!left.columns.exists(reserved) && !right.columns.exists(reserved),
      s"inputs must not contain the reserved columns ${reserved.mkString("/")} — " +
        "a caller-supplied one would silently be read as the as-of state")
    val leftCols = left.columns.toSeq
    val l = left.withColumn("_side", lit(1))
    // a right row with an unknown (null) order key can never be "the most
    // recent at or before" anything — and Spark's nulls-first ascending sort
    // would otherwise make it match EVERY left row
    val r = right.filter(col(ordCol).isNotNull)
      .select(Seq(col(keyCol), col(ordCol)) :+
        struct(payload.map(col): _*).as("_asof_payload"): _*)
      .withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol).orderBy(col(ordCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withAsOf = u.withColumn("_asof",
      last(col("_asof_payload"), ignoreNulls = true).over(w))
    withAsOf.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"_asof.$p").as(s"asof_$p")): _*)
  }
}
