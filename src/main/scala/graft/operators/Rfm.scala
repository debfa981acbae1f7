package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RFM segmentation (Hughes, "Strategic Database Marketing", 1994 —
  * the classic customer-value grid): each user scores 1..`nBuckets` on
  * Recency (days since last activity — 5 = most recent), Frequency
  * (event count — 5 = most active) and Monetary (value sum — 5 =
  * highest spend), each score an equal-count RANK cut.
  */
object Rfm {

  /** Per-(r, f, m) segment: user count and exact monetary total.
    *
    * Scores are rank cuts ([[Ranks.rankBy]] — distributed two-pass
    * ranks, never a value-boundary quantile and never a single-task
    * window): users sort by `(metric ASC, user ASC)` — recency_days
    * DESCENDING for R, so "stale" lands in bucket 1 — and
    * `score = rank·nBuckets div n + 1`. The user-id tiebreak makes
    * every cut deterministic; metric values are exact (integer days,
    * counts, decimal(18,6) micro-unit sums — ≤6dp, |value| < 10¹²).
    * Recency is measured against the GLOBAL max day (one 1-row
    * broadcast), so the newest user scores `nBuckets` by construction.
    * Null user/ts rows are excluded; null values count 0 monetary.
    *
    * Scale shape: one map-side-combined per-user aggregation, three
    * rank passes (each one range shuffle + two linear passes over the
    * USER-sized table, not the corpus), three user-keyed joins that
    * reuse co-partitioning, one final segment-sized collapse. Output:
    * `(r_score, f_score, m_score, n_users, monetary)` — ≤ nBuckets³
    * rows. */
  def rfmSegments(df: DataFrame, userCol: String, tsCol: String,
                  valueCol: String, nBuckets: Int = 5): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 100,
      s"nBuckets ($nBuckets) out of range")
    val perUser = df
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol).as("_u"))
      .agg(max(floor(unix_micros(col(tsCol)).cast("double") / lit(86400.0e6))
        .cast("long")).as("_lastday"),
        count(lit(1)).as("_freq"),
        sum(coalesce((col(valueCol).cast("decimal(18,6)") * lit(1000000L))
          .cast("long"), lit(0L))).as("_mon6"))
      .localCheckpoint(false) // global max + three rank passes read it
    val maxDay = perUser.agg(max(col("_lastday")).as("_maxd"))
    val metrics = perUser.crossJoin(broadcast(maxDay))
      .select(col("_u"), (col("_maxd") - col("_lastday")).as("_rec"),
        col("_freq"), col("_mon6"))
      .localCheckpoint(false)
    val n = metrics.count()
    def score(sorted: DataFrame, out: String): DataFrame = sorted
      .select(col("_u"),
        (expr(s"(_rnk * $nBuckets) div $n") + lit(1L)).cast("int").as(out))
    val r = score(Ranks.rankBy(metrics, "_u",
      Seq(col("_rec").desc, col("_u"))), "r_score")
    val f = score(Ranks.rankBy(metrics, "_u",
      Seq(col("_freq"), col("_u"))), "f_score")
    val m = score(Ranks.rankBy(metrics, "_u",
      Seq(col("_mon6"), col("_u"))), "m_score")
    metrics.join(r, Seq("_u")).join(f, Seq("_u")).join(m, Seq("_u"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"),
        (sum(col("_mon6")).cast("double") / lit(1.0e6)).as("monetary"))
  }
}
