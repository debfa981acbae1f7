package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: split each user's event stream into sessions at
  * inactivity gaps > `gapMinutes`.
  *
  * Classic two-window shape: lag() flags session starts, a running sum of
  * flags numbers the sessions. Both windows share one partitioning
  * (user_id, ordered by ts) so Spark plans a single shuffle + sort and the
  * second window reuses it — check `.explain`: one Exchange, one Sort.
  * Skewed users (one user = one partition's worth of events) are the scale
  * risk; AQE skew handling doesn't split windows, so for 100 TB the salted
  * variant would pre-split by (user_id, day) — the gap rule only needs
  * in-day locality once sessions are capped at day boundaries.
  */
object Sessionize {

  /** Assign `session_id` (1-based per user) to each event. `tieBreak`
    * columns make the ordering total when timestamps collide (a must for
    * cross-engine determinism). Gap comparison floors timestamps to whole
    * seconds so engines with different sub-second precision agree. */
  def assignSessions(events: DataFrame, userCol: String, tsCol: String,
                     gapMinutes: Int = 30, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy((tsCol +: tieBreak).map(col): _*)
    val gapSec = gapMinutes * 60L
    events
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_ts").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("_prev_ts")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("_new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_prev_ts", "_new_session")
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   valueCol: String, gapMinutes: Int = 30,
                   tieBreak: Seq[String] = Nil): DataFrame =
    assignSessions(events, userCol, tsCol, gapMinutes, tieBreak)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("value_sum"))
}
