package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming transforms for the events stream.
  *
  * The reference is batch-only (its "incremental" is a partition-diff loop),
  * so these are the Spark-native upgrade path: the SAME transform functions
  * run over `spark.read` (batch, used by the oracle-checked queries) and
  * `spark.readStream` (streaming, exercised in StreamingSpec) — Structured
  * Streaming's core contract.
  */
object StreamingOps {

  /** Tumbling-window event counts with a 10-minute watermark for late data.
    * On an unbounded stream state is bounded by (watermark ÷ slide) windows
    * per event_type. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("value_sum"))
}
