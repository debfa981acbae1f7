package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.MergeByKey

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

  // ------------------------------------------------ stateful sessionization

  final case class SessionEvent(user_id: Long, ts_ms: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class ClosedSession(user_id: Long, session_start: Long, session_end: Long,
                                 n_events: Long, value_sum: Double)

  /** Streaming gap-sessionization via `flatMapGroupsWithState`: per-user
    * state holds the open session; a processing-time timeout (or an event
    * beyond the gap) closes and emits it. State size is O(active users) —
    * the bounded-state shape for unbounded streams (the batch equivalent is
    * [[graft.operators.Sessionize]]; same gap rule).
    *
    * Events within a group are sorted by timestamp before folding: Spark
    * does not order rows inside a micro-batch group, so the fold must. */
  def sessionizeStream(events: Dataset[SessionEvent], gapMs: Long,
                       timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
                      (implicit spark: SparkSession): Dataset[ClosedSession] = {
    // EventTimeTimeout would need watermark-driven setTimeoutTimestamp
    // wiring this fold doesn't do — rejecting beats silently never closing
    // sessions (unbounded state on churning users)
    require(timeout != GroupStateTimeout.EventTimeTimeout,
      "sessionizeStream supports ProcessingTimeTimeout or NoTimeout")
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, timeout) { (user, it, state: GroupState[SessionState]) =>
        val sorted = it.toSeq.sortBy(e => (e.ts_ms, e.value))
        var open = state.getOption
        val closed = Seq.newBuilder[ClosedSession]
        if (sorted.isEmpty && state.hasTimedOut) {
          open.foreach(s => closed += ClosedSession(user, s.start, s.last, s.n, s.sum))
          state.remove()
        } else {
          sorted.foreach { e =>
            open match {
              case Some(s) if e.ts_ms - s.last <= gapMs =>
                open = Some(SessionState(s.start, e.ts_ms, s.n + 1, s.sum + e.value))
              case Some(s) =>
                closed += ClosedSession(user, s.start, s.last, s.n, s.sum)
                open = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
              case None =>
                open = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
            }
          }
          open.foreach { s =>
            state.update(s)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(gapMs)
          }
        }
        closed.result().iterator
      }
  }

  // --------------------------------------------------- lake upsert sink

  /** Streaming CDC upsert into a partitioned Parquet table: every
    * micro-batch runs [[graft.operators.MergeByKey.merge]] against `root`
    * (greatest `versionCol` per key wins, touched partitions only).
    *
    * End-to-end effectively-once without a transactional table format:
    * foreachBatch may REPLAY a batch after a failure, and the merge is
    * idempotent — re-merging rows whose versions already won (or lost)
    * changes nothing. The checkpoint dir carries source offsets, so a
    * restarted query resumes instead of reprocessing the stream. */
  def upsertSink(stream: DataFrame, root: String, keyCols: Seq[String],
                 partitionCols: Seq[String], versionCol: String,
                 checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        MergeByKey.merge(batch.sparkSession, root, batch.toDF(),
          keyCols, partitionCols, versionCol)
        (): Unit
      }
      .start()
}
