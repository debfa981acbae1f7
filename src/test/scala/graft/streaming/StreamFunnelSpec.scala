package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkFunSuite
import graft.streaming.StreamingOps.{FunnelEvent, FunnelProgress}

/** Streaming funnel parity: incremental per-user stage tracking across
  * micro-batches must converge to the batch funnel of the same events —
  * including stages that only complete because a LATER micro-batch delivers
  * the next stage event. */
class StreamFunnelSpec extends SparkFunSuite {

  test("stage progress accumulates across micro-batches and matches batch funnel") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stages = Seq("view", "click", "purchase")
    val batch1 = Seq(
      FunnelEvent(1L, 1000L, "view"), FunnelEvent(1L, 2000L, "click"),
      FunnelEvent(2L, 1000L, "view"),
      FunnelEvent(3L, 1000L, "click") // click before any view: no progress
    )
    val batch2 = Seq(
      FunnelEvent(1L, 3000L, "purchase"), // completes across batches
      FunnelEvent(2L, 2000L, "error"),    // noise: no emission for u2
      FunnelEvent(3L, 2000L, "view")      // u3 starts now
    )
    val input = MemoryStream[FunnelEvent]
    val q = StreamingOps.funnelStream(input.toDS(), stages)
      .writeStream.outputMode("update").format("memory")
      .queryName("funnel_out").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      // Update mode: keep each user's LAST emitted progress
      val rows = spark.table("funnel_out").as[FunnelProgress].collect()
      val latest = rows.groupBy(_.user_id)
        .map { case (u, rs) => u -> rs.map(_.stage_reached).max }
      assert(latest == Map(1L -> 3, 2L -> 1, 3L -> 1))
      // parity with the batch operator over the union of all events
      val all = (batch1 ++ batch2)
        .map(e => (e.user_id, new java.sql.Timestamp(e.ts_ms), e.event_type))
        .toDF("user_id", "ts", "event_type")
      val batch = graft.operators.Sessionize.funnelStages(
          all, "user_id", "ts", "event_type", stages)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(latest == batch)
    } finally q.stop()
  }
}
