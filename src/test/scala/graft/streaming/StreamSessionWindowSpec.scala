package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkFunSuite

/** Native session_window streaming aggregation: gap-merged windows,
  * watermark-finalized emission — the declarative sessionization Spark
  * already ships, exercised end-to-end on a real micro-batch stream. */
class StreamSessionWindowSpec extends SparkFunSuite {

  private def t(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  test("gap splits sessions, watermark finalizes them, counts/sums are exact") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)]
    val sessions = StreamingOps.sessionWindowStats(
      input.toDS().toDF("user_id", "ts", "value"),
      gap = "1 minute", watermark = "1 minute")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sw_out").start()
    try {
      // user 1: two events 30s apart (one session), then one 5 min later
      // (a second session); user 2: one event
      input.addData((1L, t(0), 1.0), (1L, t(30), 2.0), (1L, t(330), 4.0),
        (2L, t(10), 8.0))
      q.processAllAvailable()
      // push the watermark far past everything so all sessions finalize
      input.addData((9L, t(10000), 0.0))
      q.processAllAvailable()
      val got = spark.table("sw_out")
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
        .sorted.toSeq
      assert(got == Seq((1L, 1L, 4.0), (1L, 2L, 3.0), (2L, 1L, 8.0)),
        s"got $got")
      // session bounds: gap-extended end = last event + gap
      val s1 = spark.table("sw_out").where("user_id = 1 AND n_events = 2")
        .collect().head
      assert(s1.getTimestamp(1) == t(0) && s1.getTimestamp(2) == t(90),
        "end = last event (t+30) + 1 minute gap")
    } finally q.stop()
  }
}
