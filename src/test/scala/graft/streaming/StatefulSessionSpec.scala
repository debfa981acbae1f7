package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.SparkFunSuite
import graft.streaming.StreamingOps.{ClosedSession, SessionEvent}

/** Stateful streaming sessionization driven through MemoryStream
  * micro-batches: sessions close when a later event exceeds the gap. */
class StatefulSessionSpec extends SparkFunSuite {

  test("flatMapGroupsWithState closes sessions at gap boundaries across micro-batches") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    // NoTimeout: sessions close only via gap-exceeding events, so the test
    // is deterministic (no wall-clock dependence)
    val sessions = StreamingOps.sessionizeStream(
      input.toDS(), gapMs = 1000L, timeout = GroupStateTimeout.NoTimeout)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      // batch 1: user 1 opens a session (2 events), user 2 opens one
      input.addData(SessionEvent(1, 0, 1.0), SessionEvent(1, 500, 2.0),
        SessionEvent(2, 0, 5.0))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0, "no session closed yet")
      // batch 2: user 1 jumps past the gap -> first session closes
      input.addData(SessionEvent(1, 5000, 3.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[ClosedSession].collect()
      assert(closed.toSeq == Seq(ClosedSession(1, 0, 500, 2, 3.0)))
      // batch 3: another jump closes the second session
      input.addData(SessionEvent(1, 10000, 4.0))
      q.processAllAvailable()
      val closed2 = spark.table("sessions_out").as[ClosedSession].collect()
      assert(closed2.length == 2)
      assert(closed2.map(_.value_sum).sorted.toSeq == Seq(3.0, 3.0))
    } finally q.stop()
  }
}
