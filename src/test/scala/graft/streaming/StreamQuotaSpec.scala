package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkFunSuite
import graft.streaming.StreamingOps.{Admitted, QuotaEvent}

/** Windowed quota admission: the cap must hold per (key, window) across
  * micro-batches, admission within a batch must be deterministic, and
  * state must prune to the horizon. */
class StreamQuotaSpec extends SparkFunSuite {

  private def run(batches: Seq[Seq[QuotaEvent]], windowMs: Long, max: Int,
                  horizon: Int = 48): Seq[Admitted] = {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[QuotaEvent]
    val name = s"quota_out_${System.nanoTime()}"
    val q = StreamingOps.quotaAdmitStream(input.toDS(), windowMs, max, horizon)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[Admitted].collect().toSeq
    } finally q.stop()
  }

  test("cap holds per key and window; admission sequence is dense from 1") {
    // 5 events for key a in window [0, 1000), cap 3; key b unaffected
    val batch = (1L to 5L).map(i => QuotaEvent("a", i * 100, i)) :+
      QuotaEvent("b", 100L, 99L)
    val got = run(Seq(batch), windowMs = 1000L, max = 3)
    val a = got.filter(_.key == "a").sortBy(_.seq)
    assert(a.map(_.id) == Seq(1L, 2L, 3L), s"first 3 by (ts, id) admitted: $a")
    assert(a.map(_.seq) == Seq(1L, 2L, 3L))
    assert(got.count(_.key == "b") == 1)
  }

  test("quota counts persist across micro-batches; a new window resets it") {
    val b1 = Seq(QuotaEvent("a", 100L, 1L), QuotaEvent("a", 200L, 2L))
    val b2 = Seq(QuotaEvent("a", 300L, 3L),          // window 0: over cap
      QuotaEvent("a", 1100L, 4L))                    // window 1000: fresh quota
    val got = run(Seq(b1, b2), windowMs = 1000L, max = 2)
    assert(got.map(_.id).toSet == Set(1L, 2L, 4L),
      s"id 3 must be over quota, id 4 fresh: $got")
    assert(got.find(_.id == 4L).get.window_start == 1000L)
  }

  test("events behind the pruned horizon drop; state stays bounded") {
    // horizon 2 windows of 1000ms; an event at ts 100 after seeing ts 5000
    // is beyond the horizon and must drop even though its window was never
    // full
    val b1 = Seq(QuotaEvent("a", 5000L, 1L))
    val b2 = Seq(QuotaEvent("a", 100L, 2L), QuotaEvent("a", 4500L, 3L))
    val got = run(Seq(b1, b2), windowMs = 1000L, max = 10, horizon = 2)
    assert(got.map(_.id).toSet == Set(1L, 3L),
      s"the horizon must drop the stale event, keep the in-horizon one: $got")
  }

  test("argument validation") {
    implicit val s = spark
    import spark.implicits._
    val ds = Seq.empty[QuotaEvent].toDS()
    intercept[IllegalArgumentException] {
      StreamingOps.quotaAdmitStream(ds, 0L, 1)
    }
    intercept[IllegalArgumentException] {
      StreamingOps.quotaAdmitStream(ds, 1000L, 0)
    }
  }
}
