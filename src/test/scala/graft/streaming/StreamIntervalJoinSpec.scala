package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkFunSuite

/** Stream-stream interval join: clicks attribute to impressions within the
  * delay bound, with watermarked (bounded) join state — the §2.7 surface a
  * stream-static join can't cover. */
class StreamIntervalJoinSpec extends SparkFunSuite {

  private def t(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  test("clicks join impressions within maxDelay; outside the bound they don't") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamingOps.intervalJoinStream(
      imps.toDS().toDF("ad_id", "ts"), clicks.toDS().toDF("ad_id", "ts"),
      "ad_id", "ts", maxDelaySec = 60, watermark = "5 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ij_out").start()
    try {
      imps.addData((1L, t(0)), (2L, t(0)))
      clicks.addData(
        (1L, t(30)),   // in window → joins
        (1L, t(120)),  // 120s > 60s delay → no match
        (2L, t(0)),    // same instant counts (>= left_ts)
        (3L, t(10)))   // no impression for ad 3
      q.processAllAvailable()
      val got = spark.table("ij_out")
        .collect().map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
      assert(got == Seq((1L, 30L), (2L, 0L)))
      // a click BEFORE its impression never matches (delay is one-sided)
      imps.addData((4L, t(400)))
      clicks.addData((4L, t(395)))
      q.processAllAvailable()
      assert(spark.table("ij_out").count() == 2)
    } finally q.stop()
  }

  test("left_outer: unmatched lefts emit NULL rows once the watermark evicts them") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamingOps.intervalJoinStream(
      imps.toDS().toDF("ad_id", "ts"), clicks.toDS().toDF("ad_id", "ts"),
      "ad_id", "ts", maxDelaySec = 60, watermark = "5 minutes",
      joinType = "left_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ij_outer").start()
    try {
      imps.addData((1L, t(0)), (2L, t(0)))  // ad 2 never clicks
      clicks.addData((1L, t(30)))
      q.processAllAvailable()
      // matched row emits immediately; the outer row for ad 2 must WAIT
      // for the watermark to prove no click can still arrive
      assert(spark.table("ij_outer").count() == 1)
      // far-future rows on BOTH sides advance the watermark past ad 2's
      // window; the next batch evicts its state and emits the NULL row
      imps.addData((99L, t(100000)))
      clicks.addData((99L, t(100000)))
      q.processAllAvailable()
      val got = spark.table("ij_outer").filter($"ad_id" < 99L)
        .collect()
        .map(r => (r.getLong(0), Option(r.get(2)).isDefined)).sorted.toSeq
      assert(got == Seq((1L, true), (2L, false)),
        "exactly one matched row and one NULL-right outer row")
    } finally q.stop()
  }

  test("maxDelaySec must be positive; bad join type rejected") {
    import spark.implicits._
    val df = Seq((1L, t(0))).toDF("ad_id", "ts")
    intercept[IllegalArgumentException] {
      StreamingOps.intervalJoinStream(df, df, "ad_id", "ts", maxDelaySec = 0)
    }
    intercept[IllegalArgumentException] {
      StreamingOps.intervalJoinStream(df, df, "ad_id", "ts",
        maxDelaySec = 60, joinType = "full_outer")
    }
  }

  test("chained stateful: join → windowed agg emits finalized windows only, once") {
    // two stateful operators in ONE query (the q328 surface): the
    // interval join feeds an hour-window count. Without a watermark
    // advance the real window must NOT emit; after a far-future batch it
    // emits exactly once with the exact pair count.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamingOps.intervalJoinStream(
      imps.toDS().toDF("ad_id", "ts"), clicks.toDS().toDF("ad_id", "ts"),
      "ad_id", "ts", maxDelaySec = 60, watermark = "5 minutes")
    val agg = joined
      .groupBy(window(col("right_ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("delay_sec")).as("delay_sum"))
      .select(col("w.start").as("window_start"), col("n_pairs"),
        col("delay_sum"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("chain_out").start()
    try {
      imps.addData((1L, t(0)), (2L, t(0)))
      clicks.addData((1L, t(30)), (2L, t(10)), (3L, t(10)))
      q.processAllAvailable()
      // watermark still below the window end → nothing finalized
      assert(spark.table("chain_out").count() == 0)
      // far-future rows on BOTH sides advance the chain's watermark
      imps.addData((-1L, t(864000))); clicks.addData((-1L, t(864000)))
      q.processAllAvailable()
      val got = spark.table("chain_out")
        .filter(col("window_start") < t(864000))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
      assert(got == Seq((2L, 40L))) // pairs (1,+30s) and (2,+10s), one window
    } finally q.stop()
  }
}
