package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.operators.Sessionize

/** Streaming adjacent-pair extraction ≡ the batch transition matrix when
  * per-user arrival order holds — including pairs that straddle
  * micro-batch boundaries (the one-row-per-user state carry). */
class StreamTransitionSpec extends SparkFunSuite {

  test("pairs match the batch matrix across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    val input = MemoryStream[StreamingOps.TransitionEvent]
    val pairs = StreamingOps.transitionStream(input.toDS())
    val q = pairs.writeStream.outputMode("append")
      .format("memory").queryName("tr_out").start()
    val batch1 = Seq(
      StreamingOps.TransitionEvent(1L, 1000L, "a"),
      StreamingOps.TransitionEvent(1L, 2000L, "b"),
      StreamingOps.TransitionEvent(2L, 1000L, "x"))
    val batch2 = Seq(
      StreamingOps.TransitionEvent(1L, 3000L, "a"), // cross-batch pair b→a
      StreamingOps.TransitionEvent(2L, 2000L, "y"), // cross-batch pair x→y
      StreamingOps.TransitionEvent(3L, 1000L, "solo")) // no successor → no pair
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("tr_out")
        .groupBy(col("from_state").as("state"), col("to_state").as("next_state"))
        .agg(count(lit(1)).as("n_trans"))
        .orderBy("state", "next_state").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      val batch = Sessionize.transitionMatrix(
          (batch1 ++ batch2).toDF(), "user_id", "ts_ms", "state")
        .orderBy("state", "next_state").collect()
        .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_trans"))).toSeq
      assert(streamed == batch,
        s"stream pairs must aggregate to the batch matrix: $streamed vs $batch")
    } finally q.stop()
  }
}
