package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Stream-static join: an event stream enriched against a static dimension
  * — the streaming face of the broadcast-dim join (q12/q13). */
class StreamStaticJoinSpec extends SparkFunSuite {

  test("streaming events join a static dimension and aggregate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq(("click", 1.0), ("view", 0.1)).toDF("event_type", "weight")
    val input = MemoryStream[(Long, String, Double)]
    val enriched = input.toDS().toDF("event_id", "event_type", "value")
      .join(broadcast(dim), Seq("event_type"))
      .groupBy("event_type")
      .agg(round(sum(col("value") * col("weight")), 4).as("weighted"))
    val q = enriched.writeStream.outputMode("complete")
      .format("memory").queryName("enriched_out").start()
    try {
      input.addData((1L, "click", 10.0), (2L, "view", 100.0), (3L, "scroll", 5.0))
      q.processAllAvailable()
      val got = spark.table("enriched_out").orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      // "scroll" has no dim row -> dropped by the inner join
      assert(got.toSeq == Seq(("click", 10.0), ("view", 10.0)))
      input.addData((4L, "click", 5.0))
      q.processAllAvailable()
      val got2 = spark.table("enriched_out").orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      assert(got2.toSeq == Seq(("click", 15.0), ("view", 10.0)))
    } finally q.stop()
  }
}
