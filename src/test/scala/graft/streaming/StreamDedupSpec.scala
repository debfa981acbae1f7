package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkFunSuite

/** Streaming exactly-once dedup: `dropDuplicatesWithinWatermark` keeps
  * bounded state (keys older than the watermark are evicted) — the
  * streaming face of exact dedup for at-least-once sources. */
class StreamDedupSpec extends SparkFunSuite {

  test("duplicate event ids within the watermark are emitted once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)]
    val deduped = input.toDS().toDF("event_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 09:00:00")
      input.addData((1L, t0, 1.0), (2L, t0, 2.0), (1L, t0, 1.0)) // dup in-batch
      q.processAllAvailable()
      input.addData((2L, t0, 2.0), (3L, t0, 3.0)) // dup across batches
      q.processAllAvailable()
      val got = spark.table("dedup_out").collect()
        .map(_.getLong(0)).sorted
      assert(got.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
