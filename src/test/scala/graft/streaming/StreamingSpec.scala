package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkFunSuite

/** Batch/streaming unification: the same StreamingOps transform runs over a
  * file stream and must produce the batch answer once all files are
  * processed. */
class StreamingSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("event_type", StringType), StructField("value", DoubleType)))

  test("windowedCounts over a parquet file stream matches the batch result") {
    val dir = tmpDir("stream")
    val rows = Seq(
      (1L, ts("2024-01-01 09:05:00"), "click", 1.5),
      (2L, ts("2024-01-01 09:55:00"), "click", 2.5),
      (3L, ts("2024-01-01 10:05:00"), "click", 4.0),
      (4L, ts("2024-01-01 09:30:00"), "view", 1.0))
    val df = rows.toDF("event_id", "ts", "event_type", "value")
    // two files -> two micro-batch inputs
    df.filter($"event_id" <= 2).coalesce(1).write.parquet(s"$dir/in1.parquet")
    df.filter($"event_id" > 2).coalesce(1).write.parquet(s"$dir/in2.parquet")

    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").parquet(dir + "/*")
    val q = StreamingOps.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_out")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getAs[Timestamp]("window_start").toString,
          r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
          r.getAs[Double]("value_sum")))
      assert(got.toSeq == Seq(
        ("2024-01-01 09:00:00.0", "click", 2L, 4.0),
        ("2024-01-01 09:00:00.0", "view", 1L, 1.0),
        ("2024-01-01 10:00:00.0", "click", 1L, 4.0)))
    } finally q.stop()
  }

  test("complete mode aggregates watermark-late rows arriving in a later micro-batch") {
    val dir = tmpDir("stream_late")
    // batch 1 carries the LATEST event (advancing the watermark far past
    // 2024-01-01); batch 2 then delivers rows a full day older than that
    // watermark. Complete-mode aggregation must still count them — this is
    // the semantic the q285 oracle gate relies on when it stages nFiles=2
    // with an arbitrary (hash) row split.
    val newest = Seq((3L, ts("2024-01-02 10:00:00"), "click", 3.0))
    val stale = Seq(
      (1L, ts("2024-01-01 09:05:00"), "click", 1.0),
      (2L, ts("2024-01-01 09:20:00"), "view", 2.0))
    newest.toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/a.parquet")
    stale.toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/b.parquet")

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet").parquet(dir + "/*")
    val q = StreamingOps.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_late_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_late_out")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getAs[Timestamp]("window_start").toString,
          r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
          r.getAs[Double]("value_sum")))
      assert(got.toSeq == Seq(
        ("2024-01-01 09:00:00.0", "click", 1L, 1.0),
        ("2024-01-01 09:00:00.0", "view", 1L, 2.0),
        ("2024-01-02 10:00:00.0", "click", 1L, 3.0)))
    } finally q.stop()
  }
}
