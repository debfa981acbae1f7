package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.functions.Sketches

/** Sketch aggregates are ordinary Catalyst `TypedImperativeAggregate`s, so
  * they run unmodified inside a Structured Streaming grouped aggregation —
  * the state store holds the fixed-size sketch buffer per group, never the
  * values. That is the streaming distinct-count story at scale: per-window
  * HLL state is 2^p bytes regardless of stream volume, where an exact
  * `approx_count_distinct`-free distinct would buffer the keys.
  *
  * The spec pins stream ≡ batch: the complete-mode aggregate over a
  * replayed stream must equal the batch aggregate of identical data —
  * byte-identical sketches, identical estimates, identical frequent-item
  * summaries (HLL merge is order-free; MG is exact below capacity). */
class StreamSketchSpec extends SparkFunSuite {

  test("windowless grouped sketch over a stream == batch (estimate + freq items)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = (1 to 600).map(i => (s"src${i % 3}", s"doc-${i % 97}"))

    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("source")
      .agg(
        Sketches.hllEstimate(Sketches.hllSketch(col("fp"), 12)).as("n_distinct_est"),
        Sketches.freqItems(col("fp"), 128).as("fi"))
      .select(col("source"), col("n_distinct_est"),
        // MG below capacity is exact: project a stable, comparable view
        expr("aggregate(fi, 0L, (a, x) -> a + x.cnt)").as("fi_total"),
        size(col("fi")).as("fi_size"))

    val batch = agg(rows.toDF("source", "fp"))
      .collect().map(_.toSeq).toSet

    val input = MemoryStream[(String, String)]
    val q = agg(input.toDS().toDF("source", "fp"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("sketch_out").start()
    try {
      input.addData(rows.take(250): _*)
      q.processAllAvailable()
      input.addData(rows.drop(250): _*)
      q.processAllAvailable()
      val stream = spark.table("sketch_out").collect().map(_.toSeq).toSet
      assert(stream == batch, "streaming sketch aggregate diverged from batch")
    } finally q.stop()
  }

  test("grouped quantile sketch over a stream: exact below capacity, bounded above") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // three cold sources of 200 values (< k=256: no compaction, answers
    // exact) plus one hot source of 2000 (> k: the MRL rank bound holds);
    // per-group streaming state is the fixed-size sketch either way —
    // the streaming percentile shape that never buffers the values
    val cold = for (s <- 0 to 2; v <- 1 to 200) yield (s"src$s", v.toDouble)
    val hot = (1 to 2000).map(v => ("hot", v.toDouble))
    val rows = new scala.util.Random(5).shuffle(cold ++ hot)
    val k = 256

    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("source")
      .agg(Sketches.quantileSketch(col("v"), k).as("sk"))
      .select(col("source"),
        Sketches.quantileSketchQuery(col("sk"), lit(0.5)).as("p50"))

    def check(got: Map[String, Double]): Unit = {
      // cold: rank ceil(0.5·200) = 100 exactly
      for (s <- 0 to 2) assert(got(s"src$s") == 100.0, s"src$s: ${got(s"src$s")}")
      // hot: H = ceil(log2(2000/256)) = 3 -> bound 3·2000/(2·256) ≈ 12
      assert(math.abs(got("hot") - 1000.0) <= 12.0, s"hot: ${got("hot")}")
    }

    check(agg(rows.toDF("source", "v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap)

    val input = MemoryStream[(String, Double)]
    val q = agg(input.toDS().toDF("source", "v"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("qs_out").start()
    try {
      input.addData(rows.take(1100): _*)
      q.processAllAvailable()
      input.addData(rows.drop(1100): _*)
      q.processAllAvailable()
      check(spark.table("qs_out")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap)
    } finally q.stop()
  }

  test("watermarked event-time window distinct estimate == batch window aggregate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // two 10-minute windows of events; per-window distinct users via HLL.
    // State per window is one 1 KiB sketch regardless of event volume —
    // the streaming distinct-count shape that never buffers keys.
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = (0 until 400).map(i => (at(i % 18), s"user-${i % 37}"))

    def agg(df: org.apache.spark.sql.DataFrame) = df
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(Sketches.hllEstimate(Sketches.hllSketch(col("user"), 10)).as("n_users_est"))
      .select(col("window.start").as("ws"), col("n_users_est"))

    val batch = rows.toDF("ts", "user")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(Sketches.hllEstimate(Sketches.hllSketch(col("user"), 10)).as("n_users_est"))
      .select(col("window.start").as("ws"), col("n_users_est"))
      .collect().map(_.toSeq).toSet

    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = agg(input.toDS().toDF("ts", "user"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("wm_sketch_out").start()
    try {
      input.addData(rows.take(150): _*)
      q.processAllAvailable()
      input.addData(rows.drop(150): _*)
      q.processAllAvailable()
      val stream = spark.table("wm_sketch_out").collect().map(_.toSeq).toSet
      assert(stream == batch, "watermarked windowed sketch diverged from batch")
      assert(stream.size == 2) // minutes 0-17 span two 10-minute windows
    } finally q.stop()
  }

  test("grouped KMV sketch over a stream == batch (sketch + distinct estimate)") {
    // the KMV buffer is a <= k ordered set — fixed-size streaming state
    // like the other sketches, and a pure function of the key SET, so
    // replay order / micro-batch boundaries cannot change it
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.SetSketch
    val rows = (1 to 900).map(i => (s"src${i % 3}", (i % 211).toLong))

    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("source")
      .agg(SetSketch.kmvSketch(col("id"), 64).as("kmv"))
      .select(col("source"), col("kmv"),
        SetSketch.kmvDistinct(col("kmv"), 64).as("est"))

    val batch = agg(rows.toDF("source", "id")).collect().map(_.toSeq).toSet
    val input = MemoryStream[(String, Long)]
    val q = agg(input.toDS().toDF("source", "id"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("kmv_out").start()
    try {
      input.addData(rows.take(400): _*)
      q.processAllAvailable()
      input.addData(rows.drop(400): _*)
      q.processAllAvailable()
      val stream = spark.table("kmv_out").collect().map(_.toSeq).toSet
      assert(stream == batch, "streaming KMV sketch diverged from batch")
    } finally q.stop()
  }
}
