package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** [[StreamStage.scaledSession]] — the round-16 optimization that derives a
  * streaming gate's shuffle/state parallelism from its staged input bytes
  * instead of the host core count (stateful streaming gets no AQE
  * coalescing, so the session default is the only knob). Pins the three
  * contracts the gates rely on:
  *   1. small input → small partition count (floor 2), session untouched;
  *   2. the derived count never exceeds the parent session's (cluster-scale
  *      inputs keep the configured parallelism — the "not a local[32]-only
  *      win" requirement);
  *   3. a stateful streaming aggregation on the scaled session produces the
  *      IDENTICAL result set (partition count is a layout choice). */
class StreamScaledSessionSpec extends SparkFunSuite {

  test("small staged input derives a small clone; results are identical") {
    val dir = Files.createTempDirectory("graft_scaled_in").toString
    val ev = spark.range(1000).select(
      (col("id") % 7).as("user_id"),
      timestamp_seconds(lit(1700000000L) + col("id") * 60).as("ts"),
      (col("id") % 100).as("value"))
    ev.coalesce(1).write.mode("overwrite").parquet(dir)

    val parent = spark.sessionState.conf.numShufflePartitions
    val ss = StreamStage.scaledSession(spark, Seq(dir))
    val derived = ss.sessionState.conf.numShufflePartitions
    assert(derived >= 2 && derived < parent,
      s"a ~15 KB staged input must derive a clone below the parent's " +
        s"$parent partitions (got $derived)")
    // parent session conf untouched (Verify runs queries concurrently)
    assert(spark.sessionState.conf.numShufflePartitions == parent)

    // missing path / huge bytesPerPartition=1 → capped at the parent count,
    // and the cap returns the ORIGINAL session (no pointless clone)
    assert(StreamStage.scaledSession(spark, Seq(dir), 1L) eq spark)
    assert(StreamStage.scaledSession(spark, Seq(dir + "/nope")) ne null)

    // stateful streaming agg result is partition-count-invariant
    def run(sess: org.apache.spark.sql.SparkSession): Set[Seq[Any]] = {
      val sink = Files.createTempDirectory("graft_scaled_out").toString
      val ckpt = Files.createTempDirectory("graft_scaled_ck").toString
      sess.readStream.schema(ev.schema).parquet(dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .select(col("window.start").as("ws"), col("user_id"), col("n"), col("v"))
        .writeStream.outputMode("complete")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("overwrite").parquet(sink): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      sess.read.parquet(sink).collect().map(_.toSeq).toSet
    }
    assert(run(ss) == run(spark))
  }
}
