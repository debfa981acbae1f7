package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkFunSuite

/** Streaming CDC upsert sink: micro-batches merge into a partitioned lake
  * table with latest-version-wins semantics, and batch replays are no-ops. */
class StreamUpsertSpec extends SparkFunSuite {

  private def tableState(root: String): Set[(Long, String, Long, String)] = {
    import spark.implicits._
    spark.read.parquet(root).select("k", "part", "ver", "v")
      .as[(Long, String, Long, String)].collect().toSet
  }

  test("micro-batches merge by key; stale versions lose; replays change nothing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = tmpDir("upsert") + "/lake"
    val ckpt = tmpDir("upsert_ckpt")
    val input = MemoryStream[(Long, String, Long, String)]
    val q = StreamingOps.upsertSink(
      input.toDS().toDF("k", "part", "ver", "v"), root,
      keyCols = Seq("k"), partitionCols = Seq("part"), versionCol = "ver",
      checkpointDir = ckpt)
    try {
      input.addData((1L, "p0", 1L, "a"), (2L, "p0", 1L, "b"), (3L, "p1", 1L, "c"))
      q.processAllAvailable()
      assert(tableState(root) == Set(
        (1L, "p0", 1L, "a"), (2L, "p0", 1L, "b"), (3L, "p1", 1L, "c")))

      // batch 2: newer version for k=1, STALE version for k=2, new key 4
      input.addData((1L, "p0", 5L, "a2"), (2L, "p0", 0L, "stale"), (4L, "p1", 1L, "d"))
      q.processAllAvailable()
      assert(tableState(root) == Set(
        (1L, "p0", 5L, "a2"), (2L, "p0", 1L, "b"),
        (3L, "p1", 1L, "c"), (4L, "p1", 1L, "d")))

      // batch 3: replay of batch 2's rows — the merge must be a no-op
      input.addData((1L, "p0", 5L, "a2"), (2L, "p0", 0L, "stale"), (4L, "p1", 1L, "d"))
      q.processAllAvailable()
      assert(tableState(root) == Set(
        (1L, "p0", 5L, "a2"), (2L, "p0", 1L, "b"),
        (3L, "p1", 1L, "c"), (4L, "p1", 1L, "d")))
    } finally q.stop()
  }

  test("untouched partitions are not rewritten by a merge batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = tmpDir("upsert2") + "/lake"
    val input = MemoryStream[(Long, String, Long, String)]
    val q = StreamingOps.upsertSink(
      input.toDS().toDF("k", "part", "ver", "v"), root,
      Seq("k"), Seq("part"), "ver", tmpDir("upsert_ckpt2"))
    try {
      input.addData((1L, "p0", 1L, "a"), (2L, "p1", 1L, "b"))
      q.processAllAvailable()
      val p1FilesBefore = new java.io.File(s"$root/part=p1").listFiles().toSet
      input.addData((1L, "p0", 2L, "a2")) // touches only p0
      q.processAllAvailable()
      val p1FilesAfter = new java.io.File(s"$root/part=p1").listFiles().toSet
      assert(p1FilesBefore == p1FilesAfter, "merge rewrote an untouched partition")
    } finally q.stop()
  }

  test("crash after merge, restart from checkpoint: replay is a no-op, rest drains") {
    import spark.implicits._
    // three staged single-file batches; file source + maxFilesPerTrigger=1
    // so the restart resumes from DISK state only (like a real recovery)
    val staging = tmpDir("recover_in")
    Seq(Seq((1L, "p0", 1L, "a"), (2L, "p0", 1L, "b")),
        Seq((1L, "p0", 5L, "a2"), (3L, "p1", 1L, "c")),
        Seq((2L, "p0", 0L, "stale"), (4L, "p1", 1L, "d")))
      .zipWithIndex.foreach { case (rows, i) =>
        rows.toDF("k", "part", "ver", "v").coalesce(1)
          .write.mode("overwrite").parquet(f"$staging/p$i%03d")
      }
    val root = tmpDir("recover") + "/lake"
    val ckpt = tmpDir("recover_ckpt")
    val schema = spark.read.parquet(s"$staging/p000").schema
    StreamingOps.upsertSinkWithRecovery(spark, s"$staging/*", schema, root,
      keyCols = Seq("k"), partitionCols = Seq("part"), versionCol = "ver",
      checkpointDir = ckpt)
    // run 1 merged batch 0 then died pre-commit; run 2 replayed batch 0
    // (no-op) and drained batches 1-2 — final state equals a clean run
    assert(tableState(root) == Set(
      (1L, "p0", 5L, "a2"), (2L, "p0", 1L, "b"),
      (3L, "p1", 1L, "c"), (4L, "p1", 1L, "d")))
    // the checkpoint recorded all three batches as committed: a THIRD run
    // on the same checkpoint has nothing to do and must change nothing
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$staging/*")
    StreamingOps.upsertSink(stream, root, Seq("k"), Seq("part"), "ver", ckpt,
      trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      .awaitTermination()
    assert(tableState(root) == Set(
      (1L, "p0", 5L, "a2"), (2L, "p0", 1L, "b"),
      (3L, "p1", 1L, "c"), (4L, "p1", 1L, "d")))
  }
}
