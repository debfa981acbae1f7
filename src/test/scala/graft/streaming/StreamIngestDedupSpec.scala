package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkFunSuite

/** Streaming dedup ingest: novel-only admission against a persistent
  * fingerprint ledger, per-batch output directories, replay-idempotent. */
class StreamIngestDedupSpec extends SparkFunSuite {
  import spark.implicits._

  private def outState(root: String): Set[(Long, String)] =
    spark.read.parquet(root).select("id", "fp")
      .as[(Long, String)].collect().toSet

  test("batches admit intra-batch-first, ledger-novel rows; replay rewrites identically") {
    val out = tmpDir("ingest") + "/out"
    val ledger = tmpDir("ingest") + "/ledger"
    // batch 0: c is an intra-batch duplicate of a (same fp, higher id)
    val b0 = Seq((1L, "fpA"), (2L, "fpB"), (3L, "fpA")).toDF("id", "fp")
    val n0 = StreamingOps.dedupIngestBatch(b0, 0L, "id", "fp", out, ledger)
    assert(n0 == 2L && outState(out) == Set((1L, "fpA"), (2L, "fpB")))

    // batch 1: fpB is a ledger duplicate; fpC is novel
    val b1 = Seq((10L, "fpB"), (11L, "fpC")).toDF("id", "fp")
    val n1 = StreamingOps.dedupIngestBatch(b1, 1L, "id", "fp", out, ledger)
    assert(n1 == 1L)
    assert(outState(out) == Set((1L, "fpA"), (2L, "fpB"), (11L, "fpC")))

    // REPLAY batch 1 (crash-after-merge shape): the ledger already holds
    // fpC from batch 1, but dedup runs against ledger-minus-this-batch, so
    // the identical row re-admits and the output directory is rewritten
    // byte-identically instead of being emptied
    val n1r = StreamingOps.dedupIngestBatch(b1, 1L, "id", "fp", out, ledger)
    assert(n1r == 1L, "replay must re-admit its own rows, not erase them")
    assert(outState(out) == Set((1L, "fpA"), (2L, "fpB"), (11L, "fpC")))

    // batch 2 still sees fpC as a duplicate (owned by batch 1)
    val b2 = Seq((20L, "fpC"), (21L, "fpD")).toDF("id", "fp")
    val n2 = StreamingOps.dedupIngestBatch(b2, 2L, "id", "fp", out, ledger)
    assert(n2 == 1L)
    assert(outState(out) ==
      Set((1L, "fpA"), (2L, "fpB"), (11L, "fpC"), (21L, "fpD")))

    // the ledger grew with distinct content only, sharded by fp prefix
    val led = spark.read.parquet(ledger)
    assert(led.select("fp").as[String].collect().toSet ==
      Set("fpA", "fpB", "fpC", "fpD"))
    assert(led.filter(col("fp_shard") =!= "f").count() == 0)
  }

  test("end-to-end stream: micro-batches dedup against the growing ledger") {
    implicit val sqlCtx = spark.sqlContext
    val out = tmpDir("ingest2") + "/out"
    val ledger = tmpDir("ingest2") + "/ledger"
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.dedupIngestSink(input.toDS().toDF("id", "fp"),
      "id", "fp", out, ledger, tmpDir("ingest2_ckpt"))
    try {
      input.addData((1L, "x"), (2L, "y"))
      q.processAllAvailable()
      input.addData((3L, "y"), (4L, "z"))
      q.processAllAvailable()
      assert(outState(out) == Set((1L, "x"), (2L, "y"), (4L, "z")))
      // the per-batch layout is readable as a partitioned column
      val byBatch = spark.read.parquet(out)
        .groupBy("ingest_batch").count().as[(Long, Long)].collect().toMap
      assert(byBatch == Map(0L -> 2L, 1L -> 1L))
    } finally q.stop()
  }
}
