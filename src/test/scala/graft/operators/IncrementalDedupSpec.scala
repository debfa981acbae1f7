package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class IncrementalDedupSpec extends SparkFunSuite {
  import spark.implicits._

  test("admits only first-in-batch, ledger-absent rows; null fp rejected") {
    val ledger = Seq("fpA", "fpB").toDF("fp")
    val batch = Seq(
      (10L, "fpA"),                    // in ledger -> dropped
      (11L, "fpNew"), (12L, "fpNew"),  // intra-batch dup -> keep 11
      (13L, "fpOther"),
      (14L, null.asInstanceOf[String]) // null fp -> rejected
    ).toDF("id", "fp")
    val got = IncrementalDedup.dedupBatch(batch, ledger, "id", "fp",
        expectedLedgerItems = 100L)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(11L, 13L))
  }

  test("empty ledger admits every distinct-fp batch row") {
    val ledger = Seq.empty[String].toDF("fp")
    val batch = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "fp")
    val got = IncrementalDedup.dedupBatch(batch, ledger, "id", "fp", 10L)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L))
  }

  test("full ingest loop: admit -> merge ledger -> replay admits nothing") {
    val root = tmpDir("inc_dedup") + "/ledger"
    def ledger() =
      if (graft.sources.ParquetLake.exists(spark, root)) spark.read.parquet(root)
      else Seq.empty[(String, Long)].toDF("fp", "first_id")

    val batch1 = Seq((1L, "fpA"), (2L, "fpA"), (3L, "fpB")).toDF("id", "fp")
    val admit1 = IncrementalDedup.dedupBatch(batch1, ledger(), "id", "fp", 100L)
    assert(admit1.count() == 2)
    MergeByKey.merge(spark, root,
      admit1.select(col("fp"), col("id").as("first_id")),
      Seq("fp"), Nil, "first_id")

    // replay of the SAME batch is a no-op ingest (idempotency)
    val replay = IncrementalDedup.dedupBatch(batch1, ledger(), "id", "fp", 100L)
    assert(replay.count() == 0)

    // a second batch: one seen fp, one novel
    val batch2 = Seq((10L, "fpB"), (11L, "fpC")).toDF("id", "fp")
    val admit2 = IncrementalDedup.dedupBatch(batch2, ledger(), "id", "fp", 100L)
    assert(admit2.collect().map(_.getLong(0)).toSeq == Seq(11L))
    MergeByKey.merge(spark, root,
      admit2.select(col("fp"), col("id").as("first_id")),
      Seq("fp"), Nil, "first_id")
    assert(ledger().count() == 3) // fpA, fpB, fpC — distinct content only
  }

  test("bloom false positives cannot drop a novel row (tiny sketch, heavy load)") {
    // 1-item sketch capacity + 2000 ledger keys -> fpp ~ 1: nearly every
    // batch row routes through the exact verification join, which must
    // still admit exactly the truly-novel rows
    val ledger = (1 to 2000).map(i => s"fp$i").toDF("fp")
    val batch = (1900 to 2100).map(i => (i.toLong, s"fp$i")).toDF("id", "fp")
    val got = IncrementalDedup.dedupBatch(batch, ledger, "id", "fp",
        expectedLedgerItems = 1L)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == (2001L to 2100L))
  }

  test("dedupBatch plan: window winner + bloom-routed union + exact LeftAnti residue") {
    // pin the q84 shape: one batch-sized window for the intra-batch winner,
    // then the bloom split — a definite-absent lane unioned with an exact
    // anti-join residue lane. Inspected after execution (AQE-final).
    val ledger = (1 to 500).map(i => s"fp$i").toDF("fp")
    val batch = (450 to 550).map(i => (i.toLong, s"fp$i")).toDF("id", "fp")
    val df = IncrementalDedup.dedupBatch(batch, ledger, "id", "fp", 500L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"),
      s"intra-batch winner must be the row_number window:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"the maybe-present residue must verify through an exact anti-join:\n$plan")
    assert(plan.contains("Union"),
      s"definite-absent rows must bypass the join via the union lane:\n$plan")
  }
}
