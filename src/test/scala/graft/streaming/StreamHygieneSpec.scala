package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.operators.{Scrub, TextAnalysis}

/** The corpus-hygiene surface is per-row Catalyst expressions, so the SAME
  * operator code runs unmodified over `readStream` — no streaming variants
  * to maintain. This spec pins that unification: quality scoring, PII
  * redaction, repetition scoring and hash-mixture sampling applied to a
  * micro-batch stream must match the batch run of identical data. */
class StreamHygieneSpec extends SparkFunSuite {

  test("scrub/quality/mixture pipeline: stream output == batch output") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      (1L, "src0", "contact me at bob@example.com for the data"),
      (2L, "src1", "loop loop loop loop loop"),
      (3L, "src0", "a perfectly ordinary sentence about spark"),
      (4L, "src2", "ping 10.0.0.1 then call 555-867-5309"),
      (5L, "src1", "short"))
    def pipeline(df: org.apache.spark.sql.DataFrame) = {
      val enriched = df
        .withColumn("clean", Scrub.redactPii(col("text")))
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .withColumn("rep", Scrub.duplicateTokenRatio(col("text")))
      // the REAL hash-sampling operator (one hash contract — Sampling's own
      // doc forbids inline copies), at a fraction that actually drops rows
      graft.operators.Sampling.sampleByHash(enriched, "doc_id", 0.5)
    }
    val batch = pipeline(rows.toDF("doc_id", "source", "text"))
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty && batch.size < rows.size,
      s"fraction must drop some rows and keep some for the parity check (${batch.size})")

    val input = MemoryStream[(Long, String, String)]
    val q = pipeline(input.toDS().toDF("doc_id", "source", "text"))
      .writeStream.outputMode("append").format("memory").queryName("hyg_out").start()
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val stream = spark.table("hyg_out").collect().map(_.toSeq).toSet
      assert(stream == batch, "streaming run diverged from batch run")
      // and the redaction column actually carries redactions (PII rows are
      // planted in the fixture; whether each survives sampling is part of
      // what parity pins)
      assert(batch.exists(_.exists {
        case s: String => s.contains("<EMAIL>") || s.contains("<IP>") || s.contains("<PHONE>")
        case _ => false
      }) || batch.forall(r => r(0).asInstanceOf[Long] != 1L && r(0).asInstanceOf[Long] != 4L))
    } finally q.stop()
  }
}
