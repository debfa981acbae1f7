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
    def pipeline(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("clean", Scrub.redactPii(col("text")))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("rep", Scrub.duplicateTokenRatio(col("text")))
      // deterministic per-row mixture predicate — same hash contract as batch
      .filter(substring(md5(concat(col("doc_id").cast("string"), lit(":mix"))), 1, 8)
        < lit("ffffffff") || col("source") === "src0")
    val batch = pipeline(rows.toDF("doc_id", "source", "text"))
      .collect().map(_.toSeq).toSet

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
      // and the redaction actually fired
      assert(spark.table("hyg_out").filter(col("doc_id") === 1)
        .head.getAs[String]("clean").contains("<EMAIL>"))
    } finally q.stop()
  }
}
