package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkFunSuite
import graft.operators.LanguageModel

/** LM quality scoring on a stream — the production curation shape: the
  * bigram model is TRAINED once on a trusted batch slice, then a
  * document stream is scored against the static model (stream-static
  * broadcast joins + one streaming aggregation for the per-document
  * fold). Proves `LanguageModel.perplexityScore` runs unmodified on a
  * streaming input and matches the batch scores value-for-value. */
class StreamLmScoreSpec extends SparkFunSuite {

  test("perplexityScore scores a document stream against a batch-trained model") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val model = LanguageModel.trainBigram(
      Seq("the quick fox", "the slow fox").toDF("text"), "text")
    val docs = Seq(
      1L -> "the quick fox",   // in-distribution
      2L -> "quick quick fox", // partly out
      3L -> "zebra blue")      // fully out-of-vocabulary
    val expected = LanguageModel.perplexityScore(
        docs.toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

    val input = MemoryStream[(Long, String)]
    val q = LanguageModel.perplexityScore(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text", model)
      .writeStream.outputMode("complete")
      .format("memory").queryName("lm_scores").start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      assert(spark.table("lm_scores").count() === 2L)
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("lm_scores")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      assert(got === expected, "streaming scores must equal batch scores")
    } finally q.stop()
  }
}
