package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit}

import graft.SparkFunSuite
import graft.operators.Novelty

/** Novelty scoring on a stream — the crawl-triage shape: the reference
  * dictionary is built once from the existing corpus, then an incoming
  * document stream is scored for how much NEW content it carries
  * (stream-static broadcast join + one streaming aggregation). Proves
  * `Novelty.ngramNovelty` runs unmodified on a streaming input and
  * matches the batch scores value-for-value. */
class StreamNoveltySpec extends SparkFunSuite {

  test("ngramNovelty scores a document stream against a static reference") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ref = Seq("the quick brown fox jumps over the lazy dog")
      .toDF("text").withColumn("doc_id", lit(0L))
    val docs = Seq(
      1L -> "the quick brown fox jumps",      // all trigrams known
      2L -> "a completely different sentence here", // all novel
      3L -> "the quick brown cat sleeps",     // mixed
      4L -> "too short")                      // no trigrams -> absent
    val expected = Novelty.ngramNoveltyScored(
        docs.toDF("doc_id", "text"), ref, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(_._1).toSeq

    val input = MemoryStream[(Long, String)]
    val q = Novelty.ngramNoveltyScored(
        input.toDS().toDF("doc_id", "text"), ref, "doc_id", "text", 3)
      .writeStream.outputMode("complete")
      .format("memory").queryName("novelty_scores").start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      assert(spark.table("novelty_scores").count() === 2L)
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("novelty_scores")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
        .sortBy(_._1).toSeq
      assert(got === expected, "streaming novelty must equal batch novelty")
      assert(got.map(_._1) === Seq(1L, 2L, 3L)) // gram-less doc 4 absent
      assert(got.find(_._1 == 1L).get._4 === 0.0)
      assert(got.find(_._1 == 2L).get._4 === 1.0)
    } finally q.stop()
  }
}
