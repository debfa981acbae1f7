package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkFunSuite
import graft.operators.Chunk

/** Content-defined chunking on a stream — the incremental-ingest shape:
  * newly crawled documents are chunked as they arrive (stateless per-row
  * map work, append mode, no state store), and the chunk keys feed the
  * incremental dedup ledger downstream. Proves `Chunk.contentChunks`
  * runs unmodified on a streaming input with batch-identical output. */
class StreamChunkSpec extends SparkFunSuite {

  test("contentChunks chunks a document stream in append mode") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Seq(
      1L -> ("alpha bravo charlie delta echo foxtrot golf hotel india " +
        "juliet kilo lima mike november oscar papa quebec romeo sierra " +
        "tango uniform victor whiskey xray yankee zulu one two three"),
      2L -> "short doc",
      3L -> "")
    val expected = Chunk.contentChunks(
        docs.toDF("doc_id", "text"), "doc_id", "text", 16, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(4),
        r.getString(5))).sortBy(r => (r._1, r._2)).toSeq

    val input = MemoryStream[(Long, String)]
    val q = Chunk.contentChunks(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text", 16, 8)
      .writeStream.outputMode("append")
      .format("memory").queryName("chunk_stream").start()
    try {
      input.addData(docs.take(1): _*)
      q.processAllAvailable()
      input.addData(docs.drop(1): _*)
      q.processAllAvailable()
      val got = spark.table("chunk_stream")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(4),
          r.getString(5))).sortBy(r => (r._1, r._2)).toSeq
      assert(got === expected, "streaming chunks must equal batch chunks")
      assert(got.map(_._1).distinct === Seq(1L, 2L)) // empty doc 3 absent
      assert(got.count(_._1 == 1L) >= 2, "long doc must split")
    } finally q.stop()
  }
}
