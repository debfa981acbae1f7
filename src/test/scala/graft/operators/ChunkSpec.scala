package graft.operators

import graft.SparkFunSuite

class ChunkSpec extends SparkFunSuite {
  import spark.implicits._

  private def chunksOf(text: String, chunkTokens: Int, overlap: Int) =
    Chunk.tokenWindows(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens, overlap)
      .orderBy("chunk_id")
      .collect()
      .map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("chunk_start"),
        r.getAs[Int]("n_tokens"), r.getAs[String]("chunk_text")))

  test("non-overlapping windows cover every token exactly once") {
    val out = chunksOf("a b c d e f g", 3, 0)
    assert(out.toSeq == Seq(
      (0L, 1L, 3, "a b c"), (1L, 4L, 3, "d e f"), (2L, 7L, 1, "g")))
  }

  test("overlapping windows share exactly overlapTokens tokens") {
    val out = chunksOf("a b c d e f g", 4, 2)
    // stride 2: starts 1,3,5 — start 7 would be fully inside the remainder rule?
    // n=7, nChunks = ceil((7-4)/2)+1 = 3
    assert(out.toSeq == Seq(
      (0L, 1L, 4, "a b c d"), (1L, 3L, 4, "c d e f"), (2L, 5L, 3, "e f g")))
    // consecutive chunks overlap by exactly 2 tokens
    out.sliding(2).foreach {
      case Array((_, s1, n1, t1), (_, s2, _, t2)) =>
        assert(s2 == s1 + 2)
        assert(t1.split(" ").drop((s2 - s1).toInt).sameElements(
          t2.split(" ").take(n1 - (s2 - s1).toInt)))
      case _ =>
    }
  }

  test("short, exact-multiple, empty and null documents") {
    // shorter than one window -> a single short chunk
    assert(chunksOf("a b", 5, 2).toSeq == Seq((0L, 1L, 2, "a b")))
    // exact multiple of stride: no empty trailing chunk
    assert(chunksOf("a b c d", 2, 0).toSeq ==
      Seq((0L, 1L, 2, "a b"), (1L, 3L, 2, "c d")))
    // the last chunk is never fully contained in the previous one
    val tail = chunksOf("a b c d e", 2, 1)
    assert(tail.last == (3L, 4L, 2, "d e"))
    // blank / null text -> zero chunks, rows dropped not nulled
    assert(chunksOf("   ", 3, 0).isEmpty)
    val out = Chunk.tokenWindows(
      Seq((1L, null.asInstanceOf[String]), (2L, "x y z")).toDF("doc_id", "text"),
      "doc_id", "text", 2, 0).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(2L))
  }

  test("whitespace runs tokenize like TextAnalysis.tokenCount") {
    val out = chunksOf("  a\t\tb \n c  ", 10, 0)
    assert(out.toSeq == Seq((0L, 1L, 3, "a b c")))
  }

  test("invalid parameters are rejected") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunk.tokenWindows(df, "doc_id", "text", 0, 0)
    }
    intercept[IllegalArgumentException] {
      Chunk.tokenWindows(df, "doc_id", "text", 3, 3)
    }
  }

  test("reconstruction: concatenating non-overlap chunk texts rebuilds the normalized document") {
    val text = (1 to 257).map(i => s"tok$i").mkString(" ")
    val out = chunksOf(text, 50, 0)
    assert(out.map(_._4).mkString(" ") == text)
    assert(out.map(_._3).sum == 257)
  }
}
