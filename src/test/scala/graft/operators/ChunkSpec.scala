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

  test("contrastivePairs: anchors/positives are the first two windows; ring matches md5 order") {
    import org.apache.spark.sql.functions.col
    // chunkTokens=2: docs need >= 3 tokens (a second window) to be eligible
    val docs = Seq(
      (1L, "a1 a2 a3 a4"), (2L, "b1 b2 b3"), (3L, "c1 c2 c3 c4 c5"),
      (4L, "d1 d2"),                        // one window only: excluded
      (5L, "e1 e2 e3")).toDF("doc_id", "text")
    val got = Chunk.contrastivePairs(docs, "doc_id", "text", chunkTokens = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4)))
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 5L), s"doc 4 must be excluded: ${got.toSeq}")
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == "a1 a2" && byId(1L)._3 == "a3 a4")
    assert(byId(2L)._2 == "b1 b2" && byId(2L)._3 == "b3")
    // replicate the ring: md5(id:neg), bucket = first hex char, next-cyclic
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ring = Seq(1L, 2L, 3L, 5L).map(i => (i, md5hex(s"$i:neg")))
      .groupBy(_._2.take(1))
    ring.values.foreach { members =>
      val order = members.sortBy(m => (m._2, m._1)).map(_._1)
      order.zipWithIndex.foreach { case (id, i) =>
        val wantNeg = order((i + 1) % order.size)
        assert(byId(id)._4 == wantNeg,
          s"doc $id negative: got ${byId(id)._4}, want $wantNeg (ring $order)")
        assert(byId(id)._5 == byId.get(wantNeg).map(_._2).getOrElse(byId(id)._5))
      }
    }
    // a single eligible doc wraps to itself
    val solo = Chunk.contrastivePairs(
      Seq((9L, "x1 x2 x3")).toDF("doc_id", "text"), "doc_id", "text", 2).head
    assert(solo.getLong(3) == 9L, "singleton bucket must wrap to itself")
    intercept[IllegalArgumentException] {
      Chunk.contrastivePairs(docs, "doc_id", "text", chunkTokens = 0)
    }
    assert(Chunk.contrastivePairs(docs.filter(col("doc_id") < 0L),
      "doc_id", "text", 2).count() == 0L, "empty input yields empty output")
  }
}
