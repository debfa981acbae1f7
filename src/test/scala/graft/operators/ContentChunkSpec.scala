package graft.operators

import scala.util.Random

import graft.SparkFunSuite

class ContentChunkSpec extends SparkFunSuite {
  import spark.implicits._

  /** Naive reference: identical normalization, identical 5-gram hash,
    * identical min-length boundary fold, identical slicing. */
  private def naive(text: String, divisor: Int,
                    minLen: Int): Seq[(Int, Int, Int, String)] = {
    val t = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim
    if (t.isEmpty) return Nil
    val cs = t.map(_.toLong)
    val pow = Array(4362470401L, 16974593L, 66049L, 257L, 1L)
    val gh = if (cs.length < 5) Seq.empty[Long]
      else (0 to cs.length - 5).map(i =>
        (0 until 5).map(j => cs(i + j) * pow(j)).sum % 1000000007L)
    val cand = gh.zipWithIndex.collect {
      case (h, i) if h % divisor == 0 => i + 5 // 1-based end of the gram
    }
    val kept = cand.foldLeft(Vector(0)) { (acc, p) =>
      if (p - acc.last >= minLen) acc :+ p else acc
    }
    val bd = if (kept.last == t.length) kept else kept :+ t.length
    bd.sliding(2).zipWithIndex.map { case (Seq(a, b), i) =>
      (i, a + 1, b - a, t.substring(a, b))
    }.toSeq
  }

  private def run(docs: Seq[(Long, String)], divisor: Int = 64,
                  minLen: Int = 32): Seq[(Long, Int, Int, Int, String, String)] =
    Chunk.contentChunks(docs.toDF("doc_id", "text"), "doc_id", "text",
        divisor, minLen)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getString(4), r.getString(5)))
      .sortBy(r => (r._1, r._2)).toSeq

  private def randText(rnd: Random, words: Int): String =
    Seq.fill(words)(
      Seq.fill(2 + rnd.nextInt(6))(('a' + rnd.nextInt(26)).toChar).mkString)
      .mkString(" ")

  test("chunks reconstruct the normalized document; boundaries respect minLen") {
    val rnd = new Random(17)
    val docs = (1L to 20L).map(i => i -> randText(rnd, 60))
    val got = run(docs)
    for ((id, text) <- docs) {
      val t = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim
      val ch = got.filter(_._1 == id)
      assert(ch.map(_._5).mkString === t, s"doc $id must reconstruct")
      assert(ch.head._3 === 1)
      for (Seq(a, b) <- ch.sliding(2) if b._1 == id)
        assert(b._3 === a._3 + a._4, "chunks must be contiguous")
      // every chunk except the last respects the minimum length
      for (c <- ch.dropRight(1)) assert(c._4 >= 32, s"doc $id chunk ${c._2}")
    }
  }

  test("randomized differential against the naive reference") {
    val rnd = new Random(19)
    val docs = (1L to 40L).map(i => i -> randText(rnd, 10 + rnd.nextInt(80)))
    val got = run(docs, divisor = 32, minLen = 16)
    val want = docs.flatMap { case (id, t) =>
      naive(t, 32, 16).map { case (c, s, l, x) =>
        (id, c, s, l, x, "") }
    }.sortBy(r => (r._1, r._2))
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) ===
      want.map(r => (r._1, r._2, r._3, r._4, r._5)))
  }

  test("boundaries re-synchronize after an insertion (the CDC property)") {
    val rnd = new Random(23)
    val base = randText(rnd, 120)
    val edited = "inserted words at the front " + base
    val got = run(Seq(1L -> base, 2L -> edited))
    val keys1 = got.filter(_._1 == 1L).map(_._6)
    val keys2 = got.filter(_._1 == 2L).map(_._6).toSet
    // All chunks after the first boundary beyond the edit are byte-identical
    // (same content, same local boundaries) -> shared dedup keys. Fixed
    // windows shift EVERY chunk; CDC must re-share the tail.
    val shared = keys1.count(keys2.contains)
    assert(shared >= keys1.size - 2,
      s"only $shared/${keys1.size} chunks re-synchronized")
    assert(keys1.size >= 4, "fixture must produce enough chunks to be meaningful")
  }

  test("null / empty / punctuation-only documents produce zero chunks") {
    assert(run(Seq(1L -> (null: String), 2L -> "", 3L -> "?!.")) === Nil)
  }

  test("short documents yield one whole-document chunk") {
    val got = run(Seq(1L -> "tiny"))
    assert(got === Seq((1L, 0, 1, 4, "tiny",
      got.head._6)))
  }
}
