package graft.operators

import scala.util.Random

import org.apache.spark.sql.Row

import graft.SparkFunSuite

class KeywordsSpec extends SparkFunSuite {
  import spark.implicits._

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def polyHash(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 257L + c.toLong) % 1000000007L)

  /** Naive reference: identical normalization, counts, single-multiply
    * score, and (tfidf DESC, polyHash ASC) per-document rank. */
  private def naive(docs: Seq[(Long, String)],
                    k: Int): Seq[(Long, Int, String, Long, Double)] = {
    def toks(s: String): Seq[String] =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
        .trim.split(" ").filter(_.nonEmpty).toSeq
    val tf = docs.flatMap { case (id, t) => toks(t).map(id -> _) }
      .groupBy(identity).map { case ((id, w), v) => (id, w) -> v.size.toLong }
    val df = tf.keys.groupBy(_._2).map { case (w, v) => w -> v.size.toLong }
    val n = tf.keys.map(_._1).toSet.size.toDouble
    tf.toSeq.map { case ((id, w), c) =>
        (id, w, c, round4(c.toDouble * math.log(n / df(w).toDouble)))
      }
      .groupBy(_._1).toSeq.flatMap { case (id, rows) =>
        rows.sortBy { case (_, w, _, s) => (-s, polyHash(w)) }.take(k)
          .zipWithIndex.map { case ((_, w, c, s), i) => (id, i + 1, w, c, s) }
      }
      .sortBy(r => (r._1, r._2))
  }

  private def run(docs: Seq[(Long, String)], k: Int,
                  maxBroadcastRows: Long = 50000000L) =
    Keywords.tfidfKeywords(docs.toDF("doc_id", "text"), "doc_id", "text",
        k, maxBroadcastRows)
      .collect().map { case Row(id: Long, r: Int, w: String, c: Long, s: Double) =>
        (id, r, w, c, s) }.sortBy(r => (r._1, r._2)).toSeq

  test("hand-computed tiny corpus, including a tie broken by hash") {
    val docs = Seq(1L -> "apple banana apple", 2L -> "banana cherry",
      3L -> "cherry dates cherry")
    // N=3; df: apple 1, banana 2, cherry 2, dates 1.
    val got = run(docs, 2)
    val d1 = got.filter(_._1 == 1L)
    assert(d1.head === ((1L, 1, "apple", 2L, round4(2 * math.log(3.0)))))
    assert(d1(1) === ((1L, 2, "banana", 1L, round4(math.log(1.5)))))
    // doc 2: banana and cherry tie at ln(1.5) — hash decides, replayably.
    val d2 = got.filter(_._1 == 2L).map(_._3)
    val expOrder = Seq("banana", "cherry").sortBy(polyHash)
    assert(d2 === expOrder)
    assert(got === naive(docs, 2))
  }

  test("documents with no tokens are absent; k bounds each document") {
    val docs = Seq(1L -> "one two three four", 2L -> "???", 3L -> "",
      4L -> (null: String))
    val got = run(docs, 3)
    assert(got.map(_._1).distinct === Seq(1L))
    assert(got.size === 3)
    assert(got.map(_._2) === Seq(1, 2, 3))
  }

  test("randomized differential against the naive reference") {
    val rnd = new Random(13)
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu")
    val docs = (1L to 50L).map(i =>
      i -> Seq.fill(2 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    assert(run(docs, 3) === naive(docs, 3))
  }

  test("shuffle-join fallback above the broadcast cap is value-identical") {
    val docs = Seq(1L -> "p q r p", 2L -> "q r s", 3L -> "p s t")
    assert(run(docs, 2) === run(docs, 2, maxBroadcastRows = 0L))
  }

  test("plan: the df table broadcasts into the scoring join below the cap") {
    val docs = (1L to 20L).map(i => (i, "w x y z w")).toDF("doc_id", "text")
    val plan = Keywords.tfidfKeywords(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "df join must broadcast")
  }

  test("tfidfKeywordsFromTf over a shared tfTable is value-identical") {
    val rnd = new Random(31)
    val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox", "gnu")
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(2 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))).toDF("doc_id", "text")
    val shared = TextAnalysis.tfTable(docs, "doc_id", "text")
    val a = Keywords.tfidfKeywords(docs, "doc_id", "text", 3)
      .orderBy("doc_id", "rank").collect().toSeq
    val b = Keywords.tfidfKeywordsFromTf(shared, "doc_id", 3)
      .orderBy("doc_id", "rank").collect().toSeq
    assert(a === b)
  }
}
