package graft.operators

import scala.util.Random

import org.apache.spark.sql.Row

import graft.SparkFunSuite

class NoveltySpec extends SparkFunSuite {
  import spark.implicits._

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Naive reference: identical normalization, per-doc DISTINCT n-grams,
    * set-membership against the reference's distinct grams. */
  private def naive(docs: Seq[(Long, String)], ref: Seq[String],
                    n: Int): Map[Long, (Long, Long, Option[Double])] = {
    def toks(s: String): Seq[String] =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
        .trim.split(" ").filter(_.nonEmpty).toSeq
    def grams(s: String): Set[String] =
      toks(s).sliding(n).filter(_.size == n).map(_.mkString(" ")).toSet
    val dict = ref.flatMap(grams).toSet
    docs.map { case (id, text) =>
      val g = grams(text)
      val novel = g.count(!dict.contains(_)).toLong
      id -> (g.size.toLong, novel,
        if (g.isEmpty) None else Some(round4(novel.toDouble / g.size)))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], ref: Seq[String], n: Int,
                  maxBroadcastRows: Long = 50000000L) =
    Novelty.ngramNovelty(
        docs.toDF("doc_id", "text"),
        ref.map(Tuple1(_)).toDF("text").withColumn("doc_id",
          org.apache.spark.sql.functions.lit(0L)),
        "doc_id", "text", n, maxBroadcastRows)
      .collect().map { r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))) }.toMap

  test("hand-computed corners: identical, disjoint, mixed, too-short") {
    val ref = Seq("a b c d e")
    val docs = Seq(
      1L -> "a b c d e",  // all 3 trigrams seen -> novelty 0
      2L -> "x y z w",    // both trigrams novel -> novelty 1
      3L -> "a b c x y z",// {a b c} seen; {b c x, c x y, x y z} novel
      4L -> "a b")        // < 3 tokens -> 0 grams, null novelty
    val got = run(docs, ref, 3)
    assert(got(1L) === ((3L, 0L, Some(0.0))))
    assert(got(2L) === ((2L, 2L, Some(1.0))))
    assert(got(3L) === ((4L, 3L, Some(0.75))))
    assert(got(4L) === ((0L, 0L, None)))
    assert(got.size === docs.size) // every input row is reported
  }

  test("repeated grams count once: novelty is over DISTINCT grams") {
    // "q r s q r s q r s": distinct trigrams {q r s, r s q, s q r}.
    val got = run(Seq(5L -> "q r s q r s q r s"), Seq("q r s"), 3)
    assert(got(5L)._1 === 3L)
    assert(got(5L)._2 === 2L) // only "q r s" is in the reference
    assert(got(5L)._3 === Some(round4(2.0 / 3)))
  }

  test("randomized differential against the naive reference") {
    val rnd = new Random(11)
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "gold")
    def doc(): String =
      Seq.fill(rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = (1L to 80L).map(i => i -> doc())
    val ref = Seq.fill(15)(doc())
    assert(run(docs, ref, 3) === naive(docs, ref, 3))
    assert(run(docs, ref, 2) === naive(docs, ref, 2))
  }

  test("null / empty / punctuation-only documents report zero grams, null novelty") {
    val docs = Seq(1L -> (null: String), 2L -> "", 3L -> "?!.", 4L -> "a b c")
    val got = run(docs, Seq("a b c"), 3)
    for (id <- Seq(1L, 2L, 3L)) assert(got(id) === ((0L, 0L, None)))
    assert(got(4L) === ((1L, 0L, Some(0.0))))
  }

  test("shuffle-join fallback above the broadcast cap is value-identical") {
    val docs = Seq(1L -> "m n o p", 2L -> "o p q r")
    val ref = Seq("m n o", "p q r s")
    assert(run(docs, ref, 3) === run(docs, ref, 3, maxBroadcastRows = 0L))
  }

  test("plan: the reference dictionary broadcasts below the cap") {
    // The corpus gram stream must join the dictionary map-side — a
    // sort-merge here would shuffle the whole corpus's grams by hash.
    val docs = (1L to 20L).map(i => (i, "e f g h i")).toDF("doc_id", "text")
    val ref = Seq(Tuple1("e f g")).toDF("text")
      .withColumn("doc_id", org.apache.spark.sql.functions.lit(0L))
    val plan = Novelty.ngramNovelty(docs, ref, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dict join must broadcast")
  }
}
