package graft.operators

import scala.util.Random

import org.apache.spark.sql.Row

import graft.SparkFunSuite

class PhrasesSpec extends SparkFunSuite {
  import spark.implicits._

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def polyHash(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 257L + c.toLong) % 1000000007L)

  /** Naive reference: identical normalization and counts, identical
    * left-associated three-ln fold, identical (pmi DESC, hash ASC) rank. */
  private def naive(docs: Seq[String], k: Int,
                    minCount: Long): Seq[(Int, String, Long, Double)] = {
    def toks(s: String): Seq[String] =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
        .trim.split(" ").filter(_.nonEmpty).toSeq
    val ts = docs.map(toks)
    val uni = ts.flatten.groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    val bi = ts.filter(_.size >= 2).flatMap(t => t.zip(t.tail))
      .groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val n1 = uni.values.sum.toDouble
    val n2 = bi.values.sum.toDouble
    bi.toSeq.filter(_._2 >= minCount)
      .map { case ((a, b), cb) =>
        val pmi = round4(
          math.log(cb.toDouble / n2) - math.log(uni(a).toDouble / n1) -
            math.log(uni(b).toDouble / n1))
        (s"$a $b", cb, pmi)
      }
      .sortBy { case (g, _, pmi) => (-pmi, polyHash(g)) }
      .take(k).zipWithIndex
      .map { case ((g, cb, pmi), i) => (i + 1, g, cb, pmi) }
  }

  test("pmiCollocations matches a hand-computed corpus") {
    // "x y" always adjacent (cb=3), "p q"/"q p" from an alternating doc.
    val docs = Seq("x y one", "x y two", "x y three", "p q p q p")
    // Counts: x=3 y=3 p=3 q=2, pairs: (x,y)=3, (p,q)=2, (q,p)=2, singles.
    val n1 = 14.0; val n2 = 10.0
    val expXY = round4(math.log(3 / n2) - math.log(3 / n1) - math.log(3 / n1))
    val expPQ = round4(math.log(2 / n2) - math.log(3 / n1) - math.log(2 / n1))
    val got = Phrases.pmiCollocations(docs.toDF("text"), "text",
        k = 10, minCount = 2L)
      .collect().map { case Row(r: Int, g: String, c: Long, p: Double) =>
        (r, g, c, p) }
    assert(got.map(_._2).toSet === Set("x y", "p q", "q p"))
    assert(got.find(_._2 == "x y").get._4 === expXY)
    assert(got.find(_._2 == "p q").get._4 === expPQ)
    assert(got.map(_._1).toSeq === (1 to got.length))
    assert(got === naive(docs, 10, 2L).toArray)
  }

  test("minCount floor excludes rare pairs before scoring") {
    // "a b" once only: a huge PMI that must never appear at floor 2.
    val docs = Seq("a b", "c d c d c d")
    val got = Phrases.pmiCollocations(docs.toDF("text"), "text",
        k = 10, minCount = 2L).collect()
    assert(!got.map(_.getString(1)).contains("a b"))
  }

  test("randomized differential against the naive reference") {
    val rnd = new Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val docs = Seq.fill(60)(
      Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    // null / empty / punctuation-only rows must be count-inert
    val withJunk = docs ++ Seq(null, "", "?!.")
    val got = Phrases.pmiCollocations(withJunk.toDF("text"), "text",
        k = 8, minCount = 3L)
      .collect().map { case Row(r: Int, g: String, c: Long, p: Double) =>
        (r, g, c, p) }.toSeq
    assert(got === naive(docs, 8, 3L))
  }

  test("shuffle-join fallback above the broadcast cap is value-identical") {
    val docs = Seq("u v u v u v", "v w v w", "u w u w u")
    val big = Phrases.pmiCollocations(docs.toDF("text"), "text",
      k = 10, minCount = 2L).collect().toSeq
    val small = Phrases.pmiCollocations(docs.toDF("text"), "text",
      k = 10, minCount = 2L, maxBroadcastRows = 0L).collect().toSeq
    assert(big === small)
  }

  test("plan: unigram table broadcasts into the scoring joins below the cap") {
    // The pair stream must never sort-merge against the vocab table when
    // the counted gate clears — both scoring joins ride the broadcast.
    val docs = Seq.fill(20)("k l m n o k l").toDF("text")
    val plan = Phrases.pmiCollocations(docs, "text", k = 5, minCount = 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "uni joins must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "the scored pair stream must not sort-merge against the vocab table")
  }

  test("llrCollocations: hand-computed G2 on a tiny corpus") {
    // one doc "a b a b c d": bigrams (a,b)x2, (b,a), (b,c), (c,d); N=5
    // (a,b): k11=2 R1=2 C1=2 k12=0 k21=0 k22=3 R2=3 C2=3
    //   G2 = 2*(2*ln(10/4) + 3*ln(15/9))
    val df = Seq("a b a b c d").toDF("text")
    val got = Phrases.llrCollocations(df, "text", k = 10, minCount = 1L)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    def rf(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val ab = rf(2.0 * (2.0 * math.log(2.0 * 5.0 / (2.0 * 2.0)) +
      3.0 * math.log(3.0 * 5.0 / (3.0 * 3.0))))
    assert(got.head == (("a b", 2L, ab)))
    assert(got.length == 4 && got.map(_._1).toSet ==
      Set("a b", "b a", "b c", "c d"))
    // minCount floor drops singletons before scoring
    val floored = Phrases.llrCollocations(df, "text", k = 10, minCount = 2L)
      .collect()
    assert(floored.map(_.getString(1)).toSeq == Seq("a b"))
    intercept[IllegalArgumentException] {
      Phrases.llrCollocations(df, "text", k = 0)
    }
  }

  test("gloveCooc: hand-summed harmonic weights, canonical pairs, floor") {
    // "a b c a": window 4, scale 12. pairs by (i, d):
    //   (a,b,d1)=12, (a,c,d2)=6, (a,a,d3)=4,
    //   (b,c,d1)=12, (a,b,d2)=6, (a,c,d1)=12
    // canonical sums: a b=18, a c=18, b c=12, a a=4
    val df = Seq("a b c a").toDF("text")
    val got = Phrases.gloveCooc(df, "text", window = 4, k = 10,
        minScaled = 1L)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    // rank ties at 18 break on polyHash — both orders carry identical
    // payloads, so just compare as a set plus the exact values
    assert(got.toSet == Set(("a b", 18L, 1.5), ("a c", 18L, 1.5),
      ("b c", 12L, 1.0), ("a a", 4L, 4.0 / 12.0)))
    assert(got.take(2).map(_._2).forall(_ == 18L) && got(2)._2 == 12L)
    // default floor (2*scale = 24) cuts everything in this tiny corpus
    assert(Phrases.gloveCooc(df, "text", window = 4, k = 10)
      .collect().isEmpty)
    intercept[IllegalArgumentException] {
      Phrases.gloveCooc(df, "text", window = 0)
    }
  }
}
