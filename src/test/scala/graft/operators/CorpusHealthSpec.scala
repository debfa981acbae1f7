package graft.operators

import scala.util.Random

import graft.SparkFunSuite

class CorpusHealthSpec extends SparkFunSuite {
  import spark.implicits._

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def polyHash(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 257L + c.toLong) % 1000000007L)

  /** Naive reference: identical counts, identical (count DESC, hash ASC)
    * rank order, identical ascending-index fold of the four slope sums. */
  private def naive(docs: Seq[(String, String)],
                    topN: Int): Map[String, (Long, Long, Double, Double, Option[Double])] = {
    def toks(s: String): Seq[String] =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
        .trim.split(" ").filter(_.nonEmpty).toSeq
    docs.groupBy(_._1).map { case (g, rows) =>
      val cnt = rows.flatMap(r => toks(r._2)).groupBy(identity)
        .map { case (w, v) => w -> v.size.toLong }
      val nTok = cnt.values.sum
      val vocab = cnt.size.toLong
      val hapax = cnt.values.count(_ == 1L).toLong
      val cs = cnt.toSeq.sortBy { case (w, c) => (-c, polyHash(w)) }
        .take(topN).map(_._2.toDouble)
      val slope = if (cs.size < 2) None else {
        val n = cs.size
        def fold(f: Int => Double): Double =
          (1 to n).foldLeft(0.0)((a, i) => a + f(i))
        val sx = fold(i => math.log(i.toDouble))
        val sy = fold(i => math.log(cs(i - 1)))
        val sxy = fold(i => math.log(i.toDouble) * math.log(cs(i - 1)))
        val sxx = fold(i => math.log(i.toDouble) * math.log(i.toDouble))
        Some(round4((n * sxy - sx * sy) / (n * sxx - sx * sx)))
      }
      g -> (nTok, vocab, round4(vocab.toDouble / nTok),
        round4(hapax.toDouble / vocab), slope)
    }
  }

  private def run(docs: Seq[(String, String)], topN: Int = 100) =
    Profile.corpusHealth(docs.toDF("src", "text"), "src", "text", topN)
      .collect().map { r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))) }.toMap

  test("hand-computed slice: counts, ttr, hapax, and a two-point slope") {
    // "a a a a b b c" -> counts a=4, b=2, c=1; n=7, vocab=3, hapax=1.
    val got = run(Seq("s" -> "a a a a b b", "s" -> "c"), topN = 2)
    // top-2 ranks: (1, 4), (2, 2) -> slope = ln(2)-ln(4) / ... exact:
    // points (ln1, ln4), (ln2, ln2): slope = (ln2-ln4)/(ln2-ln1) = -1.
    assert(got("s") === ((7L, 3L, round4(3.0 / 7), round4(1.0 / 3),
      Some(-1.0))))
  }

  test("degenerate slices: single-token vocab has null slope") {
    val got = run(Seq("a" -> "x x x", "b" -> "y z"))
    assert(got("a") === ((3L, 1L, round4(1.0 / 3), 0.0, None)))
    assert(got("b")._5.isDefined)
  }

  test("a null group key is reported as its own slice, not dropped") {
    val docs = Seq(("a", "p q r"), (null: String, "s t u v"))
      .toDF("src", "text")
    val got = Profile.corpusHealth(docs, "src", "text", 100).collect()
    assert(got.length === 2)
    val nullRow = got.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) === 4L && nullRow.getLong(2) === 4L)
  }

  test("randomized differential against the naive reference") {
    val rnd = new Random(29)
    // Zipf-ish draws so ranks have real structure
    val vocab = (1 to 40).map(i => s"w$i")
    def draw(): String = vocab(math.min(39,
      (math.pow(rnd.nextDouble(), 2.5) * 40).toInt))
    val docs = (1 to 100).map(_ =>
      s"s${rnd.nextInt(3)}" -> Seq.fill(5 + rnd.nextInt(30))(draw())
        .mkString(" "))
    assert(run(docs, topN = 20) === naive(docs, 20))
    assert(run(docs, topN = 100) === naive(docs, 100))
  }

  test("natural-ish text slopes near -1; uniform text slopes near 0") {
    val rnd = new Random(31)
    val vocab = (1 to 50).map(i => s"t$i")
    // harmonic (Zipf) sampling vs uniform sampling
    val weights = vocab.indices.map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / weights.sum)
    def zipfDraw(): String = {
      val u = rnd.nextDouble(); vocab(cum.indexWhere(u <= _))
    }
    val zipf = (1 to 400).map(_ => "z" -> Seq.fill(40)(zipfDraw()).mkString(" "))
    val unif = (1 to 400).map(_ => "u" ->
      Seq.fill(40)(vocab(rnd.nextInt(50))).mkString(" "))
    val got = run(zipf ++ unif, topN = 50)
    assert(got("z")._5.get < -0.7, s"zipf slope ${got("z")._5}")
    assert(got("u")._5.get > -0.3, s"uniform slope ${got("u")._5}")
  }

  test("corpusHealthFromTf over a carry-column tfTable is value-identical") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("red", "blue", "green", "teal", "cyan", "pink")
    val docs = (1L to 60L).map { i =>
      (i, if (i % 2 == 0) "en" else "de",
        Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val shared = TextAnalysis.tfTable(docs, "doc_id", "text",
      carryCols = Seq("lang"))
    val a = Profile.corpusHealth(docs, "lang", "text", topN = 4)
      .orderBy("lang").collect().toSeq
    val b = Profile.corpusHealthFromTf(shared, "lang", topN = 4)
      .orderBy("lang").collect().toSeq
    assert(a === b)
  }
}
