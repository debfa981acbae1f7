package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class LanguageModelSpec extends SparkFunSuite {
  import spark.implicits._

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Naive reference: identical normalization, add-one bigram model,
    * position-ordered left-fold score. */
  private def naive(train: Seq[String],
                    score: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    def toks(s: String): Seq[String] =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
        .trim.split(" ").filter(_.nonEmpty).toSeq
    def pairs(t: Seq[String]): Seq[(String, String)] =
      (LanguageModel.Bos +: t).zip(t)
    val cnt = train.map(toks).filter(_.nonEmpty).flatMap(pairs)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ctx = cnt.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val v = cnt.keys.map(_._2).toSet.size.toLong
    score.flatMap { case (id, text) =>
      val t = toks(text)
      if (t.isEmpty) None
      else {
        val nll = pairs(t).foldLeft(0.0) { case (a, (p, c)) =>
          a + -math.log((cnt.getOrElse((p, c), 0L) + 1L).toDouble /
            (ctx.getOrElse(p, 0L) + v + 1L).toDouble)
        }
        Some(id -> (t.size.toLong, round4(nll / t.size)))
      }
    }.toMap
  }

  test("trainBigram counts BOS-prefixed bigrams") {
    val train = Seq("a b a b", "a c").toDF("text")
    val got = LanguageModel.trainBigram(train, "text")
      .collect().map { case Row(p: String, c: String, n: Long) => ((p, c), n) }
      .toMap
    assert(got(("<s>", "a")) === 2L) // both docs start with 'a'
    assert(got(("a", "b")) === 2L)
    assert(got(("b", "a")) === 1L)
    assert(got(("a", "c")) === 1L)
    assert(got.values.sum === 6L) // 4 + 2 tokens = 6 bigram events
  }

  test("perplexityScore matches a hand-computed tiny model") {
    // Model from "a b" once: c(<s>,a)=1, c(a,b)=1; V=2 (a, b).
    // Scoring "a b": p(a|<s>) = (1+1)/(1+3) = 0.5, p(b|a) = 0.5
    //   -> avg_nll = ln 2.
    // Scoring "b b": p(b|<s>) = (0+1)/(1+3) = 0.25, p(b|b) = (0+1)/(0+3)
    //   -> avg_nll = (ln 4 + ln 3) / 2.
    val model = LanguageModel.trainBigram(Seq("a b").toDF("text"), "text")
    val got = LanguageModel.perplexityScore(
        Seq((1L, "a b"), (2L, "b b")).toDF("doc_id", "text"),
        "doc_id", "text", model)
      .collect().map { case Row(id: Long, n: Long, s: Double) => id -> (n, s) }
      .toMap
    assert(got(1L) === ((2L, round4(math.log(2.0)))))
    assert(got(2L) === ((2L, round4((math.log(4.0) + math.log(3.0)) / 2.0))))
  }

  test("token-less documents are dropped; training-like text scores lower") {
    val train = Seq("the quick brown fox jumps", "the quick brown dog runs")
      .toDF("text")
    val model = LanguageModel.trainBigram(train, "text")
    val docs = Seq((1L, "the quick brown fox runs"), (2L, "zzz yyy xxx www"),
      (3L, "..."), (4L, ""), (5L, null: String)).toDF("doc_id", "text")
    val got = LanguageModel.perplexityScore(docs, "doc_id", "text", model)
      .collect().map { case Row(id: Long, _, s: Double) => id -> s }.toMap
    assert(got.keySet === Set(1L, 2L)) // 3, 4, 5 have no tokens
    assert(got(1L) < got(2L)) // in-distribution text is likelier
  }

  test("an empty model fails loudly instead of scoring everything 0") {
    val empty = LanguageModel.trainBigram(
      Seq("...", "").toDF("text"), "text") // token-less training slice
    intercept[IllegalArgumentException] {
      LanguageModel.perplexityScore(
        Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", empty)
    }
  }

  test("randomized differential against the naive reference") {
    val rng = new scala.util.Random(20260813)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def doc(): String =
      Seq.fill(1 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
        .mkString(" ")
    val train = Seq.fill(30)(doc())
    val score = (1L to 60L).map(i => i -> doc())
    val model = LanguageModel.trainBigram(train.toDF("text"), "text")
    val got = LanguageModel.perplexityScore(
        score.toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map { case Row(id: Long, n: Long, s: Double) => id -> (n, s) }
      .toMap
    assert(got === naive(train, score))
  }

  test("shuffle-join fallback above the broadcast cap is value-identical") {
    val train = Seq("a b c a b", "c a b c").toDF("text")
    val docs = Seq((1L, "a b c"), (2L, "c c c")).toDF("doc_id", "text")
    val model = LanguageModel.trainBigram(train, "text")
    val bc = LanguageModel.perplexityScore(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect().toSeq
    val sj = LanguageModel.perplexityScore(docs, "doc_id", "text", model,
        maxBroadcastRows = 0L)
      .orderBy("doc_id").collect().toSeq
    assert(bc === sj)
  }

  // ---- Stupid Backoff ----

  /** Naive Stupid-Backoff reference replicating the operator's exact
    * arithmetic: one BOS-padded trigram count table, derived lower
    * orders, the left-associated 0.4 backoff chain. */
  private def naiveSbo(train: Seq[String],
                       score: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    def toks(s: String): Seq[String] =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
        .trim.split(" ").filter(_.nonEmpty).toSeq
    val B = LanguageModel.Bos
    def tris(t: Seq[String]): Seq[(String, String, String)] =
      t.indices.map { i =>
        (if (i < 2) B else t(i - 2), if (i < 1) B else t(i - 1), t(i))
      }
    val tri = train.map(toks).filter(_.nonEmpty).flatMap(tris)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bctx = tri.groupBy { case ((a, b, _), _) => (a, b) }
      .map { case (k, m) => k -> m.values.sum }
    val bi = tri.groupBy { case ((_, b, w), _) => (b, w) }
      .map { case (k, m) => k -> m.values.sum }
    val uctx = tri.groupBy { case ((_, b, _), _) => b }
      .map { case (k, m) => k -> m.values.sum }
    val uni = tri.groupBy { case ((_, _, w), _) => w }
      .map { case (k, m) => k -> m.values.sum }
    val n = tri.values.sum
    score.flatMap { case (id, text) =>
      val t = toks(text)
      if (t.isEmpty) None
      else {
        val nll = tris(t).foldLeft(0.0) { case (acc, (a, b, w)) =>
          val s =
            if (tri.getOrElse((a, b, w), 0L) > 0L)
              tri((a, b, w)).toDouble / bctx((a, b)).toDouble
            else if (bi.getOrElse((b, w), 0L) > 0L)
              0.4 * (bi((b, w)).toDouble / uctx(b).toDouble)
            else if (uni.getOrElse(w, 0L) > 0L)
              0.4 * 0.4 * (uni(w).toDouble / n.toDouble)
            else 0.4 * 0.4 * 0.4 / n.toDouble
          acc + -math.log(s)
        }
        Some(id -> (t.size.toLong, round4(nll / t.size)))
      }
    }.toMap
  }

  test("stupidBackoff: every backoff branch matches the hand computation") {
    // train: "a b c" twice and "a b d" once — so (a,b,c) is a seen
    // trigram, (b,d) a seen bigram under unseen trigram contexts, 'd' a
    // seen unigram, and 'zzz' is OOV
    val train = Seq("a b c", "a b c", "a b d")
    val score = Seq(
      (1L, "a b c"),   // pure trigram path (incl. BOS-padded positions)
      (2L, "c b d"),   // forces bigram/unigram backoff
      (3L, "zzz"),     // OOV-only
      (4L, "a b zzz")) // mixed: seen prefix, OOV tail
    val model = LanguageModel.trainTrigram(train.toDF("text"), "text")
    val got = LanguageModel.stupidBackoffScore(
        score.toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map { case Row(id: Long, n: Long, s: Double) => id -> (n, s) }
      .toMap
    val want = naiveSbo(train, score)
    assert(got === want)
    // trigram-perfect text must outscore (lower nll) backed-off text
    assert(got(1L)._2 < got(2L)._2 && got(2L)._2 < got(3L)._2)
  }

  test("stupidBackoff randomized differential against the naive reference") {
    val rng = new scala.util.Random(20260814)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "oov1")
    def doc(): String =
      Seq.fill(1 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
        .mkString(" ")
    val train = Seq.fill(25)(doc())
    val score = (1L to 50L).map(i => i -> doc())
    val model = LanguageModel.trainTrigram(train.toDF("text"), "text")
    val got = LanguageModel.stupidBackoffScore(
        score.toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map { case Row(id: Long, n: Long, s: Double) => id -> (n, s) }
      .toMap
    assert(got === naiveSbo(train, score))
  }

  test("stupidBackoff: empty model fails loudly; fallback ≡ broadcast") {
    val empty = LanguageModel.trainTrigram(Seq("").toDF("text"), "text")
    intercept[IllegalArgumentException] {
      LanguageModel.stupidBackoffScore(
        Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", empty)
    }
    val train = Seq("a b c a b", "c a b c").toDF("text")
    val docs = Seq((1L, "a b c"), (2L, "c c q")).toDF("doc_id", "text")
    val model = LanguageModel.trainTrigram(train, "text")
    val bc = LanguageModel.stupidBackoffScore(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect().toSeq
    val sj = LanguageModel.stupidBackoffScore(docs, "doc_id", "text", model,
        maxBroadcastRows = 0L)
      .orderBy("doc_id").collect().toSeq
    assert(bc === sj)
  }

  test("kneserNey: hand-computed interpolated probabilities, BOS contexts") {
    // docs "a b a b" and "b c": bigrams (<s>,a):1 (a,b):2 (b,a):1
    // (<s>,b):1 (b,c):1; every context has mass 2; 5 bigram types;
    // histories: a<-{<s>,b}=2, b<-{a,<s>}=2, c<-{b}=1
    val df = Seq("a b a b", "b c").toDF("text")
    val got = LanguageModel.kneserNey(df, "text").orderBy("prev", "cur")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7))).toSeq
    def kn(c: Long, cp: Long, nc: Long, nh: Long): Double =
      math.max(c - 0.75, 0.0) / cp + ((0.75 * nc) / cp) * (nh / 5.0)
    assert(got == Seq(
      ("<s>", "a", 1L, 2L, 2L, 2L, 5L, kn(1, 2, 2, 2)),
      ("<s>", "b", 1L, 2L, 2L, 2L, 5L, kn(1, 2, 2, 2)),
      ("a", "b", 2L, 2L, 1L, 2L, 5L, kn(2, 2, 1, 2)),
      ("b", "a", 1L, 2L, 2L, 2L, 5L, kn(1, 2, 2, 2)),
      ("b", "c", 1L, 2L, 2L, 1L, 5L, kn(1, 2, 2, 1))))
    assert(got.find(t => t._1 == "a" && t._2 == "b").get._8 == 0.775)
    intercept[IllegalArgumentException] {
      LanguageModel.kneserNey(df, "text", discount = 1.0)
    }
  }

  test("minKProbScore: hand NLL tail, slice boundary, kPct guard") {
    // model on "a b": (<s>,a):1 (a,b):1, V=2; scoring "a b c" gives
    // NLLs ln2 (pos1), ln2 (pos2), ln3 (pos3 — unseen bigram, unseen
    // context: 1/(0+2+1))
    val model = LanguageModel.trainBigram(Seq("a b").toDF("text"), "text")
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val top1 = LanguageModel.minKProbScore(docs, "doc_id", "text", model,
      kPct = 34).head // 3*34 div 100 = 1 scored position
    assert((top1.getLong(1), top1.getLong(2)) == (3L, 1L))
    assert(top1.getDouble(3) == 1.0986) // round(ln 3, 4)
    val top2 = LanguageModel.minKProbScore(docs, "doc_id", "text", model,
      kPct = 67).head // 2 scored positions: (ln3 + ln2)/2
    assert(top2.getLong(2) == 2L && top2.getDouble(3) == 0.8959)
    // kPct=100 must equal perplexityScore's all-position mean
    val all = LanguageModel.minKProbScore(docs, "doc_id", "text", model,
      kPct = 100).head
    val ppl = LanguageModel.perplexityScore(docs, "doc_id", "text", model).head
    assert(all.getDouble(3) == ppl.getDouble(2))
    intercept[IllegalArgumentException] {
      LanguageModel.minKProbScore(docs, "doc_id", "text", model, kPct = 0)
    }
  }

  test("goodTuring: textbook count-of-counts, tail null, unseen mass") {
    // "a a a b b c": counts a=3 b=2 c=1; N_r = {1:1, 2:1, 3:1}; N=6
    val df = Seq("a a a b b c").toDF("text")
    val got = LanguageModel.goodTuring(df, "text").orderBy("r")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      (1L, 1L, Some(2.0), 1.0 / 6.0),
      (2L, 1L, Some(3.0), 1.0 / 6.0),
      (3L, 1L, None, 1.0 / 6.0)))
  }
}
