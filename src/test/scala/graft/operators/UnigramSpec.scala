package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Unigram-LM trainer: every stage is replayed by an INDEPENDENT
  * driver-side reference — brute-force substring counting, exhaustive
  * enumeration of all 2^(len-1) segmentations with the documented
  * tie rule — so a DP/backtrack/prune bug cannot hide behind the
  * implementation agreeing with itself. */
class UnigramSpec extends SparkFunSuite {
  import spark.implicits._

  // ---- independent reference implementation (no Spark) ----

  private def refSubstringMass(words: Map[String, Long], maxLen: Int): Map[String, Long] = {
    val m = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, wt) <- words; i <- 0 until w.length;
         k <- 1 to math.min(maxLen, w.length - i))
      m(w.substring(i, i + k)) += wt
    m.toMap
  }

  private def refSeed(words: Map[String, Long], maxLen: Int, topK: Int): Map[String, Long] = {
    val mass = refSubstringMass(words, maxLen)
    val chars = mass.filter(_._1.length == 1)
    val multi = mass.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(topK)
    chars ++ multi
  }

  private def refScores(vocab: Map[String, Long]): Map[String, Long] = {
    val t = vocab.values.sum
    vocab.map { case (p, c) =>
      p -> math.floor(math.log(c.toDouble / t.toDouble) * 1e6 + 0.5).toLong
    }
  }

  /** All segmentations of `w` into vocab pieces, best by (score sum,
    * then the DP tie rule: prefer the longest LAST piece, then the
    * longest second-to-last, ... — i.e. the reversed length sequence
    * lexicographically largest). */
  private def refBestSeg(w: String, s: Map[String, Long], maxLen: Int): Seq[String] = {
    def segs(rest: String): Seq[Seq[String]] =
      if (rest.isEmpty) Seq(Seq.empty)
      else (1 to math.min(maxLen, rest.length)).flatMap { k =>
        val p = rest.substring(0, k)
        if (!s.contains(p)) Seq.empty
        else segs(rest.substring(k)).map(p +: _)
      }
    val all = segs(w)
    val best = all.map(seg => seg.map(s).sum).max
    all.filter(seg => seg.map(s).sum == best)
      .maxBy(seg => seg.reverse.map(_.length).padTo(w.length + 1, 0).mkString(","))
  }

  private def refViterbiCounts(words: Map[String, Long], s: Map[String, Long],
                               maxLen: Int): Map[String, Long] = {
    val m = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, wt) <- words; p <- refBestSeg(w, s, maxLen)) m(p) += wt
    m.toMap
  }

  private def refTrain(words: Map[String, Long], maxLen: Int, topK: Int,
                       keepMulti: Int, emRounds: Int): Map[String, Long] = {
    var vocab = refSeed(words, maxLen, topK)
    val chars = vocab.keySet.filter(_.length == 1)
    var counts = Map.empty[String, Long]
    for (r <- 1 to emRounds) {
      counts = refViterbiCounts(words, refScores(vocab), maxLen)
      if (r < emRounds)
        vocab = chars.map(c => c -> (counts.getOrElse(c, 0L) + 1L)).toMap ++
          counts.filter { case (p, n) => p.length > 1 && n > 0 }
            .map { case (p, n) => p -> (n + 1L) }
    }
    val multi = counts.filter(_._1.length > 1).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(keepMulti)
    chars.map(c => c -> counts.getOrElse(c, 0L)).toMap ++ multi
  }

  private val toy = Map("abab" -> 5L, "aba" -> 3L, "bb" -> 2L, "cab" -> 4L)
  private def toyDf = toy.toSeq.toDF("word", "weight")

  test("substring mass counts overlapping occurrences, weighted") {
    val got = Unigram.substringMass(toyDf, "word", "weight", maxLen = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refSubstringMass(toy, 3))
    // the hand-check that pins overlap semantics: "aba" occurs TWICE in
    // "abab"? no — but "ab" does; and "aba"/"bab" overlap inside "abab"
    assert(got("ab") == 5L * 2 + 3L + 4L) // abab has two, aba and cab one each
    assert(got("aba") == 5L + 3L)
    assert(got("bab") == 5L)
  }

  test("seed vocabulary: all chars + topK multis by (mass desc, piece)") {
    val got = Unigram.seedVocab(toyDf, "word", "weight", maxLen = 3, seedTopK = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refSeed(toy, 3, 4))
    assert(got.keySet.filter(_.length == 1) == Set("a", "b", "c"))
  }

  test("hand-replayed EM round: Viterbi counts match exhaustive enumeration") {
    val vocab = refSeed(toy, 3, 4)
    val scores = refScores(vocab)
    val scoresDf = scores.toSeq.toDF("piece", "s_e6")
    val got = Unigram.viterbiCounts(toyDf, "word", "weight", scoresDf, maxLen = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refViterbiCounts(toy, scores, 3),
      s"got $got vs ref ${refViterbiCounts(toy, scores, 3)}")
  }

  test("tie rule: equal-score segmentations resolve to the longest piece from the end") {
    // hand-crafted integer scores (score units, not logs — the operator
    // only ever ADDS them) where EVERY segmentation of "abab" over
    // {a, b, ab, bab} ties at -30: the backtrack at pos 4 must prefer
    // the LONGEST last piece, 'bab' (smallest start index 1)
    val scoresTie = Seq(("a", -5L), ("b", -10L), ("ab", -15L), ("bab", -25L))
      .toDF("piece", "s_e6")
    val got = Unigram.viterbiCounts(Seq(("abab", 1L)).toDF("word", "weight"),
        "word", "weight", scoresTie, maxLen = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "bab" -> 1L), s"got $got")
    // and the independent reference agrees with the same rule
    val ref = refViterbiCounts(Map("abab" -> 1L),
      Map("a" -> -5L, "b" -> -10L, "ab" -> -15L, "bab" -> -25L), 3)
    assert(ref == got)
  }

  test("train end-to-end equals the reference, emRounds 1 and 2") {
    for (rounds <- Seq(1, 2)) {
      val got = Unigram.train(toyDf, "word", "weight", maxLen = 3,
          seedTopK = 4, keepMulti = 2, emRounds = rounds)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == refTrain(toy, 3, 4, 2, rounds),
        s"rounds=$rounds: $got vs ${refTrain(toy, 3, 4, 2, rounds)}")
    }
  }

  test("property: random corpora, trainer == enumeration reference") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 5).foreach { _ =>
      val words = (1 to 8).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.groupBy(identity).map { case (w, g) => w -> (g.size * (1 + rnd.nextInt(4))).toLong }
      val df = words.toSeq.toDF("word", "weight")
      val got = Unigram.train(df, "word", "weight", maxLen = 3,
          seedTopK = 5, keepMulti = 3, emRounds = 2)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val ref = refTrain(words, 3, 5, 3, 2)
      assert(got == ref, s"words=$words\ngot=$got\nref=$ref")
    }
  }

  test("serving path: scores formula and per-slice fertility match the reference") {
    val words = toy
    val vocab = refTrain(words, 3, 4, 2, 1)
    // servingScores replays floor(ln((n+1)/T')*1e6+0.5), T' = sum(n+1)
    val t1 = vocab.values.map(_ + 1L).sum
    val expectScores = vocab.map { case (p, n) =>
      p -> math.floor(math.log((n + 1).toDouble / t1.toDouble) * 1e6 + 0.5).toLong
    }
    val vocabDf = vocab.toSeq.toDF("piece", "n_uses")
    val gotScores = Unigram.servingScores(vocabDf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotScores == expectScores)
    // fertility: two slices, words drawn from the toy vocabulary's charset
    val docs = Seq(
      ("en", "a", "abab cab bb"),
      ("en", "b", "aba aba"),
      ("fr", "a", "cab abab abab"))
      .toDF("lang", "source", "text")
    val got = Unigram.fertility(docs, "text", Seq("lang", "source"),
        vocabDf.sparkSession.createDataFrame(
          gotScores.toSeq.map(p => (p._1, p._2))).toDF("piece", "s_e6"),
        maxLen = 3, maxWordLen = 12)
      .orderBy("lang", "source").collect()
    // reference: enumerate each word's best segmentation under the scores
    def nTok(w: String) = refBestSeg(w, expectScores, 3).size
    val expect = Seq(
      ("en", "a", Seq("abab", "cab", "bb")),
      ("en", "b", Seq("aba", "aba")),
      ("fr", "a", Seq("cab", "abab", "abab")))
      .map { case (l, s, ws) =>
        val nw = ws.size.toLong
        val nt = ws.map(nTok(_).toLong).sum
        val nc = ws.map(_.length.toLong).sum
        (l, s, nw, nt, nc, nt.toDouble / nw, nc.toDouble / nt)
      }
    val gotT = got.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(gotT == expect, s"got $gotT vs $expect")
    // words longer than maxWordLen are skipped (the bounded-DP contract)
    val longDoc = Seq(("xx", "x", "abababababababab ab")).toDF("lang", "source", "text")
    val g2 = Unigram.fertility(longDoc, "text", Seq("lang", "source"),
      gotScores.toSeq.toDF("piece", "s_e6"), maxLen = 3, maxWordLen = 12)
      .collect()
    assert(g2.length == 1 && g2(0).getLong(2) == 1L, "16-char word must be skipped")
  }

  test("guards") {
    intercept[IllegalArgumentException] {
      Unigram.train(toyDf, "word", "weight", maxLen = 1)
    }
    intercept[IllegalArgumentException] {
      Unigram.train(toyDf, "word", "weight", seedTopK = 2, keepMulti = 3)
    }
    intercept[IllegalArgumentException] {
      Unigram.train(toyDf, "word", "weight", emRounds = 0)
    }
  }
}
