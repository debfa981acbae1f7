package graft.operators

import java.math.BigInteger

import graft.SparkFunSuite
import graft.functions.RationalArgMax
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** WordPiece trainer + maximal-munch serving: gated by an INDEPENDENT
  * driver-side reference (exhaustive pair/symbol counting, BigInteger
  * score comparison, list-walk greedy merge) so a selection-rule or
  * munch bug cannot hide behind the implementation agreeing with
  * itself; plus direct precision probes of the RationalArgMax
  * aggregate at the edge where double arithmetic collapses. */
class WordPieceSpec extends SparkFunSuite {
  import spark.implicits._

  // ---- independent reference implementation (no Spark) ----

  /** Greedy left-to-right merge of one rule — skip 2 on a hit (the
    * published non-overlapping left-first rule: "aaa" under (a,a) →
    * ["aa","a"]). */
  private def refMerge(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  /** Reference WordPiece trainer: exact BigInteger score comparison,
    * ties to the smallest (l, r). */
  private def refTrain(words: Seq[(String, Long)],
                       merges: Int): Seq[(String, String, Long, Long, Long)] = {
    var tbl: Seq[(List[String], Long)] =
      words.map { case (w, c) => w.split("").filter(_.nonEmpty).toList -> c }
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long, Long)]
    var done = false
    for (_ <- 1 to merges if !done) {
      val pairC = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      val symC = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((syms, c) <- tbl) {
        syms.foreach(s => symC(s) += c)
        syms.zip(syms.drop(1)).foreach(p => pairC(p) += c)
      }
      if (pairC.isEmpty) done = true
      else {
        val best = pairC.toSeq.map { case ((l, r), w) =>
          (l, r, w, symC(l), symC(r))
        }.reduce { (a, b) =>
          val cmp = BigInteger.valueOf(a._3)
            .multiply(BigInteger.valueOf(b._4)).multiply(BigInteger.valueOf(b._5))
            .compareTo(BigInteger.valueOf(b._3)
              .multiply(BigInteger.valueOf(a._4)).multiply(BigInteger.valueOf(a._5)))
          if (cmp > 0) a
          else if (cmp < 0) b
          else if (Ordering[(String, String)].lt((a._1, a._2), (b._1, b._2))) a
          else b
        }
        learned += best
        tbl = tbl.map { case (syms, c) => refMerge(syms, best._1, best._2) -> c }
      }
    }
    learned.toSeq
  }

  /** Reference maximal munch: longest vocab piece at each position. */
  private def refMunch(w: String, vocab: Set[String], maxPieceLen: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val k = (math.min(maxPieceLen, w.length - i) to 1 by -1)
        .find(k => vocab.contains(w.substring(i, i + k)))
        .getOrElse(sys.error(s"no piece at $i in $w"))
      out += w.substring(i, i + k); i += k
    }
    out.toSeq
  }

  private def trainOn(words: Seq[(String, Long)], merges: Int) =
    WordPiece.trainMerges(words.toDF("word", "weight"), "word", "weight", merges)
      .orderBy("step")
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq

  test("likelihood score beats raw frequency (the rule that is NOT BPE)") {
    // pair (a,b) count 10 but a,b each appear 20 standalone times too:
    // score 10/(30·30); pair (c,d) count 2 with c,d never apart:
    // score 2/(2·2) = 0.5 wins. BPE (raw frequency) would merge (a,b).
    val words = Seq(("ab", 10L), ("a", 20L), ("b", 20L), ("cd", 2L))
    val got = trainOn(words, 1)
    assert(got == Seq(("c", "d", 2L, 2L, 2L)))
    val bpe = Bpe.trainMerges(words.toDF("word", "weight"), "word", "weight", 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(bpe == Seq(("a", "b"))) // the discriminating corpus
  }

  test("trainer matches the exhaustive reference on varied corpora") {
    val corpora = Seq(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)),
      Seq(("aaa", 3L), ("aa", 2L), ("abab", 4L)), // overlap + re-merge chains
      Seq(("xy", 1L), ("yx", 1L), ("xx", 1L), ("yy", 1L)), // dense ties
      Seq(("mississippi", 2L), ("missive", 3L), ("piping", 1L)))
    for (words <- corpora) {
      val got = trainOn(words, 6)
      val want = refTrain(words, 6)
      assert(got == want, s"corpus $words")
    }
  }

  test("rational_argmax is exact where double division inverts the order") {
    // True order: (2^53+1)/2^53 = 1+2⁻⁵³  >  (2^53+3)/(2^53+2). In double
    // the first quotient rounds DOWN to 1.0 while the second's numerator
    // rounds UP to 2^53+4 and the quotient lands at 1+2⁻⁵² — the double
    // order is INVERTED, so a double-keyed argmax picks "b".
    // Cross-multiplication keeps the true order and picks "a".
    val big = 9007199254740992L // 2^53
    val rows = Seq(
      (big + 1, big, "a", "a"),
      (big + 3, big + 2, "b", "b")).toDF("n", "d", "ta", "tb")
    assert((big + 1).toDouble / big.toDouble <
      (big + 3).toDouble / (big + 2).toDouble) // the inversion, demonstrated
    val got = rows.agg(RationalArgMax.rationalArgMax(col("n"),
      col("d").cast(DecimalType(38, 0)), col("ta"), col("tb")).as("m"))
      .select("m.tie_a").collect()(0).getString(0)
    assert(got == "a")
  }

  test("rational_argmax: exact ties break to the smallest (tie_a, tie_b)") {
    val rows = Seq((2L, 4L, "z", "q"), (1L, 2L, "a", "b"), (3L, 6L, "a", "a"))
      .toDF("n", "d", "ta", "tb")
    val got = rows.agg(RationalArgMax.rationalArgMax(col("n"),
      col("d").cast(DecimalType(38, 0)), col("ta"), col("tb")).as("m"))
      .select("m.tie_a", "m.tie_b").collect()(0)
    assert((got.getString(0), got.getString(1)) == (("a", "a")))
  }

  test("rational_argmax: empty input is null, non-positive denominator is loud") {
    val empty = Seq.empty[(Long, Long, String, String)].toDF("n", "d", "ta", "tb")
    val m = empty.agg(RationalArgMax.rationalArgMax(col("n"),
      col("d").cast(DecimalType(38, 0)), col("ta"), col("tb")).as("m"))
      .collect()(0)
    assert(m.isNullAt(0))
    val bad = Seq((1L, 0L, "a", "b")).toDF("n", "d", "ta", "tb")
    val ex = intercept[Exception] {
      bad.agg(RationalArgMax.rationalArgMax(col("n"),
        col("d").cast(DecimalType(38, 0)), col("ta"), col("tb")).as("m"))
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("vocabulary = every seen character plus the merged symbols") {
    val words = Seq(("ab", 10L), ("a", 20L), ("b", 20L), ("cd", 2L))
      .toDF("word", "weight")
    val rules = WordPiece.trainMerges(words, "word", "weight", 1)
    val vocab = WordPiece.vocabulary(words, "word", rules)
      .collect().map(_.getString(0)).toSet
    assert(vocab == Set("a", "b", "c", "d", "cd"))
  }

  test("maximal munch is longest-match-first, not BPE merge replay") {
    // vocab {a,b,c,ab,bc}: munch("abc") = [ab, c]; a BPE replay under
    // rule order (b,c) then (a,b) would give [a, bc] — the serving rules
    // genuinely differ, and this pins the munch one.
    val docs = Seq(("x", "y", "abc abc ab")).toDF("lang", "source", "text")
    val vocab = Seq("a", "b", "c", "ab", "bc").toDF("piece")
    val got = WordPiece.fertility(docs, "text", Seq("lang", "source"),
      vocab, maxPieceLen = 4, maxWordLen = 12).collect()(0)
    // abc→2 tokens ×2, ab→1 token: 5 tokens / 3 words, 8 chars
    assert(got.getAs[Long]("n_words") == 3L)
    assert(got.getAs[Long]("n_tokens") == 5L)
    assert(got.getAs[Long]("n_chars") == 8L)
    assert(got.getAs[Double]("tokens_per_word") == 5.0 / 3.0)
    assert(got.getAs[Double]("chars_per_token") == 8.0 / 5.0)
  }

  test("fertility munch matches the reference on a trained vocabulary") {
    val docs = Seq(
      ("en", "s1", "lower newest low low widest"),
      ("en", "s2", "newest newest lowest"),
      ("de", "s1", "wide wide low")).toDF("lang", "source", "text")
    val words = Bpe.wordFrequencies(docs, "text")
    val rules = WordPiece.trainMerges(words, "word", "weight", 4)
    val vocab = WordPiece.vocabulary(words, "word", rules)
    val vocabSet = vocab.collect().map(_.getString(0)).toSet
    val got = WordPiece.fertility(docs, "text", Seq("lang", "source"),
      vocab, maxPieceLen = 8, maxWordLen = 12)
      .orderBy("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars")))
    val want = docs.collect().map { r =>
      val ws = r.getString(2).split("\\s+").filter(_.nonEmpty)
      ((r.getString(0), r.getString(1)),
        (ws.length.toLong,
          ws.map(w => refMunch(w, vocabSet, 8).length.toLong).sum,
          ws.map(_.length.toLong).sum))
    }.groupBy(_._1).view.mapValues(_.map(_._2)
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3)))
      .toSeq.sortBy(_._1)
      .map { case ((l, s), (nw, nt, nc)) => (l, s, nw, nt, nc) }
    assert(got.toSeq == want)
  }

  test("words beyond maxWordLen are excluded in both masses") {
    val docs = Seq(("x", "y", "ab abcdefghijklm ab")).toDF("lang", "source", "text")
    val vocab = Seq("a", "b", "ab").toDF("piece")
    val got = WordPiece.fertility(docs, "text", Seq("lang", "source"),
      vocab, maxPieceLen = 4, maxWordLen = 12).collect()(0)
    assert(got.getAs[Long]("n_words") == 2L) // the 13-char word is out
    assert(got.getAs[Long]("n_tokens") == 2L)
    assert(got.getAs[Long]("n_chars") == 4L)
  }

  test("a vocabulary hole stalls the munch loudly") {
    val docs = Seq(("x", "y", "az")).toDF("lang", "source", "text")
    val vocab = Seq("a").toDF("piece") // no "z"
    val ex = intercept[Exception] {
      WordPiece.fertility(docs, "text", Seq("lang", "source"),
        vocab, maxPieceLen = 4, maxWordLen = 12).collect()
    }
    assert(ex.getMessage != null)
  }
}
