package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkFunSuite

class BpeSpec extends SparkFunSuite {
  import spark.implicits._

  // The Sennrich et al. 2016 reference corpus (no end-of-word marker):
  // low×5 lower×2 newest×6 widest×3. Hand-derived merge sequence with the
  // (weight DESC, left ASC, right ASC) tie order:
  //   1 (e,s)=9   [ties (s,t); e < s]
  //   2 (es,t)=9
  //   3 (l,o)=7   [ties (o,w); l < o]
  //   4 (lo,w)=7
  //   5 (e,w)=6   [ties (n,e),(w,est); e first]
  //   6 (ew,est)=6 [ties (n,ew); ew < n]
  private val refWords = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)
  ).toDF("word", "weight")

  private val refMerges = Seq(
    (1, "e", "s", "es", 9L), (2, "es", "t", "est", 9L),
    (3, "l", "o", "lo", 7L), (4, "lo", "w", "low", 7L),
    (5, "e", "w", "ew", 6L), (6, "ew", "est", "ewest", 6L))

  test("trainMerges reproduces the published reference merge sequence") {
    val got = Bpe.trainMerges(refWords, "word", "weight", merges = 6)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == refMerges)
  }

  test("train: the corpus path weights words by occurrence count") {
    // materialize the same corpus as raw text rows
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val got = Bpe.train(docs, "text", merges = 2)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq((1, "es", 9L), (2, "est", 9L)))
  }

  test("applyMerge: greedy left-to-right, overlapping runs resolve left-first") {
    val out = Seq("aaa", "abab", "ba", "a")
      .toDF("w")
      .select(Bpe.encode(col("w"), Seq(("a", "a"))).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("aa", "a"), Seq("a", "b", "a", "b"),
      Seq("b", "a"), Seq("a")))
  }

  test("encode applies rules in training order, each a full pass") {
    val rules = refMerges.map(m => (m._2, m._3))
    val got = Seq("newest", "lowest", "low", "widest")
      .toDF("w").select(Bpe.encode(col("w"), rules).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(
      Seq("n", "ewest"),          // n,e,w,e,s,t → es → est → ew → ewest
      Seq("low", "est"),          // unseen word still segments
      Seq("low"),
      Seq("w", "i", "d", "est")))
  }

  test("trainMerges stops early when no adjacent pair remains") {
    val words = Seq(("a", 3L), ("b", 2L)).toDF("word", "weight")
    assert(Bpe.trainMerges(words, "word", "weight", merges = 5).count() == 0L)
    val one = Seq(("ab", 1L)).toDF("word", "weight")
    val got = Bpe.trainMerges(one, "word", "weight", merges = 5)
      .collect().map(r => (r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(("ab", 1L)))
  }

  test("merge count is validated") {
    intercept[IllegalArgumentException] {
      Bpe.trainMerges(refWords, "word", "weight", merges = 0)
    }
    intercept[IllegalArgumentException] {
      Bpe.trainMergesBatched(refWords, "word", "weight", merges = 4,
        maxBatch = 0)
    }
  }

  // ---- batched trainer ≡ sequential ----

  private def rulesOf(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("trainMergesBatched ≡ trainMerges on the reference corpus, any maxBatch") {
    val seq6 = rulesOf(Bpe.trainMerges(refWords, "word", "weight", 6))
    for (mb <- Seq(1, 2, 4, 32)) {
      val got = rulesOf(Bpe.trainMergesBatched(refWords, "word", "weight", 6, mb))
      assert(got == seq6, s"maxBatch=$mb diverged")
    }
  }

  test("batched: the aaa adversarial corpus — a new pair outranks the disjoint candidate") {
    // pairs at round 1: (a,a)=100 [two positions × w50], (c,d)=40.
    // Naive disjoint batching would take (c,d) in the same round, but
    // sequential merges (a,a) -> "aaa" becomes [aa, a] -> new pair
    // (aa,a)=50 which BEATS (c,d)=40. The triple cap (w3(a,a,a)=50 ≥ 40)
    // must stop the batch after (a,a).
    val words = Seq(("aaa", 50L), ("cd", 40L)).toDF("word", "weight")
    val seq = rulesOf(Bpe.trainMerges(words, "word", "weight", 3))
    assert(seq == Seq((1, "a", "a", "aa", 100L), (2, "aa", "a", "aaa", 50L),
      (3, "c", "d", "cd", 40L)))
    for (mb <- Seq(2, 8)) {
      assert(rulesOf(Bpe.trainMergesBatched(words, "word", "weight", 3, mb))
        == seq, s"maxBatch=$mb diverged on the adversarial corpus")
    }
  }

  test("batched ≡ sequential across multiple rounds with cap-bound ties") {
    // (a,b)=16 leads; the triple (a,a,b) w3=10 caps the round at exactly
    // the next candidate's weight (strict > must reject equality: the new
    // pair (a,ab)=10 would win the tie on order) — round 2 then picks
    // the NEW pair, which only sequential-equivalent batching gets right
    val words = Seq(("aab", 10L), ("ab", 6L), ("ef", 10L))
      .toDF("word", "weight")
    val seq = rulesOf(Bpe.trainMerges(words, "word", "weight", 4))
    for (mb <- Seq(2, 4, 16)) {
      assert(rulesOf(Bpe.trainMergesBatched(words, "word", "weight", 4, mb))
        == seq, s"maxBatch=$mb diverged on the cap-tie corpus")
    }
  }

  test("batched ≡ sequential on a deterministic pseudo-random corpus") {
    // 60 synthetic words over a 6-letter alphabet with md5-derived
    // lengths/weights — no RNG state, reproducible anywhere
    def h(i: Int, salt: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$i".getBytes("UTF-8"))
      ((d(0) & 0xff) << 8) | (d(1) & 0xff)
    }
    val alpha = "abcdef"
    val words = (0 until 60).map { i =>
      val len = 2 + h(i, "len") % 7
      val w = (1 + h(i, "w") % 50).toLong
      val s = (0 until len).map(j => alpha(h(i * 31 + j, "c") % alpha.length))
        .mkString
      (s, w)
    }.toDF("word", "weight")
    val seq = rulesOf(Bpe.trainMerges(words, "word", "weight", 24))
    for (mb <- Seq(4, 32)) {
      val got = rulesOf(Bpe.trainMergesBatched(words, "word", "weight", 24, mb))
      assert(got == seq, s"maxBatch=$mb diverged on the random corpus")
    }
  }

  test("batched: four disjoint triple-free pairs learn in one round") {
    // no triples exist (all words are 2 symbols), so the cap never binds
    // and all four disjoint pairs are provably safe in a single batch
    val words = Seq(("ab", 80L), ("cd", 70L), ("ef", 60L), ("gh", 50L))
      .toDF("word", "weight")
    val seq = rulesOf(Bpe.trainMerges(words, "word", "weight", 4))
    val got = rulesOf(Bpe.trainMergesBatched(words, "word", "weight", 4, 32))
    assert(got == seq && got.map(_._4) == Seq("ab", "cd", "ef", "gh"))
  }

  test("fertility: hand-computed slice masses under one merge rule") {
    // rule (a,a): "aa" → 1 token, "ab" → [a, b] 2 tokens, "b" → 1 token
    val docs = Seq(("en", "web", "aa ab"), ("fr", "web", "b"))
      .toDF("lang", "source", "text")
    val out = Bpe.fertility(docs, "text", Seq("lang", "source"),
        Seq(("a", "a"))).orderBy("lang").collect()
    val en = out(0)
    assert(en.getString(0) == "en" && en.getAs[Long]("n_words") == 2L &&
      en.getAs[Long]("n_tokens") == 3L && en.getAs[Long]("n_chars") == 4L &&
      en.getAs[Double]("tokens_per_word") == 1.5 &&
      en.getAs[Double]("chars_per_token") == 4.0 / 3.0)
    val fr = out(1)
    assert(fr.getAs[Long]("n_words") == 1L && fr.getAs[Long]("n_tokens") == 1L &&
      fr.getAs[Double]("tokens_per_word") == 1.0)
  }

  test("fertility: duplicate words collapse — encode runs per distinct word, counts stay exact") {
    // same word mass split across slices; empty/whitespace splits drop
    val docs = Seq(("en", "web", "  aa aa  "), ("en", "book", "aa"))
      .toDF("lang", "source", "text")
    val out = Bpe.fertility(docs, "text", Seq("lang", "source"), Seq(("a", "a")))
      .orderBy("source").collect()
    assert(out.map(r => (r.getString(1), r.getAs[Long]("n_words"),
      r.getAs[Long]("n_tokens"))).toSeq == Seq(("book", 1L, 1L), ("web", 2L, 2L)))
  }

  test("fertility rejects reserved columns and empty slices") {
    val docs = Seq(("en", "aa")).toDF("_w", "text")
    intercept[IllegalArgumentException] {
      Bpe.fertility(docs, "text", Nil, Seq(("a", "a")))
    }
    intercept[IllegalArgumentException] {
      Bpe.fertility(docs, "text", Seq("_w"), Seq(("a", "a")))
    }
  }
}
