package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class TextAnalysisSpec extends SparkFunSuite {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("tokenCount splits on whitespace runs") {
    val df = one("  the quick   brown\tfox  ")
    assert(df.select(TextAnalysis.tokenCount($"text")).head.getInt(0) == 4)
  }

  test("punctCount counts only sentence punctuation") {
    assert(one("a, b. c! d? e; f:").select(TextAnalysis.punctCount($"text"))
      .head.getInt(0) == 6)
  }

  test("stopwordCount matches exact tokens, not substrings") {
    // "theme" must not count for "the"
    val df = one("the theme of a pipeline is to process data")
    // hits: the, of, a, is, to
    assert(df.select(TextAnalysis.stopwordCount($"text")).head.getInt(0) == 5)
  }

  test("qualityScore is clamped to [0,1] and monotone in length up to 50 tokens") {
    val short = one("word").select(TextAnalysis.qualityScore($"text")).head.getDouble(0)
    val mid = one(("word " * 25).trim).select(TextAnalysis.qualityScore($"text")).head.getDouble(0)
    val full = one(("word " * 60).trim).select(TextAnalysis.qualityScore($"text")).head.getDouble(0)
    assert(short >= 0.0 && full <= 1.0)
    assert(short < mid && mid < full)
  }

  test("langGuess picks the language with most marker hits; CJK wins outright") {
    val cases = Seq(
      "the cat and the dog is here" -> "en",
      "der hund und die katze nicht" -> "de",
      "el perro que ladra los dias" -> "es",
      "le chien et les chats une fois" -> "fr",
      "weather 今天 report" -> "zh")
    cases.foreach { case (text, want) =>
      val got = one(text).select(TextAnalysis.langGuess($"text")).head.getString(0)
      assert(got == want, s"'$text' -> $got, want $want")
    }
  }

  test("fingerprint is invariant to case, word order, punctuation, repeats") {
    val df = Seq(
      (1L, "The Quick brown FOX!"),
      (2L, "fox... quick; the брown".replace("брown", "brown")),
      (3L, "quick the fox brown quick")
    ).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprint($"text")).collect().map(_.getString(0))
    assert(fps.distinct.length == 1)
  }

  test("subwordCount exceeds word count on digit-bearing text") {
    val df = one("model v2 scored 98 points")
    val words = df.select(TextAnalysis.tokenCount($"text")).head.getInt(0)
    val sub = df.select(TextAnalysis.subwordCount($"text")).head.getInt(0)
    assert(sub >= words)
  }

  // driver-side reference of the winnowing scheme, for differentials
  private def winnowRef(text: String, k: Int, w: Int): Seq[Long] = {
    val B = 257L; val M = 1000000007L
    val norm = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim
    val cs = norm.map(_.toLong)
    val grams = (0 to cs.length - k).map { i =>
      (0 until k).map(j => cs(i + j) * math.pow(B, k - 1 - j).toLong).sum % M
    }
    val wins =
      if (grams.isEmpty) Seq.empty[Long]
      else if (grams.length <= w) Seq(grams.min)
      else (0 to grams.length - w).map(i => grams.slice(i, i + w).min)
    wins.distinct.sorted
  }

  test("winnowingFingerprints matches the driver-side reference") {
    val texts = Seq(
      "The Quick, Brown Fox! jumps over 42 lazy dogs",
      "tiny",
      "",
      "spark spark spark spark spark spark spark")
    for (t <- texts; (k, w) <- Seq((5, 4), (3, 2))) {
      val got = one(t)
        .select(TextAnalysis.winnowingFingerprints($"text", k, w).as("fp"))
        .head.getSeq[Long](0).toSeq
      assert(got == winnowRef(t, k, w), s"mismatch for '$t' k=$k w=$w")
    }
  }

  test("winnowing guarantee: shared substring >= k+w-1 chars -> shared fingerprint") {
    val span = "this exact boilerplate sentence is shared verbatim"
    val a = s"document alpha begins here $span and then ends differently"
    val b = s"unrelated beta text $span with other surroundings entirely"
    val fa = one(a).select(TextAnalysis.winnowingFingerprints($"text").as("f"))
      .head.getSeq[Long](0).toSet
    val fb = one(b).select(TextAnalysis.winnowingFingerprints($"text").as("f"))
      .head.getSeq[Long](0).toSet
    assert((fa intersect fb).nonEmpty, "shared span produced no shared fingerprint")
    // and genuinely disjoint texts share (essentially) nothing
    val fc = one("zzz qqq www vvv kkk jjj hhh")
      .select(TextAnalysis.winnowingFingerprints($"text").as("f"))
      .head.getSeq[Long](0).toSet
    assert((fa intersect fc).isEmpty)
  }

  test("winnowOverlapPairs: shared-substring pair found, unrelated pair absent") {
    // doc 2 quotes a >= k+w-1 char span of doc 1 inside unrelated text;
    // doc 3 shares nothing -> exactly one candidate pair
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"$quote and then some more original prose follows here"),
      (2L, s"completely different opening before $quote different close"),
      (3L, "unrelated material about distributed query engines entirely")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.winnowOverlapPairs(docs, "doc_id", "text", minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)))
  }

  test("winnowOverlapPairs: bucket cap bounds pair fan-out per fingerprint") {
    // 50 identical docs: uncapped would emit C(50,2)=1225 pairs per fp;
    // cap 4 keeps ranks 1..4 per fp -> only ids 1..4 pair up
    val docs = (1L to 50L).map(i => (i, "the same exact boilerplate sentence repeated verbatim"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.winnowOverlapPairs(docs, "doc_id", "text",
        minShared = 1L, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("sourceOverlapMatrix: closed-form bigram overlap, no self/duplicate pairs") {
    // srcA: bigrams {a b, b c}      srcB: {b c, c d}     srcC: {x y}
    // A∩B = {b c} -> shared 1, jaccard 1/3; C shares nothing -> absent
    val docs = Seq(
      ("srcA", "a b c"), ("srcB", "b c d"), ("srcC", "x y"),
      ("srcA", "a b"), // duplicate bigram within the slice: distinct'd away
      ("srcB", "")     // empty text contributes nothing
    ).toDF("source", "text")
    val got = TextAnalysis.sourceOverlapMatrix(docs, "source", "text", n = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("srcA", "srcB", 1L, 1.0 / 3.0)))
  }

  test("sourceOverlapMatrix: identical slices have jaccard exactly 1.0") {
    val docs = Seq(("s1", "p q r s"), ("s2", "p q r s")).toDF("source", "text")
    val got = TextAnalysis.sourceOverlapMatrix(docs, "source", "text", n = 2)
      .head
    assert(got.getLong(2) == 3L && got.getDouble(3) == 1.0)
  }

  test("lognormalFit: hand moments in fold order, nonpositive excluded") {
    val df = Seq(("g", 2L), ("g", 2L), ("g", 8L),
      ("g", 0L), ("g", -3L)).toDF("src", "len")
    val r = TextAnalysis.lognormalFit(df, Seq("src"), "len")
      .collect().head
    def rf(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // fold in length order: (2, c=2) then (8, c=1)
    val s1 = (0.0 + 2.0 * math.log(2.0)) + 1.0 * math.log(8.0)
    val s2 = (0.0 + 2.0 * (math.log(2.0) * math.log(2.0))) +
      1.0 * (math.log(8.0) * math.log(8.0))
    assert((r.getLong(1), r.getLong(2)) == ((3L, 2L)))
    assert(r.getDouble(3) == rf(s1 / 3.0))
    assert(r.getDouble(4) == rf(s2 / 3.0 - (s1 / 3.0) * (s1 / 3.0)))
    assert(r.getDouble(5) == rf(math.exp(s1 / 3.0)))
    intercept[IllegalArgumentException] {
      TextAnalysis.lognormalFit(df, Seq.empty, "len")
    }
  }

  test("readability: hand-counted sentences/words/syllables and exact scores") {
    val docs = Seq(
      (1L, "Hello world. This is a test!"),
      (2L, ""),                  // floors: S=1, W=1 in the ratios
      (3L, "tv hmm")             // vowel-free words still count 1 syllable
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: sentences [.!?]+ runs = 2; words = 6;
    // syllables: hello 2, world 1, this 1, is 1, a 1, test 1 = 7
    assert(got(0).getLong(1) == 2L && got(0).getLong(2) == 6L &&
      got(0).getLong(3) == 7L)
    val wps = 6.0 / 2.0; val spw = 7.0 / 6.0
    assert(got(0).getDouble(4) == 206.835 - 1.015 * wps - 84.6 * spw)
    assert(got(0).getDouble(5) == 0.39 * wps + 11.8 * spw - 15.59)
    // empty doc: zero words/syllables, floored denominators, no NaN
    assert(got(1).getLong(1) == 1L && got(1).getLong(2) == 0L &&
      got(1).getLong(3) == 0L)
    assert(got(1).getDouble(4) == 206.835 && got(1).getDouble(5) == -15.59)
    // vowel-free words: y counts as a vowel, pure consonants floor at 1
    assert(got(2).getLong(2) == 2L && got(2).getLong(3) == 2L)
  }

  test("soundex: census textbook cases, h/w collapse, resets, padding, nulls") {
    val cases = Seq(
      "Robert" -> "R163", "Rupert" -> "R163",   // the classic pair
      "Ashcraft" -> "A261",                     // c,h,c collapses across h
      "Ashcroft" -> "A261",
      "Tymczak" -> "T522",                      // y resets; cz collapses
      "Pfister" -> "P236",                      // p,f share code 1 with the head
      "Honeyman" -> "H555",                     // h head; vowel resets repeat n
      "A" -> "A000", "Lee" -> "L000",           // padding
      "O'Brien-42" -> "O165",                   // non-letters dropped
      "123" -> null, "" -> null)                // no letters -> NULL
    val got = cases.zipWithIndex
      .map { case ((in, _), i) => (i, in) }.toDF("i", "name")
      .select(col("i"), TextAnalysis.soundex(col("name")).as("sx"))
      .orderBy("i").collect().map(r => if (r.isNullAt(1)) null else r.getString(1))
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i) == want, s"soundex('$in'): got ${got(i)}, want $want")
    }
  }
}
