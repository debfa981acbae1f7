package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions.{col, concat, lit}

import graft.SparkFunSuite

/** Adversarial text inputs for the curation operators: emoji, CJK,
  * combining marks, RTL, zero-width characters, and mixed scripts — none
  * of which the ASCII fixtures exercise. Every operator funnels text
  * through [[TextAnalysis.normalized]] (strip to `[a-z0-9 ]` after
  * lowercasing), so the invariants below must hold no matter what bytes
  * arrive; a crash or a violated invariant here means the normalization
  * seam leaks raw unicode into the arithmetic. */
class AdversarialInputSpec extends SparkFunSuite {
  import spark.implicits._

  private val junk = Vector("🦑", "漢字テスト", "مرحبا", "éclair",
    "a​b", "Ω≈ç√∫", "ÅÉÎ", "ñandú", "\u202etxet\u202c", "ß", "İı")
  private val words = Vector("data", "spark", "chunk", "merge", "shuffle",
    "join", "scan", "agg")

  private def mixedDoc(rnd: Random): String =
    Seq.fill(3 + rnd.nextInt(25))(
      if (rnd.nextBoolean()) words(rnd.nextInt(words.size))
      else junk(rnd.nextInt(junk.size))).mkString(" ")

  private def norm(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim

  private val rnd = new Random(37)
  private val docs = (1L to 150L).map(i => (i, mixedDoc(rnd)))
  private lazy val df = docs.toDF("doc_id", "text")

  test("content chunks reconstruct the normalized text for any input") {
    val got = Chunk.contentChunks(df, "doc_id", "text", 16, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(4)))
      .groupBy(_._1).map { case (id, ch) =>
        id -> ch.sortBy(_._2).map(_._3).mkString }
    for ((id, text) <- docs) {
      val t = norm(text)
      if (t.isEmpty) assert(!got.contains(id))
      else assert(got(id) === t, s"doc $id")
    }
  }

  test("corpus health token totals match the shared normalization") {
    val got = Profile.corpusHealth(
        df.withColumn("src", lit("all")), "src", "text", 100)
      .head()
    val want = docs.map(d => norm(d._2).split(" ").count(_.nonEmpty)).sum
    assert(got.getLong(1) === want.toLong)
  }

  test("tfidf keywords only surface normalized tokens of the document") {
    val toks = docs.map { case (id, t) =>
      id -> norm(t).split(" ").filter(_.nonEmpty).toSet }.toMap
    val rows = Keywords.tfidfKeywords(df, "doc_id", "text", 3).collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(toks(r.getLong(0)).contains(r.getString(2)),
        s"term '${r.getString(2)}' not a token of doc ${r.getLong(0)}")
  }

  test("LM scoring token counts match; junk-only docs drop cleanly") {
    val scored = LanguageModel.perplexityScore(df, "doc_id", "text",
        LanguageModel.trainBigram(df.limit(30), "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, t) <- docs) {
      val n = norm(t).split(" ").count(_.nonEmpty)
      if (n == 0) assert(!scored.contains(id))
      else assert(scored(id) === n.toLong, s"doc $id")
    }
  }

  test("novelty stays in [0, 1] and PMI/DSIR run crash-free end to end") {
    val nv = Novelty.ngramNovelty(df, df.limit(40), "doc_id", "text", 3)
      .collect()
    assert(nv.length === docs.size)
    for (r <- nv if !r.isNullAt(3))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    assert(Phrases.pmiCollocations(df, "text", 10, 2L).count() >= 0L)
    assert(Importance.dsirResample(df, df.limit(40), "doc_id", "text",
      k = 20).count() === 20L)
  }

  test("line scrub and snapshot diff are byte-safe on adversarial unicode") {
    // line scrub operates on RAW line identity (no normalization seam —
    // CCNet dedups the bytes as crawled), so the invariants are count
    // conservation and ordered-subsequence, not normalized reconstruction
    val multi = docs.map { case (id, t) =>
      (id, s"src${id % 3}", (t.split(" ").take(5) :+ "🦑 footer").mkString("\n"))
    }
    val mdf = multi.toDF("doc_id", "src", "text")
    val out = Scrub.boilerplateLineScrub(mdf, "doc_id", "text", Seq("src"), 50)
      .collect()
    assert(out.length === docs.size)
    val orig = multi.map { case (id, _, t) => id -> t.split("\n", -1).toSeq }.toMap
    out.foreach { r =>
      val id = r.getLong(0)
      val kept =
        if (r.getString(1).isEmpty) Seq.empty[String]
        else r.getString(1).split("\n", -1).toSeq
      assert(r.getLong(2) + r.getLong(3) === orig(id).size.toLong,
        s"doc $id: kept+dropped must equal total lines")
      assert(kept.size.toLong === r.getLong(2), s"doc $id: n_kept mismatch")
      // kept lines are an ordered subsequence of the original lines
      val it = orig(id).iterator
      assert(kept.forall(k => it.contains(k)),
        s"doc $id: kept lines must appear in original order")
      // the universal footer is boilerplate in every slice
      assert(!kept.contains("🦑 footer"))
    }
    // snapshot diff of any corpus against itself is all-unchanged — md5
    // fingerprints the raw bytes, junk included
    assert(Snapshot.diff(mdf, mdf, "doc_id", "text")
      .filter(col("status") =!= lit("unchanged")).count() === 0L)
  }

  test("NB classifier scores only normalized tokens; junk-only docs score 0") {
    val labeled = df.withColumn("y", col("doc_id") % 2 === 0)
    val model = Classifier.nbTrain(labeled, "text", "y")
    val scored = Classifier.nbScore(df, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored.size === docs.size, "every doc must get a score row")
    for ((id, t) <- docs if norm(t).split(" ").forall(_.isEmpty))
      assert(scored(id) === 0.0, s"junk-only doc $id must score exactly 0")
    // a pure-junk doc added after training scores 0 — chosen from the
    // junk entries with NO ascii residue under normalization ("éclair"
    // leaves "clair", "ñandú" leaves "and" — those are real tokens and
    // legitimately score; emoji/CJK/Arabic strip to nothing)
    val junkOnly = Seq((9999L, "🦑 漢字テスト مرحبا")).toDF("doc_id", "text")
    assert(Classifier.nbScore(junkOnly, "doc_id", "text", model)
      .head.getDouble(1) === 0.0)
  }

  test("JSD and OOV diagnostics are total and bounded on adversarial input") {
    val sliced = df.withColumn("src", concat(lit("s"), col("doc_id") % 3))
    val jsd = Profile.sliceDivergence(sliced, "src", "text").collect()
    assert(jsd.length === 3)
    jsd.foreach(r => assert(r.getDouble(1) >= 0.0 &&
      r.getDouble(1) <= math.log(2.0) + 1e-9, s"JSD out of bounds: $r"))
    val oov = Profile.oovRate(df, "doc_id", "text", k = 5).collect()
    assert(oov.length === docs.size, "every doc must get an OOV row")
    oov.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"n_oov > n_tokens: $r")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"rate out of [0,1]: $r")
    }
    // OOV token counts agree with the shared normalization
    val byId = oov.map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, t) <- docs)
      assert(byId(id) === norm(t).split(" ").count(_.nonEmpty).toLong, s"doc $id")
  }

  test("containment pairs: raw-byte grams never crash; self-corpus finds full containment") {
    // containmentPairs tokenizes RAW text (split on ' ') — unicode tokens
    // are legitimate gram content; two copies of any doc with >= n tokens
    // must contain each other exactly
    val dup = df.unionByName(df.select((col("doc_id") + 10000L).as("doc_id"),
      col("text")))
    val pairs = Dedup.containmentPairs(dup, "doc_id", "text", n = 2,
        threshold = 0.99, maxBucket = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val expected = docs.count(_._2.split(" ").length >= 2)
    assert(pairs.forall(_._3 >= 0.99))
    val mirrored = pairs.count { case (a, b, _) => math.abs(a - b) == 10000L }
    assert(mirrored >= expected * 2 - 2,
      s"planted copies must contain each other: $mirrored of ${expected * 2}")
  }

  test("readability survives adversarial unicode with sane invariants") {
    val got = TextAnalysis.readability(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(got.length == docs.size, "no row lost to a crash")
    for ((id, ns, nw, nsy, ease, grade) <- got) {
      val t = norm(docs(id.toInt - 1)._2)
      val nWords = if (t.isEmpty) 0 else t.split(" ").length
      assert(nw == nWords, s"doc $id word count off the shared norm")
      assert(ns >= 1, s"doc $id sentence floor")
      assert(nsy >= nw, s"doc $id: every word carries >= 1 syllable")
      assert(!ease.isNaN && !grade.isNaN && !ease.isInfinite &&
        !grade.isInfinite, s"doc $id produced non-finite scores")
    }
  }
}
