package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions.{col, lit}

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
}
