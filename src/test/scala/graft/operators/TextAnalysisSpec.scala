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
}
