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
  }
}
