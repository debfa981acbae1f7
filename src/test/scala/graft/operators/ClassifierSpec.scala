package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class ClassifierSpec extends SparkFunSuite {
  import spark.implicits._

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("nbTrain/nbScore match the hand-computed NB log-odds reference") {
    // tiny seed: 'good'/'clean' positive-only, 'spam'/'junk' negative-only,
    // 'text' in both — replicate train + score arithmetic in plain Scala
    val seed = Seq(
      (true, "good clean text"), (true, "good text"),
      (false, "spam junk text"), (false, "spam text")).toDF("y", "text")
    val model = Classifier.nbTrain(seed, "text", "y")
    val cp = Map("good" -> 2L, "clean" -> 1L, "text" -> 2L, "spam" -> 0L, "junk" -> 0L)
    val cn = Map("good" -> 0L, "clean" -> 0L, "text" -> 2L, "spam" -> 2L, "junk" -> 1L)
    val (tp, tn) = (5L, 5L)
    val b = Classifier.NbBuckets.toLong
    // the operator's explicit floor-rounding, replicated literally
    def rf(x: Double, p: Double): Double = math.floor(x * p + 0.5) / p
    def llr(t: String): Double = rf(
      math.log((cp(t) + 1).toDouble / (tp + b).toDouble) -
        math.log((cn(t) + 1).toDouble / (tn + b).toDouble), 1e6)
    val got = model.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    cp.keys.foreach { t =>
      val f = md5hex(s"$t:nbf").take(4)
      assert(got.contains(f), s"bucket for '$t' missing from model")
      assert(got(f) == llr(t), s"llr('$t'): got ${got(f)}, want ${llr(t)}")
    }
    // score a doc with a repeated positive token and one shared token:
    // fold order is bucket-id asc, tf weighting via repetition
    val docs = Seq((1L, "good good text"), (2L, "spam junk"), (3L, "")).toDF("id", "text")
    val scored = Classifier.nbScore(docs, "id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    val wantScore1 = rf(
      Seq(("good", llr("good")), ("good", llr("good")), ("text", llr("text")))
        .map { case (t, l) => (md5hex(s"$t:nbf").take(4), l) }
        .sortBy(_._1).map(_._2).foldLeft(0.0)(_ + _), 1e4)
    assert(scored(1L) == ((wantScore1, true)), s"doc 1: ${scored(1L)} vs $wantScore1")
    assert(scored(2L)._1 < 0 && !scored(2L)._2, s"all-negative doc must score < 0: ${scored(2L)}")
    assert(scored(3L) == ((0.0, false)), "empty doc must score exactly 0.0/false")
  }

  test("classifier separates disjoint vocabularies perfectly") {
    // quality docs draw from one vocabulary, junk from another; train on a
    // third of each, score the rest — hashed NB must rank every held-out
    // quality doc above every junk doc
    val qualityVocab = Seq("essay", "report", "analysis", "study", "review")
    val junkVocab = Seq("click", "winner", "prize", "free", "casino")
    def doc(vocab: Seq[String], i: Int): String =
      (0 until 12).map(j => vocab((i * 7 + j * 3) % vocab.size)).mkString(" ")
    val rows = (0 until 60).map { i =>
      val pos = i % 2 == 0
      (i.toLong, pos, doc(if (pos) qualityVocab else junkVocab, i))
    }
    val df = rows.toDF("id", "y", "text")
    val model = Classifier.nbTrain(df.filter(col("id") % 3 === 0), "text", "y")
    val scored = Classifier.nbScore(df.filter(col("id") % 3 =!= 0), "id", "text", model)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val posScores = rows.filter(r => r._1 % 3 != 0 && r._2).map(r => scored(r._1))
    val negScores = rows.filter(r => r._1 % 3 != 0 && !r._2).map(r => scored(r._1))
    assert(posScores.min > negScores.max,
      s"separation failed: min(pos)=${posScores.min} <= max(neg)=${negScores.max}")
  }

  test("scoring is layout-invariant and out-of-model tokens contribute zero") {
    val seed = Seq((true, "alpha beta"), (false, "gamma delta")).toDF("y", "text")
    val model = Classifier.nbTrain(seed, "text", "y")
    val docs = Seq((1L, "alpha unseen1 unseen2"), (2L, "alpha")).toDF("id", "text")
    val a = Classifier.nbScore(docs.repartition(1), "id", "text", model)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = Classifier.nbScore(docs.repartition(9), "id", "text", model)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a == b, "scores must not depend on partition layout")
    // 'unseen*' tokens hash to buckets absent from the seed model: no effect
    assert(a(1L) == a(2L), s"out-of-model tokens changed the score: $a")
  }

  test("nbScore validates model columns and reserved names") {
    val docs = Seq((1L, "x")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Classifier.nbScore(docs, "id", "text", Seq(("a", 1.0)).toDF("f", "w"))
    }
    intercept[IllegalArgumentException] {
      Classifier.nbScore(docs.withColumn("llr", lit(1.0)), "id", "text",
        Seq(("a", 1.0)).toDF("feature", "llr"))
    }
  }

  test("model plan: scoring joins the model by broadcast") {
    val seed = Seq((true, "alpha beta"), (false, "gamma delta")).toDF("y", "text")
    val docs = Seq((1L, "alpha beta gamma")).toDF("id", "text")
    val plan = Classifier.nbScore(docs, "id", "text",
      Classifier.nbTrain(seed, "text", "y")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"the bounded model table must broadcast into scoring:\n$plan")
  }
}
