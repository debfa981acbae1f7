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

  // ---- nearest-centroid (Rocchio) classification ----

  private def centroidFixture = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(1.0f, 0.2f), 0),
    (2L, Array(0.0f, 1.0f), 1),
    (3L, Array(0.2f, 1.0f), 1)).toDF("vec_id", "embedding", "label")

  test("centroidClassify matches a hand-replayed Rocchio reference") {
    // replicate the exact arithmetic: quantized mean centroids, VecDot
    // folds, dot / (sqrt(vn2) * sqrt(cn2))
    def quantMean(vs: Seq[Float]): Double =
      vs.map(v => math.floor(v.toDouble * 1.0e10 + 0.5)).sum / vs.size / 1.0e10
    val c0 = Array(quantMean(Seq(1.0f, 1.0f)), quantMean(Seq(0.0f, 0.2f)))
    val c1 = Array(quantMean(Seq(0.0f, 0.2f)), quantMean(Seq(1.0f, 1.0f)))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def cos(v: Array[Float], c: Array[Double]): Double = {
      val vd = v.map(_.toDouble)
      dot(vd, c) / (math.sqrt(dot(vd, vd)) * math.sqrt(dot(c, c)))
    }
    val got = Classifier.centroidClassify(centroidFixture, "vec_id", "embedding", "label")
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    Seq((0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.2f)),
        (2L, Array(0.0f, 1.0f)), (3L, Array(0.2f, 1.0f))).zip(got).foreach {
      case ((id, v), (gid, lbl, pred, score, runner, margin)) =>
        val s0 = cos(v, c0); val s1 = cos(v, c1)
        val (wantPred, wantBest, wantRun, wantSnd) =
          if (s1 > s0) (1L, s1, 0L, s0) else (0L, s0, 1L, s1)
        assert(gid == id && lbl == (if (id < 2) 0 else 1))
        assert(pred == wantPred, s"vec $id predicted $pred, want $wantPred")
        assert(score == wantBest, s"vec $id score $score, want $wantBest (bit-exact)")
        assert(runner == wantRun && margin == wantBest - wantSnd)
        assert(margin > 0.0, "distinct centroids must yield a positive margin")
    }
  }

  test("centroidClassify breaks cosine ties to the smaller label") {
    // (1,1) is equidistant from the axis centroids (1,0) and (0,1): the
    // two cosines are the same expression tree => bitwise equal => label 0.
    // Its own label's centroid cancels to the zero vector (score 0), so it
    // can't win by self-membership.
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.0f, 1.0f), 1),
      (2L, Array(1.0f, 1.0f), 7), (3L, Array(-1.0f, -1.0f), 7))
      .toDF("vec_id", "embedding", "label")
    val r = Classifier.centroidClassify(df, "vec_id", "embedding", "label")
      .filter($"vec_id" === 2L).collect().head
    assert(r.getLong(2) == 0L, s"tie must resolve to the smaller label: $r")
    assert(r.getDouble(5) == 0.0, "a perfect tie has zero margin")
  }

  test("centroidClassify: zero vectors score 0.0, single label yields null margin") {
    val zero = Seq((0L, Array(0.0f, 0.0f), 3), (1L, Array(1.0f, 0.0f), 3))
      .toDF("vec_id", "embedding", "label")
    val rows = Classifier.centroidClassify(zero, "vec_id", "embedding", "label")
      .orderBy("vec_id").collect()
    assert(rows(0).getDouble(3) == 0.0, "zero-norm vector must score exactly 0.0")
    rows.foreach { r =>
      assert(r.getLong(2) == 3L)
      assert(r.isNullAt(4) && r.isNullAt(5),
        s"single-label corpus has no runner-up/margin: $r")
    }
  }

  test("centroidClassify is layout-invariant") {
    val base = Classifier.centroidClassify(centroidFixture, "vec_id", "embedding", "label")
      .orderBy("vec_id").collect().toSeq
    val shuffled = Classifier.centroidClassify(
      centroidFixture.repartition(7), "vec_id", "embedding", "label")
      .orderBy("vec_id").collect().toSeq
    assert(base == shuffled, "partition layout must not change any score bit")
  }

  test("centroidClassify plan: the packed centroid model broadcasts; corpus never shuffles") {
    val plan = Classifier.centroidClassify(centroidFixture, "vec_id", "embedding", "label")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the labels-by-dims model must broadcast into classification:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"classification must be a narrow map stage over the corpus:\n$plan")
  }

  test("calibrationBins: exact-integer bins, clamp at 1.0, range/null exclusion") {
    val rows = Seq(
      (Some(0.05), Some(false)),            // bin 0
      (Some(0.15), Some(true)), (Some(0.19), Some(false)), // bin 1
      (Some(0.2), Some(true)),              // exact boundary → bin 2
      (Some(1.0), Some(true)),              // clamps into bin 9
      (Some(-0.1), Some(true)), (Some(1.5), Some(true)), // excluded: not probabilities
      (None, Some(true)), (Some(0.5), None) // excluded: nulls
    ).toDF("score", "label")
    val got = Classifier.calibrationBins(rows, "score", "label", nBins = 10)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      (0, 0.0, 1L, 0L, 0.05, 0.0),
      (1, 0.1, 2L, 1L, 340000.0 / 1.0e6 / 2.0, 0.5), // exact-integer mean: 0.17, not (0.15+0.19)/2's 0.169..98
      (2, 0.2, 1L, 1L, 0.2, 1.0),
      (9, 0.9, 1L, 1L, 1.0, 1.0)))
    intercept[IllegalArgumentException] {
      Classifier.calibrationBins(rows, "score", "label", nBins = 1)
    }
  }

  test("isotonicCalibrate: textbook pooling, monotone passthrough, weights") {
    import spark.implicits._
    // raw rates .2 .6 .4 .8 → PAV pools the 2nd/3rd: .2 .5 .5 .8
    val bins = Seq((0L, 10L, 2L), (1L, 10L, 6L), (2L, 10L, 4L),
      (3L, 10L, 8L)).toDF("bin", "n", "n_pos")
    val got = Classifier.isotonicCalibrate(bins, "bin", "n", "n_pos")
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == Seq((0L, 0.2, 0.2), (1L, 0.6, 0.5), (2L, 0.4, 0.5),
      (3L, 0.8, 0.8)))
    // already-monotone input is returned unchanged
    val mono = Seq((0L, 5L, 1L), (1L, 5L, 2L), (2L, 5L, 4L))
      .toDF("bin", "n", "n_pos")
    val gm = Classifier.isotonicCalibrate(mono, "bin", "n", "n_pos")
      .orderBy("bin").collect()
    gm.foreach(r => assert(r.getDouble(3) == r.getDouble(4)))
    // fully decreasing pools to the global mean everywhere
    val dec = Seq((0L, 2L, 2L), (1L, 2L, 1L), (2L, 2L, 0L))
      .toDF("bin", "n", "n_pos")
    val gd = Classifier.isotonicCalibrate(dec, "bin", "n", "n_pos")
      .collect().map(_.getDouble(4)).toSeq
    assert(gd.forall(_ == 0.5))
    // weighted pooling: (n=1, rate 1) then (n=3, rate 0) → 1/4 both
    val wt = Seq((0L, 1L, 1L), (1L, 3L, 0L)).toDF("bin", "n", "n_pos")
    val gw = Classifier.isotonicCalibrate(wt, "bin", "n", "n_pos")
      .orderBy("bin").collect().map(_.getDouble(4)).toSeq
    assert(gw == Seq(0.25, 0.25))
    // empty bins drop; the fit over the remainder is still monotone
    val holes = Seq((0L, 2L, 2L), (3L, 0L, 0L), (7L, 2L, 0L))
      .toDF("bin", "n", "n_pos")
    val gh = Classifier.isotonicCalibrate(holes, "bin", "n", "n_pos")
      .orderBy("bin").collect()
    assert(gh.map(_.getLong(0)).toSeq == Seq(0L, 7L))
    assert(gh.map(_.getDouble(4)).toSeq == Seq(0.5, 0.5))
  }

  test("gainsTable: hand-cut buckets, tie split by id, no-positive null") {
    // 10 rows, 5 buckets of 2. Scores 10..1 except ids 4,5 TIE at 7.0:
    // rank order = 1,2,3,4,5(id tiebreak),6..10. Positives: ids 1,2,4.
    val df = Seq(
      (1L, 10.0, true), (2L, 9.0, true), (3L, 8.0, false),
      (4L, 7.0, true), (5L, 7.0, false), (6L, 5.0, false),
      (7L, 4.0, false), (8L, 3.0, false), (9L, 2.0, false),
      (10L, 1.0, false)).toDF("id", "score", "y")
    val got = Classifier.gainsTable(df, "score", "y", "id", nBuckets = 5)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    // buckets: [1,2]=2pos, [3,4]=1pos, [5,6]=0, [7,8]=0, [9,10]=0
    val base = 3.0 / 10.0
    assert(got.toSeq == Seq(
      (0, 2L, 2L, 1.0, 2.0 / 3.0, 2.0 / 3.0, 1.0 / base, 1.0 / base),
      (1, 2L, 1L, 0.5, 1.0 / 3.0, 1.0, 0.5 / base, (3.0 / 4.0) / base),
      (2, 2L, 0L, 0.0, 0.0, 1.0, 0.0, (3.0 / 6.0) / base),
      (3, 2L, 0L, 0.0, 0.0, 1.0, 0.0, (3.0 / 8.0) / base),
      (4, 2L, 0L, 0.0, 0.0, 1.0, 0.0, (3.0 / 10.0) / base)))
    // all-negative input: capture/lift columns null, counts still exact
    val neg = Seq((1L, 2.0, false), (2L, 1.0, false)).toDF("id", "score", "y")
    val gn = Classifier.gainsTable(neg, "score", "y", "id", nBuckets = 2)
      .orderBy("bucket").collect()
    assert(gn.map(_.getLong(2)).toSeq == Seq(0L, 0L) &&
      gn.forall(r => r.isNullAt(4) && r.isNullAt(6)))
    intercept[IllegalArgumentException] {
      Classifier.gainsTable(df, "score", "y", "id", nBuckets = 1)
    }
  }

  test("cohensKappa: textbook 2x2 table, degenerate constant raters") {
    // classic fixture: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no
    // po = 35/50; row yes=25, no=25; col yes=30, no=20
    // pe = (25*30 + 25*20)/2500 = 0.5; kappa = (0.7-0.5)/0.5
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val df = rows.toDF("a", "b")
    val r = Classifier.cohensKappa(df, "a", "b").collect().head
    val po = 35.0 / 50.0
    val pe = (25.0 * 30.0 + 25.0 * 20.0) / (50.0 * 50.0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4)) == ((50L, 35L, po, pe, (po - pe) / (1.0 - pe))))
    // both raters constant and equal: pe = 1 -> kappa null
    val const = Seq.fill(4)(("y", "y")).toDF("a", "b")
    assert(Classifier.cohensKappa(const, "a", "b").collect().head
      .isNullAt(4))
  }

  test("annotatorConsensus: accuracy weighting overturns a raw majority") {
    // g1/g2 are reliable (agree on items 1-3); b1-b3 are noise (random
    // labels on 1-3) but GANG UP on item 4 — the raw majority there is
    // 'f', the accuracy-weighted vote restores 't'; item 5 is a 1-1 tie
    // resolved to the smallest label
    val votes = (
      (1 to 3).flatMap(i => Seq((i.toLong, "g1", "t"), (i.toLong, "g2", "t"),
        (i.toLong, "b1", s"x$i"), (i.toLong, "b2", s"y$i"),
        (i.toLong, "b3", s"z$i"))) ++
      Seq((4L, "g1", "t"), (4L, "g2", "t"), (4L, "b1", "f"),
        (4L, "b2", "f"), (4L, "b3", "f"),
        (5L, "g1", "a"), (5L, "g2", "b"))
    ).toDF("item", "annot", "label")
    val got = Classifier.annotatorConsensus(votes, "item", "annot", "label")
      .orderBy("item").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getDouble(4))).toSeq
    // accuracies vs majority: g1 4/5, g2 3/5, b* 1/4 each; item-4 't'
    // weight folds g1 then g2 (annotator order): (0 + 4/5) + 3/5
    val wT = (0.0 + 4.0 / 5.0) + 3.0 / 5.0
    assert(got(3) == ((4L, 5L, "f", "t", wT)), "weighted vote overturns")
    assert(got(4) == ((5L, 2L, "a", "a", 0.0 + 4.0 / 5.0)),
      "1-1 majority tie resolves to the smallest label")
    assert(got.take(3).forall(r => r._3 == "t" && r._4 == "t" && r._5 == wT))
    // duplicate (item, annotator) votes collapse to the smallest label
    val dup = votes.union(Seq((5L, "g1", "zzz")).toDF("item", "annot", "label"))
    val g5 = Classifier.annotatorConsensus(dup, "item", "annot", "label")
      .filter(org.apache.spark.sql.functions.col("item") === 5L)
      .collect().head
    assert(g5.getString(2) == "a" && g5.getLong(1) == 2L)
  }

  test("brierDecomposition: hand-replayed Murphy terms and the identity") {
    // two perfectly-within-bin forecasts: 0.2 (y=0), 0.8 (y=1)
    val df = Seq((0.2, false), (0.8, true)).toDF("score", "label")
    val r = Classifier.brierDecomposition(df, "score", "label", nBins = 2)
      .collect().head
    val brier = (8.0e10 / 1.0e12) / 2.0
    val rel = (1.0 * (0.2 * 0.2) + 1.0 * ((0.8 - 1.0) * (0.8 - 1.0))) / 2.0
    val res = (1.0 * ((0.0 - 0.5) * (0.0 - 0.5))
      + 1.0 * ((1.0 - 0.5) * (1.0 - 0.5))) / 2.0
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == brier && r.getDouble(2) == rel &&
      r.getDouble(3) == res && r.getDouble(4) == 0.25)
    // zero within-bin score variance -> the identity holds (to double
    // rounding; REL and brier take different-order paths to the value)
    assert(math.abs(r.getDouble(1) -
      (r.getDouble(2) - r.getDouble(3) + r.getDouble(4))) < 1e-15)
    // empty input: n = 0 with null terms, never a division error
    val empty = Classifier.brierDecomposition(
      Seq.empty[(Double, Boolean)].toDF("score", "label"), "score", "label")
      .collect().head
    assert(empty.getLong(0) == 0L && empty.isNullAt(1) && empty.isNullAt(4))
  }

  test("splitConformal: hand order statistic, coverage, k > n degenerate") {
    import spark.implicits._
    // calibration scores |y - pred| = 1..10 exactly; alpha = 0.2 ->
    // k = ceil(11 * 0.8) = 9 -> q_hat = 9
    val cal = (1 to 10).map(i => (i.toDouble, 0.0)).toDF("y", "pred")
    val test = Seq((5.0, 0.0), (9.0, 0.0), (10.0, 0.0)).toDF("y", "pred")
    val r = Classifier.splitConformal(cal, test, "y", "pred", alpha = 0.2)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((10L, 9L, 9.0)))
    assert((r.getLong(3), r.getLong(4)) == ((3L, 2L)), "10 > q_hat, 5 and 9 covered")
    assert(r.getDouble(5) == 2.0 / 3.0)
    // alpha too small for n: k > n -> interval is the whole line
    val tiny = Seq((1.0, 0.0), (2.0, 0.0), (3.0, 0.0)).toDF("y", "pred")
    val deg = Classifier.splitConformal(tiny, test, "y", "pred", alpha = 0.1)
      .collect().head
    assert(deg.getLong(0) == 3L && deg.getLong(1) == 4L && deg.isNullAt(2))
    assert(deg.getLong(4) == 3L && deg.getDouble(5) == 1.0)
    intercept[IllegalArgumentException] {
      Classifier.splitConformal(cal, test, "y", "pred", alpha = 0.0)
    }
  }

  test("plattScale: symmetric separation, trajectory shape, guards, det stop") {
    // perfectly symmetric ±1 separation: B stays ~0 (quantization may
    // drift a unit), A climbs toward the separator every Newton step
    val rows = (1 to 10).map(_ => (1.0, true)) ++
      (1 to 10).map(_ => (-1.0, false))
    val df = rows.toDF("s", "y")
    val got = Classifier.plattScale(df, "s", "y", iters = 4)
      .orderBy("iter").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == (0 to 4))
    assert(got(0)._2 == 0L && got(0)._3 == 0L, "A0 = 0; B0 = ln(11/11) = 0")
    val as = got.map(_._2)
    assert(as.sliding(2).forall(p => p(1) > p(0)),
      "A strictly climbs on separable data")
    assert(got.forall(g => math.abs(g._3) <= 2L),
      "B stays at symmetric-noise level")
    // determinism: rerun identical
    val again = Classifier.plattScale(df, "s", "y", iters = 4)
      .orderBy("iter").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == again.toSeq)
    // constant score -> singular Hessian -> ascent stops, state repeats
    val const = ((1 to 5).map(_ => (2.0, true)) ++
      (1 to 5).map(_ => (2.0, false))).toDF("s", "y")
    val stopped = Classifier.plattScale(const, "s", "y", iters = 3)
      .orderBy("iter").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(stopped.distinct.length <= 2,
      "after the degenerate step the state repeats")
    intercept[IllegalArgumentException] {
      Classifier.plattScale((1 to 3).map(_ => (1.0, true)).toDF("s", "y"),
        "s", "y")
    }
    intercept[IllegalArgumentException] {
      Classifier.plattScale(Seq((5000.0, true), (-1.0, false)).toDF("s", "y"),
        "s", "y")
    }
  }

  test("nbMulticlass: argmax routing, unseen-bucket smoothing, ties, margins") {
    def rf(x: Double, d: Int): Double =
      math.floor(x * math.pow(10, d) + 0.5) / math.pow(10, d)
    val seed = Seq(
      ("en", "alpha alpha bravo"), ("en", "alpha charlie"),
      ("de", "beta beta delta"), ("de", "beta echo")).toDF("lang", "text")
    val model = Classifier.nbMulticlassTrain(seed, "text", "lang")
    val rows = model.collect().map(r => (r.getAs[String]("label"),
      r.getAs[String]("feature"), r.getAs[Long]("c"), r.getAs[Long]("tot_c"),
      r.getAs[Long]("label_docs"), r.getAs[Double]("lp"),
      r.getAs[Double]("prior")))
    // 5 tokens and 2 docs per class; priors equal; lp replays the formula
    assert(rows.forall(r => r._4 == 5L && r._5 == 2L))
    assert(rows.forall(r => r._7 == rf(math.log(2.0 / 4.0), 6)))
    assert(rows.forall(r => r._6 == rf(math.log((r._3 + 1.0) / (5.0 + 65536.0)), 6)))

    val docs = Seq((1L, "alpha alpha"), (2L, "beta"), (3L, "gamma"),
      (4L, "")).toDF("id", "text")
    val got = Classifier.nbMulticlassScore(docs, "id", "text", model)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L), "token-less doc dropped")
    assert(got(0)._2 == "en" && got(1)._2 == "de")
    assert(got.forall(_._4 >= 0.0), "margins are best − runner-up")
    // doc 1 score replays from the model artifact: prior + 2·lp(alpha|en);
    // alpha is en's only c=3 feature
    val lpAlphaEn = rows.find(r => r._1 == "en" && r._3 == 3L).get._6
    val prior = rf(math.log(0.5), 6)
    assert(got(0)._3 == rf(prior + 2.0 * lpAlphaEn, 4))
    // doc 3's only token is unseen by BOTH classes: equal tot_c and priors
    // mean an exact tie, which breaks to the smaller label
    assert(got(2)._2 == "de" && got(2)._4 == 0.0)
    // a one-label model scores margin 0.0 everywhere
    val one = Classifier.nbMulticlassTrain(
      Seq(("en", "alpha bravo")).toDF("lang", "text"), "text", "lang")
    val o = Classifier.nbMulticlassScore(Seq((9L, "alpha")).toDF("id", "text"),
      "id", "text", one).collect()
    assert(o.length == 1 && o(0).getString(1) == "en" && o(0).getDouble(3) == 0.0)
  }
}
