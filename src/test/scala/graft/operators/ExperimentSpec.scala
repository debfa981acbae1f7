package graft.operators

import graft.SparkFunSuite

class ExperimentSpec extends SparkFunSuite {
  import spark.implicits._

  private def events = Seq(
    // control: user 1 converts (on its THIRD event), user 2 never
    ("control", Some(1L), false), ("control", Some(1L), false),
    ("control", Some(1L), true), ("control", Some(2L), false),
    // treatment: both users convert; user 3 has repeat conversions
    ("treatment", Some(3L), true), ("treatment", Some(3L), true),
    ("treatment", Some(4L), true),
    // a null user never counts anywhere
    ("treatment", Option.empty[Long], true)
  ).toDF("arm", "user_id", "converted")

  test("abReport: user-level dedup, hand-replayed Wilson and pooled z, control nulls") {
    val got = Experiment.abReport(events, "arm", "user_id", "converted",
        "control").orderBy("arm").collect()
    val ctrl = got(0)
    val treat = got(1)
    assert(ctrl.getString(0) == "control" && ctrl.getLong(1) == 2 &&
      ctrl.getLong(2) == 1 && ctrl.getDouble(3) == 0.5)
    assert(ctrl.isNullAt(6) && ctrl.isNullAt(7), "control is its own baseline")
    assert(treat.getLong(1) == 2 && treat.getLong(2) == 2 &&
      treat.getDouble(3) == 1.0)
    // independent replay of the exact expression chains
    val z = 1.96; val z2 = z * z
    def wilson(x: Long, n: Long): (Double, Double) = {
      val nd = n.toDouble; val p = x.toDouble / nd
      val denom = 1.0 + z2 / nd
      val center = (p + z2 / (2.0 * nd)) / denom
      val half = (z / denom) * math.sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd))
      (math.max(0.0, center - half), math.min(1.0, center + half))
    }
    assert((ctrl.getDouble(4), ctrl.getDouble(5)) == wilson(1, 2))
    assert((treat.getDouble(4), treat.getDouble(5)) == wilson(2, 2))
    val pooled = (2.0 + 1.0) / (2.0 + 2.0)
    val se = math.sqrt(pooled * (1.0 - pooled) * (1.0 / 2.0 + 1.0 / 2.0))
    assert(treat.getDouble(6) == 0.5)
    assert(treat.getDouble(7) == 0.5 / se)
  }

  test("abReport: zero pooled variance nulls z; missing control throws") {
    val allConv = Seq(("a", 1L, true), ("b", 2L, true)).toDF("arm", "u", "c")
    val r = Experiment.abReport(allConv, "arm", "u", "c", "a")
      .orderBy("arm").collect()
    assert(r(1).isNullAt(7), "100% everywhere has no scale for a z-stat")
    assert(r(1).getDouble(6) == 0.0, "lift is still defined")
    intercept[IllegalArgumentException] {
      Experiment.abReport(events, "arm", "user_id", "converted", "nope")
    }
  }

  test("cupedAdjust: hand-replayed pooled theta, per-arm adjustment, null exclusion") {
    // y = 2x + arm effect: the covariate explains most variance, so the
    // adjustment must pull each arm's mean toward the true effect
    val units = Seq(
      ("a", 10.0, 4.0), ("a", 6.0, 2.0), ("a", 2.0, 0.0),
      ("b", 13.0, 5.0), ("b", 9.0, 3.0), ("b", 5.0, 1.0)
    ).toDF("arm", "y", "x")
    val got = Experiment.cupedAdjust(units, "arm", "y", "x")
      .orderBy("arm").collect()
    // exact micro-unit sums replayed in plain arithmetic
    val xs = Seq(4.0, 2.0, 0.0, 5.0, 3.0, 1.0)
    val ys = Seq(10.0, 6.0, 2.0, 13.0, 9.0, 5.0)
    val n = 6.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(v => v * v).sum
    val sxy = xs.zip(ys).map(p => p._1 * p._2).sum
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = got(0); val b = got(1)
    assert(a.getLong(1) == 3 && b.getLong(1) == 3)
    assert(a.getDouble(4) == theta && b.getDouble(4) == theta)
    assert(a.getDouble(5) == 6.0 - theta * (2.0 - sx / n))
    assert(b.getDouble(5) == 9.0 - theta * (3.0 - sx / n))
    // adjustment shrinks the arm gap toward the true effect (+3 here,
    // raw gap 3 stays 3 since x-imbalance is symmetric... use asymmetric x)
    val skewed = Seq(("a", 10.0, 8.0), ("a", 2.0, 0.0),
      ("b", 11.0, 8.0), ("b", 7.0, 4.0)).toDF("arm", "y", "x")
    val s = Experiment.cupedAdjust(skewed, "arm", "y", "x")
      .orderBy("arm").collect()
    val rawGap = 9.0 - 6.0
    val adjGap = s(1).getDouble(5) - s(0).getDouble(5)
    assert(math.abs(adjGap - rawGap) > 1e-9,
      "covariate imbalance must move the adjusted gap")
    // degenerate: constant covariate → theta null, adjusted = mean
    val const = Seq(("a", 1.0, 5.0), ("b", 3.0, 5.0)).toDF("arm", "y", "x")
    val c = Experiment.cupedAdjust(const, "arm", "y", "x").orderBy("arm").collect()
    assert(c(0).isNullAt(4) && c(0).getDouble(5) == 1.0 && c(1).getDouble(5) == 3.0)
    // null rows are excluded
    val withNull = Seq(("a", Some(1.0), Some(2.0)), ("a", None, Some(9.0)),
      ("b", Some(2.0), Some(2.0))).toDF("arm", "y", "x")
    val w = Experiment.cupedAdjust(withNull, "arm", "y", "x")
      .orderBy("arm").collect()
    assert(w(0).getLong(1) == 1, "null metric row must not count")
  }

  test("mannWhitney: hand-replayed midranks, tie correction, degenerate null z") {
    // a: {1, 2, 3}; b: {3, 4, 5} — one tie at 3
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 3L), ("b", 4L), ("b", 5L), ("c", 99L)).toDF("arm", "v")
    val r = Experiment.mannWhitney(df, "arm", "v", "a", "b").collect().head
    // midranks: 1→1, 2→2, {3,3}→3.5, 4→5, 5→6; R_b = 3.5+5+6 = 14.5
    val u = 14.5 - 3.0 * 4.0 / 2.0 // = 8.5
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(r.getDouble(2) == u)
    assert(r.getDouble(3) == u / 9.0)
    val n = 6.0
    val ties = 2.0 * 2.0 * 2.0 - 2.0 // one run of 2
    val variance = (3.0 * 3.0 / 12.0) * ((n + 1.0) - ties / (n * (n - 1.0)))
    assert(r.getDouble(4) == (u - 4.5) / math.sqrt(variance))
    // arm "c" is ignored entirely; all-tied values null the z
    val allTied = Seq(("a", 7L), ("a", 7L), ("b", 7L)).toDF("arm", "v")
    val t = Experiment.mannWhitney(allTied, "arm", "v", "a", "b").collect().head
    assert(t.getDouble(3) == 0.5 && t.isNullAt(4),
      "complete ties: AUC ½ by midrank, no variance for a z")
    intercept[IllegalArgumentException] {
      Experiment.mannWhitney(df, "arm", "v", "a", "a")
    }
  }

  test("srmCheck: hand chi2, zero-user declared arm kept, undeclared arm throws") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 3L)).toDF("arm", "u")
    val got = Experiment.srmCheck(df, "arm", "u",
        Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
      .orderBy("arm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(4))).toSeq
    // distinct users: a=2, b=1, c=0; n=3; exp = 1.5, 0.75, 0.75
    var chi2 = 0.0
    for ((o, e) <- Seq((2.0, 1.5), (1.0, 0.75), (0.0, 0.75)))
      chi2 = chi2 + (o - e) * (o - e) / e
    assert(got == Seq(("a", 2L, 2.0 / 3.0, chi2), ("b", 1L, 1.0 / 3.0, chi2),
      ("c", 0L, 0.0, chi2)))
    intercept[IllegalArgumentException] {
      Experiment.srmCheck(df, "arm", "u", Seq("a" -> 1.0)) // one arm
    }
    intercept[IllegalArgumentException] {
      Experiment.srmCheck(df, "arm", "u", Seq("a" -> 0.5, "x" -> 0.5)) // b undeclared
    }
    intercept[IllegalArgumentException] {
      Experiment.srmCheck(df, "arm", "u", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("ebShrinkRates: hand-replayed MoM prior, shrinkage direction, degenerate prior") {
    // items a: 1/1, b: 1/10, c: 5/10, d: 4/10 (event-level rows)
    def rows(item: String, x: Int, n: Int) =
      (0 until n).map(i => (item, i < x))
    val df = (rows("a", 1, 1) ++ rows("b", 1, 10) ++ rows("c", 5, 10) ++
      rows("d", 4, 10)).toDF("item", "ok")
    val got = Experiment.ebShrinkRates(df, "item", "ok")
      .orderBy("item").collect()
    // replay the item-ordered folds and the fixed chain
    val ps = Seq(1.0, 0.1, 0.5, 0.4)
    val sp = ps.foldLeft(0.0)(_ + _)
    val spp = ps.foldLeft(0.0)((acc, p) => acc + p * p)
    val m = sp / 4.0
    val v = spp / 4.0 - m * m
    val k = m * (1.0 - m) / v - 1.0
    val a = got(0)
    assert(a.getLong(1) == 1L && a.getLong(2) == 1L && a.getDouble(3) == 1.0)
    assert(a.getDouble(4) == (1.0 + m * k) / (1.0 + k))
    assert(a.getDouble(5) == m && a.getDouble(6) == k)
    // shrinkage direction: the 1/1 item moves DOWN toward m, the 1/10
    // item moves UP toward m, and big-n items move less than small-n
    assert(a.getDouble(4) < 1.0 && a.getDouble(4) > m)
    val b = got(1)
    assert(b.getDouble(4) > 0.1 && b.getDouble(4) < m)
    assert(math.abs(a.getDouble(4) - a.getDouble(3)) >
      math.abs(b.getDouble(4) - b.getDouble(3)),
      "the n=1 item shrinks harder than the n=10 item")
    // zero between-item variance: null strength, shrunk == raw
    val same = (rows("a", 1, 2) ++ rows("b", 1, 2)).toDF("item", "ok")
    val deg = Experiment.ebShrinkRates(same, "item", "ok")
      .orderBy("item").collect()
    assert(deg.forall(r => r.isNullAt(6) && r.getDouble(4) == r.getDouble(3)))
  }

  test("diffInDiff: hand-replayed 2x2 estimator, SE, cell means") {
    // treated-post {5,7}, treated-pre {1,1,4}, control-post {2,4},
    // control-pre {1,3}; a null metric row is excluded
    val units = Seq(
      (true, true, Some(5.0)), (true, true, Some(7.0)),
      (true, false, Some(1.0)), (true, false, Some(1.0)),
      (true, false, Some(4.0)),
      (false, true, Some(2.0)), (false, true, Some(4.0)),
      (false, false, Some(1.0)), (false, false, Some(3.0)),
      (false, false, Option.empty[Double])
    ).toDF("t", "p", "y")
    val got = Experiment.diffInDiff(units, "t", "p", "y")
      .orderBy("is_treated", "is_post").collect()
    // means: c-pre 2, c-post 3, t-pre 2, t-post 6
    assert(got.map(r => (r.getBoolean(0), r.getBoolean(1), r.getLong(2),
      r.getDouble(3))).toSeq == Seq(
      (false, false, 2L, 2.0), (false, true, 2L, 3.0),
      (true, false, 3L, 2.0), (true, true, 2L, 6.0)))
    // did = (6-2) - (3-2) = 3; s2/n: t-post 2/2, t-pre 3/3, c-post 2/2,
    // c-pre 2/2 -> varSum 4, se 2, t 1.5 (exact doubles, replayed)
    val r0 = got(0)
    assert(r0.getDouble(4) == 3.0 && r0.getDouble(5) == 2.0 &&
      r0.getDouble(6) == 1.5)
    assert(got.forall(r => r.getDouble(4) == 3.0 && r.getDouble(5) == 2.0),
      "scalar verdict repeats on every cell row")
  }

  test("diffInDiff: singleton cell keeps the estimate but nulls se/t") {
    val units = Seq(
      (true, true, 6.0),
      (true, false, 1.0), (true, false, 3.0),
      (false, true, 2.0), (false, true, 4.0),
      (false, false, 1.0), (false, false, 3.0)
    ).toDF("t", "p", "y")
    val got = Experiment.diffInDiff(units, "t", "p", "y")
      .orderBy("is_treated", "is_post").collect()
    assert(got(0).getDouble(4) == (6.0 - 2.0) - (3.0 - 2.0))
    assert(got(0).isNullAt(5) && got(0).isNullAt(6))
  }

  test("diffInDiff: a missing cell fails loudly") {
    val units = Seq((true, true, 1.0), (true, false, 2.0),
      (false, true, 3.0)).toDF("t", "p", "y")
    intercept[IllegalArgumentException] {
      Experiment.diffInDiff(units, "t", "p", "y")
    }
  }

  test("benjaminiHochberg: textbook step-up, null p excluded, clamp at 1") {
    // the classic example: p = (.01, .02, .03, .2, .8), m = 5 ->
    // raw = (.05, .05, .05, .25, .8) = q (already monotone), reject 3
    val tests = Seq(("a", Some(0.01)), ("b", Some(0.02)), ("c", Some(0.03)),
      ("d", Some(0.2)), ("e", Some(0.8)), ("skip", None))
      .toDF("id", "pv")
    val got = Experiment.benjaminiHochberg(tests, "id", "pv", alpha = 0.05)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    // q values written as the same double chains the operator runs:
    // raw_c = .03·5/3 = 0.049999999999999996 in IEEE, and the REVERSE
    // running min propagates it back over a and b (raws exactly 0.05);
    // all three stay ≤ .05 -> rejected
    val qc = 0.03 * 5.0 / 3.0
    assert(got.toSeq == Seq(
      ("a", 1L, qc, true), ("b", 2L, qc, true), ("c", 3L, qc, true),
      ("d", 4L, 0.2 * 5.0 / 4.0, false), ("e", 5L, 0.8, false)),
      s"got ${got.toSeq}")
    // the reverse running min: a large early p is rescued by a small
    // later ratio (p=(.04, .05): raw=(.08, .05) -> q=(.05, .05))
    val mono = Experiment.benjaminiHochberg(
      Seq(("x", 0.04), ("y", 0.05)).toDF("id", "pv"), "id", "pv", 0.05)
      .orderBy("rank").collect().map(_.getDouble(3))
    assert(mono.toSeq == Seq(0.05, 0.05))
    intercept[IllegalArgumentException] {
      Experiment.benjaminiHochberg(tests, "id", "pv", alpha = 1.0)
    }
  }

  test("stratifiedAte: hand-weighted fold, single-arm strata reported not used") {
    // stratum 0: treated {2,4} mean 3 vs control {1} mean 1 -> diff 2
    // stratum 1: treated {10} mean 10 vs control {6,8} mean 7 -> diff 3
    // stratum 2: treated-only {5} -> dropped
    val units = Seq(
      (true, 2.0, 0L), (true, 4.0, 0L), (false, 1.0, 0L),
      (true, 10.0, 1L), (false, 6.0, 1L), (false, 8.0, 1L),
      (true, 5.0, 2L)
    ).toDF("t", "y", "b")
    val r = Experiment.stratifiedAte(units, "t", "y", Seq("b"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((7L, 6L, 1L, 3L, 1L)))
    assert(r.getDouble(5) == (3.0 * 2.0 + 3.0 * 3.0) / 6.0)
    // no stratum with both arms -> null ate, everything dropped
    val oneArm = Experiment.stratifiedAte(
      Seq((true, 1.0, 0L)).toDF("t", "y", "b"), "t", "y", Seq("b"))
      .collect().head
    assert(oneArm.getLong(1) == 0L && oneArm.isNullAt(5))
  }

  test("cohensD: hand-computed effect, Hedges correction, degenerate nulls") {
    // arm A = {1, 2, 3}, arm B = {5, 7}: means 2 and 6; ss_a = 2, ss_b = 2;
    // sp = sqrt(4/3); d = -4/sp; J = 1 - 3/11
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 7.0),
      ("other", 99.0)).toDF("arm", "y")
    val g = Experiment.cohensD(df, "arm", "y", "a", "b").collect()(0)
    assert(g.getLong(0) == 3L && g.getLong(1) == 2L)
    assert(g.getDouble(2) == 2.0 && g.getDouble(3) == 6.0)
    val sp = math.sqrt((2.0 + 2.0) / 3.0)
    assert(g.getDouble(4) == sp)
    assert(g.getDouble(5) == (2.0 - 6.0) / sp)
    assert(g.getDouble(6) == (1.0 - 3.0 / 11.0) * ((2.0 - 6.0) / sp))
    // both arms constant -> zero pooled sd -> null effects, not Infinity
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 3.0), ("b", 3.0))
      .toDF("arm", "y")
    val c = Experiment.cohensD(const, "arm", "y", "a", "b").collect()(0)
    assert(c.getDouble(4) == 0.0 && c.isNullAt(5) && c.isNullAt(6))
    // a 1-row arm cannot estimate variance
    val tiny = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("arm", "y")
    val t = Experiment.cohensD(tiny, "arm", "y", "a", "b").collect()(0)
    assert(t.isNullAt(4) && t.isNullAt(5))
    intercept[IllegalArgumentException] {
      Experiment.cohensD(df, "arm", "y", "a", "a")
    }
  }

  test("mantelHaenszel: hand-folded two-stratum OR/RBG-SE; degenerate pooling nulls") {
    def rf6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def stratum(st: Long, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((st, true, true)) ++ Seq.fill(b)((st, true, false)) ++
        Seq.fill(c)((st, false, true)) ++ Seq.fill(d)((st, false, false))
    // two strata, each (a,b,c,d) with n = 10: R = 2.4, S = 0.4, OR = 6;
    // P = .7, Q = .3 per stratum → var = 1.68/11.52 + 1.0/1.92 + .12/.32
    val rows = stratum(1L, 4, 1, 2, 3) ++ stratum(2L, 3, 2, 1, 4)
    val got = Experiment.mantelHaenszel(
      rows.toDF("st", "treated", "outcome"), "st", "treated", "outcome")
      .collect()(0)
    assert(got.getLong(0) == 2L && got.getLong(1) == 20L)
    assert(got.getDouble(2) == 6.0)
    assert(got.getDouble(3) == rf6(math.log(6.0)))
    val se = rf6(math.sqrt(1.68 / 11.52 + 1.0 / 1.92 + 0.12 / 0.32))
    assert(got.getDouble(4) == se)
    assert(got.getDouble(5) == rf6(rf6(math.log(6.0)) / se))
    // S = 0 in every stratum (no discordant b·c pairs anywhere): ratio
    // fields null instead of infinity
    val degen = stratum(1L, 3, 0, 0, 3) ++ stratum(2L, 2, 0, 0, 2)
    val g2 = Experiment.mantelHaenszel(
      degen.toDF("st", "treated", "outcome"), "st", "treated", "outcome")
      .collect()(0)
    assert(g2.getLong(0) == 2L && g2.isNullAt(2) && g2.isNullAt(5))
  }

  test("poissonBootstrapMean: exact point mean, CI brackets, zero-weight reps drop") {
    val rows = (1L to 40L).map(i => ("g", i, i.toDouble)) ++
      Seq(("tiny", 1000L, 5.0))
    val df = rows.toDF("grp", "id", "v")
    val got = Experiment.poissonBootstrapMean(df, Seq("grp"), "id", "v",
        reps = 64, loIdx = 2, hiIdx = 63)
      .orderBy("grp").collect()
    val g = got(0)
    assert(g.getString(0) == "g" && g.getLong(1) == 40L)
    assert(g.getDouble(2) == 20.5) // exact micro-unit mean of 1..40
    assert(g.getLong(3) == 64L, "40-row group keeps every replicate")
    assert(g.getDouble(4) <= 20.5 && g.getDouble(5) >= 20.5,
      "central-95 percentile CI brackets the mean on a symmetric sample")
    assert(g.getDouble(4) < g.getDouble(5))
    // a 1-row group draws weight 0 with prob 1/e per replicate: some of
    // the 64 replicates die, so the CI must be NULL, visibly
    val t = got(1)
    assert(t.getString(0) == "tiny" && t.getLong(1) == 1L)
    assert(t.getLong(3) < 64L && t.isNullAt(4) && t.isNullAt(5))
    // deterministic: a rerun is row-identical
    val again = Experiment.poissonBootstrapMean(df, Seq("grp"), "id", "v",
      reps = 64, loIdx = 2, hiIdx = 63).orderBy("grp").collect()
    assert(got.map(_.toString).toSeq == again.map(_.toString).toSeq)
    intercept[IllegalArgumentException] {
      Experiment.poissonBootstrapMean(df, Seq.empty, "id", "v")
    }
    intercept[IllegalArgumentException] {
      Experiment.poissonBootstrapMean(df, Seq("grp"), "id", "v",
        reps = 8, loIdx = 5, hiIdx = 4)
    }
  }

  test("ksTest: hand-computed D, brute-force ECDF cross-check, degenerate arm") {
    // a = [1,2,3], b = [2,3,3,4]: cross-multiplied deviations per distinct
    // value are 4, 5, 3, 0 → D_num = 5, D = 5/12
    val df = (Seq(1L, 2L, 3L).map(("g", "a", _)) ++
      Seq(2L, 3L, 3L, 4L).map(("g", "b", _))).toDF("grp", "arm", "v")
    val got = Experiment.ksTest(df, Seq("grp"), "arm", "v", "a", "b")
      .collect().head
    assert(got.getLong(1) == 3L && got.getLong(2) == 4L)
    assert(got.getDouble(3) == 5.0 / 12.0)
    assert(got.getDouble(4) == math.sqrt(12.0 / 7.0) * (5.0 / 12.0))
    // brute-force ECDF reference on a pseudo-random mixed sample
    val vals = (1 to 60).map(i => ("g", if (i % 3 == 0) "a" else "b",
      ((i * 37) % 13).toLong))
    val ref = {
      val as = vals.filter(_._2 == "a").map(_._3)
      val bs = vals.filter(_._2 == "b").map(_._3)
      (as ++ bs).distinct.map { v =>
        math.abs(as.count(_ <= v).toLong * bs.size -
          bs.count(_ <= v).toLong * as.size)
      }.max.toDouble / (as.size.toLong * bs.size)
    }
    val got2 = Experiment.ksTest(vals.toDF("grp", "arm", "v"),
      Seq("grp"), "arm", "v", "a", "b").collect().head
    assert(got2.getDouble(3) == ref)
    // a group missing one arm reports null statistics, not a crash
    val single = Seq(("g", "a", 1L), ("g", "a", 2L)).toDF("grp", "arm", "v")
    val got3 = Experiment.ksTest(single, Seq("grp"), "arm", "v", "a", "b")
      .collect().head
    assert(got3.isNullAt(3) && got3.isNullAt(4))
    // identical samples → D = 0 exactly
    val same = (Seq(1L, 5L, 9L).map(("g", "a", _)) ++
      Seq(1L, 5L, 9L).map(("g", "b", _))).toDF("grp", "arm", "v")
    assert(Experiment.ksTest(same, Seq("grp"), "arm", "v", "a", "b")
      .collect().head.getDouble(3) == 0.0)
  }
}
