package graft.operators

import graft.SparkFunSuite

class TrendSpec extends SparkFunSuite {
  import spark.implicits._

  test("trendFit: exact hand-computed line, perfect fit has r2 = 1") {
    // y = 2x + 1 exactly
    val df = Seq(("a", 0L, 1.0), ("a", 1L, 3.0), ("a", 2L, 5.0), ("a", 3L, 7.0))
      .toDF("g", "x", "y")
    val r = Trend.trendFit(df, Seq("g"), "x", "y").collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 1.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("trendFit: known noisy fixture matches the closed form") {
    // points (0,0), (1,2), (2,2): slope = 1, intercept = 1/3, r2 = 3/4
    val df = Seq(("a", 0L, 0.0), ("a", 1L, 2.0), ("a", 2L, 2.0)).toDF("g", "x", "y")
    val r = Trend.trendFit(df, Seq("g"), "x", "y").collect().head
    assert(r.getAs[Double]("slope") == 1.0)
    assert(math.abs(r.getAs[Double]("intercept") - 1.0 / 3.0) < 1e-15)
    assert(r.getAs[Double]("r2") == 0.75)
  }

  test("trendFit: degenerate groups — single x null fit, constant y slope 0 null r2") {
    val df = Seq(("one_x", 5L, 1.0), ("one_x", 5L, 3.0),
      ("const_y", 0L, 4.0), ("const_y", 2L, 4.0)).toDF("g", "x", "y")
    val rows = Trend.trendFit(df, Seq("g"), "x", "y")
      .orderBy("g").collect()
    val constY = rows(0); val oneX = rows(1)
    assert(constY.getAs[Double]("slope") == 0.0 && constY.isNullAt(4))
    assert(oneX.isNullAt(2) && oneX.isNullAt(3) && oneX.isNullAt(4))
  }

  test("trendFit: groups fit independently; null x/y rows excluded") {
    val df = Seq((Some("a"), Some(0L), Some(1.0)), (Some("a"), Some(1L), Some(2.0)),
      (Some("a"), None, Some(9.0)), (Some("a"), Some(7L), None),
      (Some("b"), Some(0L), Some(5.0)), (Some("b"), Some(1L), Some(4.0)))
      .toDF("g", "x", "y")
    val rows = Trend.trendFit(df, Seq("g"), "x", "y").orderBy("g").collect()
    assert(rows(0).getAs[Long]("n") == 2L && rows(0).getAs[Double]("slope") == 1.0)
    assert(rows(1).getAs[Double]("slope") == -1.0)
  }

  test("seasonalProfile: exact cell means/stddevs, constant cell = 0, nulls drop") {
    val df = Seq(
      ("a", Some(9), Some(2.0)), ("a", Some(9), Some(4.0)),
      ("a", Some(10), Some(5.0)), ("a", Some(10), Some(5.0)),
      ("a", None, Some(99.0)), ("a", Some(9), None)
    ).toDF("g", "hour", "v")
    val got = Trend.seasonalProfile(df, Seq("g"), "hour", "v")
      .orderBy("hour").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
    // hour 9: mean 3, population var = (4+16)/2 - 9 = 1 → stddev 1
    // hour 10: constant → stddev exactly 0 (the max-guard keeps it clean)
    assert(got == Seq((9, 2L, 3.0, 1.0), (10, 2L, 5.0, 0.0)))
    intercept[IllegalArgumentException] {
      Trend.seasonalProfile(df, Seq.empty, "hour", "v")
    }
  }

  test("ewmaLevel: hand-replayed integer fold, seed, floor steps") {
    // alpha = 1/4: s' = (x + 3s) div 4 in micro-units, seeded at x0
    //   s0 = 4e6; s1 = (8e6 + 12e6)/4 = 5e6; s2 = 15e6/4 = 3750000;
    //   s3 = (16e6 + 11250000)/4 = 6812500  → ewma 6.8125
    val df = Seq(("a", 1L, 4L), ("a", 2L, 8L), ("a", 3L, 0L),
      ("a", 4L, 16L), ("b", 1L, 7L)).toDF("g", "t", "v")
    val got = Trend.ewmaLevel(df, Seq("g"), "t", "v")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(("a", 4L, 6812500L, 6.8125),
      ("b", 1L, 7000000L, 7.0)))
    // out-of-order input folds in orderCol order, not arrival order
    val shuffled = Trend.ewmaLevel(
      df.orderBy($"v".desc).repartition(3), Seq("g"), "t", "v")
      .orderBy("g").collect().map(_.getLong(2)).toSeq
    assert(shuffled == Seq(6812500L, 7000000L))
    // floor is exact: 1 then 0 → (0 + 3e6) div 4 = 750000
    val tiny = Trend.ewmaLevel(Seq(("a", 1L, 1L), ("a", 2L, 0L))
      .toDF("g", "t", "v"), Seq("g"), "t", "v")
    assert(tiny.head.getAs[Long]("ewma_e6") == 750000L)
  }

  test("seasonalAnomalies: hand counts, constant cells, strict boundary") {
    // cell (g, 9): values 0,0,0,0,100 → mean 20, popvar = 1600·4/5? no:
    // E[x²] = 2000, mean² = 400 → var 1600, σ = 40; |100−20| = 80 ≤ 120
    // at z=3 (no anomaly), but > 40 at z=1
    val df = Seq(("g", 9, 0.0), ("g", 9, 0.0), ("g", 9, 0.0),
      ("g", 9, 0.0), ("g", 9, 100.0),
      ("g", 10, 5.0), ("g", 10, 5.0)).toDF("g", "hour", "v")
    val z3 = Trend.seasonalAnomalies(df, Seq("g"), "hour", "v", z = 3.0)
      .orderBy("hour").collect()
      .map(r => (r.getInt(1), r.getAs[Long]("n"),
        r.getAs[Long]("n_anomalies"))).toSeq
    assert(z3 == Seq((9, 5L, 0L), (10, 2L, 0L)))
    val z1 = Trend.seasonalAnomalies(df, Seq("g"), "hour", "v", z = 1.0)
      .orderBy("hour").collect()
      .map(r => (r.getInt(1), r.getAs[Long]("n_anomalies"))).toSeq
    // z=1: |100-20|=80 > 40 flags; the four zeros: |0-20|=20 ≤ 40 don't;
    // the constant hour-10 cell has σ=0 and no deviations
    assert(z1 == Seq((9, 1L), (10, 0L)))
    // constant cell with one deviator: σ>0 case covered above; a truly
    // constant cell never flags (|v-mean| = 0 is not > 0)
    val const = Seq(("g", 1, 7.0), ("g", 1, 7.0)).toDF("g", "hour", "v")
    assert(Trend.seasonalAnomalies(const, Seq("g"), "hour", "v")
      .head.getAs[Long]("n_anomalies") == 0L)
    intercept[IllegalArgumentException] {
      Trend.seasonalAnomalies(df, Seq("g"), "hour", "v", z = 0.0)
    }
  }

  test("autocorrelation: hand-computed lag-1 r on a linear series") {
    // series 1,2,3,4 at days 1-4: lag-1 pairs x=[1,2,3], y=[2,3,4]
    // num = 3·20−6·9 = 6; denX = 3·14−36 = 6; denY = 3·29−81 = 6
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0),
      ("g", 4L, 4.0)).toDF("g", "day", "v")
    val got = Trend.autocorrelation(df, Seq("g"), "day", "v", maxLag = 2)
      .orderBy("lag").collect()
    assert(got.map(r => (r.getInt(1), r.getLong(2))).toSeq ==
      Seq((1, 3L), (2, 2L)))
    val want1 = 6.0 / (math.sqrt(6.0) * math.sqrt(6.0))
    assert(got(0).getAs[Double]("acf") == want1)
    // lag 2: x=[1,2], y=[3,4]: num = 2·11−3·7 = 1; den = 2·5−9 = 1 each
    assert(got(1).getAs[Double]("acf") == 1.0)
    // alternating series has negative lag-1 autocorrelation
    val alt = Seq(("g", 1L, 1.0), ("g", 2L, 5.0), ("g", 3L, 1.0),
      ("g", 4L, 5.0)).toDF("g", "day", "v")
    val a1 = Trend.autocorrelation(alt, Seq("g"), "day", "v", maxLag = 1)
      .head.getAs[Double]("acf")
    assert(a1 < 0.0, s"alternating series must anticorrelate: $a1")
  }

  test("autocorrelation: gaps drop straddling pairs; constant series null") {
    // days 1, 2, 4: lag-1 pairs only (d1,d2) — day 3 is missing, so
    // (d2,·) and (·,d4) must NOT pair across the gap
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 4L, 9.0))
      .toDF("g", "day", "v")
    val got = Trend.autocorrelation(df, Seq("g"), "day", "v", maxLag = 3)
      .orderBy("lag").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.isNullAt(3))).toSeq
    // lag1: 1 pair (degenerate → null acf); lag2: (d2,d4) 1 pair;
    // lag3: (d1,d4) 1 pair; single-pair cells are constant → null
    assert(got == Seq((1, 1L, true), (2, 1L, true), (3, 1L, true)))
    val const = Seq(("g", 1L, 5.0), ("g", 2L, 5.0), ("g", 3L, 5.0))
      .toDF("g", "day", "v")
    val c = Trend.autocorrelation(const, Seq("g"), "day", "v", maxLag = 1)
      .head
    assert(c.isNullAt(3), "zero variance ⇒ null, never NaN")
    intercept[IllegalArgumentException] {
      Trend.autocorrelation(df, Seq("g"), "day", "v", maxLag = 0)
    }
  }

  test("ewmaLevel: negative values rejected loudly, bad alpha rejected") {
    val df = Seq(("a", 1L, -3L)).toDF("g", "t", "v")
    val e = intercept[Exception] {
      Trend.ewmaLevel(df, Seq("g"), "t", "v").collect()
    }
    assert(e.getMessage != null)
    intercept[IllegalArgumentException] {
      Trend.ewmaLevel(df, Seq("g"), "t", "v", alphaNum = 5L, alphaDen = 4L)
    }
    intercept[IllegalArgumentException] {
      Trend.ewmaLevel(df, Seq.empty, "t", "v")
    }
  }

  test("mannKendall: hand-computed S, ties, degenerate groups, tied times") {
    val df = Seq(
      // a: strictly increasing [1,2,3] -> S=3, vn=66, tau=1
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      // b: [1,1,2] -> S=2, tie t=2: vn=66-18=48, d=3, u=1
      ("b", 1L, 1.0), ("b", 2L, 1.0), ("b", 3L, 2.0),
      // c: constant [5,5] -> vn=0 -> null z/tau
      ("c", 1L, 5.0), ("c", 2L, 5.0),
      // d: single row -> vn=0
      ("d", 1L, 9.0),
      // e: tied ORDER values: days [1,1,2], y [1,2,3] -> the equal-day
      // pair is excluded: S=2, no y-ties -> vn=66
      ("e", 1L, 1.0), ("e", 1L, 2.0), ("e", 2L, 3.0),
      // f: decreasing pair [3,1] -> S=-1, vn=18, z=(S+1)/. = 0
      ("f", 1L, 3.0), ("f", 2L, 1.0)).toDF("g", "t", "y")
    val got = Trend.mannKendall(df, Seq("g"), "t", "y").orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double])))
    val za = 2.0 / math.sqrt(66.0 / 18.0)
    val zb = 1.0 / math.sqrt(48.0 / 18.0)
    val ze = 1.0 / math.sqrt(66.0 / 18.0)
    assert(got.toSeq == Seq(
      ("a", 3L, 3L, 66.0, Some(za), Some(1.0)),
      ("b", 3L, 2L, 48.0, Some(zb), Some(2.0 / math.sqrt(3.0 * 2.0))),
      ("c", 2L, 0L, 0.0, None, None),
      ("d", 1L, 0L, 0.0, None, None),
      ("e", 3L, 2L, 66.0, Some(ze), Some(2.0 / 3.0)),
      ("f", 2L, -1L, 18.0, Some(0.0), Some(-1.0))))
    // null rows drop; empty groupCols rejected
    val withNulls = Seq(("a", Option(1L), Option(1.0)),
      ("a", None, Option(2.0)), ("a", Option(2L), None))
      .toDF("g", "t", "y")
    assert(Trend.mannKendall(withNulls, Seq("g"), "t", "y")
      .collect().head.getAs[Long]("n") == 1L)
    intercept[IllegalArgumentException] {
      Trend.mannKendall(df, Seq.empty, "t", "y")
    }
  }

  test("holtLinear: hand-replayed fold, seed, single row, trunc on negatives") {
    // alpha=1/4, beta=1/8, x=[8,12,20]: seed (8e6, 4e6); t=2 identity
    // step (12e6, 4e6); t=3: l=(20e6+3*16e6)/4=17e6,
    // b=(5e6+28e6)//8=4125000
    val df = Seq(("a", 1L, 8.0), ("a", 2L, 12.0), ("a", 3L, 20.0),
      ("s", 1L, 7.5)).toDF("g", "t", "v")
    val got = Trend.holtLinear(df, Seq("g"), "t", "v").orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(6))).toSeq
    assert(got == Seq(("a", 3L, 17000000L, 4125000L, 21.125),
      ("s", 1L, 7500000L, 0L, 7.5)))
    // alpha=1/3, beta=1/2, x=[0,-1,-1]: l3 = -5e6 // 3 = -1666666
    // (TRUNCATION toward zero — floor would give -1666667); then
    // b3 = (-666666 + -1000000) // 2 = -833333
    val neg = Seq(("n", 1L, 0.0), ("n", 2L, -1.0), ("n", 3L, -1.0))
      .toDF("g", "t", "v")
    val gn = Trend.holtLinear(neg, Seq("g"), "t", "v",
      alphaNum = 1L, alphaDen = 3L, betaNum = 1L, betaDen = 2L)
      .collect().head
    assert((gn.getLong(2), gn.getLong(3)) == ((-1666666L, -833333L)))
    intercept[IllegalArgumentException] {
      Trend.holtLinear(df, Seq("g"), "t", "v", alphaNum = 5L, alphaDen = 4L)
    }
    intercept[IllegalArgumentException] {
      Trend.holtLinear(df, Seq("g"), "t", "v", betaNum = 0L)
    }
  }

  test("theilSen: hand medians, even rule, equal-x excluded, degenerate") {
    val df = Seq(
      // a: (0,1),(1,2),(2,10): slopes [1, 4.5, 8] -> 4.5;
      //    residuals [1, -2.5, 1] -> 1.0
      ("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 10.0),
      // b: one pair, even residual rule: slope 1, intercept (0+0)/2
      ("b", 0L, 0.0), ("b", 1L, 1.0),
      // c: duplicate x=0 rows pair only against x=1: slopes [-2, 2]
      //    -> 0.0; residuals [1, 5, 3] -> 3.0
      ("c", 0L, 1.0), ("c", 0L, 5.0), ("c", 1L, 3.0),
      // d: single point: no pair, nulls
      ("d", 7L, 9.0)).toDF("g", "t", "y")
    val got = Trend.theilSen(df, Seq("g"), "t", "y").orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSeq
    assert(got == Seq(
      ("a", 3L, 3L, Some(4.5), Some(1.0)),
      ("b", 2L, 1L, Some(1.0), Some(0.0)),
      ("c", 3L, 2L, Some(0.0), Some(3.0)),
      ("d", 1L, 0L, None, None)))
    intercept[IllegalArgumentException] {
      Trend.theilSen(df, Seq.empty, "t", "y")
    }
  }

  test("changePoint: clean break found, tie earliest, single row drops") {
    val df = Seq(
      // a: [0,0,10,10] -> split after idx 2 explains everything
      ("a", 1L, 0.0), ("a", 2L, 0.0), ("a", 3L, 10.0), ("a", 4L, 10.0),
      // b: constant -> every split costs 0, earliest (idx 1) wins
      ("b", 1L, 5.0), ("b", 2L, 5.0), ("b", 3L, 5.0),
      // d: single row -> no split, no output row
      ("d", 1L, 9.0)).toDF("g", "i", "y")
    val got = Trend.changePoint(df, Seq("g"), "i", "y").orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    // micro-units: sse_total(a) = 2e14 - (2e7)^2/4 = 1e14
    assert(got == Seq(
      ("a", 4L, 2L, 1.0e14, 0.0, 1.0e14),
      ("b", 3L, 1L, 0.0, 0.0, 0.0)))
    intercept[IllegalArgumentException] {
      Trend.changePoint(df, Seq.empty, "i", "y")
    }
  }

  test("seasonalNaiveSkill: hand MAEs, gaps drop terms, missing lags") {
    val df = Seq(
      // g: [1,2,4,8,16] at 1..5, period 2:
      //   naive errs 1,2,4,8 (mae 3.75); seasonal 3,6,12 (mae 7)
      ("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 4.0), ("g", 4L, 8.0),
      ("g", 5L, 16.0),
      // h: idx 1,2,4 — naive only (2,1); seasonal only (4 vs 2)
      ("h", 1L, 10.0), ("h", 2L, 13.0), ("h", 4L, 20.0),
      // z: single point: zero error terms, null maes/mase
      ("z", 1L, 5.0)).toDF("g", "i", "y")
    val got = Trend.seasonalNaiveSkill(df, Seq("g"), "i", "y", period = 2)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double]))).toSeq
    assert(got == Seq(
      ("g", 4L, 3L, Some(3.75), Some(7.0), Some(7.0 / 3.75)),
      ("h", 1L, 1L, Some(3.0), Some(7.0), Some(7.0 / 3.0)),
      ("z", 0L, 0L, None, None, None)))
    intercept[IllegalArgumentException] {
      Trend.seasonalNaiveSkill(df, Seq("g"), "i", "y", period = 1)
    }
  }

  test("crossCorrelation: perfect lead at +1, empty lags absent") {
    // y(t) = x(t-1): pairs (x(t), y(t+1)) are identical -> r = 1 at +1
    val df = Seq((1L, 1.0, 5.0), (2L, 2.0, 1.0), (3L, 4.0, 2.0),
      (4L, 8.0, 4.0)).toDF("i", "x", "y")
    val got = Trend.crossCorrelation(df, "i", "x", "y", maxLag = 3)
      .orderBy("lag").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    // identical micro pairs (1,1),(2,2),(4,4): num = denx = deny =
    // 14e12, r = num / (sqrt(num) * sqrt(num)) — the engine's exact
    // float path, 1 ulp under 1.0
    val e = 14.0e12 / (math.sqrt(14.0e12) * math.sqrt(14.0e12))
    assert(got(1) == ((3L, Some(e))))
    // all 7 lags have >= 1 pair here; a 10-lag request on 4 points
    // drops the empty ones
    val wide = Trend.crossCorrelation(df, "i", "x", "y", maxLag = 10)
      .collect().map(_.getInt(0))
    assert(wide.forall(l => l >= -3 && l <= 3))
    intercept[IllegalArgumentException] {
      Trend.crossCorrelation(df, "i", "x", "y", maxLag = 0)
    }
  }

  test("holtWinters: hand-replayed integer triple-smoothing, period 2") {
    // series 10, 14, 8, 16 at defaults a=1/4, b=1/8, g=1/4:
    //   p2: l=11e6, t=125000, s2=750000
    //   p3: l=10343750, t=27343, s1=-585937 (truncating divisions)
    //   p4: l=11590819, t=179808, s2=1664795
    val df = Seq(("g", 1, 10.0), ("g", 2, 14.0), ("g", 3, 8.0),
      ("g", 4, 16.0)).toDF("g", "o", "v")
    val got = Trend.holtWinters(df, Seq("g"), "o", "v", period = 2)
      .orderBy("slot").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    assert(got == Seq(
      (4L, 0, 11590819L, 179808L, -585937L),
      (4L, 1, 11590819L, 179808L, 1664795L)))
    // single-element series: init state only, zero seasonals
    val one = Trend.holtWinters(Seq(("g", 1, 3.5)).toDF("g", "o", "v"),
        Seq("g"), "o", "v", period = 2)
      .orderBy("slot").collect()
    assert(one.map(r => (r.getLong(3), r.getLong(4), r.getLong(5))).toSeq ==
      Seq((3500000L, 0L, 0L), (3500000L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      Trend.holtWinters(df, Seq("g"), "o", "v", period = 1)
    }
  }
}
