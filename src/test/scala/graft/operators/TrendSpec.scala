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
}
