package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class RetentionSpec extends SparkFunSuite {
  import spark.implicits._

  // base sits inside period 2818 of the 7-day grid
  // (2024-01-10T00:00Z = 1704844800 s; 1704844800 / 604800 = 2818.85);
  // +7d moves the period index by exactly 1 regardless of the base's
  // offset within its period
  private val base = 1704844800L
  private def tsDf(rows: Seq[(String, Long)]) =
    rows.toDF("u", "sec").select(col("u"),
      timestamp_seconds(col("sec")).as("ts"))

  test("cohortRetention: hand-computed cohorts, offsets and fractions") {
    val d = 86400L
    val df = tsDf(Seq(
      ("u1", base), ("u1", base + 7 * d), ("u1", base + 21 * d),
      ("u2", base + 3600L), // same period as base
      ("u3", base + 7 * d), ("u3", base + 14 * d)))
    val got = Retention.cohortRetention(df, "u", "ts", periodDays = 7)
      .orderBy("cohort_period", "period_offset").collect()
      .map(r => (r.getLong(0) - 2818L, r.getLong(1), r.getAs[Long]("n_active"),
        r.getAs[Long]("cohort_size"), r.getAs[Double]("retention")))
    assert(got.toSeq == Seq(
      (0L, 0L, 2L, 2L, 1.0), (0L, 1L, 1L, 2L, 0.5), (0L, 3L, 1L, 2L, 0.5),
      (1L, 0L, 1L, 1L, 1.0), (1L, 1L, 1L, 1L, 1.0)))
  }

  test("cohortRetention: multiple events in one period count a user once") {
    val df = tsDf(Seq(("u1", base), ("u1", base + 60L), ("u1", base + 120L)))
    val got = Retention.cohortRetention(df, "u", "ts").collect()
    assert(got.length == 1 && got.head.getAs[Long]("n_active") == 1L &&
      got.head.getAs[Long]("cohort_size") == 1L)
  }

  test("cohortRetention: null users and null timestamps are excluded, never phantom cells") {
    val df = tsDf(Seq(("u1", base)))
      .unionByName(Seq(("u1", None: Option[Long]), (null, Some(base)))
        .toDF("u", "sec").select(col("u"),
          timestamp_seconds(col("sec")).as("ts")))
    val got = Retention.cohortRetention(df, "u", "ts").collect()
    assert(got.length == 1 && got.head.getAs[Long]("cohort_size") == 1L &&
      !got.exists(r => r.isNullAt(1)))
  }

  test("cohortRetention: period width changes the grid; args validated") {
    val d = 86400L
    val df = tsDf(Seq(("u1", base), ("u1", base + 2 * d)))
    // 1-day grid: +2d is offset 2; 7-day grid: base sits at 2818.85 so
    // +2d crosses one weekly boundary — offset 1, not 2
    val daily = Retention.cohortRetention(df, "u", "ts", periodDays = 1)
      .orderBy("period_offset").collect()
    assert(daily.map(_.getLong(1)).toSeq == Seq(0L, 2L))
    val weekly = Retention.cohortRetention(df, "u", "ts", periodDays = 7)
      .orderBy("period_offset").collect()
    assert(weekly.map(_.getLong(1)).toSeq == Seq(0L, 1L))
    intercept[IllegalArgumentException] {
      Retention.cohortRetention(df, "u", "ts", periodDays = 0)
    }
  }

  test("cohortRetention plan: sizes join back via broadcast, no corpus-wide third shuffle") {
    val df = tsDf(Seq(("u1", base)))
    val plan = Retention.cohortRetention(df, "u", "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"cohort sizes must broadcast:\n$plan")
  }

  test("activityStreaks: hand islands, counts and deterministic longest pick") {
    val d = 86400L
    val df = tsDf(Seq(
      // user 1: days 0,1,2 then 5,6 (relative to an epoch-day base)
      ("u1", 0 * d), ("u1", 1 * d), ("u1", 2 * d), ("u1", 5 * d), ("u1", 6 * d),
      ("u1", 1 * d + 3600L), // same day twice: distinct collapses
      // user 2: two equal-length streaks -> the LATER one wins the tie
      ("u2", 10 * d), ("u2", 11 * d), ("u2", 20 * d), ("u2", 21 * d)))
    val got = Retention.activityStreaks(df, "u", "ts", periodDays = 1)
      .orderBy("u").collect()
    val u1 = got(0)
    assert(u1.getAs[Long]("n_active_periods") == 5L &&
      u1.getAs[Long]("n_streaks") == 2L &&
      u1.getAs[Long]("longest_streak") == 3L &&
      u1.getAs[Long]("streak_start") == 0L && u1.getAs[Long]("streak_end") == 2L)
    val u2 = got(1)
    assert(u2.getAs[Long]("longest_streak") == 2L &&
      u2.getAs[Long]("streak_start") == 20L,
      "equal lengths must pick the later streak, deterministically")
  }

  test("kaplanMeier: textbook small cohort — censoring feeds n_risk, not d") {
    // the classic worked example: durations (event?) =
    // 1(+), 2(+), 3(censored), 4(+), 5(censored), 5(+)
    val df = Seq(
      ("g", 1L, true), ("g", 2L, true), ("g", 3L, false),
      ("g", 4L, true), ("g", 5L, false), ("g", 5L, true),
      // a second group to pin group isolation
      ("h", 1L, true), ("h", 2L, false)
    ).toDF("grp", "dur", "ev")
    val got = Retention.kaplanMeier(df, Seq("grp"), "dur", "ev")
      .orderBy("grp", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    val s1 = 1.0 * (1.0 - 1.0 / 6.0)
    val s2 = s1 * (1.0 - 1.0 / 5.0)
    val s4 = s2 * (1.0 - 1.0 / 3.0)  // t=3 censored: no row, but n_risk drops
    val s5 = s4 * (1.0 - 1.0 / 2.0)  // d=1 of 2 at risk (censored 5 counts)
    assert(got == Seq(
      ("g", 1L, 6L, 1L, s1), ("g", 2L, 5L, 1L, s2),
      ("g", 4L, 3L, 1L, s4), ("g", 5L, 2L, 1L, s5),
      ("h", 1L, 2L, 1L, 0.5)))
    intercept[IllegalArgumentException] {
      Retention.kaplanMeier(df, Seq.empty, "dur", "ev")
    }
  }

  test("growthAccounting: hand-traced statuses, churn shift, horizon cap") {
    // u1: p1,p2,p4  -> new@1, retained@2, churn@3, resurrected@4
    // u2: p1        -> new@1, churn@2
    // u3: p2,p3,p4  -> new@2, retained@3, retained@4
    // u4: p4        -> new@4; last period: NO churn@5 (horizon)
    val df = Seq((1L, 1L), (1L, 2L), (1L, 4L), (1L, 1L), // dup row collapses
      (2L, 1L), (3L, 2L), (3L, 3L), (3L, 4L), (4L, 4L))
      .toDF("u", "p")
    val got = Retention.growthAccounting(df, "u", "p").orderBy("period")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        Option(r.get(5)).map(_.asInstanceOf[Double]))).toSeq
    assert(got == Seq(
      (1L, 2L, 0L, 0L, 0L, None),
      (2L, 1L, 1L, 0L, 1L, Some(1.0)),
      (3L, 0L, 1L, 0L, 1L, Some(0.0)),
      (4L, 1L, 1L, 1L, 0L, None)))
    // identity: active(p) = new + retained + resurrected = distinct users
    val nulls = Seq((Option(1L), Option(1L)), (None, Option(2L)),
      (Option(2L), None)).toDF("u", "p")
    val r = Retention.growthAccounting(nulls, "u", "p").collect()
    assert(r.length == 1 && r.head.getLong(1) == 1L)
  }

  test("stickiness: hand-counted trailing window, dedup inside window") {
    // u1 active d1,d2; u2 active d1; u3 active d3. windowDays=2.
    // d1: dau 2, wau(0..1 back) = users active in {d0,d1} = {1,2} -> 2
    // d2: dau 1, wau {d1,d2} = {1,2} -> 2 (u1 active both days: once)
    // d3: dau 1, wau {d2,d3} = {1,3} -> 2
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 3L), (1L, 1L))
      .toDF("u", "d")
    val got = Retention.stickiness(df, "u", "d", windowDays = 2)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 2L, 1.0), (2L, 1L, 2L, 0.5),
      (3L, 1L, 2L, 0.5)))
    // no phantom day 4 row (spine clip) even though d3 supports it
    assert(!got.map(_._1).contains(4L))
    intercept[IllegalArgumentException] {
      Retention.stickiness(df, "u", "d", windowDays = 0)
    }
  }

  test("ltvCurve: hand cells, cumulative, zero-revenue age, null value") {
    // cohort 1: u1 (p1: 2.5, p2: 1.5), u2 (p1: null->0, p3: 4.0)
    // cohort 2: u3 (p2: 10.0)
    val df = Seq(
      (1L, 1L, Option(2.5)), (1L, 2L, Option(1.5)),
      (2L, 1L, None), (2L, 3L, Option(4.0)),
      (3L, 2L, Option(10.0))).toDF("u", "p", "v")
    val got = Retention.ltvCurve(df, "u", "p", "v")
      .orderBy("cohort", "age").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      (1L, 0L, 2L, 2.5, 2.5, 1.25),
      (1L, 1L, 2L, 1.5, 4.0, 2.0),
      (1L, 2L, 2L, 4.0, 8.0, 4.0),
      (2L, 0L, 1L, 10.0, 10.0, 10.0)))
  }

  test("logRankTest: hand-replayed O/E/V over the pooled grid") {
    // A: events at 2, 4, censored 6; B: events at 1, 5, censored 3
    val df = Seq(("a", 2L, true), ("a", 4L, true), ("a", 6L, false),
      ("b", 1L, true), ("b", 3L, false), ("b", 5L, true))
      .toDF("arm", "dur", "ev")
    val r = Retention.logRankTest(df, "arm", "dur", "ev", "a", "b")
      .collect().head
    // event times 1,2,4,5 with (da, na, dt, nt):
    // (0,3,1,6) (1,3,1,5) (1,2,1,3) (0,1,1,2); folds in t order
    val terms = Seq((0L, 3.0, 1.0, 6.0), (1L, 3.0, 1.0, 5.0),
      (1L, 2.0, 1.0, 3.0), (0L, 1.0, 1.0, 2.0))
    val e = terms.foldLeft(0.0) { case (acc, (_, na, dt, nt)) =>
      acc + dt * na / nt }
    val v = terms.foldLeft(0.0) { case (acc, (_, na, dt, nt)) =>
      val frac = na / nt
      acc + dt * frac * (1.0 - frac) * (nt - dt) / (nt - 1.0) }
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 3L, 2L)))
    assert(r.getDouble(3) == e && r.getDouble(4) == v)
    assert(r.getDouble(5) == (2.0 - e) / math.sqrt(v))
    // identical curves: O == E, z well-defined and ~0 only by data; a
    // no-event input nulls z instead of dividing by zero
    val none = Seq(("a", 1L, false), ("b", 2L, false)).toDF("arm", "dur", "ev")
    val r2 = Retention.logRankTest(none, "arm", "dur", "ev", "a", "b")
      .collect().head
    assert(r2.getLong(2) == 0L && r2.isNullAt(5) && r2.isNullAt(6))
  }
}
