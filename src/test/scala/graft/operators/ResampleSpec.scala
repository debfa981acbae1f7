package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class ResampleSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(day: Int): Timestamp = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("introduced gap slots carry the previous value; observed slots keep their own") {
    val df = Seq(
      (1L, ts(1), 10.0), (1L, ts(2), 20.0), (1L, ts(5), 50.0), // gap: 3,4
      (2L, ts(3), 30.0) // single-slot key: no gaps
    ).toDF("k", "day", "v")
    val out = Resample.forwardFill(df, Seq("k"), "day", Seq("v"), expr("INTERVAL 1 DAY"))
      .orderBy("k", "day")
      .as[(Long, Timestamp, Double)].collect().toSeq
    assert(out == Seq(
      (1L, ts(1), 10.0), (1L, ts(2), 20.0),
      (1L, ts(3), 20.0), (1L, ts(4), 20.0), // filled from day 2
      (1L, ts(5), 50.0),
      (2L, ts(3), 30.0)))
  }

  test("grids are per-key: one key's span does not bleed into another's") {
    val df = Seq((1L, ts(1), 1.0), (1L, ts(10), 2.0), (2L, ts(5), 3.0))
      .toDF("k", "day", "v")
    val out = Resample.forwardFill(df, Seq("k"), "day", Seq("v"), expr("INTERVAL 1 DAY"))
    assert(out.filter($"k" === 1L).count() == 10)
    assert(out.filter($"k" === 2L).count() == 1)
  }

  test("bucketed forward fill matches the interval operator across chunk boundaries") {
    // day-1 observation, then nothing until day 40: with 8-day chunks the
    // carry must cascade through several all-null chunks
    val df = Seq(
      (1L, ts(1), 10.0), (1L, Timestamp.valueOf("2024-02-09 00:00:00"), 40.0),
      (2L, ts(3), 30.0), (2L, ts(20), 35.0)
    ).toDF("k", "day", "v")
    val plain = Resample.forwardFill(df, Seq("k"), "day", Seq("v"),
      expr("INTERVAL 1 DAY"))
      .orderBy("k", "day").as[(Long, Timestamp, Double)].collect().toSeq
    val bucketed = Resample.forwardFillBucketed(df, Seq("k"), "day", Seq("v"),
      stepSeconds = 86400L, chunkSeconds = 8L * 86400L)
      .orderBy("k", "day").as[(Long, Timestamp, Double)].collect().toSeq
    assert(bucketed == plain)
  }

  test("bucketed fill: multi-column + observed nulls behave identically") {
    val df = Seq(
      (1L, ts(1), Some(1.0), Some(9.0)),
      (1L, ts(3), None: Option[Double], Some(7.0)),
      (1L, ts(9), Some(2.0), None: Option[Double])
    ).toDF("k", "day", "a", "b")
    val plain = Resample.forwardFill(df, Seq("k"), "day", Seq("a", "b"),
      expr("INTERVAL 1 DAY"))
      .orderBy("day").as[(Long, Timestamp, Option[Double], Option[Double])]
      .collect().toSeq
    val bucketed = Resample.forwardFillBucketed(df, Seq("k"), "day", Seq("a", "b"),
      stepSeconds = 86400L, chunkSeconds = 3L * 86400L)
      .orderBy("day").as[(Long, Timestamp, Option[Double], Option[Double])]
      .collect().toSeq
    assert(bucketed == plain)
  }

  test("bucketed fill: sub-second slot alignment matches the interval operator") {
    // stamps at .5s offsets on a 1s step — a whole-second truncation in the
    // bucketed grid would miss every observation on the join-back
    def t(us: Long) = new Timestamp(us / 1000) // ms precision carries the .5s
    val base = 1700000000L * 1000000L + 500000L // ...T...:00.5
    val df = Seq(
      (1L, t(base), Some(1.0)),
      (1L, t(base + 2L * 1000000L), None: Option[Double]),
      (1L, t(base + 7L * 1000000L), Some(3.0))
    ).toDF("k", "ts", "v")
    val plain = Resample.forwardFill(df, Seq("k"), "ts", Seq("v"),
      expr("INTERVAL 1 SECOND"))
      .orderBy("ts").as[(Long, Timestamp, Option[Double])].collect().toSeq
    val bucketed = Resample.forwardFillBucketed(df, Seq("k"), "ts", Seq("v"),
      stepSeconds = 1L, chunkSeconds = 3L)
      .orderBy("ts").as[(Long, Timestamp, Option[Double])].collect().toSeq
    assert(bucketed == plain)
    // the observed values actually joined (no silent all-null grid)
    assert(plain.length == 8)
    assert(plain.head._3.contains(1.0) && plain.last._3.contains(3.0))
  }

  test("multiple value columns fill independently (null observation stays gap-filled)") {
    val df = Seq(
      (1L, ts(1), Some(1.0), Some(9.0)),
      (1L, ts(3), None, Some(7.0)) // a observed-null at day 3 → carries day 1's value
    ).toDF("k", "day", "a", "b")
    val out = Resample.forwardFill(df, Seq("k"), "day", Seq("a", "b"), expr("INTERVAL 1 DAY"))
      .orderBy("day").as[(Long, Timestamp, Option[Double], Option[Double])].collect().toSeq
    assert(out == Seq(
      (1L, ts(1), Some(1.0), Some(9.0)),
      (1L, ts(2), Some(1.0), Some(9.0)),
      (1L, ts(3), Some(1.0), Some(7.0))))
  }

  // ---- cusumBurst ----

  private def eventRows(key: String, dayCounts: Seq[(Int, Int)]) =
    dayCounts.flatMap { case (d, n) => Seq.fill(n)((key, ts(d))) }

  test("cusumBurst: hand-computed step series localizes the change") {
    // counts [1,1,3,3] on days 1..4: D_t = 4*cum - 8t = -4,-8,-4,0
    // -> burst at t=2 (day 2), d_star = -8, score = 8/(4*8) = 0.25
    val df = eventRows("k", Seq(1 -> 1, 2 -> 1, 3 -> 3, 4 -> 3))
      .toDF("k", "ev_ts")
    val r = Resample.cusumBurst(df, Seq("k"), "ev_ts").collect().head
    assert((r.getLong(1), r.getLong(2)) == ((4L, 8L)))
    assert(r.getTimestamp(3) == ts(2) && r.getLong(4) == 2L)
    assert(r.getLong(5) == -8L && r.getDouble(6) == 0.25)
  }

  test("cusumBurst: a flat series scores zero at the earliest tie day; keys independent") {
    val df = (eventRows("flat", Seq(1 -> 2, 2 -> 2, 3 -> 2)) ++
      eventRows("hot", Seq(1 -> 1, 2 -> 5)))
      .toDF("k", "ev_ts")
    val out = Resample.cusumBurst(df, Seq("k"), "ev_ts")
      .orderBy("k").collect()
    val flat = out(0); val hot = out(1)
    assert(flat.getString(0) == "flat" && flat.getDouble(6) == 0.0 &&
      flat.getLong(4) == 1L)
    // hot: D_1 = 2*1 - 6 = -4 -> score 4/12
    assert(hot.getLong(5) == -4L && hot.getDouble(6) == 4.0 / 12.0)
    intercept[IllegalArgumentException] {
      Resample.cusumBurst(df, Seq.empty, "ev_ts")
    }
    intercept[IllegalArgumentException] {
      Resample.cusumBurst(df.withColumn("_dd", lit(1)), Seq("k"), "ev_ts")
    }
  }

  test("cusumBurst: a halted stream is detected via zero-densified days") {
    // events on days 1,2 then silence until a single day-6 event: the
    // calendar series is [3,3,0,0,0,1] (zero days FILLED, not skipped).
    // T=6, total=7; D_t = 6*cum - 7t: 11,22,15,8,1,0 -> burst at t=2
    // (day 2, the last hot day), score = 22/42
    val df = eventRows("halt", Seq(1 -> 3, 2 -> 3, 6 -> 1)).toDF("k", "ev_ts")
    val r = Resample.cusumBurst(df, Seq("k"), "ev_ts").collect().head
    assert(r.getLong(1) == 6L, "n_days must count calendar days, not observed days")
    assert(r.getLong(2) == 7L)
    assert(r.getTimestamp(3) == ts(2) && r.getLong(4) == 2L)
    assert(r.getLong(5) == 22L && r.getDouble(6) == 22.0 / 42.0)
  }
}
