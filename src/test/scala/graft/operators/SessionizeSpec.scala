package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class SessionizeSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = Seq(
    // user 1: two sessions split by a 2h gap
    (1L, 10L, ts("2024-01-01 09:00:00"), 1.0),
    (1L, 11L, ts("2024-01-01 09:10:00"), 2.0),
    (1L, 12L, ts("2024-01-01 09:39:59"), 3.0), // 29m59s gap: same session
    (1L, 13L, ts("2024-01-01 11:40:00"), 4.0), // 2h gap: new session
    // user 2: single event
    (2L, 20L, ts("2024-01-01 00:00:00"), 5.0)
  ).toDF("user_id", "event_id", "ts", "value")

  test("assignSessions splits at gaps strictly greater than the threshold") {
    val out = Sessionize.assignSessions(events, "user_id", "ts", 30, Seq("event_id"))
      .orderBy("user_id", "event_id")
      .select("user_id", "event_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 1L), (1L, 13L, 2L),
      (2L, 20L, 1L)))
  }

  test("sessionStats aggregates bounds, counts and sums per session") {
    val out = Sessionize.sessionStats(events, "user_id", "ts", "value", 30, Seq("event_id"))
      .orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    val s1 = out(0)
    assert(s1.getAs[Long]("n_events") == 3L)
    assert(s1.getAs[Double]("value_sum") == 6.0)
    assert(s1.getAs[Timestamp]("session_start") == ts("2024-01-01 09:00:00"))
    assert(s1.getAs[Timestamp]("session_end") == ts("2024-01-01 09:39:59"))
    assert(out(1).getAs[Long]("n_events") == 1L)
    assert(out(2).getAs[Long]("n_events") == 1L)
  }

  test("a gap of exactly the threshold does NOT split (strict inequality)") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 09:00:00"), 1.0),
      (1L, 2L, ts("2024-01-01 09:30:00"), 1.0)).toDF("user_id", "event_id", "ts", "value")
    val n = Sessionize.sessionStats(df, "user_id", "ts", "value", 30, Seq("event_id")).count()
    assert(n == 1)
  }

  test("bucketed sessionization is event-for-event identical to the plain operator") {
    val rnd = new scala.util.Random(7)
    val t0 = ts("2024-01-01 00:00:00").getTime
    val random = (1 to 3000).map { i =>
      (rnd.nextInt(5).toLong, i.toLong,
        new Timestamp(t0 + rnd.nextInt(5 * 86400) * 1000L), rnd.nextDouble())
    }
    val boundary = Seq(
      // exact-gap pair straddling the 6h bucket boundary at midnight:
      // 30m00s -> same session (strict inequality must survive the stitch)
      (9L, 9001L, ts("2024-01-01 23:45:00"), 1.0),
      (9L, 9002L, ts("2024-01-02 00:15:00"), 1.0),
      (9L, 9003L, ts("2024-01-02 00:45:01"), 1.0), // 30m01s -> new session
      // bucket with a single event between two others
      (9L, 9004L, ts("2024-01-02 07:00:00"), 1.0))
    val df = (random ++ boundary).toDF("user_id", "event_id", "ts", "value")
    val plain = Sessionize.assignSessions(df, "user_id", "ts", 30, Seq("event_id"))
      .select($"event_id", $"session_id")
    val bucketed = Sessionize.assignSessionsBucketed(df, "user_id", "ts", 30,
      Seq("event_id"), bucketHours = 6)
      .select($"event_id", $"session_id".as("session_id_b"))
    val diff = plain.join(bucketed, "event_id")
      .filter($"session_id" =!= $"session_id_b")
    assert(diff.isEmpty, s"diverging events: ${diff.collect().mkString(",")}")
  }

  test("one degenerate user spreads over bucket tasks and still matches") {
    val t0 = ts("2024-01-01 00:00:00").getTime
    // one user, 20k events over 10 days — plain sessionization puts all of
    // them through one window task; bucketed splits into 240 hour-buckets
    val df = (1 to 20000).map { i =>
      (1L, i.toLong, new Timestamp(t0 + i * 43210L), 1.0)
    }.toDF("user_id", "event_id", "ts", "value")
    val plain = Sessionize.assignSessions(df, "user_id", "ts", 30, Seq("event_id"))
      .select($"event_id", $"session_id")
    val bucketed = Sessionize.assignSessionsBucketed(df, "user_id", "ts", 30,
      Seq("event_id"), bucketHours = 1)
      .select($"event_id", $"session_id".as("session_id_b"))
    assert(plain.join(bucketed, "event_id")
      .filter($"session_id" =!= $"session_id_b").isEmpty)
  }

  test("funnelStages: longest completed prefix, order-sensitive, per user") {
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val events = Seq(
      // u1: full funnel in order
      (1L, ts(0), 10L, "view"), (1L, ts(1), 11L, "click"), (1L, ts(2), 12L, "purchase"),
      // u2: purchase BEFORE click -> view->click completes (stage 2) but
      // the out-of-order purchase cannot complete stage 3
      (2L, ts(0), 20L, "view"), (2L, ts(1), 21L, "purchase"), (2L, ts(2), 22L, "click"),
      // u3: noise between stages still completes the prefix
      (3L, ts(0), 30L, "view"), (3L, ts(1), 31L, "error"), (3L, ts(2), 32L, "click"),
      // u4: never views -> 0
      (4L, ts(0), 40L, "click"), (4L, ts(1), 41L, "purchase"),
      // u5: same-timestamp tie broken by event_id: view(50) before click(51)
      (5L, ts(0), 50L, "view"), (5L, ts(0), 51L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.funnelStages(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), tieBreak = Seq("event_id"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 3), (2L, 2), (3L, 2), (4L, 0), (5L, 2)))
    intercept[IllegalArgumentException] {
      Sessionize.funnelStages(events, "user_id", "ts", "event_type", Seq("a|b"))
    }
  }

  test("funnelStages: '|' in event-type DATA cannot fabricate a stage boundary") {
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val events = Seq(
      // u1: a malicious type embedding '|view|' — must NOT count as view
      (1L, ts(0), 10L, "x|view|y"),
      // u2: injection between real stages must not inject a click
      (2L, ts(0), 20L, "view"), (2L, ts(1), 21L, "a|click|b"),
      // u3: control — a real view still reaches stage 1
      (3L, ts(0), 30L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.funnelStages(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), tieBreak = Seq("event_id"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 0), (2L, 1), (3L, 1)))
  }

  test("transitionMatrix: hand-computed counts and row-normalized probabilities") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), "x", 1L),
      (1L, Timestamp.valueOf("2024-01-01 00:01:00"), "y", 2L),
      (1L, Timestamp.valueOf("2024-01-01 00:02:00"), "x", 3L),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00"), "x", 4L),
      (2L, Timestamp.valueOf("2024-01-01 00:05:00"), "x", 5L),
      (3L, Timestamp.valueOf("2024-01-01 00:00:00"), "z", 6L) // no successor
    ).toDF("user_id", "ts", "etype", "event_id")
    val got = Sessionize.transitionMatrix(df, "user_id", "ts", "etype",
        tieBreak = Seq("event_id"))
      .orderBy("state", "next_state").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_trans"),
        r.getAs[Double]("p"))).toSeq
    assert(got == Seq(("x", "x", 1L, 0.5), ("x", "y", 1L, 0.5),
      ("y", "x", 1L, 1.0)))
  }

  test("lastTouchAttribution: credits the latest preceding touch; orphans go to (none)") {
    def t(m: Int) = Timestamp.valueOf(s"2024-01-01 00:0$m:00")
    val df = Seq(
      (1L, t(0), "view", 1L, 0.0), (1L, t(1), "click", 2L, 0.0),
      (1L, t(2), "purchase", 3L, 10.0),  // → click (latest touch)
      (1L, t(3), "error", 4L, 0.0),
      (1L, t(4), "purchase", 5L, 5.0),   // error not a touch → still click
      (2L, t(0), "purchase", 6L, 7.0),   // nothing preceding → (none)
      (3L, t(0), "view", 7L, 0.0),
      (3L, t(1), "purchase", 8L, 2.0)    // → view
    ).toDF("user_id", "ts", "etype", "event_id", "value")
    val got = Sessionize.lastTouchAttribution(df, "user_id", "ts", "etype",
        "value", "purchase", Seq("view", "click", "signup"), Seq("event_id"))
      .orderBy("touch_type").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_conversions"),
        r.getAs[Double]("revenue"))).toSeq
    assert(got == Seq(("(none)", 1L, 7.0), ("click", 2L, 15.0), ("view", 1L, 2.0)))
    intercept[IllegalArgumentException] {
      Sessionize.lastTouchAttribution(df, "user_id", "ts", "etype", "value",
        "purchase", Seq("purchase", "view"))
    }
  }

  test("transitionMatrix: timestamp ties resolve on the tieBreak column") {
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq((1L, t, "a", 2L), (1L, t, "b", 1L)).toDF("user_id", "ts", "e", "id")
    val got = Sessionize.transitionMatrix(df, "user_id", "ts", "e", Seq("id"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("b", "a")))
  }

  test("transitionMatrixBucketed ≡ transitionMatrix: boundaries, gaps, ties, firehose") {
    // pseudo-random multi-day streams: user 0 is a firehose spanning many
    // 1-hour buckets (including cross-boundary adjacencies), user 1 has
    // EMPTY buckets between events (boundary pair must skip them), user 2
    // is single-bucket, user 3 has a timestamp tie resolved by event_id
    val rows = (0 until 400).map { i =>
      val user = if (i < 300) 0L else (i % 3) + 1L
      val sec = if (user == 0L) i * 97L % 250000L
                else if (user == 1L) (i % 7) * 40000L // hours apart
                else (i % 5) * 60L
      (user, Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L + sec)),
        "s" + (i * 31 % 5), i.toLong)
    } :+ (3L, Timestamp.from(java.time.Instant.ofEpochSecond(1700000060L)), "tie", 1000L)
    val df = rows.toDF("user_id", "ts", "etype", "event_id")
    val plain = Sessionize.transitionMatrix(df, "user_id", "ts", "etype",
      Seq("event_id")).orderBy("state", "next_state").collect().toSeq
    for (hours <- Seq(1, 24)) {
      val bucketed = Sessionize.transitionMatrixBucketed(df, "user_id", "ts",
          "etype", Seq("event_id"), bucketHours = hours)
        .orderBy("state", "next_state").collect().toSeq
      assert(bucketed == plain, s"bucketHours=$hours must match the plain window")
    }
  }

  test("pathNgrams: hand-counted trigrams, short users drop, ties on tieBreak") {
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = Timestamp.valueOf(s"2024-01-01 00:0$m:00")
    val df = Seq(
      (1L, t(0), "a", 1L), (1L, t(1), "b", 2L), (1L, t(2), "a", 3L),
      (1L, t(3), "b", 4L),                    // user 1: a>b>a, b>a>b
      (2L, t(0), "a", 5L), (2L, t(1), "b", 6L), (2L, t(2), "a", 7L),
      (3L, t(0), "x", 8L), (3L, t(1), "y", 9L), // only 2 events → no trigram
      (4L, t0, "q", 11L), (4L, t0, "p", 10L), (4L, t(1), "r", 12L)
    ).toDF("user_id", "ts", "etype", "event_id")
    val got = Sessionize.pathNgrams(df, "user_id", "ts", "etype", 3, Seq("event_id"))
      .orderBy("path").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a > b > a", 2L), ("b > a > b", 1L),
      ("p > q > r", 1L)), s"got $got")
    intercept[IllegalArgumentException] {
      Sessionize.pathNgrams(df, "user_id", "ts", "etype", 1)
    }
  }

  test("pathNgramsBucketed ≡ pathNgrams: boundaries, empty buckets, ties, firehose") {
    // same adversarial fixture as the transitionMatrixBucketed test: a
    // firehose user over many buckets, a user whose every event sits in
    // its own 1-hour bucket (n-grams there span n buckets and exist ONLY
    // as crossing grams over boundary rows), a single-bucket user, and a
    // timestamp tie resolved by event_id
    val rows = (0 until 400).map { i =>
      val user = if (i < 300) 0L else (i % 3) + 1L
      val sec = if (user == 0L) i * 97L % 250000L
                else if (user == 1L) (i % 7) * 40000L
                else (i % 5) * 60L
      (user, Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L + sec)),
        "s" + (i * 31 % 5), i.toLong)
    } :+ (3L, Timestamp.from(java.time.Instant.ofEpochSecond(1700000060L)), "tie", 1000L)
    val df = rows.toDF("user_id", "ts", "etype", "event_id")
    for (n <- Seq(2, 3, 4)) {
      val plain = Sessionize.pathNgrams(df, "user_id", "ts", "etype", n,
        Seq("event_id")).orderBy("path").collect().toSeq
      for (hours <- Seq(1, 24)) {
        val bucketed = Sessionize.pathNgramsBucketed(df, "user_id", "ts",
            "etype", n, Seq("event_id"), bucketHours = hours)
          .orderBy("path").collect().toSeq
        assert(bucketed == plain, s"n=$n bucketHours=$hours must match plain")
      }
    }
    intercept[IllegalArgumentException] {
      Sessionize.pathNgramsBucketed(
        df.withColumnRenamed("etype", "_b2"), "user_id", "ts", "_b2", 3)
    }
  }

  test("markovRemovalEffects: bucketed journey split ≡ plain on a firehose mix") {
    // user 0: never-converting firehose over many 1-hour buckets (the
    // regime the split exists for); user 1: converts mid-stream (journey
    // truncates at first purchase); user 2: converts with no prior touch
    // (~start → ~conv); user 3: hour-apart events (every adjacency is a
    // boundary pair at bucketHours=1)
    val rows = (0 until 300).map { i =>
      (0L, Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L + i * 97L)),
        "c" + (i * 31 % 4), i.toLong)
    } ++ Seq(
      (1L, Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L)), "c0", 500L),
      (1L, Timestamp.from(java.time.Instant.ofEpochSecond(1700003600L)), "purchase", 501L),
      (1L, Timestamp.from(java.time.Instant.ofEpochSecond(1700007200L)), "c1", 502L),
      (2L, Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L)), "purchase", 503L)
    ) ++ (0 until 5).map { i =>
      (3L, Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L + i * 4000L)),
        "c" + (i % 3), 600L + i)
    }
    val df = rows.toDF("user_id", "ts", "etype", "event_id")
    val plain = Sessionize.markovRemovalEffects(df, "user_id", "ts", "etype",
      "purchase", Seq("event_id")).orderBy("channel").collect().toSeq
    for (hours <- Seq(1, 24)) {
      val bucketed = Sessionize.markovRemovalEffects(df, "user_id", "ts",
          "etype", "purchase", Seq("event_id"),
          journeyBucketHours = Some(hours))
        .orderBy("channel").collect().toSeq
      assert(bucketed == plain, s"journeyBucketHours=$hours must match plain")
    }
  }

  test("transitionMatrixBucketed: integral order column and reserved-column guard") {
    val df = Seq((1L, 10L, "a", 1L), (1L, 90000L, "b", 2L), (1L, 90001L, "a", 3L))
      .toDF("user_id", "tick", "e", "id")
    val plain = Sessionize.transitionMatrix(df, "user_id", "tick", "e", Seq("id"))
      .orderBy("state", "next_state").collect().toSeq
    val bucketed = Sessionize.transitionMatrixBucketed(df, "user_id", "tick",
        "e", Seq("id"), bucketHours = 1) // tick/3600 buckets: 10 and 90000 split
      .orderBy("state", "next_state").collect().toSeq
    assert(bucketed == plain)
    intercept[IllegalArgumentException] {
      Sessionize.transitionMatrixBucketed(
        df.withColumnRenamed("e", "_bk"), "user_id", "tick", "_bk")
    }
  }

  test("markovRemovalEffects: hand-replayed chain, empty journeys, shares") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    // u1: A → conv; u2: A → (null); u3: B → conv; u4: conv with no touch
    // counts: start→A:2, start→B:1, start→conv:1, A→conv:1, A→null:1,
    // B→conv:1; totals start:4, A:2, B:1
    // fixed point: v(A) = 5e11, v(B) = 1e12, v(start) = 7.5e11
    // remove A: start's A-mass → null ⇒ v(start) = 5e11; same for B
    val df = Seq(
      (1L, t(1), "A"), (1L, t(2), "purchase"),
      (2L, t(1), "A"),
      (3L, t(1), "B"), (3L, t(2), "purchase"),
      (4L, t(5), "purchase")).toDF("user_id", "ts", "etype")
    val got = Sessionize.markovRemovalEffects(df, "user_id", "ts", "etype",
        "purchase", iters = 4)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val re = 1.0 - 500000000000.0 / 750000000000.0
    assert(got == Seq(
      ("A", 750000000000L, 500000000000L, re, 0.5),
      ("B", 750000000000L, 500000000000L, re, 0.5)))
    // self-transitions are kept: A,A,conv keeps an A→A loop (the chain
    // still absorbs — iterate enough and start's value approaches 1e12)
    val selfLoop = Seq((1L, t(1), "A"), (1L, t(2), "A"),
      (1L, t(3), "purchase")).toDF("user_id", "ts", "etype")
    val s = Sessionize.markovRemovalEffects(selfLoop, "user_id", "ts",
      "etype", "purchase", iters = 8).head
    // counts: start→A:1, A→A:1, A→conv:1; v(A) solves v = (v+1e12)/2
    // → truncated geometric: after 8 rounds v(A) < 1e12 but > 0.99e12
    assert(s.getLong(1) > 990000000000L && s.getLong(1) <= 1000000000000L)
    intercept[IllegalArgumentException] {
      Sessionize.markovRemovalEffects(df, "user_id", "ts", "etype",
        "purchase", iters = 0)
    }
  }

  test("timeDecayAttribution: dyadic weights, cutoff, non-converters") {
    def ts(hour: Long) = new java.sql.Timestamp(hour * 3600000L)
    // halfLife 1 day. u1 converts at hour 240 (day 10):
    //   A at hour 228 (0.5d ago, k=0, w=1), B at hour 192 (2d, k=2,
    //   w=1/4), A at hour 240-70*24 (70d, k=70 > 62 -> w=0)
    // u2 never converts: its C touch contributes nothing
    val df = Seq(
      (1L, ts(240), "purchase"), (1L, ts(228), "A"), (1L, ts(192), "B"),
      (1L, ts(240 - 70 * 24), "A"),
      (2L, ts(100), "C")).toDF("user_id", "ts", "etype")
    val got = Sessionize.timeDecayAttribution(df, "user_id", "ts",
        "etype", "purchase", halfLifeDays = 1)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    // tot = 2^62 + 2^60 = 5*2^60: shares 4/5 and 1/5
    assert(got == Seq(("A", 2L, 1.0, 0.8), ("B", 1L, 0.25, 0.2)))
    intercept[IllegalArgumentException] {
      Sessionize.timeDecayAttribution(df, "user_id", "ts", "etype",
        "purchase", halfLifeDays = 0)
    }
  }

  test("rareTransitions: integer rarity rule, strict boundary, flags only") {
    def ts(m: Int) = new java.sql.Timestamp(m * 60000L)
    // u1: A,B,A,B,A,C; u2: A,B,A,B
    // matrix: A->B 4, B->A 3, A->C 1; totals A=5, B=3
    val df = Seq(
      (1L, 1, "A"), (1L, 2, "B"), (1L, 3, "A"), (1L, 4, "B"),
      (1L, 5, "A"), (1L, 6, "C"),
      (2L, 1, "A"), (2L, 2, "B"), (2L, 3, "A"), (2L, 4, "B"))
      .map { case (u, m, s) => (u, ts(m), s) }.toDF("u", "t", "s")
    // k=4: A->C rare (1*4 < 5); only u1 flagged, min_prob = 1/5
    val got = Sessionize.rareTransitions(df, "u", "t", "s", k = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq((1L, 5L, 1L, 0.2)))
    // k=5: prob exactly 1/5 is NOT rare (strict <) -> nobody flagged
    assert(Sessionize.rareTransitions(df, "u", "t", "s", k = 5L)
      .collect().isEmpty)
    intercept[IllegalArgumentException] {
      Sessionize.rareTransitions(df, "u", "t", "s", k = 1L)
    }
  }

  test("botRegularity: clockwork flags, jittered human passes, zero-gap") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val bot = (1 to 7).map(i => (1L, ts(i * 60L)))          // exact 60s
    val human = Seq(10L, 70L, 400L, 420L, 900L, 2000L, 2100L)
      .map(s => (2L, ts(s)))                                 // wild gaps
    val sameInstant = (1 to 7).map(_ => (3L, ts(5L)))        // sg = 0
    val df = (bot ++ human ++ sameInstant).toDF("u", "t")
    val got = Sessionize.botRegularity(df, "u", "t", minGaps = 5L,
      cvPct = 10L).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
    val r = got.head
    assert(r.getLong(1) == 6L && r.getDouble(2) == 60000000.0 &&
      r.getDouble(3) == 0.0)
    // below minGaps: a 3-event clockwork user is not flagged
    val tiny = Seq((9L, ts(60)), (9L, ts(120)), (9L, ts(180)))
      .toDF("u", "t")
    assert(Sessionize.botRegularity(tiny, "u", "t", minGaps = 5L)
      .collect().isEmpty)
    intercept[IllegalArgumentException] {
      Sessionize.botRegularity(df, "u", "t", cvPct = 0L)
    }
  }

  test("transitionEntropy: hand 50/50 split, deterministic funnel state") {
    def ts(m: Int) = new java.sql.Timestamp(m * 60000L)
    // u1: A,B,A,C -> A->{B,C} (H = ln 2), B->{A} (H = 0)
    val df = Seq((1L, ts(1), "A"), (1L, ts(2), "B"), (1L, ts(3), "A"),
      (1L, ts(4), "C")).toDF("u", "t", "s")
    val got = Sessionize.transitionEntropy(df, "u", "t", "s")
      .orderBy("state").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val ln2r = math.floor(
      -(0.5 * math.log(0.5) + 0.5 * math.log(0.5)) * 1e6 + 0.5) / 1e6
    assert(got == Seq(("A", 2L, 2L, ln2r), ("B", 1L, 1L, 0.0)))
  }

  test("shapleyAttribution: hand v(S) table, exact integer credit, efficiency") {
    // converters: u1 {view}, u2 {click}, u3 {view,click}, u4 no touch,
    // u5's view comes AFTER the purchase (not a touch); u6 never converts
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "purchase"),
      (2L, 1L, "click"), (2L, 2L, "purchase"),
      (3L, 1L, "view"), (3L, 2L, "click"), (3L, 3L, "purchase"),
      (4L, 1L, "purchase"),
      (5L, 1L, "purchase"), (5L, 2L, "view"),
      (6L, 1L, "view"), (6L, 2L, "view")
    ).toDF("u", "ts", "ty")
    val got = Sessionize.shapleyAttribution(ev, "u", "ts", "ty",
        "purchase", Seq("view", "click"))
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // v: v(0)=2, v(v)=3, v(c)=3, v(vc)=5; both channels earn
    // phi*2! = 1*(3-2) + 1*(5-3) = 3 -> 1.5 each; efficiency:
    // 1.5+1.5 = v(C)-v(0) = 3
    assert(got.toSeq == Seq(("click", 3L, 1.5, 5L), ("view", 3L, 1.5, 5L)))
    intercept[IllegalArgumentException] {
      Sessionize.shapleyAttribution(ev, "u", "ts", "ty", "purchase",
        Seq("view", "purchase"))
    }
  }

  test("shapleySampledAttribution: unbiased vs exact, telescoping, determinism") {
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "purchase"),
      (2L, 1L, "click"), (2L, 2L, "purchase"),
      (3L, 1L, "view"), (3L, 2L, "click"), (3L, 3L, "purchase"),
      (4L, 1L, "purchase"),
      (5L, 1L, "purchase"), (5L, 2L, "view"),
      (6L, 1L, "view"), (6L, 2L, "view")
    ).toDF("u", "ts", "ty")
    val exact = Sessionize.shapleyAttribution(ev, "u", "ts", "ty",
        "purchase", Seq("view", "click"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val est = Sessionize.shapleySampledAttribution(ev, "u", "ts", "ty",
        "purchase", Seq("view", "click"), nSamples = 400)
      .orderBy("channel").collect()
    val estMap = est.map(r => r.getString(0) -> r.getDouble(3)).toMap
    // n = 2: each permutation's marginal is one of two integer values,
    // so 400 samples put the estimate well within 0.25 of the exact 1.5
    assert(estMap.keySet == exact.keySet)
    estMap.foreach { case (c, v) =>
      assert(math.abs(v - exact(c)) < 0.25, s"$c: $v vs ${exact(c)}")
    }
    // efficiency holds EXACTLY for the estimate, not just in
    // expectation: per permutation the marginals telescope to
    // v(full) - v(empty) = 5 - 2 = 3
    assert(est.map(_.getLong(2)).sum == 400L * 3L)
    // deterministic md5 lanes: a replay is bit-identical
    val again = Sessionize.shapleySampledAttribution(ev, "u", "ts", "ty",
        "purchase", Seq("view", "click"), nSamples = 400)
      .orderBy("channel").collect()
    assert(est.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // n_converters rides along; single-channel degenerate case is exact
    assert(est.head.getLong(4) == 5L)
    val one = Sessionize.shapleySampledAttribution(ev, "u", "ts", "ty",
        "purchase", Seq("view"), nSamples = 3)
      .collect().head
    // v({view}) - v(empty) = 4 - 3 ... with only {view} as channel:
    // masks collapse to view-or-nothing: v(0) = converters with no view
    // touch = 2 (u2, u4, u5... u2's click is not a channel) -> v(0) = 3
    // (u2, u4, u5), v({view}) = 5; every permutation yields 2
    assert(one.getLong(2) == 3L * 2L && one.getDouble(3) == 2.0)
    intercept[IllegalArgumentException] {
      Sessionize.shapleySampledAttribution(ev, "u", "ts", "ty",
        "purchase", Seq("view", "click"), nSamples = 0)
    }
  }
}
