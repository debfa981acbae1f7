package graft.operators

import graft.SparkFunSuite

class LinkageSpec extends SparkFunSuite {
  import spark.implicits._

  // (id, phone, first, last): 1-2 same entity (phone differs), 3 unrelated,
  // 4-5 share ONLY a hot junk phone
  private def recs = Seq(
    (1L, Some("555-0001"), "ann", "smith"),
    (2L, Some("555-0002"), "ann", "smith"),
    (3L, Some("555-0003"), "bob", "jones"),
    (4L, Some("000"), "carol", "wu"),
    (5L, Some("000"), "dave", "liu")
  ).toDF("id", "phone", "first", "last")

  test("blockedPairs: union of blocks — a pair differing in one field still meets") {
    val pairs = Linkage.blockedPairs(recs, "id", Seq("phone", "first", "last"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "1-2 share first AND last blocks")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "3 blocks with nobody")
    assert(pairs.contains((4L, 5L)), "4-5 share the phone block")
  }

  test("blockedPairs: hot junk blocks beyond maxBucket are dropped; nulls never block") {
    val hot = (10L to 20L).map(i => (i, Some("HOT"), s"f$i", s"l$i")) :+
      ((30L, None: Option[String], "x", "x_l"))
    val df = hot.toDF("id", "phone", "first", "last")
    val pairs = Linkage.blockedPairs(df, "id", Seq("phone"), maxBucket = 8)
    assert(pairs.count() == 0, "an 11-deep block at cap 8 must vanish, not explode")
    val nullSide = Linkage.blockedPairs(
      Seq((1L, None: Option[String]), (2L, None: Option[String])).toDF("id", "phone"),
      "id", Seq("phone"))
    assert(nullSide.count() == 0, "null blocking values never pair")
  }

  test("scoreFieldAgreement: weighted sum, null-safe agreement, fixed fold order") {
    val pairs = Seq((1L, 2L), (4L, 5L)).toDF("id_a", "id_b")
    val scored = Linkage.scoreFieldAgreement(pairs, recs, "id",
        Seq(("phone", 0.5), ("first", 0.3), ("last", 0.2)))
      .orderBy("id_a").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    // 1-2 agree on first+last = 0.5; 4-5 agree on phone only = 0.5
    assert(scored == Seq((1L, 0.5), (4L, 0.5)))
    val nulls = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "phone")
    val s2 = Linkage.scoreFieldAgreement(Seq((1L, 2L)).toDF("id_a", "id_b"),
      nulls, "id", Seq(("phone", 1.0))).collect().head.getDouble(2)
    assert(s2 == 1.0, "null <=> null agrees by contract")
  }

  test("goldenRecords: majority vote, lexicographic tie, nulls don't vote, singletons survive") {
    val records = Seq(
      // entity {1,2,3}: phone majority a, first 2-2... no: b vs b vs null
      (1L, Some("a"), Some("ann")),
      (2L, Some("a"), Some("anne")),
      (3L, Some("b"), None: Option[String]),
      // unassigned singleton keeps its own values under its own id
      (9L, Some("z"), Some("zoe")),
      // entity {4,5}: 1-1 phone tie → lexicographically smaller wins
      (4L, Some("q"), None: Option[String]),
      (5L, Some("p"), None: Option[String])
    ).toDF("id", "phone", "first")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("id", "cluster_id")
    val got = Linkage.goldenRecords(records, "id", clusters, Seq("phone", "first"))
      .orderBy("entity_id", "field").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getAs[Long]("n_votes"), r.getAs[Long]("n_total"))).toSeq
    assert(got == Seq(
      (1L, "first", "ann", 1L, 2L),  // 1-1 tie ann/anne → lexicographic
      (1L, "phone", "a", 2L, 3L),    // majority 2 of 3
      (4L, "phone", "p", 1L, 2L),    // tie p/q → p; no `first` row (all null)
      (9L, "first", "zoe", 1L, 1L),  // singleton under its own id
      (9L, "phone", "z", 1L, 1L)))
    intercept[IllegalArgumentException] {
      Linkage.goldenRecords(records, "id", clusters, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Linkage.goldenRecords(records.withColumnRenamed("first", "_v"),
        "id", clusters, Seq("phone"))
    }
  }

  test("sortedNeighborhoodPairs: window pairs in key order, gaps, near-miss") {
    // key order: ann(3) < bob(1) < smith(2) < smyth(4) < zoe(5)
    val df = Seq((1L, "bob"), (2L, "smith"), (3L, "ann"), (4L, "smyth"),
      (5L, "zoe")).toDF("id", "name")
    val got = Linkage.sortedNeighborhoodPairs(df, "id", "name", window = 3)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // rank order 3,1,2,4,5: gap-1 pairs (3,1)(1,2)(2,4)(4,5);
    // gap-2 pairs (3,2)(1,4)(2,5) — smith/smyth meet (equality
    // blocking on the name would never pair them)
    assert(got == Seq((1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 2), (2L, 3L, 2),
      (2L, 4L, 1), (2L, 5L, 2), (4L, 5L, 1)))
    // window 2 on n rows = exactly n-1 consecutive pairs, all gap 1
    val many = (1L to 100L).map(i => (i, f"k${(i * 37) % 100}%03d"))
      .toDF("id", "name")
    val w2 = Linkage.sortedNeighborhoodPairs(many, "id", "name", window = 2)
      .collect()
    assert(w2.length == 99 && w2.forall(_.getInt(2) == 1))
    // tie keys fall back to id order deterministically
    val ties = Seq((7L, "x"), (3L, "x"), (5L, "x")).toDF("id", "name")
    val tg = Linkage.sortedNeighborhoodPairs(ties, "id", "name", window = 2)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(tg == Seq((3L, 5L), (5L, 7L)))
    // null keys/ids excluded; window guard
    val withNull = Seq((Some(1L), Some("a")), (Some(2L), None),
      (None, Some("b"))).map { case (i, k) => (i.map(long2Long).orNull, k.orNull) }
      .toDF("id", "name")
    assert(Linkage.sortedNeighborhoodPairs(withNull, "id", "name", 2)
      .count() == 0)
    intercept[IllegalArgumentException] {
      Linkage.sortedNeighborhoodPairs(df, "id", "name", window = 1)
    }
  }

  test("fellegiSunterWeights: exact u from histograms, nulls as values, constant field") {
    def rf6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val recs = Seq(
      (1L, "a", Some("d"), "z"), (2L, "a", Some("d"), "z"),
      (3L, "b", None, "z"), (4L, "c", None, "z"))
      .toDF("id", "x", "y", "k")
    val w = Linkage.fellegiSunterWeights(recs, Seq("x", "y", "k"))
      .orderBy("field").collect()
      .map(r => r.getString(0) -> r).toMap
    // x: hist {a:2, b:1, c:1} → u = 6/16
    val wx = w("x")
    assert(wx.getLong(3) == 6L && wx.getDouble(4) == 6.0 / 16.0)
    assert(wx.getDouble(6) == rf6(math.log(0.95 / (6.0 / 16.0))))
    assert(wx.getDouble(7) == rf6(math.log(0.05 / (1.0 - 6.0 / 16.0))))
    // y: nulls count as a value → hist {null:2, d:2} → u = 8/16
    assert(w("y").getLong(3) == 8L && w("y").getDouble(4) == 0.5)
    // k constant: u = 1 exactly → w_dis NULL, never −∞
    assert(w("k").getLong(3) == 16L && w("k").getDouble(4) == 1.0)
    assert(w("k").isNullAt(7))
    assert(w("k").getDouble(6) == rf6(math.log(0.95)))
    intercept[IllegalArgumentException] {
      Linkage.fellegiSunterWeights(recs, Seq("x"), mE6 = 1000000L)
    }
  }

  test("fsScorePairs: agree/disagree routing, NULL w_dis scores 0, field order") {
    def rf(x: Double, p: Double): Double = math.floor(x * p + 0.5) / p
    val recs = Seq((1L, "a", "p"), (2L, "a", "q"), (3L, "b", "p"))
      .toDF("id", "x", "y")
    val weights = Seq(("x", 1.5, Some(-2.0)), ("y", 0.5, None))
      .toDF("field", "w_agree", "w_dis")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Linkage.fsScorePairs(pairs, recs, "id", Seq("x", "y"), weights)
      .orderBy("id_a", "id_b").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // (1,2): x agrees (+1.5), y disagrees with NULL w_dis (+0.0)
    assert(got((1L, 2L)) == rf(1.5 + 0.0, 1e4))
    // (1,3): x disagrees (−2.0), y agrees (+0.5)
    assert(got((1L, 3L)) == rf(-2.0 + 0.5, 1e4))
    intercept[IllegalArgumentException] {
      Linkage.fsScorePairs(pairs, recs, "id", Seq("x", "missing"), weights)
    }
  }
}
