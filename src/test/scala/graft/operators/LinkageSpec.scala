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
}
