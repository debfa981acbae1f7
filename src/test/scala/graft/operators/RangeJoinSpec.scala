package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class RangeJoinSpec extends SparkFunSuite {
  import spark.implicits._

  private def naive(points: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long)],
                    withKey: Boolean = false): Set[(Long, Long)] =
    (for {
      (pid, p) <- points
      (iid, s, e) <- ivs
      if p >= s && p <= e
      if !withKey || pid % 2 == iid % 2 // key = id parity in the keyed test
    } yield (pid, iid)).toSet

  test("matches naive cross-filter, incl. intervals spanning many bins and boundary points") {
    // bin width 10: points on exact bin edges, intervals 0-wide, 1-bin, 5-bin
    val points = Seq((1L, 0L), (2L, 9L), (3L, 10L), (4L, 25L), (5L, 50L), (6L, 51L))
    val ivs = Seq((10L, 0L, 0L), (11L, 5L, 14L), (12L, 10L, 10L),
      (13L, 0L, 49L), (14L, 50L, 99L))
    val got = RangeJoin.pointInInterval(
      points.toDF("pid", "p"), "p",
      ivs.toDF("iid", "s", "e"), "s", "e", binWidth = 10)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive(points, ivs))
  }

  test("each qualifying pair appears exactly once (no dedup stage needed)") {
    val points = Seq((1L, 15L)).toDF("pid", "p")
    val ivs = Seq((9L, 0L, 100L)).toDF("iid", "s", "e") // covers 11 bins of width 10
    val rows = RangeJoin.pointInInterval(points, "p", ivs, "s", "e", 10).collect()
    assert(rows.length == 1)
  }

  test("negative coordinates bin consistently") {
    val points = Seq((1L, -15L), (2L, -10L), (3L, -1L), (4L, 0L))
    val ivs = Seq((10L, -20L, -11L), (11L, -10L, 0L), (12L, -100L, 100L))
    val got = RangeJoin.pointInInterval(
      points.toDF("pid", "p"), "p",
      ivs.toDF("iid", "s", "e"), "s", "e", binWidth = 7)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive(points, ivs))
  }

  test("inverted intervals (start > end) match nothing") {
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val ivs = Seq((10L, 9L, 1L)).toDF("iid", "s", "e")
    assert(RangeJoin.pointInInterval(points, "p", ivs, "s", "e", 10).isEmpty)
  }

  test("extra equi keys restrict matches") {
    val points = Seq((1L, 5L), (2L, 5L)).map { case (id, p) => (id, p, id % 2) }
    val ivs = Seq((10L, 0L, 9L), (11L, 0L, 9L)).map { case (id, s, e) => (id, s, e, id % 2) }
    val got = RangeJoin.pointInInterval(
      points.toDF("pid", "p", "k"), "p",
      ivs.toDF("iid", "s", "e", "k"), "s", "e", binWidth = 10, equiKeys = Seq("k"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive(points.map(t => (t._1, t._2)), ivs.map(t => (t._1, t._2, t._3)),
      withKey = true))
  }

  test("randomized differential: binned join equals naive for arbitrary geometry") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 5) {
      val binWidth = Seq(1L, 3L, 10L, 1000L)(round % 4)
      val points = (1L to 60L).map(i => (i, rnd.between(-100L, 100L)))
      val ivs = (1L to 40L).map { i =>
        val s = rnd.between(-100L, 100L); (100L + i, s, s + rnd.between(0L, 50L))
      }
      val got = RangeJoin.pointInInterval(
        points.toDF("pid", "p"), "p",
        ivs.toDF("iid", "s", "e"), "s", "e", binWidth)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs (round $round)")
      assert(got.toSet == naive(points, ivs), s"mismatch at binWidth=$binWidth")
    }
  }

  test("coordinates beyond 2^53 bin exactly (nanosecond-epoch regime)") {
    val base = 1L << 60
    // p = base+1 sits inside [base-9, base+1]; double division would collapse
    // base+1 and base-9 onto the same quotient and can mis-bin the point
    val points = Seq((1L, base + 1L), (2L, base - 10L), (3L, -base - 1L))
    val ivs = Seq((10L, base - 9L, base + 1L), (11L, -base - 5L, -base + 5L))
    val got = RangeJoin.pointInInterval(
      points.toDF("pid", "p"), "p",
      ivs.toDF("iid", "s", "e"), "s", "e", binWidth = 10)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive(points, ivs))
  }

  private def naiveOverlap(ls: Seq[(Long, Long, Long)], rs: Seq[(Long, Long, Long)]):
      Set[(Long, Long)] =
    (for {
      (lid, a, b) <- ls; (rid, c, d) <- rs
      if a <= d && c <= b
    } yield (lid, rid)).toSet

  test("interval overlap: exactly-once pairs incl. many-shared-bin and touching endpoints") {
    val ls = Seq((1L, 0L, 100L), (2L, 15L, 15L), (3L, 200L, 210L))
    val rs = Seq((10L, 50L, 120L), (11L, 15L, 15L), (12L, 210L, 300L), (13L, 101L, 150L))
    val got = RangeJoin.intervalOverlap(
      ls.toDF("lid", "ls", "le"), "ls", "le",
      rs.toDF("rid", "rs", "re"), "rs", "re", binWidth = 10)
      .select("lid", "rid").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "a pair was emitted more than once")
    assert(got.toSet == naiveOverlap(ls, rs))
  }

  test("randomized differential: interval overlap equals naive") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 5) {
      val binWidth = Seq(1L, 5L, 64L)(round % 3)
      def mk(n: Int, idBase: Long) = (1 to n).map { i =>
        val s = rnd.between(-80L, 80L); (idBase + i, s, s + rnd.between(0L, 40L))
      }
      val ls = mk(30, 0L); val rs = mk(30, 1000L)
      val got = RangeJoin.intervalOverlap(
        ls.toDF("lid", "ls", "le"), "ls", "le",
        rs.toDF("rid", "rs", "re"), "rs", "re", binWidth)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicates (round $round)")
      assert(got.toSet == naiveOverlap(ls, rs), s"mismatch at binWidth=$binWidth")
    }
  }

  test("coordinates at the Long.MinValue edge bin without overflow") {
    val lo = Long.MinValue
    val points = Seq((1L, lo), (2L, lo + 3L))
    val ivs = Seq((10L, lo, lo + 5L))
    val got = RangeJoin.pointInInterval(
      points.toDF("pid", "p"), "p",
      ivs.toDF("iid", "s", "e"), "s", "e", binWidth = 10)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive(points, ivs))
  }

  test("plans as a shuffled equi-join, not a nested-loop join") {
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val ivs = Seq((10L, 0L, 9L)).toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(points, "p", ivs, "s", "e", 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"range join degenerated to a cartesian:\n$plan")
  }
}
