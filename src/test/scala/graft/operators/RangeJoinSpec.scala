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

  test("plans as a shuffled equi-join, not a nested-loop join") {
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val ivs = Seq((10L, 0L, 9L)).toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(points, "p", ivs, "s", "e", 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"range join degenerated to a cartesian:\n$plan")
  }
}
