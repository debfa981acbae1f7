package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions.col

class RanksSpec extends SparkFunSuite {
  import spark.implicits._

  test("skyline2d: hand-replayed dominance, ties, duplicates survive") {
    // minY per x: 0->9, 1->5, 2->3, 3->3, 4->1; strict-prefix mins
    // null/9/5/3/3 -> survivors are x in {0,1,2,4} at their min y,
    // with BOTH duplicates of a surviving point kept
    val pts = Seq(
      (1L, 1L, 5L), (2L, 2L, 3L), (3L, 3L, 3L), (4L, 2L, 3L),
      (5L, 0L, 9L), (6L, 4L, 1L), (7L, 4L, 2L), (8L, 1L, 5L)
    ).toDF("id", "x", "y")
    val got = Ranks.skyline2d(pts, "id", "x", "y")
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 4L, 5L, 6L, 8L))
    // brute-force differential on a randomized cloud
    val rnd = new scala.util.Random(7)
    val cloud = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val cdf = cloud.toDF("id", "x", "y")
    val naive = cloud.filter { case (_, x, y) =>
      !cloud.exists { case (_, qx, qy) =>
        qx <= x && qy <= y && (qx < x || qy < y)
      }
    }.map(_._1).sorted
    val sky = Ranks.skyline2d(cdf, "id", "x", "y")
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(sky == naive)
    // null coordinates are excluded, not propagated
    val withNull = Seq((1L, Some(1L), Some(1L)), (2L, None, Some(0L)))
      .toDF("id", "x", "y")
    assert(Ranks.skyline2d(withNull, "id", "x", "y")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("rankBy: dense 0-based ranks under a total order") {
    val df = Seq(("a", 30L), ("b", 10L), ("c", 20L)).toDF("k", "v")
    val got = Ranks.rankBy(df, "k", Seq(col("v"), col("k")))
      .orderBy("_rnk").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("b", 0L), ("c", 1L), ("a", 2L)))
  }
}
