package graft.operators

import graft.SparkFunSuite

class SpatialSpec extends SparkFunSuite {
  import spark.implicits._

  test("radiusJoin: hand-placed points, boundary inclusive, no dups") {
    val l = Seq((1L, 0L, 0L), (2L, 100L, 100L)).toDF("pid", "x", "y")
    val r = Seq(
      (10L, 3L, 4L),       // d²=25 from p1
      (11L, 10L, 0L),      // d²=100 from p1: ON the boundary, included
      (12L, 11L, 0L),      // d²=121: out
      (13L, 100L, 105L),   // d²=25 from p2 (far cell from p1)
      (14L, -7L, -7L)      // d²=98 from p1: negative coords, in
    ).toDF("pid", "x", "y")
    val got = Spatial.radiusJoin(l, r, "pid", "x", "y", radius = 10L)
      .orderBy("l_id", "r_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(got == Seq((1L, 10L, 25L), (1L, 11L, 100L), (1L, 14L, 98L),
      (2L, 13L, 25L)))
  }

  test("radiusJoin ≡ brute force on a seeded cloud straddling the origin") {
    // deterministic LCG points in [-500, 500)²; radius 37 exercises
    // many cells and the negative-coordinate floor division
    def lcg(s: Long): Long = (s * 6364136223846793005L + 1442695040888963407L)
    val pts = (1 to 300).map { i =>
      val a = lcg(i.toLong); val b = lcg(a)
      (i.toLong, math.floorMod(a, 1000L) - 500L, math.floorMod(b, 1000L) - 500L)
    }
    val l = pts.take(150).toDF("pid", "x", "y")
    val r = pts.drop(150).toDF("pid", "x", "y")
    val got = Spatial.radiusJoin(l, r, "pid", "x", "y", radius = 37L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val brute = (for {
      (li, lx, ly) <- pts.take(150)
      (ri, rx, ry) <- pts.drop(150)
      d = (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry)
      if d <= 37L * 37L
    } yield (li, ri, d)).toSet
    assert(brute.nonEmpty && got == brute)
    intercept[IllegalArgumentException] {
      Spatial.radiusJoin(l, r, "pid", "x", "y", radius = 0L)
    }
  }

  test("knnWithinRadius ≡ brute-force top-k on the seeded cloud, tie on r_id") {
    def lcg(s: Long): Long = (s * 6364136223846793005L + 1442695040888963407L)
    val pts = (1 to 300).map { i =>
      val a = lcg(i.toLong); val b = lcg(a)
      (i.toLong, math.floorMod(a, 1000L) - 500L, math.floorMod(b, 1000L) - 500L)
    }
    val l = pts.take(150).toDF("pid", "x", "y")
    val r = pts.drop(150).toDF("pid", "x", "y")
    val got = Spatial.knnWithinRadius(l, r, "pid", "x", "y",
        radius = 200L, k = 3)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2),
        x.getLong(3))).toSet
    val brute = pts.take(150).flatMap { case (li, lx, ly) =>
      pts.drop(150)
        .map { case (ri, rx, ry) =>
          (ri, (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry)) }
        .filter(_._2 <= 200L * 200L)
        .sortBy { case (ri, d) => (d, ri) }
        .take(3).zipWithIndex
        .map { case ((ri, d), j) => (li, j + 1, ri, d) }
    }.toSet
    assert(brute.nonEmpty && got == brute)
    // a left point with fewer than k in-radius neighbors keeps them all
    val lone = Spatial.knnWithinRadius(
      Seq((1L, 0L, 0L)).toDF("pid", "x", "y"),
      Seq((10L, 3L, 4L)).toDF("pid", "x", "y"), "pid", "x", "y",
      radius = 10L, k = 3).collect()
    assert(lone.map(x => (x.getLong(0), x.getInt(1), x.getLong(2),
      x.getLong(3))).toSeq == Seq((1L, 1, 10L, 25L)))
    intercept[IllegalArgumentException] {
      Spatial.knnWithinRadius(l, r, "pid", "x", "y", radius = 10L, k = 0)
    }
  }

  test("dbscan: hand-replayed cores, border, noise, two clusters") {
    // line cluster {1,2,3} + border 4 hanging off core 3, isolated
    // noise 5, second cluster {6,7,8}; eps=100, minPts=3
    val pts = Seq(
      (1L, 0L, 0L), (2L, 50L, 0L), (3L, 100L, 0L), (4L, 190L, 0L),
      (5L, 500L, 500L),
      (6L, 1000L, 1000L), (7L, 1050L, 1000L), (8L, 1100L, 1000L)
    ).toDF("id", "x", "y")
    val got = Spatial.dbscan(pts, "id", "x", "y", eps = 100L, minPts = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 3L, "core", 1L), (2L, 3L, "core", 1L), (3L, 4L, "core", 1L),
      (4L, 2L, "border", 1L), (5L, 1L, "noise", -1L),
      (6L, 3L, "core", 6L), (7L, 3L, "core", 6L), (8L, 3L, "core", 6L)))
    // an isolated core (minPts=1 makes every point core) clusters alone
    val solo = Spatial.dbscan(pts, "id", "x", "y", eps = 100L, minPts = 1)
      .filter(org.apache.spark.sql.functions.col("id") === 5L).collect()(0)
    assert(solo.getString(2) == "core" && solo.getLong(3) == 5L)
  }
}
