package graft.operators

import graft.SparkFunSuite

class GraphSpec extends SparkFunSuite {
  import spark.implicits._

  test("triangleCounts: K4, disjoint triangle, path, star — hand counts") {
    // K4 on 1-4 (4 triangles, each node in 3), a separate triangle 10-12,
    // a path 20-21-22 (none), a 5-leaf star at 30 (none)
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (21L, 22L)) ++ (31L to 35L).map(l => (30L, l))).toDF("a", "b")
    val got = Graph.triangleCounts(edges, "a", "b")
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      10L -> 1L, 11L -> 1L, 12L -> 1L))
    assert(got.map(_._2).sum % 3 == 0, "each triangle counted at all 3 nodes")
  }

  test("triangleCounts: duplicates, reversed edges, self-loops collapse first") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 3L)).toDF("a", "b")
    val got = Graph.triangleCounts(edges, "a", "b")
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L),
      "dup/reversed edges are one edge; self-loops never close a wedge")
  }

  test("kCore: cascading peel — clique survives, tendrils and stars dissolve") {
    // K5 on 1-5 with a pendant chain 5-10-11-12, plus a 6-leaf star at 20
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val edges = (k5 ++ Seq((5L, 10L), (10L, 11L), (11L, 12L)) ++
      (21L to 26L).map(l => (20L, l))).toDF("a", "b")
    val core3 = Graph.kCore(edges, "a", "b", 3).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the chain peels layer by layer (12, then 11, then 10) — the
    // cascade, not just the first pass; the star dies entirely
    assert(core3 == (1L to 5L).map(_ -> 4L))
    // k=1 keeps everything (after dedup/self-loop cleaning)
    assert(Graph.kCore(edges, "a", "b", 1).count() == 15)
    // k above the max degree empties the graph
    assert(Graph.kCore(edges, "a", "b", 7).count() == 0)
    intercept[IllegalStateException] {
      Graph.kCore(edges, "a", "b", 3, maxIters = 1)
    }
    intercept[IllegalArgumentException] {
      Graph.kCore(edges, "a", "b", 0)
    }
  }

  test("triangleCounts: a hub with no closing edges yields nothing") {
    // worst-case shape for unoriented wedge counting: 100-leaf star
    val edges = (1L to 100L).map(l => (0L, l)).toDF("a", "b")
    assert(Graph.triangleCounts(edges, "a", "b").count() == 0)
    intercept[IllegalArgumentException] {
      Graph.triangleCounts(edges.withColumnRenamed("a", "_u"), "_u", "b")
    }
  }
}
