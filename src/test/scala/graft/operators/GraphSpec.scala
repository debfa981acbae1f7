package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions.{col, lit}

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

  test("sCore: strength keeps a heavy pendant that degree would peel; cascade; w=1 ≡ kCore") {
    // Triangle 1-2-3 with w=3 edges (strength 6 each), heavy pendant
    // 3-4 split into parallel w=2 + w=4 (degree 1, strength 6 —
    // survives s=6), light pendant 1-5 w=5 (strength 5 — peels), and a
    // 2-hop cascade 2-6 (w=5) / 6-7 (w=1): 7 peels first (strength 1),
    // only then 6 (6 → 5).
    val tri = Seq((1L, 2L, 3L), (2L, 3L, 3L), (1L, 3L, 3L))
    val edges = (tri ++ Seq((3L, 4L, 2L), (3L, 4L, 4L), (1L, 5L, 5L),
      (2L, 6L, 5L), (6L, 7L, 1L))).toDF("a", "b", "w")
    val got = Graph.sCore(edges, "a", "b", "w", s = 6).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // node 3 holds triangle 6 + pendant 6 = 12; the others hold 6
    assert(got == Seq((1L, 6L), (2L, 6L), (3L, 12L), (4L, 6L)))
    // w ≡ 1 reduces to kCore value-for-value (strength == degree)
    val uw = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (1L, 5L))
    val kc = Graph.kCore(uw.toDF("a", "b"), "a", "b", 2).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sc = Graph.sCore(uw.map { case (a, b) => (a, b, 1L) }.toDF("a", "b", "w"),
      "a", "b", "w", s = 2).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sc == kc)
    // zero/negative weights fail loudly; s must be positive
    intercept[Exception] {
      Graph.sCore(Seq((1L, 2L, 0L)).toDF("a", "b", "w"), "a", "b", "w", 1)
        .collect()
    }
    intercept[IllegalArgumentException] {
      Graph.sCore(edges, "a", "b", "w", 0)
    }
    intercept[IllegalStateException] {
      Graph.sCore(edges, "a", "b", "w", 6, maxIters = 1)
    }
  }

  test("clusteringCoefficientWeighted: Barrat hand values; w=1 ≡ unweighted; guards") {
    // triangle 1-2-3 (w12=1, w13=2, w23=3) + heavy pendant 3-4 (w=10):
    // node1: mass w12+w13=3, s=3, k=2 → 3/(3·1) = 1.0 (fully closed)
    // node2: mass 4, s=4, k=2 → 1.0
    // node3: mass w13+w23=5, s=15, k=3 → 5/(15·2) = 1/6 — the heavy
    //        edge closes no triangle, so weighted < unweighted (1/3)
    // node4: k=1 → 0.0
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 3L), (3L, 4L, 10L))
      .toDF("a", "b", "w")
    val got = Graph.clusteringCoefficientWeighted(edges, "a", "b", "w")
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == Seq((1L, 2L, 3L, 3L, 1.0), (2L, 2L, 4L, 4L, 1.0),
      (3L, 3L, 15L, 5L, 5.0 / 30.0), (4L, 1L, 10L, 0L, 0.0)))
    // parallel edges SUM before anything: 1-2 delivered as 1+0... (1,2)
    // twice with w 1 and 2 equals one edge of w 3
    val par = Seq((1L, 2L, 1L), (2L, 1L, 2L), (1L, 3L, 2L), (2L, 3L, 3L))
      .toDF("a", "b", "w")
    val one = Seq((1L, 2L, 3L), (1L, 3L, 2L), (2L, 3L, 3L)).toDF("a", "b", "w")
    assert(Graph.clusteringCoefficientWeighted(par, "a", "b", "w")
      .orderBy("node").collect().toSeq ==
      Graph.clusteringCoefficientWeighted(one, "a", "b", "w")
        .orderBy("node").collect().toSeq)
    // w ≡ 1 reduces to clusteringCoefficient value-for-value
    val uw = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 5L))
    val cw = Graph.clusteringCoefficientWeighted(
      uw.map { case (a, b) => (a, b, 1L) }.toDF("a", "b", "w"), "a", "b", "w")
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getDouble(4))).toSeq
    val cu = Graph.clusteringCoefficient(uw.toDF("a", "b"), "a", "b")
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(cw == cu)
    // zero weight is loud, never dropped
    intercept[Exception] {
      Graph.clusteringCoefficientWeighted(
        Seq((1L, 2L, 0L)).toDF("a", "b", "w"), "a", "b", "w").collect()
    }
  }

  test("harmonicCentralityWeighted: weighted path beats hop count; horizon; absent landmark") {
    // 1→2 (w2), 2→3 (w3), 1→3 (w10), symmetrized: the weighted min to 3
    // is 5 via TWO hops (beats the direct 10) — the case hop-based
    // harmonic can't express
    val e = Seq((1L, 2L, 2L), (2L, 3L, 3L), (1L, 3L, 10L))
    val edges = (e ++ e.map { case (a, b, w) => (b, a, w) })
      .toDF("src", "dst", "w")
    val got = Graph.harmonicCentralityWeighted(edges, "src", "dst", "w",
      landmarks = Seq(1L, 99L), rounds = 4)
      .orderBy("landmark").collect()
    assert(got(0).getLong(1) == 2L)
    assert(got(0).getDouble(2) == 0.0 + 1.0 / 2.0 + 1.0 / 5.0)
    // absent landmark reports (0, 0.0) instead of vanishing
    assert(got(1).getLong(1) == 0L && got(1).getDouble(2) == 0.0)
    // rounds = 1 horizon: only direct edges — dist(3) = 10, not 5
    val one = Graph.harmonicCentralityWeighted(edges, "src", "dst", "w",
      landmarks = Seq(1L), rounds = 1).collect().head
    assert(one.getDouble(2) == 0.0 + 1.0 / 2.0 + 1.0 / 10.0)
  }

  test("assortativityWeighted: hand-computed r_w; w=1 ≡ degreeAssortativity; guards") {
    // path 1-2-3, w12=1, w23=2: strengths (1,3,2); W=6, Σw·s_u=14,
    // Σw·s_u²=36, Σw·s_u·s_v=30 → r_w = (180−196)/(216−196) = −0.8
    val g = Seq((1L, 2L, 1L), (2L, 3L, 2L)).toDF("a", "b", "w")
    val got = Graph.assortativityWeighted(g, "a", "b", "w").collect().head
    assert(got.getLong(0) == 3L && got.getLong(1) == 3L)
    assert(got.getDouble(2) == -0.8)
    // w ≡ 1 reduces to degreeAssortativity value-for-value
    val uw = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
    val rw = Graph.assortativityWeighted(
      uw.map { case (a, b) => (a, b, 1L) }.toDF("a", "b", "w"), "a", "b", "w")
      .collect().head
    val ru = Graph.degreeAssortativity(uw.toDF("a", "b"), "a", "b")
      .collect().head
    assert(rw.getLong(0) == ru.getLong(0) && rw.getLong(1) == ru.getLong(1))
    assert(rw.getDouble(2) == ru.getDouble(2))
    // a regular graph (zero variance) yields null, parallel edges sum
    val reg = Seq((1L, 2L, 2L), (1L, 2L, 3L)).toDF("a", "b", "w")
    assert(Graph.assortativityWeighted(reg, "a", "b", "w")
      .collect().head.isNullAt(2))
    intercept[Exception] {
      Graph.assortativityWeighted(Seq((1L, 2L, 0L)).toDF("a", "b", "w"),
        "a", "b", "w").collect()
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

  test("bfsHops: levels, min-hop on a diamond, bound, isolated landmark") {
    // path 1→2→3→4→5 plus diamond 1→6, 1→7, 6→8, 7→8; landmark 9 isolated
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (1L, 6L), (1L, 7L), (6L, 8L), (7L, 8L)).toDF("s", "d")
    val src = Seq(1L, 9L).toDF("n")
    val got = Graph.bfsHops(edges, "s", "d", src, "n", maxHops = 2)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    // node 8 reachable two ways, recorded ONCE at its min level 2;
    // node 4 is at hops 3 — beyond the bound, absent
    assert(got == Seq(1L -> 0, 2L -> 1, 3L -> 2, 6L -> 1, 7L -> 1,
      8L -> 2, 9L -> 0))
    // maxHops 0: landmarks only
    assert(Graph.bfsHops(edges, "s", "d", src, "n", maxHops = 0)
      .count() == 2)
    // direction matters: 2→1 only does not make 2 reachable FROM 1
    val rev = Seq((2L, 1L)).toDF("s", "d")
    val g2 = Graph.bfsHops(rev, "s", "d", Seq(1L).toDF("n"), "n", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(g2 == Seq(1L -> 0))
    // a cycle terminates early (frontier empties once all visited)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val g3 = Graph.bfsHops(cyc, "s", "d", Seq(1L).toDF("n"), "n", 50)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(g3 == Seq(1L -> 0, 2L -> 1, 3L -> 2))
    intercept[IllegalArgumentException] {
      Graph.bfsHops(cyc, "s", "d", src, "n", maxHops = -1)
    }
  }

  test("clusteringCoefficient: K4 is 1, star is 0, hand mixed values") {
    // K4: every node C = 1 (3 triangles, degree 3: 6/6); pendant 5 on
    // node 1 raises 1's degree to 4 → C(1) = 2·3/12 = 0.5; C(5) = 0.0
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((1L, 5L))).toDF("a", "b")
    val got = Graph.clusteringCoefficient(edges, "a", "b")
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq((1L, 4L, 3L, 0.5), (2L, 3L, 3L, 1.0),
      (3L, 3L, 3L, 1.0), (4L, 3L, 3L, 1.0), (5L, 1L, 0L, 0.0)))
    // a star has zero triangles everywhere; center degree n, C = 0
    val star = (1L to 5L).map(l => (0L, l)).toDF("a", "b")
    val s = Graph.clusteringCoefficient(star, "a", "b")
      .orderBy("node").collect()
    assert(s.forall(_.getDouble(3) == 0.0) && s.length == 6)
    // triangle + pendant: open wedge at node 3: C(3) = 2·1/(3·2) = 1/3
    val tp = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a", "b")
    val t = Graph.clusteringCoefficient(tp, "a", "b")
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(t.toSeq == Seq(1L -> 1.0, 2L -> 1.0, 3L -> (2.0 / 6.0),
      4L -> 0.0))
  }

  test("degreeAssortativity: hand-computed values, regular-graph null") {
    // star K1,3 is perfectly disassortative: r = -1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val s = Graph.degreeAssortativity(star, "a", "b").head
    assert((s.getLong(0), s.getLong(1), s.getDouble(2)) == ((4L, 3L, -1.0)))
    // triangle + pendant: M=8, Σx=18, Σxx=44, Σxy=38 → r = -20/28
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a", "b")
    val t = Graph.degreeAssortativity(tri, "a", "b").head
    assert(t.getDouble(2) == -20.0 / 28.0)
    // a cycle is regular — zero degree variance, null (not NaN)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    assert(Graph.degreeAssortativity(cyc, "a", "b").head.isNullAt(2))
    // cleaning: dup/reversed edges collapse, self-loops drop
    val messy = Seq((0L, 1L), (1L, 0L), (0L, 1L), (0L, 0L), (0L, 2L),
      (0L, 3L)).toDF("a", "b")
    val m = Graph.degreeAssortativity(messy, "a", "b").head
    assert((m.getLong(1), m.getDouble(2)) == ((3L, -1.0)))
  }

  test("pageRank: 3-cycle is an exact integer fixed point") {
    // a→b→c→a: r0 = 1e12 div 3 = 333333333333; each round computes
    // tele + 85·r div 100 = 50000000000 + 283333333333 = r0 again —
    // the floor arithmetic lands exactly on the stationary point
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val got = Graph.pageRank(edges, "s", "d", iters = 4)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 333333333333L, 0.333333333333),
      (2L, 333333333333L, 0.333333333333),
      (3L, 333333333333L, 0.333333333333)))
  }

  test("personalizedPageRank: hand-replayed 3 rounds, isolated seed, seed restart") {
    // cycle 1→2→3→1, seeds {1, 9} (9 isolated — kept via the seed
    // union, all its mass is dangling). S = 2, tele = 15e12/200 = 75e9,
    // r0 = 5e11 on seeds. Hand replay:
    //   round 1: dang = 5e11, share 2.5e11; r = (287.5e9, 425e9, 0, 287.5e9)
    //   round 2: dang = 287.5e9, share 143.75e9;
    //     r = (197.1875e9, 244.375e9, 361.25e9, 197.1875e9)
    //   round 3: dang = 197.1875e9, share 98.59375e9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val seeds = Seq(1L, 9L, 9L).toDF("sk") // dup seed must not double-count
    val got = Graph.personalizedPageRank(edges, "s", "d", seeds, "sk",
        iters = 3)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 465867187500L), (2L, 167609375000L),
      (3L, 207718750000L), (9L, 158804687500L)))
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, "s", "d",
        Seq.empty[Long].toDF("sk"), "sk")
    }
  }

  test("pageRank: dangling mass redistributes — hand-replayed round") {
    // a→b, a→c with b, c dangling (n = 3). Hand replay of round 1:
    //   r0 = 333333333333 each; dangling D = r(b)+r(c) = 666666666666,
    //   D div 3 = 222222222222; a sends r0 div 2 = 166666666666 to each;
    //   tele = (15·1e12) div 300 = 50000000000
    //   r1(a) = tele + 85·(0 + 222222222222) div 100 = 238888888888
    //   r1(b) = r1(c) = tele + 85·(166666666666 + 222222222222) div 100
    //         = 380555555554
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("s", "d")
    val got = Graph.pageRank(edges, "s", "d", iters = 1)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(1L -> 238888888888L, 2L -> 380555555554L,
      3L -> 380555555554L))
    // floor retirement: total mass stays within (m + 2n) units of 1e12
    val total = got.map(_._2).sum
    assert(total <= 1000000000000L && total >= 1000000000000L - 8L)
  }

  test("pageRank: cleaning, guards, and mass conservation over rounds") {
    // self-loops dropped, parallel edges collapsed, nulls dropped
    val raw = Seq((Some(1L), Some(2L)), (Some(1L), Some(2L)),
      (Some(2L), Some(2L)), (None, Some(9L)), (Some(2L), Some(1L)))
      .toDF("s", "d")
    val got = Graph.pageRank(raw, "s", "d", iters = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the cleaned graph is the symmetric pair 1↔2: exact fixed point at
    // 1e12 div 2 each (tele = 75000000000; 75e9 + 85·5e11 div 100 = 5e11)
    assert(got == Seq(1L -> 500000000000L, 2L -> 500000000000L))
    intercept[IllegalArgumentException] {
      Graph.pageRank(raw, "s", "d", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(raw, "s", "d", iters = 1, dampNum = 101L)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(raw.withColumnRenamed("s", "_s"), "_s", "d")
    }
    // a bigger asymmetric graph: mass conserved to within (m + 2n)
    // floor-retired units per round
    val big = (1L to 30L).flatMap(i => Seq((i, i % 30 + 1), (i, (i * 7) % 30 + 1)))
      .toDF("s", "d")
    val ranks = Graph.pageRank(big, "s", "d", iters = 3)
      .collect().map(_.getLong(1))
    val tot = ranks.sum
    assert(tot <= 1000000000000L && tot > 1000000000000L - 3L * (60L + 60L),
      s"mass $tot drifted more than floor retirement allows")
  }

  test("shortestPaths: exact mins, bounded rounds, parallel-edge collapse") {
    // 1->2 (5, and a parallel 9 that must collapse), 2->3 (1),
    // 1->3 (10), 3->4 (1), 4->4 self-loop (drops)
    val e = Seq((1L, 2L, 5L), (1L, 2L, 9L), (2L, 3L, 1L), (1L, 3L, 10L),
      (3L, 4L, 1L), (4L, 4L, 3L)).toDF("src", "dst", "w")
    val src = Seq(Tuple1(1L)).toDF("node")
    val got = Graph.shortestPaths(e, "src", "dst", "w", src, "node",
        rounds = 4)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 0L), (2L, 5L), (3L, 6L), (4L, 7L)))
    // rounds=1 truncation: node 3 sees only the direct 10-edge, 4 unseen
    val one = Graph.shortestPaths(e, "src", "dst", "w", src, "node",
        rounds = 1)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(one.toSeq == Seq((1L, 0L), (2L, 5L), (3L, 10L)))
    // negative weights rejected loudly
    val neg = Seq((1L, 2L, -1L)).toDF("src", "dst", "w")
    intercept[Exception] {
      Graph.shortestPaths(neg, "src", "dst", "w", src, "node").collect()
    }
  }

  test("hits: hand-replayed integer fixed-point on a bipartite graph") {
    // hubs 1,2,3 -> authorities 10,11; node 2 links both; a parallel
    // edge and a self-loop drop in cleaning
    val e = Seq((1L, 10L), (2L, 10L), (2L, 10L), (2L, 11L), (3L, 11L),
      (7L, 7L)).toDF("s", "d")
    val got = Graph.hits(e, "s", "d", iters = 2).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // S=1e12, n=5, h0=2e11 each; round 1: ar(10)=ar(11)=4e11, at=8e11
    // -> a=5e11 each; hr=(5e11,1e12,5e11), ht=2e12 -> h=(2.5e11,5e11,
    // 2.5e11); round 2 reproduces the same normalized values
    assert(got == Seq(
      (1L, 0L, 250000000000L), (2L, 0L, 500000000000L),
      (3L, 0L, 250000000000L),
      (10L, 500000000000L, 0L), (11L, 500000000000L, 0L)))
    val doubles = Graph.hits(e, "s", "d", iters = 2)
      .filter(org.apache.spark.sql.functions.col("node") === 2L).collect()(0)
    assert(doubles.getDouble(3) == 0.0 && doubles.getDouble(4) == 0.5)
    intercept[IllegalArgumentException] { Graph.hits(e, "s", "d", iters = 0) }
  }

  test("modularity: two triangles score Q = 0.5; partial partitions fail") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (7L, 8L), (8L, 9L), (7L, 9L)).toDF("a", "b")
    val labels = Graph.labelPropagation(e, "a", "b", iters = 3)
    val r = Graph.modularity(e, "a", "b", labels, "node", "label")
      .collect().head
    // m=6; per triangle: ec=3, deg_c=6 -> Q*4m^2 = 2*(4*6*3 - 36) = 72
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((6L, 6L, 2L, 72L)))
    assert(r.getDouble(4) == 72.0 / (4.0 * 6.0 * 6.0))
    // one community over everything scores exactly 0
    val one = labels.select(org.apache.spark.sql.functions.col("node"),
      org.apache.spark.sql.functions.lit(1L).as("label"))
    assert(Graph.modularity(e, "a", "b", one, "node", "label")
      .collect().head.getLong(3) == 0L)
    // a partition missing a node fails loudly
    val partial = labels.filter(org.apache.spark.sql.functions.col("node") =!= 9L)
    intercept[IllegalArgumentException] {
      Graph.modularity(e, "a", "b", partial, "node", "label")
    }
  }

  test("harmonicCentrality: hand-folded 1/d sums, absent landmark zeroes") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val got = Graph.harmonicCentrality(e, "s", "d", Seq(3L, 1L, 9L))
      .orderBy("landmark").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // from 1: hops 1,2,3 -> ((0 + 1/1) + 1/2) + 1/3, ascending hop order
    assert(got(0) == ((1L, 3L,
      ((0.0 + 1.0 / 1.0) + 1.0 / 2.0) + 1.0 / 3.0)))
    assert(got(1) == ((3L, 1L, 1.0)))
    assert(got(2) == ((9L, 0L, 0.0)))
  }

  test("labelPropagation: hand-replayed sync rounds, min-label ties") {
    // path 1-2-3-4-5: three sync rounds land on [2,1,2,1,2]
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = Graph.labelPropagation(path, "a", "b", iters = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 1L), (3L, 2L), (4L, 1L), (5L, 2L)))
    // two disjoint triangles each converge to their min label
    val tris = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (7L, 8L), (8L, 9L), (7L, 9L)).toDF("a", "b")
    val comm = Graph.labelPropagation(tris, "a", "b", iters = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(comm == Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (7L, 7L), (8L, 7L), (9L, 7L)))
  }

  test("labelPropagation weighted: heavy edge beats count; w = 1 reduces to unweighted") {
    // node 3's neighbors: 1 and 2 (w=1 each, both labeled 1 after round 1?)
    // — use one round for a hand case: 3 sees {1 (w=1), 2 (w=1), 4 (w=3)}.
    // Unweighted: most-frequent tie among labels {1,2,4} → min label 1.
    // Weighted: label 4 carries weight 3 > 1 → 3 adopts 4.
    val e = Seq((1L, 3L, 1L), (2L, 3L, 1L), (3L, 4L, 3L)).toDF("a", "b", "w")
    val w1 = Graph.labelPropagation(e, "a", "b", iters = 1, wCol = Some("w"))
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(w1.find(_._1 == 3L).get._2 == 4L, s"weighted round: $w1")
    val u1 = Graph.labelPropagation(e.select("a", "b"), "a", "b", iters = 1)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(u1.find(_._1 == 3L).get._2 == 1L, s"unweighted round: $u1")
    // w ≡ 1 must equal the unweighted labels value-for-value
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L))
    val unw = Graph.labelPropagation(base.toDF("a", "b"), "a", "b", iters = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val unit = Graph.labelPropagation(base.map { case (a, b) => (a, b, 1L) }
        .toDF("a", "b", "w"), "a", "b", iters = 3, wCol = Some("w"))
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(unw == unit, "w = 1 weighted must reduce to the unweighted labels")
    // zero/NULL weights fail loudly, the family contract
    intercept[Exception] {
      Graph.labelPropagation(Seq((1L, 2L, 0L)).toDF("a", "b", "w"),
        "a", "b", iters = 1, wCol = Some("w")).collect()
    }
  }

  test("louvainMoveRounds: hand-replayed round on a path; convergence") {
    // path 1-2-3, 2m = 4, degrees k1 = 1, k2 = 2, k3 = 1. Round 1 from
    // singletons: node 1 blocked (only larger singleton targets, the Lu
    // et al. guard); node 2 → C=1 (gain·2m² = 4·1 − 2·(1−0) = 2 > 0;
    // C=3 blocked by the guard); node 3 → C=2 (gain 4 − 1·2 = 2 > 0).
    // Communities after one round: {1,2} and {3} (canonical labels by
    // min member: 1 and 3).
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val r1 = Graph.louvainMoveRounds(path, "a", "b", rounds = 1)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(r1 == Seq((1L, 1L), (2L, 1L), (3L, 3L)))
    // Round 2: node 3's move into {1,2} gains 4·1 − 1·(3 − 0) = 1 > 0;
    // node 2's exit to {3} gains exactly 0 (not strictly positive) —
    // the path collapses to ONE community, the Q-optimal partition of
    // a 3-path (any split scores Q < 0)
    val r3 = Graph.louvainMoveRounds(path, "a", "b", rounds = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(r3 == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("louvainMoveRounds: planted two-clique fixture recovered, Q > 0") {
    // two K4s bridged by (4, 11): the planted structure. Louvain
    // recovers exactly the two cliques; Q·4m² = 2·(4·13·6 − 13²) = 286
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 11L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val e = (k4a ++ k4b ++ Seq((4L, 11L))).toDF("a", "b")
    val lbl = Graph.louvainMoveRounds(e, "a", "b", rounds = 3)
    val got = lbl.orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == ((1L to 4L).map(_ -> 1L) ++ (11L to 14L).map(_ -> 11L)))
    val q = Graph.modularity(e, "a", "b", lbl, "node", "label")
      .collect().head
    assert(q.getLong(3) == 286L && q.getDouble(4) > 0.4)
    intercept[IllegalArgumentException] {
      Graph.louvainMoveRounds(e, "a", "b", rounds = 0)
    }
  }

  test("louvainMoveRounds: singleton swap guard blocks the 2-cycle") {
    // a single edge 1-2: without the guard both endpoints would move to
    // each other's community every round (the classic sync swap); with
    // it only 2 → 1 moves, and the pair is stable from round 1 on
    for (r <- Seq(1, 2, 3)) {
      val got = Graph.louvainMoveRounds(
        Seq((1L, 2L)).toDF("a", "b"), "a", "b", rounds = r)
        .orderBy("node").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq
      assert(got == Seq((1L, 1L), (2L, 1L)), s"rounds=$r")
    }
  }

  test("louvainCoarsen: super-graph weights and self-loops; level-2 runs") {
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 11L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val e = (k4a ++ k4b ++ Seq((4L, 11L))).toDF("a", "b")
    val lbl = Graph.louvainMoveRounds(e, "a", "b", rounds = 3)
    val sup = Graph.louvainCoarsen(e, "a", "b", lbl, "node", "label")
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDecimal(2).longValueExact())).toSeq
    // 6 intra edges per clique -> self-loops of weight 6; 1 bridge
    assert(sup == Seq((1L, 1L, 6L), (1L, 11L, 1L), (11L, 11L, 6L)))
    // level 2 on the super-graph: the two super-nodes stay separate
    // (merging them would LOWER Q: the bridge is lighter than the
    // communities), so the weighted round must make no move
    val l2 = Graph.louvainMoveRounds(
      sup.toDF("a", "b", "w").withColumn("w", col("w").cast("long")),
      "a", "b", rounds = 2, wCol = Some("w"))
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(l2 == Seq((1L, 1L), (11L, 11L)))
    // partial partitions fail loudly
    intercept[IllegalArgumentException] {
      Graph.louvainCoarsen(e, "a", "b",
        lbl.filter(col("node") =!= 14L), "node", "label").collect()
    }
  }

  test("louvain: two-level composition keeps original node ids") {
    // on the two-clique fixture level 2 must NOT merge (the bridge is
    // lighter than the communities), so the composed result equals the
    // level-1 partition — and labels stay original min members
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 11L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val e = (k4a ++ k4b ++ Seq((4L, 11L))).toDF("a", "b")
    val got = Graph.louvain(e, "a", "b", levels = 2, rounds = 3)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == ((1L to 4L).map(_ -> 1L) ++ (11L to 14L).map(_ -> 11L)))
    // a path, levels = 2: level 1 already collapses it to one community
    // and the coarsened single super-node (self-loop only) is stable
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val p = Graph.louvain(path, "a", "b", levels = 2, rounds = 3)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(p == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("louvain: weighted moves follow the HEAVY edge, against label order") {
    // two heavy pairs (1,2) and (5,6), w = 10 each; probe node 9 tied to
    // BOTH pairs. With unit weights 9's round-2 gains tie and the
    // min-label argmax sends it to community 1; weighting the 6-side
    // edge 5:1 must pull 9 into community 5 INSTEAD — membership driven
    // by weight, not label order. Hand-replay (2m = 52, k9 = 6):
    //   round 1: 2→1 (g·2m² = 52·10 − 11·10 = 410), 6→5 (410), and 9→6
    //     (C6: 52·5 − 6·15 = 170 > 0 vs C2: 52 − 6·11 < 0);
    //   round 2: 9 (singleton, label 6) vs C5 = {5,6}, Σtot = 25:
    //     g = 52·5 − 6·25 = 110 > 0; vs C1 = {1,2}, Σtot = 21:
    //     g = 52·1 − 6·21 < 0 → 9 joins {5,6}.
    val heavy6 = Seq((1L, 2L, 10L), (5L, 6L, 10L), (9L, 2L, 1L),
      (9L, 6L, 5L)).toDF("a", "b", "w")
    val got = Graph.louvain(heavy6, "a", "b", levels = 2, rounds = 2,
        wCol = Some("w"))
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (9L, 5L)))
    // flipped weights: the same replay mirrors and 9 joins {1,2}
    val heavy2 = Seq((1L, 2L, 10L), (5L, 6L, 10L), (9L, 2L, 5L),
      (9L, 6L, 1L)).toDF("a", "b", "w")
    val flipped = Graph.louvain(heavy2, "a", "b", levels = 2, rounds = 2,
        wCol = Some("w"))
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(flipped == Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (9L, 1L)))
    // unit weights on the same topology: the tie resolves by label — the
    // contrast that proves the weighted path is live end to end
    val unit = Graph.louvain(heavy6.drop("w"), "a", "b", levels = 2,
        rounds = 2)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(unit == Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (9L, 1L)))
  }

  test("pageRank weighted: hand-replayed round; w = 1 reduces to unweighted") {
    // star 1→2 (w=3), 1→3 (w=1); n = 3, r0 = 333333333333 each,
    // out-weight(1) = 4, dangling = 2·r0, tele = 50e9. Round 1:
    //   share(2) = (r0·3) div 4 = 249999999999
    //   share(3) =  r0     div 4 =  83333333333
    //   dangShare = 222222222222
    //   r1 = tele + 85·(inflow + dangShare) div 100
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRank(e, "src", "dst", iters = 1, wCol = Some("w"))
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 238888888888L), (2L, 451388888887L),
      (3L, 309722222221L)))
    // w ≡ 1 must equal the unweighted path value-for-value
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val unw = Graph.pageRank(base.toDF("src", "dst"), "src", "dst", iters = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val unit = Graph.pageRank(base.map { case (a, b) => (a, b, 1L) }
        .toDF("src", "dst", "w"), "src", "dst", iters = 3, wCol = Some("w"))
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(unw == unit, "w = 1 weighted must reduce to the unweighted ranks")
    // zero/negative weights fail loudly (a zero would NULL a division
    // and silently retire the node's whole mass)
    intercept[Exception] {
      Graph.pageRank(Seq((1L, 2L, 0L)).toDF("src", "dst", "w"),
        "src", "dst", iters = 1, wCol = Some("w")).collect()
    }
    // aggregated weight above 1e25 fails loudly instead of silently
    // NULLing the share when rank*weight overflows decimal(38,0)
    val huge = Seq((1L, 2L)).toDF("src", "dst")
      .withColumn("w", lit("1" + "0" * 26).cast("decimal(38,0)"))
    intercept[Exception] {
      Graph.pageRank(huge, "src", "dst", iters = 1, wCol = Some("w")).collect()
    }
    intercept[Exception] {
      Graph.personalizedPageRank(huge, "src", "dst",
        Seq(1L).toDF("seed"), "seed", iters = 1, wCol = Some("w")).collect()
    }
    // louvain now shares the same never-dropping w >= 1 contract
    intercept[Exception] {
      Graph.louvain(Seq((1L, 2L, 0L)).toDF("a", "b", "w"),
        "a", "b", levels = 1, rounds = 1, wCol = Some("w")).collect()
    }
  }

  test("modularityWeighted: hand-computed Q, parallel edges sum, guards") {
    // two weight-3 pairs bridged by a weight-1 edge; W = 7, weighted
    // degrees (3,4,4,3), per community S_c = 7 and w_c = 3:
    // Q·4W² = 2·(4·7·3 − 7²) = 70, Q = 70/196
    val e = Seq((1L, 2L, 3L), (3L, 4L, 3L), (2L, 3L, 1L)).toDF("a", "b", "w")
    val lbl = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)).toDF("node", "label")
    val q = Graph.modularityWeighted(e, "a", "b", "w", lbl, "node", "label")
      .collect().head
    assert((q.getLong(0), q.getLong(1), q.getLong(2), q.getLong(3)) ==
      ((4L, 7L, 2L, 70L)))
    assert(math.abs(q.getDouble(4) - 70.0 / 196.0) < 1e-15)
    // parallel edges SUM (the louvain convention): splitting the w=3
    // edges into 1+2 rows must change nothing
    val split = Seq((1L, 2L, 1L), (2L, 1L, 2L), (3L, 4L, 3L), (2L, 3L, 1L))
      .toDF("a", "b", "w")
    val q2 = Graph.modularityWeighted(split, "a", "b", "w", lbl, "node",
      "label").collect().head
    assert(q2.getLong(3) == 70L && q2.getLong(1) == 7L)
    // negative weights fail loudly; partial partitions fail loudly
    intercept[Exception] {
      Graph.modularityWeighted(Seq((1L, 2L, -1L)).toDF("a", "b", "w"),
        "a", "b", "w", lbl, "node", "label").collect()
    }
    intercept[IllegalArgumentException] {
      Graph.modularityWeighted(e, "a", "b", "w",
        lbl.filter(col("node") =!= 4L), "node", "label").collect()
    }
  }

  test("betweennessFromLandmarks: path and diamond hand-accumulation") {
    // path 1-2-3-4-5, landmark 1: σ ≡ 1, so δ telescopes 3, 2, 1, 0
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val p = Graph.betweennessFromLandmarks(path, "a", "b", Seq(1L), maxHops = 4)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(p.toSeq == Seq((2L, 1L, 3.0), (3L, 1L, 2.0), (4L, 1L, 1.0),
      (5L, 1L, 0.0)))
    // diamond 1-2, 1-3, 2-4, 3-4: from landmark 1, σ(4) = 2 so each middle
    // node carries δ = (1/2)·(1+0); landmarks 1 AND 4 double it by symmetry
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("a", "b")
    val d1 = Graph.betweennessFromLandmarks(diamond, "a", "b", Seq(1L))
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(d1.toSeq == Seq((2L, 1L, 0.5), (3L, 1L, 0.5), (4L, 1L, 0.0)))
    val d2 = Graph.betweennessFromLandmarks(diamond, "a", "b", Seq(1L, 4L))
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(d2.toSeq == Seq((1L, 1L, 0.0), (2L, 2L, 1.0), (3L, 2L, 1.0),
      (4L, 1L, 0.0)))
    // an absent landmark reaches nothing; maxHops truncates dependencies
    assert(Graph.betweennessFromLandmarks(path, "a", "b", Seq(99L))
      .count() == 0)
    val trunc = Graph.betweennessFromLandmarks(path, "a", "b", Seq(1L),
      maxHops = 2).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(trunc.toSeq == Seq((2L, 1.0), (3L, 0.0)))
  }

  test("linkPrediction: hand-scored wedges; edges excluded; cap drops centers whole") {
    // square 1-2-3-4 with diagonal 1-3 and pendant 4-5 (duplicate and
    // reversed edges plus a self-loop must collapse first):
    //   Γ(1)={2,3,4} Γ(2)={1,3} Γ(3)={1,2,4} Γ(4)={1,3,5} Γ(5)={4}
    // non-edges with shared neighbors: (2,4) via {1,3}, (1,5) and (3,5)
    // via {4}; (1,2) etc. are edges and must be anti-joined away
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (4L, 5L),
      (2L, 1L), (3L, 3L)).toDF("a", "b")
    val got = Graph.linkPrediction(e, "a", "b", minCommon = 1L)
      .orderBy("u", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // (2,4): cn=2, ra = 2·⌊1e12/3⌋; jaccard = ⌊2e12/(2+3−2)⌋
    // (1,5)/(3,5): cn=1 via deg-3 center 4; jaccard = ⌊1e12/(3+1−1)⌋
    assert(got.toSeq == Seq(
      (1L, 5L, 1L, 3L, 1L, 333333333333L, 333333333333L),
      (2L, 4L, 2L, 2L, 3L, 666666666666L, 666666666666L),
      (3L, 5L, 1L, 3L, 1L, 333333333333L, 333333333333L)))
    val strict = Graph.linkPrediction(e, "a", "b", minCommon = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(strict.toSeq == Seq((2L, 4L)))
    // maxCenterDegree = 2 on the square+diagonal: the only deg-≤2 centers
    // (2 and 4) close wedges that are EXISTING edges, so nothing survives —
    // hubs are dropped whole as centers, exactly the q217 cap discipline
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("a", "b")
    assert(Graph.linkPrediction(sq, "a", "b", maxCenterDegree = 2,
      minCommon = 1L).count() == 0)
    assert(Graph.linkPrediction(sq, "a", "b", minCommon = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 4L)))
  }
}
