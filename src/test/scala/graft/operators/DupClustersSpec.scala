package graft.operators

import graft.SparkFunSuite

class DupClustersSpec extends SparkFunSuite {
  import spark.implicits._

  test("components: chains and separate clusters resolve to min-id labels") {
    // 1-2-3 chained, 5-6 pair, 9 untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val comp = DupClusters.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("components converge on a long chain (diameter > 2)") {
    val pairs = (1L to 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = DupClusters.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.values.toSet == Set(1L))
    assert(comp.size == 10)
  }

  test("resolve keeps one representative per cluster plus untouched rows") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (5L, "b"), (6L, "b"), (9L, "c"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = DupClusters.resolve(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 5L, 9L))
  }

  test("resolve keeps a survivor when the cluster's min id is absent from df") {
    val docs = Seq((2L, "a"), (3L, "a")).toDF("doc_id", "text") // doc 1 deleted upstream
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = DupClusters.resolve(docs, "doc_id", pairs).collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(2L), "min PRESENT id survives; cluster must not vanish")
  }

  test("components works on string ids (no silent numeric cast)") {
    val pairs = Seq(("doc-001", "doc-002"), ("doc-002", "doc-003")).toDF("id_a", "id_b")
    val comp = DupClusters.components(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comp == Map("doc-001" -> "doc-001", "doc-002" -> "doc-001", "doc-003" -> "doc-001"))
  }

  test("10k-node path graph converges in <= 2*log2(n) star rounds") {
    // the adversarial shape for any label-propagation scheme: one
    // component of diameter n-1. Large-star/small-star (Kiveris et al.
    // 2014) must collapse it logarithmically — 2*log2(10000) ≈ 26.6
    val n = 10000L
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
      .repartition(8)
    val (comp, rounds) = DupClusters.componentsWithRounds(pairs)
    val labels = comp.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == n && labels.forall(_._2 == 1L))
    val bound = 2 * math.ceil(math.log(n.toDouble) / math.log(2)).toInt
    assert(rounds <= bound, s"expected <= $bound star rounds for a $n-path, got $rounds")
  }

  test("self-pair singletons keep their label row") {
    val pairs = Seq((1L, 2L), (7L, 7L)).toDF("id_a", "id_b")
    val comp = DupClusters.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }

  test("unconverged star rewriting throws instead of returning wrong labels") {
    // one large+small round shrinks a path's diameter by a constant
    // factor, so a 200-node path cannot reach the star forest in one
    val pairs = (1L to 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      DupClusters.components(pairs, maxIters = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("random graphs: labels match a reference union-find exactly") {
    // 300 nodes, random edges at three densities straddling the
    // percolation threshold (many tiny components / a few mid-size / one
    // giant + isolates) — the shapes that stress different round counts
    val rng = new scala.util.Random(83)
    for (nEdges <- Seq(60, 300, 1200)) {
      val edges = Seq.fill(nEdges)((rng.nextInt(300).toLong, rng.nextInt(300).toLong))
      val pairs = edges.toDF("id_a", "id_b")
      // reference: path-compressed union-find, min id as representative
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(x => x -> find(x)).toMap
      val got = DupClusters.components(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"nEdges=$nEdges")
    }
  }

  test("end-to-end: minhash pairs -> clusters -> deduplicated corpus") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
    val docs = Seq(
      (10L, base), (11L, base), (12L, base.replace("lazy", "sleepy")),
      (20L, "completely different content about spark engines " * 5)
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .select("id_a", "id_b")
    val kept = DupClusters.resolve(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).sorted
    assert(kept.contains(20L))
    assert(kept.contains(10L))
    assert(!kept.contains(11L), "exact dup must be dropped")
  }

  test("resolveBest keeps the highest-scored member; ties break to the lower id") {
    val docs = Seq(
      (1L, 10.0), (2L, 30.0), (3L, 20.0),   // cluster {1,2,3}: best = 2
      (5L, 7.0), (6L, 7.0),                 // cluster {5,6}: tie -> 5
      (9L, 1.0)).toDF("doc_id", "score")    // untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = DupClusters.resolveBest(docs, "doc_id", pairs, "score")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 5L, 9L), s"got $kept")
    // the min-id rule would have kept 1 — the rules genuinely differ
    val minId = DupClusters.resolve(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(minId == Seq(1L, 5L, 9L))
    // absent best-id cluster members: only present rows compete
    val partial = DupClusters.resolveBest(
      docs.filter($"doc_id" =!= 2L), "doc_id", pairs, "score")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(partial == Seq(3L, 5L, 9L), s"highest PRESENT score survives: $partial")
    intercept[IllegalArgumentException] {
      DupClusters.resolveBest(docs, "doc_id", pairs, "nope")
    }
  }
}
