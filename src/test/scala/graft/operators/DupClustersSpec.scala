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

  test("deep chain converges in O(log diameter) rounds via pointer jumping") {
    // a 50-node chain linked only consecutively: plain propagation needs 49
    // rounds; propagation + pointer jumping must collapse it logarithmically
    val pairs = (1L to 49L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (comp, rounds) = DupClusters.componentsWithRounds(pairs)
    val labels = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 50 && labels.values.forall(_ == 1L))
    assert(rounds <= 10, s"expected O(log 50) rounds, got $rounds")
  }

  test("unconverged propagation throws instead of returning wrong labels") {
    val pairs = (1L to 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      DupClusters.components(pairs, maxIters = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
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
}
