package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class RetrievalSpec extends SparkFunSuite {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark engine shuffles data across the cluster"),
    (2L, "the spark optimizer prunes columns and pushes filters"),
    (3L, "ducks swim on the quiet pond"),
    (4L, "pond ducks eat bread near the pond shore"), // 'pond' tf=2
    (5L, "")
  ).toDF("doc_id", "text")

  test("bm25TopK: query terms retrieve the right docs in the right order") {
    val queries = Seq((100L, "pond ducks"), (200L, "spark optimizer")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 3)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // qid 100: docs 3/4 match both terms (4 has pond twice but is longer);
    // qid 200: doc 2 matches both terms, doc 1 only 'spark'
    val byQuery = got.groupBy(_._1)
    assert(byQuery(100L).map(_._3).toSet == Set(3L, 4L))
    assert(byQuery(200L).map(_._3).toSeq == Seq(2L, 1L))
  }

  test("bm25TopK: self-retrieval ranks the source document first") {
    val queries = corpus.filter(col("doc_id") <= 2)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 2)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("bm25TopK plan: dl aggregates the query-reduced stream, not the full tf table") {
    val queries = Seq((100L, "pond ducks")).toDF("qid", "qtext")
    val plan = Retrieval.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 3)
      .queryExecution.executedPlan.toString
    // the doc-length derivation must semi-join tf to the matched doc ids
    // BEFORE aggregating — the only LeftSemi in this operator
    val lines = plan.split("\n")
    val semiIdx = lines.indexWhere(_.contains("LeftSemi"))
    assert(semiIdx >= 0, "dl must be reduced via a semi-join on matched doc ids")
    assert(lines.take(semiIdx).exists(l => l.contains("HashAggregate") && l.contains("sum")),
      "the dl sum must sit above (consume) the semi-joined stream")
  }

  test("bm25TopK matches a driver-side reference bit-for-bit on a random corpus") {
    val rng = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val docsSeq = (1L to 60L).map { i =>
      i -> Seq.fill(3 + rng.nextInt(15))(vocab(rng.nextInt(vocab.size)))
    }
    val queriesSeq = (101L to 105L).map { i =>
      i -> Seq.fill(2 + rng.nextInt(3))(vocab(rng.nextInt(vocab.size))).distinct
    }
    val docsDf = docsSeq.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
    val qDf = queriesSeq.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(docsDf, "doc_id", "text", qDf, "qid", "qtext", k = 8)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getDouble(3)))).toMap

    // reference: same formulas, same fold order, same ln — identical doubles
    val tf = docsSeq.map { case (id, ts) => id -> ts.groupBy(identity).map { case (t, o) => t -> o.size } }.toMap
    val dl = docsSeq.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val n = docsSeq.size.toLong
    val avgdl = dl.values.sum.toDouble / n.toDouble
    val df = docsSeq.flatMap(_._2.distinct).groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    def idf(t: String) = math.log(1.0 + (n.toDouble - df(t).toDouble + 0.5) / (df(t).toDouble + 0.5))
    for ((qid, qts) <- queriesSeq) {
      val scores = docsSeq.flatMap { case (id, _) =>
        val matched = qts.filter(t => tf(id).contains(t)).sorted
        if (matched.isEmpty) None
        else Some(id -> matched.foldLeft(0.0) { (acc, t) =>
          acc + idf(t) * (tf(id)(t).toDouble * (1.2 + 1.0)) /
            (tf(id)(t).toDouble + 1.2 * (0.25 + 0.75 * dl(id).toDouble / avgdl))
        })
      }
      val want = scores.sortBy { case (id, s) => (-s, id) }.take(8)
      want.zipWithIndex.foreach { case ((id, s), i) =>
        val (gotId, gotScore) = got((qid, i + 1))
        assert(gotId == id, s"q$qid rank ${i + 1}: got doc $gotId want $id")
        assert(gotScore == BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          || math.abs(gotScore - s) < 5e-5, s"q$qid rank ${i + 1}: got $gotScore want $s")
      }
    }
  }

  test("bm25TopK: deterministic across recomputation; empty query matches nothing") {
    val queries = Seq((1L, "spark data"), (2L, "")).toDF("qid", "qtext")
    val a = Retrieval.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 5)
    val b = Retrieval.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 5)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    assert(a.filter(col("qid") === 2L).count() == 0)
  }

  test("bm25TopKFromTf over a shared tfTable is value-identical") {
    val queries = Seq((100L, "pond ducks"), (200L, "spark optimizer")).toDF("qid", "qtext")
    val shared = TextAnalysis.tfTable(corpus, "doc_id", "text")
    val a = Retrieval.bm25TopK(corpus, "doc_id", "text", queries, "qid", "qtext", k = 3)
      .orderBy("qid", "rank").collect().toSeq
    val b = Retrieval.bm25TopKFromTf(shared, "doc_id", queries, "qid", "qtext", k = 3)
      .orderBy("qid", "rank").collect().toSeq
    assert(a === b)
  }

  // --- rrfFuse -------------------------------------------------------------

  private def ranking(rows: (Long, Long, Int)*) =
    rows.toSeq.toDF("qid", "doc_id", "rank")

  test("rrfFuse: hand-computed scores, tie-break by id, n_lists accounting") {
    val lex = ranking((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
    val sem = ranking((1L, 20L, 1), (1L, 10L, 2), (1L, 40L, 3))
    val got = Retrieval.rrfFuse(Seq(lex, sem), "qid", "doc_id", "rank", k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    def rrf(rs: Double*) = {
      val raw = rs.foldLeft(0.0)((a, r) => a + 1.0 / (60.0 + r))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // docs 10 and 20 have the exact same contributions (1/61 + 1/62, IEEE
    // addition is commutative) — the tie MUST break id asc. 30/40 appear in
    // one list each at the same rank — same tie rule.
    assert(got.toSeq == Seq(
      (1, 10L, rrf(1, 2), 2), (2, 20L, rrf(2, 1), 2),
      (3, 30L, rrf(3), 1), (4, 40L, rrf(3), 1)))
  }

  test("rrfFuse: permuting the input list order does not change the fusion") {
    val a = ranking((1L, 10L, 1), (1L, 20L, 2), (2L, 30L, 1))
    val b = ranking((1L, 20L, 1), (1L, 40L, 2), (2L, 30L, 2))
    val c = ranking((1L, 10L, 2), (2L, 50L, 1))
    def run(ls: Seq[org.apache.spark.sql.DataFrame]) =
      Retrieval.rrfFuse(ls, "qid", "doc_id", "rank", k = 10)
        .orderBy("qid", "rank").collect().toSeq
    assert(run(Seq(a, b, c)) == run(Seq(c, a, b)))
    assert(run(Seq(a, b, c)) == run(Seq(b, c, a)))
  }

  test("rrfFuse: a doc repeated within one list counts once, at its best rank") {
    val dup = ranking((1L, 10L, 3), (1L, 10L, 1), (1L, 20L, 2))
    val got = Retrieval.rrfFuse(Seq(dup), "qid", "doc_id", "rank", k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getInt(4)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq((10L, r6(1.0 / 61.0), 1), (20L, r6(1.0 / 62.0), 1)))
  }

  test("rrfFuse: null or non-positive rank fails fast instead of dropping the doc") {
    val bad = Seq((1L, 10L, Some(1)), (1L, 20L, None))
      .toDF("qid", "doc_id", "rank")
    val e = intercept[Exception] {
      Retrieval.rrfFuse(Seq(bad), "qid", "doc_id", "rank", k = 10).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("non-positive rank"))))
    val zero = ranking((1L, 10L, 0))
    val e2 = intercept[Exception] {
      Retrieval.rrfFuse(Seq(zero), "qid", "doc_id", "rank", k = 10).collect()
    }
    assert(chain(e2).exists(c =>
      Option(c.getMessage).exists(_.contains("non-positive rank"))))
  }

  test("rrfFuse: non-integral id column is rejected up front") {
    val strIds = Seq((1L, "a", 1)).toDF("qid", "doc_id", "rank")
    val e = intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(strIds), "qid", "doc_id", "rank", k = 10)
    }
    assert(e.getMessage.contains("must be integral"))
  }

  // ---- rboAtK ----

  test("rboAtK: identical rankings score the exact truncated-sum maximum") {
    val a = ranking((1 to 10).map(r => (1L, 100L + r, r)): _*)
    val out = Retrieval.rboAtK(a, a, "qid", "doc_id", "rank", k = 10, p = 0.9)
      .collect().head.getDouble(1)
    // replay the operator's own arithmetic: X_d = d at every depth
    val (pows, scale) = Retrieval.rboLiterals(10, 0.9)
    val expected = pows.zipWithIndex
      .map { case (pw, i) => pw * (i + 1).toDouble / (i + 1).toDouble }
      .foldLeft(0.0)(_ + _) * scale
    assert(out == expected)
    assert(math.abs(out - (1.0 - math.pow(0.9, 10))) < 1e-12)
  }

  test("rboAtK: hand-computed swap at k=2, p=0.5") {
    // A: (d1,r1),(d2,r2); B swapped -> X_1 = 0, X_2 = 2
    // terms: 0.5*0/1 = 0, 0.25*2/2 = 0.25; scale (1-p)/p = 1 -> 0.25
    val a = ranking((1L, 1L, 1), (1L, 2L, 2))
    val b = ranking((1L, 2L, 1), (1L, 1L, 2))
    val out = Retrieval.rboAtK(a, b, "qid", "doc_id", "rank", k = 2, p = 0.5)
      .collect().head.getDouble(1)
    assert(out == 0.25)
  }

  test("rboAtK: disjoint rankings and one-sided queries emit 0.0, never drop") {
    val a = ranking((1L, 1L, 1), (2L, 5L, 1))
    val b = ranking((1L, 9L, 1), (3L, 7L, 1))
    val out = Retrieval.rboAtK(a, b, "qid", "doc_id", "rank", k = 3, p = 0.9)
      .orderBy("qid").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((1L, 0.0), (2L, 0.0), (3L, 0.0)))
  }

  test("rboAtK: ranks outside 1..k are ignored; bad arguments reject") {
    val a = ranking((1L, 1L, 1), (1L, 2L, 11), (1L, 3L, 0))
    val b = ranking((1L, 1L, 1), (1L, 2L, 2))
    val withJunk = Retrieval.rboAtK(a, b, "qid", "doc_id", "rank", k = 10)
      .collect().head.getDouble(1)
    val clean = Retrieval.rboAtK(ranking((1L, 1L, 1)), b,
      "qid", "doc_id", "rank", k = 10).collect().head.getDouble(1)
    assert(withJunk == clean)
    intercept[IllegalArgumentException] {
      Retrieval.rboAtK(a, b, "qid", "doc_id", "rank", k = 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.rboAtK(a, b, "qid", "doc_id", "rank", k = 5, p = 1.0)
    }
  }

  test("ndcgAtK: hand-computed DCG/IDCG, unjudged gain 0, perfect ranking = 1") {
    def disc(i: Int) = 1.0 / (math.log(i + 1.0) / math.log(2.0))
    val ranked = Seq(
      // q1: judged docs at ranks 1 and 3; rank 2 unjudged (gain 0)
      (1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3),
      // q2: the ideal order itself
      (2L, 20L, 1), (2L, 21L, 2)
    ).toDF("qid", "doc_id", "rank")
    val rels = Seq(
      (1L, 10L, 1.0), (1L, 11L, 3.0), (1L, 12L, 2.0), // 12 never retrieved
      (2L, 20L, 2.0), (2L, 21L, 1.0),
      (3L, 30L, 0.0) // zero-only judgments → query absent
    ).toDF("qid", "doc_id", "rel")
    val got = Retrieval.ndcgAtK(ranked, "qid", "doc_id", "rank", rels, "rel", 3)
      .orderBy("qid").collect()
    assert(got.length == 2, "q3 has nothing to normalize by")
    val dcg1 = 1.0 * disc(1) + 3.0 * disc(3)
    val idcg1 = 3.0 * disc(1) + 2.0 * disc(2) + 1.0 * disc(3)
    assert(got(0).getDouble(1) == dcg1 && got(0).getDouble(2) == idcg1)
    assert(got(0).getDouble(3) == dcg1 / idcg1)
    assert(got(1).getDouble(3) == 1.0, "retrieving the ideal order is nDCG 1")
    // a query judged but never retrieved scores 0
    val empty = Retrieval.ndcgAtK(ranked.filter($"qid" === 2L), "qid",
      "doc_id", "rank", rels, "rel", 3).orderBy("qid").collect()
    assert(empty(0).getDouble(1) == 0.0 && empty(0).getDouble(3) == 0.0)
    intercept[IllegalArgumentException] {
      Retrieval.ndcgAtK(ranked, "qid", "doc_id", "rank", rels, "rel", 0)
    }
  }

  test("reciprocalRankAtK: first-hit rank, judged miss at 0.0, cutoff") {
    val ranked = Seq((1L, 11L, 1), (1L, 12L, 2), (1L, 13L, 3),
      (2L, 21L, 1), (2L, 22L, 2)).toDF("qid", "doc_id", "rank")
    val rels = Seq((1L, 13L, 1.0), (1L, 12L, 0.5), (1L, 99L, 1.0),
      (2L, 77L, 1.0), (3L, 5L, 0.0)).toDF("qid", "doc_id", "rel")
    val got = Retrieval.reciprocalRankAtK(ranked, "qid", "doc_id",
        "rank", rels, "rel", 3)
      .orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getDouble(3))).toSeq
    // q1: first relevant retrieved is doc 12 at rank 2 (rel 0.5 counts —
    // binary collapse); q2 judged but missed -> NULL rank, rr 0.0;
    // q3's only judgment is rel 0 -> absent
    assert(got == Seq((1L, 3L, Some(2L), 0.5), (2L, 1L, None, 0.0)))
    // cutoff k=1 drops q1's rank-2 hit -> miss
    val g1 = Retrieval.reciprocalRankAtK(ranked, "qid", "doc_id",
      "rank", rels, "rel", 1).orderBy("qid").collect()
    assert(g1(0).isNullAt(2) && g1(0).getDouble(3) == 0.0)
    intercept[IllegalArgumentException] {
      Retrieval.reciprocalRankAtK(ranked, "qid", "doc_id", "rank",
        rels, "rel", 0)
    }
  }

  test("averagePrecisionAtK: hand-computed AP, zero hits, cutoff, grades") {
    // q1 ranked docs 11..15 at ranks 1..5; relevant {11, 13, 15, 99}
    // (99 unretrieved): hits at ranks 1,3,5 → TP/rank = 1/1, 2/3, 3/5
    // folded in rank order; AP@5 = (1 + 2/3 + 3/5)/min(4,5)
    val ranked = Seq((1L, 11L, 1), (1L, 12L, 2), (1L, 13L, 3),
      (1L, 14L, 4), (1L, 15L, 5),
      (2L, 21L, 1), (2L, 22L, 2)).toDF("qid", "doc_id", "rank")
    val rels = Seq((1L, 11L, 1.0), (1L, 13L, 0.5), (1L, 15L, 2.0),
      (1L, 99L, 1.0), (2L, 77L, 1.0), (3L, 5L, 0.0))
      .toDF("qid", "doc_id", "rel")
    val got = Retrieval.averagePrecisionAtK(ranked, "qid", "doc_id",
        "rank", rels, "rel", 5)
      .orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val want1 = ((0.0 + 1.0 / 1.0) + 2.0 / 3.0 + 3.0 / 5.0) / 4.0
    // q2 has judgments but no hits → 0.0; q3's only judgment is rel 0
    // (not relevant) → absent entirely
    assert(got == Seq((1L, 4L, 3L, want1), (2L, 1L, 0L, 0.0)))
    // cutoff: at k = 2 only the rank-1 hit counts, normalizer min(4,2)
    val g2 = Retrieval.averagePrecisionAtK(ranked, "qid", "doc_id",
      "rank", rels, "rel", 2).orderBy("qid").collect()
    assert(g2(0).getDouble(3) == (1.0 / 1.0) / 2.0)
    // perfect ranking: all top-k relevant → AP exactly 1
    val perfect = Retrieval.averagePrecisionAtK(ranked.filter($"qid" === 1L),
      "qid", "doc_id", "rank",
      Seq((1L, 11L, 1.0), (1L, 12L, 1.0)).toDF("qid", "doc_id", "rel"),
      "rel", 2).head
    assert(perfect.getDouble(3) == 1.0)
    intercept[IllegalArgumentException] {
      Retrieval.averagePrecisionAtK(ranked, "qid", "doc_id", "rank",
        rels, "rel", 0)
    }
  }

  test("mmrSelect: diversity beats a duplicate; ties to smaller id; early stop") {
    // ids 1 and 2 are IDENTICAL vectors (a near-dup cluster), id 3 is the
    // diverse neighbor. Pure top-3 by relevance returns 1, 2, 3; MMR must
    // pick 1 (tie with 2 breaks to the smaller id), then 3 (the duplicate's
    // sim-to-picked of exactly 1.0 crushes its margin), then 2.
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.8f, 0.6f))).toDF("vec_id", "embedding")
    val q = Seq((100L, Seq(1.0f, 0.2f))).toDF("query_id", "query_vec")
    val got = Retrieval.mmrSelect(corpus, "vec_id", "embedding", q,
        k = 3, shortlistN = 3, lambda = 0.5)
      .orderBy("pick").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(x => (x._1, x._2)).toSeq == Seq((1, 1L), (2, 3L), (3, 2L)))
    // pick 1's mmr is exactly λ·rel; the duplicate's round-3 mmr replays
    // λ·rel − (1−λ)·1.0 (its max-sim is the identical vector it lost to)
    assert(got(0)._4 == 0.5 * got(0)._3)
    assert(got(2)._4 == 0.5 * got(2)._3 - 0.5 * 1.0)
    // k beyond the candidate set stops early instead of inventing rows
    val short = Retrieval.mmrSelect(corpus, "vec_id", "embedding", q,
      k = 5, shortlistN = 5, lambda = 0.5)
    assert(short.count() == 3)
    intercept[IllegalArgumentException] {
      Retrieval.mmrSelect(corpus, "vec_id", "embedding", q,
        k = 4, shortlistN = 3)
    }
  }
}
