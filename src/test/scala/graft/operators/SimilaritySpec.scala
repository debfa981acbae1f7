package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkFunSuite {
  import spark.implicits._

  test("cosine/dot/norm column functions on known vectors") {
    val df = Seq((Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(1.0f, 2.0f, 2.0f), Array(1.0f, 2.0f, 2.0f))).toDF("a", "b")
    val rows = df.select(
      VectorFunctions.dot($"a", $"b").as("dot"),
      VectorFunctions.l2Norm($"a").as("na"),
      VectorFunctions.cosine($"a", $"b").as("cos")).collect()
    assert(rows(0).getDouble(0) == 0.0 && rows(0).getDouble(2) == 0.0)
    assert(rows(1).getDouble(1) == 3.0 && math.abs(rows(1).getDouble(2) - 1.0) < 1e-12)
  }

  test("brute force top-k returns self as rank 1 and respects k") {
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val q = t.embeddings.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val topk = Similarity.bruteForceTopK(t.embeddings, "vec_id", "embedding", q, 5)
    val rows = topk.collect()
    assert(rows.length == 15)
    val rank1 = rows.filter(_.getAs[Int]("rank") == 1)
    rank1.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id"),
        "unit-norm self-similarity must rank first")
    }
  }

  test("signBits packs sign bits 64-per-long; hammingTopK self-rank-1 and full-shortlist == brute force") {
    // hand-checked packing: 66 dims -> 2 words; negatives clear the bit,
    // zero counts as positive (the fixed engine-agnostic rule)
    val v = Array.tabulate(66)(i => if (i == 1 || i == 65) -1.0f else if (i == 2) 0.0f else 1.0f)
    val bits = Seq(Tuple1(v)).toDF("v")
      .select(Similarity.signBits($"v").as("b")).collect()(0).getSeq[Long](0)
    assert(bits.length == 2)
    assert(bits(0) == (-1L ^ (1L << 1)), s"word0 ${bits(0)}")
    assert(bits(1) == 1L, s"word1 ${bits(1)} — bit 65 (-1) clear, bit 64 (+1) set")
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val q = t.embeddings.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val bq = Similarity.hammingTopK(t.embeddings, "vec_id", "embedding", q, k = 5)
    bq.filter($"rank" === 1).collect().foreach { r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id"),
        "self has Hamming 0 and cosine 1 — must rank first")
    }
    // a shortlist covering the whole corpus degrades to exact brute force
    val n = t.embeddings.count().toInt
    val all = Similarity.hammingTopK(t.embeddings, "vec_id", "embedding", q,
      k = 5, shortlistFactor = n)
    val exact = Similarity.bruteForceTopK(t.embeddings, "vec_id", "embedding", q, 5)
    assert(all.collect().map(_.toString).sorted.toSeq ==
      exact.collect().map(_.toString).sorted.toSeq)
    intercept[IllegalArgumentException] {
      Similarity.hammingTopK(t.embeddings, "vec_id", "embedding", q, 5, 0)
    }
  }

  test("JL serving composition: projection preserves identical vectors' rank-1") {
    // the q323 composition's invariant an oracle can't state: a vector
    // projected with the q117 primitive still retrieves ITSELF at rank 1
    // (projection is a function, so equal inputs stay equal), and scaling
    // a vector by 2 leaves its projected COSINE neighbors unchanged
    // (projection is linear; ±1 entries and /√k scale exactly)
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Array(4.0f, 3.0f, 2.0f, 1.0f)),
      (2L, Array(2.0f, 4.0f, 6.0f, 8.0f)), // 2 × vec 0
      (3L, Array(-1.0f, 5.0f, 0.5f, 2.0f))).toDF("vec_id", "v")
    val pv = VectorFunctions.randomProjectSigns(col("v"), 4, 4)
    val corpus = vecs.select(col("vec_id"), pv.as("pvec"))
    val queries = vecs.select(col("vec_id").as("query_id"),
      pv.as("query_vec"))
    val top = Similarity.bruteForceTopK(corpus, "vec_id", "pvec", queries, 2)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    // self or an exact scalar multiple ties at cosine 1 (ties → min id)
    assert(top((0L, 1)) == 0L && top((1L, 1)) == 1L && top((3L, 1)) == 3L)
    assert(top((2L, 1)) == 0L) // cosine(P(2v), P(v)) = 1, tie to id 0
  }

  test("hardNegatives: same-label rows never surface, ranking and k respected") {
    // 2-D fixture: query (1,0) label 0; same-label near-twin (would be
    // rank 1 if labels were ignored), plus three label-1 rows at known
    // cosines 1 > 0.8944 > 0 and one label-2 row between them
    val corpus = Seq(
      (10L, Array(0.99f, 0.01f), 0),  // same label — must be excluded
      (11L, Array(2.0f, 0.0f), 1),    // cos = 1.0
      (12L, Array(1.0f, 0.5f), 1),    // cos ≈ 0.8944
      (13L, Array(0.0f, 1.0f), 1),    // cos = 0.0
      (14L, Array(1.0f, 0.2f), 2)     // cos ≈ 0.9806
    ).toDF("vec_id", "embedding", "label")
    val q = Seq((1L, Array(1.0f, 0.0f), 0)).toDF("query_id", "query_vec", "query_label")
    val out = Similarity.hardNegatives(corpus, "vec_id", "embedding", "label", q, 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(11L, 14L, 12L))
    assert(out.forall(_.getAs[Int]("neighbor_label") != 0),
      "a same-label neighbor is a positive, not a negative")
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    assert(out.head.getAs[Double]("score") == 1.0)
  }

  test("hardNegatives plan: queries broadcast; label filter sits below the top-k shuffle") {
    val corpus = Seq((10L, Array(1.0f, 0.0f), 0), (11L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val q = Seq((1L, Array(1.0f, 0.0f), 0)).toDF("query_id", "query_vec", "query_label")
    val plan = Similarity.hardNegatives(corpus, "vec_id", "embedding", "label", q, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query side must broadcast:\n$plan")
    // the label inequality must appear as a join condition / filter, and
    // only ONE exchange (the window's) may sit above the scoring join
    assert(plan.contains("NOT (neighbor_label"), s"label filter missing:\n$plan")
  }

  test("LSH top-k: self lands in its own bucket; results subset of brute-force ordering") {
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val q = t.embeddings.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val ann = Similarity.lshTopK(t.embeddings, "vec_id", "embedding", q, 10, planes = 4)
      .collect()
    // every query finds at least itself (identical vector -> identical bucket)
    val byQuery = ann.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 5)
    byQuery.foreach { case (qid, rows) =>
      assert(rows.exists(r => r.getAs[Long]("neighbor_id") == qid))
      // scores are descending by rank
      val sorted = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH recall against brute force is reasonable at few planes") {
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val q = t.embeddings.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val exact = Similarity.bruteForceTopK(t.embeddings, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ann = Similarity.lshTopK(t.embeddings, "vec_id", "embedding", q, 10, planes = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall collapsed: $recall") // 2 planes = 4 buckets
  }

  test("multiprobe LSH: candidate superset of single-probe, recall never lower, gains on real data") {
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val q = t.embeddings.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairSet(Similarity.bruteForceTopK(t.embeddings, "vec_id", "embedding", q, 10))
    // UNRANKED candidate sets: compare at k = corpus size so the window
    // never cuts — multiprobe candidates must contain every single-probe one
    val singleAll = pairSet(Similarity.lshTopK(
      t.embeddings, "vec_id", "embedding", q, 100000, planes = 4))
    val multiAll = pairSet(Similarity.lshTopKMultiprobe(
      t.embeddings, "vec_id", "embedding", q, 100000, planes = 4))
    assert(singleAll.subsetOf(multiAll), "multiprobe lost a single-probe candidate")
    assert(multiAll.size > singleAll.size,
      "Hamming-1 probes surfaced no extra candidates on the sf0.001 corpus (vacuous test)")
    // top-k recall vs brute force can only improve
    val singleRecall = (exact intersect pairSet(Similarity.lshTopK(
      t.embeddings, "vec_id", "embedding", q, 10, planes = 4))).size
    val multiRecall = (exact intersect pairSet(Similarity.lshTopKMultiprobe(
      t.embeddings, "vec_id", "embedding", q, 10, planes = 4))).size
    assert(multiRecall >= singleRecall, s"multiprobe recall $multiRecall < single $singleRecall")
    // every query still finds itself at rank 1 (home bucket is probed)
    val m = Similarity.lshTopKMultiprobe(t.embeddings, "vec_id", "embedding", q, 10, planes = 4)
      .filter($"rank" === 1).collect()
    m.foreach(r => assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id")))
  }

  test("cosineNearDupPairs exact baseline finds planted duplicate vectors") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.999f, 0.04f, 0.0f, 0.0f)), // near dup of 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairsExact(vecs, "vec_id", "embedding", 0.95)
      .collect()
    assert(pairs.length == 1)
    assert((pairs.head.getLong(0), pairs.head.getLong(1)) == (0L, 1L))
    assert(pairs.head.getAs[Double]("score") > 0.99)
  }

  test("blocked path finds every identical copy and never invents a pair") {
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val emb = t.embeddings.select($"vec_id", $"embedding")
    val n = emb.count()
    val corpus = emb.unionByName(
      emb.select(($"vec_id" + 1000000L).as("vec_id"), $"embedding"))
    val blocked = Similarity.cosineNearDupPairsBlocked(corpus, "vec_id", "embedding",
      threshold = 0.999).collect()
    assert(blocked.length == n,
      "identical copies share their source's bucket by construction — all must pair")
    assert(blocked.forall(r => r.getLong(1) == r.getLong(0) + 1000000L))
  }

  test("blocked candidates are a subset of the exact pair set") {
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val emb = t.embeddings.select($"vec_id", $"embedding")
    val exact = Similarity.cosineNearDupPairsExact(emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blk = Similarity.cosineNearDupPairsBlocked(emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blk.subsetOf(exact), s"blocked invented pairs: ${blk diff exact}")
  }

  test("centroids: element-wise means per group, decimal-exact") {
    val df = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 6.0f)), (1, Array(5.0f, 5.0f))
    ).toDF("label", "embedding")
    val out = Similarity.centroids(df, "label", "embedding")
      .orderBy("label", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(out == Seq((0, 0, 2.0, 2L), (0, 1, 4.0, 2L), (1, 0, 5.0, 1L), (1, 1, 5.0, 1L)))
  }

  test("blocked plan joins on the LSH bucket, never a constant key") {
    val vecs = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // the analyzed plan keeps the bucket projection visible (the physical
    // plan folds literals into LocalTableScan for in-memory relations)
    val exactPlan = Similarity.cosineNearDupPairsExact(vecs, "vec_id", "embedding", 0.9)
      .queryExecution.analyzed.toString
    val blockedPlan = Similarity.cosineNearDupPairsBlocked(vecs, "vec_id", "embedding", 0.9)
      .queryExecution.analyzed.toString
    // the exact variant's all-pairs-through-one-partition shape is the
    // `0 AS bucket` constant key; the blocked plan must not contain it
    assert(exactPlan.contains("0 AS bucket"),
      "exact baseline is expected to carry the constant bucket")
    assert(!blockedPlan.contains("0 AS bucket"),
      "blocked path must derive the join key from the vector, not a constant")
  }

  test("standardizeDims: closed-form z-scores; zero-variance dim emits 0") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 7.0f)),
      (2L, Array(3.0f, 4.0f, 7.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.standardizeDims(df, "vec_id", "embedding")
      .orderBy("vec_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    // dims 0/1: mean 2 resp. 3, population std 1 -> z = ±1; dim 2 constant -> 0
    assert(got.toSeq == Seq(
      (1L, 0, -1.0), (1L, 1, -1.0), (1L, 2, 0.0),
      (2L, 0, 1.0), (2L, 1, 1.0), (2L, 2, 0.0)))
  }

  test("bruteForceTopK plan: queries broadcast, corpus side never shuffles before scoring") {
    // q27's documented oracle-baseline shape (pinned after a one-round
    // bench wobble that turned out to be noise): query side broadcast into
    // a nested-loop cross join, map-side scoring, ONE exchange for the
    // per-query top-k window — never a shuffled join of the corpus
    val corpus = (1L to 100L).map(i => (i, Array.fill(4)(i.toFloat))).toDF("vec_id", "embedding")
    val q = corpus.limit(3).select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val plan = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "the query side must broadcast")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "the corpus must not shuffle into the scoring join")
  }

  test("standardizeDims plan: stats come back via broadcast, never a sort-merge join") {
    val df = (1L to 50L).map(i => (i, Array.fill(4)(i.toFloat / 100))).toDF("vec_id", "embedding")
    val plan = Similarity.standardizeDims(df, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "dims-sized stats must broadcast back to the exploded stream")
    assert(!plan.contains("SortMergeJoin"),
      "a sort-merge join here would shuffle the data stream for a dims-sized table")
  }

  test("standardizeDims matches naive population z-score within quantization error") {
    val rng = new scala.util.Random(5)
    val df = (1L to 200L).map(i =>
      (i, Array.fill(8)((rng.nextFloat() - 0.5f) * 0.8f))).toDF("vec_id", "embedding")
    val got = Similarity.standardizeDims(df, "vec_id", "embedding")
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(3))).toMap
    // naive reference on the driver
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    for (d <- 0 until 8) {
      val vs = rows.map(_._2(d).toDouble)
      val mean = vs.sum / vs.length
      val std = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / vs.length)
      rows.foreach { case (id, vec) =>
        val want = (vec(d) - mean) / std
        assert(math.abs(got((id, d)) - want) < 1e-3,
          s"id=$id d=$d got=${got((id, d))} want=$want")
      }
    }
  }

  test("recallAtK: hand-built hits/misses, missing query scores 0, self-recall is 1") {
    val exact = Seq((1L, 10L), (1L, 20L), (1L, 30L), (1L, 40L),
      (2L, 10L), (2L, 50L), (3L, 60L)).toDF("query_id", "neighbor_id")
    // q1: 2/4 hit (one wrong, one extra-only); q2: 2/2; q3: absent -> 0
    val approx = Seq((1L, 10L), (1L, 30L), (1L, 99L), (2L, 10L), (2L, 50L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.recallAtK(approx, exact)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 4L, 0.5), (2L, 2L, 2L, 1.0), (3L, 0L, 1L, 0.0)))
    val self = Similarity.recallAtK(exact, exact).collect()
    assert(self.forall(_.getDouble(3) == 1.0))
  }

  test("recallAtK: full-probe IVF vs brute force on the fixture is exactly 1.0") {
    val t = graft.sources.Tables(spark, "/root/testdata/sf0.001")
    val q = t.embeddings.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val exact = Similarity.bruteForceTopK(t.embeddings, "vec_id", "embedding", q, 5)
    val approx = IvfIndex.topK(t.embeddings, "vec_id", "embedding", q, k = 5,
      nCells = 8, nProbe = 8)
    val got = Similarity.recallAtK(approx, exact).collect()
    assert(got.length == 4 && got.forall(r =>
      r.getLong(1) == 5L && r.getLong(2) == 5L && r.getDouble(3) == 1.0))
  }

  test("itemNeighbors: hand jaccards, basket cap, minCo floor, tie order") {
    val df = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (2L, "B"), // dup interaction collapses
      (3L, "B"), (3L, "C"),
      // firehose basket of 4 > maxBasket=3: dropped whole
      (4L, "A"), (4L, "B"), (4L, "C"), (4L, "D"))
      .toDF("u", "i")
    // capped sets: A={1,2} B={1,2,3} C={1,3}; co: AB=2, BC=2, AC=1(cut)
    // jaccard: AB = 2/(2+3-2) = 2/3; BC = 2/(3+2-2) = 2/3
    // B's neighbors tie at 2/3 -> A before C by id
    val got = Similarity.itemNeighbors(df, "u", "i", k = 2, minCo = 2L,
        maxBasket = 3)
      .orderBy("item", "rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == Seq(
      ("A", 1, "B", 2L, 2.0 / 3.0),
      ("B", 1, "A", 2L, 2.0 / 3.0), ("B", 2, "C", 2L, 2.0 / 3.0),
      ("C", 1, "B", 2L, 2.0 / 3.0)))
    intercept[IllegalArgumentException] {
      Similarity.itemNeighbors(df, "u", "i", k = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.itemNeighbors(df, "u", "i", maxBasket = 1)
    }
  }

  test("associationRules: hand support/confidence/lift, cap, minCo") {
    val df = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (2L, "B"), // dup interaction collapses
      (3L, "A"), (3L, "B"),
      (4L, "C"), (4L, "D"),
      // firehose basket of 5 > maxBasket=4: dropped whole
      (5L, "A"), (5L, "B"), (5L, "C"), (5L, "D"), (5L, "E"))
      .toDF("u", "i")
    // kept baskets: 1{A,B,C} 2{A,B} 3{A,B} 4{C,D}; N=4
    // counts: A=3 B=3 C=2 D=1; co(A,B)=3, co(A,C)=1, co(B,C)=1, co(C,D)=1
    // minCo=2 keeps only the two A/B directions
    val got = Similarity.associationRules(df, "u", "i", minCo = 2L,
        maxBasket = 4)
      .orderBy("antecedent", "consequent").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8))).toSeq
    val lift = 3.0 * 4.0 / (3.0 * 3.0)
    assert(got == Seq(
      ("A", "B", 3L, 3L, 3L, 4L, 3.0 / 4.0, 1.0, lift),
      ("B", "A", 3L, 3L, 3L, 4L, 3.0 / 4.0, 1.0, lift)))
    intercept[IllegalArgumentException] {
      Similarity.associationRules(df, "u", "i", minCo = 0L)
    }
  }

  test("powerIterationTop: hand-replayed integer rounds converge to e1") {
    // XtX = [[8,0],[0,1]]: dominant direction is e1; the minor
    // component decays by the eigenvalue ratio 1/8 each round
    val emb = Seq((1L, Array(2f, 0f)), (2L, Array(2f, 0f)),
      (3L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val got = Similarity.powerIterationTop(emb, "vec_id", "embedding",
        iters = 3)
      .orderBy("pos").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    // v0=[1e6,1e6] -> [1e6,125000] -> [1e6,15625] -> [1e6,1953]
    assert(got == Seq((0, 1000000L), (1, 1953L)))
  }

  test("powerIterationTop: negative components take the sign-split path") {
    // every vector points into the (+,-) quadrant: u0 < 0 after one
    // round, exercising sign(u)*((|u|*scale) div m)
    val emb = Seq((1L, Array(1f, -2f)), (2L, Array(1f, -2f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.powerIterationTop(emb, "vec_id", "embedding",
        iters = 1)
      .orderBy("pos").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((0, -500000L, -0.5), (1, 1000000L, 1.0)))
  }

  test("centroidCosineMatrix: hand cosines, sizes, zero-centroid null") {
    // centroids: label 0 -> [1,0] (2 vecs), 1 -> [0,2], 2 -> [3,4],
    // 3 -> [0,0] (degenerate)
    val emb = Seq(
      (0, Array(1f, 0f)), (0, Array(1f, 0f)),
      (1, Array(0f, 2f)), (2, Array(3f, 4f)), (3, Array(0f, 0f))
    ).toDF("label", "embedding")
    val got = Similarity.centroidCosineMatrix(emb, "label", "embedding")
      .orderBy("key_a", "key_b").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4)) == Seq(
      (0, 1, 2L, 1L), (0, 2, 2L, 1L), (0, 3, 2L, 1L),
      (1, 2, 1L, 1L), (1, 3, 1L, 1L), (2, 3, 1L, 1L)))
    assert(got(0)._5 == 0.0)             // [1,0] vs [0,2]
    assert(got(1)._5 == 3.0 / 5.0)       // [1,0] vs [3,4]
    assert(got(3)._5 == 8.0 / 10.0)      // [0,2] vs [3,4]
    assert(got(2)._5.isNaN && got(4)._5.isNaN && got(5)._5.isNaN,
      "zero centroid yields null cosine, never NaN arithmetic")
  }
}
