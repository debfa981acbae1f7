package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.sources.Tables

class IvfIndexSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  test("centroids: requested cell count, right dimensionality, deterministic") {
    val c1 = IvfIndex.centroids(t.embeddings, "vec_id", "embedding", nCells = 8)
      .orderBy("cell_id").collect()
    assert(c1.length == 8)
    assert(c1.head.getSeq[Double](1).length == 64)
    val c2 = IvfIndex.centroids(t.embeddings, "vec_id", "embedding", nCells = 8)
      .orderBy("cell_id").collect()
    assert(c1.map(_.getSeq[Double](1).toList).toList ==
      c2.map(_.getSeq[Double](1).toList).toList, "index build must be deterministic")
  }

  test("centroids: empty cells are re-seeded, cell count never shrinks") {
    // degenerate corpus: two tight clusters far apart — after one Lloyd
    // mean-update, most of the 8 seeded centroids attract zero vectors
    // (everything collapses onto the two cluster means), which without
    // re-seeding silently shrinks the index below the requested nCells
    val rng = new scala.util.Random(7)
    val corpus = Seq.tabulate(200) { i =>
      val base = if (i % 2 == 0) 0.0 else 100.0
      (i.toLong, Seq.fill(8)(base + rng.nextGaussian() * 0.01))
    }.toDF("id", "vec")
    val cents = IvfIndex.centroids(corpus, "id", "vec", nCells = 8, iters = 3)
      .orderBy("cell_id").collect()
    assert(cents.length == 8, s"expected 8 cells, got ${cents.length}")
    assert(cents.map(_.getInt(0)).toSeq == (0 until 8), "cell ids must stay dense")
    // determinism must survive the re-seed path too
    val again = IvfIndex.centroids(corpus, "id", "vec", nCells = 8, iters = 3)
      .orderBy("cell_id").collect()
    assert(cents.map(_.getSeq[Double](1).toList).toList ==
      again.map(_.getSeq[Double](1).toList).toList)
    // the search path stays correct over the degenerate index: full probe
    // of the re-seeded cells reproduces brute force
    val q = corpus.limit(3).select($"id".as("query_id"), $"vec".as("query_vec"))
    val full = IvfIndex.topK(corpus, "id", "vec", q, k = 5, nCells = 8, nProbe = 8, iters = 3)
    val exact = Similarity.bruteForceTopK(corpus, "id", "vec", q, 5)
    assert(full.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ==
      exact.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
  }

  test("topK: self is rank 1; probing all cells equals brute force") {
    val q = t.embeddings.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val full = IvfIndex.topK(t.embeddings, "vec_id", "embedding", q, k = 10,
      nCells = 8, nProbe = 8) // probe everything -> exact
    val exact = Similarity.bruteForceTopK(t.embeddings, "vec_id", "embedding", q, 10)
    val a = full.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = exact.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b, "nProbe = nCells must reproduce the exact result")
  }

  test("semanticDedup: planted copies and near-dups collapse to one representative, rest untouched") {
    val emb = t.embeddings.select($"vec_id", $"embedding")
    // plant an exact copy of every vector and a jittered near-dup of
    // vectors 0-4 (cosine >> 0.99: one coordinate nudged by 1%)
    val copies = emb.select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val nears = emb.filter($"vec_id" < 5)
      .select(($"vec_id" + 2000000L).as("vec_id"),
        transform($"embedding",
          (x, i) => when(i === 0, (x * lit(1.01f)).cast("float")).otherwise(x)).as("embedding"))
    val corpus = emb.unionByName(copies).unionByName(nears)
    val out = IvfIndex.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.999, nCells = 8)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("keep_id")).toMap
    val n = emb.count()
    // every row is present exactly once
    assert(out.size == n + n + 5)
    // originals keep themselves; copies resolve to their original
    (0L until n).foreach { i =>
      assert(out(i) == i, s"original $i lost representative status")
      assert(out(i + 1000000L) == i, s"copy of $i not collapsed")
    }
    // jittered near-dups also resolve to the original (same cell, cos > 0.999)
    (0L until 5L).foreach { i =>
      assert(out(i + 2000000L) == i, s"near-dup of $i not collapsed")
    }
    // the dedup view: one representative per semantic group
    assert(out.count { case (id, keep) => id == keep } == n)
  }

  test("topKQuantized: full probe + whole-corpus shortlist equals brute force") {
    val corpus = t.embeddings.filter($"vec_id" < 40)
    val q = corpus.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    // probing every cell with a shortlist covering the whole corpus leaves
    // only the exact re-rank — results must match brute force EXACTLY
    // (ranks and scores), proving quantization never touches final scores
    val got = IvfIndex.topKQuantized(corpus, "vec_id", "embedding", q, k = 5,
      nCells = 4, nProbe = 4, shortlistFactor = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == exact)
  }

  test("topKQuantized recall at partial probing is reasonable") {
    val q = t.embeddings.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val ann = IvfIndex.topKQuantized(t.embeddings, "vec_id", "embedding", q,
      k = 10, nCells = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(t.embeddings, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (ann intersect exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall collapsed: $recall")
    (0L until 8L).foreach(qid => assert(ann.contains((qid, qid))))
  }

  test("topK recall at partial probing is reasonable") {
    val q = t.embeddings.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val ann = IvfIndex.topK(t.embeddings, "vec_id", "embedding", q, k = 10,
      nCells = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(t.embeddings, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (ann intersect exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall collapsed: $recall")
    // every query at least finds its own vector
    (0L until 8L).foreach(qid => assert(ann.contains((qid, qid))))
  }

  // Plan pins (the q27 lesson): structural drift in the probe chain should
  // fail a test, not surface as bench archaeology two rounds later. The
  // plans are inspected AFTER execution so AQE's final join choices are
  // what gets asserted.

  test("topK plan: centroid array broadcasts; nothing sort-merges at probe scale") {
    val q = t.embeddings.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val df = IvfIndex.topK(t.embeddings, "vec_id", "embedding", q, k = 5,
      nCells = 4, nProbe = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the packed centroid array must broadcast into assignment/probing:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a sort-merge join in the probe chain means the corpus shuffled for a " +
        s"probe/centroid-sized table:\n$plan")
  }

  test("topKQuantized plan: centroid + shortlist re-rank joins broadcast") {
    val q = t.embeddings.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val df = IvfIndex.topKQuantized(t.embeddings, "vec_id", "embedding", q,
      k = 5, nCells = 4, nProbe = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the packed centroid array must broadcast:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the per-query shortlist (shortlistFactor*k rows) must broadcast into " +
        s"the exact re-rank joins, never shuffle the corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a sort-merge join in the quantized chain means a corpus-sized " +
        s"exchange for a shortlist-sized table:\n$plan")
  }

  test("saved+reloaded index serves results identical to the fused one-shot path") {
    val q = t.embeddings.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val direct = IvfIndex.topK(t.embeddings, "vec_id", "embedding", q,
        k = 5, nCells = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val (cents, indexed) = IvfIndex.buildIndex(t.embeddings, "vec_id", "embedding", nCells = 8)
    val dir = tmpDir("ivf-index")
    IvfIndex.saveIndex(cents, indexed, dir)
    val (rc, ri) = IvfIndex.loadIndex(spark, dir)
    val served = IvfIndex.topKFromIndex(rc, ri, q, k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // bit-exact: doubles round-trip parquet, so scores AND ranks agree
    assert(served.sortBy(x => (x._1, x._2)).toSeq ==
      direct.sortBy(x => (x._1, x._2)).toSeq)
  }

  test("upsertIndex: new ids insert, re-ingested ids replace, serve = brute force") {
    val base = t.embeddings.filter($"vec_id" % 4 =!= 3)
    val batch = t.embeddings.filter($"vec_id" % 4 === 3 || $"vec_id" % 8 === 0)
    val (cents, indexed) = IvfIndex.buildIndex(base, "vec_id", "embedding", nCells = 8)
    val dir = tmpDir("ivf-upsert")
    IvfIndex.saveIndex(cents, indexed, dir)
    val touched = IvfIndex.upsertIndex(spark, dir, batch, "vec_id", "embedding")
    assert(touched >= 1)
    val (rc, ri) = IvfIndex.loadIndex(spark, dir)
    // exactly one posting per id over base ∪ batch — re-ingested ids
    // replaced, never duplicated
    val n = t.embeddings.count()
    assert(ri.count() == n)
    assert(ri.select("neighbor_id").distinct().count() == n)
    // full-probe serve from the mutated index == brute force on the union
    val q = t.embeddings.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val served = IvfIndex.topKFromIndex(rc, ri, q, k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(t.embeddings, "vec_id", "embedding", q, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served == exact)
    // idempotency: replaying the same batch rewrites but changes nothing
    IvfIndex.upsertIndex(spark, dir, batch, "vec_id", "embedding")
    assert(spark.read.parquet(s"$dir/postings").count() == n)
  }

  test("cellLoad: shares sum to 1; planted hot cell trips rebuild_hint") {
    val (cents, indexed) = IvfIndex.buildIndex(t.embeddings, "vec_id", "embedding", nCells = 8)
    val dir = tmpDir("ivf-load")
    IvfIndex.saveIndex(cents, indexed, dir)
    val load = IvfIndex.cellLoad(spark, dir).collect()
    assert(load.length == 8)
    assert(math.abs(load.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    // plant a hot cell: pile 9x the corpus into cell 0 by hand
    val hot = indexed.withColumn("cell_id", lit(0))
      .withColumn("neighbor_id", col("neighbor_id") + 1000000L)
    (1 to 9).foreach { i =>
      hot.withColumn("neighbor_id", col("neighbor_id") + i * 10000000L)
        .write.mode("append").partitionBy("cell_id").parquet(s"$dir/postings")
    }
    val hinted = IvfIndex.cellLoad(spark, dir, maxLoadFactor = 4.0)
      .filter(col("rebuild_hint")).collect()
    assert(hinted.map(_.getInt(0)).toSeq == Seq(0))
    intercept[IllegalArgumentException] {
      IvfIndex.cellLoad(spark, dir, maxLoadFactor = 1.0)
    }
  }

  test("splitCell: hot cell retires into fresh sub-cells; postings preserved; serve unchanged at full probe") {
    val (cents, indexed) = IvfIndex.buildIndex(t.embeddings, "vec_id", "embedding", nCells = 8)
    val dir = tmpDir("ivf-split")
    IvfIndex.saveIndex(cents, indexed, dir)
    val n = t.embeddings.count()
    val hot = IvfIndex.cellLoad(spark, dir)
      .orderBy(col("n").desc, col("cell_id")).limit(1).collect()(0)
    val hotId = hot.getInt(0)
    val hotN = hot.getLong(1)
    // untouched partitions' files must not be rewritten by the split
    val other = (0 until 8).filter(_ != hotId)
    val filesBefore = other.map(c => c ->
      new java.io.File(s"$dir/postings/cell_id=$c").listFiles().toSet).toMap
    val fresh = IvfIndex.splitCell(spark, dir, hotId, kSub = 4)
    assert(fresh == Seq(8, 9, 10, 11), s"fresh ids from max+1: $fresh")
    other.foreach(c => assert(
      new java.io.File(s"$dir/postings/cell_id=$c").listFiles().toSet ==
        filesBefore(c), s"split rewrote untouched cell $c"))
    assert(!new java.io.File(s"$dir/postings/cell_id=$hotId").exists(),
      "hot cell's directory must retire")
    // centroid table consistency: hot id gone, fresh ids present, count 11
    val (rc, ri) = IvfIndex.loadIndex(spark, dir)
    val ids = rc.select("cell_id").collect().map(_.getInt(0)).toSet
    assert(ids == ((0 until 8).toSet - hotId ++ fresh.toSet))
    // every posting preserved exactly once; sub-cells hold the hot rows
    assert(ri.count() == n)
    assert(ri.select("neighbor_id").distinct().count() == n)
    assert(ri.filter(col("cell_id").isin(fresh.map(Integer.valueOf): _*))
      .count() == hotN)
    // the directory set matches the centroid table (no stale partitions)
    val dirs = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.getName.startsWith("cell_id=")).map(_.getName.drop(8).toInt).toSet
    assert(dirs == ids, s"directories $dirs out of sync with centroids $ids")
    // full-probe serve over the refined partition == brute force
    val q = t.embeddings.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val served = IvfIndex.topKFromIndex(rc, ri, q, k = 5, nProbe = 11)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(t.embeddings, "vec_id", "embedding", q, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served == exact)
    // guards: unknown cell, 1-way split
    intercept[IllegalArgumentException] {
      IvfIndex.splitCell(spark, dir, hotId, kSub = 4) // already retired
    }
    intercept[IllegalArgumentException] {
      IvfIndex.splitCell(spark, dir, 0, kSub = 1)
    }
  }

  test("mergeCells: light cells retire into nearest survivors; untouched partitions byte-stable; serve unchanged at full probe") {
    val (cents, indexed) = IvfIndex.buildIndex(t.embeddings, "vec_id", "embedding", nCells = 8)
    val dir = tmpDir("ivf-merge")
    IvfIndex.saveIndex(cents, indexed, dir)
    val n = t.embeddings.count()
    // split the heaviest cell first so the index carries genuinely tiny
    // sub-cells — the state a long-running ingest loop accumulates
    val hotId = IvfIndex.cellLoad(spark, dir)
      .orderBy(col("n").desc, col("cell_id")).limit(1).collect()(0).getInt(0)
    IvfIndex.splitCell(spark, dir, hotId, kSub = 4)
    val loadBefore = IvfIndex.cellLoad(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val meanBefore = loadBefore.values.sum.toDouble / loadBefore.size
    val expectedLight = loadBefore.filter(_._2 < 0.5 * meanBefore).keys.toSeq.sorted
    assume(expectedLight.nonEmpty && expectedLight.size < loadBefore.size,
      "fixture must have light AND surviving cells at floor 0.5")
    // untouched = neither light nor a receiver; conservatively snapshot all
    // file lists and verify non-receiver survivors afterwards
    val allIds = loadBefore.keys.toSeq
    val filesBefore = allIds.map(c => c ->
      Option(new java.io.File(s"$dir/postings/cell_id=$c").listFiles())
        .map(_.map(f => (f.getName, f.length)).toSet).getOrElse(Set.empty)).toMap
    val retired = IvfIndex.mergeCells(spark, dir, minLoadFactor = 0.5)
    assert(retired == expectedLight, s"retired $retired != expected $expectedLight")
    val (rc, ri) = IvfIndex.loadIndex(spark, dir)
    val ids = rc.select("cell_id").collect().map(_.getInt(0)).toSet
    assert(ids == allIds.toSet -- retired, "centroid table must drop exactly the retired ids")
    retired.foreach(c => assert(!new java.io.File(s"$dir/postings/cell_id=$c").exists(),
      s"retired cell $c's directory must be deleted"))
    // directory set == centroid table (no stale partitions)
    val dirs = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.getName.startsWith("cell_id=")).map(_.getName.drop(8).toInt).toSet
    assert(dirs == ids, s"directories $dirs out of sync with centroids $ids")
    // every posting preserved exactly once
    assert(ri.count() == n)
    assert(ri.select("neighbor_id").distinct().count() == n)
    // survivors that received nothing are byte-stable (never rewritten)
    val receivers = ri.groupBy("cell_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      .filter { case (id, cnt) => cnt != loadBefore.getOrElse(id, 0L) }.keySet
    val untouched = ids -- receivers
    assert(untouched.nonEmpty, "fixture must leave at least one non-receiver survivor")
    untouched.foreach(c => assert(
      Option(new java.io.File(s"$dir/postings/cell_id=$c").listFiles())
        .map(_.map(f => (f.getName, f.length)).toSet).getOrElse(Set.empty) == filesBefore(c),
      s"merge rewrote untouched cell $c"))
    // full-probe serve over the merged index == brute force
    val q = t.embeddings.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val served = IvfIndex.topKFromIndex(rc, ri, q, k = 5, nProbe = ids.size)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(t.embeddings, "vec_id", "embedding", q, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served == exact)
    // guards: bad floor; nothing below the floor is a no-op
    intercept[IllegalArgumentException] { IvfIndex.mergeCells(spark, dir, 1.5) }
    assert(IvfIndex.mergeCells(spark, dir, minLoadFactor = 1e-9) == Seq.empty)
  }

  test("maintain: acts on every audit hint, postings conserved, fixpoint reached") {
    val (cents, indexed) = IvfIndex.buildIndex(t.embeddings, "vec_id", "embedding", nCells = 8)
    val dir = tmpDir("ivf-maint")
    IvfIndex.saveIndex(cents, indexed, dir)
    val n = t.embeddings.count()
    // manufacture the drifted state a real ingest loop accumulates: a
    // 4-way split leaves genuinely tiny sub-cells below the 0.6 floor
    val hotId = IvfIndex.cellLoad(spark, dir)
      .orderBy(col("n").desc, col("cell_id")).limit(1).collect()(0).getInt(0)
    IvfIndex.splitCell(spark, dir, hotId, kSub = 4)
    val (split1, merged1) = IvfIndex.maintain(spark, dir,
      maxLoadFactor = 1.5, minLoadFactor = 0.6, kSub = 3)
    assert(split1.nonEmpty || merged1.nonEmpty, "fixture must trigger at least one repair")
    val (rc, ri) = IvfIndex.loadIndex(spark, dir)
    assert(ri.count() == n && ri.select("neighbor_id").distinct().count() == n,
      "every posting must survive the sweep exactly once")
    val ids = rc.select("cell_id").collect().map(_.getInt(0)).toSet
    val dirs = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.getName.startsWith("cell_id=")).map(_.getName.drop(8).toInt).toSet
    assert(dirs == ids, s"directories $dirs out of sync with centroids $ids")
    split1.foreach(id => assert(!ids.contains(id), s"split hot id $id must retire"))
    merged1.foreach(id => assert(!ids.contains(id), s"merged id $id must retire"))
    // repeated sweeps reach a fixpoint (bounded: each split needs >= kSub
    // postings and each merge shrinks the table)
    var rounds = 0
    var last = (Seq(0), Seq(0)): (Seq[Int], Seq[Int])
    while (rounds < 8 && (last._1.nonEmpty || last._2.nonEmpty)) {
      last = IvfIndex.maintain(spark, dir, maxLoadFactor = 1.5,
        minLoadFactor = 0.6, kSub = 3)
      rounds += 1
    }
    assert(last._1.isEmpty && last._2.isEmpty, s"no fixpoint after $rounds sweeps")
    // the repaired index still serves exactly at full probe
    val q = t.embeddings.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val (rc2, ri2) = IvfIndex.loadIndex(spark, dir)
    val served = IvfIndex.topKFromIndex(rc2, ri2, q, k = 5, nProbe = 4096)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(t.embeddings, "vec_id", "embedding", q, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served == exact)
  }

  test("saveIndex rebuild truncates a prior run's stale cell partitions") {
    // dynamic partition overwrite (the session default) would leave a
    // grown index's cell_id=8.. dirs behind after a rebuild with fewer
    // cells — probe-reachable stale postings. saveIndex forces STATIC.
    val dir = tmpDir("ivf-rebuild")
    val (c1, i1) = IvfIndex.buildIndex(t.embeddings, "vec_id", "embedding", nCells = 8)
    IvfIndex.saveIndex(c1, i1, dir)
    val hotId = IvfIndex.cellLoad(spark, dir)
      .orderBy(col("n").desc, col("cell_id")).limit(1).collect()(0).getInt(0)
    IvfIndex.splitCell(spark, dir, hotId, kSub = 4) // grows ids to 8..11
    val (c2, i2) = IvfIndex.buildIndex(t.embeddings, "vec_id", "embedding", nCells = 4)
    IvfIndex.saveIndex(c2, i2, dir)
    val dirs = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.getName.startsWith("cell_id=")).map(_.getName.drop(8).toInt).toSet
    val ids = spark.read.parquet(s"$dir/centroids")
      .select("cell_id").collect().map(_.getInt(0)).toSet
    assert(dirs == ids, s"rebuild left stale partitions: $dirs vs centroids $ids")
    assert(dirs.forall(_ < 8), s"stale split-era dirs survived the rebuild: $dirs")
    // a cell with fewer postings than kSub refuses to split (the sub-seed
    // would publish fewer cells than requested)
    val small = IvfIndex.cellLoad(spark, dir)
      .orderBy(col("n").asc, col("cell_id")).limit(1).collect()(0)
    intercept[IllegalArgumentException] {
      IvfIndex.splitCell(spark, dir, small.getInt(0),
        kSub = small.getLong(1).toInt + 1)
    }
  }

  test("served reads prune to the probed cells' partitions") {
    val q = t.embeddings.filter($"vec_id" < 1)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val (cents, indexed) = IvfIndex.buildIndex(t.embeddings, "vec_id", "embedding", nCells = 8)
    val dir = tmpDir("ivf-prune")
    IvfIndex.saveIndex(cents, indexed, dir)
    val (rc, ri) = IvfIndex.loadIndex(spark, dir)
    // the postings table is Hive-partitioned by cell_id on disk
    val parts = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.getName.startsWith("cell_id=")).map(_.getName).sorted
    assert(parts.length == 8, s"expected 8 cell partitions, got ${parts.toSeq}")
    // a cell_id filter reaches the scan as partition pruning
    val plan = ri.filter($"cell_id" === 3).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cell_id"),
      s"cell filter must prune partitions:\n$plan")
  }
}
