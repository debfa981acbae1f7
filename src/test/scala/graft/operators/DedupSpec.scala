package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class DedupSpec extends SparkFunSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
  private val nearDup = base.replace("lazy", "sleepy") // one word changed
  private val unrelated = "completely different content about spark query engines and columnar formats " * 4

  private def docs = Seq(
    (0L, base), (1L, base), // exact dups
    (2L, nearDup), // near dup of 0/1
    (3L, unrelated),
    (4L, null.asInstanceOf[String]), // null text — the round-4 simhashBulk
    (5L, "")                         // null-vote fix regressed exactly here
  ).toDF("doc_id", "text")

  test("exactGroups finds exact duplicates deterministically (min id kept)") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(g.length == 5) // base, nearDup, unrelated, null, ""
    val dupGroup = g.find(_.getAs[Long]("dup_count") == 2).get
    assert(dupGroup.getAs[Long]("keep_id") == 0L)
  }

  test("fingerprintGroups collapses word order / punctuation / case variants") {
    val variants = Seq(
      (0L, "The quick brown Fox!"),
      (1L, "fox quick brown the"),
      (2L, "THE, QUICK... brown fox"),
      (3L, "something else entirely")
    ).toDF("doc_id", "text")
    val g = Dedup.fingerprintGroups(variants, "doc_id", "text").collect()
    assert(g.length == 2)
    assert(g.find(_.getAs[Long]("dup_count") == 3).get.getAs[Long]("keep_id") == 0L)
  }

  test("minhash candidate pairs surface exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((0L, 1L)), "exact dups must collide in every band")
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 == 1.0)
    assert(pairSet.contains((0L, 2L)) || pairSet.contains((1L, 2L)),
      "one-word-changed near dup should collide in at least one band")
    assert(!pairSet.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc must not be a candidate")
  }

  test("minhash signature estimate approximates true shingle jaccard") {
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text").collect()
    val est = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 2L)
      .map(_.getDouble(2))
    // true 3-shingle jaccard of base vs nearDup is ~0.6; 32 hashes -> coarse
    est.foreach(e => assert(e >= 0.4 && e <= 1.0))
  }

  test("simhash: near dups within small hamming distance, unrelated docs far") {
    val sigs = docs.select($"doc_id", Dedup.simhash64($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sigs(0L) == sigs(1L), "identical text -> identical simhash")
    assert(ham(sigs(0L), sigs(2L)) <= 12, s"near dup too far: ${ham(sigs(0L), sigs(2L))}")
    assert(ham(sigs(0L), sigs(3L)) > 12, s"unrelated too close: ${ham(sigs(0L), sigs(3L))}")
  }

  test("adversarial corpus: bucket cap bounds degenerate-bucket pair blowup") {
    // 1000 mutual exact dups — uncapped this is one bucket per band holding
    // every doc: O(m²) pairs and an m-element array in ONE task
    val many = (0L until 1000L).map(i => (i, base)).toDF("doc_id", "text")
    val capped = Dedup.minhashCandidatePairs(many, "doc_id", "text", maxBucket = 64)
      .collect()
    // identical text ⇒ identical buckets in all bands; the 64 lowest ids
    // form the full C(64,2) clique, and every beyond-cap member keeps ONE
    // linking pair to the bucket minimum (doc 0) — total 2016 + 936 pairs
    assert(capped.length == 64 * 63 / 2 + (1000 - 64))
    assert(capped.forall(_.getDouble(2) == 1.0))
    // NO member is orphaned: all 1000 docs appear in some pair, and the
    // cluster stays fully connected for downstream components
    val seen = capped.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(seen == (0L until 1000L).toSet, "cap orphaned bucket members")
    val pairs = capped.map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.toDF("id_a", "id_b")
    val clusters = DupClusters.components(pairs)
      .select("cluster_id").distinct().collect()
    assert(clusters.length == 1, "capped candidate graph fell apart")
  }

  test("capped bucket + downstream est_jaccard filter: boilerplate dups all survive clustering") {
    // the documented guarantee: in the degenerate bucket the cap exists
    // for (mutual near-dups of the minimum), every beyond-cap linking pair
    // scores the same as the clique pairs, so a downstream threshold
    // filter — exactly what dup-cluster pipelines apply (q45) — severs
    // nothing: all planted dups stay one connected component
    val many = (0L until 300L).map(i => (i, base)).toDF("doc_id", "text")
    val filtered = Dedup.minhashCandidatePairs(many, "doc_id", "text", maxBucket = 32)
      .filter(col("est_jaccard") >= 0.9)
    val clusters = DupClusters.components(
      filtered.select("id_a", "id_b"))
    assert(clusters.select("cluster_id").distinct().count() == 1,
      "threshold filter severed beyond-cap members of a boilerplate bucket")
    assert(clusters.count() == 300, "a planted dup was lost under the filter")
  }

  test("bucket profile surfaces the degenerate bucket a cap would truncate") {
    val many = (0L until 100L).map(i => (i, base)).toDF("doc_id", "text")
    val prof = Dedup.minhashBucketProfile(many, "doc_id", "text", minSize = 65).collect()
    assert(prof.nonEmpty && prof.forall(_.getAs[Long]("n_members") == 100L),
      "every band's bucket holds all 100 mutual dups")
  }

  test("out-of-range shingleN is rejected, not silently wrong") {
    intercept[IllegalArgumentException] {
      Dedup.minhashSignatures(docs, "doc_id", "text", shingleN = 7)
    }
    intercept[IllegalArgumentException] {
      Dedup.minhashCandidatePairs(docs, "doc_id", "text", shingleN = 0)
    }
  }

  test("simhashBulk matches the scalar simhash64 Column bit-for-bit") {
    val bulk = Dedup.simhashBulk(docs, Seq("doc_id"), "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scalar = docs.select($"doc_id", Dedup.simhash64($"text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the null-text row MUST survive the bulk (explode_outer) path — a
    // plain explode would drop it here and shrink the corpus (round-4 bug)
    assert(bulk.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    assert(bulk == scalar)
  }

  test("fuzzyJoinJaccard links near-identical rows across two tables, blocked") {
    val left = Seq(
      (1L, "the quick brown fox", "en", 19L),
      (2L, "zzzz totally different", "en", 22L),
      (3L, "der schnelle fuchs", "de", 18L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val right = Seq(
      (10L, "the quick brown fox!", "en", 20L), // same chars + '!'
      (30L, "der schnelle fuchs", "de", 18L)    // exact copy, other table
    ).toDF("doc_id", "text", "lang", "n_chars")
    val out = Dedup.fuzzyJoinJaccard(left, right, "doc_id", "text", "lang",
      "n_chars", bucketWidth = 64, threshold = 0.8)
      .orderBy("id_l", "id_r").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 10L), (3L, 30L)))
    assert(out(1).getAs[Double]("jac") == 1.0)
    // cross-language / cross-bucket candidates never form
    assert(out.forall(r => r.getLong(0) != 2L))
  }

  test("ngramJaccardPairs: exact bigram jaccard, blocked, short docs excluded") {
    val df = Seq(
      (1L, "the quick brown fox jumps", "en", 25L),
      (2L, "the quick brown fox leaps", "en", 25L),
      (3L, "one", "en", 3L),   // < 2 tokens -> empty gram set
      (4L, "one", "en", 3L),
      (5L, "der schnelle fuchs springt", "de", 26L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val out = Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang", "n_chars",
      n = 2, bucketWidth = 64, threshold = 0.5)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // docs 1,2 bigrams: {the quick, quick brown, brown fox, fox jumps} vs
    // {..., fox leaps}: inter 3, union 5 -> 0.6 >= 0.5. Docs 3/4 have empty
    // gram sets (Jaccard undefined) and must never pair; doc 5 is in
    // another lang block.
    assert(out.toSeq == Seq((1L, 2L, 0.6)))
    // threshold 0 would disable prefix filtering entirely -> rejected
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang", "n_chars",
        n = 2, bucketWidth = 64, threshold = 0.0)
    }
  }

  test("ngramJaccardPairs: prefix-filtered result == naive block-quadratic") {
    // Differential for the AllPairs prefix filter: on a randomized corpus
    // with planted near-dups, the candidate-pruned operator must emit
    // EXACTLY the pairs the plain quadratic does — prefix filtering is an
    // over-approximation of candidates, never a loss.
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc() = Seq.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 60L).map(i => (i, doc()))
    // plant mutated copies: drop the last word -> high but non-1.0 jaccard
    val planted = base.take(20).map { case (i, t) =>
      (i + 1000L, t.split(" ").dropRight(1).mkString(" ")) }
    val corpus = (base ++ planted)
      .map { case (i, t) => (i, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val fast = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", "lang",
      "n_chars", n = 2, bucketWidth = 32, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // naive quadratic with identical blocking/semantics, built inline
    def side(tag: String) = corpus.select(
      col("lang").as("blk_lang"),
      floor(col("n_chars") / 32).cast("long").as("blk_len"),
      col("doc_id").as(s"id_$tag"),
      array_distinct(Scrub.wordNgrams(col("text"), 2)).as(s"g_$tag"))
    val naive = side("a").join(side("b"), Seq("blk_lang", "blk_len"))
      .filter(col("id_a") < col("id_b") &&
        size(array_union(col("g_a"), col("g_b"))) > 0)
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))).cast("double")).as("jac"))
      .filter(col("jac") >= 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(naive.nonEmpty, "vacuous differential: no qualifying pairs")
    assert(fast == naive)
  }

  test("ngramJaccardPairs plan: gram pipeline materializes once, shared by self-join and verification") {
    import org.apache.spark.sql.execution.{GenerateExec, RDDScanExec}
    import org.apache.spark.sql.execution.window.WindowExec
    val df = Seq(
      (1L, "the quick brown fox jumps", "en", 25L),
      (2L, "the quick brown fox leaps", "en", 25L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang", "n_chars",
        n = 2, bucketWidth = 64, threshold = 0.5).queryExecution.executedPlan
      // the n-gram projection, explode, dfreq join and prefix-rank window
      // all live BELOW the two checkpoint barriers — the visible plan must
      // not re-evaluate any of them (a self-join would otherwise run the
      // whole rank pipeline twice, and each verification join would re-run
      // tokenization: the round-5 regression)
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        s"prefix-rank window re-evaluated above the checkpoint:\n$plan")
      assert(plan.collect { case g: GenerateExec => g }.isEmpty,
        s"gram explode re-evaluated above the checkpoint:\n$plan")
      // up to four checkpoint scans (pref twice for the self-join, docs
      // twice for verification — ReuseExchange may collapse the two docs
      // broadcasts into one) but only TWO distinct materialized RDDs —
      // every join side reads the same computed-once blocks
      val scans = plan.collect { case r: RDDScanExec => r }
      assert(scans.size >= 3, s"expected >= 3 checkpoint scans:\n$plan")
      assert(scans.map(_.rdd.id).distinct.size == 2,
        s"self-join/verification sides do not share materialized RDDs:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("ngramJaccardPairs: shuffle-join fallback above the broadcast cap is result-identical") {
    val df = Seq(
      (1L, "the quick brown fox jumps", "en", 25L),
      (2L, "the quick brown fox leaps", "en", 25L),
      (5L, "der schnelle fuchs springt", "de", 26L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    def run(cap: Long) = Dedup.ngramJaccardPairs(df, "doc_id", "text", "lang",
      "n_chars", n = 2, bucketWidth = 64, threshold = 0.5,
      maxBroadcastGrams = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // cap 0 forces the shuffle-join path a corpus-sized vocabulary takes
    assert(run(0L) == run(50000000L))
    assert(run(0L) == Set((1L, 2L, 0.6)))
  }

  test("charJaccard matches hand-computed character-set jaccard") {
    val df = Seq(("abcab", "abd")).toDF("a", "b")
    // char sets {a,b,c} vs {a,b,d}: |inter|=2, |union|=4
    val j = df.select(Dedup.charJaccard($"a", $"b")).head.getDouble(0)
    assert(j == 0.5)
  }

  test("blockedJaccardPairs only pairs within (lang, length-bucket) blocks") {
    val df = Seq(
      (0L, "aabb", "en", 4L), (1L, "abab", "en", 4L), // same block, jac 1.0
      (2L, "abab", "de", 4L), // different lang -> never paired
      (3L, "a" * 200, "en", 200L) // different length bucket
    ).toDF("doc_id", "text", "lang", "n_chars")
    val pairs = Dedup.blockedJaccardPairs(df, "doc_id", "text", "lang", "n_chars",
      bucketWidth = 64, threshold = 0.5).collect()
    assert(pairs.length == 1)
    assert((pairs.head.getLong(0), pairs.head.getLong(1)) == (0L, 1L))
    assert(pairs.head.getAs[Double]("jac") == 1.0)
  }

  // --- repeatedPassages: tokens w1..wN are globally unique outside the
  // planted passages, so expected spans are known in closed form
  private def tok(range: Range, tag: String = "u") = range.map(i => s"$tag$i")

  test("repeatedPassages finds a cross-document passage with exact boundaries") {
    val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens
    val a = (tok(1 to 10).mkString(" ")) + " " + shared + " " + tok(11 to 20).mkString(" ")
    val b = (tok(21 to 24).mkString(" ")) + " " + shared + " " + tok(25 to 30).mkString(" ")
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = Dedup.repeatedPassages(df, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // doc 1: shared tokens occupy positions 11..16 -> windows 11..14 merge
    // to one span [11, 16]; doc 2: positions 5..10 -> span [5, 10]
    assert(got == Set((1L, 11L, 16L, 4L), (2L, 5L, 10L, 4L)))
  }

  test("exactSubstringRemovals keeps the first occurrence, removes the rest") {
    val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens
    val a = tok(1 to 10).mkString(" ") + " " + shared + " " + tok(11 to 20).mkString(" ")
    val b = tok(21 to 24).mkString(" ") + " " + shared + " " + tok(25 to 30).mkString(" ")
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = Dedup.exactSubstringRemovals(df, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // every shared gram's canonical copy is in doc 1 (lexicographically
    // first) — doc 1 emits NOTHING; doc 2's positions 5..8 merge to one
    // removal span covering tokens 5..10
    assert(got == Set((2L, 5L, 10L, 4L)))
  }

  test("exactSubstringRemovals: within-doc boilerplate removes the later copy") {
    val text = tok(1 to 5).mkString(" ") + " x y z " +
      tok(6 to 10).mkString(" ") + " x y z " + tok(11 to 15).mkString(" ")
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val got = Dedup.exactSubstringRemovals(df, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // "x y z" at positions 6 and 14: position 6 is canonical, 14 removed
    assert(got == Set((7L, 14L, 16L, 1L)))
  }

  test("exactSubstringRemovals: lexicographic canonical across 3 occurrences, split spans") {
    val df = Seq(
      (5L, "a b c " + tok(41 to 45).mkString(" ") + " a b c"),
      (3L, tok(31 to 33).mkString(" ") + " a b c " + tok(34 to 34).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.exactSubstringRemovals(df, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // canonical is doc 3 pos 4 (min doc_id); doc 5's two occurrences at
    // positions 1 and 9 are 8 apart (> k) -> two separate removal spans
    assert(got == Set((5L, 1L, 3L, 1L), (5L, 9L, 11L, 1L)))
    intercept[IllegalArgumentException] {
      Dedup.exactSubstringRemovals(df, "doc_id", "text", k = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.exactSubstringRemovals(df, "doc_id", "text", k = 3, minCount = 1L)
    }
  }

  test("repeatedPassages counts within-document repetition (boilerplate)") {
    val text = (tok(1 to 5).mkString(" ")) + " x y z " +
      (tok(6 to 10).mkString(" ")) + " x y z " + tok(11 to 15).mkString(" ")
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val got = Dedup.repeatedPassages(df, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // "x y z" at positions 6..8 and 14..16: two disjoint spans
    assert(got == Set((6L, 8L), (14L, 16L)))
  }

  test("repeatedPassages merges overlapping and adjacent repeated windows") {
    // the full 8-token passage repeats -> all 6 of its 3-windows merge
    val p = "p1 p2 p3 p4 p5 p6 p7 p8"
    val df = Seq(
      (1L, tok(1 to 4).mkString(" ") + " " + p),
      (2L, p + " " + tok(5 to 8).mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.repeatedPassages(df, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 5L, 12L, 6L), (2L, 1L, 8L, 6L)))
  }

  test("repeatedPassages: unique corpus yields nothing; minCount raises the bar") {
    val df = Seq((1L, tok(1 to 30).mkString(" ")),
      (2L, tok(31 to 60).mkString(" "))).toDF("doc_id", "text")
    assert(Dedup.repeatedPassages(df, "doc_id", "text", n = 4).isEmpty)
    // passage present twice but minCount=3 demands a third occurrence
    val twice = Seq((1L, "a b c d " + tok(1 to 6).mkString(" ")),
      (2L, "a b c d " + tok(7 to 12).mkString(" "))).toDF("doc_id", "text")
    assert(Dedup.repeatedPassages(twice, "doc_id", "text", n = 4, minCount = 3).isEmpty)
    val thrice = twice.unionByName(Seq((3L, "a b c d")).toDF("doc_id", "text"))
    assert(Dedup.repeatedPassages(thrice, "doc_id", "text", n = 4, minCount = 3)
      .count() == 3)
  }

  test("repeatedPassages tokenizes case-insensitively; short docs drop out") {
    val df = Seq((1L, "Foo BAR baz qux one two"),
      (2L, "foo bar BAZ qux three four"),
      (3L, "fo")).toDF("doc_id", "text") // doc 3: < n tokens, never windows
    val got = Dedup.repeatedPassages(df, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 4L), (2L, 1L, 4L)))
  }

  test("containmentPairs: an excerpt is contained in its parent, not vice versa") {
    // doc 2 = a strict prefix of doc 1; doc 3 unrelated. Distinct 2-gram
    // sets: A(doc2) = {a b, b c, c d} all inside doc 1's set of 6.
    val df = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d"),
      (3L, "x y z w")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", n = 2,
        threshold = 0.9, maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((2L, 1L, 3L, 1.0)),
      s"want only the directed excerpt→parent row, got ${got.toSeq}")
  }

  test("containmentPairs: near-identical sets qualify in both directions") {
    val df = Seq(
      (1L, "p q r s t"),
      (2L, "p q r s t")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", n = 2,
        threshold = 0.9, maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(got == Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  test("containmentPairs: partial overlap below threshold is dropped; above kept with exact value") {
    // A = {a b, b c, c x} vs B = {a b, b c, c d, d e}: shared 2, C(A→B)=2/3
    val df = Seq(
      (1L, "a b c x"),
      (2L, "a b c d e")).toDF("doc_id", "text")
    def run(t: Double) = Dedup.containmentPairs(df, "doc_id", "text", n = 2,
        threshold = t, maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(run(0.9).isEmpty, "2/3 containment must not clear 0.9")
    val lo = run(0.6)
    assert(lo.contains((1L, 2L, 2L, 2.0 / 3.0)), s"missing exact 2/3 row: $lo")
    assert(!lo.exists(r => r._1 == 2L), "B (4 grams, 2 shared) must not clear 0.6")
  }

  test("containmentPairs: the maxBucket cap prices recall exactly as documented") {
    // 20 docs all share the gram-set {c1 c2, c2 c3}; every gram has df=20.
    // cap 16 < 20: no anchor gram, zero candidates — the documented miss.
    // cap 32 ≥ 20: every directed pair of identical sets qualifies.
    val df = (1L to 20L).map(i => (i, "c1 c2 c3")).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(df, "doc_id", "text", n = 2,
      threshold = 0.9, maxBucket = 16).count() == 0L)
    assert(Dedup.containmentPairs(df, "doc_id", "text", n = 2,
      threshold = 0.9, maxBucket = 32).count() == 20L * 19L)
  }

  test("containmentPairs: sub-n-token docs never pair; bad args rejected") {
    val df = Seq((1L, "a"), (2L, "a")).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(df, "doc_id", "text", n = 2).count() == 0L)
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.0)
    }
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(df, "doc_id", "text", maxBucket = 1)
    }
  }

  // ---- editDistancePairs ----

  test("editDistancePairs: substitutions, edge insertions and exact dups all surface") {
    val df = Seq(
      1L -> "abcdef",    // base
      2L -> "abcxef",    // 1 substitution
      3L -> "abcdefgh",  // 2 appended chars
      4L -> "XYabcdef",  // 2 prepended chars (max segment shift)
      5L -> "abcdef",    // exact duplicate of 1
      6L -> "zzzzzz"     // unrelated
    ).toDF("id", "text")
    val out = Dedup.editDistancePairs(df, "id", "text", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out.contains((1L, 2L, 1)))
    assert(out.contains((1L, 3L, 2)))
    assert(out.contains((1L, 4L, 2)))
    assert(out.contains((1L, 5L, 0)))
    assert(!out.exists(p => p._1 == 6L || p._2 == 6L))
    // each pair exactly once
    val pairs = Dedup.editDistancePairs(df, "id", "text", maxDist = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.toSet.size)
  }

  test("editDistancePairs: differential vs the naive quadratic on a random corpus") {
    val rnd = new scala.util.Random(42)
    val strs = (1L to 80L).map { i =>
      val len = 3 + rnd.nextInt(6)
      (i, (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val df = strs.toDF("id", "text")
    val fast = Dedup.editDistancePairs(df, "id", "text", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = df.select(col("id").as("id_a"), col("text").as("ta"))
    val b = df.select(col("id").as("id_b"), col("text").as("tb"))
    val naive = a.crossJoin(b)
      .filter(col("id_a") < col("id_b") &&
        levenshtein(col("ta"), col("tb")) <= 2)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ta"), col("tb")).as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(naive.nonEmpty, "differential fixture produced no pairs")
    assert(fast == naive)
    // salting changes the join's physical sharding, never its result
    val salted = Dedup.editDistancePairs(df, "id", "text", maxDist = 2, salt = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(salted == naive)
  }

  test("editDistancePairs plan: candidates come from an equi-join, never a cartesian") {
    val df = Seq(1L -> "abcdef", 2L -> "abcxef").toDF("id", "text")
    val plan = Dedup.editDistancePairs(df, "id", "text", maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"segment filter must drive an equi-join:\n$plan")
  }

  test("editDistancePairs: strings shorter than maxDist+1 are excluded by contract") {
    val df = Seq(1L -> "ab", 2L -> "ab", 3L -> "abcd", 4L -> "abcd")
      .toDF("id", "text")
    val out = Dedup.editDistancePairs(df, "id", "text", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((3L, 4L)))
    intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(df, "id", "text", maxDist = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(df, "id", "text", maxDist = 5)
    }
  }

  test("lshParameterPlan: dyadic hand S-curves, min-b tie-break") {
    import spark.implicits._
    // two pairs at sim .25 and .75 (both bins' centers), nHashes = 2,
    // t = 0.5, 2 bins: every intermediate is a dyadic rational -> exact
    //   (b=2, r=1): p(.25) = 1-(.75)^2 = .4375, p(.75) = .9375
    //               fp = .4375, fn = .0625, total = .5
    //   (b=1, r=2): p(.25) = .0625,  p(.75) = .5625
    //               fp = .0625, fn = .4375, total = .5
    // exact tie on total error -> chosen is the SMALLER band count b = 1
    val pairs = Seq(0.25, 0.75).toDF("sim")
    val got = Dedup.lshParameterPlan(pairs, "sim", nHashes = 2,
        threshold = 0.5, nBins = 2)
      .orderBy("b").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(got.toSeq == Seq(
      (1, 2, 0.25, 0.0625, 0.4375, 0.5, true),
      (2, 1, 0.75, 0.4375, 0.0625, 0.5, false)))
    intercept[IllegalArgumentException] {
      Dedup.lshParameterPlan(pairs, "sim", nHashes = 0, threshold = 0.5)
    }
  }
}
