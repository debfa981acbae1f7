package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class SamplingSpec extends SparkFunSuite {
  import spark.implicits._

  test("hexThreshold endpoints and midpoint") {
    assert(Sampling.hexThreshold(0.0) == "00000000")
    assert(Sampling.hexThreshold(1.0) == "ffffffff")
    assert(Sampling.hexThreshold(0.5) == "80000000")
  }

  test("splitTag is stable and roughly proportional") {
    val df = (1L to 2000L).toDF("id")
    val tags = df.select(col("id"), Sampling.splitTag(col("id"), 0.9).as("split"))
    val counts = tags.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") > 1700 && counts("train") < 1900, s"split skewed: $counts")
    // stability: same assignment on recompute
    val again = df.select(col("id"), Sampling.splitTag(col("id"), 0.9).as("split"))
    assert(tags.except(again).isEmpty && again.except(tags).isEmpty)
  }

  test("growing the corpus never reassigns existing keys") {
    val small = (1L to 500L).toDF("id")
      .select(col("id"), Sampling.splitTag(col("id"), 0.8).as("split"))
    val grown = (1L to 1000L).toDF("id")
      .select(col("id"), Sampling.splitTag(col("id"), 0.8).as("split"))
      .filter(col("id") <= 500)
    assert(small.except(grown).isEmpty && grown.except(small).isEmpty)
  }

  test("sampleByHash keeps a stable subset of about the right size") {
    val df = (1L to 2000L).toDF("id")
    val n = Sampling.sampleByHash(df, "id", 0.25).count()
    assert(n > 400 && n < 600, s"sample size off: $n")
  }

  test("subsample then split are decorrelated (domain separation)") {
    val df = (1L to 4000L).toDF("id")
    val sampled = Sampling.sampleByHash(df, "id", 0.25)
    val splits = sampled.select(Sampling.splitTag(col("id"), 0.8).as("split"))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.contains("val") && splits("val") > 100,
      s"val set collapsed — hashes correlated: $splits")
  }

  test("stratifiedCap equals the single-window formulation for every salt") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 900L).map(i => (i, s"c${i % 3}")).toDF("id", "cls")
    val naiveW = Window.partitionBy("cls").orderBy(
      substring(md5(concat(col("id").cast("string"), lit(":cap"))), 1, 8), col("id"))
    val naive = df.withColumn("_r", row_number().over(naiveW))
      .filter(col("_r") <= 40).drop("_r")
    for (salt <- Seq(1, 7, 32)) {
      val capped = Sampling.stratifiedCap(df, Seq("cls"), "id", n = 40, salt = salt)
      assert(capped.except(naive).isEmpty && naive.except(capped).isEmpty,
        s"salted two-level rank diverged from single window at salt=$salt")
    }
  }

  test("stratifiedCap leaves under-cap strata whole and keeps schema") {
    val df = (1L to 100L).map(i => (i, if (i <= 90) "big" else "small")).toDF("id", "cls")
    val capped = Sampling.stratifiedCap(df, Seq("cls"), "id", n = 20)
    assert(capped.columns.toSeq == Seq("id", "cls"))
    val counts = capped.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("big") == 20 && counts("small") == 10, s"wrong cap: $counts")
  }

  test("frac=1.0 is exactly the identity; frac=0.0 keeps nothing") {
    val df = (1L to 500L).toDF("id")
    assert(Sampling.sampleByHash(df, "id", 1.0).count() == 500)
    assert(Sampling.sampleByHash(df, "id", 0.0).count() == 0)
    assert(df.select(Sampling.splitTag(col("id"), 1.0).as("s"))
      .filter(col("s") === "val").count() == 0)
  }

  test("mixtureByHash applies per-group rates, defaultFrac elsewhere") {
    val df = (1L to 6000L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val out = Sampling.mixtureByHash(df, "id", "grp",
      Map("g0" -> 1.0, "g1" -> 0.5), defaultFrac = 0.0)
    val counts = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("g0") == 2000, s"rate-1.0 group not whole: $counts")
    assert(!counts.contains("g2"), s"default-0.0 group leaked rows: $counts")
    assert(math.abs(counts("g1") - 1000L) < 150, s"0.5 rate off: $counts")
    // per-row predicate only: the kept g1 rows are a subset of sampleByHash
    // at the same frac/domain (same hash contract)
    val direct = Sampling.sampleByHash(df.filter(col("grp") === "g1"), "id", 0.5, "mix")
    assert(out.filter(col("grp") === "g1").except(direct).isEmpty)
    assert(direct.except(out.filter(col("grp") === "g1")).isEmpty)
  }

  test("tokenBudgetCap equals the single-window formulation for any buckets") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 2000L).map(i => (i, s"s${i % 4}", (i * 13) % 97 + 1))
      .toDF("id", "src", "tok")
    val w = Window.partitionBy("src").orderBy(
        substring(md5(concat(col("id").cast("string"), lit(":budget"))), 1, 8),
        col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = df
      .withColumn("_p", coalesce(sum("tok").over(w), lit(0L)))
      .filter(col("_p") < 3000).drop("_p")
    for (b <- Seq(1, 13, 256)) {
      val capped = Sampling.tokenBudgetCap(df, Seq("src"), "id", "tok",
        budget = 3000, buckets = b)
      assert(capped.except(naive).isEmpty && naive.except(capped).isEmpty,
        s"bucketed prefix sum diverged from single window at buckets=$b")
    }
  }

  test("tokenBudgetCap lands within one document of the budget") {
    val df = (1L to 1000L).map(i => (i, "s", 50L)).toDF("id", "src", "tok")
    val kept = Sampling.tokenBudgetCap(df, Seq("src"), "id", "tok", budget = 1000)
    // 50-token docs against a 1000 budget: exactly 20 docs
    assert(kept.count() == 20)
    // budget 1001: the 21st doc starts at 1000 < 1001 -> included
    assert(Sampling.tokenBudgetCap(df, Seq("src"), "id", "tok", 1001).count() == 21)
    // budget 0 keeps nothing; budget >= total keeps everything
    assert(Sampling.tokenBudgetCap(df, Seq("src"), "id", "tok", 0).count() == 0)
    assert(Sampling.tokenBudgetCap(df, Seq("src"), "id", "tok", 500000).count() == 1000)
  }

  test("ppsSample equals the single-window formulation for any buckets") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 2000L).map(i => (i, s"s${i % 3}", (i * 31) % 211 + 1))
      .toDF("id", "src", "w")
    val win = Window.partitionBy("src").orderBy(
        substring(md5(concat(col("id").cast("string"), lit(":pps"))), 1, 8),
        col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val k = 25
    val naive = df
      .withColumn("_cum", sum(col("w").cast("long")).over(win))
      .withColumn("_tot", sum(col("w").cast("long"))
        .over(Window.partitionBy("src")))
      .filter(expr(s"(_cum * $k) div _tot") > expr(s"((_cum - w) * $k) div _tot"))
      .drop("_cum", "_tot")
    for (b <- Seq(1, 13, 256)) {
      val got = Sampling.ppsSample(df, Seq("src"), "id", "w", k, buckets = b)
      assert(got.except(naive).isEmpty && naive.except(got).isEmpty,
        s"bucketed PPS diverged from single window at buckets=$b")
    }
  }

  test("ppsSample yields exactly k per stratum for sub-step weights and is ∝ weight") {
    // 4000 rows of weight 1 and 40 of weight 100: a weight-100 row's interval
    // covers 100/8000 of the line vs 1/8000 — with k=40 selection points every
    // 200 units, heavy rows are ~20x likelier in than light ones
    val df = ((1L to 4000L).map(i => (i, "s", 1L)) ++
      (4001L to 4040L).map(i => (i, "s", 100L))).toDF("id", "src", "w")
    val got = Sampling.ppsSample(df, Seq("src"), "id", "w", 40)
    assert(got.count() == 40, "all weights < step => exactly k rows")
    val heavy = got.filter(col("id") > 4000).count()
    assert(heavy >= 10, s"heavy rows under-represented: $heavy of 40")
    // stability: recompute reproduces the identical selection
    val again = Sampling.ppsSample(df, Seq("src"), "id", "w", 40)
    assert(got.except(again).isEmpty && again.except(got).isEmpty)
  }

  test("ppsSample drops null and non-positive weights; k beyond total keeps per-point uniques") {
    val df = Seq((1L, "s", Some(5L)), (2L, "s", None), (3L, "s", Some(0L)),
      (4L, "s", Some(-2L)), (5L, "s", Some(7L))).toDF("id", "src", "w")
    val got = Sampling.ppsSample(df, Seq("src"), "id", "w", 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(Set(1L, 5L)), s"selected an excluded row: $got")
    assert(got.nonEmpty)
  }

  test("epochMixture: integer weights copy exactly, zero drops, default applies") {
    val df = (1L to 50L).map(i => (i, if (i <= 20) "triple" else if (i <= 40) "drop" else "other"))
      .toDF("id", "src")
    val got = Sampling.epochMixture(df, "id", "src",
      Map("triple" -> 3.0, "drop" -> 0.0), defaultEpochs = 1.0)
    val bySrc = got.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.getOrElse("triple", 0L) == 60L) // 20 rows x 3 epochs
    assert(!bySrc.contains("drop"))
    assert(bySrc.getOrElse("other", 0L) == 10L)  // default 1.0 -> one epoch
    // epoch ids are contiguous from 0
    val eps = got.filter(col("src") === "triple").filter(col("id") === 1L)
      .select("epoch").collect().map(_.getLong(0)).sorted.toSeq
    assert(eps == Seq(0L, 1L, 2L))
  }

  test("epochMixture: fractional weight gives floor or ceil copies per key, deterministically") {
    val df = (1L to 400L).map(i => (i, "s")).toDF("id", "src")
    val got = Sampling.epochMixture(df, "id", "src", Map("s" -> 2.5))
    val perKey = got.groupBy("id").count().collect().map(_.getLong(1))
    assert(perKey.forall(c => c == 2L || c == 3L))
    val three = perKey.count(_ == 3L)
    assert(three > 0 && three < perKey.length, s"degenerate fractional pick: $three/400")
    // ~50% +- wide tolerance (binomial, n=400)
    assert(three > 120 && three < 280, s"fractional pick far from 0.5: $three/400")
    // stable: recompute reproduces the identical multiset
    val again = Sampling.epochMixture(df, "id", "src", Map("s" -> 2.5))
    assert(got.except(again).isEmpty && again.except(got).isEmpty)
  }

  test("splitTagN: partitions every row, respects fractions, upgrades a 2-way split") {
    val df = (1L to 5000L).toDF("id")
    val tagged = df.withColumn("s", Sampling.splitTagN(col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val counts = tagged.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000L)
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") - 4000L) < 200, s"train: ${counts("train")}")
    assert(math.abs(counts("val") - 500L) < 120, s"val: ${counts("val")}")
    // same hash line as the 2-way split: train sets are IDENTICAL, so a
    // 2-way corpus upgrades to 3-way without reassigning any train row
    val twoWay = df.withColumn("s", Sampling.splitTag(col("id"), 0.8))
      .filter(col("s") === "train").select("id")
    val threeWayTrain = tagged.filter(col("s") === "train").select("id")
    assert(twoWay.except(threeWayTrain).isEmpty && threeWayTrain.except(twoWay).isEmpty)
  }

  test("splitTagN rejects bad fraction sets") {
    intercept[IllegalArgumentException] {
      Sampling.splitTagN(col("id"), Seq("a" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.splitTagN(col("id"), Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.splitTagN(col("id"), Seq("a" -> 1.2, "b" -> -0.2))
    }
  }

  test("epochMixture rejects reserved column and out-of-range weights") {
    val df = Seq((1L, "s", 0L)).toDF("id", "src", "epoch")
    intercept[IllegalArgumentException] {
      Sampling.epochMixture(df, "id", "src", Map("s" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.epochMixture(df.drop("epoch"), "id", "src", Map("s" -> 65.0))
    }
  }

  test("sampleKPerGroup equals the md5-ordered window reference") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 500L).map(i => (i, s"g${i % 7}")).toDF("id", "grp")
    val got = Sampling.sampleKPerGroup(df, Seq("grp"), "id", 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val want = df.withColumn("_hex",
        md5(concat(col("id").cast("string"), lit(":samplek"))))
      .withColumn("_r", row_number().over(
        Window.partitionBy("grp").orderBy("_hex")))
      .filter(col("_r") <= 5)
      .collect().map(r => (r.getString(1), r.getInt(3), r.getLong(0))).toSet
    assert(got === want)
  }

  test("sampleKPerGroup is layout-invariant and bounded by group size") {
    val df = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val a = Sampling.sampleKPerGroup(df.repartition(1), Seq("grp"), "id", 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val b = Sampling.sampleKPerGroup(df.repartition(17), Seq("grp"), "id", 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b, "partition layout must not change the sample")
    // a 2-row group returns both its rows
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "grp")
    assert(Sampling.sampleKPerGroup(tiny, Seq("grp"), "id", 10).count() === 2L)
  }

  test("sampleKPerGroup with no group columns draws one global sample") {
    val df = (1L to 100L).map(i => (i, "z")).toDF("id", "grp")
    val got = Sampling.sampleKPerGroup(df, Nil, "id", 7).collect()
    assert(got.length === 7)
    assert(got.map(_.getInt(0)).toSeq === (1 to 7))
    intercept[IllegalArgumentException] {
      Sampling.sampleKPerGroup(df.withColumn("_t", lit(1)), Nil, "id", 1)
    }
  }

  test("sampleKPerGroup: a NULL group key is its own slice (the q106 convention)") {
    // groupBy keeps NULL as a real group — rows with an unknown slice get
    // sampled under it, never silently dropped or merged into a named slice
    val df = ((1L to 60L).map(i => (i, if (i % 3 == 0) null else s"g${i % 2}")))
      .toDF("id", "grp")
    val got = Sampling.sampleKPerGroup(df, Seq("grp"), "id", 4)
      .collect().map(r => (Option(r.getString(0)), r.getLong(2)))
    val nullSlice = got.filter(_._1.isEmpty).map(_._2).toSet
    assert(nullSlice.size === 4, s"NULL slice must yield k rows, got $nullSlice")
    assert(nullSlice.subsetOf((3L to 60L by 3L).toSet),
      "NULL-slice sample must come from the NULL-key rows only")
    assert(got.count(_._1.contains("g0")) === 4 && got.count(_._1.contains("g1")) === 4)
  }

  test("temperatureMixture matches the hand-computed threshold reference") {
    // replicate the contract end-to-end in plain Scala: sqrt weights, a
    // group-name-ordered fold, per-group rate, floor(rate*2^32) hex
    // threshold, md5 compare — exactly what the q114 DuckDB oracle replays
    val df = ((1L to 60L).map(i => (i, "g0")) ++ (61L to 360L).map(i => (i, "g1")))
      .toDF("id", "grp")
    val n = Map("g0" -> 60L, "g1" -> 300L)
    val w = n.map { case (g, c) => g -> math.sqrt(c.toDouble) }
    val tot = Seq("g0", "g1").foldLeft(0.0)((a, g) => a + w(g))
    def thr(g: String): String =
      f"${(100.0 * w(g) / (tot * n(g).toDouble) * 4294967296.0).toLong}%08x"
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = (1L to 360L).filter { i =>
      val g = if (i <= 60) "g0" else "g1"
      md5hex(s"$i:temp").take(8) < thr(g)
    }.toSet
    val got = Sampling.temperatureMixture(df, "id", "grp", budget = 100L)
      .collect().map(_.getLong(0)).toSet
    assert(got === want)
    // α=0.5 flattens: the small group's keep RATE must exceed the large one's
    val keptSmall = got.count(_ <= 60).toDouble / 60
    val keptLarge = got.count(_ > 60).toDouble / 300
    assert(keptSmall > keptLarge,
      s"temperature sampling must favor the small group: $keptSmall vs $keptLarge")
    // expected total is the budget (binomial around 100)
    assert(got.size > 60 && got.size < 140, s"total far from budget: ${got.size}")
  }

  test("temperatureMixture: saturated groups keep every row; layout-invariant") {
    // tiny group saturates (rate >= 1) while the big one is thinned
    val df = ((1L to 5L).map(i => (i, "rare")) ++ (6L to 2005L).map(i => (i, "big")))
      .toDF("id", "grp")
    val got = Sampling.temperatureMixture(df, "id", "grp", budget = 300L)
    val byGrp = got.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp("rare") == 5L, s"saturated group must keep all rows: $byGrp")
    assert(byGrp("big") < 2000L, s"big group must be thinned: $byGrp")
    val again = Sampling.temperatureMixture(df.repartition(13), "id", "grp", 300L)
    assert(got.except(again).isEmpty && again.except(got).isEmpty,
      "assignment must be stable across layouts")
    assert(got.columns.toSeq == Seq("id", "grp"), "schema must be preserved")
  }

  test("temperatureMixture rejects bad arguments and reserved columns") {
    val df = Seq((1L, "g")).toDF("id", "grp")
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(df, "id", "grp", budget = 0L)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(df, "id", "grp", budget = 10L, alpha = 1.5)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(df.withColumn("_rate", lit(1)), "id", "grp", 10L)
    }
  }

  test("shuffleOrder: dense per-shard positions, every row assigned, runs and layouts agree") {
    val df = (1L to 200L).toDF("id")
    val a = Sampling.shuffleOrder(df, "id", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.length == 200 && a.map(_._1).toSet == (1L to 200L).toSet)
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"shard $shard positions must be dense from 0")
    }
    val b = Sampling.shuffleOrder(df.repartition(7), "id", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq,
      "assignment must be layout-invariant")
  }

  test("shuffleOrder: appending keys preserves existing relative order within a shard") {
    val small = (1L to 100L).toDF("id")
    val big = (1L to 150L).toDF("id")
    def orderOf(df: org.apache.spark.sql.DataFrame) =
      Sampling.shuffleOrder(df, "id", nShards = 4)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(0)))
        .groupBy(_._1).map { case (s, rows) =>
          s -> rows.sortBy(_._2).map(_._3).toSeq
        }
    val before = orderOf(small)
    val after = orderOf(big)
    before.foreach { case (shard, ids) =>
      val surviving = after(shard).filter(ids.contains)
      assert(surviving == ids,
        s"shard $shard: old keys must keep their relative order after append")
    }
  }

  test("shuffleOrder: nShards=1 is the global md5 order; reserved columns rejected") {
    val df = (1L to 50L).toDF("id")
    val got = Sampling.shuffleOrder(df, "id", nShards = 1, domain = "g")
      .orderBy("pos").collect().map(_.getLong(0)).toSeq
    val want = (1L to 50L)
      .sortBy(i => java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:g".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8))
      .toSeq
    assert(got == want)
    intercept[IllegalArgumentException] {
      Sampling.shuffleOrder(df.withColumn("shard", lit(1)), "id", 2)
    }
  }

  // ---- curriculumBins ----

  private def binFixture = Seq(
    // (id, score, tokens) — total 100 tokens, k=4 => 25-token stages
    (1L, 0.10, 10L), (2L, 0.20, 10L), (3L, 0.30, 10L), (4L, 0.40, 10L),
    (5L, 0.50, 10L), (6L, 0.60, 10L), (7L, 0.70, 10L), (8L, 0.80, 10L),
    (9L, 0.85, 10L), (10L, 0.90, 10L)
  ).toDF("id", "score", "tok")

  test("curriculumBins: hand-computed cuts on an even-mass corpus") {
    val got = Sampling.curriculumBins(binFixture, "id", "score", "tok",
        k = 4, gridLo = 0.0, gridHi = 1.0, buckets = 8)
      .orderBy("id").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("bin")).toMap
    // prior 0,10,...,90; bin = min(3, prior*4 div 100)
    val want = (1L to 10L).map(i =>
      i -> math.min(3L, (i - 1) * 10 * 4 / 100).toInt).toMap
    assert(got == want)
  }

  test("curriculumBins: grid choice never changes the cut (order-preserving buckets)") {
    val base = Sampling.curriculumBins(binFixture, "id", "score", "tok",
        k = 3, gridLo = 0.0, gridHi = 1.0, buckets = 256)
      .orderBy("id").collect().map(_.getAs[Int]("bin")).toSeq
    for ((lo, hi, b) <- Seq((0.0, 2.0, 4), (-5.0, 5.0, 1), (0.05, 0.86, 17))) {
      val alt = Sampling.curriculumBins(binFixture, "id", "score", "tok",
          k = 3, gridLo = lo, gridHi = hi, buckets = b)
        .orderBy("id").collect().map(_.getAs[Int]("bin")).toSeq
      assert(alt == base, s"grid [$lo,$hi)x$b changed the bins")
    }
  }

  test("curriculumBins: each bin's token mass is within one document of total/k") {
    val docs = (1L to 200L).map { i =>
      (i, (i % 37).toDouble / 37.0, 1L + (i * 7) % 50)
    }.toDF("id", "score", "tok")
    val k = 5
    val out = Sampling.curriculumBins(docs, "id", "score", "tok",
      k = k, gridLo = 0.0, gridHi = 1.0)
    val masses = out.groupBy("bin").agg(sum("tok").as("m"))
      .collect().map(r => r.getAs[Int]("bin") -> r.getAs[Long]("m")).toMap
    val total = masses.values.sum
    val maxDoc = 50L
    assert(masses.keySet == (0 until k).toSet)
    masses.values.foreach { m =>
      assert(math.abs(m - total.toDouble / k) <= maxDoc,
        s"bin mass $m vs target ${total / k}")
    }
  }

  test("curriculumBins: differential vs the single-window reference; ties on key") {
    val docs = (1L to 120L).map { i =>
      (i, ((i * 13) % 7).toDouble, 1L + i % 9)  // heavy score ties
    }.toDF("id", "score", "tok")
    val k = 4
    val got = Sampling.curriculumBins(docs, "id", "score", "tok",
        k = k, gridLo = 0.0, gridHi = 7.0, buckets = 16)
      .orderBy("id").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("bin")).toMap
    val rows = docs.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, s, _) => (s, id) }
    val total = math.max(rows.map(_._3).sum, 1L)
    var prior = 0L
    val want = rows.map { case (id, _, t) =>
      val bin = math.min(k - 1L, prior * k / total).toInt
      prior += t
      id -> bin
    }.toMap
    assert(got == want)
  }

  test("curriculumBins plan: the buckets-sized offsets table broadcasts back") {
    // the 100 TB contract: the only corpus-scale movements are the offsets
    // aggregation and the per-bucket window exchange (both keyed by _b);
    // the offsets table itself (≤ `buckets` rows) must come back as a
    // broadcast join, never a shuffled join of the corpus
    val docs = (1L to 400L).map(i => (i, (i % 11).toDouble, 1L + i % 5))
      .toDF("id", "score", "tok")
    val df = Sampling.curriculumBins(docs, "id", "score", "tok",
      k = 4, gridLo = 0.0, gridHi = 11.0, buckets = 32)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"offsets must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"no corpus-vs-offsets shuffle join allowed:\n$plan")
  }

  test("curriculumBins rejects bad arguments and reserved columns") {
    intercept[IllegalArgumentException] {
      Sampling.curriculumBins(binFixture, "id", "score", "tok", k = 0, 0.0, 1.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.curriculumBins(binFixture, "id", "score", "tok", k = 2, 1.0, 1.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.curriculumBins(binFixture.withColumn("bin", lit(1)),
        "id", "score", "tok", k = 2, 0.0, 1.0)
    }
  }

  // ---- interleaveOrder ----

  test("interleaveOrder: progress replays the (2r-1)/2n formula over md5 rank") {
    val df = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"), (6L, "c")
    ).toDF("id", "src")
    val got = Sampling.interleaveOrder(df, "id", "src", domain = "ti")
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("pos_in_group"),
        r.getAs[Double]("progress")))
      .sortBy(_._1)
    def h(i: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:ti".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val byGroup = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"), (6L, "c"))
      .groupBy(_._2)
    val want = byGroup.toSeq.flatMap { case (_, rows) =>
      val n = rows.size.toLong
      rows.sortBy(r => (h(r._1), r._1)).zipWithIndex.map { case ((id, _), i) =>
        (id, i + 1L, (2L * (i + 1) - 1).toDouble / (2L * n).toDouble)
      }
    }.sortBy(_._1)
    assert(got.toSeq == want)
  }

  // Discrepancy bound: per group the count at progress p is
  // floor(n_g·p + 1/2) (±1/2), and the prefix length itself deviates by at
  // most G/2 from N·p — so |count − proportional| ≤ 1/2 + (G/2)·(n_g/N)
  // < 2 for G = 3 groups.
  test("interleaveOrder: every prefix of the progress order is proportional within 2 docs") {
    val df = ((1L to 60L).map((_, "big")) ++ (61L to 80L).map((_, "mid")) ++
      (81L to 85L).map((_, "small"))).toDF("id", "src")
    val ordered = Sampling.interleaveOrder(df, "id", "src")
      .orderBy(col("progress"), col("src"), col("id"))
      .collect().map(r => r.getString(1))
    val sizes = Map("big" -> 60.0, "mid" -> 20.0, "small" -> 5.0)
    val totalN = 85.0
    val running = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    ordered.zipWithIndex.foreach { case (src, i) =>
      running(src) += 1
      sizes.foreach { case (g, n) =>
        val expected = (i + 1) * n / totalN
        assert(math.abs(running(g) - expected) <= 2.0,
          s"prefix ${i + 1}: group $g has ${running(g)}, expected ~$expected")
      }
    }
  }

  test("interleaveOrder rejects reserved columns") {
    intercept[IllegalArgumentException] {
      Sampling.interleaveOrder(
        Seq((1L, "a")).toDF("id", "src").withColumn("progress", lit(0.0)),
        "id", "src")
    }
  }

  // ---- rendezvousAssign ----

  test("rendezvousAssign: shares track weights; assignment is layout-invariant") {
    val df = (1L to 4000L).toDF("id")
    val counts = Sampling.rendezvousAssign(df, "id",
        Seq("a" -> 1.0, "b" -> 3.0))
      .groupBy("node").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") > 800 && counts("a") < 1200, s"shares off: $counts")
    assert(counts("a") + counts("b") == 4000L)
    val base = Sampling.rendezvousAssign(df, "id", Seq("a" -> 1.0, "b" -> 3.0))
    val shuffled = Sampling.rendezvousAssign(df.repartition(13), "id",
      Seq("a" -> 1.0, "b" -> 3.0))
    assert(base.except(shuffled).isEmpty && shuffled.except(base).isEmpty)
  }

  test("rendezvousAssign: adding a node only moves keys TO the new node") {
    val df = (1L to 2000L).toDF("id")
    val before = Sampling.rendezvousAssign(df, "id",
        Seq("a" -> 1.0, "b" -> 2.0))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = Sampling.rendezvousAssign(df, "id",
        Seq("a" -> 1.0, "b" -> 2.0, "c" -> 1.0))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val moved = before.keys.filter(k => before(k) != after(k))
    assert(moved.nonEmpty, "new node captured nothing — weights broken")
    assert(moved.forall(k => after(k) == "c"),
      "a key moved between SURVIVING nodes — not minimal movement")
  }

  test("rendezvousAssign is map-only and validates its arguments") {
    val df = (1L to 10L).toDF("id")
    val plan = Sampling.rendezvousAssign(df, "id", Seq("a" -> 1.0, "b" -> 1.0))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"HRW must be map-only:\n$plan")
    intercept[IllegalArgumentException] {
      Sampling.rendezvousAssign(df, "id", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Sampling.rendezvousAssign(df, "id", Seq("a" -> 0.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.rendezvousAssign(df, "id", Seq("a" -> 1.0, "a" -> 2.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.rendezvousAssign(df.withColumn("node", lit("x")), "id",
        Seq("a" -> 1.0))
    }
  }

  // ---- unimaxQuotas ----

  /** one weighted row per (group, weight) — quotas depend only on sizes */
  private def sized(sizes: (String, Long)*) =
    sizes.toSeq.toDF("g", "w")

  test("unimaxQuotas: hand-computed mixed capped/uncapped allocation") {
    // sizes asc: a=100, b=200, c=1000; cap=2.0 epochs; budget=1000.
    // greedy: a: min(200, 1000/3=333.33) = 200 capped
    //         b: min(400, 800/2=400)     = 400 capped (<= holds at equality)
    //         c: min(2000, 400/1=400)    = 400 uncapped
    val out = Sampling.unimaxQuotas(
        sized("a" -> 100L, "b" -> 200L, "c" -> 1000L), "g", "w",
        budget = 1000L, epochCap = 2.0)
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("a", 100L, 200L, true, 200.0, 2.0),
      ("b", 200L, 400L, true, 400.0, 2.0),
      ("c", 1000L, 2000L, false, 400.0, 0.4)))
  }

  test("unimaxQuotas: budget above total caps leaves every group capped") {
    val out = Sampling.unimaxQuotas(
        sized("a" -> 10L, "b" -> 20L), "g", "w",
        budget = 1000L, epochCap = 2.0)
      .collect().map(r => (r.getString(0), r.getBoolean(3), r.getDouble(4)))
    assert(out.toSet == Set(("a", true, 20.0), ("b", true, 40.0)))
  }

  test("unimaxQuotas: tight budget gives every group the equal share") {
    val out = Sampling.unimaxQuotas(
        sized("a" -> 1000L, "b" -> 2000L, "c" -> 3000L, "d" -> 4000L),
        "g", "w", budget = 100L, epochCap = 1.0)
      .collect().map(r => (r.getString(0), r.getBoolean(3), r.getDouble(4)))
    assert(out.toSet == Set(("a", false, 25.0), ("b", false, 25.0),
      ("c", false, 25.0), ("d", false, 25.0)))
  }

  test("unimaxQuotas: equal sizes tie-break on group name; quotas sum to budget") {
    // two equal small groups: caps 60 each, then two big uncapped sharing
    val out = Sampling.unimaxQuotas(
        sized("b2" -> 30L, "a1" -> 30L, "z" -> 500L, "y" -> 500L),
        "g", "w", budget = 300L, epochCap = 2.0)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getBoolean(3), r.getDouble(4)))
    assert(out.toSeq == Seq(("a1", true, 60.0), ("b2", true, 60.0),
      ("y", false, 90.0), ("z", false, 90.0)))
    assert(out.map(_._3).sum == 300.0)
  }

  test("unimaxQuotas aggregates multi-row groups and rejects bad arguments") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 30L)).toDF("g", "w")
    val out = Sampling.unimaxQuotas(df, "g", "w", 1000L, 2.0)
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 10L), ("b", 30L)))
    intercept[IllegalArgumentException] {
      Sampling.unimaxQuotas(df, "g", "w", 0L, 2.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.unimaxQuotas(df, "g", "w", 100L, 0.0)
    }
  }

  test("weightedSampleK: window differential, heavy row wins, weight gates") {
    import org.apache.spark.sql.functions._
    val df = (1 to 50).map(i => ("g", i.toLong, (i % 7 + 1).toLong))
      .toDF("g", "id", "w")
    val got = Sampling.weightedSampleK(df, Seq("g"), "id", "w", k = 8)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    // naive single-window replay of the same ES keys
    val hex = md5(concat(col("id").cast("string"), lit(":wsk")))
    val u = (conv(substring(hex, 1, 13), 16, 10).cast("long") + lit(1L))
      .cast("double") / lit(4503599627370497.0)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy((log(u) / col("w").cast("double")).desc,
        conv(substring(hex, 14, 13), 16, 10).cast("long"))
    val naive = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 8).orderBy("rank")
      .collect().map(r => (r.getInt(3), r.getLong(1))).toSeq
    assert(got == naive)
    // an overwhelming weight pins rank 1 (ln(u)/w -> 0^-, beats all)
    val heavy = df.union(Seq(("g", 999L, 1000000000000000L)).toDF("g", "id", "w"))
    assert(Sampling.weightedSampleK(heavy, Seq("g"), "id", "w", k = 3)
      .filter(col("rank") === 1).head.getLong(2) == 999L)
    // null / non-positive weights are excluded, never sampled
    val gated = Seq(("g", 1L, Some(0L)), ("g", 2L, Option.empty[Long]),
      ("g", 3L, Some(5L))).toDF("g", "id", "w")
    assert(Sampling.weightedSampleK(gated, Seq("g"), "id", "w", k = 3)
      .collect().map(_.getLong(2)).toSeq == Seq(3L))
  }

  test("rendezvousRebalance: only the new node gains keys; survivors stable") {
    val ids = (1L to 300L).toDF("id")
    val before = Seq("a" -> 1.0, "b" -> 1.0, "c" -> 2.0)
    val got = Sampling.rendezvousRebalance(ids, "id", before,
        before :+ ("d" -> 1.0))
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getBoolean(3)))
    // THE HRW guarantee: a topology grow moves keys ONLY onto the new
    // node — no key ever hops between surviving nodes
    got.foreach { case (b, a, moved) =>
      if (moved) assert(a == "d", s"moved key landed on survivor $a")
      else assert(a == b)
    }
    val movedFrac = got.count(_._3).toDouble / got.length
    assert(movedFrac > 0.05 && movedFrac < 0.45,
      s"new equal-weight node should win roughly w/Σw = 1/5: $movedFrac")
    // rebalance agrees with the assignment operator on both topologies
    val direct = Sampling.rendezvousAssign(ids, "id", before)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Sampling.rendezvousRebalance(ids, "id", before, before).collect()
      .foreach { r =>
        assert(r.getString(1) == direct(r.getLong(0)) && !r.getBoolean(3))
      }
  }

  test("temperatureQuotas: sqrt shares, Hamilton rounding sums to budget") {
    // sizes 100 / 400 / 2500 -> sqrt weights 10 / 20 / 50, W = 80
    // budget 1000: raw = 125 / 250 / 625 exactly -> no remainders
    val rows = Seq.tabulate(100)(i => ("a", 1L)) ++
      Seq.tabulate(4)(i => ("b", 100L)) ++ Seq(("c", 2500L))
    val df = rows.toDF("g", "w")
    val got = Sampling.temperatureQuotas(df, "g", "w",
        budget = 1000L, temperature = 2)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(4)))
    assert(got.toSeq == Seq(("a", 100L, 10.0, 125L), ("b", 400L, 20.0, 250L),
      ("c", 2500L, 50.0, 625L)))
    // temperature flattens: T=1 is proportional (a gets 100/3000 of 999);
    // at T=2 the tail group's share strictly rises
    val t1 = Sampling.temperatureQuotas(df, "g", "w", 999L, temperature = 1)
      .filter(col("g") === "a").collect().head.getDouble(3)
    val t2 = Sampling.temperatureQuotas(df, "g", "w", 999L, temperature = 2)
      .filter(col("g") === "a").collect().head.getDouble(3)
    assert(t2 > t1)
    // Hamilton: quotas sum to the budget EXACTLY even with remainders
    val odd = Sampling.temperatureQuotas(df, "g", "w", 997L, temperature = 4)
      .agg(org.apache.spark.sql.functions.sum("quota")).collect().head.getLong(0)
    assert(odd == 997L)
    intercept[IllegalArgumentException] {
      Sampling.temperatureQuotas(df, "g", "w", 100L, temperature = 3)
    }
  }
}
