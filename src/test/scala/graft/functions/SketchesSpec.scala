package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkFunSuite

class SketchesSpec extends SparkFunSuite {
  import spark.implicits._

  test("hllSketch estimate tracks exact distinct within 3 standard errors") {
    // p=12 -> se ~ 1.6%; check across regimes: linear-counting (small n)
    // and the raw estimator (n >> m is not reachable cheaply; n ~ m/2 is)
    for (n <- Seq(100, 1000, 3000)) {
      val df = (1 to n).map(i => s"item-$i").toDF("v")
      val est = df.agg(Sketches.hllEstimate(Sketches.hllSketch(col("v"), 12)))
        .head.getLong(0)
      assert(math.abs(est - n).toDouble / n <= 3 * 1.04 / math.sqrt(4096),
        s"n=$n est=$est")
    }
  }

  test("merged per-source sketches are byte-identical to the direct sketch") {
    // max is associative/commutative/idempotent: merging partial sketches
    // MUST reproduce the whole-corpus sketch exactly, not approximately
    val df = (1 to 2000).map(i => (s"src${i % 7}", s"doc-${i % 900}")).toDF("src", "v")
    val direct = df.agg(Sketches.hllSketch(col("v"), 10)).head.getAs[Array[Byte]](0)
    val merged = df.groupBy("src").agg(Sketches.hllSketch(col("v"), 10).as("sk"))
      .agg(Sketches.hllMerge(col("sk"), 10)).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, merged))
    // idempotence: re-merging the merged sketch with itself changes nothing
    val twice = Seq(direct, direct).toDF("sk")
      .agg(Sketches.hllMerge(col("sk"), 10)).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, twice))
  }

  test("hll ignores nulls and duplicate values do not move the estimate") {
    val dup = (Seq.fill(500)("same") ++ Seq.fill(3)(null.asInstanceOf[String])).toDF("v")
    val est = dup.agg(Sketches.hllEstimate(Sketches.hllSketch(col("v"), 12)))
      .head.getLong(0)
    assert(est == 1L)
  }

  test("hllMerge rejects mixed precisions") {
    val a = Seq("x").toDF("v").agg(Sketches.hllSketch(col("v"), 10)).head.getAs[Array[Byte]](0)
    val e = intercept[Exception] {
      Seq(a).toDF("sk").agg(Sketches.hllMerge(col("sk"), 12)).collect()
    }
    assert(e.getMessage != null)
  }

  test("freqItems retains every item above the MG frequency guarantee") {
    // stream of 10_000: 'hot' 30%, 'warm' 10%, tail of singletons.
    // capacity 49 -> guarantee threshold N/50 = 2%: hot and warm MUST
    // survive with counts undershooting by at most 200
    val items = Seq.fill(3000)("hot") ++ Seq.fill(1000)("warm") ++
      (1 to 6000).map(i => s"tail-$i")
    val rng = new scala.util.Random(11)
    val df = rng.shuffle(items).toDF("v").repartition(8)
    val got = df.agg(Sketches.freqItems(col("v"), 49).as("fi"))
      .select(explode(col("fi"))).select("col.item", "col.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = items.size
    assert(got.contains("hot") && got("hot") >= 3000 - n / 50 && got("hot") <= 3000)
    assert(got.contains("warm") && got("warm") >= 1000 - n / 50 && got("warm") <= 1000)
    assert(got.size <= 49)
  }

  test("freqItems is exact when capacity exceeds the distinct-item count") {
    val items = Seq.fill(7)("a") ++ Seq.fill(5)("b") ++ Seq.fill(5)("az") ++ Seq("c")
    val df = items.toDF("v").repartition(4)
    val got = df.agg(Sketches.freqItems(col("v"), 100).as("fi"))
      .select(explode(col("fi"))).select("col.item", "col.cnt")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // exact counts, count-desc then item-asc (ties: "az" < "b" lexically)
    assert(got == Seq(("a", 7L), ("az", 5L), ("b", 5L), ("c", 1L)))
  }

  test("countMin: never undershoots, exact when width dwarfs cardinality, merge == direct") {
    // 37 distinct keys into 5x2048 counters: collisions possible but the
    // min-across-depth estimate equals the true count with overwhelming
    // probability; the never-undershoot guarantee is unconditional
    val rows = (1 to 600).map(i => (s"src${i % 3}", s"k${i % 37}"))
    val df = rows.toDF("src", "v").repartition(8)
    val sk = df.agg(Sketches.countMin(col("v")).as("sk"))
    val trueCounts = rows.groupBy(_._2).map { case (k, o) => k -> o.size.toLong }
    val probes = Seq("k0", "k5", "k36", "absent-key")
    val got = sk.select(probes.map(p =>
      Sketches.countMinQuery(col("sk"), lit(p)).as(p)): _*).head
    probes.zipWithIndex.foreach { case (p, i) =>
      val est = got.getLong(i)
      val truth = trueCounts.getOrElse(p, 0L)
      assert(est >= truth, s"$p: CM undershot ($est < $truth)")
      assert(est <= truth + 2, s"$p: CM overshot far ($est vs $truth)")
    }
    // merged per-source sketches are byte-identical to the direct sketch
    // (counter addition is associative/commutative)
    val direct = sk.head.getAs[Array[Byte]](0)
    val merged = df.groupBy("src").agg(Sketches.countMin(col("v")).as("sk"))
      .agg(Sketches.countMinMerge(col("sk"))).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, merged))
  }

  test("countMinQuery: null probe yields null, not the hash(seed) bucket") {
    // build a sketch whose rows include nulls; the build side skips them,
    // so a null probe must propagate null rather than return the count of
    // whatever key collides with xxhash64's bare-null output (the seed)
    val df = Seq(Some("a"), Some("a"), None, Some("b")).toDF("v")
    val sk = df.agg(Sketches.countMin(col("v")).as("sk"))
    val row = sk.select(
      Sketches.countMinQuery(col("sk"), lit(null).cast("string")).as("n"),
      Sketches.countMinQuery(col("sk"), lit("a")).as("a")).head
    assert(row.isNullAt(0), "null probe must yield null")
    assert(row.getLong(1) == 2L)
  }

  test("countMin rejects mismatched geometry on merge") {
    val a = Seq("x").toDF("v")
      .agg(Sketches.countMin(col("v"), depth = 3, width = 64)).head.getAs[Array[Byte]](0)
    val e = intercept[Exception] {
      Seq(a).toDF("sk").agg(Sketches.countMinMerge(col("sk"), depth = 5, width = 2048)).collect()
    }
    assert(e.getMessage != null)
  }

  test("freqItems grouped + null items ignored") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", null), ("g2", "y"))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(Sketches.freqItems(col("v"), 4).as("fi"))
      .select(col("g"), explode(col("fi")))
      .select("g", "col.item", "col.cnt")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("g1", "x", 2L), ("g2", "y", 1L)))
  }

  // values 1..n as doubles make rank arithmetic transparent: the sketch
  // only stores values it saw, so the estimate IS a rank, and the
  // ε-approximate-quantile check is |est − ceil(p·n)| ≤ ε·n
  private def rankErrBound(n: Int, k: Int, extraLevels: Int = 0): Double = {
    val h = math.ceil(math.log(n.toDouble / k) / math.log(2)) + extraLevels
    h * n / (2.0 * k)
  }

  test("quantileSketch: rank error within the deterministic MRL bound, random and sorted streams") {
    val n = 50000
    val k = 256
    val bound = rankErrBound(n, k)
    val ps = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val rng = new scala.util.Random(7)
    val streams = Seq(
      // shuffled: the benign case
      "shuffled" -> rng.shuffle((1 to n).toVector),
      // sorted runs: the adversarial case for deterministic alternation
      // (every compaction sees an already-sorted buffer, so selection
      // bias accumulates in one direction if alternation is broken)
      "ascending" -> (1 to n).toVector,
      "descending" -> (n to 1 by -1).toVector)
    for ((label, data) <- streams) {
      val df = data.map(_.toDouble).toDF("v") // local chunks keep run order
      val sk = df.agg(Sketches.quantileSketch(col("v"), k).as("sk"))
      val row = sk.select(ps.map(p =>
        Sketches.quantileSketchQuery(col("sk"), lit(p)).as(s"p$p")): _*).head
      ps.zipWithIndex.foreach { case (p, i) =>
        val est = row.getDouble(i)
        val target = math.ceil(p * n)
        assert(math.abs(est - target) <= bound,
          s"$label p=$p est=$est target=$target bound=$bound")
      }
    }
  }

  test("quantileSketch is exact below capacity and at the extremes") {
    // n < k: no compaction ever fires, the sketch IS the data
    val df = Seq(5.0, 1.0, 9.0, 3.0, 7.0).toDF("v")
    val sk = df.agg(Sketches.quantileSketch(col("v"), 8).as("sk"))
    val got = sk.select(
      Sketches.quantileSketchQuery(col("sk"), lit(0.0)).as("lo"),
      Sketches.quantileSketchQuery(col("sk"), lit(0.5)).as("med"),
      Sketches.quantileSketchQuery(col("sk"), lit(1.0)).as("hi")).head
    // lower-quantile convention: rank ceil(0.5·5) = 3 -> third smallest
    assert(got.getDouble(0) == 1.0 && got.getDouble(1) == 5.0 &&
      got.getDouble(2) == 9.0)
  }

  test("quantileSketch ignores null/NaN; an all-null group queries as null") {
    val df = Seq(Some(1.0), None, Some(Double.NaN), Some(3.0)).toDF("v")
    val r = df.agg(Sketches.quantileSketch(col("v"), 8).as("sk"))
      .select(Sketches.quantileSketchQuery(col("sk"), lit(1.0))).head
    assert(r.getDouble(0) == 3.0, "max must come from real values only")
    val empty = Seq(Option.empty[Double]).toDF("v")
      .agg(Sketches.quantileSketch(col("v"), 8).as("sk"))
      .select(Sketches.quantileSketchQuery(col("sk"), lit(0.5))).head
    assert(empty.isNullAt(0), "empty sketch must query as null")
  }

  test("per-source quantile sketches merge within the error bound") {
    val n = 20000
    val k = 256
    // merging partials can add a compaction round beyond the insert-only
    // accounting; one extra level of slack covers it
    val bound = rankErrBound(n, k, extraLevels = 2)
    val rng = new scala.util.Random(13)
    val rows = rng.shuffle((1 to n).toVector).map(i => (s"src${i % 7}", i.toDouble))
    val merged = rows.toDF("src", "v").repartition(8)
      .groupBy("src").agg(Sketches.quantileSketch(col("v"), k).as("sk"))
      .agg(Sketches.quantileSketchMerge(col("sk"), k).as("sk"))
    val ps = Seq(0.1, 0.5, 0.9)
    val row = merged.select(ps.map(p =>
      Sketches.quantileSketchQuery(col("sk"), lit(p)).as(s"p$p")): _*).head
    ps.zipWithIndex.foreach { case (p, i) =>
      val est = row.getDouble(i)
      val target = math.ceil(p * n)
      assert(math.abs(est - target) <= bound,
        s"merged p=$p est=$est target=$target bound=$bound")
    }
  }

  test("quantile sketch bytes are deterministic for a fixed partition layout") {
    // the alternating-parity compaction replaces KLL's random coin: the
    // same single-partition stream must produce bit-identical bytes
    val data = (1 to 5000).map(i => ((i * 2654435761L) % 9973).toDouble)
    def build(): Array[Byte] = data.toDF("v").coalesce(1)
      .agg(Sketches.quantileSketch(col("v"), 64)).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(), build()))
  }

  test("quantileSketchMerge rejects mismatched k") {
    val a = Seq(1.0).toDF("v")
      .agg(Sketches.quantileSketch(col("v"), 8)).head.getAs[Array[Byte]](0)
    val e = intercept[Exception] {
      Seq(a).toDF("sk").agg(Sketches.quantileSketchMerge(col("sk"), 16)).collect()
    }
    assert(e.getMessage != null)
  }
}
