package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkFunSuite

class QuantilesSpec extends SparkFunSuite {
  import spark.implicits._

  private def builtin(vs: Seq[Double], ps: Seq[Double]): Seq[Double] = {
    val arr = ps.mkString("array(", ", ", ")")
    vs.toDF("v").agg(expr(s"percentile(v, $arr)")).head
      .getSeq[Double](0).toSeq
  }

  test("matches the built-in exact percentile on random data") {
    val rng = new scala.util.Random(42)
    val vs = Seq.fill(5000)(rng.nextDouble() * 1000 - 500)
    val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    val got = Quantiles.exact(vs.toDF("v"), "v", ps)
      .orderBy("p").collect().map(_.getDouble(1)).toSeq
    assert(got == builtin(vs, ps))
  }

  test("ties spanning partitions do not disturb the order statistics") {
    val vs = Seq.fill(2000)(7.0) ++ Seq.fill(2000)(3.0) ++ Seq.fill(1000)(5.0)
    val ps = Seq(0.1, 0.4, 0.5, 0.9)
    val got = Quantiles.exact(vs.toDF("v"), "v", ps)
      .orderBy("p").collect().map(_.getDouble(1)).toSeq
    assert(got == builtin(vs, ps))
  }

  test("single row, nulls ignored, empty input") {
    val one = Seq(Some(42.0), None, None).toDF("v")
    assert(Quantiles.exact(one, "v", Seq(0.0, 0.5, 1.0))
      .collect().forall(_.getDouble(1) == 42.0))
    val empty = Seq.empty[Option[Double]].toDF("v")
    assert(Quantiles.exact(empty, "v", Seq(0.5)).collect().forall(_.isNullAt(1)))
  }

  test("interpolates between ranks (R-7)") {
    // values 10,20,30,40: p=0.5 -> h=1.5 -> 20 + 0.5*(30-20) = 25
    val got = Quantiles.exact(Seq(10.0, 20.0, 30.0, 40.0).toDF("v"), "v", Seq(0.5))
      .head.getDouble(1)
    assert(got == 25.0)
  }

  test("exactGrouped matches the built-in per-group percentile bit-for-bit") {
    val rng = new scala.util.Random(7)
    // skewed group sizes: one giant group (the regime the operator exists
    // for), several small ones, one singleton
    val rows = Seq.tabulate(8000)(i => ("big", rng.nextDouble() * 100)) ++
      Seq.tabulate(40)(i => ("mid", rng.nextDouble() * 5 - 10)) ++
      Seq(("one", 3.14))
    val df = rows.toDF("g", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.95, 1.0)
    val got = Quantiles.exactGrouped(df, Seq("g"), "v", ps)
      .orderBy("g", "p").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val arr = ps.mkString("array(", ", ", ")")
    val want = df.groupBy("g").agg(expr(s"percentile(v, $arr)").as("q"))
      .select(col("g"), posexplode(col("q")))
      .orderBy("g", "pos").collect()
      .map(r => (r.getString(0), ps(r.getInt(1)), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("exactGrouped: groups straddling partitions, nulls/NaN dropped, all-null group absent") {
    val rows = Seq.fill(3000)(("a", Some(1.0))) ++ Seq.fill(3000)(("b", Some(2.0))) ++
      Seq(("a", None), ("c", None), ("b", Some(Double.NaN)))
    val df = rows.toDF("g", "v")
    val got = Quantiles.exactGrouped(df, Seq("g"), "v", Seq(0.5))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(got == Seq(("a", 1.0), ("b", 2.0))) // no "c" row
  }

  test("exactGrouped is invariant to input partitioning (1 vs 64 partitions)") {
    val rng = new scala.util.Random(23)
    val df = Seq.tabulate(4000)(i => (s"g${i % 5}", rng.nextDouble() * 100)).toDF("g", "v")
    val ps = Seq(0.1, 0.5, 0.9)
    def run(parts: Int) = Quantiles.exactGrouped(df.repartition(parts), Seq("g"), "v", ps)
      .orderBy("g", "p").collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(run(1) == run(64))
  }

  test("exactGrouped rejects reserved group-column names; empty input yields empty output") {
    intercept[IllegalArgumentException] {
      Quantiles.exactGrouped(Seq((1, 1.0)).toDF("_pid", "v"), Seq("_pid"), "v", Seq(0.5))
    }
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    assert(Quantiles.exactGrouped(empty, Seq("g"), "v", Seq(0.5)).count() == 0)
  }

  test("winsorize clips exactly to the rounded group quantiles") {
    // g: 1..100 -> p05 = 1 + 99*0.05 = 5.95, p95 = 1 + 99*0.95 = 95.05
    val df = (1 to 100).map(v => ("g", v.toDouble)).toDF("g", "v")
    val got = Quantiles.winsorize(df, Seq("g"), "v", 0.05, 0.95)
      .select("v", "winsorized").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got(1.0) == 5.95 && got(5.0) == 5.95)
    assert(got(50.0) == 50.0)
    assert(got(96.0) == 95.05 && got(100.0) == 95.05)
    intercept[IllegalArgumentException] {
      Quantiles.winsorize(df.withColumn("winsorized", col("v")), Seq("g"), "v")
    }
  }

  test("winsorize == built-in percentile clip on random grouped data") {
    val rng = new scala.util.Random(31)
    val df = Seq.tabulate(3000)(i => (s"g${i % 4}", rng.nextDouble() * 1000 - 500))
      .toDF("g", "v")
    val got = Quantiles.winsorize(df, Seq("g"), "v", 0.1, 0.9)
      .select("g", "v", "winsorized").collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val bounds = df.groupBy("g")
      .agg(expr("round(percentile(v, 0.1), 6)").as("lo"),
        expr("round(percentile(v, 0.9), 6)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    df.collect().foreach { r =>
      val (g, v) = (r.getString(0), r.getDouble(1))
      val (lo, hi) = bounds(g)
      assert(got((g, v)) == math.min(math.max(v, lo), hi), s"($g, $v)")
    }
  }

  test("winsorize preserves rows of all-null groups; null/NaN values yield null out") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)), ("a", None),
      ("a", Some(Double.NaN)),
      ("allnull", None), ("allnull", None)
    ).toDF("g", "v")
    val got = Quantiles.winsorize(df, Seq("g"), "v", 0.05, 0.95)
    // every input row survives — the boundless group is NOT dropped
    assert(got.count() == 7)
    val rows = got.collect().map(r =>
      (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]), Option(r.get(2))))
    // null and NaN values and boundless-group rows carry a null
    // winsorized — never a value clamped to a bound (NaN orders above
    // every double, so an unguarded clip would clamp it to the UPPER
    // bound) or passed through unclipped
    rows.foreach { case (g, v, w) =>
      if (v.isEmpty || v.exists(_.isNaN) || g == "allnull")
        assert(w.isEmpty, s"($g, $v) -> $w")
      else assert(w.nonEmpty)
    }
  }

  test("robustOutlierStats flags exactly the planted wild values") {
    // tight cluster around 0 with two wild points; median≈0, MAD small
    val base = Seq.tabulate(101)(i => ("g1", (i - 50) / 100.0)) // -0.5 .. 0.5
    val wild = Seq(("g1", 500.0), ("g1", -900.0))
    val clean = Seq.tabulate(51)(i => ("g2", i / 10.0)) // no outliers at k=3? MAD=1.3, med 2.5 -> max dev 2.5 < 3.9
    val df = (base ++ wild ++ clean).toDF("g", "v")
    val got = Quantiles.robustOutlierStats(df, Seq("g"), "v", k = 3.0)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(3))).toSeq
    assert(got == Seq(("g1", 2L), ("g2", 0L)))
  }

  // ---- percentileRank ----

  test("percentileRank: hand-computed ranks, RANK tie semantics, singleton group") {
    val df = Seq(
      ("a", 1L, 0.1), ("a", 2L, 0.5), ("a", 3L, 0.5), ("a", 4L, 0.9),
      ("b", 5L, 7.0)
    ).toDF("g", "id", "score")
    val got = Quantiles.percentileRank(df, Seq("g"), "score", 0.0, 1.0, buckets = 4)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("rank"), r.getAs[Double]("pct")))
    // group a: ranks 1, 2, 2, 4 over n=4 → pct (r-1)/3; singleton b → 0.0
    assert(got.toSeq == Seq(
      (1L, 1L, 0.0), (2L, 2L, 1.0 / 3.0), (3L, 2L, 1.0 / 3.0),
      (4L, 4L, 1.0), (5L, 1L, 0.0)))
  }

  test("percentileRank equals the whole-group window reference for any grid") {
    val df = (1L to 150L).map { i =>
      (s"g${i % 4}", i, ((i * 29) % 13).toDouble)  // heavy ties
    }.toDF("g", "id", "score")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("score")
    val want = df
      .withColumn("rank", rank().over(w).cast("long"))
      .withColumn("pct", (col("rank") - 1L).cast("double") /
        greatest(count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("g")) - 1L, lit(1L)).cast("double"))
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("rank"), r.getAs[Double]("pct")))
    for ((lo, hi, b) <- Seq((0.0, 13.0, 8), (-2.0, 20.0, 256), (3.0, 4.0, 1))) {
      val got = Quantiles.percentileRank(df, Seq("g"), "score", lo, hi, b)
        .orderBy("id").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("rank"), r.getAs[Double]("pct")))
      assert(got.toSeq == want.toSeq, s"grid [$lo,$hi)x$b diverged")
    }
  }

  test("percentileRank: null/NaN scores drop; empty groupCols calibrates globally") {
    val df = Seq(
      (1L, Some(2.0)), (2L, None), (3L, Some(1.0)), (4L, Some(Double.NaN)),
      (5L, Some(3.0))
    ).map { case (id, s) => (id, s.getOrElse(Double.NaN)) }
      .toDF("id", "score")
      .withColumn("score", when(col("id") === 2L, lit(null)).otherwise(col("score")))
    val got = Quantiles.percentileRank(df, Nil, "score", 0.0, 4.0)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("pct")))
    assert(got.toSeq == Seq((1L, 0.5), (3L, 0.0), (5L, 1.0)))
  }

  test("percentileRank plan: bucket-count offsets broadcast back") {
    val df = (1L to 300L).map(i => ("g", i, (i % 17).toDouble))
      .toDF("g", "id", "score")
    val out = Quantiles.percentileRank(df, Seq("g"), "score", 0.0, 17.0, 16)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"offsets must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"no corpus-vs-offsets shuffle join allowed:\n$plan")
  }

  test("percentileRank rejects reserved columns and bad grids") {
    val df = Seq(("g", 1L, 0.5)).toDF("g", "id", "score")
    intercept[IllegalArgumentException] {
      Quantiles.percentileRank(df.withColumn("pct", lit(0.0)), Seq("g"), "score", 0.0, 1.0)
    }
    intercept[IllegalArgumentException] {
      Quantiles.percentileRank(df, Seq("g"), "score", 1.0, 1.0)
    }
  }

  // ---- wasserstein1 ----

  private def w1Of(rows: (String, java.lang.Double)*) =
    Quantiles.wasserstein1(rows.toSeq.toDF("g", "v"), "g", "v")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))

  test("wasserstein1: a pure shift moves exactly the shift distance") {
    // A = {0, 1}, rest = {2, 3}: |F_A - F_r| = 1 on [1,2), 0.5 on [0,1)
    // and [2,3) -> W1 = 0.5 + 1 + 0.5 = 2.0 (the mean shift)
    val out = w1Of("a" -> 0.0, "a" -> 1.0, "b" -> 2.0, "b" -> 3.0)
    assert(out.head == (("a", 2L, 2L, 2.0)))
    assert(out(1) == (("b", 2L, 2L, 2.0)))
  }

  test("wasserstein1: identical distributions are zero; whole-corpus group is null") {
    val same = w1Of("a" -> 1.0, "a" -> 5.0, "b" -> 1.0, "b" -> 5.0)
    assert(same.map(_._4).toSeq == Seq(0.0, 0.0))
    val solo = w1Of("a" -> 1.0, "a" -> 2.0)
    assert(solo.toSeq == Seq(("a", 2L, 0L, null)))
  }

  // ---- weightedMedian ----

  test("weightedMedian: the 2·cumw >= W rule on hand-built masses") {
    // g1: (v=1,w=1),(v=2,w=1),(v=3,w=6): cum 1,2,8; W=8 -> first 2cw>=8
    // is v=3. g2 even split: (1,2),(2,2): cum 2,4; W=4 -> 2*2>=4 at v=1.
    val df = Seq(("g1", 1.0, 1L), ("g1", 2.0, 1L), ("g1", 3.0, 6L),
        ("g2", 1.0, 2L), ("g2", 2.0, 2L))
      .toDF("g", "v", "w")
    val out = Quantiles.weightedMedian(df, Seq("g"), "v", "w")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("g1", 8L, 3.0), ("g2", 4L, 1.0)))
  }

  test("weightedMedian: duplicate values merge weight before the rule; rejects bad weights") {
    // v=2 appears twice with w 1+3=4 of W=6 -> cum at 1 is 2, at 2 is 6:
    // first 2cw>=6 is v=2
    val df = Seq(("g", 1.0, 2L), ("g", 2.0, 1L), ("g", 2.0, 3L))
      .toDF("g", "v", "w")
    val out = Quantiles.weightedMedian(df, Seq("g"), "v", "w")
      .collect().head
    assert((out.getLong(1), out.getDouble(2)) == ((6L, 2.0)))
    val bad = Seq(("g", 1.0, 0L)).toDF("g", "v", "w")
    intercept[Exception] {
      Quantiles.weightedMedian(bad, Seq("g"), "v", "w").collect()
    }
    intercept[IllegalArgumentException] {
      Quantiles.weightedMedian(df, Seq.empty, "v", "w")
    }
  }

  test("weightedMedian: fractional weights are rejected, not truncated to 0") {
    // 0.5 passes a naive `> 0` check but cast('long') truncates it to 0 —
    // the whole group would get total_weight 0 and the minimum value as a
    // bogus median; integral doubles are fine
    val frac = Seq(("g", 1.0, 0.5), ("g", 2.0, 0.5)).toDF("g", "v", "w")
    intercept[Exception] {
      Quantiles.weightedMedian(frac, Seq("g"), "v", "w").collect()
    }
    val intish = Seq(("g", 1.0, 2.0), ("g", 2.0, 2.0)).toDF("g", "v", "w")
    val out = Quantiles.weightedMedian(intish, Seq("g"), "v", "w")
      .collect().head
    assert((out.getLong(1), out.getDouble(2)) == ((4L, 1.0)))
  }

  // ---- ksStatistic ----

  private def ksOf(rows: (String, java.lang.Double)*) = {
    Quantiles.ksStatistic(rows.toSeq.toDF("g", "v"), "g", "v")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
  }

  test("ksStatistic: disjoint supports hit 1.0, identical distributions hit 0.0") {
    val out = ksOf("a" -> 1.0, "a" -> 2.0, "b" -> 3.0, "b" -> 4.0)
    assert(out.toSeq == Seq(("a", 2L, 2L, 1.0), ("b", 2L, 2L, 1.0)))
    val same = ksOf("a" -> 1.0, "a" -> 3.0, "b" -> 1.0, "b" -> 3.0)
    assert(same.map(_._4).toSeq == Seq(0.0, 0.0))
  }

  test("ksStatistic: hand-computed one-third on a shifted overlap") {
    // A = {1,2,3}, rest = {2,3,4}: max |F_A - F_rest| = 1/3 at every step
    val out = ksOf("a" -> 1.0, "a" -> 2.0, "a" -> 3.0,
      "b" -> 2.0, "b" -> 3.0, "b" -> 4.0)
    // the fp sup lands at v=3: |1.0 − fl(2/3)| is the largest of the
    // three ~1/3 step differences (each an exact IEEE expression)
    assert(out.head == (("a", 3L, 3L, 1.0 - 2.0 / 3.0)))
  }

  test("ksStatistic: a group that is the whole corpus reports null; nulls excluded") {
    val out = ksOf("a" -> 1.0, "a" -> 2.0)
    assert(out.toSeq == Seq(("a", 2L, 0L, null)))
    val withNull = ksOf("a" -> 1.0, "a" -> null, "b" -> 1.0)
    assert(withNull.map(t => (t._1, t._2)).toSeq == Seq(("a", 1L), ("b", 1L)))
  }
}
