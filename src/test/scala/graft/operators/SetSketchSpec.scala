package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class SetSketchSpec extends SparkFunSuite {
  import spark.implicits._

  private def sketch(rows: Seq[(String, Long)], k: Int) =
    SetSketch.kmvPerGroup(rows.toDF("g", "id"), Seq("g"), "id", k)

  test("below capacity the sketch IS the key set and estimates are exact") {
    val rows = (1L to 40L).map(i => ("a", i)) ++ (21L to 60L).map(i => ("b", i))
    val m = SetSketch.kmvOverlapMatrix(sketch(rows, 256), "g", 256)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // 40 distinct each, 20 shared, 60 in the union -> jaccard 1/3 exactly.
    assert(m === Array(("a", "b", 40.0, 40.0,
      BigDecimal(20.0 / 60).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble, 20.0)))
  }

  test("duplicates do not occupy sketch slots") {
    val rows = Seq.fill(50)("a" -> 7L) ++ Seq("a" -> 8L)
    val s = sketch(rows, 16).head()
    assert(s.getSeq[String](1).length === 2) // 2 distinct keys, 51 rows
  }

  test("full sketches estimate distinct/jaccard within ~3/sqrt(k)") {
    val k = 256
    val n = 20000L
    // a = [1, 20000], b = [10001, 30000] -> true jaccard 1/3, inter 10000.
    val rows = (1L to n).map(i => ("a", i)) ++
      (n / 2 + 1 to n / 2 + n).map(i => ("b", i))
    val m = SetSketch.kmvOverlapMatrix(sketch(rows, k), "g", k).head()
    val tol = 3.0 / math.sqrt(k) // ~0.19 relative
    assert(math.abs(m.getDouble(2) - n) / n < tol, s"distinct_a ${m.getDouble(2)}")
    assert(math.abs(m.getDouble(3) - n) / n < tol, s"distinct_b ${m.getDouble(3)}")
    assert(math.abs(m.getDouble(4) - 1.0 / 3) < tol, s"jaccard ${m.getDouble(4)}")
    assert(math.abs(m.getDouble(5) - n / 2) / (n / 2) < 2 * tol,
      s"intersect ${m.getDouble(5)}")
  }

  test("disjoint slices estimate zero intersection") {
    val rows = (1L to 5000L).map(i => ("a", i)) ++
      (100001L to 105000L).map(i => ("b", i))
    val m = SetSketch.kmvOverlapMatrix(sketch(rows, 128), "g", 128).head()
    assert(m.getDouble(4) <= 0.03 && m.getDouble(5) <= 200.0,
      s"jaccard ${m.getDouble(4)} inter ${m.getDouble(5)}")
  }

  test("sketches are layout-invariant (merge order never matters)") {
    val rows = (1L to 3000L).map(i => ("a", i % 700))
    val s1 = sketch(rows, 64).select(col("kmv")).head().getSeq[String](0)
    val df = rows.toDF("g", "id").repartition(23)
    val s2 = SetSketch.kmvPerGroup(df, Seq("g"), "id", 64)
      .select(col("kmv")).head().getSeq[String](0)
    assert(s1 === s2)
  }

  test("sketch equals the naive bottom-k of sorted distinct hashes; nulls excluded") {
    val rows = (1L to 500L).map(i => ("a", i % 120)).toDF("g", "id")
      .unionByName(Seq(("a", null.asInstanceOf[java.lang.Long])).toDF("g", "id"))
    val got = SetSketch.kmvPerGroup(rows, Seq("g"), "id", 16)
      .head().getSeq[String](1)
    val want = rows.filter(col("id").isNotNull)
      .select(org.apache.spark.sql.functions.md5(
        concat(col("id").cast("string"), lit(":kmv"))).as("h"))
      .distinct().orderBy("h").limit(16)
      .collect().map(_.getString(0)).toSeq
    assert(got === want, "sketch must be the 16 smallest distinct hashes, ascending")
  }

  test("kmv_sketch / kmv_merge SQL surface matches the operators") {
    graft.functions.GraftFunctions.register(spark)
    val rows = (1L to 4000L).map(i => (s"s${i % 3}", i % 900))
    rows.toDF("src", "id").createOrReplaceTempView("kmv_in")
    val sql = spark.sql(
      "SELECT src, kmv_sketch(id, 32) AS kmv FROM kmv_in GROUP BY src")
    val api = SetSketch.kmvPerGroup(rows.toDF("src", "id"), Seq("src"), "id", 32)
    assert(sql.orderBy("src").collect().map(_.getSeq[String](1)).toSeq ===
      api.orderBy("src").collect().map(_.getSeq[String](1)).toSeq)
    // rolling per-slice sketches up through kmv_merge == sketching the
    // union directly (Beyer et al. §4 — the incremental deployment shape)
    val merged = spark.sql(
      """SELECT kmv_merge(kmv, 32) AS kmv FROM
        |  (SELECT src, kmv_sketch(id, 32) AS kmv FROM kmv_in GROUP BY src)""".stripMargin)
      .head().getSeq[String](0)
    val direct = SetSketch.kmvPerGroup(
        rows.toDF("src", "id").withColumn("g", lit(1)), Seq("g"), "id", 32)
      .head().getSeq[String](1)
    assert(merged === direct,
      "merging per-slice sketches must reproduce the union sketch exactly")
  }

  test("cms: one-sided bound, bounded table, additive merge") {
    val rows = (1 to 400).map(i => i.toLong % 37)
    val df = rows.toDF("k")
    val cms = SetSketch.cmsTable(df, "k", depth = 4, width = 16)
      .localCheckpoint(false)
    // table cardinality bounded by depth x width, counts sum to N x depth
    val t = cms.collect()
    assert(t.length <= 4 * 16)
    assert(t.map(_.getLong(2)).sum == 400L * 4)
    // estimate >= exact for EVERY key (the one-sided CMS guarantee)
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = SetSketch.cmsEstimate(cms, df, "k", depth = 4, width = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"key $k: estimate ${est(k)} < exact $c") }
    // unseen key estimates only collision mass (>= 0, well-defined)
    val unseen = SetSketch.cmsEstimate(cms, Seq(999L).toDF("k"), "k", 4, 16)
      .head.getLong(1)
    assert(unseen >= 0L)
    // mergeable: summing two halves' tables == the union's table
    val (a, b) = rows.splitAt(150)
    val mergedTab = SetSketch.cmsTable(a.toDF("k"), "k", 4, 16)
      .unionByName(SetSketch.cmsTable(b.toDF("k"), "k", 4, 16))
      .groupBy("depth", "bucket")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val unionTab = t.map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(mergedTab == unionTab)
  }
}
