package graft.operators

import org.apache.spark.sql.functions.col

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
}
