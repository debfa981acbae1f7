package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class VecDotSpec extends SparkFunSuite {
  import spark.implicits._

  test("float arrays: dot widens to double, left-to-right fold") {
    val df = Seq((Array(1.5f, 2.0f, -3.0f), Array(2.0f, 0.5f, 1.0f))).toDF("a", "b")
    assert(df.select(VecDot.dot($"a", $"b")).head.getDouble(0) == 1.0)
  }

  test("double arrays supported") {
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    assert(df.select(VecDot.dot($"a", $"b")).head.getDouble(0) == 11.0)
  }

  test("null array yields null (standard binary-expression contract)") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]])).toDF("a", "b")
    assert(df.select(VecDot.dot($"a", $"b")).head.isNullAt(0))
  }

  test("mismatched lengths throw (DuckDB list_inner_product parity — don't mask corrupt embeddings)") {
    val df = Seq((Array(1.0f, 2.0f, 9.0f), Array(10.0f, 10.0f))).toDF("a", "b")
    val e = intercept[Exception] { df.select(VecDot.dot($"a", $"b")).collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("array sizes differ"))))
  }

  test("null ELEMENT yields null result (DuckDB parity), not a silent 0 contribution") {
    val df = Seq((Array[java.lang.Float](1.0f, null), Array[java.lang.Float](2.0f, 3.0f)))
      .toDF("a", "b")
    assert(df.select(VecDot.dot($"a", $"b")).head.isNullAt(0))
  }

  test("non-array input fails analysis, not execution") {
    val df = Seq((1.0, Array(1.0f))).toDF("a", "b")
    val e = intercept[Exception] { df.select(VecDot.dot($"a", $"b")).collect() }
    assert(e.getMessage.contains("VecDot") || e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("interpreted eval matches codegen result") {
    // force interpreted path by evaluating through a filter on many rows and
    // comparing with the HOF formulation
    val df = (1 to 100).map(i => (Array.fill(8)(i.toFloat), Array.fill(8)(2.0f)))
      .toDF("a", "b")
    val viaExpr = df.select(VecDot.dot($"a", $"b").as("d")).agg(sum("d")).head.getDouble(0)
    val viaHof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d")).agg(sum("d")).head.getDouble(0)
    assert(viaExpr == viaHof)
  }
}
