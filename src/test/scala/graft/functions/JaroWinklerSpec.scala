package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkFunSuite {
  import spark.implicits._

  // expected doubles are DuckDB's own outputs (probed 2026-08-15) — the
  // q200 differential gate re-verifies these semantics corpus-wide
  private val cases = Seq(
    ("MARTHA", "MARHTA", 0.9444444444444445, 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.8222222222222223, 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.7666666666666666, 0.8133333333333332),
    ("CRATE", "TRACE", 0.7333333333333334, 0.7333333333333334),
    ("abc", "abc", 1.0, 1.0),
    ("", "abc", 0.0, 0.0),
    ("", "", 0.0, 0.0),          // DuckDB convention: both-empty is 0
    ("ab", "ba", 0.0, 0.0),      // window 0: no matches
    ("abc", "acb", 0.5555555555555555, 0.5555555555555555),
    // 3-cycle inside the window: half-count 3 → t = 1 by INTEGER division
    ("abcxyz", "bcaxyz", 0.9444444444444445, 0.9444444444444445),
    // prefix bonus capped at 4 even with 5 common chars
    ("aaaaaQ", "aaaaaZ", 0.888888888888889, 0.9333333333333333),
    // below the 0.7 boost threshold the prefix earns NOTHING
    ("aQQQQQ", "aZZZZZ", 0.4444444444444444, 0.4444444444444444),
    ("abcdXXXX", "abcdYYYY", 0.6666666666666666, 0.6666666666666666),
    // just above threshold: bonus applies with l = 2
    ("ab", "abcdefghijklmnop", 0.7083333333333334, 0.7666666666666667))

  test("jaro / jaroWinkler: literature values, conventions, thresholds") {
    val df = cases.map(c => (c._1, c._2)).toDF("a", "b")
    val got = df.select(JaroWinkler.jaro(col("a"), col("b")),
      JaroWinkler.similarity(col("a"), col("b"))).collect()
    cases.zip(got).foreach { case ((a, b, ej, ejw), r) =>
      assert(r.getDouble(0) == ej, s"jaro($a, $b)")
      assert(r.getDouble(1) == ejw, s"jw($a, $b)")
    }
  }

  test("codegen and interpreted paths agree; nulls null; SQL surface") {
    val df = cases.map(c => (c._1, c._2)).toDF("a", "b")
    // interpreted path via eval on a non-codegen context: compare the
    // whole-stage result against direct nullSafeEval
    cases.foreach { case (a, b, ej, ejw) =>
      assert(JaroWinklerImpl.jaro(UTF8String.fromString(a),
        UTF8String.fromString(b)) == ej)
      assert(JaroWinklerImpl.jaroWinkler(UTF8String.fromString(a),
        UTF8String.fromString(b)) == ejw)
    }
    val n = Seq((Some("x"), None: Option[String]))
      .map { case (x, y) => (x.orNull, y.orNull) }.toDF("a", "b")
    assert(n.select(JaroWinkler.similarity(col("a"), col("b")))
      .head.isNullAt(0))
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA'), jaro_sim('MARTHA', 'MARHTA')")
      .head
    assert(viaSql.getDouble(0) == 0.9611111111111111)
    assert(viaSql.getDouble(1) == 0.9444444444444445)
    // the expression lives inside whole-stage codegen (no UDF fallback;
    // a LocalRelation would constant-fold, so probe over a real scan)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scan = docs.select(JaroWinkler.similarity(col("lang"), col("source")))
    assert(scan.queryExecution.executedPlan.toString
      .contains("*(1) Project"),
      "the starred project marks whole-stage codegen residency")
    // and the codegen'd values equal the interpreted kernel's
    val rows = docs.select(col("lang"), col("source"),
      JaroWinkler.similarity(col("lang"), col("source"))).limit(50).collect()
    rows.foreach { r =>
      assert(r.getDouble(2) == JaroWinklerImpl.jaroWinkler(
        UTF8String.fromString(r.getString(0)),
        UTF8String.fromString(r.getString(1))))
    }
  }
}
