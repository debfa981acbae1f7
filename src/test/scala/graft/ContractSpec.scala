package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that are cheap to enforce at test time. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a corresponding query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows on sf0.001 (driver smoke check)") {
    val df = SparkEntry.entry(SparkTestBase.spark)
    assert(df.count() > 0)
  }

  test("every query runs on sf0.001 and yields a schema with no duplicate columns") {
    val spark = SparkTestBase.spark
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      val cols = df.columns.toSeq
      assert(cols.distinct.size == cols.size, s"$name has duplicate columns: $cols")
    }
  }

  test("every query EXECUTES with rows at sf0.001 and sf0.01 (fixture-overfit guard)") {
    // the driver's DuckDB oracle gate runs at ONE scale factor (sf0.01);
    // this loop actually executes every battery query at two, so a
    // construction that is only valid at the gated SF — a planted-pair
    // recipe whose collision structure shifts with corpus size, a
    // threshold tuned to one row count, an in-query tripwire like q83's
    // Misra-Gries retention assert — fails HERE instead of surviving
    // until the fixture changes. count() executes the full aggregation/
    // join pipeline and every filter (tripwires included); value-level
    // comparison stays the oracle's job.
    val spark = SparkTestBase.spark
    // a point lookup can legitimately find nothing in a smaller slice —
    // its key simply doesn't occur among sf0.001's 6k lineitem rows
    val mayBeEmpty = Set("q04_point_lookup")
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      SparkEntry.queries.foreach { case (name, fn) =>
        try {
          val n = fn(spark, dir).count()
          if (n == 0 && !mayBeEmpty(name)) failures += s"$name produced 0 rows at $dir"
        } catch {
          case e: Throwable => failures += s"$name threw at $dir: ${e.getMessage}"
        }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
