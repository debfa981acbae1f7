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
}
