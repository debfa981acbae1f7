package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that are cheap to enforce at test time. */
class ContractSpec extends AnyFunSuite {

  test("fixture schema guard: every testdata table carries the expected logical types") {
    // The driver regenerates /root/testdata between rounds and has already
    // changed a physical type once (events.ts: TIMESTAMP(NANOS) →
    // timestamp[us], 2026-08-13) — a drift that cost round 9 its 17
    // events-based queries. This guard reads every sf0.001 table RAW (the
    // same way Tables does, legacy nanos conf on) and names the exact
    // table/column on mismatch, so the next regeneration fails one clear
    // test at round start instead of seventeen queries at the gate.
    import org.apache.spark.sql.types._
    val spark = SparkTestBase.spark
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // acceptable Spark logical types per column; alternatives cover the
    // physical representations the engine's readers adapt to
    def ts: Set[DataType] = Set(TimestampType, TimestampNTZType, LongType)
    val expected: Map[String, Map[String, Set[DataType]]] = Map(
      "region" -> Map("r_regionkey" -> Set(IntegerType, LongType), "r_name" -> Set(StringType)),
      "nation" -> Map("n_nationkey" -> Set(IntegerType, LongType), "n_name" -> Set(StringType),
        "n_regionkey" -> Set(IntegerType, LongType)),
      "customer" -> Map("c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
        "c_nationkey" -> Set(IntegerType, LongType), "c_acctbal" -> Set(DoubleType),
        "c_mktsegment" -> Set(StringType)),
      "supplier" -> Map("s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
        "s_nationkey" -> Set(IntegerType, LongType), "s_acctbal" -> Set(DoubleType)),
      "part" -> Map("p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
        "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
        "p_size" -> Set(IntegerType, LongType), "p_retailprice" -> Set(DoubleType)),
      "orders" -> Map("o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
        "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
        "o_orderdate" -> ts, "o_orderpriority" -> Set(StringType)),
      "lineitem" -> Map("l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
        "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType, LongType),
        "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
        "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
        "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
        "l_shipdate" -> ts),
      "events" -> Map("event_id" -> Set(LongType), "ts" -> ts,
        "user_id" -> Set(LongType), "event_type" -> Set(StringType),
        "value" -> Set(DoubleType), "props" -> Set(StringType)),
      "documents" -> Map("doc_id" -> Set(LongType), "text" -> Set(StringType),
        "lang" -> Set(StringType), "source" -> Set(StringType),
        "n_chars" -> Set(LongType)),
      "embeddings" -> Map("vec_id" -> Set(LongType),
        "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false),
          ArrayType(DoubleType), ArrayType(DoubleType, containsNull = false)),
        "label" -> Set(IntegerType, LongType)))
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    expected.foreach { case (table, cols) =>
      val schema =
        try spark.read.parquet(s"/root/testdata/sf0.001/$table.parquet").schema
        catch {
          case e: Throwable =>
            failures += s"$table: unreadable fixture: ${e.getMessage}"
            new StructType()
        }
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      cols.foreach { case (c, ok) =>
        byName.get(c) match {
          case None => failures += s"$table.$c: column MISSING from fixture (has ${schema.fieldNames.mkString(", ")})"
          case Some(dt) if !ok(dt) =>
            failures += s"$table.$c: fixture type drifted to $dt (engine accepts ${ok.mkString(" | ")})"
          case _ =>
        }
      }
    }
    assert(failures.isEmpty,
      "testdata fixture schema drift — fix the adaptive reader(s) in graft.sources.Tables first:\n"
        + failures.mkString("\n"))
  }

  test("every oracle key has a corresponding query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query is oracle-gated (no dark operators)") {
    // the repo's own bar: an operator without a DuckDB oracle row does not
    // exist by this process's standard (round 9's rrfFuse lesson) — keep
    // the battery total-coverage invariant enforced, not aspirational
    val dark = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(dark.isEmpty, s"queries without oracles: $dark")
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
