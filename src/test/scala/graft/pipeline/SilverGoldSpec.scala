package graft.pipeline

import java.sql.Date
import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.meta.MetadataLedger
import graft.pipeline.WeatherFixtures._

class SilverGoldSpec extends SparkFunSuite {

  test("silver transform: rename, cast, timestamp parse, null drop") {
    val df = bronzeDf(spark, Seq(
      bronzeRow("Delhi", "2026-02-13", hour = 9, temp = 31.5),
      bronzeRow("Delhi", "2026-02-13", hour = 10, temp = null)))
    val out = Silver.transform(df)
    assert(out.columns.toSeq ==
      Seq("city", "date", "timestamp", "temperature", "wind_speed", "wind_direction", "weather_code"))
    val rows = out.collect()
    assert(rows.length == 1, "null temperature rows are dropped (silver.py:39)")
    val r = rows.head
    assert(r.getAs[java.sql.Timestamp]("timestamp").toString == "2026-02-13 09:30:00.0")
    assert(r.getAs[Double]("temperature") == 31.5)
    assert(r.getAs[Int]("wind_direction") == 180)
  }

  test("silver: empty pending partition triggers the empty-partition guard") {
    val root = tmpDir("sg")
    // a partition whose every row has null temperature -> transform drops all
    writeBronze(spark, Seq(bronzeRow("Tokyo", "2026-02-13", temp = null)), s"$root/data")
    MetadataLedger.ensure(spark, s"$root/meta")
    val e = intercept[IllegalStateException] {
      Silver.run(spark, s"$root/data", s"$root/silver", s"$root/meta")
    }
    assert(e.getMessage.contains("empty partitions"))
  }

  test("silver: missing bronze root is fatal (reference asymmetry, silver.py:8-12)") {
    val root = tmpDir("sg")
    intercept[Exception] {
      Silver.run(spark, s"$root/nope", s"$root/silver", s"$root/meta")
    }
  }

  test("gold: missing silver root yields an empty run, not an error (gold.py:26-28)") {
    val root = tmpDir("sg")
    MetadataLedger.ensure(spark, s"$root/meta")
    val n = Gold.run(spark, s"$root/nope", s"$root/gold", s"$root/meta")
    assert(n == 0)
  }

  test("gold aggregate: avg/max/min/count per (city,date)") {
    val df = Silver.transform(bronzeDf(spark, Seq(
      bronzeRow("Delhi", "2026-02-13", hour = 9, temp = 30.0),
      bronzeRow("Delhi", "2026-02-13", hour = 10, temp = 34.0),
      bronzeRow("London", "2026-02-13", hour = 9, temp = 8.0))))
    val g = Gold.transform(df).orderBy("city").collect()
    assert(g.length == 2)
    assert(g(0).getAs[Double]("avg_temp") == 32.0)
    assert(g(0).getAs[Double]("max_temp") == 34.0)
    assert(g(0).getAs[Double]("min_temp") == 30.0)
    assert(g(0).getAs[Long]("record_count") == 2L)
  }

  test("gold: null avg guard fires") {
    import spark.implicits._
    val bad = Seq(("Delhi", Date.valueOf("2026-02-13"), null.asInstanceOf[java.lang.Double]))
      .toDF("city", "date", "avg_temp")
    val e = intercept[IllegalStateException] { Gold.requireNoNullAggregates(bad) }
    assert(e.getMessage.contains("NULL avg_temp"))
  }
}
