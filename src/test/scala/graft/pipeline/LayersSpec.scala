package graft.pipeline

import java.sql.Date
import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.pipeline.WeatherFixtures._

class LayersSpec extends SparkFunSuite {
  import spark.implicits._

  test("scopeToPending literal regime prunes to exactly the pending partitions") {
    val rows = Seq(
      bronzeRow("Delhi", "2026-02-13"), bronzeRow("London", "2026-02-13"),
      bronzeRow("Delhi", "2026-02-14"))
    val df = bronzeDf(spark, rows)
    val pending = Seq(("Delhi", Date.valueOf("2026-02-14"))).toDF("city", "date")
    val out = Layers.scopeToPending(df, pending, literalThreshold = 256)
    assert(out.select("city", "date").distinct().collect().map(r =>
      (r.getString(0), r.getDate(1).toString)).toSeq == Seq(("Delhi", "2026-02-14")))
  }

  test("scopeToPending semi-join regime (pending set above threshold) gives identical results") {
    val rows = (1 to 30).map(i => bronzeRow(s"City$i", f"2026-02-${i % 28 + 1}%02d"))
    val df = bronzeDf(spark, rows)
    val pendingPairs = rows.take(20).map(r => (r.city, r.date))
    val pending = pendingPairs.toDF("city", "date")
    val literal = Layers.scopeToPending(df, pending, literalThreshold = 256)
      .select("city", "date").collect().map(r => (r.getString(0), r.getDate(1).toString)).toSet
    val semi = Layers.scopeToPending(df, pending, literalThreshold = 2)
      .select("city", "date").collect().map(r => (r.getString(0), r.getDate(1).toString)).toSet
    assert(semi == literal)
    assert(semi.size == 20)
  }

  test("scopeToPending with empty pending returns no rows") {
    val df = bronzeDf(spark, Seq(bronzeRow("Delhi", "2026-02-13")))
    val pending = Seq.empty[(String, Date)].toDF("city", "date")
    assert(Layers.scopeToPending(df, pending).count() == 0)
  }

  test("requireAllNonEmpty passes when every pending partition produced rows") {
    val df = bronzeDf(spark, Seq(bronzeRow("Delhi", "2026-02-13")))
    val pending = Seq(("Delhi", Date.valueOf("2026-02-13"))).toDF("city", "date")
    Layers.requireAllNonEmpty(df, pending) // must not throw
  }
}
