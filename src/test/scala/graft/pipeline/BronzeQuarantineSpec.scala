package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class BronzeQuarantineSpec extends SparkFunSuite {

  private val runDate = java.sql.Date.valueOf("2026-02-13")

  test("quarantine lane flags exactly the malformed rows with typed reasons") {
    val raw = Seq(
      ("good", WeatherFixtures.apiJson(21.5)),
      ("broken", "{not json at all"),
      ("empty", ""),
      ("nullbody", null.asInstanceOf[String]),
      ("wrongshape", """{"latitude": 1.0, "longitude": 2.0}""")
    )
    val out = Bronze.flattenWithQuarantine(spark, raw, runDate)
    val errs = out.select("city", "parse_error").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(errs("good").isEmpty)
    assert(errs("broken").contains("malformed json"))
    assert(errs("empty").contains("empty body"))
    assert(errs("nullbody").contains("empty body"))
    assert(errs("wrongshape").contains("missing payload object"))
    // good rows carry the flattened payload; routing on parse_error.isNull
    // reproduces the plain flatten for them
    val good = out.filter(col("parse_error").isNull)
    assert(good.count() == 1)
    assert(good.head.getAs[Double]("temperature_2m") == 21.5)
    // the quarantine lane preserves the raw body for replay
    val q = out.filter(col("parse_error").isNotNull)
    assert(q.count() == 4)
    assert(q.filter(col("city") === "broken").head.getAs[String]("body") == "{not json at all")
  }

  test("an all-good batch quarantines nothing and matches plain flatten") {
    val raw = Seq(("a", WeatherFixtures.apiJson(1.0)), ("b", WeatherFixtures.apiJson(2.0)))
    val out = Bronze.flattenWithQuarantine(spark, raw, runDate)
    assert(out.filter(col("parse_error").isNotNull).count() == 0)
    val viaPlain = Bronze.flatten(spark, raw, runDate)
      .orderBy("city").collect().map(_.toSeq)
    val viaQ = out.drop("body", "parse_error")
      .select(viaPlain.head.indices.map(i => col(Bronze.flatten(spark, raw, runDate).columns(i))): _*)
      .orderBy("city").collect().map(_.toSeq)
    assert(viaPlain.toSeq == viaQ.toSeq)
  }
}
