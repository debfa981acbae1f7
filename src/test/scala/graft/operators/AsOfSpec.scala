package graft.operators

import graft.SparkFunSuite

class AsOfSpec extends SparkFunSuite {
  import spark.implicits._

  test("joinLastBefore attaches the latest right row at-or-before each left row") {
    val left = Seq(
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L),
      (2L, 15L, 200L)
    ).toDF("k", "t", "lid")
    val right = Seq(
      (1L, 5L, 1.0), (1L, 20L, 2.0), (1L, 25L, 3.0),
      (3L, 1L, 9.0)
    ).toDF("k", "t", "v")
    val out = AsOf.joinLastBefore(left, right, "k", "t", Seq("v"))
      .orderBy("lid").collect()
      .map(r => (r.getAs[Long]("lid"), Option(r.getAs[java.lang.Double]("asof_v"))))
    assert(out.toSeq == Seq(
      (100L, Some(1.0)), // t=10: last right at 5
      (101L, Some(2.0)), // t=20: inclusive match at 20
      (102L, Some(3.0)), // t=30: last right at 25
      (200L, None) // key 2 has no right rows
    ).map { case (id, v) => (id, v.map(Double.box).map(_.doubleValue)) })
  }

  test("right rows with null order key never match") {
    val left = Seq((1L, 5L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, Option.empty[Long], 99.0)).toDF("k", "t", "v")
    val out = AsOf.joinLastBefore(left, right, "k", "t", Seq("v")).head
    assert(out.isNullAt(out.fieldIndex("asof_v")),
      "unknown-time right row must not be attached as 'most recent'")
  }

  test("payload columns always come from ONE right row (no cross-row chimera)") {
    val left = Seq((1L, 3L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 1L, Some(1.0), Some(10.0)), (1L, 2L, None, Some(20.0)))
      .toDF("k", "t", "a", "b")
    val r = AsOf.joinLastBefore(left, right, "k", "t", Seq("a", "b")).head
    assert(r.isNullAt(r.fieldIndex("asof_a")) && r.getAs[Double]("asof_b") == 20.0)
  }

  test("reserved working columns are rejected, not silently consumed") {
    val left = Seq((1L, 3L, 0)).toDF("k", "t", "_asof_payload")
    val right = Seq((1L, 1L, 5.0)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      AsOf.joinLastBefore(left, right, "k", "t", Seq("v"))
    }
    assert(e.getMessage.contains("reserved"))
    val left2 = Seq((1L, 3L)).toDF("k", "t")
    val right2 = Seq((1L, 1L, 5.0, 0)).toDF("k", "t", "v", "_side")
    intercept[IllegalArgumentException] {
      AsOf.joinLastBefore(left2, right2, "k", "t", Seq("v"))
    }
  }

  test("left columns pass through untouched") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val right = Seq((1L, 9L, 5.0)).toDF("k", "t", "v")
    val out = AsOf.joinLastBefore(left, right, "k", "t", Seq("v"))
    assert(out.columns.toSeq == Seq("k", "t", "tag", "asof_v"))
    assert(out.head.getAs[String]("tag") == "a")
  }
}
