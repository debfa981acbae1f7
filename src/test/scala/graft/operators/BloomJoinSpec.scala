package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class BloomJoinSpec extends SparkFunSuite {
  import spark.implicits._

  test("bloom anti-join == plain left_anti on long keys, including null keys") {
    val left = ((1L to 5000L).map(i => Some(i)) ++ Seq(None, None))
      .toDF("k").withColumn("v", col("k") * 2)
    val right = (1L to 5000L by 3).toDF("rk")
    val got = BloomJoin.antiJoin(left, right, "k", "rk", expectedItems = 2000)
    val want = left.join(right, col("k") === col("rk"), "left_anti")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.count() == want.count())
  }

  test("bloom anti-join == plain left_anti on string keys") {
    val left = (1 to 3000).map(i => s"doc-$i").toDF("k")
    val right = (1 to 3000 by 7).map(i => s"doc-$i").toDF("rk")
    val got = BloomJoin.antiJoin(left, right, "k", "rk", expectedItems = 500)
    val want = left.join(right, col("k") === col("rk"), "left_anti")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("result stays exact when the sketch is undersized (high fpp)") {
    // expectedItems=10 against 1000 actual keys drives fpp toward 1 —
    // pruning degrades, correctness must not
    val left = (1L to 4000L).toDF("k")
    val right = (1L to 4000L by 4).toDF("rk")
    val got = BloomJoin.antiJoin(left, right, "k", "rk", expectedItems = 10)
    val want = left.join(right, col("k") === col("rk"), "left_anti")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("empty right keeps all of left; empty left yields empty") {
    val left = (1L to 100L).toDF("k")
    val right = Seq.empty[Long].toDF("rk")
    assert(BloomJoin.antiJoin(left, right, "k", "rk", 1).count() == 100)
    assert(BloomJoin.antiJoin(right.toDF("k"), left.toDF("rk"), "k", "rk", 200).count() == 0)
  }
}
