package graft.operators

import graft.SparkFunSuite

class SkewJoinSpec extends SparkFunSuite {
  import spark.implicits._

  test("salted join result equals plain join on skewed data") {
    // hot key: 90% of big-side rows share key 1
    val big = ((1 to 900).map(i => (1L, i.toDouble)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, i.toDouble)))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("k", "tag")
    val plain = big.join(small, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", salt = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(salted.count(_._1 == 1L) == 900)
  }

  test("single-column big side falls back to salting on the key") {
    val big = (1 to 50).map(i => Tuple1(1L)).toDF("k")
    val small = Seq((1L, "x")).toDF("k", "tag")
    val out = SkewJoin.saltedInnerJoin(big, small, "k", salt = 4)
    assert(out.count() == 50)
  }

  test("a pre-existing _salt column is rejected, not silently clobbered") {
    val big = Seq((1L, 7)).toDF("k", "_salt")
    val small = Seq((1L, "x")).toDF("k", "tag")
    val e = intercept[IllegalArgumentException] {
      SkewJoin.saltedInnerJoin(big, small, "k")
    }
    assert(e.getMessage.contains("_salt"))
    intercept[IllegalArgumentException] {
      SkewJoin.saltedInnerJoin(small, big, "k")
    }
  }
}
