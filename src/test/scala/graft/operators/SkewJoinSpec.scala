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

  test("keyDepthProfile: hand-computed buckets, Σdepth² and example keys") {
    // depths: a→1 (bucket 0), b→3 (bucket 1), c→8 (bucket 3)
    val df = (Seq("a") ++ Seq.fill(3)("b") ++ Seq.fill(8)("c"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "v")
    val rows = SkewJoin.keyDepthProfile(df, Seq("k"))
      .orderBy("depth_bucket").collect()
    assert(rows.map(r => (r.getInt(0), r.getAs[Long]("n_keys"),
      r.getAs[Long]("n_rows"), r.getAs[Double]("selfjoin_rows"),
      r.getAs[String]("example_key"))).toSeq ==
      Seq((0, 1L, 1L, 1.0, "a"), (1, 1L, 3L, 9.0, "b"), (3, 1L, 8L, 64.0, "c")))
  }

  test("keyDepthProfile: composite keys can't collide across column boundaries; nulls counted") {
    val df = Seq((Some("a"), Some("bc")), (Some("ab"), Some("c")),
      (None: Option[String], Some("x"))).toDF("k1", "k2")
    val rows = SkewJoin.keyDepthProfile(df, Seq("k1", "k2"))
      .orderBy("depth_bucket").collect()
    // three DISTINCT keys, all depth 1 — "a|bc" must not equal "ab|c"
    assert(rows.length == 1 && rows.head.getAs[Long]("n_keys") == 3L &&
      rows.head.getAs[Long]("n_rows") == 3L)
  }

  test("keyDepthProfile rejects empty and reserved columns") {
    val df = Seq((1, 2)).toDF("_k", "v")
    intercept[IllegalArgumentException] { SkewJoin.keyDepthProfile(df, Nil) }
    intercept[IllegalArgumentException] { SkewJoin.keyDepthProfile(df, Seq("v")) }
  }
}
