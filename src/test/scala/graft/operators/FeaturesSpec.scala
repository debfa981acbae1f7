package graft.operators

import graft.SparkFunSuite

class FeaturesSpec extends SparkFunSuite {
  import spark.implicits._

  test("targetEncodeLoo: hand-computed means, singleton null, nulls drop") {
    // category a: y = 1, 2, 4 (Σ = 7) → LOO means 3.0, 2.5, 1.5;
    // b singleton
    val df = Seq((1L, Some("a"), Some(1.0)), (2L, Some("a"), Some(2.0)),
      (3L, Some("a"), Some(4.0)), (4L, Some("b"), Some(9.0)),
      (5L, None, Some(7.0)), (6L, Some("a"), None))
      .map { case (i, c, y) =>
        (i, c.orNull, y.map(double2Double).orNull)
      }.toDF("id", "c", "y")
    val got = Features.targetEncodeLoo(df, "id", "c", "y")
      .orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L),
      "null category/target rows are excluded")
    assert(got.map(r => if (r.isNullAt(2)) null
      else r.getDouble(2)).toSeq == Seq(3.0, 2.5, 1.5, null))
    // the encoding never includes the row's own label: a constant-
    // target category encodes to that constant (no self-inflation)
    val const = Seq((1L, "a", 3.0), (2L, "a", 3.0), (3L, "a", 3.0))
      .toDF("id", "c", "y")
    val c = Features.targetEncodeLoo(const, "id", "c", "y").collect()
    assert(c.forall(_.getDouble(2) == 3.0))
    // micro-unit exactness: 0.1 + 0.2 style values stay exact
    val frac = Seq((1L, "a", 0.1), (2L, "a", 0.2), (3L, "a", 0.4))
      .toDF("id", "c", "y")
    val f = Features.targetEncodeLoo(frac, "id", "c", "y")
      .orderBy("id").collect().map(_.getDouble(2)).toSeq
    assert(f == Seq(600000.0 / 1e6 / 2.0, 500000.0 / 1e6 / 2.0,
      300000.0 / 1e6 / 2.0))
  }
}
