package graft.operators

import graft.SparkFunSuite

class ScdSpec extends SparkFunSuite {
  import spark.implicits._

  private def hist = Seq((1L, "gold", 10L), (2L, "silver", 10L))
    .toDF("k", "tier", "eff")

  test("scd2Apply: a change closes the old interval and opens a new current one") {
    val upd = Seq((1L, "platinum", 20L)).toDF("k", "tier", "eff")
    val got = Scd.scd2Apply(hist, upd, Seq("k"), Seq("tier"), "eff")
      .orderBy("k", "eff").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "gold", 10L, 20L, false), (1L, "platinum", 20L, -1L, true),
      (2L, "silver", 10L, -1L, true)))
  }

  test("scd2Apply: no-op re-observations compress away, including runs") {
    val upd = Seq((1L, "gold", 15L), (1L, "gold", 17L), (1L, "blue", 20L))
      .toDF("k", "tier", "eff")
    val got = Scd.scd2Apply(hist, upd, Seq("k"), Seq("tier"), "eff")
      .filter($"k" === 1L).orderBy("eff").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("gold", 10L), ("blue", 20L)),
      "identical consecutive versions must not split the interval")
  }

  test("scd2Apply: same-timestamp conflict — the update replaces the stored version") {
    val upd = Seq((1L, "fixed", 10L)).toDF("k", "tier", "eff")
    val got = Scd.scd2Apply(hist, upd, Seq("k"), Seq("tier"), "eff")
      .filter($"k" === 1L).collect()
    assert(got.length == 1 && got.head.getString(1) == "fixed" &&
      got.head.getBoolean(4))
  }

  test("scd2Apply: output fed back in with later updates never double-closes") {
    val round1 = Scd.scd2Apply(hist, Seq((1L, "platinum", 20L)).toDF("k", "tier", "eff"),
      Seq("k"), Seq("tier"), "eff")
    val round2 = Scd.scd2Apply(round1.drop("valid_to", "is_current"),
        Seq((1L, "gold", 30L)).toDF("k", "tier", "eff"),
        Seq("k"), Seq("tier"), "eff")
      .filter($"k" === 1L).orderBy("eff").collect()
      .map(r => (r.getString(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(round2.toSeq == Seq(("gold", 10L, 20L), ("platinum", 20L, 30L),
      ("gold", 30L, -1L)),
      "returning to an earlier value is a NEW version, not a compression")
  }

  test("scd2Apply: null tracked values compare null-safely") {
    val h = Seq((1L, Option.empty[String], 10L)).toDF("k", "tier", "eff")
    val upd = Seq((1L, Option.empty[String], 20L), (1L, Some("a"), 30L))
      .toDF("k", "tier", "eff")
    val got = Scd.scd2Apply(h, upd, Seq("k"), Seq("tier"), "eff")
      .orderBy("eff").collect().map(r => (r.getLong(2)))
    assert(got.toSeq == Seq(10L, 30L), "null == null must compress")
  }

  test("scd2Apply: two updates colliding on (key, eff) pick deterministically") {
    val upd = Seq((1L, "zzz", 20L), (1L, "aaa", 20L)).toDF("k", "tier", "eff")
    val got = Scd.scd2Apply(hist, upd, Seq("k"), Seq("tier"), "eff")
      .filter($"k" === 1L && $"eff" === 20L).collect()
    assert(got.length == 1 && got.head.getString(1) == "aaa",
      "smallest tracked tuple wins — stable across runs and partitionings")
  }

  test("scd2Apply rejects reserved/empty column sets") {
    val df = Seq((1L, "a", 1L)).toDF("k", "valid_to", "eff")
    intercept[IllegalArgumentException] {
      Scd.scd2Apply(df, df, Seq("k"), Seq("valid_to"), "eff")
    }
    intercept[IllegalArgumentException] {
      Scd.scd2Apply(df, df, Seq("k"), Nil, "eff")
    }
  }
}
