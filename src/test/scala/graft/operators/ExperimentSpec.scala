package graft.operators

import graft.SparkFunSuite

class ExperimentSpec extends SparkFunSuite {
  import spark.implicits._

  private def events = Seq(
    // control: user 1 converts (on its THIRD event), user 2 never
    ("control", Some(1L), false), ("control", Some(1L), false),
    ("control", Some(1L), true), ("control", Some(2L), false),
    // treatment: both users convert; user 3 has repeat conversions
    ("treatment", Some(3L), true), ("treatment", Some(3L), true),
    ("treatment", Some(4L), true),
    // a null user never counts anywhere
    ("treatment", Option.empty[Long], true)
  ).toDF("arm", "user_id", "converted")

  test("abReport: user-level dedup, hand-replayed Wilson and pooled z, control nulls") {
    val got = Experiment.abReport(events, "arm", "user_id", "converted",
        "control").orderBy("arm").collect()
    val ctrl = got(0)
    val treat = got(1)
    assert(ctrl.getString(0) == "control" && ctrl.getLong(1) == 2 &&
      ctrl.getLong(2) == 1 && ctrl.getDouble(3) == 0.5)
    assert(ctrl.isNullAt(6) && ctrl.isNullAt(7), "control is its own baseline")
    assert(treat.getLong(1) == 2 && treat.getLong(2) == 2 &&
      treat.getDouble(3) == 1.0)
    // independent replay of the exact expression chains
    val z = 1.96; val z2 = z * z
    def wilson(x: Long, n: Long): (Double, Double) = {
      val nd = n.toDouble; val p = x.toDouble / nd
      val denom = 1.0 + z2 / nd
      val center = (p + z2 / (2.0 * nd)) / denom
      val half = (z / denom) * math.sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd))
      (math.max(0.0, center - half), math.min(1.0, center + half))
    }
    assert((ctrl.getDouble(4), ctrl.getDouble(5)) == wilson(1, 2))
    assert((treat.getDouble(4), treat.getDouble(5)) == wilson(2, 2))
    val pooled = (2.0 + 1.0) / (2.0 + 2.0)
    val se = math.sqrt(pooled * (1.0 - pooled) * (1.0 / 2.0 + 1.0 / 2.0))
    assert(treat.getDouble(6) == 0.5)
    assert(treat.getDouble(7) == 0.5 / se)
  }

  test("abReport: zero pooled variance nulls z; missing control throws") {
    val allConv = Seq(("a", 1L, true), ("b", 2L, true)).toDF("arm", "u", "c")
    val r = Experiment.abReport(allConv, "arm", "u", "c", "a")
      .orderBy("arm").collect()
    assert(r(1).isNullAt(7), "100% everywhere has no scale for a z-stat")
    assert(r(1).getDouble(6) == 0.0, "lift is still defined")
    intercept[IllegalArgumentException] {
      Experiment.abReport(events, "arm", "user_id", "converted", "nope")
    }
  }
}
