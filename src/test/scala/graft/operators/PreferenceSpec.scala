package graft.operators

import graft.SparkFunSuite

class PreferenceSpec extends SparkFunSuite {
  import spark.implicits._

  test("bradleyTerry: two-item fixpoint matches the hand MM replay") {
    // A beats B twice, B beats A once: the MM fixpoint has
    // pi_A / pi_B = W_A / W_B = 2, reached already at round 1
    val m = Seq(("A", "B"), ("A", "B"), ("B", "A")).toDF("w", "l")
    val got = Preference.bradleyTerry(m, "w", "l", iters = 3)
      .orderBy("item").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // replay the exact double chain of all three rounds
    var (pa, pb) = (1.0, 1.0)
    for (_ <- 1 to 3) {
      val rawA = 2.0 / (0.0 + 3.0 / (pa + pb))
      val rawB = 1.0 / (0.0 + 3.0 / (pb + pa))
      val tot = (0.0 + rawA) + rawB
      pa = rawA * 2.0 / tot
      pb = rawB * 2.0 / tot
    }
    assert(got.toSeq == Seq(("A", 2L, 3L, pa), ("B", 1L, 3L, pb)))
    assert(math.abs(pa / pb - 2.0) < 1e-12)
  }

  test("bradleyTerry: transitive strengths order, winless item at zero") {
    // A>B, B>C, A>C (twice each): strengths must order A > B > C
    val m = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"),
      ("A", "C"), ("A", "C")).toDF("w", "l")
    val s = Preference.bradleyTerry(m, "w", "l")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(s("A") > s("B") && s("B") > s("C"))
    assert(s("C") == 0.0, "an all-loser sits at the MLE boundary")
    // self-matches and nulls drop; scale sums to #items
    val noisy = m.union(Seq(("A", "A"), (null, "B")).toDF("w", "l"))
    val s2 = Preference.bradleyTerry(noisy, "w", "l")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(s2 == s)
    assert(math.abs(s.values.sum - 3.0) < 1e-12)
    intercept[IllegalArgumentException] {
      Preference.bradleyTerry(m, "w", "l", iters = 0)
    }
  }
}
