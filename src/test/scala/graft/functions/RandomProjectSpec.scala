package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class RandomProjectSpec extends SparkFunSuite {
  import spark.implicits._

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def sign(j: Int, k: Int, domain: String = "jl"): Double =
    if (md5hex(s"$j:$k:$domain").head < '8') 1.0 else -1.0

  test("randomProjectSigns matches the hand-computed sign fold exactly") {
    val v = Array(1.5f, -2.0f, 0.25f)
    val df = Seq(Tuple1(v)).toDF("v")
    val got = df.select(VectorFunctions.randomProjectSigns($"v", 3, 2).as("p"))
      .head.getSeq[Double](0)
    val want = (0 until 2).map { k =>
      (0 until 3).foldLeft(0.0)((acc, j) => acc + v(j).toDouble * sign(j, k)) /
        math.sqrt(2.0)
    }
    assert(got == want, s"got $got want $want")
  }

  test("projection preserves inner products in expectation (JL property)") {
    // 60 random 32-dim pairs projected to 16 dims: the MEAN relative error
    // of <Pa,Pb> vs <a,b> over pairs with a decent true dot should be
    // small even though any single pair can wobble
    val rng = new scala.util.Random(11)
    def vec() = Array.fill(32)((rng.nextGaussian()).toFloat)
    val pairs = (1 to 60).map(i => (i.toLong, vec(), vec()))
    val df = pairs.toDF("id", "a", "b")
      .select($"id",
        VectorFunctions.dot($"a", $"b").as("true_dot"),
        VectorFunctions.dot(
          VectorFunctions.randomProjectSigns($"a", 32, 16),
          VectorFunctions.randomProjectSigns($"b", 32, 16)).as("proj_dot"))
    val rows = df.collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val meanErr = rows.map { case (t, p) => p - t }.sum / rows.length
    // E[proj_dot - true_dot] = 0; se of the mean over 60 pairs at 32→16
    // dims is ~ ‖a‖‖b‖/sqrt(16*60) ≈ 32/31 ≈ 1 for gaussian 32-dim vecs
    assert(math.abs(meanErr) < 3.0, s"mean dot error too large: $meanErr")
    // and projected norms stay within a loose multiplicative band
    val norms = pairs.toDF("id", "a", "b").select(
      VectorFunctions.l2Norm($"a").as("n"),
      VectorFunctions.l2Norm(VectorFunctions.randomProjectSigns($"a", 32, 16)).as("pn"))
      .collect().map(r => r.getDouble(1) / r.getDouble(0))
    assert(norms.forall(r => r > 0.4 && r < 1.8),
      s"projected norm ratio out of band: min=${norms.min} max=${norms.max}")
  }

  test("projection is deterministic, layout-invariant and domain-separated") {
    val vecs = (1 to 50).map(i => (i.toLong, Array.fill(8)(i * 0.1f + 1)))
    val df = vecs.toDF("id", "v")
    def run(parts: Int, domain: String) =
      df.repartition(parts)
        .select($"id", VectorFunctions.randomProjectSigns($"v", 8, 4, domain).as("p"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(run(1, "jl") == run(7, "jl"))
    assert(run(1, "jl") != run(1, "other"), "domains must yield different matrices")
  }

  test("short vectors yield null elements, not silent truncation; bad dims rejected") {
    val df = Seq(Tuple1(Array(1.0f, 2.0f))).toDF("v")
    val out = df.select(VectorFunctions.randomProjectSigns($"v", 3, 2).as("p"))
      .select(explode($"p").as("x")).collect().map(r => Option(r.get(0)))
    assert(out.forall(_.isEmpty), s"expected all-null projection, got $out")
    intercept[IllegalArgumentException] {
      VectorFunctions.randomProjectSigns($"v", 0, 2)
    }
    intercept[IllegalArgumentException] {
      VectorFunctions.randomProjectSigns($"v", 3, 0)
    }
  }
}
