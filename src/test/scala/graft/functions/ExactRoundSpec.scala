package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class ExactRoundSpec extends SparkFunSuite {
  import spark.implicits._

  private def rf(x: Double, digits: Int): Double = {
    val p = math.pow(10.0, digits)
    math.floor(x * p + 0.5) / p
  }

  test("roundFloor: the Spark column equals the literal JVM arithmetic on random doubles") {
    val rnd = new Random(101)
    val xs = Seq.fill(4000)((rnd.nextDouble() - 0.5) * math.pow(10.0, rnd.nextInt(6)))
    for (digits <- Seq(0, 4, 6)) {
      val got = xs.toDF("x")
        .select(ExactRound.roundFloor(col("x"), digits).as("r"))
        .collect().map(_.getDouble(0))
      xs.zip(got).foreach { case (x, g) =>
        assert(g == rf(x, digits), s"x=$x digits=$digits: col=$g jvm=${rf(x, digits)}")
      }
    }
  }

  test("roundFloor: error bound, idempotence, and the q115 regression value") {
    val rnd = new Random(7)
    val xs = Seq.fill(2000)((rnd.nextDouble() - 0.5) * 1000.0)
    xs.foreach { x =>
      val r = rf(x, 4)
      assert(math.abs(r - x) <= 5.0001e-5, s"x=$x r=$r drifted past half-grain")
      assert(rf(r, 4) == r, s"rounding must be idempotent at $x")
    }
    // the live divergence: −2.78325's nearest double is just below the
    // .5 tie, so the floor form rounds DOWN-in-magnitude to −2.7832 —
    // matching DuckDB's binary-scaling result, not Spark round()'s
    // shortest-decimal −2.7833
    val x = -2.78325
    assert(rf(x, 4) == -2.7832)
    assert(Seq(x).toDF("x").select(ExactRound.roundFloor(col("x"), 4)).head.getDouble(0)
      == -2.7832)
    intercept[IllegalArgumentException] { ExactRound.roundFloor(col("x"), 16) }
    intercept[IllegalArgumentException] { ExactRound.roundFloor(col("x"), -1) }
  }

  test("hexThreshold and roundFloor agree on representable-boundary behavior") {
    // hexThreshold's floor(frac·2³²) and roundFloor share the same
    // IEEE-floor foundation: spot-check frac values whose product lands
    // exactly on integers — no off-by-one at representable boundaries
    assert(graft.operators.Sampling.hexThreshold(0.25) == "40000000")
    assert(graft.operators.Sampling.hexThreshold(0.75) == "c0000000")
    assert(graft.operators.Sampling.hexThreshold(1.0 / 16.0) == "10000000")
  }
}
