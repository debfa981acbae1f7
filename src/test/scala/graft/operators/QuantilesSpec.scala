package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkFunSuite

class QuantilesSpec extends SparkFunSuite {
  import spark.implicits._

  private def builtin(vs: Seq[Double], ps: Seq[Double]): Seq[Double] = {
    val arr = ps.mkString("array(", ", ", ")")
    vs.toDF("v").agg(expr(s"percentile(v, $arr)")).head
      .getSeq[Double](0).toSeq
  }

  test("matches the built-in exact percentile on random data") {
    val rng = new scala.util.Random(42)
    val vs = Seq.fill(5000)(rng.nextDouble() * 1000 - 500)
    val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    val got = Quantiles.exact(vs.toDF("v"), "v", ps)
      .orderBy("p").collect().map(_.getDouble(1)).toSeq
    assert(got == builtin(vs, ps))
  }

  test("ties spanning partitions do not disturb the order statistics") {
    val vs = Seq.fill(2000)(7.0) ++ Seq.fill(2000)(3.0) ++ Seq.fill(1000)(5.0)
    val ps = Seq(0.1, 0.4, 0.5, 0.9)
    val got = Quantiles.exact(vs.toDF("v"), "v", ps)
      .orderBy("p").collect().map(_.getDouble(1)).toSeq
    assert(got == builtin(vs, ps))
  }

  test("single row, nulls ignored, empty input") {
    val one = Seq(Some(42.0), None, None).toDF("v")
    assert(Quantiles.exact(one, "v", Seq(0.0, 0.5, 1.0))
      .collect().forall(_.getDouble(1) == 42.0))
    val empty = Seq.empty[Option[Double]].toDF("v")
    assert(Quantiles.exact(empty, "v", Seq(0.5)).collect().forall(_.isNullAt(1)))
  }

  test("interpolates between ranks (R-7)") {
    // values 10,20,30,40: p=0.5 -> h=1.5 -> 20 + 0.5*(30-20) = 25
    val got = Quantiles.exact(Seq(10.0, 20.0, 30.0, 40.0).toDF("v"), "v", Seq(0.5))
      .head.getDouble(1)
    assert(got == 25.0)
  }
}
