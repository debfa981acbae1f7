package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class QuantizeSpec extends SparkFunSuite {
  import spark.implicits._

  test("quantizeInt8: known values, scale = maxAbs/127") {
    val df = Seq(Tuple1(Array(1.0f, -0.5f, 0.25f))).toDF("v")
    val r = df.select(VectorFunctions.quantizeInt8($"v").as("s"))
      .select($"s.scale", $"s.q").head
    assert(r.getDouble(0) == 1.0 / 127.0)
    // q = floor(v*127/1.0 + 0.5): [127, -63 (floor(-63.0)), 32 (floor(32.25))]
    assert(r.getSeq[Int](1) == Seq(127, -63, 32))
  }

  test("quantized values stay in [-127, 127]; reconstruction within scale/2") {
    val rng = new scala.util.Random(7)
    val vecs = (1 to 200).map(i =>
      (i.toLong, Array.fill(32)((rng.nextFloat() - 0.5f) * 4.0f)))
    val df = vecs.toDF("id", "v")
      .select($"id", $"v", VectorFunctions.quantizeInt8($"v").as("s"))
    val bad = df.filter(exists($"s.q", q => abs(q) > 127))
    assert(bad.isEmpty, "quantized magnitude exceeded 127")
    val err = df.select(
      array_max(zip_with($"v",
        VectorFunctions.dequantInt8($"s.q", $"s.scale"),
        (x, y) => abs(x.cast("double") - y))).as("e"),
      ($"s.scale" * 0.5000001).as("bound"))
    assert(err.filter($"e" > $"bound").isEmpty, "reconstruction error above scale/2")
  }

  test("all-zero and empty vectors: scale 0, exact roundtrip") {
    val df = Seq((1L, Array(0.0f, 0.0f)), (2L, Array.empty[Float])).toDF("id", "v")
      .select($"id", VectorFunctions.quantizeInt8($"v").as("s"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getStruct(1).getDouble(0) == 0.0)
    assert(rows(0).getStruct(1).getSeq[Int](1) == Seq(0, 0))
    assert(rows(1).getStruct(1).getSeq[Int](1).isEmpty)
  }
}
