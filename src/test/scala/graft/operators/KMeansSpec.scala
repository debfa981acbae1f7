package graft.operators

import graft.SparkFunSuite

class KMeansSpec extends SparkFunSuite {
  import spark.implicits._

  private def vecs(vs: (Long, Seq[Float])*) =
    vs.toSeq.toDF("vec_id", "embedding")

  test("lloyd: one hand-computed 1-D iteration from the min-id init") {
    // quantized at scale 10: 0, 2, 100, 102; init c0=[0] (id 1), c1=[2]
    // (id 2); assignment pulls 100/102 to c1; means 0 and (2+100+102)/3
    val out = KMeans.lloyd(
        vecs(1L -> Seq(0.0f), 2L -> Seq(0.2f), 3L -> Seq(10.0f),
          4L -> Seq(10.2f)),
        "vec_id", "embedding", k = 2, iters = 1, scale = 10)
      .orderBy("cluster").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(out.toSeq == Seq((0, 1L, 0, 0.0), (1, 3L, 0, 68.0)))
  }

  test("lloyd: a second iteration converges to the true 1-D clusters") {
    val out = KMeans.lloyd(
        vecs(1L -> Seq(0.0f), 2L -> Seq(0.2f), 3L -> Seq(10.0f),
          4L -> Seq(10.2f)),
        "vec_id", "embedding", k = 2, iters = 2, scale = 10)
      .orderBy("cluster").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(out.toSeq == Seq((0, 2L, 1.0), (1, 2L, 101.0)))
  }

  test("lloyd: equidistant points break ties to the lower cluster id; empty clusters drop") {
    // duplicate init points: every vector ties -> all flow to cluster 0,
    // cluster 1 receives nothing and drops from the output
    val out = KMeans.lloyd(
        vecs(1L -> Seq(0.0f), 2L -> Seq(0.0f), 3L -> Seq(0.0f),
          4L -> Seq(5.0f)),
        "vec_id", "embedding", k = 2, iters = 1, scale = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(out.toSeq == Seq((0, 4L, 12.5)))
  }

  test("lloyd: multi-dim centroids are exact per-dimension integer divisions") {
    val out = KMeans.lloyd(
        vecs(1L -> Seq(0.0f, 1.0f), 2L -> Seq(1.0f, 0.0f)),
        "vec_id", "embedding", k = 1, iters = 1, scale = 10)
      .orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(out.toSeq == Seq((0, 2L, 0, 5.0), (0, 2L, 1, 5.0)))
  }

  test("lloyd rejects bad arguments and undersized corpora") {
    val df = vecs(1L -> Seq(0.0f))
    intercept[IllegalArgumentException] {
      KMeans.lloyd(df, "vec_id", "embedding", k = 0, iters = 1)
    }
    intercept[IllegalArgumentException] {
      KMeans.lloyd(df, "vec_id", "embedding", k = 1, iters = 0)
    }
    intercept[IllegalArgumentException] {
      KMeans.lloyd(df, "vec_id", "embedding", k = 2, iters = 1)
    }
  }
}
