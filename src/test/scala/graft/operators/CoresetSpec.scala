package graft.operators

import graft.SparkFunSuite

class CoresetSpec extends SparkFunSuite {
  import spark.implicits._

  private def fixture(points: Seq[(Long, Seq[Float])]) =
    points.toDF("vec_id", "embedding")

  test("kCenterGreedy replays the hand-computed farthest-point walk") {
    // collinear points at x = 0, 1, 10: seed = id 0, then the far point
    // (d2 = 100), then the middle one (min-dist to {0, 10} is 1² = 1)
    val got = Coreset.kCenterGreedy(fixture(Seq(
        (0L, Seq(0f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(10f, 0f)))),
        "vec_id", "embedding", k = 3)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq === Seq((0, 0L, None), (1, 2L, Some(100.0)),
      (2, 1L, Some(1.0))))
  }

  test("equidistant candidates break the tie to the smaller id") {
    // ids 5 and 9 both at distance 4 from the seed (id 1 at the origin)
    val got = Coreset.kCenterGreedy(fixture(Seq(
        (1L, Seq(0f, 0f)), (9L, Seq(2f, 0f)), (5L, Seq(0f, 2f)))),
        "vec_id", "embedding", k = 2)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq === Seq((0, 1L), (1, 5L)))
  }

  /** Naive O(k·n) reference with the operator's exact arithmetic. */
  private def naive(pts: Seq[(Long, Seq[Float])],
                    k: Int): Seq[(Int, Long, Option[Double])] = {
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val vs = pts.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    var sel = Vector(pts.map(_._1).min)
    var out = Vector[(Int, Long, Option[Double])]((0, sel.head, None))
    for (step <- 1 until k) {
      val cand = pts.map(_._1).filterNot(sel.contains).map { id =>
        val v = vs(id)
        val mind2 = sel.map { s =>
          val sv = vs(s)
          dot(v, v) + dot(sv, sv) - 2.0 * dot(v, sv)
        }.min
        (mind2, id)
      }
      val (d2, id) = cand.maxBy { case (d, i) => (d, -i) }
      sel = sel :+ id
      out = out :+ ((step, id, Some(d2)))
    }
    out
  }

  test("randomized differential against the naive reference; radius shrinks") {
    val rng = new scala.util.Random(20260814)
    val pts = (0L until 40L).map(i =>
      i -> Seq.fill(8)(rng.nextFloat() * 2f - 1f))
    val got = Coreset.kCenterGreedy(fixture(pts), "vec_id", "embedding", k = 10)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq
    assert(got === naive(pts, 10))
    val radii = got.flatMap(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"coverage radius must be monotone non-increasing: $radii")
  }

  test("a corpus smaller than k fails loudly; layout is irrelevant") {
    intercept[IllegalArgumentException] {
      Coreset.kCenterGreedy(fixture(Seq((1L, Seq(0f)))), "vec_id", "embedding", 2)
    }
    val pts = (0L until 20L).map(i => i -> Seq(i.toFloat, (i % 3).toFloat))
    val a = Coreset.kCenterGreedy(fixture(pts), "vec_id", "embedding", 5)
      .orderBy("step").collect().toSeq
    val b = Coreset.kCenterGreedy(fixture(pts).repartition(7), "vec_id", "embedding", 5)
      .orderBy("step").collect().toSeq
    assert(a === b)
  }

  test("mmrSelect: hand-replayed picks, diversity beats relevance, ties") {
    import org.apache.spark.sql.functions.col
    // rel: 1:1.0 2:0.9 3:0.8 4:0.7; v1=v2=(1,0), v3=(0,1), v4=(.6,.8)
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 1.0), (2L, Seq(1.0f, 0.0f), 0.9),
      (3L, Seq(0.0f, 1.0f), 0.8), (4L, Seq(0.6f, 0.8f), 0.7))
      .toDF("id", "v", "rel")
    val got = Coreset.mmrSelect(df, "id", "v", "rel", k = 3, lambda = 0.5)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSeq
    // step1: id2 .5*.9-.5*1 = -.05; id3 .5*.8-0 = .4; id4 ~.05 -> id3.
    // step2 vs {1,3}: id2 ~-.05; id4 ~-.050000006 (the float-promoted
    // 0.8f sim) -> id2 by value
    val s3 = 0.5 * 0.8 - 0.5 * 0.0
    val s2 = 0.5 * 0.9 - 0.5 * 1.0
    assert(got == Seq((0, 1L, None), (1, 3L, Some(s3)), (2, 2L, Some(s2))))
    // the diversity term matters: pure relevance would pick id2 second
    intercept[IllegalArgumentException] {
      Coreset.mmrSelect(df, "id", "v", "rel", k = 0, lambda = 0.5)
    }
    intercept[IllegalArgumentException] {
      Coreset.mmrSelect(df, "id", "v", "rel", k = 2, lambda = 1.5)
    }
    intercept[IllegalArgumentException] {
      Coreset.mmrSelect(df.filter(col("id") < 3), "id", "v", "rel",
        k = 3, lambda = 0.5)
    }
  }
}
