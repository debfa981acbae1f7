package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class TopKSpec extends SparkFunSuite {
  import spark.implicits._

  // deterministic pseudo-random fixture with heavy ties and a skewed group
  private def fixture = {
    val rows = (1L to 4000L).map { i =>
      val g = if (i % 10 < 7) "hot" else s"g${i % 10}"   // 70% of rows in one group
      val score = (i * 2654435761L % 97).toDouble        // dense tie space
      (g, i, score)
    }
    rows.toDF("g", "id", "score")
  }

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    fixture.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("g", "rnk", "id", "score")
  }

  private def heapTopK(k: Int) =
    fixture.groupBy("g")
      .agg(TopK.topK(k, col("score"), col("id"), struct(col("id"), col("score"))).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.payload.id").as("id"), col("col.payload.score").as("score"))

  test("heap top-k == window row_number formulation, ties broken on tie column") {
    for (k <- Seq(1, 5, 50)) {
      val a = heapTopK(k)
      val b = windowTopK(k)
      assert(a.except(b).isEmpty && b.except(a).isEmpty, s"mismatch at k=$k")
    }
  }

  test("partial heaps merge correctly across many partitions") {
    // 64 input partitions force map-side partials + a reduce-side merge path
    val scattered = fixture.repartition(64)
    val a = scattered.groupBy("g")
      .agg(TopK.topK(7, col("score"), col("id"), col("id")).as("top"))
      .select(col("g"), explode(col("top.payload")).as("id"))
    val b = windowTopK(7).select("g", "id")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("k larger than group size returns the whole group, ordered") {
    val tiny = Seq(("a", 1L, 5.0), ("a", 2L, 9.0), ("b", 3L, 1.0)).toDF("g", "id", "score")
    val got = tiny.groupBy("g")
      .agg(TopK.topK(100, col("score"), col("id"), col("id")).as("top"))
      .select(col("g"), col("top.ord").as("ords"), col("top.payload").as("ids"))
      .collect().map(r => r.getString(0) -> (r.getSeq[Double](1), r.getSeq[Long](2))).toMap
    assert(got("a") == (Seq(9.0, 5.0), Seq(2L, 1L)))
    assert(got("b") == (Seq(1.0), Seq(3L)))
  }

  test("null ord or tie rows are ignored; all-null group yields empty array") {
    val df = Seq(
      ("a", Some(1L), Some(2.0)), ("a", None, Some(9.0)), ("a", Some(3L), None),
      ("b", None, None)).toDF("g", "id", "score")
    val got = df.groupBy("g")
      .agg(TopK.topK(3, col("score"), col("id"), col("id")).as("top"))
      .select(col("g"), size(col("top")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 1, "b" -> 0))
  }

  test("struct payload round-trips through serialization (string + array fields)") {
    val df = Seq(
      ("a", 1L, 3.0, "x", Seq(1, 2)), ("a", 2L, 7.0, "y", Seq(3)),
      ("a", 3L, 5.0, "z", Seq.empty[Int])).toDF("g", "id", "score", "s", "arr")
      .repartition(8) // force serialize/deserialize of partial buffers
    val top = df.groupBy("g")
      .agg(TopK.topK(2, col("score"), col("id"), struct(col("s"), col("arr"))).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.payload.s").as("s"), col("e.payload.arr").as("arr"))
      .orderBy("s")
      .collect().map(r => (r.getString(0), r.getSeq[Int](1)))
    assert(top.toSeq == Seq(("y", Seq(3)), ("z", Seq.empty[Int])))
  }

  test("top_k is callable from SQL") {
    GraftFunctions.register(spark)
    fixture.createOrReplaceTempView("topk_fixture")
    val got = spark.sql(
      """SELECT g, e.payload AS id FROM (
        |  SELECT g, top_k(score, id, id, 3) AS top FROM topk_fixture GROUP BY g)
        |LATERAL VIEW explode(top) AS e""".stripMargin)
    val want = windowTopK(3).select("g", "id")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }
}
