package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class PackSpec extends SparkFunSuite {
  import spark.implicits._

  private def packed(rows: Seq[(Long, String, Long)], capacity: Long) =
    Pack.greedyPack(rows.toDF("doc_id", "shard", "tok"),
        "doc_id", "tok", Seq("shard"), capacity)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("greedy fill with reset, in id order") {
    // capacity 10: [4,5] fills 9, 3 overflows -> new pack, [3,7] fills 10, 2 -> new
    val out = packed(Seq(
      (1L, "s", 4L), (2L, "s", 5L), (3L, "s", 3L), (4L, "s", 7L), (5L, "s", 2L)), 10)
    assert(out == Seq(
      (1L, 0L, 0L, 4L), (2L, 0L, 4L, 9L),
      (3L, 1L, 0L, 3L), (4L, 1L, 3L, 10L),
      (5L, 2L, 0L, 2L)))
  }

  test("oversized document gets its own pack; zero-length joins current") {
    val out = packed(Seq(
      (1L, "s", 25L), (2L, "s", 0L), (3L, "s", 5L)), 10)
    // doc 1 alone (fill 25 > cap), doc 2 overflows (25+0 > 10) -> pack 1 fill 0,
    // doc 3 joins pack 1
    assert(out == Seq((1L, 0L, 0L, 25L), (2L, 1L, 0L, 0L), (3L, 1L, 0L, 5L)))
  }

  test("shards pack independently") {
    val out = Pack.greedyPack(
      Seq((1L, "a", 6L), (2L, "b", 6L), (3L, "a", 6L), (4L, "b", 3L))
        .toDF("doc_id", "shard", "tok"), "doc_id", "tok", Seq("shard"), 10)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    // a: 6 | 6 ; b: 6+3
    assert(out == Seq((1L, 0L, 6L), (2L, 0L, 6L), (3L, 1L, 6L), (4L, 0L, 9L)))
  }

  test("pack_fill never exceeds capacity except for oversized singletons") {
    val rows = (1L to 200L).map(i => (i, s"s${i % 3}", (i * 37) % 23))
    val df = rows.toDF("doc_id", "shard", "tok")
    val out = Pack.greedyPack(df, "doc_id", "tok", Seq("shard"), 40)
      .join(df, "doc_id")
    assert(out.filter(col("pack_fill") > 40 && col("tok") <= 40).isEmpty)
    // offsets are consistent: offset + tok == fill
    assert(out.filter(col("pack_offset") + col("tok") =!= col("pack_fill")).isEmpty)
    // every row accounted for exactly once
    assert(out.count() == 200)
  }

  test("randomized differential vs an in-memory greedy reference") {
    val rng = new scala.util.Random(20260812)
    val rows = (1L to 3000L).map(i =>
      (i, s"sh${rng.nextInt(7)}", rng.nextInt(120).toLong))
    val cap = 100L
    // driver-side reference: plain sequential greedy fill per shard
    val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
      var pack = -1L; var fill = 0L
      rs.sortBy(_._1).map { case (id, _, tok) =>
        if (pack < 0 || fill + tok > cap) { pack += 1; fill = tok } else fill += tok
        (id, pack, fill - tok, fill)
      }
    }.toSet
    val got = Pack.greedyPack(rows.toDF("doc_id", "shard", "tok"),
        "doc_id", "tok", Seq("shard"), cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("packCorpus emits one row per pack, consistent with greedyPack") {
    val rng = new scala.util.Random(99)
    val rows = (1L to 800L).map(i =>
      (i, s"sh${rng.nextInt(5)}", rng.nextInt(60).toLong + 1, s"d$i"))
    val df = rows.toDF("doc_id", "shard", "tok", "text")
    val asg = Pack.greedyPack(df, "doc_id", "tok", Seq("shard"), 150)
      .join(df, "doc_id")
    val expected = asg.collect()
      .map(r => (r.getAs[String]("shard"), r.getAs[Long]("pack_id"),
        r.getAs[Long]("doc_id"), r.getAs[String]("text"), r.getAs[Long]("tok")))
      .groupBy(t => (t._1, t._2))
      .map { case ((shard, pack), ms) =>
        val sorted = ms.sortBy(_._3)
        (shard, pack, sorted.map(_._4).mkString("|"), sorted.length.toLong,
          sorted.map(_._5).sum)
      }.toSet
    val got = Pack.packCorpus(df, "doc_id", "text", "tok", Seq("shard"), 150, "|")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  test("packCorpus round-trips null shard values and respects id order") {
    val df = Seq(
      (2L, Option.empty[String], 5L, "b"),
      (1L, Option.empty[String], 5L, "a"),
      (3L, Some("x"), 5L, "c")
    ).toDF("doc_id", "shard", "tok", "text")
    val out = Pack.packCorpus(df, "doc_id", "text", "tok", Seq("shard"), 100, " ")
      .orderBy("pack_id", "shard").collect()
      .map(r => (Option(r.getString(0)), r.getString(2), r.getLong(3))).toSeq
    assert(out.toSet == Set((None, "a b", 2L), (Some("x"), "c", 1L)))
  }

  test("negative token counts are rejected") {
    val ex = intercept[Exception] {
      packed(Seq((1L, "s", -1L)), 10)
    }
    assert(ex.getMessage.contains("negative token count")
      || ex.getCause != null)
  }

  test("paddingReport: closed-form buckets, exact waste arithmetic") {
    import org.apache.spark.sql.functions.col
    // width 10: bucket 0 = {3, 7}, bucket 1 = {10, 15, 19}, bucket 3 = {30}
    // nulls and zeros excluded
    val df = Seq(Some(3L), Some(7L), Some(10L), Some(15L), Some(19L),
      Some(30L), None, Some(0L)).toDF("n_tok")
    val got = Pack.paddingReport(df, "n_tok", 10)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (0L, 2L, 7L, 10L, 14L, 4.0 / 14.0),   // pad 3->7: waste 4 of 14
      (1L, 3L, 19L, 44L, 57L, 13.0 / 57.0), // pad to 19: 57 processed, 13 pad
      (3L, 1L, 30L, 30L, 30L, 0.0)))        // singleton: zero waste
    val empty = Pack.paddingReport(Seq.empty[Option[Long]].toDF("n_tok"), "n_tok", 10)
    assert(empty.count() == 0)
  }
}
