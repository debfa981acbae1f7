package graft.operators

import graft.SparkFunSuite

class IntervalsSpec extends SparkFunSuite {
  import spark.implicits._

  test("unionLength: overlaps merge once, touching merges, gaps split") {
    val df = Seq(
      // a: [0,10] ∪ [5,20] ∪ [20,25] -> one island [0,25]; [30,31] apart
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 25L), ("a", 30L, 31L),
      // b: nested [0,100] ⊇ [10,20] -> one island, covered 100
      ("b", 0L, 100L), ("b", 10L, 20L),
      // c: zero-length point inside [0,5]; lone point at 9
      ("c", 0L, 5L), ("c", 3L, 3L), ("c", 9L, 9L)).toDF("g", "s", "e")
    val got = Intervals.unionLength(df, Seq("g"), "s", "e").orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(("a", 4L, 2L, 26L), ("b", 2L, 1L, 100L),
      ("c", 3L, 2L, 5L)))
  }

  test("unionLength: malformed and null rows drop; duplicates invariant") {
    val df = Seq(
      ("a", Option(5L), Option(1L)),   // end < start: excluded
      ("a", Option(0L), Option(2L)),
      ("a", Option(0L), Option(2L)),   // exact duplicate
      ("a", None, Option(9L)),
      ("a", Option(9L), None)).toDF("g", "s", "e")
    val r = Intervals.unionLength(df, Seq("g"), "s", "e").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 1L, 2L)))
    intercept[IllegalArgumentException] {
      Intervals.unionLength(df, Seq.empty, "s", "e")
    }
  }
}
