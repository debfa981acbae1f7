package graft.operators

import graft.SparkFunSuite

class RfmSpec extends SparkFunSuite {
  import spark.implicits._

  test("rfmSegments: hand-cut scores on all three axes, exact monetary") {
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // maxDay=12. rec: u1=2 u2=1 u3=0 u4=3; freq: 1/2/1/3; mon: 5/1/3/10
    val df = Seq(
      (1L, ts(10), 5.0),
      (2L, ts(10), 0.25), (2L, ts(11), 0.75),
      (3L, ts(12), 3.0),
      (4L, ts(9), 4.0), (4L, ts(9), 4.0), (4L, ts(9), 2.0))
      .toDF("u", "t", "v")
    // nBuckets=2, n=4: rank*2 div 4 + 1 -> first two sorted get 1
    // R (rec DESC): u4,u1 -> 1; u2,u3 -> 2
    // F (freq ASC): u1,u3 -> 1; u2,u4 -> 2
    // M (mon ASC):  u2,u3 -> 1; u1,u4 -> 2
    val got = Rfm.rfmSegments(df, "u", "t", "v", nBuckets = 2)
      .orderBy("r_score", "f_score", "m_score").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == Seq(
      (1, 1, 2, 1L, 5.0),    // u1
      (1, 2, 2, 1L, 10.0),   // u4
      (2, 1, 1, 1L, 3.0),    // u3
      (2, 2, 1, 1L, 1.0)))   // u2
    // null values count zero monetary, null users drop
    val nulls = Seq((Option(1L), Option(ts(1)), Option(2.0)),
      (Option(1L), Option(ts(1)), None),
      (None, Option(ts(2)), Option(9.0))).toDF("u", "t", "v")
    val r = Rfm.rfmSegments(nulls, "u", "t", "v", nBuckets = 2).collect()
    assert(r.length == 1 && r.head.getLong(3) == 1L &&
      r.head.getDouble(4) == 2.0)
    intercept[IllegalArgumentException] {
      Rfm.rfmSegments(df, "u", "t", "v", nBuckets = 1)
    }
  }
}
