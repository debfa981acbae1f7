package graft.sources

import graft.SparkFunSuite

class PartitionScopeSpec extends SparkFunSuite {
  import spark.implicits._

  test("null partition values match null-safely in both regimes") {
    val df = Seq((1L, Some("a")), (2L, Some("b")), (3L, Option.empty[String]))
      .toDF("id", "part")
    val pending = Seq(Option.empty[String]).toDF("part")
    val literal = PartitionScope.scopeTo(df, pending, literalThreshold = 256)
      .collect().map(_.getLong(0))
    val semi = PartitionScope.scopeTo(df, pending, literalThreshold = 0)
      .collect().map(_.getLong(0))
    assert(literal.toSeq == Seq(3L), "literal regime must match the null partition")
    assert(semi.toSeq == Seq(3L), "semi-join regime must match the null partition")
  }
}
