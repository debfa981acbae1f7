package graft.operators

import graft.SparkFunSuite

class ProfileSpec extends SparkFunSuite {
  import spark.implicits._

  test("per-column stats, nulls and means on a known frame") {
    val df = Seq(
      (Some(1.0), 2.0),
      (None: Option[Double], 4.0),
      (Some(3.0), 4.0)
    ).toDF("a", "b")
    val out = Profile.numericProfile(df, Seq("a", "b"))
      .orderBy("col_name").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    val a = out(0)
    assert(a.getAs[Long]("n") == 3 && a.getAs[Long]("n_null") == 1 &&
      a.getAs[Long]("n_distinct") == 2)
    assert(a.getAs[Double]("min_v") == 1.0 && a.getAs[Double]("max_v") == 3.0)
    assert(a.getAs[Double]("sum_v") == 4.0 && a.getAs[Double]("mean_v") == 2.0)
    val b = out(1)
    assert(b.getAs[Long]("n_null") == 0 && b.getAs[Long]("n_distinct") == 2)
    assert(b.getAs[Double]("mean_v") == 10.0 / 3)
  }

  test("all columns profile in ONE scan of the source (not one per column)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plan = Profile.numericProfile(df,
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly one file scan, found $scans:\n$plan")
  }

  test("an all-null column yields a null mean, not a division blowup") {
    val df = Seq((Option.empty[Double], 1.0), (Option.empty[Double], 2.0))
      .toDF("a", "b")
    val a = Profile.numericProfile(df, Seq("a")).head
    assert(a.getAs[Long]("n_null") == 2)
    assert(a.isNullAt(a.fieldIndex("mean_v")))
  }
}
