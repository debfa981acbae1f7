package graft.operators

import graft.SparkFunSuite

class AuditSpec extends SparkFunSuite {
  import spark.implicits._

  test("referentialOrphans: hand-computed rows/keys/orphans/nulls") {
    val child = Seq(Some(1), Some(1), Some(2), Some(2), Some(2), Some(3), None)
      .toDF("fk")
    val parent = Seq(1, 3).toDF("pk")
    val r = Audit.referentialOrphans(child, "fk", parent, "pk").collect().head
    assert(r.getAs[Long]("n_rows") == 6L && r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("n_orphan_rows") == 3L &&
      r.getAs[Long]("n_orphan_keys") == 1L)
    assert(r.getAs[Long]("n_null_rows") == 1L)
    assert(r.getAs[Double]("orphan_frac") == 0.5)
  }

  test("referentialOrphans: empty child yields zeros, never NaN") {
    val child = Seq.empty[Option[Int]].toDF("fk")
    val parent = Seq(1).toDF("pk")
    val r = Audit.referentialOrphans(child, "fk", parent, "pk").collect().head
    assert(r.getAs[Long]("n_rows") == 0L && r.getAs[Long]("n_orphan_rows") == 0L)
    assert(r.getAs[Double]("orphan_frac") == 0.0)
  }

  test("referentialOrphans: duplicate parent keys don't multiply child rows") {
    val child = Seq(1, 2).toDF("fk")
    val parent = Seq(1, 1, 1).toDF("pk")
    val r = Audit.referentialOrphans(child, "fk", parent, "pk").collect().head
    assert(r.getAs[Long]("n_rows") == 2L &&
      r.getAs[Long]("n_orphan_rows") == 1L &&
      r.getAs[Long]("n_orphan_keys") == 1L)
  }
}
