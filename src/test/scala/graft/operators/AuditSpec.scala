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

  test("benfordDigits: exact leading digits, zero-digit rows kept, hand-replayed chi2") {
    val vals = Seq(Some(1.5), Some(23.0), Some(0.0045), Some(999.999999),
      Some(1.0), Some(12345.6), Some(0.0), Some(-5.0), None)
      .toDF("v")
    val got = Audit.benfordDigits(vals, "v").orderBy("digit").collect()
    assert(got.length == 9, "all nine digits present, observed or not")
    val counts = got.map(r => (r.getInt(0), r.getLong(1))).toMap
    // digits: 1.5→1, 23→2, 0.0045→4, 999.999999→9, 1.0→1, 12345.6→1
    assert(counts == Map(1 -> 3L, 2 -> 1L, 3 -> 0L, 4 -> 1L, 5 -> 0L,
      6 -> 0L, 7 -> 0L, 8 -> 0L, 9 -> 1L))
    val exp = Audit.benfordLiterals
    assert(got.map(_.getDouble(3)).toSeq == exp)
    // chi2 replay: digit-ascending fold, n = 6
    var chi2 = 0.0
    (1 to 9).foreach { d =>
      val e = 6.0 * exp(d - 1)
      val o = counts(d).toDouble
      chi2 = chi2 + (o - e) * (o - e) / e
    }
    assert(got.head.getDouble(4) == chi2)
    assert(math.abs(got.map(_.getDouble(2)).sum - 1.0) < 1e-12,
      "observed fractions sum to 1 (up to double addition)")
    // empty input: zero counts, chi2 0 by contract (not NaN)
    val empty = Audit.benfordDigits(vals.filter($"v" > 1e9), "v")
      .orderBy("digit").collect()
    assert(empty.forall(r => r.getLong(1) == 0L && r.getDouble(4) == 0.0))
  }

  test("fdViolations: holding and broken rules, null-as-value, null keys") {
    val df = Seq(
      (Option(1L), Option("a"), Option("x")),
      (Option(1L), Option("a"), Option("y")),   // k->v2 violated by 1
      (Option(2L), Option("b"), Option("x")),
      (Option(2L), Option("b"), None),          // null value: violation
      (Option(3L), Option("c"), Option("z")),
      (None, Option("d"), Option("z")))         // null key: excluded
      .toDF("k", "v1", "v2")
    val got = Audit.fdViolations(df, Seq("k" -> "v1", "k" -> "v2"))
      .orderBy("determinant", "dependent").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("v1", 3L, 0L, 0.0, 1L),            // k -> v1 holds
      ("v2", 3L, 2L, 2.0 / 3.0, 2L)))     // keys 1 and 2 violate
    intercept[IllegalArgumentException] {
      Audit.fdViolations(df, Seq.empty)
    }
  }
}
