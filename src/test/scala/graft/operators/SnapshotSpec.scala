package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class SnapshotSpec extends SparkFunSuite {
  import spark.implicits._

  test("diff: added / removed / changed / unchanged all classify correctly") {
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("doc_id", "text")
    val nu = Seq((2L, "beta"), (3L, "GAMMA"), (4L, "delta"), (5L, "epsilon"))
      .toDF("doc_id", "text")
    val got = Snapshot.diff(old, nu, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(got == Seq(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("diff: null text equals empty text (the ledger convention), never misclassifies presence") {
    val old = Seq((1L, null: String), (2L, "x")).toDF("doc_id", "text")
    val nu = Seq((1L, ""), (2L, null: String)).toDF("doc_id", "text")
    val got = Snapshot.diff(old, nu, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // null -> '' so 1 is unchanged; 2 went "x" -> '' which is a content change
    assert(got == Seq((1L, "unchanged"), (2L, "changed")))
  }

  test("diff: fingerprints ride along for downstream routing") {
    val old = Seq((1L, "a")).toDF("doc_id", "text")
    val nu = Seq((2L, "b")).toDF("doc_id", "text")
    val rows = Snapshot.diff(old, nu, "doc_id", "text").orderBy("doc_id").collect()
    assert(rows(0).getString(1) == "removed"
      && rows(0).getString(2) != null && rows(0).isNullAt(3))
    assert(rows(1).getString(1) == "added"
      && rows(1).isNullAt(2) && rows(1).getString(3) != null)
  }

  test("diff: identical snapshots are all-unchanged; disjoint are added+removed only") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val same = Snapshot.diff(a, a, "doc_id", "text")
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(same == Map("unchanged" -> 2L))
    val b = Seq((3L, "z")).toDF("doc_id", "text")
    val disj = Snapshot.diff(a, b, "doc_id", "text")
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(disj == Map("removed" -> 2L, "added" -> 1L))
  }
}
