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

  private def md5Word(s: String, off: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.substring(off, off + 8), 16)
  }

  test("manifest: exact stats and the hand-computed md5 word sums") {
    val df = Seq((1L, "alpha", "s1", 5L), (2L, "beta", "s1", 4L),
        (7L, "gamma", "s2", 5L))
      .toDF("id", "text", "shard", "w")
    val out = Snapshot.manifest(df, "shard", "id", "text", "w")
      .orderBy("shard").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      ("s1", 2L, 9L, 1L, 2L,
        md5Word("1:alpha", 0) + md5Word("2:beta", 0),
        md5Word("1:alpha", 8) + md5Word("2:beta", 8)),
      ("s2", 1L, 5L, 7L, 7L, md5Word("7:gamma", 0), md5Word("7:gamma", 8))))
  }

  test("manifest: checksum is row-order independent but catches any row change") {
    val a = Seq((1L, "x", "s", 1L), (2L, "y", "s", 1L), (3L, "z", "s", 1L))
      .toDF("id", "text", "shard", "w")
    val b = Seq((3L, "z", "s", 1L), (1L, "x", "s", 1L), (2L, "y", "s", 1L))
      .toDF("id", "text", "shard", "w").repartition(7)
    val ca = Snapshot.manifest(a, "shard", "id", "text", "w").collect().head
    val cb = Snapshot.manifest(b, "shard", "id", "text", "w").collect().head
    assert(ca == cb)
    // one byte changed -> at least one checksum word moves
    val c = Seq((1L, "x", "s", 1L), (2L, "Y", "s", 1L), (3L, "z", "s", 1L))
      .toDF("id", "text", "shard", "w")
    val cc = Snapshot.manifest(c, "shard", "id", "text", "w").collect().head
    assert(cc.getLong(5) != ca.getLong(5) || cc.getLong(6) != ca.getLong(6))
  }

  test("manifest: null text fingerprints as empty (the diff convention)") {
    val df = Seq((1L, null.asInstanceOf[String], "s", 0L))
      .toDF("id", "text", "shard", "w")
    val out = Snapshot.manifest(df, "shard", "id", "text", "w")
      .collect().head
    assert(out.getLong(5) == md5Word("1:", 0))
  }

  test("manifest: a null-id row still moves the checksum") {
    // concat propagates null and sum() skips nulls — an un-coalesced id
    // side would count the row in n_rows while contributing NOTHING to
    // either checksum, so losing it would go undetected
    val df = Seq((Some(1L), "a", "s", 1L), (None, "b", "s", 1L))
      .toDF("id", "text", "shard", "w")
    val out = Snapshot.manifest(df, "shard", "id", "text", "w")
      .collect().head
    assert(out.getLong(1) == 2L)
    assert(out.getLong(5) == md5Word("1:a", 0) + md5Word(":b", 0))
    assert(out.getLong(6) == md5Word("1:a", 8) + md5Word(":b", 8))
  }
}
