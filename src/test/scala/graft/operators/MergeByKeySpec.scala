package graft.operators

import java.io.File
import org.apache.spark.sql.functions._

import graft.SparkFunSuite

class MergeByKeySpec extends SparkFunSuite {
  import spark.implicits._

  private def table(root: String): Unit =
    Seq(
      (1L, "p1", 1L, "a-v1"), (2L, "p1", 1L, "b-v1"),
      (3L, "p2", 1L, "c-v1"), (4L, "p3", 1L, "d-v1")
    ).toDF("id", "part", "version", "payload")
      .write.partitionBy("part").parquet(root)

  test("merge works on an unpartitioned table (whole-table atomic replace)") {
    val root = tmpDir("merge_flat") + "/t"
    Seq((1L, 1L, "a-v1"), (2L, 1L, "b-v1")).toDF("id", "version", "payload")
      .write.parquet(root)
    val updates = Seq((1L, 2L, "a-v2"), (3L, 1L, "c-v1")).toDF("id", "version", "payload")
    MergeByKey.merge(spark, root, updates, Seq("id"), Nil, "version")
    val got = spark.read.parquet(root).orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"))).toSeq
    assert(got == Seq((1L, "a-v2"), (2L, "b-v1"), (3L, "c-v1")))
    assert(!new File(root).getParentFile.listFiles()
      .exists(_.getName.contains(".staging-")), "orphan staging dir left behind")
  }

  test("merge replaces matched keys, appends new keys, rewrites only touched partitions") {
    val root = tmpDir("merge") + "/t"
    table(root)
    val untouchedFiles = new File(s"$root/part=p3").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    val updates = Seq(
      (1L, "p1", 2L, "a-v2"), // replace
      (9L, "p2", 2L, "new-v2") // append into existing partition
    ).toDF("id", "part", "version", "payload")
    val n = MergeByKey.merge(spark, root, updates, Seq("id"), Seq("part"), "version")
    assert(n == 2)
    val got = spark.read.parquet(root).orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("payload")))
    assert(got.toSeq == Seq(
      (1L, "a-v2"), (2L, "b-v1"), (3L, "c-v1"), (4L, "d-v1"), (9L, "new-v2")))
    val after = new File(s"$root/part=p3").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    assert(after == untouchedFiles, "untouched partition files must not be rewritten")
  }

  test("stale update (lower version) does not clobber the newer row") {
    val root = tmpDir("merge") + "/t"
    table(root)
    MergeByKey.merge(spark, root,
      Seq((1L, "p1", 5L, "a-v5")).toDF("id", "part", "version", "payload"),
      Seq("id"), Seq("part"), "version")
    MergeByKey.merge(spark, root,
      Seq((1L, "p1", 3L, "a-v3-late")).toDF("id", "part", "version", "payload"),
      Seq("id"), Seq("part"), "version")
    val payload = spark.read.parquet(root).filter($"id" === 1L).head.getAs[String]("payload")
    assert(payload == "a-v5", "late-arriving stale update must lose to the newer version")
  }

  test("merge into a null partition does not erase its existing rows") {
    val root = tmpDir("merge") + "/t"
    Seq((5L, Option.empty[String], 1L, "n1"), (6L, Option.empty[String], 1L, "n2"),
      (7L, Some("p1"), 1L, "x"))
      .toDF("id", "part", "version", "payload")
      .write.partitionBy("part").parquet(root)
    MergeByKey.merge(spark, root,
      Seq((9L, Option.empty[String], 2L, "n-new")).toDF("id", "part", "version", "payload"),
      Seq("id"), Seq("part"), "version")
    val ids = spark.read.parquet(root).collect().map(_.getAs[Long]("id")).sorted
    assert(ids.toSeq == Seq(5L, 6L, 7L, 9L),
      "existing null-partition rows must survive a merge into that partition")
  }

  test("a failing updates-write leaves no staging directory behind") {
    val root = tmpDir("merge_crash") + "/t"
    table(root)
    // evaluation of this updates lineage throws when the staging write
    // runs it — the merge fails before touching any live file
    val poison = Seq((1L, "p1", 2L, "a-v2")).toDF("id", "part", "version", "payload")
      .withColumn("payload", raise_error(lit("boom")).cast("string"))
    intercept[Exception] {
      MergeByKey.merge(spark, root, poison, Seq("id"), Seq("part"), "version")
    }
    val leaked = new File(root).getParentFile.listFiles()
      .filter(_.getName.contains(".updates-"))
    assert(leaked.isEmpty,
      s"failed staging write leaked: ${leaked.map(_.getName).mkString(", ")}")
    // the table itself is untouched
    assert(spark.read.parquet(root).count() == 4)
  }

  test("reserved column names are rejected") {
    val root = tmpDir("merge") + "/t"
    val bad = Seq((1L, "p1", 1L, 0)).toDF("id", "part", "version", "_src")
    intercept[IllegalArgumentException] {
      MergeByKey.merge(spark, root, bad, Seq("id"), Seq("part"), "version")
    }
  }

  test("merge into a missing table creates it") {
    val root = tmpDir("merge") + "/fresh"
    val n = MergeByKey.merge(spark, root,
      Seq((1L, "p1", 1L, "x")).toDF("id", "part", "version", "payload"),
      Seq("id"), Seq("part"), "version")
    assert(n == 1)
    assert(spark.read.parquet(root).count() == 1)
  }
}
