package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** The writeRangeSorted layout contract: disjoint per-file ranges, rows
  * preserved, and the range predicate reaching the scan as a pushed
  * filter — the layout half of file/row-group skipping at scale. */
class RangeLayoutSpec extends SparkFunSuite {
  import spark.implicits._

  test("per-file ranges are disjoint and ordered; rows and values survive") {
    val root = Files.createTempDirectory("range_layout").toString + "/t"
    val df = (1L to 10000L).map(i => (i * 7919L % 10007L, s"p$i")).toDF("k", "payload")
    ParquetLake.writeRangeSorted(df, root, "k", nFiles = 8)
    val files = new java.io.File(root).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length >= 2, s"expected multiple files, got ${files.length}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("k"), max("k"), count(lit(1))).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }.filter(_._3 > 0).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi, _), (lo2, _, _)) =>
        assert(hi < lo2, s"file ranges overlap: hi=$hi lo2=$lo2 in ${ranges.toSeq}")
      case _ =>
    }
    assert(ranges.map(_._3).sum == 10000L, "every row must survive the rewrite")
    val back = spark.read.parquet(root)
    assert(back.agg(sum("k")).head.getLong(0) ==
      df.agg(sum("k")).head.getLong(0), "values must be unchanged")
    // the range predicate reaches the parquet scan as a pushed filter
    val plan = back.filter(col("k") >= 9000L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(k,9000)") || plan.contains("GreaterThanOrEqual")),
      s"range predicate must push into the scan:\n$plan")
  }

  test("each file is internally sorted (row-group stats stay tight)") {
    val root = Files.createTempDirectory("range_sorted").toString + "/t"
    val df = (1L to 2000L).map(i => (i * 31L % 1009L, i)).toDF("k", "v")
    ParquetLake.writeRangeSorted(df, root, "k", nFiles = 4)
    val files = new java.io.File(root).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    files.foreach { f =>
      val ks = spark.read.parquet(f).select("k").collect().map(_.getLong(0))
      assert(ks.sameElements(ks.sorted), s"file $f not internally sorted")
    }
    intercept[IllegalArgumentException] {
      ParquetLake.writeRangeSorted(df, root, "k", nFiles = 0)
    }
  }
}
