package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.pipeline.WeatherFixtures._

class CompactionSpec extends SparkFunSuite {

  test("compactPartitions merges many tiny files and preserves every row") {
    val root = tmpDir("compact") + "/data"
    // simulate the reference's one-row-per-file landing: 30 separate appends
    val rows = (1 to 30).map(i => bronzeRow(s"City${i % 3}", f"2026-02-${i % 5 + 1}%02d", temp = i.toDouble))
    rows.foreach(r => writeBronze(spark, Seq(r), root))
    val beforeDf = spark.read.parquet(root).orderBy("city", "date", "temperature_2m").collect()
    val (before, after) = ParquetLake.compactPartitions(spark, root, Seq("city", "date"))
    assert(before == 30, s"expected 30 pre-compaction files, got $before")
    assert(after < before, s"compaction must reduce file count ($before -> $after)")
    val afterDf = spark.read.parquet(root).orderBy("city", "date", "temperature_2m").collect()
    assert(afterDf.toSeq == beforeDf.toSeq, "compaction must not change data")
  }

  test("large partitions split into multiple files near the byte target") {
    val root = tmpDir("compact2") + "/data"
    // one big partition written as many tiny appends
    (1 to 20).foreach { i =>
      writeBronze(spark, (1 to 50).map(j =>
        bronzeRow("Mega", "2026-02-13", temp = (i * 100 + j).toDouble)), root)
    }
    val (before, after) = ParquetLake.compactPartitions(spark, root, Seq("city", "date"),
      targetBytes = 4 * 1024) // tiny target to force intra-partition splitting
    assert(before >= 20)
    assert(after > 1, "a partition larger than the target must split into several files")
    assert(after < before)
    assert(spark.read.parquet(root).count() == 1000)
  }

  test("empty root is a no-op") {
    val root = tmpDir("compact3") + "/data"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    assert(ParquetLake.compactPartitions(spark, root, Seq("city", "date")) == ((0L, 0L)))
  }

  test("unpartitioned table compacts via atomic whole-table replace") {
    import spark.implicits._
    val root = tmpDir("compact4") + "/data"
    (1 to 60).toDF("n").repartition(30).write.mode("append").parquet(root)
    val (before, after) = ParquetLake.compactPartitions(spark, root, Seq.empty)
    assert(before == 30 && after < before,
      s"unpartitioned compaction must shrink the file count ($before -> $after)")
    assert(spark.read.parquet(root).as[Int].collect().sorted.toSeq == (1 to 60))
  }
}
