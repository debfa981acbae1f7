package graft.pipeline

import java.sql.Date
import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.meta.MetadataLedger
import graft.pipeline.WeatherFixtures._

/** End-to-end pipeline semantics, mirroring the reference's workflow
  * (README.md:104-117): incremental processing, idempotent reruns, partition
  * overwrite isolation. */
class PipelineSpec extends SparkFunSuite {

  private class FakeFetcher(temps: Map[String, Double]) extends Ingestion.Fetcher {
    def fetch(city: Ingestion.City): String = apiJson(temps(city.name))
  }

  test("full pipeline run: ingest -> bronze -> silver -> gold") {
    val root = tmpDir("pipe")
    val conf = Pipeline.Config(root, cities = Ingestion.defaultCities.take(2))
    val fetcher = new FakeFetcher(Map("Delhi" -> 31.5, "London" -> 8.25))
    val res = Pipeline.run(spark, conf, fetcher, Date.valueOf("2026-02-13"))
    assert(res.silverPartitions == 2 && res.goldPartitions == 2)

    val gold = spark.read.parquet(conf.goldRoot)
    val rows = gold.orderBy("city").collect()
    assert(rows.map(_.getAs[String]("city")).toSeq == Seq("Delhi", "London"))
    val delhi = rows(0)
    assert(delhi.getAs[Double]("avg_temp") == 31.5)
    assert(delhi.getAs[Long]("record_count") == 1L)
    // ledger has one row per (layer, city, date)
    val ledger = MetadataLedger.read(spark, conf.metadataPath)
    assert(ledger.count() == 4)
  }

  test("rerun is incremental and idempotent: second run processes 0 silver partitions") {
    val root = tmpDir("pipe")
    val conf = Pipeline.Config(root, cities = Ingestion.defaultCities.take(2),
      fullRefreshGold = false)
    val fetcher = new FakeFetcher(Map("Delhi" -> 31.5, "London" -> 8.25))
    val d = Date.valueOf("2026-02-13")
    Pipeline.run(spark, conf, fetcher, d)
    val second = Pipeline.run(spark, conf, fetcher, d)
    assert(second.silverPartitions == 0, "second run must skip processed partitions")
    assert(second.goldPartitions == 0)
    // gold still exactly 2 partitions, record_count still 1 (the second
    // bronze append is ignored because the partition was already processed)
    val gold = spark.read.parquet(conf.goldRoot)
    assert(gold.count() == 2)
    assert(gold.agg(max("record_count")).head.getLong(0) == 1L)
  }

  test("fullRefresh gold reprocesses everything (the reference's shipped default)") {
    val root = tmpDir("pipe")
    val conf = Pipeline.Config(root, cities = Ingestion.defaultCities.take(2),
      fullRefreshGold = true)
    val fetcher = new FakeFetcher(Map("Delhi" -> 31.5, "London" -> 8.25))
    val d = Date.valueOf("2026-02-13")
    Pipeline.run(spark, conf, fetcher, d)
    val second = Pipeline.run(spark, conf, fetcher, d)
    assert(second.silverPartitions == 0)
    assert(second.goldPartitions == 2, "fullRefresh recomputes all gold partitions")
    // still idempotent output: second bronze append lands in the same
    // partitions but silver never reprocessed them, so gold is unchanged
    assert(spark.read.parquet(conf.goldRoot).count() == 2)
  }

  test("new partition on a later run is picked up; old partitions untouched") {
    val root = tmpDir("pipe")
    val conf = Pipeline.Config(root, cities = Ingestion.defaultCities.take(1),
      fullRefreshGold = false)
    val fetcher = new FakeFetcher(Map("Delhi" -> 31.5))
    Pipeline.run(spark, conf, fetcher, Date.valueOf("2026-02-13"))
    val goldFile1 = spark.read.parquet(conf.goldRoot)
      .filter(col("date") === lit("2026-02-13")).collect()
    val res2 = Pipeline.run(spark, conf, fetcher, Date.valueOf("2026-02-14"))
    assert(res2.silverPartitions == 1 && res2.goldPartitions == 1)
    val gold = spark.read.parquet(conf.goldRoot)
    assert(gold.select("date").distinct().count() == 2)
    // the day-1 partition survived the day-2 dynamic overwrite
    val goldFile1After = gold.filter(col("date") === lit("2026-02-13")).collect()
    assert(goldFile1.toSeq == goldFile1After.toSeq)
  }
}
