package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.meta.MetadataLedger

/** End-to-end orchestrator mirroring the reference's main.py:27-36 order:
  * metadata init → ingestion → bronze landing → silver → gold(fullRefresh).
  */
object Pipeline {

  final case class Config(
      root: String,
      cities: Seq[Ingestion.City] = Ingestion.defaultCities,
      fullRefreshGold: Boolean = true // the reference's shipped default (main.py:36)
  ) {
    def bronzeRoot: String = s"$root/data"
    def silverRoot: String = s"$root/silver"
    def goldRoot: String = s"$root/gold"
    def metadataPath: String = s"$root/pipeline_metadata"
  }

  final case class RunResult(silverPartitions: Long, goldPartitions: Long)

  /** Run the full pipeline. `fetcher` is injected (tests pass a fake; the
    * real `Ingestion.HttpFetcher` needs network egress). */
  def run(spark: SparkSession, conf: Config, fetcher: Ingestion.Fetcher,
          runDate: java.sql.Date): RunResult = {
    MetadataLedger.ensure(spark, conf.metadataPath)
    val raw = Ingestion.fetchAll(conf.cities, fetcher)
    Bronze.run(spark, raw, conf.bronzeRoot, runDate)
    val s = Silver.run(spark, conf.bronzeRoot, conf.silverRoot, conf.metadataPath)
    val g = Gold.run(spark, conf.silverRoot, conf.goldRoot, conf.metadataPath,
      fullRefresh = conf.fullRefreshGold)
    RunResult(s, g)
  }
}
