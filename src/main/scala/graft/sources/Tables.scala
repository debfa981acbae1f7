package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver test tables (TESTDATA.md): one parquet per table
  * under a scale-factor directory. */
final case class Tables(spark: SparkSession, dir: String) {
  // Engine-canonical runtime confs (idempotent): AQE coalesces post-shuffle
  // partitions — at bench scale that trims empty-task overhead, at cluster
  // scale it right-sizes shuffles and splits skewed joins.
  spark.conf.set("spark.sql.adaptive.enabled", "true")
  spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright. Read nanos as raw longs (legacy conf) and surface
    * both `ts` (µs-truncated TimestampType — floor division, matching
    * DuckDB's ns→µs CAST semantics) and `ts_ns` (exact nanos for
    * total-ordering needs). */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
  }
}
