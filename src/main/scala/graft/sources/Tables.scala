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

  /** [[documents]] spread across `defaultParallelism` partitions with an
    * EXPLICIT count. The driver fixtures are one single-row-group parquet
    * file per table — one scan task — so a cpu-heavy map stage (gram
    * builds, winnowing, per-token scoring) serializes on one core, and
    * AQE's 64MB advisory would coalesce a plain `repartition(col)` of
    * these few text-MBs right back to one task (measured on q128:
    * 13.1 s single-task vs 1.7 s spread at sf0.1). A real lake's many
    * files make this a no-op-shaped concern; heavy battery queries opt in
    * here. */
  def documentsSpread: DataFrame =
    documents.repartition(spark.sparkContext.defaultParallelism,
      org.apache.spark.sql.functions.col("doc_id"))
  def embeddings: DataFrame = t("embeddings")

  /** [[lineitem]] spread like [[documentsSpread]] — same single-row-group
    * fixture, same one-scan-task serialization; opt in where a heavy map
    * stage (wide exact-decimal aggregations) follows the bare scan. */
  def lineitemSpread: DataFrame =
    lineitem.repartition(spark.sparkContext.defaultParallelism,
      org.apache.spark.sql.functions.col("l_orderkey"))

  /** [[events]] spread like [[documentsSpread]] — opt in where a heavy
    * per-row stage (hash explosions, replicate weights) follows the scan.
    * Only for ORDER-INVARIANT downstream math (exact integer sums, keyed
    * windows): sketch-typed aggregates stay on the bare read. */
  def eventsSpread: DataFrame =
    events.repartition(spark.sparkContext.defaultParallelism,
      org.apache.spark.sql.functions.col("event_id"))

  /** events.parquet's `ts` physical type has differed across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects
    * outright) and TIMESTAMP(µs). Read schema-adaptively and surface the
    * same two columns either way:
    *   - `ts`    — µs-precision TimestampType (session TZ is UTC
    *               engine-wide, so instants match DuckDB's naive read)
    *   - `ts_ns` — epoch nanos as long, the engine's total-ordering key
    *               (exact: floor-division for ns data, ×1000 for µs data)
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // legacy nanos-as-long: rebuild a µs timestamp, keep exact nanos
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // µs parquet read as NTZ: reinterpret in the UTC session TZ
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }
}
