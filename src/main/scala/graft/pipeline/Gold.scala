package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.meta.MetadataLedger
import graft.sources.ParquetLake

/** Aggregation (gold) layer: daily per-city weather statistics.
  *
  * Aggregate shape mirrors the reference (gold.py:71-81): AVG/MAX/MIN over
  * temperature plus COUNT(*), grouped by (city, date). Spark runs this as a
  * partial+final HashAggregate — map-side combine means the shuffle carries
  * one row per (city,date) per task, not the raw rows, which is exactly the
  * shape that scales.
  *
  * Differences from silver, preserved from the reference:
  *  - a missing silver directory yields an empty run instead of an error
  *    (gold.py:26-28 catches IOException);
  *  - a `fullRefresh` switch recomputes every available partition, ignoring
  *    the ledger diff (gold.py:104,113-118; the shipped default, main.py:36);
  *  - an extra aggregate-null guard: any NULL avg_temp aborts the run
  *    (gold.py:53-59).
  */
object Gold {

  val layerName = "gold"

  /** Pure aggregate transform, silver → gold schema. */
  def transform(silver: DataFrame): DataFrame =
    silver.groupBy("city", "date").agg(
      avg("temperature").as("avg_temp"),
      max("temperature").as("max_temp"),
      min("temperature").as("min_temp"),
      count(lit(1)).as("record_count")
    )

  /** Aggregate-sanity guard (reference gold.py:53-59). */
  def requireNoNullAggregates(gold: DataFrame): Unit = {
    val bad = gold.filter(col("avg_temp").isNull).count()
    if (bad > 0)
      throw new IllegalStateException(s"$bad gold partitions produced NULL avg_temp")
  }

  /** Zero-extra-scan twin of [[requireNoNullAggregates]]: the terminal
    * action counts NULL avg_temp rows as they stream through the write
    * (same contract as [[Layers.requireAllNonEmptyObserved]] — run the
    * thunk after the action on the instrumented frame). */
  def requireNoNullAggregatesObserved(gold: DataFrame): (DataFrame, () => Unit) = {
    val obs = org.apache.spark.sql.Observation()
    val instrumented = gold.observe(obs,
      count(when(col("avg_temp").isNull, 1)).as("null_avg"))
    val validate = () => {
      val bad = obs.get("null_avg").asInstanceOf[Long]
      if (bad > 0)
        throw new IllegalStateException(s"$bad gold partitions produced NULL avg_temp")
    }
    (instrumented, validate)
  }

  def run(spark: SparkSession, silverRoot: String, goldRoot: String,
          metadataPath: String, fullRefresh: Boolean = false,
          observedValidation: Boolean = true): Long = {
    val silver = ParquetLake.readOrEmpty(spark, silverRoot, Schemas.silver)
    val available = Layers.availablePartitions(silver)
    val pending0 =
      if (fullRefresh) available
      else MetadataLedger.pendingPartitions(
        available, MetadataLedger.processed(spark, metadataPath, layerName))
    val pending = pending0.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nPending = pending.count()
      if (nPending == 0) return 0L
      val batch = transform(Layers.scopeToPending(silver, pending))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        if (observedValidation) {
          // Both guards ride the write itself — zero validation re-scans.
          val (inst1, validateParts) = Layers.requireAllNonEmptyObserved(batch, pending)
          val (inst2, validateNulls) = requireNoNullAggregatesObserved(inst1)
          ParquetLake.overwritePartitions(inst2, goldRoot, Seq("city", "date"))
          validateParts(); validateNulls() // throw before the ledger is stamped
        } else {
          Layers.requireAllNonEmpty(batch, pending)
          requireNoNullAggregates(batch)
          ParquetLake.overwritePartitions(batch, goldRoot, Seq("city", "date"))
        }
        MetadataLedger.upsert(spark, metadataPath, pending.withColumn("layer", lit(layerName)))
        nPending
      } finally batch.unpersist()
    } finally pending.unpersist()
  }
}
