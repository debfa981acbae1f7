package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared machinery for incremental layer processing (the reference's
  * enumerate → diff → process loop, silver.py:65-74 / gold.py:104-125).
  *
  * Deliberate departure from the reference, noted in BASELINE.md: instead of
  * one engine invocation per pending partition (pathological in Spark — a
  * full job per (city,date)), all pending partitions are processed in ONE
  * batched job. Semantics are identical (same rows, same per-partition
  * files via partitionBy) and it is the shape that survives 1000× more
  * partitions.
  */
object Layers {

  /** Partition enumeration: DISTINCT on the two Hive partition columns.
    * Catalyst prunes the scan to metadata-only columns, so this reads no
    * data pages — the Spark analog of the reference's
    * `SELECT DISTINCT city, date FROM read_parquet(...)` (silver.py:9-12). */
  def availablePartitions(df: DataFrame): DataFrame =
    df.select("city", "date").distinct()

  /** Scope `df` to the pending partitions — delegates to the generic,
    * null-safe [[graft.sources.PartitionScope]] (the partition columns are
    * whatever columns `pending` carries). */
  def scopeToPending(df: DataFrame, pending: DataFrame,
                     literalThreshold: Int = 256): DataFrame =
    graft.sources.PartitionScope.scopeTo(df, pending, literalThreshold)

  /** Empty-partition guard (reference silver.py:42-47 / gold.py:46-51
    * ValueError on COUNT(*)==0): every pending partition must have produced
    * at least one row. Runs as one aggregate job over the cached batch. */
  def requireAllNonEmpty(processedRows: DataFrame, pending: DataFrame): Unit = {
    val produced = processedRows.groupBy("city", "date").count()
    val missing = pending.join(produced, Seq("city", "date"), "left_anti").collect()
    if (missing.nonEmpty) {
      val desc = missing.map(r => s"${r.get(0)}/${r.get(1)}").mkString(", ")
      throw new IllegalStateException(s"empty partitions after transform: $desc")
    }
  }

  /** ZERO-EXTRA-SCAN variant of [[requireAllNonEmpty]] for the 100 TB
    * regime: the post-hoc aggregate above re-scans the processed batch
    * (fine while it fits the cache; a terabyte batch spills and the
    * validation re-scan becomes real IO). This attaches a Spark
    * `Observation`, so the TERMINAL ACTION ITSELF — the partition
    * write — collects the per-partition presence as it streams rows
    * through its tasks; `collect_set` over the two partition columns is
    * bounded by the pending-partition count, the same driver-side size
    * [[requireAllNonEmpty]] already collects.
    *
    * Contract: run the returned `validate` thunk AFTER the terminal
    * action on the INSTRUMENTED frame (it blocks on the observation and
    * throws [[requireAllNonEmpty]]'s loud error). The trade, stated:
    * validation happens after the write where the reference validates
    * before — pair with DYNAMIC partition overwrite, where rerunning a
    * failed batch overwrites the same partitions, so the late failure
    * costs a rerun, never correctness. */
  def requireAllNonEmptyObserved(processedRows: DataFrame,
                                 pending: DataFrame): (DataFrame, () => Unit) = {
    val obs = org.apache.spark.sql.Observation()
    val instrumented = processedRows.observe(obs,
      collect_set(struct(col("city"), col("date"))).as("parts"))
    val validate = () => {
      val parts = obs.get("parts")
        .asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]]
        .map(r => (r.get(0), r.get(1))).toSet
      val missing = pending.select("city", "date").collect()
        .filterNot(r => parts.contains((r.get(0), r.get(1))))
      if (missing.nonEmpty) {
        val desc = missing.map(r => s"${r.get(0)}/${r.get(1)}").mkString(", ")
        throw new IllegalStateException(
          s"empty partitions after transform: $desc")
      }
    }
    (instrumented, validate)
  }
}
