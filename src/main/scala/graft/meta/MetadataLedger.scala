package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.Schemas
import graft.sources.ParquetLake

/** Processed-partition ledger: a tiny Parquet-backed table with logical
  * primary key (layer, city, date) and replace-on-conflict upsert.
  *
  * The reference gets PK semantics for free from DuckDB
  * (`INSERT OR REPLACE`, reference metadata.py:3-9, silver.py:57-60); on
  * plain Parquet we compose it from built-ins: union → row_number window
  * keeping the newest `processed_at` per key → atomic swap of the table
  * directory. The ledger is partition-granularity metadata, so it stays
  * small (one row per (layer,city,date)) no matter how large the data lake
  * grows — driver-side collection of it is safe even at 100 TB data scale.
  */
object MetadataLedger {

  /** Create-if-missing (reference metadata.py:1-10 DDL). */
  def ensure(spark: SparkSession, path: String): Unit =
    if (!ParquetLake.exists(spark, path))
      ParquetLake.atomicReplace(
        spark,
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.metadata),
        path)

  /** Read the ledger. Missing-path is retried briefly before being treated
    * as empty: atomicReplace has a sub-ms window between its two renames
    * where the path doesn't exist, and mistaking that for an empty ledger
    * would make a concurrent writer wipe state. */
  def read(spark: SparkSession, path: String): DataFrame = {
    var attempt = 0
    while (attempt < 5 && !ParquetLake.exists(spark, path)) {
      Thread.sleep(20L << attempt)
      attempt += 1
    }
    ParquetLake.readOrEmpty(spark, path, Schemas.metadata)
  }

  /** PK-replace upsert: `entries` must have columns (layer, city, date);
    * `processed_at` is stamped here (reference silver.py:59 CURRENT_TIMESTAMP).
    *
    * SINGLE-WRITER BY CONTRACT, and loud about it: the upsert is
    * read-snapshot → union → atomic swap, so two writers racing would
    * both read the old snapshot and the last swap would silently drop
    * the first writer's rows — the lost-update anomaly a plain-Parquet
    * ledger invites. A `<path>._lock` lease (atomic create-exclusive,
    * the HDFS/posix test-and-set) is taken before the read and released
    * after the swap; a second concurrent upsert FAILS with the holder's
    * age in the message instead of corrupting state. A lease older than
    * `staleLockMs` is presumed crashed and broken (one retry). The lock
    * is a SIBLING of the table root — a lease inside it would vanish
    * with the directory swap. */
  def upsert(spark: SparkSession, path: String, entries: DataFrame,
             staleLockMs: Long = 10 * 60 * 1000L): Unit = {
    val hfs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(path + "._lock")
    // Owner token written INTO the lease file: every destructive step
    // (stale break, final release) must prove it is acting on the exact
    // lease it observed/holds — a blind delete lets two stale-breakers
    // both proceed, or a timed-out holder delete its usurper's fresh lease.
    val token = java.util.UUID.randomUUID().toString
    def tryAcquire(): Boolean =
      try {
        val out = hfs.create(lock, false)
        out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close(); true
      } catch { case _: java.io.IOException => false }
    def lockToken(): Option[String] =
      try {
        val in = hfs.open(lock)
        try {
          val buf = new Array[Byte](64)
          val n = in.read(buf)
          Some(new String(buf, 0, math.max(n, 0),
            java.nio.charset.StandardCharsets.UTF_8))
        } finally in.close()
      } catch { case _: java.io.IOException => None }
    if (!tryAcquire()) {
      val age = try System.currentTimeMillis() -
        hfs.getFileStatus(lock).getModificationTime
      catch { case _: java.io.IOException => 0L } // holder just released
      if (age > staleLockMs) {
        // Break by atomic RENAME of the specific stale lease to a
        // breaker-unique tombstone: rename is test-and-set, so of N
        // simultaneous breakers exactly one wins; the losers see the
        // rename fail (lease gone) and must NOT touch the winner's
        // fresh lease — they fail loudly like any contender.
        val tombstone = new org.apache.hadoop.fs.Path(
          path + s"._lock.broken.$token")
        val won = try hfs.rename(lock, tombstone)
        catch { case _: java.io.IOException => false }
        if (won) hfs.delete(tombstone, false)
        require(won && tryAcquire(),
          s"ledger $path: another writer broke the stale lease first —" +
            " it now holds a fresh lease; retry after it finishes")
      } else throw new IllegalStateException(
        s"ledger $path is locked by a concurrent upsert (lease age ${age}ms" +
          s" <= ${staleLockMs}ms): the read-union-swap upsert is" +
          " single-writer — a second writer would silently drop this one's" +
          " rows. Retry after the holder finishes, or raise staleLockMs" +
          " breakage only for crashed holders.")
    }
    try {
      val stamped = entries
        .select(col("layer"), col("city"), col("date"))
        .withColumn("processed_at", current_timestamp())
      // tiebreak on a marker so the incoming row wins an equal-timestamp race
      val w = Window.partitionBy("layer", "city", "date")
        .orderBy(col("processed_at").desc, col("_incoming").desc)
      val merged = read(spark, path).withColumn("_incoming", lit(0))
        .unionByName(stamped.withColumn("_incoming", lit(1)))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .drop("_rn", "_incoming")
      // the union reads the current ledger, so materialize before the swap
      val snapshot = merged.localCheckpoint(true)
      ParquetLake.atomicReplace(spark, snapshot, path)
    } finally {
      // Release ONLY our own lease: if this upsert outlived staleLockMs a
      // breaker may have replaced the lock with its fresh lease — deleting
      // that would re-open the lost-update window for a THIRD writer.
      if (lockToken().contains(token)) hfs.delete(lock, false)
    }
  }

  /** Partitions already processed for a layer, as a (city, date) DataFrame
    * (reference silver.py:15-20). */
  def processed(spark: SparkSession, path: String, layer: String): DataFrame =
    read(spark, path).filter(col("layer") === layer).select("city", "date")

  /** The incremental core: partitions present in the source layer but not
    * yet in the ledger — a true distributed anti-join standing in for the
    * reference's driver-side set difference (silver.py:69, gold.py:118). */
  def pendingPartitions(available: DataFrame, processed: DataFrame): DataFrame =
    available.join(broadcast(processed), Seq("city", "date"), "left_anti")
}
