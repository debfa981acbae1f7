package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Partitioned-Parquet lake primitives.
  *
  * Mirrors the reference's storage surface (Hive-partitioned Parquet read
  * via glob with `hive_partitioning=true`, per-partition `COPY ... OVERWRITE
  * TRUE` writes — reference silver.py:36,50-54, gold.py:78,86-90) with the
  * Spark-native equivalents: automatic partition discovery on read and
  * *dynamic* partition overwrite on write. Dynamic mode is load-bearing:
  * Spark's default overwrite truncates the whole root directory, which would
  * silently delete sibling partitions on an incremental rerun.
  */
object ParquetLake {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** Read a partitioned table root; partition columns (`city=`/`date=` dirs)
    * are discovered and type-inferred by Spark. */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(root)

  /** Missing-input-tolerant read: absent path → empty DataFrame with the
    * given schema (the reference's gold layer catches IOException and
    * returns an empty set, gold.py:26-28; we expose the tolerant form and
    * let callers choose strictness per layer). */
  def readOrEmpty(spark: SparkSession, root: String, schema: StructType): DataFrame =
    if (exists(spark, root)) spark.read.schema(schema).parquet(root)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Overwrite only the partitions present in `df`, leaving siblings
    * untouched (DuckDB `OVERWRITE TRUE` per-partition COPY semantics). */
  def overwritePartitions(df: DataFrame, root: String, partitionCols: Seq[String]): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(root)

  /** Append new files into the partition layout (bronze raw-landing
    * semantics, reference bronze.py:12-17). */
  def appendPartitions(df: DataFrame, root: String, partitionCols: Seq[String]): Unit =
    df.write
      .partitionBy(partitionCols: _*)
      .mode("append")
      .parquet(root)

  /** Full-table atomic replace via write-temp-then-swap. Used for the small
    * metadata ledger where a plain read-modify-write could expose a
    * half-written table to concurrent readers (SURVEY §7.4 item 2).
    *
    * The new content is materialized under `<root>.staging-<nanos>`, the old
    * root is renamed aside, the staging dir renamed in, and the old data
    * deleted. Rename is atomic per filesystem (HDFS/posix); on object stores
    * a table format would be the real answer — out of scope here.
    */
  def atomicReplace(spark: SparkSession, df: DataFrame, root: String): Unit = {
    val hfs = fs(spark, root)
    val target = new Path(root)
    val staging = new Path(root + ".staging-" + System.nanoTime())
    val trash = new Path(root + ".old-" + System.nanoTime())
    df.write.mode("overwrite").parquet(staging.toString)
    if (hfs.exists(target) && !hfs.rename(target, trash))
      throw new IllegalStateException(s"cannot move aside $target")
    if (!hfs.rename(staging, target)) {
      // roll back so readers still see the previous ledger
      if (hfs.exists(trash)) hfs.rename(trash, target)
      throw new IllegalStateException(s"cannot publish $staging to $target")
    }
    if (hfs.exists(trash)) hfs.delete(trash, true)
  }
}
