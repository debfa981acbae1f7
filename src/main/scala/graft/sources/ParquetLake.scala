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

  /** Crash-safe partition overwrite: stage the whole write to a sibling
    * directory, then swap each written partition into the live table via
    * rename-aside → rename-in → delete (the [[compactPartitions]] publish
    * protocol). Dynamic-overwrite's job commit deletes a partition's old
    * files before publishing the new ones, so a crash mid-commit loses the
    * partition's prior rows — fatal for read-modify-write callers like
    * [[graft.operators.MergeByKey]], whose replay would then read the
    * half-destroyed state. Here every partition is either fully old or
    * fully new after a crash (worst case: moved aside under the staging
    * dir, recoverable by hand). Costs two renames per touched partition
    * over the plain dynamic overwrite. */
  def overwritePartitionsStaged(spark: SparkSession, df: DataFrame, root: String,
                                partitionCols: Seq[String]): Unit =
    if (partitionCols.isEmpty) {
      // no partitions → "overwrite the touched partitions" degenerates to a
      // whole-table replace; atomicReplace is the crash-safe form of that
      // (publishStaged's per-partition swap needs ≥1 partition level)
      atomicReplace(spark, df, root)
    } else {
      val hfs = fs(spark, root)
      val staging = new Path(root + ".staging-" + System.nanoTime())
      df.write.partitionBy(partitionCols: _*).parquet(staging.toString)
      publishStaged(hfs, staging, root, partitionCols.length)
    }

  /** Swap every depth-level partition dir under `staging` into `root` with
    * rename-aside → rename-in → delete old, then drop the staging dir (and
    * the asides with it). A crash between steps leaves the partition
    * recoverable, unlike delete-then-rename. The aside dir lives OUTSIDE
    * the table root: an aside left inside the root would be discovered as
    * a bogus Hive partition and double every read of that partition. */
  private def publishStaged(hfs: org.apache.hadoop.fs.FileSystem, staging: Path,
                            root: String, depth: Int): Unit = {
    def leafDirs(p: Path, d: Int): Seq[Path] =
      if (d == 0) Seq(p)
      else hfs.listStatus(p).filter(_.isDirectory)
        .flatMap(s => leafDirs(s.getPath, d - 1)).toSeq
    val stagingRoot = hfs.getFileStatus(staging).getPath
    val asideRoot = new Path(staging, ".aside")
    leafDirs(stagingRoot, depth).foreach { newDir =>
      val rel = newDir.toString.stripPrefix(stagingRoot.toString).stripPrefix("/")
      val target = new Path(root, rel)
      val aside = new Path(asideRoot, rel)
      val hadOld = hfs.exists(target)
      if (hadOld) {
        hfs.mkdirs(aside.getParent)
        if (!hfs.rename(target, aside))
          throw new IllegalStateException(s"cannot move aside partition $rel")
      }
      hfs.mkdirs(target.getParent)
      if (!hfs.rename(newDir, target)) {
        if (hadOld) hfs.rename(aside, target) // roll back
        throw new IllegalStateException(s"cannot publish partition $rel")
      }
    }
    hfs.delete(staging, true) // removes the .aside copies too
  }

  /** Append new files into the partition layout (bronze raw-landing
    * semantics, reference bronze.py:12-17). */
  def appendPartitions(df: DataFrame, root: String, partitionCols: Seq[String]): Unit =
    df.write
      .partitionBy(partitionCols: _*)
      .mode("append")
      .parquet(root)

  /** Compact a partitioned table's small files toward `targetBytes`-sized
    * files. Returns (filesBefore, filesAfter).
    *
    * The reference's bronze layout lands ONE ROW per file per run
    * (bronze.py:15-17) — at scale that's the classic small-file pathology
    * (every scan pays per-file open/footer cost; listings dominate).
    *
    * Shape, chosen for correctness at scale:
    *  - per-Hive-partition output file counts are derived from row counts ×
    *    the table's measured bytes/row (a bare repartition on the partition
    *    columns would force exactly one file — and one task — per
    *    partition, however large);
    *  - rows are salted `pmod(hash(data cols), nFiles)` so each partition
    *    splits into its own right-sized file set;
    *  - output is staged to a sibling directory and swapped in per
    *    partition: never overwriting the path being lazily read (Spark
    *    forbids it, and bypassing that check would drop data), and a crash
    *    mid-swap leaves every partition either old or fully new. */
  def compactPartitions(spark: SparkSession, root: String,
                        partitionCols: Seq[String],
                        targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val hfs = fs(spark, root)
    def scan(): (Long, Long) = {
      val it = hfs.listFiles(new Path(root), true)
      var n = 0L; var b = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) { n += 1; b += f.getLen }
      }
      (n, b)
    }
    val (before, totalBytes) = scan()
    if (before == 0) return (0L, 0L)
    val df = spark.read.parquet(root)
    val dataCols = df.columns.filterNot(partitionCols.contains).toSeq
    val totalRows = df.count()
    if (totalRows == 0) return (before, before)
    if (partitionCols.isEmpty) {
      // unpartitioned table: per-partition staging/swap degenerates to a
      // whole-table replace (publishStaged's relative-path walk needs ≥1
      // partition level, and the data-column salt is pointless with one
      // file group) — right-size with a plain repartition + atomic swap
      val nFiles = math.max(1L, totalBytes / math.max(targetBytes, 1L) + 1L)
        .min(Int.MaxValue.toLong).toInt
      atomicReplace(spark, df.repartition(nFiles), root)
      return (before, scan()._1)
    }
    val bytesPerRow = math.max(1.0, totalBytes.toDouble / totalRows)
    val stats = df.groupBy(partitionCols.map(col): _*)
      .agg(count(lit(1)).as("_rows"))
      .withColumn("_nfiles",
        greatest(lit(1L), ceil(col("_rows") * bytesPerRow / targetBytes)))
      .drop("_rows")
    val salted = df.join(broadcast(stats), partitionCols)
      .withColumn("_salt", pmod(xxhash64(dataCols.map(col): _*), col("_nfiles")))
    val nTasks = math.max(1, math.min(Int.MaxValue.toLong, totalBytes / math.max(targetBytes, 1L) + 1).toInt)
    val staging = new Path(root + ".compacting-" + System.nanoTime())
    salted.repartition(nTasks, (partitionCols :+ "_salt").map(col): _*)
      .drop("_salt", "_nfiles")
      .write.partitionBy(partitionCols: _*).parquet(staging.toString)
    publishStaged(hfs, staging, root, partitionCols.length)
    (before, scan()._1)
  }

  /** Full-table atomic replace via write-temp-then-swap. Used for the small
    * metadata ledger where a plain read-modify-write could expose a
    * half-written table to concurrent readers (SURVEY §7.4 item 2).
    *
    * The new content is materialized under `<root>.staging-<nanos>`, the old
    * root is renamed aside, the staging dir renamed in, and the old data
    * deleted. Renames are atomic per filesystem (HDFS/posix), so readers
    * never see HALF-written data — but there is a sub-millisecond window
    * between the two renames where the path does not exist at all; callers
    * that treat missing-as-empty must retry (MetadataLedger.read does).
    * On object stores a table format would be the real answer — out of
    * scope here.
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

  /** Range-sorted layout writer: `nFiles` files with DISJOINT, ordered
    * `orderCol` ranges (repartitionByRange boundaries + an in-partition
    * sort). The data-layout half of scan pruning: parquet stores per-file
    * and per-row-group min/max for the sort column, so a range predicate
    * skips whole files/row groups at read time — the poor engineer's
    * Z-order for a single dominant filter column (time, id range). The
    * partition count is the file count; pick `nFiles` ≈ table bytes /
    * desired file size.
    *
    * Boundaries come from Spark's range-exchange SAMPLING, so exact file
    * boundaries can vary between runs — the CONTRACT (disjointness +
    * internal order + row preservation) is what holds, and what the spec
    * pins. NULL order keys sort first into the lowest file (Spark
    * NULLS FIRST default). */
  def writeRangeSorted(df: DataFrame, root: String, orderCol: String,
                       nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles ($nFiles) must be >= 1")
    df.repartitionByRange(nFiles, org.apache.spark.sql.functions.col(orderCol))
      .sortWithinPartitions(orderCol)
      .write.mode("overwrite").parquet(root)
  }
}
