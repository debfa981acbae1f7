package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: pre-hash-partitioned, sorted storage so equi-joins and
  * aggregations on the bucket key run with NO shuffle exchange.
  *
  * At 100 TB this is the difference between re-shuffling the fact table on
  * every join and shuffling it once at write time: two tables bucketed the
  * same way join bucket-to-bucket (SortMergeJoin with zero Exchange — see
  * BucketsSpec, which asserts the plan contains none). Spark's bucketing
  * rides the session catalog (`saveAsTable`), so writers here register
  * managed tables under `spark.sql.warehouse.dir`.
  */
object Buckets {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Join two same-bucketed tables on their bucket key — planned without
    * any shuffle when bucket counts match. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    read(spark, leftTable).join(read(spark, rightTable), Seq(key))
}
