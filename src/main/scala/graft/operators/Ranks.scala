package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed dense 0-based row ranks over a total order — the
  * [[Linkage.sortedNeighborhoodPairs]] / [[Classifier.gainsTable]]
  * recipe factored out: range-repartition on the sort key,
  * in-partition sort, then the two-pass zipWithIndex offset rank —
  * never a single-task global window (the WindowExec-no-partition
  * trap this repo avoids).
  */
object Ranks {

  /** Returns `df` reduced to `(keep, _rnk)`: `keep` is the single
    * carried column, `_rnk` the 0-based rank under `sortCols` (which
    * MUST be a total order — include a unique tiebreak column, or
    * ranks are nondeterministic). One range shuffle + two linear
    * passes; the result is localCheckpointed (both zipWithIndex passes
    * and every downstream join read stable partitions). */
  def rankBy(df: DataFrame, keep: String, sortCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val nPart = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val parted = df
      .repartitionByRange(nPart, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .select(col(keep))
      .localCheckpoint(true)
    val ranked = parted.rdd.zipWithIndex.map { case (row, idx) =>
      org.apache.spark.sql.Row(row.get(0), idx)
    }
    spark.createDataFrame(ranked,
      StructType(Seq(parted.schema.fields.head,
        StructField("_rnk", LongType, nullable = false))))
      .localCheckpoint(false)
  }

  /** 2-D skyline / Pareto front (Börzsönyi, Kossmann & Stocker, "The
    * skyline operator", ICDE 2001), both dimensions MINIMIZED: the
    * points no other point dominates (q ⪯ p componentwise with at
    * least one strict). All copies of a non-dominated point survive
    * (equal points do not dominate each other); flip a dimension's
    * sign upstream to maximize it.
    *
    * The sweep identity: p = (x, y) is on the skyline ⟺
    * `y = minY(x)` AND `prefixMinY(<x) > y` — duplicates-at-x collapse
    * to the per-x minimum first, and the strictly-before prefix
    * minimum decides dominance from the left.
    *
    * Scale shape — the prefix minimum is the global-window trap, and
    * is built the repo's bucketed way instead: the per-distinct-x min
    * table is RANGE-repartitioned on x (equal keys never split across
    * partitions), each bucket's running strict-prefix min runs as a
    * per-bucket `rangeBetween(-∞, −1)` window (parallel across
    * buckets, ties at x correctly excluded), and the cross-bucket
    * carry is a bucket-count-sized window broadcast back — never one
    * task sorting all x. Everything is exact comparisons on the native
    * column types; null ids/coords are excluded.
    *
    * Output: the surviving input rows `(idCol, xCol, yCol)`. */
  def skyline2d(df: DataFrame, idCol: String, xCol: String,
                yCol: String): DataFrame = {
    val spark = df.sparkSession
    val nPart = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val pts = df
      .filter(col(idCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(idCol), col(xCol), col(yCol))
      .localCheckpoint(true) // survivors join back against it
    val m = pts.groupBy(col(xCol).as("_x"))
      .agg(min(col(yCol)).as("_my"))
    // range partitions are x-ordered and never split equal keys, so
    // spark_partition_id is a legitimate ordered bucket key
    val bucketed = m.repartitionByRange(nPart, col("_x"))
      .withColumn("_b", spark_partition_id())
      .localCheckpoint(true) // bucket mins + the windowed sweep
    val carry = bucketed.groupBy(col("_b")).agg(min(col("_my")).as("_bm"))
      .withColumn("_carry", min(col("_bm")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("_b"))
          .rowsBetween(Long.MinValue, -1)))
      .select(col("_b"), col("_carry")) // bucket-count-sized
    val inBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_b")).orderBy(col("_x"))
      .rangeBetween(Long.MinValue, -1)
    val prefixed = bucketed
      .withColumn("_wmin", min(col("_my")).over(inBucket))
      .join(broadcast(carry), Seq("_b"))
      .select(col("_x"), col("_my"),
        least(coalesce(col("_wmin"), col("_carry")),
          coalesce(col("_carry"), col("_wmin"))).as("_pre"))
    val surviving = prefixed
      .filter(col("_pre").isNull || col("_pre") > col("_my"))
      .select(col("_x"), col("_my"))
    pts.join(surviving,
      pts(xCol) === col("_x") && pts(yCol) === col("_my"))
      .select(col(idCol), col(xCol), col(yCol))
  }
}
