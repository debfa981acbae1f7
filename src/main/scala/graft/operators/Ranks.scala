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
}
