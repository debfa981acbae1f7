package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-dimensional data skipping.
  *
  * Sorting by one column makes parquet row-group min/max stats selective on
  * that column only; interleaving the bits of two normalized columns makes
  * files cluster in BOTH dimensions, so predicates on either column prune
  * files/row-groups. This is the layout-level complement to partition
  * pruning — partitions for the coarse dimension (date), z-order inside
  * for the query dimensions (ids, keys).
  *
  * Bit interleaving is unrolled at plan-build time (shift amounts must be
  * literals) over min-max-normalized values; the normalization bounds come
  * from one aggregate pass and fold into the expression as literals.
  */
object ZOrder {

  /** Morton-interleave two columns already scaled to [0, 2^bits). */
  private[sources] def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31,
      s"bits must be in [1, 31] (shift amounts wrap mod 64 past that): $bits")
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  private def scaled(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val span = math.max(mx - mn, 1e-300)
    val top = (1L << bits) - 1
    least(greatest(
      floor((c.cast("double") - lit(mn)) / lit(span) * lit(top.toDouble)).cast("long"),
      lit(0L)), lit(top))
  }

  /** The z-value column for (colA, colB) over `df`'s observed value ranges
    * (one aggregate pass to fetch min/max — aggregated on the CAST values,
    * so a string-typed numeric column can't give lexicographic bounds that
    * disagree with the per-row cast). Returns None when df is empty or a
    * column is all-null (no meaningful bounds exist). */
  def zValue(df: DataFrame, colA: String, colB: String, bits: Int = 16): Option[Column] = {
    val r = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head
    if ((0 to 3).exists(r.isNullAt)) None
    else Some(interleave(
      scaled(col(colA), r.getDouble(0), r.getDouble(1), bits),
      scaled(col(colB), r.getDouble(2), r.getDouble(3), bits), bits))
  }

  /** Write `df` z-ordered on (colA, colB) into `files` output files: range
    * partition + in-partition sort on the z-value, so consecutive files
    * cover compact rectangles of the (A, B) plane. An empty/all-null input
    * degrades to a plain write. `df` is persisted for the duration (its
    * lineage is otherwise evaluated three times: bounds, range sampling,
    * write). */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    files: Int, bits: Int = 16): Unit = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      zValue(cached, colA, colB, bits) match {
        case Some(z) =>
          cached.withColumn("_z", z)
            .repartitionByRange(files, col("_z"))
            .sortWithinPartitions("_z")
            .drop("_z")
            .write.mode("overwrite").parquet(path)
        case None =>
          cached.write.mode("overwrite").parquet(path)
      }
    } finally cached.unpersist()
  }
}
