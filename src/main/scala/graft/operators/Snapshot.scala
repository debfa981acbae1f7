package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot versioning: content-level diff between two crawls /
  * refreshes of the same corpus — the bookkeeping step that decides what an
  * incremental curation pipeline must re-process (new and changed documents)
  * and what it can retire (removed ones). Complements the partition-level
  * incremental diff (reference `silver.py:69`, q08) and the fingerprint
  * ledger ([[IncrementalDedup]]): those answer "which partitions / which
  * duplicates", this answers "which documents, and how did they move".
  *
  * Scale shape: each side is reduced to `(id, fingerprint)` — a map-side
  * projection; the single shuffle is the full-outer join on the id, which
  * co-partitions both snapshots by the same key (bucketed snapshot storage
  * makes even that exchange disappear). No window, no driver state; output
  * is one row per id in either snapshot.
  */
object Snapshot {

  /** Diff `newSnap` against `oldSnap` by content fingerprint
    * (`md5` of `textCol`, nulls read as empty — the ledger convention).
    * Output: `(idCol, status, old_fp, new_fp)` with status one of
    * `added` (id only in new), `removed` (id only in old), `changed`
    * (both, different content), `unchanged`. Ids must be unique within
    * each snapshot (a duplicated id would cross-multiply through the
    * join, like any keyed upsert input). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           idCol: String, textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("_id"),
      md5(coalesce(col(textCol).cast("string"), lit(""))).as("old_fp"))
    val n = newSnap.select(col(idCol).as("_id"),
      md5(coalesce(col(textCol).cast("string"), lit(""))).as("new_fp"))
    o.join(n, Seq("_id"), "full_outer")
      .select(col("_id").as(idCol),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") === col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** Per-shard export manifest: the integrity record a training run
    * checks before (and after) reading a published corpus export. One row
    * per distinct value of `shardCol`:
    * `(shardCol, n_rows, n_weight, min_id, max_id, checksum_lo,
    * checksum_hi)` where `n_weight` is the exact sum of `weightCol`
    * (token counts) and the checksum pair is an ORDER-INDEPENDENT content
    * fingerprint: md5 of `id:text` (the [[diff]] null-as-empty
    * convention) split into its first and second 8-hex words, each summed
    * as an exact integer. Any lost, duplicated, or byte-changed row moves
    * at least one sum (a coincidental cancellation needs a second row
    * whose md5 words offset the first exactly — a 2⁻⁶⁴ event); row order
    * never does, so re-exports from any cluster layout compare equal.
    *
    * Why summed words and not `md5(string_agg(...))`: the aggregated-
    * string checksum needs every row of a shard collected and sorted in
    * one place — shard-sized state. The word sums are commutative
    * single-long state with map-side partials, and each word stays
    * < 2³², so the long totals are exact up to 2³¹ rows per shard. */
  def manifest(df: DataFrame, shardCol: String, idCol: String,
               textCol: String, weightCol: String): DataFrame = {
    // the id side is coalesced too: concat propagates null, and sum()
    // skips nulls — a null-id row would increment n_rows while never
    // moving either checksum, silently violating the "any lost row moves
    // at least one sum" integrity claim
    val fp = md5(concat(coalesce(col(idCol).cast("string"), lit("")), lit(":"),
      coalesce(col(textCol).cast("string"), lit(""))))
    def word(off: Int) = conv(substring(fp, off, 8), 16, 10).cast("long")
    df.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(weightCol)).cast("long").as("n_weight"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"),
        sum(word(1)).as("checksum_lo"),
        sum(word(9)).as("checksum_hi"))
  }
}
