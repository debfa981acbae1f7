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
}
