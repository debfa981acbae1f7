package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational data-quality audits for lakehouse ingestion — the checks a
  * pipeline runs BEFORE publishing a snapshot (the validation-guard family
  * of the reference pipeline, generalized to cross-table contracts).
  */
object Audit {

  /** Referential-integrity orphan audit: how much of `child` points at a
    * `parentKey` that does not exist. NULL child keys are tallied
    * separately (`n_null_rows`) — under SQL join semantics a null never
    * matches anything, but a null FK is usually "absent by design", not a
    * dangling reference, so folding them into orphans would overcount.
    *
    * Output (one row): `n_rows` (non-null-key child rows), `n_keys`
    * (distinct non-null keys), `n_orphan_rows`, `n_orphan_keys`,
    * `n_null_rows`, `orphan_frac` (= orphan rows / rows, 0.0 on an empty
    * child — no NaN leaks).
    *
    * Scale shape: child collapses to per-key counts in ONE map-side-
    * combined shuffle (checkpointed — both the totals and the anti-join
    * read it); the anti-join then runs key-vs-key against the parent's
    * distinct keys — never row-vs-row, so a 100 TB fact table audits at
    * the cost of its key cardinality, not its row count. */
  def referentialOrphans(child: DataFrame, childKey: String,
                         parent: DataFrame, parentKey: String): DataFrame = {
    val keyed = child.filter(col(childKey).isNotNull)
      .groupBy(col(childKey).as("_k")).agg(count(lit(1)).as("_c"))
      .localCheckpoint(false)
    val totals = keyed.agg(
      coalesce(sum("_c"), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_keys"))
    val orphans = keyed
      .join(parent.select(col(parentKey).as("_k")).distinct(), Seq("_k"), "left_anti")
      .agg(coalesce(sum("_c"), lit(0L)).as("n_orphan_rows"),
        count(lit(1)).as("n_orphan_keys"))
    val nulls = child.filter(col(childKey).isNull)
      .agg(count(lit(1)).as("n_null_rows"))
    totals.crossJoin(broadcast(orphans)).crossJoin(broadcast(nulls))
      .withColumn("orphan_frac",
        when(col("n_rows") === 0L, lit(0.0))
          .otherwise(col("n_orphan_rows").cast("double")
            / col("n_rows").cast("double")))
  }
}
