package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental corpus dedup — admit only NOVEL documents from an incoming
  * batch, judged against a fingerprint LEDGER, without ever rescanning the
  * corpus the ledger summarizes.
  *
  * The 100 TB reality this models: the corpus itself (text, media) is too
  * big to re-read per ingest, but its fingerprint ledger — one slim
  * `(fp, first_id)` row per distinct document — is a join-able table that
  * grows with DISTINCT content, not with ingests. Each incoming batch is
  * deduped in two steps, both batch-sized, never corpus-sized:
  *
  *  1. intra-batch: keep the lowest-id row per fingerprint (the same
  *     min-id convention as [[Dedup.exactDedup]]);
  *  2. vs the ledger: [[BloomJoin.antiJoin]] — the ledger-side bloom
  *     sketch classifies batch rows executor-side, so only possible
  *     members (matches + fpp·|batch|) shuffle into the exact anti-join;
  *     the novel majority of a healthy crawl never pays the exchange.
  *
  * Persisting the admitted fingerprints back is [[MergeByKey.merge]] keyed
  * on `fp` (crash-safe, idempotent — IncrementalDedupSpec drives the full
  * ingest→replay loop and asserts a replayed batch admits zero rows).
  */
object IncrementalDedup {

  /** Rows of `batch` that are first-in-batch for their fingerprint AND
    * whose fingerprint is absent from `ledger`. Output keeps the batch
    * schema. `expectedLedgerItems` sizes the bloom sketch (see
    * [[BloomJoin.antiJoin]]; undershooting only weakens pruning, never
    * correctness). Null fingerprints are rejected up front — a null fp
    * would silently pass any anti-join and admit every copy. */
  def dedupBatch(batch: DataFrame, ledger: DataFrame, idCol: String,
                 fpCol: String, expectedLedgerItems: Long = 1000000L,
                 fpp: Double = 0.01): DataFrame = {
    require(!batch.columns.contains("_rn"), "batch must not contain reserved column _rn")
    val nonNull = batch.filter(col(fpCol).isNotNull)
    // intra-batch winner: lowest id per fingerprint. The window shuffles
    // only the BATCH (the increment, not the corpus) on fp — the same
    // exchange the exact-verification join below reuses.
    val w = Window.partitionBy(col(fpCol)).orderBy(col(idCol))
    val firstInBatch = nonNull
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    BloomJoin.antiJoin(firstInBatch, ledger.select(col(fpCol)),
      fpCol, fpCol, expectedLedgerItems, fpp)
  }
}
