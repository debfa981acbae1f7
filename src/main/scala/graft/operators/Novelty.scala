package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram novelty scoring — for every document, the fraction of its
  * DISTINCT word n-grams that do not occur anywhere in a reference
  * corpus. The inverse of the contamination overlap in
  * [[Scrub.contaminationReport]]: contamination asks "how much of this
  * document is benchmark text", novelty asks "how much of this document
  * is NEW relative to what we already have" — the memorization /
  * redundancy signal used when deciding whether a crawl snapshot adds
  * information to an existing corpus (cf. Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022, which measures
  * train-set n-gram overlap the same way).
  *
  * Grams travel as their [[TextAnalysis.polyHash]] — an 8-byte exchange
  * key instead of variable-length strings, and an EXACT shared function
  * both engines replay, so a hash collision (a ~1e-9 false "seen" per
  * gram pair under the 1e9+7 modulus) produces the SAME answer in the
  * oracle rather than a divergence.
  *
  * Scale shape (scored corpus is the 100 TB side):
  *  - Per-document distinct grams come from `array_distinct` INSIDE the
  *    row before the explode — map-side, no dedup shuffle.
  *  - The reference dictionary is one distinct aggregation, bounded by
  *    gram TYPES in the reference (vocabulary-shaped, not corpus-sized),
  *    pinned once and broadcast when a COUNTED size clears
  *    `maxBroadcastRows` (the gated-broadcast convention), with a
  *    shuffle join fallback above.
  *  - The only corpus-sized exchanges are the gram-stream join against
  *    the dictionary (map-side when broadcast) and the per-document
  *    regroup for the two counts; both carry `(id, hash)` longs only.
  */
object Novelty {

  /** Aggregated core of [[ngramNovelty]]: `(idCol, n_grams, n_novel,
    * novelty)` for documents with AT LEAST ONE `n`-gram — the
    * streaming-safe surface (one stream-static dictionary join + one
    * streaming aggregation; no post-aggregate join, which Structured
    * Streaming forbids). Batch callers wanting a row for every input
    * document use [[ngramNovelty]]. */
  def ngramNoveltyScored(docs: DataFrame, reference: DataFrame,
                         idCol: String, textCol: String, n: Int = 3,
                         maxBroadcastRows: Long = 50000000L): DataFrame = {
    require(n >= 1, s"n ($n) must be >= 1")
    def gramHashes(df: DataFrame) = df
      .select(col(idCol), explode(array_distinct(
        Scrub.wordNgrams(TextAnalysis.normalized(col(textCol)), n))).as("_g"))
      .select(col(idCol), TextAnalysis.polyHash(col("_g")).as("_h"))

    val dictSide = Gates.countedBroadcast(
      gramHashes(reference).select("_h").distinct()
        .withColumn("_seen", lit(1)), maxBroadcastRows).side

    gramHashes(docs)
      .join(dictSide, Seq("_h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col(idCol), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") /
          col("n_grams").cast("double"), 4).as("novelty"))
  }

  /** `(idCol, n_grams, n_novel, novelty)` for every row of `docs`:
    * `n_grams` distinct word `n`-grams, `n_novel` of them absent from
    * `reference`, `novelty = n_novel / n_grams` rounded to 4 decimals —
    * NULL (with zero counts) for documents shorter than `n` tokens.
    * `idCol` is expected to be a non-null key: a NULL id cannot match the
    * re-add join, so such a row is reported as gram-less. */
  def ngramNovelty(docs: DataFrame, reference: DataFrame, idCol: String,
                   textCol: String, n: Int = 3,
                   maxBroadcastRows: Long = 50000000L): DataFrame =
    docs.select(col(idCol))
      .join(ngramNoveltyScored(docs, reference, idCol, textCol, n,
        maxBroadcastRows), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        col("novelty"))
}
