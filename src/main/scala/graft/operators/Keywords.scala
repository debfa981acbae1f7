package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopK

/** TF-IDF keyword extraction — the classic per-document salient-term
  * signal (Spärck Jones, "A statistical interpretation of term
  * specificity", Journal of Documentation 1972): score every (document,
  * term) by `tf · ln(N / df)` and keep each document's top `k`. Where
  * [[Retrieval.bm25TopK]] ranks DOCUMENTS for a query, this ranks TERMS
  * within a document — the tagging/clustering/labeling primitive of a
  * curation pipeline.
  *
  * Scale shape (corpus is the 100 TB side):
  *  - One corpus pass builds the `(doc, term, tf)` table — a
  *    map-side-combinable aggregation. It is localCheckpointed ONCE and
  *    feeds all three consumers (document-frequency aggregation, the
  *    document count, the scoring join), so the tokenize/explode never
  *    re-runs.
  *  - Document frequency needs no distinct: tf rows are already unique
  *    per (doc, term), so `df` is a count per term — vocab-bounded
  *    output, broadcast when a COUNTED size clears `maxBroadcastRows`
  *    (the gated-broadcast convention), shuffle join above.
  *  - Per-document selection is the O(k)-state [[TopK]] aggregate over
  *    the tf table — map-side partial heaps, never a per-document sort.
  *
  * Cross-engine determinism: `tf`, `df`, `N` are exact integers; the
  * score is ONE multiplication of an exact integer by `ln` of one exact
  * integer ratio, rounded to 4 decimals; ranking orders by the ROUNDED
  * score with the exact-integer [[TextAnalysis.polyHash]] of the term as
  * the tie-break (the q102 recipe). Documents with no tokens have no
  * terms and are absent from the output.
  */
object Keywords {

  /** Top-`k` terms per document as `(idCol, rank, term, tf, tfidf)` —
    * `tfidf` rounded to 4 decimals, `rank` 1-based per document by
    * `(tfidf DESC, polyHash(term) ASC)`. `N` is the number of documents
    * with at least one token (the population `df` is counted over). */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    k: Int, maxBroadcastRows: Long = 50000000L): DataFrame =
    tfidfKeywordsFromTf(TextAnalysis.tfTable(docs, idCol, textCol),
      idCol, k, maxBroadcastRows)

  /** [[tfidfKeywords]] over a prebuilt [[TextAnalysis.tfTable]] — the
    * shared-intermediate form for pipelines that run several term-keyed
    * operators over one snapshot (value-identical; KeywordsSpec pins it). */
  def tfidfKeywordsFromTf(tfTable: DataFrame, idCol: String,
                          k: Int, maxBroadcastRows: Long = 50000000L): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val tf = tfTable.select(col(idCol), col("term"), col("tf"))

    val dfGate = Gates.countedBroadcast(
      tf.groupBy("term").agg(count(lit(1)).as("df")), maxBroadcastRows)
    val dfSide = dfGate.side
    val nDocs = tf.select(col(idCol)).distinct().count()

    val scored = tf.join(dfSide, Seq("term"))
      .select(col(idCol), col("term"), col("tf"),
        round(col("tf").cast("double") *
          log(lit(nDocs.toDouble) / col("df").cast("double")), 4).as("tfidf"))

    scored.groupBy(col(idCol))
      .agg(TopK.topK(k, col("tfidf"), TextAnalysis.polyHash(col("term")),
        struct(col("term"), col("tf"), col("tfidf"))).as("top"))
      .select(col(idCol), posexplode(col("top")))
      .select(col(idCol), (col("pos") + 1).cast("int").as("rank"),
        col("col.payload.term").as("term"),
        col("col.payload.tf").as("tf"),
        col("col.payload.tfidf").as("tfidf"))
  }
}
