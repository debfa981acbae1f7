package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking: split long documents into overlapping token windows —
  * the context-window preparation step for retrieval indexing and
  * fixed-length pretraining examples (the inverse of [[Pack]], which glues
  * SHORT documents together; real pipelines run both).
  *
  * Pure per-row column arithmetic: tokenize once (let-bound), build every
  * chunk of a document inside one `transform`, explode once. No shuffle —
  * at 100 TB this is a map stage that pipelines with the parquet scan, and
  * output row count is ~`n_tokens / stride` per document, the fan-out any
  * chunker must pay. Skew note: one document's chunks are built in its own
  * task row; pathological single documents (books) are fine because chunk
  * STRUCTS are materialized lazily by the explode, but downstream per-chunk
  * heavy work should repartition on (doc, chunk) first — same guidance as
  * [[Multimodal.sampleFrames]].
  */
object Chunk {

  /** Overlapping token-window chunks of `textCol`.
    *
    * Windows are `chunkTokens` wide and advance by
    * `chunkTokens - overlapTokens` (the stride), so consecutive chunks
    * share exactly `overlapTokens` tokens; the final window is the
    * remainder (possibly shorter — never empty, and never a window whose
    * tokens are all contained in the previous one: a chunk starts only
    * while `start <= n_tokens`). Tokens are whitespace runs, consistent
    * with [[TextAnalysis.tokenCount]]; documents with no tokens (null or
    * blank text) produce zero chunks.
    *
    * Output: one row per chunk — (id, `chunk_id` 0-based, `chunk_start`
    * 1-based token position, `n_tokens` in this chunk, `chunk_text`
    * re-joined with single spaces). Runs of whitespace in the source are
    * therefore normalized in `chunk_text`; offsets are token positions,
    * not byte positions, by design (byte-exact reconstruction belongs to
    * the tokenizer, not the chunker).
    */
  def tokenWindows(df: DataFrame, idCol: String, textCol: String,
                   chunkTokens: Int, overlapTokens: Int = 0): DataFrame =
    df.select(col(idCol),
        explode(tokenWindowsCol(col(textCol), chunkTokens, overlapTokens)).as("_c"))
      .select(col(idCol), col("_c.chunk_id"), col("_c.chunk_start"),
        col("_c.n_tokens"), col("_c.chunk_text"))

  /** Column core of [[tokenWindows]]: the chunk-struct ARRAY for one text
    * value — SQL-registered as `token_windows(text, chunk, overlap)` so a
    * query can explode (or inspect) chunks inline. */
  def tokenWindowsCol(text: Column, chunkTokens: Int,
                      overlapTokens: Int = 0): Column = {
    require(chunkTokens >= 1, s"chunkTokens ($chunkTokens) must be >= 1")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens ($overlapTokens) must be in [0, chunkTokens) — a " +
        "stride of zero would chunk forever")
    val stride = chunkTokens - overlapTokens
    // tokenize once per document; the trailing-empty filter makes blank
    // text an EMPTY array (split("", "\\s+") is [""], size 1 — wrong)
    val toks = filter(split(trim(text), "\\s+"), t => t =!= "")
    // let-bind through a one-element transform (the Scrub.wordNgrams
    // lesson): referencing `toks` directly inside the per-chunk lambda
    // would re-tokenize the document once per chunk
    get(transform(array(toks), tk => {
      val n = size(tk)
      val nChunks = when(n <= chunkTokens, lit(1L))
        .otherwise(ceil((n - lit(chunkTokens)).cast("double") / lit(stride.toDouble))
          .cast("long") + lit(1L))
      when(n === 0, array().cast("array<struct<chunk_id:bigint,chunk_start:bigint,n_tokens:int,chunk_text:string>>"))
        .otherwise(transform(sequence(lit(0L), nChunks - 1), c => {
          val start = c * lit(stride.toLong) + 1L
          val piece = slice(tk, start.cast("int"), lit(chunkTokens))
          struct(c.as("chunk_id"), start.as("chunk_start"),
            size(piece).as("n_tokens"), array_join(piece, " ").as("chunk_text"))
        }))
    }), lit(0))
  }
}
