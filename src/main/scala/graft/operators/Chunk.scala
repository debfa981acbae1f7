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

  private def letBind(a: Column)(f: Column => Column): Column =
    get(transform(array(a), f), lit(0))

  /** Content-defined chunk BOUNDARIES of an ALREADY-NORMALIZED text (the
    * [[TextAnalysis.normalized]] form — callers pass the bound attribute):
    * the sorted char positions `[0, …, len]` where a chunk ends, chosen
    * Rabin-style (Muthitacharoen et al., "A Low-bandwidth Network File
    * System", SOSP 2001; the LBFS chunking scheme): a boundary falls after
    * any 5-char window whose exact polynomial hash (the
    * [[TextAnalysis.winnowingFingerprints]] gram arithmetic) is divisible
    * by `divisor`, except boundaries closer than `minLen` chars to the
    * previous kept boundary, which are skipped (the LBFS minimum-size
    * guard, applied as a position-ordered fold). Expected chunk length is
    * ~`divisor` chars; the final chunk may be shorter than `minLen` (the
    * document just ends). Boundaries depend only on LOCAL content, so an
    * edit re-synchronizes after at most one chunk — the property that
    * makes chunk keys a dedup signal robust to insertions, which
    * fixed-offset windows ([[tokenWindows]]) structurally cannot be. */
  def contentBoundaries(normText: Column, divisor: Int, minLen: Int): Column = {
    // 257^4 .. 257^0 — exact in Long (the k<=8 winnowing bound applies)
    val pow = Array(4362470401L, 16974593L, 66049L, 257L, 1L)
    val M = 1000000007L
    letBind(transform(filter(split(normText, ""), c => c =!= ""),
        c => ascii(c).cast("long"))) { cs =>
      val n = size(cs)
      val gh = when(n < 5, array().cast("array<bigint>"))
        .otherwise(transform(sequence(lit(1), n - 4), i =>
          pmod(pow.zipWithIndex.map { case (p, j) =>
            element_at(cs, i + lit(j)) * lit(p) }.reduce(_ + _), lit(M))))
      letBind(gh) { g =>
        val cand = when(size(g) === 0, array().cast("array<int>"))
          .otherwise(transform(
            filter(sequence(lit(1), size(g)),
              j => pmod(element_at(g, j), lit(divisor.toLong)) === 0),
            j => j + lit(4)))
        val kept = aggregate(cand, array(lit(0)), (acc, p) =>
          when(p - element_at(acc, -1) >= lit(minLen),
            concat(acc, array(p))).otherwise(acc))
        letBind(kept) { k =>
          when(element_at(k, -1) === n, k)
            .otherwise(concat(k, array(n)))
        }
      }
    }
  }

  /** Column core of [[contentChunks]] for one RAW text value — normalizes,
    * finds boundaries, and slices inside one expression; SQL-registered as
    * `content_chunks(text, divisor, min_len)` returning
    * `array<struct<start, length, chunk_text>>` so a query can explode
    * (or count) chunks inline. Null/empty text yields an empty array. */
  def contentChunksCol(text: Column, divisor: Int, minLen: Int): Column = {
    require(divisor >= 2, s"divisor ($divisor) must be >= 2")
    require(minLen >= 1, s"minLen ($minLen) must be >= 1")
    val empty = array()
      .cast("array<struct<start:int,length:int,chunk_text:string>>")
    letBind(TextAnalysis.normalized(text)) { t =>
      letBind(contentBoundaries(t, divisor, minLen)) { bd =>
        when(t.isNull || length(t) === 0, empty)
          .otherwise(transform(sequence(lit(1), size(bd) - 1), j => {
            val start = element_at(bd, j) + 1
            val len = element_at(bd, j + 1) - element_at(bd, j)
            struct(start.cast("int").as("start"), len.cast("int").as("length"),
              t.substr(start, len).as("chunk_text"))
          }))
      }
    }
  }

  /** Content-defined chunks (LBFS/Rabin scheme — see
    * [[contentBoundaries]]): one row per chunk as `(id, chunk_id, start,
    * length, chunk_text, chunk_key)` with `start` 1-based in the
    * NORMALIZED text, `chunk_key = md5(chunk_text)` the dedup key, and
    * chunks concatenating back to the normalized document exactly.
    * Documents with null/empty normalized text produce zero chunks.
    *
    * Pure per-row map work like [[tokenWindows]] — boundary hashing,
    * the minimum-length fold and the substring slicing all happen inside
    * the document's own task row; zero shuffle, pipelines with the scan.
    * Chunk keys then feed exact dedup (`Dedup.exactGroups` on
    * `chunk_key`) for storage-style dedup of partially-edited documents. */
  def contentChunks(df: DataFrame, idCol: String, textCol: String,
                    divisor: Int = 64, minLen: Int = 32): DataFrame = {
    require(divisor >= 2, s"divisor ($divisor) must be >= 2")
    require(minLen >= 1, s"minLen ($minLen) must be >= 1")
    df.select(col(idCol), TextAnalysis.normalized(col(textCol)).as("_t"))
      .filter(col("_t").isNotNull && length(col("_t")) >= 1)
      .select(col(idCol), col("_t"),
        contentBoundaries(col("_t"), divisor, minLen).as("_bd"))
      .select(col(idCol), col("_t"),
        posexplode(transform(sequence(lit(1), size(col("_bd")) - 1), j =>
          struct((element_at(col("_bd"), j) + 1).as("start"),
            (element_at(col("_bd"), j + 1) - element_at(col("_bd"), j))
              .as("len")))))
      .select(col(idCol), col("pos").cast("int").as("chunk_id"),
        col("col.start").cast("int").as("start"),
        col("col.len").cast("int").as("length"),
        col("_t").substr(col("col.start"), col("col.len")).as("chunk_text"))
      .withColumn("chunk_key", md5(col("chunk_text")))
  }

  /** Contrastive training-pair generation for embedding models (the
    * SimCSE/DPR-style recipe): per document with ≥ 2 token windows,
    * `anchor` = window 0, `positive` = window 1 (adjacent text spans of
    * the SAME document — the standard weak-supervision positive), and
    * `negative` = the anchor of ANOTHER document chosen by a
    * deterministic hash ring — the in-batch-negatives idiom made
    * reproducible: documents sort by `md5(id:domain)` inside
    * `buckets` hash buckets and each takes the NEXT document's anchor
    * (cyclic within the bucket). Output
    * `(idCol, anchor, positive, neg_doc_id, negative)`.
    *
    * A singleton bucket wraps to itself (`neg_doc_id == idCol` — filter
    * or re-bucket if self-negatives matter; at corpus scale buckets hold
    * thousands of documents and the case vanishes).
    *
    * Scale shape: the window/lead runs PER BUCKET — `16^bucketHexChars`
    * buckets bound the partition count and each task sorts its bucket's
    * rows only (the Sampling.scala two-level argument); everything
    * upstream is the map-side chunker. Hash order is stable under append
    * within a bucket's survivors, and every engine replays the identical
    * ring (bucket = the hash's leading hex chars, so bucket membership
    * needs no extra derivation). */
  def contrastivePairs(df: DataFrame, idCol: String, textCol: String,
                       chunkTokens: Int = 32, bucketHexChars: Int = 1,
                       domain: String = "neg"): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens ($chunkTokens) must be >= 1")
    require(bucketHexChars >= 1 && bucketHexChars <= 4,
      s"bucketHexChars ($bucketHexChars) must be in [1, 4]")
    require(!df.columns.exists(Set("_h", "_b", "anchor", "positive", "negative")),
      "input must not contain the reserved columns _h/_b/anchor/positive/negative")
    import org.apache.spark.sql.expressions.Window
    val chunks = tokenWindows(df, idCol, textCol, chunkTokens, overlapTokens = 0)
      .filter(col("chunk_id") <= 1)
    val base = chunks.filter(col("chunk_id") === 0)
      .select(col(idCol), col("chunk_text").as("anchor"))
      .join(chunks.filter(col("chunk_id") === 1)
        .select(col(idCol), col("chunk_text").as("positive")), Seq(idCol))
      .withColumn("_h", md5(concat(col(idCol).cast("string"), lit(":" + domain))))
      .withColumn("_b", substring(col("_h"), 1, bucketHexChars))
    val ring = Window.partitionBy("_b").orderBy(col("_h"), col(idCol))
    val whole = Window.partitionBy("_b").orderBy(col("_h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base
      .withColumn("neg_doc_id",
        coalesce(lead(col(idCol), 1).over(ring), first(col(idCol)).over(whole)))
      .withColumn("negative",
        coalesce(lead(col("anchor"), 1).over(ring), first(col("anchor")).over(whole)))
      .select(col(idCol), col("anchor"), col("positive"),
        col("neg_doc_id"), col("negative"))
  }
}
