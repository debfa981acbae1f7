package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword tokenizer training — Kudo
  * 2018 ("Subword Regularization", ACL), the OTHER tokenizer real LLM
  * corpora ship with next to BPE ([[Bpe]]): seed a candidate vocabulary
  * from frequent substrings, fit piece probabilities by EM over each
  * word's best segmentation, prune to a budget.
  *
  * This implementation is the deterministic, oracle-replayable variant:
  *
  *  - **Seed**: every substring of length 1..`maxLen` of the distinct-word
  *    table, weighted by word frequency × occurrence multiplicity
  *    (overlaps count: "aa" occurs twice in "aaa"). All single characters
  *    are kept unconditionally (the coverage set SentencePiece calls
  *    required characters); the top `seedTopK` multi-character substrings
  *    join them by `(mass DESC, piece ASC)` — a total order.
  *  - **E-step (hard EM / Viterbi)**: piece score `s_e6(p) =
  *    floor(ln(c(p)/T)·10⁶ + 0.5)` — ONE double division of two exact
  *    longs and one `ln`, the [[graft.functions.ExactRound]] floor recipe,
  *    so both engines hold identical INTEGER scores and the DP sums them
  *    exactly (no float accumulation anywhere). Best segmentation
  *    maximizes the score sum; ties break toward the LONGEST piece ending
  *    at each position (the smallest predecessor index), which makes the
  *    whole path unique. Kudo's full EM uses forward–backward expected
  *    counts; Viterbi counts are its documented hard-EM specialization
  *    (§3.2 of the paper trains on the 1-best lattice path) and keep the
  *    arithmetic integer-exact across engines.
  *  - **M-step** (rounds ≥ 2): piece mass becomes its Viterbi use count
  *    + 1 (additive smoothing so an unused required character keeps a
  *    finite score); multi-character pieces with zero uses drop out.
  *  - **Prune**: after the last E-step, keep every seed character
  *    (coverage — with 0 uses if Viterbi never chose it) plus the top
  *    `keepMulti` multi-character pieces by `(n_uses DESC, piece ASC)`.
  *
  * Scale shape (the [[Bpe]] contract): ONE corpus-scale aggregation (the
  * word-frequency table); everything after runs on the vocabulary-sized
  * distinct-word table — substring explosion is |vocab|·len·maxLen rows,
  * the piece table is bounded by `seedTopK` + charset and BROADCAST into
  * the edge join, and the Viterbi DP/backtrack are per-row HOF folds
  * (zero shuffle, zero UDF). Driver-side collects are bounded: one scalar
  * total per round, one charset count.
  */
object Unigram {

  /** All (start, len) substrings of `word` up to `maxLen`, as
    * `struct(i 0-based start, j 0-based exclusive end, piece)`. */
  private def candidateEdges(word: Column, maxLen: Int): Column =
    flatten(transform(sequence(lit(1), length(word)), i =>
      transform(sequence(lit(1), least(lit(maxLen), length(word) - i + lit(1))), k =>
        struct((i - 1).as("i"), (i - 1 + k).as("j"),
          word.substr(i, k).as("piece")))))

  /** Substring-mass table `(piece, c0)` of a word-frequency table:
    * `c0 = Σ_word weight(word) · occurrences(piece, word)`. */
  def substringMass(words: DataFrame, wordCol: String, weightCol: String,
                    maxLen: Int): DataFrame =
    words
      .select(col(weightCol).cast("long").as("_w"),
        explode(candidateEdges(col(wordCol), maxLen)).as("_e"))
      .groupBy(col("_e.piece").as("piece"))
      .agg(sum(col("_w")).as("c0"))

  /** Seed vocabulary: every single character + the top `seedTopK`
    * multi-character substrings by `(c0 DESC, piece ASC)`. */
  def seedVocab(words: DataFrame, wordCol: String, weightCol: String,
                maxLen: Int, seedTopK: Int): DataFrame = {
    val mass = substringMass(words, wordCol, weightCol, maxLen)
    mass.filter(length(col("piece")) === 1)
      .unionByName(mass.filter(length(col("piece")) > 1)
        .orderBy(col("c0").desc, col("piece")).limit(seedTopK))
  }

  /** Integer piece scores off a `(piece, c0)` vocabulary:
    * `s_e6 = floor(ln(c0/T)·10⁶ + 0.5)` with `T = Σ c0` — the one
    * driver-collected scalar per EM round. */
  private def scored(vocab: DataFrame): DataFrame = {
    val t = vocab.agg(sum(col("c0"))).collect()(0).getLong(0)
    require(t > 0L, "unigram: empty seed vocabulary")
    vocab.select(col("piece"),
      floor(log(col("c0").cast("double") / lit(t.toDouble)) * lit(1e6) +
        lit(0.5)).cast("long").as("s_e6"))
  }

  /** Each word's Viterbi best segmentation as `(_word, _w, _parts)` —
    * score-sum argmax over the scored vocabulary, ties to the longest
    * piece ending at each position. HOF-only per-row DP — the edge list
    * per word is `len·maxLen` structs off a broadcast piece join. */
  private def segmented(words: DataFrame, wordCol: String, weightCol: String,
                        vocabScores: DataFrame, maxLen: Int): DataFrame = {
    // rename FIRST, explode SECOND: putting the explode in the same
    // select list as the `.as("_word")` alias makes its col(wordCol)
    // resolve to the same-list LATERAL alias when the caller's column is
    // already named _word — Spark 4.1 rejects a lateral reference inside
    // a Generate with an internal error (observed live from fertility)
    val edges = words
      .select(col(wordCol).as("_word"), col(weightCol).cast("long").as("_w"))
      .select(col("_word"), col("_w"),
        explode(candidateEdges(col("_word"), maxLen)).as("_e"))
      .select(col("_word"), col("_w"), col("_e.i").as("i"),
        col("_e.j").as("j"), col("_e.piece").as("piece"))
      .join(broadcast(vocabScores), Seq("piece"))
      .groupBy(col("_word"), col("_w"))
      .agg(collect_list(struct(col("i"), col("j"), col("s_e6"),
        col("piece"))).as("_edges"))
    // dp(pos) over 0..len: every position is reachable (single chars are
    // always in the vocabulary), so the filtered transform is never empty
    val dp = aggregate(
      sequence(lit(1), length(col("_word"))),
      array(lit(0L)),
      (acc, j) => concat(acc, array(array_max(transform(
        filter(col("_edges"), e => e.getField("j") === j),
        e => element_at(acc, e.getField("i") + 1) + e.getField("s_e6"))))))
    // backtrack from len: among edges achieving dp(pos), the struct min
    // picks the smallest start index = the LONGEST piece (the tie rule)
    val parts = aggregate(
      sequence(lit(1), length(col("_word"))),
      struct(length(col("_word")).as("pos"),
        array().cast("array<string>").as("parts")),
      (st, _) => when(st.getField("pos") === 0, st).otherwise {
        val best = array_min(transform(
          filter(col("_edges"), e =>
            e.getField("j") === st.getField("pos") &&
              element_at(col("_dp"), e.getField("i") + 1) + e.getField("s_e6") ===
              element_at(col("_dp"), st.getField("pos") + 1)),
          e => struct(e.getField("i").as("i"), e.getField("piece").as("piece"))))
        struct(best.getField("i").as("pos"),
          concat(st.getField("parts"), array(best.getField("piece"))).as("parts"))
      },
      st => st.getField("parts"))
    edges
      .withColumn("_dp", dp)
      .select(col("_word"), col("_w"), parts.as("_parts"))
  }

  /** Viterbi use counts `(piece, n_uses)` of a scored vocabulary over the
    * word table: each chosen piece of each word's best segmentation,
    * weighted by the word's frequency. */
  def viterbiCounts(words: DataFrame, wordCol: String, weightCol: String,
                    vocabScores: DataFrame, maxLen: Int): DataFrame =
    segmented(words, wordCol, weightCol, vocabScores, maxLen)
      .select(col("_w"), explode(col("_parts")).as("piece"))
      .groupBy("piece").agg(sum(col("_w")).as("n_uses"))

  /** Train a unigram-LM vocabulary: seed → `emRounds` hard-EM rounds →
    * prune. Returns `(piece, n_uses)` — every seed character (0 uses if
    * never chosen) plus the top `keepMulti` multi-character pieces by the
    * FINAL round's Viterbi counts. */
  def train(words: DataFrame, wordCol: String, weightCol: String,
            maxLen: Int = 4, seedTopK: Int = 64, keepMulti: Int = 32,
            emRounds: Int = 1): DataFrame = {
    require(maxLen >= 2 && maxLen <= 16, s"maxLen ($maxLen) must be in [2, 16]")
    require(seedTopK >= keepMulti,
      s"seedTopK ($seedTopK) must be >= keepMulti ($keepMulti)")
    require(emRounds >= 1 && emRounds <= 16,
      s"emRounds ($emRounds) must be in [1, 16]")
    val w = words.filter(col(wordCol).isNotNull && col(wordCol) =!= "")
      .localCheckpoint(false)
    var vocab = seedVocab(w, wordCol, weightCol, maxLen, seedTopK)
      .localCheckpoint(true)
    val chars = vocab.filter(length(col("piece")) === 1)
      .select("piece").localCheckpoint(true)
    var counts: DataFrame = null
    for (r <- 1 to emRounds) {
      counts = viterbiCounts(w, wordCol, weightCol, scored(vocab), maxLen)
        .localCheckpoint(true)
      if (r < emRounds)
        vocab = chars
          .join(counts, Seq("piece"), "left")
          .select(col("piece"), (coalesce(col("n_uses"), lit(0L)) + 1L).as("c0"))
          .unionByName(counts.filter(length(col("piece")) > 1)
            .select(col("piece"), (col("n_uses") + 1L).as("c0")))
          .localCheckpoint(true)
    }
    chars.join(counts, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("n_uses"), lit(0L)).as("n_uses"))
      .unionByName(counts.filter(length(col("piece")) > 1)
        .orderBy(col("n_uses").desc, col("piece")).limit(keepMulti))
  }

  /** Serving scores off a TRAINED `(piece, n_uses)` vocabulary: the same
    * integer recipe with +1 smoothing (a coverage character Viterbi never
    * chose has 0 uses — ln(0) must stay finite so every word remains
    * segmentable): `s_e6 = floor(ln((n+1)/T')·10⁶ + 0.5)`,
    * `T' = Σ(n+1)`. */
  def servingScores(vocab: DataFrame): DataFrame = {
    val t = vocab.agg(sum(col("n_uses") + 1L)).collect()(0).getLong(0)
    require(t > 0L, "unigram: empty trained vocabulary")
    vocab.select(col("piece"),
      floor(log((col("n_uses") + 1L).cast("double") / lit(t.toDouble)) *
        lit(1e6) + lit(0.5)).cast("long").as("s_e6"))
  }

  /** Tokenizer-fertility report per slice under a SCORED unigram
    * vocabulary — [[Bpe.fertility]]'s twin for the Viterbi tokenizer:
    * per slice, `tokens_per_word` and `chars_per_token` as single double
    * divisions of exact integer masses.
    *
    * Scale shape (identical to the BPE one): one corpus tokenize pass
    * collapses occurrences to `(slice, word)` counts; the Viterbi encode
    * runs once per DISTINCT word and joins back. `maxWordLen` bounds the
    * DP the oracle unrolls — words longer than it are SKIPPED in both
    * engines (the gate's documented contract; production raises it). */
  def fertility(df: DataFrame, textCol: String, sliceCols: Seq[String],
                vocabScores: DataFrame, maxLen: Int,
                maxWordLen: Int = 12): DataFrame = {
    require(sliceCols.nonEmpty, "sliceCols must name at least one column")
    val reserved = Seq("_w", "_c", "_ntok", "_nchr", "_word", "_parts")
    require(!sliceCols.exists(reserved.contains) && !reserved.contains(textCol),
      s"reserved columns ${reserved.mkString(", ")} must not appear in inputs")
    val slices = sliceCols.map(col)
    val occ = df.select(slices :+
        explode(split(trim(col(textCol)), "\\s+")).as("_word"): _*)
      .filter(col("_word") =!= "" && length(col("_word")) <= maxWordLen)
      .groupBy(col("_word") +: slices: _*).agg(count(lit(1)).as("_c"))
    val vocabWords = occ.select(col("_word")).distinct()
      .withColumn("_one", lit(1L))
    val tok = segmented(vocabWords, "_word", "_one", vocabScores, maxLen)
      .select(col("_word"), size(col("_parts")).as("_ntok"),
        length(col("_word")).as("_nchr"))
    occ.join(tok, "_word")
      .groupBy(slices: _*)
      .agg(sum(col("_c")).as("n_words"),
        sum(col("_c") * col("_ntok")).as("n_tokens"),
        sum(col("_c") * col("_nchr").cast("long")).as("n_chars"))
      .select(slices ++ Seq(col("n_words"), col("n_tokens"), col("n_chars"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("tokens_per_word"),
        (col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token")): _*)
  }
}
