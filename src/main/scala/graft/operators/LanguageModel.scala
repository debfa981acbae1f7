package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the CCNet quality signal
  * (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
  * from Web Crawl Data", LREC 2020): train a small LM on a trusted slice,
  * score every candidate document by its per-token negative log
  * likelihood, and filter/bucket the corpus on that score. CCNet uses a
  * KenLM 5-gram; here the model is an add-one-smoothed BIGRAM over the
  * shared [[TextAnalysis.normalized]] token stream — the same
  * train-on-clean / score-everything shape, with integer counts and a
  * fixed-order fold so the score is bit-reproducible across engines.
  *
  * Model: `p(cur | prev) = (c(prev,cur) + 1) / (c(prev) + V + 1)` where
  * `V` is the training vocabulary size (distinct continuation tokens) and
  * the `+ 1` in the denominator reserves mass for a single implicit
  * `<unk>` outcome; a token never seen in training contributes
  * `c = 0` (and an unseen context `c(prev) = 0`), so out-of-vocabulary
  * text scores low without any special casing. Each document is scored as
  * `avg_nll = (1/m) * sum_i -ln p(w_i | w_{i-1})` with `w_0` the
  * beginning-of-sentence marker [[LanguageModel.Bos]]; perplexity is
  * `exp(avg_nll)` — monotone, so filtering on `avg_nll` is filtering on
  * perplexity.
  *
  * Scale shape (100 TB corpus, model trained on a curated slice):
  *  - [[trainBigram]] is one map-side-combinable aggregation whose output
  *    is bounded by the number of distinct bigram TYPES in the training
  *    slice — vocabulary-squared at worst, never corpus-sized.
  *  - [[perplexityScore]] touches the scored corpus once: the bigram
  *    stream joins the model and its context totals map-side (broadcast
  *    below `maxBroadcastRows` model rows — counted, not guessed — with a
  *    shuffle-join fallback above, the gated-broadcast convention of
  *    `Dedup.ngramJaccardPairs`), and the only corpus-sized exchange is
  *    the per-document regroup for the ordered fold, whose partial
  *    `collect_list` completes map-side because a document's bigrams
  *    never leave the task that exploded them.
  *  - Skew bound: the per-document aggregation state is O(doc tokens) —
  *    the SAME order as the document's own row (a constant factor over
  *    the string the scan already holds), so a pathological document is
  *    a row-size problem before it is an aggregation problem. Cap
  *    outliers upstream (`Scrub.gopherGates` length gates, or score
  *    [[Chunk.contentChunks]] chunks instead of whole books).
  *
  * Cross-engine determinism: counts and `V` are exact integers; each
  * per-position `-ln((c+1)/(c_ctx+V+1))` is `ln` of one exact
  * integer-ratio double; the per-document sum folds in POSITION order
  * (never an order-dependent parallel double sum); the 4-decimal output
  * round absorbs a stray `ln` ulp. The DuckDB oracle replays the fold
  * with `list_reduce(list_prepend(0.0, list(nll ORDER BY pos)))`.
  */
object LanguageModel {

  /** Beginning-of-sentence context. Contains characters
    * [[TextAnalysis.normalized]] can never emit, so it cannot collide
    * with a real token. */
  val Bos = "<s>"

  private def tokens(text: Column): Column =
    filter(split(TextAnalysis.normalized(text), " "), c => c =!= "")

  /** `(id, pos, prev, cur)` bigram stream with [[Bos]] at position 1;
    * documents with no tokens emit nothing. The token array is projected
    * to an attribute before the lambda references it (the
    * `Scrub.wordNgrams` let-binding lesson). */
  private def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("_tk"))
      .filter(size(col("_tk")) >= 1)
      .select(col(idCol), explode(transform(sequence(lit(1), size(col("_tk"))),
        i => struct(i.cast("int").as("pos"),
          when(i === 1, lit(Bos)).otherwise(element_at(col("_tk"), i - 1)).as("prev"),
          element_at(col("_tk"), i).as("cur")))).as("_p"))
      .select(col(idCol), col("_p.pos").as("pos"),
        col("_p.prev").as("prev"), col("_p.cur").as("cur"))

  /** Add-one bigram counts `(prev, cur, c)` over the training slice.
    * `c(Bos, w)` counts documents starting with `w`, so sentence-initial
    * probability falls out of the same table. One aggregation, output
    * bounded by distinct bigram types. */
  def trainBigram(train: DataFrame, textCol: String): DataFrame =
    bigrams(train.select(lit(0L).as("_lm_id"), col(textCol)), "_lm_id", textCol)
      .groupBy("prev", "cur").agg(count(lit(1)).as("c"))

  /** Interpolated Kneser–Ney bigram smoothing (Kneser & Ney 1995, in
    * Chen & Goodman 1999's interpolated one-discount form — the
    * fourth smoothing family next to add-one ([[trainBigram]] +
    * perplexity), Stupid Backoff ([[stupidBackoffScore]]) and
    * Good–Turing ([[goodTuring]])):
    *
    *   P(w|v) = max(c(vw)−D, 0)/c(v·)
    *          + D·N1+(v·)/c(v·) · N1+(·w)/N1+(··)
    *
    * where c(v·) = Σ_w c(vw) (context mass), N1+(v·) = distinct
    * continuations of v, N1+(·w) = distinct histories of w, N1+(··) =
    * total bigram types — the continuation-probability idea that makes
    * KN the default n-gram smoother. BOS contexts ride the
    * [[trainBigram]] stream unchanged.
    *
    * Determinism: every count is an exact integer from one pair
    * aggregation; `p_kn` is a fixed per-row IEEE shape (two divisions,
    * two products, one sum, one max) — bit-identical cross-engine. D
    * defaults to 0.75 (the Chen–Goodman constant), exactly
    * representable as 3/4.
    *
    * Scale shape: ONE corpus tokenize+count pass; everything after is
    * bigram-TYPE-bounded (the ctx/hist marginals and the 1-row type
    * total join back on their keys; the total is a broadcast).
    * Output: `(prev, cur, c_bigram, c_prev, n_cont_prev, n_hist_cur,
    * n_bigram_types, p_kn)`. */
  def kneserNey(train: DataFrame, textCol: String,
                discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount ($discount) must be in (0, 1)")
    val pair = trainBigram(train, textCol).localCheckpoint(false)
    val ctx = pair.groupBy("prev")
      .agg(sum(col("c")).as("c_prev"), count(lit(1)).as("n_cont_prev"))
    val hist = pair.groupBy("cur").agg(count(lit(1)).as("n_hist_cur"))
    val types = pair.agg(count(lit(1)).as("n_bigram_types"))
    val d = lit(discount)
    pair.join(ctx, Seq("prev")).join(hist, Seq("cur"))
      .crossJoin(broadcast(types))
      .select(col("prev"), col("cur"), col("c").as("c_bigram"),
        col("c_prev"), col("n_cont_prev"), col("n_hist_cur"),
        col("n_bigram_types"),
        (greatest(col("c").cast("double") - d, lit(0.0)) /
            col("c_prev").cast("double") +
          ((d * col("n_cont_prev").cast("double")) /
            col("c_prev").cast("double")) *
          (col("n_hist_cur").cast("double") /
            col("n_bigram_types").cast("double"))).as("p_kn"))
  }

  /** Per-document LM score `(idCol, n_tokens, avg_nll)` of `docs` under a
    * [[trainBigram]] model — `avg_nll` rounded to 4 decimals, lower =
    * more like the training slice. Documents with no tokens are dropped
    * (a 0-token perplexity is undefined). Context totals and `V` derive
    * from the model itself, so a materialized count table is the whole
    * model artifact. */
  def perplexityScore(docs: DataFrame, idCol: String, textCol: String,
                      model: DataFrame,
                      maxBroadcastRows: Long = 50000000L): DataFrame = {
    val nll = positionNll(docs, idCol, textCol, model, maxBroadcastRows)
    // Fixed-order left fold over (pos asc) — never a parallel double sum.
    nll.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        collect_list(struct(col("pos"), col("nll"))).as("cl"))
      .select(col(idCol), col("n_tokens"),
        round(aggregate(sort_array(col("cl")), lit(0.0),
            (a, s) => a + s.getField("nll")) /
          col("n_tokens").cast("double"), 4).as("avg_nll"))
  }

  /** Per-position add-one bigram NLL `(idCol, pos, nll)` — the shared
    * core of [[perplexityScore]] (mean over all positions) and
    * [[minKProbScore]] (mean over the k% most surprising). */
  private def positionNll(docs: DataFrame, idCol: String, textCol: String,
                          model: DataFrame,
                          maxBroadcastRows: Long): DataFrame = {
    // Pin the model: it feeds four consumers (count gate, pair join,
    // context totals, vocabulary size) — without a barrier the training
    // aggregation re-runs per consumer. An EMPTY model would score every
    // document -ln(1) = 0 ("perfect") with no signal anything was wrong,
    // so it fails loudly instead.
    val gate = Gates.countedBroadcast(model, maxBroadcastRows)
    require(gate.rows > 0,
      "the bigram model is empty (was the training slice empty or " +
        "token-less?) — every score would be a vacuous 0")
    val m = gate.pinned
    val mSide = gate.side
    val ctxSide = gate.of(m.groupBy("prev").agg(sum("c").as("cc")))
    val stats = m.agg(countDistinct(col("cur")).as("v"))
    bigrams(docs, idCol, textCol)
      .join(mSide, Seq("prev", "cur"), "left")
      .join(ctxSide, Seq("prev"), "left")
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("pos"),
        (-log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("cc"), lit(0L)) + col("v") + lit(1L)).cast("double")))
          .as("nll"))
  }

  /** Min-K% Prob membership/contamination score (Shi et al. 2023,
    * "Detecting Pretraining Data from Large Language Models",
    * arXiv:2310.16789): the mean NLL of the `kPct`% MOST SURPRISING
    * token positions under the model — a document the model has
    * memorized has no surprising tail, so a LOW score flags a likely
    * training member / benchmark leak. The outlier-focused complement
    * of [[perplexityScore]]'s all-position mean.
    *
    * `n_scored = max(1, n_tokens·kPct div 100)` exact-integer
    * positions, selected and folded in (nll desc, pos desc) order —
    * the slice boundary and the sum order are total, so both engines
    * pick the identical set and add in the identical order. Rounded to
    * 4 decimals ([[perplexityScore]]'s convention).
    *
    * Scale shape: one bigram join against the broadcast(able) model,
    * one per-doc aggregation; the sort is per-document, bounded by doc
    * length. Output: `(idCol, n_tokens, n_scored, min_k_avg_nll)`. */
  def minKProbScore(docs: DataFrame, idCol: String, textCol: String,
                    model: DataFrame, kPct: Int = 20,
                    maxBroadcastRows: Long = 50000000L): DataFrame = {
    require(kPct >= 1 && kPct <= 100, s"kPct ($kPct) must be in [1, 100]")
    positionNll(docs, idCol, textCol, model, maxBroadcastRows)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        collect_list(struct(col("nll"), col("pos"))).as("cl"))
      .select(col(idCol), col("n_tokens"),
        greatest(lit(1L),
          expr(s"(n_tokens * $kPct) div 100")).as("n_scored"),
        col("cl"))
      .select(col(idCol), col("n_tokens"), col("n_scored"),
        round(aggregate(
            slice(sort_array(col("cl"), asc = false), lit(1), col("n_scored")),
            lit(0.0), (a, s) => a + s.getField("nll")) /
          col("n_scored").cast("double"), 4).as("min_k_avg_nll"))
  }

  /** `(id, pos, p2, p1, cur)` trigram stream with a double-[[Bos]] pad —
    * `w₋₁ = w₀ = <s>`, so every token position has a full two-token
    * context and a one-token document still scores. */
  private def trigrams(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("_tk"))
      .filter(size(col("_tk")) >= 1)
      .select(col(idCol), explode(transform(sequence(lit(1), size(col("_tk"))),
        i => struct(i.cast("int").as("pos"),
          when(i <= 2, lit(Bos)).otherwise(element_at(col("_tk"), i - 2)).as("p2"),
          when(i === 1, lit(Bos)).otherwise(element_at(col("_tk"), i - 1)).as("p1"),
          element_at(col("_tk"), i).as("cur")))).as("_t"))
      .select(col(idCol), col("_t.pos").as("pos"), col("_t.p2").as("p2"),
        col("_t.p1").as("p1"), col("_t.cur").as("cur"))

  /** Trigram counts `(p2, p1, cur, c)` over the BOS-padded training
    * stream. The single artifact of the Stupid-Backoff model: every
    * lower-order table ([[stupidBackoffScore]]'s bigram/unigram/total
    * counts) derives from it by vocabulary-sized aggregation, so
    * numerators can never exceed their denominators by construction.
    * One map-side-combinable aggregation, output bounded by distinct
    * trigram TYPES in the training slice. */
  def trainTrigram(train: DataFrame, textCol: String): DataFrame =
    trigrams(train.select(lit(0L).as("_lm_id"), col(textCol)), "_lm_id", textCol)
      .groupBy("p2", "p1", "cur").agg(count(lit(1)).as("c"))

  /** Stupid-Backoff scoring (Brants et al., "Large Language Models in
    * Machine Translation", EMNLP 2007 §4): the web-scale LM that skips
    * normalized smoothing entirely —
    *
    * `S(w | a b) = c(abw)/c(ab)` if seen, else `α·S(w | b)`;
    * `S(w | b) = c(bw)/c(b)` if seen, else `α·S(w)`;
    * `S(w) = c(w)/N`, with the one deviation that an out-of-vocabulary
    * word scores `α/N` (a vanishing pseudo-mass keeps `ln` finite; the
    * paper leaves unseen unigrams unscored because MT never proposes
    * them — a curation scorer must score everything).
    *
    * α is the paper's 0.4. Returns `(idCol, n_tokens, avg_nll)` where
    * `avg_nll = (1/m)·Σ −ln S` over BOS-padded positions, rounded to 4
    * decimals — lower = more like the training slice. Scores are NOT
    * probabilities (that is the point of Stupid Backoff) but rank
    * monotonically, which is all a quality filter consumes.
    *
    * Determinism: all counts are exact integers from ONE padded stream;
    * each branch of the backoff CASE is division/multiplication of
    * exactly-representable args in a fixed left-associated order; the
    * per-doc sum folds in position order; the 4dp round absorbs `ln`
    * ulps. The oracle replays the identical CASE chain and fold.
    *
    * Scale shape: identical to [[perplexityScore]] — the model and its
    * three derived tables broadcast behind the counted gate (shuffle
    * fallback above `maxBroadcastRows`), and the only corpus-scale
    * exchange is the per-document regroup for the ordered fold. */
  def stupidBackoffScore(docs: DataFrame, idCol: String, textCol: String,
                         model: DataFrame,
                         maxBroadcastRows: Long = 50000000L): DataFrame = {
    val gate = Gates.countedBroadcast(model, maxBroadcastRows)
    require(gate.rows > 0,
      "stupidBackoffScore: the trigram model is empty (was the training " +
        "slice empty or token-less?)")
    val m = gate.pinned
    val a = lit(0.4)
    val triSide = gate.side
    val biCtxSide = gate.of(m.groupBy("p2", "p1").agg(sum("c").as("cb"))
      .withColumnRenamed("p2", "_b2").withColumnRenamed("p1", "_b1"))
    val biSide = gate.of(m.groupBy("p1", "cur").agg(sum("c").as("c2")))
    val uniCtxSide = gate.of(m.groupBy("p1").agg(sum("c").as("c1ctx"))
      .withColumnRenamed("p1", "_u1"))
    // cur is never Bos (it is always a real token), so grouping the model
    // by cur yields true unigram counts
    val uniSide = gate.of(m.groupBy("cur").agg(sum("c").as("c1")))
    val totals = m.agg(sum("c").as("n"))

    val scored = trigrams(docs, idCol, textCol)
      .join(triSide, Seq("p2", "p1", "cur"), "left")
      .join(biCtxSide, col("p2") === col("_b2") && col("p1") === col("_b1"), "left")
      .join(biSide, Seq("p1", "cur"), "left")
      .join(uniCtxSide, col("p1") === col("_u1"), "left")
      .join(uniSide, Seq("cur"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol), col("pos"),
        (-log(
          when(coalesce(col("c"), lit(0L)) > 0L,
            col("c").cast("double") / col("cb").cast("double"))
          .when(coalesce(col("c2"), lit(0L)) > 0L,
            a * (col("c2").cast("double") / col("c1ctx").cast("double")))
          .when(coalesce(col("c1"), lit(0L)) > 0L,
            a * a * (col("c1").cast("double") / col("n").cast("double")))
          .otherwise(a * a * a / col("n").cast("double")))).as("nll"))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        collect_list(struct(col("pos"), col("nll"))).as("cl"))
      .select(col(idCol), col("n_tokens"),
        round(aggregate(sort_array(col("cl")), lit(0.0),
            (acc, s) => acc + s.getField("nll")) /
          col("n_tokens").cast("double"), 4).as("avg_nll"))
  }

  /** Good–Turing frequency smoothing (Good 1953; the Gale & Sampson
    * 1995 presentation): from the corpus unigram counts, the
    * count-of-counts table `N_r` and the smoothed count
    * `r* = (r+1)·N_{r+1}/N_r` — the LM-smoothing primitive under
    * Katz backoff, and the estimator behind "how much probability mass
    * belongs to unseen words" (`p0 = N_1/N`, repeated on every row).
    * `r*` is null where `N_{r+1} = 0` (the raw estimator is undefined
    * there — Gale–Sampson smooth the tail; that extension is a curve
    * fit, out of scope and stated).
    *
    * Exactness: token counts, `N_r`, `N = Σ r·N_r` (decimal(38,0))
    * are exact; `r*` and `p0` are fixed-order double divisions of
    * exact integers.
    *
    * Scale shape: one corpus tokenize into a vocab-sized count table,
    * one collapse to count-of-counts (≤ distinct-count-values rows —
    * hundreds), a self-join on r+1 at that size, a 1-row total
    * broadcast. Output: `(r, n_r, r_star, p0_unseen)` ordered by r. */
  def goodTuring(docs: DataFrame, textCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val counts = docs
      .select(explode(tokens(col(textCol))).as("_w"))
      .groupBy("_w").agg(count(lit(1)).as("_r"))
    val coc = counts.groupBy(col("_r").as("r"))
      .agg(count(lit(1)).as("n_r"))
      .localCheckpoint(false) // self-join + totals read it
    val tot = coc.agg(
      sum(col("r").cast(d38) * col("n_r").cast(d38)).as("_n"),
      sum(when(col("r") === 1L, col("n_r")).otherwise(0L)).as("_n1"))
    coc.join(coc.select((col("r") - 1).as("r"), col("n_r").as("_nr1")),
        Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"),
        when(col("_nr1").isNull, lit(null).cast("double"))
          .otherwise((col("r") + lit(1L)).cast("double") *
            col("_nr1").cast("double") / col("n_r").cast("double"))
          .as("r_star"),
        (col("_n1").cast("double") / col("_n").cast("double"))
          .as("p0_unseen"))
  }
}
