package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopK

/** Table profiling: per-column statistics for data-quality triage over a
  * (possibly huge) table — ALL columns in one aggregate over ONE scan
  * (k separate agg jobs would read a 100 TB table k times). The exact
  * distinct counts make Catalyst plan an Expand (one duplicated stream per
  * distinct column) — CPU inside a single pass, never extra I/O. */
object Profile {

  /** Numeric-column profile: count / nulls / exact distinct / min / max /
    * sum (rounded at `sumScale` decimals — callers pick a scale the data
    * makes exact) / mean derived from the rounded sum (keeps the value
    * bit-comparable across engines).
    *
    * Shape: one wide aggregation row (5 stats × column), unpivoted to the
    * per-column layout through a one-row explode — no shuffle, no extra
    * scan, no driver loop. */
  def numericProfile(df: DataFrame, cols: Seq[String], sumScale: Int = 2): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"__${c}__n_null"),
        countDistinct(col(c)).as(s"__${c}__n_distinct"),
        min(col(c)).cast("double").as(s"__${c}__min_v"),
        max(col(c)).cast("double").as(s"__${c}__max_v"),
        round(sum(col(c)), sumScale).as(s"__${c}__sum_v"))
    }
    val perCol = cols.map { c =>
      struct(
        lit(c).as("col_name"), col("n"),
        col(s"__${c}__n_null").as("n_null"),
        col(s"__${c}__n_distinct").as("n_distinct"),
        col(s"__${c}__min_v").as("min_v"),
        col(s"__${c}__max_v").as("max_v"),
        col(s"__${c}__sum_v").as("sum_v"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(perCol: _*)).as("p"))
      .select("p.*")
      // mean over the observed (non-null) values; all-null column -> null
      .withColumn("mean_v",
        when(col("n") > col("n_null"), col("sum_v") / (col("n") - col("n_null"))))
  }

  /** Corpus-health profile per `groupCol` slice — the lexical-statistics
    * dashboard of a text corpus (Baayen, "Word Frequency Distributions",
    * 2001): token count, exact vocabulary size, type-token ratio, hapax
    * fraction (the share of vocabulary seen exactly once — the classic
    * "still growing / full of noise" indicator), and the Zipf rank-
    * frequency slope — the least-squares slope of `ln(count)` against
    * `ln(rank)` over the top-`topN` ranks (natural text ≈ −1; machine-
    * generated or boilerplate-heavy slices drift away from it).
    *
    * Scale shape: ONE corpus pass builds the `(slice, token, count)`
    * table — a map-side-combinable aggregation, vocab-bounded output —
    * and ONE second aggregation carries the scalar stats and the
    * O(`topN`)-state [[TopK]] rank heap together (never a per-slice
    * sort, never a scalar/slope join); the slope's four sums fold over
    * the BOUNDED ranked array in rank order (fixed-order —
    * deterministic), all inside one expression. A NULL `groupCol` value
    * is reported as its own slice.
    *
    * Cross-engine determinism: counts are exact integers; each fold term
    * is `ln` of an exact small integer (rank) or exact integer count;
    * rank ties at the `topN` boundary are broken by the exact
    * [[TextAnalysis.polyHash]] — and tied tokens have EQUAL counts, so
    * the slope is tie-invariant anyway; 4-decimal rounds absorb ulps.
    * Slices with fewer than 2 vocabulary entries get a null slope. */
  def corpusHealth(docs: DataFrame, groupCol: String, textCol: String,
                   topN: Int = 100): DataFrame = {
    require(topN >= 2, s"topN ($topN) must be >= 2")
    val counts = docs
      .select(col(groupCol), explode(filter(
        split(TextAnalysis.normalized(col(textCol)), " "),
        c => c =!= "")).as("w"))
      .groupBy(col(groupCol), col("w")).agg(count(lit(1)).as("c"))
    healthFromCounts(counts, groupCol, topN)
  }

  /** [[corpusHealth]] over a prebuilt [[TextAnalysis.tfTable]] that
    * carried `groupCol` (build it with `carryCols = Seq(groupCol)`) —
    * the shared-intermediate form. Slice-level token counts are the sum
    * of per-document tf, so the result is value-identical to the
    * one-shot form (ProfileSpec pins it). The standalone path aggregates
    * straight to (slice, token) — one fewer grouping — so share the tf
    * table when other term-keyed operators run on the same snapshot, and
    * keep the one-shot form when health is all you need. */
  def corpusHealthFromTf(tfTable: DataFrame, groupCol: String,
                         topN: Int = 100): DataFrame = {
    require(topN >= 2, s"topN ($topN) must be >= 2")
    val counts = tfTable
      .groupBy(col(groupCol), col("term").as("w"))
      .agg(sum("tf").as("c"))
    healthFromCounts(counts, groupCol, topN)
  }

  private def healthFromCounts(counts: DataFrame, groupCol: String,
                               topN: Int): DataFrame = {
    // ONE aggregation carries the scalar stats AND the O(topN) rank heap —
    // no scalar/slope join afterwards (a join would also silently drop a
    // NULL group key; aggregation keeps it as its own slice).
    counts.groupBy(col(groupCol)).agg(
        sum("c").as("n_tokens"), count(lit(1)).as("vocab"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("hapax"),
        TopK.topK(topN, col("c"), TextAnalysis.polyHash(col("w")),
          col("c")).as("t"))
      .select(col(groupCol), col("n_tokens"), col("vocab"), col("hapax"),
        transform(col("t"), e => e.getField("payload").cast("double"))
          .as("_cs"))
      .select(col(groupCol), col("n_tokens"), col("vocab"), col("hapax"),
        col("_cs"), size(col("_cs")).as("_n"))
      .select(col(groupCol), col("n_tokens"), col("vocab"),
        round(col("vocab").cast("double") /
          col("n_tokens").cast("double"), 4).as("ttr"),
        round(col("hapax").cast("double") /
          col("vocab").cast("double"), 4).as("hapax_frac"),
        when(col("_n") >= 2, {
          def fold(f: Column => Column): Column =
            aggregate(sequence(lit(1), col("_n")), lit(0.0), (a, i) => a + f(i))
          val sx = fold(i => log(i.cast("double")))
          val sy = fold(i => log(element_at(col("_cs"), i)))
          val sxy = fold(i => log(i.cast("double")) *
            log(element_at(col("_cs"), i)))
          val sxx = fold(i => log(i.cast("double")) * log(i.cast("double")))
          val n = col("_n").cast("double")
          round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
        }).as("zipf_slope"))
  }

  /** Jensen–Shannon divergence of each slice's unigram distribution
    * against the WHOLE-corpus distribution — the distribution-shift
    * diagnostic behind data-mixing decisions (which sources drifted,
    * which new crawl slice is unlike the curated mix). Output
    * `(groupCol, jsd)`; JSD ∈ [0, ln 2], 0 = identical distribution.
    *
    * Determinism: counts are exact integers; p and q are single divisions
    * of exact integers; each term is fixed-order IEEE arithmetic; the
    * per-slice sum folds in TOKEN order; the half-sum rounds via
    * [[graft.functions.ExactRound]] at 6dp — `ln` last-ulp differences
    * accumulate ≤ vocab·ulp ≈ 1e-12, far under the rounding grain, so
    * the oracle's `list_reduce(list(term ORDER BY token))` reproduces the
    * value bit-exactly.
    *
    * Scale shape for 100 TB: ONE corpus-scale tokenize+count keyed by
    * (slice, token), lazily checkpointed — every later stage (corpus
    * counts, slice totals, the slices×vocab grid, the fold) works on
    * VOCABULARY-sized tables. Per-slice fold state is one vocab-sized
    * array; for open vocabularies beyond ~10⁶ terms, hash-bucket tokens
    * first (the [[Classifier]] trick) — JSD over the bucketed
    * distribution bounds the state at the bucket count. */
  def sliceDivergence(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    require(!docs.columns.exists(Set("_t", "_c", "_cc", "_st", "_ct", "_x")),
      "input must not contain the reserved columns _t/_c/_cc/_st/_ct/_x")
    val sliceCounts = docs
      .select(col(groupCol),
        explode(split(TextAnalysis.normalized(col(textCol)), " ")).as("_t"))
      .filter(col("_t") =!= "")
      .groupBy(groupCol, "_t").agg(count(lit(1)).as("_c"))
      .localCheckpoint(false)
    val corpusCounts = sliceCounts.groupBy("_t").agg(sum("_c").as("_cc"))
    val sliceTotals = sliceCounts.groupBy(groupCol).agg(sum("_c").as("_st"))
    val corpusTotal = corpusCounts.agg(sum("_cc").as("_ct"))
    val grid = sliceTotals.crossJoin(corpusCounts)
      .join(sliceCounts, Seq(groupCol, "_t"), "left")
      .crossJoin(broadcast(corpusTotal))
    val p = coalesce(col("_c"), lit(0L)).cast("double") / col("_st").cast("double")
    val q = col("_cc").cast("double") / col("_ct").cast("double")
    // KL terms toward the mixture's halves; p = 0 contributes only the
    // q side (0·ln0 := 0, the JSD convention)
    val term = when(coalesce(col("_c"), lit(0L)) > 0L,
        p * log(lit(2.0) * p / (p + q))).otherwise(lit(0.0)) +
      q * log(lit(2.0) * q / (p + q))
    grid.select(col(groupCol), col("_t"), term.as("_x"))
      .groupBy(groupCol)
      .agg(graft.functions.ExactRound.roundFloor(
        aggregate(
          sort_array(collect_list(struct(col("_t"), col("_x")))),
          lit(0.0), (a, s) => a + s("_x")) / lit(2.0),
        6).as("jsd"))
  }

  /** Per-document out-of-vocabulary rate against the corpus top-`k`
    * vocabulary (count desc, token asc — a total order, so the vocab set
    * is deterministic): `(idCol, n_tokens, n_oov, oov_rate)`. The classic
    * tokenizer-coverage / gibberish diagnostic: a doc whose tokens are
    * mostly outside the head vocabulary is noise, another script, or
    * encoding damage. Empty documents report 0/0/0.0, not null.
    *
    * Scale shape: vocabulary counts are one vocab-keyed aggregation; the
    * rank window runs over the VOCAB table (single-partition but
    * vocab-sized — benign, the Sampling.scala note); the top-k set
    * broadcasts into a map-side membership test; the per-doc counts are
    * the one corpus-scale aggregation. `oov_rate` is an exact
    * integer/integer division. */
  def oovRate(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    require(!docs.columns.exists(Set("_t", "_c", "_r", "_inv")),
      "input must not contain the reserved columns _t/_c/_r/_inv")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol),
        explode(split(TextAnalysis.normalized(col(textCol)), " ")).as("_t"))
      .filter(col("_t") =!= "")
    val topVocab = toks.groupBy("_t").agg(count(lit(1)).as("_c"))
      .withColumn("_r", row_number().over(
        Window.orderBy(col("_c").desc, col("_t"))))
      .filter(col("_r") <= k)
      .select("_t")
    val perDoc = toks
      .join(broadcast(topVocab.withColumn("_inv", lit(1))), Seq("_t"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_inv").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0L,
          coalesce(col("n_oov"), lit(0L)).cast("double") /
            coalesce(col("n_tokens"), lit(0L)).cast("double"))
          .otherwise(lit(0.0)).as("oov_rate"))
  }

  /** Distinct-n corpus diversity per group — the distinct-1/2/…
    * generation-diversity metric of Li et al., "A Diversity-Promoting
    * Objective Function for Neural Conversation Models" (NAACL 2016),
    * applied corpus-side: a slice whose ratios collapse is template/
    * boilerplate-heavy (the corpus-level complement of the per-document
    * [[Scrub.repetitionSignals]]). Returns one row per (group, n):
    * `(groupCol, n, distinct_ngrams, total_ngrams, distinct_ratio)` for
    * n = 1..`maxN`, with grams from [[Scrub.wordNgrams]]' single-space
    * tokenization. Groups whose documents are all shorter than n tokens
    * emit `(0, 0, 0.0)` rather than vanishing.
    *
    * Counts are exact integers; the ratio is one integer/integer double
    * division — bit-exact cross-engine.
    *
    * Scale shape: one explode pass per corpus (all n sizes in one plan —
    * the token array is built once per row and shared), then ONE
    * (group, n, gram)-keyed partial-dedup aggregation followed by a
    * (group, n)-keyed count — both map-side combinable; the intermediate
    * is bounded by distinct gram TYPES per group, not corpus tokens. At
    * the 100 TB tail where even gram types strain the shuffle, the KMV
    * estimate over the same grams ([[SetSketch.kmvPerGroup]]) is the
    * drop-in approximation; this operator stays the exact/auditable
    * path. */
  def distinctNgramDiversity(docs: DataFrame, groupCol: String,
                             textCol: String, maxN: Int = 3): DataFrame = {
    require(maxN >= 1, s"maxN ($maxN) must be >= 1")
    require(!docs.columns.exists(Set("_n", "_g", "n")),
      "input must not contain the reserved columns _n/_g/n")
    val grams = docs.select(col(groupCol),
        explode(array((1 to maxN).map(n =>
          struct(lit(n).as("_n"),
            Scrub.wordNgrams(col(textCol), n).as("_g"))): _*)).as("_e"))
      .select(col(groupCol), col("_e._n").as("n"), explode(col("_e._g")).as("_g"))
      .groupBy(col(groupCol), col("n"))
      .agg(countDistinct(col("_g")).as("distinct_ngrams"),
        count(lit(1)).as("total_ngrams"))
    // restore (group, n) cells with no grams at all (every doc shorter
    // than n): the group spine × n sizes, left-joined
    docs.select(col(groupCol)).distinct()
      .crossJoin(broadcast(
        docs.sparkSession.range(1, maxN + 1).select(col("id").cast("int").as("n"))))
      .join(grams, Seq(groupCol, "n"), "left")
      .select(col(groupCol), col("n"),
        coalesce(col("distinct_ngrams"), lit(0L)).as("distinct_ngrams"),
        coalesce(col("total_ngrams"), lit(0L)).as("total_ngrams"),
        when(coalesce(col("total_ngrams"), lit(0L)) > 0L,
          coalesce(col("distinct_ngrams"), lit(0L)).cast("double") /
            coalesce(col("total_ngrams"), lit(0L)).cast("double"))
          .otherwise(lit(0.0)).as("distinct_ratio"))
  }

  /** Vocabulary-tail profile per group: the classic "how much haven't we
    * seen" diagnostics off one token-count table —
    *   - `hapax` / `dis`: tokens occurring exactly once / twice;
    *   - `hapax_frac = hapax/vocab`: a high value means the slice is
    *     still discovering its vocabulary (or is full of noise/IDs);
    *   - `gt_unseen = hapax/n_tokens`: the Good–Turing estimate (Good,
    *     Biometrika 1953) of the probability mass of UNSEEN types — the
    *     principled "is this corpus big enough" number;
    *   - `simpson = Σc(c−1)/(N(N−1))`: the probability two random tokens
    *     are the same type (Simpson, Nature 1948) — repetition
    *     concentration, the inverse lens of [[distinctNgramDiversity]].
    * All numerators/denominators are exact integers; each output is one
    * double division (groups with N < 2 report null simpson; empty
    * groups cannot occur — a group exists only via its tokens).
    *
    * Scale shape: ONE corpus tokenize+count keyed by (group, token),
    * then a vocabulary-sized aggregation. No window, no sort. */
  def vocabTail(docs: DataFrame, groupCol: String,
                textCol: String): DataFrame = {
    require(!docs.columns.exists(Set("_t", "_c")),
      "input must not contain the reserved columns _t/_c")
    val counts = docs
      .select(col(groupCol),
        explode(split(TextAnalysis.normalized(col(textCol)), " ")).as("_t"))
      .filter(col("_t") =!= "")
      .groupBy(groupCol, "_t").agg(count(lit(1)).as("_c"))
    counts.groupBy(groupCol)
      .agg(sum(col("_c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("_c") === 1L, 1L).otherwise(0L)).as("hapax"),
        sum(when(col("_c") === 2L, 1L).otherwise(0L)).as("dis"),
        // decimal(38,0) products: a single token type's count can reach
        // ~1e14 at 100 TB, so c·(c−1) (and n_tokens·(n_tokens−1) below)
        // would wrap Long silently in non-ANSI mode
        sum(col("_c").cast("decimal(19,0)") *
          (col("_c") - 1L).cast("decimal(19,0)")).as("_rep2"))
      .select(col(groupCol), col("n_tokens"), col("vocab"), col("hapax"),
        col("dis"),
        (col("hapax").cast("double") / col("vocab").cast("double"))
          .as("hapax_frac"),
        (col("hapax").cast("double") / col("n_tokens").cast("double"))
          .as("gt_unseen"),
        when(col("n_tokens") >= 2L,
          col("_rep2").cast("double") /
            (col("n_tokens").cast("decimal(19,0)") *
              (col("n_tokens") - 1L).cast("decimal(19,0)")).cast("double"))
          .as("simpson"))
  }

  /** Gini coefficient of weight concentration across groups — the
    * one-number governance answer to "how much of the corpus sits in how
    * few sources/domains/languages". Computed from the sorted exact form
    * `G = Σᵢ (2i − n − 1)·xᵢ / (n·Σx)` with groups ascending by
    * (weight, name): every term is INTEGER arithmetic; the only double is
    * the final division — bit-exact cross-engine, no rounding. G = 0 is
    * perfectly even mass, → 1 is full concentration in one group. A
    * zero-total corpus reports 0.0.
    *
    * Scale shape: one corpus aggregation to group sizes, then windows
    * over the GROUP table only (the [[unimaxQuotas]] vocabulary-sized
    * pattern). Output is a single row `(n_groups, total_weight, gini)`. */
  def giniConcentration(df: DataFrame, groupCol: String,
                        weightCol: String): DataFrame = {
    require(!df.columns.exists(Set("_x", "_i", "_n", "_tot", "_num")),
      "input must not contain the reserved columns _x/_i/_n/_tot/_num")
    import org.apache.spark.sql.expressions.Window
    val ord = Window.orderBy(col("_x"), col(groupCol))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing).orderBy(col("_x"), col(groupCol))
    df.groupBy(groupCol).agg(sum(col(weightCol)).cast("long").as("_x"))
      .withColumn("_i", row_number().over(ord).cast("long"))
      .withColumn("_n", count(lit(1)).over(all))
      .withColumn("_tot", sum(col("_x")).over(all))
      // products in decimal(38,0): (2i−n−1)·x and n·Σx silently wrap Long
      // at the 100 TB operating point (~1e14 char mass × ≥1e5 groups >
      // 2⁶³) — decimal(19,0) operands make every long×long product exact
      // (≤ ~8.5e37 < 10³⁸), matching the oracle's HUGEINT path
      .withColumn("_num",
        (lit(2L) * col("_i") - col("_n") - lit(1L)).cast("decimal(19,0)") *
          col("_x").cast("decimal(19,0)"))
      .agg(max(col("_n")).as("n_groups"),
        max(col("_tot")).as("total_weight"),
        when(max(col("_tot")) > 0L,
          sum(col("_num")).cast("double") /
            (max(col("_n")).cast("decimal(19,0)") *
              max(col("_tot")).cast("decimal(19,0)")).cast("double"))
          .otherwise(lit(0.0)).as("gini"))
  }

  /** Heaps'-law vocabulary-growth curve per group: for each checkpoint
    * `n` (a doc-count prefix in ascending `idCol` order), the cumulative
    * token count and distinct-vocabulary size of the group's first `n`
    * documents — the measured `V(T)` curve whose log-log slope is Heaps'
    * β. Diagnostic use: a slice whose vocabulary saturates early is
    * template mass; one growing linearly is noise/IDs — the prefix-wise
    * complement of [[zipfSlope]]'s static fit. Checkpoints beyond a
    * group's document count are dropped (the prefix would repeat the
    * whole-group totals).
    *
    * All outputs are exact integers — no rounding anywhere.
    *
    * Scale shape: ONE per-group rank window over the document stream
    * (inherent — "first n documents" is a per-group total order, like any
    * sessionize), then a vocabulary-keyed min-rank aggregation; both
    * checkpoint joins broadcast the groups×checkpoints spine, and the
    * prefix filters feed map-side combinable aggregations. Output is
    * groups × checkpoints rows. */
  def heapsLaw(docs: DataFrame, groupCol: String, idCol: String,
               textCol: String, checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty, "at least one checkpoint is required")
    require(checkpoints.forall(_ >= 1), s"checkpoints must be >= 1: $checkpoints")
    require(checkpoints.distinct.size == checkpoints.size,
      s"duplicate checkpoints: $checkpoints")
    require(!docs.columns.exists(Set("_tk", "_rank", "_ntok", "_t", "_fr",
      "_gn", "checkpoint")),
      "input must not contain the reserved columns _tk/_rank/_ntok/_t/_fr/_gn/checkpoint")
    import org.apache.spark.sql.expressions.Window
    val wr = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    val ranked = docs
      .select(col(groupCol), col(idCol),
        filter(split(TextAnalysis.normalized(col(textCol)), " "),
          t => t =!= "").as("_tk"))
      .withColumn("_rank", row_number().over(wr).cast("long"))
      .withColumn("_ntok", size(col("_tk")).cast("long"))
      .localCheckpoint(false)
    val spine = ranked.groupBy(groupCol).agg(max("_rank").as("_gn"))
      .select(col(groupCol), col("_gn"),
        explode(array(checkpoints.sorted.map(c => lit(c)): _*))
          .as("checkpoint"))
      .filter(col("checkpoint") <= col("_gn"))
      .select(col(groupCol), col("checkpoint"))
    val tokCum = ranked.select(col(groupCol), col("_rank"), col("_ntok"))
      .join(broadcast(spine), Seq(groupCol))
      .filter(col("_rank") <= col("checkpoint"))
      .groupBy(groupCol, "checkpoint").agg(sum("_ntok").as("n_tokens"))
    val firstRank = ranked
      .select(col(groupCol), col("_rank"), explode(col("_tk")).as("_t"))
      .groupBy(groupCol, "_t").agg(min("_rank").as("_fr"))
    val vocab = firstRank.join(broadcast(spine), Seq(groupCol))
      .filter(col("_fr") <= col("checkpoint"))
      .groupBy(groupCol, "checkpoint").agg(count(lit(1)).as("vocab"))
    spine
      .join(tokCum, Seq(groupCol, "checkpoint"), "left")
      .join(vocab, Seq(groupCol, "checkpoint"), "left")
      .select(col(groupCol), col("checkpoint"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("vocab"), lit(0L)).as("vocab"))
  }

  /** Zipf rank-frequency slope per group: least-squares fit of
    * `ln(count)` on `ln(rank)` over the top-`topK` tokens of each slice
    * (rank by count desc, token asc — a total order). Natural text sits
    * near slope −1 (Zipf's law); a much flatter slope flags synthetic /
    * template corpora, a much steeper one a collapsed vocabulary — the
    * corpus-level complement of [[distinctNgramDiversity]].
    *
    * Returns `(groupCol, n_ranks, slope, intercept)`; both fit values
    * round via [[graft.functions.ExactRound]] at 6dp (the `ln` last-ulp
    * argument of [[sliceDivergence]]: ≤ topK terms of magnitude ≤ ~15, so
    * accumulated ulps sit far under the grain). Groups with fewer than 2
    * ranked tokens have a zero denominator and report null slope/
    * intercept. Sums fold in RANK order (fixed-order IEEE), so the
    * oracle's `list_reduce(list(… ORDER BY rank))` replays bit-exactly.
    *
    * Scale shape: ONE corpus-scale (group, token) count (map-side
    * combinable); the rank window runs per group over the VOCAB-sized
    * count table; everything after the `rank <= topK` cut is
    * groups×topK rows. */
  def zipfSlope(docs: DataFrame, groupCol: String, textCol: String,
                topK: Int = 100): DataFrame = {
    require(topK >= 2, s"topK ($topK) must be >= 2")
    require(!docs.columns.exists(Set("_t", "_c", "_r", "_x", "_y")),
      "input must not contain the reserved columns _t/_c/_r/_x/_y")
    import org.apache.spark.sql.expressions.Window
    val ranked = docs
      .select(col(groupCol),
        explode(split(TextAnalysis.normalized(col(textCol)), " ")).as("_t"))
      .filter(col("_t") =!= "")
      .groupBy(groupCol, "_t").agg(count(lit(1)).as("_c"))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("_c").desc, col("_t"))))
      .filter(col("_r") <= topK)
      .select(col(groupCol), col("_r").cast("long").as("_r"),
        log(col("_r").cast("double")).as("_x"),
        log(col("_c").cast("double")).as("_y"))
    // four independent fixed-order folds over the same rank-sorted list;
    // each is a sequential IEEE sum the oracle replays term-for-term
    val pts = ranked.groupBy(groupCol)
      .agg(count(lit(1)).cast("long").as("n_ranks"),
        sort_array(collect_list(struct(col("_r"), col("_x"), col("_y"))))
          .as("_pts"))
    def fold(f: Column => Column): Column =
      aggregate(col("_pts"), lit(0.0), (a, s) => a + f(s))
    val nD = col("n_ranks").cast("double")
    val sx = fold(_("_x"))
    val sy = fold(_("_y"))
    val sxy = fold(s => s("_x") * s("_y"))
    val sxx = fold(s => s("_x") * s("_x"))
    val slopeRaw = (nD * sxy - sx * sy) / (nD * sxx - sx * sx)
    pts.select(col(groupCol), col("n_ranks"),
        when(nD * sxx - sx * sx =!= lit(0.0),
          graft.functions.ExactRound.roundFloor(slopeRaw, 6))
          .as("slope"),
        when(nD * sxx - sx * sx =!= lit(0.0),
          graft.functions.ExactRound.roundFloor(
            (sy - slopeRaw * sx) / nD, 6)).as("intercept"))
  }

  /** Pareto / ABC concentration classes: keys ranked by value mass, the
    * running cumulative share cut at the classic 80% (A) and 95% (B)
    * boundaries, C the tail. "How many sources carry 80% of the corpus"
    * as one table: per class, the key count, value mass and exact share.
    *
    * Class boundaries compare EXACT INTEGERS — values accumulate in
    * micro-units and `cum/total <= 4/5` is tested as `cum·5 <= total·4`
    * (decimal products), so no double ever decides a boundary; the only
    * doubles are the reported mass/share. The micro-unit cast is
    * decimal(18,6): the contract requires at most 6 decimal places and
    * |value| < 10¹² (the [[graft.operators.Trend.trendFit]] y-contract) —
    * ANSI mode rejects a wider value loudly; non-ANSI nulls it, dropping
    * its mass from every class. The first-ranked key belongs to
    * class A even when it alone exceeds 80% (inclusive-cumulative rule,
    * stated so the boundary case is defined, not accidental).
    *
    * Scale shape: per-key totals in one map-side-combined shuffle; the
    * rank/cumulative windows run over KEYS (vocabulary-sized), and the
    * output is three rows. */
  def paretoClasses(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val vi = (col(valueCol).cast("decimal(18,6)") * lit(1000000L))
      .cast("decimal(19,0)")
    val totals = df.filter(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol).as("_k")).agg(sum(vi).as("_v"))
    val w = Window.orderBy(col("_v").desc, col("_k"))
    val all = Window.partitionBy()
    val classed = totals
      .withColumn("_cum", sum(col("_v")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_tot", sum(col("_v")).over(all))
      .withColumn("_rn", row_number().over(w))
      .withColumn("abc_class",
        when(col("_rn") === 1 || col("_cum") * 5 <= col("_tot") * 4, "A")
          .when(col("_cum") * 20 <= col("_tot") * 19, "B")
          .otherwise("C"))
    classed.groupBy("abc_class")
      .agg(count(lit(1)).as("n_keys"),
        (sum(col("_v")).cast("double") / lit(1.0e6)).as("total_value"),
        (sum(col("_v")).cast("double") / max(col("_tot")).cast("double"))
          .as("share"))
  }

  /** Pearson χ² test of independence between two LOW-CARDINALITY
    * categorical columns, plus Cramér's V effect size — the "are these
    * two dimensions associated" screen of exploratory profiling (the
    * general-contingency sibling of
    * [[graft.operators.Experiment.srmCheck]]'s goodness-of-fit χ²).
    *
    * Every zero-observation cell of the FULL |A|×|B| grid still
    * contributes its expected mass to χ² (term = E there) — dropping
    * empty cells is the classic wrong implementation. NULL category
    * values are excluded (a null is "absent", not a level). Expected
    * counts `E = R·C/N` come from the exact integer marginals via ONE
    * correctly-rounded decimal(38,0)→double conversion (valid for
    * N < 10⁹ rows per test — beyond that R·C² products leave the exact
    * range), and χ² folds its |A|·|B| per-cell doubles in (a, b) sorted
    * order — the [[graft.operators.Audit.benfordDigits]] fixed-order
    * fold, so replays are bit-identical. `cramers_v =
    * √(χ²/(N·min(r−1, c−1)))`, 0.0 for a degenerate 1×c / r×1 table.
    *
    * Output: one row per grid cell `(val_a, val_b, n_obs, expected)`
    * with the scalar verdict `(chi2_total, dof, cramers_v)` repeated
    * per row (the per-digit convention of [[Audit.benfordDigits]]).
    *
    * Scale shape: the table collapses to |A|·|B| cell counts in ONE
    * map-side-combined aggregation; marginals, the grid spine
    * (key-sized cross join), and the sorted fold are all
    * vocabulary-sized — a 100 TB fact tests at the cost of one scan. */
  def chiSquareIndependence(df: DataFrame, aCol: String,
                            bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_o"))
      .localCheckpoint(false) // cell-count sized; marginals + grid read it
    val rowT = cells.groupBy("_a").agg(sum(col("_o")).as("_ra"))
    val colT = cells.groupBy("_b").agg(sum(col("_o")).as("_cb"))
    val nDims = rowT.agg(sum(col("_ra")).as("_n"), count(lit(1)).as("_r"))
      .crossJoin(broadcast(colT.agg(count(lit(1)).as("_c"))))
    val grid = rowT.crossJoin(colT)
      .join(cells, Seq("_a", "_b"), "left")
      .crossJoin(broadcast(nDims))
      .select(col("_a"), col("_b"),
        coalesce(col("_o"), lit(0L)).as("n_obs"),
        ((col("_ra").cast("decimal(19,0)") * col("_cb").cast("decimal(19,0)"))
          .cast("double") / col("_n").cast("double")).as("expected"),
        col("_n"), col("_r"), col("_c"))
      .localCheckpoint(false) // grid-sized; per-cell output + fold read it
    val verdict = grid
      .agg(first(col("_n")).as("_n"), first(col("_r")).as("_r"),
        first(col("_c")).as("_c"),
        sort_array(collect_list(struct(col("_a"), col("_b"), col("n_obs"),
          col("expected")))).as("_cells"))
      .select(col("_n"), col("_r"), col("_c"),
        aggregate(col("_cells"), lit(0.0), (acc, t) =>
          acc + (t("n_obs").cast("double") - t("expected")) *
            (t("n_obs").cast("double") - t("expected")) / t("expected"))
          .as("chi2_total"))
      .select(col("_n"), col("chi2_total"),
        ((col("_r") - 1) * (col("_c") - 1)).as("dof"),
        least(col("_r") - 1, col("_c") - 1).as("_mindim"))
      .select(col("chi2_total"), col("dof"),
        when(col("dof") === 0L, lit(0.0))
          .otherwise(sqrt(col("chi2_total") /
            (col("_n").cast("double") * col("_mindim").cast("double"))))
          .as("cramers_v"))
    grid.select(col("_a").as("val_a"), col("_b").as("val_b"),
        col("n_obs"), col("expected"))
      .crossJoin(broadcast(verdict))
  }

  /** Pairwise Pearson correlation matrix over numeric columns — the
    * collinearity screen run before feature selection. One row per
    * unordered column pair `(col_a, col_b, n_pairs, corr)`, where
    * `n_pairs` counts rows with BOTH values present (pairwise
    * deletion — each pair uses its own complete rows, the standard
    * matrix convention).
    *
    * Determinism is [[Trend.trendFit]]'s contract: values ride the
    * exact decimal(18,6) micro-unit lane (≤ 6 decimal places,
    * |v| < 10¹²; Σv² bounds as documented there), the five sufficient
    * sums per pair accumulate exactly in decimal(38,0), and the closed
    * form combines correctly-rounded doubles in fixed order — null
    * (never NaN) when either column is constant on the pair's rows.
    *
    * Scale shape: ALL k·(k−1)/2 pairs' sums compute in ONE aggregation
    * over ONE scan ([[numericProfile]]'s one-pass discipline — k²
    * separate jobs would read a 100 TB table k² times); the result is
    * a single wide row exploded to pair rows, constant-sized. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size, "columns must be distinct")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def mi(c: String): Column =
      (col(c).cast("decimal(18,6)") * lit(1000000L)).cast("decimal(38,0)")
    val aggExprs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      val both = col(a).isNotNull && col(b).isNotNull
      val x = when(both, mi(a))
      val y = when(both, mi(b))
      Seq(count(when(both, lit(1))).as(s"_n$i"),
        sum(x).as(s"_sx$i"), sum(y).as(s"_sy$i"),
        sum(x * x).as(s"_sxx$i"), sum(y * y).as(s"_syy$i"),
        sum(x * y).as(s"_sxy$i"))
    }
    val wide = df.agg(aggExprs.head, aggExprs.tail: _*)
    val rows = pairs.zipWithIndex.map { case ((a, b), i) =>
      def dbl(p: String): Column = col(s"$p$i").cast("double")
      val nD = dbl("_n")
      val sx = dbl("_sx") / lit(1.0e6)
      val sy = dbl("_sy") / lit(1.0e6)
      val sxx = dbl("_sxx") / lit(1.0e12)
      val syy = dbl("_syy") / lit(1.0e12)
      val sxy = dbl("_sxy") / lit(1.0e12)
      val num = nD * sxy - sx * sy
      val denX = nD * sxx - sx * sx
      val denY = nD * syy - sy * sy
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"_n$i").as("n_pairs"),
        when(col(s"_n$i") === 0L || denX === 0.0 || denY === 0.0, lit(null))
          .otherwise(num / (sqrt(denX) * sqrt(denY))).as("corr"))
    }
    wide.select(explode(array(rows: _*)).as("_p")).select(col("_p.*"))
  }

  /** Mutual information between two LOW-CARDINALITY categorical columns
    * plus marginal entropies and the normalized MI — the information-
    * theoretic association screen (feature selection's model-free
    * cousin of [[chiSquareIndependence]]; Cover & Thomas ch. 2):
    * `MI = Σ_ab p(a,b)·ln(p(a,b)/(p(a)p(b)))`, `H = −Σ p·ln p`,
    * `NMI = MI/√(H(A)·H(B))` (null when either marginal is
    * deterministic — zero entropy admits no normalization). Natural
    * log; zero-count cells contribute exactly 0 and are skipped (the
    * 0·ln 0 limit — unlike χ², where empty cells still carry expected
    * mass). NULL category values are excluded.
    *
    * Determinism: counts are exact integers; each term's `ln` runs on
    * correctly-rounded doubles and the three folds run in sorted
    * (a, b) / a / b order; MI and the entropies are rounded at 6
    * decimals via [[graft.functions.ExactRound.roundFloor]] (the
    * engine-portable pure-IEEE seam over libm) before NMI combines
    * them. MI is clamped at ≥ 0 after
    * rounding (the true value is; accumulated ulps may dip below).
    *
    * Scale shape: ONE map-side-combined aggregation to |A|·|B| cell
    * counts; marginals and all three folds are vocabulary-sized.
    * Output is one row: `(n, n_cells, mi, h_a, h_b, nmi)`. */
  def mutualInformation(df: DataFrame, aCol: String,
                        bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_o"))
      .localCheckpoint(false) // joint fold + both marginals read it
    val rowT = cells.groupBy("_a").agg(sum(col("_o")).as("_ra"))
    val colT = cells.groupBy("_b").agg(sum(col("_o")).as("_cb"))
    val n = cells.agg(coalesce(sum(col("_o")), lit(0L)).as("_n"))
    val jointArr = cells
      .join(rowT, Seq("_a")).join(colT, Seq("_b"))
      .agg(count(lit(1)).as("n_cells"),
        sort_array(collect_list(struct(col("_a"), col("_b"), col("_o"),
          col("_ra"), col("_cb")))).as("_cells"))
    val haArr = rowT
      .agg(sort_array(collect_list(struct(col("_a"), col("_ra")))).as("_ma"))
    val hbArr = colT
      .agg(sort_array(collect_list(struct(col("_b"), col("_cb")))).as("_mb"))
    val nD = col("_n").cast("double")
    val miRaw = aggregate(col("_cells"), lit(0.0), (acc, s) => {
      val pab = s("_o").cast("double") / nD
      val pa = s("_ra").cast("double") / nD
      val pb = s("_cb").cast("double") / nD
      acc + pab * log(pab / (pa * pb))
    })
    def entropy(arr: Column, cnt: String): Column =
      graft.functions.ExactRound.roundFloor(-aggregate(arr, lit(0.0),
        (acc, s) => {
          val p = s(cnt).cast("double") / nD
          acc + p * log(p)
        }), 6)
    n.crossJoin(broadcast(jointArr))
      .crossJoin(broadcast(haArr)).crossJoin(broadcast(hbArr))
      .select(col("_n").as("n"), col("n_cells"),
        greatest(graft.functions.ExactRound.roundFloor(miRaw, 6),
          lit(0.0)).as("mi"),
        entropy(col("_ma"), "_ra").as("h_a"),
        entropy(col("_mb"), "_cb").as("h_b"))
      .withColumn("nmi",
        when(col("h_a") === 0.0 || col("h_b") === 0.0, lit(null))
          .otherwise(col("mi") / sqrt(col("h_a") * col("h_b"))))
  }

  /** Population Stability Index per group — the scorecard-monitoring
    * drift metric (credit-risk folklore; the symmetrized KL over binned
    * distributions): `PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref)`
    * between a reference and a current sample of `valueCol`. The
    * conventional reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25
    * shifted. Completes the drift family: KS (q147) is the worst single
    * CDF gap, W₁ (q153) the area between CDFs, JSD (q120) the bounded
    * token-distribution divergence — PSI is the binned industry
    * scorecard standard.
    *
    * Binning is `nBins` equal-width bins over `[loMicro, hiMicro)` in
    * exact integer micro-units (decimal(18,6) lane; |value| ≤ 10⁹ keeps
    * `offset·nBins` inside a long for nBins ≤ 1000); out-of-range
    * values clamp into the edge bins, so the bins partition the whole
    * line. Empty bins are Laplace-smoothed — each bin count +1, each
    * total +nBins (stated; the alternative ε conventions change the
    * value, silently skipping empty bins changes the METRIC). `refCol`
    * is a boolean: true rows are the reference sample.
    *
    * Determinism: counts exact; each p is one double division of exact
    * integers; terms fold in bin order; the sum rounds through
    * [[graft.functions.ExactRound.roundFloor]] at 6.
    *
    * Scale shape: ONE map-side-combined aggregation to (group, bin)
    * ref/cur counts; the spine join and fold are nBins-sized. Output:
    * one row per group `(…, n_ref, n_cur, psi)`. */
  def psiDrift(df: DataFrame, groupCols: Seq[String], refCol: String,
               valueCol: String, nBins: Int = 10,
               loMicro: Long = -1000000000L,
               hiMicro: Long = 1000000000L): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    require(nBins >= 2 && nBins <= 1000, s"nBins ($nBins) must be in [2, 1000]")
    require(hiMicro > loMicro, s"range [$loMicro, $hiMicro) is empty")
    val v6 = (col(valueCol).cast("decimal(18,6)") * lit(1000000L)).cast("long")
    val off = greatest(v6 - lit(loMicro), lit(0L))
    val bin = least(expr(s"(${"_off"} * $nBins) div ${hiMicro - loMicro}"),
      lit(nBins - 1L))
    val counts = df
      .filter(col(valueCol).isNotNull && col(refCol).isNotNull)
      .select(groupCols.map(col) :+ off.as("_off") :+ col(refCol).as("_ref"): _*)
      .select(groupCols.map(col) :+ bin.as("_b") :+ col("_ref"): _*)
      .groupBy(groupCols.map(col) :+ col("_b"): _*)
      .agg(sum(when(col("_ref"), 1L).otherwise(0L)).as("_cr"),
        sum(when(!col("_ref"), 1L).otherwise(0L)).as("_cc"))
      .localCheckpoint(false) // totals + spine both read it
    val spine = counts.select(groupCols.map(col): _*).distinct()
      .withColumn("_b", explode(array((0 until nBins).map(i => lit(i.toLong)): _*)))
    val grid = spine.join(counts, groupCols :+ "_b", "left")
      .select(groupCols.map(col) ++ Seq(col("_b"),
        coalesce(col("_cr"), lit(0L)).as("_cr"),
        coalesce(col("_cc"), lit(0L)).as("_cc")): _*)
    val folded = grid.groupBy(groupCols.map(col): _*)
      .agg(sum(col("_cr")).as("n_ref"), sum(col("_cc")).as("n_cur"),
        sort_array(collect_list(struct(col("_b"), col("_cr"), col("_cc"))))
          .as("_bins"))
    val nRefS = (col("n_ref") + lit(nBins.toLong)).cast("double")
    val nCurS = (col("n_cur") + lit(nBins.toLong)).cast("double")
    folded.select(groupCols.map(col) ++ Seq(col("n_ref"), col("n_cur"),
      graft.functions.ExactRound.roundFloor(
        aggregate(col("_bins"), lit(0.0), (acc, s) => {
          val pr = (s("_cr") + 1L).cast("double") / nRefS
          val pc = (s("_cc") + 1L).cast("double") / nCurS
          acc + (pc - pr) * log(pc / pr)
        }), 6).as("psi")): _*)
  }
}
