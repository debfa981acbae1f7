package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Sketches, TopK, VecDot, VectorFunctions}
import graft.operators.{AsOf, Audit, BloomJoin, Bpe, Chunk, Classifier, Coreset, Dedup, DupClusters, Experiment, Features, Graph, Importance, IncrementalDedup, Intervals, IvfIndex, Keywords, LanguageModel, Layout, Linkage, Multimodal, Novelty, Pack, Phrases, Pq, Preference, Profile, Quantiles, RangeJoin, Ranks, Resample, Retention, Retrieval, Rfm, Sampling, Scd, Scrub, Sessionize, SetSketch, Similarity, SkewJoin, Snapshot, Spatial, TextAnalysis, Trend, Unigram, WordPiece}
import graft.sources.Tables


/** Mechanically split from SparkEntry (round 16, verdict item 8): the
  * single 12.8k-line file was the incremental-compile bottleneck — every
  * query edit recompiled the whole registry. Entries are UNCHANGED and
  * byte-identical to their pre-split form; [[SparkEntry]] composes the
  * parts. New entries go in the LAST part (or a new part when it grows
  * past ~100 entries). */
private[graft] trait QueriesPart4 { this: SparkEntry.type =>
  protected def queriesPart4: Map[String, (SparkSession, String) => DataFrame] = Map(
    // k-core decomposition with a CLOSED-FORM planted truth: per even
    // customer key a K6 clique with a pendant 2-chain (the chain peels
    // layer by layer — the cascade, not one pass), per odd key a 5-leaf
    // star (dissolves entirely at k=3). The oracle states the surviving
    // core directly: exactly the clique members, each at in-core
    // degree 5 — any under- or over-peeling breaks the match.
    "q185_kcore" -> ((s, dir) => {
      val ck = Tables(s, dir).customer.select(col("c_custkey").as("b"))
      val cliquePairs = (for {
        i <- 0 until 6; j <- (i + 1) until 6
      } yield (i, j)) ++ Seq((0, 6), (6, 7))
      val even = ck.filter(col("b") % 2 === 0)
        .select(col("b"), explode(array(cliquePairs.map { case (i, j) =>
          struct(lit(i).as("i"), lit(j).as("j"))
        }: _*)).as("p"))
        .select((col("b") * 100 + col("p.i")).as("ea"),
          (col("b") * 100 + col("p.j")).as("eb"))
      val odd = ck.filter(col("b") % 2 === 1)
        .select(col("b"), explode(array((1 to 5).map(lit(_)): _*)).as("j"))
        .select((col("b") * 100).as("ea"), (col("b") * 100 + col("j")).as("eb"))
      Graph.kCore(even.unionByName(odd), "ea", "eb", k = 3).orderBy("node")
    }),
    // Seasonal baseline: per (event_type, hour-of-day) exact mean and
    // population stddev of value — the "what is normal at 9am" table.
    "q184_seasonal_profile" -> ((s, dir) => {
      val d = Tables(s, dir).events.withColumn("_hour", hour(col("ts")))
      Trend.seasonalProfile(d, Seq("event_type"), "_hour", "value")
        .withColumnRenamed("_hour", "hour_of_day")
        .orderBy("event_type", "hour_of_day")
    }),
    // Gaps-and-islands: per-user longest consecutive-day activity streak
    // (island key = day − row_number, O(1) window state; deterministic
    // latest-streak tie pick).
    "q168_activity_streaks" -> ((s, dir) => {
      Retention.activityStreaks(Tables(s, dir).events, "user_id", "ts",
          periodDays = 1)
        .orderBy("user_id")
    }),
    // Pareto/ABC: users classified by cumulative share of event value
    // mass — exact integer boundary tests (cum·5 ≤ tot·4), doubles only
    // in the reported mass/share.
    "q169_pareto_abc" -> ((s, dir) => {
      Profile.paretoClasses(Tables(s, dir).events, "user_id", "value")
        .orderBy("abc_class")
    }),
    // Record linkage: md5-synthesized person records (phone/first/last)
    // plus a perturbed copy of each differing in EXACTLY one field — the
    // union of three blocking keys still pairs every copy with its
    // original through the two agreeing fields; weighted field-agreement
    // scores, match threshold 0.5.
    "q167_record_linkage" -> ((s, dir) => {
      val ck = Tables(s, dir).customer.select(col("c_custkey").as("k"))
      def h(tag: String, n: Int) =
        substring(md5(concat(col("k").cast("string"), lit(s":$tag"))), 1, n)
      val base = ck.select(col("k").as("id"), h("p", 10).as("phone"),
        h("f", 8).as("first"), h("l", 8).as("last"))
      val pert = ck.select((col("k") + 1000000L).as("id"),
        when(col("k") % 3 === 0, h("p2", 10)).otherwise(h("p", 10)).as("phone"),
        when(col("k") % 3 === 1, concat(h("f", 8), lit("x")))
          .otherwise(h("f", 8)).as("first"),
        when(col("k") % 3 === 2, h("l2", 8)).otherwise(h("l", 8)).as("last"))
      val records = base.unionByName(pert).localCheckpoint(false)
      val pairs = Linkage.blockedPairs(records, "id",
        Seq("phone", "first", "last"), maxBucket = 64)
      Linkage.scoreFieldAgreement(pairs, records, "id",
          Seq(("phone", 0.5), ("first", 0.3), ("last", 0.2)))
        .filter(col("score") >= 0.5)
        .orderBy("id_a", "id_b")
    }),
    // Last-touch attribution: purchases credited to the latest preceding
    // view/click/signup in the user's stream; orphan conversions surface
    // as "(none)"; revenue summed in exact decimals.
    "q166_last_touch" -> ((s, dir) => {
      Sessionize.lastTouchAttribution(Tables(s, dir).events, "user_id", "ts",
          "event_type", "value", "purchase", Seq("view", "click", "signup"),
          tieBreak = Seq("event_id"))
        .orderBy("touch_type")
    }),
    // SCD2 dimension history: customer snapshot at eff 0, a segment-change
    // batch at eff 10 (plus a no-op re-assert batch that must compress
    // away), a balance-change batch at eff 20 carrying forward the
    // segment state — intervals and currency flags rebuilt by the
    // operator, replayed move-for-move by the oracle.
    "q165_scd2_history" -> ((s, dir) => {
      val c = Tables(s, dir).customer
      val hist = c.select(col("c_custkey").as("k"),
        col("c_mktsegment").as("segment"), col("c_acctbal").as("balance"),
        lit(0L).as("eff"))
      val u1 = c.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("k"), lit("SEGMENT_X").as("segment"),
          col("c_acctbal").as("balance"), lit(10L).as("eff"))
      val u1b = c.filter(col("c_custkey") % 7 === 0 && col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("segment"),
          col("c_acctbal").as("balance"), lit(10L).as("eff"))
      val u2 = c.filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey").as("k"),
          when(col("c_custkey") % 3 === 0, lit("SEGMENT_X"))
            .otherwise(col("c_mktsegment")).as("segment"),
          (col("c_acctbal") + lit(100.0)).as("balance"), lit(20L).as("eff"))
      Scd.scd2Apply(hist, u1.unionByName(u1b).unionByName(u2),
          Seq("k"), Seq("segment", "balance"), "eff")
        .orderBy("k", "eff")
    }),
    // Market-basket association over 30-minute sessions: distinct types
    // per session are the basket; support/confidence/lift from exact
    // integer counts (basket-size-squared pair fanout, type-vocabulary
    // sized results).
    "q164_basket_lift" -> ((s, dir) => {
      val items = Sessionize.assignSessions(Tables(s, dir).events,
          "user_id", "ts", 30, Seq("event_id"))
        .select(col("user_id"), col("session_id"), col("event_type"))
        .distinct()
        .localCheckpoint(false)
      val nB = items.select("user_id", "session_id").distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val tc = items.groupBy("event_type").agg(count(lit(1)).as("n_t"))
      val pairs = items.select(col("user_id"), col("session_id"),
          col("event_type").as("item_a"))
        .join(items.select(col("user_id"), col("session_id"),
          col("event_type").as("item_b")), Seq("user_id", "session_id"))
        .filter(col("item_a") < col("item_b"))
        .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(tc.select(col("event_type").as("item_a"),
          col("n_t").as("n_a"))), Seq("item_a"))
        .join(broadcast(tc.select(col("event_type").as("item_b"),
          col("n_t").as("n_b"))), Seq("item_b"))
        .crossJoin(broadcast(nB))
        .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
          col("n_b"), col("n_baskets"),
          (col("n_ab").cast("double") / col("n_baskets").cast("double"))
            .as("support"),
          (col("n_ab").cast("double") / col("n_a").cast("double"))
            .as("confidence"),
          (col("n_ab").cast("double") * col("n_baskets").cast("double")
            / (col("n_a").cast("double") * col("n_b").cast("double")))
            .as("lift"))
        .orderBy("item_a", "item_b")
    }),
    // Line-level boilerplate scrub (CCNet's line dedup, slice-scoped):
    // synthesize multi-line pages — a promo header on every doc (100% of
    // each source, dropped at the 60% threshold) and a subscribe footer on
    // even ids (~50%, kept or dropped per source by the same exact integer
    // rule both engines replay) around the original body line.
    "q112_line_scrub" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("source"),
          concat(lit("promo: visit our site\n"), col("text"),
            when(col("doc_id") % 2 === 0, lit("\nsubscribe footer"))
              .otherwise(lit(""))).as("text"))
      Scrub.boilerplateLineScrub(d, "doc_id", "text", Seq("source"), maxDocPct = 60)
        .orderBy("doc_id")
    }),
    // Deterministic training-shard shuffle: every doc gets (shard, pos)
    // from equal-width md5 ranges + in-shard hash order — the oracle
    // replays the threshold CASE chain and the same (hash, id) window.
    "q113_shuffle_order" -> ((s, dir) => {
      Sampling.shuffleOrder(Tables(s, dir).documents.select("doc_id"),
          "doc_id", nShards = 8, domain = "train")
        .orderBy("doc_id")
    }),
    // Temperature-balanced mixing (mT5/XLM-R α-sampling, α=0.5): keep
    // rates derived in-plan from observed lang sizes — sqrt weights, a
    // lang-ordered Σw fold, floor(rate·2³²) hex thresholds — all IEEE-exact
    // steps the oracle replays literally. budget=450 exercises BOTH
    // branches at sf0.01 (smallest langs saturate to keep-all, 'en' thins).
    "q114_temperature_mix" -> ((s, dir) => {
      Sampling.temperatureMixture(Tables(s, dir).documents.select("doc_id", "lang"),
          "doc_id", "lang", budget = 450L, alpha = 0.5)
        .orderBy("doc_id")
    }),
    // Hashed NB quality classifier (fastText/CCNet shape): train log-odds
    // on the doc_id%3==0 seed (label: lang='en'), score the whole corpus.
    // Counts are integers, llr rounds to 6dp (absorbs last-ulp ln), the
    // score folds llr in bucket-id order from 0.0 and rounds to 4dp —
    // every step replayed literally by the oracle.
    "q115_nb_classifier" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      val seed = d.filter(col("doc_id") % 3 === 0)
        .select((col("lang") === "en").as("y"), col("text"))
      Classifier.nbScore(d, "doc_id", "text",
          Classifier.nbTrain(seed, "text", "y"))
        .orderBy("doc_id")
    }),
    // Multi-class multinomial NB (McCallum & Nigam 1998) routing docs to
    // their argmax language: train on doc_id % 4 != 0, score ALL docs —
    // per-(label, bucket) 6dp log-probs, per-class tf·lp folds in
    // bucket-id order, unseen buckets at the class's smoothed floor,
    // ties to the smaller label, margin = best − runner-up.
    "q287_nb_multiclass" -> ((s, dir) => {
      val d = Tables(s, dir).documentsSpread
      val seed = d.filter(col("doc_id") % 4 =!= 0)
        .select(col("lang"), col("text"))
      Classifier.nbMulticlassScore(d, "doc_id", "text",
          Classifier.nbMulticlassTrain(seed, "text", "lang"))
        .orderBy("doc_id")
    }),
    // Directed containment (excerpt⊂parent): synthesize 20-token-prefix
    // excerpts, detect them inside their parents at containment ≥ 0.9 —
    // the subset relation symmetric Jaccard misses (|B| >> |A| pairs).
    // Rare-gram candidate anchoring (df ≤ 64) + one exact array_intersect;
    // integer sizes and an integer/integer division replay bit-identically.
    "q116_containment" -> ((s, dir) => {
      val d = Tables(s, dir).documentsSpread.select(col("doc_id"), col("text"))
      val corpus = d.unionByName(d.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 20)).as("text")))
      Dedup.containmentPairs(corpus, "doc_id", "text", n = 3,
          threshold = 0.9, maxBucket = 64)
        .orderBy("id_a", "id_b")
    }),
    // JL sign random projection 64→8 (Achlioptas): the sign matrix derives
    // from md5(j:k:jl) so both engines rebuild it exactly; per-element
    // ascending-j fold from 0.0, one /sqrt(8) — per-row IEEE arithmetic,
    // no rounding anywhere
    "q117_random_projection" -> ((s, dir) => {
      Tables(s, dir).embeddings
        .select(col("vec_id"),
          posexplode(VectorFunctions.randomProjectSigns(col("embedding"), 64, 8)))
        .select(col("vec_id"), col("pos").cast("int").as("dim"),
          col("col").as("value"))
        .orderBy("vec_id", "dim")
    }),
    // End-to-end curation pipeline in ONE composed plan: content-
    // fingerprint dedup (keep lowest id) → token-count gate →
    // temperature-balanced lang mixing → deterministic shard shuffle.
    // Every stage is an already-gated operator under fresh hash domains;
    // the oracle replays the full chain as CTEs. The value under test is
    // COMPOSITION: rates derive from the filtered corpus, shard order
    // from the mixed survivors — any stage drift breaks the hash.
    "q118_curation_pipeline" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      val deduped = d
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("fp").orderBy("doc_id")))
        .filter(col("rn") === 1)
      // temperatureMixture consumes its input twice (group counts + the
      // keep filter): checkpoint the dedup window's output once so the
      // fingerprint/window stage doesn't re-run per consumer (the
      // BloomJoin lesson — slim (doc_id, lang) rows only)
      val gated = deduped
        .filter(TextAnalysis.tokenCount(col("text")) >= 30)
        .select("doc_id", "lang")
        .localCheckpoint(false)
      val mixed = Sampling.temperatureMixture(gated, "doc_id", "lang",
        budget = 300L, alpha = 0.5, domain = "temp118")
      Sampling.shuffleOrder(mixed, "doc_id", nShards = 4, domain = "shard118")
        .orderBy("doc_id")
    }),
    // Video-style near-dup by frame voting: synthesize same-length
    // tail-edited copies (last byte → 'Z'), sample 8 aligned byte-window
    // frames, aHash each (stub codec — ASCII corpus, so the oracle
    // replays the sampled grid byte-for-byte, the q97 argument), pair via
    // the banded chunk join per frame slot, keep pairs with ≥ 6 matching
    // frames. Tail copies keep frames 0..6 byte-identical; the vote count
    // is exact (full per-frame recall at dist < bands).
    "q119_video_neardup" -> ((s, dir) => {
      val d = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val tail = d.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(expr("substring(text, 1, length(text) - 1)"), lit("Z")).as("text"))
      val media = Multimodal.asMedia(d.unionByName(tail), "doc_id", "text")
      Multimodal.videoNearDupPairs(media, nFrames = 8, frameBytes = 32,
          maxDist = 3, bands = 4, minMatching = 6)
        .orderBy("id_a", "id_b")
    }),
    // Per-slice Jensen–Shannon divergence vs the corpus distribution —
    // the distribution-shift diagnostic behind mixing decisions. Integer
    // counts, exact divisions, token-ordered fold, floor-rounded 6dp
    // half-sum; ln ulp drift accumulates ~1e-12, far under the grain.
    "q120_slice_divergence" -> ((s, dir) => {
      Profile.sliceDivergence(Tables(s, dir).documents, "source", "text")
        .orderBy("source")
    }),
    // Per-document OOV rate vs the corpus top-20 vocabulary (count desc,
    // token asc — a total order): tokenizer-coverage / gibberish triage.
    // Exact integer counts and division; empty docs report 0/0/0.0.
    "q121_oov_rate" -> ((s, dir) => {
      Profile.oovRate(Tables(s, dir).documents, "doc_id", "text", k = 20)
        .orderBy("doc_id")
    }),
    // CCNet's head/middle/tail step (Wenzek et al. 2020 §3.3): per-lang
    // perplexity TERTILES of the q100 LM score. The cut is RANK-based —
    // (3·(rank−1)) div n over the (avg_nll, doc_id) total order — exact
    // integer arithmetic, no quantile interpolation to disagree on.
    // Scale note: one per-lang rank window (CCNet's own shape); at 100 TB
    // apply the Sampling.scala two-level bucketed-rank trick per lang.
    "q122_ccnet_tertiles" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      val model = LanguageModel.trainBigram(
        d.filter(col("source") === "src0"), "text")
      val scored = LanguageModel.perplexityScore(d, "doc_id", "text", model)
        .join(d.select("doc_id", "lang"), Seq("doc_id"))
      val t = expr("(3 * (CAST(_r AS BIGINT) - 1)) DIV _n")
      scored
        .withColumn("_r", row_number().over(
          Window.partitionBy("lang").orderBy(col("avg_nll"), col("doc_id"))))
        .withColumn("_n", count(lit(1)).over(Window.partitionBy("lang")))
        .select(col("doc_id"), col("lang"), col("avg_nll"),
          when(t === 0, "head").when(t === 1, "middle")
            .otherwise("tail").as("bucket"))
        .orderBy("doc_id")
    }),
    // Language-ID confusion matrix: labeled lang × q19's marker-based
    // guess — the eval diagnostic for any language classifier. Exact
    // integer cell counts.
    "q123_lang_confusion" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("lang"), TextAnalysis.langGuess(col("text")).as("lang_guess"))
        .groupBy("lang", "lang_guess").agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_guess")
    }),
    // Contrastive pair generation (SimCSE/DPR recipe): anchor/positive =
    // a doc's first two 32-token windows, negative = the next doc's
    // anchor on the per-bucket md5 ring — in-batch negatives made
    // deterministic; the oracle replays slices, hash order and the
    // cyclic lead/wrap exactly.
    "q124_contrastive_pairs" -> ((s, dir) => {
      Chunk.contrastivePairs(Tables(s, dir).documents, "doc_id", "text",
          chunkTokens = 32, bucketHexChars = 1)
        .orderBy("doc_id")
    }),
    // Quality-aware cluster resolve: corpus = truncated originals ∪ +1e6
    // FULL-text copies ∪ +2e6 empty copies, chained into one cluster per
    // doc. resolveBest by text length keeps the +1e6 member — NOT the
    // min id, so the construction distinguishes the quality rule from
    // resolve's min-id rule, and the oracle is closed-form.
    "q125_cluster_best" -> ((s, dir) => {
      val d = Tables(s, dir).documents.select("doc_id", "lang", "text")
      def shifted(k: Long, t: Column) = d.select(
        (col("doc_id") + k * 1000000L).as("doc_id"), col("lang"), t.as("text"))
      val corpus = shifted(0, concat_ws(" ", slice(split(col("text"), " "), 1, 3)))
        .unionByName(shifted(1, col("text")))
        .unionByName(shifted(2, lit("")))
        .withColumn("score", length(col("text")).cast("long"))
      val pairs = d.select(col("doc_id").as("id_a"),
          (col("doc_id") + 1000000L).as("id_b"))
        .unionByName(d.select((col("doc_id") + 1000000L).as("id_a"),
          (col("doc_id") + 2000000L).as("id_b")))
      DupClusters.resolveBest(corpus, "doc_id", pairs, "score")
        .select("doc_id", "lang").orderBy("doc_id")
    }),
    // Audio-modality features over the stub PCM decode (byte − 128):
    // 4 aligned frames per payload, per-frame RMS (exact integer
    // sum-of-squares → one division + one correctly-rounded sqrt — no
    // rounding) and zero-crossing counts.
    "q126_audio_features" -> ((s, dir) => {
      val media = Multimodal.asMedia(Tables(s, dir).documents, "doc_id", "text")
      Multimodal.audioFrameFeatures(media, nFrames = 4, frameBytes = 64)
        .toDF().orderBy("doc_id", "frame_idx")
    }),
    // Training-record export assembly: the final "one query from lake to
    // trainer" — docs ⋈ embeddings, quality score, stable split tag,
    // embedding L2 norm — every component an already-gated replay (q18
    // quality, q44 split, q26 norm), composed into the export row shape.
    "q127_training_records" -> ((s, dir) => {
      val t = Tables(s, dir)
      val e = t.embeddings.select(col("vec_id").as("doc_id"),
        col("embedding"))
      t.documents.join(e, Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          Sampling.splitTag(col("doc_id"), 0.9, domain = "export").as("split"),
          VectorFunctions.l2Norm(col("embedding")).as("vec_l2"),
          size(col("embedding")).as("vec_dims"))
        .orderBy("doc_id")
    }),
    // Gopher repetition battery (the filter half gopherGates doesn't
    // cover): dup-line fraction/char-fraction + top-{2,3,4} and
    // dup-{5..10} n-gram char fractions, per-row fold arithmetic with
    // zero shuffle. The fixture is single-line, so the query plants the
    // line structure deterministically (two duplicate 40-char excerpt
    // lines per doc, a %3-gated trailer) — the oracle replants and
    // replays every integer mass relationally (group-by vs run-fold:
    // same counts, same single-division doubles, same pass flags).
    "q128_repetition_signals" -> ((s, dir) => {
      val planted = Tables(s, dir).documents
        .select(col("doc_id"),
          concat(col("text"), lit("\n"), substring(col("text"), 1, 40),
            lit("\n"), substring(col("text"), 1, 40),
            when(col("doc_id") % 3 === 0, lit("\nthe end"))
              .otherwise(lit(""))).as("text"))
      val sig = Scrub.RepetitionThresholds.map(_._1)
      // the fixture is ONE parquet file = one scan partition; the signal
      // battery is the heaviest per-row map in the repo, so spread it
      // before computing (a real lake's many files parallelize naturally).
      // Explicit partition count: AQE's 64MB advisory would coalesce this
      // small-bytes/heavy-cpu shuffle right back to one task
      planted.repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), Scrub.repetitionSignals(col("text")).as("r"))
        .select(col("doc_id") +: col("r.n_lines").as("n_lines") +:
          sig.map(n => col(s"r.$n").as(n)) :+ col("r.pass").as("pass"): _*)
        .orderBy("doc_id")
    }),
    // Token-balanced curriculum bins: corpus ordered by (quality, doc_id),
    // cut into 4 stages of ~equal TOKEN mass via pure int64 floor-division
    // (bin = min(k-1, prior·k div total)). The engine runs the score-axis
    // bucketed running sum; the oracle is the single-window formulation —
    // identical integers, so identical cuts. Scores are q18's exact
    // quality doubles (bit-identical cross-engine).
    "q129_curriculum_bins" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("score"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      Sampling.curriculumBins(d, "doc_id", "score", "n_tok",
          k = 4, gridLo = 0.0, gridHi = 1.0, buckets = 64)
        .orderBy("doc_id")
    }),
    // Low-discrepancy proportional interleave: every training-order prefix
    // carries each source's corpus share to within one document. progress
    // = (2·rank − 1)/(2·n_group) — integer-derived, one double division —
    // over the shared md5 hash-order contract; the oracle replays the
    // identical windows.
    "q130_interleave_order" -> ((s, dir) => {
      Sampling.interleaveOrder(
          Tables(s, dir).documents.select("doc_id", "source"),
          "doc_id", "source")
        .orderBy("doc_id")
    }),
    // Markup stripping (extraction hygiene): fixture text wrapped in the
    // shared MarkupPrefix/Suffix plant (style+script payload blocks, tags,
    // the &amp;lt; order trap, named entities), then the fixed-order
    // RE2-subset regex chain — the oracle replays the chain verbatim from
    // the same shared constants.
    "q131_strip_markup" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("doc_id"),
          Scrub.stripMarkup(concat(lit(MarkupPrefix), col("text"),
            lit(MarkupSuffix))).as("clean"))
        .orderBy("doc_id")
    }),
    // BPE merge training (Sennrich'16): ONE corpus-scale word-frequency
    // aggregation, then 8 vocabulary-sized merge iterations — pair argmax
    // by (weight DESC, left, right), greedy left-to-right merge fold. The
    // oracle unrolls the identical 8 iterations as CTE chains.
    "q133_bpe_merges" -> ((s, dir) => {
      Bpe.train(Tables(s, dir).documents, "text", merges = 8)
        .orderBy("step")
    }),
    // batched BPE trainer: provably-sequential batching (rank-prefix +
    // symbol-disjointness + strict triple-count cap), so the SAME unrolled
    // sequential oracle gates it — the whole point is rule-for-rule
    // equality in ~batch× fewer driver rounds
    "q155_bpe_batched" -> ((s, dir) => {
      Bpe.trainBatched(Tables(s, dir).documents, "text", merges = 8,
          maxBatch = 8)
        .orderBy("step")
    }),
    // nearest-centroid (Rocchio) classification of every embedding against
    // per-label mean vectors: exact quantized centroids, bit-identical
    // cosines, margin = best − runner-up (the uncertainty signal)
    "q134_centroid_classify" -> ((s, dir) => {
      graft.operators.Classifier.centroidClassify(
        Tables(s, dir).embeddings, "vec_id", "embedding", "label")
        .orderBy("vec_id")
    }),
    // per-source encoding-damage audit: plant mojibake on ids ≡0 (mod 5),
    // U+FFFD on ≡0 (mod 9), a C0 control byte on ≡0 (mod 15 — overlaps
    // both plants); the three shared regex constants detect
    "q154_encoding_damage" -> ((s, dir) => {
      val planted = Tables(s, dir).documents
        .select(col("doc_id"), col("source"), concat(col("text"),
          when(col("doc_id") % 5 === 0, lit(" cafÃ© menu"))
            .otherwise(lit("")),
          when(col("doc_id") % 9 === 0, lit(" bad�byte"))
            .otherwise(lit("")),
          when(col("doc_id") % 15 === 0, lit(" ctl\u0007end"))
            .otherwise(lit(""))).as("text"))
      Scrub.encodingDamage(planted, Seq("source"), "text")
        .orderBy("source")
    }),
    // per-lang 1-Wasserstein drift of the quality-score distribution vs
    // the rest — the integral companion of q147's KS, value-ordered fold,
    // no transcendentals
    "q153_w1_drift" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"),
          TextAnalysis.qualityScore(col("text")).as("score"))
      Quantiles.wasserstein1(d, "lang", "score").orderBy("lang")
    }),
    // CUSUM changepoint per event type: clicks double after Jan 20 (a
    // planted rate step), so the click stream must localize its burst day
    // in the tail while flat types score near zero — exact integer
    // T·cum − t·total statistic, one normalized division
    "q152_cusum_burst" -> ((s, dir) => {
      val e = Tables(s, dir).events
        .select(col("event_id"), col("event_type"), col("ts"))
      val boosted = e
        .filter(col("event_type") === "click" && dayofmonth(col("ts")) > 20)
        .select((col("event_id") + 10000000L).as("event_id"),
          col("event_type"), col("ts"))
      Resample.cusumBurst(e.unionByName(boosted), Seq("event_type"), "ts")
        .orderBy("event_type")
    }),
    // per-source PII incidence with Wilson 95% bounds: plant emails on
    // ids ≡0 (mod 7), IPs on ≡0 (mod 11), phones on ≡0 (mod 13); the
    // SAME redaction regexes detect, so the rate measures what redaction
    // would touch
    "q151_pii_incidence" -> ((s, dir) => {
      val planted = Tables(s, dir).documents
        .select(col("doc_id"), col("source"), concat(col("text"),
          when(col("doc_id") % 7 === 0, lit(" contact bob@ex-ample.org"))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0, lit(" host 10.1.2.3"))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 0, lit(" call +1-555-0100"))
            .otherwise(lit(""))).as("text"))
      Scrub.piiIncidence(planted, Seq("source"), "text")
        .orderBy("source")
    }),
    // char-mass-weighted median quality score per source: half the CHAR
    // mass sits at or below this score — exact integer rule, no
    // interpolation
    "q150_weighted_median" -> ((s, dir) => {
      val d = Tables(s, dir).documents.select(col("source"),
        TextAnalysis.qualityScore(col("text")).as("score"), col("n_chars"))
      Quantiles.weightedMedian(d, Seq("source"), "score", "n_chars")
        .orderBy("source")
    }),
    // weighted rendezvous sharding: route docs to 4 heterogeneous nodes
    // (weights 1:1:2:4) with minimal-movement guarantees; per-node doc
    // and char totals
    "q149_rendezvous_shards" -> ((s, dir) => {
      Sampling.rendezvousAssign(
          Tables(s, dir).documents.select(col("doc_id"), col("n_chars")),
          "doc_id",
          Seq("a" -> 1.0, "b" -> 1.0, "c" -> 2.0, "d" -> 4.0))
        .groupBy("node")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
        .orderBy("node")
    }),
    // vocabulary-tail profile per source: hapax/dis counts, Good–Turing
    // unseen mass, Simpson repetition concentration — exact integers,
    // single divisions
    "q148_vocab_tail" -> ((s, dir) => {
      Profile.vocabTail(Tables(s, dir).documents, "source", "text")
        .orderBy("source")
    }),
    // per-lang two-sample KS drift of the quality-score distribution vs
    // the rest of the corpus — exact sup over observed values, integer
    // CDF counts, single divisions
    "q147_ks_drift" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"),
          TextAnalysis.qualityScore(col("text")).as("score"))
      Quantiles.ksStatistic(d, "lang", "score").orderBy("lang")
    }),
    // Rank-biased overlap (Webber'10) between the exact cosine top-10 and
    // the same ranking over 1/16-quantized vectors — the graded "how much
    // rank damage does quantization do" eval; powers planted as shared
    // literals, no rounding anywhere
    "q146_rank_overlap" -> ((s, dir) => {
      val t = Tables(s, dir)
      val qv = t.embeddings.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val fine = Similarity.bruteForceTopK(
          t.embeddings, "vec_id", "embedding", qv, 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
      def quant(c: Column): Column = transform(c, x =>
        floor(x.cast("double") * lit(16.0) + lit(0.5)) / lit(16.0))
      val coarse = Similarity.bruteForceTopK(
          t.embeddings.select(col("vec_id"),
            quant(col("embedding")).as("embedding")),
          "vec_id", "embedding",
          qv.select(col("query_id"), quant(col("query_vec")).as("query_vec")),
          10)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
      Retrieval.rboAtK(fine, coarse, "query_id", "neighbor_id", "rank",
          k = 10, p = 0.9)
        .orderBy("query_id")
    }),
    // Gini concentration of char mass across sources: the governance
    // one-number — sorted exact integer form, one final double division
    "q145_gini_concentration" -> ((s, dir) => {
      Profile.giniConcentration(Tables(s, dir).documents, "source", "n_chars")
    }),
    // Heaps'-law vocabulary growth per source: cumulative token and
    // distinct-vocab counts at doubling doc-count prefixes — all exact
    // integers off one per-group rank window
    "q144_heaps_law" -> ((s, dir) => {
      Profile.heapsLaw(Tables(s, dir).documents, "source", "doc_id", "text",
          checkpoints = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L))
        .orderBy("source", "checkpoint")
    }),
    // PassJoin edit-distance near-dup over 40-char prefix keys of one
    // source slice, with three planted single-substitution variants so
    // every scale has guaranteed pairs; candidates come from the linear
    // segment-filter join, never an all-pairs stage
    "q143_edit_distance_pairs" -> ((s, dir) => {
      val base = Tables(s, dir).documents
        .filter(col("source") === "src0")
        .select(col("doc_id"), substring(col("text"), 1, 40).as("key"))
      val planted = base.orderBy("doc_id").limit(3)
        .select((col("doc_id") + 9000000L).as("doc_id"),
          concat(lit("X"), substring(col("key"), 2, 39)).as("key"))
      Dedup.editDistancePairs(base.unionByName(planted), "doc_id", "key",
          maxDist = 2)
        .orderBy("id_a", "id_b")
    }),
    // distributed Lloyd k-means (2 iterations, k=4): quantized integer
    // dimension sums make every centroid an exact-integer division;
    // assignment is a broadcast argmin with (d2, cluster) tie-break. The
    // oracle unrolls both iterations as CTE chains.
    "q142_kmeans_lloyd" -> ((s, dir) => {
      graft.operators.KMeans.lloyd(
        Tables(s, dir).embeddings, "vec_id", "embedding", k = 4, iters = 2)
        .orderBy("cluster", "dim")
    }),
    // per-shard export manifest: exact row/weight/id-range stats plus the
    // order-independent two-word md5 checksum — the integrity record a
    // training run checks before reading a published export
    "q141_shard_manifest" -> ((s, dir) => {
      Snapshot.manifest(Tables(s, dir).documents, "source", "doc_id",
          "text", "n_chars")
        .orderBy("source")
    }),
    // Zipf rank-frequency slope per source: ln/ln least squares over the
    // top-25 tokens — four rank-ordered folds, 6dp ExactRound on the two
    // fit values (the q120 ln-ulp argument)
    "q140_zipf_slope" -> ((s, dir) => {
      Profile.zipfSlope(Tables(s, dir).documents, "source", "text", topK = 25)
        .orderBy("source")
    }),
    // UniMax budget allocation (Chung'23): per-language char quotas under a
    // 600k budget and a 2-epoch cap — the capped-prefix closed form over
    // one vocabulary-sized window; integer arithmetic until the two final
    // divisions
    "q139_unimax_quotas" -> ((s, dir) => {
      Sampling.unimaxQuotas(Tables(s, dir).documents, "lang", "n_chars",
          budget = 600000L, epochCap = 2.0)
        .orderBy("lang")
    }),
    // embedding-space decontamination (the GPT-3/Llama eval-overlap check
    // moved to vector space): label-9 vectors play the benchmark, the rest
    // the training corpus; five planted copies of train vectors must flag
    // contaminated (score == the self-cosine expression), naturals must not
    "q138_embed_decontam" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      val train = emb.filter(col("label") =!= 9)
      val evalQ = emb.filter(col("label") === 9)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        .unionByName(train.filter(col("vec_id") < 5)
          .select((col("vec_id") + 2000000L).as("query_id"),
            col("embedding").as("query_vec")))
      Similarity.bruteForceTopK(train, "vec_id", "embedding", evalQ, k = 1)
        .select(col("query_id"), col("neighbor_id"), col("score"),
          (col("score") >= 0.999).as("contaminated"))
        .orderBy("query_id")
    }),
    // distinct-n diversity per source (Li'16): exact distinct/total gram
    // counts for n=1..3 in one shared-token-array pass
    "q137_distinct_n" -> ((s, dir) => {
      graft.operators.Profile.distinctNgramDiversity(
        Tables(s, dir).documents, "source", "text", maxN = 3)
        .orderBy("source", "n")
    }),
    // k-center greedy coreset (Gonzalez'85 farthest-point sampling): 8
    // selection steps, each one narrow broadcast-distance pass + a single
    // max(struct) argmax; d2 bit-exact, ties to the smaller id
    "q136_kcenter_coreset" -> ((s, dir) => {
      graft.operators.Coreset.kCenterGreedy(
        Tables(s, dir).embeddings, "vec_id", "embedding", k = 8)
        .orderBy("step")
    }),
    // Stupid-Backoff trigram scoring (Brants'07): the web-scale quality LM.
    // All counts derive from ONE BOS-padded trigram table; the backoff CASE
    // chain and position-ordered fold replay identically in the oracle
    "q135_stupid_backoff" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      val model = LanguageModel.trainTrigram(
        d.filter(col("source") === "src0"), "text")
      LanguageModel.stupidBackoffScore(d, "doc_id", "text", model)
        .orderBy("doc_id")
    }),
    // Per-source percentile-rank calibration: RANK ties share position,
    // pct = (rank-1)/max(n-1,1) — one double division of integers. The
    // engine's score-bucketed two-phase rank ≡ the oracle's whole-group
    // window.
    "q132_percentile_calibrate" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("source"),
          TextAnalysis.qualityScore(col("text")).as("score"))
      Quantiles.percentileRank(d, Seq("source"), "score",
          gridLo = 0.0, gridHi = 1.0, buckets = 64)
        .orderBy("doc_id")
    }),
    // per-group winsorization: clip to rounded exact p05/p95 quantiles —
    // the clip SET (not just values) reproduces cross-engine because the
    // bounds round to 6dp before comparison (q86's argument)
    "q94_winsorized_stats" -> ((s, dir) => {
      Quantiles.winsorize(Tables(s, dir).events, Seq("event_type"), "value",
          pLo = 0.05, pHi = 0.95)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("winsorized") =!= col("value"), 1L).otherwise(0L))
            .as("n_clipped"),
          round(sum(col("winsorized")), 4).as("wsum"))
        .orderBy("event_type")
    }),
    // N-way split tag: one md5 hash against cumulative thresholds — same
    // determinism contract as q44, with the upgrade property that the
    // train region is identical to a 2-way split's at the same fraction
    "q91_multiway_split" -> ((s, dir) => {
      Tables(s, dir).documents
        .withColumn("split", Sampling.splitTagN(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), domain = "split3"))
        .groupBy("split", "lang").agg(count(lit(1)).as("n_docs"))
        .orderBy("split", "lang")
    }),
    // per-dimension z-score standardization with EXACT cross-engine
    // statistics: integer-quantized Σq and Σq² (the centroids scheme
    // extended to second moments), fixed-order double derivation, IEEE
    // sqrt — so raw unrounded z values hash-match
    "q92_standardize_dims" -> ((s, dir) => {
      Similarity.standardizeDims(Tables(s, dir).embeddings,
          "vec_id", "embedding")
        .orderBy("vec_id", "pos")
    }),
    // slice-level overlap matrix ("which sources are near-copies?"):
    // distinct (source, bigram) once, gram-keyed self-join whose per-gram
    // pair fan-out is bounded by the SLICE count — exact set arithmetic,
    // so the oracle replays it verbatim
    "q89_source_overlap" -> ((s, dir) => {
      TextAnalysis.sourceOverlapMatrix(Tables(s, dir).documents,
          "source", "text", n = 2)
        .orderBy("src_a", "src_b")
    }),
    // length-bucket padding report: one map-side-combinable aggregation;
    // waste_frac is an exact-operand double division both engines compute
    // identically
    "q90_length_buckets" -> ((s, dir) => {
      Pack.paddingReport(
          Tables(s, dir).documents
            .select(TextAnalysis.tokenCount(col("text")).as("n_tok")),
          "n_tok", bucketWidth = 16)
        .orderBy("bucket")
    }),
    // Gopher/C4-style HARD quality gates: named per-rule booleans (a
    // filtering report needs the reason, not a blended score). Every flag
    // is integer-derived double arithmetic with a fixed op order over one
    // shared tokenization, so the oracle replays it bit-identically. The
    // stopword list is localized to this corpus's vocabulary (the default
    // English set has one member here — an all-false gate tests nothing)
    "q87_quality_gates" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("doc_id"),
          graft.operators.Scrub.gopherGates(col("text"), minWords = 30,
            stopwords = Seq("the", "a", "data", "value")).as("g"))
        .select(col("doc_id"), col("g.words_ok").as("words_ok"),
          col("g.mean_word_len_ok").as("mean_word_len_ok"),
          col("g.symbol_ok").as("symbol_ok"), col("g.alpha_ok").as("alpha_ok"),
          col("g.stopwords_ok").as("stopwords_ok"), col("g.pass").as("pass"))
        .orderBy("doc_id")
    }),
    // epoch-weighted mixture materialization (the UPSAMPLING knob):
    // floor(weight) full copies + a hash-selected fractional epoch, all
    // md5-threshold arithmetic the oracle restates with the shared
    // hexThreshold constant ('80000000' = 0.5)
    "q88_epoch_mixture" -> ((s, dir) => {
      Sampling.epochMixture(Tables(s, dir).documents.select("doc_id", "source"),
          "doc_id", "source",
          epochs = Map("src0" -> 2.5, "src1" -> 0.5, "src2" -> 0.0),
          defaultEpochs = 1.0)
        .orderBy("doc_id", "epoch")
    }),
    // incremental ledger dedup: an incoming batch is admitted against the
    // corpus FINGERPRINT LEDGER (batch-sized work, never corpus-sized; the
    // ledger side rides BloomJoin so novel rows skip the shuffle). Planted
    // batch: exact corpus copies (rejected), one mutated leg (admitted),
    // and a second copy of the mutated leg (intra-batch dup — min id wins).
    // Everything is md5-fingerprint arithmetic, so the oracle replays it
    "q84_incremental_dedup" -> ((s, dir) => {
      val d = Tables(s, dir).documentsSpread
      val ledger = d.select(TextAnalysis.fingerprint(col("text")).as("fp")).distinct()
      val dup = d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val nov = d.filter(col("doc_id") % 5 === 1)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" graft v2")).as("text"))
      val novDup = d.filter(col("doc_id") % 5 === 1)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" graft v2")).as("text"))
      val batch = dup.unionByName(nov).unionByName(novDup)
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      IncrementalDedup.dedupBatch(batch, ledger, "doc_id", "fp",
          expectedLedgerItems = 100000L)
        .select("doc_id", "fp").orderBy("doc_id")
    }),
    // per-group EXACT quantiles via one distributed range sort + joined
    // order statistics — never the built-in percentile()'s whole-group
    // aggregation buffer (one hot group = one OOM reducer at scale). The
    // interpolation is the same R-7 two-weight form as quantile_cont, so a
    // 4-decimal round makes the values hash-comparable (q43's convention)
    "q85_grouped_quantiles" -> ((s, dir) => {
      Quantiles.exactGrouped(Tables(s, dir).events, Seq("event_type"), "value",
          Seq(0.25, 0.5, 0.75, 0.95))
        .select(col("event_type"), col("p"), round(col("value"), 4).as("value"))
        .orderBy("event_type", "p")
    }),
    // robust (median/MAD) outlier stats: two exactGrouped passes, medians
    // rounded to 6 decimals BEFORE the deviation/threshold arithmetic so
    // the knife-edge outlier comparison consumes identical doubles in both
    // engines (raw interpolated medians can differ by ulps)
    "q86_robust_outliers" -> ((s, dir) => {
      Quantiles.robustOutlierStats(Tables(s, dir).events, Seq("event_type"),
          "value", k = 3.0)
        .select(col("event_type"), round(col("median"), 4).as("median"),
          round(col("mad"), 4).as("mad"), col("n_outliers"))
        .orderBy("event_type")
    }),
    // mergeable quantile sketch gated q82/q98-style: exact per-lang
    // token-count quantiles are computed by BOTH engines; the sketch
    // estimates — built per SOURCE and merged per lang, the incremental
    // deployment shape — are asserted inside the exact-value envelope at
    // p ± 2% and the oracle states TRUE. The ±2% rank tolerance covers
    // the deterministic MRL bound H/(2k) for k=512 out to n ≈ 5·10⁸ per
    // group; below capacity (this fixture) the estimate is exact, and a
    // data value at rank within ±εn always lies inside [v(p−ε), v(p+ε)]
    "q99_quantile_sketch" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
        .select(col("lang"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("double").as("n_tok"))
      val k = 512
      val sk = docs.groupBy("lang", "source")
        .agg(Sketches.quantileSketch(col("n_tok"), k).as("sk"))
        .groupBy("lang")
        .agg(Sketches.quantileSketchMerge(col("sk"), k).as("sk"))
        .select(col("lang"),
          Sketches.quantileSketchQuery(col("sk"), lit(0.5)).as("_e50"),
          Sketches.quantileSketchQuery(col("sk"), lit(0.9)).as("_e90"))
      val env = Quantiles.exactGrouped(docs, Seq("lang"), "n_tok",
          Seq(0.48, 0.5, 0.52, 0.88, 0.9, 0.92))
        .groupBy("lang").agg(
          max(when(col("p") === 0.48, col("value"))).as("_lo50"),
          max(when(col("p") === 0.5, col("value"))).as("_v50"),
          max(when(col("p") === 0.52, col("value"))).as("_hi50"),
          max(when(col("p") === 0.88, col("value"))).as("_lo90"),
          max(when(col("p") === 0.9, col("value"))).as("_v90"),
          max(when(col("p") === 0.92, col("value"))).as("_hi90"))
      // The ±2% band is meaningful only when 0.02·n spans at least one
      // rank: for groups under 50 rows the rank granularity (1) exceeds
      // the band, and a sketch answer that is EXACTLY the lower quantile
      // at ceil(p·n) can still fall outside the interpolated envelope.
      // Guard with a minimum group size (assert TRUE below it — the band
      // tests nothing there) and additionally widen each bound to admit
      // the exact interpolated p-value itself.
      val counts = Tables(s, dir).documents.groupBy("lang")
        .agg(count(lit(1)).as("_n"))
      def inTol(e: Column, lo: Column, v: Column, hi: Column): Column =
        col("_n") < 50 ||
          (e >= least(lo, v) && e <= greatest(hi, v))
      sk.join(env, "lang").join(counts, "lang")
        .select(col("lang"),
          round(col("_v50"), 4).as("p50_exact"),
          round(col("_v90"), 4).as("p90_exact"),
          inTol(col("_e50"), col("_lo50"), col("_v50"), col("_hi50")).as("p50_in_tol"),
          inTol(col("_e90"), col("_lo90"), col("_v90"), col("_hi90")).as("p90_in_tol"))
        .orderBy("lang")
    }),
    // CCNet-style LM quality scoring: add-one bigram trained on one
    // trusted source, every document scored by avg negative log
    // likelihood. Counts and V are exact integers; each nll is ln of one
    // integer-ratio double; the per-doc sum folds in position order and
    // rounds to 4dp — the q93 determinism recipe
    "q100_lm_perplexity" -> ((s, dir) => {
      val d = Tables(s, dir).documentsSpread
      val model = LanguageModel.trainBigram(
        d.filter(col("source") === "src0"), "text")
      LanguageModel.perplexityScore(d, "doc_id", "text", model)
        .orderBy("doc_id")
    }),
    // Min-K% Prob membership/contamination score (Shi et al. 2023): mean
    // NLL of each doc's 20% most surprising positions under the q100
    // model — a memorized doc has no surprising tail. Total (nll, pos)
    // order pins the slice and the fold cross-engine.
    "q243_min_k_prob" -> ((s, dir) => {
      val d = Tables(s, dir).documentsSpread
      val model = LanguageModel.trainBigram(
        d.filter(col("source") === "src0"), "text")
      LanguageModel.minKProbScore(d, "doc_id", "text", model, kPct = 20)
        .orderBy("doc_id")
    }),
    // DSIR importance resampling: hashed-bigram likelihood ratios
    // (target = en docs) + deterministic Gumbel top-k. Bucket counts are
    // exact integers via the base-257 polynomial hash both engines
    // replay; log-ratio and Gumbel keys are fixed-order folds over exact
    // integer-ratio ln args, so the SELECTED SET reproduces exactly
    "q101_dsir_resample" -> ((s, dir) => {
      val d = Tables(s, dir).documentsSpread
      Importance.dsirResample(d, d.filter(col("lang") === "en"),
          "doc_id", "text", k = 100, buckets = 1024)
        .orderBy("rank")
    }),
    // PMI collocation mining: exact integer unigram/bigram counts, fixed
    // three-ln fold rounded to 4dp, rank tie-broken by the shared
    // polynomial hash — the q100/q101 determinism recipe
    "q102_pmi_collocations" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      Phrases.pmiCollocations(d, "text", k = 50, minCount = 5L)
        .orderBy("rank")
    }),
    // n-gram novelty vs the src0 slice: distinct trigrams per doc, absent
    // grams counted via a polyHash join both engines replay exactly
    "q103_ngram_novelty" -> ((s, dir) => {
      val d = Tables(s, dir).documentsSpread
      Novelty.ngramNovelty(d, d.filter(col("source") === "src0"),
          "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),
    // TF-IDF keyword extraction: exact integer tf/df/N, one multiply by
    // ln of an exact integer ratio rounded to 4dp, per-doc rank
    // tie-broken by the shared polynomial hash — the q102 rank recipe
    "q104_tfidf_keywords" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      Keywords.tfidfKeywords(d, "doc_id", "text", k = 5)
        .orderBy("doc_id", "rank")
    }),
    // content-defined (LBFS/Rabin) chunking: boundaries from the exact
    // 5-gram winnowing hash arithmetic, min-length fold, md5 chunk keys —
    // per-row map work both engines replay byte-for-byte
    "q105_content_chunks" -> ((s, dir) => {
      val d = Tables(s, dir).documentsSpread
      Chunk.contentChunks(d, "doc_id", "text", divisor = 64, minLen = 32)
        .orderBy("doc_id", "chunk_id")
    }),
    // ---- deterministic-subset variants of the interpreter-bound scoring
    // queries (q100/q101/q103/q105): corpus-level MODELS are still built
    // over the FULL corpus; only the scored-document set is restricted to
    // the ~1.6% md5-picked sample both engines select identically. This
    // is the oracle harness that makes these queries verifiable at
    // sf1.0 (the DuckDB side is interpreter-bound on per-token/per-char
    // list lambdas, so it scores 1/64th of the documents), and the
    // "score a slice against corpus statistics" shape is a real pipeline
    // operation in its own right.
    "q100s_lm_sampled" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      val model = LanguageModel.trainBigram(
        d.filter(col("source") === "src0"), "text")
      LanguageModel.perplexityScore(d.filter(oracleSample(col("doc_id"))),
          "doc_id", "text", model)
        .orderBy("doc_id")
    }),
    "q101s_dsir_sampled" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      Importance.dsirResampleAmong(d, d.filter(col("lang") === "en"),
          oracleSample(col("doc_id")), "doc_id", "text", k = 100,
          buckets = 1024)
        .orderBy("rank")
    }),
    "q103s_novelty_sampled" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      Novelty.ngramNovelty(d.filter(oracleSample(col("doc_id"))),
          d.filter(col("source") === "src0"), "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),
    // sf1.0 heavy-tail s-variants (the q100s pattern): q182/q217/q227
    // are linear-in-input/priced but together would dominate an sf1.0
    // bench — sampled twins keep the per-query cost bounded while the
    // full-input originals stay gated at sf≤0.1.
    "q182s_png_codec_sampled" -> ((s, dir) => {
      import s.implicits._
      val media = Tables(s, dir).documents
        .filter(oracleSampleAt(col("doc_id"), "20"))
        .select(col("doc_id")).as[Long]
        .map { d =>
          val px = Array.tabulate(256) { i =>
            val x = i % 16; val y = i / 16
            ((d * 31L + x * 7L + y * 13L) % 256L).toInt
          }
          Multimodal.MediaRecord(d, "image", Multimodal.encodeGrayPng(16, 16, px))
        }.toDF()
      Multimodal.grayStats(media, Multimodal.ImageIOCodec, 16, 16)
        .toDF().orderBy("doc_id")
    }),
    "q217s_item_neighbors_sampled" -> ((s, dir) => {
      val t = Tables(s, dir)
      val inter = t.orders.filter(col("o_custkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t.lineitem.select(col("l_orderkey").as("o_orderkey"),
          col("l_partkey")), Seq("o_orderkey"))
        .filter(oracleSampleAt(col("l_partkey"), "40"))
        .select(col("o_custkey"), col("l_partkey"))
      Similarity.itemNeighbors(inter, "o_custkey", "l_partkey",
          k = 5, minCo = 2L)
        .orderBy("item", "rank")
    }),
    "q227s_glove_cooc_sampled" -> ((s, dir) => {
      Phrases.gloveCooc(
          Tables(s, dir).documents.filter(oracleSampleAt(col("doc_id"), "20")),
          "text", window = 4, k = 100)
        .orderBy("rank")
    }),
    "q237s_substring_removals_sampled" -> ((s, dir) => {
      Dedup.exactSubstringRemovals(
          Tables(s, dir).documents.filter(oracleSampleAt(col("doc_id"), "40")),
          "doc_id", "text", k = 25)
        .orderBy("doc_id", "span_start")
    }),
    "q105s_chunks_sampled" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      Chunk.contentChunks(d.filter(oracleSample(col("doc_id"))),
          "doc_id", "text", divisor = 64, minLen = 32)
        .orderBy("doc_id", "chunk_id")
    }),
    // corpus-health dashboard per source: exact token/vocab/hapax counts,
    // Zipf slope over the top-100 ranks via fixed-order fold of four
    // sums — ln args are exact integers, tie-break is the shared hash
    "q106_corpus_health" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      Profile.corpusHealth(d, "source", "text", topN = 100)
        .orderBy("source")
    }),
    // deterministic k-per-group sample: bottom-k of the md5 hash order via
    // the O(k) TopK heap — the oracle replays the identical order as a
    // plain ORDER BY md5(key || ':samplek')
    "q107_sample_k" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      Sampling.sampleKPerGroup(d, Seq("source"), "doc_id", k = 3)
        .orderBy("source", "rank")
    }),
    // KMV set-operation sketches: per-source bottom-64 content-fingerprint
    // hashes, pairwise distinct/jaccard/intersection ESTIMATES replayed
    // exactly by the oracle (pure functions of the data — no tolerance)
    "q108_kmv_overlap" -> ((s, dir) => {
      val d = Tables(s, dir).documents.withColumn("fp", md5(col("text")))
      SetSketch.kmvOverlapMatrix(
          SetSketch.kmvPerGroup(d, Seq("source"), "fp", k = 64),
          "source", k = 64)
        .orderBy("ga", "gb")
    }),
    // STREAMING recovery gate #4 — the WINDOWED-AGGREGATION state store
    // across a restart (q301 = sink/offsets, q303 = mapGroupsWithState,
    // q309 = stream-stream join state; this is the StateStoreSave
    // surface, the last stateful operator without a restart gate).
    // Events split at the median µs timestamp; run 1 drains the early
    // half in COMPLETE mode (foreachBatch overwrites the sink with the
    // full aggregate state each commit), the query TERMINATES, the late
    // half arrives, a NEW query on the SAME checkpoint drains it. The
    // final sink equals the whole-corpus hourly aggregate ONLY if run 2
    // recovered run 1's per-window partial sums — a lost store zeroes
    // every early-half window and hash-mismatches q285's batch oracle.
    "q314_windowed_agg_restart" -> ((s, dir) => {
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q314_out")
      val ckpt = StreamStage.tempDir("graft_q314_ckpt")
      val arrive = StreamStage.tempDir("graft_q314_in")
      val ev = Tables(s, dir).events
        .filter(col("ts").isNotNull && col("event_type").isNotNull)
        .select(col("ts"), col("event_type"),
          (coalesce(col("value").cast("decimal(18,6)"),
            lit(0L).cast("decimal(18,6)")) * 1000000L)
            .cast("long").as("value"))
      val mm = ev.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).collect()(0)
      val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
      val parts = StreamStage.stagedInputParts("q314", dir, Seq(
        () => ev.filter(unix_micros(col("ts")) < cut),
        () => ev.filter(unix_micros(col("ts")) >= cut)))
      def arrivePart(p: String): Unit = {
        val src = java.nio.file.Paths.get(parts, p)
        val dst = java.nio.file.Paths.get(arrive, p)
        java.nio.file.Files.createDirectories(dst)
        val ls = java.nio.file.Files.list(src)
        try ls.forEach { f =>
          if (f.getFileName.toString.endsWith(".parquet"))
            java.nio.file.Files.copy(f, dst.resolve(f.getFileName)): Unit
        } finally ls.close()
      }
      val ss = StreamStage.scaledSession(s, Seq(parts))
      def drain(): Unit = {
        val stream = ss.readStream.schema(ev.schema)
          .option("pathGlobFilter", "*.parquet").parquet(arrive + "/*")
        StreamingOps.windowedCounts(stream)
          .writeStream
          .outputMode("complete")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.write.mode("overwrite").parquet(sink): Unit
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
          .awaitTermination()
      }
      arrivePart("p000"); drain()
      arrivePart("p001"); drain() // new query, same checkpoint
      s.read.parquet(sink).orderBy("window_start", "event_type")
    }),
    // Binary-quantized ANN (the BQ serving mode vector stores run as the
    // first-stage filter): sign-bit codes packed 64/long, full-corpus
    // Hamming scan via XOR+popcount (1/32nd the bytes of a float scan),
    // 4k shortlist per query, exact cosine re-rank. The oracle replays
    // the IDENTICAL semantics — per-dim sign-mismatch count (packing is
    // a layout choice, not a semantic one), same (h, id) shortlist
    // order, same re-rank arithmetic as q171's brute force.
    "q315_ann_binary_quant" -> ((s, dir) => {
      val t = Tables(s, dir)
      val q = t.embeddings.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      Similarity.hammingTopK(t.embeddings, "vec_id", "embedding", q,
          k = 10, shortlistFactor = 4)
        .orderBy("query_id", "rank")
    }),
    // Weighted label propagation (Raghavan §IV) on q307's count-weighted
    // co-supplier graph — the last member of the weighted graph family
    // (PR/PPR/Louvain/modularity already have wCol): adopt the label
    // with the largest incident weight sum, min-label ties, 3 fixed
    // rounds, exact decimal weights symmetrized by two-direction sum.
    // The oracle replays the rounds with HUGEINT sums verbatim.
    "q316_label_propagation_weighted" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("a"))
        .join(li.select(col("ok"), col("sk").as("b")), "ok")
        .filter(col("a") =!= col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w"))
      Graph.labelPropagation(edges, "a", "b", iters = 3, wCol = Some("w"))
        .orderBy("node")
    }),
    // STREAMING recovery gate #5 — the DEDUP state store across a
    // restart (the StreamingDeduplicate surface; q284 gates only the
    // in-batch drop). Run 1 drains the corpus ONCE and terminates with
    // every event_id in dedup state; a NEW query on the SAME checkpoint
    // then drains an exact second copy. The watermark delay spans the
    // whole dataset (nothing is ever late, nothing evicts), so every
    // run-2 row can be dropped ONLY by recovered dedup state — a lost
    // store re-admits the entire copy and doubles the sink. Oracle:
    // the distinct corpus, q284's.
    "q317_dedup_stream_restart" -> ((s, dir) => {
      import graft.streaming.StreamStage
      val sink = StreamStage.tempDir("graft_q317_out")
      val ckpt = StreamStage.tempDir("graft_q317_ckpt")
      val arrive = StreamStage.tempDir("graft_q317_in")
      val ev = Tables(s, dir).events
        .filter(col("event_id").isNotNull && col("ts").isNotNull)
        .select(col("event_id").cast("long").as("event_id"), col("ts"),
          col("event_type"), col("value").cast("double").as("value"))
      val parts = StreamStage.stagedInputParts("q317", dir, Seq(
        () => ev, () => ev)) // the corpus, then its exact duplicate copy
      def arrivePart(p: String): Unit = {
        val src = java.nio.file.Paths.get(parts, p)
        val dst = java.nio.file.Paths.get(arrive, p)
        java.nio.file.Files.createDirectories(dst)
        val ls = java.nio.file.Files.list(src)
        try ls.forEach { f =>
          if (f.getFileName.toString.endsWith(".parquet"))
            java.nio.file.Files.copy(f, dst.resolve(f.getFileName)): Unit
        } finally ls.close()
      }
      val ss = StreamStage.scaledSession(s, Seq(parts))
      def drain(): Unit = {
        val stream = ss.readStream.schema(ev.schema)
          .option("pathGlobFilter", "*.parquet").parquet(arrive + "/*")
        stream.withWatermark("ts", "36500 days")
          .dropDuplicatesWithinWatermark("event_id")
          .writeStream
          .outputMode("append")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.write.mode("append").parquet(sink): Unit
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
          .awaitTermination()
      }
      arrivePart("p000"); drain()
      arrivePart("p001"); drain() // new query, same checkpoint
      s.read.parquet(sink).orderBy("event_id")
    }),
    // STREAMING recovery gate #6 — native session_window state across a
    // restart (the session-merging state store, a DIFFERENT format from
    // q314's plain windowed agg: restart must reload OPEN sessions and
    // MERGE run-2 events into them). Events split at the median µs
    // timestamp; run 1 drains the early half (open sessions parked in
    // state — the watermark never passes them), the query TERMINATES,
    // run 2 on the SAME checkpoint drains the late half plus q290's two
    // far-future sentinels. Every session spanning the cut exists in
    // the sink ONLY if run 2 merged its run-1 prefix out of recovered
    // state — a lost store splits it in two and hash-mismatches q290's
    // whole-corpus exact-gap oracle.
    "q318_session_window_restart" -> ((s, dir) => {
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q318_out")
      val ckpt = StreamStage.tempDir("graft_q318_ckpt")
      val arrive = StreamStage.tempDir("graft_q318_in")
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("value").isNotNull)
        .select(col("user_id").cast("long").as("user_id"), col("ts"),
          (col("value").cast("decimal(18,6)") * 1000000L)
            .cast("long").as("value"))
      def sentinel(ts: String) = s.range(1).select(
        lit(-1L).as("user_id"), lit(ts).cast("timestamp").as("ts"),
        lit(0L).as("value"))
      val mm = ev.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).collect()(0)
      val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
      val parts = StreamStage.stagedInputParts("q318", dir, Seq(
        () => ev.filter(unix_micros(col("ts")) < cut),
        () => ev.filter(unix_micros(col("ts")) >= cut),
        () => sentinel("2124-01-01 00:00:00"),
        () => sentinel("2124-02-01 00:00:00")))
      def arrivePart(p: String): Unit = {
        val src = java.nio.file.Paths.get(parts, p)
        val dst = java.nio.file.Paths.get(arrive, p)
        java.nio.file.Files.createDirectories(dst)
        val ls = java.nio.file.Files.list(src)
        try ls.forEach { f =>
          if (f.getFileName.toString.endsWith(".parquet"))
            java.nio.file.Files.copy(f, dst.resolve(f.getFileName)): Unit
        } finally ls.close()
      }
      val ss = StreamStage.scaledSession(s, Seq(parts))
      def drain(): Unit = {
        val stream = ss.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .option("pathGlobFilter", "*.parquet").parquet(arrive + "/*")
        StreamingOps.sessionWindowStats(stream)
          .writeStream
          .outputMode("append")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.write.mode("append").parquet(sink): Unit
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
          .awaitTermination()
      }
      arrivePart("p000"); drain()
      arrivePart("p001"); arrivePart("p002"); arrivePart("p003")
      drain() // new query, same checkpoint
      s.read.parquet(sink).filter(col("user_id") >= 0L)
        .orderBy("user_id", "session_start")
    }),
    // WordPiece merge training (Schuster & Nakajima 2012) — the THIRD
    // tokenizer trainer beside BPE (q133, frequency argmax) and
    // unigram-LM (q311, EM pruning): same corpus representation and
    // greedy merge fold as BPE, selection by the likelihood score
    // count(pair)/(count(left)·count(right)). The argmax is EXACT
    // rational order via the RationalArgMax custom aggregate (BigInteger
    // cross-multiplication, O(1) map-combinable state); the oracle
    // replays it as a HUGEINT cross-multiplication NOT-EXISTS anti-join
    // over 8 unrolled iterations. A double-rounded score, drifted count,
    // or wrong tie order all hash-mismatch.
    "q319_wordpiece_merges" -> ((s, dir) => {
      WordPiece.train(Tables(s, dir).documents, "text", merges = 8)
        .orderBy("step")
    }),
    // The WordPiece SERVING path (q158/q312's twin): train q319's rules,
    // derive the piece vocabulary (every seen character + the merged
    // symbols), then MAXIMAL-MUNCH encode — the published WordPiece
    // tokenization rule (longest vocab piece at each position, left to
    // right), which differs from BPE's merge replay — and report
    // per-(lang, source) fertility. Words capped at 12 chars in both
    // engines so the oracle's walk unroll is finite; the encode runs
    // once per DISTINCT word with the vocabulary broadcast.
    "q320_wordpiece_fertility" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      // trainMerges AND vocabulary both consume the corpus-scale word
      // aggregation: one materialization instead of two executions
      val words = Bpe.wordFrequencies(docs, "text").localCheckpoint(false)
      val rules = WordPiece.trainMerges(words, "word", "weight", merges = 8)
      val vocab = WordPiece.vocabulary(words, "word", rules)
      WordPiece.fertility(docs, "text", Seq("lang", "source"), vocab,
          maxPieceLen = 12, maxWordLen = 12)
        .orderBy("lang", "source")
    }),
    // Weighted s-core (Eidsaa & Almaas 2013) — q185's weighted sibling,
    // with a planted CLOSED-FORM truth that discriminates strength from
    // degree: per even key a K6 clique (w=1, strength 5, survives s=5), a
    // light pendant (w=4 — degree-1 AND strength-4, peels), a HEAVY
    // pendant split into two parallel edges w=2+w=3 (degree 1 but
    // strength 5 — SURVIVES where k-core at k=5 would peel it; also pins
    // parallel-edge summation), and a 2-hop cascade (w=4 then w=1 — the
    // tail peels first, only then the middle). Per odd key a w=1 star
    // that dissolves in two rounds. The oracle states the surviving core
    // directly; any under-/over-peel or a dropped parallel edge breaks it.
    "q321_score_weighted" -> ((s, dir) => {
      val ck = Tables(s, dir).customer.select(col("c_custkey").as("b"))
      val cliquePairs = (for {
        i <- 0 until 6; j <- (i + 1) until 6
      } yield (i, j, 1)) ++ Seq((0, 6, 4), (1, 7, 2), (1, 7, 3), (2, 8, 4),
        (8, 9, 1))
      val even = ck.filter(col("b") % 2 === 0)
        .select(col("b"), explode(array(cliquePairs.map { case (i, j, w) =>
          struct(lit(i).as("i"), lit(j).as("j"), lit(w).as("w"))
        }: _*)).as("p"))
        .select((col("b") * 100 + col("p.i")).as("ea"),
          (col("b") * 100 + col("p.j")).as("eb"), col("p.w").as("w"))
      val odd = ck.filter(col("b") % 2 === 1)
        .select(col("b"), explode(array((1 to 5).map(lit(_)): _*)).as("j"))
        .select((col("b") * 100).as("ea"), (col("b") * 100 + col("j")).as("eb"),
          lit(1).as("w"))
      Graph.sCore(even.unionByName(odd), "ea", "eb", "w", s = 5)
        .orderBy("node")
    }),
    // Hilbert-curve layout audit — space-filling curve #2 beside q281's
    // Z-order (both are documented lakehouse clustering keys): the SAME
    // (user bucket, hour bucket) 10-bit space and 16 closed-form ranges,
    // keyed by the xy2d walk (quadrant Gray code + rotate/reflect,
    // published algorithm) instead of Morton interleave. The oracle
    // unrolls the 10 levels as CTEs with division-based bit tests; a
    // wrong quadrant order, reflection, or swap scatters rows across
    // buckets and hash-mismatches.
    "q322_hilbert_audit" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(pmod(col("user_id"), lit(1024L)).as("x"),
          pmod(expr("unix_micros(ts) div 3600000000"), lit(1024L)).as("y"))
      Layout.hilbertAudit(ev, "x", "y", bits = 10, nFiles = 16)
        .orderBy("bucket")
    }),
    // JL-projected SERVING eval (q259's Matryoshka twin for the q117
    // projection): project corpus AND queries with the EXISTING
    // randomProjectSigns (64→16, same md5 sign rule q117 gates
    // coordinate-for-coordinate), run the identical brute-force cosine
    // ranking in projected space, flag each row against the exact
    // top-10 — the downstream evidence that the 4×-fewer-bytes first
    // stage actually ranks, which coordinates alone can't show.
    // Projected cosines are bit-identical cross-engine (sequential
    // folds + one /√k both sides).
    "q323_jl_serving_eval" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings
      def pv(c: Column) = VectorFunctions.randomProjectSigns(c, 64, 16)
      val corpus = emb.select(col("vec_id"), pv(col("embedding")).as("pvec"))
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          pv(col("embedding")).as("query_vec"))
      val proj = Similarity.bruteForceTopK(corpus, "vec_id", "pvec",
        queries, k = 10)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"),
          col("embedding").as("query_vec")), k = 10)
      proj.join(exact.select(col("query_id"), col("neighbor_id"),
          lit(true).as("in_exact_top10")),
          Seq("query_id", "neighbor_id"), "left")
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("score"),
          coalesce(col("in_exact_top10"), lit(false)).as("in_exact_top10"))
        .orderBy("query_id", "rank")
    }),
    // Barrat weighted clustering coefficient (PNAS 2004) on q175's
    // co-supplier graph with the NATURAL weights (one w=1 edge per
    // shared order — the operator's parallel-edge summation builds the
    // co-occurrence counts itself): per node, the strength share engaged
    // in triangles, tri_mass/(s·(k−1)). With w ≡ 1 this is exactly the
    // unweighted 2T/(k(k−1)); here the weights discount nodes whose
    // heavy co-occurrence edges close no triangles. Exact integer
    // masses, one double division; degree-ordered orientation keeps hub
    // wedges O(√m).
    "q324_weighted_clustering" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("a"))
        .join(li.select(col("ok"), col("sk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"), lit(1L).as("w"))
      Graph.clusteringCoefficientWeighted(edges, "a", "b", "w")
        .orderBy("node")
    }),
    // Two-sample Kolmogorov-Smirnov per event type (q187's
    // distribution-shift companion): md5 user split into two arms,
    // values in exact micro-units, D as an INTEGER max of
    // cross-multiplied ECDF deviations (no float inside the sup), one
    // double division + the λ scaling after. The oracle replays the
    // same integer window fold; a drifted cumulative, tie order, or
    // degenerate-arm lane all mismatch.
    "q325_ks_test" -> ((s, dir) => {
      val arm = when(substring(md5(concat(col("user_id").cast("string"),
        lit(":ks"))), 1, 1) < "8", lit("a")).otherwise(lit("b"))
      val units = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("event_type"),
          (col("value").cast("decimal(18,6)") * 1000000L)
            .cast("long").as("v"), arm.as("arm"))
      Experiment.ksTest(units, Seq("event_type"), "arm", "v", "a", "b")
        .orderBy("event_type")
    }),
    // Weighted (strength) assortativity (Leung & Chau 2007) — q195's
    // weighted sibling on the SAME co-supplier graph, weights = summed
    // shared-order counts (parallel-edge summation again builds them):
    // do heavy co-suppliers sit next to other heavy co-suppliers?
    // Exact decimal(38,0) sufficient statistics, the q195 double chain,
    // one-row verdict.
    "q326_weighted_assortativity" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("a"))
        .join(li.select(col("ok"), col("sk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"), lit(1L).as("w"))
      Graph.assortativityWeighted(edges, "a", "b", "w")
    }),
    // Weighted harmonic centrality from landmarks — the
    // weighted-DISTANCE centrality the hop-based q255 can't express:
    // q215's weighted co-supplier graph and bounded Bellman-Ford (exact
    // integer distances, ≤ 4 edges — the bounded-horizon contract),
    // then the q255 fold with hops swapped for weighted distance. The
    // oracle unrolls the relaxations per landmark and replays the
    // distance-ordered 1/d fold; absent landmarks report (0, 0.0).
    "q327_weighted_harmonic" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("src"))
        .join(li.select(col("ok"), col("sk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          (lit(1L) + (col("src") + col("dst")) % 9L).as("w"))
      Graph.harmonicCentralityWeighted(edges, "src", "dst", "w",
          landmarks = Seq(2L, 3L, 5L, 8L), rounds = 4)
        .orderBy("landmark")
    }),
    // CHAINED STATEFUL OPERATORS in one streaming query (18th streaming
    // row; the multiple-stateful-operator support of Spark 3.4+/4.x):
    // the q270 stream-stream interval join feeds a WINDOWED AGGREGATION
    // downstream — per attribution hour, pair count + total view→
    // purchase delay. Two stateful operators, two state stores, one
    // watermark chain: q306's far-future sentinels advance the
    // watermark so the real windows finalize in append mode (the
    // sentinel pair's own 2100 window never finalizes and never emits).
    // Oracle: the batch interval join + hour bucket. A window emitted
    // early (partial), never (stuck watermark propagation), or twice
    // all hash-mismatch.
    "q328_chained_join_window_stream" -> ((s, dir) => {
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q328_out")
      val ckpt = StreamStage.tempDir("graft_q328_ckpt")
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_type"))
      val sch = ev.select("user_id", "ts").schema
      def sentinel = s.range(1)
        .select(lit(-1L).cast(sch("user_id").dataType).as("user_id"),
          lit("2100-01-01 00:00:00").cast("timestamp").as("ts"))
      val stagingL = StreamStage.stagedInputParts("q328l", dir, Seq(
        () => ev.filter(col("event_type") === "view").select("user_id", "ts"),
        () => sentinel))
      val stagingR = StreamStage.stagedInputParts("q328r", dir, Seq(
        () => ev.filter(col("event_type") === "purchase").select("user_id", "ts"),
        () => sentinel))
      val ss = StreamStage.scaledSession(s, Seq(stagingL, stagingR))
      def src(p: String) = ss.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(p + "/*")
      val joined = StreamingOps.intervalJoinStream(src(stagingL),
        src(stagingR), "user_id", "ts", maxDelaySec = 3600L)
      val agg = joined
        .groupBy(window(col("right_ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("delay_sec")).as("delay_sum"))
        .select(col("w.start").as("window_start"), col("n_pairs"),
          col("delay_sum"))
      agg.writeStream
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(sink): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
      s.read.parquet(sink)
        .filter(col("window_start") < lit("2099-01-01").cast("timestamp"))
        .orderBy("window_start")
    }),
    // CHAINED WINDOW AGGREGATIONS (19th streaming row) — the OTHER
    // multiple-stateful shape beside q328's join→agg: 5-minute partial
    // aggregates re-aggregated into 1-hour rollups IN ONE QUERY
    // (groupBy(window(window_col, ...)) on the upstream window struct —
    // the streaming downsampling cascade that replaces a two-job
    // pipeline with one watermark chain). Exact micro-unit sums ride
    // both levels; one far-future sentinel finalizes the cascade.
    // Oracle: hour buckets of the same corpus — identical BY
    // ASSOCIATIVITY of integer sums, so a partial 5-min window emitted
    // early or dropped between levels hash-mismatches.
    "q329_chained_window_rollup_stream" -> ((s, dir) => {
      import graft.streaming.StreamStage
      val sink = StreamStage.tempDir("graft_q329_out")
      val ckpt = StreamStage.tempDir("graft_q329_ckpt")
      val ev = Tables(s, dir).events
        .filter(col("ts").isNotNull && col("event_type").isNotNull)
        .select(col("ts"), col("event_type"),
          (coalesce(col("value").cast("decimal(18,6)"),
            lit(0L).cast("decimal(18,6)")) * 1000000L)
            .cast("long").as("value"))
      def sentinel = s.range(1)
        .select(lit("2100-01-01 00:00:00").cast("timestamp").as("ts"),
          lit("view").as("event_type"), lit(0L).as("value"))
      val staging = StreamStage.stagedInputParts("q329", dir, Seq(
        () => ev, () => sentinel))
      val ss = StreamStage.scaledSession(s, Seq(staging))
      val stream = ss.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(staging + "/*")
      val fine = stream
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes").as("w5"), col("event_type"))
        .agg(count(lit(1)).as("n5"), sum(col("value")).as("v5"))
      val coarse = fine
        .groupBy(window(col("w5"), "1 hour").as("w"), col("event_type"))
        .agg(sum(col("n5")).as("n_events"), sum(col("v5")).as("value_sum"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"), col("value_sum"))
      coarse.writeStream
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(sink): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
      s.read.parquet(sink)
        .filter(col("window_start") < lit("2099-01-01").cast("timestamp"))
        .orderBy("window_start", "event_type")
    }),
    // CHAINED-QUERY kill-and-restart (20th streaming row): q328's
    // join→window pipeline stopped mid-stream and resumed on the same
    // checkpoint — BOTH state stores plus source offsets must recover
    // coherently. Run 1 drains views + the EARLY purchase half (median
    // ts cut, the q318 device): early windows finalize and emit,
    // boundary windows park in the AGG store, unmatched views park in
    // the JOIN store. Run 2 (new query, same checkpoint) drains the
    // late half + sentinels: late pairs can only form against RECOVERED
    // join state, boundary windows complete only out of RECOVERED agg
    // state, and re-read offsets would double the early windows. Oracle
    // = q328's batch join + hour bucket over the whole corpus.
    "q330_chained_stateful_restart" -> ((s, dir) => {
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q330_out")
      val ckpt = StreamStage.tempDir("graft_q330_ckpt")
      val arriveL = StreamStage.tempDir("graft_q330_inl")
      val arriveR = StreamStage.tempDir("graft_q330_inr")
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_type"))
      val sch = ev.select("user_id", "ts").schema
      def sentinel = s.range(1)
        .select(lit(-1L).cast(sch("user_id").dataType).as("user_id"),
          lit("2100-01-01 00:00:00").cast("timestamp").as("ts"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts")
      val mm = pur.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).collect()(0)
      val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
      val partsL = StreamStage.stagedInputParts("q330l", dir, Seq(
        () => ev.filter(col("event_type") === "view").select("user_id", "ts"),
        () => sentinel))
      val partsR = StreamStage.stagedInputParts("q330r", dir, Seq(
        () => pur.filter(unix_micros(col("ts")) < cut),
        () => pur.filter(unix_micros(col("ts")) >= cut),
        () => sentinel))
      def arrivePart(parts: String, arrive: String, p: String): Unit = {
        val src = java.nio.file.Paths.get(parts, p)
        val dst = java.nio.file.Paths.get(arrive, p)
        java.nio.file.Files.createDirectories(dst)
        val ls = java.nio.file.Files.list(src)
        try ls.forEach { f =>
          if (f.getFileName.toString.endsWith(".parquet"))
            java.nio.file.Files.copy(f, dst.resolve(f.getFileName)): Unit
        } finally ls.close()
      }
      val ss = StreamStage.scaledSession(s, Seq(partsL, partsR))
      def drain(): Unit = {
        def src(p: String) = ss.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1)
          .option("pathGlobFilter", "*.parquet").parquet(p + "/*")
        val joined = StreamingOps.intervalJoinStream(src(arriveL),
          src(arriveR), "user_id", "ts", maxDelaySec = 3600L)
        joined
          .groupBy(window(col("right_ts"), "1 hour").as("w"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("delay_sec")).as("delay_sum"))
          .select(col("w.start").as("window_start"), col("n_pairs"),
            col("delay_sum"))
          .writeStream
          .outputMode("append")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.write.mode("append").parquet(sink): Unit
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
          .awaitTermination()
      }
      arrivePart(partsL, arriveL, "p000")
      arrivePart(partsR, arriveR, "p000")
      drain()
      arrivePart(partsL, arriveL, "p001")
      arrivePart(partsR, arriveR, "p001")
      arrivePart(partsR, arriveR, "p002")
      drain() // new query, same checkpoint
      s.read.parquet(sink)
        .filter(col("window_start") < lit("2099-01-01").cast("timestamp"))
        .orderBy("window_start")
    }),
  )
}
