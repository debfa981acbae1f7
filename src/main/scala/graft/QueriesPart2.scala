package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Sketches, TopK, VecDot, VectorFunctions}
import graft.operators.{AsOf, Audit, BloomJoin, Bpe, Chunk, Classifier, Coreset, Dedup, DupClusters, Experiment, Features, Graph, Importance, IncrementalDedup, Intervals, IvfIndex, Keywords, LanguageModel, Layout, Linkage, Multimodal, Novelty, Pack, Phrases, Pq, Preference, Profile, Quantiles, RangeJoin, Ranks, Resample, Retention, Retrieval, Rfm, Sampling, Scd, Scrub, Sessionize, SetSketch, Similarity, SkewJoin, Snapshot, Spatial, TextAnalysis, Trend, Unigram}
import graft.sources.Tables


/** Mechanically split from SparkEntry (round 16, verdict item 8): the
  * single 12.8k-line file was the incremental-compile bottleneck — every
  * query edit recompiled the whole registry. Entries are UNCHANGED and
  * byte-identical to their pre-split form; [[SparkEntry]] composes the
  * parts. New entries go in the LAST part (or a new part when it grows
  * past ~100 entries). */
private[graft] trait QueriesPart2 { this: SparkEntry.type =>
  protected def queriesPart2: Map[String, (SparkSession, String) => DataFrame] = Map(
    // mergeable HLL distinct sketch: the gate asserts the ESTIMATE lands
    // within 5% of the exact distinct count (p=13 → ~1.2% se, so 5% is
    // >3σ; the oracle states TRUE, q49's convention). The exact count is
    // computed by both engines; the sketch's value at 100 TB is that the
    // 8 KB binary summary is mergeable across partitions/days without
    // rescanning (SketchesSpec asserts merged ≡ direct byte-identically)
    "q82_distinct_sketch" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("lang"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy("lang")
        .agg(countDistinct(col("fp")).as("n_exact"),
          Sketches.hllEstimate(Sketches.hllSketch(col("fp"), 13)).as("_est"))
        .select(col("lang"), col("n_exact"),
          (abs(col("_est") - col("n_exact")).cast("double") <=
            col("n_exact").cast("double") * 0.05).as("within_tol"))
        .orderBy("lang")
    }),
    // exact heavy hitters in two bounded-state passes: a Misra–Gries sweep
    // (O(capacity) aggregation state — never a vocabulary-sized shuffle)
    // nominates candidates, a second pass exact-counts ONLY candidates.
    // Exact whenever the k-th item's count > N/(capacity+1) — the MG
    // retention guarantee; the oracle is the full exact formulation
    "q83_freq_tokens" -> ((s, dir) => {
      val toks = Tables(s, dir).documents
        .select(col("lang"),
          explode(split(TextAnalysis.normalized(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val cand = toks.groupBy("lang")
        .agg(Sketches.freqItems(col("tok"), 512).as("fi"))
        .select(col("lang"), explode(col("fi.item")).as("tok"))
      val exact = toks.join(broadcast(cand), Seq("lang", "tok"), "left_semi")
        .groupBy("lang", "tok").count()
      // the window input is candidates only — bounded by langs × capacity
      val w = Window.partitionBy("lang").orderBy(col("count").desc, col("tok"))
      // tripwire: the two-pass plan is exact only while every per-lang
      // 10th count exceeds N/(capacity+1) — the MG retention bound. A
      // heavier-tailed corpus must fail LOUDLY here, not silently diverge
      // from the exact oracle. (langs × 10 rows; per-lang N is one agg.)
      val totals = toks.groupBy("lang").agg(count(lit(1)).as("_n"))
      exact.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 10)
        .join(broadcast(totals), "lang")
        .filter(assert_true(
          col("rnk") =!= 10 || col("count") * lit(513L) > col("_n"),
          lit("q83: MG capacity-512 retention bound violated — " +
            "candidate pass may drop a true top-10 token")).isNull)
        .select(col("lang"), col("rnk"), col("tok"), col("count").as("cnt"))
        .orderBy("lang", "rnk")
    }),
    // count-min point-frequency sketch, gated q82-style: exact per-token
    // counts computed by BOTH engines; the CM estimates are asserted to
    // sit in [exact, exact + 1% of stream] (never-undershoot is CM's
    // unconditional guarantee; the overshoot bound holds at e/width per
    // row with prob 1 - e^-depth) and the oracle states TRUE. The sketch
    // is built per SOURCE and merged — the incremental deployment shape
    "q98_countmin" -> ((s, dir) => {
      val toks = Tables(s, dir).documents
        .select(col("source"),
          explode(split(TextAnalysis.normalized(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val sk = toks.groupBy("source")
        .agg(Sketches.countMin(col("tok"), depth = 5, width = 4096).as("sk"))
        .agg(Sketches.countMinMerge(col("sk"), depth = 5, width = 4096).as("sk"))
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
      val total = toks.count()
      exact.crossJoin(broadcast(sk))
        .select(col("tok"), col("n_exact"),
          Sketches.countMinQuery(col("sk"), col("tok"), depth = 5).as("_est"))
        .select(col("tok"), col("n_exact"),
          (col("_est") >= col("n_exact") &&
            col("_est") <= col("n_exact") + lit(math.max(2L, total / 100)))
            .as("cm_ok"))
        .orderBy("tok")
    }),
    // perceptual average-hash over the media lane (stub codec for the
    // text-as-binary corpus — ASCII, so SQL byte access reproduces the
    // sampled grid exactly); emitted as a 64-char bit string to sidestep
    // cross-engine signed-int64 gymnastics on bit 63
    "q97_phash" -> ((s, dir) => {
      val media = Multimodal.asMedia(Tables(s, dir).documents, "doc_id", "text")
      Multimodal.perceptualHash(media).toDF()
        .select(col("doc_id"), lpad(bin(col("phash")), 64, "0").as("phash_bits"))
        .orderBy("doc_id")
    }),
    // ordered funnel (view -> click -> purchase): longest completed
    // prefix as a subsequence of each user's time-ordered events — pure
    // string/LIKE arithmetic over the q16 total order, replayed verbatim
    // day-one slice: over the full month every user completes the funnel
    // (degenerate gate); the first day spreads users across all 4 stages
    "q96_funnel" -> ((s, dir) => {
      val e = Tables(s, dir).events
        .filter(col("ts") < lit("2024-01-02 00:00:00").cast("timestamp"))
      Sessionize.funnelStages(e, "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"),
          tieBreak = Seq("event_id"))
        .groupBy("stage_reached").agg(count(lit(1)).as("n_users"))
        .orderBy("stage_reached")
    }),
    // partial-overlap candidate pairs (the MOSS step over q74's
    // fingerprints): exact integer rolling-hash arithmetic end-to-end, so
    // the oracle replays fingerprints, bucket cap, and pair counts. This
    // corpus's 31-token vocabulary makes char-5-gram fingerprints collide
    // pervasively (every doc pair shares some), so the query runs the
    // tight-cap/high-threshold configuration — the regime the cap exists
    // for — rather than the defaults meant for natural text
    "q95_winnow_overlap" -> ((s, dir) => {
      TextAnalysis.winnowOverlapPairs(Tables(s, dir).documentsSpread,
          "doc_id", "text", k = 5, w = 8, minShared = 8L, maxBucket = 16)
        .orderBy("id_a", "id_b")
    }),
    // BM25 top-k retrieval (Lucene positive-idf variant), self-retrieval
    // construction: the first five documents are the queries. Integer
    // tf/df/dl, exact-sum avgdl, fixed-order score fold (never a parallel
    // double sum); the oracle replays the identical fold via
    // list_reduce(list(... ORDER BY term))
    "q93_bm25_topk" -> ((s, dir) => {
      val d = Tables(s, dir).documentsSpread
      val q = d.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"), col("text").as("qtext"))
      Retrieval.bm25TopK(d, "doc_id", "text", q, "query_id", "qtext", k = 10)
        .orderBy("query_id", "rank")
    }),
    // Hybrid retrieval: RRF-fuse the lexical (BM25, q93's construction) and
    // semantic (brute-force cosine, q27's construction) per-query top-10
    // rankings for queries 0..4. Both fused inputs are query-sized tables, so
    // the fusion stage's cost is corpus-independent; the fused score is a
    // fixed-order fold over the list index (oracle replays it via
    // list_reduce(list(... ORDER BY li))).
    "q109_rrf_fusion" -> ((s, dir) => {
      val t = Tables(s, dir)
      val d = t.documentsSpread
      val q = d.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"), col("text").as("qtext"))
      val lexical = Retrieval.bm25TopK(d, "doc_id", "text", q, "query_id", "qtext", k = 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val qv = t.embeddings.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val semantic = Similarity.bruteForceTopK(t.embeddings, "vec_id", "embedding", qv, 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(Seq(lexical, semantic), "query_id", "doc_id", "rank", k = 10)
        .orderBy("query_id", "rank")
    }),
    // Corpus snapshot diff: synthesize a "next crawl" from documents —
    // drop ids ≡0 mod 97 (removed), uppercase text for ids ≡0 mod 89
    // (changed), append +1e6-keyed copies of ids ≡0 mod 101 (added) — and
    // classify every id by content fingerprint. One co-partitioned
    // full-outer join; both engines derive identical md5 fingerprints.
    "q110_snapshot_diff" -> ((s, dir) => {
      val d = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val next = d.filter(col("doc_id") % 97 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 89 === 0, upper(col("text"))).otherwise(col("text")))
        .unionByName(d.filter(col("doc_id") % 101 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Snapshot.diff(d, next, "doc_id", "text")
        .orderBy("doc_id")
    }),
    // ANN recall evaluation: recall@10 of the full-probe IVF index against
    // the exact brute-force ground truth. Full probing makes the expected
    // recall exactly 1.0 for every query — so the oracle is closed-form,
    // and any IVF mis-route/mis-rank surfaces as n_hit < n_true (hash
    // mismatch), the same equivalence contract as q41 expressed through
    // the evaluator the partial-probe configs are graded with.
    "q111_ann_recall" -> ((s, dir) => {
      val t = Tables(s, dir)
      val q = t.embeddings.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val exact = Similarity.bruteForceTopK(t.embeddings, "vec_id", "embedding", q, 10)
      val approx = IvfIndex.topK(t.embeddings, "vec_id", "embedding", q, k = 10,
        nCells = 16, nProbe = 16)
      Similarity.recallAtK(approx, exact).orderBy("query_id")
    }),
    // IVF recall in the PRODUCTION probe regime (nProbe=2 of 16 cells —
    // q111 only gates full probing, where recall is trivially 1): the
    // planted copies carry the query vector verbatim, so they share its
    // argmin cell, and the home cell is by definition among the nProbe
    // nearest — the exact top-10 (query + 9 copies at self-cosine 1.0,
    // above the natural ~0.6 ceiling) survives 8× cell pruning with
    // closed-form recall exactly 1.0. A mis-routed copy, a probe list
    // that skips the home cell, or a shortlist that drops planted rows
    // each pull n_hit below 10 (hash mismatch).
    "q156_ann_ivf_partial_recall" -> ((s, dir) => {
      val t = Tables(s, dir)
      val emb = t.embeddings.select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      // planted ids start past max(vec_id) instead of at a fixed stride —
      // a fixture ever reaching vec_id ≥ 100001 would collide planted and
      // real ids and silently invalidate the closed-form recall=1.0 oracle
      // (unlike q29/q71/q75, whose oracles bake the stride into the
      // EXPECTED ids, so a collision there fails loudly). 1-row bounded
      // collect, the q43 pattern.
      val base = emb.agg(max(col("vec_id"))).head.getLong(0) + 1L
      val copies = q
        .withColumn("j", explode(sequence(lit(0L), lit(9L))))
        .select((lit(base) + col("query_id") * 16L + col("j")).as("vec_id"),
          col("query_vec").as("embedding"))
      val corpus = emb.unionByName(copies)
      val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      val approx = IvfIndex.topK(corpus, "vec_id", "embedding", q, k = 10,
        nCells = 16, nProbe = 2)
      Similarity.recallAtK(approx, exact).orderBy("query_id")
    }),
    // Hard-negative mining (DPR-style): per query, the top-5 most-similar
    // vectors with a DIFFERENT label — exercised on the real embeddings
    // table against a full DuckDB brute-force replay (bit-identical score
    // doubles, same tie-break).
    "q157_hard_negatives" -> ((s, dir) => {
      val t = Tables(s, dir)
      val q = t.embeddings.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"),
          col("label").as("query_label"))
      Similarity.hardNegatives(t.embeddings, "vec_id", "embedding", "label", q, 5)
        .orderBy("query_id", "rank")
    }),
    // Tokenizer fertility per (lang, source): train 8 BPE merges on the
    // corpus, encode the vocabulary under them, report tokens/word and
    // chars/token per slice — the multilingual tokenizer-equity metric.
    "q158_bpe_fertility" -> ((s, dir) => {
      val t = Tables(s, dir)
      val rules = Bpe.train(t.documents, "text", merges = 8)
        .orderBy("step").collect()
        .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
      Bpe.fertility(t.documentsSpread, "text", Seq("lang", "source"), rules)
        .orderBy("lang", "source")
    }),
    // Pre-join skew audit: power-of-two depth histogram + Σdepth² self-join
    // cost mass per bucket over the (user_id, event_type) key — the "look
    // before you shuffle" profiler.
    "q159_key_skew_profile" -> ((s, dir) => {
      SkewJoin.keyDepthProfile(Tables(s, dir).events,
          Seq("user_id", "event_type"))
        .orderBy("depth_bucket")
    }),
    // Cohort retention on the event stream: 7-day epoch-grid periods,
    // first-active cohorts, per-(cohort, offset) active fractions.
    "q160_retention_cohorts" -> ((s, dir) => {
      Retention.cohortRetention(Tables(s, dir).events, "user_id", "ts",
          periodDays = 7)
        .orderBy("cohort_period", "period_offset")
    }),
    // Referential-integrity audit across three FK contracts: one natural
    // (no orphans) and two with deterministically-shrunk parents so the
    // orphan tallies are non-trivial at every SF.
    "q161_referential_audit" -> ((s, dir) => {
      val t = Tables(s, dir)
      def labeled(label: String, df: DataFrame) = df.withColumn("fk", lit(label))
      labeled("lineitem.l_orderkey->orders",
          Audit.referentialOrphans(t.lineitem, "l_orderkey", t.orders, "o_orderkey"))
        .unionByName(labeled("orders.o_custkey->customer_mod10",
          Audit.referentialOrphans(t.orders, "o_custkey",
            t.customer.filter(col("c_custkey") % 10 =!= 0), "c_custkey")))
        .unionByName(labeled("events.user_id->customer_lt100",
          Audit.referentialOrphans(t.events, "user_id",
            t.customer.filter(col("c_custkey") < 100), "c_custkey")))
        .orderBy("fk")
    }),
    // First-order event transition matrix (Markov pathing view): counts +
    // row-normalized probabilities per (state, next_state).
    "q162_event_transitions" -> ((s, dir) => {
      Sessionize.transitionMatrix(Tables(s, dir).events, "user_id", "ts",
          "event_type", tieBreak = Seq("event_id"))
        .orderBy("state", "next_state")
    }),
    // Per-type OLS value-vs-day trend: exact sufficient statistics
    // (decimal products), fixed-order double combine — bit-reproducible
    // slope/intercept/r² with no rounding.
    "q163_trend_fit" -> ((s, dir) => {
      val d = Tables(s, dir).events
        .withColumn("_day",
          floor(unix_micros(col("ts")).cast("double") / lit(86400.0e6))
            .cast("long"))
      Trend.trendFit(d, Seq("event_type"), "_day", "value")
        .orderBy("event_type")
    }),
    // Funnel latency: per converting user, whole seconds from first view
    // to first purchase (exact integer micro diff, floor-to-seconds);
    // users whose first purchase precedes any view are non-converters.
    "q170_time_to_convert" -> ((s, dir) => {
      Tables(s, dir).events
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("_fv"),
          min(when(col("event_type") === "purchase", col("ts"))).as("_fp"))
        .filter(col("_fv").isNotNull && col("_fp").isNotNull &&
          col("_fp") >= col("_fv"))
        .select(col("user_id"),
          ((unix_micros(col("_fp")) - unix_micros(col("_fv"))) / lit(1000000L))
            .cast("long").as("secs_to_convert"))
        .orderBy("user_id")
    }),
    // IVF persistence round-trip at the driver gate: buildIndex →
    // saveIndex (postings Hive-partitioned BY cell_id, so probes prune to
    // directories) → loadIndex → topKFromIndex, full probe, against q41's
    // brute-force oracle — the partition-pruned SERVING path end-to-end,
    // not just IvfIndexSpec's bit-identity pin. Scratch lives under
    // target/ (repo-owned), suffixed by the sf dir so SFs never collide.
    "q171_ann_ivf_persisted" -> ((s, dir) => {
      val t = Tables(s, dir)
      val q = t.embeddings.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val (cents, indexed) = IvfIndex.buildIndex(t.embeddings, "vec_id",
        "embedding", nCells = 16, iters = 2)
      val path = s"target/qtmp/ivf_q171_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.saveIndex(cents, indexed, path)
      val (lc, li) = IvfIndex.loadIndex(s, path)
      IvfIndex.topKFromIndex(lc, li, q, k = 10, nProbe = 16)
        .orderBy("query_id", "rank")
    }),
    // Incremental IVF ingest (q171's persisted index + the MergeByKey
    // upsert): build on the BASE corpus (vec_id % 4 != 3), save, upsert
    // one batch — the % 4 == 3 ids are NEW, the % 8 == 0 ids are
    // RE-INGESTED and must replace their postings, not duplicate them
    // (a duplicate would shift ranks and hash-mismatch) — touched cells
    // only, then full-probe serve from the mutated on-disk index. With
    // every cell probed the serve is exact, so the oracle is q171's
    // brute force over the WHOLE corpus, verbatim.
    "q273_ann_ivf_upsert" -> ((s, dir) => {
      val t = Tables(s, dir)
      val base = t.embeddings.filter(col("vec_id") % 4 =!= 3)
      val batch = t.embeddings.filter(col("vec_id") % 4 === 3 ||
        col("vec_id") % 8 === 0)
      val q = t.embeddings.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val (cents, indexed) = IvfIndex.buildIndex(base, "vec_id",
        "embedding", nCells = 16, iters = 2)
      val path = s"target/qtmp/ivf_q273_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.saveIndex(cents, indexed, path)
      IvfIndex.upsertIndex(s, path, batch, "vec_id", "embedding")
      val (lc, li) = IvfIndex.loadIndex(s, path)
      IvfIndex.topKFromIndex(lc, li, q, k = 10, nProbe = 16)
        .orderBy("query_id", "rank")
    }),
    // The maintenance step q273's ingest loop was missing: after the
    // upsert, audit cell occupancy (cellLoad), SPLIT the heaviest cell
    // 4 ways in place — fresh ids, retired hot id, only that cell's
    // partition rewritten — and serve full-probe from the mutated
    // on-disk index. Splitting refines the partition without touching
    // any posting's content, so the full-probe serve must STILL equal
    // q171's brute force over the whole corpus, verbatim (a lost or
    // double-assigned posting, a stale partition dir, or a centroid
    // table out of sync with the directories all hash-mismatch).
    "q302_ann_ivf_cell_split" -> ((s, dir) => {
      val t = Tables(s, dir)
      val base = t.embeddings.filter(col("vec_id") % 4 =!= 3)
      val batch = t.embeddings.filter(col("vec_id") % 4 === 3 ||
        col("vec_id") % 8 === 0)
      val q = t.embeddings.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val (cents, indexed) = IvfIndex.buildIndex(base, "vec_id",
        "embedding", nCells = 16, iters = 2)
      val path = s"target/qtmp/ivf_q302_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.saveIndex(cents, indexed, path)
      IvfIndex.upsertIndex(s, path, batch, "vec_id", "embedding")
      // the audit → repair loop: heaviest cell (deterministic tie on id)
      val hot = IvfIndex.cellLoad(s, path)
        .orderBy(col("n").desc, col("cell_id")).limit(1)
        .collect()(0).getInt(0)
      IvfIndex.splitCell(s, path, hot, kSub = 4, iters = 2)
      val (lc, li) = IvfIndex.loadIndex(s, path)
      // nProbe beyond the 19-cell post-split count = full probe (slice
      // truncates at the array end)
      IvfIndex.topKFromIndex(lc, li, q, k = 10, nProbe = 64)
        .orderBy("query_id", "rank")
    }),
    // The full maintenance LIFECYCLE q302 stops short of: build →
    // incremental upsert → hot-cell SPLIT → light-cell MERGE (the shrink
    // step a long-running ingest loop needs, since every split is
    // one-way-finer and cold sub-cells accumulate) → full-probe serve
    // from the compacted on-disk index. Merging re-homes postings
    // without touching their content, so the serve must STILL equal the
    // whole-corpus brute force verbatim — a lost/doubled posting, a
    // stale retired-cell directory, or a centroid table out of sync
    // with the directories all hash-mismatch.
    "q310_ann_ivf_cell_merge" -> ((s, dir) => {
      val t = Tables(s, dir)
      val base = t.embeddings.filter(col("vec_id") % 4 =!= 3)
      val batch = t.embeddings.filter(col("vec_id") % 4 === 3 ||
        col("vec_id") % 8 === 0)
      val q = t.embeddings.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val (cents, indexed) = IvfIndex.buildIndex(base, "vec_id",
        "embedding", nCells = 16, iters = 2)
      val path = s"target/qtmp/ivf_q310_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.saveIndex(cents, indexed, path)
      IvfIndex.upsertIndex(s, path, batch, "vec_id", "embedding")
      val hot = IvfIndex.cellLoad(s, path)
        .orderBy(col("n").desc, col("cell_id")).limit(1)
        .collect()(0).getInt(0)
      IvfIndex.splitCell(s, path, hot, kSub = 4)
      IvfIndex.mergeCells(s, path, minLoadFactor = 0.5)
      val (lc, li) = IvfIndex.loadIndex(s, path)
      IvfIndex.topKFromIndex(lc, li, q, k = 10, nProbe = 64)
        .orderBy("query_id", "rank")
    }),
    // The POLICY composition over the repair primitives: a 3-batch
    // ingest LOOP with a maintain() sweep (split every rebuild_hint
    // cell, then merge every below-floor cell, one audit snapshot per
    // sweep) between every upsert — the steady-state daily cadence a
    // 100 TB embedding store runs. After three drifted batches and
    // three sweeps the index has split and merged along the way, and
    // the full-probe serve must STILL equal whole-corpus brute force —
    // any posting lost/doubled across any sweep, or any id/directory/
    // centroid-table divergence, hash-mismatches.
    "q313_ann_ivf_maintain_loop" -> ((s, dir) => {
      val t = Tables(s, dir)
      val base = t.embeddings.filter(col("vec_id") % 4 === 0)
      val q = t.embeddings.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val (cents, indexed) = IvfIndex.buildIndex(base, "vec_id",
        "embedding", nCells = 12, iters = 2)
      val path = s"target/qtmp/ivf_q313_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.saveIndex(cents, indexed, path)
      (1 to 3).foreach { m =>
        val batch = t.embeddings.filter(col("vec_id") % 4 === m)
        IvfIndex.upsertIndex(s, path, batch, "vec_id", "embedding")
        IvfIndex.maintain(s, path, maxLoadFactor = 2.0,
          minLoadFactor = 0.5, kSub = 3)
      }
      val (lc, li) = IvfIndex.loadIndex(s, path)
      IvfIndex.topKFromIndex(lc, li, q, k = 10, nProbe = 4096)
        .orderBy("query_id", "rank")
    }),
    // Unigram-LM (SentencePiece-style) tokenizer training (Kudo 2018) —
    // the OTHER tokenizer next to BPE (q133): frequent-substring seed
    // vocabulary, ONE hard-EM round (integer-scored Viterbi best
    // segmentation per distinct word, ties to the longest piece), prune
    // to budget by use count. The oracle replays the identical integer
    // arithmetic: same substring mass, same floor(ln·1e6+0.5) scores,
    // the Viterbi DP unrolled position-by-position (words capped at 12
    // chars in BOTH engines so the unroll is finite), the same
    // smallest-predecessor backtrack, the same (n_uses DESC, piece)
    // prune. A wrong DP cell, tie order, or prune boundary all
    // hash-mismatch.
    "q311_unigram_vocab" -> ((s, dir) => {
      val words = Bpe.wordFrequencies(Tables(s, dir).documents, "text")
        .filter(length(col("word")) <= 12)
      Unigram.train(words, "word", "weight", maxLen = 4, seedTopK = 48,
          keepMulti = 24, emRounds = 1)
        .orderBy("piece")
    }),
    // The unigram SERVING path (q158 is BPE's twin): train q311's
    // vocabulary, derive +1-smoothed serving scores, Viterbi-ENCODE the
    // corpus under them (once per distinct word, scores broadcast), and
    // report per-(lang, source) fertility — tokens_per_word and
    // chars_per_token as single double divisions of exact integer
    // masses. The oracle replays train AND the second serving-side DP
    // unrolled; a drifted score, segmentation, or mass all
    // hash-mismatch.
    "q312_unigram_fertility" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val words = Bpe.wordFrequencies(docs, "text")
        .filter(length(col("word")) <= 12)
      val vocab = Unigram.train(words, "word", "weight", maxLen = 4,
        seedTopK = 48, keepMulti = 24, emRounds = 1)
      Unigram.fertility(docs, "text", Seq("lang", "source"),
          Unigram.servingScores(vocab), maxLen = 4, maxWordLen = 12)
        .orderBy("lang", "source")
    }),
    // REAL WAV codec at the driver gate (q126 gates only the stub byte
    // decode): deterministic PCM16 samples per doc
    // (s_j = ((doc_id·31 + j·7) mod 65536) − 32768, j < 256), containered
    // through WavCodec.encodePcm16 WITH an odd-sized LIST junk chunk (the
    // word-alignment pad exercised on every row), decoded back through the
    // strict RIFF walker, frame-sliced (4 × 64 samples at offsets i·64),
    // RMS + zero-crossings in true 16-bit sample space. The oracle replays
    // the identical integer samples relationally — a mis-parsed header,
    // wrong endianness, swapped byte order, or mis-sliced frame each
    // surface as a hash mismatch.
    "q172_wav_codec_features" -> ((s, dir) => {
      import s.implicits._
      val media = Tables(s, dir).documents.select(col("doc_id")).as[Long]
        .map { d =>
          val samples = Array.tabulate[Short](256) { j =>
            (((d * 31L + j * 7L) % 65536L) - 32768L).toShort
          }
          Multimodal.MediaRecord(d, "audio",
            Multimodal.WavCodec.encodePcm16(8000, 1, samples, junkChunk = true))
        }.toDF()
      Multimodal.audioFrameFeaturesPcm(media, Multimodal.WavCodec,
          nFrames = 4, frameSamples = 64)
        .toDF().orderBy("doc_id", "frame_idx")
    }),
    // Skew-proof transition matrix (q162's semantics through the bucketed
    // adjacent-pair split): within-bucket lead() windows partitioned on
    // (user, 6h bucket) + boundary pairs off per-bucket summary rows — a
    // firehose user spreads over buckets instead of one sort task. Oracle
    // is q162's single-window SQL verbatim: the split must be invisible.
    "q173_event_transitions_bucketed" -> ((s, dir) => {
      Sessionize.transitionMatrixBucketed(Tables(s, dir).events, "user_id",
          "ts", "event_type", tieBreak = Seq("event_id"), bucketHours = 6)
        .orderBy("state", "next_state")
    }),
    // Golden-record survivorship over the FULL linkage pipeline: q167's
    // synthesized person records → blocked candidates → weighted
    // agreement ≥ 0.5 → connected components → per-(entity, field)
    // majority vote with lexicographic ties. The oracle replays every
    // stage including the components (recursive min-reachable-id CTE),
    // so the CC labels themselves are cross-engine gated here, not just
    // the votes.
    "q174_golden_records" -> ((s, dir) => {
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
      val matched = Linkage.scoreFieldAgreement(pairs, records, "id",
          Seq(("phone", 0.5), ("first", 0.3), ("last", 0.2)))
        .filter(col("score") >= 0.5)
      Linkage.goldenRecords(records, "id", DupClusters.components(matched),
          Seq("phone", "first", "last"))
        .orderBy("entity_id", "field")
    }),
    // Degree-ordered triangle counting on the co-supplier graph
    // (suppliers sharing an order are linked; a deterministic 1-in-20
    // order sample keeps the graph at oracle-joinable density). The
    // orientation means a hub supplier contributes O(√m) wedges, not
    // degree² — the plan shape that survives a celebrity node.
    "q175_triangle_counts" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("a"))
        .join(li.select(col("ok"), col("sk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .select("a", "b")
      Graph.triangleCounts(edges, "a", "b").orderBy("node")
    }),
    // A/B experiment readout: deterministic md5 arm split (the splitTag
    // hex-threshold convention — first hex char < '8' is control),
    // conversion = any purchase event, user-level dedup, Wilson bounds +
    // pooled two-proportion z vs control. Counts are exact integers; all
    // doubles are fixed-order chains with planted z/z² literals.
    "q176_ab_experiment" -> ((s, dir) => {
      val ev = Tables(s, dir).events.select(
        when(substring(md5(concat(col("user_id").cast("string"), lit(":ab"))),
          1, 1) < "8", lit("control")).otherwise(lit("treatment")).as("arm"),
        col("user_id"),
        (col("event_type") === "purchase").as("converted"))
      Experiment.abReport(ev, "arm", "user_id", "converted", "control")
        .orderBy("arm")
    }),
    // Crawl-URL canonicalization: six deterministic messy-URL shapes per
    // doc (case soup, www, default ports, duplicate slashes, tracking
    // params, fragments, non-URLs) through Scrub.canonicalUrl; the oracle
    // re-synthesizes the URLs and replays the SAME two regex constants —
    // any divergence in a rule surfaces as a value mismatch.
    "q177_url_canonicalize" -> ((s, dir) => {
      val h8 = substring(md5(col("doc_id").cast("string")), 1, 8)
      val url = when(col("doc_id") % 6 === 0,
          concat(lit("https://WWW.Shop-"), h8, lit(".COM:443//products//"),
            h8, lit("/?utm_source=news&b=2&a=1#top")))
        .when(col("doc_id") % 6 === 1,
          concat(lit("http://Blog."), h8, lit(".org:80/posts/"), h8, lit("/")))
        .when(col("doc_id") % 6 === 2,
          concat(lit("HTTP://"), h8, lit(".net/a/b?gclid=x")))
        .when(col("doc_id") % 6 === 3, concat(lit("not a url "), h8))
        .when(col("doc_id") % 6 === 4, concat(lit("https://"), h8, lit(".com")))
        .otherwise(concat(lit("ftp://Files."), h8, lit(".com:21/data")))
      Tables(s, dir).documents
        .select(col("doc_id"), url.as("url"),
          Scrub.canonicalUrl(url).as("canonical_url"))
        .orderBy("doc_id")
    }),
    // CUPED variance reduction on the q176 experiment: unit = user, arm =
    // the same md5 split, covariate x = pre-period (before Jan 15) event
    // count, metric y = post-period value sum (exact decimal — never a
    // double-order-dependent sum). One pooled theta, per-arm adjusted
    // means; every double derives from exact integer micro-unit sums.
    "q178_cuped_adjust" -> ((s, dir) => {
      val cut = lit("2024-01-15 00:00:00").cast("timestamp")
      val arm = when(substring(md5(concat(col("user_id").cast("string"),
        lit(":ab"))), 1, 1) < "8", lit("control")).otherwise(lit("treatment"))
      val units = Tables(s, dir).events
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(when(col("ts") < cut, 1L).otherwise(0L)).as("x"),
          sum(when(col("ts") >= cut,
            coalesce(col("value").cast("decimal(18,6)"),
              lit(0L).cast("decimal(18,6)")))
            .otherwise(lit(0L).cast("decimal(18,6)"))).as("y"))
        .withColumn("arm", arm)
      Experiment.cupedAdjust(units, "arm", "y", "x").orderBy("arm")
    }),
    // nDCG@10: the exact cosine top-10 ranking evaluated against graded
    // judgments derived from the DOT-product top-15 (rel = 16 − rank) —
    // a real metric-agreement eval with non-trivial values. Discount
    // literals 1/log₂(i+1) are planted once in plan and oracle; both
    // folds run in sorted fixed order.
    "q179_ndcg_eval" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings.select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val ranked = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      val scored = emb.crossJoin(broadcast(q))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          graft.functions.VectorFunctions.dot(col("embedding"),
            col("query_vec")).as("_s"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("_s").desc, col("neighbor_id"))
      val rels = scored.withColumn("_r", row_number().over(w))
        .filter(col("_r") <= 15)
        .select(col("query_id"), col("neighbor_id"),
          (lit(16) - col("_r")).cast("double").as("rel"))
      Retrieval.ndcgAtK(ranked, "query_id", "neighbor_id", "rank",
          rels, "rel", 10)
        .orderBy("query_id")
    }),
    // Reliability-diagram calibration: md5-derived 6-decimal scores with
    // labels planted at P(label) ≈ score (second independent hash under
    // the score), binned by exact integer floor-division — a roughly
    // calibrated fixture whose per-bin gaps are real, small, and
    // bit-reproducible.
    "q180_calibration_bins" -> ((s, dir) => {
      def h6(tag: String) =
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(s":$tag"))), 1, 5), 16, 10).cast("long") % 1000000L
      val scored = Tables(s, dir).documents.select(
        (h6("cal").cast("double") / lit(1.0e6)).as("score"),
        (h6("lbl") < h6("cal")).as("label"))
      Classifier.calibrationBins(scored, "score", "label", nBins = 10)
        .orderBy("bin")
    }),
    // Benford first-digit audit on real money values (l_extendedprice —
    // the classic fabricated-figures screen): exact micro-unit leading
    // digits, planted log10 literals, digit-ordered chi-square fold.
    "q181_benford_audit" -> ((s, dir) => {
      Audit.benfordDigits(Tables(s, dir).lineitem, "l_extendedprice")
        .orderBy("digit")
    }),
    // REAL image codec at the driver gate (the q172 pattern for PNG):
    // closed-form 16×16 grayscale pixels per doc
    // (p(x,y) = (doc_id·31 + x·7 + y·13) mod 256) encoded through the
    // JDK PNG writer, decoded back through ImageIOCodec, aggregated as
    // exact integer pixel stats. The oracle regenerates the pixel grid
    // relationally — a wrong decode, sample order, or color transform
    // anywhere in the container round-trip shows up as a hash mismatch.
    "q182_png_codec_stats" -> ((s, dir) => {
      import s.implicits._
      val media = Tables(s, dir).documents.select(col("doc_id")).as[Long]
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
    // Common user journeys: corpus-wide counts of every 3-step event
    // path (one user window drives all lead() steps — one Exchange).
    "q183_path_trigrams" -> ((s, dir) => {
      Sessionize.pathNgrams(Tables(s, dir).events, "user_id", "ts",
          "event_type", 3, tieBreak = Seq("event_id"))
        .orderBy("path")
    }),
    // Composition: experiment readout on an ORDERED funnel conversion —
    // a user converts iff some purchase strictly follows their first
    // view (q170's conditional-min shape), the arm is the q176 md5
    // split, and the verdict is abReport's Wilson/pooled-z machinery.
    // The "did the treatment move funnel completion" question end-to-end.
    "q189_funnel_experiment" -> ((s, dir) => {
      val arm = when(substring(md5(concat(col("user_id").cast("string"),
        lit(":ab"))), 1, 1) < "8", lit("control")).otherwise(lit("treatment"))
      val units = Tables(s, dir).events
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view",
            unix_micros(col("ts")))).as("_v"),
          max(when(col("event_type") === "purchase",
            unix_micros(col("ts")))).as("_p"))
        .select(col("user_id"), arm.as("arm"),
          (col("_v").isNotNull && col("_p").isNotNull &&
            col("_p") > col("_v")).as("converted"))
      Experiment.abReport(units, "arm", "user_id", "converted", "control")
        .orderBy("arm")
    }),
    // PageRank over the q175 co-supplier graph (both orientations —
    // undirected PageRank), 3 rounds of EXACT integer fixed-point
    // (rank units of 1e-12, floor divisions everywhere): supplier
    // importance by shared-order connectivity, replayed integer-for-
    // integer by the oracle's unrolled rounds.
    // Personalized PageRank on the q190 co-supplier graph, seeds =
    // suppliers with suppkey % 10 = 0 (some isolated — solo-supplier
    // orders — exercising the seed-union path): q190's integer
    // fixed-point with seed-only teleport and seed-restart dangling.
    "q242_personalized_pagerank" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("src"))
        .join(li.select(col("ok"), col("sk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      val seeds = li.select(col("sk")).distinct()
        .filter(col("sk") % 10 === 0)
      Graph.personalizedPageRank(edges, "src", "dst", seeds, "sk",
          iters = 3)
        .orderBy("node")
    }),
    // WEIGHTED personalized PageRank — q242's biased walk with shares
    // split by collaboration strength (q307's wCol contract): the
    // relatedness query a recommender actually runs on a weighted
    // interaction graph.
    "q308_ppr_weighted" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("src"))
        .join(li.select(col("ok"), col("sk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      val seeds = li.select(col("sk")).distinct()
        .filter(col("sk") % 10 === 0)
      Graph.personalizedPageRank(edges, "src", "dst", seeds, "sk",
          iters = 3, wCol = Some("w"))
        .orderBy("node")
    }),
    "q190_pagerank" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("src"))
        .join(li.select(col("ok"), col("sk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      Graph.pageRank(edges, "src", "dst", iters = 3).orderBy("node")
    }),
    // WEIGHTED PageRank over the same co-supplier graph, each directed
    // edge weighted by how many orders the pair shared — rank flows
    // proportionally to collaboration strength instead of uniformly
    // (q190 is the w ≡ 1 special case). Exact integer: the share is
    // (r·w) div out-weight, decimal product, HUGEINT-replayed oracle.
    "q307_pagerank_weighted" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("src"))
        .join(li.select(col("ok"), col("sk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      Graph.pageRank(edges, "src", "dst", iters = 3, wCol = Some("w"))
        .orderBy("node")
    }),
    // Are order priority and order status associated? Pearson χ² of
    // independence over the full 5×3 grid (zero cells still contribute
    // their expected mass) + Cramér's V effect size; exact integer
    // marginals, one decimal(38,0)→double conversion per cell, (a,b)-
    // ordered fold.
    "q191_chi2_independence" -> ((s, dir) => {
      Profile.chiSquareIndependence(Tables(s, dir).orders,
          "o_orderpriority", "o_orderstatus")
        .orderBy("val_a", "val_b")
    }),
    // Current smoothed event rate per type: hourly counts folded through
    // the exact integer EWMA (alpha = 1/4, micro-unit floor steps) — the
    // control-chart level a monitor compares fresh hours against.
    "q192_ewma_level" -> ((s, dir) => {
      val hourly = Tables(s, dir).events
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n_events"))
      Trend.ewmaLevel(hourly, Seq("event_type"), "bucket", "n_events")
        .orderBy("event_type")
    }),
    // Correlogram of daily event volume per type: Pearson ACF at lags
    // 1..7 over index-aligned day pairs (a calendar gap DROPS straddling
    // pairs — never correlates across it), exact micro-unit sufficient
    // sums, trendFit's fixed-order double closed form.
    "q193_autocorrelation" -> ((s, dir) => {
      val daily = Tables(s, dir).events
        .filter(col("ts").isNotNull)
        .groupBy(col("event_type"),
          floor(unix_micros(col("ts")).cast("double") / 86400000000.0)
            .cast("long").as("day"))
        .agg(count(lit(1)).as("n_events"))
      Trend.autocorrelation(daily, Seq("event_type"), "day", "n_events",
          maxLag = 7)
        .orderBy("event_type", "lag")
    }),
    // Hop distance to the nearest landmark supplier (every 10th key)
    // over the co-supplier graph — bounded BFS, min-hop by first-seen
    // construction; the oracle recomputes levels via a deduplicating
    // recursive CTE.
    "q194_bfs_hops" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("src"))
        .join(li.select(col("ok"), col("sk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      val landmarks = Tables(s, dir).supplier
        .filter(col("s_suppkey") % 10 === 0)
        .select(col("s_suppkey"))
      Graph.bfsHops(edges, "src", "dst", landmarks, "s_suppkey",
          maxHops = 4)
        .orderBy("node")
    }),
    // Do well-connected suppliers share orders with other
    // well-connected suppliers? Newman degree assortativity of the
    // co-supplier graph — exact integer degree sums, one-row verdict.
    "q195_assortativity" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("a"))
        .join(li.select(col("ok"), col("sk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .select("a", "b")
      Graph.degreeAssortativity(edges, "a", "b")
    }),
    // Sorted-neighborhood candidate generation (the merge/purge window)
    // composed with the Fellegi–Sunter field-agreement scorer: records
    // adjacent in text order pair up within a 4-wide rank window —
    // equality blocking's complement for near-miss keys, (w−1)·n
    // candidates by construction.
    "q196_sorted_neighborhood" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val pairs = Linkage.sortedNeighborhoodPairs(docs, "doc_id", "text",
        window = 4)
      val scored = Linkage.scoreFieldAgreement(
        pairs.select("id_a", "id_b"), docs, "doc_id",
        Seq("lang" -> 0.6, "source" -> 0.4))
      pairs.join(scored, Seq("id_a", "id_b"))
        .orderBy("id_a", "id_b")
    }),
    // Leakage-aware categorical encoder: each order's priority becomes
    // the mean total price of the OTHER orders sharing it (leave-one-
    // out — plain mean encoding leaks the row's own label); exact
    // decimal sums, vocabulary-sized broadcast back onto the fact rows.
    "q197_target_encode_loo" -> ((s, dir) => {
      Features.targetEncodeLoo(Tables(s, dir).orders, "o_orderkey",
          "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
    }),
    // Collinearity screen over lineitem's numeric columns: all six
    // Pearson pairs from ONE aggregation over ONE scan — exact
    // micro-unit sufficient sums, pairwise deletion, null on constants.
    "q198_correlation_matrix" -> ((s, dir) => {
      // lineitemSpread: 36 exact-decimal partial aggregates over a
      // single-row-group scan serialized on one core (3.3 s of the 5.4 s
      // total); the sums are exact integers, so the spread is
      // order-invariant by construction
      Profile.correlationMatrix(Tables(s, dir).lineitemSpread,
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_a", "col_b")
    }),
    // MMR diverse retrieval over the embedding corpus: relevance = dot
    // with the min-id query vector, greedy lambda-tradeoff picks, the
    // q136 driver-side selection discipline.
    "q218_mmr_select" -> ((s, dir) => {
      val e = Tables(s, dir).embeddings
        .select(col("vec_id").cast("long").as("id"), col("embedding").as("v"))
      val q = e.orderBy("id").limit(1).select(col("v").as("qv"))
      val scored = e.crossJoin(broadcast(q))
        .select(col("id"), col("v"),
          VecDot.dot(col("v"), col("qv")).as("rel"))
      Coreset.mmrSelect(scored, "id", "v", "rel", k = 8, lambda = 0.7)
        .orderBy("step")
    }),
    // Item-item collaborative filtering over customer-part baskets:
    // co-occurrence Jaccard, firehose baskets dropped whole, top-5
    // neighbors per part with id-broken ties.
    "q217_item_neighbors" -> ((s, dir) => {
      val t = Tables(s, dir)
      val inter = t.orders.filter(col("o_custkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t.lineitem.select(col("l_orderkey").as("o_orderkey"),
          col("l_partkey")), Seq("o_orderkey"))
        .select(col("o_custkey"), col("l_partkey"))
      Similarity.itemNeighbors(inter, "o_custkey", "l_partkey",
          k = 5, minCo = 2L)
        .orderBy("item", "rank")
    }),
    // PAN detection with the Luhn pre-filter: planted valid/invalid
    // card numbers (spaced and plain), candidate digit runs stripped,
    // length-gated, checksummed — per-source precision, exact counts.
    "q216_luhn_pii" -> ((s, dir) => {
      val planted = Tables(s, dir).documents
        .select(col("doc_id"), col("source"), concat(col("text"),
          when(col("doc_id") % 5 === 0,
            lit(" card 4111 1111 1111 1111")).otherwise(lit("")),
          when(col("doc_id") % 3 === 0,
            lit(" num 4111111111111112")).otherwise(lit("")),
          when(col("doc_id") % 17 === 0,
            lit(" amex 378282246310005")).otherwise(lit(""))).as("text"))
      Scrub.luhnCardIncidence(planted, Seq("source"), "text")
        .orderBy("source")
    }),
    // Weighted shortest paths over the co-supplier graph: 4 exact
    // Bellman-Ford relaxation rounds from the q194 landmark set,
    // integer edge weights, min-path within 4 edges.
    "q215_shortest_paths" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("src"))
        .join(li.select(col("ok"), col("sk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          (lit(1L) + (col("src") + col("dst")) % 9L).as("w"))
      val landmarks = Tables(s, dir).supplier
        .filter(col("s_suppkey") % 10 === 0)
        .select(col("s_suppkey"))
      Graph.shortestPaths(edges, "src", "dst", "w", landmarks,
          "s_suppkey", rounds = 4)
        .orderBy("node")
    }),
    // Dunning G2 collocations: 2x2 bigram-event contingency per pair,
    // evidence-weighted (unlike q102's PMI), exact cells, fixed-order
    // ln terms, ExactRound at 6, polyHash-tiebroken ranks.
    "q214_llr_collocations" -> ((s, dir) => {
      Phrases.llrCollocations(Tables(s, dir).documents, "text", k = 50,
          minCount = 5L)
        .orderBy("rank")
    }),
    // Robust daily-volume trend: Theil-Sen median-of-pairwise-slopes
    // (explicit sorted-array median, never an interpolating quantile),
    // median-residual intercept.
    "q213_theil_sen" -> ((s, dir) => {
      val daily = Tables(s, dir).events
        .filter(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"),
          floor(unix_micros(col("ts")).cast("double") / lit(86400.0e6))
            .cast("long").as("day"))
        .agg(count(lit(1)).cast("double").as("n_events"))
      Trend.theilSen(daily, Seq("event_type"), "day", "n_events")
        .orderBy("event_type")
    }),
    // Holt level+trend forecast of daily revenue per event type: exact
    // integer micro-unit state, trunc-div steps both engines share,
    // one-step-ahead forecast.
    "q212_holt_linear" -> ((s, dir) => {
      val daily = Tables(s, dir).events
        .filter(col("event_type").isNotNull && col("ts").isNotNull &&
          col("value").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,6)")).as("v"))
      Trend.holtLinear(daily, Seq("event_type"), "day", "v")
        .orderBy("event_type")
    }),
    // Decile gains/lift for the q205 scored corpus: rank-cut buckets
    // (distributed two-pass ranks, doc_id tiebreak), capture and lift
    // from exact counts.
    "q211_gains_table" -> ((s, dir) => {
      def h6(tag: String) =
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(s":$tag"))), 1, 5), 16, 10).cast("long") % 1000000L
      val scored = Tables(s, dir).documents.select(col("doc_id"),
        (h6("cal").cast("double") / lit(1.0e6)).as("score"),
        (h6("lbl") < h6("cal")).as("label"))
      Classifier.gainsTable(scored, "score", "label", "doc_id")
        .orderBy("bucket")
    }),
    // Good-Turing count-of-counts smoothing over the corpus unigrams:
    // exact N_r table, r* = (r+1)N_{r+1}/N_r, unseen mass N_1/N.
    "q234_good_turing" -> ((s, dir) => {
      LanguageModel.goodTuring(Tables(s, dir).documents, "text")
        .orderBy("r")
    }),
    // Interpolated Kneser-Ney bigram smoothing: exact counts from one
    // pair aggregation, continuation/history marginals, fixed IEEE shape
    // for p_kn — the fourth smoothing family, full model table gated.
    "q241_kneser_ney" -> ((s, dir) => {
      LanguageModel.kneserNey(Tables(s, dir).documents, "text")
        .orderBy("prev", "cur")
    }),
    // Skew-proof path trigrams (q183's semantics through the bucketed
    // n-gram split): within-bucket lead chains partitioned on (user, 6h
    // bucket) + crossing grams reconstructed from each bucket's first/last
    // n−1 boundary rows with per-bucket rank adjacency proofs — a firehose
    // user spreads over buckets instead of one sort task. Oracle is q183's
    // single-window SQL verbatim: the split must be invisible.
    "q235_path_trigrams_bucketed" -> ((s, dir) => {
      Sessionize.pathNgramsBucketed(Tables(s, dir).events, "user_id", "ts",
          "event_type", 3, tieBreak = Seq("event_id"), bucketHours = 6)
        .orderBy("path")
    }),
    // STREAMING path at the driver gate (§2.7's first CORRECTNESS row):
    // the events table re-materialized as one parquet file → a real file-
    // source readStream → transitionStream (flatMapGroupsWithState, ONE
    // (ts, state) per user) → foreachBatch append into a parquet sink →
    // batch aggregation of the sunk pairs into q162's matrix shape. The
    // oracle replays the stream's within-batch (ts, state) sort order; a
    // wrong pair emitted anywhere in the stateful path is a hash mismatch.
    "q238_transition_stream" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q238_out")
      val ckpt = StreamStage.tempDir("graft_q238_ckpt")
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isNotNull)
        .select(col("user_id").cast("long").as("user_id"),
          // full µs precision as the long ordering key — ms would
          // collapse distinct event times and reorder pairs
          unix_micros(col("ts")).as("ts_ms"),
          col("event_type").as("state"))
      // staged ONCE per JVM (one file -> AvailableNow sees one micro-batch,
      // so the within-batch (ts_ms, state) sort defines the global order);
      // bench iterations 2-3 time the stream, not the staging write
      val staging = StreamStage.stagedInput("q238", dir, ev)
      // state/shuffle parallelism derived from the staged bytes, not the
      // host core count (guide §2: scale-adaptive partitioning; stateful
      // streaming gets no AQE coalescing, so this is the only lever)
      val ss = StreamStage.scaledSession(s, Seq(staging))
      val stream = ss.readStream.schema(ev.schema).parquet(staging)
        .as[StreamingOps.TransitionEvent]
      val pairs = StreamingOps.transitionStream(stream)(ss)
      pairs.writeStream
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingOps.TransitionPair], _: Long) =>
          df.write.mode("append").parquet(sink): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
      s.read.parquet(sink)
        .groupBy(col("from_state").as("state"),
          col("to_state").as("next_state"))
        .agg(count(lit(1)).as("n_trans"))
        .withColumn("p", col("n_trans").cast("double") /
          sum(col("n_trans")).over(Window.partitionBy("state")).cast("double"))
        .orderBy("state", "next_state")
    }),
    // STATE-STORE restart recovery (q301 covers sink/offset recovery;
    // this covers the OTHER recovery surface — flatMapGroupsWithState's
    // per-user state across a query restart): the daily-increment shape.
    // Events split at the median µs timestamp; run 1 drains the early
    // half (one file → one batch), the query TERMINATES, the late half
    // then arrives, and a NEW query on the SAME checkpoint drains it.
    // Each user's boundary pair (last early event → first late event)
    // exists in the sink ONLY if run 2's state store recovered run 1's
    // last-event-per-user state — missing boundary pairs change n_trans
    // and hash-mismatch. Time-disjoint halves make arrival order equal
    // global (ts, state) order, so the oracle is q238's single-batch
    // matrix verbatim. Arrival is file-COPY from the cached staged
    // parts (µs-cheap) so the timed region measures the two drains.
    "q303_transition_stream_restart" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q303_out")
      val ckpt = StreamStage.tempDir("graft_q303_ckpt")
      val arrive = StreamStage.tempDir("graft_q303_in")
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isNotNull)
        .select(col("user_id").cast("long").as("user_id"),
          unix_micros(col("ts")).as("ts_ms"),
          col("event_type").as("state"))
      val mm = ev.agg(min(col("ts_ms")), max(col("ts_ms"))).collect()(0)
      val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
      val parts = StreamStage.stagedInputParts("q303", dir, Seq(
        () => ev.filter(col("ts_ms") < cut),
        () => ev.filter(col("ts_ms") >= cut)))
      val ss = StreamStage.scaledSession(s, Seq(parts))
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
      def drain(): Unit = {
        val stream = ss.readStream.schema(ev.schema)
          .option("pathGlobFilter", "*.parquet").parquet(arrive + "/*")
          .as[StreamingOps.TransitionEvent]
        StreamingOps.transitionStream(stream)(ss).writeStream
          .outputMode("append")
          .foreachBatch {
            (df: org.apache.spark.sql.Dataset[StreamingOps.TransitionPair],
             _: Long) => df.write.mode("append").parquet(sink): Unit
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      arrivePart("p000"); drain()
      arrivePart("p001"); drain() // new query, same checkpoint
      s.read.parquet(sink)
        .groupBy(col("from_state").as("state"),
          col("to_state").as("next_state"))
        .agg(count(lit(1)).as("n_trans"))
        .withColumn("p", col("n_trans").cast("double") /
          sum(col("n_trans")).over(Window.partitionBy("state")).cast("double"))
        .orderBy("state", "next_state")
    }),
    // STREAMING gate #2 (the q238 recipe on the stateful sessionizer):
    // file-source stream → sessionizeStream (per-user open-session state,
    // NoTimeout so nothing closes on wall-clock) → foreachBatch parquet →
    // read-back. The stream emits a session only when a LATER event
    // closes it, so the oracle drops each user's trailing session — the
    // contract itself is what's being gated. ts_ms carries µs; the gap is
    // 1800 s in µs; value_sum is the stream's sequential (ts, value)-
    // ordered fold, replayed exactly by an ordered list_reduce.
    // Fourth streaming ORACLE row: a real STREAM-STREAM interval join
    // (views joined to purchases within an hour, per user) through two
    // file-source readStreams -> append sink; with AvailableNow over
    // complete staged input the match set equals the batch interval
    // join, which is exactly what the oracle computes.
    "q270_interval_join_stream" -> ((s, dir) => {
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q270_out")
      val ckpt = StreamStage.tempDir("graft_q270_ckpt")
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_type"))
      val stagingL = StreamStage.stagedInput("q270l", dir,
        ev.filter(col("event_type") === "view").select("user_id", "ts"))
      val stagingR = StreamStage.stagedInput("q270r", dir,
        ev.filter(col("event_type") === "purchase").select("user_id", "ts"))
      val sch = ev.select("user_id", "ts").schema
      val ss = StreamStage.scaledSession(s, Seq(stagingL, stagingR))
      val ls = ss.readStream.schema(sch).parquet(stagingL)
      val rs = ss.readStream.schema(sch).parquet(stagingR)
      val joined = StreamingOps.intervalJoinStream(ls, rs, "user_id",
        "ts", maxDelaySec = 3600L)
      joined.writeStream
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(sink): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
      s.read.parquet(sink).orderBy("user_id", "left_ts", "right_ts")
    }),
    // LEFT-OUTER stream-stream interval join (13th streaming row): the
    // attribution shape where UNCONVERTED views must also land (NULL
    // purchase) — the outer row for a left event emits only when the
    // watermark PROVES no match can still arrive and its join state
    // evicts, so this gates the eviction-driven NULL-emission machinery
    // the inner q270 never touches. Far-future sentinel rows staged as
    // a second file on BOTH sides advance the watermark past all real
    // data (the q290 recipe); the sentinel pair is filtered from the
    // readback. Oracle: the batch LEFT JOIN — a missing outer row
    // (state not flushed), a doubled one (emitted matched AND null), or
    // a dropped match all hash-mismatch.
    "q306_interval_join_outer_stream" -> ((s, dir) => {
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q306_out")
      val ckpt = StreamStage.tempDir("graft_q306_ckpt")
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_type"))
      val sch = ev.select("user_id", "ts").schema
      def sentinel = s.range(1)
        .select(lit(-1L).cast(sch("user_id").dataType).as("user_id"),
          lit("2100-01-01 00:00:00").cast("timestamp").as("ts"))
      val stagingL = StreamStage.stagedInputParts("q306l", dir, Seq(
        () => ev.filter(col("event_type") === "view").select("user_id", "ts"),
        () => sentinel))
      val stagingR = StreamStage.stagedInputParts("q306r", dir, Seq(
        () => ev.filter(col("event_type") === "purchase").select("user_id", "ts"),
        () => sentinel))
      val ss = StreamStage.scaledSession(s, Seq(stagingL, stagingR))
      def src(p: String) = ss.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(p + "/*")
      val joined = StreamingOps.intervalJoinStream(src(stagingL),
        src(stagingR), "user_id", "ts", maxDelaySec = 3600L,
        joinType = "left_outer")
      joined.writeStream
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(sink): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
      s.read.parquet(sink).filter(col("user_id") >= 0L)
        .orderBy("user_id", "left_ts", "right_ts")
    }),
    // STREAMING recovery gate #3 — stream-stream JOIN state across a
    // restart (q301 gates sink/offset recovery, q303 gates
    // flatMapGroupsWithState; the interval join's state store — BOTH
    // sides' unmatched rows — is the third and last recovery surface).
    // Run 1 drains ONLY the left (view) side and terminates: no right
    // rows and no right watermark means nothing matches and nothing
    // evicts, so every view sits in the join state store. A NEW query
    // on the SAME checkpoint then drains the purchases and the
    // far-future sentinels (q306's recipe): every matched pair can only
    // form against run 1's RECOVERED left state, and every NULL outer
    // row can only flush when the sentinel watermark evicts recovered
    // state — a lost or corrupt state store loses matches AND outer
    // rows, both hash-mismatching the batch LEFT JOIN oracle.
    "q309_interval_join_restart" -> ((s, dir) => {
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q309_out")
      val ckpt = StreamStage.tempDir("graft_q309_ckpt")
      val arriveL = StreamStage.tempDir("graft_q309_inl")
      val arriveR = StreamStage.tempDir("graft_q309_inr")
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_type"))
      val sch = ev.select("user_id", "ts").schema
      def sentinel = s.range(1)
        .select(lit(-1L).cast(sch("user_id").dataType).as("user_id"),
          lit("2100-01-01 00:00:00").cast("timestamp").as("ts"))
      val partsL = StreamStage.stagedInputParts("q309l", dir, Seq(
        () => ev.filter(col("event_type") === "view").select("user_id", "ts"),
        () => sentinel))
      val partsR = StreamStage.stagedInputParts("q309r", dir, Seq(
        () => ev.filter(col("event_type") === "purchase").select("user_id", "ts"),
        () => sentinel))
      // arrival = file copy from the cached staged parts (µs-cheap, the
      // q303 recipe) so the timed region measures the two drains
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
        StreamingOps.intervalJoinStream(src(arriveL), src(arriveR),
            "user_id", "ts", maxDelaySec = 3600L, joinType = "left_outer")
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
      // run 1: LEFT side only (right side exists but is empty — the glob
      // needs the directory; zero right rows keeps the watermark parked)
      arrivePart(partsL, arriveL, "p000")
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(arriveR, "p000"))
      drain()
      // run 2 (new query, same checkpoint): purchases + both sentinels
      arrivePart(partsR, arriveR, "p000")
      arrivePart(partsL, arriveL, "p001")
      arrivePart(partsR, arriveR, "p001")
      drain()
      s.read.parquet(sink).filter(col("user_id") >= 0L)
        .orderBy("user_id", "left_ts", "right_ts")
    }),
    // 25% md5 user-sampled twin (q309 prices 19.6 s on the sf1.0 decade
    // — TWO full drain cycles of streaming machinery plus join-state and
    // sink volume; the sample cuts the volume share, the ~2×4-batch
    // machinery floor remains)
    "q309s_interval_join_restart_sampled" -> ((s, dir) => {
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q309s_out")
      val ckpt = StreamStage.tempDir("graft_q309s_ckpt")
      val arriveL = StreamStage.tempDir("graft_q309s_inl")
      val arriveR = StreamStage.tempDir("graft_q309s_inr")
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          oracleSampleAt(col("user_id"), "40"))
        .select(col("user_id"), col("ts"), col("event_type"))
      val sch = ev.select("user_id", "ts").schema
      def sentinel = s.range(1)
        .select(lit(-1L).cast(sch("user_id").dataType).as("user_id"),
          lit("2100-01-01 00:00:00").cast("timestamp").as("ts"))
      val partsL = StreamStage.stagedInputParts("q309sl", dir, Seq(
        () => ev.filter(col("event_type") === "view").select("user_id", "ts"),
        () => sentinel))
      val partsR = StreamStage.stagedInputParts("q309sr", dir, Seq(
        () => ev.filter(col("event_type") === "purchase").select("user_id", "ts"),
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
        StreamingOps.intervalJoinStream(src(arriveL), src(arriveR),
            "user_id", "ts", maxDelaySec = 3600L, joinType = "left_outer")
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
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(arriveR, "p000"))
      drain()
      arrivePart(partsR, arriveR, "p000")
      arrivePart(partsL, arriveL, "p001")
      arrivePart(partsR, arriveR, "p001")
      drain()
      s.read.parquet(sink).filter(col("user_id") >= 0L)
        .orderBy("user_id", "left_ts", "right_ts")
    }),
    // 25% md5 user-sampled twin (q306 prices 15.3 s on the sf1.0 decade
    // — mostly join-state + sink volume, which the sample cuts; the
    // ~4-batch streaming machinery floor remains)
    "q306s_interval_join_outer_sampled" -> ((s, dir) => {
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q306s_out")
      val ckpt = StreamStage.tempDir("graft_q306s_ckpt")
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          oracleSampleAt(col("user_id"), "40"))
        .select(col("user_id"), col("ts"), col("event_type"))
      val sch = ev.select("user_id", "ts").schema
      def sentinel = s.range(1)
        .select(lit(-1L).cast(sch("user_id").dataType).as("user_id"),
          lit("2100-01-01 00:00:00").cast("timestamp").as("ts"))
      val stagingL = StreamStage.stagedInputParts("q306sl", dir, Seq(
        () => ev.filter(col("event_type") === "view").select("user_id", "ts"),
        () => sentinel))
      val stagingR = StreamStage.stagedInputParts("q306sr", dir, Seq(
        () => ev.filter(col("event_type") === "purchase").select("user_id", "ts"),
        () => sentinel))
      val ss = StreamStage.scaledSession(s, Seq(stagingL, stagingR))
      def src(p: String) = ss.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(p + "/*")
      val joined = StreamingOps.intervalJoinStream(src(stagingL),
        src(stagingR), "user_id", "ts", maxDelaySec = 3600L,
        joinType = "left_outer")
      joined.writeStream
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(sink): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
      s.read.parquet(sink).filter(col("user_id") >= 0L)
        .orderBy("user_id", "left_ts", "right_ts")
    }),
    // Third streaming ORACLE row: events through a real file-source
    // readStream -> funnelStream (flatMapGroupsWithState, ONE monotone
    // int per user) -> update-mode parquet sink; final stage per user =
    // max over the emitted updates. The oracle replays the stream's
    // within-batch (ts_us, event_type) order as an ordered-subsequence
    // LIKE chain; stage-0 users emit nothing by contract.
    "q253_funnel_stream" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q253_out")
      val ckpt = StreamStage.tempDir("graft_q253_ckpt")
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("ts") < lit("2024-01-02 00:00:00").cast("timestamp"))
        .select(col("user_id").cast("long").as("user_id"),
          unix_micros(col("ts")).as("ts_ms"),
          col("event_type").cast("string").as("event_type"))
      val staging = StreamStage.stagedInput("q253", dir, ev)
      val ss = StreamStage.scaledSession(s, Seq(staging))
      val stream = ss.readStream.schema(ev.schema).parquet(staging)
        .as[StreamingOps.FunnelEvent]
      val prog = StreamingOps.funnelStream(stream,
        Seq("view", "click", "purchase"))(ss)
      prog.writeStream
        .outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingOps.FunnelProgress], _: Long) =>
          df.write.mode("append").parquet(sink): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
      s.read.parquet(sink)
        .groupBy("user_id")
        .agg(max(col("stage_reached")).cast("int").as("stage_reached"))
        .orderBy("user_id")
    }),
    "q239_sessionize_stream" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q239_out")
      val ckpt = StreamStage.tempDir("graft_q239_ckpt")
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("value").isNotNull)
        .select(col("user_id").cast("long").as("user_id"),
          unix_micros(col("ts")).as("ts_ms"),
          col("value").cast("double").as("value"))
      val staging = StreamStage.stagedInput("q239", dir, ev)
      val ss = StreamStage.scaledSession(s, Seq(staging))
      val stream = ss.readStream.schema(ev.schema).parquet(staging)
        .as[StreamingOps.SessionEvent]
      val sessions = StreamingOps.sessionizeStream(stream,
        gapMs = 1800000000L,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(ss)
      sessions.writeStream
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingOps.ClosedSession], _: Long) =>
          df.write.mode("append").parquet(sink): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
      s.read.parquet(sink).orderBy("user_id", "session_start")
    }),
    // Tenth streaming ORACLE row — the BUILT-IN session_window aggregation
    // in APPEND mode, the first gate to exercise real watermark EVICTION:
    // three ordered staged files (real events, then two far-future
    // sentinel batches a century out) + maxFilesPerTrigger=1. Watermarks
    // advance at batch BOUNDARIES, so sessions emit one batch after the
    // watermark passes them: batch 2 (sentinel 1) flushes sessions older
    // than maxReal−10min, batch 3 (sentinel 2) flushes the tail — every
    // real session reaches the sink, while the sentinels' own sessions
    // (user −1) stay younger than the final watermark and never emit.
    // Values ride the micro-unit seam so session sums are exact longs.
    "q290_session_window_stream" -> ((s, dir) => {
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q290_out")
      val ckpt = StreamStage.tempDir("graft_q290_ckpt")
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("value").isNotNull)
        .select(col("user_id").cast("long").as("user_id"), col("ts"),
          (col("value").cast("decimal(18,6)") * 1000000L)
            .cast("long").as("value"))
      def sentinel(ts: String) = s.range(1).select(
        lit(-1L).as("user_id"), lit(ts).cast("timestamp").as("ts"),
        lit(0L).as("value"))
      val staging = StreamStage.stagedInputParts("q290", dir, Seq(
        () => ev,
        () => sentinel("2124-01-01 00:00:00"),
        () => sentinel("2124-02-01 00:00:00")))
      val ss = StreamStage.scaledSession(s, Seq(staging))
      val stream = ss.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(staging + "/*")
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
      s.read.parquet(sink).filter(col("user_id") >= 0L)
        .orderBy("user_id", "session_start")
    }),
    // Ninth streaming ORACLE row — stream-static enrichment, the last
    // spec-only streaming family: the event stream (two staged files +
    // maxFilesPerTrigger=1, so the static side joins REAL successive
    // micro-batches) inner-joined per batch to a broadcast customer ×
    // nation dimension — stateless, so plain append with no watermark.
    // The oracle is the batch join: stream-static semantics ARE batch
    // semantics per micro-batch, which is exactly the contract gated.
    "q289_enrich_stream" -> ((s, dir) => {
      import graft.streaming.StreamStage
      val sink = StreamStage.tempDir("graft_q289_out")
      val ckpt = StreamStage.tempDir("graft_q289_ckpt")
      val t = Tables(s, dir)
      val ev = t.events
        .filter(col("event_id").isNotNull && col("user_id").isNotNull)
        .select(col("event_id").cast("long").as("event_id"),
          col("user_id").cast("long").as("user_id"), col("event_type"))
      val dim = t.customer.select(col("c_custkey").as("user_id"),
          col("c_mktsegment").as("segment"), col("c_nationkey"))
        .join(t.nation.select(col("n_nationkey").as("c_nationkey"),
          col("n_name").as("nation")), Seq("c_nationkey"))
        .select("user_id", "segment", "nation")
      val staging = StreamStage.stagedInput("q289", dir, ev, nFiles = 2)
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(staging)
      stream.join(broadcast(dim), Seq("user_id"))
        .writeStream
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(sink): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
      s.read.parquet(sink)
        .select("event_id", "user_id", "event_type", "segment", "nation")
        .orderBy("event_id")
    }),
    // Eighth streaming ORACLE row — the FIRST streaming family
    // (watermarked tumbling-window aggregation, StreamingOps.windowedCounts
    // unchanged) finally gated end-to-end: events staged as TWO files +
    // maxFilesPerTrigger=1, so AvailableNow runs REAL multi-batch
    // incremental aggregation — window state carries across batches, and
    // batch 2 delivers rows far older than batch 1's watermark (the hash
    // split interleaves the time range), which complete mode must still
    // aggregate (pinned in StreamingSpec). Values ride the validated
    // decimal(18,6) seam as exact integer micro-units, so cross-batch sums
    // are bit-deterministic and round(sum, 4) over a LONG is the identity.
    // foreachBatch overwrites the sink each commit — the final table is the
    // full aggregate state. Append-mode watermark EVICTION stays spec
    // territory: AvailableNow never advances the watermark past the final
    // windows, so an append gate would structurally under-emit the tail.
    "q285_windowed_agg_stream" -> ((s, dir) => {
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q285_out")
      val ckpt = StreamStage.tempDir("graft_q285_ckpt")
      val ev = Tables(s, dir).events
        .filter(col("ts").isNotNull && col("event_type").isNotNull)
        .select(col("ts"), col("event_type"),
          (coalesce(col("value").cast("decimal(18,6)"),
            lit(0L).cast("decimal(18,6)")) * 1000000L)
            .cast("long").as("value"))
      val staging = StreamStage.stagedInput("q285", dir, ev, nFiles = 2)
      val ss = StreamStage.scaledSession(s, Seq(staging))
      val stream = ss.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(staging)
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
      s.read.parquet(sink).orderBy("window_start", "event_type")
    }),
    // Seventh streaming ORACLE row — watermarked streaming dedup: the
    // corpus DOUBLED (every event exactly twice), one staged file ->
    // one micro-batch, dropDuplicatesWithinWatermark on event_id ->
    // append sink. In-batch the operator must emit each key once; the
    // oracle is simply the distinct corpus. (Cross-batch dedup +
    // state eviction stay spec territory: with file-split batches a
    // LATE second file could watermark-drop ids whose only copies it
    // holds — the single-batch gate keeps the contract deterministic.)
    "q284_dedup_stream" -> ((s, dir) => {
      import graft.streaming.StreamStage
      val sink = StreamStage.tempDir("graft_q284_out")
      val ckpt = StreamStage.tempDir("graft_q284_ckpt")
      val ev = Tables(s, dir).events
        .filter(col("event_id").isNotNull && col("ts").isNotNull)
        .select(col("event_id").cast("long").as("event_id"), col("ts"),
          col("event_type"), col("value").cast("double").as("value"))
      val staging = StreamStage.stagedInput("q284", dir,
        ev.unionByName(ev))
      val ss = StreamStage.scaledSession(s, Seq(staging))
      val stream = ss.readStream.schema(ev.schema).parquet(staging)
      stream.withWatermark("ts", "10 minutes")
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
      s.read.parquet(sink).orderBy("event_id")
    }),
    // Sixth streaming ORACLE row — per-key windowed quota admission
    // (ingest rate limiting): one staged file -> one micro-batch, so the
    // within-batch (ts, id)-sorted admission IS the contract being
    // gated: per (event_type, 1h window) only the first 2 events pass,
    // and windows older than 48 behind each key's max are dropped whole
    // (the conservative replay-safe horizon — events span ~720 h, so
    // BOTH the cap and the horizon bite). Oracle: row_number <= 2 over
    // the horizon-filtered windows.
    "q280_quota_stream" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.{StreamingOps, StreamStage}
      val sink = StreamStage.tempDir("graft_q280_out")
      val ckpt = StreamStage.tempDir("graft_q280_ckpt")
      val ev = Tables(s, dir).events
        .filter(col("event_type").isNotNull && col("ts").isNotNull &&
          col("event_id").isNotNull)
        .select(col("event_type").as("key"), unix_micros(col("ts")).as("ts_ms"),
          col("event_id").cast("long").as("id"))
      val staging = StreamStage.stagedInput("q280", dir, ev)
      val ss = StreamStage.scaledSession(s, Seq(staging))
      val stream = ss.readStream.schema(ev.schema).parquet(staging)
        .as[StreamingOps.QuotaEvent]
      implicit val sp: SparkSession = ss
      val adm = StreamingOps.quotaAdmitStream(stream,
        windowMs = 3600000000L, maxPerWindow = 2, horizonWindows = 48)
      adm.writeStream
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingOps.Admitted], _: Long) =>
          df.write.mode("append").parquet(sink): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
      s.read.parquet(sink).orderBy("key", "window_start", "seq")
    }),
    // Fifth streaming ORACLE row — the CDC lake upsert, the last
    // spec-only streaming family: per-(user, ts) CDC rows staged as TWO
    // files, readStream with maxFilesPerTrigger=1 (so AvailableNow runs
    // REAL multi-batch incremental merges, not one bulk load) →
    // upsertSink → MergeByKey per micro-batch into a Hive-partitioned
    // table (greatest version per key wins, touched partitions only) →
    // final table vs DuckDB's greatest-version-per-key. Batch
    // boundaries are file-arbitrary; the version-based merge makes the
    // final state invariant to the split, which is exactly the CDC
    // contract being gated.
    "q274_cdc_upsert_stream" -> ((s, dir) => {
      import graft.streaming.{StreamingOps, StreamStage}
      val root = StreamStage.tempDir("graft_q274") + "/table"
      val ckpt = StreamStage.tempDir("graft_q274_ckpt")
      val cdc = cdcFixture(s, dir)
      val staging = StreamStage.stagedInput("q274", dir, cdc, nFiles = 2)
      val ss = StreamStage.scaledSession(s, Seq(staging))
      val stream = ss.readStream.schema(cdc.schema)
        .option("maxFilesPerTrigger", 1).parquet(staging)
      StreamingOps.upsertSink(stream, root, Seq("user_id"), Seq("part"),
        "ver", ckpt,
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
        .awaitTermination()
      cdcReadBack(s, root)
    }),
    // Checkpoint-RESTART recovery over the same CDC fixture: the first
    // query is killed after batch 0's merge lands but BEFORE its offset
    // commits (the worst crash window), then an identical query restarts
    // on the same checkpoint — the source replays the uncommitted batch
    // (idempotent merge: no-op) and drains the rest. The final table
    // must match the same greatest-version-per-key oracle as q274: a
    // duplicate row, a lost batch, or a restart-from-zero all
    // hash-mismatch. The eleventh streaming gate, and the only one that
    // exercises restart-from-disk (checkpoint offsets + staged input).
    "q301_cdc_restart_recovery" -> ((s, dir) => {
      import graft.streaming.{StreamingOps, StreamStage}
      val root = StreamStage.tempDir("graft_q301") + "/table"
      val ckpt = StreamStage.tempDir("graft_q301_ckpt")
      val cdc = cdcFixture(s, dir)
      // same staged input as q274 (same key: written once per JVM)
      val staging = StreamStage.stagedInput("q274", dir, cdc, nFiles = 2)
      StreamingOps.upsertSinkWithRecovery(
        StreamStage.scaledSession(s, Seq(staging)), staging, cdc.schema,
        root, Seq("user_id"), Seq("part"), "ver", ckpt)
      cdcReadBack(s, root)
    }),
    // Exact duplicated-span removals (Lee et al. 2022): positions whose
    // EXACT 25-token gram repeats anywhere, all-but-the-first occurrence
    // marked, marks merged to per-doc spans — the classic exact-substring
    // training-data dedup, relational (sorted k-gram join, no suffix
    // array materialized).
    "q237_exact_substring_removals" -> ((s, dir) => {
      Dedup.exactSubstringRemovals(Tables(s, dir).documentsSpread, "doc_id",
          "text", k = 25)
        .orderBy("doc_id", "span_start")
    }),
    // Skew-proof Markov attribution (q206's semantics with journey
    // extraction through the bucketed split): a never-converting firehose
    // user otherwise sorts its whole stream in one window task. Oracle is
    // q206's SQL verbatim: the split must be invisible.
    "q236_markov_attribution_bucketed" -> ((s, dir) => {
      Sessionize.markovRemovalEffects(Tables(s, dir).events, "user_id",
          "ts", "event_type", "purchase", tieBreak = Seq("event_id"),
          iters = 8, journeyBucketHours = Some(6))
        .orderBy("channel")
    }),
    // Lognormal length fit per source: log-scale method of moments
    // over exact (length, count) cells, length-ordered folds.
    "q233_lognormal_fit" -> ((s, dir) => {
      TextAnalysis.lognormalFit(Tables(s, dir).documents, Seq("source"),
          "n_chars")
        .orderBy("source")
    }),
    // Per-state next-step entropy of the event stream: exact cells,
    // destination-ordered folds, ExactRound at 6.
    "q232_transition_entropy" -> ((s, dir) => {
      Sessionize.transitionEntropy(
          Tables(s, dir).events.filter(col("ts").isNotNull),
          "user_id", "ts", "event_type", tieBreak = Seq("event_id"))
        .orderBy("state")
    }),
    // Inter-rater agreement: Cohen's kappa between the gold lang label
    // and a deterministic ~20%-noisy second annotator — exact counts,
    // decimal marginal products.
    "q231_cohens_kappa" -> ((s, dir) => {
      val noisy = Tables(s, dir).documents
        .filter(col("lang").isNotNull)
        .select(col("lang").as("rater_a"),
          when(conv(substring(md5(concat(col("doc_id").cast("string"),
              lit(":rate"))), 1, 5), 16, 10).cast("long") % 1000000L
              < 200000L, concat(lit("x_"), col("lang")))
            .otherwise(col("lang")).as("rater_b"))
      Classifier.cohensKappa(noisy, "rater_a", "rater_b")
    }),
    // Seasonal-naive forecast skill (MASE ratio) on daily volumes:
    // lag-7 vs lag-1 absolute errors, gap-aligned, exact sums.
    "q229_seasonal_skill" -> ((s, dir) => {
      val daily = Tables(s, dir).events
        .filter(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"),
          floor(unix_micros(col("ts")).cast("double") / lit(86400.0e6))
            .cast("long").as("day"))
        .agg(count(lit(1)).cast("double").as("n_events"))
      Trend.seasonalNaiveSkill(daily, Seq("event_type"), "day",
          "n_events", period = 7)
        .orderBy("event_type")
    }),
  )
}
