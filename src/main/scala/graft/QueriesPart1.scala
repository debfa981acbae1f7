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
private[graft] trait QueriesPart1 { this: SparkEntry.type =>
  protected def queriesPart1: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------- reference parity (§2)
    // P1/P2/P4/P5: the silver CTAS shape — project, rename, cast, predicate,
    // null-drop (silver.py:26-40)
    "q01_silver_transform" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_quantity").isNotNull &&
          col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate").cast("date").as("ship_date"),
          netPrice.as("net_price"), // per-row double math: bit-identical cross-engine
          col("l_returnflag"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // A1: the gold aggregate — AVG/MAX/MIN/COUNT GROUP BY 2 cols (gold.py:71-81)
    "q02_gold_agg" -> ((s, dir) => goldAgg(Tables(s, dir))),
    // A3: partition enumeration — DISTINCT 2 cols (silver.py:9-12)
    "q03_distinct_partitions" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .select(col("l_returnflag"), col("l_shipdate").cast("date").as("ship_date"))
        .distinct()
        .orderBy("l_returnflag", "ship_date")
    }),
    // P4: pruned point lookup — 2 equality predicates (README.md:212-217)
    "q04_point_lookup" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .filter(col("l_returnflag") === "R" &&
          col("l_shipdate").cast("date") === lit("1997-03-15").cast("date"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // J1: anti-join — the incremental-diff core (silver.py:69). Filtered to
    // 'F'-status orders so the result is non-empty at every SF (an all-empty
    // differential would be vacuous).
    "q05_anti_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer.join(t.orders.filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),
    // A2: scalar COUNT(*) validation (silver.py:42-44)
    "q06_scalar_count" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .filter(col("l_quantity").isNotNull)
        .agg(count(lit(1)).as("n"))
    }),
    // S11: keyed PK-replace upsert semantics — window dedupe keeping the
    // newest row per (layer, city, date) (metadata.py:8, silver.py:57-60)
    "q07_upsert_dedupe" -> ((s, dir) => {
      val w = Window.partitionBy("city", "date")
        .orderBy(col("processed_mark").desc, col("o_orderkey"))
      Tables(s, dir).orders
        .select(lit("gold").as("layer"),
          col("o_orderpriority").as("city"),
          col("o_orderdate").cast("date").as("date"),
          col("o_totalprice").as("processed_mark"),
          col("o_orderkey"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("layer", "city", "date", "processed_mark", "o_orderkey")
        .orderBy("city", "date")
    }),
    // C2/J1: incremental partition diff — available minus processed
    "q08_incremental_diff" -> ((s, dir) => {
      val t = Tables(s, dir)
      // date-granularity partitions (like the reference's city/date): 'P'
      // is the rarest status, so plenty of (priority, date) partitions lack
      // it and the diff is non-empty at every SF
      val avail = t.orders
        .select(col("o_orderpriority").as("priority"),
          col("o_orderdate").cast("date").as("d"))
        .distinct()
      val done = t.orders.filter(col("o_orderstatus") === "P")
        .select(col("o_orderpriority").as("priority"),
          col("o_orderdate").cast("date").as("d"))
        .distinct()
      avail.join(done, Seq("priority", "d"), "left_anti").orderBy("priority", "d")
    }),
    // P3: STRPTIME-equivalent timestamp format/parse round trip (silver.py:31)
    "q09_timestamp_parse" -> ((s, dir) => {
      Tables(s, dir).events
        .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd'T'HH:mm").as("ts_str"))
        .withColumn("parsed", to_timestamp(col("ts_str"), "yyyy-MM-dd'T'HH:mm"))
        .orderBy("event_id")
    }),
    // S4: JSON flattening (bronze.py:15)
    "q10_json_flatten" -> ((s, dir) => {
      Tables(s, dir).events
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
    }),
    // ------------------------------------- relational completeness
    "q11_semi_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders.join(t.lineitem.filter(col("l_quantity") >= 45),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),
    // broadcast hash join + group-agg: revenue per brand
    "q12_broadcast_join_agg" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem.join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(round(sum(netPrice), 2).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    }),
    // multi-way join (TPC-H Q5 shape): revenue per nation in one region
    "q13_multi_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(round(sum(netPrice), 2).as("revenue"))
        .orderBy("n_name")
    }),
    // window top-k per group
    "q14_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir).orders
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rank")
    }),
    // running-sum window
    "q15_running_sum" -> ((s, dir) => {
      // order on exact nanos (ts_ns) so the fold order matches the ns-precision oracle
      val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      // round: DuckDB evaluates running windows via segment trees, so the
      // fold association differs; inputs are 2-decimal so round(4) is exact
      Tables(s, dir).events
        .select(col("user_id"), col("event_id"),
          round(sum("value").over(w), 4).as("running_value"))
        .orderBy("user_id", "event_id")
    }),
    // gap-based sessionization + per-session rollup
    "q16_sessionize" -> ((s, dir) => {
      Sessionize.sessionStats(Tables(s, dir).events, "user_id", "ts", "value",
        gapMinutes = 30, tieBreak = Seq("event_id"))
        .orderBy("user_id", "session_id")
    }),
    // ------------------------------------- LLM-pipeline: text analysis
    "q17_token_stats" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("lang"), TextAnalysis.tokenCount(col("text")).as("n_tok"))
        .groupBy("lang")
        .agg(sum("n_tok").as("total_tokens"),
          avg("n_tok").as("avg_tokens"), // integer sum: exact, order-independent
          count(lit(1)).as("n_docs"))
        .orderBy("lang")
    }),
    "q18_text_quality" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.punctCount(col("text")).as("n_punct"),
          TextAnalysis.stopwordCount(col("text")).as("n_stop"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),
    "q19_lang_guess" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("doc_id"), col("lang"), TextAnalysis.langGuess(col("text")).as("lang_guess"))
        .orderBy("doc_id")
    }),
    "q20_fingerprint" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),
    // ------------------------------------- LLM-pipeline: dedup
    "q21_dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(Tables(s, dir).documents, "doc_id", "text").orderBy("text_hash")
    }),
    "q22_dedup_fingerprint" -> ((s, dir) => {
      Dedup.fingerprintGroups(Tables(s, dir).documents, "doc_id", "text").orderBy("fp")
    }),
    "q23_blocked_jaccard" -> ((s, dir) => {
      Dedup.blockedJaccardPairs(Tables(s, dir).documents,
        "doc_id", "text", "lang", "n_chars", bucketWidth = 64, threshold = 0.8)
        .orderBy("id_a", "id_b")
    }),
    // MinHash+LSH candidate pairs, oracle-gated by construction (the q53
    // technique): corpus = documents plus an id-shifted EXACT copy of every
    // document. Identical text ⇒ identical signature ⇒ every band collides,
    // so the pair (d, d+1e6) MUST surface with est_jaccard exactly 1.0
    // (32/32 agreeing hashes). Output = those planted pairs, plus
    // well-formedness flags aggregated over the FULL pair set — a missed
    // copy, an unordered pair, a duplicate emission or an out-of-range
    // estimate each break the hash compare. (Natural near-dup pairs among
    // the sf documents also surface; the offset filter is immune to them.
    // Construction bounds: valid while max(doc_id) < 1e6 — no natural id
    // collides with a shifted one — and while no exact-duplicate text
    // group exceeds maxBucket/2 docs, past which the bucket cap reroutes
    // beyond-cap copies through the bucket minimum instead of their own
    // planted pair. Both hold with wide margin at every driver SF.)
    "q24_minhash_pairs" -> ((s, dir) => {
      val docs = Tables(s, dir).documentsSpread.select(col("doc_id"), col("text"))
      val corpus = docs.unionByName(
        docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      // lazy localCheckpoint: the pair set feeds both the planted-pair rows
      // and the sanity aggregate — one materialization instead of two sig
      // pipelines, and (unlike persist, which the CacheManager pins until
      // an unpersist that lazy query construction can never issue) the
      // cached blocks are reclaimed once the plan is dereferenced
      val pairs = Dedup.minhashCandidatePairs(corpus, "doc_id", "text")
        .localCheckpoint(false)
      val sanity = pairs.agg(
        bool_and(col("id_a") < col("id_b")).as("ordered_ok"),
        bool_and(col("est_jaccard") >= 0.0 && col("est_jaccard") <= 1.0).as("est_in_range"),
        (count(lit(1)) === count_distinct(col("id_a"), col("id_b"))).as("no_dup_pairs"))
      pairs
        .filter(col("id_b") === col("id_a") + 1000000L && col("est_jaccard") === 1.0)
        .select(col("id_a"), col("id_b"), col("est_jaccard"))
        .crossJoin(broadcast(sanity))
        .orderBy("id_a")
    }),
    // SimHash, oracle-gated through its exact algebraic invariants (the
    // 64-bit xxhash votes have no SQL analog, but the signature is a
    // bag-of-words SIGN of per-bit vote sums, so: word order can't change
    // it, and tripling the text triples every vote sum without changing any
    // sign). A broken bit loop, an order-dependent combine or a wrong
    // threshold each flip at least one flag.
    "q25_simhash" -> ((s, dir) => {
      val t = col("text")
      val variants = Tables(s, dir).documents.select(col("doc_id"),
        explode(array(
          struct(lit(0).as("v"), t.as("t")),
          struct(lit(1).as("v"), concat_ws(" ", t, t, t).as("t")),
          struct(lit(2).as("v"), array_join(reverse(split(trim(t), "\\s+")), " ").as("t"))
        )).as("x"))
        .select(col("doc_id"), col("x.v").as("v"), col("x.t").as("t"))
      val sigs = Dedup.simhashBulk(variants, Seq("doc_id", "v"), "t")
      sigs.groupBy("doc_id").agg(
        max(when(col("v") === 0, col("simhash"))).as("s1"),
        max(when(col("v") === 1, col("simhash"))).as("s3"),
        max(when(col("v") === 2, col("simhash"))).as("sr"))
        .select(col("doc_id"),
          (col("s1") === col("s3")).as("triple_invariant"),
          (col("s1") === col("sr")).as("order_invariant"),
          Dedup.hamming64(col("s1"), col("s3")).as("ham_triple"))
        .orderBy("doc_id")
    }),
    // ------------------------------------- LLM-pipeline: embeddings
    "q26_embedding_norms" -> ((s, dir) => {
      Tables(s, dir).embeddings
        .select(col("vec_id"),
          VectorFunctions.l2Norm(col("embedding")).as("norm"),
          size(col("embedding")).as("dim"))
        .orderBy("vec_id")
    }),
    "q27_cosine_topk" -> ((s, dir) => {
      val t = Tables(s, dir)
      val q = t.embeddings.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      Similarity.bruteForceTopK(t.embeddings, "vec_id", "embedding", q, 10)
        .orderBy("query_id", "rank")
    }),
    // MMR diversity re-ranking (Carbonell & Goldstein 1998) over the
    // embedding corpus: exact brute-force relevance shortlist (16 per
    // query), then 5 greedy all-Spark rounds of λ·rel − (1−λ)·max-sim
    // against the picked set — k-shot contexts that cover the
    // neighborhood instead of k near-duplicates of the top hit.
    "q288_mmr_diversify" -> ((s, dir) => {
      val t = Tables(s, dir)
      val q = t.embeddings.filter(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      Retrieval.mmrSelect(t.embeddings, "vec_id", "embedding", q,
          k = 5, shortlistN = 16, lambda = 0.5)
        .orderBy("query_id", "pick")
    }),
    // Embedding near-dup pairs through the LSH-BLOCKED path (the 100 TB
    // shape: pairs only ever meet inside a bucket, never an all-pairs
    // shuffle), gated by a construction where blocking is provably
    // lossless: a planted exact copy of every vector shares its source's
    // bucket by construction (identical vector ⇒ identical projections),
    // and the 0.999 threshold excludes every natural pair (measured max
    // natural cosine in the corpus is ≈0.6 at every SF). Blocked output ==
    // exact output == the planted pairs, with scores in closed form.
    "q28_embedding_neardup" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings.select(col("vec_id"), col("embedding"))
      val corpus = emb.unionByName(
        emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      Similarity.cosineNearDupPairsBlocked(corpus, "vec_id", "embedding",
        threshold = 0.999)
        .orderBy("id_a", "id_b")
    }),
    // LSH-bucketed ANN, oracle-gated by construction: 10 exact copies of
    // every query vector are planted into the corpus. Identical vectors
    // share the query's bucket by construction, and all score exactly the
    // query's self-cosine — far above any natural neighbor (max natural
    // cosine ≈0.6) — so the top-10 per query is {self, 9 lowest-id copies}
    // in closed form, ties broken by neighbor_id exactly as the operator
    // documents. A wrong bucket assignment, probe, or tie-break each
    // change the row set.
    "q29_ann_lsh" -> ((s, dir) => {
      val t = Tables(s, dir)
      val emb = t.embeddings.select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val copies = q
        .withColumn("j", explode(sequence(lit(1L), lit(10L))))
        .select((col("query_id") + col("j") * 100000L).as("vec_id"),
          col("query_vec").as("embedding"))
      val corpus = emb.unionByName(copies)
      Similarity.lshTopK(corpus, "vec_id", "embedding", q, 10, planes = 6)
        .orderBy("query_id", "rank")
    }),
    // ------------------------------------- events + multimodal
    "q30_event_window_agg" -> ((s, dir) => {
      Tables(s, dir).events
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        // avg = rounded-sum / count: dividing identical doubles is
        // bit-identical cross-engine, unlike rounding a raw avg (boundary-prone)
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 4).as("value_sum"),
          (round(sum("value"), 4) / count(lit(1))).as("value_avg"))
        .orderBy("hour", "event_type")
    }),
    // binary-column plumbing with stubbed decode (mapPartitions batch shape);
    // oracle reproduces the deterministic stub arithmetic in SQL
    "q31_multimodal_features" -> ((s, dir) => {
      Multimodal.extractFeatures(
        Multimodal.asMedia(Tables(s, dir).documents, "doc_id", "text"))
        .select("doc_id", "n_bytes", "width", "height", "channels")
        .orderBy("doc_id")
    }),
    // ------------------------------------- relational breadth
    // rollup with grouping indicator (subtotal + grand-total rows)
    "q32_rollup" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping_id().cast("int").as("gid"),
          sum("l_quantity").as("sum_qty"), // whole numbers: exact
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"),
          col("gid"))
    }),
    // EXCEPT / INTERSECT set operations, tagged and unioned
    "q33_setops" -> ((s, dir) => {
      val t = Tables(s, dir)
      val c = t.customer.select(col("c_custkey").as("k"))
      val o = t.orders.select(col("o_custkey").as("k"))
      c.except(o).withColumn("tag", lit("customer_only"))
        .unionByName(c.intersect(o).withColumn("tag", lit("both")))
        .select("tag", "k")
        .orderBy("tag", "k")
    }),
    // SQL surface: correlated EXISTS + correlated scalar subquery
    "q34_correlated_subquery" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer.createOrReplaceTempView("customer")
      t.orders.createOrReplaceTempView("orders")
      s.sql(
        """SELECT c_custkey, c_acctbal,
          |  (SELECT round(sum(o_totalprice), 2) FROM orders
          |   WHERE o_custkey = c_custkey) AS order_total
          |FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders
          |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
          |ORDER BY c_custkey""".stripMargin)
    }),
    // global ORDER BY + LIMIT (plans as TakeOrderedAndProject, no full sort)
    "q35_topn" -> ((s, dir) => {
      Tables(s, dir).orders
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    }),
    // pivot via conditional aggregation (dialect-portable pivot form)
    "q36_conditional_pivot" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("l_linestatus") === "F", col("l_quantity")).otherwise(0.0)).as("qty_f"),
          sum(when(col("l_linestatus") === "O", col("l_quantity")).otherwise(0.0)).as("qty_o"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),
    // as-of join (composed union + last-value window; DuckDB ASOF oracle):
    // for each event, the user's most recent purchase at or before it
    "q38_asof_join" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      // dedupe right side per (key, ts): as-of tie behavior is undefined
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts_ns")
        .agg(max("value").as("p_value"))
        .withColumn("p_ts_ns", col("ts_ns"))
      val left = ev.select("event_id", "user_id", "ts_ns")
      AsOf.joinLastBefore(left, purchases, "user_id", "ts_ns", Seq("p_ts_ns", "p_value"))
        .select(col("event_id"), col("user_id"),
          timestamp_micros(expr("asof_p_ts_ns DIV 1000")).as("prev_purchase_ts"),
          col("asof_p_value").as("p_value"))
        .orderBy("event_id")
    }),
    // TF-IDF-style top terms per language (rational scoring — no
    // transcendentals, so scores are bit-identical cross-engine)
    "q39_tfidf_top_terms" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val toks = docs.select(col("lang"), col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("term"))
      val tf = toks.groupBy("lang", "term").agg(count(lit(1)).as("tf"))
      val dfreq = toks.select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("lang").orderBy(col("score").desc, col("term"))
      tf.join(dfreq, Seq("term")).crossJoin(broadcast(nDocs))
        .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("lang"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
        .orderBy("lang", "rank")
    }),
    // per-column table profile (count/nulls/distinct/min/max/sum/mean)
    "q40_profile" -> ((s, dir) => {
      Profile.numericProfile(Tables(s, dir).lineitem,
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_name")
    }),
    // IVF ANN — data-adaptive cells vs q29's data-oblivious hyperplanes —
    // oracle-gated by full-probe equivalence: with nProbe = nCells every
    // cell is probed, so the whole index path (deterministic k-means build,
    // packed-centroid assignment, probe selection, exact re-rank) must
    // reproduce the brute-force top-k bit-for-bit; a vector routed to the
    // wrong cell, a mis-ranked probe or a broken re-rank each surface as a
    // missing or reordered row. The nProbe < nCells speed path is gated by
    // IvfIndexSpec's recall differential.
    "q41_ann_ivf" -> ((s, dir) => {
      val t = Tables(s, dir)
      val q = t.embeddings.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      IvfIndex.topK(t.embeddings, "vec_id", "embedding", q, k = 10,
        nCells = 16, nProbe = 16)
        .orderBy("query_id", "rank")
    }),
    // bigram counts via array zip (mirrored list_zip oracle)
    "q42_bigram_counts" -> ((s, dir) => {
      val arr = Tables(s, dir).documents
        .select(split(trim(col("text")), "\\s+").as("a1"))
        .withColumn("a2", slice(col("a1"), lit(2), greatest(size(col("a1")) - 1, lit(0))))
      arr.select(explode(arrays_zip(col("a1"), col("a2"))).as("p"))
        .filter(col("p.a2").isNotNull)
        .groupBy(col("p.a1").as("term"), col("p.a2").as("next"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term"), col("next"))
        .limit(20)
    }),
    // exact interpolated percentiles (R-7 in both engines); the three price
    // quantiles share ONE percentile buffer (array form) — separate agg
    // calls each collect the 600k values into their own buffer, measured 2×
    // exact quantiles via Quantiles.exact (distributed sort + order
    // statistics), NOT the percentile() aggregate — whose state buffers
    // every value and merges on one reducer (OOM at 100 TB). Results are
    // bit-compatible with the built-in (QuantilesSpec).
    "q43_quantiles" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
      val ep = Quantiles.exact(li, "l_extendedprice", Seq(0.25, 0.5, 0.75))
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val qm = Quantiles.exact(li, "l_quantity", Seq(0.5)).head.getDouble(1)
      li.limit(1).select(
        round(lit(ep(0.25)), 4).as("p25"),
        round(lit(ep(0.5)), 4).as("p50"),
        round(lit(ep(0.75)), 4).as("p75"),
        round(lit(qm), 4).as("qty_median"))
    }),
    // deterministic hash train/val split — stable in the key, so the exact
    // assignment reproduces in any engine (oracle shares the md5 logic)
    "q44_hash_split" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("lang"), Sampling.splitTag(col("doc_id"), 0.9).as("split"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("split", "lang")
    }),
    // End-to-end near-dup clustering (minhash pairs → connected components
    // → resolve), oracle-gated by construction: every document row gets a
    // synthetic text of 12 md5(doc_id:i) words — unique per document, zero
    // shingle overlap across documents (natural texts can't be used here:
    // the sf corpus contains near-dup pairs at shingle-Jaccard 0.99, which
    // collide on all 32 minhashes with high probability) — and is tripled
    // under id shifts. Each triple is fully linked at est_jaccard exactly
    // 1.0; the est = 1.0 filter plus disjoint shingle sets make the cluster
    // set exactly the triples, so resolve must collapse the corpus back to
    // precisely the original (doc_id, lang) table.
    "q45_dup_clusters" -> ((s, dir) => {
      val base = Tables(s, dir).documentsSpread.select(col("doc_id"), col("lang"),
        concat_ws(" ", (0 until 12).map(i =>
          md5(concat(col("doc_id").cast("string"), lit(s":w$i")))): _*).as("text"))
      def shifted(k: Long) = base.select(
        (col("doc_id") + k * 1000000L).as("doc_id"), col("lang"), col("text"))
      val corpus = base.unionByName(shifted(1)).unionByName(shifted(2))
      val pairs = Dedup.minhashCandidatePairs(corpus, "doc_id", "text")
        .filter(col("est_jaccard") === 1.0)
        .select("id_a", "id_b")
      DupClusters.resolve(corpus, "doc_id", pairs)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),
    // CUBE: all grouping-set combinations
    "q46_cube" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().cast("int").as("gid"),
          sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"),
          col("gid"))
    }),
    // window-function kernel: rank/dense_rank/ntile/lag/lead in one pass
    "q47_window_funcs" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          rank().over(w).cast("int").as("rnk"),
          dense_rank().over(w).cast("int").as("drnk"),
          ntile(4).over(w).cast("int").as("quartile"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_totalprice", 1).over(w).as("next_price"))
        .orderBy("o_orderkey")
    }),
    // ordered string aggregation (sorted distinct concat — deterministic in
    // both engines, unlike raw collect_list order)
    "q48_string_agg" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),
    // approximate aggregates, gated by exactness bounds: the oracle emits the
    // exact values plus literal TRUE flags, so the hash-compare proves the
    // HLL++/GK sketches landed within tolerance of exact (both sketches are
    // deterministic for fixed data — no flakiness)
    "q49_approx_agg" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      // exact median via the distributed-sort path (see q43) — the
      // percentile() aggregate's single-reducer merge does not scale
      val med = Quantiles.exact(ev, "value", Seq(0.5)).head.getDouble(1)
      val exactUsers = count_distinct(col("user_id"))
      val approxUsers = approx_count_distinct(col("user_id"), rsd = 0.01)
      val approxMedian = percentile_approx(col("value"), lit(0.5), lit(2000))
      ev.agg(
        exactUsers.as("exact_users"),
        (abs(approxUsers - exactUsers) <= exactUsers * 0.05).as("approx_users_ok"),
        approxMedian.as("_am"))
        .select(col("exact_users"), col("approx_users_ok"),
          round(lit(med), 4).as("median_val"),
          (abs(col("_am") - med) <= math.abs(med) * 0.01).as("approx_median_ok"))
    }),
    // range join: events joined to per-event preceding-1h intervals of the
    // same user via graft's binned point-in-interval join (shuffled equi-join
    // on (user, time-bin), never a nested-loop cartesian)
    "q50_range_join" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val hourUs = 3600L * 1000000L
      val pts = ev.select(col("event_id").as("b_id"), col("user_id"),
        unix_micros(col("ts")).as("b_us"))
      val ivs = ev.select(col("event_id").as("a_id"), col("user_id"),
        (unix_micros(col("ts")) - hourUs).as("start_us"),
        (unix_micros(col("ts")) - 1).as("end_us")) // end = a.ts − 1µs ⇒ strictly-before
      val counts = RangeJoin.pointInInterval(pts, "b_us", ivs, "start_us", "end_us",
        binWidth = hourUs, equiKeys = Seq("user_id"))
        .groupBy("a_id").agg(count(lit(1)).as("n_prior"))
      ev.join(counts, col("event_id") === col("a_id"), "left")
        .select(col("event_id"), coalesce(col("n_prior"), lit(0L)).as("n_prior"))
        .orderBy("event_id")
    }),
    // time-series gap repair: complete per-user daily grid, forward-filled.
    // The daily metric is an exact DECIMAL sum cast to double: parallel
    // double sums differ in last bits across engines, and round() on a
    // half-boundary double (e.g. x.xxxx5) rounds differently in Java
    // (shortest-repr HALF_UP) vs DuckDB (scaled-double) — the exact sum
    // sidesteps both
    "q51_resample_ffill" -> ((s, dir) => {
      val daily = Tables(s, dir).events
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))
      Resample.forwardFill(daily, Seq("user_id"), "day", Seq("v"),
        expr("INTERVAL 1 DAY"))
        .orderBy("user_id", "day")
    }),
    // stratified cap: exactly the n hash-smallest docs per language — the
    // salted two-level rank must reproduce the oracle's single window
    "q52_stratified_cap" -> ((s, dir) => {
      Sampling.stratifiedCap(Tables(s, dir).documents.select("doc_id", "lang"),
        Seq("lang"), "doc_id", n = 50)
        .orderBy("lang", "doc_id")
    }),
    // end-to-end dedup resolution, oracle-gated: corpus = documents plus two
    // id-shifted copies; candidate pairs link only copy2↔copy1↔original
    // (never copy2↔original), so recovering EXACTLY the original table
    // requires transitive closure AND min-id survivor choice — either
    // failing changes the output
    "q53_dedup_resolve" -> ((s, dir) => {
      val docs = Tables(s, dir).documents.select("doc_id", "lang")
      def shifted(k: Long) =
        docs.select((col("doc_id") + k * 1000000L).as("doc_id"), col("lang"))
      val corpus = docs.unionByName(shifted(1)).unionByName(shifted(2))
      val pairs = docs.select(col("doc_id").as("id_a"),
        (col("doc_id") + 1000000L).as("id_b"))
        .unionByName(docs.select((col("doc_id") + 1000000L).as("id_a"),
          (col("doc_id") + 2000000L).as("id_b")))
      DupClusters.resolve(corpus, "doc_id", pairs).orderBy("doc_id")
    }),
    // interval-overlap join: each event's [ts, ts+30min] window vs every
    // same-user window it overlaps (symmetric |Δts| ≤ 30min, self included)
    "q54_overlap_join" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val halfHourUs = 1800L * 1000000L
      def side(tag: String) = ev.select(col("event_id").as(s"${tag}_id"),
        col("user_id"), unix_micros(col("ts")).as(s"${tag}_s"),
        (unix_micros(col("ts")) + halfHourUs).as(s"${tag}_e"))
      RangeJoin.intervalOverlap(side("a"), "a_s", "a_e", side("b"), "b_s", "b_e",
        binWidth = halfHourUs, equiKeys = Seq("user_id"))
        .groupBy(col("a_id").as("event_id"))
        .agg(count(lit(1)).as("n_overlap"))
        .orderBy("event_id")
    }),
    // RANGE-frame window: value-based (not row-count) moving aggregates —
    // each row sees the trailing hour of its user's events. The moving sum
    // accumulates exact decimals (a double running sum is order-dependent:
    // DuckDB's segment trees fold in a different order)
    "q55_range_frame" -> ((s, dir) => {
      val hourUs = 3600L * 1000000L
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-hourUs, 0)
      Tables(s, dir).events
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("value").cast("decimal(18,6)").as("v"))
        .select(col("event_id"),
          count(lit(1)).over(w).as("n_trailing_hour"),
          sum(col("v")).over(w).cast("double").as("sum_trailing_hour"))
        .orderBy("event_id")
    }),
    // scalar-function breadth: string + date kernel over orders
    "q37_scalar_funcs" -> ((s, dir) => {
      Tables(s, dir).orders
        .select(col("o_orderkey"),
          upper(substring(col("o_orderpriority"), 1, 6)).as("prio_u"),
          length(col("o_orderpriority")).as("prio_len"),
          translate(col("o_orderpriority"), "-", "_").as("prio_t"),
          lpad(col("o_orderkey").cast("string"), 12, "0").as("key_pad"),
          reverse(col("o_orderstatus")).as("status_r"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since"))
        .orderBy("o_orderkey")
    }),
    // salted skew join: the salt/replicate/join/unsalt round trip must be
    // result-identical to the plain inner join the oracle states
    "q56_skew_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      graft.operators.SkewJoin.saltedInnerJoin(
        t.orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        t.customer.select(col("c_custkey").as("o_custkey"), col("c_name")),
        "o_custkey", salt = 8)
        .orderBy("o_orderkey")
    }),
    // the skew-proof bucketed sessionizer (local sessions per (user, 6h
    // bucket) + boundary stitching) must reproduce the single-window
    // operator's oracle exactly — q16's SQL verbatim
    "q58_sessionize_bucketed" -> ((s, dir) => {
      Sessionize.sessionStatsBucketed(Tables(s, dir).events, "user_id", "ts", "value",
        gapMinutes = 30, tieBreak = Seq("event_id"), bucketHours = 6)
        .orderBy("user_id", "session_id")
    }),
    // the chunked forward fill (per-chunk windows + cross-chunk carry) must
    // reproduce the interval operator's oracle exactly — q51's SQL verbatim
    "q59_resample_bucketed" -> ((s, dir) => {
      val daily = Tables(s, dir).events
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))
      Resample.forwardFillBucketed(daily, Seq("user_id"), "day", Seq("v"),
        stepSeconds = 86400L, chunkSeconds = 8L * 86400L)
        .orderBy("user_id", "day")
    }),
    // PII redaction over a planted corpus: the word-salad text carries no
    // digits or '@', so appending one email + IPv4 + phone per row makes the
    // expected output derivable exactly — the oracle states the typed tags
    "q60_redact_pii" -> ((s, dir) => {
      val planted = concat(
        col("text"), lit(" mail user"), col("doc_id"),
        lit("@ex-ample.org ip 10."), col("doc_id") % 256,
        lit(".0.1 tel +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      Tables(s, dir).documents
        .select(col("doc_id"), graft.operators.Scrub.redactPii(planted).as("redacted"))
        .orderBy("doc_id")
    }),
    // intra-document repetition: duplicate-token ratio, pure per-row math
    "q61_dup_token_ratio" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      Tables(s, dir).documents.select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
        graft.operators.Scrub.duplicateTokenRatio(col("text")).as("dup_ratio"))
        .orderBy("doc_id")
    }),
    // benchmark contamination: src0 is the "eval suite", every other doc is
    // checked for distinct 3-gram collisions against it
    "q62_contamination" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      graft.operators.Scrub.contamination(
        d.filter(col("source") =!= "src0"),
        d.filter(col("source") === "src0"),
        "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),
    // document-frequency boilerplate scrub: drop tokens present in >78% of
    // documents, preserve original token order, keep fully-scrubbed docs
    "q63_df_scrub" -> ((s, dir) => {
      graft.operators.Scrub.docFrequencyScrub(
        Tables(s, dir).documents, "doc_id", "text", maxDocPct = 78)
        .orderBy("doc_id")
    }),
    // per-label embedding centroids, one row per (label, dimension):
    // exact decimal sums make the parallel aggregation order invisible
    "q64_label_centroids" -> ((s, dir) => {
      Similarity.centroids(Tables(s, dir).embeddings, "label", "embedding")
        .select(col("label"), col("pos").cast("long").as("pos"), col("c"), col("n_vecs"))
        .orderBy("label", "pos")
    }),
    // two-table fuzzy join: link every document against the src1 snapshot
    // by blocked char-set Jaccard — the entity-matching shape
    "q65_fuzzy_join" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      Dedup.fuzzyJoinJaccard(d, d.filter(col("source") === "src1"),
        "doc_id", "text", "lang", "n_chars", bucketWidth = 64, threshold = 0.9)
        .orderBy("id_l", "id_r")
    }),
    // deep-chain connected components: 50 id-shifted copies per document,
    // linked ONLY consecutively — recovering the clusters needs a 49-hop
    // transitive closure, which the pointer-jumping CC must collapse (the
    // spec additionally asserts it converges in O(log chain) rounds, not 49)
    "q57_chain_components" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
        .filter(col("doc_id") < 100).select("doc_id", "lang")
      // one scan + explode, not a 50-way union (which would rescan the
      // parquet once per copy)
      val corpus = docs
        .select(col("doc_id"), col("lang"), explode(sequence(lit(0L), lit(49L))).as("_k"))
        .select((col("doc_id") + col("_k") * 1000000L).as("doc_id"), col("lang"))
      val pairs = docs
        .select(col("doc_id"), explode(sequence(lit(0L), lit(48L))).as("_k"))
        .select((col("doc_id") + col("_k") * 1000000L).as("id_a"),
          (col("doc_id") + (col("_k") + 1L) * 1000000L).as("id_b"))
      DupClusters.resolve(corpus, "doc_id", pairs).orderBy("doc_id")
    }),
    // greedy context-window packing per (source, lang) shard — the oracle
    // replays the same sequential fill with a recursive CTE (one row per
    // shard advances per recursion step, so depth = max shard size)
    "q66_greedy_pack" -> ((s, dir) => {
      Pack.greedyPack(Tables(s, dir).documents, "doc_id", "n_chars",
          Seq("source", "lang"), capacity = 2048L)
        .orderBy("doc_id")
    }),
    // data-mixing rates per source: upsample src0, drop src2, default 25%
    "q67_mixture_sample" -> ((s, dir) => {
      Sampling.mixtureByHash(Tables(s, dir).documents, "doc_id", "source",
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0), defaultFrac = 0.25)
        .select("doc_id", "source", "n_chars").orderBy("doc_id")
    }),
    // token-budget mixing: ~20k chars per source, hash-ordered pick; the
    // bucketed two-level prefix sum must equal the oracle's single window
    "q68_token_budget" -> ((s, dir) => {
      Sampling.tokenBudgetCap(Tables(s, dir).documents, Seq("source"),
          "doc_id", "n_chars", budget = 20000L, buckets = 16)
        .select("doc_id", "source", "n_chars").orderBy("doc_id")
    }),
    // winnowing (rolling-hash) fingerprints: exact integer polynomial
    // hashes, so the oracle recomputes the identical fingerprint sets
    "q74_winnowing_fp" -> ((s, dir) => {
      Tables(s, dir).documentsSpread
        .select(col("doc_id"),
          explode(TextAnalysis.winnowingFingerprints(col("text"), k = 5, w = 8)).as("fp"))
        .orderBy("doc_id", "fp")
    }),
    // multiprobe ANN on the same planted-copy construction as q29: home +
    // Hamming-1 probes only ADD candidates, and every addition scores
    // below the planted copies' self-cosine, so the closed-form top-10 is
    // unchanged — which is the point (extra probes must not corrupt the
    // ranked result, only improve recall)
    "q75_ann_multiprobe" -> ((s, dir) => {
      val t = Tables(s, dir)
      val emb = t.embeddings.select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val copies = q
        .withColumn("j", explode(sequence(lit(1L), lit(10L))))
        .select((col("query_id") + col("j") * 100000L).as("vec_id"),
          col("query_vec").as("embedding"))
      val corpus = emb.unionByName(copies)
      Similarity.lshTopKMultiprobe(corpus, "vec_id", "embedding", q, 10, planes = 6)
        .orderBy("query_id", "rank")
    }),
    // SemDeDup on the copy-planted corpus: identical vectors share a
    // Voronoi cell by construction and score self-cosine >= 0.999, every
    // natural within-cell pair stays far below, so each {vec, copy} group
    // collapses to the original id — closed form. A wrong cell assignment,
    // a severed component, or a leaked singleton each change the row set.
    "q77_semantic_dedup" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings.select(col("vec_id"), col("embedding"))
      val corpus = emb.unionByName(
        emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      IvfIndex.semanticDedup(corpus, "vec_id", "embedding",
          threshold = 0.999, nCells = 8)
        .orderBy("id")
    }),
    // overlapping token-window chunking (the RAG / context-window prep
    // step): pure token-position arithmetic, so the oracle rebuilds the
    // identical chunk set with generate_series + list_slice
    "q76_chunk_windows" -> ((s, dir) => {
      Chunk.tokenWindows(Tables(s, dir).documents, "doc_id", "text",
          chunkTokens = 64, overlapTokens = 16)
        .orderBy("doc_id", "chunk_id")
    }),
    // grouped top-k via the bounded-heap Catalyst aggregate: O(k) state per
    // group at every stage (map-side partial heaps, pairwise merge), vs the
    // window formulation's whole-group shuffle-and-sort — the oracle IS the
    // window formulation, so the heap must reproduce it row-for-row
    "q78_group_topk" -> ((s, dir) => {
      Tables(s, dir).documents
        .groupBy("lang")
        .agg(TopK.topK(5, col("n_chars"), col("doc_id"),
          struct(col("doc_id"), col("n_chars"))).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), (col("pos") + 1).cast("int").as("rnk"),
          col("col.payload.doc_id").as("doc_id"),
          col("col.payload.n_chars").as("n_chars"))
        .orderBy("lang", "rnk")
    }),
    // weight-proportional (PPS systematic) sample: int64 cumulative-weight
    // selection over md5-hash order — zero floats, so the oracle recomputes
    // the exact same selection with window sums and integer division
    "q79_pps_sample" -> ((s, dir) => {
      Sampling.ppsSample(Tables(s, dir).documents, Seq("lang"), "doc_id",
          "n_chars", k = 40, buckets = 16)
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")
    }),
    // bloom-prefiltered anti-join (exclude-list scrub): the sketch only
    // PRUNES — definite-absent rows skip the shuffle, possible-members
    // verify through the exact anti-join — so false positives cannot change
    // the answer and the oracle is the plain NOT EXISTS
    "q80_bloom_anti" -> ((s, dir) => {
      val t = Tables(s, dir)
      val late = t.lineitem
        .filter(col("l_shipdate") > lit("1997-06-01")).select("l_orderkey")
      BloomJoin.antiJoin(t.orders.select("o_orderkey", "o_totalprice"), late,
          "o_orderkey", "l_orderkey", expectedItems = 500000L)
        .orderBy("o_orderkey")
    }),
    // exact repeated-passage spans (the Lee et al. exact-substring-dedup
    // shape): window keys are plain md5 strings over lowercased tokens, so
    // the oracle recomputes the identical corpus-global marking and
    // gaps-and-islands merge — no sketching anywhere
    "q81_repeated_passages" -> ((s, dir) => {
      Dedup.repeatedPassages(Tables(s, dir).documents, "doc_id", "text",
          n = 8, minCount = 2L)
        .orderBy("doc_id", "span_start")
    }),
    // exact word-bigram Jaccard pairs (MinHash's exact counterpart) over
    // the copy-planted corpus: planted pairs score exactly 1.0, and any
    // natural pair at/above threshold is computed identically by both
    // engines (string-set arithmetic — no sketching, no rounding)
    "q73_ngram_jaccard" -> ((s, dir) => {
      val d = Tables(s, dir).documentsSpread.select("doc_id", "text", "lang", "n_chars")
      val corpus = d.unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"),
        col("text"), col("lang"), col("n_chars")))
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", "lang", "n_chars",
          n = 2, bucketWidth = 64, threshold = 0.5)
        .orderBy("id_a", "id_b")
    }),
    // leakage-safe split: near-duplicate CLUSTERS are the split unit, so a
    // train document's near-dup can never leak into val. Construction: a
    // tripled corpus (q53's technique) whose clusters are known in closed
    // form (d, d+1e6, d+2e6 → cluster d), so the oracle derives cluster_id
    // arithmetically and applies the same md5 split threshold
    "q72_leakage_safe_split" -> ((s, dir) => {
      val docs = Tables(s, dir).documents.filter(col("doc_id") < 200).select("doc_id")
      val corpus = docs
        .select(col("doc_id"), explode(sequence(lit(0L), lit(2L))).as("_k"))
        .select((col("doc_id") + col("_k") * 1000000L).as("doc_id"))
      val pairs = docs
        .select(col("doc_id"), explode(sequence(lit(0L), lit(1L))).as("_k"))
        .select((col("doc_id") + col("_k") * 1000000L).as("id_a"),
          (col("doc_id") + (col("_k") + 1L) * 1000000L).as("id_b"))
      val comp = DupClusters.components(pairs).withColumnRenamed("id", "doc_id")
      corpus.join(comp, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
        .withColumn("split", Sampling.splitTag(col("cluster_id"), 0.8, "leak"))
        .orderBy("doc_id")
    }),
    // quantized-index ANN (int8 IVF with exact re-rank): q29's planted-copy
    // construction — copies carry the query vector verbatim, so they share
    // its cell, survive the quantized shortlist (approx score ≈ 1 vs ≈ 0.6
    // natural ceiling), and the EXACT re-rank pins their reported scores to
    // the same closed-form expression the oracle states
    "q71_ann_ivf_int8" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings.select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val copies = q
        .withColumn("j", explode(sequence(lit(1L), lit(10L))))
        .select((col("query_id") + col("j") * 100000L).as("vec_id"),
          col("query_vec").as("embedding"))
      IvfIndex.topKQuantized(emb.unionByName(copies), "vec_id", "embedding",
          q, 10, nCells = 16, nProbe = 6, iters = 2, shortlistFactor = 4)
        .orderBy("query_id", "rank")
    }),
    // materialized packed corpus: one row per context window, texts joined
    // in id order — the actual training-row output of the packing step
    "q70_pack_corpus" -> ((s, dir) => {
      Pack.packCorpus(Tables(s, dir).documents, "doc_id", "text", "n_chars",
          Seq("source", "lang"), capacity = 2048L, sep = "\n")
        .orderBy("source", "lang", "pack_id")
    }),
    // int8 embedding quantization: the quantized integers are bit-exactly
    // reproducible cross-engine (fixed-order per-row double arithmetic), so
    // the oracle states the whole integer payload, not a tolerance
    "q69_quantize_int8" -> ((s, dir) => {
      Tables(s, dir).embeddings
        .select(col("vec_id"),
          VectorFunctions.quantizeInt8(col("embedding")).as("s"))
        .select(col("vec_id"), col("s.scale").as("scale"),
          aggregate(col("s.q"), lit(0L), (a, x) => a + x).as("q_sum"),
          array_min(col("s.q")).as("q_min"), array_max(col("s.q")).as("q_max"))
        .orderBy("vec_id")
    }),
  )
}
