package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Sketches, TopK, VecDot, VectorFunctions}
import graft.operators.{AsOf, Audit, BloomJoin, Bpe, Chunk, Classifier, Coreset, Dedup, DupClusters, Experiment, Features, Graph, Importance, IncrementalDedup, Intervals, IvfIndex, Keywords, LanguageModel, Layout, Linkage, Multimodal, Novelty, Pack, Phrases, Pq, Preference, Profile, Quantiles, RangeJoin, Ranks, Resample, Retention, Retrieval, Rfm, Sampling, Scd, Scrub, Sessionize, SetSketch, Similarity, SkewJoin, Snapshot, Spatial, TextAnalysis, Trend, Unigram}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One `queries` entry per operator from SURVEY.md §2 (reference parity,
  * q01–q16) plus the LLM-data-pipeline extensions (q17–q30). Each query has
  * an exact DuckDB oracle in `oracleSql` unless noted; both sides alias
  * every computed column identically, round floating aggregates, and end in
  * a total ORDER BY so the hash compare is deterministic.
  */
object SparkEntry {

  /** Flagship: the reference's gold-layer aggregate shape (gold.py:71-81)
    * over sf0.001 lineitem. */
  def entry(spark: SparkSession): DataFrame =
    goldAgg(Tables(spark, "/root/testdata/sf0.001"))

  private def netPrice: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** Deterministic ~1.6% document pick (md5 hex prefix < "04" = 4/256),
    * replayed verbatim by the oracle as
    * `md5(CAST(doc_id AS VARCHAR) || ':osample') < '04'` — the subset
    * harness for scoring queries whose DuckDB oracle is
    * interpreter-bound at large scale (q100s/q101s/q103s/q105s). */
  private def oracleSample(id: Column): Column = oracleSampleAt(id, "04")

  /** The q100s sample predicate at an arbitrary hex threshold — the
    * sf1.0 heavy-tail variants (q182s/q217s/q227s) need denser samples
    * than the 1.6% scoring harness so the smallest SFs stay non-empty. */
  private def oracleSampleAt(id: Column, hexLt: String): Column =
    md5(concat(id.cast("string"), lit(":osample"))) < hexLt

  /** Shared CDC fixture for q274/q301: one row per (user, ts), version =
    * µs timestamp (unique per key by construction), payload collapsed
    * deterministically, 16 hash partitions. */
  private def cdcFixture(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .groupBy(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ver"))
      .agg(max(col("event_type")).as("event_type"),
        max(col("value").cast("double")).as("value"))
      .withColumn("part", pmod(col("user_id"), lit(16L)).cast("int"))

  /** Read back a merged CDC lake table in the q274/q301 gate shape. */
  private def cdcReadBack(s: SparkSession, root: String): DataFrame =
    s.read.parquet(root)
      .select(col("user_id"), col("ver"), col("event_type"),
        col("value"), col("part").cast("int").as("part"))
      .orderBy("user_id")

  // No rounding: quantities are whole numbers (sum is exact in double, so
  // avg is order-independent) and max/min/count are exact — both engines
  // produce bit-identical values.
  private def goldAgg(t: Tables): DataFrame =
    t.lineitem.groupBy("l_returnflag", "l_linestatus").agg(
      avg("l_quantity").as("avg_qty"),
      max("l_extendedprice").as("max_price"),
      min("l_extendedprice").as("min_price"),
      count(lit(1)).as("record_count"))
      .orderBy("l_returnflag", "l_linestatus")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
      Profile.correlationMatrix(Tables(s, dir).lineitem,
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
      val stream = s.readStream.schema(ev.schema).parquet(staging)
        .as[StreamingOps.TransitionEvent]
      val pairs = StreamingOps.transitionStream(stream)(s)
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
        val stream = s.readStream.schema(ev.schema)
          .option("pathGlobFilter", "*.parquet").parquet(arrive + "/*")
          .as[StreamingOps.TransitionEvent]
        StreamingOps.transitionStream(stream)(s).writeStream
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
      val ls = s.readStream.schema(sch).parquet(stagingL)
      val rs = s.readStream.schema(sch).parquet(stagingR)
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
      def src(p: String) = s.readStream.schema(sch)
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
      def drain(): Unit = {
        def src(p: String) = s.readStream.schema(sch)
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
      def src(p: String) = s.readStream.schema(sch)
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
      val stream = s.readStream.schema(ev.schema).parquet(staging)
        .as[StreamingOps.FunnelEvent]
      val prog = StreamingOps.funnelStream(stream,
        Seq("view", "click", "purchase"))(s)
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
      val stream = s.readStream.schema(ev.schema).parquet(staging)
        .as[StreamingOps.SessionEvent]
      val sessions = StreamingOps.sessionizeStream(stream,
        gapMs = 1800000000L,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(s)
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
      val stream = s.readStream.schema(ev.schema)
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
      val stream = s.readStream.schema(ev.schema)
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
      val stream = s.readStream.schema(ev.schema).parquet(staging)
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
      val stream = s.readStream.schema(ev.schema).parquet(staging)
        .as[StreamingOps.QuotaEvent]
      implicit val sp: SparkSession = s
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
      val stream = s.readStream.schema(cdc.schema)
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
      StreamingOps.upsertSinkWithRecovery(s, staging, cdc.schema, root,
        Seq("user_id"), Seq("part"), "ver", ckpt)
      cdcReadBack(s, root)
    }),
    // Exact duplicated-span removals (Lee et al. 2022): positions whose
    // EXACT 25-token gram repeats anywhere, all-but-the-first occurrence
    // marked, marks merged to per-doc spans — the classic exact-substring
    // training-data dedup, relational (sorted k-gram join, no suffix
    // array materialized).
    "q237_exact_substring_removals" -> ((s, dir) => {
      Dedup.exactSubstringRemovals(Tables(s, dir).documents, "doc_id",
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
    // Lead-lag screen: cross-correlation of daily views vs purchases
    // at lags -7..7 — exact sufficient sums per lag, gaps drop pairs.
    "q230_cross_correlation" -> ((s, dir) => {
      val piv = Tables(s, dir).events
        .filter(col("ts").isNotNull)
        .groupBy(floor(unix_micros(col("ts")).cast("double") /
          lit(86400.0e6)).cast("long").as("day"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .cast("double").as("views"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("double").as("purchases"))
      Trend.crossCorrelation(piv, "day", "views", "purchases",
          maxLag = 7)
        .orderBy("lag")
    }),
    // Change-point by binary segmentation on the daily volume series:
    // exact prefix sums, fixed-order SSE costs, earliest-split ties.
    "q228_change_point" -> ((s, dir) => {
      val daily = Tables(s, dir).events
        .filter(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"),
          floor(unix_micros(col("ts")).cast("double") / lit(86400.0e6))
            .cast("long").as("day"))
        .agg(count(lit(1)).cast("double").as("n_events"))
      Trend.changePoint(daily, Seq("event_type"), "day", "n_events")
        .orderBy("event_type")
    }),
    // GloVe-style co-occurrence matrix head: harmonic 1/d window
    // weights as exact lcm-scaled integers (12/6/4/3), canonical
    // unordered pairs, TopK heap selection.
    "q227_glove_cooc" -> ((s, dir) => {
      Phrases.gloveCooc(Tables(s, dir).documents, "text", window = 4,
          k = 100)
        .orderBy("rank")
    }),
    // k-anonymity/l-diversity release audit on customer quasi-ids
    // (nation, segment, account-balance hundreds): exact class sizes,
    // null-as-value diversity.
    "q226_k_anonymity" -> ((s, dir) => {
      val c = Tables(s, dir).customer
        .withColumn("bal_bucket",
          floor(col("c_acctbal").cast("double") / lit(100.0))
            .cast("long"))
      Scrub.kAnonymity(c, Seq("c_nationkey", "c_mktsegment", "bal_bucket"),
        "c_custkey", k = 5L, l = 2L)
    }),
    // Cohort LTV curves over epoch-week cohorts: exact micro-unit
    // revenue cells, cohort-partitioned cumulative, per-user LTV.
    "q225_ltv_curve" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .filter(col("ts").isNotNull)
        .withColumn("week",
          floor(unix_micros(col("ts")).cast("double") / lit(86400e6 * 7))
            .cast("long"))
      Retention.ltvCurve(ev, "user_id", "week", "value")
        .orderBy("cohort", "age")
    }),
    // Bot-regularity screen: planted clockwork users (60s grid via
    // per-user row_number) must flag; the CV threshold is decided on
    // exact integers, never a double.
    "q224_bot_regularity" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val planted = ev.withColumn("_rn", row_number().over(w))
        .select(col("user_id"), col("event_id"),
          when(col("user_id") % 37 === 0,
            timestamp_micros(col("_rn") * lit(60000000L)))
            .otherwise(col("ts")).as("ts2"))
      Sessionize.botRegularity(planted, "user_id", "ts2",
          minGaps = 5L, cvPct = 10L, tieBreak = Seq("event_id"))
        .orderBy("user")
    }),
    // Rare-transition anomaly screen: a planted ~1% state makes some
    // transitions genuinely rare; flags decided on exact integers
    // (n*k < total), never a double.
    "q223_rare_transitions" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .filter(col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_id") % 97 === 0, lit("rare_evt"))
            .otherwise(col("event_type")).as("state"))
      Sessionize.rareTransitions(ev, "user_id", "ts", "state", k = 50L,
          tieBreak = Seq("event_id"))
        .orderBy("user")
    }),
    // Time-decay multi-touch attribution: exact dyadic half-life
    // weights (scaled 2^(62-k) integers, decimal(38,0) sums) — no
    // window, no ordering, one channel aggregation.
    "q222_time_decay" -> ((s, dir) => {
      Sessionize.timeDecayAttribution(Tables(s, dir).events, "user_id",
          "ts", "event_type", "purchase", halfLifeDays = 7)
        .orderBy("channel")
    }),
    // RFM customer-value grid: recency/frequency/monetary quintiles by
    // deterministic rank cuts (user-id tiebreaks), exact metrics,
    // segment-sized output.
    "q221_rfm_segments" -> ((s, dir) => {
      Rfm.rfmSegments(Tables(s, dir).events, "user_id", "ts", "value",
          nBuckets = 5)
        .orderBy("r_score", "f_score", "m_score")
    }),
    // Functional-dependency audit over lineitem: which "X determines Y"
    // rules actually hold — exact per-key distinct-value counts, null
    // dependents counted as values.
    "q220_fd_violations" -> ((s, dir) => {
      Audit.fdViolations(Tables(s, dir).lineitem,
          Seq("l_orderkey" -> "l_returnflag",
            "l_orderkey" -> "l_linestatus",
            "l_partkey" -> "l_suppkey",
            "l_suppkey" -> "l_returnflag"))
        .orderBy("determinant", "dependent")
    }),
    // DAU/WAU stickiness: exact trailing-7-day distinct actives via the
    // fan-out equi-join (never a sliding DISTINCT window), spine-clipped.
    "q219_stickiness" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .filter(col("ts").isNotNull)
        .withColumn("day",
          floor(unix_micros(col("ts")).cast("double") / lit(86400.0e6))
            .cast("long"))
      Retention.stickiness(ev, "user_id", "day", windowDays = 7)
        .orderBy("day")
    }),
    // MAU growth accounting over epoch-week buckets: every active user
    // is new/retained/resurrected exactly once per period, churn lands
    // in the period the user went silent, quick ratio from exact counts.
    "q210_growth_accounting" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .filter(col("ts").isNotNull)
        .withColumn("week",
          floor(unix_micros(col("ts")).cast("double") / lit(86400e6 * 7))
            .cast("long"))
      Retention.growthAccounting(ev, "user_id", "week")
        .orderBy("period")
    }),
    // Geo radius join WITHOUT the cross product: md5-derived planar
    // micro-degree coordinates, cell-size-R grid buckets (right side
    // replicated 3x3), exact integer distance filter; the brute-force
    // oracle proves the bucketing loses nothing.
    // k=3 nearest suppliers within R per customer (bounded spatial kNN):
    // the q209 grid candidates ranked by exact integer (dist_sq, r_id).
    // The oracle is again the brute-force cross — the grid AND the cut
    // must lose nothing.
    "q244_knn_within_radius" -> ((s, dir) => {
      val t = Tables(s, dir)
      def coord(key: Column, tag: String) =
        conv(substring(md5(concat(key.cast("string"), lit(tag))), 1, 6),
          16, 10).cast("long") % 10000000L
      val cust = t.customer.filter(col("c_nationkey") === 3)
        .select(col("c_custkey"),
          coord(col("c_custkey"), ":cx").as("x"),
          coord(col("c_custkey"), ":cy").as("y"))
      val supp = t.supplier
        .select(col("s_suppkey"),
          coord(col("s_suppkey"), ":sx").as("x"),
          coord(col("s_suppkey"), ":sy").as("y"))
      Spatial.knnWithinRadius(
          cust.withColumnRenamed("c_custkey", "pid"),
          supp.withColumnRenamed("s_suppkey", "pid"),
          "pid", "x", "y", radius = 1000000L, k = 3)
        .orderBy("l_id", "rank")
    }),
    // Matryoshka truncation eval (Kusupati et al. 2022): recall@10 of
    // the 16-dim prefix ranking against the full-dim exact ranking —
    // both sides the q27 cosine chain, so the oracle replays everything.
    "q259_matryoshka_recall" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings.select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val full = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      val te = emb.select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("embedding"))
      val tq = q.select(col("query_id"),
        slice(col("query_vec"), 1, 16).as("query_vec"))
      val trunc = Similarity.bruteForceTopK(te, "vec_id", "embedding", tq, 10)
      Similarity.recallAtK(trunc, full).orderBy("query_id")
    }),
    // Modularity of the q249 label-propagation partition: exact
    // Q * 4m^2 integer numerator, community-ordered fold — the quality
    // score that says whether LPA found real structure.
    "q269_modularity" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("a"))
        .join(li.select(col("ok"), col("sk").as("b")), "ok")
        .filter(col("a") =!= col("b"))
        .select("a", "b")
      val labels = Graph.labelPropagation(edges, "a", "b", iters = 3)
      Graph.modularity(edges, "a", "b", labels, "node", "label")
    }),
    // sf1.0 heavy-tail s-variants (the q182s/q217s/q237s convention):
    // q286/q287/q292 price at 10.8/14.3/16.6 s on the sf1.0 decade, so
    // each gets an md5-sampled twin the driver's gate can run instead —
    // 25%, except q286s at 50% ("80"): wedges are quadratic in the
    // sample, and 25% left sf0.001 with zero cn >= 2 pairs (see
    // linkPredictionOracleSql's note)
    "q286s_link_prediction_sampled" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0 &&
          oracleSampleAt(col("l_orderkey"), "80"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.select(col("ok"), col("pk").as("a"))
        .join(li.select(col("ok"), col("pk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .select("a", "b")
      Graph.linkPrediction(edges, "a", "b", maxCenterDegree = 256,
        minCommon = 2L).orderBy("u", "w")
    }),
    "q287s_nb_multiclass_sampled" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .filter(oracleSampleAt(col("doc_id"), "40"))
      val seed = d.filter(col("doc_id") % 4 =!= 0)
        .select(col("lang"), col("text"))
      Classifier.nbMulticlassScore(d, "doc_id", "text",
          Classifier.nbMulticlassTrain(seed, "text", "lang"))
        .orderBy("doc_id")
    }),
    "q292s_poisson_bootstrap_sampled" -> ((s, dir) => {
      val ev = Tables(s, dir).events.filter(col("event_type").isNotNull &&
        oracleSampleAt(col("event_id"), "40"))
      Experiment.poissonBootstrapMean(ev, Seq("event_type"), "event_id",
        "value", reps = 64, loIdx = 2, hiIdx = 63).orderBy("event_type")
    }),
    // Cohen's d / Hedges' g standardized effect size between the q176 md5
    // arms on per-user exact-decimal value sums — every output one fixed
    // IEEE chain over six exact sums, no rounding anywhere.
    "q298_cohens_d" -> ((s, dir) => {
      val units = Tables(s, dir).events
        .filter(col("user_id").isNotNull)
        .groupBy("user_id")
        .agg(sum(coalesce(col("value").cast("decimal(18,6)"),
          lit(0L).cast("decimal(18,6)"))).as("y"))
        .select(when(substring(md5(concat(col("user_id").cast("string"),
          lit(":ab"))), 1, 1) >= "8", "treat").otherwise("ctrl").as("arm"),
          col("y"))
      Experiment.cohensD(units, "arm", "y", "treat", "ctrl")
    }),
    // Mantel-Haenszel pooled odds ratio over nation strata: unit = user,
    // treated = the q176 md5 arm, outcome = any event value > 50 (exact
    // decimal max), stratum = the user's nation — does treatment
    // associate with the outcome once geography is held fixed?
    "q297_mantel_haenszel" -> ((s, dir) => {
      val t = Tables(s, dir)
      val units = t.events
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .groupBy("user_id")
        .agg(max(col("value").cast("decimal(18,6)")).as("_mx"))
        .select(col("user_id"),
          (substring(md5(concat(col("user_id").cast("string"), lit(":ab"))),
            1, 1) >= "8").as("treated"),
          (col("_mx") > lit(50L).cast("decimal(18,6)")).as("outcome"))
        .join(t.customer.select(col("c_custkey").as("user_id"),
          col("c_nationkey")), Seq("user_id"))
      Experiment.mantelHaenszel(units, "c_nationkey", "treated", "outcome")
    }),
    // American Soundex phonetic keys (census / Knuth rules) over each
    // document's first token — the classic linkage blocking key, own
    // integer-state-fold implementation so the oracle replays the exact
    // specification (Spark's builtin soundex would need its H/W edge
    // cases reverse-engineered).
    "q296_soundex_keys" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("doc_id"),
          TextAnalysis.soundex(
            element_at(split(col("text"), " "), 1)).as("sx"))
        .orderBy("doc_id")
    }),
    // Fellegi-Sunter per-field match weights (1969): u estimated EXACTLY
    // from the value histogram (sum n_v^2 / N^2, nulls as values), m an
    // explicit 1e-6-unit prior, both logs 6dp floor-rounded.
    "q294_fs_weights" -> ((s, dir) => {
      val c = Tables(s, dir).customer.select(col("c_mktsegment"),
        col("c_nationkey"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)" +
          " DIV 100000").as("bal_bucket"))
      Linkage.fellegiSunterWeights(c,
        Seq("c_mktsegment", "c_nationkey", "bal_bucket")).orderBy("field")
    }),
    // The composed probabilistic-linkage chain: sorted-neighborhood
    // candidates over c_name, scored with the q294 weights — agree adds
    // ln(m/u), disagree adds ln((1-m)/(1-u)), declared field order,
    // 4dp floor round.
    "q295_fs_scored_pairs" -> ((s, dir) => {
      val c = Tables(s, dir).customer.select(col("c_custkey"),
        col("c_name"), col("c_mktsegment"), col("c_nationkey"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)" +
          " DIV 100000").as("bal_bucket"))
      val fields = Seq("c_mktsegment", "c_nationkey", "bal_bucket")
      val w = Linkage.fellegiSunterWeights(c, fields)
      val pairs = Linkage.sortedNeighborhoodPairs(c, "c_custkey", "c_name",
        window = 3)
      Linkage.fsScorePairs(pairs.select("id_a", "id_b"), c, "c_custkey",
        fields, w).orderBy("id_a", "id_b")
    }),
    // Platt scaling over the q115 NB quality scores: the textbook
    // raw-margin -> probability chain (Platt 1999), fit by 4 integer
    // fixed-point Newton steps whose full trajectory is the gated output
    // (every step verified, not just a fixed point).
    "q293_platt_scaling" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      val seed = d.filter(col("doc_id") % 3 === 0)
        .select((col("lang") === "en").as("y"), col("text"))
      val scored = Classifier.nbScore(d, "doc_id", "text",
          Classifier.nbTrain(seed, "text", "y"))
        .join(d.select(col("doc_id"), (col("lang") === "en").as("y")),
          Seq("doc_id"))
      Classifier.plattScale(scored, "score", "y", iters = 4).orderBy("iter")
    }),
    // Poisson bootstrap CI (Chamandy et al. 2012) for the per-event-type
    // value mean: 64 deterministic md5-weighted replicates (weights =
    // inverse Poisson(1) CDF over planted 12-hex thresholds), exact
    // micro-unit replicate sums, pure order-statistics CI — the one
    // bootstrap that runs in a single pass over sharded data.
    "q292_poisson_bootstrap" -> ((s, dir) => {
      val ev = Tables(s, dir).events.filter(col("event_type").isNotNull)
      Experiment.poissonBootstrapMean(ev, Seq("event_type"), "event_id",
        "value", reps = 64, loIdx = 2, hiIdx = 63).orderBy("event_type")
    }),
    // Landmark betweenness (Brandes 2001 accumulation over a Brandes-Pich
    // 2007 pivot set) on the parts-bought-together graph: exact integer
    // shortest-path counts forward, node-id-ordered dependency folds
    // backward, landmark-id-ordered cross-landmark sum — all landmarks in
    // ONE batched (landmark, node)-keyed pass, hop-bounded at 3.
    "q291_betweenness" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.select(col("ok"), col("pk").as("a"))
        .join(li.select(col("ok"), col("pk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .select("a", "b")
      Graph.betweennessFromLandmarks(edges, "a", "b", Seq(2L, 3L, 5L, 8L),
        maxHops = 3).orderBy("node")
    }),
    // Neighborhood-overlap link prediction over the parts-bought-together
    // graph (sparse at every SF, so predicted links are meaningful):
    // non-edge pairs scored by common neighbors, integral-DIV Jaccard,
    // and exact resource allocation — celebrity centers (deg > 256)
    // dropped whole per the cap discipline.
    "q286_link_prediction" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.select(col("ok"), col("pk").as("a"))
        .join(li.select(col("ok"), col("pk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .select("a", "b")
      Graph.linkPrediction(edges, "a", "b", maxCenterDegree = 256,
        minCommon = 2L).orderBy("u", "w")
    }),
    // Two-level Louvain (Blondel et al. 2008: deterministic synchronous
    // local moves with exact-integer gains and the Lu et al. 2015
    // singleton guard, then coarsen and move again on the community
    // graph) over the parts-bought-together graph — sparse at every SF,
    // so there is real community structure for the ascent to find
    // (the q249/q269 co-supplier graph is a 100-node near-clique where
    // the honest answer is "no structure", Q = 0).
    "q271_louvain" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.select(col("ok"), col("pk").as("a"))
        .join(li.select(col("ok"), col("pk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
      Graph.louvain(edges, "a", "b", levels = 2, rounds = 3)
        .orderBy("node")
    }),
    // Modularity of the q271 Louvain partition — the Q-optimizer
    // contrast q269 positioned its exact-Q metric to gate (on the
    // co-supplier graph LPA scores Q = 0: one giant community).
    "q272_louvain_modularity" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.select(col("ok"), col("pk").as("a"))
        .join(li.select(col("ok"), col("pk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
      val labels = Graph.louvain(edges, "a", "b", levels = 2, rounds = 3)
      Graph.modularity(edges, "a", "b", labels, "node", "label")
    }),
    // 25% md5-sampled Louvain twins (the q182s/q217s/q237s s-variant
    // convention): q271/q272 are the two most expensive battery rows at
    // sf0.1 (~9-11 s; q272 re-runs the full ascent before scoring Q) and
    // cost rounds × edges — the quarter-sampled order set bounds what an
    // sf1.0 bench can be dominated by.
    "q271s_louvain_sampled" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0 &&
          oracleSampleAt(col("l_orderkey"), "40"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.select(col("ok"), col("pk").as("a"))
        .join(li.select(col("ok"), col("pk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
      Graph.louvain(edges, "a", "b", levels = 2, rounds = 3)
        .orderBy("node")
    }),
    "q272s_louvain_modularity_sampled" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0 &&
          oracleSampleAt(col("l_orderkey"), "40"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.select(col("ok"), col("pk").as("a"))
        .join(li.select(col("ok"), col("pk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
      val labels = Graph.louvain(edges, "a", "b", levels = 2, rounds = 3)
      Graph.modularity(edges, "a", "b", labels, "node", "label")
    }),
    // WEIGHTED Louvain over the same co-purchase graph, edges weighted
    // by how many orders bought the pair together — the wCol regime
    // q271 leaves unexercised end to end (its level 1 is all-unit
    // weights; only the coarsened level 2 ran weighted before). Gains
    // stay exact decimal(38,0) integers; the oracle's e0 carries the
    // count and coarsens by sum(w).
    "q300_louvain_weighted" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.select(col("ok"), col("pk").as("a"))
        .join(li.select(col("ok"), col("pk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w"))
      Graph.louvain(edges, "a", "b", levels = 2, rounds = 3,
          wCol = Some("w"))
        .orderBy("node")
    }),
    // 25% md5-sampled twins of the weighted pair (q300 23.3 s / q305
    // 31.4 s on the sf1.0 decade — the q271s/q272s convention)
    "q300s_louvain_weighted_sampled" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0 &&
          oracleSampleAt(col("l_orderkey"), "40"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.select(col("ok"), col("pk").as("a"))
        .join(li.select(col("ok"), col("pk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w"))
      Graph.louvain(edges, "a", "b", levels = 2, rounds = 3,
          wCol = Some("w"))
        .orderBy("node")
    }),
    "q305s_louvain_weighted_modularity_sampled" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0 &&
          oracleSampleAt(col("l_orderkey"), "40"))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.select(col("ok"), col("pk").as("a"))
        .join(li.select(col("ok"), col("pk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w"))
      val labels = Graph.louvain(edges, "a", "b", levels = 2, rounds = 3,
        wCol = Some("w"))
      Graph.modularityWeighted(edges, "a", "b", "w", labels, "node",
        "label")
    }),
    // WEIGHTED modularity of the q300 partition — the weighted-Q metric
    // that scores what the weighted ascent optimized (q272 scores the
    // unit-weight form): Q·4W² = Σ_c [4W·w_c − S_c²] in exact integers,
    // W the summed co-purchase counts, S_c the weighted degrees.
    "q305_louvain_weighted_modularity" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.select(col("ok"), col("pk").as("a"))
        .join(li.select(col("ok"), col("pk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w"))
      val labels = Graph.louvain(edges, "a", "b", levels = 2, rounds = 3,
        wCol = Some("w"))
      Graph.modularityWeighted(edges, "a", "b", "w", labels, "node",
        "label")
    }),
    // Product quantization ANN (Jégou et al. 2011): 64-dim floats to
    // 4 codes of 4 bits (m=4 blocks, 16 cells), ADC lookup-table
    // scoring, exact cosine re-rank. The gate runs the whole-corpus
    // shortlist regime, so the result must equal brute force VERBATIM
    // (q41's oracle) — quantization may only reorder a shortlist that
    // contains everything; partial-shortlist recall is spec territory.
    "q283_ann_pq" -> ((s, dir) => {
      val t = Tables(s, dir)
      val q = t.embeddings.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      Pq.topK(t.embeddings, "vec_id", "embedding", q, k = 10, dim = 64,
          m = 4, kCells = 16, iters = 2, shortlistFactor = 1000000)
        .orderBy("query_id", "rank")
    }),
    // IVFADC serving composition (Jégou et al. 2011 §IV): IVF coarse
    // cells → residual PQ codes → ADC over the PROBED cells' postings
    // only → exact re-rank — the deployment shape at 10⁹ vectors (q283
    // alone is the whole-corpus ADC regime). Gated at full probe +
    // corpus-covering shortlist, where the composition must reproduce
    // brute force VERBATIM (q41's oracle); the nProbe < nCells recall
    // trade is PqSpec's recall@10 row.
    "q299_ann_ivfpq" -> ((s, dir) => {
      val t = Tables(s, dir)
      val q = t.embeddings.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      Pq.topKFromIvf(t.embeddings, "vec_id", "embedding", q, k = 10,
          dim = 64, m = 4, kCells = 16, nCells = 16, nProbe = 16,
          iters = 2, shortlistFactor = 1000000)
        .orderBy("query_id", "rank")
    }),
    // PERSISTED IVFADC (q299's on-disk serving shape, the q171 recipe
    // for PQ): centroids + residual codebooks + cell-partitioned code
    // table on disk, probed cells collected (≤ nCells ids) and pushed
    // as a static partition filter so the serve opens only the probed
    // cells' code directories. Doubles round-trip parquet bit-exactly,
    // so the full-probe serve must STILL equal brute force verbatim.
    "q304_ann_ivfpq_persisted" -> ((s, dir) => {
      val t = Tables(s, dir)
      val q = t.embeddings.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val path = s"target/qtmp/ivfpq_q304_${Integer.toHexString(dir.hashCode)}"
      Pq.saveIvfPqIndex(path, t.embeddings, "vec_id", "embedding",
        dim = 64, m = 4, kCells = 16, nCells = 16, iters = 2)
      Pq.topKFromIvfPqIndex(s, path, t.embeddings, "vec_id", "embedding",
          q, k = 10, nProbe = 16, shortlistFactor = 1000000)
        .orderBy("query_id", "rank")
    }),
    // Z-order layout audit (Morton interleave, the OPTIMIZE ZORDER
    // technique): events keyed by (user bucket, hour bucket) in 10-bit
    // space, 16 closed-form z-ranges — per-range min/max spans of BOTH
    // dimensions prove the layout clusters both (≈ 1/4 each, vs 1/16
    // and ~1 for a single-column sort). Pair with writeRangeSorted(z)
    // for the actual write; the audit is the adopt/don't evidence.
    "q281_zorder_audit" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(pmod(col("user_id"), lit(1024L)).as("x"),
          pmod(expr("unix_micros(ts) div 3600000000"), lit(1024L)).as("y"))
      Layout.zOrderAudit(ev, "x", "y", bits = 10, nFiles = 16)
        .orderBy("bucket")
    }),
    // Temperature-scaled mixing quotas (XLM-R style, T = 2 so the
    // exponent is one IEEE-exact sqrt): per-lang share ∝ sqrt(chars),
    // Hamilton largest-remainder rounding so the integer quotas sum to
    // the budget EXACTLY.
    "q282_temperature_mix" -> ((s, dir) => {
      Sampling.temperatureQuotas(
        Tables(s, dir).documents.filter(col("lang").isNotNull),
        "lang", "n_chars", budget = 1000000L, temperature = 2)
        .orderBy("lang")
    }),
    // LSH banding advisor (MMDS §3.4.3): exact token-set Jaccard over a
    // replayable pair sample (adjacent-in-lang at lead 1/2 = background
    // mass, self-pairs = the planted jaccard-1 dup regime the plan must
    // protect), 20-bin histogram, S-curve FP/FN for every (b, r) with
    // b*r = 16 via UNROLLED multiplication chains (no pow), min-error
    // plan marked. The measured pre-flight for minhashCandidatePairs.
    "q279_lsh_parameter_plan" -> ((s, dir) => {
      val docs = Tables(s, dir).documentsSpread
        .filter(col("lang").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("lang"),
          array_distinct(split(col("text"), " ")).as("tk"))
      val w = Window.partitionBy("lang").orderBy("doc_id")
      val adj = Seq(1, 2).map(o => docs
        .withColumn("tk2", lead(col("tk"), o).over(w))
        .filter(col("tk2").isNotNull)
        .select("tk", "tk2")).reduce(_.unionByName(_))
      val dup = docs.select(col("tk"), col("tk").as("tk2"))
      val pairs = adj.unionByName(dup)
        .filter(size(array_union(col("tk"), col("tk2"))) > 0)
        .select((size(array_intersect(col("tk"), col("tk2"))).cast("double")
          / size(array_union(col("tk"), col("tk2"))).cast("double"))
          .as("sim"))
      Dedup.lshParameterPlan(pairs, "sim", nHashes = 16, threshold = 0.7)
        .orderBy("b")
    }),
    // Split-conformal interval calibration (Papadopoulos 2002 / Lei
    // 2018): predictor = per-lang mean n_chars on the even-doc_id
    // calibration half, EXACT in micro-units (integer div, no double
    // mean); q-hat = the ceil((n+1)*0.9)-th smallest |y - pred| order
    // statistic (distributed selection, no single-partition window);
    // empirical coverage measured on the odd half. Finite-sample
    // coverage >= 0.9 by the conformal guarantee — the abstention-
    // threshold calibration a production quality filter runs.
    "q278_conformal_coverage" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
        .filter(col("lang").isNotNull && col("n_chars").isNotNull)
      val pm = docs.filter(col("doc_id") % 2 === 0)
        .groupBy("lang")
        .agg(expr("(CAST(sum(n_chars) AS DECIMAL(38,0)) * 1000000)" +
          " div count(*)").as("_pmic"))
        .select(col("lang"),
          (col("_pmic").cast("decimal(25,0)") / lit(1000000L))
            .cast("decimal(18,6)").as("pred"))
      val cal = docs.filter(col("doc_id") % 2 === 0).join(pm, "lang")
      val tst = docs.filter(col("doc_id") % 2 === 1).join(pm, "lang")
      Classifier.splitConformal(cal, tst, "n_chars", "pred", alpha = 0.1)
    }),
    // Benjamini-Hochberg FDR (1995) over 25 per-nation two-proportion
    // tests (md5 arm split, conversion = customer placed >= 11 orders, ~42% base rate at every SF).
    // The per-segment p is the TRANSCENDENTAL-FREE Chebyshev bound
    // min(1, 1/z^2) on the pooled z — a valid conservative p-value that
    // keeps the whole chain exact-integer + fixed double ops, so the
    // ranks, q-values and reject decisions replay bit-for-bit.
    "q276_bh_fdr" -> ((s, dir) => {
      val t = Tables(s, dir)
      val units = t.orders
        .join(t.customer.select(col("c_custkey").as("o_custkey"),
          col("c_nationkey")), Seq("o_custkey"))
        .groupBy(col("c_nationkey").as("nation"),
          col("o_custkey").as("cust"),
          (substring(md5(concat(col("o_custkey").cast("string"),
            lit(":ab"))), 1, 1) >= lit("8")).as("arm"))
        .agg((count(lit(1)) >= 11).as("conv"))
      val cells = units.groupBy("nation", "arm")
        .agg(count(lit(1)).as("n"),
          sum(when(col("conv"), 1L).otherwise(0L)).as("k"))
      val seg = cells.groupBy("nation").agg(
        sum(when(col("arm"), col("n"))).as("n1"),
        sum(when(col("arm"), col("k"))).as("k1"),
        sum(when(!col("arm"), col("n"))).as("n0"),
        sum(when(!col("arm"), col("k"))).as("k0"))
        .filter(col("n1").isNotNull && col("n0").isNotNull)
      def dbl(c: Column): Column = c.cast("double")
      val p1 = dbl(col("k1")) / dbl(col("n1"))
      val p0 = dbl(col("k0")) / dbl(col("n0"))
      val pb = (dbl(col("k1")) + dbl(col("k0"))) /
        (dbl(col("n1")) + dbl(col("n0")))
      val se = sqrt(pb * (lit(1.0) - pb) *
        (lit(1.0) / dbl(col("n1")) + lit(1.0) / dbl(col("n0"))))
      val z = (p1 - p0) / se
      val withP = seg.select(col("nation"),
        when(se > 0.0,
          // z = 0 (identical rates) -> Chebyshev bound 1/0 is +inf,
          // clamp to p = 1 explicitly (ANSI errors on double div-by-0)
          when(p1 - p0 === 0.0, lit(1.0))
            .otherwise(least(lit(1.0), lit(1.0) / (z * z))))
          .otherwise(lit(null)).as("p"))
      Experiment.benjaminiHochberg(withP, "nation", "p", alpha = 0.2)
        .orderBy("rank")
    }),
    // Propensity-stratified ATE (Rosenbaum & Rubin 1984): unit = user,
    // outcome = exact micro-unit value sum, strata = activity buckets
    // (n_events div 10 capped at 5) — the cell-constant-propensity IPW
    // estimator with both-arm strata only, dropped mass reported.
    "q277_stratified_ate" -> ((s, dir) => {
      val units = Tables(s, dir).events
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ev"),
          sum(coalesce(col("value").cast("decimal(18,6)"),
            lit(0L).cast("decimal(18,6)"))).as("y"))
        .select(
          (substring(md5(concat(col("user_id").cast("string"),
            lit(":ab"))), 1, 1) >= lit("8")).as("treated"),
          col("y"), // exact decimal — the op's micro-unit cast stays exact
          least(floor(col("n_ev") / 10L), lit(5L)).as("bucket"))
      Experiment.stratifiedAte(units, "treated", "y", Seq("bucket"))
    }),
    // EXACT Shapley attribution over {view, click, signup} coalitions
    // (conversion = first purchase): v(S) counts, factorial-weighted
    // integer credit — phi * 3! is an exact long both engines replay.
    "q268_shapley_attribution" -> ((s, dir) => {
      Sessionize.shapleyAttribution(Tables(s, dir).events, "user_id",
          "ts", "event_type", "purchase", Seq("view", "click", "signup"))
        .orderBy("channel")
    }),
    // SAMPLED Shapley (Castro et al. 2009) in the n > 16 regime the
    // exact 2^n table can't reach: 20 channels (event_type × 5h-of-day
    // buckets), 64 deterministic md5-lane permutations; every marginal
    // is an integer so shapley_e is an exact long the oracle replays
    // permutation-for-permutation.
    "q275_shapley_sampled" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .withColumn("chan",
          when(col("event_type") === "purchase", lit("purchase"))
            .otherwise(concat(col("event_type"), lit("_"),
              pmod(hour(col("ts")), lit(5)).cast("string"))))
      val channels = for (t <- Seq("click", "error", "signup", "view");
                          b <- 0 until 5) yield s"${t}_$b"
      Sessionize.shapleySampledAttribution(ev, "user_id", "ts", "chan",
          "purchase", channels, nSamples = 64)
        .orderBy("channel")
    }),
    // Annotator consensus (Dawid-Skene-lite): 5 planted annotators with
    // DIFFERENT md5 noise rates (10%..50%) vote on each doc's lang;
    // majority, accuracy-vs-majority, accuracy-weighted re-vote.
    "q267_annotator_consensus" -> ((s, dir) => {
      val votes = Tables(s, dir).documents
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), explode(array((0 until 5).map { k =>
          struct(lit(s"a$k").as("annotator"),
            when(conv(substring(md5(concat(col("doc_id").cast("string"),
                lit(s":an$k"))), 1, 5), 16, 10).cast("long") % 1000000L
                < (k + 1) * 100000L,
              concat(lit("x_"), col("lang"))).otherwise(col("lang"))
              .as("label"))
        }: _*)).as("v"))
        .select(col("doc_id"), col("v.annotator").as("annotator"),
          col("v.label").as("label"))
      Classifier.annotatorConsensus(votes, "doc_id", "annotator", "label")
        .orderBy("doc_id")
    }),
    // Bradley-Terry strengths over SKU "matches" (adjacent line items
    // in an order; higher quantity wins, ties to the smaller SKU):
    // 3 MM rounds, opponent-ordered folds, sum-normalized scale.
    "q266_bradley_terry" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          (col("l_partkey") % 20).as("p"), col("l_quantity").as("q"))
      val m = li.select(col("ok"), col("ln"), col("p").as("pa"),
          col("q").as("qa"))
        .join(li.select(col("ok"), (col("ln") - 1).as("ln"),
          col("p").as("pb"), col("q").as("qb")), Seq("ok", "ln"))
        .select(
          when(col("qa") > col("qb"), col("pa"))
            .when(col("qb") > col("qa"), col("pb"))
            .otherwise(least(col("pa"), col("pb"))).as("winner"),
          when(col("qa") > col("qb"), col("pb"))
            .when(col("qb") > col("qa"), col("pa"))
            .otherwise(greatest(col("pa"), col("pb"))).as("loser"))
      Preference.bradleyTerry(m, "winner", "loser", iters = 3)
        .orderBy("item")
    }),
    // Empirical-Bayes return-rate shrinkage per SKU bucket: beta-
    // binomial prior by method of moments across items, posterior-mean
    // rates — small-n SKUs shrink toward the global rate.
    "q265_eb_shrinkage" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .select((col("l_partkey") % 500).as("sku"),
          (col("l_returnflag") === "R").as("returned"))
      Experiment.ebShrinkRates(li, "sku", "returned")
        .orderBy("sku")
    }),
    // Log-rank test between the q176 arms: per-user time-to-first-
    // purchase (censored at last activity), pooled event-time grid,
    // hypergeometric variance, t-ordered E/V folds.
    "q264_log_rank" -> ((s, dir) => {
      val per = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("first_us"),
          min(when(col("event_type") === "purchase",
            unix_micros(col("ts")))).as("purch_us"),
          max(unix_micros(col("ts"))).as("last_us"))
        .select(
          when(substring(md5(concat(col("user_id").cast("string"),
            lit(":ab"))), 1, 1) < "8", lit("control"))
            .otherwise(lit("treatment")).as("arm"),
          expr("(coalesce(purch_us, last_us) - first_us) div 86400000000")
            .as("dur_days"),
          col("purch_us").isNotNull.as("event"))
      Retention.logRankTest(per, "arm", "dur_days", "event",
        "control", "treatment")
    }),
    // Holt-Winters additive seasonal smoothing (period 7) on the q212
    // daily series: q212's integer fold plus a learned 7-slot seasonal
    // state, one row per (series, slot).
    "q263_holt_winters" -> ((s, dir) => {
      val daily = Tables(s, dir).events
        .filter(col("event_type").isNotNull && col("ts").isNotNull &&
          col("value").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,6)")).as("v"))
      Trend.holtWinters(daily, Seq("event_type"), "day", "v", period = 7)
        .orderBy("event_type", "slot")
    }),
    // Efraimidis-Spirakis weighted k-sample per source (weight =
    // n_chars): top-k by ln(u)/w with hash-derived u — a deterministic
    // weighted WITHOUT-replacement draw, O(k) aggregation state.
    "q262_weighted_sample" -> ((s, dir) => {
      Sampling.weightedSampleK(Tables(s, dir).documents, Seq("source"),
          "doc_id", "n_chars", k = 5)
        .orderBy("source", "rank")
    }),
    // TextRank keywords (Mihalcea & Tarau, EMNLP 2004) as a pure
    // composition: adjacency co-occurrence edges (symmetrized) from the
    // canonical tokens -> q190's exact integer PageRank -> top 20 by
    // the exact (rank_e12, word) order.
    "q261_textrank_keywords" -> ((s, dir) => {
      val toks = Tables(s, dir).documents.filter(col("doc_id") % 5 === 0)
        .select(filter(split(TextAnalysis.normalized(col("text")), " "),
          c => c =!= "").as("tk"))
      val pairs = toks.filter(size(col("tk")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(tk) - 1)," +
            " i -> struct(tk[i-1] AS a, tk[i] AS b))")).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .filter(col("a") =!= col("b"))
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      Graph.pageRank(edges, "src", "dst", iters = 2)
        .orderBy(col("rank_e12").desc, col("node")).limit(20)
    }),
    // Int8 symmetric quantization eval: per-dim max-abs scales (exact
    // order-free max), deterministic rounding, EXACT integer dot-product
    // ranking (no float accumulation at all), recall@10 vs the full
    // float cosine ranking.
    "q260_int8_recall" -> ((s, dir) => {
      val emb = Tables(s, dir).embeddings.select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val full = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      val scales = emb
        .select(posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("pos").agg(max(abs(col("v").cast("double"))).as("m"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("sc"))
      def quant(vec: String) = expr(
        s"""transform($vec, (x, i) -> CASE WHEN sc[i] = 0.0D THEN 0L
           |  ELSE CAST(floor(CAST(x AS DOUBLE) * 127.0D / sc[i] + 0.5D)
           |    AS BIGINT) END)""".stripMargin)
      val qc = emb.crossJoin(broadcast(scales))
        .select(col("vec_id").as("neighbor_id"), quant("embedding").as("qv"))
      val qq = q.crossJoin(broadcast(scales))
        .select(col("query_id"), quant("query_vec").as("qq"))
      val scored = qc.crossJoin(broadcast(qq))
        .select(col("query_id"), col("neighbor_id"),
          aggregate(zip_with(col("qv"), col("qq"), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x).as("idot"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("idot").desc, col("neighbor_id"))
      val int8Top = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
      Similarity.recallAtK(int8Top, full).orderBy("query_id")
    }),
    // Rendezvous-hash sharding + the rebalance audit: 8 -> 9 shards
    // moves only keys the new shard wins (~1/9), never between
    // survivors — the guarantee emitted row-by-row for the oracle.
    "q258_rendezvous_shards" -> ((s, dir) => {
      val before = (0 until 8).map(i => s"s$i" -> 1.0)
      Sampling.rendezvousRebalance(Tables(s, dir).documents, "doc_id",
          before, before :+ ("s8" -> 1.0))
        .orderBy("doc_id")
    }),
    // Brier score + Murphy decomposition on q180's scored corpus:
    // exact micro-unit squared errors, bin-ordered REL/RES folds.
    "q257_brier_decomposition" -> ((s, dir) => {
      def h6(tag: String) =
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(s":$tag"))), 1, 5), 16, 10).cast("long") % 1000000L
      val scored = Tables(s, dir).documents.select(
        (h6("cal").cast("double") / lit(1.0e6)).as("score"),
        (h6("lbl") < h6("cal")).as("label"))
      Classifier.brierDecomposition(scored, "score", "label", nBins = 10)
    }),
    // Count-min sketch: 4x64 table over bucketed user keys, point
    // estimates (min over depths) side-by-side with exact counts —
    // the one-sided bound is visible AND replayed integer-for-integer.
    "q256_count_min" -> ((s, dir) => {
      val ev = Tables(s, dir).events.filter(col("user_id").isNotNull)
        .select((col("user_id") % 1000).as("key_id"))
      val cms = SetSketch.cmsTable(ev, "key_id", depth = 4, width = 64)
      val small = ev.filter(col("key_id") < 20)
      val est = SetSketch.cmsEstimate(cms, small, "key_id", 4, 64)
      small.groupBy("key_id").agg(count(lit(1)).as("exact_cnt"))
        .join(est, Seq("key_id"))
        .orderBy("key_id")
    }),
    // Harmonic centrality for a 4-landmark set over the co-supplier
    // graph: bounded per-landmark BFS, score folds cnt/h in ascending
    // hop order (order-pinned double chain).
    "q255_harmonic_centrality" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("src"))
        .join(li.select(col("ok"), col("sk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      Graph.harmonicCentrality(edges, "src", "dst", Seq(2L, 3L, 5L, 8L),
          maxHops = 4)
        .orderBy("landmark")
    }),
    // 2-D skyline ("cheapest and earliest" Pareto front of orders):
    // exact integer cents and epoch days, bucketed strict-prefix-min
    // sweep — never one global sort window. Oracle is the brute-force
    // NOT EXISTS dominance check, so a pass proves the sweep exact.
    "q254_skyline" -> ((s, dir) => {
      val pts = Tables(s, dir).orders
        .filter(col("o_custkey") % 29 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long").as("price_cents"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
            .as("order_day"))
      Ranks.skyline2d(pts, "o_orderkey", "price_cents", "order_day")
        .orderBy("o_orderkey")
    }),
    // Dominant principal direction of the embedding corpus: 3 power-
    // iteration rounds on XtX in exact integer fixed-point (quantized
    // elements, decimal matvecs, sign-split max-norm renormalization).
    "q252_power_iteration" -> ((s, dir) => {
      Similarity.powerIterationTop(Tables(s, dir).embeddings,
          "vec_id", "embedding", iters = 3)
        .orderBy("pos")
    }),
    // Embedding drift matrix: pairwise cosine between per-label
    // centroids — q64's quantized means, folded in position order (a
    // parallel double sum would be order-dependent; the sorted fold
    // is not).
    "q250_centroid_drift" -> ((s, dir) => {
      Similarity.centroidCosineMatrix(Tables(s, dir).embeddings,
          "label", "embedding")
        .orderBy("key_a", "key_b")
    }),
    // Grid-bucketed DBSCAN on the hashed customer cloud: exact integer
    // neighborhoods, large-star/small-star components over core-core
    // pairs, min-pinned border assignment. The oracle is the brute-force
    // cross + a recursive-CTE reachability closure — a pass proves the
    // grid AND the CC lose nothing.
    "q251_dbscan" -> ((s, dir) => {
      def coord(key: Column, tag: String) =
        conv(substring(md5(concat(key.cast("string"), lit(tag))), 1, 6),
          16, 10).cast("long") % 10000000L
      val pts = Tables(s, dir).customer.filter(col("c_nationkey") === 3)
        .select(col("c_custkey").as("pid"),
          coord(col("c_custkey"), ":cx").as("x"),
          coord(col("c_custkey"), ":cy").as("y"))
      Spatial.dbscan(pts, "pid", "x", "y", eps = 500000L, minPts = 5)
        .orderBy("id")
    }),
    // HITS hubs/authorities over the bipartite buyer->supplier graph
    // (supplier ids offset by 1e9 so the two key spaces cannot collide).
    // Exact integer fixed-point with L1 renormalization; 2 rounds.
    "q248_hits" -> ((s, dir) => {
      val t = Tables(s, dir)
      val edges = t.orders.filter(col("o_custkey") % 5 === 0)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t.lineitem.select(col("l_orderkey").as("o_orderkey"),
          (col("l_suppkey") + 1000000000L).as("supp")), Seq("o_orderkey"))
        .select(col("o_custkey").as("src"), col("supp").as("dst"))
      Graph.hits(edges, "src", "dst", iters = 2).orderBy("node")
    }),
    // Deterministic synchronous label propagation on the co-supplier
    // graph: own-id init, most-frequent-neighbor-label updates with
    // min-label ties, 3 fixed rounds — replayed round-for-round.
    "q249_label_propagation" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("a"))
        .join(li.select(col("ok"), col("sk").as("b")), "ok")
        .filter(col("a") =!= col("b"))
        .select("a", "b")
      Graph.labelPropagation(edges, "a", "b", iters = 3).orderBy("node")
    }),
    // Difference-in-differences on the q176 arm split: unit = (user,
    // period), period cut at Jan 15, metric = exact decimal value sum.
    // The 2x2 cell means, the Card-Krueger estimator, and the unpooled
    // SE all derive from exact micro-unit sums in one fixed double chain.
    "q245_diff_in_diff" -> ((s, dir) => {
      val cut = lit("2024-01-15 00:00:00").cast("timestamp")
      val units = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy(col("user_id"), (col("ts") >= cut).as("is_post"))
        .agg(sum(coalesce(col("value").cast("decimal(18,6)"),
          lit(0L).cast("decimal(18,6)"))).as("y"))
        .withColumn("is_treated",
          substring(md5(concat(col("user_id").cast("string"), lit(":ab"))),
            1, 1) >= "8")
      Experiment.diffInDiff(units, "is_treated", "is_post", "y")
        .orderBy("is_treated", "is_post")
    }),
    // Flesch readability: three exact integer counts (sentences off the
    // raw text, words/syllables off the engine's canonical tokens) and
    // the two classic scores as one fixed double chain over them.
    "q246_readability" -> ((s, dir) => {
      TextAnalysis.readability(Tables(s, dir).documents, "doc_id", "text")
        .orderBy("doc_id")
    }),
    // Market-basket association rules over bucketed SKUs: per ordered
    // pair support/confidence/lift from exact counts, q217's whole-
    // basket skew cap, quoted denominators for auditability.
    "q247_association_rules" -> ((s, dir) => {
      val t = Tables(s, dir)
      val inter = t.orders.filter(col("o_custkey") % 7 === 1)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t.lineitem.select(col("l_orderkey").as("o_orderkey"),
          (col("l_partkey") % 50).as("sku")), Seq("o_orderkey"))
        .select(col("o_custkey"), col("sku"))
      Similarity.associationRules(inter, "o_custkey", "sku", minCo = 3L)
        .orderBy("antecedent", "consequent")
    }),
    "q209_radius_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      def coord(key: Column, tag: String) =
        conv(substring(md5(concat(key.cast("string"), lit(tag))), 1, 6),
          16, 10).cast("long") % 10000000L
      val cust = t.customer.filter(col("c_nationkey") === 3)
        .select(col("c_custkey"),
          coord(col("c_custkey"), ":cx").as("x"),
          coord(col("c_custkey"), ":cy").as("y"))
      val supp = t.supplier
        .select(col("s_suppkey"),
          coord(col("s_suppkey"), ":sx").as("x"),
          coord(col("s_suppkey"), ":sy").as("y"))
      Spatial.radiusJoin(
          cust.withColumnRenamed("c_custkey", "pid"),
          supp.withColumnRenamed("s_suppkey", "pid"),
          "pid", "x", "y", radius = 1000000L)
        .orderBy("l_id", "r_id")
    }),
    // Covered-time union per user: event spans (1s..3600s from the id)
    // merged by the gaps-and-islands sweep — overlaps counted once,
    // exact epoch-microsecond arithmetic.
    "q208_interval_union" -> ((s, dir) => {
      val iv = Tables(s, dir).events
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts")) +
            (col("event_id") % 3600L + lit(1L)) * lit(1000000L)).as("e_us"))
      Intervals.unionLength(iv, Seq("user_id"), "s_us", "e_us")
        .orderBy("user_id")
    }),
    // Non-parametric trend test on the daily event-volume series: exact
    // integer S over within-group day pairs, tie-corrected variance,
    // continuity-corrected z, Kendall tau_b.
    "q207_mann_kendall" -> ((s, dir) => {
      val daily = Tables(s, dir).events
        .filter(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("n_events"))
      Trend.mannKendall(daily, Seq("event_type"), "day", "n_events")
        .orderBy("event_type")
    }),
    // Data-driven channel attribution: first-order Markov chain over
    // pre-purchase journeys, absorbing conv/null, removal effect per
    // channel via exact integer fixed-point (the q190 arithmetic),
    // shares from the channel-ordered fold.
    "q206_markov_attribution" -> ((s, dir) => {
      Sessionize.markovRemovalEffects(Tables(s, dir).events, "user_id",
          "ts", "event_type", "purchase", tieBreak = Seq("event_id"),
          iters = 8)
        .orderBy("channel")
    }),
    // Monotone probability calibration: PAV's isotonic fit over the
    // q180 reliability bins via the closed-form minimax (max over
    // i≤b of min over j≥b of pooled rate) — relational, loop-free,
    // non-decreasing by construction.
    "q205_isotonic_fit" -> ((s, dir) => {
      def h6(tag: String) =
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(s":$tag"))), 1, 5), 16, 10).cast("long") % 1000000L
      val scored = Tables(s, dir).documents.select(
        (h6("cal").cast("double") / lit(1.0e6)).as("score"),
        (h6("lbl") < h6("cal")).as("label"))
      val bins = Classifier.calibrationBins(scored, "score", "label",
        nBins = 10)
      Classifier.isotonicCalibrate(bins, "bin", "n", "n_pos")
        .orderBy("bin")
    }),
    // How often is 9am not like 9am? Seasonal anomaly counts per
    // (event_type, hour-of-day): q184's exact cell baseline composed
    // back onto the rows, |v − mean| > 3σ verdicts on bit-identical
    // doubles, map-side-combined counts.
    "q204_seasonal_anomalies" -> ((s, dir) => {
      val d = Tables(s, dir).events.withColumn("_hour", hour(col("ts")))
        .filter(col("ts").isNotNull)
      Trend.seasonalAnomalies(d, Seq("event_type"), "_hour", "value")
        .withColumnRenamed("_hour", "hour_of_day")
        .orderBy("event_type", "hour_of_day")
    }),
    // Has the event-value distribution shifted since mid-January? PSI
    // per event type between the pre/post-cutoff samples (the q178
    // period split): 10 equal-width micro-unit bins over [-1000, 1000),
    // Laplace-smoothed, bin-ordered fold, ExactRound at 6.
    "q203_psi_drift" -> ((s, dir) => {
      val cut = lit("2024-01-15 00:00:00").cast("timestamp")
      val d = Tables(s, dir).events
        .filter(col("ts").isNotNull)
        .withColumn("_is_ref", col("ts") < cut)
      Profile.psiDrift(d, Seq("event_type"), "_is_ref", "value")
        .orderBy("event_type")
    }),
    // How clique-ish is each supplier's co-supplier neighborhood?
    // Watts-Strogatz local clustering coefficient: 2T/(d(d-1)), every
    // node reported, degree-1 nodes at the stated 0.0 convention.
    "q202_clustering_coeff" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = li.select(col("ok"), col("sk").as("a"))
        .join(li.select(col("ok"), col("sk").as("b")), "ok")
        .filter(col("a") < col("b"))
        .select("a", "b")
      Graph.clusteringCoefficient(edges, "a", "b").orderBy("node")
    }),
    // AP@10 of the exact cosine ranking against binary relevance from
    // the dot-product top-15 (the q179 fixture, binary-collapsed):
    // TP_i/rank_i folded in rank order, min(R, k) normalizer.
    "q201_average_precision" -> ((s, dir) => {
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
        .select(col("query_id"), col("neighbor_id"), lit(1.0).as("rel"))
      Retrieval.averagePrecisionAtK(ranked, "query_id", "neighbor_id",
          "rank", rels, "rel", 10)
        .orderBy("query_id")
    }),
    // Reciprocal rank @10 (the MRR building block) on the q201 fixture:
    // exact integer first-hit rank, one double division, judged-but-
    // missed queries at 0.0.
    "q240_reciprocal_rank" -> ((s, dir) => {
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
        .select(col("query_id"), col("neighbor_id"), lit(1.0).as("rel"))
      Retrieval.reciprocalRankAtK(ranked, "query_id", "neighbor_id",
          "rank", rels, "rel", 10)
        .orderBy("query_id")
    }),
    // Graded string similarity for linkage scoring: native codegen'd
    // Jaro/Jaro-Winkler over md5-derived pairs sharing a 4-char prefix
    // (every fifth identical) — a DIFFERENTIAL gate: DuckDB's builtin
    // replays every pair, so the window walk, integer transposition
    // rule, 0.7 boost threshold, and double op order are all pinned
    // bit-for-bit across tens of thousands of strings.
    "q200_jaro_winkler" -> ((s, dir) => {
      val pfx = substring(md5(concat(col("doc_id").cast("string"),
        lit(":jwp"))), 1, 4)
      val sa = concat(pfx, substring(md5(concat(col("doc_id").cast("string"),
        lit(":jwa"))), 1, 8))
      val sb = when(col("doc_id") % 5 === 0, sa)
        .otherwise(concat(pfx, substring(md5(concat(
          col("doc_id").cast("string"), lit(":jwb"))), 1, 8)))
      Tables(s, dir).documents
        .select(col("doc_id"), sa.as("_a"), sb.as("_b"))
        .select(col("doc_id"),
          graft.functions.JaroWinkler.jaro(col("_a"), col("_b")).as("jaro"),
          graft.functions.JaroWinkler.similarity(col("_a"), col("_b"))
            .as("jw"))
        .orderBy("doc_id")
    }),
    // How much does a document's source tell you about its language?
    // Mutual information + marginal entropies + NMI — exact cell
    // counts, sorted folds, ExactRound over the ln terms.
    "q199_mutual_information" -> ((s, dir) => {
      Profile.mutualInformation(Tables(s, dir).documents, "lang", "source")
    }),
    // Sample-ratio-mismatch health check on the q176 experiment: the md5
    // split declares exactly 50/50 (8 of 16 first-hex values), the
    // chi-square verdict says whether observed arm sizes are consistent.
    "q188_srm_check" -> ((s, dir) => {
      val arm = when(substring(md5(concat(col("user_id").cast("string"),
        lit(":ab"))), 1, 1) < "8", lit("control")).otherwise(lit("treatment"))
      Experiment.srmCheck(
          Tables(s, dir).events.select(col("user_id"), arm.as("arm")),
          "arm", "user_id", Seq("control" -> 0.5, "treatment" -> 0.5))
        .orderBy("arm")
    }),
    // Mann-Whitney U on the q176 experiment's per-user revenue (exact
    // DECIMAL metric so both engines rank identical value groups):
    // midranks on doubled integers, full tie correction, one result row.
    "q187_mann_whitney" -> ((s, dir) => {
      val arm = when(substring(md5(concat(col("user_id").cast("string"),
        lit(":ab"))), 1, 1) < "8", lit("control")).otherwise(lit("treatment"))
      val units = Tables(s, dir).events
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(coalesce(col("value").cast("decimal(18,6)"),
          lit(0L).cast("decimal(18,6)"))).as("y"))
        .withColumn("arm", arm)
      Experiment.mannWhitney(units, "arm", "y", "control", "treatment")
    }),
    // Kaplan-Meier churn curves per event type: subject = (type, user),
    // duration = last-activity day, churned iff the last day precedes the
    // observation edge (Jan 26) — later users are CENSORED, feeding the
    // at-risk counts but never the event counts, which is the entire
    // point of KM over naive churn rates.
    "q186_kaplan_meier" -> ((s, dir) => {
      val d = Tables(s, dir).events.filter(col("user_id").isNotNull)
        .withColumn("_day",
          floor(unix_micros(col("ts")).cast("double") / lit(86400.0e6))
            .cast("long"))
      val subjects = d.groupBy(col("event_type"), col("user_id"))
        .agg(max(col("_day")).as("dur"))
        .withColumn("churned", col("dur") < 19748L) // day of 2024-01-26
      Retention.kaplanMeier(subjects, Seq("event_type"), "dur", "churned")
        .orderBy("event_type", "t")
    }),
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
      val d = Tables(s, dir).documents
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
      val d = Tables(s, dir).documents
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
      val d = Tables(s, dir).documents
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
      val d = Tables(s, dir).documents
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
      val d = Tables(s, dir).documents
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
    })
  )

  /** q131's planted markup wrapper — ONE definition feeds both the Spark
    * plant and the oracle SQL, so the two sides can never drift. The
    * suffix deliberately carries the `&amp;lt;` order trap (must decode to
    * the literal string `&lt;`, never `<`), a multi-line script payload
    * (exercises `(?s)`), and every named entity in the decode set. */
  private val MarkupPrefix =
    "<html><head><style>p{color:red}</style></head><body class=\"x\"><p>"
  private val MarkupSuffix =
    "</p><br><script type=\"text/js\">var a=1;\nalert(a)</script>" +
      "<!-- note --> &amp;lt; &quot;q&quot; &#39;s&#39;&nbsp;end</body></html>"

  /** Single-quote SQL literal of `s` (embedded quotes doubled). */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** q131's oracle: the [[graft.operators.Scrub.stripMarkup]] regex chain
    * replayed step-for-step (same patterns, same order, 'g' for Spark's
    * replace-all semantics) over the same shared plant constants. */
  private def stripMarkupOracle: String = {
    val steps = Seq(
      "(?s)<script[^>]*>.*?</script>" -> " ",
      "(?s)<style[^>]*>.*?</style>" -> " ",
      "(?s)<!--.*?-->" -> " ",
      "<[^>]*>" -> " ",
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&", "\\s+" -> " ")
    val chain = steps.foldLeft("text") { case (acc, (p, r)) =>
      s"regexp_replace($acc, ${sqlLit(p)}, ${sqlLit(r)}, 'g')"
    }
    s"""WITH base AS (SELECT doc_id,
       |    ${sqlLit(MarkupPrefix)} || text || ${sqlLit(MarkupSuffix)} AS text
       |  FROM documents)
       |SELECT doc_id, trim($chain) AS clean
       |FROM base ORDER BY doc_id""".stripMargin
  }

  /** q133's oracle: [[graft.operators.Bpe]] replayed as `merges` unrolled
    * CTE iterations — per-iteration adjacent-pair counts (integer sums),
    * the (weight DESC, left, right) argmax, and the greedy left-to-right
    * merge fold as a struct-element `list_reduce` whose first element IS
    * the initial accumulator (equivalent to the engine's
    * `(out=[], pend='')` zero plus one step). */
  /** q137's oracle: per-n gram streams over the identical single-space
    * tokenization, exact distinct/total counts, one integer/integer
    * double division; the (source × n) spine restores empty cells. */
  /** q151 oracle: same planted corpus, the SAME three redaction regexes
    * as detectors, and Wilson expressions carrying the plan's own z/z²
    * doubles — fixed-order IEEE ops + correctly-rounded sqrt, no
    * rounding. */
  private def piiOracle(z: Double): String = {
    val (zl, z2l) = graft.operators.Scrub.wilsonLiterals(z)
    val email = graft.operators.Scrub.EmailRe
    val ip = graft.operators.Scrub.Ipv4Re
    val phone = graft.operators.Scrub.PhoneRe
    s"""WITH planted AS (SELECT doc_id, source,
       |    text
       |      || CASE WHEN doc_id % 7 = 0 THEN ' contact bob@ex-ample.org' ELSE '' END
       |      || CASE WHEN doc_id % 11 = 0 THEN ' host 10.1.2.3' ELSE '' END
       |      || CASE WHEN doc_id % 13 = 0 THEN ' call +1-555-0100' ELSE '' END
       |      AS text
       |  FROM documents),
       |f AS (SELECT source,
       |    CASE WHEN regexp_matches(text, '$email') THEN 1 ELSE 0 END AS e,
       |    CASE WHEN regexp_matches(text, '$ip') THEN 1 ELSE 0 END AS i,
       |    CASE WHEN regexp_matches(text, '$phone') THEN 1 ELSE 0 END AS p
       |  FROM planted),
       |a AS (SELECT source,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(e) AS BIGINT) AS n_email,
       |    CAST(sum(i) AS BIGINT) AS n_ip,
       |    CAST(sum(p) AS BIGINT) AS n_phone,
       |    CAST(sum(CASE WHEN e + i + p > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_flagged
       |  FROM f GROUP BY source),
       |w AS (SELECT *,
       |    CAST(n_flagged AS DOUBLE) / CAST(n_docs AS DOUBLE) AS rate,
       |    CAST(1.0 AS DOUBLE)
       |      + CAST('$z2l' AS DOUBLE) / CAST(n_docs AS DOUBLE) AS denom
       |  FROM a),
       |c AS (SELECT *,
       |    (rate + CAST('$z2l' AS DOUBLE)
       |        / (CAST(2.0 AS DOUBLE) * CAST(n_docs AS DOUBLE))) / denom
       |      AS center,
       |    (CAST('$zl' AS DOUBLE) / denom)
       |      * sqrt(rate * (CAST(1.0 AS DOUBLE) - rate)
       |          / CAST(n_docs AS DOUBLE)
       |        + CAST('$z2l' AS DOUBLE)
       |          / (CAST(4.0 AS DOUBLE) * CAST(n_docs AS DOUBLE)
       |             * CAST(n_docs AS DOUBLE))) AS half
       |  FROM w)
       |SELECT source, n_docs, n_email, n_ip, n_phone, n_flagged, rate,
       |  greatest(CAST(0.0 AS DOUBLE), center - half) AS wilson_lo,
       |  least(CAST(1.0 AS DOUBLE), center + half) AS wilson_hi
       |FROM c ORDER BY source""".stripMargin
  }

  /** q146 oracle: generated from the SAME power/scale doubles the Spark
    * plan plants (Retrieval.rboLiterals), so every term replays
    * bit-identically with no rounding. */
  private def rboOracle(k: Int, p: Double): String = {
    val (pows, scale) = graft.operators.Retrieval.rboLiterals(k, p)
    val powCase = pows.zipWithIndex
      .map { case (pw, i) => s"WHEN ${i + 1} THEN CAST('$pw' AS DOUBLE)" }
      .mkString(" ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
       |sa AS (SELECT q.query_id, e.vec_id AS id,
       |    row_number() OVER (PARTITION BY q.query_id ORDER BY
       |      list_inner_product(e.v, q.qv)
       |        / (sqrt(list_inner_product(e.v, e.v))
       |           * sqrt(list_inner_product(q.qv, q.qv))) DESC,
       |      e.vec_id) AS ra
       |  FROM e CROSS JOIN q),
       |eb AS (SELECT vec_id, list_transform(v, x ->
       |    floor(x * CAST(16.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
       |      / CAST(16.0 AS DOUBLE)) AS v FROM e),
       |qb AS (SELECT vec_id AS query_id, v AS qv FROM eb WHERE vec_id < 8),
       |sb AS (SELECT qb.query_id, eb.vec_id AS id,
       |    row_number() OVER (PARTITION BY qb.query_id ORDER BY
       |      list_inner_product(eb.v, qb.qv)
       |        / (sqrt(list_inner_product(eb.v, eb.v))
       |           * sqrt(list_inner_product(qb.qv, qb.qv))) DESC,
       |      eb.vec_id) AS rb
       |  FROM eb CROSS JOIN qb),
       |m AS (SELECT a.query_id, greatest(a.ra, b.rb) AS m
       |  FROM (SELECT * FROM sa WHERE ra <= $k) a
       |  JOIN (SELECT * FROM sb WHERE rb <= $k) b
       |    ON a.query_id = b.query_id AND a.id = b.id),
       |sp AS (SELECT q.query_id, g.d FROM q
       |  CROSS JOIN generate_series(1, $k) AS g(d)),
       |xd AS (SELECT sp.query_id, sp.d,
       |    CAST(coalesce(sum(CASE WHEN m.m <= sp.d THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS x
       |  FROM sp LEFT JOIN m ON m.query_id = sp.query_id
       |  GROUP BY sp.query_id, sp.d),
       |t AS (SELECT query_id, d,
       |    (CASE d $powCase END * CAST(x AS DOUBLE)) / CAST(d AS DOUBLE) AS t
       |  FROM xd)
       |SELECT query_id,
       |  list_reduce(list(t ORDER BY d), (a, b) -> a + b)
       |    * CAST('$scale' AS DOUBLE) AS rbo
       |FROM t GROUP BY query_id ORDER BY query_id""".stripMargin
  }

  private def diversityOracle(maxN: Int): String = {
    val branches = (1 to maxN).map { n =>
      s"""SELECT source, $n AS n,
         |    unnest(list_transform(
         |      generate_series(1, greatest(len(tk) - ${n - 1}, 0)),
         |      i -> array_to_string(list_slice(tk, i, i + ${n - 1}), ' '))) AS g
         |  FROM t""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH t AS (SELECT source, string_split(text, ' ') AS tk FROM documents),
       |gall AS (
       |  $branches),
       |agg AS (SELECT source, n, count(DISTINCT g) AS d, count(*) AS tt
       |  FROM gall GROUP BY 1, 2),
       |spine AS (SELECT DISTINCT source FROM documents),
       |ns AS (SELECT unnest(generate_series(1, $maxN)) AS n)
       |SELECT spine.source AS source, CAST(ns.n AS INTEGER) AS n,
       |  CAST(coalesce(d, 0) AS BIGINT) AS distinct_ngrams,
       |  CAST(coalesce(tt, 0) AS BIGINT) AS total_ngrams,
       |  CASE WHEN coalesce(tt, 0) > 0
       |       THEN CAST(d AS DOUBLE) / CAST(tt AS DOUBLE)
       |       ELSE CAST(0.0 AS DOUBLE) END AS distinct_ratio
       |FROM spine CROSS JOIN ns
       |LEFT JOIN agg ON agg.source = spine.source AND agg.n = ns.n
       |ORDER BY source, n""".stripMargin
  }

  /** q136's oracle: [[graft.operators.Coreset.kCenterGreedy]] unrolled as
    * `k − 1` chained CTE picks. Each `m_t` narrows the previous candidate
    * set by the last pick and folds its distance in with `least`; each
    * `p_t` is the `(mind2 DESC, id ASC)` argmax — exactly the engine's
    * `max(struct(mind2, −id))`. Distances are the identical
    * `vn2 + sn2 − 2·dot` expression over `list_inner_product`, so every
    * d2 is bit-exact. */
  private def kcenterOracle(k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH e AS (SELECT CAST(vec_id AS BIGINT) AS id,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |en AS (SELECT id, v, list_inner_product(v, v) AS vn2 FROM e),
        |p0 AS (SELECT id, v, vn2 FROM en ORDER BY id LIMIT 1),
        |m1 AS (SELECT en.id, en.v, en.vn2,
        |    en.vn2 + p.vn2 - CAST(2.0 AS DOUBLE) * list_inner_product(en.v, p.v) AS mind2
        |  FROM en, p0 p WHERE en.id <> p.id),
        |p1 AS (SELECT id, v, vn2, mind2 FROM m1 ORDER BY mind2 DESC, id LIMIT 1)""".stripMargin)
    for (t <- 2 until k) {
      sb.append(s""",
        |m$t AS (SELECT m.id, m.v, m.vn2,
        |    least(m.mind2,
        |      m.vn2 + p.vn2 - CAST(2.0 AS DOUBLE) * list_inner_product(m.v, p.v)) AS mind2
        |  FROM m${t - 1} m, p${t - 1} p WHERE m.id <> p.id),
        |p$t AS (SELECT id, v, vn2, mind2 FROM m$t ORDER BY mind2 DESC, id LIMIT 1)""".stripMargin)
    }
    sb.append("""
        |SELECT CAST(0 AS INTEGER) AS step, id AS vec_id, CAST(NULL AS DOUBLE) AS d2 FROM p0""".stripMargin)
    for (t <- 1 until k)
      sb.append(s"""
        |UNION ALL SELECT CAST($t AS INTEGER), id, mind2 FROM p$t""".stripMargin)
    sb.append("\nORDER BY step")
    sb.toString
  }

  /** q218's oracle: [[graft.operators.Coreset.mmrSelect]] unrolled as
    * chained CTE picks, the q136 pattern with the k-center distance
    * swapped for `λ·rel − (1−λ)·maxsim`. λ and 1−λ are printed from the
    * SAME Scala doubles the engine plants (`1.0 − 0.7` is NOT the
    * literal 0.3 — it round-trips as 0.30000000000000004), each CAST to
    * DOUBLE so DuckDB's decimal literal parser can't widen them. */
  private def mmrOracle(k: Int, lambda: Double): String = {
    val mu = 1.0 - lambda
    val lam = s"CAST($lambda AS DOUBLE)"
    val muS = s"CAST($mu AS DOUBLE)"
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS (SELECT CAST(vec_id AS BIGINT) AS id,
         |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e ORDER BY id LIMIT 1),
         |en AS (SELECT e.id, e.v,
         |    list_inner_product(e.v, q.qv) AS rel FROM e, q),
         |p0 AS (SELECT id, v, rel FROM en ORDER BY rel DESC, id LIMIT 1),
         |m1 AS (SELECT en.id, en.v, en.rel,
         |    list_inner_product(en.v, p.v) AS maxsim
         |  FROM en, p0 p WHERE en.id <> p.id),
         |p1 AS (SELECT id, v, rel, maxsim,
         |    $lam * rel - $muS * maxsim AS score
         |  FROM m1 ORDER BY score DESC, id LIMIT 1)""".stripMargin)
    for (t <- 2 until k) {
      sb.append(s""",
         |m$t AS (SELECT m.id, m.v, m.rel,
         |    greatest(m.maxsim, list_inner_product(m.v, p.v)) AS maxsim
         |  FROM m${t - 1} m, p${t - 1} p WHERE m.id <> p.id),
         |p$t AS (SELECT id, v, rel, maxsim,
         |    $lam * rel - $muS * maxsim AS score
         |  FROM m$t ORDER BY score DESC, id LIMIT 1)""".stripMargin)
    }
    sb.append("""
         |SELECT CAST(0 AS INTEGER) AS step, id AS vec_id,
         |  CAST(NULL AS DOUBLE) AS score FROM p0""".stripMargin)
    for (t <- 1 until k)
      sb.append(s"""
         |UNION ALL SELECT CAST($t AS INTEGER), id, score FROM p$t"""
        .stripMargin)
    sb.append("\nORDER BY step")
    sb.toString
  }

  /** The BPE training CTE chain shared by q133/q155/q158's oracles:
    * `words` (corpus word frequencies), `w0` (char symbols), then per
    * merge i the CTEs `p$i` (pair counts), `m$i` (the argmax rule) and
    * `w$i` (the corpus after applying rule i). With `carryWord` the
    * original word rides through every `w$i`, so the FINAL `w$merges` maps
    * each distinct word to its encoded symbol list — the oracle-side
    * equivalent of [[graft.operators.Bpe.encode]] under the learned rules. */
  private def bpeOracleCtes(merges: Int, carryWord: Boolean): String = {
    // DuckDB 1.0's list_reduce drops LIST-typed struct fields from the
    // accumulator (verified live: the out-list stayed empty every step),
    // so the greedy merge fold encodes its (out, pend) state in ONE flat
    // VARCHAR: `out-symbols-joined-by-chr(31)` || chr(30) || pend, with
    // each element mapped to chr(30)||symbol (empty out + that pend) so
    // the reduce's first-element-is-the-accumulator convention equals the
    // engine's (out=[], pend='') zero plus one step. Data symbols are
    // regex-split word tokens — they cannot contain the control chars.
    val cw = if (carryWord) "word, " else ""
    val out = "string_split(a, chr(30))[1]"
    val pend = "string_split(a, chr(30))[2]"
    val joined = s"CASE WHEN $pend = '' THEN $out WHEN $out = '' THEN $pend " +
      s"ELSE $out || chr(31) || $pend END"
    val iters = (1 to merges).map { i =>
      val prev = s"w${i - 1}"
      s"""p$i AS (SELECT l, r, CAST(sum(weight) AS BIGINT) AS w FROM (
         |  SELECT weight, syms[j] AS l, syms[j + 1] AS r FROM (
         |    SELECT weight, syms,
         |      unnest(generate_series(1, greatest(len(syms) - 1, 0))) AS j
         |    FROM $prev)) GROUP BY l, r),
         |m$i AS (SELECT l, r, w FROM p$i ORDER BY w DESC, l ASC, r ASC LIMIT 1),
         |w$i AS (SELECT ${cw}string_split(
         |    CASE WHEN string_split(f, chr(30))[2] = '' THEN string_split(f, chr(30))[1]
         |         WHEN string_split(f, chr(30))[1] = '' THEN string_split(f, chr(30))[2]
         |         ELSE string_split(f, chr(30))[1] || chr(31) || string_split(f, chr(30))[2] END,
         |    chr(31)) AS syms, weight FROM (
         |    SELECT ${cw}weight, list_reduce(
         |      list_transform(syms, c -> chr(30) || c),
         |      (a, x) -> CASE WHEN $pend = m$i.l AND substr(x, 2) = m$i.r
         |        THEN CASE WHEN $out = '' THEN '' ELSE $out || chr(31) END ||
         |             m$i.l || m$i.r || chr(30)
         |        ELSE $joined || chr(30) || substr(x, 2) END) AS f
         |    FROM $prev, m$i))""".stripMargin
    }
    s"""words AS (SELECT word, CAST(count(*) AS BIGINT) AS weight FROM (
       |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
       |    FROM documents) WHERE word <> '' GROUP BY word),
       |w0 AS (SELECT ${cw}list_transform(generate_series(1, length(word)),
       |    i -> substr(word, i, 1)) AS syms, weight FROM words),
       |${iters.mkString(",\n")}""".stripMargin
  }

  /** q311's oracle: replay [[graft.operators.Unigram.train]] (one hard-EM
    * round) in pure SQL. The Viterbi DP over word positions is unrolled —
    * `dp$j` holds each word's best score at position j, `dpu$j` the
    * running union — which is why both engines cap words at `maxWordLen`
    * characters; the backtrack is the same unrolled walk choosing, at
    * every position, the smallest predecessor index among score-exact
    * maximizers (= the longest piece, the trainer's tie rule). Scores are
    * the shared integer recipe `floor(ln(c0/T)·1e6 + 0.5)`, so the DP
    * compares identical longs in both engines. */
  private def unigramOracle(maxLen: Int, seedTopK: Int, keepMulti: Int,
                            maxWordLen: Int): String = {
    val dps = (1 to maxWordLen).map { j =>
      s"""dp$j AS MATERIALIZED (SELECT e.word, max(d.best + e.s) AS best
         |  FROM edges e JOIN dpu${j - 1} d ON d.word = e.word AND d.pos = e.i
         |  WHERE e.j = $j GROUP BY e.word),
         |dpu$j AS MATERIALIZED (SELECT word, pos, best FROM dpu${j - 1}
         |  UNION ALL SELECT word, $j AS pos, best FROM dp$j)""".stripMargin
    }
    val paths = (1 to maxWordLen).map { t =>
      s"""step$t AS MATERIALIZED (SELECT p.word, p.pos, c.pi FROM path${t - 1} p
         |  JOIN choice c ON c.word = p.word AND c.pos = p.pos WHERE p.pos > 0),
         |path$t AS MATERIALIZED (SELECT word, pi AS pos FROM step$t)""".stripMargin
    }
    val pieceRows = (1 to maxWordLen).map(t =>
      s"SELECT word, substr(word, pi + 1, pos - pi) AS piece FROM step$t")
    s"""WITH words AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS weight FROM (
       |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
       |    FROM documents)
       |  WHERE word <> '' AND length(word) <= $maxWordLen GROUP BY word),
       |cand AS MATERIALIZED (
       |  SELECT word, weight, i, k FROM (
       |    SELECT word, weight, unnest(generate_series(1, length(word))) AS i
       |    FROM words),
       |    (SELECT unnest(generate_series(1, $maxLen)) AS k)
       |  WHERE i + k - 1 <= length(word)),
       |subs AS MATERIALIZED (SELECT substr(word, i, k) AS piece,
       |    CAST(sum(weight) AS BIGINT) AS c0 FROM cand GROUP BY piece),
       |chars AS MATERIALIZED (SELECT piece, c0 FROM subs WHERE length(piece) = 1),
       |multi AS MATERIALIZED (SELECT piece, c0 FROM subs WHERE length(piece) > 1
       |  ORDER BY c0 DESC, piece LIMIT $seedTopK),
       |vocab0 AS MATERIALIZED (SELECT piece, c0 FROM chars
       |  UNION ALL SELECT piece, c0 FROM multi),
       |tot AS MATERIALIZED (SELECT CAST(sum(c0) AS BIGINT) AS t0 FROM vocab0),
       |vs AS MATERIALIZED (SELECT piece, CAST(floor(ln(CAST(c0 AS DOUBLE) /
       |    CAST(t0 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS s
       |  FROM vocab0, tot),
       |edges AS MATERIALIZED (SELECT c.word, c.i - 1 AS i, c.i - 1 + c.k AS j, v.s
       |  FROM cand c JOIN vs v ON v.piece = substr(c.word, c.i, c.k)),
       |dpu0 AS MATERIALIZED (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS best FROM words),
       |${dps.mkString(",\n")},
       |choice AS MATERIALIZED (
       |  SELECT word, pos, min(i) AS pi FROM (
       |    SELECT e.word, e.j AS pos, e.i AS i FROM edges e
       |    JOIN dpu$maxWordLen di ON di.word = e.word AND di.pos = e.i
       |    JOIN dpu$maxWordLen dj ON dj.word = e.word AND dj.pos = e.j
       |    WHERE di.best + e.s = dj.best) GROUP BY word, pos),
       |path0 AS MATERIALIZED (SELECT word, length(word) AS pos FROM words),
       |${paths.mkString(",\n")},
       |pieces AS MATERIALIZED (${pieceRows.mkString("\n  UNION ALL\n")}),
       |c1 AS MATERIALIZED (SELECT piece, CAST(sum(w.weight) AS BIGINT) AS n_uses
       |  FROM pieces pc JOIN words w ON w.word = pc.word GROUP BY piece),
       |multi_kept AS MATERIALIZED (SELECT piece, n_uses FROM c1 WHERE length(piece) > 1
       |  ORDER BY n_uses DESC, piece LIMIT $keepMulti)
       |SELECT piece, CAST(COALESCE(u.n_uses, 0) AS BIGINT) AS n_uses
       |FROM chars c LEFT JOIN c1 u USING (piece)
       |UNION ALL SELECT piece, n_uses FROM multi_kept
       |ORDER BY piece""".stripMargin
  }

  private def bpeOracle(merges: Int): String = {
    val rows = (1 to merges).map(i =>
      s"""SELECT $i AS step, l AS "left", r AS "right", l || r AS merged, w AS weight FROM m$i""")
    s"""WITH ${bpeOracleCtes(merges, carryWord = false)}
       |SELECT CAST(step AS INTEGER) AS step, "left", "right", merged, weight
       |FROM (${rows.mkString("\nUNION ALL\n")})
       |ORDER BY step""".stripMargin
  }

  /** q158's oracle: train the same `merges` rules, then read the encoded
    * corpus straight off the final `w$merges` (each distinct word with its
    * symbol list), join occurrence counts per (lang, source) and fold the
    * exact integer masses; each ratio is the same single double division
    * as the Spark side. */
  private def bpeFertilityOracle(merges: Int): String =
    s"""WITH ${bpeOracleCtes(merges, carryWord = true)},
       |tok AS (SELECT word, CAST(len(syms) AS INTEGER) AS n_tok,
       |    CAST(length(word) AS BIGINT) AS n_chr FROM w$merges),
       |occ AS (SELECT lang, source, word, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT lang, source,
       |      unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
       |    FROM documents) WHERE word <> '' GROUP BY lang, source, word)
       |SELECT occ.lang, occ.source,
       |  CAST(sum(c) AS BIGINT) AS n_words,
       |  CAST(sum(c * n_tok) AS BIGINT) AS n_tokens,
       |  CAST(sum(c * n_chr) AS BIGINT) AS n_chars,
       |  CAST(sum(c * n_tok) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS tokens_per_word,
       |  CAST(sum(c * n_chr) AS DOUBLE) / CAST(sum(c * n_tok) AS DOUBLE) AS chars_per_token
       |FROM occ JOIN tok USING (word)
       |GROUP BY occ.lang, occ.source
       |ORDER BY occ.lang, occ.source""".stripMargin

  /** q128's oracle, generated per gram size n: the engine's per-row
    * run-folds recomputed relationally — unnest grams, group-by counts,
    * the same BIGINT `c·len` masses, the same single DOUBLE divisions,
    * the same [[Scrub.RepetitionThresholds]] literals for `pass`. */
  private def repetitionOracle: String = {
    val topNs = Seq(2, 3, 4)
    val dupNs = 5 to 10
    val gramCtes = (topNs ++ dupNs).map { n =>
      s"""g$n AS (SELECT doc_id, g, count(*) AS c, length(g) AS le FROM
         |  (SELECT doc_id, unnest(list_transform(
         |     generate_series(1, greatest(len(tk) - ${n - 1}, 0)),
         |     i -> array_to_string(list_slice(tk, i, i + ${n - 1}), ' '))) AS g
         |   FROM t) GROUP BY doc_id, g)""".stripMargin
    }
    val topCtes = topNs.map { n =>
      s"""top$n AS (SELECT doc_id, CAST(c * le AS BIGINT) AS m FROM
         |  (SELECT doc_id, c, le, row_number() OVER (PARTITION BY doc_id
         |     ORDER BY c DESC, le DESC, g ASC) AS rn FROM g$n) WHERE rn = 1)""".stripMargin
    }
    val dupCtes = dupNs.map { n =>
      s"""d$n AS (SELECT doc_id,
         |  CAST(sum(CASE WHEN c >= 2 THEN c * le ELSE 0 END) AS BIGINT) AS m
         |  FROM g$n GROUP BY doc_id)""".stripMargin
    }
    val fracExprs =
      Seq("CAST(lm.dups AS DOUBLE) / CAST(lm.n_lines AS DOUBLE) AS dup_line_frac",
        "CAST(lm.dupmass AS DOUBLE) / CAST(greatest(lm.mass, 1) AS DOUBLE) AS dup_line_char_frac") ++
        topNs.map(n =>
          s"CAST(coalesce(top$n.m, 0) AS DOUBLE) / CAST(t.chars AS DOUBLE) AS top${n}_char_frac") ++
        dupNs.map(n =>
          s"least(CAST(1.0 AS DOUBLE), CAST(coalesce(d$n.m, 0) AS DOUBLE) / CAST(t.chars AS DOUBLE)) AS dup${n}_char_frac")
    val joins =
      topNs.map(n => s"LEFT JOIN top$n ON t.doc_id = top$n.doc_id") ++
        dupNs.map(n => s"LEFT JOIN d$n ON t.doc_id = d$n.doc_id")
    val pass = Scrub.RepetitionThresholds
      .map { case (name, th) => s"$name <= CAST($th AS DOUBLE)" }
      .mkString("(", " AND ", ") AS pass")
    val sigNames = Scrub.RepetitionThresholds.map(_._1).mkString(", ")
    s"""WITH base AS (SELECT doc_id,
       |    text || chr(10) || substr(text, 1, 40) || chr(10) || substr(text, 1, 40)
       |      || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'the end' ELSE '' END AS text
       |  FROM documents),
       |t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk,
       |    string_split(text, chr(10)) AS ln,
       |    greatest(length(text), 1) AS chars FROM base),
       |lc AS (SELECT doc_id, l, count(*) AS c, length(l) AS le
       |  FROM (SELECT doc_id, unnest(ln) AS l FROM t) GROUP BY doc_id, l),
       |lm AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
       |    CAST(sum(c) - count(*) AS BIGINT) AS dups,
       |    CAST(sum(c * le) AS BIGINT) AS mass,
       |    CAST(sum(CASE WHEN c >= 2 THEN c * le ELSE 0 END) AS BIGINT) AS dupmass
       |  FROM lc GROUP BY doc_id),
       |${(gramCtes ++ topCtes ++ dupCtes).mkString(",\n")},
       |sel AS (SELECT t.doc_id, lm.n_lines,
       |  ${fracExprs.mkString(",\n  ")}
       |  FROM t JOIN lm ON t.doc_id = lm.doc_id
       |  ${joins.mkString("\n  ")})
       |SELECT doc_id, n_lines, $sigNames,
       |  $pass
       |FROM sel ORDER BY doc_id""".stripMargin
  }

  /** One level of unrolled Louvain move rounds for the q271/q272
    * oracles: per round the exact HUGEINT gain table, g DESC / min-label
    * argmax (Spark's min(struct(-g, l))), and the Lu et al. singleton
    * guard. `lv` prefixes the CTE names; `sym`/`deg` name the level's
    * graph tables; mm (= 2m, invariant under coarsening) is shared. */
  private def louvainRoundCtes(lv: String, sym: String, deg: String,
                               nRounds: Int): String =
    (1 to nRounds).map { i =>
      val prev = s"l$lv${i - 1}"
      s"""tot$lv$i AS MATERIALIZED (SELECT l.label, sum(d.k) AS t,
         |    CAST(count(*) AS BIGINT) AS s
         |  FROM $prev l JOIN $deg d ON d.node = l.node GROUP BY 1),
         |kic$lv$i AS MATERIALIZED (SELECT e.a AS node, l.label AS tl,
         |    sum(e.w) AS w
         |  FROM $sym e JOIN $prev l ON l.node = e.b GROUP BY 1, 2),
         |self$lv$i AS MATERIALIZED (SELECT l.node, l.label, d.k,
         |    t.t AS town, t.s AS sown, coalesce(k2.w, 0) AS wcur
         |  FROM $prev l JOIN $deg d ON d.node = l.node
         |  JOIN tot$lv$i t ON t.label = l.label
         |  LEFT JOIN kic$lv$i k2 ON k2.node = l.node AND k2.tl = l.label),
         |cand$lv$i AS (SELECT s.node, k.tl,
         |    mm.m2 * (k.w - s.wcur) - s.k * (t2.t - (s.town - s.k)) AS g,
         |    s.sown, t2.s AS sc, s.label
         |  FROM kic$lv$i k JOIN self$lv$i s ON s.node = k.node
         |  JOIN tot$lv$i t2 ON t2.label = k.tl
         |  CROSS JOIN mm
         |  WHERE k.tl <> s.label),
         |best$lv$i AS (SELECT node, tl FROM (
         |    SELECT node, tl, row_number()
         |      OVER (PARTITION BY node ORDER BY g DESC, tl) AS rn
         |    FROM cand$lv$i
         |    WHERE g > 0 AND NOT (sown = 1 AND sc = 1 AND tl > label))
         |  WHERE rn = 1),
         |l$lv$i AS MATERIALIZED (SELECT l.node,
         |    coalesce(b.tl, l.label) AS label
         |  FROM $prev l LEFT JOIN best$lv$i b ON b.node = l.node)"""
        .stripMargin
    }.mkString(",\n")

  /** q286 / q286s oracle: the wedge generation replayed relationally —
    * canonical edges, full-graph degrees, capped centers, pair rollup
    * with // (floor ≡ Spark DIV on positives), NOT EXISTS against the
    * edge set, HUGEINT resource-allocation sums. `sampled` adds the
    * q286s 50% md5 order sample (wedges scale quadratically, so the
    * half sample quarters the work; a 25% sample left the sf0.001
    * graph with zero cn ≥ 2 pairs — ContractSpec's fixture-overfit
    * guard caught it). */
  private def linkPredictionOracleSql(sampled: Boolean): String = {
    val sample = if (sampled)
      "\n|    AND md5(CAST(l_orderkey AS VARCHAR) || ':osample') < '80'" else ""
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |  FROM lineitem WHERE l_orderkey % 20 = 0$sample),
       |e AS (SELECT DISTINCT least(x.pk, y.pk) AS u, greatest(x.pk, y.pk) AS v
       |  FROM li x JOIN li y USING (ok) WHERE x.pk <> y.pk),
       |deg AS (SELECT node, count(*) AS d
       |  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
       |  GROUP BY 1),
       |adj AS (SELECT u AS c, v AS n FROM e UNION ALL SELECT v, u FROM e),
       |ctr AS (SELECT adj.c, adj.n, deg.d AS dc FROM adj
       |  JOIN deg ON deg.node = adj.c WHERE deg.d <= 256),
       |pr AS (SELECT a1.n AS pu, a2.n AS pv, a1.dc
       |  FROM ctr a1 JOIN ctr a2 ON a1.c = a2.c AND a1.n < a2.n),
       |sc AS (SELECT pu, pv, count(*) AS cn,
       |    sum(1000000000000 // dc) AS ra
       |  FROM pr GROUP BY 1, 2 HAVING count(*) >= 2),
       |ne AS (SELECT sc.* FROM sc WHERE NOT EXISTS
       |  (SELECT 1 FROM e WHERE e.u = sc.pu AND e.v = sc.pv))
       |SELECT pu AS u, pv AS w, CAST(cn AS BIGINT) AS cn,
       |  CAST(du.d AS BIGINT) AS deg_u, CAST(dw.d AS BIGINT) AS deg_w,
       |  CAST(CAST(cn AS HUGEINT) * 1000000000000
       |    // (du.d + dw.d - cn) AS BIGINT) AS jaccard_e12,
       |  CAST(ra AS BIGINT) AS ra_e12
       |FROM ne JOIN deg du ON du.node = ne.pu
       |  JOIN deg dw ON dw.node = ne.pv
       |ORDER BY u, w""".stripMargin
  }

  /** q287 / q287s oracle: the full multiclass-NB chain — hashed buckets,
    * train counts, 6dp floor-rounded log-probs/priors/unseen floors,
    * per-class tf·lp folds in feature order from a prepended 0.0, argmax
    * via (-score, label) row_number, margin vs the r=2 row. `sampled`
    * adds the q287s 25% md5 document sample (the sf1.0 heavy-tail
    * convention). */
  private def nbMulticlassOracleSql(sampled: Boolean): String = {
    val sample = if (sampled)
      "\n|  WHERE md5(CAST(doc_id AS VARCHAR) || ':osample') < '40'" else ""
    s"""WITH tks AS (SELECT doc_id, lang, list_filter(string_split(trim(
       |    regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
       |    ' +', ' ', 'g')), ' '), x -> x <> '') AS tk
       |  FROM documents$sample),
       |feat AS (SELECT doc_id, lang, substr(md5(t || ':nbmc'), 1, 4) AS feature
       |  FROM (SELECT doc_id, lang, unnest(tk) AS t
       |        FROM tks WHERE len(tk) >= 1)),
       |cnt AS (SELECT lang AS label, feature, count(*) AS c
       |  FROM feat WHERE doc_id % 4 <> 0 GROUP BY 1, 2),
       |tot AS (SELECT label, sum(c) AS tot_c FROM cnt GROUP BY 1),
       |pri AS (SELECT lang AS label, count(*) AS label_docs
       |  FROM tks WHERE doc_id % 4 <> 0 AND len(tk) >= 1 GROUP BY 1),
       |nd AS (SELECT sum(label_docs) AS n FROM pri),
       |model AS (SELECT label, feature,
       |    floor(ln(CAST(c + 1 AS DOUBLE) / CAST(tot_c + 65536 AS DOUBLE))
       |        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
       |      / CAST(1000000 AS DOUBLE) AS lp
       |  FROM cnt JOIN tot USING (label)),
       |cls AS (SELECT label, tot_c,
       |    floor(ln(CAST(label_docs AS DOUBLE) / CAST(n AS DOUBLE))
       |        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
       |      / CAST(1000000 AS DOUBLE) AS prior,
       |    floor(ln(CAST(1 AS DOUBLE) / CAST(tot_c + 65536 AS DOUBLE))
       |        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
       |      / CAST(1000000 AS DOUBLE) AS lp0
       |  FROM tot JOIN pri USING (label), nd),
       |tf AS (SELECT doc_id, feature, count(*) AS tf
       |  FROM feat GROUP BY 1, 2),
       |ll AS (SELECT tf.doc_id, cls.label, tf.feature, cls.prior,
       |    CAST(tf AS DOUBLE) * coalesce(model.lp, cls.lp0) AS ll
       |  FROM tf CROSS JOIN cls LEFT JOIN model
       |    ON model.label = cls.label AND model.feature = tf.feature),
       |sc AS (SELECT doc_id, label,
       |    max(prior) + list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list(ll ORDER BY feature)), (a, b) -> a + b) AS score
       |  FROM ll GROUP BY 1, 2),
       |rk AS (SELECT doc_id, label, score, row_number()
       |    OVER (PARTITION BY doc_id ORDER BY -score, label) AS r
       |  FROM sc)
       |SELECT b.doc_id, b.label AS label_hat,
       |  floor(b.score * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
       |    / CAST(10000 AS DOUBLE) AS score,
       |  floor(coalesce(b.score - s2.score, CAST(0 AS DOUBLE))
       |      * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
       |    / CAST(10000 AS DOUBLE) AS margin
       |FROM (SELECT * FROM rk WHERE r = 1) b
       |LEFT JOIN (SELECT doc_id, score FROM rk WHERE r = 2) s2 USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Shared CTE chain for q294/q295: the bucketed customer table, one
    * value histogram per field, and the Fellegi–Sunter weight table —
    * exact Σn_v²/N² chance-agreement, 6dp floor-rounded logs, NULL
    * `w_dis` on a constant field. Replays
    * [[graft.operators.Linkage.fellegiSunterWeights]]. */
  private def fsWeightsCtes: String = {
    val fields = Seq("c_mktsegment", "c_nationkey", "bal_bucket")
    val md = "CAST(950000 AS DOUBLE) / CAST(1000000 AS DOUBLE)"
    val hists = fields.map { f =>
      s"""h_$f AS (SELECT count(*) AS nv FROM cst GROUP BY $f),
         |u_$f AS (SELECT '$f' AS field, CAST(sum(nv) AS BIGINT) AS n,
         |    CAST(count(*) AS BIGINT) AS n_distinct,
         |    CAST(sum(CAST(nv AS HUGEINT) * nv) AS BIGINT) AS u_num,
         |    CAST(sum(CAST(nv AS HUGEINT) * nv) AS DOUBLE)
         |      / CAST(CAST(sum(nv) AS HUGEINT) * sum(nv) AS DOUBLE) AS u
         |  FROM h_$f)""".stripMargin
    }
    val unioned = fields.map(f => s"SELECT * FROM u_$f").mkString(
      "\n|    UNION ALL ")
    s"""cst AS MATERIALIZED (SELECT c_custkey, c_name, c_mktsegment,
       |    c_nationkey,
       |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
       |      // 100000 AS bal_bucket
       |  FROM customer),
       |${hists.mkString(",\n")},
       |wts AS MATERIALIZED (SELECT field, n, n_distinct, u_num, u,
       |    $md AS m,
       |    floor(ln(($md) / u) * CAST(1000000 AS DOUBLE)
       |      + CAST(0.5 AS DOUBLE)) / CAST(1000000 AS DOUBLE) AS w_agree,
       |    CASE WHEN u_num = CAST(CAST(n AS HUGEINT) * n AS BIGINT)
       |      THEN NULL
       |      ELSE floor(ln((CAST(1 AS DOUBLE) - ($md))
       |          / (CAST(1 AS DOUBLE) - u)) * CAST(1000000 AS DOUBLE)
       |        + CAST(0.5 AS DOUBLE)) / CAST(1000000 AS DOUBLE)
       |    END AS w_dis
       |  FROM ($unioned))""".stripMargin
  }

  /** q293's oracle: the q115 NB-score chain feeding `iters` unrolled
    * Newton steps — per step the e9-quantized sigmoid (the probed
    * floor seam), exact HUGEINT gradient/Hessian sums, truncating mean
    * normalization, and the same det-guarded integer update
    * [[graft.operators.Classifier.plattScale]] runs in BigInt. */
  private def plattOracleSql(iters: Int): String = {
    val d1 = "CAST(1 AS DOUBLE)"
    val e9d = "CAST(1000000000 AS DOUBLE)"
    val head =
      s"""WITH tk AS (SELECT doc_id, lang, unnest(string_split(trim(
         |    regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
         |    ' +', ' ', 'g')), ' ')) AS t FROM documents),
         |feat AS (SELECT doc_id, lang, substr(md5(t || ':nbf'), 1, 4) AS feature
         |  FROM tk WHERE t <> ''),
         |cnt AS (SELECT feature,
         |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cp,
         |    sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS cn
         |  FROM feat WHERE doc_id % 3 = 0 GROUP BY 1),
         |tot AS (SELECT sum(cp) AS tp, sum(cn) AS tn FROM cnt),
         |model AS (SELECT feature,
         |    floor((ln(CAST(cp + 1 AS DOUBLE) / CAST(tp + 65536 AS DOUBLE))
         |         - ln(CAST(cn + 1 AS DOUBLE) / CAST(tn + 65536 AS DOUBLE)))
         |        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
         |      / CAST(1000000 AS DOUBLE) AS llr
         |  FROM cnt, tot),
         |nbsc AS (SELECT doc_id,
         |    floor(list_reduce(list(llr ORDER BY feature), (a, b) -> a + b)
         |        * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
         |      / CAST(10000 AS DOUBLE) AS score
         |  FROM feat JOIN model USING (feature) GROUP BY 1),
         |rows0 AS MATERIALIZED (SELECT
         |    CAST(CAST(coalesce(nbsc.score, CAST(0.0 AS DOUBLE))
         |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS su,
         |    d.lang = 'en' AS y
         |  FROM documents d LEFT JOIN nbsc USING (doc_id)),
         |st AS (SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
         |    sum(CASE WHEN y THEN 0 ELSE 1 END) AS nn,
         |    count(*) AS n FROM rows0),
         |yv AS MATERIALIZED (SELECT
         |    ((np + 1) * 1000000000) // (np + 2) AS ypos,
         |    1000000000 // (nn + 2) AS yneg, np, nn, n FROM st),
         |it0 AS MATERIALIZED (SELECT CAST(0 AS HUGEINT) AS a,
         |    CAST(floor(ln(CAST(nn + 1 AS DOUBLE) / CAST(np + 1 AS DOUBLE))
         |      * $e9d + CAST(0.5 AS DOUBLE)) AS HUGEINT) AS b
         |  FROM yv)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""p$k AS (SELECT su,
         |    CAST(floor(($d1 / ($d1 + exp(-(
         |        CAST((it${k - 1}.a * su) // 1000000 + it${k - 1}.b AS DOUBLE)
         |        / $e9d))))
         |      * $e9d + CAST(0.5 AS DOUBLE)) AS HUGEINT) AS pe9,
         |    CASE WHEN y THEN ypos ELSE yneg END AS ye9
         |  FROM rows0, it${k - 1}, yv),
         |d$k AS (SELECT su, pe9 - ye9 AS d,
         |    (pe9 * (1000000000 - pe9)) // 1000000000 AS w FROM p$k),
         |g$k AS (SELECT sum(CAST(d AS HUGEINT) * su) AS ga,
         |    sum(CAST(d AS HUGEINT)) AS gb,
         |    sum(CAST(w AS HUGEINT) * su * su) AS haa,
         |    sum(CAST(w AS HUGEINT) * su) AS hab,
         |    sum(CAST(w AS HUGEINT)) AS hbb FROM d$k),
         |m$k AS (SELECT ga // n AS gam, gb // n AS gbm, haa // n AS haam,
         |    hab // n AS habm, hbb // n AS hbbm FROM g$k, yv),
         |dt$k AS (SELECT *, haam * hbbm - habm * habm AS det FROM m$k),
         |it$k AS MATERIALIZED (SELECT
         |    CASE WHEN det <= 0 OR det // 1000000000000000 = 0
         |        OR det // 1000000000 = 0 THEN it${k - 1}.a
         |      ELSE it${k - 1}.a - (hbbm * gam - habm * gbm)
         |        // (det // 1000000000000000) END AS a,
         |    CASE WHEN det <= 0 OR det // 1000000000000000 = 0
         |        OR det // 1000000000 = 0 THEN it${k - 1}.b
         |      ELSE it${k - 1}.b - (haam * gbm - habm * gam)
         |        // (det // 1000000000) END AS b
         |  FROM dt$k, it${k - 1})""".stripMargin
    }
    val sel = (0 to iters).map(k =>
      s"SELECT $k AS iter, CAST(a AS BIGINT) AS a_e9," +
        s" CAST(b AS BIGINT) AS b_e9 FROM it$k").mkString("\nUNION ALL ")
    (head +: steps).mkString(",\n") +
      s"\n$sel\nORDER BY iter"
  }

  /** q292's oracle: the Poisson-weight CASE is generated from the SAME
    * [[graft.operators.Experiment.poissonCdfHex]] literals the operator
    * plants, so both engines classify every (row, replicate) md5 prefix
    * against identical thresholds. */
  private def bootstrapOracleSql(sampled: Boolean = false): String = {
    val ths = graft.operators.Experiment.poissonCdfHex
    val cases = ths.zipWithIndex.map { case (t, k) =>
      s"WHEN substr(md5(id || ':' || b || ':boot'), 1, 12) < '$t' THEN $k"
    }.mkString("\n|      ")
    val sample = if (sampled)
      "\n|    AND md5(CAST(event_id AS VARCHAR) || ':osample') < '40'" else ""
    s"""WITH rows0 AS (SELECT event_type, CAST(event_id AS BIGINT) AS id,
       |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
       |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL
       |    AND event_type IS NOT NULL$sample),
       |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE)
       |      / CAST(1000000 AS DOUBLE) AS mean
       |  FROM rows0 GROUP BY 1),
       |wts AS (SELECT event_type, v, b,
       |    CASE $cases
       |      ELSE ${ths.length} END AS w
       |  FROM rows0 CROSS JOIN
       |    (SELECT unnest(generate_series(1, 64)) AS b)),
       |rep AS (SELECT event_type, b, sum(CAST(w * v AS HUGEINT)) AS ws,
       |    sum(w) AS wn
       |  FROM wts GROUP BY 1, 2 HAVING sum(w) > 0),
       |mn AS (SELECT event_type, b,
       |    CAST(ws AS DOUBLE) / CAST(wn AS DOUBLE)
       |      / CAST(1000000 AS DOUBLE) AS m
       |  FROM rep),
       |ci AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_reps_used,
       |    list(m ORDER BY m, b) AS ms
       |  FROM mn GROUP BY 1)
       |SELECT pt.event_type, pt.n_rows, pt.mean, ci.n_reps_used,
       |  CASE WHEN n_reps_used = 64 THEN ms[2] END AS boot_lo,
       |  CASE WHEN n_reps_used = 64 THEN ms[63] END AS boot_hi
       |FROM pt JOIN ci USING (event_type) ORDER BY event_type""".stripMargin
  }

  /** Generated CTE chain for q291: the parts graph, σ-counting BFS
    * levels (each anti-joined against every earlier level), then the
    * backward dependency folds — per level one grouped
    * `list_reduce(list((σv/σw)·(1+δw) ORDER BY w.node))`, and a final
    * landmark-ordered fold per node. Replays
    * [[graft.operators.Graph.betweennessFromLandmarks]]. */
  private def betweennessOracleCtes(maxHops: Int): String = {
    val dbl0 = "CAST(0 AS DOUBLE)"
    val base =
      s"""li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
         |  FROM lineitem WHERE l_orderkey % 20 = 0),
         |e0 AS MATERIALIZED (SELECT DISTINCT least(x.pk, y.pk) AS u,
         |    greatest(x.pk, y.pk) AS v
         |  FROM li x JOIN li y USING (ok) WHERE x.pk <> y.pk),
         |sym AS MATERIALIZED (SELECT u AS a, v AS b FROM e0
         |  UNION ALL SELECT v AS a, u AS b FROM e0),
         |v0 AS (SELECT CAST(unnest([2, 3, 5, 8]) AS BIGINT) AS lm,
         |    CAST(unnest([2, 3, 5, 8]) AS BIGINT) AS node,
         |    CAST(1 AS BIGINT) AS sigma)""".stripMargin
    val fwd = (1 to maxHops).map { h =>
      val antis = (0 until h).map(i =>
        s"NOT EXISTS (SELECT 1 FROM v$i WHERE v$i.lm = x.lm" +
          s" AND v$i.node = x.node)").mkString("\n|    AND ")
      s"""v$h AS MATERIALIZED (SELECT x.lm, x.node, x.sigma FROM (
         |    SELECT p.lm, s.b AS node, CAST(sum(p.sigma) AS BIGINT) AS sigma
         |    FROM v${h - 1} p JOIN sym s ON s.a = p.node GROUP BY 1, 2) x
         |  WHERE $antis)""".stripMargin
    }
    val dDeep =
      s"d$maxHops AS (SELECT lm, node, sigma, $dbl0 AS delta FROM v$maxHops)"
    val bwd = ((maxHops - 1) to 1 by -1).map { h =>
      s"""d$h AS MATERIALIZED (SELECT v.lm, v.node, v.sigma,
         |    coalesce(f.delta, $dbl0) AS delta
         |  FROM v$h v LEFT JOIN (
         |    SELECT v2.lm, v2.node, list_reduce(list_prepend($dbl0,
         |        list((CAST(v2.sigma AS DOUBLE) / CAST(w.sigma AS DOUBLE))
         |          * (CAST(1 AS DOUBLE) + w.delta) ORDER BY w.node)),
         |      (acc, t) -> acc + t) AS delta
         |    FROM v$h v2 JOIN sym s ON s.a = v2.node
         |      JOIN d${h + 1} w ON w.lm = v2.lm AND w.node = s.b
         |    GROUP BY 1, 2) f ON f.lm = v.lm AND f.node = v.node)""".stripMargin
    }
    val all = (1 to maxHops).map(h => s"SELECT lm, node, delta FROM d$h")
      .mkString("\n|  UNION ALL ")
    val alld = s"""alld AS ($all)""".stripMargin
    (((base +: fwd) :+ dDeep) ++ bwd :+ alld).mkString(",\n")
  }

  /** Generated CTE chain for q288: the exact relevance shortlist, the
    * shortlist pairwise-sim table, then k unrolled greedy MMR rounds —
    * every round the UNIFORM score shape `0.5·rel − 0.5·coalesce(maxsim,
    * 0.0)` (round 1's empty max coalesces to 0), argmax via (mmr DESC,
    * id) row_number. MATERIALIZED per round — the Louvain CTE-inlining
    * lesson. Replays [[graft.operators.Retrieval.mmrSelect]]. */
  private def mmrOracleCtes(k: Int): String = {
    val half = "CAST(0.5 AS DOUBLE)"
    val base =
      s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 4),
         |scored0 AS (SELECT q.query_id, e.vec_id AS id,
         |    list_inner_product(e.v, q.qv)
         |      / (sqrt(list_inner_product(e.v, e.v))
         |         * sqrt(list_inner_product(q.qv, q.qv))) AS rel
         |  FROM e CROSS JOIN q),
         |sl AS MATERIALIZED (SELECT query_id, id, rel FROM (
         |    SELECT query_id, id, rel, row_number() OVER (
         |      PARTITION BY query_id ORDER BY rel DESC, id) AS rk
         |    FROM scored0) WHERE rk <= 16),
         |sv AS MATERIALIZED (SELECT sl.query_id, sl.id, sl.rel, e.v
         |  FROM sl JOIN e ON e.vec_id = sl.id),
         |sm AS MATERIALIZED (SELECT x.query_id, x.id AS ia, y.id AS ib,
         |    list_inner_product(x.v, y.v)
         |      / (sqrt(list_inner_product(x.v, x.v))
         |         * sqrt(list_inner_product(y.v, y.v))) AS sim
         |  FROM sv x JOIN sv y
         |    ON x.query_id = y.query_id AND x.id <> y.id),
         |p1 AS MATERIALIZED (SELECT query_id, 1 AS pick, id AS doc_id, rel,
         |    $half * rel - $half * CAST(0 AS DOUBLE) AS mmr
         |  FROM (SELECT query_id, id, rel, row_number() OVER (
         |      PARTITION BY query_id ORDER BY
         |        $half * rel - $half * CAST(0 AS DOUBLE) DESC, id) AS rk
         |    FROM sl) WHERE rk = 1),
         |selall1 AS MATERIALIZED (SELECT * FROM p1)""".stripMargin
    val rounds = (2 to k).map { r =>
      s"""cand$r AS (SELECT sl.* FROM sl WHERE NOT EXISTS (
         |  SELECT 1 FROM selall${r - 1} s
         |  WHERE s.query_id = sl.query_id AND s.doc_id = sl.id)),
         |ms$r AS (SELECT sm.query_id, sm.ia AS id, max(sm.sim) AS msim
         |  FROM sm JOIN selall${r - 1} s
         |    ON s.query_id = sm.query_id AND s.doc_id = sm.ib
         |  GROUP BY 1, 2),
         |sc$r AS (SELECT c.query_id, c.id, c.rel,
         |    $half * c.rel - $half * coalesce(ms$r.msim,
         |      CAST(0 AS DOUBLE)) AS mmr
         |  FROM cand$r c LEFT JOIN ms$r
         |    ON ms$r.query_id = c.query_id AND ms$r.id = c.id),
         |p$r AS MATERIALIZED (SELECT query_id, $r AS pick, id AS doc_id,
         |    rel, mmr
         |  FROM (SELECT query_id, id, rel, mmr, row_number() OVER (
         |      PARTITION BY query_id ORDER BY mmr DESC, id) AS rk
         |    FROM sc$r) WHERE rk = 1),
         |selall$r AS MATERIALIZED (
         |  SELECT * FROM selall${r - 1} UNION ALL SELECT * FROM p$r)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** Shared CTE chain for q271/q272 (+ the q271s/q272s 25% md5-sampled
    * twins and the q300 weighted form): the parts-bought-together graph
    * + TWO full Louvain levels (3 move rounds, min-member canonical
    * relabel, coarsen to the weighted community graph with self-loops,
    * 3 weighted rounds), ending at `fin` = (node, label) over original
    * part ids. Replays [[graft.operators.Graph.louvain]] exactly.
    * `weighted` = e0 carries the co-purchase COUNT as edge weight (the
    * level-1 wCol regime) instead of DISTINCT w = 1; `sampleHex` = the
    * `:osample` md5 order filter of the s-variant convention. */
  private def louvainOracleCtes: String =
    louvainGraphOracleCtes(weighted = false, sampleHex = None)

  private def louvainGraphOracleCtes(weighted: Boolean,
                                     sampleHex: Option[String]): String = {
    val sample = sampleHex.map(h =>
      s"\n|    AND md5(CAST(l_orderkey AS VARCHAR) || ':osample') < '$h'")
      .getOrElse("")
    val e0 =
      if (weighted)
        """e0 AS MATERIALIZED (SELECT a.pk AS u, b.pk AS v,
          |    CAST(count(*) AS HUGEINT) AS w
          |  FROM li a JOIN li b ON a.ok = b.ok WHERE a.pk < b.pk
          |  GROUP BY 1, 2)""".stripMargin
      else
        """e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v,
          |    CAST(1 AS HUGEINT) AS w
          |  FROM li a JOIN li b ON a.ok = b.ok WHERE a.pk < b.pk)"""
          .stripMargin
    s"""li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |  FROM lineitem WHERE l_orderkey % 20 = 0$sample),
       |$e0,
       |sym1 AS MATERIALIZED (SELECT u AS a, v AS b, w FROM e0
       |  UNION ALL SELECT v AS a, u AS b, w FROM e0),
       |deg1 AS MATERIALIZED (SELECT a AS node, sum(w) AS k
       |  FROM sym1 GROUP BY 1),
       |mm AS (SELECT coalesce(sum(k), 0) AS m2 FROM deg1),
       |lA0 AS MATERIALIZED (SELECT node, node AS label FROM deg1),
       |${louvainRoundCtes("A", "sym1", "deg1", 3)},
       |cnA AS (SELECT label, min(node) AS c FROM lA3 GROUP BY 1),
       |m1 AS MATERIALIZED (SELECT l.node, cnA.c AS c1
       |  FROM lA3 l JOIN cnA ON cnA.label = l.label),
       |ce AS MATERIALIZED (SELECT least(mu.c1, mv.c1) AS u,
       |    greatest(mu.c1, mv.c1) AS v, CAST(sum(e0.w) AS HUGEINT) AS w
       |  FROM e0 JOIN m1 mu ON mu.node = e0.u
       |  JOIN m1 mv ON mv.node = e0.v GROUP BY 1, 2),
       |sym2 AS MATERIALIZED (SELECT u AS a, v AS b, w FROM ce WHERE u <> v
       |  UNION ALL SELECT v AS a, u AS b, w FROM ce WHERE u <> v),
       |deg2 AS MATERIALIZED (SELECT node, sum(w) AS k FROM (
       |    SELECT a AS node, w FROM sym2
       |    UNION ALL SELECT u AS node, 2 * w AS w FROM ce WHERE u = v)
       |  GROUP BY 1),
       |lB0 AS MATERIALIZED (SELECT node, node AS label FROM deg2),
       |${louvainRoundCtes("B", "sym2", "deg2", 3)},
       |cnB AS (SELECT label, min(node) AS c FROM lB3 GROUP BY 1),
       |fin AS MATERIALIZED (SELECT m1.node, cnB.c AS label
       |  FROM m1 JOIN lB3 l ON l.node = m1.c1
       |  JOIN cnB ON cnB.label = l.label)""".stripMargin
  }

  /** q272 tail (shared with q272s and, weighted, q305): exact Q·4m²
    * fold over `fin`'s partition. Unweighted: deg1 is plain degree and
    * intra/m are edge counts (level-1 weights all 1 in those gates).
    * Weighted: intra/W sum e0's weight column (deg1 is ALREADY the
    * weighted degree in the weighted CTE chain), and the total surfaces
    * as `w_total` to match [[graft.operators.Graph.modularityWeighted]]. */
  private def louvainModularityTailSql: String =
    louvainModularityTailSqlW(weighted = false)

  private def louvainModularityTailSqlW(weighted: Boolean): String = {
    val intraExpr =
      if (weighted) "CAST(CAST(sum(e0.w) AS HUGEINT) AS BIGINT)"
      else "CAST(count(*) AS BIGINT)"
    val mExpr =
      if (weighted) "CAST(CAST(coalesce(sum(w), 0) AS HUGEINT) AS BIGINT)"
      else "CAST(count(*) AS BIGINT)"
    val mAlias = if (weighted) "w_total" else "m_edges"
    s"""degc AS (SELECT l.label AS lb,
      |    CAST(CAST(sum(deg1.k) AS HUGEINT) AS BIGINT) AS dc,
      |    CAST(count(*) AS BIGINT) AS nc
      |  FROM deg1 JOIN fin l ON l.node = deg1.node GROUP BY 1),
      |intra AS (SELECT lu.label AS lb, $intraExpr AS ec
      |  FROM e0 JOIN fin lu ON lu.node = e0.u
      |  JOIN fin lv ON lv.node = e0.v
      |  WHERE lu.label = lv.label GROUP BY 1),
      |emm AS (SELECT $mExpr AS m FROM e0),
      |per AS (SELECT degc.lb, degc.nc, degc.dc,
      |    coalesce(intra.ec, 0) AS ec
      |  FROM degc LEFT JOIN intra ON intra.lb = degc.lb),
      |f AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
      |    CAST(sum(nc) AS BIGINT) AS n_nodes,
      |    list(ec ORDER BY lb) AS lec, list(dc ORDER BY lb) AS ldc
      |  FROM per)
      |SELECT f.n_nodes, emm.m AS $mAlias, f.n_communities,
      |  CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |    list_transform(generate_series(1, len(f.lec)), i ->
      |      CAST(4 AS HUGEINT) * emm.m * f.lec[i]
      |        - CAST(f.ldc[i] AS HUGEINT) * f.ldc[i])),
      |    (x, y) -> x + y) AS BIGINT) AS q_num_e,
      |  CASE WHEN emm.m = 0 THEN NULL
      |    ELSE CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(generate_series(1, len(f.lec)), i ->
      |        CAST(4 AS HUGEINT) * emm.m * f.lec[i]
      |          - CAST(f.ldc[i] AS HUGEINT) * f.ldc[i])),
      |      (x, y) -> x + y) AS DOUBLE)
      |      / (CAST(4 AS DOUBLE) * CAST(emm.m AS DOUBLE)
      |         * CAST(emm.m AS DOUBLE))
      |  END AS modularity
      |FROM f CROSS JOIN emm""".stripMargin
  }

  def oracleSql: Map[String, String] = oracleSqlBase ++ Map(
    // q236: q206's oracle VERBATIM (shared by reference, not copy) — the
    // bucketed journey split must reproduce the plain-window attribution
    // integer-for-integer
    "q236_markov_attribution_bucketed" ->
      oracleSqlBase("q206_markov_attribution"),
    // q299: full-probe IVFADC must reproduce q283's brute-force oracle
    // VERBATIM — same regime, same SQL
    "q299_ann_ivfpq" -> oracleSqlBase("q283_ann_pq"),
    // q301: the crash-and-restart run must land on the SAME final lake
    // state as q274's crash-free run — greatest version per key,
    // regardless of the batch split or the replayed batch
    "q301_cdc_restart_recovery" -> oracleSqlBase("q274_cdc_upsert_stream"),
    // q302: a split refines the partition without touching posting
    // content — full probe must still be q273's whole-corpus brute force
    "q302_ann_ivf_cell_split" -> oracleSqlBase("q273_ann_ivf_upsert"),
    // q310: merge re-homes postings without touching content — the
    // full-probe serve is the same whole-corpus brute force
    "q310_ann_ivf_cell_merge" -> oracleSqlBase("q273_ann_ivf_upsert"),
    "q311_unigram_vocab" -> unigramOracle(maxLen = 4, seedTopK = 48,
      keepMulti = 24, maxWordLen = 12),
    // q303: time-disjoint halves make the two-run arrival order equal
    // the global (ts, state) order — q238's matrix verbatim; boundary
    // pairs exist only if the state store recovered across the restart
    "q303_transition_stream_restart" -> oracleSqlBase("q238_transition_stream"),
    // q304: the persisted IVFADC at full probe — q283's brute-force
    // oracle verbatim (parquet round-trips doubles bit-exactly)
    "q304_ann_ivfpq_persisted" -> oracleSqlBase("q283_ann_pq"),
    // q305: the weighted chain + the weighted Q tail (intra/W sum e0.w;
    // deg1 is already the weighted degree in that chain)
    "q305_louvain_weighted_modularity" ->
      s"""WITH ${louvainGraphOracleCtes(weighted = true, sampleHex = None)},
         |${louvainModularityTailSqlW(weighted = true)}""".stripMargin,
    // q306/q306s: q270's join LEFT OUTER — unmatched views carry NULL
    // right side; the integer-seconds delay is NULL exactly there
    "q306_interval_join_outer_stream" -> outerIntervalJoinOracle(""),
    // q309: the restart is orchestration, not semantics — recovered join
    // state must reproduce the batch LEFT JOIN verbatim
    "q309_interval_join_restart" -> outerIntervalJoinOracle(""),
    "q306s_interval_join_outer_sampled" -> outerIntervalJoinOracle(
      "\n    AND md5(CAST(user_id AS VARCHAR) || ':osample') < '40'"),
    // q300s/q305s: the weighted chain over the 25% order sample
    "q300s_louvain_weighted_sampled" ->
      s"""WITH ${louvainGraphOracleCtes(weighted = true, sampleHex = Some("40"))}
         |SELECT node, label FROM fin ORDER BY node""".stripMargin,
    "q305s_louvain_weighted_modularity_sampled" ->
      s"""WITH ${louvainGraphOracleCtes(weighted = true, sampleHex = Some("40"))},
         |${louvainModularityTailSqlW(weighted = true)}""".stripMargin,
    // q308: q242's seed-gated rounds with q307's weighted shares
    "q308_ppr_weighted" -> {
      val S = graft.operators.Graph.RankScale
      val rounds = (1 to 3).map { i =>
        val prev = if (i == 1) "r0" else s"r${i - 1}"
        s"""i$i AS (SELECT e.d AS node,
           |    CAST(sum((CAST(r._r AS HUGEINT) * e.w) // o.od) AS BIGINT)
           |      AS infl
           |  FROM e JOIN $prev r ON r.node = e.s JOIN od o ON o.s = e.s
           |  GROUP BY e.d),
           |g$i AS (SELECT CAST(coalesce(sum(r._r), 0) AS BIGINT) AS dmass
           |  FROM $prev r LEFT JOIN od o ON o.s = r.node WHERE o.s IS NULL),
           |r$i AS (SELECT nd.node,
           |    CAST((CASE WHEN nd.isseed THEN (15 * $S) // (100 * sn.sc)
           |        ELSE 0 END)
           |      + (85 * (coalesce(i.infl, 0)
           |        + CASE WHEN nd.isseed THEN g.dmass // sn.sc
           |          ELSE 0 END)) // 100
           |      AS BIGINT) AS _r
           |  FROM nodes nd CROSS JOIN sn CROSS JOIN g$i g
           |  LEFT JOIN i$i i ON i.node = nd.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
         |  FROM lineitem WHERE l_orderkey % 20 = 0),
         |e AS (SELECT a.sk AS s, b.sk AS d, CAST(count(*) AS HUGEINT) AS w
         |  FROM li a JOIN li b ON a.ok = b.ok WHERE a.sk <> b.sk
         |  GROUP BY 1, 2),
         |sd AS (SELECT DISTINCT sk AS node FROM li WHERE sk % 10 = 0),
         |nodes AS (SELECT n.node,
         |    (sd.node IS NOT NULL) AS isseed
         |  FROM (SELECT s AS node FROM e UNION SELECT d FROM e
         |    UNION SELECT node FROM sd) n
         |  LEFT JOIN sd ON sd.node = n.node),
         |sn AS (SELECT CAST(count(*) AS BIGINT) AS sc FROM sd),
         |od AS (SELECT s, CAST(sum(w) AS HUGEINT) AS od FROM e GROUP BY s),
         |r0 AS (SELECT node, CAST(CASE WHEN isseed THEN $S // sn.sc
         |    ELSE 0 END AS BIGINT) AS _r
         |  FROM nodes CROSS JOIN sn),
         |$rounds
         |SELECT node, r._r AS rank_e12,
         |  CAST(r._r AS DOUBLE) / 1e12 AS ppr
         |FROM r3 r ORDER BY node""".stripMargin
    },
    // q307: q190's round chain with weighted shares — e carries the
    // shared-order count, od = Σ out-weight, share = (r·w) // od in
    // HUGEINT (operands non-negative, so // ≡ div)
    "q307_pagerank_weighted" -> {
      val S = graft.operators.Graph.RankScale
      val rounds = (1 to 3).map { i =>
        val prev = if (i == 1) "r0" else s"r${i - 1}"
        s"""i$i AS (SELECT e.d AS node,
           |    CAST(sum((CAST(r._r AS HUGEINT) * e.w) // o.od) AS BIGINT)
           |      AS infl
           |  FROM e JOIN $prev r ON r.node = e.s JOIN od o ON o.s = e.s
           |  GROUP BY e.d),
           |g$i AS (SELECT CAST(coalesce(sum(r._r), 0) AS BIGINT) AS dmass
           |  FROM $prev r LEFT JOIN od o ON o.s = r.node WHERE o.s IS NULL),
           |r$i AS (SELECT nd.node,
           |    CAST((15 * $S) // (100 * nn.n)
           |      + (85 * (coalesce(i.infl, 0) + g.dmass // nn.n)) // 100
           |      AS BIGINT) AS _r
           |  FROM nodes nd CROSS JOIN nn CROSS JOIN g$i g
           |  LEFT JOIN i$i i ON i.node = nd.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
         |  FROM lineitem WHERE l_orderkey % 20 = 0),
         |e AS (SELECT a.sk AS s, b.sk AS d, CAST(count(*) AS HUGEINT) AS w
         |  FROM li a JOIN li b ON a.ok = b.ok WHERE a.sk <> b.sk
         |  GROUP BY 1, 2),
         |nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |od AS (SELECT s, CAST(sum(w) AS HUGEINT) AS od FROM e GROUP BY s),
         |r0 AS (SELECT node, CAST($S // nn.n AS BIGINT) AS _r
         |  FROM nodes CROSS JOIN nn),
         |$rounds
         |SELECT node, r._r AS rank_e12,
         |  CAST(r._r AS DOUBLE) / 1e12 AS pagerank
         |FROM r3 r ORDER BY node""".stripMargin
    }
  )

  private def outerIntervalJoinOracle(sample: String): String =
    s"""WITH v AS (SELECT user_id AS u, ts AS lt FROM events
      |  WHERE event_type = 'view' AND user_id IS NOT NULL
      |    AND ts IS NOT NULL$sample),
      |p AS (SELECT user_id AS u, ts AS rt FROM events
      |  WHERE event_type = 'purchase' AND user_id IS NOT NULL
      |    AND ts IS NOT NULL$sample)
      |SELECT v.u AS user_id, v.lt AS left_ts, p.rt AS right_ts,
      |  epoch_us(p.rt) // 1000000 - epoch_us(v.lt) // 1000000
      |    AS delay_sec
      |FROM v LEFT JOIN p ON p.u = v.u AND p.rt >= v.lt
      |  AND p.rt <= v.lt + INTERVAL 3600 SECOND
      |ORDER BY 1, 2, 3""".stripMargin

  private def oracleSqlBase: Map[String, String] = Map(
    "q01_silver_transform" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
        |l_extendedprice * (1 - l_discount) AS net_price, l_returnflag
        |FROM lineitem
        |WHERE l_quantity IS NOT NULL AND l_shipdate >= TIMESTAMP '1998-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_gold_agg" ->
      """SELECT l_returnflag, l_linestatus, avg(l_quantity) AS avg_qty,
        |max(l_extendedprice) AS max_price,
        |min(l_extendedprice) AS min_price, count(*) AS record_count
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_distinct_partitions" ->
      """SELECT DISTINCT l_returnflag, CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem ORDER BY l_returnflag, ship_date""".stripMargin,
    "q04_point_lookup" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND CAST(l_shipdate AS DATE) = DATE '1997-03-15'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q06_scalar_count" ->
      "SELECT count(*) AS n FROM lineitem WHERE l_quantity IS NOT NULL",
    "q07_upsert_dedupe" ->
      """SELECT layer, city, date, processed_mark, o_orderkey FROM (
        |  SELECT 'gold' AS layer, o_orderpriority AS city,
        |         CAST(o_orderdate AS DATE) AS date, o_totalprice AS processed_mark,
        |         o_orderkey,
        |         row_number() OVER (PARTITION BY o_orderpriority, CAST(o_orderdate AS DATE)
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY city, date""".stripMargin,
    "q08_incremental_diff" ->
      """WITH avail AS (SELECT DISTINCT o_orderpriority AS priority,
        |    CAST(o_orderdate AS DATE) AS d FROM orders),
        |done AS (SELECT DISTINCT o_orderpriority AS priority,
        |    CAST(o_orderdate AS DATE) AS d FROM orders
        |    WHERE o_orderstatus = 'P')
        |SELECT a.priority, a.d FROM avail a
        |WHERE NOT EXISTS (SELECT 1 FROM done x WHERE x.priority = a.priority AND x.d = a.d)
        |ORDER BY priority, d""".stripMargin,
    "q09_timestamp_parse" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M') AS ts_str,
        |strptime(strftime(ts, '%Y-%m-%dT%H:%M'), '%Y-%m-%dT%H:%M') AS parsed
        |FROM events ORDER BY event_id""".stripMargin,
    "q10_json_flatten" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q11_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |ORDER BY o_orderkey""".stripMargin,
    "q12_broadcast_join_agg" ->
      """SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q13_multi_join" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q14_window_topk" ->
      """SELECT o_orderpriority, CAST(rank AS INTEGER) AS rank, o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |      row_number() OVER (PARTITION BY o_orderpriority
        |                         ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |      FROM orders)
        |WHERE rank <= 5 ORDER BY o_orderpriority, rank""".stripMargin,
    "q15_running_sum" ->
      """SELECT user_id, event_id,
        |round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |  AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q16_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR CAST(floor(epoch(ts)) AS BIGINT)
        |            - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id,
        |       CAST(min(ts) AS TIMESTAMP) AS session_start,
        |       CAST(max(ts) AS TIMESTAMP) AS session_end,
        |       count(*) AS n_events, round(sum(value), 4) AS value_sum
        |FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "q17_token_stats" ->
      """WITH tok AS (SELECT lang,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tok
        |  FROM documents)
        |SELECT lang, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |       avg(n_tok) AS avg_tokens, count(*) AS n_docs
        |FROM tok GROUP BY lang ORDER BY lang""".stripMargin,
    "q18_text_quality" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        |    CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INTEGER)
        |      AS n_punct,
        |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      w -> w IN ('the','a','an','and','or','of','to','in','is','on'))) AS INTEGER)
        |      AS n_stop,
        |    CAST(length(text) AS INTEGER) AS n_chars_raw
        |  FROM documents)
        |SELECT doc_id, n_tokens, n_punct, n_stop,
        |  least(greatest(
        |    least(CAST(n_tokens AS DOUBLE) / CAST(50.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
        |    + least((CAST(n_stop AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
        |    + (CAST(1.0 AS DOUBLE) - least((CAST(n_punct AS DOUBLE) / greatest(CAST(n_chars_raw AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
        |    CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)) AS quality
        |FROM base ORDER BY doc_id""".stripMargin,
    "q19_lang_guess" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    (CASE WHEN contains(' ' || lower(text) || ' ', ' the ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' and ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' of ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' is ') THEN 1 ELSE 0 END) AS en,
        |    (CASE WHEN contains(' ' || lower(text) || ' ', ' der ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' und ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' die ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' nicht ') THEN 1 ELSE 0 END) AS de,
        |    (CASE WHEN contains(' ' || lower(text) || ' ', ' el ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' que ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' los ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' una ') THEN 1 ELSE 0 END) AS es,
        |    (CASE WHEN contains(' ' || lower(text) || ' ', ' le ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' et ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' les ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' une ') THEN 1 ELSE 0 END) AS fr,
        |    (CASE WHEN length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) > 0
        |          THEN 10 ELSE 0 END) AS zh
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN zh >= greatest(en, de, es, fr) THEN 'zh'
        |       WHEN en >= greatest(de, es, fr) THEN 'en'
        |       WHEN de >= greatest(es, fr) THEN 'de'
        |       WHEN es >= fr THEN 'es'
        |       ELSE 'fr' END AS lang_guess
        |FROM scored ORDER BY doc_id""".stripMargin,
    "q20_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(string_split(
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |         ' +', ' ', 'g')), ' '))), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q21_dedup_exact" ->
      """SELECT md5(text) AS text_hash, count(*) AS dup_count, min(doc_id) AS keep_id
        |FROM documents GROUP BY md5(text) ORDER BY text_hash""".stripMargin,
    "q22_dedup_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |         ' +', ' ', 'g')), ' '))), ' ')) AS fp,
        |  count(*) AS dup_count, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "q23_blocked_jaccard" ->
      """WITH b AS (SELECT doc_id, text, lang,
        |    CAST(floor(n_chars / 64.0) AS BIGINT) AS blk_len FROM documents)
        |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
        |       jaccard(a.text, c.text) AS jac
        |FROM b a JOIN b c ON a.lang = c.lang AND a.blk_len = c.blk_len
        |                  AND a.doc_id < c.doc_id
        |WHERE jaccard(a.text, c.text) >= CAST(0.8 AS DOUBLE)
        |ORDER BY id_a, id_b""".stripMargin,
    "q26_embedding_norms" ->
      """SELECT vec_id,
        |  sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
        |                          CAST(embedding AS DOUBLE[]))) AS norm,
        |  CAST(len(embedding) AS INTEGER) AS dim
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q27_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_inner_product(e.v, q.qv)
        |      / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(q.qv, q.qv)))
        |      AS score
        |  FROM e CROSS JOIN q),
        |ranked AS (SELECT query_id, neighbor_id, score,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, score
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // q288: the generated round-for-round MMR replay (see mmrOracleCtes)
    "q288_mmr_diversify" ->
      s"""WITH ${mmrOracleCtes(5)}
         |SELECT query_id, CAST(pick AS INTEGER) AS pick, doc_id, rel, mmr
         |FROM selall5 ORDER BY query_id, pick""".stripMargin,
    // blocked near-dup on the copy-planted corpus: the only pairs at or
    // above 0.999 are each vector and its planted identical copy, whose
    // score is the self-cosine in closed form (same expression tree as the
    // Spark side ⇒ bit-identical doubles)
    "q24_minhash_pairs" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |  CAST(1.0 AS DOUBLE) AS est_jaccard,
        |  TRUE AS ordered_ok, TRUE AS est_in_range, TRUE AS no_dup_pairs
        |FROM documents ORDER BY id_a""".stripMargin,
    "q25_simhash" ->
      """SELECT doc_id, TRUE AS triple_invariant, TRUE AS order_invariant,
        |  CAST(0 AS INTEGER) AS ham_triple
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q28_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
        |  list_inner_product(v, v)
        |    / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(v, v)))
        |    AS score
        |FROM e ORDER BY id_a""".stripMargin,
    "q29_ann_lsh" ->
      """WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT vec_id AS query_id,
        |        list_inner_product(v, v)
        |          / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(v, v)))
        |          AS score
        |      FROM q),
        |r AS (SELECT query_id, score, unnest(generate_series(1, 10)) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank,
        |  CASE WHEN rank = 1 THEN query_id
        |       ELSE query_id + (rank - 1) * 100000 END AS neighbor_id,
        |  score
        |FROM r ORDER BY query_id, rank""".stripMargin,
    // identical closed form to q29: multiprobe only widens the candidate
    // set with strictly lower-scoring natural rows, so the planted top-10
    // per query is unchanged
    "q75_ann_multiprobe" ->
      """WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT vec_id AS query_id,
        |        list_inner_product(v, v)
        |          / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(v, v)))
        |          AS score
        |      FROM q),
        |r AS (SELECT query_id, score, unnest(generate_series(1, 10)) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank,
        |  CASE WHEN rank = 1 THEN query_id
        |       ELSE query_id + (rank - 1) * 100000 END AS neighbor_id,
        |  score
        |FROM r ORDER BY query_id, rank""".stripMargin,
    // planted-copy closed form: every row's keep_id is the original vec_id
    "q77_semantic_dedup" ->
      """WITH c AS (SELECT vec_id FROM embeddings
        |  UNION ALL SELECT vec_id + 1000000 FROM embeddings)
        |SELECT vec_id AS id,
        |  CASE WHEN vec_id >= 1000000 THEN vec_id - 1000000
        |       ELSE vec_id END AS keep_id
        |FROM c ORDER BY id""".stripMargin,
    // chunkTokens = 64, overlap = 16 -> stride 48; list_slice is 1-based
    // inclusive, matching Spark's slice(start, length) truncation
    "q76_chunk_windows" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
        |c AS (SELECT doc_id, toks, n,
        |    CASE WHEN n <= 64 THEN 1
        |         ELSE CAST(ceil((n - 64) / 48.0) AS BIGINT) + 1 END AS n_chunks
        |  FROM n),
        |u AS (SELECT doc_id, toks, n,
        |    unnest(generate_series(0, n_chunks - 1)) AS chunk_id FROM c)
        |SELECT doc_id, chunk_id, chunk_id * 48 + 1 AS chunk_start,
        |  CAST(least(64, n - (chunk_id * 48 + 1) + 1) AS INTEGER) AS n_tokens,
        |  array_to_string(list_slice(toks, chunk_id * 48 + 1,
        |    least(chunk_id * 48 + 64, n)), ' ') AS chunk_text
        |FROM u ORDER BY doc_id, chunk_id""".stripMargin,
    // the window formulation the heap aggregate must reproduce
    "q78_group_topk" ->
      """SELECT lang, CAST(rn AS INTEGER) AS rnk, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) WHERE rn <= 5 ORDER BY lang, rnk""".stripMargin,
    // identical int64 selection rule over the identical md5-hash order;
    // // is DuckDB's integer floor division (Spark side uses `div`)
    "q79_pps_sample" ->
      """WITH w AS (SELECT doc_id, lang, n_chars,
        |    substr(md5(CAST(doc_id AS VARCHAR) || ':pps'), 1, 8) AS h
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |c AS (SELECT doc_id, lang, n_chars,
        |    sum(n_chars) OVER (PARTITION BY lang ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(n_chars) OVER (PARTITION BY lang) AS tot FROM w)
        |SELECT doc_id, lang, n_chars FROM c
        |WHERE (cum * 40) // tot > ((cum - n_chars) * 40) // tot
        |ORDER BY doc_id""".stripMargin,
    // identical window hashing (md5 over lowercased whitespace tokens),
    // identical >= minCount marking, identical island merge
    "q81_repeated_passages" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 8 + 1)) AS p
        |  FROM toks WHERE len(t) >= 8),
        |h AS (SELECT doc_id, p, md5(array_to_string(list_slice(t, p, p + 7), ' ')) AS wh
        |  FROM pos),
        |rep AS (SELECT wh FROM h GROUP BY wh HAVING count(*) >= 2),
        |m AS (SELECT doc_id, p FROM h WHERE wh IN (SELECT wh FROM rep)),
        |i AS (SELECT doc_id, p,
        |    CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 8
        |         THEN 0 ELSE 1 END AS brk FROM m),
        |g AS (SELECT doc_id, p, sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS grp
        |  FROM i)
        |SELECT doc_id, min(p) AS span_start, max(p) + 7 AS span_end,
        |  count(*) AS n_windows
        |FROM g GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin,
    // the bloom prefilter is invisible to the result: plain anti-join
    "q80_bloom_anti" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > DATE '1997-06-01')
        |ORDER BY o_orderkey""".stripMargin,
    "q30_event_window_agg" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |count(*) AS n_events, round(sum(value), 4) AS value_sum,
        |round(sum(value), 4) / count(*) AS value_avg
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q31_multimodal_features" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |CAST(strlen(text) % 64 + 1 AS INTEGER) AS width,
        |CAST(ascii(substring(text, 1, 1)) % 64 + 1 AS INTEGER) AS height,
        |CAST(strlen(text) % 3 + 1 AS INTEGER) AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q32_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, gid""".stripMargin,
    "q33_setops" ->
      """WITH c AS (SELECT c_custkey AS k FROM customer),
        |o AS (SELECT o_custkey AS k FROM orders),
        |e AS (SELECT k FROM c EXCEPT SELECT k FROM o),
        |i AS (SELECT k FROM c INTERSECT SELECT k FROM o)
        |SELECT 'customer_only' AS tag, k FROM e
        |UNION ALL
        |SELECT 'both' AS tag, k FROM i
        |ORDER BY tag, k""".stripMargin,
    "q34_correlated_subquery" ->
      """SELECT c_custkey, c_acctbal,
        |  (SELECT round(sum(o_totalprice), 2) FROM orders
        |   WHERE o_custkey = c_custkey) AS order_total
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q35_topn" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q36_conditional_pivot" ->
      """SELECT l_returnflag,
        |  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE CAST(0.0 AS DOUBLE) END) AS qty_f,
        |  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE CAST(0.0 AS DOUBLE) END) AS qty_o,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q37_scalar_funcs" ->
      """SELECT o_orderkey,
        |  upper(substring(o_orderpriority, 1, 6)) AS prio_u,
        |  CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
        |  translate(o_orderpriority, '-', '_') AS prio_t,
        |  lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_pad,
        |  reverse(o_orderstatus) AS status_r,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q38_asof_join" ->
      """WITH p AS (SELECT user_id, ts, max(value) AS p_value
        |           FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT e.event_id, e.user_id,
        |       CAST(p.ts AS TIMESTAMP) AS prev_purchase_ts, p.p_value
        |FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "q39_tfidf_top_terms" ->
      """WITH toks AS (SELECT lang, doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term FROM documents),
        |tf AS (SELECT lang, term, count(*) AS tf FROM toks GROUP BY lang, term),
        |dfreq AS (SELECT term, count(*) AS df
        |          FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (SELECT lang, term, tf, df,
        |    CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (SELECT lang, term, tf, df, score,
        |    row_number() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rank
        |  FROM scored)
        |SELECT lang, CAST(rank AS INTEGER) AS rank, term, tf, df, score
        |FROM ranked WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,
    "q40_profile" ->
      """WITH s AS (
        |  SELECT 'l_quantity' AS col_name, count(*) AS n,
        |    count(CASE WHEN l_quantity IS NULL THEN 1 END) AS n_null,
        |    count(DISTINCT l_quantity) AS n_distinct,
        |    CAST(min(l_quantity) AS DOUBLE) AS min_v, CAST(max(l_quantity) AS DOUBLE) AS max_v,
        |    round(sum(l_quantity), 2) AS sum_v FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', count(*),
        |    count(CASE WHEN l_extendedprice IS NULL THEN 1 END),
        |    count(DISTINCT l_extendedprice),
        |    CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE),
        |    round(sum(l_extendedprice), 2) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', count(*),
        |    count(CASE WHEN l_discount IS NULL THEN 1 END),
        |    count(DISTINCT l_discount),
        |    CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE),
        |    round(sum(l_discount), 2) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', count(*),
        |    count(CASE WHEN l_tax IS NULL THEN 1 END),
        |    count(DISTINCT l_tax),
        |    CAST(min(l_tax) AS DOUBLE), CAST(max(l_tax) AS DOUBLE),
        |    round(sum(l_tax), 2) FROM lineitem)
        |SELECT col_name, n, n_null, n_distinct, min_v, max_v, sum_v,
        |       CASE WHEN n > n_null THEN sum_v / (n - n_null) END AS mean_v
        |FROM s ORDER BY col_name""".stripMargin,
    // q171: save→load→serve must reproduce q41's full-probe ≡ brute-force
    // equivalence THROUGH the partitioned on-disk index — same oracle SQL
    "q171_ann_ivf_persisted" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_inner_product(e.v, q.qv)
        |      / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(q.qv, q.qv)))
        |      AS score
        |  FROM e CROSS JOIN q),
        |ranked AS (SELECT query_id, neighbor_id, score,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, score
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // q273: the upserted index at full probe must reproduce the same
    // brute force over the whole corpus — base ∪ batch with re-ingested
    // ids deduplicated is exactly `embeddings`
    "q273_ann_ivf_upsert" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_inner_product(e.v, q.qv)
        |      / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(q.qv, q.qv)))
        |      AS score
        |  FROM e CROSS JOIN q),
        |ranked AS (SELECT query_id, neighbor_id, score,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, score
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // full-probe IVF == exact brute force (same SQL as q27's oracle)
    "q41_ann_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_inner_product(e.v, q.qv)
        |      / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(q.qv, q.qv)))
        |      AS score
        |  FROM e CROSS JOIN q),
        |ranked AS (SELECT query_id, neighbor_id, score,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, score
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // tripled synthetic-text corpus collapses back to exactly the original
    // table (same construction argument as q53, but the pairs come from the
    // real minhash pipeline instead of being synthesized)
    "q45_dup_clusters" ->
      "SELECT doc_id, lang FROM documents ORDER BY doc_id",
    "q42_bigram_counts" ->
      """WITH arr AS (SELECT regexp_split_to_array(trim(text), '\s+') AS a FROM documents),
        |pairs AS (SELECT unnest(list_zip(a, a[2:])) AS p FROM arr),
        |big AS (SELECT p[1] AS term, p[2] AS next FROM pairs WHERE p[2] IS NOT NULL)
        |SELECT term, next, count(*) AS n FROM big GROUP BY term, next
        |ORDER BY n DESC, term, next LIMIT 20""".stripMargin,
    "q43_quantiles" ->
      """SELECT round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |round(quantile_cont(l_quantity, 0.5), 4) AS qty_median
        |FROM lineitem""".stripMargin,
    "q44_hash_split" ->
      """SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8) < 'e6666666'
        |            THEN 'train' ELSE 'val' END AS split,
        |       lang, count(*) AS n_docs
        |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,
    "q46_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, gid""".stripMargin,
    "q47_window_funcs" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q48_string_agg" ->
      """SELECT l_returnflag,
        |  string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q49_approx_agg" ->
      """SELECT count(DISTINCT user_id) AS exact_users,
        |  TRUE AS approx_users_ok,
        |  round(quantile_cont(value, 0.5), 4) AS median_val,
        |  TRUE AS approx_median_ok
        |FROM events""".stripMargin,
    "q50_range_join" ->
      """SELECT a.event_id, count(b.event_id) AS n_prior
        |FROM events a LEFT JOIN events b
        |  ON a.user_id = b.user_id AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts < a.ts
        |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin,
    "q51_resample_ffill" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        |         FROM span)
        |SELECT g.user_id, g.day,
        |  last_value(d.v IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
        |FROM grid g LEFT JOIN daily d USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,
    "q52_stratified_cap" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY substring(md5(CAST(doc_id AS VARCHAR) || ':cap'), 1, 8), doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 50 ORDER BY lang, doc_id""".stripMargin,
    // chain dedup over the tripled corpus collapses every cluster back to
    // its original min-id row — the survivor set IS the documents table
    "q53_dedup_resolve" ->
      "SELECT doc_id, lang FROM documents ORDER BY doc_id",
    "q54_overlap_join" ->
      """SELECT a.event_id, count(*) AS n_overlap
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        |  AND a.ts <= b.ts + INTERVAL 30 MINUTE AND b.ts <= a.ts + INTERVAL 30 MINUTE
        |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin,
    "q55_range_frame" ->
      """SELECT event_id,
        |  count(*) OVER w AS n_trailing_hour,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_trailing_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q56_skew_join" ->
      """SELECT o.o_custkey, o.o_orderkey, o.o_totalprice, c.c_name
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    // 49-hop chains collapse to their minimum (original) ids
    "q57_chain_components" ->
      "SELECT doc_id, lang FROM documents WHERE doc_id < 100 ORDER BY doc_id",
    // bucketed sessionizer: q16's oracle verbatim — the pre-split must be
    // invisible in the result
    "q58_sessionize_bucketed" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR CAST(floor(epoch(ts)) AS BIGINT)
        |            - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id,
        |       CAST(min(ts) AS TIMESTAMP) AS session_start,
        |       CAST(max(ts) AS TIMESTAMP) AS session_end,
        |       count(*) AS n_events, round(sum(value), 4) AS value_sum
        |FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    // chunked forward fill: q51's oracle verbatim
    "q59_resample_bucketed" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        |         FROM span)
        |SELECT g.user_id, g.day,
        |  last_value(d.v IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
        |FROM grid g LEFT JOIN daily d USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,
    // the planted PII is the ONLY redactable content, so the expected
    // output is the text plus literal tags — the oracle never runs a regex
    "q60_redact_pii" ->
      """SELECT doc_id, text || ' mail <EMAIL> ip <IP> tel <PHONE>' AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q61_dup_token_ratio" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |    AS n_distinct_tokens,
        |  CAST(1 AS DOUBLE)
        |    - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS dup_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q62_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(t) - 2, 0)),
        |      i -> array_to_string(t[i:i+2], ' '))) AS grams
        |  FROM toks),
        |bench AS (
        |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE source = 'src0'),
        |docs AS (SELECT doc_id, grams FROM g WHERE source <> 'src0'),
        |hits AS (
        |  SELECT doc_id, count(*) AS n
        |  FROM (SELECT doc_id, unnest(grams) AS gram FROM docs) e
        |  JOIN bench USING (gram) GROUP BY 1)
        |SELECT d.doc_id, CAST(len(d.grams) AS BIGINT) AS n_grams,
        |  CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
        |  coalesce(h.n, 0) > 0 AS contaminated
        |FROM docs d LEFT JOIN hits h USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q63_df_scrub" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tot AS (SELECT count(*) AS total FROM documents),
        |e AS (
        |  SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks
        |  FROM t),
        |e2 AS (SELECT doc_id, pos, toks[pos] AS tok FROM e),
        |df AS (SELECT tok, count(DISTINCT doc_id) AS ndocs FROM e2 GROUP BY 1),
        |scrub AS (SELECT tok FROM df, tot WHERE ndocs * 100 > 78 * total),
        |kept AS (SELECT e2.doc_id, e2.pos, e2.tok FROM e2 ANTI JOIN scrub USING (tok)),
        |agg AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS scrubbed,
        |    CAST(count(*) AS BIGINT) AS n_kept
        |  FROM kept GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.scrubbed, '') AS scrubbed,
        |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // same integer-quantized mean: floor(v*1e10 + 0.5) is pure IEEE double
    // arithmetic (bit-identical on any engine, unlike double->DECIMAL
    // conversion), summed exactly, divided identically
    "q64_label_centroids" ->
      """WITH t AS (SELECT label, embedding AS emb FROM embeddings),
        |e AS (SELECT label, unnest(generate_series(1, len(emb))) AS p, emb FROM t),
        |e2 AS (SELECT label, CAST(p - 1 AS BIGINT) AS pos,
        |         CAST(floor(CAST(emb[p] AS DOUBLE) * CAST(1e10 AS DOUBLE)
        |           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q FROM e)
        |SELECT label, pos,
        |  CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    / CAST(1e10 AS DOUBLE) AS c,
        |  CAST(count(*) AS BIGINT) AS n_vecs
        |FROM e2 GROUP BY 1, 2 ORDER BY label, pos""".stripMargin,
    "q65_fuzzy_join" ->
      """WITH b AS (SELECT doc_id, text, lang, source,
        |    CAST(floor(n_chars / 64.0) AS BIGINT) AS blk_len FROM documents)
        |SELECT l.doc_id AS id_l, r.doc_id AS id_r,
        |       jaccard(l.text, r.text) AS jac
        |FROM b l JOIN (SELECT * FROM b WHERE source = 'src1') r
        |  ON l.lang = r.lang AND l.blk_len = r.blk_len
        |WHERE jaccard(l.text, r.text) >= CAST(0.9 AS DOUBLE)
        |ORDER BY id_l, id_r""".stripMargin,
    // the recursive CTE replays the greedy fill one document per shard per
    // step: pure integer arithmetic, so it is THE packing semantics, not an
    // approximation of it
    "q66_greedy_pack" ->
      """WITH RECURSIVE d AS (
        |  SELECT source, lang, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY source, lang ORDER BY doc_id) AS rn
        |  FROM documents
        |), rec AS (
        |  SELECT source, lang, rn, doc_id, n_chars,
        |         CAST(0 AS BIGINT) AS pack_id, n_chars AS fill
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.source, d.lang, d.rn, d.doc_id, d.n_chars,
        |         CASE WHEN r.fill + d.n_chars > 2048 THEN r.pack_id + 1
        |              ELSE r.pack_id END,
        |         CASE WHEN r.fill + d.n_chars > 2048 THEN d.n_chars
        |              ELSE r.fill + d.n_chars END
        |  FROM rec r JOIN d ON d.source = r.source AND d.lang = r.lang
        |                   AND d.rn = r.rn + 1
        |)
        |SELECT doc_id, pack_id, fill - n_chars AS pack_offset, fill AS pack_fill
        |FROM rec ORDER BY doc_id""".stripMargin,
    "q74_winnowing_fp" ->
      """WITH n AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t
        |  FROM documents),
        |c AS (SELECT doc_id, list_transform(generate_series(1, len(t)),
        |        i -> CAST(unicode(t[i]) AS BIGINT)) AS cs FROM n),
        |g AS (SELECT doc_id,
        |    CASE WHEN len(cs) < 5 THEN CAST([] AS BIGINT[])
        |    ELSE list_transform(generate_series(1, len(cs) - 4),
        |      i -> (cs[i]*4362470401 + cs[i+1]*16974593 + cs[i+2]*66049
        |            + cs[i+3]*257 + cs[i+4]) % 1000000007)
        |    END AS gh FROM c),
        |w AS (SELECT doc_id,
        |    CASE WHEN len(gh) = 0 THEN CAST([] AS BIGINT[])
        |    WHEN len(gh) <= 8 THEN [list_min(gh)]
        |    ELSE list_transform(generate_series(1, len(gh) - 7),
        |      i -> list_min(gh[i:i+7]))
        |    END AS wins FROM g)
        |SELECT doc_id, unnest(list_sort(list_distinct(wins))) AS fp
        |FROM w ORDER BY doc_id, fp""".stripMargin,
    "q73_ngram_jaccard" ->
      """WITH c AS (
        |  SELECT doc_id, text, lang, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, n_chars FROM documents),
        |t AS (SELECT doc_id, lang,
        |        CAST(floor(n_chars / 64.0) AS BIGINT) AS blk,
        |        string_split(text, ' ') AS toks FROM c),
        |g AS (SELECT doc_id, lang, blk,
        |        list_distinct(list_transform(generate_series(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i + 1])) AS gr
        |      FROM t),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |        CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE)
        |          / CAST(len(list_distinct(a.gr || b.gr)) AS DOUBLE) AS jac
        |      FROM g a JOIN g b ON a.lang = b.lang AND a.blk = b.blk
        |        AND a.doc_id < b.doc_id
        |      WHERE len(list_distinct(a.gr || b.gr)) > 0)
        |SELECT id_a, id_b, jac FROM p WHERE jac >= CAST(0.5 AS DOUBLE)
        |ORDER BY id_a, id_b""".stripMargin,
    "q72_leakage_safe_split" ->
      s"""WITH c AS (
         |  SELECT doc_id + t.k * 1000000 AS doc_id, doc_id AS cluster_id
         |  FROM documents CROSS JOIN
         |    (SELECT unnest(generate_series(0, 2)) AS k) t
         |  WHERE doc_id < 200)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN substring(md5(CAST(cluster_id AS VARCHAR) || ':leak'), 1, 8)
         |         < '${Sampling.hexThreshold(0.8)}'
         |       THEN 'train' ELSE 'val' END AS split
         |FROM c ORDER BY doc_id""".stripMargin,
    "q71_ann_ivf_int8" ->
      """WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT vec_id AS query_id,
        |        list_inner_product(v, v)
        |          / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(v, v)))
        |          AS score
        |      FROM q),
        |r AS (SELECT query_id, score, unnest(generate_series(1, 10)) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank,
        |  CASE WHEN rank = 1 THEN query_id
        |       ELSE query_id + (rank - 1) * 100000 END AS neighbor_id,
        |  score
        |FROM r ORDER BY query_id, rank""".stripMargin,
    "q70_pack_corpus" ->
      """WITH RECURSIVE d AS (
        |  SELECT source, lang, doc_id, n_chars, text,
        |         row_number() OVER (PARTITION BY source, lang ORDER BY doc_id) AS rn
        |  FROM documents
        |), rec AS (
        |  SELECT source, lang, rn, doc_id, n_chars, text,
        |         CAST(0 AS BIGINT) AS pack_id, n_chars AS fill
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.source, d.lang, d.rn, d.doc_id, d.n_chars, d.text,
        |         CASE WHEN r.fill + d.n_chars > 2048 THEN r.pack_id + 1
        |              ELSE r.pack_id END,
        |         CASE WHEN r.fill + d.n_chars > 2048 THEN d.n_chars
        |              ELSE r.fill + d.n_chars END
        |  FROM rec r JOIN d ON d.source = r.source AND d.lang = r.lang
        |                   AND d.rn = r.rn + 1
        |)
        |SELECT source, lang, pack_id,
        |  string_agg(text, chr(10) ORDER BY doc_id) AS text,
        |  count(*) AS n_docs, max(fill) AS pack_fill
        |FROM rec GROUP BY 1, 2, 3 ORDER BY source, lang, pack_id""".stripMargin,
    "q67_mixture_sample" ->
      s"""SELECT doc_id, source, n_chars FROM (
         |  SELECT doc_id, source, n_chars,
         |    substring(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8) AS h
         |  FROM documents)
         |WHERE CASE source
         |  WHEN 'src0' THEN TRUE
         |  WHEN 'src1' THEN h < '${Sampling.hexThreshold(0.5)}'
         |  WHEN 'src2' THEN FALSE
         |  ELSE h < '${Sampling.hexThreshold(0.25)}' END
         |ORDER BY doc_id""".stripMargin,
    "q68_token_budget" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    coalesce(sum(n_chars) OVER (PARTITION BY source
        |      ORDER BY substring(md5(CAST(doc_id AS VARCHAR) || ':budget'), 1, 8),
        |               doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        |  FROM documents)
        |WHERE prior < 20000 ORDER BY doc_id""".stripMargin,
    // fixed-order per-row double arithmetic: the quantized integers match
    // Spark bit-exactly, so sum/min/max are stated outright
    "q69_quantize_int8" ->
      """WITH m AS (
        |  SELECT vec_id,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma,
        |    embedding AS emb
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id, ma / CAST(127.0 AS DOUBLE) AS scale,
        |    list_transform(emb, x -> CASE WHEN ma = 0 THEN 0
        |      ELSE CAST(floor(CAST(x AS DOUBLE) * CAST(127.0 AS DOUBLE) / ma
        |                      + CAST(0.5 AS DOUBLE)) AS INTEGER) END) AS qs
        |  FROM m)
        |SELECT vec_id, scale,
        |  CAST(list_sum(qs) AS BIGINT) AS q_sum,
        |  CAST(list_min(qs) AS INTEGER) AS q_min,
        |  CAST(list_max(qs) AS INTEGER) AS q_max
        |FROM q ORDER BY vec_id""".stripMargin,
    // exact token counts both sides; the sketch assertion states TRUE
    // (q49/q82's convention — the Spark side computes it for real)
    "q98_countmin" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(trim(regexp_replace(regexp_replace(
        |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS tok
        |  FROM documents)
        |SELECT tok, count(*) AS n_exact, TRUE AS cm_ok
        |FROM toks WHERE tok <> '' GROUP BY tok ORDER BY tok""".stripMargin,
    // identical byte sampling (ASCII text: char index == byte index),
    // identical integer floor mean, identical MSB-first bit layout
    "q97_phash" ->
      """WITH t AS (SELECT doc_id, text, strlen(text) AS len FROM documents),
        |p AS (SELECT doc_id, list_transform(generate_series(0, 63),
        |    i -> ascii(substr(text, CAST((i * len) // 64 AS INTEGER) + 1, 1))) AS px
        |  FROM t),
        |m AS (SELECT doc_id, px, list_sum(px) // 64 AS mean FROM p)
        |SELECT doc_id, array_to_string(list_transform(generate_series(63, 0, -1),
        |    j -> CASE WHEN px[j + 1] > mean THEN '1' ELSE '0' END), '') AS phash_bits
        |FROM m ORDER BY doc_id""".stripMargin,
    // identical ordered concatenation (double delimiters so adjacent
    // events expose a boundary to the next pattern), identical LIKEs
    // q270: the batch interval join IS the oracle — complete staged
    // input under AvailableNow must reproduce it row-for-row (same
    // multiplicities), delay in floored whole seconds both engines
    "q270_interval_join_stream" ->
      """WITH v AS (SELECT user_id AS u, ts AS lt FROM events
        |  WHERE event_type = 'view' AND user_id IS NOT NULL
        |    AND ts IS NOT NULL),
        |p AS (SELECT user_id AS u, ts AS rt FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL
        |    AND ts IS NOT NULL)
        |SELECT v.u AS user_id, v.lt AS left_ts, p.rt AS right_ts,
        |  epoch_us(p.rt) // 1000000 - epoch_us(v.lt) // 1000000
        |    AS delay_sec
        |FROM v JOIN p ON p.u = v.u AND p.rt >= v.lt
        |  AND p.rt <= v.lt + INTERVAL 3600 SECOND
        |ORDER BY 1, 2, 3""".stripMargin,
    // q253: q96's ordered-subsequence LIKE chain, but ordered by the
    // STREAM's within-batch (ts_us, event_type) contract and restricted
    // to users that reach stage >= 1 (stage-0 users never emit)
    "q253_funnel_stream" ->
      """WITH seqs AS (SELECT user_id,
        |    '|' || string_agg(event_type, '||'
        |      ORDER BY epoch_us(ts), event_type) || '|' AS seq
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND ts < TIMESTAMP '2024-01-02 00:00:00'
        |  GROUP BY user_id),
        |st AS (SELECT user_id, CAST(CASE
        |    WHEN seq LIKE '%|view|%|click|%|purchase|%' THEN 3
        |    WHEN seq LIKE '%|view|%|click|%' THEN 2
        |    WHEN seq LIKE '%|view|%' THEN 1 ELSE 0 END AS INTEGER)
        |    AS stage_reached FROM seqs)
        |SELECT user_id, stage_reached FROM st WHERE stage_reached >= 1
        |ORDER BY user_id""".stripMargin,
    "q96_funnel" ->
      """WITH seqs AS (SELECT user_id,
        |    '|' || string_agg(event_type, '||' ORDER BY ts, event_id) || '|' AS seq
        |  FROM events WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
        |  GROUP BY user_id),
        |st AS (SELECT user_id, CAST(CASE
        |    WHEN seq LIKE '%|view|%|click|%|purchase|%' THEN 3
        |    WHEN seq LIKE '%|view|%|click|%' THEN 2
        |    WHEN seq LIKE '%|view|%' THEN 1 ELSE 0 END AS INTEGER)
        |    AS stage_reached FROM seqs)
        |SELECT stage_reached, count(*) AS n_users FROM st
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q74's winnowing chain verbatim, then the identical capped-bucket
    // self-join (rank by doc_id within fingerprint, cap 256)
    "q95_winnow_overlap" ->
      """WITH n AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t
        |  FROM documents),
        |c AS (SELECT doc_id, list_transform(generate_series(1, len(t)),
        |        i -> CAST(unicode(t[i]) AS BIGINT)) AS cs FROM n),
        |g AS (SELECT doc_id,
        |    CASE WHEN len(cs) < 5 THEN CAST([] AS BIGINT[])
        |    ELSE list_transform(generate_series(1, len(cs) - 4),
        |      i -> (cs[i]*4362470401 + cs[i+1]*16974593 + cs[i+2]*66049
        |            + cs[i+3]*257 + cs[i+4]) % 1000000007)
        |    END AS gh FROM c),
        |w AS (SELECT doc_id,
        |    CASE WHEN len(gh) = 0 THEN CAST([] AS BIGINT[])
        |    WHEN len(gh) <= 8 THEN [list_min(gh)]
        |    ELSE list_transform(generate_series(1, len(gh) - 7),
        |      i -> list_min(gh[i:i+7]))
        |    END AS wins FROM g),
        |f AS (SELECT doc_id, unnest(list_sort(list_distinct(wins))) AS fp FROM w),
        |capped AS (SELECT doc_id, fp FROM (
        |  SELECT doc_id, fp,
        |    row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS r FROM f)
        |  WHERE r <= 16)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
        |FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 8
        |ORDER BY id_a, id_b""".stripMargin,
    // identical tokenization, integer tf/df/dl, the same ln argument
    // space (JVM and DuckDB ln agree bitwise over it), the same
    // fixed-order fold — BM25 constants are written as the same double
    // EXPRESSIONS Spark evaluates (1.2+1.0, not a 2.2 literal, whose
    // nearest-double rounding could differ from the computed sum)
    "q93_bm25_topk" ->
      """WITH norm AS (SELECT doc_id, string_split(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')), ' ') AS tk FROM documents),
        |tok AS (SELECT doc_id, unnest(tk) AS term FROM norm),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term <> '' GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |st AS (SELECT count(*) AS n,
        |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
        |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |qt AS (SELECT DISTINCT doc_id AS query_id, term
        |  FROM tok WHERE doc_id < 5 AND term <> ''),
        |idf AS (SELECT term,
        |    ln(CAST(1.0 AS DOUBLE) + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE)
        |      + CAST(0.5 AS DOUBLE)) / (CAST(df AS DOUBLE)
        |      + CAST(0.5 AS DOUBLE))) AS idf
        |  FROM dfr, st WHERE term IN (SELECT term FROM qt)),
        |c AS (SELECT qt.query_id, tf.doc_id, tf.term,
        |    idf.idf * (CAST(tf.tf AS DOUBLE)
        |      * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
        |    / (CAST(tf.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
        |      * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
        |        * CAST(dl.dl AS DOUBLE) / st.avgdl)) AS x
        |  FROM tf JOIN qt USING (term) JOIN idf USING (term)
        |    JOIN dl USING (doc_id), st),
        |sc AS (SELECT query_id, doc_id,
        |    list_reduce(list(x ORDER BY term), (a, b) -> a + b) AS score
        |  FROM c GROUP BY 1, 2),
        |r AS (SELECT query_id, doc_id, score, row_number() OVER (
        |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM sc)
        |SELECT query_id, CAST(rnk AS INTEGER) AS rank, doc_id,
        |  round(score, 4) AS score
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,
    // q93's BM25 chain + q27's cosine chain (queries 0..4), fused by RRF:
    // contribution 1/(60 + rank) per list, summed in list-index order via
    // list_reduce — the same fixed-order left fold as the Spark side (two
    // exact-rational terms; IEEE addition order-identical)
    "q109_rrf_fusion" ->
      """WITH norm AS (SELECT doc_id, string_split(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')), ' ') AS tk FROM documents),
        |tok AS (SELECT doc_id, unnest(tk) AS term FROM norm),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term <> '' GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |st AS (SELECT count(*) AS n,
        |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
        |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |qt AS (SELECT DISTINCT doc_id AS query_id, term
        |  FROM tok WHERE doc_id < 5 AND term <> ''),
        |idf AS (SELECT term,
        |    ln(CAST(1.0 AS DOUBLE) + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE)
        |      + CAST(0.5 AS DOUBLE)) / (CAST(df AS DOUBLE)
        |      + CAST(0.5 AS DOUBLE))) AS idf
        |  FROM dfr, st WHERE term IN (SELECT term FROM qt)),
        |c AS (SELECT qt.query_id, tf.doc_id, tf.term,
        |    idf.idf * (CAST(tf.tf AS DOUBLE)
        |      * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
        |    / (CAST(tf.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
        |      * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
        |        * CAST(dl.dl AS DOUBLE) / st.avgdl)) AS x
        |  FROM tf JOIN qt USING (term) JOIN idf USING (term)
        |    JOIN dl USING (doc_id), st),
        |sc AS (SELECT query_id, doc_id,
        |    list_reduce(list(x ORDER BY term), (a, b) -> a + b) AS score
        |  FROM c GROUP BY 1, 2),
        |lex AS (SELECT query_id, doc_id, rnk FROM (
        |    SELECT query_id, doc_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM sc)
        |  WHERE rnk <= 10),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |qe AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        |cs AS (SELECT qe.query_id, e.vec_id AS doc_id,
        |    list_inner_product(e.v, qe.qv)
        |      / (sqrt(list_inner_product(e.v, e.v))
        |         * sqrt(list_inner_product(qe.qv, qe.qv))) AS score
        |  FROM e CROSS JOIN qe),
        |sem AS (SELECT query_id, doc_id, rnk FROM (
        |    SELECT query_id, doc_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM cs)
        |  WHERE rnk <= 10),
        |u AS (
        |  SELECT query_id, doc_id, 0 AS li,
        |    CAST(1.0 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(rnk AS DOUBLE)) AS cb
        |  FROM lex
        |  UNION ALL
        |  SELECT query_id, doc_id, 1 AS li,
        |    CAST(1.0 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(rnk AS DOUBLE)) AS cb
        |  FROM sem),
        |f AS (SELECT query_id, doc_id,
        |    list_reduce(list(cb ORDER BY li), (a, b) -> a + b) AS rrf,
        |    CAST(count(*) AS INTEGER) AS n_lists
        |  FROM u GROUP BY 1, 2),
        |rk AS (SELECT query_id, doc_id, rrf, n_lists, row_number() OVER (
        |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rnk FROM f)
        |SELECT query_id, CAST(rnk AS INTEGER) AS rank, doc_id,
        |  round(rrf, 6) AS rrf_score, n_lists
        |FROM rk WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,
    "q110_snapshot_diff" ->
      """WITH o AS (SELECT doc_id,
        |    md5(coalesce(CAST(text AS VARCHAR), '')) AS old_fp FROM documents),
        |base AS (SELECT doc_id,
        |    CASE WHEN doc_id % 89 = 0 THEN upper(text) ELSE text END AS text
        |  FROM documents WHERE doc_id % 97 <> 0),
        |added AS (SELECT doc_id + 1000000 AS doc_id, text
        |  FROM documents WHERE doc_id % 101 = 0),
        |n AS (SELECT doc_id, md5(coalesce(CAST(text AS VARCHAR), '')) AS new_fp
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM added)),
        |j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, old_fp, new_fp
        |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |SELECT doc_id,
        |  CASE WHEN old_fp IS NULL THEN 'added'
        |       WHEN new_fp IS NULL THEN 'removed'
        |       WHEN old_fp = new_fp THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  old_fp, new_fp
        |FROM j ORDER BY doc_id""".stripMargin,
    // full-probe IVF ≡ brute force, so recall@10 is exactly 1.0 per query;
    // n_true replays the exact top-10 count from q27's chain
    // q156: the planted top-10 is the query + 9 copies at score 1.0 in
    // the always-probed home cell, so recall@10 is exactly 1.0 per query
    // even at nProbe=2 of 16 — the closed form needs no brute-force replay
    "q156_ann_ivf_partial_recall" ->
      """SELECT vec_id AS query_id,
        |  CAST(10 AS BIGINT) AS n_hit,
        |  CAST(10 AS BIGINT) AS n_true,
        |  CAST(1.0 AS DOUBLE) AS recall
        |FROM embeddings WHERE vec_id < 8 ORDER BY query_id""".stripMargin,
    // q157: the full brute-force different-label replay — same expression
    // tree as the Spark side (sequential list_inner_product folds, score =
    // dot/(na*nb)) ⇒ bit-identical doubles; ties on neighbor_id
    "q157_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS neighbor_label,
        |    list_inner_product(e.v, q.qv)
        |      / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(q.qv, q.qv)))
        |      AS score
        |  FROM e CROSS JOIN q WHERE e.label <> q.qlabel),
        |ranked AS (SELECT query_id, neighbor_id, neighbor_label, score,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, neighbor_label, score
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q111_ann_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_inner_product(e.v, q.qv)
        |      / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(q.qv, q.qv)))
        |      AS score
        |  FROM e CROSS JOIN q),
        |ranked AS (SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        |  FROM scored),
        |t AS (SELECT query_id, count(*) AS n_true FROM ranked
        |  WHERE rnk <= 10 GROUP BY 1)
        |SELECT query_id, n_true AS n_hit, n_true,
        |  CAST(1.0 AS DOUBLE) AS recall
        |FROM t ORDER BY query_id""".stripMargin,
    "q112_line_scrub" ->
      """WITH d AS (SELECT doc_id, source,
        |    'promo: visit our site' || chr(10) || text ||
        |    CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'subscribe footer'
        |         ELSE '' END AS text
        |  FROM documents),
        |lines AS (SELECT source, doc_id,
        |    unnest(string_split(text, chr(10))) AS line,
        |    generate_subscripts(string_split(text, chr(10)), 1) AS pos FROM d),
        |gt AS (SELECT source, count(*) AS gdocs FROM d GROUP BY 1),
        |ld AS (SELECT source, line, count(*) AS ndocs
        |  FROM (SELECT DISTINCT source, doc_id, line FROM lines) GROUP BY 1, 2),
        |scrub AS (SELECT source, line FROM ld JOIN gt USING (source)
        |  WHERE ndocs * 100 > 60 * gdocs),
        |kept AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS scrubbed,
        |    count(*) AS n_kept
        |  FROM lines ANTI JOIN scrub USING (source, line) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(scrubbed, '') AS scrubbed,
        |  coalesce(n_kept, 0) AS n_kept,
        |  coalesce(len(string_split(d.text, chr(10))), 0) - coalesce(n_kept, 0)
        |    AS n_dropped
        |FROM d LEFT JOIN kept USING (doc_id) ORDER BY doc_id""".stripMargin,
    // equal-width hexThreshold(i/8) boundaries, i.e. 0x20000000 steps
    "q113_shuffle_order" ->
      """WITH w AS (SELECT doc_id,
        |    substr(md5(CAST(doc_id AS VARCHAR) || ':train'), 1, 8) AS h
        |  FROM documents),
        |s AS (SELECT doc_id, h,
        |    (CASE WHEN h >= '20000000' THEN 1 ELSE 0 END
        |   + CASE WHEN h >= '40000000' THEN 1 ELSE 0 END
        |   + CASE WHEN h >= '60000000' THEN 1 ELSE 0 END
        |   + CASE WHEN h >= '80000000' THEN 1 ELSE 0 END
        |   + CASE WHEN h >= 'a0000000' THEN 1 ELSE 0 END
        |   + CASE WHEN h >= 'c0000000' THEN 1 ELSE 0 END
        |   + CASE WHEN h >= 'e0000000' THEN 1 ELSE 0 END) AS shard FROM w)
        |SELECT doc_id, CAST(shard AS INTEGER) AS shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1
        |    AS BIGINT) AS pos
        |FROM s ORDER BY doc_id""".stripMargin,
    // rate replay: sqrt weights (IEEE-exact), lang-ordered list_reduce fold
    // for Σw (≡ Spark's sort_array+aggregate), identical op order in the
    // rate, floor(rate·2³²) → lowercase zero-padded hex threshold
    "q114_temperature_mix" ->
      """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE)) AS w FROM n),
        |t AS (SELECT list_reduce(list(w ORDER BY lang), (a, b) -> a + b) AS tot
        |  FROM w),
        |r AS (SELECT lang,
        |    CAST(450 AS DOUBLE) * w / (tot * CAST(n AS DOUBLE)) AS rate
        |  FROM w, t),
        |thr AS (SELECT lang, CASE WHEN rate >= 1.0 THEN NULL
        |    ELSE lpad(lower(to_hex(CAST(floor(rate * 4294967296.0) AS BIGINT))),
        |              8, '0') END AS thr
        |  FROM r)
        |SELECT d.doc_id, d.lang FROM documents d JOIN thr USING (lang)
        |WHERE thr IS NULL
        |   OR substr(md5(CAST(doc_id AS VARCHAR) || ':temp'), 1, 8) < thr
        |ORDER BY doc_id""".stripMargin,
    // NB replay: q93's tokenizer normalization, 4-hex md5 buckets,
    // integer counts, 6dp-rounded ln ratios, bucket-ordered list_reduce
    // fold from an exact first element (0.0+x1 ≡ x1), 4dp-rounded score.
    // Rounding is the explicit floor(x·10ⁿ+0.5)/10ⁿ — engine round()
    // diverges at representable-tie boundaries (seen live at sf1.0)
    "q115_nb_classifier" ->
      """WITH tk AS (SELECT doc_id, lang, unnest(string_split(trim(
        |    regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')), ' ')) AS t FROM documents),
        |feat AS (SELECT doc_id, lang, substr(md5(t || ':nbf'), 1, 4) AS feature
        |  FROM tk WHERE t <> ''),
        |cnt AS (SELECT feature,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cp,
        |    sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS cn
        |  FROM feat WHERE doc_id % 3 = 0 GROUP BY 1),
        |tot AS (SELECT sum(cp) AS tp, sum(cn) AS tn FROM cnt),
        |model AS (SELECT feature,
        |    floor((ln(CAST(cp + 1 AS DOUBLE) / CAST(tp + 65536 AS DOUBLE))
        |         - ln(CAST(cn + 1 AS DOUBLE) / CAST(tn + 65536 AS DOUBLE)))
        |        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |      / CAST(1000000 AS DOUBLE) AS llr
        |  FROM cnt, tot),
        |sc AS (SELECT doc_id,
        |    floor(list_reduce(list(llr ORDER BY feature), (a, b) -> a + b)
        |        * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |      / CAST(10000 AS DOUBLE) AS score
        |  FROM feat JOIN model USING (feature) GROUP BY 1)
        |SELECT d.doc_id, coalesce(score, CAST(0.0 AS DOUBLE)) AS score,
        |  coalesce(score, CAST(0.0 AS DOUBLE)) > 0.0 AS predicted
        |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q287: the full multiclass-NB chain replayed — hashed buckets, train
    // counts, 6dp floor-rounded log-probs/priors/unseen floors, per-class
    // tf·lp folds in feature order from a prepended 0.0, argmax via
    // (-score, label) row_number, margin vs the r=2 row
    "q287_nb_multiclass" -> nbMulticlassOracleSql(sampled = false),
    "q287s_nb_multiclass_sampled" -> nbMulticlassOracleSql(sampled = true),
    // replay: identical 3-gram sets, the (df, gram)-ranked containment
    // prefix (rarest ⌊(1−t)n⌋+1 grams), df ≤ 64 index, the |B| ≥ ⌈t·|A|⌉
    // size bound, exact list_intersect sizes, integer/integer division.
    // 0.9 is CAST to DOUBLE so ceil sees the same product both engines.
    "q116_containment" ->
      """WITH c AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    array_to_string((string_split(text, ' '))[1:20], ' ')
        |  FROM documents),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM c),
        |g AS (SELECT doc_id, list_distinct(
        |    list_transform(generate_series(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gr
        |  FROM t),
        |gg AS (SELECT doc_id, gr FROM g WHERE len(gr) > 0),
        |tok AS (SELECT doc_id, len(gr) AS n, unnest(gr) AS gram FROM gg),
        |dfreq AS (SELECT gram, count(*) AS df FROM tok GROUP BY 1),
        |rk AS (SELECT doc_id, n, gram, df,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY df, gram) AS r
        |  FROM tok JOIN dfreq USING (gram)),
        |el AS (SELECT * FROM rk WHERE df > 1 AND df <= 64),
        |pre AS (SELECT gram, doc_id AS id_a, n AS n_a FROM el
        |  WHERE r <= n - ceil(CAST(0.9 AS DOUBLE) * n) + 1),
        |cand AS (SELECT DISTINCT id_a, id_b FROM pre JOIN
        |    (SELECT gram, doc_id AS id_b, n AS n_b FROM el) idx USING (gram)
        |  WHERE id_a <> id_b AND n_b >= ceil(CAST(0.9 AS DOUBLE) * n_a)),
        |v AS (SELECT id_a, id_b,
        |    CAST(len(list_intersect(ga.gr, gb.gr)) AS BIGINT) AS n_shared,
        |    CAST(len(list_intersect(ga.gr, gb.gr)) AS DOUBLE)
        |      / CAST(len(ga.gr) AS DOUBLE) AS containment
        |  FROM cand JOIN gg ga ON ga.doc_id = cand.id_a
        |    JOIN gg gb ON gb.doc_id = cand.id_b)
        |SELECT id_a, id_b, n_shared, containment FROM v
        |WHERE containment >= CAST(0.9 AS DOUBLE) ORDER BY id_a, id_b""".stripMargin,
    // sign replay: same md5 first-hex-digit rule, ascending-j list fold
    // (0.0+x1 ≡ x1), literal / sqrt(CAST(8 AS DOUBLE))
    "q117_random_projection" ->
      """WITH k AS (SELECT unnest(generate_series(0, 7)) AS dim),
        |p AS (SELECT vec_id, dim,
        |    list_reduce(list_transform(generate_series(1, 64),
        |      j -> CAST(embedding[j] AS DOUBLE) *
        |        (CASE WHEN substr(md5(CAST(j - 1 AS VARCHAR) || ':'
        |            || CAST(dim AS VARCHAR) || ':jl'), 1, 1) < '8'
        |          THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)),
        |      (a, b) -> a + b) / sqrt(CAST(8 AS DOUBLE)) AS value
        |  FROM embeddings, k)
        |SELECT vec_id, CAST(dim AS INTEGER) AS dim, value FROM p
        |ORDER BY vec_id, dim""".stripMargin,
    // full-chain replay: q22's fingerprint, regex token count, q114's
    // temperature thresholds over the FILTERED counts, q113's shard CASE
    // chain — each under this query's own hash domains
    "q118_curation_pipeline" ->
      """WITH fp AS (SELECT doc_id, lang, text,
        |    md5(array_to_string(list_sort(list_distinct(string_split(
        |      trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |           ' +', ' ', 'g')), ' '))), ' ')) AS fp
        |  FROM documents),
        |dd AS (SELECT doc_id, lang, text FROM (SELECT doc_id, lang, text,
        |    row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM fp)
        |  WHERE rn = 1),
        |gated AS (SELECT doc_id, lang FROM dd
        |  WHERE len(string_split_regex(trim(text), '\s+')) >= 30),
        |n AS (SELECT lang, count(*) AS n FROM gated GROUP BY 1),
        |w AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE)) AS w FROM n),
        |t AS (SELECT list_reduce(list(w ORDER BY lang), (a, b) -> a + b) AS tot
        |  FROM w),
        |r AS (SELECT lang,
        |    CAST(300 AS DOUBLE) * w / (tot * CAST(n AS DOUBLE)) AS rate
        |  FROM w, t),
        |thr AS (SELECT lang, CASE WHEN rate >= 1.0 THEN NULL
        |    ELSE lpad(lower(to_hex(CAST(floor(rate * 4294967296.0) AS BIGINT))),
        |              8, '0') END AS thr
        |  FROM r),
        |mixed AS (SELECT g.doc_id, g.lang FROM gated g JOIN thr USING (lang)
        |  WHERE thr IS NULL
        |     OR substr(md5(CAST(doc_id AS VARCHAR) || ':temp118'), 1, 8) < thr),
        |h AS (SELECT doc_id, lang,
        |    substr(md5(CAST(doc_id AS VARCHAR) || ':shard118'), 1, 8) AS h
        |  FROM mixed),
        |sh AS (SELECT doc_id, lang, h,
        |    (CASE WHEN h >= '40000000' THEN 1 ELSE 0 END
        |   + CASE WHEN h >= '80000000' THEN 1 ELSE 0 END
        |   + CASE WHEN h >= 'c0000000' THEN 1 ELSE 0 END) AS shard FROM h)
        |SELECT doc_id, lang, CAST(shard AS INTEGER) AS shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1
        |    AS BIGINT) AS pos
        |FROM sh ORDER BY doc_id""".stripMargin,
    // frame replay: identical byte-window offsets (i·max(len−32,0)/7),
    // q97's grid rule per frame, banding as 16-char substrings of the
    // MSB-first bit string (band b = chars 49−16b..), Hamming = mismatch
    // count, then the exact frame vote
    "q119_video_neardup" ->
      """WITH c AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, substr(text, 1, strlen(text) - 1) || 'Z'
        |  FROM documents),
        |t AS (SELECT doc_id, text, strlen(text) AS len FROM c WHERE strlen(text) > 0),
        |f AS (SELECT doc_id, i AS frame_idx,
        |    substr(text, CAST((i * greatest(len - 32, 0)) // 7 AS INTEGER) + 1, 32) AS fr
        |  FROM t CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) gi),
        |p AS (SELECT doc_id, frame_idx, list_transform(generate_series(0, 63),
        |    j -> ascii(substr(fr, CAST((j * strlen(fr)) // 64 AS INTEGER) + 1, 1))) AS px
        |  FROM f),
        |m AS (SELECT doc_id, frame_idx, px, list_sum(px) // 64 AS mean FROM p),
        |bt AS (SELECT doc_id, frame_idx, array_to_string(list_transform(
        |    generate_series(63, 0, -1),
        |    j -> CASE WHEN px[j + 1] > mean THEN '1' ELSE '0' END), '') AS bits
        |  FROM m),
        |bd AS (SELECT doc_id, frame_idx, bits, bp, chunk FROM (
        |  SELECT doc_id, frame_idx, bits,
        |      49 - 16 * band AS bp, substr(bits, 49 - 16 * band, 16) AS chunk,
        |      row_number() OVER (PARTITION BY frame_idx, band,
        |        substr(bits, 49 - 16 * band, 16) ORDER BY doc_id) AS r
        |    FROM bt CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) gb)
        |  WHERE r <= 256),
        |fp AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.frame_idx,
        |    len(list_filter(generate_series(1, 64),
        |      i -> substr(a.bits, CAST(i AS INTEGER), 1)
        |        <> substr(b.bits, CAST(i AS INTEGER), 1))) AS dist
        |  FROM bd a JOIN bd b ON a.frame_idx = b.frame_idx AND a.bp = b.bp
        |    AND a.chunk = b.chunk AND a.doc_id < b.doc_id),
        |q AS (SELECT id_a, id_b, count(*) AS n_matching FROM fp
        |  WHERE dist <= 3 GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(n_matching AS BIGINT) AS n_matching FROM q
        |WHERE n_matching >= 6 ORDER BY id_a, id_b""".stripMargin,
    // JSD replay: identical p/q divisions and operand order, token-ordered
    // list_reduce fold, explicit floor-rounding of the half-sum
    "q120_slice_divergence" ->
      """WITH tk AS (SELECT source, unnest(string_split(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')), ' ')) AS t FROM documents),
        |sc AS (SELECT source, t, count(*) AS c FROM tk WHERE t <> ''
        |  GROUP BY 1, 2),
        |cc AS (SELECT t, sum(c) AS cc FROM sc GROUP BY 1),
        |st AS (SELECT source, sum(c) AS st FROM sc GROUP BY 1),
        |ctot AS (SELECT sum(cc) AS ct FROM cc),
        |grid AS (SELECT st.source, cc.t, coalesce(sc.c, 0) AS c,
        |    st.st, cc.cc, ctot.ct
        |  FROM st CROSS JOIN cc
        |  LEFT JOIN sc ON sc.source = st.source AND sc.t = cc.t
        |  CROSS JOIN ctot),
        |term AS (SELECT source, t,
        |    (CASE WHEN c > 0 THEN
        |      (CAST(c AS DOUBLE) / CAST(st AS DOUBLE))
        |        * ln(CAST(2.0 AS DOUBLE) * (CAST(c AS DOUBLE) / CAST(st AS DOUBLE))
        |          / ((CAST(c AS DOUBLE) / CAST(st AS DOUBLE))
        |             + (CAST(cc AS DOUBLE) / CAST(ct AS DOUBLE))))
        |     ELSE CAST(0.0 AS DOUBLE) END)
        |    + (CAST(cc AS DOUBLE) / CAST(ct AS DOUBLE))
        |      * ln(CAST(2.0 AS DOUBLE) * (CAST(cc AS DOUBLE) / CAST(ct AS DOUBLE))
        |        / ((CAST(c AS DOUBLE) / CAST(st AS DOUBLE))
        |           + (CAST(cc AS DOUBLE) / CAST(ct AS DOUBLE)))) AS x
        |  FROM grid)
        |SELECT source,
        |  floor((list_reduce(list(x ORDER BY t), (a, b) -> a + b)
        |      / CAST(2.0 AS DOUBLE))
        |    * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |    / CAST(1000000 AS DOUBLE) AS jsd
        |FROM term GROUP BY source ORDER BY source""".stripMargin,
    // top-k vocab by (count desc, token asc) — a total order; exact
    // integer OOV counts and division
    "q121_oov_rate" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')), ' ')) AS t FROM documents),
        |tt AS (SELECT doc_id, t FROM tk WHERE t <> ''),
        |vc AS (SELECT t, count(*) AS c FROM tt GROUP BY 1),
        |vr AS (SELECT t, row_number() OVER (ORDER BY c DESC, t) AS r FROM vc),
        |topv AS (SELECT t FROM vr WHERE r <= 20),
        |pd AS (SELECT doc_id, count(*) AS n_tokens,
        |    sum(CASE WHEN t IN (SELECT t FROM topv) THEN 0 ELSE 1 END) AS n_oov
        |  FROM tt GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov,
        |  CASE WHEN coalesce(n_tokens, 0) > 0
        |    THEN CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |    ELSE CAST(0.0 AS DOUBLE) END AS oov_rate
        |FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q100's NLL chain verbatim, then the identical rank-based tertile
    // over (avg_nll, doc_id) — integer DIV, no interpolation
    "q122_ccnet_tertiles" ->
      """WITH tks AS (SELECT doc_id, source,
        |    list_filter(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |      x -> x <> '') AS tk
        |  FROM documents),
        |bg AS (SELECT doc_id, source, i,
        |    CASE WHEN i = 1 THEN '<s>' ELSE tk[i-1] END AS prev, tk[i] AS cur
        |  FROM (SELECT doc_id, source, tk,
        |        unnest(generate_series(1, len(tk))) AS i
        |        FROM tks WHERE len(tk) >= 1)),
        |cnt AS (SELECT prev, cur, count(*) AS c FROM bg
        |  WHERE source = 'src0' GROUP BY 1, 2),
        |ctx AS (SELECT prev, sum(c) AS cc FROM cnt GROUP BY 1),
        |vv AS (SELECT count(DISTINCT cur) AS v FROM cnt),
        |sc AS (SELECT bg.doc_id, i,
        |    -ln(CAST(coalesce(c, 0) + 1 AS DOUBLE) /
        |        CAST(coalesce(cc, 0) + v + 1 AS DOUBLE)) AS nll
        |  FROM bg LEFT JOIN cnt USING (prev, cur)
        |    LEFT JOIN ctx USING (prev), vv),
        |f AS (SELECT doc_id, count(*) AS n_tokens,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(nll ORDER BY i)),
        |      (a, b) -> a + b) AS s
        |  FROM sc GROUP BY 1),
        |scored AS (SELECT f.doc_id, d.lang,
        |    round(s / CAST(n_tokens AS DOUBLE), 4) AS avg_nll
        |  FROM f JOIN documents d USING (doc_id)),
        |r AS (SELECT doc_id, lang, avg_nll,
        |    row_number() OVER (PARTITION BY lang ORDER BY avg_nll, doc_id) AS r,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM scored)
        |SELECT doc_id, lang, avg_nll,
        |  CASE ((3 * (r - 1)) // n) WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
        |    ELSE 'tail' END AS bucket
        |FROM r ORDER BY doc_id""".stripMargin,
    // q19's marker scoring + CASE verbatim, then the confusion GROUP BY
    "q123_lang_confusion" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    (CASE WHEN contains(' ' || lower(text) || ' ', ' the ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' and ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' of ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' is ') THEN 1 ELSE 0 END) AS en,
        |    (CASE WHEN contains(' ' || lower(text) || ' ', ' der ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' und ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' die ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' nicht ') THEN 1 ELSE 0 END) AS de,
        |    (CASE WHEN contains(' ' || lower(text) || ' ', ' el ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' que ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' los ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' una ') THEN 1 ELSE 0 END) AS es,
        |    (CASE WHEN contains(' ' || lower(text) || ' ', ' le ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' et ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' les ') THEN 1 ELSE 0 END
        |     + CASE WHEN contains(' ' || lower(text) || ' ', ' une ') THEN 1 ELSE 0 END) AS fr,
        |    (CASE WHEN length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) > 0
        |          THEN 10 ELSE 0 END) AS zh
        |  FROM documents),
        |g AS (SELECT lang,
        |    CASE WHEN zh >= greatest(en, de, es, fr) THEN 'zh'
        |         WHEN en >= greatest(de, es, fr) THEN 'en'
        |         WHEN de >= greatest(es, fr) THEN 'de'
        |         WHEN es >= fr THEN 'es'
        |         ELSE 'fr' END AS lang_guess
        |  FROM scored)
        |SELECT lang, lang_guess, count(*) AS n FROM g
        |GROUP BY 1, 2 ORDER BY lang, lang_guess""".stripMargin,
    // first-two-window slices, md5 ring order, per-bucket cyclic lead
    "q124_contrastive_pairs" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |e AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 32),
        |b AS (SELECT doc_id,
        |    array_to_string(toks[1:32], ' ') AS anchor,
        |    array_to_string(list_slice(toks, 33, least(64, n)), ' ') AS positive,
        |    md5(CAST(doc_id AS VARCHAR) || ':neg') AS h
        |  FROM e),
        |r AS (SELECT doc_id, anchor, positive, h, substr(h, 1, 1) AS bk FROM b)
        |SELECT doc_id, anchor, positive,
        |  coalesce(lead(doc_id) OVER w, first_value(doc_id) OVER w2) AS neg_doc_id,
        |  coalesce(lead(anchor) OVER w, first_value(anchor) OVER w2) AS negative
        |FROM r
        |WINDOW w AS (PARTITION BY bk ORDER BY h, doc_id),
        |  w2 AS (PARTITION BY bk ORDER BY h, doc_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY doc_id""".stripMargin,
    // closed-form: the full-text +1e6 member wins every cluster (longest
    // text, strictly > its truncated and empty siblings)
    "q125_cluster_best" ->
      "SELECT doc_id + 1000000 AS doc_id, lang FROM documents ORDER BY doc_id",
    // q119's frame offsets (n=4 → divisor 3), ascii − 128 samples,
    // integer sum-of-squares, sqrt(ss/n), sign-flip count
    "q126_audio_features" ->
      """WITH t AS (SELECT doc_id, text, strlen(text) AS len FROM documents
        |  WHERE strlen(text) > 0),
        |f AS (SELECT doc_id, i AS frame_idx,
        |    substr(text, CAST((i * greatest(len - 64, 0)) // 3 AS INTEGER) + 1, 64) AS fr
        |  FROM t CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) gi),
        |s AS (SELECT doc_id, frame_idx, strlen(fr) AS n,
        |    list_transform(generate_series(1, strlen(fr)),
        |      j -> ascii(substr(fr, CAST(j AS INTEGER), 1)) - 128) AS xs
        |  FROM f),
        |m AS (SELECT doc_id, frame_idx, CAST(n AS INTEGER) AS n_samples,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(xs, x -> CAST(x * x AS BIGINT))), (a, b) -> a + b) AS ss,
        |    CAST(len(list_filter(generate_series(2, n),
        |      i -> (xs[CAST(i - 1 AS INTEGER)] < 0 AND xs[CAST(i AS INTEGER)] >= 0)
        |        OR (xs[CAST(i - 1 AS INTEGER)] >= 0 AND xs[CAST(i AS INTEGER)] < 0)))
        |      AS BIGINT) AS zero_crossings
        |  FROM s)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx, n_samples,
        |  sqrt(CAST(ss AS DOUBLE) / CAST(n_samples AS DOUBLE)) AS rms,
        |  zero_crossings
        |FROM m ORDER BY doc_id, frame_idx""".stripMargin,
    // q172: the engine's samples are whatever WavCodec recovers from the
    // encoded container; the oracle regenerates them from the closed-form
    // plant ((doc_id·31 + j·7) mod 65536 − 32768) — equality gates the
    // whole encode→RIFF-walk→decode→frame-slice path. Exact integer
    // sum-of-squares, one double division, one correctly-rounded sqrt.
    "q172_wav_codec_features" ->
      """WITH f AS (SELECT doc_id, i AS frame_idx
        |  FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) g),
        |s AS (SELECT doc_id, frame_idx,
        |    list_transform(generate_series(CAST(frame_idx * 64 AS BIGINT),
        |                                   CAST(frame_idx * 64 + 63 AS BIGINT)),
        |      j -> CAST(((doc_id * 31 + j * 7) % 65536) - 32768 AS BIGINT)) AS xs
        |  FROM f),
        |m AS (SELECT doc_id, frame_idx,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(xs, x -> x * x)), (a, b) -> a + b) AS ss,
        |    CAST(len(list_filter(generate_series(2, 64),
        |      i -> (xs[CAST(i - 1 AS INTEGER)] < 0 AND xs[CAST(i AS INTEGER)] >= 0)
        |        OR (xs[CAST(i - 1 AS INTEGER)] >= 0 AND xs[CAST(i AS INTEGER)] < 0)))
        |      AS BIGINT) AS zero_crossings
        |  FROM s)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(64 AS INTEGER) AS n_samples,
        |  sqrt(CAST(ss AS DOUBLE) / CAST(64 AS DOUBLE)) AS rms,
        |  zero_crossings
        |FROM m ORDER BY doc_id, frame_idx""".stripMargin,
    // q18's quality arithmetic + q44's split threshold + q26's norm,
    // joined into the export row
    "q127_training_records" ->
      s"""WITH base AS (
         |  SELECT d.doc_id, d.lang, d.n_chars, d.text, e.embedding,
         |    CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS INTEGER) AS n_tokens,
         |    CAST(length(d.text) - length(regexp_replace(d.text, '[.!?,;:]', '', 'g')) AS INTEGER)
         |      AS n_punct,
         |    CAST(len(list_filter(regexp_split_to_array(trim(d.text), '\\s+'),
         |      w -> w IN ('the','a','an','and','or','of','to','in','is','on'))) AS INTEGER)
         |      AS n_stop,
         |    CAST(length(d.text) AS INTEGER) AS n_chars_raw
         |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id)
         |SELECT doc_id, lang, n_chars,
         |  least(greatest(
         |    least(CAST(n_tokens AS DOUBLE) / CAST(50.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
         |    + least((CAST(n_stop AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
         |    + (CAST(1.0 AS DOUBLE) - least((CAST(n_punct AS DOUBLE) / greatest(CAST(n_chars_raw AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
         |    CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)) AS quality,
         |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':export'), 1, 8)
         |         < '${Sampling.hexThreshold(0.9)}'
         |       THEN 'train' ELSE 'val' END AS split,
         |  sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
         |                          CAST(embedding AS DOUBLE[]))) AS vec_l2,
         |  CAST(len(embedding) AS INTEGER) AS vec_dims
         |FROM base ORDER BY doc_id""".stripMargin,
    // q128: the repetition masses recomputed RELATIONALLY (unnest +
    // group-by where the engine runs per-row folds) — identical integer
    // c·len masses, single-division doubles, shared threshold literals
    "q128_repetition_signals" -> repetitionOracle,
    // q129: q18's quality chain (exact doubles), then the SINGLE-WINDOW
    // running token sum the engine's score-bucketed two-phase scheme
    // reproduces; bin cut is pure int64 floor division
    "q129_curriculum_bins" ->
      """WITH base AS (SELECT doc_id,
        |    least(greatest(
        |      least(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) / CAST(50.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
        |      + least((CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |          w -> w IN ('the','a','an','and','or','of','to','in','is','on'))) AS DOUBLE)
        |          / greatest(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
        |      + (CAST(1.0 AS DOUBLE) - least((CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
        |          / greatest(CAST(length(text) AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
        |      CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)) AS score,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, score, n_tok,
        |    CAST(coalesce(sum(n_tok) OVER (ORDER BY score, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior,
        |    CAST(greatest(sum(n_tok) OVER (), 1) AS BIGINT) AS tot
        |  FROM base)
        |SELECT doc_id, score, n_tok,
        |  CAST(least(3, (prior * 4) // tot) AS INTEGER) AS bin
        |FROM c ORDER BY doc_id""".stripMargin,
    // q131: the stripMarkup regex chain, generated from the same shared
    // constants the Spark plant uses
    "q131_strip_markup" -> stripMarkupOracle,
    // q133: eight unrolled BPE iterations — identical pair sums, argmax
    // order, and merge fold
    "q133_bpe_merges" -> bpeOracle(8),
    // q155: batched ≡ sequential by construction, so the oracle IS the
    // sequential 8-iteration unroll
    "q155_bpe_batched" -> bpeOracle(8),
    "q158_bpe_fertility" -> bpeFertilityOracle(8),
    // q159: same unit/record-separator composite key, same binary-string
    // depth buckets (never floating log2), Σdepth² in HUGEINT → DOUBLE
    "q159_key_skew_profile" ->
      """WITH d AS (SELECT concat_ws(chr(31),
        |    coalesce(CAST(user_id AS VARCHAR), chr(30)),
        |    coalesce(CAST(event_type AS VARCHAR), chr(30))) AS k
        |  FROM events),
        |c AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY k)
        |SELECT CAST(length(bin(c)) - 1 AS INTEGER) AS depth_bucket,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(c) AS BIGINT) AS n_rows,
        |  CAST(CAST(sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS selfjoin_rows,
        |  min(k) AS example_key
        |FROM c GROUP BY 1 ORDER BY depth_bucket""".stripMargin,
    // q161: each audit = totals × orphan-anti-join (NOT EXISTS) × null
    // tally, one row per FK contract; same shrunk parents
    "q161_referential_audit" -> Seq(
      ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
        "SELECT o_orderkey FROM orders", "o_orderkey"),
      ("orders.o_custkey->customer_mod10", "orders", "o_custkey",
        "SELECT c_custkey FROM customer WHERE c_custkey % 10 <> 0", "c_custkey"),
      ("events.user_id->customer_lt100", "events", "user_id",
        "SELECT c_custkey FROM customer WHERE c_custkey < 100", "c_custkey")
    ).map { case (label, child, ck, parentSql, pk) =>
      s"""SELECT '$label' AS fk, t.n_rows, t.n_keys, o.n_orphan_rows,
         |  o.n_orphan_keys, z.n_null_rows,
         |  CASE WHEN t.n_rows = 0 THEN CAST(0.0 AS DOUBLE)
         |       ELSE CAST(o.n_orphan_rows AS DOUBLE) / CAST(t.n_rows AS DOUBLE)
         |  END AS orphan_frac
         |FROM
         | (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_rows,
         |     CAST(count(*) AS BIGINT) AS n_keys FROM
         |   (SELECT $ck AS k, count(*) AS c FROM $child
         |    WHERE $ck IS NOT NULL GROUP BY 1)) t,
         | (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_orphan_rows,
         |     CAST(count(*) AS BIGINT) AS n_orphan_keys FROM
         |   (SELECT $ck AS k, count(*) AS c FROM $child
         |    WHERE $ck IS NOT NULL GROUP BY 1) kk
         |   WHERE NOT EXISTS (SELECT 1 FROM ($parentSql) p WHERE p.$pk = kk.k)) o,
         | (SELECT CAST(count(*) AS BIGINT) AS n_null_rows FROM $child
         |  WHERE $ck IS NULL) z""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY fk"),
    // q162: identical lead() window (ts, event_id order), state-row
    // normalizer as a window over the matrix
    "q162_event_transitions" ->
      """WITH s AS (SELECT user_id, event_type AS state,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_state
        |  FROM events),
        |m AS (SELECT state, next_state, CAST(count(*) AS BIGINT) AS n_trans
        |  FROM s WHERE next_state IS NOT NULL GROUP BY 1, 2)
        |SELECT state, next_state, n_trans,
        |  CAST(n_trans AS DOUBLE)
        |    / CAST(sum(n_trans) OVER (PARTITION BY state) AS DOUBLE) AS p
        |FROM m ORDER BY state, next_state""".stripMargin,
    // q173: q162's oracle verbatim — the bucketed split must reproduce the
    // single-window matrix exactly
    "q173_event_transitions_bucketed" ->
      """WITH s AS (SELECT user_id, event_type AS state,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_state
        |  FROM events),
        |m AS (SELECT state, next_state, CAST(count(*) AS BIGINT) AS n_trans
        |  FROM s WHERE next_state IS NOT NULL GROUP BY 1, 2)
        |SELECT state, next_state, n_trans,
        |  CAST(n_trans AS DOUBLE)
        |    / CAST(sum(n_trans) OVER (PARTITION BY state) AS DOUBLE) AS p
        |FROM m ORDER BY state, next_state""".stripMargin,
    // q174: q167's record/candidate/score replay + recursive
    // min-reachable-id components (the same min-label semantics as
    // large-star/small-star at the fixpoint) + mode-per-field with the
    // (votes desc, value asc) deterministic tie
    "q174_golden_records" -> {
      val blockSqls = Seq("phone", "fi", "la").map { c =>
        s"""SELECT a.id AS id_a, b.id AS id_b
           |  FROM recs a JOIN recs b ON a.$c = b.$c AND a.id < b.id
           |  WHERE a.$c IN (SELECT $c FROM recs WHERE $c IS NOT NULL
           |                 GROUP BY $c HAVING count(*) BETWEEN 2 AND 64)""".stripMargin
      }
      s"""WITH RECURSIVE ck AS (SELECT c_custkey AS k FROM customer),
         |recs AS (
         |  SELECT k AS id,
         |    substr(md5(CAST(k AS VARCHAR) || ':p'), 1, 10) AS phone,
         |    substr(md5(CAST(k AS VARCHAR) || ':f'), 1, 8) AS fi,
         |    substr(md5(CAST(k AS VARCHAR) || ':l'), 1, 8) AS la
         |  FROM ck
         |  UNION ALL
         |  SELECT k + 1000000,
         |    CASE WHEN k % 3 = 0 THEN substr(md5(CAST(k AS VARCHAR) || ':p2'), 1, 10)
         |         ELSE substr(md5(CAST(k AS VARCHAR) || ':p'), 1, 10) END,
         |    CASE WHEN k % 3 = 1 THEN substr(md5(CAST(k AS VARCHAR) || ':f'), 1, 8) || 'x'
         |         ELSE substr(md5(CAST(k AS VARCHAR) || ':f'), 1, 8) END,
         |    CASE WHEN k % 3 = 2 THEN substr(md5(CAST(k AS VARCHAR) || ':l2'), 1, 8)
         |         ELSE substr(md5(CAST(k AS VARCHAR) || ':l'), 1, 8) END
         |  FROM ck),
         |cand AS (SELECT DISTINCT id_a, id_b FROM (
         |${blockSqls.mkString("\nUNION ALL\n")})),
         |matched AS (
         |  SELECT c.id_a, c.id_b FROM cand c
         |  JOIN recs ra ON ra.id = c.id_a
         |  JOIN recs rb ON rb.id = c.id_b
         |  WHERE CASE WHEN ra.phone IS NOT DISTINCT FROM rb.phone THEN 0.5 ELSE 0.0 END
         |    + CASE WHEN ra.fi IS NOT DISTINCT FROM rb.fi THEN 0.3 ELSE 0.0 END
         |    + CASE WHEN ra.la IS NOT DISTINCT FROM rb.la THEN 0.2 ELSE 0.0 END >= 0.5),
         |edges AS (SELECT id_a AS u, id_b AS v FROM matched
         |          UNION SELECT id_b, id_a FROM matched),
         |reach(id, r) AS (
         |  SELECT id, id FROM recs
         |  UNION
         |  SELECT e.u, t.r FROM edges e JOIN reach t ON t.id = e.v),
         |lbl AS (SELECT id, min(r) AS entity FROM reach GROUP BY id),
         |melt AS (
         |  SELECT l.entity, 'phone' AS field, r.phone AS value
         |    FROM recs r JOIN lbl l ON l.id = r.id
         |  UNION ALL
         |  SELECT l.entity, 'first', r.fi FROM recs r JOIN lbl l ON l.id = r.id
         |  UNION ALL
         |  SELECT l.entity, 'last', r.la FROM recs r JOIN lbl l ON l.id = r.id),
         |votes AS (SELECT entity, field, value, CAST(count(*) AS BIGINT) AS n_votes
         |  FROM melt WHERE value IS NOT NULL GROUP BY 1, 2, 3),
         |ranked AS (SELECT entity, field, value, n_votes,
         |    CAST(sum(n_votes) OVER (PARTITION BY entity, field) AS BIGINT) AS n_total,
         |    row_number() OVER (PARTITION BY entity, field
         |                       ORDER BY n_votes DESC, value) AS rk
         |  FROM votes)
         |SELECT entity AS entity_id, field, value, n_votes, n_total
         |FROM ranked WHERE rk = 1 ORDER BY entity_id, field""".stripMargin
    },
    // q217: same distinct interactions, basket cap, pair counts with
    // the minCo HAVING, identical jaccard division and tie order
    "q217_item_neighbors" ->
      """WITH inter AS (SELECT DISTINCT o.o_custkey AS u,
        |    l.l_partkey AS i
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_custkey % 10 = 0),
        |kept AS (SELECT u FROM (SELECT u, count(*) AS bs FROM inter
        |  GROUP BY 1) WHERE bs <= 1000),
        |capped AS (SELECT inter.u, inter.i FROM inter
        |  JOIN kept ON kept.u = inter.u),
        |ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM capped
        |  GROUP BY 1),
        |p AS (SELECT a.i AS item, b.i AS neighbor,
        |    CAST(count(*) AS BIGINT) AS co
        |  FROM capped a JOIN capped b ON b.u = a.u AND a.i <> b.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |s AS (SELECT p.item, p.neighbor, p.co,
        |    CAST(p.co AS DOUBLE) / CAST(ca.ci + cb.ci - p.co AS DOUBLE)
        |      AS jaccard
        |  FROM p JOIN ic ca ON ca.i = p.item
        |  JOIN ic cb ON cb.i = p.neighbor),
        |r AS (SELECT item, neighbor, co, jaccard, row_number()
        |    OVER (PARTITION BY item ORDER BY jaccard DESC, neighbor)
        |      AS rank
        |  FROM s)
        |SELECT item, CAST(rank AS INTEGER) AS rank, neighbor, co,
        |  jaccard
        |FROM r WHERE rank <= 5 ORDER BY item, rank""".stripMargin,
    // q216: same plantings, same regex, same left-indexed Luhn fold
    // over generate_series, exact counts and divisions
    "q216_luhn_pii" ->
      """WITH planted AS (SELECT doc_id, source,
        |    text ||
        |    (CASE WHEN doc_id % 5 = 0
        |      THEN ' card 4111 1111 1111 1111' ELSE '' END) ||
        |    (CASE WHEN doc_id % 3 = 0
        |      THEN ' num 4111111111111112' ELSE '' END) ||
        |    (CASE WHEN doc_id % 17 = 0
        |      THEN ' amex 378282246310005' ELSE '' END) AS text
        |  FROM documents),
        |per AS (SELECT source,
        |    len(regexp_extract_all(text, '[0-9][0-9 -]{11,21}[0-9]'))
        |      AS nc,
        |    len(list_filter(
        |      list_transform(
        |        regexp_extract_all(text, '[0-9][0-9 -]{11,21}[0-9]'),
        |        c -> regexp_replace(c, '[^0-9]', '', 'g')),
        |      d -> len(d) BETWEEN 13 AND 19 AND
        |        list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(generate_series(1, len(d)),
        |            i -> CAST(CASE WHEN (len(d) + i) % 2 = 1
        |              THEN CASE WHEN 2 * CAST(d[i] AS INT) > 9
        |                   THEN 2 * CAST(d[i] AS INT) - 9
        |                   ELSE 2 * CAST(d[i] AS INT) END
        |              ELSE CAST(d[i] AS INT) END AS BIGINT))),
        |          (a, b) -> a + b) % 10 = 0)) AS nv
        |  FROM planted WHERE source IS NOT NULL AND text IS NOT NULL),
        |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN nv > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_docs_with_pan,
        |    CAST(sum(nc) AS BIGINT) AS n_candidates,
        |    CAST(sum(nv) AS BIGINT) AS n_valid
        |  FROM per GROUP BY 1)
        |SELECT source, n_docs, n_docs_with_pan, n_candidates, n_valid,
        |  CAST(n_docs_with_pan AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |    AS pan_doc_rate,
        |  CASE WHEN n_candidates = 0 THEN NULL
        |       ELSE CAST(n_valid AS DOUBLE) / CAST(n_candidates AS DOUBLE)
        |       END AS valid_rate
        |FROM agg ORDER BY source""".stripMargin,
    // q215: the same 4 relaxation rounds unrolled as CTEs (the q206
    // fixed-point pattern), identical min-per-node collapse
    "q215_shortest_paths" -> {
      val rounds = (1 to 4).map { i =>
        val prev = s"d${i - 1}"
        s"""d$i AS (SELECT node, min(d) AS d FROM (
           |  SELECT node, d FROM $prev
           |  UNION ALL
           |  SELECT e.dst AS node, $prev.d + e.w AS d
           |  FROM $prev JOIN e ON e.src = $prev.node) GROUP BY node)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
         |  FROM lineitem WHERE l_orderkey % 20 = 0),
         |raw AS (SELECT a.sk AS src, b.sk AS dst
         |  FROM li a JOIN li b ON b.ok = a.ok AND a.sk <> b.sk),
         |e AS (SELECT src, dst,
         |    CAST(min(1 + (src + dst) % 9) AS BIGINT) AS w
         |  FROM raw GROUP BY 1, 2),
         |d0 AS (SELECT s_suppkey AS node, CAST(0 AS BIGINT) AS d
         |  FROM supplier WHERE s_suppkey % 10 = 0),
         |$rounds
         |SELECT node, d AS dist FROM d4 ORDER BY node""".stripMargin
    },
    // q214: q102's tokenizer verbatim, bigram-positional marginals,
    // the same four G2 cells in fixed operand order, floor-round replay
    "q214_llr_collocations" ->
      """WITH tks AS (SELECT list_filter(string_split(trim(regexp_replace(
        |      regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |      ' +', ' ', 'g')), ' '), x -> x <> '') AS tk
        |  FROM documents),
        |bi AS (SELECT tk[i] AS a, tk[i+1] AS b,
        |    CAST(count(*) AS BIGINT) AS cb
        |  FROM (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
        |        FROM tks WHERE len(tk) >= 2) GROUP BY 1, 2),
        |fa AS (SELECT a, CAST(sum(cb) AS BIGINT) AS ra FROM bi GROUP BY 1),
        |sb AS (SELECT b, CAST(sum(cb) AS BIGINT) AS cbt FROM bi GROUP BY 1),
        |tot AS (SELECT CAST(sum(cb) AS BIGINT) AS n2 FROM bi),
        |p AS (SELECT bi.a || ' ' || bi.b AS gram, bi.cb,
        |    floor(2.0 * (
        |      (CASE WHEN bi.cb > 0 THEN CAST(bi.cb AS DOUBLE) *
        |        ln((CAST(bi.cb AS DOUBLE) * CAST(n2 AS DOUBLE)) /
        |           (CAST(ra AS DOUBLE) * CAST(cbt AS DOUBLE)))
        |        ELSE 0.0 END) +
        |      (CASE WHEN ra - bi.cb > 0 THEN CAST(ra - bi.cb AS DOUBLE) *
        |        ln((CAST(ra - bi.cb AS DOUBLE) * CAST(n2 AS DOUBLE)) /
        |           (CAST(ra AS DOUBLE) * CAST(n2 - cbt AS DOUBLE)))
        |        ELSE 0.0 END) +
        |      (CASE WHEN cbt - bi.cb > 0 THEN CAST(cbt - bi.cb AS DOUBLE) *
        |        ln((CAST(cbt - bi.cb AS DOUBLE) * CAST(n2 AS DOUBLE)) /
        |           (CAST(n2 - ra AS DOUBLE) * CAST(cbt AS DOUBLE)))
        |        ELSE 0.0 END) +
        |      (CASE WHEN n2 - ra - cbt + bi.cb > 0
        |        THEN CAST(n2 - ra - cbt + bi.cb AS DOUBLE) *
        |        ln((CAST(n2 - ra - cbt + bi.cb AS DOUBLE) *
        |            CAST(n2 AS DOUBLE)) /
        |           (CAST(n2 - ra AS DOUBLE) * CAST(n2 - cbt AS DOUBLE)))
        |        ELSE 0.0 END)
        |    ) * 1000000 + 0.5) / 1000000 AS llr
        |  FROM bi JOIN fa ON fa.a = bi.a JOIN sb ON sb.b = bi.b
        |  CROSS JOIN tot WHERE bi.cb >= 5),
        |h AS (SELECT gram, cb, llr,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, len(gram)),
        |        j -> CAST(unicode(gram[j]) AS BIGINT))),
        |      (x, y) -> (x * 257 + y) % 1000000007) AS th
        |  FROM p),
        |r AS (SELECT gram, cb, llr,
        |    row_number() OVER (ORDER BY llr DESC, th, gram) AS rank FROM h)
        |SELECT CAST(rank AS INTEGER) AS rank, gram, cb AS pair_count, llr
        |FROM r WHERE rank <= 50 ORDER BY rank""".stripMargin,
    // q213: identical pairwise slopes (x < x2 join), identical sorted-
    // array medians with the (lo+hi)/2 even rule
    "q213_theil_sen" ->
      """WITH d AS (SELECT event_type,
        |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
        |      AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) * 1000000 AS y6
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    (CAST(b.y6 - a.y6 AS DOUBLE) / 1e6) /
        |      CAST(b.x - a.x AS DOUBLE) AS sl
        |  FROM d a JOIN d b ON b.event_type = a.event_type
        |    AND a.x < b.x),
        |sm AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |    list(sl ORDER BY sl) AS arr FROM p GROUP BY 1),
        |sl AS (SELECT event_type, n_pairs,
        |    CASE WHEN len(arr) % 2 = 1 THEN arr[(len(arr) + 1) // 2]
        |         ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1])
        |           / 2.0 END AS slope
        |  FROM sm),
        |nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM d GROUP BY 1),
        |res AS (SELECT d.event_type,
        |    CAST(d.y6 AS DOUBLE) / 1e6 - sl.slope * CAST(d.x AS DOUBLE)
        |      AS r
        |  FROM d JOIN sl ON sl.event_type = d.event_type),
        |ri AS (SELECT event_type, list(r ORDER BY r) AS arr
        |  FROM res GROUP BY 1),
        |ic AS (SELECT event_type,
        |    CASE WHEN len(arr) % 2 = 1 THEN arr[(len(arr) + 1) // 2]
        |         ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1])
        |           / 2.0 END AS intercept
        |  FROM ri)
        |SELECT nn.event_type, nn.n,
        |  coalesce(sl.n_pairs, 0) AS n_pairs, sl.slope, ic.intercept
        |FROM nn LEFT JOIN sl ON sl.event_type = nn.event_type
        |LEFT JOIN ic ON ic.event_type = nn.event_type
        |ORDER BY nn.event_type""".stripMargin,
    // q212: the same integer Holt fold as a RECURSIVE CTE — the new
    // level computed once in a derived table, then used in both state
    // slots. (A list_reduce struct lambda would be the natural replay,
    // but DuckDB 1.0.0 mis-evaluates struct lambdas whose fields share
    // a repeated subexpression — probed: (s,x)->{l: s.l+x.l,
    // t: (s.l+x.l)-s.t} over 3 elements returns t=8 where the fold
    // gives 4 — so the oracle recurses row-by-row instead.)
    "q212_holt_linear" ->
      """WITH RECURSIVE d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
        |      AS v6
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |ser AS (SELECT event_type, v6, row_number()
        |    OVER (PARTITION BY event_type ORDER BY day) AS rn FROM d),
        |rec AS (
        |  SELECT s1.event_type, CAST(1 AS BIGINT) AS rn,
        |      s1.v6 AS l, CAST(coalesce(s2.v6 - s1.v6, 0) AS BIGINT) AS t
        |    FROM ser s1 LEFT JOIN ser s2
        |      ON s2.event_type = s1.event_type AND s2.rn = 2
        |    WHERE s1.rn = 1
        |  UNION ALL
        |  SELECT event_type, rn, lnew, (1 * (lnew - l) + 7 * t) // 8
        |    FROM (SELECT r.event_type, r.rn + 1 AS rn, r.l, r.t,
        |        (1 * s.v6 + 3 * (r.l + r.t)) // 4 AS lnew
        |      FROM rec r JOIN ser s ON s.event_type = r.event_type
        |        AND s.rn = r.rn + 1)),
        |nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_periods
        |  FROM ser GROUP BY 1)
        |SELECT r.event_type, nn.n_periods,
        |  r.l AS level_e6, r.t AS trend_e6,
        |  CAST(r.l AS DOUBLE) / 1e6 AS level,
        |  CAST(r.t AS DOUBLE) / 1e6 AS trend,
        |  CAST(r.l + r.t AS DOUBLE) / 1e6 AS forecast_1
        |FROM rec r JOIN nn ON nn.event_type = r.event_type
        |  AND r.rn = nn.n_periods
        |ORDER BY r.event_type""".stripMargin,
    // q211: identical rank cut (row_number over score DESC, doc_id),
    // integer floor-division buckets, the same fixed-order quotients
    "q211_gains_table" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cal'),
        |      1, 5)) AS BIGINT) % 1000000 AS cal,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':lbl'),
        |      1, 5)) AS BIGINT) % 1000000 AS lbl
        |  FROM documents),
        |s AS (SELECT doc_id, CAST(cal AS DOUBLE) / 1e6 AS score,
        |    (lbl < cal) AS y FROM d),
        |r AS (SELECT y, row_number() OVER (ORDER BY score DESC, doc_id)
        |    - 1 AS rnk FROM s),
        |b AS (SELECT CAST((rnk * 10) // (SELECT count(*) FROM r)
        |      AS INTEGER) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        |  FROM r GROUP BY 1),
        |c AS (SELECT bucket, n_rows, n_pos,
        |    sum(n_rows) OVER wc AS crows, sum(n_pos) OVER wc AS cpos,
        |    sum(n_rows) OVER () AS trows, sum(n_pos) OVER () AS tpos
        |  FROM b WINDOW wc AS (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT bucket, n_rows, n_pos,
        |  CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE) AS pos_rate,
        |  CASE WHEN tpos = 0 THEN NULL
        |       ELSE CAST(n_pos AS DOUBLE) / CAST(tpos AS DOUBLE) END
        |    AS capture,
        |  CASE WHEN tpos = 0 THEN NULL
        |       ELSE CAST(cpos AS DOUBLE) / CAST(tpos AS DOUBLE) END
        |    AS cum_capture,
        |  CASE WHEN tpos = 0 THEN NULL
        |       ELSE (CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE)) /
        |         (CAST(tpos AS DOUBLE) / CAST(trows AS DOUBLE)) END
        |    AS lift,
        |  CASE WHEN tpos = 0 THEN NULL
        |       ELSE (CAST(cpos AS DOUBLE) / CAST(crows AS DOUBLE)) /
        |         (CAST(tpos AS DOUBLE) / CAST(trows AS DOUBLE)) END
        |    AS cum_lift
        |FROM c ORDER BY bucket""".stripMargin,
    // q241: q100's BOS-padded bigram stream verbatim, the same exact
    // marginals, the identical (max/div + (mul/div)*(div)) IEEE shape
    "q241_kneser_ney" ->
      """WITH tks AS (SELECT doc_id,
        |    list_filter(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |      x -> x <> '') AS tk
        |  FROM documents),
        |bg AS (SELECT doc_id, i,
        |    CASE WHEN i = 1 THEN '<s>' ELSE tk[i-1] END AS prev, tk[i] AS cur
        |  FROM (SELECT doc_id, tk,
        |        unnest(generate_series(1, len(tk))) AS i
        |        FROM tks WHERE len(tk) >= 1)),
        |cnt AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c
        |  FROM bg GROUP BY 1, 2),
        |ctx AS (SELECT prev, CAST(sum(c) AS BIGINT) AS c_prev,
        |    CAST(count(*) AS BIGINT) AS n_cont_prev FROM cnt GROUP BY 1),
        |hist AS (SELECT cur, CAST(count(*) AS BIGINT) AS n_hist_cur
        |  FROM cnt GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS n_bigram_types FROM cnt)
        |SELECT cnt.prev, cnt.cur, c AS c_bigram, c_prev, n_cont_prev,
        |  n_hist_cur, n_bigram_types,
        |  greatest(CAST(c AS DOUBLE) - 0.75e0, 0.0e0)
        |      / CAST(c_prev AS DOUBLE)
        |    + ((0.75e0 * CAST(n_cont_prev AS DOUBLE))
        |        / CAST(c_prev AS DOUBLE))
        |      * (CAST(n_hist_cur AS DOUBLE)
        |        / CAST(n_bigram_types AS DOUBLE)) AS p_kn
        |FROM cnt JOIN ctx USING (prev) JOIN hist USING (cur)
        |CROSS JOIN tt ORDER BY prev, cur""".stripMargin,
    // q234: q102's tokenizer, same count-of-counts, same r+1 self-join
    // and fixed divisions
    "q234_good_turing" ->
      """WITH tks AS (SELECT list_filter(string_split(trim(regexp_replace(
        |      regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |      ' +', ' ', 'g')), ' '), x -> x <> '') AS tk
        |  FROM documents),
        |cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS r
        |  FROM (SELECT unnest(tk) AS w FROM tks) GROUP BY 1),
        |coc AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r
        |  FROM cnt GROUP BY 1),
        |tot AS (SELECT sum(CAST(r AS HUGEINT) * CAST(n_r AS HUGEINT))
        |    AS n,
        |    CAST(sum(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT)
        |      AS n1
        |  FROM coc)
        |SELECT a.r, a.n_r,
        |  CASE WHEN b.n_r IS NULL THEN NULL
        |       ELSE CAST(a.r + 1 AS DOUBLE) * CAST(b.n_r AS DOUBLE) /
        |         CAST(a.n_r AS DOUBLE) END AS r_star,
        |  CAST(tot.n1 AS DOUBLE) / CAST(CAST(tot.n AS VARCHAR)
        |    AS DOUBLE) AS p0_unseen
        |FROM coc a LEFT JOIN coc b ON b.r = a.r + 1
        |CROSS JOIN tot ORDER BY a.r""".stripMargin,
    // q233: same (length, count) cells, length-ordered list folds of
    // the identical ln terms, same floor-rounds
    "q233_lognormal_fit" ->
      """WITH cells AS (SELECT source, CAST(n_chars AS BIGINT) AS l,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents WHERE source IS NOT NULL
        |    AND n_chars IS NOT NULL AND n_chars > 0
        |  GROUP BY 1, 2),
        |f AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(list(struct_pack(l := l, c := c)
        |          ORDER BY l),
        |        s -> CAST(s.c AS DOUBLE) * ln(CAST(s.l AS DOUBLE)))),
        |      (a, b) -> a + b) AS s1,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(list(struct_pack(l := l, c := c)
        |          ORDER BY l),
        |        s -> CAST(s.c AS DOUBLE) * (ln(CAST(s.l AS DOUBLE)) *
        |          ln(CAST(s.l AS DOUBLE))))),
        |      (a, b) -> a + b) AS s2
        |  FROM cells GROUP BY 1)
        |SELECT source, n, n_distinct,
        |  floor(s1 / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000
        |    AS mu,
        |  floor((s2 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE)) *
        |    (s1 / CAST(n AS DOUBLE))) * 1000000 + 0.5) / 1000000
        |    AS sigma2,
        |  floor(exp(s1 / CAST(n AS DOUBLE)) * 1000000 + 0.5) / 1000000
        |    AS median_fit
        |FROM f ORDER BY source""".stripMargin,
    // q232: same lead() matrix, destination-ordered list fold of the
    // identical ln terms, same floor-round and clamp
    "q232_transition_entropy" ->
      """WITH ev AS (SELECT user_id, ts, event_id, event_type
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL),
        |p AS (SELECT event_type AS s, lead(event_type)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d
        |  FROM ev),
        |m AS (SELECT s, d, CAST(count(*) AS BIGINT) AS n FROM p
        |  WHERE d IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT s AS state, CAST(sum(n) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS n_dest,
        |    list(n ORDER BY d) AS arr
        |  FROM m GROUP BY 1)
        |SELECT state, total, n_dest,
        |  greatest(floor(-list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(arr, x ->
        |      CAST(x AS DOUBLE) / CAST(total AS DOUBLE) *
        |        ln(CAST(x AS DOUBLE) / CAST(total AS DOUBLE)))),
        |    (a, b) -> a + b) * 1000000 + 0.5) / 1000000, 0.0)
        |    AS h_nats
        |FROM f ORDER BY state""".stripMargin,
    // q231: same md5 noise rule, same marginal-product pe, identical
    // kappa arithmetic
    "q231_cohens_kappa" ->
      """WITH r AS (SELECT lang AS a,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |        || ':rate'), 1, 5)) AS BIGINT) % 1000000 < 200000
        |      THEN 'x_' || lang ELSE lang END AS b
        |  FROM documents WHERE lang IS NOT NULL),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_agree
        |  FROM r),
        |ra AS (SELECT a AS l, CAST(count(*) AS BIGINT) AS ra
        |  FROM r GROUP BY 1),
        |cb AS (SELECT b AS l, CAST(count(*) AS BIGINT) AS cb
        |  FROM r GROUP BY 1),
        |pe AS (SELECT coalesce(sum(CAST(ra.ra AS HUGEINT) *
        |    CAST(cb.cb AS HUGEINT)), 0) AS pe_num
        |  FROM ra JOIN cb ON cb.l = ra.l)
        |SELECT n, n_agree,
        |  CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
        |  CAST(CAST(pe_num AS VARCHAR) AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe,
        |  CASE WHEN CAST(CAST(pe_num AS VARCHAR) AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) = 1.0 THEN NULL
        |    ELSE (CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) -
        |        CAST(CAST(pe_num AS VARCHAR) AS DOUBLE) /
        |          (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) /
        |      (1.0 - CAST(CAST(pe_num AS VARCHAR) AS DOUBLE) /
        |        (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) END AS kappa
        |FROM tot CROSS JOIN pe""".stripMargin,
    // q229: the same two lag self-joins, exact absolute errors, the
    // same fixed-order MAE quotients
    "q229_seasonal_skill" ->
      """WITH d AS (SELECT event_type,
        |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
        |      AS BIGINT) AS i,
        |    CAST(count(*) AS BIGINT) * 1000000 AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |e1 AS (SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_naive,
        |    CAST(sum(abs(a.y - b.y)) AS BIGINT) AS se1
        |  FROM d a JOIN d b ON b.event_type = a.event_type
        |    AND b.i + 1 = a.i GROUP BY 1),
        |e7 AS (SELECT a.event_type,
        |    CAST(count(*) AS BIGINT) AS n_seasonal,
        |    CAST(sum(abs(a.y - b.y)) AS BIGINT) AS se7
        |  FROM d a JOIN d b ON b.event_type = a.event_type
        |    AND b.i + 7 = a.i GROUP BY 1),
        |al AS (SELECT DISTINCT event_type FROM d)
        |SELECT al.event_type,
        |  coalesce(n_naive, 0) AS n_naive,
        |  coalesce(n_seasonal, 0) AS n_seasonal,
        |  (CAST(se1 AS DOUBLE) / 1e6) / CAST(n_naive AS DOUBLE)
        |    AS mae_naive,
        |  (CAST(se7 AS DOUBLE) / 1e6) / CAST(n_seasonal AS DOUBLE)
        |    AS mae_seasonal,
        |  CASE WHEN n_naive IS NULL OR n_seasonal IS NULL OR se1 = 0
        |    THEN NULL
        |    ELSE ((CAST(se7 AS DOUBLE) / 1e6) /
        |        CAST(n_seasonal AS DOUBLE)) /
        |      ((CAST(se1 AS DOUBLE) / 1e6) / CAST(n_naive AS DOUBLE))
        |      END AS mase
        |FROM al LEFT JOIN e1 ON e1.event_type = al.event_type
        |LEFT JOIN e7 ON e7.event_type = al.event_type
        |ORDER BY al.event_type""".stripMargin,
    // q230: same probe fan-out over generate_series lags, HUGEINT
    // sufficient sums with VARCHAR-routed casts, identical r formula
    "q230_cross_correlation" ->
      """WITH p AS (SELECT
        |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
        |      AS BIGINT) AS i,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) * 1000000 AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) * 1000000 AS y
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |pr AS (SELECT p.x, l.lag, p.i + l.lag AS i2
        |  FROM p CROSS JOIN (SELECT unnest(generate_series(-7, 7))
        |    AS lag) l),
        |pairs AS (SELECT pr.lag, pr.x, b.y FROM pr
        |  JOIN p b ON b.i = pr.i2),
        |s AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
        |      AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
        |      AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
        |      AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM pairs GROUP BY 1),
        |k AS (SELECT lag, n,
        |    CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) *
        |      CAST(sy AS DOUBLE) AS num,
        |    CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) *
        |      CAST(sx AS DOUBLE) AS denx,
        |    CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) *
        |      CAST(sy AS DOUBLE) AS deny
        |  FROM s)
        |SELECT CAST(lag AS INTEGER) AS lag, n,
        |  CASE WHEN denx = 0 OR deny = 0 THEN NULL
        |       ELSE num / (sqrt(denx) * sqrt(deny)) END AS r
        |FROM k ORDER BY lag""".stripMargin,
    // q228: same prefix-sum windows, same fixed-order SSE doubles,
    // (cost, idx) argmin via ORDER BY + row_number
    "q228_change_point" ->
      """WITH d AS (SELECT event_type,
        |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
        |      AS BIGINT) AS i,
        |    CAST(count(*) AS BIGINT) * 1000000 AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |p AS (SELECT event_type, i,
        |    count(*) OVER wc AS cn, sum(y) OVER wc AS sy,
        |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) OVER wc AS syy,
        |    count(*) OVER wa AS n, sum(y) OVER wa AS ty,
        |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) OVER wa AS tyy
        |  FROM d WINDOW
        |    wc AS (PARTITION BY event_type ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wa AS (PARTITION BY event_type
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
        |c AS (SELECT event_type, i, n,
        |    (CAST(CAST(syy AS VARCHAR) AS DOUBLE) -
        |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) /
        |        CAST(cn AS DOUBLE)) +
        |    (CAST(CAST(tyy - syy AS VARCHAR) AS DOUBLE) -
        |      CAST(ty - sy AS DOUBLE) * CAST(ty - sy AS DOUBLE) /
        |        CAST(n - cn AS DOUBLE)) AS cost,
        |    CAST(CAST(tyy AS VARCHAR) AS DOUBLE) -
        |      CAST(ty AS DOUBLE) * CAST(ty AS DOUBLE) /
        |        CAST(n AS DOUBLE) AS sse_total
        |  FROM p WHERE cn < n),
        |r AS (SELECT event_type, CAST(n AS BIGINT) AS n, i, cost,
        |    sse_total, row_number() OVER (PARTITION BY event_type
        |      ORDER BY cost, i) AS rk
        |  FROM c)
        |SELECT event_type, n, i AS split_idx, sse_total,
        |  cost AS sse_split, sse_total - cost AS gain
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,
    // q227: q102's tokenizer, the same lcm-scaled harmonic weights via
    // a CASE lookup, same canonicalization and rank order
    "q227_glove_cooc" ->
      """WITH tks AS (SELECT list_filter(string_split(trim(regexp_replace(
        |      regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |      ' +', ' ', 'g')), ' '), x -> x <> '') AS tk
        |  FROM documents),
        |pos AS (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
        |  FROM tks WHERE len(tk) >= 2),
        |pr AS (SELECT least(tk[i], tk[i + d.d]) AS a,
        |    greatest(tk[i], tk[i + d.d]) AS b,
        |    CAST(CASE d.d WHEN 1 THEN 12 WHEN 2 THEN 6 WHEN 3 THEN 4
        |      ELSE 3 END AS BIGINT) AS w
        |  FROM pos CROSS JOIN (SELECT unnest(generate_series(1, 4))
        |    AS d) d
        |  WHERE i + d.d <= len(tk)),
        |m AS (SELECT a || ' ' || b AS gram,
        |    CAST(sum(w) AS BIGINT) AS cooc_scaled
        |  FROM pr GROUP BY a, b HAVING sum(w) >= 24),
        |h AS (SELECT gram, cooc_scaled,
        |    CAST(cooc_scaled AS DOUBLE) / 12.0 AS cooc,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, len(gram)),
        |        j -> CAST(unicode(gram[j]) AS BIGINT))),
        |      (x, y) -> (x * 257 + y) % 1000000007) AS th
        |  FROM m),
        |r AS (SELECT gram, cooc_scaled, cooc,
        |    row_number() OVER (ORDER BY cooc_scaled DESC, th, gram)
        |      AS rank FROM h)
        |SELECT CAST(rank AS INTEGER) AS rank, gram, cooc_scaled, cooc
        |FROM r WHERE rank <= 100 ORDER BY rank""".stripMargin,
    // q226: same classes, same null-as-value diversity rule, exact
    // below-k/low-diversity row masses
    "q226_k_anonymity" ->
      """WITH cls AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(CAST(c_acctbal AS DOUBLE) / 100.0) AS BIGINT)
        |      AS bb,
        |    CAST(count(*) AS BIGINT) AS sz,
        |    CAST(count(DISTINCT c_custkey) +
        |      max(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS dv
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(sz) AS BIGINT) AS min_class_size,
        |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
        |    AS n_rows_below_k,
        |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE) /
        |    CAST(sum(sz) AS DOUBLE) AS share_below_k,
        |  CAST(sum(CASE WHEN dv < 2 THEN sz ELSE 0 END) AS BIGINT)
        |    AS n_rows_low_diversity,
        |  CAST(sum(CASE WHEN dv < 2 THEN sz ELSE 0 END) AS DOUBLE) /
        |    CAST(sum(sz) AS DOUBLE) AS share_low_diversity
        |FROM cls""".stripMargin,
    // q225: same first-week cohorts, same micro-unit cells, identical
    // cumulative window and divisions
    "q225_ltv_curve" ->
      """WITH b AS (SELECT user_id AS u,
        |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) /
        |      (86400000000.0 * 7)) AS BIGINT) AS p,
        |    coalesce(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
        |      AS BIGINT), 0) AS v6
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |co AS (SELECT u, min(p) AS cohort FROM b GROUP BY 1),
        |sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
        |  FROM co GROUP BY 1),
        |cells AS (SELECT co.cohort, b.p - co.cohort AS age,
        |    CAST(sum(b.v6) AS BIGINT) AS r6
        |  FROM b JOIN co ON co.u = b.u GROUP BY 1, 2),
        |cum AS (SELECT cohort, age, r6,
        |    CAST(sum(r6) OVER (PARTITION BY cohort ORDER BY age
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS c6
        |  FROM cells)
        |SELECT cum.cohort, cum.age, sz.cohort_size,
        |  CAST(r6 AS DOUBLE) / 1e6 AS revenue,
        |  CAST(c6 AS DOUBLE) / 1e6 AS cum_revenue,
        |  (CAST(c6 AS DOUBLE) / 1e6) / CAST(sz.cohort_size AS DOUBLE)
        |    AS ltv
        |FROM cum JOIN sz ON sz.cohort = cum.cohort
        |ORDER BY cum.cohort, cum.age""".stripMargin,
    // q224: same planted grid, same lag() gaps, same HUGEINT flag
    // inequality, VARCHAR-routed sqrt operand
    "q224_bot_regularity" ->
      """WITH ev AS (SELECT user_id, event_id, ts, row_number()
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |pl AS (SELECT user_id, event_id,
        |    CASE WHEN user_id % 37 = 0
        |      THEN make_timestamp(rn * 60000000) ELSE ts END AS ts2
        |  FROM ev),
        |g AS (SELECT user_id AS u, epoch_us(ts2) - lag(epoch_us(ts2))
        |    OVER (PARTITION BY user_id ORDER BY ts2, event_id) AS gp
        |  FROM pl),
        |sums AS (SELECT u, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(sum(gp) AS BIGINT) AS sg,
        |    sum(CAST(gp AS HUGEINT) * CAST(gp AS HUGEINT)) AS sgg
        |  FROM g WHERE gp IS NOT NULL GROUP BY 1),
        |fl AS (SELECT u, n_gaps, sg,
        |    CAST(n_gaps AS HUGEINT) * sgg -
        |      CAST(sg AS HUGEINT) * CAST(sg AS HUGEINT) AS num
        |  FROM sums)
        |SELECT u AS "user", n_gaps,
        |  CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_us,
        |  sqrt(CAST(CAST(num AS VARCHAR) AS DOUBLE)) /
        |    CAST(sg AS DOUBLE) AS cv
        |FROM fl
        |WHERE n_gaps >= 5 AND sg > 0
        |  AND num * 10000 < 100 * CAST(sg AS HUGEINT) * CAST(sg AS HUGEINT)
        |ORDER BY "user"""".stripMargin,
    // q223: same lead() adjacency, same integer rarity rule, same
    // fixed min_prob division
    "q223_rare_transitions" ->
      """WITH ev AS (SELECT user_id, ts, event_id,
        |    CASE WHEN event_id % 97 = 0 THEN 'rare_evt'
        |         ELSE event_type END AS state
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL),
        |p AS (SELECT user_id AS u, state AS s,
        |    lead(state) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS d
        |  FROM ev),
        |pairs AS (SELECT u, s, d FROM p WHERE d IS NOT NULL),
        |m AS (SELECT s, d, CAST(count(*) AS BIGINT) AS n
        |  FROM pairs GROUP BY 1, 2),
        |t AS (SELECT s, CAST(sum(n) AS BIGINT) AS tot FROM m GROUP BY 1),
        |c AS (SELECT m.s, m.d, m.n, t.tot FROM m JOIN t ON t.s = m.s),
        |agg AS (SELECT pairs.u AS "user",
        |    CAST(count(*) AS BIGINT) AS n_transitions,
        |    CAST(sum(CASE WHEN c.n * 50 < c.tot THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_rare,
        |    min(CAST(c.n AS DOUBLE) / CAST(c.tot AS DOUBLE)) AS min_prob
        |  FROM pairs JOIN c ON c.s = pairs.s AND c.d = pairs.d
        |  GROUP BY 1)
        |SELECT * FROM agg WHERE n_rare >= 1 ORDER BY "user"""".stripMargin,
    // q222: same first-conversion join, same shifted-integer weights
    // (BIGINT << on the same k), VARCHAR-routed decimal sums
    "q222_time_decay" -> {
      val hl = 7L * 86400000000L
      s"""WITH base AS (SELECT user_id, ts, event_type FROM events
         |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         |fc AS (SELECT user_id, min(ts) AS fc FROM base
         |  WHERE event_type = 'purchase' GROUP BY 1),
         |w AS (SELECT b.event_type AS channel,
         |    CASE WHEN (epoch_us(fc.fc) - epoch_us(b.ts)) // $hl <= 62
         |      THEN (CAST(1 AS BIGINT) << CAST(62 -
         |        (epoch_us(fc.fc) - epoch_us(b.ts)) // $hl AS INTEGER))
         |      ELSE CAST(0 AS BIGINT) END AS wgt
         |  FROM base b JOIN fc ON fc.user_id = b.user_id
         |  WHERE b.event_type <> 'purchase' AND b.ts < fc.fc),
         |per AS (SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
         |    sum(CAST(wgt AS HUGEINT)) AS ws FROM w GROUP BY 1),
         |tot AS (SELECT sum(ws) AS wt FROM per)
         |SELECT channel, n_touches,
         |  CAST(CAST(ws AS VARCHAR) AS DOUBLE) /
         |    CAST(4611686018427387904 AS DOUBLE) AS weight,
         |  CASE WHEN wt = 0 THEN NULL
         |       ELSE CAST(CAST(ws AS VARCHAR) AS DOUBLE) /
         |         CAST(CAST(wt AS VARCHAR) AS DOUBLE) END AS share
         |FROM per CROSS JOIN tot ORDER BY channel""".stripMargin
    },
    // q221: same per-user metrics, same rank cuts (row_number with the
    // user tiebreak), VARCHAR-routed monetary sums
    "q221_rfm_segments" ->
      """WITH pu AS (SELECT user_id AS u,
        |    max(CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
        |      AS BIGINT)) AS lastday,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(coalesce(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
        |      AS BIGINT), 0)) AS BIGINT) AS mon6
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |mx AS (SELECT max(lastday) AS maxd FROM pu),
        |mt AS (SELECT u, mx.maxd - lastday AS rec, freq, mon6
        |  FROM pu CROSS JOIN mx),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM mt),
        |r AS (SELECT u, CAST((row_number() OVER (ORDER BY rec DESC, u)
        |    - 1) * 5 // (SELECT n FROM nn) + 1 AS INTEGER) AS r_score
        |  FROM mt),
        |f AS (SELECT u, CAST((row_number() OVER (ORDER BY freq, u)
        |    - 1) * 5 // (SELECT n FROM nn) + 1 AS INTEGER) AS f_score
        |  FROM mt),
        |m AS (SELECT u, CAST((row_number() OVER (ORDER BY mon6, u)
        |    - 1) * 5 // (SELECT n FROM nn) + 1 AS INTEGER) AS m_score
        |  FROM mt)
        |SELECT r.r_score, f.f_score, m.m_score,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(CAST(sum(mt.mon6) AS VARCHAR) AS DOUBLE) / 1e6
        |    AS monetary
        |FROM mt JOIN r ON r.u = mt.u JOIN f ON f.u = mt.u
        |JOIN m ON m.u = mt.u
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // q220: per-rule distinct counts with the same null-as-value flag,
    // unioned — replayed as one CTE per rule
    "q220_fd_violations" -> {
      def rule(det: String, dep: String): String =
        s"""SELECT '$det' AS determinant, '$dep' AS dependent,
           |  CAST(count(*) AS BIGINT) AS n_keys,
           |  CAST(sum(CASE WHEN vals > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating,
           |  CASE WHEN count(*) = 0 THEN NULL
           |       ELSE CAST(sum(CASE WHEN vals > 1 THEN 1 ELSE 0 END)
           |           AS DOUBLE) / CAST(count(*) AS DOUBLE) END
           |    AS violation_rate,
           |  CAST(max(vals) AS BIGINT) AS max_values_per_key
           |FROM (SELECT $det,
           |    count(DISTINCT $dep) +
           |      max(CASE WHEN $dep IS NULL THEN 1 ELSE 0 END) AS vals
           |  FROM lineitem WHERE $det IS NOT NULL GROUP BY $det)"""
          .stripMargin
      Seq("l_orderkey" -> "l_returnflag", "l_orderkey" -> "l_linestatus",
        "l_partkey" -> "l_suppkey", "l_suppkey" -> "l_returnflag")
        .map { case (a, b) => rule(a, b) }
        .mkString("", "\nUNION ALL\n",
          "\nORDER BY determinant, dependent")
    },
    // q219: the same fan-out (generate_series over 7 target days),
    // re-distinct, spine semi-join, exact counts
    "q219_stickiness" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
        |      AS BIGINT) AS d
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |spine AS (SELECT DISTINCT d FROM a),
        |dau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS dau
        |  FROM a GROUP BY 1),
        |f AS (SELECT DISTINCT u, unnest(generate_series(d, d + 6))
        |    AS day FROM a),
        |wau AS (SELECT f.day, CAST(count(*) AS BIGINT) AS wau
        |  FROM f WHERE f.day IN (SELECT d FROM spine) GROUP BY 1)
        |SELECT dau.day, dau.dau, wau.wau,
        |  CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE)
        |    AS stickiness
        |FROM dau JOIN wau ON wau.day = dau.day
        |ORDER BY dau.day""".stripMargin,
    // q210: same distinct (user, week) lattice, lag/lead status rules,
    // churn shifted one period forward and capped at the horizon
    "q210_growth_accounting" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |    CAST(floor(epoch_us(ts) / (86400000000.0 * 7)) AS BIGINT) AS p
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |m AS (SELECT u, p,
        |    lag(p) OVER (PARTITION BY u ORDER BY p) AS prv,
        |    lead(p) OVER (PARTITION BY u ORDER BY p) AS nxt
        |  FROM a),
        |st AS (SELECT p, CASE WHEN prv IS NULL THEN 'new'
        |      WHEN prv = p - 1 THEN 'retained'
        |      ELSE 'resurrected' END AS s
        |  FROM m
        |  UNION ALL
        |  SELECT p + 1, 'churned' FROM m
        |  WHERE (nxt IS NULL OR nxt > p + 1)
        |    AND p + 1 <= (SELECT max(p) FROM a)),
        |c AS (SELECT p AS period,
        |    CAST(sum(CASE WHEN s = 'new' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_new,
        |    CAST(sum(CASE WHEN s = 'retained' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_retained,
        |    CAST(sum(CASE WHEN s = 'resurrected' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_resurrected,
        |    CAST(sum(CASE WHEN s = 'churned' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_churned
        |  FROM st GROUP BY 1)
        |SELECT period, n_new, n_retained, n_resurrected, n_churned,
        |  CASE WHEN n_churned = 0 THEN NULL
        |       ELSE CAST(n_new + n_resurrected AS DOUBLE) /
        |         CAST(n_churned AS DOUBLE) END AS quick_ratio
        |FROM c ORDER BY period""".stripMargin,
    // q209: BRUTE-FORCE replay — the oracle is deliberately the cross
    // join + distance filter, so a pass proves the grid join finds
    // every qualifying pair exactly once
    // q244: brute force + row_number over the same (dist_sq, r_id) order
    "q244_knn_within_radius" ->
      """WITH c AS (SELECT c_custkey AS lid,
        |    CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
        |      || ':cx'), 1, 6)) AS BIGINT) % 10000000 AS x,
        |    CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
        |      || ':cy'), 1, 6)) AS BIGINT) % 10000000 AS y
        |  FROM customer WHERE c_nationkey = 3),
        |s AS (SELECT s_suppkey AS rid,
        |    CAST(('0x' || substr(md5(CAST(s_suppkey AS VARCHAR)
        |      || ':sx'), 1, 6)) AS BIGINT) % 10000000 AS x,
        |    CAST(('0x' || substr(md5(CAST(s_suppkey AS VARCHAR)
        |      || ':sy'), 1, 6)) AS BIGINT) % 10000000 AS y
        |  FROM supplier),
        |cand AS (SELECT c.lid AS l_id, s.rid AS r_id,
        |    CAST((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
        |      AS BIGINT) AS dist_sq
        |  FROM c, s
        |  WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
        |    <= 1000000000000),
        |r AS (SELECT l_id, r_id, dist_sq, row_number()
        |    OVER (PARTITION BY l_id ORDER BY dist_sq, r_id) AS rank
        |  FROM cand)
        |SELECT l_id, CAST(rank AS INTEGER) AS rank, r_id, dist_sq
        |FROM r WHERE rank <= 3 ORDER BY l_id, rank""".stripMargin,
    // q298: six exact sums (n/Σv/Σv² per arm on the micro seam), then the
    // d/g chains mirrored division-for-division — no rounding
    "q298_cohens_d" ->
      """WITH u AS (SELECT user_id,
        |    sum(CAST(coalesce(CAST(value AS DECIMAL(18,6)), 0)
        |      AS DECIMAL(18,6))) AS y
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |units AS (SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)
        |      || ':ab'), 1, 1) >= '8' THEN 'treat' ELSE 'ctrl' END AS arm,
        |    CAST(CAST(y AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS v
        |  FROM u),
        |s AS (SELECT arm = 'treat' AS isa, count(*) AS n, sum(v) AS sv,
        |    sum(v * v) AS ssv
        |  FROM units GROUP BY 1),
        |p AS (SELECT
        |    CAST(coalesce(sum(CASE WHEN isa THEN n END), 0) AS BIGINT) AS n_a,
        |    CAST(coalesce(sum(CASE WHEN NOT isa THEN n END), 0) AS BIGINT)
        |      AS n_b,
        |    sum(CASE WHEN isa THEN sv END) AS sa,
        |    sum(CASE WHEN NOT isa THEN sv END) AS sb,
        |    sum(CASE WHEN isa THEN ssv END) AS ssa,
        |    sum(CASE WHEN NOT isa THEN ssv END) AS ssb
        |  FROM s),
        |c AS (SELECT n_a, n_b,
        |    CAST(sa AS DOUBLE) / CAST(1000000 AS DOUBLE)
        |      / CAST(n_a AS DOUBLE) AS mean_a,
        |    CAST(sb AS DOUBLE) / CAST(1000000 AS DOUBLE)
        |      / CAST(n_b AS DOUBLE) AS mean_b,
        |    sqrt((
        |      (CAST(ssa AS DOUBLE) / CAST(1000000000000 AS DOUBLE)
        |        - (CAST(sa AS DOUBLE) / CAST(1000000 AS DOUBLE))
        |          * (CAST(sa AS DOUBLE) / CAST(1000000 AS DOUBLE))
        |          / CAST(n_a AS DOUBLE))
        |      + (CAST(ssb AS DOUBLE) / CAST(1000000000000 AS DOUBLE)
        |        - (CAST(sb AS DOUBLE) / CAST(1000000 AS DOUBLE))
        |          * (CAST(sb AS DOUBLE) / CAST(1000000 AS DOUBLE))
        |          / CAST(n_b AS DOUBLE)))
        |      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
        |         - CAST(2 AS DOUBLE))) AS sp
        |  FROM p)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a > 0 THEN mean_a END AS mean_a,
        |  CASE WHEN n_b > 0 THEN mean_b END AS mean_b,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 THEN sp END AS pooled_sd,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND sp > CAST(0 AS DOUBLE)
        |    THEN (mean_a - mean_b) / sp END AS cohens_d,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND sp > CAST(0 AS DOUBLE)
        |    THEN (CAST(1 AS DOUBLE) - CAST(3 AS DOUBLE)
        |        / (CAST(4 AS DOUBLE) * (CAST(n_a AS DOUBLE)
        |           + CAST(n_b AS DOUBLE) - CAST(2 AS DOUBLE))
        |           - CAST(1 AS DOUBLE)))
        |      * ((mean_a - mean_b) / sp) END AS hedges_g
        |FROM c""".stripMargin,
    // q297: exact 2x2 cells per stratum, the six pooled sums as
    // stratum-ordered list folds, one fixed chain per output, 6dp floor;
    // z divides the ROUNDED log_or by the ROUNDED se (mirroring the
    // operator exactly)
    "q297_mantel_haenszel" ->
      """WITH u AS (SELECT user_id, max(CAST(value AS DECIMAL(18,6))) AS mx
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1),
        |units AS (SELECT u.user_id,
        |    substr(md5(CAST(u.user_id AS VARCHAR) || ':ab'), 1, 1) >= '8'
        |      AS treated,
        |    mx > CAST(50 AS DECIMAL(18,6)) AS outcome,
        |    c.c_nationkey AS st
        |  FROM u JOIN customer c ON c.c_custkey = u.user_id),
        |cells AS (SELECT st,
        |    sum(CASE WHEN treated AND outcome THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN treated AND NOT outcome THEN 1 ELSE 0 END) AS b,
        |    sum(CASE WHEN NOT treated AND outcome THEN 1 ELSE 0 END) AS c,
        |    sum(CASE WHEN NOT treated AND NOT outcome THEN 1 ELSE 0 END) AS d
        |  FROM units GROUP BY 1),
        |terms AS (SELECT st,
        |    CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
        |      / CAST(a + b + c + d AS DOUBLE) AS r,
        |    CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
        |      / CAST(a + b + c + d AS DOUBLE) AS s2,
        |    (CAST(a + d AS DOUBLE) / CAST(a + b + c + d AS DOUBLE))
        |      * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
        |         / CAST(a + b + c + d AS DOUBLE)) AS pr,
        |    (CAST(b + c AS DOUBLE) / CAST(a + b + c + d AS DOUBLE))
        |      * (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
        |         / CAST(a + b + c + d AS DOUBLE)) AS qs,
        |    (CAST(a + d AS DOUBLE) / CAST(a + b + c + d AS DOUBLE))
        |      * (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
        |         / CAST(a + b + c + d AS DOUBLE))
        |    + (CAST(b + c AS DOUBLE) / CAST(a + b + c + d AS DOUBLE))
        |      * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
        |         / CAST(a + b + c + d AS DOUBLE)) AS mid,
        |    a + b + c + d AS nu
        |  FROM cells),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(sum(nu) AS BIGINT) AS n_units,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(r ORDER BY st)), (x, y) -> x + y) AS rs,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(s2 ORDER BY st)), (x, y) -> x + y) AS ss,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(pr ORDER BY st)), (x, y) -> x + y) AS prs,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(qs ORDER BY st)), (x, y) -> x + y) AS qss,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(mid ORDER BY st)), (x, y) -> x + y) AS mids
        |  FROM terms),
        |o AS (SELECT n_strata, n_units,
        |    CASE WHEN rs > CAST(0 AS DOUBLE) AND ss > CAST(0 AS DOUBLE)
        |      THEN floor((rs / ss) * CAST(1000000 AS DOUBLE)
        |        + CAST(0.5 AS DOUBLE)) / CAST(1000000 AS DOUBLE)
        |    END AS or_mh,
        |    CASE WHEN rs > CAST(0 AS DOUBLE) AND ss > CAST(0 AS DOUBLE)
        |      THEN floor(ln(rs / ss) * CAST(1000000 AS DOUBLE)
        |        + CAST(0.5 AS DOUBLE)) / CAST(1000000 AS DOUBLE)
        |    END AS log_or,
        |    CASE WHEN rs > CAST(0 AS DOUBLE) AND ss > CAST(0 AS DOUBLE)
        |      THEN floor(sqrt(
        |          prs / (CAST(2 AS DOUBLE) * rs * rs)
        |          + mids / (CAST(2 AS DOUBLE) * rs * ss)
        |          + qss / (CAST(2 AS DOUBLE) * ss * ss))
        |        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |        / CAST(1000000 AS DOUBLE)
        |    END AS se_log_or
        |  FROM f)
        |SELECT n_strata, n_units, or_mh, log_or, se_log_or,
        |  CASE WHEN se_log_or > CAST(0 AS DOUBLE)
        |    THEN floor((log_or / se_log_or) * CAST(1000000 AS DOUBLE)
        |      + CAST(0.5 AS DOUBLE)) / CAST(1000000 AS DOUBLE)
        |  END AS z
        |FROM o""".stripMargin,
    // q296: the integer-state soundex fold replayed literally — the
    // state is prev·10⁴ + L·10³ + digits, h/w marked 7 in the translate
    // map, vowels reset prev, repeats collapse
    "q296_soundex_keys" ->
      """WITH ft AS (SELECT doc_id, string_split(text, ' ')[1] AS w
        |  FROM documents),
        |ls AS (SELECT doc_id, list_filter(string_split(lower(w), ''),
        |    ch -> ch >= 'a' AND ch <= 'z') AS l FROM ft),
        |cs AS (SELECT doc_id, l, list_transform(l, ch -> CAST(translate(ch,
        |    'abcdefghijklmnopqrstuvwxyz',
        |    '01230127022455012623017202') AS INT)) AS c FROM ls),
        |f AS (SELECT doc_id, l, CASE WHEN len(l) = 0 THEN NULL ELSE
        |    list_reduce(list_prepend(c[1] * 10000, c[2:]), (st, cc) -> CASE
        |      WHEN cc = 7 THEN st
        |      WHEN cc = 0 THEN st % 10000
        |      WHEN cc = st // 10000 THEN st
        |      WHEN (st % 10000) // 1000 = 3 THEN cc * 10000 + st % 10000
        |      ELSE cc * 10000 + ((st % 10000) // 1000 + 1) * 1000
        |        + (st % 1000) * 10 + cc END)
        |  END AS folded FROM cs)
        |SELECT doc_id, CASE WHEN folded IS NULL THEN NULL ELSE
        |  upper(l[1]) || rpad(CASE WHEN folded % 10000 < 1000 THEN ''
        |    ELSE CAST(folded % 1000 AS VARCHAR) END, 3, '0') END AS sx
        |FROM f ORDER BY doc_id""".stripMargin,
    // q294: the shared FS weights chain (see fsWeightsCtes)
    "q294_fs_weights" ->
      s"""WITH $fsWeightsCtes
         |SELECT field, n, n_distinct, u_num, u, m, w_agree, w_dis
         |FROM wts ORDER BY field""".stripMargin,
    // q295: q196's neighborhood replay scored with the q294 weights —
    // per-field IS NOT DISTINCT FROM picks w_agree else w_dis (NULL
    // w_dis → 0), declared field order, 4dp floor
    "q295_fs_scored_pairs" ->
      s"""WITH $fsWeightsCtes,
         |wp AS (SELECT
         |    max(CASE WHEN field = 'c_mktsegment' THEN w_agree END) AS wa1,
         |    coalesce(max(CASE WHEN field = 'c_mktsegment' THEN w_dis END),
         |      CAST(0 AS DOUBLE)) AS wd1,
         |    max(CASE WHEN field = 'c_nationkey' THEN w_agree END) AS wa2,
         |    coalesce(max(CASE WHEN field = 'c_nationkey' THEN w_dis END),
         |      CAST(0 AS DOUBLE)) AS wd2,
         |    max(CASE WHEN field = 'bal_bucket' THEN w_agree END) AS wa3,
         |    coalesce(max(CASE WHEN field = 'bal_bucket' THEN w_dis END),
         |      CAST(0 AS DOUBLE)) AS wd3
         |  FROM wts),
         |r AS (SELECT c_custkey AS id, c_name AS k FROM cst
         |  WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL),
         |rk AS (SELECT id, row_number() OVER (ORDER BY k, id) AS rnk FROM r),
         |g AS (SELECT unnest(generate_series(1, 2)) AS rank_gap),
         |p AS (SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
         |  FROM rk a CROSS JOIN g JOIN rk b ON b.rnk = a.rnk + g.rank_gap)
         |SELECT p.id_a, p.id_b,
         |  floor((CASE WHEN ca.c_mktsegment IS NOT DISTINCT FROM
         |        cb.c_mktsegment THEN wa1 ELSE wd1 END
         |      + CASE WHEN ca.c_nationkey IS NOT DISTINCT FROM
         |          cb.c_nationkey THEN wa2 ELSE wd2 END
         |      + CASE WHEN ca.bal_bucket IS NOT DISTINCT FROM
         |          cb.bal_bucket THEN wa3 ELSE wd3 END)
         |      * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
         |    / CAST(10000 AS DOUBLE) AS fs_score
         |FROM p JOIN cst ca ON ca.c_custkey = p.id_a
         |JOIN cst cb ON cb.c_custkey = p.id_b
         |CROSS JOIN wp
         |ORDER BY id_a, id_b""".stripMargin,
    // q293: the generated Newton-trajectory replay (see plattOracleSql)
    "q293_platt_scaling" -> plattOracleSql(4),
    // q292: the generated Poisson-weight replay (see bootstrapOracleSql)
    "q292_poisson_bootstrap" -> bootstrapOracleSql(),
    "q292s_poisson_bootstrap_sampled" -> bootstrapOracleSql(sampled = true),
    // q291: the generated σ-BFS + dependency-fold replay (see
    // betweennessOracleCtes)
    "q291_betweenness" ->
      s"""WITH ${betweennessOracleCtes(3)}
         |SELECT node, CAST(count(*) AS BIGINT) AS n_landmarks,
         |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list(delta ORDER BY lm)), (acc, t) -> acc + t) AS betweenness
         |FROM alld GROUP BY node ORDER BY node""".stripMargin,
    // q286: the wedge generation replayed relationally — canonical edges,
    // full-graph degrees, capped centers, pair rollup with // (floor ≡
    // Spark DIV on positives), NOT EXISTS against the edge set, HUGEINT
    // resource-allocation sums
    "q286_link_prediction" -> linkPredictionOracleSql(sampled = false),
    "q286s_link_prediction_sampled" -> linkPredictionOracleSql(sampled = true),
    // q269: q249's unrolled LPA rounds feeding the exact Q*4m^2 sum
    // (HUGEINT terms, community-ordered index fold, one final division)
    // q271: the louvainOracleCtes two-level chain replayed verbatim —
    // per round the exact HUGEINT gain table, g DESC / min-label argmax
    // (Spark's min(struct(-g, l))), the singleton guard; coarsen between
    // levels; final labels = min original member
    "q271_louvain" ->
      s"""WITH $louvainOracleCtes
         |SELECT node, label FROM fin ORDER BY node""".stripMargin,
    // q272: q269's exact Q*4m^2 fold over the q271 Louvain partition
    // (fold is order-free in exact integers; deg1/2 = unweighted degree
    // since level-1 weights are all 1)
    "q272_louvain_modularity" ->
      s"""WITH $louvainOracleCtes,
         |$louvainModularityTailSql""".stripMargin,
    // q271s/q272s: the same two-level chain over the 25% md5 order
    // sample (the s-variant convention — Louvain cost is rounds × edges,
    // so the quarter graph bounds the sf1.0 exposure)
    "q271s_louvain_sampled" ->
      s"""WITH ${louvainGraphOracleCtes(weighted = false, sampleHex = Some("40"))}
         |SELECT node, label FROM fin ORDER BY node""".stripMargin,
    "q272s_louvain_modularity_sampled" ->
      s"""WITH ${louvainGraphOracleCtes(weighted = false, sampleHex = Some("40"))},
         |$louvainModularityTailSql""".stripMargin,
    // q300: the weighted chain — e0 carries the co-purchase count, ce
    // coarsens by sum(w); labels gate over original part ids
    "q300_louvain_weighted" ->
      s"""WITH ${louvainGraphOracleCtes(weighted = true, sampleHex = None)}
         |SELECT node, label FROM fin ORDER BY node""".stripMargin,
    "q269_modularity" -> {
      val rounds = (1 to 3).map { i =>
        val prev = if (i == 1) "l0" else s"l${i - 1}"
        s"""c$i AS (SELECT e.u AS node, l.label AS lbl,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM e JOIN $prev l ON l.node = e.v GROUP BY 1, 2),
           |l$i AS (SELECT node, lbl AS label FROM (
           |    SELECT node, lbl, row_number()
           |      OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
           |    FROM c$i) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
         |  FROM lineitem WHERE l_orderkey % 20 = 0),
         |e AS (SELECT DISTINCT a.sk AS u, b.sk AS v
         |  FROM li a JOIN li b ON a.ok = b.ok WHERE a.sk <> b.sk),
         |nodes AS (SELECT DISTINCT u AS node FROM e),
         |l0 AS (SELECT node, node AS label FROM nodes),
         |$rounds,
         |canon AS (SELECT DISTINCT least(u, v) AS cu, greatest(u, v) AS cv
         |  FROM e),
         |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
         |    SELECT cu AS node FROM canon
         |    UNION ALL SELECT cv FROM canon) GROUP BY 1),
         |degc AS (SELECT l.label AS lb, CAST(sum(deg.d) AS BIGINT) AS dc,
         |    CAST(count(*) AS BIGINT) AS nc
         |  FROM deg JOIN l3 l ON l.node = deg.node GROUP BY 1),
         |intra AS (SELECT lu.label AS lb, CAST(count(*) AS BIGINT) AS ec
         |  FROM canon JOIN l3 lu ON lu.node = canon.cu
         |  JOIN l3 lv ON lv.node = canon.cv
         |  WHERE lu.label = lv.label GROUP BY 1),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM canon),
         |per AS (SELECT degc.lb, degc.nc, degc.dc,
         |    coalesce(intra.ec, 0) AS ec
         |  FROM degc LEFT JOIN intra ON intra.lb = degc.lb),
         |f AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
         |    CAST(sum(nc) AS BIGINT) AS n_nodes,
         |    list(ec ORDER BY lb) AS lec, list(dc ORDER BY lb) AS ldc
         |  FROM per)
         |SELECT f.n_nodes, mm.m AS m_edges, f.n_communities,
         |  CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
         |    list_transform(generate_series(1, len(f.lec)), i ->
         |      CAST(4 AS HUGEINT) * mm.m * f.lec[i]
         |        - CAST(f.ldc[i] AS HUGEINT) * f.ldc[i])),
         |    (x, y) -> x + y) AS BIGINT) AS q_num_e,
         |  CASE WHEN mm.m = 0 THEN NULL
         |    ELSE CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
         |      list_transform(generate_series(1, len(f.lec)), i ->
         |        CAST(4 AS HUGEINT) * mm.m * f.lec[i]
         |          - CAST(f.ldc[i] AS HUGEINT) * f.ldc[i])),
         |      (x, y) -> x + y) AS DOUBLE)
         |      / (CAST(4 AS DOUBLE) * CAST(mm.m AS DOUBLE)
         |         * CAST(mm.m AS DOUBLE))
         |  END AS modularity
         |FROM f CROSS JOIN mm""".stripMargin
    },
    // q283: whole-corpus shortlist + exact re-rank == brute force
    // (q41's oracle verbatim)
    "q283_ann_pq" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_inner_product(e.v, q.qv)
        |      / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(q.qv, q.qv)))
        |      AS score
        |  FROM e CROSS JOIN q),
        |ranked AS (SELECT query_id, neighbor_id, score,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, score
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // q281: identical shift/mask Morton interleave (term-for-term), the
    // same closed-form z // 65536 bucket split, exact min/max spans
    "q281_zorder_audit" -> {
      val terms = (0 until 10).map(j =>
        s"(((x >> $j) & 1) * ${1L << (2 * j)}) + " +
          s"(((y >> $j) & 1) * ${1L << (2 * j + 1)})").mkString(" + ")
      s"""WITH e AS (SELECT user_id % 1024 AS x,
         |    (epoch_us(ts) // 3600000000) % 1024 AS y
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |z AS (SELECT x, y, ($terms) AS zv FROM e),
         |b AS (SELECT x, y, zv // 65536 AS bucket FROM z)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
         |  min(x) AS x_min, max(x) AS x_max,
         |  min(y) AS y_min, max(y) AS y_max,
         |  CAST(max(x) - min(x) + 1 AS DOUBLE) / 1024.0 AS x_span_frac,
         |  CAST(max(y) - min(y) + 1 AS DOUBLE) / 1024.0 AS y_span_frac
         |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin
    },
    // q282: identical sqrt weights (IEEE-correctly-rounded both
    // engines), lang-ordered W fold, (budget*w)/W raw quotas, Hamilton
    // floors + largest-remainder ranks
    "q282_temperature_mix" ->
      """WITH s0 AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS size
        |  FROM documents WHERE lang IS NOT NULL GROUP BY 1
        |  HAVING CAST(sum(n_chars) AS BIGINT) > 0),
        |w AS (SELECT lang, size, sqrt(CAST(size AS DOUBLE)) AS weight
        |  FROM s0),
        |tw AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list(weight ORDER BY lang)), (a, b) -> a + b) AS wt FROM w),
        |r AS (SELECT lang, size, weight, weight / tw.wt AS share,
        |    1000000.0 * weight / tw.wt AS q FROM w CROSS JOIN tw),
        |r2 AS (SELECT lang, size, weight, share,
        |    CAST(floor(q) AS BIGINT) AS base, q - floor(q) AS rem FROM r),
        |l AS (SELECT 1000000 - sum(base) AS leftover FROM r2),
        |rk AS (SELECT lang, size, weight, share, base,
        |    CAST(row_number() OVER (ORDER BY rem DESC, lang) AS BIGINT)
        |      AS rk
        |  FROM r2)
        |SELECT lang, size, weight, share,
        |  base + CASE WHEN rk <= l.leftover THEN 1 ELSE 0 END AS quota
        |FROM rk CROSS JOIN l ORDER BY lang""".stripMargin,
    // q279: identical exact-jaccard histogram; each (b, r) branch's
    // S-curve probability is the SAME unrolled multiplication chain
    // (first multiply by 1.0 is IEEE-exact, so fold and plain chains
    // agree bitwise); FP/FN folded in bin order; p_at_threshold is one
    // driver-computed literal planted in both plans
    "q279_lsh_parameter_plan" -> {
      def powD(x: Double, k: Int): Double =
        (1 to k).foldLeft(1.0)((a, _) => a * x)
      def powSql(x: String, k: Int): String =
        if (k == 1) x else Seq.fill(k)(x).mkString("(", " * ", ")")
      val branches = (1 to 16).filter(16 % _ == 0).map { r =>
        val b = 16 / r
        val pAtT = 1.0 - powD(1.0 - powD(0.7, r), b)
        val pExpr = s"1.0 - ${powSql(s"(1.0 - ${powSql("c", r)})", b)}"
        s"""SELECT $b AS b, $r AS r, CAST('$pAtT' AS DOUBLE)
           |    AS p_at_threshold,
           |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |    list(fp ORDER BY bin)), (x, y) -> x + y) AS exp_fp,
           |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |    list(fn ORDER BY bin)), (x, y) -> x + y) AS exp_fn
           |FROM (SELECT bin,
           |    CASE WHEN c < 0.7 THEN CAST(cnt AS DOUBLE) * ($pExpr)
           |      ELSE 0.0 END AS fp,
           |    CASE WHEN c >= 0.7 THEN
           |      CAST(cnt AS DOUBLE) * (1.0 - ($pExpr)) ELSE 0.0 END AS fn
           |  FROM cb)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH d AS (SELECT doc_id, lang,
         |    list_distinct(string_split(text, ' ')) AS tk
         |  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
         |a1 AS (SELECT tk, lead(tk, 1) OVER
         |    (PARTITION BY lang ORDER BY doc_id) AS tk2 FROM d),
         |a2 AS (SELECT tk, lead(tk, 2) OVER
         |    (PARTITION BY lang ORDER BY doc_id) AS tk2 FROM d),
         |pr AS (SELECT tk, tk2 FROM a1 WHERE tk2 IS NOT NULL
         |  UNION ALL SELECT tk, tk2 FROM a2 WHERE tk2 IS NOT NULL
         |  UNION ALL SELECT tk, tk AS tk2 FROM d),
         |sims AS (SELECT
         |    CAST(len(list_intersect(tk, tk2)) AS DOUBLE)
         |      / CAST(len(list_distinct(tk || tk2)) AS DOUBLE) AS sim
         |  FROM pr WHERE len(list_distinct(tk || tk2)) > 0),
         |hist AS (SELECT least(CAST(floor(sim * 20) AS BIGINT), 19)
         |      AS bin,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM sims GROUP BY 1),
         |cb AS (SELECT bin, cnt,
         |    (CAST(bin AS DOUBLE) * 2.0 + 1.0) * 0.025 AS c FROM hist),
         |br AS ($branches)
         |SELECT b, r, p_at_threshold, exp_fp, exp_fn,
         |  exp_fp + exp_fn AS total_err,
         |  row_number() OVER (ORDER BY exp_fp + exp_fn, b) = 1 AS chosen
         |FROM br ORDER BY b""".stripMargin
    },
    // q278: identical micro-unit scores (HUGEINT, integer-div
    // predictor), the k-th order statistic via row_number = scalar k,
    // integer coverage comparison — q_hat/coverage one division each
    "q278_conformal_coverage" ->
      """WITH d AS (SELECT doc_id, lang, n_chars FROM documents
        |  WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
        |pm AS (SELECT lang,
        |    (CAST(sum(n_chars) AS HUGEINT) * 1000000) // count(*) AS pmic
        |  FROM d WHERE doc_id % 2 = 0 GROUP BY 1),
        |cs AS (SELECT abs(CAST(c.n_chars AS HUGEINT) * 1000000 - p.pmic)
        |    AS s
        |  FROM d c JOIN pm p USING (lang) WHERE c.doc_id % 2 = 0),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cs),
        |kk AS (SELECT n, CAST(ceil((n + 1) * 0.9) AS BIGINT) AS k FROM nn),
        |q AS (SELECT s AS qh FROM (
        |    SELECT s, row_number() OVER (ORDER BY s) AS rn FROM cs)
        |  WHERE rn = (SELECT k FROM kk)),
        |ts AS (SELECT abs(CAST(t.n_chars AS HUGEINT) * 1000000 - p.pmic)
        |    AS s
        |  FROM d t JOIN pm p USING (lang) WHERE t.doc_id % 2 = 1),
        |cov AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
        |    CAST(coalesce(sum(CASE WHEN s <= (SELECT qh FROM q)
        |      THEN 1 END), 0) AS BIGINT) AS n_covered
        |  FROM ts)
        |SELECT kk.n AS n_cal, kk.k AS k,
        |  CAST(q.qh AS DOUBLE) / 1e6 AS q_hat,
        |  cov.n_test, cov.n_covered,
        |  CASE WHEN cov.n_test > 0 THEN
        |    CAST(cov.n_covered AS DOUBLE) / CAST(cov.n_test AS DOUBLE)
        |  END AS coverage
        |FROM kk CROSS JOIN q CROSS JOIN cov""".stripMargin,
    // q276: identical exact counts -> pooled z -> Chebyshev p -> the
    // BH step-up as a reverse running min — rank, q and reject replayed
    // with the same (p*m)/rank double chain
    "q276_bh_fdr" ->
      """WITH u AS (SELECT c.c_nationkey AS nation, o.o_custkey AS cust,
        |    substr(md5(CAST(o.o_custkey AS VARCHAR) || ':ab'), 1, 1) >= '8'
        |      AS arm,
        |    count(*) >= 11 AS conv
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2, 3),
        |cells AS (SELECT nation, arm, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM u GROUP BY 1, 2),
        |seg AS (SELECT nation,
        |    sum(CASE WHEN arm THEN n END) AS n1,
        |    sum(CASE WHEN arm THEN k END) AS k1,
        |    sum(CASE WHEN NOT arm THEN n END) AS n0,
        |    sum(CASE WHEN NOT arm THEN k END) AS k0
        |  FROM cells GROUP BY 1
        |  HAVING n1 IS NOT NULL AND n0 IS NOT NULL),
        |base AS (SELECT nation,
        |    CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
        |    CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
        |    (CAST(k1 AS DOUBLE) + CAST(k0 AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE)) AS pb,
        |    CAST(n1 AS DOUBLE) AS d1, CAST(n0 AS DOUBLE) AS d0
        |  FROM seg),
        |zs AS (SELECT nation,
        |    sqrt(pb * (1.0 - pb) * (1.0 / d1 + 1.0 / d0)) AS se,
        |    p1 - p0 AS diff FROM base),
        |ps AS (SELECT nation AS test,
        |    CASE WHEN se > 0 THEN
        |      CASE WHEN diff = 0 THEN 1.0
        |        ELSE least(1.0, 1.0 / ((diff / se) * (diff / se))) END
        |    END AS p
        |  FROM zs),
        |ps2 AS (SELECT test, p FROM ps WHERE p IS NOT NULL),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ps2),
        |r AS (SELECT test, p,
        |    CAST(row_number() OVER (ORDER BY p, test) AS BIGINT) AS rank
        |  FROM ps2),
        |qv AS (SELECT test, p, rank,
        |    least(1.0, min(p * CAST(m.m AS DOUBLE) / CAST(rank AS DOUBLE))
        |      OVER (ORDER BY rank
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |      AS q_value
        |  FROM r CROSS JOIN m)
        |SELECT test, p, rank, q_value, q_value <= 0.2 AS rejected
        |FROM qv ORDER BY rank""".stripMargin,
    // q277: identical micro-unit HUGEINT sums per (bucket, arm)
    // (VARCHAR-routed to double, the q245 trick), identical
    // stratum-ordered fold of n_s * (mean_t - mean_c), one division
    "q277_stratified_ate" ->
      """WITH u AS (SELECT user_id,
        |    substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 1) >= '8'
        |      AS treated,
        |    least(CAST(count(*) AS BIGINT) // 10, 5) AS bucket,
        |    CAST(CAST(sum(coalesce(CAST(value AS DECIMAL(18,6)),
        |      CAST(0 AS DECIMAL(18,6)))) AS DECIMAL(18,6)) * 1000000
        |      AS HUGEINT) AS yi
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |cells AS (SELECT bucket, treated,
        |    CAST(count(*) AS BIGINT) AS n, sum(yi) AS sy
        |  FROM u GROUP BY 1, 2),
        |st AS (SELECT bucket,
        |    CAST(sum(n) AS BIGINT) AS ns,
        |    CAST(count(*) AS BIGINT) AS arms,
        |    sum(CASE WHEN treated THEN n END) AS nt,
        |    sum(CASE WHEN treated THEN sy END) AS yt,
        |    sum(CASE WHEN NOT treated THEN n END) AS nc,
        |    sum(CASE WHEN NOT treated THEN sy END) AS yc
        |  FROM cells GROUP BY 1),
        |f AS (SELECT
        |    CAST(sum(ns) AS BIGINT) AS n_units,
        |    CAST(coalesce(sum(CASE WHEN arms = 2 THEN ns END), 0)
        |      AS BIGINT) AS n_used,
        |    CAST(coalesce(sum(CASE WHEN arms <> 2 THEN ns END), 0)
        |      AS BIGINT) AS n_dropped,
        |    CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(coalesce(sum(CASE WHEN arms <> 2 THEN 1 END), 0)
        |      AS BIGINT) AS n_strata_dropped,
        |    list(CASE WHEN arms = 2 THEN
        |        CAST(ns AS DOUBLE) *
        |          ((CAST(CAST(yt AS VARCHAR) AS DOUBLE) / 1e6)
        |             / CAST(nt AS DOUBLE)
        |           - (CAST(CAST(yc AS VARCHAR) AS DOUBLE) / 1e6)
        |             / CAST(nc AS DOUBLE)) END
        |      ORDER BY CAST(bucket AS VARCHAR)) AS terms
        |  FROM st)
        |SELECT n_units, n_used, n_dropped, n_strata, n_strata_dropped,
        |  CASE WHEN n_used = 0 THEN NULL ELSE
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_filter(terms, x -> x IS NOT NULL)), (a, b) -> a + b)
        |      / CAST(n_used AS DOUBLE)
        |  END AS ate
        |FROM f""".stripMargin,
    // q275: identical per-user bitmasks over the 20 derived channels,
    // the same md5-lane permutations (row_number over md5(t:i:shap)
    // ranks = Scala's sortBy on the same hex), prefix coalitions via a
    // windowed bit sum, and the subset CASE-sum marginals — shapley_e
    // integer-for-integer across all 64 permutations
    "q275_shapley_sampled" -> {
      val chans = for (t <- Seq("click", "error", "signup", "view");
                       b <- 0 until 5) yield s"${t}_$b"
      val chanVals = chans.zipWithIndex
        .map { case (c, i) => s"($i, '$c', ${1L << i})" }.mkString(", ")
      s"""WITH chans(i, ch, bit) AS (SELECT * FROM (VALUES $chanVals)),
         |ev AS (SELECT user_id AS u, ts,
         |    CASE WHEN event_type = 'purchase' THEN 'purchase'
         |      ELSE event_type || '_' || CAST(hour(ts) % 5 AS VARCHAR)
         |    END AS ty
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |conv AS (SELECT u, min(ts) AS ct FROM ev WHERE ty = 'purchase'
         |  GROUP BY 1),
         |tm AS (SELECT e.u, c.bit FROM ev e
         |  JOIN conv v ON v.u = e.u AND e.ts < v.ct
         |  JOIN chans c ON c.ch = e.ty GROUP BY 1, 2),
         |masks AS (SELECT u, sum(bit) AS m FROM tm GROUP BY 1),
         |cnt AS (SELECT coalesce(m.m, 0) AS m,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM conv v LEFT JOIN masks m ON m.u = v.u GROUP BY 1),
         |samples AS (SELECT CAST(range AS INTEGER) AS t FROM range(1, 65)),
         |perm AS (SELECT s.t, c.ch, c.bit, row_number() OVER (
         |    PARTITION BY s.t ORDER BY md5(CAST(s.t AS VARCHAR) || ':'
         |      || CAST(c.i AS VARCHAR) || ':shap'), c.i) AS pos
         |  FROM samples s CROSS JOIN chans c),
         |pref AS (SELECT t, ch, bit,
         |    coalesce(sum(bit) OVER (PARTITION BY t ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s0
         |  FROM perm),
         |term AS (SELECT p.ch AS channel,
         |    CAST(sum(CASE WHEN (c.m & (p.s0 + p.bit)) = c.m
         |        THEN c.c ELSE 0 END)
         |      - sum(CASE WHEN (c.m & p.s0) = c.m THEN c.c ELSE 0 END)
         |      AS BIGINT) AS shapley_e
         |  FROM pref p CROSS JOIN cnt c GROUP BY 1),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_converters FROM conv)
         |SELECT t.channel, 64 AS n_samples, t.shapley_e,
         |  CAST(t.shapley_e AS DOUBLE) / 64.0 AS shapley, nc.n_converters
         |FROM term t CROSS JOIN nc ORDER BY channel""".stripMargin
    },
    // q268: identical per-user bitmasks, the containment-join v(S)
    // table, and the factorial weights as CASE literals over a manual
    // popcount — phi * 3! integer-for-integer
    "q268_shapley_attribution" ->
      """WITH conv AS (SELECT user_id AS u, min(epoch_us(ts)) AS ct
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type = 'purchase' GROUP BY 1),
        |m0 AS (SELECT e.user_id AS u,
        |    max(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END)
        |    + max(CASE WHEN e.event_type = 'click' THEN 2 ELSE 0 END)
        |    + max(CASE WHEN e.event_type = 'signup' THEN 4 ELSE 0 END) AS m
        |  FROM events e JOIN conv ON conv.u = e.user_id
        |  WHERE e.ts IS NOT NULL AND epoch_us(e.ts) < conv.ct
        |  GROUP BY 1),
        |cnt AS (SELECT coalesce(m0.m, 0) AS m, count(*) AS c
        |  FROM conv LEFT JOIN m0 ON m0.u = conv.u GROUP BY 1),
        |sp AS (SELECT unnest(generate_series(0, 7)) AS s),
        |v AS (SELECT sp.s, CAST(coalesce(sum(cnt.c), 0) AS BIGINT) AS v
        |  FROM sp LEFT JOIN cnt ON (cnt.m & sp.s) = cnt.m GROUP BY 1),
        |ch(b, name) AS (VALUES (1, 'view'), (2, 'click'), (4, 'signup')),
        |t AS (SELECT ch.name AS channel,
        |    CAST(coalesce(sum((CASE (vs.s & 1) + ((vs.s >> 1) & 1)
        |          + ((vs.s >> 2) & 1)
        |        WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 2 END)
        |      * (vc.v - vs.v)), 0) AS BIGINT) AS shapley_e
        |  FROM ch JOIN v vs ON (vs.s & ch.b) = 0
        |  JOIN v vc ON vc.s = vs.s + ch.b
        |  GROUP BY 1),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_converters FROM conv)
        |SELECT t.channel, t.shapley_e,
        |  CAST(t.shapley_e AS DOUBLE) / CAST(6 AS DOUBLE) AS shapley,
        |  nc.n_converters
        |FROM t CROSS JOIN nc ORDER BY channel""".stripMargin,
    // q267: identical plantings (per-annotator 0x-hex noise rates),
    // identical dedupe/majority/accuracy/weighted chains; argmaxes
    // replayed as (score DESC, label) windows
    "q267_annotator_consensus" ->
      """WITH an(k) AS (VALUES (0), (1), (2), (3), (4)),
        |raw AS (SELECT d.doc_id, 'a' || CAST(an.k AS VARCHAR) AS annot,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
        |        || ':an' || CAST(an.k AS VARCHAR)), 1, 5)) AS BIGINT)
        |        % 1000000 < (an.k + 1) * 100000
        |      THEN 'x_' || d.lang ELSE d.lang END AS label
        |  FROM documents d CROSS JOIN an WHERE d.lang IS NOT NULL),
        |votes AS (SELECT doc_id, annot, min(label) AS lb
        |  FROM raw GROUP BY 1, 2),
        |cnt AS (SELECT doc_id, lb, CAST(count(*) AS BIGINT) AS c
        |  FROM votes GROUP BY 1, 2),
        |mj AS (SELECT doc_id, lb AS majority_label FROM (
        |    SELECT doc_id, lb, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY c DESC, lb) AS rn FROM cnt) WHERE rn = 1),
        |nv AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_votes
        |  FROM cnt GROUP BY 1),
        |acc AS (SELECT v.annot,
        |    CAST(sum(CASE WHEN v.lb = m.majority_label THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(count(*) AS DOUBLE) AS a
        |  FROM votes v JOIN mj m ON m.doc_id = v.doc_id GROUP BY 1),
        |wsum AS (SELECT doc_id, lb,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      (SELECT list(acc.a ORDER BY v2.annot)
        |       FROM votes v2 JOIN acc ON acc.annot = v2.annot
        |       WHERE v2.doc_id = w.doc_id AND v2.lb = w.lb)),
        |      (x, y) -> x + y) AS wt
        |  FROM (SELECT DISTINCT doc_id, lb FROM votes) w),
        |wl AS (SELECT doc_id, lb AS weighted_label, wt FROM (
        |    SELECT doc_id, lb, wt, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY wt DESC, lb) AS rn FROM wsum) WHERE rn = 1)
        |SELECT mj.doc_id, nv.n_votes, mj.majority_label,
        |  wl.weighted_label, wl.wt AS winning_weight
        |FROM mj JOIN nv ON nv.doc_id = mj.doc_id
        |  JOIN wl ON wl.doc_id = mj.doc_id
        |ORDER BY mj.doc_id""".stripMargin,
    // q266: the three MM rounds unrolled; each item's denominator folds
    // opponents index-ordered by j, the rescale folds items in item
    // order — the engine's sorted-collect folds replayed exactly
    "q266_bradley_terry" -> {
      val rounds = (1 to 3).map { i =>
        val prev = if (i == 1) "p0" else s"p${i - 1}"
        s"""d$i AS (SELECT pc.i AS item, max(a.pi) AS pii,
           |    list(pc.n ORDER BY pc.j) AS ln,
           |    list(b.pi ORDER BY pc.j) AS lp
           |  FROM pairs pc JOIN $prev a ON a.item = pc.i
           |  JOIN $prev b ON b.item = pc.j
           |  GROUP BY pc.i),
           |w$i AS (SELECT d.item,
           |    CAST(wi.n_wins AS DOUBLE) / list_reduce(
           |      list_prepend(CAST(0 AS DOUBLE),
           |        list_transform(generate_series(1, len(d.ln)), k ->
           |          CAST(d.ln[k] AS DOUBLE) / (d.pii + d.lp[k]))),
           |      (x, y) -> x + y) AS raw
           |  FROM d$i d JOIN wins wi ON wi.item = d.item),
           |t$i AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |    (SELECT list(raw ORDER BY item) FROM w$i)),
           |    (x, y) -> x + y) AS tot),
           |p$i AS (SELECT w.item,
           |    w.raw * (SELECT CAST(count(*) AS DOUBLE) FROM items)
           |      / t.tot AS pi
           |  FROM w$i w CROSS JOIN t$i t)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
         |    l_partkey % 20 AS p, l_quantity AS q FROM lineitem),
         |m AS (SELECT
         |    CASE WHEN a.q > b.q THEN a.p WHEN b.q > a.q THEN b.p
         |         ELSE least(a.p, b.p) END AS w,
         |    CASE WHEN a.q > b.q THEN b.p WHEN b.q > a.q THEN a.p
         |         ELSE greatest(a.p, b.p) END AS l
         |  FROM li a JOIN li b ON b.ok = a.ok AND b.ln = a.ln + 1),
         |mc AS (SELECT w, l FROM m WHERE w <> l),
         |wins0 AS (SELECT w AS item, CAST(count(*) AS BIGINT) AS n_wins
         |  FROM mc GROUP BY 1),
         |pairs AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n FROM (
         |    SELECT w AS i, l AS j FROM mc
         |    UNION ALL SELECT l, w FROM mc) GROUP BY 1, 2),
         |items AS (SELECT DISTINCT i AS item FROM pairs),
         |wins AS (SELECT items.item, coalesce(wins0.n_wins, 0) AS n_wins
         |  FROM items LEFT JOIN wins0 ON wins0.item = items.item),
         |p0 AS (SELECT item, CAST(1.0 AS DOUBLE) AS pi FROM items),
         |$rounds,
         |nm AS (SELECT i AS item, CAST(sum(n) AS BIGINT) AS n_matches
         |  FROM pairs GROUP BY 1)
         |SELECT w.item, CAST(w.n_wins AS BIGINT) AS n_wins,
         |  nm.n_matches, p3.pi AS bt_score
         |FROM wins w JOIN nm ON nm.item = w.item
         |  JOIN p3 ON p3.item = w.item
         |ORDER BY w.item""".stripMargin
    },
    // q265: identical exact counts, item-ordered moment folds replayed
    // index-ordered, identical MoM prior and posterior-mean chain
    "q265_eb_shrinkage" ->
      """WITH it AS (SELECT l_partkey % 500 AS sku,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM lineitem GROUP BY 1),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS ni,
        |    list(n ORDER BY sku) AS ln, list(x ORDER BY sku) AS lx
        |  FROM it),
        |m AS (SELECT ni,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(ln)), i ->
        |        CAST(lx[i] AS DOUBLE) / CAST(ln[i] AS DOUBLE))),
        |      (a, b) -> a + b) AS sp,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(ln)), i ->
        |        (CAST(lx[i] AS DOUBLE) / CAST(ln[i] AS DOUBLE))
        |        * (CAST(lx[i] AS DOUBLE) / CAST(ln[i] AS DOUBLE)))),
        |      (a, b) -> a + b) AS spp
        |  FROM f),
        |pr0 AS (SELECT sp / CAST(ni AS DOUBLE) AS pm,
        |    spp / CAST(ni AS DOUBLE)
        |      - (sp / CAST(ni AS DOUBLE)) * (sp / CAST(ni AS DOUBLE)) AS v
        |  FROM m),
        |pr AS (SELECT pm AS prior_mean,
        |    CASE WHEN v > 0 AND pm * (CAST(1 AS DOUBLE) - pm) / v
        |             - CAST(1 AS DOUBLE) > 0
        |         THEN pm * (CAST(1 AS DOUBLE) - pm) / v - CAST(1 AS DOUBLE)
        |         ELSE NULL END AS prior_strength
        |  FROM pr0)
        |SELECT it.sku, it.n AS n_trials, it.x AS n_success,
        |  CAST(it.x AS DOUBLE) / CAST(it.n AS DOUBLE) AS rate_raw,
        |  CASE WHEN pr.prior_strength IS NULL
        |       THEN CAST(it.x AS DOUBLE) / CAST(it.n AS DOUBLE)
        |       ELSE (CAST(it.x AS DOUBLE)
        |             + pr.prior_mean * pr.prior_strength)
        |            / (CAST(it.n AS DOUBLE) + pr.prior_strength)
        |  END AS rate_shrunk,
        |  pr.prior_mean, pr.prior_strength
        |FROM it CROSS JOIN pr ORDER BY it.sku""".stripMargin,
    // q264: identical per-user durations, identical pooled grid +
    // suffix-sum at-risk, E/V folds replayed index-ordered in t order
    "q264_log_rank" ->
      """WITH per AS (SELECT user_id,
        |    min(epoch_us(ts)) AS first_us,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |      AS purch_us,
        |    max(epoch_us(ts)) AS last_us
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |u AS (SELECT
        |    substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 1) < '8'
        |      AS isa,
        |    (coalesce(purch_us, last_us) - first_us) // 86400000000 AS t,
        |    CASE WHEN purch_us IS NOT NULL THEN 1 ELSE 0 END AS e
        |  FROM per),
        |pt AS (SELECT isa, t, CAST(count(*) AS BIGINT) AS ends,
        |    CAST(sum(e) AS BIGINT) AS d FROM u GROUP BY 1, 2),
        |times AS (SELECT DISTINCT t FROM pt),
        |arms AS (SELECT unnest([TRUE, FALSE]) AS isa),
        |grid AS (SELECT a.isa, ti.t, coalesce(pt.ends, 0) AS ends,
        |    coalesce(pt.d, 0) AS d
        |  FROM times ti CROSS JOIN arms a
        |  LEFT JOIN pt ON pt.isa = a.isa AND pt.t = ti.t),
        |ar AS (SELECT isa, t, d, sum(ends) OVER (PARTITION BY isa
        |    ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS n FROM grid),
        |bt AS (SELECT t, sum(CASE WHEN isa THEN d END) AS da,
        |    sum(CASE WHEN isa THEN n END) AS na,
        |    sum(d) AS dt, sum(n) AS nt
        |  FROM ar GROUP BY 1 HAVING sum(d) > 0),
        |tot AS (SELECT
        |    CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |  FROM u),
        |f AS (SELECT CAST(coalesce(sum(da), 0) AS BIGINT) AS observed_a,
        |    list(da ORDER BY t) AS lda, list(na ORDER BY t) AS lna,
        |    list(dt ORDER BY t) AS ldt, list(nt ORDER BY t) AS lnt
        |  FROM bt),
        |g AS (SELECT observed_a,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(ldt)), i ->
        |        CAST(ldt[i] AS DOUBLE) * CAST(lna[i] AS DOUBLE)
        |          / CAST(lnt[i] AS DOUBLE))), (x, y) -> x + y) AS e,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(ldt)), i ->
        |        CASE WHEN lnt[i] <= 1 THEN CAST(0 AS DOUBLE)
        |          ELSE CAST(ldt[i] AS DOUBLE)
        |            * (CAST(lna[i] AS DOUBLE) / CAST(lnt[i] AS DOUBLE))
        |            * (CAST(1 AS DOUBLE)
        |               - CAST(lna[i] AS DOUBLE) / CAST(lnt[i] AS DOUBLE))
        |            * (CAST(lnt[i] AS DOUBLE) - CAST(ldt[i] AS DOUBLE))
        |            / (CAST(lnt[i] AS DOUBLE) - CAST(1 AS DOUBLE))
        |        END)), (x, y) -> x + y) AS v
        |  FROM f)
        |SELECT tot.n_a, tot.n_b, g.observed_a, g.e AS expected_a,
        |  g.v AS variance,
        |  CASE WHEN g.v <= 0 THEN NULL
        |       ELSE (CAST(g.observed_a AS DOUBLE) - g.e) / sqrt(g.v)
        |  END AS z,
        |  CASE WHEN g.v <= 0 THEN NULL
        |       ELSE ((CAST(g.observed_a AS DOUBLE) - g.e) / sqrt(g.v))
        |          * ((CAST(g.observed_a AS DOUBLE) - g.e) / sqrt(g.v))
        |  END AS chi2
        |FROM g CROSS JOIN tot""".stripMargin,
    // q263: q212's RECURSIVE replay extended with a LIST seasonal state
    // (index-built, no struct lambdas), identical truncating divisions
    "q263_holt_winters" ->
      """WITH RECURSIVE d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
        |      AS v6
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |ser AS (SELECT event_type, v6, row_number()
        |    OVER (PARTITION BY event_type ORDER BY day) AS rn FROM d),
        |rec AS (
        |  SELECT event_type, CAST(1 AS BIGINT) AS rn, v6 AS l,
        |      CAST(0 AS BIGINT) AS t,
        |      list_transform(generate_series(1, 7),
        |        j -> CAST(0 AS BIGINT)) AS s
        |    FROM ser WHERE rn = 1
        |  UNION ALL
        |  SELECT event_type, rn, lnew,
        |      CAST((1 * (lnew - l) + 7 * t) // 8 AS BIGINT),
        |      list_transform(generate_series(1, 7), j ->
        |        CASE WHEN j = slot
        |          THEN CAST((1 * (x - lnew) + 3 * sold) // 4 AS BIGINT)
        |          ELSE s[j] END)
        |    FROM (SELECT r.event_type, r.rn + 1 AS rn, r.l, r.t, r.s,
        |        sv.v6 AS x,
        |        CAST(r.rn % 7 + 1 AS INTEGER) AS slot,
        |        r.s[CAST(r.rn % 7 + 1 AS INTEGER)] AS sold,
        |        CAST((1 * (sv.v6 - r.s[CAST(r.rn % 7 + 1 AS INTEGER)])
        |          + 3 * (r.l + r.t)) // 4 AS BIGINT) AS lnew
        |      FROM rec r JOIN ser sv ON sv.event_type = r.event_type
        |        AND sv.rn = r.rn + 1)),
        |nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_periods
        |  FROM ser GROUP BY 1),
        |fin AS (SELECT r.event_type, nn.n_periods, r.l, r.t, r.s
        |  FROM rec r JOIN nn ON nn.event_type = r.event_type
        |    AND r.rn = nn.n_periods)
        |SELECT event_type, n_periods,
        |  CAST(j - 1 AS INTEGER) AS slot,
        |  l AS level_e6, t AS trend_e6, s[j] AS season_e6,
        |  CAST(l AS DOUBLE) / 1e6 AS level,
        |  CAST(t AS DOUBLE) / 1e6 AS trend,
        |  CAST(s[j] AS DOUBLE) / 1e6 AS season
        |FROM fin, (SELECT unnest(generate_series(1, 7)) AS j)
        |ORDER BY event_type, slot""".stripMargin,
    // q262: identical u derivation (q149's 2^52+1 lane), identical
    // ln(u)/w doubles, (score DESC, second-hash-window) rank replay
    "q262_weighted_sample" ->
      """WITH s AS (SELECT source, doc_id,
        |    ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |        || ':wsk'), 1, 13)) AS BIGINT) + 1)
        |      / CAST(4503599627370497.0 AS DOUBLE))
        |      / CAST(n_chars AS DOUBLE) AS score,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |        || ':wsk'), 14, 13)) AS BIGINT) AS tie
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |r AS (SELECT source, doc_id, row_number() OVER (
        |    PARTITION BY source ORDER BY score DESC, tie) AS rank
        |  FROM s)
        |SELECT source, CAST(rank AS INTEGER) AS rank, doc_id
        |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin,
    // q261: q190's integer PageRank template on the word-adjacency
    // graph, two rounds, the same dangling/teleport floor divisions
    "q261_textrank_keywords" -> {
      val S = graft.operators.Graph.RankScale
      val rounds = (1 to 2).map { i =>
        val prev = if (i == 1) "r0" else s"r${i - 1}"
        s"""i$i AS (SELECT e.d AS node, CAST(sum(r._r // o.od) AS BIGINT) AS infl
           |  FROM e JOIN $prev r ON r.node = e.s JOIN od o ON o.s = e.s
           |  GROUP BY e.d),
           |g$i AS (SELECT CAST(coalesce(sum(r._r), 0) AS BIGINT) AS dmass
           |  FROM $prev r LEFT JOIN od o ON o.s = r.node WHERE o.s IS NULL),
           |r$i AS (SELECT nd.node,
           |    CAST((15 * $S) // (100 * nn.n)
           |      + (85 * (coalesce(i.infl, 0) + g.dmass // nn.n)) // 100
           |      AS BIGINT) AS _r
           |  FROM nodes nd CROSS JOIN nn CROSS JOIN g$i g
           |  LEFT JOIN i$i i ON i.node = nd.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH tks AS (SELECT list_filter(string_split(trim(regexp_replace(
         |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
         |    ' +', ' ', 'g')), ' '), x -> x <> '') AS tk
         |  FROM documents WHERE doc_id % 5 = 0),
         |p AS (SELECT tk[i] AS a, tk[i+1] AS b FROM (
         |    SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
         |    FROM tks WHERE len(tk) >= 2)),
         |e AS (SELECT a AS s, b AS d FROM p WHERE a <> b
         |  UNION SELECT b, a FROM p WHERE a <> b),
         |nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |od AS (SELECT s, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY s),
         |r0 AS (SELECT node, CAST($S // nn.n AS BIGINT) AS _r
         |  FROM nodes CROSS JOIN nn),
         |$rounds
         |SELECT node, r._r AS rank_e12,
         |  CAST(r._r AS DOUBLE) / 1e12 AS pagerank
         |FROM r2 r ORDER BY rank_e12 DESC, node LIMIT 20""".stripMargin
    },
    // q260: per-dim max scales replayed, identical floor-rounding, the
    // integer dot ranking is EXACT in both engines (pure BIGINT), the
    // full-precision side is q27's chain
    "q260_int8_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |fs AS (SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_inner_product(e.v, q.qv)
        |      / (sqrt(list_inner_product(e.v, e.v))
        |         * sqrt(list_inner_product(q.qv, q.qv))) AS score
        |  FROM e CROSS JOIN q),
        |fr AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |    FROM fs) WHERE rank <= 10),
        |ex AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS p, v
        |  FROM e),
        |sc0 AS (SELECT p, max(abs(v[p])) AS m FROM ex GROUP BY p),
        |sc AS (SELECT list(m ORDER BY p) AS sc FROM sc0),
        |qe AS (SELECT e.vec_id AS neighbor_id,
        |    list_transform(generate_series(1, len(e.v)), i ->
        |      CASE WHEN sc.sc[i] = 0 THEN 0
        |        ELSE CAST(floor(CAST(e.v[i] AS DOUBLE) * 127.0 / sc.sc[i]
        |          + 0.5) AS BIGINT) END) AS qv
        |  FROM e CROSS JOIN sc),
        |qq AS (SELECT q.query_id,
        |    list_transform(generate_series(1, len(q.qv)), i ->
        |      CASE WHEN sc.sc[i] = 0 THEN 0
        |        ELSE CAST(floor(CAST(q.qv[i] AS DOUBLE) * 127.0 / sc.sc[i]
        |          + 0.5) AS BIGINT) END) AS qq
        |  FROM q CROSS JOIN sc),
        |is0 AS (SELECT qq.query_id, qe.neighbor_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, len(qe.qv)),
        |        i -> qe.qv[i] * qq.qq[i])), (x, y) -> x + y) AS idot
        |  FROM qe CROSS JOIN qq),
        |ir AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY idot DESC, neighbor_id) AS rank
        |    FROM is0) WHERE rank <= 10),
        |hits AS (SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_hit
        |  FROM ir t JOIN fr f ON f.query_id = t.query_id
        |    AND f.neighbor_id = t.neighbor_id
        |  GROUP BY 1),
        |truth AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_true
        |  FROM fr GROUP BY 1)
        |SELECT truth.query_id, coalesce(hits.n_hit, 0) AS n_hit,
        |  truth.n_true,
        |  round(CAST(coalesce(hits.n_hit, 0) AS DOUBLE)
        |    / CAST(truth.n_true AS DOUBLE), 6) AS recall
        |FROM truth LEFT JOIN hits ON hits.query_id = truth.query_id
        |ORDER BY truth.query_id""".stripMargin,
    // q259: the q27 cosine chain for BOTH dim sets (full and v[1:16]
    // prefix), identical rank windows, left-semi hit counts
    "q259_matryoshka_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |fs AS (SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_inner_product(e.v, q.qv)
        |      / (sqrt(list_inner_product(e.v, e.v))
        |         * sqrt(list_inner_product(q.qv, q.qv))) AS score
        |  FROM e CROSS JOIN q),
        |fr AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |    FROM fs) WHERE rank <= 10),
        |te AS (SELECT vec_id, v[1:16] AS v FROM e),
        |tq AS (SELECT query_id, qv[1:16] AS qv FROM q),
        |ts AS (SELECT tq.query_id, te.vec_id AS neighbor_id,
        |    list_inner_product(te.v, tq.qv)
        |      / (sqrt(list_inner_product(te.v, te.v))
        |         * sqrt(list_inner_product(tq.qv, tq.qv))) AS score
        |  FROM te CROSS JOIN tq),
        |tr AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |    FROM ts) WHERE rank <= 10),
        |hits AS (SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_hit
        |  FROM tr t JOIN fr f ON f.query_id = t.query_id
        |    AND f.neighbor_id = t.neighbor_id
        |  GROUP BY 1),
        |truth AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_true
        |  FROM fr GROUP BY 1)
        |SELECT truth.query_id, coalesce(hits.n_hit, 0) AS n_hit,
        |  truth.n_true,
        |  round(CAST(coalesce(hits.n_hit, 0) AS DOUBLE)
        |    / CAST(truth.n_true AS DOUBLE), 6) AS recall
        |FROM truth LEFT JOIN hits ON hits.query_id = truth.query_id
        |ORDER BY truth.query_id""".stripMargin,
    // q258: q149's u derivation and -w/ln(u) scores verbatim for BOTH
    // node lists; the (score DESC, node) pick replays the fold, and the
    // moved flag is a plain inequality of the two picks
    "q258_rendezvous_shards" ->
      """WITH b(node) AS (VALUES ('s0'), ('s1'), ('s2'), ('s3'),
        |  ('s4'), ('s5'), ('s6'), ('s7')),
        |a(node) AS (VALUES ('s0'), ('s1'), ('s2'), ('s3'),
        |  ('s4'), ('s5'), ('s6'), ('s7'), ('s8')),
        |hb AS (SELECT d.doc_id, n.node,
        |    -CAST(1.0 AS DOUBLE) / ln((CAST(('0x' || substring(md5(
        |      CAST(d.doc_id AS VARCHAR) || ':' || n.node || ':hrw'),
        |      1, 13)) AS BIGINT) + 1)
        |      / CAST(4503599627370497.0 AS DOUBLE)) AS score
        |  FROM documents d CROSS JOIN b n),
        |ha AS (SELECT d.doc_id, n.node,
        |    -CAST(1.0 AS DOUBLE) / ln((CAST(('0x' || substring(md5(
        |      CAST(d.doc_id AS VARCHAR) || ':' || n.node || ':hrw'),
        |      1, 13)) AS BIGINT) + 1)
        |      / CAST(4503599627370497.0 AS DOUBLE)) AS score
        |  FROM documents d CROSS JOIN a n),
        |pb AS (SELECT doc_id, node AS node_before FROM (
        |    SELECT doc_id, node, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, node) AS rn FROM hb) WHERE rn = 1),
        |pa AS (SELECT doc_id, node AS node_after FROM (
        |    SELECT doc_id, node, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, node) AS rn FROM ha) WHERE rn = 1)
        |SELECT pb.doc_id, pb.node_before, pa.node_after,
        |  pb.node_before <> pa.node_after AS moved
        |FROM pb JOIN pa ON pa.doc_id = pb.doc_id
        |ORDER BY pb.doc_id""".stripMargin,
    // q257: q180's 0x-hex score/label plantings, exact HUGEINT squared
    // errors via the VARCHAR lane, REL/RES folds replayed index-ordered
    // over bin-sorted lists with the identical paren chain
    "q257_brier_decomposition" ->
      """WITH d AS (SELECT
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cal'), 1, 5))
        |      AS BIGINT) % 1000000 AS s6,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':lbl'), 1, 5))
        |      AS BIGINT) % 1000000 AS u6
        |  FROM documents),
        |r AS (SELECT s6,
        |    CASE WHEN u6 < s6 THEN 1 ELSE 0 END AS y,
        |    least((s6 * 10) // 1000000, 9) AS bin
        |  FROM d),
        |a AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS ny,
        |    CAST(sum(s6) AS BIGINT) AS ssum,
        |    sum(CAST((s6 - y * 1000000) * (s6 - y * 1000000) AS HUGEINT))
        |      AS sq
        |  FROM r GROUP BY bin),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n, sum(ny) AS sy,
        |    sum(sq) AS sqt, list(n ORDER BY bin) AS ln,
        |    list(ny ORDER BY bin) AS ly, list(ssum ORDER BY bin) AS ls
        |  FROM a)
        |SELECT n,
        |  (CAST(CAST(sqt AS VARCHAR) AS DOUBLE) / 1e12)
        |    / CAST(n AS DOUBLE) AS brier,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(generate_series(1, len(ln)), i ->
        |      CAST(ln[i] AS DOUBLE) *
        |        (((CAST(ls[i] AS DOUBLE) / 1e6) / CAST(ln[i] AS DOUBLE)
        |           - CAST(ly[i] AS DOUBLE) / CAST(ln[i] AS DOUBLE))
        |         * ((CAST(ls[i] AS DOUBLE) / 1e6) / CAST(ln[i] AS DOUBLE)
        |           - CAST(ly[i] AS DOUBLE) / CAST(ln[i] AS DOUBLE))))),
        |    (x, y) -> x + y) / CAST(n AS DOUBLE) AS reliability,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(generate_series(1, len(ln)), i ->
        |      CAST(ln[i] AS DOUBLE) *
        |        ((CAST(ly[i] AS DOUBLE) / CAST(ln[i] AS DOUBLE)
        |           - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |         * (CAST(ly[i] AS DOUBLE) / CAST(ln[i] AS DOUBLE)
        |           - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))))),
        |    (x, y) -> x + y) / CAST(n AS DOUBLE) AS resolution,
        |  (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (CAST(1 AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS uncertainty
        |FROM t""".stripMargin,
    // q256: identical depth-salted md5 buckets (the 0x-hex lane),
    // identical collision-bucket sums and min-over-depths
    "q256_count_min" ->
      """WITH k AS (SELECT user_id % 1000 AS key_id FROM events
        |  WHERE user_id IS NOT NULL),
        |d AS (SELECT unnest([0, 1, 2, 3]) AS depth),
        |cms AS (SELECT depth,
        |    CAST(('0x' || substr(md5(CAST(key_id AS VARCHAR) || ':cms:'
        |      || CAST(depth AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS bucket,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM k CROSS JOIN d GROUP BY 1, 2),
        |q AS (SELECT DISTINCT key_id FROM k WHERE key_id < 20),
        |qh AS (SELECT key_id, depth,
        |    CAST(('0x' || substr(md5(CAST(key_id AS VARCHAR) || ':cms:'
        |      || CAST(depth AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS bucket
        |  FROM q CROSS JOIN d),
        |est AS (SELECT key_id, min(coalesce(cms.cnt, 0)) AS estimate
        |  FROM qh LEFT JOIN cms ON cms.depth = qh.depth
        |    AND cms.bucket = qh.bucket
        |  GROUP BY 1),
        |ex AS (SELECT key_id, CAST(count(*) AS BIGINT) AS exact_cnt
        |  FROM k WHERE key_id < 20 GROUP BY 1)
        |SELECT ex.key_id, ex.exact_cnt, est.estimate
        |FROM ex JOIN est ON est.key_id = ex.key_id
        |ORDER BY ex.key_id""".stripMargin,
    // q255: one deduplicating recursive walk PER landmark (q194's BFS
    // oracle), then the cnt/h fold replayed index-ordered over
    // hop-sorted lists
    "q255_harmonic_centrality" -> {
      val lms = Seq(2, 3, 5, 8)
      val walks = lms.map { l =>
        s"""w$l(node, hops) AS (
           |  SELECT CAST($l AS BIGINT), 0
           |  UNION
           |  SELECT e.d, w.hops + 1 FROM w$l w JOIN e ON e.s = w.node
           |  WHERE w.hops < 4),
           |h$l AS (SELECT hops, CAST(count(*) AS BIGINT) AS c FROM (
           |    SELECT node, min(hops) AS hops FROM w$l GROUP BY 1)
           |  WHERE hops > 0 GROUP BY 1),
           |g$l AS (SELECT list(hops ORDER BY hops) AS lh,
           |    list(c ORDER BY hops) AS lc, sum(c) AS n FROM h$l),
           |a$l AS (SELECT CAST($l AS BIGINT) AS landmark,
           |    CAST(coalesce(n, 0) AS BIGINT) AS n_reached,
           |    CASE WHEN n IS NULL THEN CAST(0 AS DOUBLE)
           |      ELSE list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |        list_transform(generate_series(1, len(lh)),
           |          i -> CAST(lc[i] AS DOUBLE) / CAST(lh[i] AS DOUBLE))),
           |        (x, y) -> x + y) END AS harmonic
           |  FROM g$l)""".stripMargin
      }.mkString(",\n")
      val union = lms.map(l => s"SELECT * FROM a$l").mkString(" UNION ALL ")
      s"""WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey AS ok,
         |    l_suppkey AS sk
         |  FROM lineitem WHERE l_orderkey % 20 = 0),
         |e AS (SELECT DISTINCT a.sk AS s, b.sk AS d
         |  FROM li a JOIN li b ON a.ok = b.ok WHERE a.sk <> b.sk),
         |$walks
         |SELECT * FROM ($union) ORDER BY landmark""".stripMargin
    },
    // q254: BRUTE-FORCE dominance replay — NOT EXISTS a componentwise-
    // <= point with one strict <; the engine's bucketed sweep must
    // reproduce it exactly, duplicates included
    "q254_skyline" ->
      """WITH p AS (SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS price_cents,
        |    epoch_us(o_orderdate) // 86400000000 AS order_day
        |  FROM orders WHERE o_custkey % 29 = 0)
        |SELECT a.o_orderkey, a.price_cents, a.order_day
        |FROM p a
        |WHERE NOT EXISTS (SELECT 1 FROM p b
        |  WHERE b.price_cents <= a.price_cents
        |    AND b.order_day <= a.order_day
        |    AND (b.price_cents < a.price_cents
        |         OR b.order_day < a.order_day))
        |ORDER BY a.o_orderkey""".stripMargin,
    // q252: the three rounds unrolled HUGEINT-for-HUGEINT; the sign
    // split keeps every // on non-negative operands (belt and braces:
    // Spark div and DuckDB integer // BOTH truncate toward zero, so
    // they agree on all signs — the split documents intent, it is not
    // a semantic need)
    "q252_power_iteration" -> {
      val rounds = (1 to 3).map { i =>
        val prev = if (i == 1) "v0" else s"v${i - 1}"
        s"""w$i AS (SELECT e.i, sum(e.q * v.v) AS w
           |  FROM e JOIN $prev v ON v.pos = e.pos GROUP BY 1),
           |u$i AS (SELECT e.pos, sum(w.w * e.q) AS u
           |  FROM e JOIN w$i w ON w.i = e.i GROUP BY 1),
           |m$i AS (SELECT max(abs(u)) AS m FROM u$i),
           |v$i AS (SELECT pos, CASE WHEN m.m = 0 THEN CAST(0 AS HUGEINT)
           |    ELSE (CASE WHEN u < 0 THEN -1 ELSE 1 END)
           |         * ((abs(u) * 1000000) // m.m) END AS v
           |  FROM u$i CROSS JOIN m$i m)""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT vec_id, embedding AS emb FROM embeddings),
         |x AS (SELECT vec_id AS i,
         |    unnest(generate_series(1, len(emb))) AS p, emb FROM t),
         |e AS (SELECT i, CAST(p - 1 AS BIGINT) AS pos,
         |    CAST(floor(CAST(emb[p] AS DOUBLE) * CAST(1e6 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS HUGEINT) AS q FROM x),
         |v0 AS (SELECT DISTINCT pos, CAST(1000000 AS HUGEINT) AS v FROM e),
         |$rounds
         |SELECT pos, CAST(v AS BIGINT) AS component_e6,
         |  CAST(v AS DOUBLE) / 1e6 AS component
         |FROM v3 ORDER BY pos""".stripMargin
    },
    // q250: q64's centroid chain verbatim, pair join on pos, and the
    // three folds replayed INDEX-ORDERED over pos-sorted lists (no
    // struct lambdas — the DuckDB 1.0 list_reduce struct bug is routed
    // around exactly as in q212)
    "q250_centroid_drift" ->
      """WITH t AS (SELECT label, embedding AS emb FROM embeddings),
        |e AS (SELECT label, unnest(generate_series(1, len(emb))) AS p,
        |    emb FROM t),
        |e2 AS (SELECT label, CAST(p - 1 AS BIGINT) AS pos,
        |    CAST(floor(CAST(emb[p] AS DOUBLE) * CAST(1e10 AS DOUBLE)
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q FROM e),
        |c AS (SELECT label, pos,
        |    CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |      / CAST(1e10 AS DOUBLE) AS c,
        |    CAST(count(*) AS BIGINT) AS n_vecs
        |  FROM e2 GROUP BY 1, 2),
        |p2 AS (SELECT a.label AS key_a, b.label AS key_b,
        |    a.n_vecs AS n_a, b.n_vecs AS n_b, a.pos,
        |    a.c AS ca, b.c AS cb
        |  FROM c a JOIN c b ON b.pos = a.pos AND a.label < b.label),
        |f AS (SELECT key_a, key_b, max(n_a) AS n_a, max(n_b) AS n_b,
        |    list(ca ORDER BY pos) AS la, list(cb ORDER BY pos) AS lb
        |  FROM p2 GROUP BY 1, 2),
        |g AS (SELECT key_a, key_b, n_a, n_b,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(la)),
        |        i -> la[i] * lb[i])), (x, y) -> x + y) AS dot,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(la)),
        |        i -> la[i] * la[i])), (x, y) -> x + y) AS qa,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(lb)),
        |        i -> lb[i] * lb[i])), (x, y) -> x + y) AS qb
        |  FROM f)
        |SELECT key_a, key_b, n_a, n_b,
        |  CASE WHEN qa = 0 OR qb = 0 THEN NULL
        |       ELSE dot / (sqrt(qa) * sqrt(qb)) END AS cosine
        |FROM g ORDER BY key_a, key_b""".stripMargin,
    // q251: BRUTE-FORCE replay — cross-join neighborhoods, core flags,
    // recursive-CTE reachability closure for the components (min label
    // per node), min-pinned border assignment
    "q251_dbscan" ->
      """WITH RECURSIVE c AS (SELECT c_custkey AS id,
        |    CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
        |      || ':cx'), 1, 6)) AS BIGINT) % 10000000 AS x,
        |    CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
        |      || ':cy'), 1, 6)) AS BIGINT) % 10000000 AS y
        |  FROM customer WHERE c_nationkey = 3),
        |p AS (SELECT a.id AS l, b.id AS r FROM c a JOIN c b
        |  ON a.id <> b.id
        |  AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |    <= 250000000000),
        |n AS (SELECT c.id, CAST(coalesce(q.cnt, 0) + 1 AS BIGINT) AS n_nbrs
        |  FROM c LEFT JOIN (SELECT l, count(*) AS cnt FROM p GROUP BY 1) q
        |    ON q.l = c.id),
        |f AS (SELECT id, n_nbrs, n_nbrs >= 5 AS is_core FROM n),
        |ce AS (SELECT p.l AS a, p.r AS b FROM p
        |  JOIN f fa ON fa.id = p.l JOIN f fb ON fb.id = p.r
        |  WHERE fa.is_core AND fb.is_core),
        |reach(node, lbl) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM ce)
        |  UNION
        |  SELECT ce.b, reach.lbl FROM reach JOIN ce ON ce.a = reach.node),
        |comp AS (SELECT node AS id, min(lbl) AS cl FROM reach GROUP BY 1),
        |corecl AS (SELECT f.id, coalesce(comp.cl, f.id) AS cl
        |  FROM f LEFT JOIN comp ON comp.id = f.id WHERE f.is_core),
        |bm AS (SELECT p.l AS id, min(k.cl) AS bc FROM p
        |  JOIN corecl k ON k.id = p.r GROUP BY 1)
        |SELECT f.id, f.n_nbrs,
        |  CASE WHEN f.is_core THEN 'core'
        |       WHEN bm.bc IS NOT NULL THEN 'border'
        |       ELSE 'noise' END AS role,
        |  CASE WHEN f.is_core THEN corecl.cl ELSE bm.bc END AS cluster
        |FROM f LEFT JOIN corecl ON corecl.id = f.id
        |  LEFT JOIN bm ON bm.id = f.id
        |ORDER BY f.id""".stripMargin,
    // q248: q190's integer-for-integer replay discipline — HUGEINT
    // inflow sums, the same (raw * scale) // total renormalization,
    // both rounds unrolled
    "q248_hits" -> {
      val S = graft.operators.Graph.RankScale
      val rounds = (1 to 2).map { i =>
        val prevH = if (i == 1) "h0" else s"h${i - 1}"
        s"""ar$i AS (SELECT e.d AS node, sum(CAST(h.h AS HUGEINT)) AS ar
           |  FROM e JOIN $prevH h ON h.node = e.s GROUP BY 1),
           |at$i AS (SELECT sum(ar) AS at FROM ar$i),
           |a$i AS (SELECT nd.node,
           |    CAST(CASE WHEN ar.ar IS NULL THEN 0
           |         ELSE (ar.ar * $S) // t.at END AS BIGINT) AS a
           |  FROM nodes nd CROSS JOIN at$i t
           |  LEFT JOIN ar$i ar ON ar.node = nd.node),
           |hr$i AS (SELECT e.s AS node, sum(CAST(a.a AS HUGEINT)) AS hr
           |  FROM e JOIN a$i a ON a.node = e.d GROUP BY 1),
           |ht$i AS (SELECT sum(hr) AS ht FROM hr$i),
           |h$i AS (SELECT nd.node,
           |    CAST(CASE WHEN hr.hr IS NULL THEN 0
           |         ELSE (hr.hr * $S) // t.ht END AS BIGINT) AS h
           |  FROM nodes nd CROSS JOIN ht$i t
           |  LEFT JOIN hr$i hr ON hr.node = nd.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT DISTINCT o.o_custkey AS s,
         |    l.l_suppkey + 1000000000 AS d
         |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |  WHERE o.o_custkey % 5 = 0),
         |nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |h0 AS (SELECT node, CAST($S // nn.n AS BIGINT) AS h
         |  FROM nodes CROSS JOIN nn),
         |$rounds
         |SELECT a.node, a.a AS authority_e12, h.h AS hub_e12,
         |  CAST(a.a AS DOUBLE) / 1e12 AS authority,
         |  CAST(h.h AS DOUBLE) / 1e12 AS hub
         |FROM a2 a JOIN h2 h ON h.node = a.node ORDER BY a.node""".stripMargin
    },
    // q249: three unrolled most-frequent-neighbor-label rounds, ties to
    // the smallest label via the window order
    "q249_label_propagation" -> {
      val rounds = (1 to 3).map { i =>
        val prev = if (i == 1) "l0" else s"l${i - 1}"
        s"""c$i AS (SELECT e.u AS node, l.label AS lbl,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM e JOIN $prev l ON l.node = e.v GROUP BY 1, 2),
           |l$i AS (SELECT node, lbl AS label FROM (
           |    SELECT node, lbl, row_number()
           |      OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
           |    FROM c$i) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
         |  FROM lineitem WHERE l_orderkey % 20 = 0),
         |e AS (SELECT DISTINCT a.sk AS u, b.sk AS v
         |  FROM li a JOIN li b ON a.ok = b.ok WHERE a.sk <> b.sk),
         |nodes AS (SELECT DISTINCT u AS node FROM e),
         |l0 AS (SELECT node, node AS label FROM nodes),
         |$rounds
         |SELECT node, label FROM l3 ORDER BY node""".stripMargin
    },
    // q245: identical exact micro-unit cell sums (HUGEINT, VARCHAR-routed
    // to double), identical fixed-order mean/variance/DiD chain; the 2x2
    // pivot pins the variance-sum fold order in both engines
    "q245_diff_in_diff" ->
      """WITH u AS (SELECT user_id,
        |    substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 1) >= '8'
        |      AS is_treated,
        |    ts >= TIMESTAMP '2024-01-15 00:00:00' AS is_post,
        |    coalesce(CAST(value AS DECIMAL(18,6)),
        |             CAST(0 AS DECIMAL(18,6))) AS v
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |uu AS (SELECT user_id, is_treated, is_post,
        |    CAST(CAST(sum(v) AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS yi
        |  FROM u GROUP BY 1, 2, 3),
        |c AS (SELECT is_treated, is_post,
        |    CAST(count(*) AS BIGINT) AS n_units,
        |    sum(yi) AS sy, sum(yi * yi) AS syy
        |  FROM uu GROUP BY 1, 2),
        |m AS (SELECT is_treated, is_post, n_units,
        |    (CAST(CAST(sy AS VARCHAR) AS DOUBLE) / 1e6)
        |      / CAST(n_units AS DOUBLE) AS mean_metric,
        |    ((CAST(CAST(syy AS VARCHAR) AS DOUBLE) / 1e12
        |      - (CAST(CAST(sy AS VARCHAR) AS DOUBLE) / 1e6)
        |        * (CAST(CAST(sy AS VARCHAR) AS DOUBLE) / 1e6)
        |        / CAST(n_units AS DOUBLE))
        |     / (CAST(n_units AS DOUBLE) - 1.0))
        |      / CAST(n_units AS DOUBLE) AS vn
        |  FROM c),
        |p AS (SELECT
        |    max(CASE WHEN is_treated AND is_post THEN mean_metric END) AS mtp,
        |    max(CASE WHEN is_treated AND NOT is_post THEN mean_metric END) AS mt0,
        |    max(CASE WHEN NOT is_treated AND is_post THEN mean_metric END) AS mcp,
        |    max(CASE WHEN NOT is_treated AND NOT is_post THEN mean_metric END) AS mc0,
        |    max(CASE WHEN is_treated AND is_post THEN vn END) AS vtp,
        |    max(CASE WHEN is_treated AND NOT is_post THEN vn END) AS vt0,
        |    max(CASE WHEN NOT is_treated AND is_post THEN vn END) AS vcp,
        |    max(CASE WHEN NOT is_treated AND NOT is_post THEN vn END) AS vc0,
        |    min(n_units) AS minn
        |  FROM m),
        |v AS (SELECT
        |    (mtp - mt0) - (mcp - mc0) AS did_estimate,
        |    CASE WHEN minn < 2 OR vtp + vt0 + vcp + vc0 <= 0 THEN NULL
        |         ELSE sqrt(vtp + vt0 + vcp + vc0) END AS se,
        |    CASE WHEN minn < 2 OR vtp + vt0 + vcp + vc0 <= 0 THEN NULL
        |         ELSE ((mtp - mt0) - (mcp - mc0))
        |              / sqrt(vtp + vt0 + vcp + vc0) END AS t_stat
        |  FROM p)
        |SELECT is_treated, is_post, n_units, mean_metric,
        |  did_estimate, se, t_stat
        |FROM m CROSS JOIN v ORDER BY is_treated, is_post""".stripMargin,
    // q246: same normalized-token chain as q100/q243, same three regex
    // constants, same fixed-order double formula over exact integers
    "q246_readability" ->
      """WITH tks AS (SELECT doc_id, text,
        |    list_filter(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |      x -> x <> '') AS tk
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
        |      AS BIGINT) AS n_sentences,
        |    CAST(len(tk) AS BIGINT) AS n_words,
        |    CAST(list_reduce(list_prepend(0, list_transform(tk,
        |        w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))),
        |      (a, b) -> a + b) AS BIGINT) AS n_syllables
        |  FROM tks),
        |r AS (SELECT doc_id, n_sentences, n_words, n_syllables,
        |    CAST(n_words AS DOUBLE)
        |      / CAST(greatest(CAST(1 AS BIGINT), n_sentences) AS DOUBLE) AS wps,
        |    CAST(n_syllables AS DOUBLE)
        |      / CAST(greatest(CAST(1 AS BIGINT), n_words) AS DOUBLE) AS spw
        |  FROM c)
        |SELECT doc_id, n_sentences, n_words, n_syllables,
        |  CAST(206.835 AS DOUBLE) - CAST(1.015 AS DOUBLE) * wps
        |    - CAST(84.6 AS DOUBLE) * spw AS flesch_ease,
        |  CAST(0.39 AS DOUBLE) * wps + CAST(11.8 AS DOUBLE) * spw
        |    - CAST(15.59 AS DOUBLE) AS fk_grade
        |FROM r ORDER BY doc_id""".stripMargin,
    // q247: q217's capped-basket CTE chain, then support/confidence/lift
    // as the same fixed-order divisions of exact counts
    "q247_association_rules" ->
      """WITH inter AS (SELECT DISTINCT o.o_custkey AS u,
        |    l.l_partkey % 50 AS i
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_custkey % 7 = 1),
        |kept AS (SELECT u FROM (SELECT u, count(*) AS bs FROM inter
        |  GROUP BY 1) WHERE bs <= 1000),
        |capped AS (SELECT inter.u, inter.i FROM inter
        |  JOIN kept ON kept.u = inter.u),
        |nb AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_baskets
        |  FROM capped),
        |ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM capped
        |  GROUP BY 1),
        |p AS (SELECT a.i AS antecedent, b.i AS consequent,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM capped a JOIN capped b ON b.u = a.u AND a.i <> b.i
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT p.antecedent, p.consequent, p.n_ab,
        |  ca.ci AS n_a, cb.ci AS n_b, nb.n_baskets,
        |  CAST(p.n_ab AS DOUBLE) / CAST(nb.n_baskets AS DOUBLE) AS support,
        |  CAST(p.n_ab AS DOUBLE) / CAST(ca.ci AS DOUBLE) AS confidence,
        |  CAST(p.n_ab AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE)
        |    / (CAST(ca.ci AS DOUBLE) * CAST(cb.ci AS DOUBLE)) AS lift
        |FROM p JOIN ic ca ON ca.i = p.antecedent
        |  JOIN ic cb ON cb.i = p.consequent
        |  CROSS JOIN nb
        |ORDER BY antecedent, consequent""".stripMargin,
    "q209_radius_join" ->
      """WITH c AS (SELECT c_custkey AS lid,
        |    CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
        |      || ':cx'), 1, 6)) AS BIGINT) % 10000000 AS x,
        |    CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
        |      || ':cy'), 1, 6)) AS BIGINT) % 10000000 AS y
        |  FROM customer WHERE c_nationkey = 3),
        |s AS (SELECT s_suppkey AS rid,
        |    CAST(('0x' || substr(md5(CAST(s_suppkey AS VARCHAR)
        |      || ':sx'), 1, 6)) AS BIGINT) % 10000000 AS x,
        |    CAST(('0x' || substr(md5(CAST(s_suppkey AS VARCHAR)
        |      || ':sy'), 1, 6)) AS BIGINT) % 10000000 AS y
        |  FROM supplier)
        |SELECT c.lid AS l_id, s.rid AS r_id,
        |  CAST((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
        |    AS BIGINT) AS dist_sq
        |FROM c, s
        |WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
        |  <= 1000000000000
        |ORDER BY l_id, r_id""".stripMargin,
    // q208: the same sweep — running-max-before window, island prefix
    // sums, exact BIGINT microsecond lengths
    "q208_interval_union" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + (event_id % 3600 + 1) * 1000000 AS e
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |m AS (SELECT user_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM iv),
        |g AS (SELECT user_id, s, e,
        |    sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS island
        |  FROM m),
        |i AS (SELECT user_id, island, CAST(count(*) AS BIGINT) AS k,
        |    min(s) AS ms, max(e) AS me
        |  FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(k) AS BIGINT) AS n_intervals,
        |  CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(me - ms) AS BIGINT) AS covered
        |FROM i GROUP BY 1 ORDER BY user_id""".stripMargin,
    // q207: the same pairwise S over (event_type, day) pairs, HUGEINT
    // tie terms, VARCHAR-routed int128->double casts, identical
    // fixed-order z / tau_b formulas
    "q207_mann_kendall" ->
      """WITH s AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    CAST(sum(CASE WHEN b.y > a.y THEN 1
        |                  WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
        |      AS s_stat
        |  FROM s a JOIN s b ON b.event_type = a.event_type
        |    AND a.day < b.day
        |  GROUP BY 1),
        |t AS (SELECT event_type, CAST(sum(tt) AS BIGINT) AS n,
        |    sum(tt * (tt - 1) * (2 * tt + 5)) AS tie3,
        |    sum(tt * (tt - 1)) AS tie2
        |  FROM (SELECT event_type, y, CAST(count(*) AS HUGEINT) AS tt
        |    FROM s GROUP BY 1, 2) GROUP BY 1),
        |c AS (SELECT t.event_type, t.n, coalesce(p.s_stat, 0) AS s_stat,
        |    CAST(t.n AS HUGEINT) * (t.n - 1) * (2 * t.n + 5) - t.tie3
        |      AS vn,
        |    CAST(t.n AS HUGEINT) * (t.n - 1) // 2 AS d,
        |    t.tie2 // 2 AS u
        |  FROM t LEFT JOIN p ON p.event_type = t.event_type)
        |SELECT event_type, n, s_stat,
        |  CAST(CAST(vn AS VARCHAR) AS DOUBLE) AS var_num,
        |  CASE WHEN vn <= 0 THEN NULL
        |       WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0) /
        |         sqrt(CAST(CAST(vn AS VARCHAR) AS DOUBLE) / 18.0)
        |       WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0) /
        |         sqrt(CAST(CAST(vn AS VARCHAR) AS DOUBLE) / 18.0)
        |       ELSE 0.0 END AS z,
        |  CASE WHEN vn <= 0 THEN NULL
        |       ELSE CAST(s_stat AS DOUBLE) /
        |         sqrt(CAST(CAST(d AS VARCHAR) AS DOUBLE) *
        |           CAST(CAST(d - u AS VARCHAR) AS DOUBLE)) END AS tau_b
        |FROM c ORDER BY event_type""".stripMargin,
    // q206: identical journey construction, identical variant
    // expansion, the SAME integer fixed-point unrolled 8 rounds
    // (HUGEINT products, floor divides), channel-ordered share fold
    "q206_markov_attribution" -> {
      val S = 1000000000000L
      val rounds = (1 to 8).map { i =>
        val prev = if (i == 1) "v0" else s"v${i - 1}"
        s"""v$i AS (SELECT vc.variant, vc.src AS state,
           |  CAST(sum(CAST(vc.n AS HUGEINT) *
           |    (CASE WHEN vc.dst = '~conv' THEN $S
           |          WHEN vc.dst = '~null' THEN 0
           |          ELSE coalesce(vp._v, 0) END)) // t._tot AS BIGINT) AS _v
           |  FROM vc JOIN tot t ON t.variant = vc.variant AND t.src = vc.src
           |  LEFT JOIN $prev vp ON vp.variant = vc.variant AND vp.state = vc.dst
           |  GROUP BY vc.variant, vc.src, t._tot)""".stripMargin
      }.mkString(",\n")
      s"""WITH base AS (SELECT user_id, ts, event_id, event_type FROM events
         |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         |fc AS (SELECT user_id, min(ts) AS fc FROM base
         |  WHERE event_type = 'purchase' GROUP BY 1),
         |j AS (SELECT b.user_id, b.ts, b.event_id, b.event_type AS c,
         |    (fc.fc IS NOT NULL) AS cv
         |  FROM base b LEFT JOIN fc ON fc.user_id = b.user_id
         |  WHERE b.event_type <> 'purchase'
         |    AND (fc.fc IS NULL OR b.ts < fc.fc)),
         |mk AS (SELECT user_id, c, cv,
         |    lead(c) OVER w AS nxt, row_number() OVER w AS rn
         |  FROM j WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |tr AS (
         |  SELECT c AS src, nxt AS dst FROM mk WHERE nxt IS NOT NULL
         |  UNION ALL SELECT '~start', c FROM mk WHERE rn = 1
         |  UNION ALL SELECT c, CASE WHEN cv THEN '~conv' ELSE '~null' END
         |    FROM mk WHERE nxt IS NULL
         |  UNION ALL SELECT '~start', '~conv' FROM fc
         |    WHERE user_id NOT IN (SELECT DISTINCT user_id FROM j)),
         |cnt AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
         |  FROM tr GROUP BY 1, 2),
         |ch AS (SELECT DISTINCT src AS c FROM cnt WHERE src NOT LIKE '~%'),
         |vr AS (SELECT ch.c AS variant, cnt.src,
         |    CASE WHEN cnt.dst = ch.c THEN '~null' ELSE cnt.dst END AS dst,
         |    cnt.n
         |  FROM cnt CROSS JOIN ch WHERE cnt.src <> ch.c
         |  UNION ALL SELECT '', src, dst, n FROM cnt),
         |vc AS (SELECT variant, src, dst, CAST(sum(n) AS BIGINT) AS n
         |  FROM vr GROUP BY 1, 2, 3),
         |tot AS (SELECT variant, src, CAST(sum(n) AS BIGINT) AS _tot
         |  FROM vc GROUP BY 1, 2),
         |v0 AS (SELECT variant, src AS state, CAST(0 AS BIGINT) AS _v
         |  FROM tot),
         |$rounds,
         |pb AS (SELECT _v AS pb FROM v8 WHERE variant = '' AND state = '~start'),
         |pc AS (SELECT variant AS channel, _v AS pr FROM v8
         |  WHERE variant <> '' AND state = '~start'),
         |re AS (SELECT channel, pb.pb AS p_base_e12, pr AS p_removed_e12,
         |    CASE WHEN pb.pb = 0 THEN NULL
         |         ELSE 1.0 - CAST(pr AS DOUBLE) / CAST(pb.pb AS DOUBLE) END
         |      AS removal_effect
         |  FROM pc CROSS JOIN pb),
         |dn AS (SELECT list_reduce(list_prepend(0.0,
         |    list(coalesce(removal_effect, 0.0) ORDER BY channel)),
         |    (x, y) -> x + y) AS s FROM re)
         |SELECT re.channel, re.p_base_e12, re.p_removed_e12,
         |  re.removal_effect,
         |  CASE WHEN dn.s = 0.0 OR re.removal_effect IS NULL THEN NULL
         |       ELSE re.removal_effect / dn.s END AS attribution
         |FROM re CROSS JOIN dn ORDER BY re.channel""".stripMargin
    },
    // q205: q180's hex bins verbatim, then the SAME minimax lattice —
    // exact windowed prefixes, one division per interval, min/max over
    // identical doubles
    "q205_isotonic_fit" ->
      """WITH d AS (SELECT
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cal'), 1, 5))
        |      AS BIGINT) % 1000000 AS s6,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':lbl'), 1, 5))
        |      AS BIGINT) % 1000000 AS u6
        |  FROM documents),
        |r AS (SELECT least((s6 * 10) // 1000000, 9) AS bin,
        |    CASE WHEN u6 < s6 THEN 1 ELSE 0 END AS y
        |  FROM d),
        |a AS (SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS s
        |  FROM r GROUP BY 1),
        |base AS (SELECT * FROM a WHERE n > 0),
        |cum AS (SELECT bin, n, s,
        |    CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
        |    CAST(sum(s) OVER (ORDER BY bin) AS BIGINT) AS cs
        |  FROM base),
        |iv AS (SELECT l.bin AS i, h.bin AS j,
        |    CAST(h.cs - (l.cs - l.s) AS DOUBLE)
        |      / CAST(h.cn - (l.cn - l.n) AS DOUBLE) AS avgv
        |  FROM cum l JOIN cum h ON l.bin <= h.bin),
        |m AS (SELECT b.bin, iv.i, min(iv.avgv) AS mn
        |  FROM iv JOIN base b ON iv.i <= b.bin AND b.bin <= iv.j
        |  GROUP BY 1, 2),
        |f AS (SELECT bin, max(mn) AS rate_iso FROM m GROUP BY bin)
        |SELECT b.bin, b.n, b.s AS n_pos,
        |  CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS rate_raw, f.rate_iso
        |FROM base b JOIN f ON f.bin = b.bin ORDER BY b.bin""".stripMargin,
    // q204: q184's exact cell statistics verbatim, the same 3σ verdict
    // on the same doubles, counted
    "q204_seasonal_anomalies" ->
      """WITH d AS (SELECT event_type,
        |    CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour_of_day,
        |    value,
        |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS yi
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |s AS (SELECT event_type, hour_of_day,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(CAST(sum(yi) AS VARCHAR) AS DOUBLE) / 1e6 AS sy,
        |    CAST(CAST(sum(yi * yi) AS VARCHAR) AS DOUBLE) / 1e12 AS syy
        |  FROM d GROUP BY 1, 2),
        |p AS (SELECT event_type, hour_of_day, n,
        |    sy / CAST(n AS DOUBLE) AS mean_value,
        |    sqrt(greatest(0.0e0, syy / CAST(n AS DOUBLE)
        |      - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE))))
        |      AS stddev_value
        |  FROM s)
        |SELECT d.event_type, d.hour_of_day, p.n,
        |  CAST(sum(CASE WHEN abs(CAST(d.value AS DOUBLE) - p.mean_value)
        |                     > 3.0 * p.stddev_value
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
        |  CAST(sum(CASE WHEN abs(CAST(d.value AS DOUBLE) - p.mean_value)
        |                     > 3.0 * p.stddev_value
        |                THEN 1 ELSE 0 END) AS DOUBLE) / CAST(p.n AS DOUBLE)
        |    AS anomaly_frac
        |FROM d JOIN p ON p.event_type = d.event_type
        |  AND p.hour_of_day = d.hour_of_day
        |GROUP BY d.event_type, d.hour_of_day, p.n
        |ORDER BY d.event_type, d.hour_of_day""".stripMargin,
    // q203: identical micro-unit clamped bins, +1/-smoothed p's,
    // bin-ordered list_reduce, the same floor(x·1e6+0.5)/1e6 seam
    "q203_psi_drift" ->
      """WITH d AS (SELECT event_type,
        |    CAST(ts < TIMESTAMP '2024-01-15 00:00:00' AS BOOLEAN) AS is_ref,
        |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v6
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |b AS (SELECT event_type, is_ref,
        |    least((greatest(v6 + 1000000000, 0) * 10) // 2000000000, 9) AS bin
        |  FROM d),
        |c AS (SELECT event_type, bin,
        |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cr,
        |    CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS cc
        |  FROM b GROUP BY 1, 2),
        |spine AS (SELECT DISTINCT event_type FROM c),
        |g AS (SELECT s.event_type, gs.bin,
        |    CAST(coalesce(c.cr, 0) AS BIGINT) AS cr,
        |    CAST(coalesce(c.cc, 0) AS BIGINT) AS cc
        |  FROM spine s
        |  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) gs
        |  LEFT JOIN c ON c.event_type = s.event_type AND c.bin = gs.bin),
        |t AS (SELECT event_type,
        |    CAST(sum(cr) AS BIGINT) AS n_ref, CAST(sum(cc) AS BIGINT) AS n_cur,
        |    list(struct_pack(b := bin, cr := cr, cc := cc) ORDER BY bin) AS arr
        |  FROM g GROUP BY 1)
        |SELECT event_type, n_ref, n_cur,
        |  floor(list_reduce(list_prepend(0.0, list_transform(arr, s ->
        |      (CAST(s.cc + 1 AS DOUBLE) / CAST(n_cur + 10 AS DOUBLE)
        |        - CAST(s.cr + 1 AS DOUBLE) / CAST(n_ref + 10 AS DOUBLE))
        |      * ln((CAST(s.cc + 1 AS DOUBLE) / CAST(n_cur + 10 AS DOUBLE))
        |          / (CAST(s.cr + 1 AS DOUBLE) / CAST(n_ref + 10 AS DOUBLE))))),
        |    (x, y) -> x + y) * 1e6 + 0.5) / 1e6 AS psi
        |FROM t ORDER BY event_type""".stripMargin,
    // q202: q175's canonical 3-join triangle replay + an unnest degree
    // count, the same 2T/(d(d−1)) single division
    "q202_clustering_coeff" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |  FROM lineitem WHERE l_orderkey % 20 = 0),
        |e AS (SELECT DISTINCT a.sk AS u, b.sk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |tn AS (SELECT node, CAST(count(*) AS BIGINT) AS t
        |  FROM (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY node),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
        |  FROM (SELECT unnest([u, v]) AS node FROM e) GROUP BY node)
        |SELECT d.node, d.degree,
        |  CAST(coalesce(tn.t, 0) AS BIGINT) AS n_triangles,
        |  CASE WHEN d.degree < 2 THEN 0.0
        |       ELSE CAST(coalesce(tn.t, 0) * 2 AS DOUBLE)
        |         / CAST(d.degree * (d.degree - 1) AS DOUBLE) END
        |    AS clustering_coeff
        |FROM deg d LEFT JOIN tn ON tn.node = d.node
        |ORDER BY d.node""".stripMargin,
    // q201: q179's cosine/dot rankings verbatim, binary relevance,
    // row_number TP counter + rank-ordered list_reduce fold
    "q201_average_precision" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |cos AS (SELECT q.query_id, e.vec_id AS nid,
        |    list_inner_product(e.v, q.qv)
        |      / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(q.qv, q.qv)))
        |      AS score
        |  FROM e CROSS JOIN q),
        |r10 AS (SELECT query_id, nid, rk FROM (
        |    SELECT query_id, nid,
        |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, nid) AS rk
        |    FROM cos) WHERE rk <= 10),
        |dots AS (SELECT q.query_id, e.vec_id AS nid,
        |    list_inner_product(e.v, q.qv) AS s
        |  FROM e CROSS JOIN q),
        |rels AS (SELECT query_id, nid FROM (
        |    SELECT query_id, nid,
        |      row_number() OVER (PARTITION BY query_id ORDER BY s DESC, nid) AS rn
        |    FROM dots) WHERE rn <= 15),
        |hits AS (SELECT r.query_id, r.rk,
        |    row_number() OVER (PARTITION BY r.query_id ORDER BY r.rk) AS j
        |  FROM r10 r JOIN rels l ON l.query_id = r.query_id AND l.nid = r.nid),
        |s AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits,
        |    list_reduce(list_prepend(0.0,
        |      list(CAST(j AS DOUBLE) / CAST(rk AS DOUBLE) ORDER BY rk)),
        |      (a, b) -> a + b) AS apsum
        |  FROM hits GROUP BY query_id),
        |rr AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
        |  FROM rels GROUP BY query_id)
        |SELECT rr.query_id, rr.n_rel,
        |  CAST(coalesce(s.n_hits, 0) AS BIGINT) AS n_hits,
        |  coalesce(s.apsum, 0.0) / CAST(least(rr.n_rel, 10) AS DOUBLE) AS ap
        |FROM rr LEFT JOIN s ON s.query_id = rr.query_id
        |ORDER BY rr.query_id""".stripMargin,
    // q240: q201's ranking/relevance CTEs verbatim, first-hit min rank,
    // one division
    "q240_reciprocal_rank" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
        |cos AS (SELECT q.query_id, e.vec_id AS nid,
        |    list_inner_product(e.v, q.qv)
        |      / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(q.qv, q.qv)))
        |      AS score
        |  FROM e CROSS JOIN q),
        |r10 AS (SELECT query_id, nid, rk FROM (
        |    SELECT query_id, nid,
        |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, nid) AS rk
        |    FROM cos) WHERE rk <= 10),
        |dots AS (SELECT q.query_id, e.vec_id AS nid,
        |    list_inner_product(e.v, q.qv) AS s
        |  FROM e CROSS JOIN q),
        |rels AS (SELECT query_id, nid FROM (
        |    SELECT query_id, nid,
        |      row_number() OVER (PARTITION BY query_id ORDER BY s DESC, nid) AS rn
        |    FROM dots) WHERE rn <= 15),
        |h AS (SELECT r.query_id, CAST(min(r.rk) AS BIGINT) AS first_rank
        |  FROM r10 r JOIN rels l ON l.query_id = r.query_id AND l.nid = r.nid
        |  GROUP BY r.query_id),
        |n AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
        |  FROM rels GROUP BY query_id)
        |SELECT n.query_id, n.n_rel, h.first_rank,
        |  CASE WHEN h.first_rank IS NOT NULL
        |    THEN 1.0e0 / CAST(h.first_rank AS DOUBLE) ELSE 0.0e0 END AS rr
        |FROM n LEFT JOIN h ON h.query_id = n.query_id
        |ORDER BY n.query_id""".stripMargin,
    // q200: the same md5 pair construction, scored by DuckDB's OWN
    // jaro_similarity / jaro_winkler_similarity builtins — the
    // differential oracle for the native expression
    "q200_jaro_winkler" ->
      """WITH d AS (SELECT doc_id,
        |    substr(md5(CAST(doc_id AS VARCHAR) || ':jwp'), 1, 4) AS pfx,
        |    substr(md5(CAST(doc_id AS VARCHAR) || ':jwa'), 1, 8) AS ta,
        |    substr(md5(CAST(doc_id AS VARCHAR) || ':jwb'), 1, 8) AS tb
        |  FROM documents),
        |p AS (SELECT doc_id, pfx || ta AS a,
        |    CASE WHEN doc_id % 5 = 0 THEN pfx || ta ELSE pfx || tb END AS b
        |  FROM d)
        |SELECT doc_id, jaro_similarity(a, b) AS jaro,
        |  jaro_winkler_similarity(a, b) AS jw
        |FROM p ORDER BY doc_id""".stripMargin,
    // q199: identical cells/marginals, (a,b)-ordered list_reduce folds,
    // the SAME floor(x·1e6 + 0.5)/1e6 pure-IEEE rounding seam
    "q199_mutual_information" ->
      """WITH cells AS (SELECT lang AS a, source AS b,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY a),
        |ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY b),
        |nn AS (SELECT CAST(coalesce(sum(o), 0) AS BIGINT) AS n,
        |    CAST(CAST(coalesce(sum(o), 0) AS BIGINT) AS DOUBLE) AS n_d
        |  FROM cells),
        |j AS (SELECT cells.a, cells.b, o, ra, cb, nn.n, nn.n_d
        |  FROM cells JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN nn),
        |mi AS (SELECT any_value(n) AS n, CAST(count(*) AS BIGINT) AS n_cells,
        |    greatest(floor(list_reduce(list_prepend(0.0, list(
        |        (CAST(o AS DOUBLE) / n_d)
        |          * ln((CAST(o AS DOUBLE) / n_d)
        |            / ((CAST(ra AS DOUBLE) / n_d) * (CAST(cb AS DOUBLE) / n_d)))
        |        ORDER BY a, b)), (x, y) -> x + y) * 1e6 + 0.5) / 1e6,
        |      0.0) AS mi
        |  FROM j),
        |ha AS (SELECT floor(-list_reduce(list_prepend(0.0, list(
        |      (CAST(ra AS DOUBLE) / nn.n_d) * ln(CAST(ra AS DOUBLE) / nn.n_d)
        |      ORDER BY a)), (x, y) -> x + y) * 1e6 + 0.5) / 1e6 AS h_a
        |  FROM rt CROSS JOIN nn GROUP BY nn.n_d),
        |hb AS (SELECT floor(-list_reduce(list_prepend(0.0, list(
        |      (CAST(cb AS DOUBLE) / nn.n_d) * ln(CAST(cb AS DOUBLE) / nn.n_d)
        |      ORDER BY b)), (x, y) -> x + y) * 1e6 + 0.5) / 1e6 AS h_b
        |  FROM ct CROSS JOIN nn GROUP BY nn.n_d)
        |SELECT mi.n, mi.n_cells, mi.mi, ha.h_a, hb.h_b,
        |  CASE WHEN ha.h_a = 0.0 OR hb.h_b = 0.0 THEN NULL
        |       ELSE mi.mi / sqrt(ha.h_a * hb.h_b) END AS nmi
        |FROM mi CROSS JOIN ha CROSS JOIN hb""".stripMargin,
    // q198: per-pair subqueries over the same micro-unit sums, HUGEINT
    // through the VARCHAR→DOUBLE lane, same fixed-order closed form
    "q198_correlation_matrix" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val subs = for {
        i <- cols.indices; j <- (i + 1) until cols.size
      } yield {
        val (a, b) = (cols(i), cols(j))
        s"""SELECT '$a' AS col_a, '$b' AS col_b, n AS n_pairs,
           |  CASE WHEN n = 0 OR n_d * sxx - sx * sx = 0
           |         OR n_d * syy - sy * sy = 0 THEN NULL
           |       ELSE (n_d * sxy - sx * sy)
           |         / (sqrt(n_d * sxx - sx * sx) * sqrt(n_d * syy - sy * sy))
           |  END AS corr
           |FROM (SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(count(*) AS DOUBLE) AS n_d,
           |    CAST(CAST(sum(xi) AS VARCHAR) AS DOUBLE) / 1e6 AS sx,
           |    CAST(CAST(sum(yi) AS VARCHAR) AS DOUBLE) / 1e6 AS sy,
           |    CAST(CAST(sum(xi * xi) AS VARCHAR) AS DOUBLE) / 1e12 AS sxx,
           |    CAST(CAST(sum(yi * yi) AS VARCHAR) AS DOUBLE) / 1e12 AS syy,
           |    CAST(CAST(sum(xi * yi) AS VARCHAR) AS DOUBLE) / 1e12 AS sxy
           |  FROM (SELECT
           |      CAST(CAST($a AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS xi,
           |      CAST(CAST($b AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS yi
           |    FROM lineitem
           |    WHERE $a IS NOT NULL AND $b IS NOT NULL))""".stripMargin
      }
      subs.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
    },
    // q197: identical micro-unit target, exact HUGEINT leave-one-out
    // numerator through the VARCHAR→DOUBLE lane, same division order
    "q197_target_encode_loo" ->
      """WITH d AS (SELECT o_orderkey AS id, o_orderpriority AS c,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS yi
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
        |g AS (SELECT c, CAST(sum(yi) AS HUGEINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM d GROUP BY c)
        |SELECT d.id AS o_orderkey, d.c AS category,
        |  CASE WHEN g.n <= 1 THEN NULL
        |       ELSE CAST(CAST(g.s - d.yi AS VARCHAR) AS DOUBLE) / 1e6
        |         / CAST(g.n - 1 AS DOUBLE) END AS loo_mean
        |FROM d JOIN g ON g.c = d.c ORDER BY o_orderkey""".stripMargin,
    // q196: identical (text, id) total order via row_number, identical
    // gap join and null-safe agreement weights in fold order
    "q196_sorted_neighborhood" ->
      """WITH r AS (SELECT doc_id AS id, text AS k FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |rk AS (SELECT id, row_number() OVER (ORDER BY k, id) AS rnk FROM r),
        |g AS (SELECT unnest(generate_series(1, 3)) AS rank_gap),
        |p AS (SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
        |    g.rank_gap
        |  FROM rk a CROSS JOIN g JOIN rk b ON b.rnk = a.rnk + g.rank_gap)
        |SELECT p.id_a, p.id_b, CAST(p.rank_gap AS INTEGER) AS rank_gap,
        |  (CASE WHEN da.lang IS NOT DISTINCT FROM db.lang
        |        THEN 0.6 ELSE 0.0 END
        |   + CASE WHEN da.source IS NOT DISTINCT FROM db.source
        |          THEN 0.4 ELSE 0.0 END) AS score
        |FROM p JOIN documents da ON da.doc_id = p.id_a
        |JOIN documents db ON db.doc_id = p.id_b
        |ORDER BY id_a, id_b""".stripMargin,
    // q195: identical symmetric edge convention, HUGEINT sums through
    // the VARCHAR→DOUBLE lane, same M·Σxy − (Σx)² closed form
    "q195_assortativity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |  FROM lineitem WHERE l_orderkey % 20 = 0),
        |e AS (SELECT DISTINCT least(a.sk, b.sk) AS u, greatest(a.sk, b.sk) AS v
        |  FROM li a JOIN li b ON a.ok = b.ok WHERE a.sk < b.sk),
        |both_dir AS (SELECT u AS s, v AS d FROM e
        |  UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT s AS n, CAST(count(*) AS BIGINT) AS dg
        |  FROM both_dir GROUP BY s),
        |pairs AS (SELECT dx.dg AS x, dy.dg AS y
        |  FROM both_dir b JOIN deg dx ON dx.n = b.s JOIN deg dy ON dy.n = b.d),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS m2,
        |    CAST(count(*) AS DOUBLE) AS m_d,
        |    CAST(CAST(sum(CAST(x AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(x AS HUGEINT) * x) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(CAST(x AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM pairs),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
        |SELECT nn.n_nodes, CAST(s.m2 // 2 AS BIGINT) AS m_edges,
        |  CASE WHEN s.m2 = 0 OR m_d * sxx - sx * sx = 0 THEN NULL
        |       ELSE (m_d * sxy - sx * sx) / (m_d * sxx - sx * sx)
        |  END AS assortativity
        |FROM s CROSS JOIN nn""".stripMargin,
    // q194: identical graph + landmarks; levels via a DEDUPLICATING
    // recursive CTE (UNION, not UNION ALL — (node, hops) states are
    // finite; path enumeration would explode on cycles), min per node
    "q194_bfs_hops" ->
      """WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |  FROM lineitem WHERE l_orderkey % 20 = 0),
        |e AS (SELECT DISTINCT a.sk AS s, b.sk AS d
        |  FROM li a JOIN li b ON a.ok = b.ok WHERE a.sk <> b.sk),
        |src AS (SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 10 = 0),
        |walk(node, hops) AS (
        |  SELECT node, 0 FROM src
        |  UNION
        |  SELECT e.d, w.hops + 1 FROM walk w JOIN e ON e.s = w.node
        |  WHERE w.hops < 4)
        |SELECT node, CAST(min(hops) AS INTEGER) AS hops
        |FROM walk GROUP BY node ORDER BY node""".stripMargin,
    // q193: identical day grain (q163's epoch-day floor), identical
    // index-aligned lag join and HUGEINT sufficient sums through the
    // VARCHAR→DOUBLE lane, same fixed-order closed form
    "q193_autocorrelation" ->
      """WITH d AS (SELECT event_type,
        |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) * 1000000 AS vi
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |p AS (SELECT l.event_type, lg.lag, l.vi AS x, r.vi AS y
        |  FROM d l
        |  CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS lag) lg
        |  JOIN d r ON r.event_type = l.event_type AND r.day = l.day + lg.lag),
        |s AS (SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(count(*) AS DOUBLE) AS n_d,
        |    CAST(CAST(sum(CAST(x AS HUGEINT)) AS VARCHAR) AS DOUBLE) / 1e6 AS sx,
        |    CAST(CAST(sum(CAST(x AS HUGEINT) * x) AS VARCHAR) AS DOUBLE) / 1e12 AS sxx,
        |    CAST(CAST(sum(CAST(y AS HUGEINT)) AS VARCHAR) AS DOUBLE) / 1e6 AS sy,
        |    CAST(CAST(sum(CAST(y AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) / 1e12 AS syy,
        |    CAST(CAST(sum(CAST(x AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) / 1e12 AS sxy
        |  FROM p GROUP BY 1, 2),
        |k AS (SELECT event_type, lag, n_pairs,
        |    n_d * sxy - sx * sy AS num,
        |    n_d * sxx - sx * sx AS denx,
        |    n_d * syy - sy * sy AS deny
        |  FROM s)
        |SELECT event_type, CAST(lag AS INTEGER) AS lag, n_pairs,
        |  CASE WHEN denx = 0 OR deny = 0 THEN NULL
        |       ELSE num / (sqrt(denx) * sqrt(deny)) END AS acf
        |FROM k ORDER BY event_type, lag""".stripMargin,
    // q192: identical hourly grain, identical integer fold — DuckDB's
    // list_reduce seeds with the first element exactly as the Spark
    // side's element_at(…, 1) seed; (x + 3s) // 4 is the same floor
    "q192_ewma_level" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    CAST(count(*) AS BIGINT) * 1000000 AS v6
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_periods,
        |  CAST(list_reduce(list(v6 ORDER BY bucket),
        |    (s, x) -> (1 * x + 3 * s) // 4) AS BIGINT) AS ewma_e6,
        |  CAST(list_reduce(list(v6 ORDER BY bucket),
        |    (s, x) -> (1 * x + 3 * s) // 4) AS DOUBLE) / 1e6 AS ewma
        |FROM h GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q191: identical grid/marginals, HUGEINT product through the
    // VARCHAR→DOUBLE lane, identical (a,b)-ordered list_reduce fold
    "q191_chi2_independence" ->
      """WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
        |  GROUP BY 1, 2),
        |rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY a),
        |ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY b),
        |nd AS (SELECT (SELECT CAST(coalesce(sum(o), 0) AS BIGINT) FROM cells) AS n,
        |    (SELECT count(*) FROM rt) AS r, (SELECT count(*) FROM ct) AS c),
        |grid AS (SELECT rt.a, ct.b, CAST(coalesce(cells.o, 0) AS BIGINT) AS n_obs,
        |    CAST(CAST(CAST(rt.ra AS HUGEINT) * ct.cb AS VARCHAR) AS DOUBLE)
        |      / CAST(nd.n AS DOUBLE) AS expected
        |  FROM rt CROSS JOIN ct CROSS JOIN nd
        |  LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b),
        |terms AS (SELECT *,
        |    (CAST(n_obs AS DOUBLE) - expected) * (CAST(n_obs AS DOUBLE) - expected)
        |      / expected AS term
        |  FROM grid),
        |v AS (SELECT list_reduce(list_prepend(0.0,
        |      list(term ORDER BY a, b)), (x, y) -> x + y) AS chi2_total
        |  FROM terms)
        |SELECT g.a AS val_a, g.b AS val_b, g.n_obs, g.expected,
        |  v.chi2_total, CAST((nd.r - 1) * (nd.c - 1) AS BIGINT) AS dof,
        |  CASE WHEN (nd.r - 1) * (nd.c - 1) = 0 THEN 0.0
        |       ELSE sqrt(v.chi2_total / (CAST(nd.n AS DOUBLE)
        |         * CAST(least(nd.r - 1, nd.c - 1) AS DOUBLE))) END AS cramers_v
        |FROM grid g CROSS JOIN v CROSS JOIN nd
        |ORDER BY val_a, val_b""".stripMargin,
    // q190: identical graph build, then the SAME integer fixed-point
    // rounds unrolled as CTEs — every division a non-negative floor
    // divide (`div` ≡ `//`), so the replay is integer-for-integer
    // q242: q190's unrolled integer rounds with the teleport and the
    // dangling restart gated on the seed flag, seed-count divisors
    "q242_personalized_pagerank" -> {
      val S = graft.operators.Graph.RankScale
      val rounds = (1 to 3).map { i =>
        val prev = if (i == 1) "r0" else s"r${i - 1}"
        s"""i$i AS (SELECT e.d AS node, CAST(sum(r._r // o.od) AS BIGINT) AS infl
           |  FROM e JOIN $prev r ON r.node = e.s JOIN od o ON o.s = e.s
           |  GROUP BY e.d),
           |g$i AS (SELECT CAST(coalesce(sum(r._r), 0) AS BIGINT) AS dmass
           |  FROM $prev r LEFT JOIN od o ON o.s = r.node WHERE o.s IS NULL),
           |r$i AS (SELECT nd.node,
           |    CAST((CASE WHEN nd.isseed THEN (15 * $S) // (100 * sn.sc)
           |        ELSE 0 END)
           |      + (85 * (coalesce(i.infl, 0)
           |        + CASE WHEN nd.isseed THEN g.dmass // sn.sc
           |          ELSE 0 END)) // 100
           |      AS BIGINT) AS _r
           |  FROM nodes nd CROSS JOIN sn CROSS JOIN g$i g
           |  LEFT JOIN i$i i ON i.node = nd.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
         |  FROM lineitem WHERE l_orderkey % 20 = 0),
         |e AS (SELECT DISTINCT a.sk AS s, b.sk AS d
         |  FROM li a JOIN li b ON a.ok = b.ok WHERE a.sk <> b.sk),
         |sd AS (SELECT DISTINCT sk AS node FROM li WHERE sk % 10 = 0),
         |nodes AS (SELECT n.node,
         |    (sd.node IS NOT NULL) AS isseed
         |  FROM (SELECT s AS node FROM e UNION SELECT d FROM e
         |    UNION SELECT node FROM sd) n
         |  LEFT JOIN sd ON sd.node = n.node),
         |sn AS (SELECT CAST(count(*) AS BIGINT) AS sc FROM sd),
         |od AS (SELECT s, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY s),
         |r0 AS (SELECT node, CAST(CASE WHEN isseed THEN $S // sn.sc
         |    ELSE 0 END AS BIGINT) AS _r
         |  FROM nodes CROSS JOIN sn),
         |$rounds
         |SELECT node, r._r AS rank_e12,
         |  CAST(r._r AS DOUBLE) / 1e12 AS ppr
         |FROM r3 r ORDER BY node""".stripMargin
    },
    "q190_pagerank" -> {
      val S = graft.operators.Graph.RankScale
      val rounds = (1 to 3).map { i =>
        val prev = if (i == 1) "r0" else s"r${i - 1}"
        s"""i$i AS (SELECT e.d AS node, CAST(sum(r._r // o.od) AS BIGINT) AS infl
           |  FROM e JOIN $prev r ON r.node = e.s JOIN od o ON o.s = e.s
           |  GROUP BY e.d),
           |g$i AS (SELECT CAST(coalesce(sum(r._r), 0) AS BIGINT) AS dmass
           |  FROM $prev r LEFT JOIN od o ON o.s = r.node WHERE o.s IS NULL),
           |r$i AS (SELECT nd.node,
           |    CAST((15 * $S) // (100 * nn.n)
           |      + (85 * (coalesce(i.infl, 0) + g.dmass // nn.n)) // 100
           |      AS BIGINT) AS _r
           |  FROM nodes nd CROSS JOIN nn CROSS JOIN g$i g
           |  LEFT JOIN i$i i ON i.node = nd.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
         |  FROM lineitem WHERE l_orderkey % 20 = 0),
         |e AS (SELECT DISTINCT a.sk AS s, b.sk AS d
         |  FROM li a JOIN li b ON a.ok = b.ok WHERE a.sk <> b.sk),
         |nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |od AS (SELECT s, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY s),
         |r0 AS (SELECT node, CAST($S // nn.n AS BIGINT) AS _r
         |  FROM nodes CROSS JOIN nn),
         |$rounds
         |SELECT node, r._r AS rank_e12,
         |  CAST(r._r AS DOUBLE) / 1e12 AS pagerank
         |FROM r3 r ORDER BY node""".stripMargin
    },
    // q189: the q170 conditional-min conversion + the q176 Wilson/z
    // chain verbatim (same z/z² doubles)
    "q189_funnel_experiment" -> {
      val z = 1.96
      val z2 = z * z
      s"""WITH per AS (SELECT user_id,
         |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
         |    max(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
         |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         |u AS (SELECT
         |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 1) < '8'
         |         THEN 'control' ELSE 'treatment' END AS arm, user_id,
         |    CASE WHEN v IS NOT NULL AND p IS NOT NULL AND p > v
         |         THEN 1 ELSE 0 END AS c
         |  FROM per),
         |a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         |    CAST(sum(c) AS BIGINT) AS n_converted FROM u GROUP BY 1),
         |ctrl AS (SELECT n_users AS cn, n_converted AS cc FROM a WHERE arm = 'control'),
         |j AS (SELECT a.*, ctrl.cn, ctrl.cc,
         |    CAST(n_users AS DOUBLE) AS nd,
         |    CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE) AS p,
         |    CAST(cc AS DOUBLE) / CAST(cn AS DOUBLE) AS cp,
         |    CAST(n_converted + cc AS DOUBLE) / CAST(n_users + cn AS DOUBLE) AS pooled
         |  FROM a CROSS JOIN ctrl),
         |k AS (SELECT *,
         |    1.0 + $z2 / nd AS denom,
         |    sqrt(pooled * (1.0 - pooled) * (1.0 / nd + 1.0 / CAST(cn AS DOUBLE))) AS se
         |  FROM j)
         |SELECT arm, n_users, n_converted, p AS rate,
         |  greatest(0.0, (p + $z2 / (2.0 * nd)) / denom
         |    - ($z / denom) * sqrt(p * (1.0 - p) / nd + $z2 / (4.0 * nd * nd)))
         |    AS wilson_lo,
         |  least(1.0, (p + $z2 / (2.0 * nd)) / denom
         |    + ($z / denom) * sqrt(p * (1.0 - p) / nd + $z2 / (4.0 * nd * nd)))
         |    AS wilson_hi,
         |  CASE WHEN arm = 'control' THEN NULL ELSE p - cp END AS lift_vs_control,
         |  CASE WHEN arm = 'control' OR se = 0.0 THEN NULL
         |       ELSE (p - cp) / se END AS z_stat
         |FROM k ORDER BY arm""".stripMargin
    },
    // q188: identical md5 arms, distinct-user counts, arm-ordered
    // chi-square fold with the declared 0.5 literals
    "q188_srm_check" ->
      """WITH u AS (SELECT DISTINCT
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 1) < '8'
        |         THEN 'control' ELSE 'treatment' END AS arm, user_id
        |  FROM events WHERE user_id IS NOT NULL),
        |o AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_users FROM u GROUP BY 1),
        |s AS (SELECT arm, frac_expected FROM (VALUES
        |    ('control', 0.5e0), ('treatment', 0.5e0)) v(arm, frac_expected)),
        |j AS (SELECT s.arm, CAST(coalesce(o.n_users, 0) AS BIGINT) AS n_users,
        |    s.frac_expected
        |  FROM s LEFT JOIN o ON o.arm = s.arm),
        |t AS (SELECT *, CAST(sum(n_users) OVER () AS BIGINT) AS n FROM j),
        |terms AS (SELECT arm, n_users, frac_expected, n,
        |    (CAST(n_users AS DOUBLE) - CAST(n AS DOUBLE) * frac_expected)
        |      * (CAST(n_users AS DOUBLE) - CAST(n AS DOUBLE) * frac_expected)
        |      / (CAST(n AS DOUBLE) * frac_expected) AS term
        |  FROM t),
        |c AS (SELECT n, CASE WHEN n = 0 THEN 0.0 ELSE
        |    list_reduce(list_prepend(0.0, list(term ORDER BY arm)),
        |      (a, b) -> a + b) END AS chi2_total
        |  FROM terms GROUP BY n)
        |SELECT tm.arm, tm.n_users,
        |  CASE WHEN tm.n = 0 THEN 0.0
        |       ELSE CAST(tm.n_users AS DOUBLE) / CAST(tm.n AS DOUBLE) END AS frac_obs,
        |  tm.frac_expected, c.chi2_total
        |FROM terms tm CROSS JOIN c ORDER BY tm.arm""".stripMargin,
    // q187: identical md5 arms and exact decimal metric, the SAME
    // doubled-midrank integers, tie term, and fixed-order z chain
    // (big sums through the VARCHAR route)
    "q187_mann_whitney" ->
      """WITH u AS (
        |  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 1) < '8'
        |              THEN 'control' ELSE 'treatment' END AS arm,
        |    user_id,
        |    sum(coalesce(CAST(value AS DECIMAL(18,6)),
        |                 CAST(0 AS DECIMAL(18,6)))) AS y
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM u GROUP BY 1),
        |r AS (SELECT v, c, b,
        |    CAST(coalesce(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |      AS BIGINT) AS rmin
        |  FROM c),
        |t AS (SELECT
        |    CAST(CAST(sum(c) AS VARCHAR) AS DOUBLE) AS n,
        |    CAST(CAST(sum(b) AS VARCHAR) AS DOUBLE) AS nb,
        |    CAST(CAST(sum(CAST(b AS HUGEINT)
        |      * CAST(2 * rmin + c - 1 AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS r2b,
        |    CAST(CAST(sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)
        |        * CAST(c AS HUGEINT) - CAST(c AS HUGEINT)) AS VARCHAR)
        |      AS DOUBLE) AS ties
        |  FROM r),
        |k AS (SELECT n, nb, n - nb AS na,
        |    (r2b - nb * (nb + 1.0)) / 2.0 AS u_b, ties FROM t),
        |z AS (SELECT *,
        |    ((n - nb) * nb / 12.0) * ((n + 1.0) - ties / (n * (n - 1.0))) AS variance
        |  FROM k)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  u_b, u_b / (na * nb) AS auc_b,
        |  CASE WHEN variance <= 0.0 OR na = 0.0 OR nb = 0.0 THEN NULL
        |       ELSE (u_b - na * nb / 2.0) / sqrt(variance) END AS z
        |FROM z""".stripMargin,
    // q186: identical subject derivation and exact d/n counts; each
    // survival is the SAME ascending left fold via list_prepend(1.0, …)
    "q186_kaplan_meier" ->
      """WITH d AS (SELECT event_type, user_id,
        |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS day
        |  FROM events WHERE user_id IS NOT NULL),
        |subj AS (SELECT event_type, user_id, max(day) AS dur
        |  FROM d GROUP BY 1, 2),
        |pt AS (SELECT event_type, dur AS t, CAST(count(*) AS BIGINT) AS ends,
        |    CAST(sum(CASE WHEN dur < 19748 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_events
        |  FROM subj GROUP BY 1, 2),
        |r AS (SELECT event_type, t, n_events,
        |    CAST(sum(ends) OVER (PARTITION BY event_type ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_risk
        |  FROM pt),
        |e AS (SELECT * FROM r WHERE n_events > 0),
        |terms AS (SELECT event_type,
        |    list(struct_pack(t := t, ne := n_events, nr := n_risk)
        |      ORDER BY t) AS a
        |  FROM e GROUP BY 1)
        |SELECT e.event_type, e.t, e.n_risk, e.n_events,
        |  list_reduce(list_prepend(1.0,
        |    list_transform(list_filter(t2.a, s -> s.t <= e.t),
        |      s -> 1.0 - CAST(s.ne AS DOUBLE) / CAST(s.nr AS DOUBLE))),
        |    (x, y) -> x * y) AS survival
        |FROM e JOIN terms t2 ON t2.event_type = e.event_type
        |ORDER BY e.event_type, e.t""".stripMargin,
    // q185: the planted truth in closed form — the 3-core of
    // (K6 + pendant chain | star) is exactly the clique at degree 5
    "q185_kcore" ->
      """WITH b AS (SELECT c_custkey AS b FROM customer WHERE c_custkey % 2 = 0),
        |n AS (SELECT b * 100 + j AS node
        |  FROM b CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS j) g)
        |SELECT node, CAST(5 AS BIGINT) AS degree FROM n ORDER BY node""".stripMargin,
    // q184: identical micro-unit HUGEINT sums, identical fixed-order
    // mean/stddev combine with the max(0, ·) guard
    "q184_seasonal_profile" ->
      """WITH d AS (SELECT event_type,
        |    CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour_of_day,
        |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS yi
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |s AS (SELECT event_type, hour_of_day,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(CAST(sum(yi) AS VARCHAR) AS DOUBLE) / 1e6 AS sy,
        |    CAST(CAST(sum(yi * yi) AS VARCHAR) AS DOUBLE) / 1e12 AS syy
        |  FROM d GROUP BY 1, 2)
        |SELECT event_type, hour_of_day, n,
        |  sy / CAST(n AS DOUBLE) AS mean_value,
        |  sqrt(greatest(0.0e0, syy / CAST(n AS DOUBLE)
        |    - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE))))
        |    AS stddev_value
        |FROM s ORDER BY event_type, hour_of_day""".stripMargin,
    // q183: identical lead-chain windows, identical separator
    "q183_path_trigrams" ->
      """WITH s AS (SELECT event_type AS s0,
        |    lead(event_type, 1) OVER w AS s1,
        |    lead(event_type, 2) OVER w AS s2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT s0 || ' > ' || s1 || ' > ' || s2 AS path,
        |  CAST(count(*) AS BIGINT) AS n_paths
        |FROM s WHERE s1 IS NOT NULL AND s2 IS NOT NULL
        |GROUP BY 1 ORDER BY path""".stripMargin,
    // q290: the gap rule in exact µs integers — session_window merges
    // OVERLAPPING [ts, ts+gap) intervals, so a new session starts when
    // the inter-event diff >= gap (touching windows do NOT merge);
    // session_end = last event + gap; micro-unit value sums
    "q290_session_window_stream" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tu,
        |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        |m AS (SELECT user_id, tu, v,
        |    CASE WHEN lag(tu) OVER w IS NULL
        |      OR tu - lag(tu) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        |s AS (SELECT user_id, tu, v, sum(brk) OVER (
        |    PARTITION BY user_id ORDER BY tu
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, make_timestamp(min(tu)) AS session_start,
        |  make_timestamp(max(tu) + 1800000000) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(v) AS BIGINT) AS value_sum
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // q289: stream-static enrichment ≡ the batch join
    "q289_enrich_stream" ->
      """SELECT CAST(e.event_id AS BIGINT) AS event_id,
        |  CAST(e.user_id AS BIGINT) AS user_id, e.event_type,
        |  c.c_mktsegment AS segment, n.n_name AS nation
        |FROM events e
        |JOIN customer c ON c.c_custkey = e.user_id
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE e.event_id IS NOT NULL AND e.user_id IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    // q285: 1-hour tumbling windows are epoch-aligned, so window.start ≡
    // date_trunc('hour', ts); value_sum replays the exact micro-unit seam
    // (decimal(18,6) cast, then ×1e6 as BIGINT) summed as integers
    "q285_windowed_agg_stream" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(coalesce(CAST(value AS DECIMAL(18,6)), 0)
        |      * 1000000 AS BIGINT)) AS BIGINT) AS value_sum
        |FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // q284: the doubled corpus deduped = the corpus itself (event_id is
    // the table's key; planted copies are bit-identical rows, so the
    // survivor is value-deterministic)
    "q284_dedup_stream" ->
      """SELECT CAST(event_id AS BIGINT) AS event_id, ts, event_type,
        |  CAST(value AS DOUBLE) AS value
        |FROM events WHERE event_id IS NOT NULL AND ts IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    // q280: per-key horizon (48 windows behind the key's max), then the
    // first-2-per-(key, window) admission in (ts, id) order as a plain
    // row_number — seq numbers equal the stream's admission counters
    "q280_quota_stream" ->
      """WITH e AS (SELECT event_type AS key, epoch_us(ts) AS tu,
        |    CAST(event_id AS BIGINT) AS id
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND event_id IS NOT NULL),
        |h AS (SELECT key,
        |    (max(tu) // 3600000000) * 3600000000
        |      - 48 * CAST(3600000000 AS BIGINT) AS horizon
        |  FROM e GROUP BY 1),
        |w AS (SELECT e.key,
        |    (e.tu // 3600000000) * 3600000000 AS window_start, e.tu, e.id
        |  FROM e JOIN h ON h.key = e.key
        |  WHERE (e.tu // 3600000000) * 3600000000 >= h.horizon),
        |r AS (SELECT key, window_start, id,
        |    CAST(row_number() OVER (PARTITION BY key, window_start
        |      ORDER BY tu, id) AS BIGINT) AS seq
        |  FROM w)
        |SELECT key, window_start, id, seq FROM r WHERE seq <= 2
        |ORDER BY key, window_start, seq""".stripMargin,
    // q274: greatest-version-per-key over the same per-(user, ts) CDC
    // collapse — the final lake state the multi-batch merge must land on
    // regardless of how the file source split the batches
    "q274_cdc_upsert_stream" ->
      """WITH c AS (SELECT CAST(user_id AS BIGINT) AS user_id,
        |    epoch_us(ts) AS ver,
        |    max(event_type) AS event_type,
        |    max(CAST(value AS DOUBLE)) AS value
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |w AS (SELECT user_id, ver, event_type, value,
        |    CAST(user_id % 16 AS INTEGER) AS part,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ver DESC)
        |      AS rn
        |  FROM c)
        |SELECT user_id, ver, event_type, value, part FROM w
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // q239: gaps-and-islands sessionization in µs over the stream's
    // (ts, value) order contract, each user's trailing (still-open)
    // session excluded, value_sum folded in the stream's order
    "q239_sessionize_stream" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tu, value FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        |flagged AS (SELECT user_id, tu, value,
        |    CASE WHEN lag(tu) OVER w IS NULL
        |      OR tu - lag(tu) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu, value)),
        |sess AS (SELECT user_id, tu, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY tu, value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged),
        |agg AS (SELECT user_id, sid,
        |    CAST(min(tu) AS BIGINT) AS session_start,
        |    CAST(max(tu) AS BIGINT) AS session_end,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(value ORDER BY tu, value)), (a, b) -> a + b)
        |      AS value_sum
        |  FROM sess GROUP BY 1, 2),
        |lastc AS (SELECT user_id, max(sid) AS maxsid FROM agg GROUP BY 1)
        |SELECT a.user_id, a.session_start, a.session_end, a.n_events,
        |  a.value_sum
        |FROM agg a JOIN lastc l ON l.user_id = a.user_id
        |  AND a.sid < l.maxsid
        |ORDER BY a.user_id, a.session_start""".stripMargin,
    // q238: q162's matrix over the stream's order contract — the
    // within-batch sort is (ts, state), so the oracle's lead() orders by
    // (ts, event_type); ties beyond that are identical rows and cannot
    // reorder pairs
    "q238_transition_stream" ->
      """WITH e AS (SELECT user_id, ts, event_type AS state FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |s AS (SELECT user_id, state,
        |    lead(state) OVER (PARTITION BY user_id ORDER BY ts, state)
        |      AS next_state
        |  FROM e),
        |m AS (SELECT state, next_state, CAST(count(*) AS BIGINT) AS n_trans
        |  FROM s WHERE next_state IS NOT NULL GROUP BY 1, 2)
        |SELECT state, next_state, n_trans,
        |  CAST(n_trans AS DOUBLE)
        |    / CAST(sum(n_trans) OVER (PARTITION BY state) AS DOUBLE) AS p
        |FROM m ORDER BY state, next_state""".stripMargin,
    // q182s/q217s/q227s: the full-input oracles with the shared
    // ':osample' md5 predicate applied to the SAME column the engine
    // samples (doc_id / l_partkey / doc_id)
    "q182s_png_codec_sampled" ->
      """WITH g AS (SELECT unnest(generate_series(0, 15)) AS v),
        |px AS (SELECT d.doc_id,
        |    ((d.doc_id * 31 + gx.v * 7 + gy.v * 13) % 256) AS p
        |  FROM documents d CROSS JOIN g gx CROSS JOIN g gy
        |  WHERE md5(CAST(d.doc_id AS VARCHAR) || ':osample') < '20'),
        |a AS (SELECT doc_id, CAST(sum(p) AS BIGINT) AS gray_sum,
        |    CAST(sum(CASE WHEN p > 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_bright
        |  FROM px GROUP BY doc_id)
        |SELECT doc_id, CAST(16 AS INTEGER) AS width,
        |  CAST(16 AS INTEGER) AS height, CAST(1 AS INTEGER) AS channels,
        |  gray_sum, n_bright,
        |  CAST(gray_sum AS DOUBLE) / 256.0 AS mean_gray
        |FROM a ORDER BY doc_id""".stripMargin,
    "q217s_item_neighbors_sampled" ->
      """WITH inter AS (SELECT DISTINCT o.o_custkey AS u,
        |    l.l_partkey AS i
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_custkey % 10 = 0
        |    AND md5(CAST(l.l_partkey AS VARCHAR) || ':osample') < '40'),
        |kept AS (SELECT u FROM (SELECT u, count(*) AS bs FROM inter
        |  GROUP BY 1) WHERE bs <= 1000),
        |capped AS (SELECT inter.u, inter.i FROM inter
        |  JOIN kept ON kept.u = inter.u),
        |ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM capped
        |  GROUP BY 1),
        |p AS (SELECT a.i AS item, b.i AS neighbor,
        |    CAST(count(*) AS BIGINT) AS co
        |  FROM capped a JOIN capped b ON b.u = a.u AND a.i <> b.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |s AS (SELECT p.item, p.neighbor, p.co,
        |    CAST(p.co AS DOUBLE) / CAST(ca.ci + cb.ci - p.co AS DOUBLE)
        |      AS jaccard
        |  FROM p JOIN ic ca ON ca.i = p.item
        |  JOIN ic cb ON cb.i = p.neighbor),
        |r AS (SELECT item, neighbor, co, jaccard, row_number()
        |    OVER (PARTITION BY item ORDER BY jaccard DESC, neighbor)
        |      AS rank
        |  FROM s)
        |SELECT item, CAST(rank AS INTEGER) AS rank, neighbor, co,
        |  jaccard
        |FROM r WHERE rank <= 5 ORDER BY item, rank""".stripMargin,
    "q227s_glove_cooc_sampled" ->
      """WITH tks AS (SELECT list_filter(string_split(trim(regexp_replace(
        |      regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |      ' +', ' ', 'g')), ' '), x -> x <> '') AS tk
        |  FROM documents
        |  WHERE md5(CAST(doc_id AS VARCHAR) || ':osample') < '20'),
        |pos AS (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
        |  FROM tks WHERE len(tk) >= 2),
        |pr AS (SELECT least(tk[i], tk[i + d.d]) AS a,
        |    greatest(tk[i], tk[i + d.d]) AS b,
        |    CAST(CASE d.d WHEN 1 THEN 12 WHEN 2 THEN 6 WHEN 3 THEN 4
        |      ELSE 3 END AS BIGINT) AS w
        |  FROM pos CROSS JOIN (SELECT unnest(generate_series(1, 4))
        |    AS d) d
        |  WHERE i + d.d <= len(tk)),
        |m AS (SELECT a || ' ' || b AS gram,
        |    CAST(sum(w) AS BIGINT) AS cooc_scaled
        |  FROM pr GROUP BY a, b HAVING sum(w) >= 24),
        |h AS (SELECT gram, cooc_scaled,
        |    CAST(cooc_scaled AS DOUBLE) / 12.0 AS cooc,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, len(gram)),
        |        j -> CAST(unicode(gram[j]) AS BIGINT))),
        |      (x, y) -> (x * 257 + y) % 1000000007) AS th
        |  FROM m),
        |r AS (SELECT gram, cooc_scaled, cooc,
        |    row_number() OVER (ORDER BY cooc_scaled DESC, th, gram)
        |      AS rank FROM h)
        |SELECT CAST(rank AS INTEGER) AS rank, gram, cooc_scaled, cooc
        |FROM r WHERE rank <= 100 ORDER BY rank""".stripMargin,
    // q237s: q237 over the 25% doc sample (dups are then sample-internal
    // by definition — same contract both engines)
    "q237s_substring_removals_sampled" ->
      """WITH tks AS (SELECT doc_id, list_filter(string_split(trim(
        |      regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]',
        |      ' ', 'g'), ' +', ' ', 'g')), ' '), x -> x <> '') AS tk
        |  FROM documents
        |  WHERE md5(CAST(doc_id AS VARCHAR) || ':osample') < '40'),
        |pos0 AS (SELECT doc_id, tk,
        |    unnest(generate_series(1, len(tk) - 24)) AS p
        |  FROM tks WHERE len(tk) >= 25),
        |pos AS (SELECT doc_id, p,
        |    array_to_string(list_slice(tk, p, p + 24), ' ') AS gram
        |  FROM pos0),
        |hits AS (SELECT doc_id, p,
        |    row_number() OVER (PARTITION BY gram ORDER BY doc_id, p) AS rn,
        |    count(*) OVER (PARTITION BY gram) AS c FROM pos),
        |rem AS (SELECT doc_id, p FROM hits WHERE c >= 2 AND rn > 1),
        |isl AS (SELECT doc_id, p, CASE WHEN p - lag(p)
        |      OVER (PARTITION BY doc_id ORDER BY p) <= 25 THEN 0 ELSE 1
        |    END AS brk FROM rem),
        |grp AS (SELECT doc_id, p,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS g FROM isl)
        |SELECT doc_id, min(p) AS span_start, max(p) + 24 AS span_end,
        |  CAST(count(*) AS BIGINT) AS n_grams
        |FROM grp GROUP BY doc_id, g ORDER BY doc_id, span_start""".stripMargin,
    // q237: the same exact-gram stream (q102's tokenizer), the canonical
    // occurrence as rn=1 over (doc_id, p) — min(struct) in the engine,
    // row_number in the oracle, same lexicographic pick — and the same
    // gap>k island break
    "q237_exact_substring_removals" ->
      """WITH tks AS (SELECT doc_id, list_filter(string_split(trim(
        |      regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]',
        |      ' ', 'g'), ' +', ' ', 'g')), ' '), x -> x <> '') AS tk
        |  FROM documents),
        |pos0 AS (SELECT doc_id, tk,
        |    unnest(generate_series(1, len(tk) - 24)) AS p
        |  FROM tks WHERE len(tk) >= 25),
        |pos AS (SELECT doc_id, p,
        |    array_to_string(list_slice(tk, p, p + 24), ' ') AS gram
        |  FROM pos0),
        |hits AS (SELECT doc_id, p,
        |    row_number() OVER (PARTITION BY gram ORDER BY doc_id, p) AS rn,
        |    count(*) OVER (PARTITION BY gram) AS c FROM pos),
        |rem AS (SELECT doc_id, p FROM hits WHERE c >= 2 AND rn > 1),
        |isl AS (SELECT doc_id, p, CASE WHEN p - lag(p)
        |      OVER (PARTITION BY doc_id ORDER BY p) <= 25 THEN 0 ELSE 1
        |    END AS brk FROM rem),
        |grp AS (SELECT doc_id, p,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS g FROM isl)
        |SELECT doc_id, min(p) AS span_start, max(p) + 24 AS span_end,
        |  CAST(count(*) AS BIGINT) AS n_grams
        |FROM grp GROUP BY doc_id, g ORDER BY doc_id, span_start""".stripMargin,
    // q235: q183's oracle verbatim — the bucketed n-gram split must
    // reproduce the single-window path counts exactly
    "q235_path_trigrams_bucketed" ->
      """WITH s AS (SELECT event_type AS s0,
        |    lead(event_type, 1) OVER w AS s1,
        |    lead(event_type, 2) OVER w AS s2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT s0 || ' > ' || s1 || ' > ' || s2 AS path,
        |  CAST(count(*) AS BIGINT) AS n_paths
        |FROM s WHERE s1 IS NOT NULL AND s2 IS NOT NULL
        |GROUP BY 1 ORDER BY path""".stripMargin,
    // q182: the engine's pixels are whatever ImageIOCodec recovers from
    // the PNG container; the oracle regenerates them from the closed-form
    // plant — equality gates encode→decode→sample-order end-to-end
    "q182_png_codec_stats" ->
      """WITH g AS (SELECT unnest(generate_series(0, 15)) AS v),
        |px AS (SELECT d.doc_id,
        |    ((d.doc_id * 31 + gx.v * 7 + gy.v * 13) % 256) AS p
        |  FROM documents d CROSS JOIN g gx CROSS JOIN g gy),
        |a AS (SELECT doc_id, CAST(sum(p) AS BIGINT) AS gray_sum,
        |    CAST(sum(CASE WHEN p > 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_bright
        |  FROM px GROUP BY doc_id)
        |SELECT doc_id, CAST(16 AS INTEGER) AS width,
        |  CAST(16 AS INTEGER) AS height, CAST(1 AS INTEGER) AS channels,
        |  gray_sum, n_bright,
        |  CAST(gray_sum AS DOUBLE) / 256.0 AS mean_gray
        |FROM a ORDER BY doc_id""".stripMargin,
    // q181: identical micro-unit leading-digit extraction, the SAME nine
    // Benford doubles, digit-ordered list_reduce chi-square fold
    "q181_benford_audit" -> {
      // "e0" suffix forces DOUBLE literals: DuckDB parses bare decimal
      // literals as DECIMAL, whose two-step decimal→double conversion
      // flips the last ulp on log10(4/3)
      val lits = graft.operators.Audit.benfordLiterals
        .map(d => s"${d}e0").mkString(", ")
      s"""WITH v AS (SELECT
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vi
         |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
         |o AS (SELECT CAST(substr(CAST(vi AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         |    CAST(count(*) AS BIGINT) AS n_obs
         |  FROM v WHERE vi > 0 GROUP BY 1),
         |spine AS (SELECT unnest(generate_series(1, 9)) AS digit),
         |j AS (SELECT s.digit, CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs,
         |    ([$lits])[CAST(s.digit AS INTEGER)] AS frac_expected
         |  FROM spine s LEFT JOIN o ON o.digit = s.digit),
         |t AS (SELECT *, CAST(sum(n_obs) OVER () AS BIGINT) AS n FROM j),
         |terms AS (SELECT digit, n_obs, frac_expected, n,
         |    (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * frac_expected)
         |      * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * frac_expected)
         |      / (CAST(n AS DOUBLE) * frac_expected) AS term
         |  FROM t),
         |c AS (SELECT n, CASE WHEN n = 0 THEN 0.0 ELSE
         |    list_reduce(list_prepend(0.0, list(term ORDER BY digit)),
         |      (a, b) -> a + b) END AS chi2_total
         |  FROM terms GROUP BY n)
         |SELECT CAST(tm.digit AS INTEGER) AS digit, tm.n_obs,
         |  CASE WHEN tm.n = 0 THEN 0.0
         |       ELSE CAST(tm.n_obs AS DOUBLE) / CAST(tm.n AS DOUBLE) END AS frac_obs,
         |  tm.frac_expected, c.chi2_total
         |FROM terms tm CROSS JOIN c ORDER BY digit""".stripMargin
    },
    // q180: identical md5 hex-window scores (CAST('0x'… the established
    // hex idiom), identical exact-integer bin rule and micro-unit mean
    "q180_calibration_bins" ->
      """WITH d AS (SELECT
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cal'), 1, 5))
        |      AS BIGINT) % 1000000 AS s6,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':lbl'), 1, 5))
        |      AS BIGINT) % 1000000 AS u6
        |  FROM documents),
        |r AS (SELECT s6,
        |    CASE WHEN u6 < s6 THEN 1 ELSE 0 END AS y,
        |    least((s6 * 10) // 1000000, 9) AS bin
        |  FROM d),
        |a AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(sum(s6) AS BIGINT) AS ssum
        |  FROM r GROUP BY bin)
        |SELECT CAST(bin AS INTEGER) AS bin,
        |  CAST(bin AS DOUBLE) / 10.0 AS bin_lo, n, n_pos,
        |  (CAST(ssum AS DOUBLE) / 1e6) / CAST(n AS DOUBLE) AS mean_score,
        |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
        |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
        |    - (CAST(ssum AS DOUBLE) / 1e6) / CAST(n AS DOUBLE) AS gap
        |FROM a ORDER BY bin""".stripMargin,
    // q179: same cosine/dot arithmetic as q27/q41's oracles, the SAME
    // ten discount doubles interpolated from Retrieval.ndcgLiterals,
    // rank-ordered list_reduce folds mirroring the plan's sorted folds
    "q179_ndcg_eval" -> {
      val discs = graft.operators.Retrieval.ndcgLiterals(10).mkString(", ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         |cos AS (SELECT q.query_id, e.vec_id AS nid,
         |    list_inner_product(e.v, q.qv)
         |      / (sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(q.qv, q.qv)))
         |      AS score
         |  FROM e CROSS JOIN q),
         |r10 AS (SELECT query_id, nid, rk FROM (
         |    SELECT query_id, nid,
         |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, nid) AS rk
         |    FROM cos) WHERE rk <= 10),
         |dots AS (SELECT q.query_id, e.vec_id AS nid,
         |    list_inner_product(e.v, q.qv) AS s
         |  FROM e CROSS JOIN q),
         |rels AS (SELECT query_id, nid, CAST(16 - rn AS DOUBLE) AS rel FROM (
         |    SELECT query_id, nid,
         |      row_number() OVER (PARTITION BY query_id ORDER BY s DESC, nid) AS rn
         |    FROM dots) WHERE rn <= 15),
         |dterm AS (SELECT r.query_id, r.rk,
         |    l.rel * ([$discs])[CAST(r.rk AS INTEGER)] AS t
         |  FROM r10 r JOIN rels l ON l.query_id = r.query_id AND l.nid = r.nid),
         |dcg AS (SELECT query_id,
         |    list_reduce(list_prepend(0.0, list(t ORDER BY rk)),
         |      (a, b) -> a + b) AS dcg
         |  FROM dterm GROUP BY query_id),
         |iterm AS (SELECT query_id, rn2,
         |    rel * ([$discs])[CAST(rn2 AS INTEGER)] AS t FROM (
         |    SELECT query_id, nid, rel,
         |      row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, nid) AS rn2
         |    FROM rels WHERE rel > 0) WHERE rn2 <= 10),
         |idcg AS (SELECT query_id,
         |    list_reduce(list_prepend(0.0, list(t ORDER BY rn2)),
         |      (a, b) -> a + b) AS idcg
         |  FROM iterm GROUP BY query_id)
         |SELECT i.query_id, coalesce(d.dcg, 0.0) AS dcg, i.idcg,
         |  coalesce(d.dcg, 0.0) / i.idcg AS ndcg
         |FROM idcg i LEFT JOIN dcg d ON d.query_id = i.query_id
         |ORDER BY i.query_id""".stripMargin
    },
    // q178: identical unit derivation, identical micro-unit HUGEINT
    // sufficient statistics (the q163 pattern), pooled theta from the
    // arm-sum roll-up, identical fixed-order double combine
    "q178_cuped_adjust" ->
      """WITH u AS (
        |  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 1) < '8'
        |              THEN 'control' ELSE 'treatment' END AS arm,
        |    user_id,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    sum(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
        |             THEN coalesce(CAST(value AS DECIMAL(18,6)),
        |                           CAST(0 AS DECIMAL(18,6)))
        |             ELSE CAST(0 AS DECIMAL(18,6)) END) AS y
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT arm,
        |    CAST(CAST(x AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS xi,
        |    CAST(CAST(y AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS yi
        |  FROM u),
        |a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_units,
        |    sum(xi) AS sx, sum(yi) AS sy,
        |    sum(xi * xi) AS sxx, sum(xi * yi) AS sxy
        |  FROM m GROUP BY arm),
        |g AS (SELECT CAST(sum(n_units) AS DOUBLE) AS gn,
        |    CAST(CAST(sum(sx) AS VARCHAR) AS DOUBLE) / 1e6 AS gsx,
        |    CAST(CAST(sum(sy) AS VARCHAR) AS DOUBLE) / 1e6 AS gsy,
        |    CAST(CAST(sum(sxx) AS VARCHAR) AS DOUBLE) / 1e12 AS gsxx,
        |    CAST(CAST(sum(sxy) AS VARCHAR) AS DOUBLE) / 1e12 AS gsxy
        |  FROM a),
        |k AS (SELECT a.arm, a.n_units,
        |    (CAST(a.sy AS DOUBLE) / 1e6) / CAST(a.n_units AS DOUBLE) AS mean_metric,
        |    (CAST(a.sx AS DOUBLE) / 1e6) / CAST(a.n_units AS DOUBLE) AS mean_covariate,
        |    g.gn * g.gsxx - g.gsx * g.gsx AS denom,
        |    g.gn * g.gsxy - g.gsx * g.gsy AS num,
        |    g.gsx / g.gn AS gmx
        |  FROM a CROSS JOIN g)
        |SELECT arm, n_units, mean_metric, mean_covariate,
        |  CASE WHEN denom = 0 THEN NULL ELSE num / denom END AS theta,
        |  CASE WHEN denom = 0 THEN mean_metric
        |       ELSE mean_metric - (num / denom) * (mean_covariate - gmx)
        |  END AS adjusted_mean
        |FROM k ORDER BY arm""".stripMargin,
    // q177: same URL synthesis, same split/tracking regex constants
    // interpolated verbatim, rule-for-rule normalization replay
    "q177_url_canonicalize" -> {
      val sp = graft.operators.Scrub.UrlSplitRe
      val tr = graft.operators.Scrub.UrlTrackingRe
      s"""WITH raw AS (
         |  SELECT doc_id,
         |    CASE doc_id % 6
         |      WHEN 0 THEN 'https://WWW.Shop-' || h8 || '.COM:443//products//'
         |        || h8 || '/?utm_source=news&b=2&a=1#top'
         |      WHEN 1 THEN 'http://Blog.' || h8 || '.org:80/posts/' || h8 || '/'
         |      WHEN 2 THEN 'HTTP://' || h8 || '.net/a/b?gclid=x'
         |      WHEN 3 THEN 'not a url ' || h8
         |      WHEN 4 THEN 'https://' || h8 || '.com'
         |      ELSE 'ftp://Files.' || h8 || '.com:21/data' END AS url
         |  FROM (SELECT doc_id,
         |          substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h8
         |        FROM documents)),
         |s AS (SELECT doc_id, url,
         |    lower(regexp_extract(url, '$sp', 1)) AS scheme,
         |    regexp_replace(lower(regexp_extract(url, '$sp', 2)),
         |      '^www\\.', '') AS nw,
         |    regexp_replace(regexp_extract(url, '$sp', 3), '/{2,}', '/', 'g') AS sq,
         |    regexp_replace(regexp_extract(url, '$sp', 4), '^\\?', '') AS qbody,
         |    regexp_matches(url, '$sp') AS m
         |  FROM raw),
         |t AS (SELECT *,
         |    CASE WHEN scheme = 'http' THEN regexp_replace(nw, ':80$$', '')
         |         WHEN scheme = 'https' THEN regexp_replace(nw, ':443$$', '')
         |         ELSE nw END AS host,
         |    CASE WHEN sq IN ('', '/') THEN '/'
         |         ELSE regexp_replace(sq, '/$$', '') END AS path,
         |    list_sort(list_filter(string_split(qbody, '&'),
         |      x -> x <> '' AND NOT regexp_matches(x, '$tr'))) AS params
         |  FROM s)
         |SELECT doc_id, url,
         |  CASE WHEN m AND host <> '' THEN scheme || '://' || host || path ||
         |    CASE WHEN len(params) > 0
         |         THEN '?' || array_to_string(params, '&') ELSE '' END
         |  END AS canonical_url
         |FROM t ORDER BY doc_id""".stripMargin
    },
    // q176: identical md5 arm split, identical user-level max-flag dedup,
    // identical Wilson/pooled-z expression chains with the SAME z/z²
    // doubles interpolated from one Scala constant
    "q176_ab_experiment" -> {
      val z = 1.96
      val z2 = z * z
      s"""WITH u AS (
         |  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 1) < '8'
         |              THEN 'control' ELSE 'treatment' END AS arm,
         |    user_id,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
         |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
         |a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         |    CAST(sum(c) AS BIGINT) AS n_converted FROM u GROUP BY 1),
         |ctrl AS (SELECT n_users AS cn, n_converted AS cc FROM a WHERE arm = 'control'),
         |j AS (SELECT a.*, ctrl.cn, ctrl.cc,
         |    CAST(n_users AS DOUBLE) AS nd,
         |    CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE) AS p,
         |    CAST(cc AS DOUBLE) / CAST(cn AS DOUBLE) AS cp,
         |    CAST(n_converted + cc AS DOUBLE) / CAST(n_users + cn AS DOUBLE) AS pooled
         |  FROM a CROSS JOIN ctrl),
         |k AS (SELECT *,
         |    1.0 + $z2 / nd AS denom,
         |    sqrt(pooled * (1.0 - pooled) * (1.0 / nd + 1.0 / CAST(cn AS DOUBLE))) AS se
         |  FROM j)
         |SELECT arm, n_users, n_converted, p AS rate,
         |  greatest(0.0, (p + $z2 / (2.0 * nd)) / denom
         |    - ($z / denom) * sqrt(p * (1.0 - p) / nd + $z2 / (4.0 * nd * nd)))
         |    AS wilson_lo,
         |  least(1.0, (p + $z2 / (2.0 * nd)) / denom
         |    + ($z / denom) * sqrt(p * (1.0 - p) / nd + $z2 / (4.0 * nd * nd)))
         |    AS wilson_hi,
         |  CASE WHEN arm = 'control' THEN NULL ELSE p - cp END AS lift_vs_control,
         |  CASE WHEN arm = 'control' OR se = 0.0 THEN NULL
         |       ELSE (p - cp) / se END AS z_stat
         |FROM k ORDER BY arm""".stripMargin
    },
    // q175: canonical u<v edges, one triangle row per u<v<w closed
    // 3-join, node participation via unnest — the textbook relational
    // triangle formulation (the engine's orientation must be invisible)
    "q175_triangle_counts" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |  FROM lineitem WHERE l_orderkey % 20 = 0),
        |e AS (SELECT DISTINCT a.sk AS u, b.sk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |n AS (SELECT unnest([a, b, c]) AS node FROM tri)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM n GROUP BY node ORDER BY node""".stripMargin,
    // q163: identical exact sufficient statistics (HUGEINT/DECIMAL sums),
    // identical double combine order; degenerate-group nulls mirrored
    "q163_trend_fit" ->
      """WITH d AS (SELECT event_type,
        |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS x,
        |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS yi
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS n_d,
        |    CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(yi) AS VARCHAR) AS DOUBLE) / 1e6 AS sy,
        |    CAST(CAST(sum(CAST(x AS HUGEINT) * yi) AS VARCHAR) AS DOUBLE) / 1e6 AS sxy,
        |    CAST(CAST(sum(yi * yi) AS VARCHAR) AS DOUBLE) / 1e12 AS syy
        |  FROM d GROUP BY event_type),
        |k AS (SELECT event_type, n, n_d, sx, sy,
        |    n_d * sxy - sx * sy AS num,
        |    n_d * sxx - sx * sx AS denx,
        |    n_d * syy - sy * sy AS deny
        |  FROM s)
        |SELECT event_type, n,
        |  CASE WHEN denx = 0 THEN NULL ELSE num / denx END AS slope,
        |  CASE WHEN denx = 0 THEN NULL
        |       ELSE (sy - (num / denx) * sx) / n_d END AS intercept,
        |  CASE WHEN denx = 0 OR deny = 0 THEN NULL
        |       ELSE num * num / (denx * deny) END AS r2
        |FROM k ORDER BY event_type""".stripMargin,
    // q170: identical first-view/first-purchase mins and integer
    // micro-diff floored to seconds
    "q170_time_to_convert" ->
      """WITH f AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY user_id)
        |SELECT user_id,
        |  CAST((epoch_us(fp) - epoch_us(fv)) // 1000000 AS BIGINT)
        |    AS secs_to_convert
        |FROM f WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv
        |ORDER BY user_id""".stripMargin,
    // q168: identical epoch-day grid, island key, and (len desc, s desc,
    // e desc) longest pick
    "q168_activity_streaks" ->
      """WITH p AS (SELECT DISTINCT user_id AS u,
        |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS p
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |isl AS (SELECT u, p,
        |    p - row_number() OVER (PARTITION BY u ORDER BY p) AS i FROM p),
        |runs AS (SELECT u, i, CAST(count(*) AS BIGINT) AS len,
        |    min(p) AS s, max(p) AS e FROM isl GROUP BY u, i),
        |best AS (SELECT u, len, s, e,
        |    row_number() OVER (PARTITION BY u ORDER BY len DESC, s DESC, e DESC) AS rn
        |  FROM runs),
        |tot AS (SELECT u, CAST(sum(len) AS BIGINT) AS n_active_periods,
        |    CAST(count(*) AS BIGINT) AS n_streaks FROM runs GROUP BY u)
        |SELECT t.u AS user_id, t.n_active_periods, t.n_streaks,
        |  b.len AS longest_streak, b.s AS streak_start, b.e AS streak_end
        |FROM tot t JOIN best b ON b.u = t.u AND b.rn = 1
        |ORDER BY user_id""".stripMargin,
    // q169: same micro-unit masses, same exact integer boundary tests,
    // same two final double divisions
    "q169_pareto_abc" ->
      """WITH t AS (SELECT user_id AS k,
        |    sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT)) AS v
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY user_id),
        |c AS (SELECT k, v,
        |    sum(v) OVER (ORDER BY v DESC, k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(v) OVER () AS tot,
        |    row_number() OVER (ORDER BY v DESC, k) AS rn
        |  FROM t),
        |cl AS (SELECT CASE WHEN rn = 1 OR cum * 5 <= tot * 4 THEN 'A'
        |              WHEN cum * 20 <= tot * 19 THEN 'B' ELSE 'C' END AS abc_class,
        |    v, tot FROM c)
        |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(CAST(sum(v) AS VARCHAR) AS DOUBLE) / 1e6 AS total_value,
        |  CAST(CAST(sum(v) AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(max(tot) AS VARCHAR) AS DOUBLE) AS share
        |FROM cl GROUP BY abc_class ORDER BY abc_class""".stripMargin,
    // q167: same md5 synthesis, same capped blocks (HAVING BETWEEN 2 AND
    // 64), same left-folded weights via null-safe agreement
    "q167_record_linkage" -> {
      val blockSqls = Seq("phone", "fi", "la").map { c =>
        s"""SELECT a.id AS id_a, b.id AS id_b
           |  FROM recs a JOIN recs b ON a.$c = b.$c AND a.id < b.id
           |  WHERE a.$c IN (SELECT $c FROM recs WHERE $c IS NOT NULL
           |                 GROUP BY $c HAVING count(*) BETWEEN 2 AND 64)""".stripMargin
      }
      s"""WITH ck AS (SELECT c_custkey AS k FROM customer),
         |recs AS (
         |  SELECT k AS id,
         |    substr(md5(CAST(k AS VARCHAR) || ':p'), 1, 10) AS phone,
         |    substr(md5(CAST(k AS VARCHAR) || ':f'), 1, 8) AS fi,
         |    substr(md5(CAST(k AS VARCHAR) || ':l'), 1, 8) AS la
         |  FROM ck
         |  UNION ALL
         |  SELECT k + 1000000,
         |    CASE WHEN k % 3 = 0 THEN substr(md5(CAST(k AS VARCHAR) || ':p2'), 1, 10)
         |         ELSE substr(md5(CAST(k AS VARCHAR) || ':p'), 1, 10) END,
         |    CASE WHEN k % 3 = 1 THEN substr(md5(CAST(k AS VARCHAR) || ':f'), 1, 8) || 'x'
         |         ELSE substr(md5(CAST(k AS VARCHAR) || ':f'), 1, 8) END,
         |    CASE WHEN k % 3 = 2 THEN substr(md5(CAST(k AS VARCHAR) || ':l2'), 1, 8)
         |         ELSE substr(md5(CAST(k AS VARCHAR) || ':l'), 1, 8) END
         |  FROM ck),
         |cand AS (SELECT DISTINCT id_a, id_b FROM (
         |${blockSqls.mkString("\nUNION ALL\n")}))
         |SELECT c.id_a, c.id_b,
         |  CASE WHEN ra.phone IS NOT DISTINCT FROM rb.phone THEN 0.5 ELSE 0.0 END
         |  + CASE WHEN ra.fi IS NOT DISTINCT FROM rb.fi THEN 0.3 ELSE 0.0 END
         |  + CASE WHEN ra.la IS NOT DISTINCT FROM rb.la THEN 0.2 ELSE 0.0 END
         |    AS score
         |FROM cand c
         |JOIN recs ra ON ra.id = c.id_a
         |JOIN recs rb ON rb.id = c.id_b
         |WHERE CASE WHEN ra.phone IS NOT DISTINCT FROM rb.phone THEN 0.5 ELSE 0.0 END
         |  + CASE WHEN ra.fi IS NOT DISTINCT FROM rb.fi THEN 0.3 ELSE 0.0 END
         |  + CASE WHEN ra.la IS NOT DISTINCT FROM rb.la THEN 0.2 ELSE 0.0 END >= 0.5
         |ORDER BY id_a, id_b""".stripMargin
    },
    // q166: same strictly-preceding IGNORE NULLS carry-forward window,
    // same decimal revenue sums
    "q166_last_touch" ->
      """WITH a AS (SELECT event_type, value,
        |    last_value(CASE WHEN event_type IN ('view', 'click', 'signup')
        |                    THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT coalesce(touch, '(none)') AS touch_type,
        |  CAST(count(*) AS BIGINT) AS n_conversions,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY touch_type""".stripMargin,
    // q165: same union → same-ts pick (updates win) → lag run-compression
    // (IS DISTINCT FROM = the null-safe compare) → lead intervals
    "q165_scd2_history" ->
      """WITH all_v AS (
        |  SELECT c_custkey AS k, c_mktsegment AS segment, c_acctbal AS balance,
        |    CAST(0 AS BIGINT) AS eff, 0 AS src FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'SEGMENT_X', c_acctbal, 10, 1 FROM customer
        |  WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, c_acctbal, 10, 1 FROM customer
        |  WHERE c_custkey % 7 = 0 AND c_custkey % 3 <> 0
        |  UNION ALL
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 3 = 0 THEN 'SEGMENT_X' ELSE c_mktsegment END,
        |    c_acctbal + 100, 20, 1 FROM customer WHERE c_custkey % 5 = 0),
        |pick AS (SELECT k, segment, balance, eff FROM (
        |    SELECT *, row_number() OVER (PARTITION BY k, eff ORDER BY src DESC) AS rn
        |    FROM all_v) WHERE rn = 1),
        |comp AS (SELECT k, segment, balance, eff FROM (
        |    SELECT k, segment, balance, eff,
        |      lag(segment) OVER w AS ps, lag(balance) OVER w AS pb,
        |      row_number() OVER w AS rn2
        |    FROM pick WINDOW w AS (PARTITION BY k ORDER BY eff))
        |  WHERE rn2 = 1 OR segment IS DISTINCT FROM ps
        |     OR balance IS DISTINCT FROM pb)
        |SELECT k, segment, balance, eff,
        |  lead(eff) OVER w2 AS valid_to,
        |  lead(eff) OVER w2 IS NULL AS is_current
        |FROM comp WINDOW w2 AS (PARTITION BY k ORDER BY eff)
        |ORDER BY k, eff""".stripMargin,
    // q164: q16's sessionize CTE feeds distinct per-session types; exact
    // integer counts, the same three double divisions
    "q164_basket_lift" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR CAST(floor(epoch(ts)) AS BIGINT)
        |            - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |items AS (SELECT DISTINCT user_id, event_type,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM flagged),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_baskets FROM
        |  (SELECT DISTINCT user_id, session_id FROM items)),
        |tc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
        |  FROM items GROUP BY event_type),
        |pairs AS (SELECT a.event_type AS item_a, b.event_type AS item_b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM items a JOIN items b
        |    ON a.user_id = b.user_id AND a.session_id = b.session_id
        |  WHERE a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT p.item_a, p.item_b, p.n_ab,
        |  ta.n_t AS n_a, tb.n_t AS n_b, nb.n_baskets,
        |  CAST(p.n_ab AS DOUBLE) / CAST(nb.n_baskets AS DOUBLE) AS support,
        |  CAST(p.n_ab AS DOUBLE) / CAST(ta.n_t AS DOUBLE) AS confidence,
        |  CAST(p.n_ab AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE)
        |    / (CAST(ta.n_t AS DOUBLE) * CAST(tb.n_t AS DOUBLE)) AS lift
        |FROM pairs p
        |JOIN tc ta ON ta.event_type = p.item_a
        |JOIN tc tb ON tb.event_type = p.item_b, nb
        |ORDER BY item_a, item_b""".stripMargin,
    // q160: identical epoch-grid double division, distinct (user, period),
    // min-period cohorts, offset-0 sizes joined back
    "q160_retention_cohorts" ->
      """WITH p AS (SELECT DISTINCT user_id AS u,
        |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 604800000000.0) AS BIGINT) AS p
        |  FROM events),
        |f AS (SELECT u, min(p) AS cp FROM p GROUP BY u),
        |cells AS (SELECT cp AS cohort_period, p.p - f.cp AS period_offset,
        |    CAST(count(*) AS BIGINT) AS n_active
        |  FROM p JOIN f USING (u) GROUP BY 1, 2),
        |sizes AS (SELECT cohort_period, n_active AS cohort_size
        |  FROM cells WHERE period_offset = 0)
        |SELECT c.cohort_period, c.period_offset, c.n_active, s.cohort_size,
        |  CAST(c.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention
        |FROM cells c JOIN sizes s USING (cohort_period)
        |ORDER BY cohort_period, period_offset""".stripMargin,
    "q137_distinct_n" -> diversityOracle(3),
    // q146: both cosine chains + the RBO fold with the plan's own power
    // literals (see rboOracle)
    "q146_rank_overlap" -> rboOracle(10, 0.9),
    // q154: identical plants (chr(7) for the control byte) and the three
    // shared regex constants interpolated verbatim
    "q154_encoding_damage" -> {
      val moji = graft.operators.Scrub.MojibakeRe
      val repl = graft.operators.Scrub.ReplacementRe
      val ctrl = graft.operators.Scrub.ControlRe
      s"""WITH planted AS (SELECT doc_id, source,
         |    text
         |      || CASE WHEN doc_id % 5 = 0 THEN ' cafÃ© menu' ELSE '' END
         |      || CASE WHEN doc_id % 9 = 0 THEN ' bad${repl}byte' ELSE '' END
         |      || CASE WHEN doc_id % 15 = 0 THEN ' ctl' || chr(7) || 'end'
         |         ELSE '' END AS text
         |  FROM documents),
         |f AS (SELECT source,
         |    CASE WHEN regexp_matches(text, '$repl') THEN 1 ELSE 0 END AS r,
         |    CASE WHEN regexp_matches(text, '$moji') THEN 1 ELSE 0 END AS m,
         |    CASE WHEN regexp_matches(text, '$ctrl') THEN 1 ELSE 0 END AS c
         |  FROM planted)
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(r) AS BIGINT) AS n_replacement,
         |  CAST(sum(m) AS BIGINT) AS n_mojibake,
         |  CAST(sum(c) AS BIGINT) AS n_control,
         |  CAST(sum(CASE WHEN r + m + c > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_damaged,
         |  CAST(sum(CASE WHEN r + m + c > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS damage_rate
         |FROM f GROUP BY source ORDER BY source""".stripMargin
    },
    // q153: the q147 grid + lead gaps; the fold replays in value order
    // (list_reduce's first-element init ≡ Spark's 0.0+t₁ exactly)
    "q153_w1_drift" ->
      """WITH s AS (SELECT doc_id, lang,
        |    least(greatest(
        |      least(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) / CAST(50.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
        |      + least((CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |          w -> w IN ('the','a','an','and','or','of','to','in','is','on'))) AS DOUBLE)
        |          / greatest(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
        |      + (CAST(1.0 AS DOUBLE) - least((CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
        |          / greatest(CAST(length(text) AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
        |      CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)) AS score
        |  FROM documents),
        |cnt AS (SELECT lang AS g, score AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM s GROUP BY 1, 2),
        |grp AS (SELECT g, CAST(sum(c) AS BIGINT) AS n1 FROM cnt GROUP BY g),
        |vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM cnt GROUP BY v),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nn FROM vals),
        |grid AS (SELECT grp.g, grp.n1, vals.v, vals.ct,
        |    coalesce(cnt.c, 0) AS c, tot.nn
        |  FROM grp CROSS JOIN vals
        |  LEFT JOIN cnt ON cnt.g = grp.g AND cnt.v = vals.v
        |  CROSS JOIN tot),
        |cum AS (SELECT g, n1, nn, v,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS a,
        |    CAST(sum(ct) OVER (PARTITION BY g ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS call,
        |    lead(v, 1) OVER (PARTITION BY g ORDER BY v) - v AS gap
        |  FROM grid),
        |t AS (SELECT g, n1, nn, v,
        |    CASE WHEN gap IS NOT NULL AND nn - n1 > 0 THEN
        |      abs(CAST(a AS DOUBLE) / CAST(n1 AS DOUBLE)
        |        - CAST(call - a AS DOUBLE) / CAST(nn - n1 AS DOUBLE)) * gap
        |    END AS term
        |  FROM cum)
        |SELECT g AS lang, max(n1) AS n_group, max(nn - n1) AS n_rest,
        |  CASE WHEN max(nn - n1) > 0 THEN
        |    list_reduce(list(coalesce(term, CAST(0.0 AS DOUBLE))
        |      ORDER BY v), (x, y) -> x + y)
        |  END AS w1
        |FROM t GROUP BY g ORDER BY lang""".stripMargin,
    // q152: identical plant, day windows zero-densified over each key's
    // calendar span, integer statistic and (|D| desc, t asc) argmax
    "q152_cusum_burst" ->
      """WITH e AS (SELECT event_id, event_type, ts FROM events
        |  UNION ALL
        |  SELECT event_id + 10000000, event_type, ts FROM events
        |  WHERE event_type = 'click' AND day(ts) > 20),
        |observed AS (SELECT event_type, date_trunc('day', ts) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM e GROUP BY 1, 2),
        |grid AS (SELECT event_type,
        |    unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        |  FROM (SELECT event_type, min(day) AS lo, max(day) AS hi
        |        FROM observed GROUP BY 1)),
        |daily AS (SELECT g.event_type, g.day,
        |    coalesce(o.x, CAST(0 AS BIGINT)) AS x
        |  FROM grid g LEFT JOIN observed o
        |    ON g.event_type = o.event_type AND g.day = o.day),
        |w AS (SELECT event_type, day, x,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS t,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS tt,
        |    CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
        |    CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM daily),
        |d AS (SELECT *, tt * cum - t * tot AS dd FROM w),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY abs(dd) DESC, t) AS rn FROM d)
        |SELECT event_type, tt AS n_days, tot AS total, day AS burst_day,
        |  t AS t_star, dd AS d_star,
        |  CAST(abs(dd) AS DOUBLE) / CAST(tt * tot AS DOUBLE) AS score
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    // q151: generated from the plan's own z/z² doubles + the shared
    // redaction regexes (see piiOracle)
    "q151_pii_incidence" -> piiOracle(1.96),
    // q150: the q132 score chain; the 2·cumw ≥ W rule is integer-only
    "q150_weighted_median" ->
      """WITH s AS (SELECT source, n_chars,
        |    least(greatest(
        |      least(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) / CAST(50.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
        |      + least((CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |          w -> w IN ('the','a','an','and','or','of','to','in','is','on'))) AS DOUBLE)
        |          / greatest(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
        |      + (CAST(1.0 AS DOUBLE) - least((CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
        |          / greatest(CAST(length(text) AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
        |      CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)) AS score
        |  FROM documents),
        |g AS (SELECT source, score, CAST(sum(n_chars) AS BIGINT) AS w
        |  FROM s GROUP BY 1, 2),
        |c AS (SELECT source, score, w,
        |    CAST(sum(w) OVER (PARTITION BY source ORDER BY score
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
        |    CAST(sum(w) OVER (PARTITION BY source) AS BIGINT) AS tw
        |  FROM g)
        |SELECT source, max(tw) AS total_weight,
        |  min(score) AS weighted_median
        |FROM c WHERE cw * 2 >= tw GROUP BY source ORDER BY source""".stripMargin,
    // q149: identical per-node u derivation and −w/ln(u) scores; the
    // (score DESC, node) pick replays the strict-improvement fold
    "q149_rendezvous_shards" ->
      """WITH n(node, w) AS (VALUES
        |  ('a', CAST(1.0 AS DOUBLE)), ('b', CAST(1.0 AS DOUBLE)),
        |  ('c', CAST(2.0 AS DOUBLE)), ('d', CAST(4.0 AS DOUBLE))),
        |sc AS (SELECT d.doc_id, d.n_chars, n.node,
        |    -n.w / ln((CAST(('0x' || substring(md5(
        |      CAST(d.doc_id AS VARCHAR) || ':' || n.node || ':hrw'),
        |      1, 13)) AS BIGINT) + 1)
        |      / CAST(4503599627370497.0 AS DOUBLE)) AS score
        |  FROM documents d CROSS JOIN n),
        |pick AS (SELECT doc_id, n_chars, node,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, node) AS rn
        |  FROM sc)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM pick WHERE rn = 1 GROUP BY node ORDER BY node""".stripMargin,
    // q148: identical token counts; each metric is one exact-integer
    // double division
    "q148_vocab_tail" ->
      """WITH tk AS (SELECT source, unnest(string_split(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')), ' ')) AS t FROM documents),
        |vc AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
        |  FROM tk WHERE t <> '' GROUP BY 1, 2),
        |a AS (SELECT source,
        |    CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS vocab,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
        |    sum(CAST(c AS HUGEINT) * (c - 1)) AS rep2
        |  FROM vc GROUP BY source)
        |SELECT source, n_tokens, vocab, hapax, dis,
        |  CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE) AS hapax_frac,
        |  CAST(hapax AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS gt_unseen,
        |  CASE WHEN n_tokens >= 2 THEN
        |    CAST(rep2 AS DOUBLE)
        |      / CAST(CAST(n_tokens AS HUGEINT) * (n_tokens - 1) AS DOUBLE)
        |  END AS simpson
        |FROM a ORDER BY source""".stripMargin,
    // q147: the q132 score chain + identical per-group/all cumulative
    // windows; ks is a max over exact-division differences
    "q147_ks_drift" ->
      """WITH s AS (SELECT doc_id, lang,
        |    least(greatest(
        |      least(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) / CAST(50.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
        |      + least((CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |          w -> w IN ('the','a','an','and','or','of','to','in','is','on'))) AS DOUBLE)
        |          / greatest(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
        |      + (CAST(1.0 AS DOUBLE) - least((CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
        |          / greatest(CAST(length(text) AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
        |      CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)) AS score
        |  FROM documents),
        |cnt AS (SELECT lang AS g, score AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM s GROUP BY 1, 2),
        |grp AS (SELECT g, CAST(sum(c) AS BIGINT) AS n1 FROM cnt GROUP BY g),
        |vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM cnt GROUP BY v),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nn FROM vals),
        |grid AS (SELECT grp.g, grp.n1, vals.v, vals.ct,
        |    coalesce(cnt.c, 0) AS c, tot.nn
        |  FROM grp CROSS JOIN vals
        |  LEFT JOIN cnt ON cnt.g = grp.g AND cnt.v = vals.v
        |  CROSS JOIN tot),
        |cum AS (SELECT g, n1, nn,
        |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS a,
        |    CAST(sum(ct) OVER (PARTITION BY g ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS call
        |  FROM grid),
        |d AS (SELECT g, n1, nn,
        |    abs(CAST(a AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(call - a AS DOUBLE) / CAST(nn - n1 AS DOUBLE)) AS dd
        |  FROM cum)
        |SELECT g AS lang, max(n1) AS n_group, max(nn - n1) AS n_rest,
        |  CASE WHEN max(nn - n1) > 0 THEN max(dd) END AS ks
        |FROM d GROUP BY g ORDER BY lang""".stripMargin,
    // q145: identical (weight, name) sort, integer Σ(2i−n−1)x, single
    // double division
    "q145_gini_concentration" ->
      """WITH s AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS x
        |  FROM documents GROUP BY source),
        |r AS (SELECT x, CAST(row_number() OVER (ORDER BY x, source)
        |    AS BIGINT) AS i FROM s),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS tot FROM r)
        |SELECT a.n AS n_groups, a.tot AS total_weight,
        |  CASE WHEN a.tot > 0 THEN
        |    CAST(CAST(sum(CAST(2 * i - a.n - 1 AS HUGEINT) * x) AS VARCHAR) AS DOUBLE)
        |      / CAST(CAST(CAST(a.n AS HUGEINT) * a.tot AS VARCHAR) AS DOUBLE)
        |  ELSE CAST(0.0 AS DOUBLE) END AS gini
        |FROM r CROSS JOIN a GROUP BY a.n, a.tot""".stripMargin,
    // q144: identical per-source doc rank, token-first-occurrence min,
    // and prefix counts — exact integers end to end
    "q144_heaps_law" ->
      """WITH d AS (SELECT source, doc_id,
        |    list_filter(string_split(trim(regexp_replace(
        |      regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |      ' +', ' ', 'g')), ' '), t -> t <> '') AS tk,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |      AS BIGINT) AS r
        |  FROM documents),
        |gn AS (SELECT source, max(r) AS gn FROM d GROUP BY source),
        |cp AS (SELECT gn.source, CAST(c.checkpoint AS BIGINT) AS checkpoint
        |  FROM gn CROSS JOIN (VALUES (1),(2),(4),(8),(16),(32),(64),(128),
        |    (256)) AS c(checkpoint)
        |  WHERE c.checkpoint <= gn.gn),
        |tc AS (SELECT d.source, cp.checkpoint,
        |    CAST(sum(len(d.tk)) AS BIGINT) AS n_tokens
        |  FROM d JOIN cp ON d.source = cp.source AND d.r <= cp.checkpoint
        |  GROUP BY 1, 2),
        |fr AS (SELECT source, tkn, min(r) AS fr
        |  FROM (SELECT source, r, unnest(tk) AS tkn FROM d) GROUP BY 1, 2),
        |vc AS (SELECT fr.source, cp.checkpoint,
        |    CAST(count(*) AS BIGINT) AS vocab
        |  FROM fr JOIN cp ON fr.source = cp.source AND fr.fr <= cp.checkpoint
        |  GROUP BY 1, 2)
        |SELECT cp.source, cp.checkpoint,
        |  CAST(coalesce(tc.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(vc.vocab, 0) AS BIGINT) AS vocab
        |FROM cp
        |LEFT JOIN tc ON tc.source = cp.source AND tc.checkpoint = cp.checkpoint
        |LEFT JOIN vc ON vc.source = cp.source AND vc.checkpoint = cp.checkpoint
        |ORDER BY cp.source, cp.checkpoint""".stripMargin,
    // q143: the oracle is the NAIVE quadratic ground truth (PassJoin is
    // exact, so the filtered join must reproduce it row-for-row) over the
    // same planted corpus; length-difference prefilter keeps DuckDB's
    // levenshtein work bounded
    "q143_edit_distance_pairs" ->
      """WITH base AS (SELECT doc_id, substring(text, 1, 40) AS key
        |  FROM documents WHERE source = 'src0'),
        |low AS (SELECT doc_id, key FROM base ORDER BY doc_id LIMIT 3),
        |planted AS (SELECT doc_id + 9000000 AS doc_id,
        |    'X' || substring(key, 2, 39) AS key FROM low),
        |allr AS (SELECT doc_id, key FROM base
        |  UNION ALL SELECT doc_id, key FROM planted),
        |f AS (SELECT doc_id, key FROM allr WHERE length(key) >= 3)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
        |FROM f a JOIN f b ON a.doc_id < b.doc_id
        |  AND abs(length(a.key) - length(b.key)) <= 2
        |WHERE levenshtein(a.key, b.key) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    // q142: both Lloyd iterations unrolled — identical quantization,
    // distance expression (qq − 2·dot + cc, the list_inner_product ≡
    // VecDot precedent of q27), (d2, cluster) argmin, and exact-integer
    // centroid divisions
    "q142_kmeans_lloyd" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * CAST(1000.0 AS DOUBLE)
        |        + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS q
        |  FROM embeddings),
        |eq AS (SELECT vec_id, q,
        |    list_transform(q, v -> CAST(v AS DOUBLE)) AS qd,
        |    list_inner_product(list_transform(q, v -> CAST(v AS DOUBLE)),
        |      list_transform(q, v -> CAST(v AS DOUBLE))) AS qq
        |  FROM e),
        |c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
        |      AS INTEGER) AS cl, qd AS c
        |  FROM eq ORDER BY vec_id LIMIT 4),
        |a1 AS (SELECT vec_id, cl, q FROM (
        |    SELECT eq.vec_id, c0.cl, eq.q,
        |      row_number() OVER (PARTITION BY eq.vec_id ORDER BY
        |        eq.qq - CAST(2.0 AS DOUBLE) * list_inner_product(eq.qd, c0.c)
        |          + list_inner_product(c0.c, c0.c), c0.cl) AS rn
        |    FROM eq CROSS JOIN c0) WHERE rn = 1),
        |s1 AS (SELECT cl, dim, CAST(sum(v) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT cl, unnest(q) AS v,
        |      generate_subscripts(q, 1) - 1 AS dim FROM a1)
        |  GROUP BY cl, dim),
        |c1 AS (SELECT cl,
        |    list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY dim) AS c
        |  FROM s1 GROUP BY cl),
        |a2 AS (SELECT vec_id, cl, q FROM (
        |    SELECT eq.vec_id, c1.cl, eq.q,
        |      row_number() OVER (PARTITION BY eq.vec_id ORDER BY
        |        eq.qq - CAST(2.0 AS DOUBLE) * list_inner_product(eq.qd, c1.c)
        |          + list_inner_product(c1.c, c1.c), c1.cl) AS rn
        |    FROM eq CROSS JOIN c1) WHERE rn = 1),
        |s2 AS (SELECT cl, dim, CAST(sum(v) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT cl, unnest(q) AS v,
        |      generate_subscripts(q, 1) - 1 AS dim FROM a2)
        |  GROUP BY cl, dim)
        |SELECT cl AS cluster, n, CAST(dim AS INTEGER) AS dim,
        |  CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS c
        |FROM s2 ORDER BY cluster, dim""".stripMargin,
    // q141: identical id:text md5 fingerprints (both sides null-coalesced,
    // mirroring the operator); the hex words parse via CAST('0x'... and
    // sum as exact integers — order never enters
    "q141_shard_manifest" ->
      """WITH fp AS (SELECT source, doc_id, n_chars,
        |    md5(coalesce(CAST(doc_id AS VARCHAR), '') || ':' ||
        |        coalesce(text, '')) AS h
        |  FROM documents)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS n_weight,
        |  min(doc_id) AS min_id,
        |  max(doc_id) AS max_id,
        |  CAST(sum(CAST(('0x' || substring(h, 1, 8)) AS BIGINT)) AS BIGINT)
        |    AS checksum_lo,
        |  CAST(sum(CAST(('0x' || substring(h, 9, 8)) AS BIGINT)) AS BIGINT)
        |    AS checksum_hi
        |FROM fp GROUP BY source ORDER BY source""".stripMargin,
    // q140: the identical rank order, four list_reduce folds in rank
    // order, and the same slope/intercept expressions with the 6dp floor
    // round
    "q140_zipf_slope" ->
      """WITH tk AS (SELECT source, unnest(string_split(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')), ' ')) AS t FROM documents),
        |vc AS (SELECT source, t, count(*) AS c FROM tk WHERE t <> ''
        |  GROUP BY 1, 2),
        |vr AS (SELECT source, t, c, row_number() OVER (PARTITION BY source
        |    ORDER BY c DESC, t) AS r FROM vc),
        |pts AS (SELECT source, r, ln(CAST(r AS DOUBLE)) AS x,
        |    ln(CAST(c AS DOUBLE)) AS y
        |  FROM vr WHERE r <= 25),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_ranks,
        |    list_reduce(list(x ORDER BY r), (a, b) -> a + b) AS sx,
        |    list_reduce(list(y ORDER BY r), (a, b) -> a + b) AS sy,
        |    list_reduce(list(x * y ORDER BY r), (a, b) -> a + b) AS sxy,
        |    list_reduce(list(x * x ORDER BY r), (a, b) -> a + b) AS sxx
        |  FROM pts GROUP BY source),
        |fit AS (SELECT source, n_ranks,
        |    (CAST(n_ranks AS DOUBLE) * sxy - sx * sy)
        |      / (CAST(n_ranks AS DOUBLE) * sxx - sx * sx) AS slope_raw,
        |    sx, sy, sxx,
        |    CAST(n_ranks AS DOUBLE) * sxx - sx * sx AS den
        |  FROM s)
        |SELECT source, n_ranks,
        |  CASE WHEN den <> CAST(0.0 AS DOUBLE) THEN
        |    floor(slope_raw * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |      / CAST(1000000 AS DOUBLE) END AS slope,
        |  CASE WHEN den <> CAST(0.0 AS DOUBLE) THEN
        |    floor(((sy - slope_raw * sx) / CAST(n_ranks AS DOUBLE))
        |        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |      / CAST(1000000 AS DOUBLE) END AS intercept
        |FROM fit ORDER BY source""".stripMargin,
    // q139: the UniMax capped-prefix closed form replayed — identical
    // ascending (size, lang) order, integer caps/cumulative sums/prefix
    // condition, the same two final double divisions
    "q139_unimax_quotas" ->
      """WITH sizes AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS size
        |  FROM documents GROUP BY lang),
        |w AS (SELECT lang, size,
        |    CAST(floor(CAST(size AS DOUBLE) * CAST(2.0 AS DOUBLE)) AS BIGINT) AS cap,
        |    CAST(row_number() OVER ord AS BIGINT) AS i,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM sizes WINDOW ord AS (ORDER BY size, lang)),
        |c AS (SELECT *,
        |    CAST(coalesce(sum(cap) OVER (ORDER BY size, lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_prev
        |  FROM w),
        |d AS (SELECT *,
        |    CASE WHEN CAST(cap AS HUGEINT) * (n - i + 1) <= 600000 - cum_prev
        |      THEN 1 ELSE 0 END AS cond
        |  FROM c),
        |e AS (SELECT *,
        |    min(cond) OVER (ORDER BY size, lang ROWS UNBOUNDED PRECEDING) AS capped_i
        |  FROM d),
        |f AS (SELECT *,
        |    CAST(sum(capped_i) OVER () AS BIGINT) AS p,
        |    CAST(sum(CASE WHEN capped_i = 1 THEN cap ELSE 0 END) OVER () AS BIGINT) AS cumcap
        |  FROM e),
        |g AS (SELECT lang, size, cap, capped_i = 1 AS capped,
        |    CASE WHEN capped_i = 1 THEN CAST(cap AS DOUBLE)
        |         ELSE CAST(600000 - cumcap AS DOUBLE) / CAST(n - p AS DOUBLE)
        |    END AS quota
        |  FROM f)
        |SELECT lang, size, cap, capped, quota,
        |  quota / CAST(size AS DOUBLE) AS epochs
        |FROM g ORDER BY lang""".stripMargin,
    // q138: q27's cosine replay over the split sets + the planted copies;
    // the >= 0.999 flag is a comparison of bit-identical doubles
    "q138_embed_decontam" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |tr AS (SELECT vec_id, v FROM e WHERE label <> 9),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE label = 9
        |  UNION ALL
        |  SELECT vec_id + 2000000, v FROM tr WHERE vec_id < 5),
        |scored AS (SELECT q.query_id, tr.vec_id AS neighbor_id,
        |    list_inner_product(tr.v, q.qv)
        |      / (sqrt(list_inner_product(tr.v, tr.v))
        |         * sqrt(list_inner_product(q.qv, q.qv))) AS score
        |  FROM tr CROSS JOIN q),
        |ranked AS (SELECT query_id, neighbor_id, score,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, neighbor_id) AS rn
        |  FROM scored)
        |SELECT query_id, neighbor_id, score,
        |  score >= CAST(0.999 AS DOUBLE) AS contaminated
        |FROM ranked WHERE rn = 1 ORDER BY query_id""".stripMargin,
    // q136: eight unrolled farthest-point picks — identical distance
    // expression, least-fold, and (mind2 DESC, id ASC) argmax
    "q136_kcenter_coreset" -> kcenterOracle(8),
    // q218: eight unrolled MMR picks — identical rel/maxsim dots,
    // identical lambda literals, id-broken ties
    "q218_mmr_select" -> mmrOracle(8, 0.7),
    // q135: Stupid Backoff replayed — the identical BOS-padded trigram
    // stream, counts aggregated from the one src0 trigram table, the same
    // left-associated backoff CASE (0.4 as an explicit DOUBLE), the same
    // position-ordered fold and 4dp round
    "q135_stupid_backoff" ->
      """WITH tks AS (SELECT doc_id, source,
        |    list_filter(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |      x -> x <> '') AS tk
        |  FROM documents),
        |tg AS (SELECT doc_id, source, i,
        |    CASE WHEN i <= 2 THEN '<s>' ELSE tk[i-2] END AS p2,
        |    CASE WHEN i = 1 THEN '<s>' ELSE tk[i-1] END AS p1, tk[i] AS cur
        |  FROM (SELECT doc_id, source, tk,
        |        unnest(generate_series(1, len(tk))) AS i
        |        FROM tks WHERE len(tk) >= 1)),
        |tri AS (SELECT p2, p1, cur, count(*) AS c FROM tg
        |  WHERE source = 'src0' GROUP BY 1, 2, 3),
        |bctx AS (SELECT p2, p1, sum(c) AS cb FROM tri GROUP BY 1, 2),
        |bi AS (SELECT p1, cur, sum(c) AS c2 FROM tri GROUP BY 1, 2),
        |uctx AS (SELECT p1, sum(c) AS c1ctx FROM tri GROUP BY 1),
        |uni AS (SELECT cur, sum(c) AS c1 FROM tri GROUP BY 1),
        |tot AS (SELECT sum(c) AS n FROM tri),
        |sc AS (SELECT tg.doc_id, i,
        |    -ln(CASE
        |      WHEN coalesce(c, 0) > 0
        |        THEN CAST(c AS DOUBLE) / CAST(cb AS DOUBLE)
        |      WHEN coalesce(c2, 0) > 0
        |        THEN CAST(0.4 AS DOUBLE) * (CAST(c2 AS DOUBLE) / CAST(c1ctx AS DOUBLE))
        |      WHEN coalesce(c1, 0) > 0
        |        THEN CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)
        |          * (CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      ELSE CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)
        |          / CAST(n AS DOUBLE) END) AS nll
        |  FROM tg LEFT JOIN tri USING (p2, p1, cur)
        |    LEFT JOIN bctx USING (p2, p1)
        |    LEFT JOIN bi USING (p1, cur)
        |    LEFT JOIN uctx USING (p1)
        |    LEFT JOIN uni USING (cur), tot),
        |f AS (SELECT doc_id, count(*) AS n_tokens,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(nll ORDER BY i)),
        |      (a, b) -> a + b) AS s
        |  FROM sc GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |  round(s / CAST(n_tokens AS DOUBLE), 4) AS avg_nll
        |FROM f ORDER BY doc_id""".stripMargin,
    // q134: full Rocchio replay — q64's quantized centroid means, cosine as
    // list_inner_product with the same sqrt(vn2)*sqrt(cn2) denominator, and
    // the argmax as a (score DESC, label ASC) window; margin is a
    // subtraction of two bit-identical doubles
    "q134_centroid_classify" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |    embedding AS emb FROM embeddings),
        |ex AS (SELECT label AS lbl, unnest(generate_series(1, len(emb))) AS p,
        |    emb FROM e),
        |qq AS (SELECT lbl, CAST(p - 1 AS BIGINT) AS pos,
        |    CAST(floor(CAST(emb[p] AS DOUBLE) * CAST(1e10 AS DOUBLE)
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q FROM ex),
        |cent AS (SELECT lbl, pos, CAST(sum(q) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) / CAST(1e10 AS DOUBLE) AS c
        |  FROM qq GROUP BY 1, 2),
        |carr AS (SELECT lbl, list(c ORDER BY pos) AS cvec FROM cent GROUP BY 1),
        |cn AS (SELECT CAST(lbl AS BIGINT) AS lbl, cvec,
        |    list_inner_product(cvec, cvec) AS cn2 FROM carr),
        |scored AS (SELECT e.vec_id, e.label, cn.lbl,
        |    CASE WHEN list_inner_product(e.v, e.v) * cn.cn2 = 0
        |         THEN CAST(0.0 AS DOUBLE)
        |         ELSE list_inner_product(e.v, cn.cvec)
        |           / (sqrt(list_inner_product(e.v, e.v)) * sqrt(cn.cn2)) END AS s
        |  FROM e CROSS JOIN cn),
        |ranked AS (SELECT vec_id, label, lbl, s,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, lbl ASC) AS rn
        |  FROM scored)
        |SELECT r1.vec_id, r1.label, r1.lbl AS predicted, r1.s AS score,
        |  r2.lbl AS runner_up, r1.s - r2.s AS margin
        |FROM (SELECT * FROM ranked WHERE rn = 1) r1
        |LEFT JOIN (SELECT * FROM ranked WHERE rn = 2) r2 USING (vec_id)
        |ORDER BY vec_id""".stripMargin,
    // q132: whole-group RANK + count windows — the engine's score-bucketed
    // two-phase rank must reproduce them exactly
    "q132_percentile_calibrate" ->
      """WITH s AS (SELECT doc_id, source,
        |    least(greatest(
        |      least(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) / CAST(50.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
        |      + least((CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |          w -> w IN ('the','a','an','and','or','of','to','in','is','on'))) AS DOUBLE)
        |          / greatest(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
        |      + (CAST(1.0 AS DOUBLE) - least((CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
        |          / greatest(CAST(length(text) AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
        |      CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)) AS score
        |  FROM documents),
        |r AS (SELECT doc_id, source, score,
        |    CAST(rank() OVER (PARTITION BY source ORDER BY score) AS BIGINT) AS "rank",
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM s)
        |SELECT doc_id, source, score, "rank",
        |  CAST("rank" - 1 AS DOUBLE) / CAST(greatest(n - 1, 1) AS DOUBLE) AS pct
        |FROM r ORDER BY doc_id""".stripMargin,
    // q130: the hashHex rank + group size windows replayed verbatim;
    // progress is one double division of integer operands
    "q130_interleave_order" ->
      """WITH h AS (SELECT doc_id, source,
        |    substring(md5(CAST(doc_id AS VARCHAR) || ':interleave'), 1, 8) AS hh
        |  FROM documents),
        |r AS (SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS BIGINT) AS pos_in_group,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM h)
        |SELECT doc_id, source, pos_in_group,
        |  CAST(pos_in_group * 2 - 1 AS DOUBLE) / CAST(n * 2 AS DOUBLE) AS progress
        |FROM r ORDER BY doc_id""".stripMargin,
    // identical rounded bounds (q86's argument) make the clipped SET
    // cross-engine stable; the one parallel double sum rounds to 4dp
    "q94_winsorized_stats" ->
      """WITH b AS (SELECT event_type,
        |    round(quantile_cont(value, 0.05), 6) AS blo,
        |    round(quantile_cont(value, 0.95), 6) AS bhi
        |  FROM events GROUP BY 1),
        |w AS (SELECT e.event_type, value,
        |    least(greatest(value, blo), bhi) AS wv
        |  FROM events e JOIN b USING (event_type))
        |SELECT event_type, count(*) AS n,
        |  CAST(count(*) FILTER (wv <> value) AS BIGINT) AS n_clipped,
        |  round(sum(wv), 4) AS wsum
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    // cumulative thresholds: hexThreshold(0.8)='cccccccc',
    // hexThreshold(0.9)='e6666666'; last label is the else-branch
    "q91_multiway_split" ->
      """SELECT split, lang, count(*) AS n_docs FROM (
        |  SELECT lang, CASE
        |    WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split3'), 1, 8)
        |      < 'cccccccc' THEN 'train'
        |    WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split3'), 1, 8)
        |      < 'e6666666' THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM documents)
        |GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,
    // identical quantized sums (HUGEINT exact, < 2^53 so the double cast
    // is exact), identical fixed-order mean/std/z derivation; 1e5 literals
    // are DOUBLE in both engines
    "q92_standardize_dims" ->
      """WITH e AS (SELECT vec_id,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
        |    unnest(range(len(embedding))) AS pos
        |  FROM embeddings),
        |q AS (SELECT vec_id, CAST(pos AS INTEGER) AS pos, v,
        |    CAST(floor(v * 1e5 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qv FROM e),
        |s AS (SELECT pos, CAST(sum(qv) AS DOUBLE) AS s1,
        |    CAST(sum(qv * qv) AS DOUBLE) AS s2, CAST(count(*) AS DOUBLE) AS n
        |  FROM q GROUP BY pos),
        |m AS (SELECT pos, s1 / n / 1e5 AS mean,
        |    sqrt(greatest(s2 / n / (1e5 * 1e5)
        |      - (s1 / n / 1e5) * (s1 / n / 1e5), CAST(0.0 AS DOUBLE))) AS std
        |  FROM s)
        |SELECT q.vec_id, q.pos, q.v AS v,
        |  CASE WHEN m.std = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE (q.v - m.mean) / m.std END AS z
        |FROM q JOIN m USING (pos) ORDER BY vec_id, pos""".stripMargin,
    // identical distinct-bigram sets, identical integer set arithmetic
    "q89_source_overlap" ->
      """WITH arr AS (SELECT source,
        |    regexp_split_to_array(trim(text), '\s+') AS a FROM documents),
        |p AS (SELECT source, unnest(list_zip(a, a[2:])) AS z FROM arr),
        |big AS (SELECT DISTINCT source, z[1] || ' ' || z[2] AS gram
        |  FROM p WHERE z[2] IS NOT NULL),
        |tot AS (SELECT source, count(*) AS n FROM big GROUP BY 1),
        |sh AS (SELECT x.source AS src_a, y.source AS src_b,
        |    count(*) AS shared_ngrams
        |  FROM big x JOIN big y ON x.gram = y.gram AND x.source < y.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, shared_ngrams,
        |  CAST(shared_ngrams AS DOUBLE)
        |    / CAST(ta.n + tb.n - shared_ngrams AS DOUBLE) AS jaccard
        |FROM sh JOIN tot ta ON ta.source = sh.src_a
        |  JOIN tot tb ON tb.source = sh.src_b
        |ORDER BY src_a, src_b""".stripMargin,
    // identical bucketing (integer floor division) and integer-derived
    // waste arithmetic
    "q90_length_buckets" ->
      """WITH t AS (SELECT CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |    AS BIGINT) AS n_tok FROM documents),
        |b AS (SELECT n_tok // 16 AS bucket, count(*) AS n_docs,
        |    max(n_tok) AS max_tok, CAST(sum(n_tok) AS BIGINT) AS sum_tok
        |  FROM t WHERE n_tok IS NOT NULL AND n_tok > 0 GROUP BY 1)
        |SELECT bucket, n_docs, max_tok, sum_tok,
        |  max_tok * n_docs AS padded_tok,
        |  CAST(max_tok * n_docs - sum_tok AS DOUBLE)
        |    / CAST(max_tok * n_docs AS DOUBLE) AS waste_frac
        |FROM b ORDER BY bucket""".stripMargin,
    // identical tokenization (regexp split of trimmed text), identical
    // integer-derived ratios, identical gate thresholds
    "q87_quality_gates" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS tk FROM documents),
        |m AS (SELECT doc_id, len(tk) AS n,
        |  CAST(list_sum(list_transform(tk, w -> length(w))) AS DOUBLE)
        |    / greatest(CAST(len(tk) AS DOUBLE), CAST(1.0 AS DOUBLE)) AS mean_len,
        |  CAST(len(list_filter(tk, w -> contains(w, '#') OR contains(w, '...'))) AS DOUBLE)
        |    / greatest(CAST(len(tk) AS DOUBLE), CAST(1.0 AS DOUBLE)) AS sym,
        |  CAST(len(list_filter(tk, w -> regexp_matches(w, '[a-zA-Z]'))) AS DOUBLE)
        |    / greatest(CAST(len(tk) AS DOUBLE), CAST(1.0 AS DOUBLE)) AS alpha,
        |  len(list_filter(list_distinct(list_transform(tk, w -> lower(w))),
        |    w -> list_contains(['the','a','data','value'], w))) AS stops
        |  FROM t),
        |f AS (SELECT doc_id,
        |  n >= 30 AND n <= 100000 AS words_ok,
        |  mean_len >= CAST(3.0 AS DOUBLE) AND mean_len <= CAST(10.0 AS DOUBLE) AS mean_word_len_ok,
        |  sym <= CAST(0.1 AS DOUBLE) AS symbol_ok,
        |  alpha >= CAST(0.8 AS DOUBLE) AS alpha_ok,
        |  stops >= 2 AS stopwords_ok
        |  FROM m)
        |SELECT doc_id, words_ok, mean_word_len_ok, symbol_ok, alpha_ok,
        |  stopwords_ok,
        |  words_ok AND mean_word_len_ok AND symbol_ok AND alpha_ok
        |    AND stopwords_ok AS pass
        |FROM f ORDER BY doc_id""".stripMargin,
    // generate_series(0, -1) is empty in DuckDB (matching the Spark-side
    // empty-array guard); '80000000' is hexThreshold(0.5) verbatim
    "q88_epoch_mixture" ->
      """WITH w AS (SELECT doc_id, source,
        |    CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
        |                WHEN 'src2' THEN 0 ELSE 1 END AS whole,
        |    CASE source WHEN 'src0' THEN TRUE WHEN 'src1' THEN TRUE
        |                ELSE FALSE END AS has_frac
        |  FROM documents),
        |base AS (SELECT doc_id, source,
        |    unnest(generate_series(0, whole - 1)) AS epoch
        |  FROM w WHERE whole >= 1),
        |extra AS (SELECT doc_id, source, whole AS epoch FROM w
        |  WHERE has_frac
        |    AND substr(md5(CAST(doc_id AS VARCHAR) || ':epoch'), 1, 8) < '80000000')
        |SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch
        |FROM (SELECT * FROM base UNION ALL SELECT * FROM extra)
        |ORDER BY doc_id, epoch""".stripMargin,
    // the bloom prefilter is invisible to the result (q80's argument):
    // plain NOT IN over the same md5 fingerprints, min-id per batch fp
    "q84_incremental_dedup" ->
      """WITH led AS (SELECT DISTINCT md5(array_to_string(list_sort(list_distinct(
        |    string_split(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))), ' ')) AS fp
        |  FROM documents),
        |raw AS (
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' graft v2' FROM documents WHERE doc_id % 5 = 1
        |  UNION ALL
        |  SELECT doc_id + 2000000, text || ' graft v2' FROM documents WHERE doc_id % 5 = 1),
        |b AS (SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
        |    string_split(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))), ' ')) AS fp
        |  FROM raw),
        |k AS (SELECT doc_id, fp,
        |  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM b)
        |SELECT doc_id, fp FROM k
        |WHERE rn = 1 AND fp NOT IN (SELECT fp FROM led)
        |ORDER BY doc_id""".stripMargin,
    // exact distinct both sides; the tolerance assertion is stated TRUE
    // (q49's convention — the Spark side computes it for real)
    "q82_distinct_sketch" ->
      """SELECT lang, count(DISTINCT md5(array_to_string(list_sort(list_distinct(
        |    string_split(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))), ' '))) AS n_exact,
        |  TRUE AS within_tol
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // the exact formulation the two-pass MG pipeline must reproduce
    "q83_freq_tokens" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split(trim(regexp_replace(regexp_replace(
        |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT lang, tok, count(*) AS cnt FROM toks WHERE tok <> ''
        |  GROUP BY 1, 2),
        |r AS (SELECT lang, tok, cnt,
        |  row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rnk
        |  FROM c)
        |SELECT lang, CAST(rnk AS INTEGER) AS rnk, tok, cnt FROM r
        |WHERE rnk <= 10 ORDER BY lang, rnk""".stripMargin,
    // quantile_cont is the same R-7 interpolation as the two-weight form;
    // 4-decimal round absorbs cross-engine ulps (q43's convention)
    "q85_grouped_quantiles" ->
      """SELECT event_type, CAST(0.25 AS DOUBLE) AS p,
        |  round(quantile_cont(value, 0.25), 4) AS value FROM events GROUP BY 1
        |UNION ALL SELECT event_type, CAST(0.5 AS DOUBLE),
        |  round(quantile_cont(value, 0.5), 4) FROM events GROUP BY 1
        |UNION ALL SELECT event_type, CAST(0.75 AS DOUBLE),
        |  round(quantile_cont(value, 0.75), 4) FROM events GROUP BY 1
        |UNION ALL SELECT event_type, CAST(0.95 AS DOUBLE),
        |  round(quantile_cont(value, 0.95), 4) FROM events GROUP BY 1
        |ORDER BY event_type, p""".stripMargin,
    // the 6-decimal median/MAD rounds happen BEFORE the deviation and
    // threshold arithmetic in both engines, so the outlier set is identical
    "q86_robust_outliers" ->
      """WITH med AS (
        |  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS m
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT e.event_type, abs(e.value - med.m) AS adev, med.m
        |  FROM events e JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS md
        |  FROM d GROUP BY 1)
        |SELECT d.event_type, round(any_value(d.m), 4) AS median,
        |  round(any_value(mad.md), 4) AS mad,
        |  CAST(count(*) FILTER (d.adev > mad.md * 3.0) AS BIGINT) AS n_outliers
        |FROM d JOIN mad USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    // identical tokenization (q90's regexp split of trimmed text) and the
    // q85-verified quantile_cont ≡ exactGrouped interpolation; the sketch
    // tolerance flags are asserted Spark-side, the oracle states TRUE
    "q99_quantile_sketch" ->
      """WITH d AS (SELECT lang,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
        |      AS n_tok FROM documents)
        |SELECT lang,
        |  round(quantile_cont(n_tok, 0.5), 4) AS p50_exact,
        |  round(quantile_cont(n_tok, 0.9), 4) AS p90_exact,
        |  TRUE AS p50_in_tol, TRUE AS p90_in_tol
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    // identical tokenization (the q93 normalize chain), identical integer
    // bigram counts with a '<s>' BOS context, identical
    // ln((c+1)/(cc+V+1)) per position, identical position-ordered fold
    // (list_reduce with a prepended 0.0 seed == Spark's aggregate seed)
    // q243: q100's NLL chain verbatim, then per-doc (nll DESC, i DESC)
    // total order — identical slice boundary and fold order both engines
    "q243_min_k_prob" ->
      """WITH tks AS (SELECT doc_id, source,
        |    list_filter(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |      x -> x <> '') AS tk
        |  FROM documents),
        |bg AS (SELECT doc_id, source, i,
        |    CASE WHEN i = 1 THEN '<s>' ELSE tk[i-1] END AS prev, tk[i] AS cur
        |  FROM (SELECT doc_id, source, tk,
        |        unnest(generate_series(1, len(tk))) AS i
        |        FROM tks WHERE len(tk) >= 1)),
        |cnt AS (SELECT prev, cur, count(*) AS c FROM bg
        |  WHERE source = 'src0' GROUP BY 1, 2),
        |ctx AS (SELECT prev, sum(c) AS cc FROM cnt GROUP BY 1),
        |vv AS (SELECT count(DISTINCT cur) AS v FROM cnt),
        |sc AS (SELECT bg.doc_id, i,
        |    -ln(CAST(coalesce(c, 0) + 1 AS DOUBLE) /
        |        CAST(coalesce(cc, 0) + v + 1 AS DOUBLE)) AS nll
        |  FROM bg LEFT JOIN cnt USING (prev, cur)
        |    LEFT JOIN ctx USING (prev), vv),
        |f AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    list(nll ORDER BY nll DESC, i DESC) AS l
        |  FROM sc GROUP BY 1),
        |g AS (SELECT doc_id, n_tokens,
        |    greatest(CAST(1 AS BIGINT), (n_tokens * 20) // 100)
        |      AS n_scored, l
        |  FROM f)
        |SELECT doc_id, n_tokens, n_scored,
        |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_slice(l, 1, n_scored)), (a, b) -> a + b)
        |    / CAST(n_scored AS DOUBLE), 4) AS min_k_avg_nll
        |FROM g ORDER BY doc_id""".stripMargin,
    "q100_lm_perplexity" ->
      """WITH tks AS (SELECT doc_id, source,
        |    list_filter(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |      x -> x <> '') AS tk
        |  FROM documents),
        |bg AS (SELECT doc_id, source, i,
        |    CASE WHEN i = 1 THEN '<s>' ELSE tk[i-1] END AS prev, tk[i] AS cur
        |  FROM (SELECT doc_id, source, tk,
        |        unnest(generate_series(1, len(tk))) AS i
        |        FROM tks WHERE len(tk) >= 1)),
        |cnt AS (SELECT prev, cur, count(*) AS c FROM bg
        |  WHERE source = 'src0' GROUP BY 1, 2),
        |ctx AS (SELECT prev, sum(c) AS cc FROM cnt GROUP BY 1),
        |vv AS (SELECT count(DISTINCT cur) AS v FROM cnt),
        |sc AS (SELECT bg.doc_id, i,
        |    -ln(CAST(coalesce(c, 0) + 1 AS DOUBLE) /
        |        CAST(coalesce(cc, 0) + v + 1 AS DOUBLE)) AS nll
        |  FROM bg LEFT JOIN cnt USING (prev, cur)
        |    LEFT JOIN ctx USING (prev), vv),
        |f AS (SELECT doc_id, count(*) AS n_tokens,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(nll ORDER BY i)),
        |      (a, b) -> a + b) AS s
        |  FROM sc GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |  round(s / CAST(n_tokens AS DOUBLE), 4) AS avg_nll
        |FROM f ORDER BY doc_id""".stripMargin,
    // identical hashed-bigram buckets (base-257/mod-1e9+7 string hash, the
    // q74 recipe as a seeded left fold), identical integer bucket counts,
    // identical fixed-order log-ratio fold, identical deterministic Gumbel
    // key from the id hash — rank replayed by window over the same key
    "q101_dsir_resample" ->
      """WITH tks AS (SELECT doc_id, lang,
        |    list_filter(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |      x -> x <> '') AS tk
        |  FROM documents),
        |pr AS (SELECT doc_id, lang, i, tk[i] || ' ' || tk[i+1] AS g
        |  FROM (SELECT doc_id, lang, tk,
        |        unnest(generate_series(1, len(tk) - 1)) AS i
        |        FROM tks WHERE len(tk) >= 2)),
        |ft AS (SELECT doc_id, lang, i,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, len(g)),
        |        j -> CAST(unicode(g[j]) AS BIGINT))),
        |      (a, b) -> (a * 257 + b) % 1000000007) % 1024 AS bucket
        |  FROM pr),
        |ct AS (SELECT bucket, count(*) AS ct FROM ft
        |  WHERE lang = 'en' GROUP BY 1),
        |cr AS (SELECT bucket, count(*) AS cr FROM ft GROUP BY 1),
        |tot AS (SELECT (SELECT sum(ct) FROM ct) AS nt,
        |    (SELECT sum(cr) FROM cr) AS nr),
        |lam AS (SELECT ft.doc_id, i,
        |    ln(CAST(coalesce(ct, 0) + 1 AS DOUBLE) /
        |       CAST(nt + 1024 AS DOUBLE)) -
        |    ln(CAST(coalesce(cr, 0) + 1 AS DOUBLE) /
        |       CAST(nr + 1024 AS DOUBLE)) AS lam
        |  FROM ft LEFT JOIN ct USING (bucket)
        |    LEFT JOIN cr USING (bucket), tot),
        |w0 AS (SELECT doc_id, count(*) AS n_feats,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(lam ORDER BY i)),
        |      (a, b) -> a + b) AS logw
        |  FROM lam GROUP BY 1),
        |w AS (SELECT d.doc_id, coalesce(n_feats, 0) AS n_feats,
        |    coalesce(logw, CAST(0 AS DOUBLE)) AS logw
        |  FROM documents d LEFT JOIN w0 USING (doc_id)),
        |gk AS (SELECT doc_id, n_feats, logw, logw - ln(-ln(
        |    (CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1,
        |          len(CAST(doc_id AS VARCHAR) || ':dsir')),
        |        j -> CAST(unicode((CAST(doc_id AS VARCHAR) || ':dsir')[j])
        |          AS BIGINT))),
        |      (a, b) -> (a * 257 + b) % 1000000007) AS DOUBLE) + 0.5)
        |    / 1000000007.0)) AS k
        |  FROM w),
        |r AS (SELECT doc_id, n_feats, logw,
        |    row_number() OVER (ORDER BY k DESC, doc_id) AS rank FROM gk)
        |SELECT CAST(rank AS INTEGER) AS rank, doc_id, n_feats,
        |  round(logw, 6) AS logw
        |FROM r WHERE rank <= 100 ORDER BY rank""".stripMargin,
    // identical integer unigram/bigram counts, identical left-associated
    // ln(p_ab) - ln(p_a) - ln(p_b) rounded to 4dp, identical rank order
    // (rounded pmi DESC, base-257 polynomial hash of the pair text ASC)
    "q102_pmi_collocations" ->
      """WITH tks AS (SELECT list_filter(string_split(trim(regexp_replace(
        |      regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |      ' +', ' ', 'g')), ' '), x -> x <> '') AS tk
        |  FROM documents),
        |uni AS (SELECT w, count(*) AS cu
        |  FROM (SELECT unnest(tk) AS w FROM tks) GROUP BY 1),
        |bi AS (SELECT tk[i] AS a, tk[i+1] AS b, count(*) AS cb
        |  FROM (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
        |        FROM tks WHERE len(tk) >= 2) GROUP BY 1, 2),
        |tot AS (SELECT (SELECT sum(cu) FROM uni) AS n1,
        |    (SELECT sum(cb) FROM bi) AS n2),
        |p AS (SELECT a || ' ' || b AS gram, cb,
        |    round(ln(CAST(cb AS DOUBLE) / CAST(n2 AS DOUBLE)) -
        |          ln(CAST(ua.cu AS DOUBLE) / CAST(n1 AS DOUBLE)) -
        |          ln(CAST(ub.cu AS DOUBLE) / CAST(n1 AS DOUBLE)), 4) AS pmi
        |  FROM bi JOIN uni ua ON ua.w = bi.a JOIN uni ub ON ub.w = bi.b, tot
        |  WHERE cb >= 5),
        |h AS (SELECT gram, cb, pmi,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, len(gram)),
        |        j -> CAST(unicode(gram[j]) AS BIGINT))),
        |      (x, y) -> (x * 257 + y) % 1000000007) AS th
        |  FROM p),
        |r AS (SELECT gram, cb, pmi,
        |    row_number() OVER (ORDER BY pmi DESC, th, gram) AS rank FROM h)
        |SELECT CAST(rank AS INTEGER) AS rank, gram, cb AS pair_count, pmi
        |FROM r WHERE rank <= 50 ORDER BY rank""".stripMargin,
    // identical distinct-trigram sets per document, identical polynomial
    // gram hashes on both join sides (a hash collision is a SHARED false
    // "seen", not a divergence), identical integer counts and 4dp ratio
    "q103_ngram_novelty" ->
      """WITH tks AS (SELECT doc_id, source,
        |    list_filter(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |      x -> x <> '') AS tk
        |  FROM documents),
        |dg AS (SELECT doc_id, source, unnest(list_distinct(
        |    list_transform(generate_series(1, len(tk) - 2),
        |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS g
        |  FROM tks WHERE len(tk) >= 3),
        |dh AS (SELECT doc_id, source,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, len(g)),
        |        j -> CAST(unicode(g[j]) AS BIGINT))),
        |      (x, y) -> (x * 257 + y) % 1000000007) AS h
        |  FROM dg),
        |rd AS (SELECT DISTINCT h, 1 AS seen FROM dh WHERE source = 'src0'),
        |agg AS (SELECT doc_id, count(*) AS n_grams,
        |    CAST(sum(CASE WHEN seen IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_novel
        |  FROM dh LEFT JOIN rd USING (h) GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(n_grams, CAST(0 AS BIGINT)) AS n_grams,
        |  coalesce(n_novel, CAST(0 AS BIGINT)) AS n_novel,
        |  round(CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE), 4)
        |    AS novelty
        |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    // identical integer tf/df/N, identical tf * ln(N/df) rounded to 4dp,
    // identical per-document rank key (rounded score DESC, polynomial
    // hash of the term ASC)
    "q104_tfidf_keywords" ->
      """WITH tks AS (SELECT doc_id,
        |    list_filter(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |      x -> x <> '') AS tk
        |  FROM documents),
        |tfq AS (SELECT doc_id, t AS term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(tk) AS t FROM tks) GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tfq GROUP BY 1),
        |nd AS (SELECT count(DISTINCT doc_id) AS n FROM tfq),
        |sc AS (SELECT doc_id, term, tf,
        |    round(CAST(tf AS DOUBLE) *
        |      ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)), 4) AS tfidf
        |  FROM tfq JOIN dfq USING (term), nd),
        |h AS (SELECT doc_id, term, tf, tfidf,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, len(term)),
        |        j -> CAST(unicode(term[j]) AS BIGINT))),
        |      (x, y) -> (x * 257 + y) % 1000000007) AS th
        |  FROM sc),
        |r AS (SELECT doc_id, term, tf, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, th, term) AS rank FROM h)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tf, tfidf
        |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,
    // identical normalization, identical exact 5-gram polynomial hashes
    // (the q74 arithmetic), identical min-length boundary fold (list
    // accumulator seeded with [0]), identical slicing and md5 keys
    "q105_content_chunks" ->
      """WITH n AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t
        |  FROM documents),
        |nn AS (SELECT doc_id, t FROM n WHERE t IS NOT NULL AND len(t) >= 1),
        |c AS (SELECT doc_id, t, list_transform(generate_series(1, len(t)),
        |        i -> CAST(unicode(t[i]) AS BIGINT)) AS cs FROM nn),
        |g AS (SELECT doc_id, t,
        |    CASE WHEN len(cs) < 5 THEN CAST([] AS BIGINT[])
        |    ELSE list_transform(generate_series(1, len(cs) - 4),
        |      i -> (cs[i]*4362470401 + cs[i+1]*16974593 + cs[i+2]*66049
        |            + cs[i+3]*257 + cs[i+4]) % 1000000007)
        |    END AS gh FROM c),
        |cand AS (SELECT doc_id, t, list_transform(
        |    list_filter(generate_series(1, len(gh)), j -> gh[j] % 64 = 0),
        |    j -> j + 4) AS cand FROM g),
        |bd0 AS (SELECT doc_id, t, list_reduce(
        |    list_prepend([CAST(0 AS BIGINT)],
        |      list_transform(cand, p -> [CAST(p AS BIGINT)])),
        |    (a, b) -> CASE WHEN b[1] - a[-1] >= 32 THEN list_concat(a, b)
        |              ELSE a END) AS k FROM cand),
        |bd AS (SELECT doc_id, t,
        |    CASE WHEN k[-1] = len(t) THEN k
        |    ELSE list_concat(k, [CAST(len(t) AS BIGINT)]) END AS bd FROM bd0),
        |ch AS (SELECT doc_id, t, bd,
        |    unnest(generate_series(1, len(bd) - 1)) AS j FROM bd)
        |SELECT doc_id, CAST(j - 1 AS INTEGER) AS chunk_id,
        |  CAST(bd[j] + 1 AS INTEGER) AS start,
        |  CAST(bd[j+1] - bd[j] AS INTEGER) AS length,
        |  t[CAST(bd[j]+1 AS INTEGER):CAST(bd[j+1] AS INTEGER)] AS chunk_text,
        |  md5(t[CAST(bd[j]+1 AS INTEGER):CAST(bd[j+1] AS INTEGER)])
        |    AS chunk_key
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,
    // q100 with the scored set restricted to the shared md5 sample; the
    // bigram model still trains on the FULL src0 slice. tks keeps only
    // rows either engine needs (model slice or sampled), cutting the
    // oracle's per-position lambda work ~64x.
    "q100s_lm_sampled" ->
      """WITH tks AS (SELECT doc_id, source,
        |    list_filter(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |      x -> x <> '') AS tk
        |  FROM documents
        |  WHERE source = 'src0'
        |     OR md5(CAST(doc_id AS VARCHAR) || ':osample') < '04'),
        |bg AS (SELECT doc_id, source, i,
        |    CASE WHEN i = 1 THEN '<s>' ELSE tk[i-1] END AS prev, tk[i] AS cur
        |  FROM (SELECT doc_id, source, tk,
        |        unnest(generate_series(1, len(tk))) AS i
        |        FROM tks WHERE len(tk) >= 1)),
        |cnt AS (SELECT prev, cur, count(*) AS c FROM bg
        |  WHERE source = 'src0' GROUP BY 1, 2),
        |ctx AS (SELECT prev, sum(c) AS cc FROM cnt GROUP BY 1),
        |vv AS (SELECT count(DISTINCT cur) AS v FROM cnt),
        |sc AS (SELECT bg.doc_id, i,
        |    -ln(CAST(coalesce(c, 0) + 1 AS DOUBLE) /
        |        CAST(coalesce(cc, 0) + v + 1 AS DOUBLE)) AS nll
        |  FROM bg LEFT JOIN cnt USING (prev, cur)
        |    LEFT JOIN ctx USING (prev), vv
        |  WHERE md5(CAST(bg.doc_id AS VARCHAR) || ':osample') < '04'),
        |f AS (SELECT doc_id, count(*) AS n_tokens,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(nll ORDER BY i)),
        |      (a, b) -> a + b) AS s
        |  FROM sc GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |  round(s / CAST(n_tokens AS DOUBLE), 4) AS avg_nll
        |FROM f ORDER BY doc_id""".stripMargin,
    // q101 with the Gumbel top-k drawn only among the sampled candidates;
    // target and proposal bucket counts still come from the FULL corpus.
    // Distinct gram strings are hashed ONCE (gh) and joined back — the
    // per-char fold is a pure function of the gram, so this is the same
    // arithmetic with set-bounded instead of occurrence-bounded cost.
    "q101s_dsir_sampled" ->
      """WITH tks AS (SELECT doc_id, lang,
        |    list_filter(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |      x -> x <> '') AS tk
        |  FROM documents),
        |pr AS (SELECT doc_id, lang, i, tk[i] || ' ' || tk[i+1] AS g
        |  FROM (SELECT doc_id, lang, tk,
        |        unnest(generate_series(1, len(tk) - 1)) AS i
        |        FROM tks WHERE len(tk) >= 2)),
        |gh AS (SELECT g,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, len(g)),
        |        j -> CAST(unicode(g[j]) AS BIGINT))),
        |      (a, b) -> (a * 257 + b) % 1000000007) % 1024 AS bucket
        |  FROM (SELECT DISTINCT g FROM pr)),
        |ft AS (SELECT doc_id, lang, i, bucket FROM pr JOIN gh USING (g)),
        |ct AS (SELECT bucket, count(*) AS ct FROM ft
        |  WHERE lang = 'en' GROUP BY 1),
        |cr AS (SELECT bucket, count(*) AS cr FROM ft GROUP BY 1),
        |tot AS (SELECT (SELECT sum(ct) FROM ct) AS nt,
        |    (SELECT sum(cr) FROM cr) AS nr),
        |lam AS (SELECT ft.doc_id, i,
        |    ln(CAST(coalesce(ct, 0) + 1 AS DOUBLE) /
        |       CAST(nt + 1024 AS DOUBLE)) -
        |    ln(CAST(coalesce(cr, 0) + 1 AS DOUBLE) /
        |       CAST(nr + 1024 AS DOUBLE)) AS lam
        |  FROM ft LEFT JOIN ct USING (bucket)
        |    LEFT JOIN cr USING (bucket), tot
        |  WHERE md5(CAST(ft.doc_id AS VARCHAR) || ':osample') < '04'),
        |w0 AS (SELECT doc_id, count(*) AS n_feats,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(lam ORDER BY i)),
        |      (a, b) -> a + b) AS logw
        |  FROM lam GROUP BY 1),
        |w AS (SELECT d.doc_id, coalesce(n_feats, 0) AS n_feats,
        |    coalesce(logw, CAST(0 AS DOUBLE)) AS logw
        |  FROM (SELECT doc_id FROM documents
        |        WHERE md5(CAST(doc_id AS VARCHAR) || ':osample') < '04') d
        |    LEFT JOIN w0 USING (doc_id)),
        |gk AS (SELECT doc_id, n_feats, logw, logw - ln(-ln(
        |    (CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1,
        |          len(CAST(doc_id AS VARCHAR) || ':dsir')),
        |        j -> CAST(unicode((CAST(doc_id AS VARCHAR) || ':dsir')[j])
        |          AS BIGINT))),
        |      (a, b) -> (a * 257 + b) % 1000000007) AS DOUBLE) + 0.5)
        |    / 1000000007.0)) AS k
        |  FROM w),
        |r AS (SELECT doc_id, n_feats, logw,
        |    row_number() OVER (ORDER BY k DESC, doc_id) AS rank FROM gk)
        |SELECT CAST(rank AS INTEGER) AS rank, doc_id, n_feats,
        |  round(logw, 6) AS logw
        |FROM r WHERE rank <= 100 ORDER BY rank""".stripMargin,
    // q103 scored only for the sampled documents against the FULL src0
    // reference; distinct grams hashed once (gh) as in q101s.
    "q103s_novelty_sampled" ->
      """WITH tks AS (SELECT doc_id, source,
        |    list_filter(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |      x -> x <> '') AS tk
        |  FROM documents
        |  WHERE source = 'src0'
        |     OR md5(CAST(doc_id AS VARCHAR) || ':osample') < '04'),
        |dg AS (SELECT doc_id, source, unnest(list_distinct(
        |    list_transform(generate_series(1, len(tk) - 2),
        |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS g
        |  FROM tks WHERE len(tk) >= 3),
        |gh AS (SELECT g,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, len(g)),
        |        j -> CAST(unicode(g[j]) AS BIGINT))),
        |      (x, y) -> (x * 257 + y) % 1000000007) AS h
        |  FROM (SELECT DISTINCT g FROM dg)),
        |dh AS (SELECT doc_id, source, h FROM dg JOIN gh USING (g)),
        |rd AS (SELECT DISTINCT h, 1 AS seen FROM dh WHERE source = 'src0'),
        |agg AS (SELECT doc_id, count(*) AS n_grams,
        |    CAST(sum(CASE WHEN seen IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_novel
        |  FROM dh LEFT JOIN rd USING (h)
        |  WHERE md5(CAST(doc_id AS VARCHAR) || ':osample') < '04'
        |  GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(n_grams, CAST(0 AS BIGINT)) AS n_grams,
        |  coalesce(n_novel, CAST(0 AS BIGINT)) AS n_novel,
        |  round(CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE), 4)
        |    AS novelty
        |FROM (SELECT doc_id FROM documents
        |      WHERE md5(CAST(doc_id AS VARCHAR) || ':osample') < '04') d
        |  LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q105 restricted to the sampled documents — chunking has no corpus
    // model, so the filter composes directly.
    "q105s_chunks_sampled" ->
      """WITH n AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t
        |  FROM documents
        |  WHERE md5(CAST(doc_id AS VARCHAR) || ':osample') < '04'),
        |nn AS (SELECT doc_id, t FROM n WHERE t IS NOT NULL AND len(t) >= 1),
        |c AS (SELECT doc_id, t, list_transform(generate_series(1, len(t)),
        |        i -> CAST(unicode(t[i]) AS BIGINT)) AS cs FROM nn),
        |g AS (SELECT doc_id, t,
        |    CASE WHEN len(cs) < 5 THEN CAST([] AS BIGINT[])
        |    ELSE list_transform(generate_series(1, len(cs) - 4),
        |      i -> (cs[i]*4362470401 + cs[i+1]*16974593 + cs[i+2]*66049
        |            + cs[i+3]*257 + cs[i+4]) % 1000000007)
        |    END AS gh FROM c),
        |cand AS (SELECT doc_id, t, list_transform(
        |    list_filter(generate_series(1, len(gh)), j -> gh[j] % 64 = 0),
        |    j -> j + 4) AS cand FROM g),
        |bd0 AS (SELECT doc_id, t, list_reduce(
        |    list_prepend([CAST(0 AS BIGINT)],
        |      list_transform(cand, p -> [CAST(p AS BIGINT)])),
        |    (a, b) -> CASE WHEN b[1] - a[-1] >= 32 THEN list_concat(a, b)
        |              ELSE a END) AS k FROM cand),
        |bd AS (SELECT doc_id, t,
        |    CASE WHEN k[-1] = len(t) THEN k
        |    ELSE list_concat(k, [CAST(len(t) AS BIGINT)]) END AS bd FROM bd0),
        |ch AS (SELECT doc_id, t, bd,
        |    unnest(generate_series(1, len(bd) - 1)) AS j FROM bd)
        |SELECT doc_id, CAST(j - 1 AS INTEGER) AS chunk_id,
        |  CAST(bd[j] + 1 AS INTEGER) AS start,
        |  CAST(bd[j+1] - bd[j] AS INTEGER) AS length,
        |  t[CAST(bd[j]+1 AS INTEGER):CAST(bd[j+1] AS INTEGER)] AS chunk_text,
        |  md5(t[CAST(bd[j]+1 AS INTEGER):CAST(bd[j+1] AS INTEGER)])
        |    AS chunk_key
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,
    // identical integer counts, identical (count DESC, polyhash ASC) rank
    // order, identical ascending-index folds of the four slope sums —
    // ties at the rank boundary have equal counts, so the slope is
    // tie-invariant by construction
    "q106_corpus_health" ->
      """WITH tks AS (SELECT source,
        |    list_filter(string_split(trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |      x -> x <> '') AS tk
        |  FROM documents),
        |cnt AS (SELECT source, w, count(*) AS c
        |  FROM (SELECT source, unnest(tk) AS w FROM tks) GROUP BY 1, 2),
        |base AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS vocab,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
        |  FROM cnt GROUP BY 1),
        |rk AS (SELECT source, c, row_number() OVER (PARTITION BY source
        |    ORDER BY c DESC, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, len(w)),
        |        j -> CAST(unicode(w[j]) AS BIGINT))),
        |      (x, y) -> (x * 257 + y) % 1000000007), w) AS r FROM cnt),
        |top AS (SELECT source, list(CAST(c AS DOUBLE) ORDER BY r) AS cs
        |  FROM rk WHERE r <= 100 GROUP BY 1),
        |sl AS (SELECT source, len(cs) AS n,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(cs)),
        |        i -> ln(CAST(i AS DOUBLE)))), (a, b) -> a + b) AS sx,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(cs)),
        |        i -> ln(cs[i]))), (a, b) -> a + b) AS sy,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(cs)),
        |        i -> ln(CAST(i AS DOUBLE)) * ln(cs[i]))), (a, b) -> a + b)
        |      AS sxy,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(generate_series(1, len(cs)),
        |        i -> ln(CAST(i AS DOUBLE)) * ln(CAST(i AS DOUBLE)))),
        |      (a, b) -> a + b) AS sxx
        |  FROM top)
        |SELECT b.source, n_tokens, vocab,
        |  round(CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS ttr,
        |  round(CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE), 4)
        |    AS hapax_frac,
        |  CASE WHEN n >= 2 THEN round((n * sxy - sx * sy) /
        |    (n * sxx - sx * sx), 4) END AS zipf_slope
        |FROM base b JOIN sl USING (source) ORDER BY source""".stripMargin,
    // identical md5(key:domain) hash order — rank by the hex string is
    // rank by the (52-bit, 52-bit) integer pair the TopK heap uses
    "q107_sample_k" ->
      """WITH r AS (SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':samplek')) AS rank
        |  FROM documents)
        |SELECT source, CAST(rank AS INTEGER) AS rank, doc_id
        |FROM r WHERE rank <= 3 ORDER BY source, rank""".stripMargin,
    // identical bottom-64 md5 hex sketches (lexicographic hex == numeric
    // hash order), identical exact-below-capacity / (k-1)/u_k estimators
    // (u_k = first 13 hex chars as an exact 52-bit integer over 2^52),
    // identical merge-dedup-slice union sketch and membership ratio
    "q108_kmv_overlap" ->
      """WITH keys AS (SELECT DISTINCT source,
        |    md5(md5(text) || ':kmv') AS hex FROM documents),
        |rk AS (SELECT source, hex, row_number() OVER (PARTITION BY source
        |    ORDER BY hex) AS r FROM keys),
        |sk AS (SELECT source, list(hex ORDER BY hex) AS kmv FROM rk
        |  WHERE r <= 64 GROUP BY 1),
        |p AS (SELECT a.source AS ga, b.source AS gb, a.kmv AS ka, b.kmv AS kb
        |  FROM sk a JOIN sk b ON a.source < b.source),
        |m AS (SELECT ga, gb, ka, kb,
        |    list_slice(list_sort(list_distinct(list_concat(ka, kb))), 1, 64)
        |      AS mk
        |  FROM p),
        |est AS (SELECT ga, gb, ka, kb, mk,
        |    CASE WHEN len(ka) < 64 THEN CAST(len(ka) AS DOUBLE)
        |    ELSE 63.0 / (CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, 13),
        |        j -> CAST(strpos('0123456789abcdef', ka[64][j]) - 1
        |          AS BIGINT))),
        |      (x, y) -> x * 16 + y) AS DOUBLE) / 4503599627370496.0) END
        |      AS da,
        |    CASE WHEN len(kb) < 64 THEN CAST(len(kb) AS DOUBLE)
        |    ELSE 63.0 / (CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, 13),
        |        j -> CAST(strpos('0123456789abcdef', kb[64][j]) - 1
        |          AS BIGINT))),
        |      (x, y) -> x * 16 + y) AS DOUBLE) / 4503599627370496.0) END
        |      AS db,
        |    CASE WHEN len(mk) < 64 THEN CAST(len(mk) AS DOUBLE)
        |    ELSE 63.0 / (CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, 13),
        |        j -> CAST(strpos('0123456789abcdef', mk[64][j]) - 1
        |          AS BIGINT))),
        |      (x, y) -> x * 16 + y) AS DOUBLE) / 4503599627370496.0) END
        |      AS dm,
        |    CASE WHEN len(mk) > 0 THEN
        |      CAST(len(list_filter(mk, e -> list_contains(ka, e)
        |        AND list_contains(kb, e))) AS DOUBLE) /
        |      CAST(len(mk) AS DOUBLE) END AS rho
        |  FROM m)
        |SELECT ga, gb,
        |  round(da, 4) AS est_distinct_a, round(db, 4) AS est_distinct_b,
        |  round(rho, 4) AS est_jaccard, round(rho * dm, 4) AS est_intersect
        |FROM est ORDER BY ga, gb""".stripMargin
  )
}
