package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopK

/** Full-text retrieval over the corpus: BM25 (the Lucene-style positive
  * idf variant) scored entirely with DataFrame aggregates — no inverted
  * index structure to build or store; the "index" IS the term-frequency
  * table, and Catalyst's broadcast machinery plays the posting-list role.
  *
  * Scale shape: the corpus side is touched exactly twice — one tokenize +
  * `(doc, term)` aggregation (map-side combinable, checkpoint-pinned so
  * its three consumers compute it once), and one broadcast-join pass that
  * keeps ONLY rows whose term appears in some query (the query vocabulary
  * is broadcast; a non-matching corpus row never reaches an exchange).
  * Document frequency and the single-row global stats aggregate from the
  * tf table, not the raw tokens; document LENGTH aggregates from tf
  * semi-joined to the query-matched doc ids, so the dl exchange scales
  * with the match set, not the corpus. Per-query top-k uses the
  * bounded-heap [[TopK]] aggregate — O(k) state even when a query
  * matches the whole corpus.
  *
  * Cross-engine determinism: tf/df/dl/N are exact integers; avgdl is an
  * exact integer sum divided once (not a parallel double average); idf is
  * `ln(1 + (N − df + 0.5)/(df + 0.5))` whose argument space is a finite
  * set of rationals (ln agreed bitwise between the JVM and DuckDB over
  * this space — verified empirically, and the 4-decimal output round
  * absorbs a stray ulp anyway); per-(query, doc) contributions fold in
  * SORTED TERM ORDER via `aggregate(sort_array(collect_list(...)))`, so
  * the score is a fixed-order left fold, never an order-dependent
  * parallel double sum. The oracle replays the identical fold with
  * DuckDB's `list_reduce(list(... ORDER BY term))`.
  */
object Retrieval {

  /** Top-`k` corpus documents per query by BM25. Output:
    * `(qIdCol, rank, idCol, score)` — `rank` from 1, ties broken by doc
    * id, `score` rounded to 4 decimals (ranking uses the unrounded
    * value). Documents/queries with no tokens match nothing. N and avgdl
    * are computed over documents with ≥ 1 token. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qIdCol: String, qTextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKFromTf(TextAnalysis.tfTable(docs, idCol, textCol),
      idCol, queries, qIdCol, qTextCol, k, k1, b)

  /** [[bm25TopK]] over a prebuilt [[TextAnalysis.tfTable]] — the
    * shared-intermediate form (value-identical; RetrievalSpec pins it).
    * The tf table plays the posting-list role: it is the ONLY corpus-
    * derived input, so a pipeline sharing it never re-tokenizes. */
  def bm25TopKFromTf(tfTable: DataFrame, idCol: String,
                     queries: DataFrame, qIdCol: String, qTextCol: String,
                     k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(k1 > 0 && b >= 0 && b <= 1, s"BM25 params out of range: k1=$k1 b=$b")
    // (doc, term, tf) — THE reused table (the q73 lesson: the three
    // consumers below would otherwise re-tokenize the corpus three times)
    val tf = tfTable.select(col(idCol), col("term"), col("tf"))
    // global stats in ONE pass over tf — no per-doc table is retained for
    // them, so the doc-length aggregate below can be query-reduced. Exact
    // integer sum / one division — deterministic at any parallelism (a
    // parallel double `avg` would be order-dependent).
    val stats = tf.agg(countDistinct(col(idCol)).as("n_docs"), sum("tf").as("dl_sum"))
      .select(col("n_docs"),
        (col("dl_sum").cast("double") / col("n_docs").cast("double")).as("avgdl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qTerms = queries.select(col(qIdCol),
        explode(array_distinct(split(TextAnalysis.normalized(col(qTextCol)), " ")))
          .as("term"))
      .filter(col("term") =!= "")
    val qVocab = qTerms.select("term").distinct()
    // document length ONLY for documents the query vocabulary can reach:
    // semi-join tf to the matched doc ids first, so the dl aggregate (and
    // the contrib join below) carries matched docs, not the whole corpus —
    // with a selective vocabulary this is the difference between a
    // query-sized and a corpus-sized exchange. All three doc-keyed steps
    // (distinct, semi-join + aggregate, contrib join) share one
    // partitioning, and dl still sums a matched doc's FULL term list (the
    // semi-join filters docs, never a doc's terms).
    val matchedIds = tf.join(broadcast(qVocab), Seq("term"))
      .select(col(idCol)).distinct()
    val dl = tf.join(matchedIds, Seq(idCol), "left_semi")
      .groupBy(col(idCol)).agg(sum("tf").as("dl"))
    // idf only for terms some query uses: a query-vocabulary-sized table
    val idf = dfreq.join(broadcast(qVocab), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("term"),
        log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))).as("idf"),
        col("avgdl"))
    // one corpus pass: only rows whose term is in the query vocabulary
    // survive the broadcast joins; everything else dies map-side
    val contrib = tf
      .join(broadcast(qTerms), Seq("term"))
      .join(broadcast(idf), Seq("term"))
      .join(dl, Seq(idCol))
      .select(col(qIdCol), col(idCol), col("term"),
        (col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
          .as("x"))
    // fixed-order left fold over (term asc) — never a parallel double sum
    val scores = contrib.groupBy(col(qIdCol), col(idCol))
      .agg(collect_list(struct(col("term"), col("x"))).as("cl"))
      .select(col(qIdCol), col(idCol),
        aggregate(sort_array(col("cl")), lit(0.0), (a, s) => a + s.getField("x"))
          .as("score"))
    scores.groupBy(col(qIdCol))
      .agg(TopK.topK(k, col("score"), col(idCol),
        struct(col(idCol).as("doc"), col("score"))).as("top"))
      .select(col(qIdCol), posexplode(col("top")))
      .select(col(qIdCol), (col("pos") + 1).cast("int").as("rank"),
        col("col.payload.doc").as(idCol),
        round(col("col.payload.score"), 4).as("score"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09) of
    * several per-query rankings — the standard hybrid-retrieval combiner
    * (lexical BM25 + embedding cosine is the canonical pair). Each input
    * carries `(qCol, rankCol, idCol)` with rank from 1; a document's fused
    * score is `Σ_lists 1 / (k0 + rank)`, summed as a FIXED-ORDER left fold
    * over the list index (never a parallel double sum — the q93
    * determinism recipe), so the doubles are bit-identical across engines
    * and reruns. Output: `(qCol, rank, idCol, rrf_score, n_lists)` — rank
    * from 1 per query by unrounded score desc then id asc, score rounded
    * to 6 decimals, `n_lists` = how many input rankings contained the doc.
    *
    * Scale shape: the inputs are already per-query top-k tables (query-
    * sized, never corpus-sized), so the union + one grouped fold + the
    * O(k)-state [[TopK]] heap touch `Σ lists·k` rows per query total —
    * fusion cost is independent of corpus size by construction.
    *
    * Input contract (validated): `idCol` must be an integral type — the
    * [[TopK]] tie-break key is a long, and a string id has no
    * order-preserving long encoding (same constraint as [[bm25TopK]]'s
    * output side). A null or non-positive rank THROWS at execution time
    * rather than silently dropping the document. A document listed more
    * than once within one input ranking (overlapping shards, caller
    * retries) counts once, at its best (lowest) rank. */
  def rrfFuse(rankings: Seq[DataFrame], qCol: String, idCol: String,
              rankCol: String, k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0, s"k must be positive: $k")
    require(k0 >= 0, s"k0 must be non-negative: $k0")
    rankings.zipWithIndex.foreach { case (df, li) =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = df.schema(idCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"rrfFuse: id column '$idCol' of ranking $li must be integral " +
          s"(TopK tie key is long), got $dt")
    }
    // rank sanity is a row-level property — enforce it in-plan (the value
    // branch is USED, so Catalyst cannot prune the check away)
    val tagged = rankings.zipWithIndex.map { case (df, li) =>
      df.select(col(qCol), col(idCol), lit(li).as("rrf_li"),
        when(col(rankCol).cast("double") >= 1.0, col(rankCol).cast("double"))
          .otherwise(raise_error(concat(
            lit(s"rrfFuse: null or non-positive rank in ranking $li for id "),
            col(idCol).cast("string")))).as("rrf_r"))
    }.reduce(_ unionByName _)
    // within one list a doc counts once at its best rank; exact integer
    // min, so dedup happens BEFORE any double is formed
    val perList = tagged
      .groupBy(col(qCol), col(idCol), col("rrf_li"))
      .agg(min(col("rrf_r")).as("rrf_r"))
      .select(col(qCol), col(idCol), col("rrf_li"),
        (lit(1.0) / (lit(k0.toDouble) + col("rrf_r"))).as("rrf_c"))
    val fused = perList.groupBy(col(qCol), col(idCol))
      .agg(collect_list(struct(col("rrf_li"), col("rrf_c"))).as("cl"))
      .select(col(qCol), col(idCol),
        aggregate(sort_array(col("cl")), lit(0.0),
          (a, s) => a + s.getField("rrf_c")).as("rrf"),
        size(col("cl")).as("n_lists"))
    fused.groupBy(col(qCol))
      .agg(TopK.topK(k, col("rrf"), col(idCol),
        struct(col(idCol).as("id"), col("rrf"), col("n_lists"))).as("top"))
      .select(col(qCol), posexplode(col("top")))
      .select(col(qCol), (col("pos") + 1).cast("int").as("rank"),
        col("col.payload.id").as(idCol),
        round(col("col.payload.rrf"), 6).as("rrf_score"),
        col("col.payload.n_lists").as("n_lists"))
  }

  /** Rank-biased overlap at depth `k` between two per-query rankings
    * (Webber, Moffat, Zobel, "A similarity measure for indefinite
    * rankings", TOIS 2010 — the truncated prefix sum of eq. 4):
    * `RBO@k = (1−p)/p · Σ_{d=1..k} p^d · |A_:d ∩ B_:d| / d`. The graded
    * companion of [[Similarity.recallAtK]]: recall ignores order inside
    * the cut, RBO weights agreement toward the top with persistence `p`.
    *
    * Determinism: overlap sizes are exact integers (`X_d` counts docs
    * whose max(rank_A, rank_B) ≤ d); the powers `p, p², …` are computed
    * ONCE by repeated multiplication at plan-build time and planted as
    * shared literals into both the Spark plan and the q146 oracle text,
    * so every term — `(p^d · X_d) / d`, folded in depth order — is
    * bit-identical cross-engine with NO rounding anywhere.
    *
    * Scale shape: inputs are per-query top-k tables; the join, the
    * k-depth spine and the fold all touch O(k²) rows per query —
    * corpus-independent, like [[rrfFuse]].
    *
    * Output: `(qCol, rbo)`, one row per query appearing in EITHER
    * ranking (zero overlap → 0.0, never a dropped query). Rows with
    * rank outside 1..k are ignored. */
  def rboAtK(a: DataFrame, b: DataFrame, qCol: String, idCol: String,
             rankCol: String, k: Int, p: Double = 0.9): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(p > 0.0 && p < 1.0, s"p ($p) must be in (0, 1)")
    val pows = (1 to k).scanLeft(1.0)((acc, _) => acc * p).tail
    def side(df: DataFrame, rname: String) = df
      .select(col(qCol).as("_q"), col(idCol).as("_id"),
        col(rankCol).cast("long").as(rname))
      .filter(col(rname) >= 1L && col(rname) <= k)
    val m = side(a, "_ra").join(side(b, "_rb"), Seq("_q", "_id"))
      .select(col("_q"), greatest(col("_ra"), col("_rb")).as("_m"))
    val queries = a.select(col(qCol).as("_q"))
      .unionByName(b.select(col(qCol).as("_q"))).distinct()
    val spine = queries.select(col("_q"),
      explode(array((1 to k).map(d => lit(d.toLong)): _*)).as("_d"))
    val powArr = array(pows.map(lit): _*)
    val xd = spine.join(m, Seq("_q"), "left")
      .groupBy("_q", "_d")
      .agg(sum(when(col("_m") <= col("_d"), 1L).otherwise(0L)).as("_x"))
    xd.withColumn("_t",
        element_at(powArr, col("_d").cast("int")) * col("_x").cast("double")
          / col("_d").cast("double"))
      .groupBy("_q")
      .agg((aggregate(
          sort_array(collect_list(struct(col("_d"), col("_t")))),
          lit(0.0), (acc, s) => acc + s("_t")) *
        lit((1.0 - p) / p)).as("rbo"))
      .select(col("_q").as(qCol), col("rbo"))
  }

  /** The shared power/scale literals of [[rboAtK]], exposed so the q146
    * oracle text is generated from the SAME doubles the plan plants
    * (the q131 shared-constants convention). */
  private[graft] def rboLiterals(k: Int, p: Double): (Seq[Double], Double) =
    ((1 to k).scanLeft(1.0)((acc, _) => acc * p).tail, (1.0 - p) / p)

  /** nDCG@k ranking-quality evaluation (Järvelin & Kekäläinen TOIS'02,
    * linear gain): per query, `DCG = Σ_{i≤k} rel(doc@i) / log₂(i+1)`
    * against `rels`' graded judgments, normalized by the ideal DCG of
    * that query's top-k grades. One row per judged query:
    * `(qCol, dcg, idcg, ndcg)`; queries with no positive judgment are
    * absent (nothing to normalize by), ranked docs without a judgment
    * gain 0, judged docs outside the top-k contribute only to the ideal.
    *
    * Determinism: the k discount doubles `1/log₂(i+1)` are computed ONCE
    * at plan build and planted as literals in plan and oracle
    * ([[rboAtK]]'s convention — engine `log` need not be correctly
    * rounded, so it never runs per-row); each query's DCG and IDCG fold
    * their ≤ k terms in a SORTED fixed order. Grade ties in the ideal
    * ordering cannot change IDCG (equal grades swap equal terms), so no
    * cross-engine tie contract is needed there.
    *
    * Scale shape: the DCG join is rank-filtered to k rows per query
    * before it shuffles; the ideal side is the O(k)-state [[TopK]] heap
    * (never a per-query sort of the full judgment set); both folds run
    * over ≤ k-element arrays. */
  def ndcgAtK(ranked: DataFrame, qCol: String, idCol: String,
              rankCol: String, rels: DataFrame, relCol: String,
              k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val discs = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    val discArr = array(discs.map(lit): _*)
    val r = ranked.select(col(qCol).as("_q"), col(idCol).as("_id"),
        col(rankCol).cast("long").as("_rk"))
      .filter(col("_rk") >= 1L && col("_rk") <= k)
    val rl = rels.select(col(qCol).as("_q"), col(idCol).as("_id"),
        col(relCol).cast("double").as("_rel"))
      .filter(col("_rel").isNotNull && col("_rel") > 0.0)
    val dcg = r.join(rl, Seq("_q", "_id"))
      .select(col("_q"), struct(col("_rk"),
        (col("_rel") * element_at(discArr, col("_rk").cast("int"))).as("_t"))
        .as("_s"))
      .groupBy("_q")
      .agg(aggregate(sort_array(collect_list(col("_s"))), lit(0.0),
        (acc, s) => acc + s("_t")).as("dcg"))
    val ideal = rl
      .groupBy("_q")
      .agg(TopK.topK(k, col("_rel"), xxhash64(col("_id").cast("string")),
        col("_rel")).as("_t"))
      .select(col("_q"), aggregate(
        zip_with(col("_t"), slice(discArr, lit(1), size(col("_t"))),
          (s, d) => s("payload") * d),
        lit(0.0), (acc, t) => acc + t).as("idcg"))
    ideal.join(dcg, Seq("_q"), "left")
      .select(col("_q").as(qCol), coalesce(col("dcg"), lit(0.0)).as("dcg"),
        col("idcg"),
        (coalesce(col("dcg"), lit(0.0)) / col("idcg")).as("ndcg"))
  }

  /** The discount literals of [[ndcgAtK]], exposed so the q179 oracle
    * text carries the SAME doubles the plan plants. */
  private[graft] def ndcgLiterals(k: Int): Seq[Double] =
    (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  /** Average precision at `k` per query (the MAP building block —
    * TREC's binary-relevance ranking metric; nDCG's graded cousin is
    * [[ndcgAtK]]): `AP@k = (Σ_{hits} TP_i / rank_i) / min(R, k)`,
    * where the sum runs over relevant retrieved results in rank order,
    * `TP_i` counts relevant results at or above rank i, and R is the
    * query's total relevant count. Relevance is binary: any
    * `relCol > 0` judgment counts (graded inputs collapse — use nDCG
    * when grades matter). Queries with judgments but no hits score
    * 0.0; queries with no judgments are absent (AP undefined).
    *
    * Determinism: `TP_i` is the hit's 1-based position in the
    * rank-sorted hit list — exact integers; each `TP_i/rank_i` is one
    * double division, folded in rank order (never an unordered sum);
    * the normalizer `min(R, k)` is exact. Engine-replayable via
    * `row_number` + ordered `list_reduce`.
    *
    * Scale shape: the ranked list is pre-cut to k per query, so the
    * judgment join and the per-query fold are k-bounded; R aggregates
    * the judgment table once, map-side combined. Output:
    * `(qCol, n_rel, n_hits, ap)`. */
  def averagePrecisionAtK(ranked: DataFrame, qCol: String, idCol: String,
                          rankCol: String, rels: DataFrame, relCol: String,
                          k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val r = ranked.select(col(qCol).as("_q"), col(idCol).as("_id"),
        col(rankCol).cast("long").as("_rk"))
      .filter(col("_rk") >= 1L && col("_rk") <= k)
    val rl = rels.select(col(qCol).as("_q"), col(idCol).as("_id"))
      .where(col(relCol).cast("double") > 0.0)
      .distinct()
    val hits = r.join(rl, Seq("_q", "_id"))
      .groupBy("_q")
      .agg(count(lit(1)).as("n_hits"),
        sort_array(collect_list(col("_rk"))).as("_rks"))
      .select(col("_q"), col("n_hits"),
        aggregate(
          zip_with(sequence(lit(1), size(col("_rks"))), col("_rks"),
            (i, rk) => i.cast("double") / rk.cast("double")),
          lit(0.0), (acc, t) => acc + t).as("_apsum"))
    val nRel = rl.groupBy("_q").agg(count(lit(1)).as("n_rel"))
    nRel.join(hits, Seq("_q"), "left")
      .select(col("_q").as(qCol), col("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("_apsum"), lit(0.0)) /
          least(col("n_rel"), lit(k.toLong)).cast("double")).as("ap"))
  }

  /** Reciprocal rank at `k` per query (the MRR building block — the
    * navigational-search metric; [[averagePrecisionAtK]] weighs EVERY
    * hit, RR only the first): `rr = 1 / rank of the first relevant
    * retrieved result`, 0.0 when a judged query retrieves no relevant
    * result in the top k; queries with no judgments are absent (RR
    * undefined). Relevance is binary (`relCol > 0`), the
    * [[averagePrecisionAtK]] convention.
    *
    * Determinism: `first_rank` is an exact integer min; `rr` is ONE
    * double division. Scale shape: the ranked list is pre-cut to k per
    * query so the judgment join is k-bounded; both aggregations are
    * map-side combinable. Output: `(qCol, n_rel, first_rank, rr)` —
    * `first_rank` NULL on miss, `rr` 0.0 (never silently dropped). */
  def reciprocalRankAtK(ranked: DataFrame, qCol: String, idCol: String,
                        rankCol: String, rels: DataFrame, relCol: String,
                        k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val r = ranked.select(col(qCol).as("_q"), col(idCol).as("_id"),
        col(rankCol).cast("long").as("_rk"))
      .filter(col("_rk") >= 1L && col("_rk") <= k)
    val rl = rels.select(col(qCol).as("_q"), col(idCol).as("_id"))
      .where(col(relCol).cast("double") > 0.0)
      .distinct()
    val hits = r.join(rl, Seq("_q", "_id"))
      .groupBy("_q").agg(min(col("_rk")).as("first_rank"))
    val nRel = rl.groupBy("_q").agg(count(lit(1)).as("n_rel"))
    nRel.join(hits, Seq("_q"), "left")
      .select(col("_q").as(qCol), col("n_rel"), col("first_rank"),
        when(col("first_rank").isNotNull,
          lit(1.0) / col("first_rank").cast("double"))
          .otherwise(lit(0.0)).as("rr"))
  }

  /** Maximal Marginal Relevance top-k (Carbonell & Goldstein SIGIR'98) —
    * diversity-aware selection over an embedding corpus: greedily pick
    *
    *   argmax_d  λ·rel(d) − (1−λ)·max_{s ∈ selected} sim(d, s)
    *
    * so each pick is relevant to the query but NOT redundant with what's
    * already chosen — the training-data use is assembling a k-shot /
    * retrieval context that covers the neighborhood instead of returning
    * k near-duplicates of the same hit.
    *
    * This is the PER-QUERY retrieval form of the family;
    * [[Coreset.mmrSelect]] is the corpus-subset form (one global pick
    * sequence, driver-held selected set, inner-product sim). Here
    * relevance IS the query cosine, many queries batch through one plan,
    * and the greedy loop stays entirely in Spark over per-query
    * shortlists.
    *
    * Two stages: (1) an exact [[Similarity.bruteForceTopK]] relevance
    * shortlist of `shortlistN` per query — the corpus-scale pass; (2) the
    * greedy MMR loop over the shortlist — `queries × shortlistN`-bounded
    * tables through k all-Spark rounds (anti-join the picked, max-sim
    * join against the picked, argmax-as-aggregate `min(struct(-mmr,
    * id))`), each round checkpointed so lineage stays k-bounded. Nothing
    * is collected; every per-round table is `queries × shortlistN` rows
    * (the query count is the caller's scale knob).
    *
    * Determinism: rel and sim are VecDot cosines (bit-identical
    * left-to-right folds, the q27 contract); every round scores with the
    * SAME IEEE shape `λ·rel − (1−λ)·coalesce(maxsim, 0.0)` (round 1's
    * empty-set max coalesces to 0.0, and `x − c·0.0 ≡ x` exactly), so an
    * oracle replays round-for-round; ties break to the smaller id.
    * `lambda` must be exactly representable (0.5 default) — both engines
    * then fold the identical literal. A query whose shortlist has fewer
    * than k rows just stops early (picks 1..n).
    *
    * Output: `(query_id, pick, doc_id, rel, mmr)`, pick = 1..k in
    * selection order. */
  def mmrSelect(corpus: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, k: Int = 8, shortlistN: Int = 32,
                lambda: Double = 0.5): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    require(shortlistN >= k, s"shortlistN ($shortlistN) must be >= k ($k)")
    require(lambda > 0.0 && lambda <= 1.0,
      s"lambda ($lambda) must be in (0, 1]")
    val reserved = Seq("_id", "_rel", "_v", "_va", "_vb", "_na", "_nb",
      "_a", "_b", "_sim", "_mmr", "_ms", "_bst")
    require(!corpus.columns.exists(reserved.contains) &&
      !queries.columns.exists(reserved.contains),
      s"inputs must not contain reserved columns ${reserved.mkString("/")}")
    import graft.functions.VectorFunctions.{dot, l2Norm}
    val sl = Similarity.bruteForceTopK(corpus, idCol, vecCol, queries,
        shortlistN)
      .select(col("query_id"), col("neighbor_id").as("_id"),
        col("score").as("_rel"))
      .join(corpus.select(col(idCol).as("_id"), col(vecCol).as("_v")), Seq("_id"))
      .localCheckpoint(false)
    val aSide = sl.select(col("query_id"), col("_id").as("_a"),
      col("_v").as("_va"), l2Norm(col("_v")).as("_na"))
    val bSide = sl.select(col("query_id"), col("_id").as("_b"),
      col("_v").as("_vb"), l2Norm(col("_v")).as("_nb"))
    val simm = aSide.join(bSide, Seq("query_id"))
      .filter(col("_a") =!= col("_b"))
      .select(col("query_id"), col("_a"), col("_b"),
        (dot(col("_va"), col("_vb")) / (col("_na") * col("_nb"))).as("_sim"))
      .localCheckpoint(false)
    val cands = sl.select(col("query_id"), col("_id"), col("_rel"))
    val lam = lit(lambda)
    val oneMinus = lit(1.0 - lambda)
    def argmax(scored: DataFrame, pick: Int): DataFrame =
      scored.groupBy("query_id")
        .agg(min(struct((-col("_mmr")).as("_n"), col("_id").as("_i"),
          col("_rel").as("_r"))).as("_bst"))
        .select(col("query_id"), lit(pick).as("pick"),
          col("_bst._i").as("doc_id"), col("_bst._r").as("rel"),
          (-col("_bst._n")).as("mmr"))
    val first = cands
      .select(col("query_id"), col("_id"), col("_rel"),
        (lam * col("_rel") - oneMinus * lit(0.0)).as("_mmr"))
    var selected = argmax(first, 1).localCheckpoint(false)
    var r = 2
    while (r <= k) {
      val remaining = cands.join(selected.select(col("query_id"),
        col("doc_id").as("_id")), Seq("query_id", "_id"), "left_anti")
      val ms = simm.join(selected.select(col("query_id"),
          col("doc_id").as("_b")), Seq("query_id", "_b"))
        .groupBy(col("query_id"), col("_a"))
        .agg(max(col("_sim")).as("_ms"))
        .select(col("query_id"), col("_a").as("_id"), col("_ms"))
      val scored = remaining.join(ms, Seq("query_id", "_id"), "left")
        .select(col("query_id"), col("_id"), col("_rel"),
          (lam * col("_rel") -
            oneMinus * coalesce(col("_ms"), lit(0.0))).as("_mmr"))
      selected = selected.unionByName(argmax(scored, r)).localCheckpoint(false)
      r += 1
    }
    selected.select(col("query_id"), col("pick"), col("doc_id"),
      col("rel"), col("mmr"))
  }
}
