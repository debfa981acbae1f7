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
private[graft] trait OraclesPart3 { this: SparkEntry.type =>
  protected def oraclesPart3: Map[String, String] = Map(
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
        |FROM est ORDER BY ga, gb""".stripMargin,

    // q319: eight unrolled WordPiece iterations — symbol + pair counts,
    // the likelihood-score argmax as a HUGEINT cross-multiplication
    // anti-join, the same greedy merge fold as the BPE chain
    "q319_wordpiece_merges" -> wordPieceOracle(8),
    // q320: the q319 chain plus the maximal-munch serving walk (longest
    // vocab piece per position, 12 unrolled steps) and fertility masses
    "q320_wordpiece_fertility" -> wordPieceFertilityOracle(8,
      maxPieceLen = 12, maxWordLen = 12),
    // q321: the planted truth in closed form — the s=5 s-core of the
    // weighted plant is the clique (strength 5 each) plus the heavy
    // pendant (strength 5) with its anchor at 5+5=10
    "q321_score_weighted" ->
      """WITH b AS (SELECT c_custkey AS b FROM customer WHERE c_custkey % 2 = 0),
        |n AS (SELECT b * 100 + j AS node,
        |    CASE WHEN j = 1 THEN 10 ELSE 5 END AS st
        |  FROM b CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 7]) AS j) g)
        |SELECT node, CAST(st AS BIGINT) AS strength FROM n ORDER BY node""".stripMargin,
    // q322: the xy2d walk unrolled — one CTE per level, division-based
    // bit tests ((v // s) % 2 — operands stay in [0, 2^bits) because the
    // reflection uses the full grid's lim−1), the Gray-coded quadrant
    // order and rotate/reflect as CASE arms, then q281's bucket fold
    "q322_hilbert_audit" -> {
      val bits = 10
      val lim = 1L << bits
      val levels = (1 to bits).map { i =>
        val s = 1L << (bits - i)
        s"""h$i AS (SELECT x, y,
           |    d + ${s * s} * (CASE WHEN rx = 0 AND ry = 0 THEN 0
           |      WHEN rx = 0 THEN 1 WHEN ry = 1 THEN 2 ELSE 3 END) AS d,
           |    CASE WHEN ry = 1 THEN hx WHEN rx = 1 THEN ${lim - 1} - hy ELSE hy END AS hx,
           |    CASE WHEN ry = 1 THEN hy WHEN rx = 1 THEN ${lim - 1} - hx ELSE hx END AS hy
           |  FROM (SELECT x, y, d, hx, hy,
           |      (hx // $s) % 2 AS rx, (hy // $s) % 2 AS ry FROM h${i - 1}))""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT user_id % 1024 AS x,
         |    (epoch_us(ts) // 3600000000) % 1024 AS y
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |h0 AS (SELECT x, y, CAST(0 AS BIGINT) AS d, x AS hx, y AS hy FROM e),
         |$levels,
         |b AS (SELECT x, y, d // 65536 AS bucket FROM h$bits)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
         |  min(x) AS x_min, max(x) AS x_max,
         |  min(y) AS y_min, max(y) AS y_max,
         |  CAST(max(x) - min(x) + 1 AS DOUBLE) / 1024.0 AS x_span_frac,
         |  CAST(max(y) - min(y) + 1 AS DOUBLE) / 1024.0 AS y_span_frac
         |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin
    },
    // q323: q117's projection replay verbatim (same md5 sign rule, same
    // sequential fold, same /√k) lifted to a 16-element list per vector,
    // both rankings replayed with the q27 cosine chain, exact-top-10
    // flag by join
    "q323_jl_serving_eval" ->
      """WITH e AS (SELECT CAST(vec_id AS BIGINT) AS id,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (SELECT CAST(vec_id AS BIGINT) AS id,
        |    list_transform(generate_series(0, 15), k ->
        |      list_reduce(list_transform(generate_series(1, 64),
        |        j -> CAST(embedding[j] AS DOUBLE) *
        |          (CASE WHEN substr(md5(CAST(j - 1 AS VARCHAR) || ':'
        |              || CAST(k AS VARCHAR) || ':jl'), 1, 1) < '8'
        |            THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)),
        |        (a, b) -> a + b) / sqrt(CAST(16 AS DOUBLE))) AS pv
        |  FROM embeddings),
        |q AS (SELECT id AS query_id, pv AS qv FROM p WHERE id < 8),
        |pr AS (SELECT q.query_id, p.id AS neighbor_id,
        |    list_inner_product(p.pv, q.qv)
        |      / (sqrt(list_inner_product(p.pv, p.pv))
        |         * sqrt(list_inner_product(q.qv, q.qv))) AS score
        |  FROM p CROSS JOIN q),
        |pt AS (SELECT query_id, neighbor_id, score,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, neighbor_id) AS rank
        |  FROM pr),
        |eq AS (SELECT id AS query_id, v AS qv FROM e WHERE id < 8),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |    SELECT eq.query_id, e.id AS neighbor_id,
        |      row_number() OVER (PARTITION BY eq.query_id ORDER BY
        |        list_inner_product(e.v, eq.qv)
        |          / (sqrt(list_inner_product(e.v, e.v))
        |             * sqrt(list_inner_product(eq.qv, eq.qv))) DESC,
        |        e.id) AS rk
        |    FROM e CROSS JOIN eq) WHERE rk <= 10)
        |SELECT pt.query_id, CAST(pt.rank AS INTEGER) AS rank,
        |  pt.neighbor_id, pt.score,
        |  (ex.neighbor_id IS NOT NULL) AS in_exact_top10
        |FROM pt LEFT JOIN ex ON ex.query_id = pt.query_id
        |  AND ex.neighbor_id = pt.neighbor_id
        |WHERE pt.rank <= 10
        |ORDER BY pt.query_id, pt.rank""".stripMargin,
    // q324: the canonical 3-join (q175's shape) carrying summed
    // co-occurrence weights; per-corner masses w_ij + w_ih as exact
    // integer sums, the Barrat coefficient as one double division
    "q324_weighted_clustering" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |  FROM lineitem WHERE l_orderkey % 20 = 0),
        |e AS (SELECT a.sk AS u, b.sk AS v, CAST(count(*) AS BIGINT) AS w
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk GROUP BY 1, 2),
        |d AS (SELECT node, CAST(count(*) AS BIGINT) AS degree,
        |    CAST(sum(w) AS BIGINT) AS strength FROM (
        |    SELECT unnest([u, v]) AS node, w FROM e) GROUP BY node),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c,
        |    e1.w AS wab, e3.w AS wac, e2.w AS wbc
        |  FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |contrib AS (SELECT a AS node, wab + wac AS m FROM tri
        |  UNION ALL SELECT b, wab + wbc FROM tri
        |  UNION ALL SELECT c, wac + wbc FROM tri),
        |tm AS (SELECT node, CAST(sum(m) AS BIGINT) AS tri_mass
        |  FROM contrib GROUP BY node)
        |SELECT d.node, d.degree, d.strength,
        |  CAST(COALESCE(tm.tri_mass, 0) AS BIGINT) AS tri_mass,
        |  CASE WHEN d.degree < 2 THEN CAST(0.0 AS DOUBLE)
        |    ELSE CAST(COALESCE(tm.tri_mass, 0) AS DOUBLE)
        |      / CAST(d.strength * (d.degree - 1) AS DOUBLE) END
        |    AS weighted_clustering
        |FROM d LEFT JOIN tm USING (node) ORDER BY node""".stripMargin,
    // q325: identical micro-unit values and md5 arm split, the same
    // integer cross-multiplied ECDF deviation max, the same single
    // double division and fixed-order λ chain
    "q325_ks_test" ->
      """WITH u AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':ks'), 1, 1)
        |        < '8' THEN 'a' ELSE 'b' END AS arm
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |c AS (SELECT event_type, v,
        |    CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM u GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(ca) AS HUGEINT) AS na,
        |    CAST(sum(cb) AS HUGEINT) AS nb FROM c GROUP BY 1),
        |cum AS (SELECT event_type, v,
        |    CAST(sum(ca) OVER w AS HUGEINT) AS cra,
        |    CAST(sum(cb) OVER w AS HUGEINT) AS crb
        |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |d AS (SELECT cum.event_type,
        |    max(abs(cra * nb - crb * na)) AS dnum
        |  FROM cum JOIN t USING (event_type) GROUP BY 1)
        |SELECT t.event_type,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CASE WHEN na = 0 OR nb = 0 THEN NULL
        |    ELSE CAST(dnum AS DOUBLE) / CAST(na * nb AS DOUBLE) END AS ks_d,
        |  CASE WHEN na = 0 OR nb = 0 THEN NULL
        |    ELSE sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
        |        / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
        |      * (CAST(dnum AS DOUBLE) / CAST(na * nb AS DOUBLE)) END
        |    AS ks_lambda
        |FROM t JOIN d USING (event_type) ORDER BY event_type""".stripMargin,
    // q326: q195's symmetric edge convention with summed weights,
    // strengths for degrees, w-weighted HUGEINT sums through the
    // VARCHAR→DOUBLE lane, same W·Σxy − (Σx)² closed form
    "q326_weighted_assortativity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |  FROM lineitem WHERE l_orderkey % 20 = 0),
        |e AS (SELECT a.sk AS u, b.sk AS v, CAST(count(*) AS BIGINT) AS w
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk GROUP BY 1, 2),
        |st AS (SELECT node, CAST(sum(w) AS HUGEINT) AS s FROM (
        |    SELECT unnest([u, v]) AS node, w FROM e) GROUP BY node),
        |both_dir AS (SELECT u, v, w FROM e UNION ALL SELECT v, u, w FROM e),
        |p AS (SELECT CAST(b.w AS HUGEINT) AS w, su.s AS su, sv.s AS sv
        |  FROM both_dir b JOIN st su ON su.node = b.u
        |  JOIN st sv ON sv.node = b.v),
        |t AS (SELECT sum(w) AS w2,
        |    CAST(CAST(sum(w) AS VARCHAR) AS DOUBLE) AS w_d,
        |    CAST(CAST(sum(w * su) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(w * su * su) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(w * su * sv) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM p),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM st)
        |SELECT nn.n_nodes, CAST(t.w2 // 2 AS BIGINT) AS w_edges,
        |  CASE WHEN t.w2 IS NULL OR t.w2 = 0
        |      OR w_d * sxx - sx * sx = 0 THEN NULL
        |    ELSE (w_d * sxy - sx * sx) / (w_d * sxx - sx * sx)
        |  END AS assortativity
        |FROM t CROSS JOIN nn""".stripMargin,
    // q327: q215's weighted edges + 4 unrolled relaxations PER LANDMARK,
    // then q255's fold with hops swapped for exact weighted distance
    "q327_weighted_harmonic" -> {
      val lms = Seq(2, 3, 5, 8)
      val blocks = lms.map { l =>
        val rounds = (1 to 4).map { i =>
          val prev = s"d${l}_${i - 1}"
          s"""d${l}_$i AS (SELECT node, min(d) AS d FROM (
             |  SELECT node, d FROM $prev
             |  UNION ALL
             |  SELECT e.dst AS node, $prev.d + e.w AS d
             |  FROM $prev JOIN e ON e.src = $prev.node) GROUP BY node)"""
            .stripMargin
        }.mkString(",\n")
        s"""d${l}_0 AS (SELECT CAST($l AS BIGINT) AS node, CAST(0 AS BIGINT) AS d),
           |$rounds,
           |h$l AS (SELECT d, CAST(count(*) AS BIGINT) AS c FROM d${l}_4
           |  WHERE d > 0 GROUP BY 1),
           |g$l AS (SELECT list(d ORDER BY d) AS lh,
           |    list(c ORDER BY d) AS lc, sum(c) AS n FROM h$l),
           |a$l AS (SELECT CAST($l AS BIGINT) AS landmark,
           |    CAST(coalesce(n, 0) AS BIGINT) AS n_reached,
           |    CASE WHEN n IS NULL THEN CAST(0 AS DOUBLE)
           |      ELSE list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |        list_transform(generate_series(1, len(lh)),
           |          i -> CAST(lc[i] AS DOUBLE) / CAST(lh[i] AS DOUBLE))),
           |        (x, y) -> x + y) END AS harmonic_w
           |  FROM g$l)""".stripMargin
      }.mkString(",\n")
      val union = lms.map(l => s"SELECT * FROM a$l").mkString(" UNION ALL ")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
         |  FROM lineitem WHERE l_orderkey % 20 = 0),
         |raw AS (SELECT a.sk AS src, b.sk AS dst
         |  FROM li a JOIN li b ON b.ok = a.ok AND a.sk <> b.sk),
         |e AS (SELECT src, dst,
         |    CAST(min(1 + (src + dst) % 9) AS BIGINT) AS w
         |  FROM raw GROUP BY 1, 2),
         |$blocks
         |SELECT * FROM ($union) ORDER BY landmark""".stripMargin
    },
    // q328: the q270 batch interval join bucketed by attribution hour —
    // exact counts and integer-second delay sums
    "q328_chained_join_window_stream" ->
      """WITH v AS (SELECT user_id AS u, ts AS lt FROM events
        |  WHERE event_type = 'view' AND user_id IS NOT NULL
        |    AND ts IS NOT NULL),
        |p AS (SELECT user_id AS u, ts AS rt FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL
        |    AND ts IS NOT NULL),
        |j AS (SELECT p.rt,
        |    epoch_us(p.rt) // 1000000 - epoch_us(v.lt) // 1000000 AS d
        |  FROM v JOIN p ON p.u = v.u AND p.rt >= v.lt
        |    AND p.rt <= v.lt + INTERVAL 3600 SECOND)
        |SELECT date_trunc('hour', rt) AS window_start,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(d) AS BIGINT) AS delay_sum
        |FROM j GROUP BY 1 ORDER BY window_start""".stripMargin,
    // q329: the hour rollup straight off the corpus — equal to the
    // engine's two-level cascade by associativity of integer sums
    "q329_chained_window_rollup_stream" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(coalesce(CAST(value AS DECIMAL(18,6)), 0)
        |      * 1000000 AS BIGINT)) AS BIGINT) AS value_sum
        |FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
  )
}
