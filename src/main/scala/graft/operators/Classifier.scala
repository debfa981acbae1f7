package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed linear text classification — the quality-filter family of public
  * curation pipelines (fastText-style linear model over hashed bag-of-words
  * features, Joulin et al. 2016; applied as the wiki-vs-crawl quality filter
  * by CCNet, Wenzek et al. 2020, and the GPT-3 data work, Brown et al. 2020
  * App. A). Training fits multinomial Naive-Bayes log-odds per feature
  * bucket; scoring sums `tf · llr` over a document's bucketed tokens.
  *
  * The feature space is the hashing trick: token → first 4 hex chars of
  * `md5(token:domain)` — 65536 buckets ([[NbBuckets]]), so the model is a
  * BOUNDED table regardless of corpus vocabulary, every engine derives the
  * identical bucket for a token, and the bucket id's fixed-width hex form
  * doubles as the deterministic fold order for scoring.
  *
  * Determinism contract (cross-engine bit-identity of every score):
  * training counts are exact integers; each log-likelihood-ratio is
  * `ln((c⁺+1)/(T⁺+B)) − ln((c⁻+1)/(T⁻+B))` over exactly-representable
  * rational arguments, rounded to 6 decimals (absorbs any last-ulp `ln`
  * divergence between libm implementations); a document's score folds
  * `tf·llr` in bucket-id order from an exact 0.0 init — the oracle
  * replays the identical sequence via
  * `list_reduce(list(llr ORDER BY feature))` — and rounds to 4 decimals.
  * BOTH roundings are the explicit `floor(x·10ⁿ + 0.5)/10ⁿ` — pure IEEE
  * multiply/add/floor/divide every engine computes identically — NOT the
  * engine's `round()`: library round disagrees across engines exactly at
  * representable-tie boundaries (Spark's shortest-decimal BigDecimal
  * HALF_UP vs DuckDB's binary scaling saw −2.78325 as −2.7833 vs −2.7832
  * on the sf1.0 sweep — a real divergence, not a hypothetical).
  *
  * Scale shape for 100 TB: the model is ≤ [[NbBuckets]] rows — it
  * BROADCASTS, so scoring is tokenize (map) → hash-join against the
  * broadcast model (map) → one corpus-scale aggregation keyed by the doc
  * id. Training touches only the labeled seed set (quality seeds are
  * curated corpora, orders of magnitude smaller than the scored corpus)
  * with one bucket-keyed aggregation into the bounded model table. Unseen
  * buckets contribute 0 at scoring time — the hashed-linear-model
  * convention (absent weight = 0); fold a class prior in as a caller-side
  * constant offset if needed.
  */
object Classifier {

  /** Feature-space size: 4 hex chars = 16 bits. Fixed, because the bucket
    * id IS the hash prefix — a different size would need a different
    * prefix length, and 65536 weights is the published fastText default
    * order of magnitude for small models. */
  val NbBuckets: Int = 65536

  /** Token → feature bucket: first 4 hex chars of md5(token:domain).
    * Domain separation keeps classifier buckets independent of every other
    * md5-derived decision in the pipeline (the [[Sampling]] contract). */
  private def bucket(term: Column, domain: String): Column =
    substring(md5(concat(term, lit(":" + domain))), 1, 4)

  private def tokens(text: Column): Column =
    split(TextAnalysis.normalized(text), " ")

  /** Rounding as explicit IEEE ops — see [[graft.functions.ExactRound]]
    * (the divergence that motivated it was found in THIS operator's
    * sf1.0 sweep). */
  private def roundFloor(x: Column, digits: Int): Column =
    graft.functions.ExactRound.roundFloor(x, digits)

  /** Fits per-bucket NB log-odds from a labeled seed set: `labelCol`
    * (boolean; true = positive/quality class) over `textCol`. Returns the
    * model as a `(feature STRING, llr DOUBLE)` table — ≤ [[NbBuckets]]
    * rows, covering buckets that occur in the seed set.
    *
    * Both classes must contribute at least one token; a one-class seed set
    * yields llr values from zero counts on the missing side (finite —
    * Laplace-smoothed — but meaningless for ranking).
    *
    * Plan shape: tokenize (map) → ONE bucket-keyed aggregation (bounded at
    * [[NbBuckets]] groups, map-side combinable) → a one-row totals
    * cross-join. Seed-set-scale work only. */
  def nbTrain(labeled: DataFrame, textCol: String, labelCol: String,
              domain: String = "nbf"): DataFrame = {
    val toks = labeled.select(col(labelCol).cast("boolean").as("_y"),
        explode(tokens(col(textCol))).as("_t"))
      .filter(col("_t") =!= "")
    val counts = toks
      .groupBy(bucket(col("_t"), domain).as("feature"))
      .agg(sum(when(col("_y"), 1L).otherwise(0L)).as("_cp"),
        sum(when(col("_y"), 0L).otherwise(1L)).as("_cn"))
    val totals = counts.agg(sum("_cp").as("_tp"), sum("_cn").as("_tn"))
    counts.crossJoin(broadcast(totals))
      .select(col("feature"),
        roundFloor(
          log((col("_cp") + 1L).cast("double") /
              (col("_tp") + lit(NbBuckets.toLong)).cast("double")) -
          log((col("_cn") + 1L).cast("double") /
              (col("_tn") + lit(NbBuckets.toLong)).cast("double")),
          6).as("llr"))
  }

  /** Scores every document against a [[nbTrain]] model: `(idCol,
    * score DOUBLE, predicted BOOLEAN)`, `score` the bucket-id-ordered fold
    * of `llr` over the document's bucketed tokens (each token occurrence
    * contributes its bucket's weight once — tf weighting by construction),
    * rounded to 4 decimals; `predicted = score > 0`. Documents with no
    * in-model tokens score exactly 0.0 and predict false.
    *
    * `model` must have (feature, llr) columns; pass a different `domain`
    * only if training used it too — bucket derivation must match.
    *
    * Plan shape: tokenize + bucket (map) → broadcast hash join against the
    * bounded model (map; out-of-model tokens die here) → ONE doc-keyed
    * aggregation carrying the per-doc fold — the only corpus-scale
    * exchange — then a left join against the id spine to restore
    * zero-score documents. */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
              model: DataFrame, domain: String = "nbf"): DataFrame = {
    require(model.columns.contains("feature") && model.columns.contains("llr"),
      s"model must have (feature, llr) columns, got ${model.columns.mkString(",")}")
    require(!docs.columns.exists(Set("_t", "_x", "feature", "llr")),
      "input must not contain the reserved columns _t/_x/feature/llr")
    val contrib = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("_t"))
      .filter(col("_t") =!= "")
      .select(col(idCol), bucket(col("_t"), domain).as("feature"))
      .join(broadcast(model), Seq("feature"))
      .groupBy(idCol)
      .agg(roundFloor(
        aggregate(
          sort_array(collect_list(struct(col("feature"), col("llr").as("_x")))),
          lit(0.0), (a, s) => a + s("_x")),
        4).as("score"))
    docs.select(col(idCol))
      .join(contrib, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("score"), lit(0.0)).as("score"),
        (coalesce(col("score"), lit(0.0)) > 0.0).as("predicted"))
  }

  /** Multi-CLASS multinomial Naive Bayes over the same hashed feature
    * space — the generative companion to [[nbTrain]]'s binary log-odds
    * (McCallum & Nigam 1998's multinomial event model): one smoothed
    * log-probability table per (label, bucket) plus a log-prior per
    * label, so scoring is `argmax_c [ln P(c) + Σ_b tf_b·ln P(b|c)]`.
    * The curation use is K-way routing (language, domain, register)
    * where the binary quality filter doesn't fit.
    *
    * Returns the model as `(label, feature, c, tot_c, label_docs, lp,
    * prior)` — ≤ [[NbBuckets]]·|labels| rows: `lp = ln((c+1)/(tot_c+B))`
    * and `prior = ln(label_docs/n_docs)`, both [[roundFloor]]ed to 6
    * decimals (the [[nbTrain]] ln-seam contract). Only docs with ≥ 1
    * token train; a label whose docs are all token-less vanishes from
    * the model (nothing to score it with) and from the prior normalizer.
    *
    * Plan shape: tokenize (map) → ONE (label, bucket) aggregation
    * (bounded groups, map-side combinable) → label-sized totals/prior
    * joins + a one-row normalizer cross-join. */
  def nbMulticlassTrain(labeled: DataFrame, textCol: String,
                        labelCol: String,
                        domain: String = "nbmc"): DataFrame = {
    val docs = labeled.filter(col(labelCol).isNotNull)
      .select(col(labelCol).cast("string").as("label"),
        filter(tokens(col(textCol)), t => t =!= "").as("_tk"))
      .filter(size(col("_tk")) >= 1)
    val counts = docs.select(col("label"), explode(col("_tk")).as("_t"))
      .groupBy(col("label"), bucket(col("_t"), domain).as("feature"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("label").agg(sum("c").as("tot_c"))
    val priors = docs.groupBy("label").agg(count(lit(1)).as("label_docs"))
    val nd = priors.agg(sum("label_docs").as("_nd"))
    counts.join(totals, Seq("label")).join(priors, Seq("label"))
      .crossJoin(broadcast(nd))
      .select(col("label"), col("feature"), col("c"), col("tot_c"),
        col("label_docs"),
        roundFloor(log((col("c") + 1L).cast("double") /
          (col("tot_c") + lit(NbBuckets.toLong)).cast("double")), 6).as("lp"),
        roundFloor(log(col("label_docs").cast("double") /
          col("_nd").cast("double")), 6).as("prior"))
  }

  /** Scores documents against a [[nbMulticlassTrain]] model:
    * `(idCol, label_hat, score, margin)` — `label_hat` the argmax class
    * (ties to the smaller label), `score` its log-posterior up to the
    * shared evidence constant, `margin = score − runner_up_score` (0.0
    * when the model has one label), both [[roundFloor]]ed to 4 decimals.
    * Buckets a class never saw contribute its 6dp-rounded
    * `ln(1/(tot_c+B))`; tokens are tf-aggregated per bucket first, so
    * each per-class score folds `tf·lp` in bucket-id order from 0.0 —
    * a total order both engines replay. Documents with no tokens are
    * absent (no evidence to score; the caller's spine join restores
    * them as prior-argmax if needed).
    *
    * Scale shape: one (doc, bucket) tf aggregation; the |labels|-row
    * class table broadcast-crosses the tf stream (C× fan-out — C is
    * single digits by contract); one counted-broadcast model join; one
    * (doc, label) fold; one doc-keyed argmax aggregation. No windows. */
  def nbMulticlassScore(docs: DataFrame, idCol: String, textCol: String,
                        model: DataFrame, domain: String = "nbmc",
                        maxBroadcastRows: Long = 50000000L): DataFrame = {
    val need = Seq("label", "feature", "tot_c", "lp", "prior")
    require(need.forall(model.columns.contains),
      s"model must have ${need.mkString("/")} columns, got " +
        model.columns.mkString(","))
    require(!docs.columns.exists(Set("_t", "_tf", "_ll", "_pr", "_tc",
      "_cl", "_s", "_score", "feature", "label", "lp")),
      "input must not contain the reserved columns _t/_tf/_ll/_pr/_tc/" +
        "_cl/_s/_score/feature/label/lp")
    val gate = Gates.countedBroadcast(model, maxBroadcastRows)
    require(gate.rows > 0,
      "the NB model is empty (was the seed set empty or token-less?)")
    val m = gate.pinned
    val classes = m.groupBy("label")
      .agg(max("tot_c").as("_tc"), max("prior").as("_pr"))
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("_t"))
      .filter(col("_t") =!= "")
      .select(col(idCol), bucket(col("_t"), domain).as("feature"))
      .groupBy(col(idCol), col("feature")).agg(count(lit(1)).as("_tf"))
    val ll = tf.crossJoin(broadcast(classes))
      .join(gate.of(m.select(col("label"), col("feature"), col("lp"))),
        Seq("label", "feature"), "left")
      .select(col(idCol), col("label"), col("feature"), col("_pr"),
        (col("_tf").cast("double") * coalesce(col("lp"),
          roundFloor(log(lit(1.0) /
            (col("_tc") + lit(NbBuckets.toLong)).cast("double")), 6)))
          .as("_ll"))
    val scored = ll.groupBy(col(idCol), col("label"))
      .agg(max(col("_pr")).as("_pr"),
        collect_list(struct(col("feature"), col("_ll").as("_x"))).as("_cl"))
      .select(col(idCol), col("label"),
        (col("_pr") + aggregate(sort_array(col("_cl")), lit(0.0),
          (a, s) => a + s("_x"))).as("_score"))
    scored.groupBy(col(idCol))
      .agg(sort_array(collect_list(
        struct((-col("_score")).as("_n"), col("label").as("_l")))).as("_s"))
      .select(col(idCol),
        col("_s")(0)("_l").as("label_hat"),
        roundFloor(-col("_s")(0)("_n"), 4).as("score"),
        roundFloor(when(size(col("_s")) > 1,
          col("_s")(1)("_n") - col("_s")(0)("_n")).otherwise(lit(0.0)), 4)
          .as("margin"))
  }

  /** Platt scaling (Platt, "Probabilistic Outputs for Support Vector
    * Machines…", 1999) — fit `p = σ(A·s + B)` to (score, label) by
    * Newton's method, the third calibrator next to [[calibrationBins]]
    * and [[isotonicCalibrate]] and the standard way a raw [[nbScore]] /
    * SVM margin becomes a probability.
    *
    * Determinism is the [[Graph.pageRank]] integer fixed-point recipe
    * applied to an optimizer: (A, B) live in 1e-9 units; scores ride
    * the validated decimal(18,6) micro-unit seam; each iteration's
    * per-row sigmoid is ONE fixed IEEE shape
    * (`1/(1+exp(−t_e9/1e9))`) immediately re-quantized to e9 by
    * `floor(p·1e9 + 0.5)` — probed empirically: over 2M e9-quantized t
    * values the raw doubles differ from DuckDB's libm in the last ulp
    * 4.3% of the time, but the floor seam agreed on ALL 2M at both 6
    * and 9 digits — so every gradient/Hessian term is an exact
    * integer, summed exactly (decimal(38,0) ≡ HUGEINT), mean-normalized
    * and Newton-solved in integer arithmetic (BigInt on the driver, the
    * identical `//` chain in the oracle; both truncate toward zero).
    * Platt's smoothed targets `(N₊+1)/(N₊+2)`, `1/(N₋+2)` are exact
    * integer divisions; the init `B₀ = ln((N₋+1)/(N₊+1))` is one 9dp
    * floor-rounded ln.
    *
    * The per-iteration reduction collects ONE 5-value row (the pageRank
    * dangling-mass precedent); everything row-scale stays in Spark.
    * |score| must be ≤ 1000 (counted, loud) so every scaled product
    * fits decimal(38,0)/HUGEINT. A singular/indefinite Hessian stops
    * the ascent and repeats the last state rather than dividing by
    * zero.
    *
    * Output: `(iter, a_e9, b_e9)` for iter = 0..iters — the whole
    * optimization trajectory, so the gate verifies every Newton step,
    * not just a fixed point. Apply as `σ(a_e9·s/1e9 + b_e9/1e9)`. */
  def plattScale(df: DataFrame, scoreCol: String, labelCol: String,
                 iters: Int = 4): DataFrame = {
    require(iters >= 1, s"iters ($iters) must be >= 1")
    val spark = df.sparkSession
    val rows = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select((col(scoreCol).cast("decimal(18,6)") * 1000000L)
        .cast("long").as("_su"), col(labelCol).cast("boolean").as("_y"))
      .localCheckpoint(false)
    val stats = rows.agg(
      sum(when(col("_y"), 1L).otherwise(0L)).as("np"),
      sum(when(col("_y"), 0L).otherwise(1L)).as("nn"),
      max(abs(col("_su"))).as("smax")).collect()(0)
    val nPos = stats.getLong(0); val nNeg = stats.getLong(1)
    val n = nPos + nNeg
    require(nPos > 0 && nNeg > 0,
      s"both classes must be present (got $nPos positive / $nNeg negative)")
    require(stats.getLong(2) <= 1000000000L,
      s"|score| must be <= 1000 (got ${stats.getLong(2) / 1e6}) so the " +
        "e9-scaled Newton products stay inside decimal(38,0)")
    val E9 = 1000000000L
    val yPos = (nPos + 1L) * E9 / (nPos + 2L) // exact: dividend < 2^63
    val yNeg = E9 / (nNeg + 2L)
    var a = BigInt(0)
    var b = BigInt(math.floor(
      math.log((nNeg + 1.0) / (nPos + 1.0)) * 1e9 + 0.5).toLong)
    val traj = Seq.newBuilder[(Int, Long, Long)]
    traj += ((0, a.toLong, b.toLong))
    var stopped = false
    for (it <- 1 to iters) {
      if (stopped) traj += ((it, a.toLong, b.toLong))
      else {
        val t = (expr(s"CAST(${a.toLong} AS DECIMAL(38,0)) * _su" +
          s" DIV 1000000 + ${b.toLong}")).cast("double") / lit(1.0e9)
        val p = lit(1.0) / (lit(1.0) + exp(-t))
        val scored = rows.select(
          col("_su"),
          floor(p * lit(1.0e9) + lit(0.5)).as("_pe9"),
          when(col("_y"), lit(yPos)).otherwise(lit(yNeg)).as("_ye9"))
          .select(col("_su"),
            (col("_pe9") - col("_ye9")).as("_d"),
            expr("(_pe9 * (1000000000 - _pe9)) DIV 1000000000").as("_w"))
        val g = scored.agg(
          sum((col("_d").cast("decimal(38,0)") * col("_su")).cast(
            "decimal(38,0)")).as("ga"),
          sum(col("_d").cast("decimal(38,0)")).as("gb"),
          sum((col("_w").cast("decimal(38,0)") * col("_su") * col("_su"))
            .cast("decimal(38,0)")).as("haa"),
          sum((col("_w").cast("decimal(38,0)") * col("_su")).cast(
            "decimal(38,0)")).as("hab"),
          sum(col("_w").cast("decimal(38,0)")).as("hbb")).collect()(0)
        def big(i: Int): BigInt =
          BigInt(g.getDecimal(i).toBigInteger)
        val bn = BigInt(n)
        // mean-normalize (exact truncating division, both engines)
        val gaM = big(0) / bn; val gbM = big(1) / bn
        val haaM = big(2) / bn; val habM = big(3) / bn; val hbbM = big(4) / bn
        val det = haaM * hbbM - habM * habM
        val detA = det / BigInt("1000000000000000") // ΔA: e24 num / e15
        val detB = det / BigInt(E9)                 // ΔB: e30 num / e21
        if (det <= 0 || detA == 0 || detB == 0) stopped = true
        else {
          a -= (hbbM * gaM - habM * gbM) / detA
          b -= (haaM * gbM - habM * gaM) / detB
        }
        traj += ((it, a.toLong, b.toLong))
      }
    }
    import spark.implicits._
    traj.result().toDF("iter", "a_e9", "b_e9")
  }

  /** Nearest-centroid (Rocchio) classification over an embedding column —
    * the IR-textbook centroid classifier (Manning, Raghavan & Schütze,
    * "Introduction to Information Retrieval" §14.2) applied the way
    * embedding-based curation pipelines label crawl slices: train one
    * mean vector per label, assign every vector to its highest-cosine
    * centroid. Returns one row per input vector:
    * `(idCol, label, predicted BIGINT, score, runner_up BIGINT, margin)`
    * where `score` is cosine to the winning centroid, `runner_up` the
    * second-best label and `margin = score − runner_up_score` (the
    * active-learning uncertainty signal; NULL when only one label
    * exists). Ties break to the smaller label, both places.
    *
    * Determinism contract: centroids are [[Similarity.centroids]]'
    * integer-quantized exact means (parallel aggregation order
    * invisible); every cosine is `dot / (sqrt(vn2) · sqrt(cn2))` with
    * dot/norms computed by [[graft.functions.VecDot]]'s fixed
    * ascending-index loop — the same pure-IEEE expression tree the
    * oracle restates via `list_inner_product`, so scores and margins
    * are bit-identical with no rounding anywhere. A zero-norm vector
    * (or centroid) scores exactly 0.0 against everything rather than
    * NaN.
    *
    * Scale shape for 100 TB: the model is labels × dims doubles — it
    * always broadcasts (one packed single-row array, same idiom as
    * IvfIndex cell assignment), so classification is ONE narrow map
    * stage over the corpus: no shuffle, no per-row join, fuses with the
    * scan. Training aggregates (label, pos)-keyed partial sums whose
    * result cardinality is labels × dims, independent of corpus size. */
  def centroidClassify(embeddings: DataFrame, idCol: String, vecCol: String,
                       labelCol: String,
                       quantScale: Double = 1.0e10): DataFrame = {
    require(!embeddings.columns.exists(Set("_cents", "_vn2", "_scored", "_srt", "_best", "_snd")),
      "input must not contain the reserved columns _cents/_vn2/_scored/_srt/_best/_snd")
    import graft.functions.VecDot
    val cents = Similarity.centroids(embeddings, labelCol, vecCol, quantScale)
    val carr = cents.groupBy(col(labelCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cvec"))
      .select(col(labelCol).cast("long").as("_cl"), col("cvec"),
        VecDot.dot(col("cvec"), col("cvec")).as("_cn2"))
    val packed = carr.agg(collect_list(struct(col("_cl"), col("cvec"), col("_cn2"))).as("_cents"))
    val scored = embeddings
      .crossJoin(broadcast(packed))
      .withColumn("_vn2", VecDot.dot(col(vecCol), col(vecCol)))
      // per-label (score, -label) structs: ascending struct sort puts the
      // winner LAST (max score, then max -label = min label) — the same
      // total order as `ORDER BY score DESC, label ASC`
      .withColumn("_scored", transform(col("_cents"), c => struct(
        when(col("_vn2") * c.getField("_cn2") === 0.0, lit(0.0))
          .otherwise(VecDot.dot(col(vecCol), c.getField("cvec")) /
            (sqrt(col("_vn2")) * sqrt(c.getField("_cn2")))).as("s"),
        (-c.getField("_cl")).as("negl"))))
      .withColumn("_srt", array_sort(col("_scored")))
      .withColumn("_best", element_at(col("_srt"), -1))
      .withColumn("_snd", when(size(col("_srt")) >= 2, element_at(col("_srt"), -2)))
    scored.select(col(idCol), col(labelCol).as("label"),
      (-col("_best").getField("negl")).as("predicted"),
      col("_best").getField("s").as("score"),
      (-col("_snd").getField("negl")).as("runner_up"),
      (col("_best").getField("s") - col("_snd").getField("s")).as("margin"))
  }

  /** Exact ROC-AUC per group via the Mann–Whitney rank-sum identity
    * (Mann & Whitney 1947; Hanley & McNeil, Radiology 1982 for the AUC
    * equivalence): `AUC = (ΣR₊ − n₊(n₊+1)/2) / (n₊·n₋)` with MIDRANKS on
    * ties — the standard "does this score separate the classes"
    * evaluation for any quality/classifier score, without thresholds or
    * curve sweeps.
    *
    * Exactness: doubled midranks are integers (`2·mid = 2·rmin + c − 1`),
    * so the whole statistic stays in integer arithmetic —
    * `AUC = (2ΣR₊ − n₊(n₊+1)) / (2·n₊·n₋)` is ONE division of exact
    * longs. Groups lacking either class report null.
    *
    * Scale shape: one (group, score)-keyed count carrying the positive
    * count, then a cumulative window over the per-group DISTINCT-score
    * table (value-cardinality sized) and one aggregation. Never a
    * corpus-wide sort of raw rows. */
  def rankAuc(df: DataFrame, groupCols: Seq[String], labelCol: String,
              scoreCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column is required")
    require(!df.columns.exists(Set("_c", "_p", "_rmin", "_2r")),
      "input must not contain the reserved columns _c/_p/_rmin/_2r")
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val cnt = df
      .filter(col(scoreCol).isNotNull)
      .groupBy(gcols :+ col(scoreCol): _*)
      .agg(count(lit(1)).as("_c"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("_p"))
    val ord = Window.partitionBy(gcols: _*).orderBy(col(scoreCol))
    val ranked = cnt
      .withColumn("_rmin", coalesce(
        sum(col("_c")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)) + 1L)
      .withColumn("_2r",
        col("_p") * (lit(2L) * col("_rmin") + col("_c") - 1L))
    ranked
      .groupBy(gcols: _*)
      .agg(sum(col("_p")).as("n_pos"),
        sum(col("_c") - col("_p")).as("n_neg"),
        sum(col("_2r")).as("_2sum"))
      .select(gcols ++ Seq(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          (col("_2sum") - col("n_pos") * (col("n_pos") + 1L)).cast("double")
            / (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
          .as("auc")): _*)
  }

  /** Reliability-diagram calibration bins (the [[rankAuc]] companion:
    * AUC says the scores RANK well, this says whether they MEAN what
    * they claim): equal-width probability bins over [0, 1], per bin the
    * mean predicted score vs the empirical positive rate and their gap —
    * the per-bin summands of expected calibration error.
    *
    * Determinism: scores ride the repo's decimal(18,6) micro-unit
    * contract (probabilities — ≤ 6 decimal places; out-of-[0,1] rows
    * are EXCLUDED, a probability they are not), so the bin index is an
    * exact integer floor-division `(si·nBins) div 10⁶` (score 1.0 clamps
    * into the last bin) — no double ever decides a bin boundary — and
    * `mean_score` divides an exact micro-unit sum. Null scores/labels
    * are excluded.
    *
    * Output per non-empty bin: `(bin, bin_lo, n, n_pos, mean_score,
    * pos_rate, gap = pos_rate − mean_score)`.
    *
    * Scale shape: one map-side-combined aggregation to nBins rows;
    * nothing windowed, nothing sorted. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 100000, s"nBins ($nBins) out of range")
    val si = (col(scoreCol).cast("decimal(18,6)") * lit(1000000L)).cast("long")
    val rows = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(si.as("_si"), when(col(labelCol), 1L).otherwise(0L).as("_y"))
      .filter(col("_si") >= 0L && col("_si") <= 1000000L)
      .select(least(expr(s"(_si * $nBins) div 1000000"), lit(nBins - 1L))
        .cast("int").as("bin"), col("_si"), col("_y"))
    rows.groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("n_pos"),
        sum(col("_si")).as("_ssum"))
      .select(col("bin"),
        (col("bin").cast("double") / lit(nBins.toDouble)).as("bin_lo"),
        col("n"), col("n_pos"),
        ((col("_ssum").cast("double") / lit(1.0e6)) / col("n").cast("double"))
          .as("mean_score"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("pos_rate"),
        (col("n_pos").cast("double") / col("n").cast("double")
          - (col("_ssum").cast("double") / lit(1.0e6)) / col("n").cast("double"))
          .as("gap"))
  }

  /** Annotator consensus with ONE accuracy-weighted refinement round —
    * the Dawid & Skene (JRSS-C 1979) idea cut to its deterministic
    * one-iteration core, the workhorse shape for labeling-pipeline
    * aggregation: (1) majority vote per item (ties → smallest label);
    * (2) each annotator's accuracy = agreement rate with that majority;
    * (3) re-vote with votes weighted by annotator accuracy (ties →
    * smallest label again). Full EM iterates (2)–(3); one round already
    * demotes the random-clicker whose votes a plain majority counts at
    * par.
    *
    * Determinism: duplicate (item, annotator) votes collapse to the
    * SMALLEST label first (a double-vote is upstream dirt, resolved
    * reproducibly); counts are exact integers; accuracies are one
    * division each; the per-(item, label) weight sums fold votes in
    * ANNOTATOR order over a sorted collect; both argmaxes are
    * `min(struct(−score, label))` — aggregates, never per-item sort
    * windows.
    *
    * Output per item: `(itemCol, n_votes, majority_label,
    * weighted_label, winning_weight)`.
    *
    * Scale shape: one (item, annotator) dedup shuffle, one
    * (item, label) count, an annotator-vocabulary-sized accuracy table
    * broadcast back, and one more (item, label) aggregation — per-item
    * state is its vote set, never the corpus. */
  def annotatorConsensus(df: DataFrame, itemCol: String,
                         annotatorCol: String,
                         labelCol: String): DataFrame = {
    val votes = df
      .filter(col(itemCol).isNotNull && col(annotatorCol).isNotNull &&
        col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("_it"), col(annotatorCol).as("_an"))
      .agg(min(col(labelCol)).as("_lb"))
      .localCheckpoint(true) // majority + accuracy + weighted passes
    val majority = votes.groupBy(col("_it"), col("_lb"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("_it"))
      .agg(min(struct((-col("_c")).as("nc"), col("_lb").as("l"))).as("_m"),
        sum(col("_c")).as("n_votes"))
      .select(col("_it"), col("n_votes"), col("_m.l").as("majority_label"))
      .localCheckpoint(true) // accuracy join + output join
    val acc = votes
      .join(majority.select(col("_it"), col("majority_label")), Seq("_it"))
      .groupBy(col("_an"))
      .agg((sum(when(col("_lb") === col("majority_label"), 1L).otherwise(0L))
        .cast("double") / count(lit(1)).cast("double")).as("_acc"))
    val weighted = votes
      .join(broadcast(acc), Seq("_an"))
      .groupBy(col("_it"), col("_lb"))
      .agg(sort_array(collect_list(struct(col("_an"), col("_acc"))))
        .as("_t"))
      .select(col("_it"), col("_lb"),
        aggregate(col("_t"), lit(0.0), (s, t) => s + t("_acc")).as("_w"))
      .groupBy(col("_it"))
      .agg(min(struct((-col("_w")).as("nw"), col("_lb").as("l"))).as("_p"))
      .select(col("_it"), col("_p.l").as("weighted_label"),
        (-col("_p.nw")).as("winning_weight"))
    majority.join(weighted, Seq("_it"))
      .select(col("_it").as(itemCol), col("n_votes"),
        col("majority_label"), col("weighted_label"),
        col("winning_weight"))
  }

  /** Brier score with the Murphy (1973) reliability–resolution–
    * uncertainty decomposition over [[calibrationBins]]' binning:
    * `brier = (1/N)·Σ(p_i − y_i)²` exactly (unbinned), and the binned
    * terms `REL = (1/N)·Σ_b n_b(p̄_b − ō_b)²`,
    * `RES = (1/N)·Σ_b n_b(ō_b − ō)²`, `UNC = ō(1 − ō)` — the standard
    * forecast-quality split (REL = calibration error to drive down,
    * RES = discrimination to keep; brier = REL − RES + UNC up to the
    * within-bin score variance, which the exact brier makes visible).
    *
    * Determinism ([[calibrationBins]]' contract): scores live on the
    * exact micro-unit grid, per-row (si − y·10⁶)² is an exact long
    * summed in decimal(38,0), bin indices are integer floor-divisions,
    * and both Σ_b folds run in BIN ORDER over a sorted collect
    * (≤ nBins terms) — one fixed double chain end to end.
    *
    * Row exclusions (also [[calibrationBins]]' contract): null scores/
    * labels AND scores outside [0, 1] are dropped — a score is a
    * probability, and out-of-range values are upstream bugs, not
    * forecasts. The reported `n` counts KEPT rows only; callers that
    * need to detect out-of-range leakage should compare `n` against
    * their own `count(score is not null and label is not null)`.
    *
    * Output: ONE row `(n, brier, reliability, resolution,
    * uncertainty)`; an empty input returns n = 0 with null scores.
    *
    * Scale shape: one map-side-combined aggregation to ≤ nBins rows,
    * then a 1-row fold — nothing windowed, nothing data-sized after
    * the first shuffle. */
  def brierDecomposition(df: DataFrame, scoreCol: String, labelCol: String,
                         nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 100000, s"nBins ($nBins) out of range")
    val si = (col(scoreCol).cast("decimal(18,6)") * lit(1000000L)).cast("long")
    val rows = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(si.as("_si"), when(col(labelCol), 1L).otherwise(0L).as("_y"))
      .filter(col("_si") >= 0L && col("_si") <= 1000000L)
      .select(least(expr(s"(_si * $nBins) div 1000000"), lit(nBins - 1L))
        .cast("int").as("bin"), col("_si"), col("_y"))
    val d38 = "decimal(38,0)"
    val bins = rows.groupBy("bin")
      .agg(count(lit(1)).as("_n"), sum(col("_y")).as("_ny"),
        sum(col("_si")).as("_ssum"),
        sum(((col("_si") - col("_y") * 1000000L) *
          (col("_si") - col("_y") * 1000000L)).cast(d38)).as("_sq"))
    val tot = bins.agg(
      coalesce(sum(col("_n")), lit(0L)).as("n"),
      sum(col("_ny")).as("_sy"), sum(col("_sq")).as("_sqt"),
      sort_array(collect_list(struct(col("bin"), col("_n"), col("_ny"),
        col("_ssum")))).as("_t"))
    def dbl(c: Column): Column = c.cast("double")
    val nD = dbl(col("n"))
    val base = dbl(col("_sy")) / nD
    def fold(term: (Column, Column, Column) => Column): Column =
      aggregate(col("_t"), lit(0.0), (acc, t) =>
        acc + term(dbl(t("_n")), dbl(t("_ny")), dbl(t("_ssum")))) / nD
    tot.select(col("n"),
      when(col("n") === 0L, lit(null))
        .otherwise((dbl(col("_sqt")) / lit(1.0e12)) / nD).as("brier"),
      when(col("n") === 0L, lit(null))
        .otherwise(fold((nb, ny, ss) => {
          val d = (ss / lit(1.0e6)) / nb - ny / nb
          nb * (d * d)
        })).as("reliability"),
      when(col("n") === 0L, lit(null))
        .otherwise(fold((nb, ny, _) => {
          val d = ny / nb - base
          nb * (d * d)
        })).as("resolution"),
      when(col("n") === 0L, lit(null))
        .otherwise(base * (lit(1.0) - base)).as("uncertainty"))
  }

  /** Isotonic calibration over pre-binned counts — PAV's fit computed
    * by its MINIMAX characterization (Ayer et al. 1955; Robertson,
    * Wright & Dykstra ch. 1): `ĝ(b) = max_{i≤b} min_{j≥b}
    * (Σ_{i..j} pos) / (Σ_{i..j} n)` — a closed relational form, no
    * sequential pool-merging loop, no driver-side state. The result is
    * the least-squares monotone fit of the per-bin positive rates
    * (non-decreasing in bin order), the standard probability-
    * calibration step after [[calibrationBins]].
    *
    * Contract: the bin domain must be BOUNDED (≤ ~200 bins — the
    * interval lattice is B², the membership join B³/2; calibration
    * bins are 10–100). Empty bins (n = 0) are excluded — they carry no
    * evidence and PAV is defined on weighted points.
    *
    * Determinism: interval sums are exact integers off exact windowed
    * prefixes; each interval average is ONE double division; min/max
    * run over identical double sets on every engine, and the output is
    * the VALUE (ties in the argmin collapse — no tie-break needed).
    *
    * Output: `(bin, n, n_pos, rate_raw, rate_iso)`, rate_iso
    * non-decreasing. */
  def isotonicCalibrate(binned: DataFrame, binCol: String, nCol: String,
                        posCol: String): DataFrame = {
    val base = binned
      .select(col(binCol).cast("long").as("_b"),
        col(nCol).cast("long").as("_n"), col(posCol).cast("long").as("_s"))
      .filter(col("_n") > 0L)
      .localCheckpoint(false) // cum window + membership join + output
    val w = org.apache.spark.sql.expressions.Window.orderBy("_b")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = base
      .withColumn("_cn", sum(col("_n")).over(w))
      .withColumn("_cs", sum(col("_s")).over(w))
      .localCheckpoint(false) // bounded-bin contract: B rows
    val lo = cum.select(col("_b").as("_i"),
      (col("_cn") - col("_n")).as("_pn"), (col("_cs") - col("_s")).as("_ps"))
    val hi = cum.select(col("_b").as("_j"),
      col("_cn").as("_cnj"), col("_cs").as("_csj"))
    val intervals = lo.join(hi, col("_i") <= col("_j"))
      .select(col("_i"), col("_j"),
        ((col("_csj") - col("_ps")).cast("double") /
          (col("_cnj") - col("_pn")).cast("double")).as("_avg"))
    val fit = intervals
      .join(base.select(col("_b")),
        col("_i") <= col("_b") && col("_b") <= col("_j"))
      .groupBy(col("_b"), col("_i")).agg(min(col("_avg")).as("_m"))
      .groupBy(col("_b")).agg(max(col("_m")).as("rate_iso"))
    base.join(fit, Seq("_b"))
      .select(col("_b").as(binCol), col("_n").as(nCol),
        col("_s").as(posCol),
        (col("_s").cast("double") / col("_n").cast("double")).as("rate_raw"),
        col("rate_iso"))
  }

  /** Cohen's kappa (Cohen 1960) between two label columns — the
    * chance-corrected agreement behind annotator-quality checks and
    * model-vs-model consistency reads: `κ = (p_o − p_e)/(1 − p_e)`
    * with observed agreement `p_o = agree/n` and chance agreement
    * `p_e = Σ_k row_k·col_k / n²` over the label marginals.
    *
    * Exactness: all counts are longs; the marginal product sum runs in
    * decimal(38,0) (joined label-by-label, label-vocabulary-sized);
    * p_o/p_e/κ are fixed-order double divisions. Rows with a null on
    * EITHER side are excluded (no judgment to compare). κ is null when
    * p_e = 1 (both raters constant — 0/0). Output one row:
    * `(n, n_agree, po, pe, kappa)`.
    *
    * Scale shape: ONE corpus aggregation (n, agree) + two vocab-sized
    * marginal aggregations joined label-on-label; nothing windowed. */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).as("_a"), col(bCol).as("_b"))
      .localCheckpoint(false) // totals + two marginals read it
    val tot = base.agg(count(lit(1)).as("n"),
      sum(when(col("_a") === col("_b"), 1L).otherwise(0L)).as("n_agree"))
    val ra = base.groupBy(col("_a").as("_l")).agg(count(lit(1)).as("_ra"))
    val cb = base.groupBy(col("_b").as("_l")).agg(count(lit(1)).as("_cb"))
    val peNum = ra.join(cb, Seq("_l"))
      .agg(coalesce(sum(col("_ra").cast(d38) * col("_cb").cast(d38)),
        lit(0).cast(d38)).as("_pe_num"))
    val nD = col("n").cast("double")
    val po = col("n_agree").cast("double") / nD
    val pe = col("_pe_num").cast("double") / (nD * nD)
    tot.crossJoin(broadcast(peNum))
      .select(col("n"), col("n_agree"), po.as("po"), pe.as("pe"),
        when(pe === lit(1.0), lit(null).cast("double"))
          .otherwise((po - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  /** Decile gains/lift table — "if I act on the top k% by score, what
    * fraction of the positives do I capture": rows are ranked by
    * `(score DESC, id)` and cut into `nBuckets` equal-count buckets by
    * RANK (bucket = rank·nBuckets div n — never a score-value
    * boundary, so ties split deterministically by id and every engine
    * cuts identically; `idCol` must be unique and non-null). Per
    * bucket: counts, positive rate, capture (share of all positives),
    * cumulative capture, lift vs the base rate, cumulative lift.
    *
    * Ranks are computed DISTRIBUTED (the [[Linkage
    * .sortedNeighborhoodPairs]] recipe): range-repartition on the sort
    * key + in-partition sort + the two-pass zipWithIndex offset rank —
    * never a single-task global window. Determinism: bucket indices
    * are exact integer floor divisions; every output double divides
    * exact longs in a fixed operand order (lifts divide two such
    * quotients), bit-identical cross-engine. Null score/id/label rows
    * are excluded; capture/lift are null when there are no positives.
    *
    * Scale shape: one range shuffle + two linear passes for ranks, one
    * map-side-combined aggregation to nBuckets rows; the cumulative
    * window runs on nBuckets rows (bucket-count-sized, the q169
    * regime). */
  def gainsTable(df: DataFrame, scoreCol: String, labelCol: String,
                 idCol: String, nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 10000,
      s"nBuckets ($nBuckets) out of range")
    val spark = df.sparkSession
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(scoreCol).as("_s"), col(idCol).as("_id"),
        when(col(labelCol), 1L).otherwise(0L).as("_y"))
    val nPart = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val parted = base
      .repartitionByRange(nPart, col("_s").desc, col("_id"))
      .sortWithinPartitions(col("_s").desc, col("_id"))
      .localCheckpoint(true) // pin partitioning for both zipWithIndex passes
    val n = parted.count()
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val rankedRdd = parted.rdd.zipWithIndex.map { case (row, idx) =>
      Row(row.get(2), idx)
    }
    val ranked = spark.createDataFrame(rankedRdd,
      StructType(Seq(StructField("_y", LongType, nullable = false),
        StructField("_rnk", LongType, nullable = false))))
    val perBucket = ranked
      .select(expr(s"(_rnk * $nBuckets) div $n").cast("int").as("bucket"),
        col("_y"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), sum(col("_y")).as("n_pos"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val cum = perBucket
      .withColumn("_crows", sum(col("n_rows")).over(w))
      .withColumn("_cpos", sum(col("n_pos")).over(w))
      .withColumn("_trows", sum(col("n_rows")).over(wAll))
      .withColumn("_tpos", sum(col("n_pos")).over(wAll))
    val rate = col("n_pos").cast("double") / col("n_rows").cast("double")
    val overall = col("_tpos").cast("double") / col("_trows").cast("double")
    cum.select(col("bucket"), col("n_rows"), col("n_pos"),
      rate.as("pos_rate"),
      when(col("_tpos") === 0L, lit(null).cast("double"))
        .otherwise(col("n_pos").cast("double") / col("_tpos").cast("double"))
        .as("capture"),
      when(col("_tpos") === 0L, lit(null).cast("double"))
        .otherwise(col("_cpos").cast("double") / col("_tpos").cast("double"))
        .as("cum_capture"),
      when(col("_tpos") === 0L, lit(null).cast("double"))
        .otherwise(rate / overall).as("lift"),
      when(col("_tpos") === 0L, lit(null).cast("double"))
        .otherwise((col("_cpos").cast("double") / col("_crows").cast("double"))
          / overall).as("cum_lift"))
  }

  /** Split-conformal prediction interval calibration (Papadopoulos et
    * al. ECML 2002; Lei et al. JASA 2018; the Angelopoulos & Bates 2023
    * tutorial form): on a CALIBRATION set compute nonconformity scores
    * `s = |y − ŷ|`, take the k-th smallest with
    * `k = ⌈(n+1)(1−alpha)⌉` as `q̂`, and the interval `ŷ ± q̂` covers a
    * fresh point with probability ≥ 1−alpha (finite-sample, no
    * distributional assumptions — the abstention-threshold calibration
    * a production quality-filter wants). The TEST set then reports the
    * empirical coverage `P(|y − ŷ| ≤ q̂)`.
    *
    * Determinism: y and ŷ ride the decimal(18,6) micro-unit contract,
    * so every score is an exact long and the k-th order statistic is an
    * exact integer both engines select identically (ties share the
    * VALUE, so tie order is irrelevant); `q_hat` and `coverage` are one
    * double division each. `k > n` (alpha too small for the calibration
    * size) means the conformal interval is the whole line: `q_hat` is
    * null and coverage is 1 by construction — reported, not an error.
    * Null y/ŷ rows are excluded on both sides.
    *
    * Scale shape: the selection is the [[Quantiles.exact]] distributed
    * pattern — one range sort of the score column, per-partition offsets
    * broadcast back, a within-partition row_number — no single-partition
    * window, no driver-side data; the test side is one map-side-combined
    * count against the broadcast 1-row q̂.
    *
    * Output: ONE row `(n_cal, k, q_hat, n_test, n_covered, coverage)`. */
  def splitConformal(cal: DataFrame, test: DataFrame, yCol: String,
                     predCol: String, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha ($alpha) must be in (0,1)")
    val spark = cal.sparkSession
    def micro(c: Column): Column =
      (c.cast("decimal(18,6)") * lit(1000000L)).cast("long")
    def scores(df: DataFrame): DataFrame = df
      .filter(col(yCol).isNotNull && col(predCol).isNotNull)
      .select(abs(micro(col(yCol)) - micro(col(predCol))).as("_s"))
    val cs = scores(cal)
    val ts = scores(test)
    val n = cs.count()
    val k = math.ceil((n + 1) * (1.0 - alpha)).toLong
    if (n == 0L || k > n) {
      return ts.agg(count(lit(1)).as("n_test"))
        .select(lit(n).as("n_cal"), lit(k).as("k"),
          lit(null).cast("double").as("q_hat"),
          col("n_test"), col("n_test").as("n_covered"),
          when(col("n_test") > 0L, lit(1.0)).otherwise(lit(null))
            .as("coverage"))
    }
    // distributed k-th order statistic: the Quantiles.exact shape (range
    // sort pinned by a lazy localCheckpoint; offsets broadcast back)
    val sorted = cs.orderBy("_s").withColumn("_pid", spark_partition_id())
      .localCheckpoint(false)
    val offsets = sorted.groupBy("_pid").count()
      .withColumn("_off", coalesce(
        sum("count").over(org.apache.spark.sql.expressions.Window
          .partitionBy(lit(0)).orderBy("_pid")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)), lit(0L)))
      .drop("count")
    val inPart = org.apache.spark.sql.expressions.Window
      .partitionBy("_pid").orderBy("_s")
    val qhat = sorted.join(broadcast(offsets), Seq("_pid"))
      .withColumn("_i", col("_off") + row_number().over(inPart))
      .filter(col("_i") === k)
      .select(col("_s").as("_q"))
    ts.crossJoin(broadcast(qhat))
      .agg(count(lit(1)).as("n_test"),
        coalesce(sum(when(col("_s") <= col("_q"), 1L).otherwise(0L)),
          lit(0L)).as("n_covered"))
      .crossJoin(broadcast(qhat))
      .select(lit(n).as("n_cal"), lit(k).as("k"),
        (col("_q").cast("double") / lit(1.0e6)).as("q_hat"),
        col("n_test"), col("n_covered"),
        when(col("n_test") > 0L,
          col("n_covered").cast("double") / col("n_test").cast("double"))
          .otherwise(lit(null)).as("coverage"))
  }
}
