package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B experiment readout: per-arm conversion with defensible intervals
  * and a vs-control significance stat — the analytics-engine companion to
  * [[Scrub.piiIncidence]]'s governance intervals (same Wilson machinery,
  * same planted-literal determinism).
  */
object Experiment {

  /** Per-arm conversion report. Unit of analysis is the USER, not the
    * event: each user counts once per arm, converted iff ANY of their
    * rows converted (`max` over the flag) — event-level rates would let
    * heavy users vote once per visit. A user present in several arms
    * counts in each (assignment contamination is an upstream audit's
    * job — silently dropping such users here would shrink arms
    * unevenly); null users are excluded.
    *
    * Per arm: `n_users`, `n_converted`, `rate`, Wilson score bounds
    * (Wilson JASA 1927, [[Scrub.piiIncidence]]'s exact expression chain
    * with the same planted z/z² literals), and vs `controlArm`:
    * `lift = rate − control_rate` and the pooled two-proportion
    * z-statistic `(p₁−p₀) / √(p̄(1−p̄)(1/n₁+1/n₀))`. The control row
    * carries null lift/z (it is its own baseline); an arm whose pooled
    * standard error is zero (0% or 100% in BOTH arms) keeps its lift but
    * nulls `z_stat` — no scale for significance. Requires the control
    * arm to exist (1-row bounded check) — an empty report would
    * otherwise masquerade as "no data".
    *
    * Determinism: counts are exact integers; every double derives from
    * them through a fixed-order IEEE chain with plan-planted literals —
    * bit-identical cross-engine, no rounding.
    *
    * Scale shape: one distinct-unit shuffle on (arm, user) with map-side
    * combine, then an arm-vocabulary-sized aggregation; the control row
    * broadcasts back via a 1-row crossJoin. Nothing user-sized past the
    * first aggregation. */
  def abReport(df: DataFrame, armCol: String, userCol: String,
               convertedCol: String, controlArm: String,
               z: Double = 1.96): DataFrame = {
    require(z > 0.0, s"z ($z) must be positive")
    val reserved = Seq("_u", "_c", "_cn", "_cc", "arm", "n_users",
      "n_converted", "rate", "wilson_lo", "wilson_hi", "lift_vs_control",
      "z_stat")
    require(!df.columns.exists(c => reserved.contains(c) &&
      !Seq(armCol, userCol, convertedCol).contains(c)),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    val unit = df
      .select(col(armCol).as("arm"), col(userCol).as("_u"),
        when(col(convertedCol), 1L).otherwise(0L).as("_c"))
      .filter(col("_u").isNotNull)
      .groupBy("arm", "_u").agg(max(col("_c")).as("_c"))
    val arms = unit.groupBy("arm")
      .agg(count(lit(1)).as("n_users"), sum(col("_c")).as("n_converted"))
      .localCheckpoint(false) // control row + report both read this
    val control = arms.filter(col("arm") === controlArm)
      .select(col("n_users").as("_cn"), col("n_converted").as("_cc"))
    require(!control.isEmpty, s"control arm '$controlArm' has no users")
    val z2 = z * z
    val n = col("n_users").cast("double")
    val p = col("n_converted").cast("double") / n
    val denom = lit(1.0) + lit(z2) / n
    val center = (p + lit(z2) / (lit(2.0) * n)) / denom
    val half = (lit(z) / denom) *
      sqrt(p * (lit(1.0) - p) / n + lit(z2) / (lit(4.0) * n * n))
    val cn = col("_cn").cast("double")
    val cp = col("_cc").cast("double") / cn
    val pooled = (col("n_converted") + col("_cc")).cast("double") /
      (col("n_users") + col("_cn")).cast("double")
    val se = sqrt(pooled * (lit(1.0) - pooled) * (lit(1.0) / n + lit(1.0) / cn))
    val notControl: Column => Column = c =>
      when(col("arm") === controlArm, lit(null)).otherwise(c)
    arms.crossJoin(broadcast(control))
      .select(col("arm"), col("n_users"), col("n_converted"),
        p.as("rate"),
        greatest(lit(0.0), center - half).as("wilson_lo"),
        least(lit(1.0), center + half).as("wilson_hi"),
        notControl(p - cp).as("lift_vs_control"),
        notControl(when(se === 0.0, lit(null)).otherwise((p - cp) / se))
          .as("z_stat"))
  }

  /** CUPED variance reduction (Deng et al. WSDM 2013): adjust each arm's
    * metric mean by its pre-experiment covariate imbalance —
    * `adjusted = mean(y) − θ·(mean(x) − mean_global(x))` with
    * `θ = cov(x, y) / var(x)` POOLED over all arms (the standard choice:
    * one θ, so the adjustment cancels across arms and the estimator
    * stays unbiased under randomization). Input is UNIT-LEVEL — one row
    * per user with metric `y` and pre-period covariate `x` (aggregate
    * events upstream; this operator must not guess the unit).
    *
    * Determinism is [[Trend.trendFit]]'s contract verbatim: x and y in
    * exact integer micro-units (decimal(18,6) → ×10⁶; |value| < 10¹²,
    * ≤ 6 decimal places; Σ products in decimal(38,0), so |value| ≤ 10⁹
    * supports ~10⁸ units/arm before wrap), θ and the means combine the
    * exact sums in fixed-order doubles. Zero covariate variance → null
    * `theta` and `adjusted_mean = mean_metric` (no adjustment, not
    * garbage). Null x or y rows are excluded.
    *
    * Scale shape: one map-side-combined aggregation to five exact sums
    * per arm; the global sums REUSE the arm table (arm-vocabulary sized,
    * decimal addition is order-free) and broadcast back — the unit table
    * is read once. */
  def cupedAdjust(df: DataFrame, armCol: String, metricCol: String,
                  covariateCol: String): DataFrame = {
    val d19 = "decimal(19,0)"
    val yi = (col(metricCol).cast("decimal(18,6)") * lit(1000000L)).cast(d19)
    val xi = (col(covariateCol).cast("decimal(18,6)") * lit(1000000L)).cast(d19)
    val arms = df
      .filter(col(metricCol).isNotNull && col(covariateCol).isNotNull)
      .groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("n_units"),
        sum(xi).as("_sx"), sum(yi).as("_sy"),
        sum(xi * xi).as("_sxx"), sum(xi * yi).as("_sxy"))
      .localCheckpoint(false) // read twice: per-arm rows + global roll-up
    val g = arms.agg(sum(col("n_units")).as("_gn"), sum(col("_sx")).as("_gsx"),
      sum(col("_sy")).as("_gsy"), sum(col("_sxx")).as("_gsxx"),
      sum(col("_sxy")).as("_gsxy"))
    def dbl(c: String): Column = col(c).cast("double")
    val gn = dbl("_gn")
    val gsx = dbl("_gsx") / lit(1.0e6)
    val gsy = dbl("_gsy") / lit(1.0e6)
    val gsxx = dbl("_gsxx") / lit(1.0e12)
    val gsxy = dbl("_gsxy") / lit(1.0e12)
    val denom = gn * gsxx - gsx * gsx
    val theta = when(denom === 0.0, lit(null))
      .otherwise((gn * gsxy - gsx * gsy) / denom)
    val nD = col("n_units").cast("double")
    val meanY = (dbl("_sy") / lit(1.0e6)) / nD
    val meanX = (dbl("_sx") / lit(1.0e6)) / nD
    arms.crossJoin(broadcast(g))
      .select(col("arm"), col("n_units"),
        meanY.as("mean_metric"), meanX.as("mean_covariate"),
        theta.as("theta"),
        when(denom === 0.0, meanY)
          .otherwise(meanY - ((gn * gsxy - gsx * gsy) / denom) *
            (meanX - gsx / gn)).as("adjusted_mean"))
  }

  /** Sample-ratio-mismatch (SRM) check — the first thing to run on ANY
    * experiment readout: do the observed arm sizes match the DECLARED
    * assignment ratios? A significant mismatch means the assignment or
    * logging pipeline is broken and every downstream metric is suspect
    * (the standard pre-analysis gate, e.g. Fabijan et al. KDD'19).
    * χ² = Σ (obs − n·exp)² / (n·exp) over the declared arms, on
    * distinct-user counts.
    *
    * `expected` declares (arm, fraction); fractions must sum to 1 within
    * 1e-9 and every OBSERVED arm must be declared (an undeclared arm in
    * the data is itself an assignment bug — fail loudly, 1-row bounded
    * check). Determinism: counts are exact integers, the declared
    * fractions are plan literals, and χ² folds its terms in arm-name
    * order ([[Audit.benfordDigits]]'s shape).
    *
    * Output per declared arm: `(arm, n_users, frac_obs, frac_expected,
    * chi2_total)` — the scalar verdict repeated per row. Degrees of
    * freedom = arms − 1 (the caller's lookup; for 2 arms χ² > 3.84 is
    * p < 0.05). */
  def srmCheck(df: DataFrame, armCol: String, userCol: String,
               expected: Seq[(String, Double)]): DataFrame = {
    require(expected.size >= 2, "declare at least two arms")
    require(math.abs(expected.map(_._2).sum - 1.0) < 1e-9,
      s"expected fractions must sum to 1, got ${expected.map(_._2).sum}")
    require(expected.forall(_._2 > 0.0), "every declared fraction must be > 0")
    val obs = df
      .filter(col(userCol).isNotNull)
      .groupBy(col(armCol).as("arm"))
      .agg(count_distinct(col(userCol)).as("n_users"))
      .localCheckpoint(false)
    val declared = expected.map(_._1).toSet
    val undeclared = obs.filter(!col("arm").isin(expected.map(_._1): _*))
      .limit(1).collect()
    require(undeclared.isEmpty,
      s"observed arm '${undeclared.headOption.map(_.getString(0)).getOrElse("")}' " +
        s"is not declared in ${declared.mkString("{", ", ", "}")} — " +
        "assignment is emitting arms the design does not know")
    import df.sparkSession.implicits._
    val spine = expected.toDF("arm", "frac_expected")
    val joined = spine.join(obs, Seq("arm"), "left")
      .select(col("arm"), coalesce(col("n_users"), lit(0L)).as("n_users"),
        col("frac_expected"))
      .localCheckpoint(false)
    val totals = joined
      .agg(sum(col("n_users")).as("_n"),
        sort_array(collect_list(struct(col("arm"), col("n_users"),
          col("frac_expected")))).as("_terms"))
      .select(col("_n"),
        when(col("_n") === 0L, lit(0.0)).otherwise(
          aggregate(col("_terms"), lit(0.0), (acc, t) => {
            val e = col("_n").cast("double") * t("frac_expected")
            acc + (t("n_users").cast("double") - e) *
              (t("n_users").cast("double") - e) / e
          })).as("chi2_total"))
    joined.crossJoin(broadcast(totals))
      .select(col("arm"), col("n_users"),
        when(col("_n") === 0L, lit(0.0))
          .otherwise(col("n_users").cast("double") / col("_n").cast("double"))
          .as("frac_obs"),
        col("frac_expected"), col("chi2_total"))
  }

  /** Difference-in-differences (2×2): the quasi-experimental companion to
    * [[abReport]] for launches WITHOUT randomization — did the treated
    * group's metric move more pre→post than the control group's?
    * `did = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre)` (Card & Krueger
    * 1994's canonical estimator), with the unpooled standard error
    * `se = √(Σ_cells s²/n)` and `t = did / se`.
    *
    * Input is UNIT-PERIOD level — one row per (unit, period) with the
    * metric and two BOOLEAN columns `treatedCol` / `postCol` (derive the
    * 2×2 upstream; this operator must not guess the design). All four
    * cells must be non-empty — a missing cell means the assignment or
    * period derivation is broken and the estimate would be garbage
    * (loud 1-row-bounded failure, [[srmCheck]]'s convention). A cell with
    * fewer than 2 units (or zero variance everywhere) nulls `se`/`t_stat`
    * but keeps the point estimate.
    *
    * Determinism is [[cupedAdjust]]'s contract: metric in exact integer
    * micro-units (decimal(18,6) → ×10⁶, |y| < 10¹², Σy² in decimal(38,0)
    * supports ~10⁸ units/cell at |y| ≤ 10⁹), every double derived from
    * the exact sums through one fixed-order IEEE chain (cells pivoted
    * into a single row, so the Σ s²/n fold order is pinned by the
    * expression, not row order).
    *
    * Output: one row per cell `(is_treated, is_post, n_units,
    * mean_metric)` plus the scalar verdict repeated per row
    * (`did_estimate`, `se`, `t_stat`).
    *
    * Scale shape: ONE map-side-combined aggregation to three exact sums
    * per cell (4 rows), a 4-row pivot, and a 1-row broadcast back —
    * nothing unit-sized past the first shuffle. */
  def diffInDiff(df: DataFrame, treatedCol: String, postCol: String,
                 metricCol: String): DataFrame = {
    val d19 = "decimal(19,0)"
    val yi = (col(metricCol).cast("decimal(18,6)") * lit(1000000L)).cast(d19)
    val cells = df
      .filter(col(treatedCol).isNotNull && col(postCol).isNotNull &&
        col(metricCol).isNotNull)
      .groupBy(col(treatedCol).as("is_treated"), col(postCol).as("is_post"))
      .agg(count(lit(1)).as("n_units"),
        sum(yi).as("_sy"), sum(yi * yi).as("_syy"))
      .localCheckpoint(false) // read thrice: cell rows, pivot, cell count
    val nCells = cells.limit(5).count()
    require(nCells == 4L,
      s"expected all 4 (treated × post) cells, found $nCells — " +
        "the design derivation upstream is not producing a 2×2")
    def dbl(c: Column): Column = c.cast("double")
    val nD = dbl(col("n_units"))
    val mean = (dbl(col("_sy")) / lit(1.0e6)) / nD
    // s² = (Σy² − (Σy)²/n) / (n−1) on the exact micro-unit sums; a
    // singleton cell has no variance (null here, caught by the minn<2
    // guard below — and the null must not reach the ANSI division)
    val s2 = when(col("n_units") > 1L,
      (dbl(col("_syy")) / lit(1.0e12) -
        (dbl(col("_sy")) / lit(1.0e6)) * (dbl(col("_sy")) / lit(1.0e6)) / nD) /
        (nD - lit(1.0))).otherwise(lit(null))
    def cell(t: Boolean, p: Boolean, c: Column): Column =
      max(when(col("is_treated") === t && col("is_post") === p, c))
    val piv = cells.agg(
      cell(true, true, mean).as("_mtp"), cell(true, false, mean).as("_mt0"),
      cell(false, true, mean).as("_mcp"), cell(false, false, mean).as("_mc0"),
      cell(true, true, s2 / nD).as("_vtp"), cell(true, false, s2 / nD).as("_vt0"),
      cell(false, true, s2 / nD).as("_vcp"), cell(false, false, s2 / nD).as("_vc0"),
      min(col("n_units")).as("_minn"))
    val varSum = col("_vtp") + col("_vt0") + col("_vcp") + col("_vc0")
    val verdict = piv.select(
      ((col("_mtp") - col("_mt0")) - (col("_mcp") - col("_mc0")))
        .as("did_estimate"),
      when(col("_minn") < 2L || varSum <= 0.0, lit(null))
        .otherwise(sqrt(varSum)).as("se"),
      when(col("_minn") < 2L || varSum <= 0.0, lit(null))
        .otherwise(((col("_mtp") - col("_mt0")) - (col("_mcp") - col("_mc0")))
          / sqrt(varSum)).as("t_stat"))
    cells.crossJoin(broadcast(verdict))
      .select(col("is_treated"), col("is_post"), col("n_units"),
        mean.as("mean_metric"), col("did_estimate"), col("se"), col("t_stat"))
  }

  /** Empirical-Bayes rate shrinkage (beta-binomial, method of moments —
    * Robbins 1956's program in its standard industrial form, e.g.
    * Efron & Morris JASA 1975): per-item success rates `x/n` are noisy
    * for small n; fit a Beta(α, β) prior ACROSS items by moments
    * (`m = mean(p_i)`, `v = var(p_i)`, strength `K = m(1−m)/v − 1`,
    * α = mK, β = (1−m)K) and report the posterior mean
    * `(x + mK)/(n + K)` — small-n items shrink toward the global rate,
    * large-n items keep their own. The standard fix for "this SKU has
    * 1/1 = 100% returns" leaderboard artifacts.
    *
    * Determinism: per-item (n, x) are exact integers; the prior moments
    * fold `p_i` and `p_i²` in ITEM ORDER over one sorted collect (the
    * items table is vocabulary-sized by contract — bucket raw keys
    * upstream), and every downstream double derives through one fixed
    * chain. A degenerate prior (zero between-item variance, or
    * v ≥ m(1−m) which implies non-positive strength) yields null
    * `prior_strength` and `rate_shrunk = rate_raw` — no fabricated
    * shrinkage. Items with n = 0 cannot occur (they have no rows).
    *
    * Output per item: `(itemCol, n_trials, n_success, rate_raw,
    * rate_shrunk)` plus the scalar prior `(prior_mean, prior_strength)`
    * repeated per row.
    *
    * Scale shape: ONE map-side-combined aggregation to the item
    * vocabulary, a 1-row moment fold, and a broadcast back — nothing
    * item-squared, nothing data-sized past the first shuffle. */
  def ebShrinkRates(df: DataFrame, itemCol: String,
                    successCol: String): DataFrame = {
    val items = df
      .filter(col(itemCol).isNotNull && col(successCol).isNotNull)
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("n_trials"),
        sum(when(col(successCol), 1L).otherwise(0L)).as("n_success"))
      .localCheckpoint(false) // moment fold + output rows
    val p = col("n_success").cast("double") / col("n_trials").cast("double")
    val prior = items
      .agg(count(lit(1)).as("_ni"),
        sort_array(collect_list(struct(col(itemCol), col("n_trials"),
          col("n_success")))).as("_t"))
      .select(col("_ni"),
        aggregate(col("_t"), lit(0.0), (acc, t) =>
          acc + t("n_success").cast("double") / t("n_trials").cast("double"))
          .as("_sp"),
        aggregate(col("_t"), lit(0.0), (acc, t) =>
          acc + (t("n_success").cast("double") / t("n_trials").cast("double"))
            * (t("n_success").cast("double") / t("n_trials").cast("double")))
          .as("_spp"))
      .select(
        (col("_sp") / col("_ni").cast("double")).as("prior_mean"),
        (col("_spp") / col("_ni").cast("double")
          - (col("_sp") / col("_ni").cast("double"))
          * (col("_sp") / col("_ni").cast("double"))).as("_v"))
      .select(col("prior_mean"),
        when(col("_v") > 0.0 &&
          col("prior_mean") * (lit(1.0) - col("prior_mean")) / col("_v")
            - lit(1.0) > 0.0,
          col("prior_mean") * (lit(1.0) - col("prior_mean")) / col("_v")
            - lit(1.0)).otherwise(lit(null)).as("prior_strength"))
    items.crossJoin(broadcast(prior))
      .select(col(itemCol), col("n_trials"), col("n_success"),
        p.as("rate_raw"),
        when(col("prior_strength").isNull, p)
          .otherwise((col("n_success").cast("double")
            + col("prior_mean") * col("prior_strength"))
            / (col("n_trials").cast("double") + col("prior_strength")))
          .as("rate_shrunk"),
        col("prior_mean"), col("prior_strength"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) two-sample test — the
    * nonparametric companion to [[cupedAdjust]]'s mean-based readout:
    * does arm B's metric STOCHASTICALLY dominate arm A's, robust to the
    * heavy-tailed revenue distributions where t-tests lie. Exact
    * midrank arithmetic on DOUBLED ranks (ties stay integers, the
    * [[Classifier.rankAuc]] device), `U_B = R_B − n_B(n_B+1)/2`, the
    * common-language effect size `auc_b = U_B / (n_A·n_B)` (P(B > A) +
    * ½P(tie)), and the normal-approximation z with the full tie
    * correction `σ² = n_A n_B/12 · (N+1 − Σ(t³−t)/(N(N−1)))`. All
    * counts/rank sums accumulate in decimal(38,0); the z chain is
    * fixed-order doubles. Zero variance (every value tied) nulls `z`.
    *
    * `valueCol` must be an EXACTLY-comparable type for cross-engine
    * runs (integers/decimals — the rank groups by value); unit-level
    * input as in [[cupedAdjust]].
    *
    * Scale shape: units collapse to per-distinct-value counts in one
    * map-side-combined shuffle; the rank window runs over the DISTINCT
    * VALUE table (metric-cardinality sized, the [[Classifier.rankAuc]]
    * shape), and everything after is a single-row aggregate. */
  /** Benjamini–Hochberg FDR adjustment (Benjamini & Hochberg, JRSS-B
    * 1995) over one row per hypothesis: rank p ascending (ties by test
    * id so the rank is total), `q_i = min_{j ≥ i} (p_j · m / j)` via a
    * reverse running min, clamp at 1; reject where `q ≤ alpha` — the
    * step-up rule in its adjusted-p form, so the decision column and
    * the q-values tell one story. Null p rows are excluded (they carry
    * no evidence either way; silently treating them as p = 1 would
    * shift every other rank).
    *
    * Determinism: p values arrive as doubles the caller made
    * bit-identical cross-engine (the repo's test stats derive from
    * exact integer sums — see the q276 gate, where the per-segment p is
    * the transcendental-free Chebyshev bound min(1, 1/z²)); each raw
    * adjustment is ONE multiply + divide of (p, m, rank); the running
    * min and the ≤ alpha comparison are exact on doubles.
    *
    * Scale shape: the input is one row per HYPOTHESIS (m rows, caller-
    * bounded — segments, metrics, arms), so the unpartitioned rank
    * window is over m rows, never the underlying data. Output:
    * `(test, p, rank, q_value, rejected)`. */
  def benjaminiHochberg(df: DataFrame, testCol: String, pCol: String,
                        alpha: Double = 0.05): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha ($alpha) must be in (0,1)")
    val reserved = Seq("_m", "_raw", "test", "p", "rank", "q_value")
    require(!df.columns.exists(c => reserved.contains(c) &&
      c != testCol && c != pCol),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    val base = df.filter(col(pCol).isNotNull)
      .select(col(testCol).as("test"), col(pCol).cast("double").as("p"))
    val m = base.agg(count(lit(1)).as("_m"))
    val wRank = Window.orderBy(col("p"), col("test"))
    val wTail = Window.orderBy(col("rank"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    base.crossJoin(broadcast(m))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("_raw",
        col("p") * col("_m").cast("double") / col("rank").cast("double"))
      .withColumn("q_value", least(lit(1.0), min(col("_raw")).over(wTail)))
      .select(col("test"), col("p"), col("rank"), col("q_value"),
        (col("q_value") <= alpha).as("rejected"))
  }

  /** Propensity-stratified average treatment effect (Rosenbaum & Rubin,
    * "Reducing bias in observational studies using subclassification on
    * the propensity score", JASA 1984): within each covariate stratum
    * the treated share IS the estimated propensity (cell-constant), and
    * the stratified estimator
    * `ATE = Σ_s (n_s / N_used) · (ȳ_treated,s − ȳ_control,s)`
    * equals the Hájek-normalized IPW estimator with those cell-constant
    * weights. Strata missing either arm identify NOTHING and are
    * excluded — reported in `n_strata_dropped` / `n_dropped`, never
    * silently (the brierDecomposition lesson: exclusions must leave a
    * signal).
    *
    * Determinism: outcomes ride the decimal(18,6) micro-unit contract
    * (exact integer sums per (stratum, arm)); each stratum mean is one
    * double division; the ATE folds `(n_s · diff_s)` in STRATUM ORDER
    * over a sorted collect (strata-count terms) and divides once —
    * one fixed double chain cross-engine.
    *
    * Scale shape: one map-side-combined aggregation to
    * (strata × 2 arms) rows, then a strata-bounded fold; nothing
    * data-sized past the first shuffle. Output: ONE row `(n_units,
    * n_used, n_dropped, n_strata, n_strata_dropped, ate)`; ate is null
    * when no stratum has both arms. */
  def stratifiedAte(df: DataFrame, treatedCol: String, outcomeCol: String,
                    strataCols: Seq[String]): DataFrame = {
    require(strataCols.nonEmpty, "at least one stratum column")
    val yi = (col(outcomeCol).cast("decimal(18,6)") * lit(1000000L))
      .cast("decimal(19,0)") // exact micro-units, the diffInDiff contract
    val cells = df
      .filter(col(treatedCol).isNotNull && col(outcomeCol).isNotNull)
      .groupBy(strataCols.map(col) :+ col(treatedCol).as("_t"): _*)
      .agg(count(lit(1)).as("_n"), sum(yi).as("_y"))
    val strata = cells
      .groupBy(strataCols.map(col): _*)
      .agg(sum(col("_n")).as("_ns"), count(lit(1)).as("_arms"),
        sum(when(col("_t"), col("_n"))).as("_nt"),
        sum(when(col("_t"), col("_y"))).as("_yt"),
        sum(when(!col("_t"), col("_n"))).as("_nc"),
        sum(when(!col("_t"), col("_y"))).as("_yc"))
    def dbl(c: Column): Column = c.cast("double")
    val key = concat_ws("", strataCols.map(c => col(c).cast("string")): _*)
    strata
      .select(col("_ns"), col("_arms"),
        key.as("_k"), col("_nt"), col("_yt"), col("_nc"), col("_yc"))
      .agg(
        coalesce(sum(col("_ns")), lit(0L)).as("n_units"),
        coalesce(sum(when(col("_arms") === 2, col("_ns"))), lit(0L))
          .as("n_used"),
        coalesce(sum(when(col("_arms") =!= 2, col("_ns"))), lit(0L))
          .as("n_dropped"),
        count(lit(1)).as("n_strata"),
        coalesce(sum(when(col("_arms") =!= 2, 1L)), lit(0L))
          .as("n_strata_dropped"),
        sort_array(collect_list(when(col("_arms") === 2,
          struct(col("_k"), col("_ns"), col("_nt"), col("_yt"),
            col("_nc"), col("_yc"))))).as("_s"))
      .select(col("n_units"), col("n_used"), col("n_dropped"),
        col("n_strata"), col("n_strata_dropped"),
        when(col("n_used") === 0L, lit(null)).otherwise(
          aggregate(col("_s"), lit(0.0), (acc, t) =>
            acc + dbl(t("_ns")) *
              ((dbl(t("_yt")) / lit(1.0e6)) / dbl(t("_nt"))
                - (dbl(t("_yc")) / lit(1.0e6)) / dbl(t("_nc"))))
            / dbl(col("n_used"))).as("ate"))
  }

  /** CDF of Poisson(1) at k = 0..7 as 12-hex-digit md5-prefix
    * thresholds: `hex(⌊CDF(k) · 16¹²⌋)`, zero-padded. A row's replicate
    * weight is the CASE index of the first threshold its 12-char md5
    * prefix sorts below (lexicographic hex compare ≡ numeric compare —
    * the [[Sampling]] splitTag convention), capped at 8 (tail mass
    * ~1.0e-5, the documented truncation). Computed ONCE here and shared
    * by the operator and the oracle generator, so both plans carry the
    * IDENTICAL literals. */
  private[graft] val poissonCdfHex: Seq[String] = {
    var term = math.exp(-1.0)
    var acc = term
    val buf = Seq.newBuilder[Double]
    buf += acc
    for (k <- 1 to 7) { term = term / k; acc += term; buf += acc }
    buf.result().map(c => f"${math.floor(c * math.pow(16.0, 12)).toLong}%012x")
  }

  /** Poisson bootstrap (Chamandy, Das, Najmi & Wager, "Estimating
    * Uncertainty for Massive Data Streams", Google TR 2012; Efron's
    * bootstrap in its shard-friendly Poisson form): the per-group mean
    * of `valueCol` with a percentile confidence interval from `reps`
    * resample replicates — the one bootstrap that runs in ONE pass over
    * distributed data, because Poisson(1) weights need no global n.
    *
    * Replicate weights are DETERMINISTIC: row i, replicate b gets
    * `w = #{k : md5(id:b:lane)₁₂ ≥ threshold_k}` via [[poissonCdfHex]]
    * (weights 0..8; the >8 tail, mass ~1e-5, is truncated — a bias far
    * below bootstrap noise, and the price of an exactly replayable
    * resample). Replicate b's mean is `Σw·v / Σw` in exact micro-unit
    * integers divided once; the CI is pure order statistics over the
    * `reps` means (sorted by (mean, b) — a total order), so the only
    * doubles are one fixed division chain per replicate.
    *
    * A replicate whose total weight is 0 (only possible for near-empty
    * groups) is dropped and `n_reps_used` says so; lo/hi are NULL
    * unless all `reps` replicates survived — a visible failure beats a
    * silently shifted percentile index.
    *
    * Scale shape: one `reps`-way sequence-explode of the row stream feeding a
    * map-side-combined (group, b) aggregation — shuffle volume is
    * groups × reps AFTER partial aggregation, not rows × reps; then a
    * groups-sized order-statistics fold. No windows, no driver state.
    *
    * Output: `(groupCols…, n_rows, mean, n_reps_used, boot_lo,
    * boot_hi)` — `mean` the exact point estimate, bounds the
    * `loIdx`/`hiIdx`-th order statistics of the replicate means
    * (defaults ≈ central 95% at reps = 64). */
  def poissonBootstrapMean(df: DataFrame, groupCols: Seq[String],
                           idCol: String, valueCol: String,
                           reps: Int = 64, loIdx: Int = 2, hiIdx: Int = 63,
                           lane: String = "boot"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    require(reps >= 4, s"reps ($reps) must be >= 4")
    require(loIdx >= 1 && hiIdx <= reps && loIdx < hiIdx,
      s"need 1 <= loIdx ($loIdx) < hiIdx ($hiIdx) <= reps ($reps)")
    val reserved = Set("_bid", "_v", "_b", "_w", "_hx", "_ws", "_wn", "_m",
      "_ms", "_sv", "n_rows", "n_reps_used")
    require(!df.columns.exists(c => reserved(c) && !groupCols.contains(c)),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    val gcols = groupCols.map(col)
    val rows = df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(gcols ++ Seq(col(idCol).cast("string").as("_bid"),
        (col(valueCol).cast("decimal(18,6)") * 1000000L)
          .cast("long").as("_v")): _*)
      // a value overflowing the decimal(18,6) micro-unit seam would cast
      // to NULL post-filter and silently drop out of the replicate sums
      // while count still counted the row — fail LOUDLY instead (the
      // plattScale |score| guard, in-plan form: no extra job)
      .filter(assert_true(col("_v").isNotNull,
        lit(s"poissonBootstrapMean: $valueCol overflows the decimal(18,6)" +
          " micro-unit seam (needs |value| < 1e12 at 6dp)")).isNull)
      .localCheckpoint(false) // feeds the point estimate AND the replicates
    val point = rows.groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("_v").cast("decimal(38,0)")).as("_sv"))
      .select(gcols ++ Seq(col("n_rows"),
        (col("_sv").cast("double") / col("n_rows").cast("double") /
          lit(1.0e6)).as("mean")): _*)
    val hx = substring(
      md5(concat(col("_bid"), lit(":"), col("_b").cast("string"),
        lit(":" + lane))), 1, 12)
    // the weight ladder references its hash once per THRESHOLD, and nested
    // CASE WHEN branches are conditionally evaluated — codegen's common-
    // subexpression elimination does not hoist them, so an inlined `hx`
    // re-hashed up to |cdf| times per (row, replicate) (the md5 dominated
    // the whole explode stage). Materializing the hash as its own projected
    // column pins ONE evaluation; CollapseProject keeps non-cheap
    // expressions it would have to duplicate, so the projection survives.
    val w = poissonCdfHex.zipWithIndex
      .foldRight(lit(poissonCdfHex.length.toLong): Column) {
        case ((t, k), rest) =>
          when(col("_hx") < lit(t), lit(k.toLong)).otherwise(rest)
      }
    val byRep = rows
      .select(gcols ++ Seq(col("_bid"), col("_v"),
        explode(sequence(lit(1), lit(reps))).as("_b")): _*)
      .select(gcols ++ Seq(col("_v"), col("_b"), hx.as("_hx")): _*)
      .select(gcols ++ Seq(col("_v"), col("_b"), w.as("_w")): _*)
      .groupBy(gcols :+ col("_b"): _*)
      .agg(sum((col("_w") * col("_v")).cast("decimal(38,0)")).as("_ws"),
        sum(col("_w")).as("_wn"))
      .filter(col("_wn") > 0L)
      .select(gcols ++ Seq(col("_b"),
        (col("_ws").cast("double") / col("_wn").cast("double") /
          lit(1.0e6)).as("_m")): _*)
    val ci = byRep.groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_reps_used"),
        sort_array(collect_list(struct(col("_m"), col("_b")))).as("_ms"))
      .select(gcols ++ Seq(col("n_reps_used"),
        when(col("n_reps_used") === reps,
          element_at(col("_ms"), loIdx)("_m")).as("boot_lo"),
        when(col("n_reps_used") === reps,
          element_at(col("_ms"), hiIdx)("_m")).as("boot_hi")): _*)
    point.join(ci, groupCols)
      .select(gcols ++ Seq(col("n_rows"), col("mean"), col("n_reps_used"),
        col("boot_lo"), col("boot_hi")): _*)
  }

  /** Cohen's d standardized effect size (Cohen 1988) with Hedges' g
    * small-sample correction (Hedges 1981) — the continuous companion
    * to [[abReport]]'s rate lift: HOW BIG is the arm difference in
    * pooled-standard-deviation units, comparable across metrics?
    *
    *   d = (x̄_A − x̄_B) / s_p,   s_p² = ((n_A−1)s_A² + (n_B−1)s_B²) / df
    *   g = J·d,  J = 1 − 3/(4·df − 1),  df = n_A + n_B − 2
    *
    * Determinism: per-arm n / Σv / Σv² are exact integers on the
    * micro-unit seam (|value| ≤ 10³ with ≤ 6 decimals keeps Σv² inside
    * decimal(38,0) for ~10⁶ rows per arm at the extreme); every output
    * is one fixed IEEE chain over the six sums (division, subtraction,
    * sqrt — all correctly rounded), so no rounding is applied anywhere.
    * Arms with n < 2, or a zero pooled SD (both arms constant), null
    * the effect fields rather than dividing by zero. Input is
    * UNIT-LEVEL (aggregate events upstream); rows outside the two
    * named arms or with null values are ignored.
    *
    * Scale shape: ONE map-side-combined aggregation to two 3-sum rows;
    * everything after is a 1-row pivot. Output: ONE row `(n_a, n_b,
    * mean_a, mean_b, pooled_sd, cohens_d, hedges_g)`. */
  def cohensD(df: DataFrame, armCol: String, valueCol: String,
              armA: String, armB: String): DataFrame = {
    require(armA != armB, "the two arms must differ")
    val v = (col(valueCol).cast("decimal(18,6)") * 1000000L)
      .cast("decimal(38,0)")
    val sums = df
      .filter(col(armCol).isin(armA, armB) && col(valueCol).isNotNull)
      // enforce the documented |value| bound: an overflowing decimal(18,6)
      // cast yields NULL post-filter, dropping out of Σv/Σv² while
      // count(lit(1)) still counts the row — a silently skewed mean/SD
      // where the DuckDB oracle would raise. Loud in-plan guard instead.
      .filter(assert_true(v.isNotNull,
        lit(s"cohensD: $valueCol overflows the decimal(18,6) micro-unit" +
          " seam (needs |value| < 1e12 at 6dp)")).isNull)
      .groupBy((col(armCol) === armA).as("_isA"))
      .agg(count(lit(1)).as("_n"), sum(v).as("_s"), sum(v * v).as("_ss"))
    val piv = sums.agg(
      coalesce(sum(when(col("_isA"), col("_n"))), lit(0L)).as("n_a"),
      coalesce(sum(when(!col("_isA"), col("_n"))), lit(0L)).as("n_b"),
      sum(when(col("_isA"), col("_s"))).as("_sa"),
      sum(when(!col("_isA"), col("_s"))).as("_sb"),
      sum(when(col("_isA"), col("_ss"))).as("_ssa"),
      sum(when(!col("_isA"), col("_ss"))).as("_ssb"))
    def dbl(c: Column): Column = c.cast("double")
    def mean(s: String, n: String): Column =
      dbl(col(s)) / lit(1.0e6) / dbl(col(n))
    // sample variance from exact sums: (Σv²/1e12 − (Σv/1e6)²/n)/(n−1)
    def ss(s: String, ssq: String, n: String): Column =
      dbl(col(ssq)) / lit(1.0e12) -
        (dbl(col(s)) / lit(1.0e6)) * (dbl(col(s)) / lit(1.0e6)) / dbl(col(n))
    val dfree = dbl(col("n_a")) + dbl(col("n_b")) - lit(2.0)
    val sp = sqrt((ss("_sa", "_ssa", "n_a") + ss("_sb", "_ssb", "n_b")) / dfree)
    val d = (mean("_sa", "n_a") - mean("_sb", "n_b")) / sp
    val j = lit(1.0) - lit(3.0) / (lit(4.0) * dfree - lit(1.0))
    val ok = col("n_a") >= 2L && col("n_b") >= 2L && sp > 0.0
    piv.select(col("n_a"), col("n_b"),
      when(col("n_a") > 0L, mean("_sa", "n_a")).as("mean_a"),
      when(col("n_b") > 0L, mean("_sb", "n_b")).as("mean_b"),
      when(col("n_a") >= 2L && col("n_b") >= 2L, sp).as("pooled_sd"),
      when(ok, d).as("cohens_d"),
      when(ok, j * d).as("hedges_g"))
  }

  /** Mantel–Haenszel pooled odds ratio (Mantel & Haenszel, JNCI 1959)
    * with the Robins–Breslow–Greenland SE (Biometrics 1986) — THE
    * stratified 2×2 readout: does treatment associate with the outcome
    * once a confounder (the stratum) is held fixed? Completes the
    * stratified set next to [[stratifiedAte]] (means) and
    * [[srmCheck]]/[[abReport]] (marginal rates).
    *
    *   OR_MH = Σᵢ aᵢdᵢ/nᵢ ÷ Σᵢ bᵢcᵢ/nᵢ  (= R/S)
    *   var(ln OR) = ΣPR/(2R²) + Σ(PS+QR)/(2RS) + ΣQS/(2S²)
    *
    * with per-stratum P = (a+d)/n, Q = (b+c)/n, R = ad/n, S = bc/n.
    *
    * Determinism: the four cells are exact integers from ONE
    * aggregation; every per-stratum term is a fixed IEEE shape of
    * them; the six pooled sums fold in stratum order over one sorted
    * collect (strata are a confounder's vocabulary — bounded by
    * contract); `or_mh`/`log_or`/`se_log_or`/`z` are single fixed
    * chains over the six sums, 6dp floor-rounded (the ln-seam
    * convention). Degenerate pooling (R = 0 or S = 0 — some cell empty
    * in EVERY stratum) nulls the ratio fields rather than emitting
    * ±∞; zero variance nulls `z`.
    *
    * Scale shape: one (stratum, treated, outcome)-keyed count
    * aggregation (map-side combined, ≤ 4·|strata| rows), one pivot to
    * 2×2 rows, one 1-row fold. Input is UNIT-LEVEL (dedupe users
    * upstream — this operator must not guess the unit).
    *
    * Output: ONE row `(n_strata, n_units, or_mh, log_or, se_log_or,
    * z)`. */
  def mantelHaenszel(df: DataFrame, stratumCol: String,
                     treatedCol: String, outcomeCol: String): DataFrame = {
    val cells = df
      .filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).as("_st"))
      .agg(
        sum(when(col(treatedCol) && col(outcomeCol), 1L)
          .otherwise(0L)).as("_a"),
        sum(when(col(treatedCol) && !col(outcomeCol), 1L)
          .otherwise(0L)).as("_b"),
        sum(when(!col(treatedCol) && col(outcomeCol), 1L)
          .otherwise(0L)).as("_c"),
        sum(when(!col(treatedCol) && !col(outcomeCol), 1L)
          .otherwise(0L)).as("_d"))
    def dbl(c: Column): Column = c.cast("double")
    val folded = cells
      .agg(count(lit(1)).as("n_strata"),
        sum(col("_a") + col("_b") + col("_c") + col("_d")).as("n_units"),
        sort_array(collect_list(struct(col("_st"), col("_a"), col("_b"),
          col("_c"), col("_d")))).as("_cl"))
    // six pooled sums, each a stratum-ordered left fold from 0.0
    def fold(term: Column => Column): Column =
      aggregate(col("_cl"), lit(0.0), (acc, s) => acc + term(s))
    def n(s: Column): Column = dbl(s("_a") + s("_b") + s("_c") + s("_d"))
    val rSum = fold(s => dbl(s("_a")) * dbl(s("_d")) / n(s))
    val sSum = fold(s => dbl(s("_b")) * dbl(s("_c")) / n(s))
    val prSum = fold(s => (dbl(s("_a") + s("_d")) / n(s)) *
      (dbl(s("_a")) * dbl(s("_d")) / n(s)))
    val qsSum = fold(s => (dbl(s("_b") + s("_c")) / n(s)) *
      (dbl(s("_b")) * dbl(s("_c")) / n(s)))
    val midSum = fold(s =>
      (dbl(s("_a") + s("_d")) / n(s)) * (dbl(s("_b")) * dbl(s("_c")) / n(s)) +
      (dbl(s("_b") + s("_c")) / n(s)) * (dbl(s("_a")) * dbl(s("_d")) / n(s)))
    def rf6(c: Column): Column = graft.functions.ExactRound.roundFloor(c, 6)
    folded
      .select(col("n_strata"), col("n_units"),
        rSum.as("_r"), sSum.as("_s"), prSum.as("_pr"), qsSum.as("_qs"),
        midSum.as("_mid"))
      .select(col("n_strata"), col("n_units"),
        when(col("_r") > 0.0 && col("_s") > 0.0,
          rf6(col("_r") / col("_s"))).as("or_mh"),
        when(col("_r") > 0.0 && col("_s") > 0.0,
          rf6(log(col("_r") / col("_s")))).as("log_or"),
        when(col("_r") > 0.0 && col("_s") > 0.0,
          rf6(sqrt(
            col("_pr") / (lit(2.0) * col("_r") * col("_r")) +
            col("_mid") / (lit(2.0) * col("_r") * col("_s")) +
            col("_qs") / (lit(2.0) * col("_s") * col("_s")))))
          .as("se_log_or"))
      .select(col("n_strata"), col("n_units"), col("or_mh"), col("log_or"),
        col("se_log_or"),
        when(col("se_log_or") > 0.0,
          rf6(col("log_or") / col("se_log_or"))).otherwise(lit(null))
          .as("z"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic per group (Smirnov 1939;
    * the standard distribution-shift test between two arms or two data
    * slices): `D = sup_v |F_A(v) − F_B(v)|`, computed EXACTLY as an
    * integer maximum — at each distinct value the deviation numerator is
    * `|cumA·n_B − cumB·n_A|` (cross-multiplied ECDFs, no division inside
    * the max), so the argmax never suffers float ties; `ks_d` is then
    * ONE double division and `ks_lambda = √(n_A·n_B/(n_A+n_B))·D` the
    * usual asymptotic scaling (√ and · are IEEE-exact in fixed order; the
    * p-value needs the Kolmogorov series' exp terms, which are not
    * bit-replayable cross-engine — consumers threshold λ directly, e.g.
    * λ > 1.358 ≈ α 0.05).
    *
    * Scale shape (the [[mannWhitney]] contract): units collapse to
    * per-distinct-value counts in one map-side-combined shuffle; the
    * cumulative window runs over the DISTINCT-VALUE table per group
    * (metric-cardinality sized, not data sized); counts and products
    * accumulate in decimal(38,0). `valueCol` must be exactly comparable
    * (integers/decimals). Groups missing an arm yield null statistics.
    * Output: `(groupCols…, n_a, n_b, ks_d, ks_lambda)`. */
  def ksTest(df: DataFrame, groupCols: Seq[String], armCol: String,
             valueCol: String, armA: String, armB: String): DataFrame = {
    require(armA != armB, "the two arms must differ")
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    val reserved = Seq("_v", "_ca", "_cb", "_na", "_nb", "_cra", "_crb",
      "_dev", "_dnum")
    require(!df.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    val d38 = "decimal(38,0)"
    val groups = groupCols.map(col)
    val cnt = df
      .filter(col(armCol).isin(armA, armB) && col(valueCol).isNotNull)
      .groupBy(groups :+ col(valueCol).as("_v"): _*)
      .agg(sum(when(col(armCol) === armA, 1L).otherwise(0L)).as("_ca"),
        sum(when(col(armCol) === armB, 1L).otherwise(0L)).as("_cb"))
    val tot = cnt.groupBy(groups: _*)
      .agg(sum(col("_ca")).cast(d38).as("_na"),
        sum(col("_cb")).cast(d38).as("_nb"))
    val w = Window.partitionBy(groups: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dmax = cnt
      .withColumn("_cra", sum(col("_ca")).over(w).cast(d38))
      .withColumn("_crb", sum(col("_cb")).over(w).cast(d38))
      .join(tot, groupCols)
      .withColumn("_dev",
        abs(col("_cra") * col("_nb") - col("_crb") * col("_na")))
      .groupBy(groups: _*).agg(max(col("_dev")).as("_dnum"))
    def dbl(c: Column): Column = c.cast("double")
    val degenerate = col("_na") === 0 || col("_nb") === 0
    val ksd = dbl(col("_dnum")) / dbl(col("_na") * col("_nb"))
    val lambda = sqrt(dbl(col("_na")) * dbl(col("_nb"))
      / (dbl(col("_na")) + dbl(col("_nb")))) * ksd
    dmax.join(tot, groupCols)
      .select(groups ++ Seq(
        col("_na").cast("long").as("n_a"),
        col("_nb").cast("long").as("n_b"),
        when(degenerate, lit(null)).otherwise(ksd).as("ks_d"),
        when(degenerate, lit(null)).otherwise(lambda).as("ks_lambda")): _*)
  }

  def mannWhitney(df: DataFrame, armCol: String, valueCol: String,
                  armA: String, armB: String): DataFrame = {
    require(armA != armB, "the two arms must differ")
    val d38 = "decimal(38,0)"
    val cnt = df
      .filter(col(armCol).isin(armA, armB) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_c"),
        sum(when(col(armCol) === armB, 1L).otherwise(0L)).as("_b"))
    val w = Window.orderBy(col("_v"))
    // doubled midrank of a tie-run starting at rmin with c members:
    // 2·mid = 2·rmin + (c − 1) — an exact integer
    val ranked = cnt.withColumn("_rmin",
      coalesce(sum(col("_c")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)) + 1L)
    val tot = ranked.agg(
      sum(col("_c")).cast(d38).as("_n"),
      sum(col("_b")).cast(d38).as("_nb"),
      sum(col("_b").cast(d38) *
        (lit(2L) * col("_rmin") + col("_c") - 1L).cast(d38)).as("_2rb"),
      sum(col("_c").cast(d38) * col("_c").cast(d38) * col("_c").cast(d38)
        - col("_c").cast(d38)).as("_ties"))
    def dbl(c: Column): Column = c.cast("double")
    val n = dbl(col("_n")); val nb = dbl(col("_nb"))
    val na = n - nb
    // U_B = R_B − n_B(n_B+1)/2, from the doubled rank sum
    val u = (dbl(col("_2rb")) - nb * (nb + lit(1.0))) / lit(2.0)
    val variance = (na * nb / lit(12.0)) *
      ((n + lit(1.0)) - dbl(col("_ties")) / (n * (n - lit(1.0))))
    tot.select(
      na.cast("long").as("n_a"), nb.cast("long").as("n_b"),
      u.as("u_b"),
      (u / (na * nb)).as("auc_b"),
      when(variance <= 0.0 || na === 0.0 || nb === 0.0, lit(null))
        .otherwise((u - na * nb / lit(2.0)) / sqrt(variance)).as("z"))
  }
}
