package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention — the classic product-analytics curve: users are
  * assigned to the cohort of their first-active period, and cell
  * `(cohort_period, period_offset)` reports what fraction of that cohort
  * was active `offset` periods later.
  */
object Retention {

  /** Periods are `periodDays`-wide integer buckets of epoch time
    * (`floor(epoch_us / (periodDays · 86400e6))` — calendar-free, so the
    * arithmetic is a pure function both engines replay identically; the
    * division runs in doubles where every operand is < 2⁵³, exact).
    *
    * Output: `(cohort_period, period_offset, n_active, cohort_size,
    * retention)`, one row per non-empty cell; `period_offset = 0` rows
    * have `n_active = cohort_size` by construction, and `retention` is
    * the one double division.
    *
    * Scale shape: the corpus collapses to distinct (user, period) in one
    * map-side-combined shuffle on user; the first-period aggregate GROUPS
    * ON THE SAME KEY, so Catalyst reuses the exchange and the user-keyed
    * join that follows is co-partitioned (no third corpus-wide shuffle).
    * Cells aggregate to cohort×offset (calendar-sized); cohort sizes come
    * back via a broadcast join. Nothing here is ever corpus-quadratic and
    * no state exceeds (users × active-periods). */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String,
                      periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1 && periodDays <= 366,
      s"periodDays ($periodDays) must be in [1, 366]")
    val reserved = Seq("_u", "_p", "_cp")
    require(!reserved.exists(df.columns.contains),
      s"inputs must not contain the reserved columns ${reserved.mkString(", ")}")
    val periodUs = 86400e6 * periodDays
    val per = floor(unix_micros(col(tsCol)).cast("double") / lit(periodUs))
      .cast("long")
    // null user ids / timestamps carry no activity signal: a null period
    // would otherwise surface as a null offset cell (min() skips nulls, so
    // it could never BE a cohort anchor, only a dangling offset), and a
    // null user would become a phantom single-"user" cohort
    val pers = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), per.as("_p")).distinct()
    val first = pers.groupBy("_u").agg(min("_p").as("_cp"))
    val cells = pers.join(first, "_u")
      .groupBy(col("_cp").as("cohort_period"),
        (col("_p") - col("_cp")).as("period_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = cells.filter(col("period_offset") === 0)
      .select(col("cohort_period"), col("n_active").as("cohort_size"))
    cells.join(broadcast(sizes), Seq("cohort_period"))
      .select(col("cohort_period"), col("period_offset"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
  }

  /** Longest-streak analysis (the gaps-and-islands pattern): per user, the
    * count of active periods, the number of maximal CONSECUTIVE runs, and
    * the longest run with its bounds. Island key = `period − row_number()`
    * — constant exactly within a consecutive run, the classic O(1)-state
    * trick; no self-join, no recursion.
    *
    * The longest run picks deterministically: lexicographic max of
    * `(length, start, end)` — the LATEST of equal-length streaks.
    *
    * Scale shape: distinct (user, period) in one map-side-combined
    * shuffle; the island window and both aggregates reuse the same user
    * partitioning (per-user state = active periods, never raw rows).
    * Null users/timestamps excluded as in [[cohortRetention]]. */
  def activityStreaks(df: DataFrame, userCol: String, tsCol: String,
                      periodDays: Int = 1): DataFrame = {
    require(periodDays >= 1 && periodDays <= 366,
      s"periodDays ($periodDays) must be in [1, 366]")
    val reserved = Seq("_u", "_p", "_i", "_b")
    require(!reserved.exists(df.columns.contains),
      s"inputs must not contain the reserved columns ${reserved.mkString(", ")}")
    val periodUs = 86400e6 * periodDays
    val per = floor(unix_micros(col(tsCol)).cast("double") / lit(periodUs))
      .cast("long")
    val days = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), per.as("_p")).distinct()
    val w = Window.partitionBy("_u").orderBy(col("_p"))
    val islands = days
      .withColumn("_i", col("_p") - row_number().over(w))
      .groupBy(col("_u"), col("_i"))
      .agg(count(lit(1)).as("len"), min("_p").as("s"), max("_p").as("e"))
    islands.groupBy(col("_u").as(userCol))
      .agg(sum("len").as("n_active_periods"),
        count(lit(1)).as("n_streaks"),
        max(struct(col("len"), col("s"), col("e"))).as("_b"))
      .select(col(userCol), col("n_active_periods"), col("n_streaks"),
        col("_b.len").as("longest_streak"),
        col("_b.s").as("streak_start"), col("_b.e").as("streak_end"))
  }

  /** Kaplan–Meier survival curves (Kaplan & Meier JASA 1958) — the
    * censoring-correct churn/retention estimator: per group, at each
    * time where ≥ 1 event (churn) occurred,
    * `S(t) = Π_{s ≤ t} (1 − d_s / n_s)` with `d_s` = events at `s` and
    * `n_s` = subjects still at risk (duration ≥ s, churned OR censored —
    * the point of KM: a user still active at the observation edge is not
    * a churn, but is evidence of survival).
    *
    * Input is SUBJECT-LEVEL: one row per subject with `durationCol`
    * (integer-ish time-to-end) and boolean `eventCol` (true = the end
    * was an event, false = censored). Null durations are excluded.
    *
    * Determinism: `d`/`n` are exact integers; each `S(t)` is a
    * time-ascending left fold `((1·f₁)·f₂)…` of `1 − d/n` doubles —
    * fixed order, replayed by the oracle's `list_prepend(1.0, …)` fold.
    *
    * Scale shape: subjects collapse to per-(group, t) counts in one
    * map-side-combined shuffle; the at-risk counts are a DESC running
    * sum over that (group × distinct-times)-sized table; the survival
    * fold runs over each group's EVENT-time array — so distinct event
    * times per group must be modest (bucket durations to days/weeks
    * upstream; curves with millions of distinct times are plots nobody
    * reads). Output: `(groupCols…, t, n_risk, n_events, survival)`. */
  def kaplanMeier(df: DataFrame, groupCols: Seq[String], durationCol: String,
                  eventCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    val reserved = Seq("_t", "_ends", "_a", "_x", "t", "n_risk", "n_events",
      "survival")
    require(!df.columns.exists(c => reserved.contains(c) &&
      !groupCols.contains(c) && c != durationCol && c != eventCol),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    val gcols = groupCols.map(col)
    val perT = df
      .filter(col(durationCol).isNotNull)
      .groupBy(gcols :+ col(durationCol).cast("long").as("_t"): _*)
      .agg(count(lit(1)).as("_ends"),
        sum(when(col(eventCol), 1L).otherwise(0L)).as("n_events"))
    val wDesc = Window.partitionBy(gcols: _*).orderBy(col("_t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = perT
      .withColumn("n_risk", sum(col("_ends")).over(wDesc))
      .filter(col("n_events") > 0L)
    val folded = ev
      .groupBy(gcols: _*)
      .agg(sort_array(collect_list(struct(col("_t"), col("n_events"),
        col("n_risk")))).as("_a"))
      .select(gcols :+ explode(aggregate(col("_a"),
        array().cast(
          "array<struct<t:bigint,n_events:bigint,n_risk:bigint,survival:double>>"),
        (acc, x) => concat(acc, array(struct(
          x("_t").as("t"), x("n_events").as("n_events"),
          x("n_risk").as("n_risk"),
          (when(size(acc) === 0, lit(1.0))
            .otherwise(element_at(acc, size(acc))("survival")) *
            (lit(1.0) - x("n_events").cast("double")
              / x("n_risk").cast("double"))).as("survival"))))))
        .as("_x"): _*)
    folded.select(gcols ++ Seq(col("_x.t").as("t"),
      col("_x.n_risk").as("n_risk"), col("_x.n_events").as("n_events"),
      col("_x.survival").as("survival")): _*)
  }

  /** Two-sample log-rank test (Mantel, Cancer Chemother. Rep. 1966;
    * the Mantel–Haenszel form) — does arm B's survival curve differ
    * from arm A's, the inferential companion to [[kaplanMeier]]'s
    * descriptive curves. At every pooled event time t:
    * `O += d_A(t)`, `E += d(t)·n_A(t)/n(t)`,
    * `V += d(t)·(n_A/n)·(1 − n_A/n)·(n − d)/(n − 1)` (hypergeometric
    * variance; times with n ≤ 1 contribute 0), then
    * `z = (O − E)/√V` and `chi2 = z²` (1 df).
    *
    * Determinism: every count is an exact integer built from one
    * pooled time grid (each arm's at-risk is a suffix sum over the
    * SHARED grid, so both engines see identical n_A(t) even at times
    * where only the other arm has rows); E and V fold their terms in
    * ascending-t order over a sorted collect — one fixed double chain.
    * Zero variance (no events, or every at-risk set degenerate) nulls
    * `z`/`chi2` rather than dividing by zero.
    *
    * Input is unit-level as [[kaplanMeier]]: one row per subject with
    * `(armCol, durationCol, eventCol)`; rows outside the two named
    * arms are ignored, null durations excluded.
    *
    * Scale shape: one (arm, t) aggregation, a grid join of
    * event-time-cardinality size, per-arm suffix-sum windows over that
    * calendar-sized grid (never the subject table), and a 1-row fold.
    *
    * Output: ONE row `(n_a, n_b, observed_a, expected_a, variance,
    * z, chi2)`. */
  def logRankTest(df: DataFrame, armCol: String, durationCol: String,
                  eventCol: String, armA: String, armB: String): DataFrame = {
    require(armA != armB, "the two arms must differ")
    val rows = df
      .filter(col(armCol).isin(armA, armB) && col(durationCol).isNotNull)
      .select((col(armCol) === armA).as("_isA"),
        col(durationCol).cast("long").as("_t"),
        when(col(eventCol), 1L).otherwise(0L).as("_e"))
      .localCheckpoint(false) // arm totals + per-time grid
    val perT = rows.groupBy(col("_isA"), col("_t"))
      .agg(count(lit(1)).as("_ends"), sum(col("_e")).as("_d"))
    val times = perT.select("_t").distinct()
    val grid = times
      .crossJoin(broadcast(rows.sparkSession.range(2)
        .select((col("id") === 0L).as("_isA"))))
      .join(perT, Seq("_isA", "_t"), "left")
      .select(col("_isA"), col("_t"),
        coalesce(col("_ends"), lit(0L)).as("_ends"),
        coalesce(col("_d"), lit(0L)).as("_d"))
    val wDesc = Window.partitionBy(col("_isA")).orderBy(col("_t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = grid.withColumn("_n", sum(col("_ends")).over(wDesc))
    val byT = atRisk.groupBy(col("_t"))
      .agg(sum(when(col("_isA"), col("_d"))).as("_da"),
        sum(when(col("_isA"), col("_n"))).as("_na"),
        sum(col("_d")).as("_dt"), sum(col("_n")).as("_nt"))
      .filter(col("_dt") > 0L)
    val totals = rows.agg(
      sum(when(col("_isA"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("_isA"), 0L).otherwise(1L)).as("n_b"))
    val folded = byT.agg(
      coalesce(sum(col("_da")), lit(0L)).as("observed_a"),
      sort_array(collect_list(struct(col("_t"), col("_da"), col("_na"),
        col("_dt"), col("_nt")))).as("_terms"))
    def dbl(c: Column): Column = c.cast("double")
    val e = aggregate(col("_terms"), lit(0.0), (acc, x) =>
      acc + dbl(x("_dt")) * dbl(x("_na")) / dbl(x("_nt")))
    val v = aggregate(col("_terms"), lit(0.0), (acc, x) => {
      val frac = dbl(x("_na")) / dbl(x("_nt"))
      acc + when(x("_nt") <= 1L, lit(0.0)).otherwise(
        dbl(x("_dt")) * frac * (lit(1.0) - frac) *
          (dbl(x("_nt")) - dbl(x("_dt"))) / (dbl(x("_nt")) - lit(1.0)))
    })
    folded.crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"), col("observed_a"),
        e.as("expected_a"), v.as("variance"),
        when(v <= 0.0, lit(null))
          .otherwise((dbl(col("observed_a")) - e) / sqrt(v)).as("z"),
        when(v <= 0.0, lit(null))
          .otherwise((dbl(col("observed_a")) - e) / sqrt(v) *
            ((dbl(col("observed_a")) - e) / sqrt(v))).as("chi2"))
  }

  /** Cohort LTV curve: users cohort by their FIRST active period;
    * cell `(cohort, age)` reports the cohort's revenue in its
    * age-th period, the running cumulative, and cumulative LTV per
    * cohort user — the monetary companion to [[cohortRetention]]'s
    * activity curve.
    *
    * Exactness: periods are integer buckets (caller-computed,
    * [[growthAccounting]]'s contract); revenue rides the decimal(18,6)
    * micro-unit lane and sums as exact longs; `ltv` is one double
    * division of exact integers per cell. Null-user/period rows are
    * excluded; null values count 0 revenue. Cells with activity but
    * no revenue still appear (revenue 0).
    *
    * Scale shape: one user-keyed first-period aggregate, one
    * user-keyed join reusing that exchange, ONE collapse to
    * (cohort, age) cells, a cohort-partitioned cumulative window over
    * calendar-sized cells, cohort sizes broadcast back. Output:
    * `(cohort, age, cohort_size, revenue, cum_revenue, ltv)`. */
  def ltvCurve(df: DataFrame, userCol: String, periodCol: String,
               valueCol: String): DataFrame = {
    val base = df
      .filter(col(userCol).isNotNull && col(periodCol).isNotNull)
      .select(col(userCol).as("_u"), col(periodCol).cast("long").as("_p"),
        coalesce((col(valueCol).cast("decimal(18,6)") * lit(1000000L))
          .cast("long"), lit(0L)).as("_v6"))
      .localCheckpoint(false) // cohort agg + the cell join read it
    val cohorts = base.groupBy("_u").agg(min(col("_p")).as("_cohort"))
      .localCheckpoint(false) // sizes + the cell join read it
    val sizes = cohorts.groupBy("_cohort")
      .agg(count(lit(1)).as("cohort_size"))
    val cells = base.join(cohorts, Seq("_u"))
      .groupBy(col("_cohort"), (col("_p") - col("_cohort")).as("age"))
      .agg(sum(col("_v6")).as("_r6"))
    val w = Window.partitionBy("_cohort").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.withColumn("_c6", sum(col("_r6")).over(w))
      .join(broadcast(sizes), Seq("_cohort"))
      .select(col("_cohort").as("cohort"), col("age"), col("cohort_size"),
        (col("_r6").cast("double") / lit(1.0e6)).as("revenue"),
        (col("_c6").cast("double") / lit(1.0e6)).as("cum_revenue"),
        ((col("_c6").cast("double") / lit(1.0e6)) /
          col("cohort_size").cast("double")).as("ltv"))
  }

  /** DAU/WAU stickiness: per day, the exact count of distinct active
    * users that day (DAU) and over the trailing `windowDays` window
    * (WAU), plus their ratio — the engagement-depth read next to
    * [[growthAccounting]]'s composition one.
    *
    * The trailing-window distinct is computed EXACTLY by turning the
    * range condition into an equi-join: each distinct (user, day)
    * row fans out to the `windowDays` window days it supports
    * (day + 0 … day + w−1), re-distincts (a user active twice inside
    * one window must count once), and aggregates per target day —
    * never a sliding DISTINCT window (not expressible) and never an
    * approximate sketch. Target days beyond the observed spine are
    * clipped by a semi-join, so every output day really occurred.
    * `dayCol` must be integer-valued (epoch-day buckets).
    *
    * Scale shape: one distinct (user, day) collapse; the fan-out is
    * windowDays× that (bounded, uniform — no key can skew it); two
    * map-side-combined counts; the spine semi-join is calendar-sized.
    * Null user/day rows are excluded. Output: `(day, dau, wau,
    * stickiness = dau/wau)`. */
  def stickiness(df: DataFrame, userCol: String, dayCol: String,
                 windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays ($windowDays) must be in [1, 366]")
    val active = df
      .filter(col(userCol).isNotNull && col(dayCol).isNotNull)
      .select(col(userCol).as("_u"), col(dayCol).cast("long").as("_d"))
      .distinct()
      .localCheckpoint(false) // dau + fanout + spine all read it
    val spine = active.select(col("_d")).distinct()
    val dau = active.groupBy(col("_d").as("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = active
      .select(col("_u"), explode(sequence(col("_d"),
        col("_d") + lit(windowDays - 1))).as("day"))
      .distinct()
      .join(spine.select(col("_d").as("day")), Seq("day"), "left_semi")
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau").cast("double"))
          .as("stickiness"))
  }

  /** Growth accounting (the Social-Capital "accounting for growth"
    * decomposition): per integer period, how many active users are
    * `new` (first-ever period), `retained` (also active in period−1),
    * or `resurrected` (active before, but not in period−1) — plus
    * `churned`, users active in period−1 and silent in this one,
    * attributed TO the period they went silent in. `quick_ratio =
    * (new + resurrected) / churned`, the standard health read (null
    * when nobody churned).
    *
    * `periodCol` must be integer-valued (cast to long) and
    * consecutive-meaningful: period p's "previous" is literally
    * p − 1 (epoch-day / epoch-week buckets, year·12+month). Nobody
    * churns past the horizon: users last active in the globally
    * latest period are still "current", so no churn row is emitted at
    * maxPeriod + 1. Null user/period rows are excluded. Exactness:
    * counts are integers; the one division is two exact longs in
    * doubles.
    *
    * Scale shape: the corpus collapses to distinct (user, period)
    * once (map-side combine); the status window and the churn
    * projection reuse that user-keyed exchange; the global max period
    * is a 1-row broadcast. Final counts aggregate to calendar size.
    * Output: `(period, n_new, n_retained, n_resurrected, n_churned,
    * quick_ratio)`. */
  def growthAccounting(df: DataFrame, userCol: String,
                       periodCol: String): DataFrame = {
    val active = df
      .filter(col(userCol).isNotNull && col(periodCol).isNotNull)
      .select(col(userCol).as("_u"), col(periodCol).cast("long").as("_p"))
      .distinct()
      .localCheckpoint(false) // statuses + churn + max all re-read it
    val w = Window.partitionBy(col("_u")).orderBy(col("_p"))
    val marked = active
      .withColumn("_prev", lag(col("_p"), 1).over(w))
      .withColumn("_next", lead(col("_p"), 1).over(w))
      .localCheckpoint(false)
    val statuses = marked.select(col("_p"),
      when(col("_prev").isNull, lit("new"))
        .when(col("_prev") === col("_p") - 1, lit("retained"))
        .otherwise(lit("resurrected")).as("_st"))
    val maxP = active.agg(max(col("_p")).as("_maxp"))
    val churn = marked
      .filter(col("_next").isNull || col("_next") > col("_p") + 1)
      .crossJoin(broadcast(maxP))
      .filter(col("_p") + 1 <= col("_maxp"))
      .select((col("_p") + 1).as("_p"), lit("churned").as("_st"))
    statuses.unionByName(churn)
      .groupBy(col("_p").as("period"))
      .agg(
        sum(when(col("_st") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("_st") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("_st") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"),
        sum(when(col("_st") === "churned", 1L).otherwise(0L))
          .as("n_churned"))
      .withColumn("quick_ratio",
        when(col("n_churned") === 0L, lit(null).cast("double"))
          .otherwise((col("n_new") + col("n_resurrected")).cast("double") /
            col("n_churned").cast("double")))
  }
}
