package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares trend fitting — "is this metric
  * drifting, and how fast, per slice" as one aggregation pass.
  */
object Trend {

  /** OLS fit of `yCol` against `xCol` per group: `(groupCols…, n, slope,
    * intercept, r2)`.
    *
    * Determinism contract (the engine-portability recipe of the quantile/
    * profile family): `xCol` must be integer-valued (cast to long) and
    * `yCol` must carry at most 6 decimal places with |y| < 10¹² (the
    * micro-unit cast below is decimal(18,6); ANSI mode rejects overflow
    * loudly rather than fitting garbage) — the five sufficient
    * statistics (Σx, Σx², Σy, Σxy, Σy²) then accumulate EXACTLY
    * (longs/decimals; Σx² and Σxy products run in decimal(38) so a
    * 100 TB group cannot wrap on the x side — the y side is tighter:
    * Σy² sums micro-unit squares (y²·10¹²) in decimal(38,0), so the r²
    * contract additionally requires Σ y² < 10²⁶ per group. |y| ≤ 10⁹
    * supports ~10⁸ rows/group; at the full |y| < 10¹² bound only ~100
    * rows fit before the sum wraps — past it, ANSI mode throws and
    * non-ANSI silently nulls r², never slope/intercept, which don't
    * touch Σy²), and the closed-form slope/intercept/r²
    * combine those exact sums in doubles with a fixed operand order —
    * bit-identical on any engine and any partitioning, no rounding
    * needed. A degenerate group (single distinct x) yields null slope/
    * intercept/r²; a constant-y group fits slope 0 with null r²
    * (zero variance explained of zero variance).
    *
    * Scale shape: ONE map-side-combined aggregation to five sums per
    * group; nothing is ever sorted or windowed. */
  def trendFit(df: DataFrame, groupCols: Seq[String], xCol: String,
               yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    val x = col(xCol).cast("long")
    val d19 = "decimal(19,0)"
    // y in exact integer MICRO-units: every sum below is then a pure
    // integer, whose decimal→double cast is correctly rounded the same
    // way on every engine. Summing fractional decimals instead (scale 12
    // for Σy²) hits engine-specific decimal→double conversion: DuckDB
    // divides two doubles (value, 10^scale) — two roundings — where the
    // JVM rounds the exact rational once, a measured 1-ulp r² divergence.
    val yi = (col(yCol).cast("decimal(18,6)") * lit(1000000L)).cast(d19)
    val sums = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x).as("_sx"),
        sum(x.cast(d19) * x.cast(d19)).as("_sxx"),
        sum(yi).as("_syi"),
        sum(x.cast(d19) * yi).as("_sxyi"),
        sum(yi * yi).as("_syyi"))
    def dbl(c: String): Column = col(c).cast("double")
    val nD = col("n").cast("double")
    val sy = dbl("_syi") / lit(1.0e6)
    val sxy = dbl("_sxyi") / lit(1.0e6)
    val syy = dbl("_syyi") / lit(1.0e12)
    val denX = nD * dbl("_sxx") - dbl("_sx") * dbl("_sx")
    val denY = nD * syy - sy * sy
    val num = nD * sxy - dbl("_sx") * sy
    val slope = when(denX === 0.0, lit(null)).otherwise(num / denX)
    sums.select(groupCols.map(col) ++ Seq(
      col("n"),
      slope.as("slope"),
      when(denX === 0.0, lit(null))
        .otherwise((sy - (num / denX) * dbl("_sx")) / nD).as("intercept"),
      when(denX === 0.0 || denY === 0.0, lit(null))
        .otherwise(num * num / (denX * denY)).as("r2")): _*)
  }

  /** Seasonal baseline profile: per (group, season) the exact mean and
    * population standard deviation of `valueCol` — the "what is normal
    * for Tuesdays at 9am" table that seasonal anomaly detection and
    * capacity reports diff against. `seasonCol` is the caller's season
    * key (hour-of-day, day-of-week, month — any expression).
    *
    * Determinism is [[trendFit]]'s y-contract verbatim: values in exact
    * integer micro-units (decimal(18,6), |y| < 10¹²; Σy² in
    * decimal(38,0), so |y| ≤ 10⁹ supports ~10⁸ rows per cell), and
    * mean/stddev combine the exact sums in fixed-order doubles —
    * `stddev = √max(0, Σy²/n − mean²)`, the max guarding the tiny
    * negative a constant cell's rounding can produce. Null seasons or
    * values are excluded.
    *
    * Scale shape: ONE map-side-combined aggregation to three sums per
    * (group, season) cell; output is cell-vocabulary sized. */
  def seasonalProfile(df: DataFrame, groupCols: Seq[String],
                      seasonCol: String, valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    val d19 = "decimal(19,0)"
    val yi = (col(valueCol).cast("decimal(18,6)") * lit(1000000L)).cast(d19)
    val keys = groupCols.map(col) :+ col(seasonCol)
    val sums = df
      .filter(col(seasonCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"), sum(yi).as("_syi"),
        sum(yi * yi).as("_syyi"))
    val nD = col("n").cast("double")
    val mean = (col("_syi").cast("double") / lit(1.0e6)) / nD
    val ex2 = (col("_syyi").cast("double") / lit(1.0e12)) / nD
    sums.select(keys ++ Seq(col("n"), mean.as("mean_value"),
      sqrt(greatest(lit(0.0), ex2 - mean * mean)).as("stddev_value")): _*)
  }

  /** Exponentially-weighted moving-average LEVEL per group — the
    * "current smoothed rate" a monitoring pipeline tracks per slice
    * (Hunter 1986, the EWMA control-chart statistic): fold the series
    * in `orderCol` order through `s ← (αNum·x + (αDen−αNum)·s) div
    * αDen`, seeded at the first observation, in EXACT integer
    * micro-units — every step one multiply-add and one integral floor
    * divide, so replays are integer-for-integer and there is no float
    * accumulation anywhere.
    *
    * Contract: `valueCol` must be NON-NEGATIVE integers (counts, the
    * chart's native unit — then truncating `div` ≡ floor `//` across
    * engines; negative values are rejected loudly, not silently
    * floored differently per engine). `orderCol` must be unique within
    * a group (a bucketed series is, by construction). Values are
    * scaled ×10⁶ before folding so the floor retains 6 fractional
    * digits of the level; counts must stay < ~9·10⁸ so `αDen·s` fits a
    * long.
    *
    * The fold runs over a per-group sorted array — sized by the
    * series' BUCKET domain (hours, days), not the data: aggregate your
    * 100 TB to the (group, bucket) grain first (one map-side-combined
    * shuffle), then this is vocabulary-sized work.
    *
    * Output per group: `(…group, n_periods, ewma_e6, ewma)`. */
  def ewmaLevel(df: DataFrame, groupCols: Seq[String], orderCol: String,
                valueCol: String, alphaNum: Long = 1L,
                alphaDen: Long = 4L): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    require(alphaNum > 0 && alphaNum <= alphaDen,
      s"alpha $alphaNum/$alphaDen must be a fraction in (0, 1]")
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    def idiv(a: Column, b: Column): Column = GraftColumnBridge.column(
      IntegralDivide(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b)))
    val v6 = (col(valueCol).cast("long") * lit(1000000L)).as("_v")
    val filtered = df.filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
    val step = (s: Column, x: Column) =>
      idiv(lit(alphaNum) * x + lit(alphaDen - alphaNum) * s, lit(alphaDen))
    filtered
      .select(groupCols.map(col) ++ Seq(col(orderCol).as("_o"),
        assert_true(col(valueCol) >= 0,
          lit(s"ewmaLevel: negative $valueCol")).as("_guard"), v6): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_periods"),
        sort_array(collect_list(struct(col("_o"), col("_v")))).as("_arr"),
        first(col("_guard")).as("_g"))
      .select(groupCols.map(col) ++ Seq(col("n_periods"),
        aggregate(
          slice(col("_arr"), lit(2), greatest(size(col("_arr")) - 1, lit(0))),
          element_at(col("_arr"), 1)("_v"),
          (s, t) => step(s, t("_v"))).as("ewma_e6")): _*)
      .withColumn("ewma", col("ewma_e6").cast("double") / lit(1.0e6))
  }

  /** Seasonal-naive forecast skill (the MASE ratio — Hyndman &
    * Koehler, "Another look at measures of forecast accuracy", IJF
    * 2006): per group, the MAE of the seasonal-naive forecast
    * `ŷ(t) = y(t − period)` over the MAE of the plain naive
    * `ŷ(t) = y(t − 1)` — under 1, the season carries real signal and a
    * seasonal model is worth fitting. Alignment is by the integer
    * `idxCol` ([[autocorrelation]]'s gap discipline): an error term
    * exists only where BOTH buckets exist; gaps drop terms instead of
    * silently comparing across them.
    *
    * Exactness: values ride the decimal(18,6) micro-unit lane;
    * absolute errors are exact longs, the two MAEs and their ratio are
    * fixed-order double divisions. Groups missing either error set
    * report null for that MAE and a null ratio. Null group/idx/value
    * rows are excluded; `idxCol` must be unique per group.
    *
    * Scale shape: the series self-joins twice on (group, idx ± lag) —
    * two shuffle joins sized by the series, then ONE collapse per
    * group. Pre-aggregate the corpus to the bucket grain first.
    * Output: `(…group, n_naive, n_seasonal, mae_naive, mae_seasonal,
    * mase)`. */
  def seasonalNaiveSkill(df: DataFrame, groupCols: Seq[String],
                         idxCol: String, valueCol: String,
                         period: Int = 7): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    require(period >= 2, s"period ($period) must be >= 2")
    val y6 = (col(valueCol).cast("decimal(18,6)") * lit(1000000L))
      .cast("long")
    val base = df
      .filter(groupCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(idxCol).isNotNull && col(valueCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(col(idxCol).cast("long").as("_i"),
        y6.as("_y")): _*)
      .localCheckpoint(false) // both lag joins + both probe sides
    def errs(lag: Int, tag: String): DataFrame = base
      .join(base.select(groupCols.map(c => col(c).as(s"_g_$c")) ++
          Seq((col("_i") + lag).as("_i2"), col("_y").as("_py")): _*),
        groupCols.map(c => col(c) === col(s"_g_$c")).reduce(_ && _) &&
          col("_i") === col("_i2"))
      .select(groupCols.map(col) :+ abs(col("_y") - col("_py")).as("_e"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(s"n_$tag"), sum(col("_e")).as(s"_se_$tag"))
    val n1 = errs(1, "naive")
    val np = errs(period, "seasonal")
    val all = base.select(groupCols.map(col): _*).distinct()
    def mae(tag: String): Column =
      (col(s"_se_$tag").cast("double") / lit(1.0e6)) /
        col(s"n_$tag").cast("double")
    all.join(n1, groupCols, "left").join(np, groupCols, "left")
      .select(groupCols.map(col) ++ Seq(
        coalesce(col("n_naive"), lit(0L)).as("n_naive"),
        coalesce(col("n_seasonal"), lit(0L)).as("n_seasonal"),
        mae("naive").as("mae_naive"),
        mae("seasonal").as("mae_seasonal"),
        when(col("n_naive").isNull || col("n_seasonal").isNull ||
          col("_se_naive") === 0L, lit(null).cast("double"))
          .otherwise(mae("seasonal") / mae("naive")).as("mase")): _*)
  }

  /** Cross-correlation function between two aligned series (Box &
    * Jenkins' CCF — the lead–lag screen: at which shift does x best
    * predict y): per lag ℓ in −maxLag..maxLag, the Pearson correlation
    * of `(x(t), y(t + ℓ))` over every t where BOTH buckets exist — a
    * positive peak lag means x LEADS y by ℓ. [[trendFit]]'s exact
    * sufficient-statistic discipline per lag; gaps drop pairs
    * ([[autocorrelation]]'s rule); null on a constant side.
    *
    * Scale shape: each series row explodes into 2·maxLag+1 probes and
    * joins back on the shifted index — one shuffle join sized
    * (2·maxLag+1)·|series|, then ONE collapse to six sums per lag.
    * Input is ONE frame carrying both series at the same grain. Output:
    * `(lag, n, r)`. */
  def crossCorrelation(df: DataFrame, idxCol: String, xCol: String,
                       yCol: String, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 60, s"maxLag ($maxLag) out of range")
    val d38 = "decimal(38,0)"
    def m6(c: String) =
      (col(c).cast("decimal(18,6)") * lit(1000000L)).cast("long")
    val base = df
      .filter(col(idxCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(idxCol).cast("long").as("_i"), m6(xCol).as("_x"),
        m6(yCol).as("_y"))
      .localCheckpoint(false) // probe fan-out + the aligned side
    val probes = base.select(col("_x"),
      explode(sequence(lit(-maxLag), lit(maxLag))).as("lag"),
      (col("_i") + col("lag")).as("_i"))
    val pairs = probes.join(base.select(col("_i"), col("_y")), Seq("_i"))
    val g = (c: Column) => c.cast(d38)
    val sums = pairs.groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(g(col("_x")) * g(col("_x"))).as("_sxx"),
        sum(g(col("_y")) * g(col("_y"))).as("_syy"),
        sum(g(col("_x")) * g(col("_y"))).as("_sxy"))
    val nD = col("n").cast("double")
    def dbl(c: String): Column = col(c).cast("double")
    val num = nD * dbl("_sxy") - dbl("_sx") * dbl("_sy")
    val denx = nD * dbl("_sxx") - dbl("_sx") * dbl("_sx")
    val deny = nD * dbl("_syy") - dbl("_sy") * dbl("_sy")
    sums.select(col("lag").cast("int").as("lag"), col("n"),
      when(denx === 0.0 || deny === 0.0, lit(null).cast("double"))
        .otherwise(num / (sqrt(denx) * sqrt(deny))).as("r"))
  }

  /** Holt's linear method (double exponential smoothing — Holt 1957):
    * level + trend state folded over the bucket-ordered series with
    * rational smoothing constants α = alphaNum/alphaDen,
    * β = betaNum/betaDen:
    * {{{
    *   l_t = (αn·x_t + (αd−αn)·(l+b))  div αd
    *   b_t = (βn·(l_t − l) + (βd−βn)·b) div βd
    * }}}
    * initialized `l₁ = x₁, b₁ = x₂ − x₁` (Hyndman's convention; the
    * fold then runs from t = 2). A single-row series has `b = 0`.
    *
    * Determinism: the state is exact integer micro-units (values
    * ×10⁶) and every step is integer mul/add plus ONE integral
    * division — which truncates toward zero in BOTH Spark
    * (IntegralDivide) and DuckDB (`//`), so negative values and
    * negative trends replay integer-for-integer (unlike [[ewmaLevel]],
    * no sign restriction is needed: trunc-div is what both engines
    * do). `orderCol` must be unique per group; |value| must stay
    * < ~9·10¹² so `αd·state` fits a long.
    *
    * Scale shape: [[ewmaLevel]]'s — aggregate the corpus to the
    * (group, bucket) grain first; the fold is a per-group sorted-array
    * aggregate sized by the bucket domain, one shuffle. Output:
    * `(…group, n_periods, level_e6, trend_e6, level, trend,
    * forecast_1)` with `forecast_1 = (level_e6 + trend_e6)/10⁶`, the
    * one-step-ahead read. */
  def holtLinear(df: DataFrame, groupCols: Seq[String], orderCol: String,
                 valueCol: String, alphaNum: Long = 1L, alphaDen: Long = 4L,
                 betaNum: Long = 1L, betaDen: Long = 8L): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    require(alphaNum > 0 && alphaNum <= alphaDen,
      s"alpha $alphaNum/$alphaDen must be a fraction in (0, 1]")
    require(betaNum > 0 && betaNum <= betaDen,
      s"beta $betaNum/$betaDen must be a fraction in (0, 1]")
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    def idiv(a: Column, b: Column): Column = GraftColumnBridge.column(
      IntegralDivide(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b)))
    val v6 = (col(valueCol).cast("decimal(18,6)") * lit(1000000L))
      .cast("long").as("_v")
    val arr = col("_arr")
    // the new level is needed twice (its own slot + the trend delta);
    // inlining the expression keeps the fold a pure column tree — both
    // engines evaluate the identical integer formula twice
    def newLevel(s: Column, x: Column): Column =
      idiv(lit(alphaNum) * x +
        lit(alphaDen - alphaNum) * (s("l") + s("t")), lit(alphaDen))
    val folded = df
      .filter(groupCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(orderCol).isNotNull && col(valueCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(col(orderCol).as("_o"), v6): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_periods"),
        sort_array(collect_list(struct(col("_o"), col("_v")))).as("_arr"))
      .select(groupCols.map(col) ++ Seq(col("n_periods"),
        aggregate(
          slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
          struct(element_at(arr, 1)("_v").as("l"),
            when(size(arr) >= 2,
              element_at(arr, 2)("_v") - element_at(arr, 1)("_v"))
              .otherwise(lit(0L)).as("t")),
          (s, e) => {
            val x = e("_v")
            struct(newLevel(s, x).as("l"),
              idiv(lit(betaNum) * (newLevel(s, x) - s("l")) +
                lit(betaDen - betaNum) * s("t"), lit(betaDen)).as("t"))
          }).as("_st")): _*)
    folded.select(groupCols.map(col) ++ Seq(col("n_periods"),
      col("_st")("l").as("level_e6"), col("_st")("t").as("trend_e6"),
      (col("_st")("l").cast("double") / lit(1.0e6)).as("level"),
      (col("_st")("t").cast("double") / lit(1.0e6)).as("trend"),
      ((col("_st")("l") + col("_st")("t")).cast("double") / lit(1.0e6))
        .as("forecast_1")): _*)
  }

  /** Holt–Winters ADDITIVE triple exponential smoothing (Winters,
    * Management Science 1960) — [[holtLinear]] plus a `period`-slot
    * seasonal state, in the same exact-integer contract:
    *   - `l′ = (αN·(x − s_slot) + (αD−αN)·(l + t)) div αD`
    *   - `t′ = (βN·(l′ − l) + (βD−βN)·t) div βD`
    *   - `s′_slot = (γN·(x − l′) + (γD−γN)·s_slot) div γD`
    * with slot = (position − 1) mod period, every division the same
    * truncating IntegralDivide the q212 oracle replays as `//`. Init is
    * the SIMPLE deterministic variant: `l₀ = x₁`, `t₀ = 0`, seasonals
    * all 0 — the seasonal profile is LEARNED over the cycles present
    * (the textbook first-cycle-mean init needs ≥ one full season and
    * adds nothing at the exactness level this engine gates; callers
    * with short series should read `n_periods` before trusting the
    * profile).
    *
    * Values ride the decimal(18,6) micro-unit lane; the fold runs over
    * ONE sorted collect per group in `orderCol` order (groups must fit
    * a task — the q212 contract; series are per-key daily grains, not
    * raw events).
    *
    * Output: one row per (group, slot 0-based): `(groupCols…,
    * n_periods, slot, level_e6, trend_e6, season_e6, level, trend,
    * season)` — level/trend repeat per slot (they are group-level
    * state). */
  def holtWinters(df: DataFrame, groupCols: Seq[String], orderCol: String,
                  valueCol: String, period: Int,
                  alphaNum: Long = 1L, alphaDen: Long = 4L,
                  betaNum: Long = 1L, betaDen: Long = 8L,
                  gammaNum: Long = 1L, gammaDen: Long = 4L): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    require(period >= 2 && period <= 1000, s"period ($period) out of range")
    require(alphaNum > 0 && alphaNum <= alphaDen &&
      betaNum > 0 && betaNum <= betaDen &&
      gammaNum > 0 && gammaNum <= gammaDen,
      "smoothing fractions must lie in (0, 1]")
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    def idiv(a: Column, b: Column): Column = GraftColumnBridge.column(
      IntegralDivide(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b)))
    val v6 = (col(valueCol).cast("decimal(18,6)") * lit(1000000L))
      .cast("long").as("_v")
    val arr = col("_arr")
    // slot of the element being consumed: state carries the 1-based
    // position of the LAST consumed element in "p"
    def slot1(st: Column): Column = (st("p") % period + 1L).cast("int")
    def sOld(st: Column): Column = element_at(st("s"), slot1(st))
    def lNew(st: Column, x: Column): Column =
      idiv(lit(alphaNum) * (x - sOld(st)) +
        lit(alphaDen - alphaNum) * (st("l") + st("t")), lit(alphaDen))
    val folded = df
      .filter(groupCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(orderCol).isNotNull && col(valueCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(col(orderCol).as("_o"), v6): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_periods"),
        sort_array(collect_list(struct(col("_o"), col("_v")))).as("_arr"))
      .select(groupCols.map(col) ++ Seq(col("n_periods"),
        aggregate(
          slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
          struct(element_at(arr, 1)("_v").as("l"), lit(0L).as("t"),
            array_repeat(lit(0L), period).as("s"), lit(1L).as("p")),
          (st, e) => {
            val x = e("_v")
            val sN = idiv(lit(gammaNum) * (x - lNew(st, x)) +
              lit(gammaDen - gammaNum) * sOld(st), lit(gammaDen))
            struct(
              lNew(st, x).as("l"),
              idiv(lit(betaNum) * (lNew(st, x) - st("l")) +
                lit(betaDen - betaNum) * st("t"), lit(betaDen)).as("t"),
              transform(st("s"), (v, i) =>
                when(i === slot1(st) - 1, sN).otherwise(v)).as("s"),
              (st("p") + 1L).as("p"))
          }).as("_st")): _*)
    folded
      .select(groupCols.map(col) ++ Seq(col("n_periods"),
        col("_st")("l").as("level_e6"), col("_st")("t").as("trend_e6"),
        posexplode(col("_st")("s"))): _*)
      .select(groupCols.map(col) ++ Seq(col("n_periods"),
        col("pos").cast("int").as("slot"),
        col("level_e6"), col("trend_e6"), col("col").as("season_e6"),
        (col("level_e6").cast("double") / lit(1.0e6)).as("level"),
        (col("trend_e6").cast("double") / lit(1.0e6)).as("trend"),
        (col("col").cast("double") / lit(1.0e6)).as("season")): _*)
  }

  /** Sample autocorrelation of a bucketed series at lags 1..`maxLag`
    * (Box & Jenkins' correlogram — the seasonality/memory screen run
    * before fitting any forecast): per (group, lag), the PEARSON
    * correlation of the aligned pairs `(v[t], v[t+lag])` over every t
    * where BOTH buckets exist. Alignment is by the integer index
    * `idxCol` (day number, hour number), not by row adjacency — a gap
    * in the series drops the pairs that straddle it instead of
    * silently correlating across it (the lead()-window shortcut gets
    * this wrong).
    *
    * Determinism is [[trendFit]]'s contract verbatim: values ride the
    * exact decimal(18,6) micro-unit lane, the six sufficient sums per
    * (group, lag) accumulate exactly in decimal(38,0), and the closed
    * form combines them in fixed-order doubles — `r = (n·Σxy − Σx·Σy)
    * / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))`, null when either side
    * is constant (zero variance ⇒ correlation undefined, not NaN).
    * Same bounds as trendFit: |v| ≤ 10⁹ supports ~10⁸ pairs per cell.
    *
    * Scale shape: aggregate to the (group, idx) grain FIRST (the
    * caller's one map-side-combined shuffle over the raw table); this
    * operator then explodes each series row into `maxLag` probes and
    * self-joins on (group, idx+lag) — one shuffle join sized
    * maxLag·|series|, then ONE aggregation to six sums per (group,
    * lag). Never a window, never driver-side. */
  def autocorrelation(df: DataFrame, groupCols: Seq[String], idxCol: String,
                      valueCol: String, maxLag: Int = 7): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    require(maxLag >= 1, s"maxLag ($maxLag) must be >= 1")
    val d19 = "decimal(19,0)"
    val vi = (col(valueCol).cast("decimal(18,6)") * lit(1000000L)).cast(d19)
    val base = df.filter(col(idxCol).isNotNull && col(valueCol).isNotNull)
      .select(groupCols.map(col) ++
        Seq(col(idxCol).cast("long").as("_i"), vi.as("_vi")): _*)
      .localCheckpoint(false) // both sides of the lag self-join read it
    val probes = base
      .withColumn("lag", explode(array((1 to maxLag).map(lit(_)): _*)))
      .withColumn("_j", col("_i") + col("lag"))
    val pairs = probes.alias("l")
      .join(base.alias("r"),
        groupCols.map(c => col(s"l.$c") === col(s"r.$c"))
          .reduce(_ && _) && col("l._j") === col("r._i"))
      .select(groupCols.map(c => col(s"l.$c")) ++ Seq(col("l.lag"),
        col("l._vi").as("_x"), col("r._vi").as("_y")): _*)
    val sums = pairs
      .groupBy(groupCols.map(col) :+ col("lag"): _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_x")).as("_sxi"), sum(col("_x") * col("_x")).as("_sxxi"),
        sum(col("_y")).as("_syi"), sum(col("_y") * col("_y")).as("_syyi"),
        sum(col("_x") * col("_y")).as("_sxyi"))
    def dbl(c: String): Column = col(c).cast("double")
    val nD = col("n_pairs").cast("double")
    val sx = dbl("_sxi") / lit(1.0e6)
    val sy = dbl("_syi") / lit(1.0e6)
    val sxx = dbl("_sxxi") / lit(1.0e12)
    val syy = dbl("_syyi") / lit(1.0e12)
    val sxy = dbl("_sxyi") / lit(1.0e12)
    val num = nD * sxy - sx * sy
    val denX = nD * sxx - sx * sx
    val denY = nD * syy - sy * sy
    sums.select(groupCols.map(col) ++ Seq(col("lag"), col("n_pairs"),
      when(col("n_pairs") === 0L || denX === 0.0 || denY === 0.0, lit(null))
        .otherwise(num / (sqrt(denX) * sqrt(denY))).as("acf")): _*)
  }

  /** Seasonal anomaly counts: how many observations in each
    * (group, season) cell fall outside `z` population standard
    * deviations of THAT cell's own mean — [[seasonalProfile]] composed
    * back onto the rows, the "how often is 9am not like 9am" monitor
    * (the residual screen of an STL-style decomposition, with the
    * seasonal term as the baseline).
    *
    * The cell statistics are [[seasonalProfile]]'s exactly (same
    * micro-unit decimal sums, same fixed-order double combine), so the
    * per-row verdict `|v − mean| > z·stddev` compares bit-identical
    * doubles on every engine — the COUNT of anomalies is therefore
    * engine-exact even though the boundary is a float comparison.
    * Constant cells (stddev 0) flag any deviation, per the formula.
    *
    * Scale shape: one [[seasonalProfile]] aggregation (cell-sized
    * output) broadcast back onto the rows — the 100 TB side is scanned
    * once more but never shuffled — and one map-side-combined count
    * per cell. Output: `(…group, season, n, n_anomalies,
    * anomaly_frac)`. */
  def seasonalAnomalies(df: DataFrame, groupCols: Seq[String],
                        seasonCol: String, valueCol: String,
                        z: Double = 3.0): DataFrame = {
    require(z > 0.0, s"z ($z) must be positive")
    val keys = groupCols :+ seasonCol
    val profile = seasonalProfile(df, groupCols, seasonCol, valueCol)
    val rows = df.filter(col(seasonCol).isNotNull && col(valueCol).isNotNull)
    rows.join(broadcast(profile), keys)
      .select(keys.map(col) :+
        (abs(col(valueCol).cast("double") - col("mean_value")) >
          lit(z) * col("stddev_value")).as("_an"): _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("_an"), 1L).otherwise(0L)).as("n_anomalies"))
      .withColumn("anomaly_frac",
        col("n_anomalies").cast("double") / col("n").cast("double"))
  }

  /** Single change-point by binary segmentation (Scott & Knott 1974;
    * the first split of binary segmentation — the q152 CUSUM's cousin
    * with an explicit variance objective): per group, the split of the
    * `idxCol`-ordered series that minimizes total within-segment SSE.
    * `SSE = Σy² − (Σy)²/n` per segment, from EXACT prefix sums (y in
    * decimal(18,6) micro-units, Σy² in decimal(38,0) — trendFit's Σy²
    * contract applies); each candidate cost is a fixed-order double
    * expression over those exact sums, and the argmin breaks ties on
    * the earlier split (min over `(cost, idx)` structs — comparison,
    * order-invariant). Groups need ≥ 2 rows (no split exists
    * otherwise — no row is emitted); `idxCol` must be unique per
    * group.
    *
    * Output: `(…group, n, split_idx, sse_total, sse_split, gain)` —
    * `split_idx` is the LAST index of the left segment; `gain =
    * sse_total − sse_split` is the variance the break explains (the
    * binary-segmentation test statistic).
    *
    * Scale shape: ONE group-keyed window pass for prefix sums (the
    * series should be pre-aggregated to its bucket grain), one
    * group-keyed argmin aggregation reusing the exchange. */
  def changePoint(df: DataFrame, groupCols: Seq[String], idxCol: String,
                  yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    val d38 = "decimal(38,0)"
    val y6 = (col(yCol).cast("decimal(18,6)") * lit(1000000L)).cast("long")
    val base = df
      .filter(groupCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(idxCol).isNotNull && col(yCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(col(idxCol).cast("long").as("_i"),
        y6.as("_y")): _*)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("_i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val g38 = (c: Column) => c.cast(d38)
    val pre = base
      .withColumn("_cn", count(lit(1)).over(w))
      .withColumn("_sy", sum(col("_y")).over(w))
      .withColumn("_syy", sum(g38(col("_y")) * g38(col("_y"))).over(w))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_ty", sum(col("_y")).over(wAll))
      .withColumn("_tyy", sum(g38(col("_y")) * g38(col("_y"))).over(wAll))
    def sse(syy: Column, sy: Column, n: Column): Column =
      syy.cast("double") -
        sy.cast("double") * sy.cast("double") / n.cast("double")
    val cost = sse(col("_syy"), col("_sy"), col("_cn")) +
      sse(col("_tyy") - col("_syy"), col("_ty") - col("_sy"),
        col("_n") - col("_cn"))
    val sseTotal = sse(col("_tyy"), col("_ty"), col("_n"))
    pre.filter(col("_cn") < col("_n")) // splits only: left is proper
      .select(groupCols.map(col) ++ Seq(col("_n").as("n"),
        struct(cost.as("c"), col("_i").as("i")).as("_cand"),
        sseTotal.as("_st")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(first(col("n")).as("n"), min(col("_cand")).as("_best"),
        first(col("_st")).as("sse_total"))
      .select(groupCols.map(col) ++ Seq(col("n"),
        col("_best.i").as("split_idx"), col("sse_total"),
        col("_best.c").as("sse_split"),
        (col("sse_total") - col("_best.c")).as("gain")): _*)
  }

  /** Theil–Sen estimator per group (Theil 1950, Sen 1968 — the robust
    * companion to [[mannKendall]]: the slope a 29%-outlier-contaminated
    * series still reports correctly, where [[trendFit]]'s OLS folds):
    * `slope = median{ (y_j − y_i)/(x_j − x_i) : x_i < x_j }`,
    * `intercept = median{ y_i − slope·x_i }`.
    *
    * Determinism: y rides the exact micro-unit lane (decimal(18,6)·10⁶
    * → long), x casts to long; each pairwise slope is ONE fixed-order
    * double expression over exact integers
    * (`(Δy6/1e6) / Δx`), and the median is taken explicitly over the
    * sorted array — odd count: the middle element; even count:
    * `(lo + hi)/2.0` — never an engine's interpolating quantile
    * (DuckDB's quantile_cont computes the midpoint differently in
    * floating point). Pairs with EQUAL x are excluded (vertical —
    * no slope); a group with no valid pair reports null slope/
    * intercept. Null group/x/y rows are excluded.
    *
    * Scale shape: [[mannKendall]]'s pairwise contract — the self-join
    * shuffles once on the group key, O(n²/2) slopes per group, and
    * the median arrays live per group: run it on AGGREGATED series
    * (n ≤ ~2000/group keeps the slope array ≤ 2·10⁶ doubles).
    * Output: `(…group, n, n_pairs, slope, intercept)`. */
  def theilSen(df: DataFrame, groupCols: Seq[String], xCol: String,
               yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    val base = df
      .filter(groupCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(xCol).isNotNull && col(yCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(col(xCol).cast("long").as("_x"),
        (col(yCol).cast("decimal(18,6)") * lit(1000000L)).cast("long")
          .as("_y6")): _*)
      .localCheckpoint(false) // pair join (twice) + n agg + residuals
    val rhs = base.select(groupCols.map(c => col(c).as(s"_g_$c")) ++
      Seq(col("_x").as("_x2"), col("_y6").as("_y62")): _*)
    def arrayMedian(arr: Column): Column = {
      val m = size(arr)
      // index arithmetic must stay integral: Column `/` is a double
      // divide, exact here (m ≤ ~2·10⁶ ≪ 2⁵³) and floored by the cast
      val mid = ((m + lit(1)) / lit(2)).cast("int")
      val lo = (m / lit(2)).cast("int")
      when(m === 0, lit(null).cast("double"))
        .when(m % 2 === 1, element_at(arr, mid))
        .otherwise((element_at(arr, lo) +
          element_at(arr, lo + lit(1))) / lit(2.0))
    }
    val slopes = base.join(rhs,
        groupCols.map(c => col(c) === col(s"_g_$c")).reduce(_ && _) &&
          col("_x") < col("_x2"))
      .select(groupCols.map(col) :+
        (((col("_y62") - col("_y6")).cast("double") / lit(1.0e6)) /
          (col("_x2") - col("_x")).cast("double")).as("_sl"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_pairs"),
        arrayMedian(sort_array(collect_list(col("_sl")))).as("slope"))
    val nPer = base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val withSlope = base.join(slopes, groupCols)
      .select(groupCols.map(col) :+
        (col("_y6").cast("double") / lit(1.0e6) -
          col("slope") * col("_x").cast("double")).as("_res"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(arrayMedian(sort_array(collect_list(col("_res"))))
        .as("intercept"))
    nPer.join(slopes, groupCols, "left")
      .join(withSlope, groupCols, "left")
      .select(groupCols.map(col) ++ Seq(col("n"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        col("slope"), col("intercept")): _*)
  }

  /** Mann–Kendall trend test per group (Mann 1945, Kendall 1975 — the
    * standard non-parametric trend test for climate/weather series,
    * where [[trendFit]]'s OLS assumptions don't hold): over a series
    * ordered by `orderCol`, `S = Σ_{i<j} sign(y_j − y_i)`, the
    * tie-corrected variance `Var(S) = [n(n−1)(2n+5) −
    * Σ_t t(t−1)(2t+5)] / 18` (t = per-value tie-group sizes), the
    * continuity-corrected normal score `z = (S∓1)/√Var(S)`, and
    * Kendall's `τ_b = S / √(D(D−U))` with `D = n(n−1)/2`,
    * `U = Σ_t t(t−1)/2`.
    *
    * Determinism contract: `yCol` is compared in exact integer
    * micro-units (decimal(18,6)·10⁶ → long: ≤6 decimal places,
    * |y| < 10¹²; ANSI throws past the bound, non-ANSI nulls the row
    * out loudly via the null filter), so S and every tie count are
    * exact integers on any engine and any partitioning. `orderCol`
    * may be any orderable type (only `<` is used, never arithmetic);
    * pairs with EQUAL order values are excluded from S, the standard
    * treatment of tied times. var_num = 18·Var(S) is returned exactly
    * (cast to double through the JVM's correctly-rounded decimal
    * route); z and τ_b combine exact integers in doubles with a fixed
    * operand order — bit-identical cross-engine. n < 2 or an all-tied
    * group → var_num 0 → null z/τ_b; S = 0 with positive variance →
    * z = 0 (the correction applies only to nonzero S). Rows with a
    * null group/order/y are excluded.
    *
    * Scale shape: S needs the pairwise order relation, so the series
    * self-joins WITHIN each group — O(n²/2) pairs per group, shuffled
    * once on the group key with groups in parallel. The contract is
    * per-group series length, not table size: MK runs on
    * aggregated series (daily/monthly rollups, n ≤ ~10⁴ ⇒ ≤5·10⁷
    * sign evaluations per group, no materialization — the pairs
    * stream straight into a map-side-combined sum). The n/tie pass is
    * one small aggregation. Output: `(…group, n, s_stat, var_num,
    * z, tau_b)`. */
  def mannKendall(df: DataFrame, groupCols: Seq[String], orderCol: String,
                  yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    val d38 = "decimal(38,0)"
    val base = df
      .filter(groupCols.map(col(_).isNotNull).reduce(_ && _) &&
        col(orderCol).isNotNull && col(yCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(col(orderCol).as("_o"),
        (col(yCol).cast("decimal(18,6)") * lit(1000000L)).cast("long")
          .as("_y")): _*)
      .localCheckpoint(false) // read by the pair join (twice) + two aggs
    val rhs = base.select(groupCols.map(c => col(c).as(s"_g_$c")) ++
      Seq(col("_o").as("_o2"), col("_y").as("_y2")): _*)
    val sPer = base.join(rhs,
        groupCols.map(c => col(c) === col(s"_g_$c")).reduce(_ && _) &&
          col("_o") < col("_o2"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(when(col("_y2") > col("_y"), 1L)
        .when(col("_y2") < col("_y"), -1L).otherwise(0L)).as("s_stat"))
    val tc = col("_t").cast(d38)
    val ties = base.groupBy(groupCols.map(col) :+ col("_y"): _*)
      .agg(count(lit(1)).as("_t"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("_t")).cast("long").as("n"),
        sum(tc * (tc - lit(1)) * (tc * lit(2) + lit(5))).as("_tie3"),
        sum(tc * (tc - lit(1))).as("_tie2"))
    val nc = col("n").cast(d38)
    val joined = ties.join(sPer, groupCols, "left")
      .withColumn("s_stat", coalesce(col("s_stat"), lit(0L)))
      .withColumn("_vn",
        nc * (nc - lit(1)) * (nc * lit(2) + lit(5)) - col("_tie3"))
      .withColumn("_d", nc * (nc - lit(1)) / lit(2)) // exact: n(n−1) even
    val sD = col("s_stat").cast("double")
    val vnD = col("_vn").cast("double")
    val dD = col("_d").cast("double")
    val duD = (col("_d") - col("_tie2") / lit(2)).cast("double")
    joined.select(groupCols.map(col) ++ Seq(col("n"), col("s_stat"),
      vnD.as("var_num"),
      when(col("_vn") <= 0, lit(null).cast("double"))
        .when(col("s_stat") > 0, (sD - lit(1.0)) / sqrt(vnD / lit(18.0)))
        .when(col("s_stat") < 0, (sD + lit(1.0)) / sqrt(vnD / lit(18.0)))
        .otherwise(lit(0.0)).as("z"),
      when(col("_vn") <= 0, lit(null).cast("double"))
        .otherwise(sD / sqrt(dD * duD)).as("tau_b")): _*)
  }
}
