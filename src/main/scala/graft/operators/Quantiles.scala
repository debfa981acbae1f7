package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact quantiles at scale.
  *
  * Spark's built-in exact `percentile()` aggregate buffers EVERY value in
  * the aggregation state — partial buffers hold whole partitions, and the
  * final merge concentrates the entire column on one reducer. Fine at
  * spec-test sizes, OOM at 100 TB. The scale-correct shape is a
  * distributed range sort plus order-statistic selection: sort the column
  * (range exchange — each task sorts its slice), derive each row's GLOBAL
  * index from broadcast per-partition offsets (range partitions are in key
  * order, so partition-major order IS value order), and fetch only the two
  * order statistics each requested quantile interpolates between — a
  * driver collect bounded by 2·|ps| rows, never the column.
  *
  * Interpolation is R-7 (`h = (n−1)p`, linear between floor/ceil ranks) —
  * the same rule as Spark's `percentile()` and DuckDB's `quantile_cont`,
  * so results are oracle-comparable (QuantilesSpec asserts equality with
  * the built-in on random data).
  */
object Quantiles {

  /** One row per requested quantile: `(p, value)`. Nulls and NaNs in the
    * value column are ignored (matching `percentile()`); an empty input
    * yields null values. Runs a count job plus the selection; the sorted
    * column is pinned with a lazy localCheckpoint so the per-partition
    * offsets are ALWAYS computed against the exact partitioning they index
    * into — do not remove it: without the pin, correctness would hinge on
    * exchange reuse deduping two independently-sampled range sorts (see
    * the in-body comment). */
  def exact(df: DataFrame, valueCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "at least one quantile is required")
    ps.foreach(p => require(p >= 0.0 && p <= 1.0, s"quantile out of range: $p"))
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
    val n = vals.count()
    if (n == 0L)
      return ps.map(p => (p, Option.empty[Double])).toDF("p", "value")
    val targets = ps.map { p =>
      val h = (n - 1) * p
      (p, h, math.floor(h).toLong, math.ceil(h).toLong)
    }
    val need = targets.flatMap(t => Seq(t._3, t._4)).distinct
    // the lazy localCheckpoint pins ONE physical range partitioning: the
    // offsets subplan and the row_number subplan below both read the same
    // materialized RDD, so the per-partition offsets always index the
    // partitioning they were counted against. Without it, correctness
    // would hinge on exchange reuse deduping two independently-sampled
    // range sorts. (Durability: pure derivation — executor loss fails the
    // job, a rerun rebuilds from intact inputs.)
    val sorted = vals.orderBy("v").withColumn("_pid", spark_partition_id())
      .localCheckpoint(false)
    // range partitions are in key order: broadcast per-partition row counts
    // become global starting offsets, and a within-partition row_number
    // completes the global index — no single-partition window anywhere.
    // Ties may split across partition boundaries; their relative order is
    // arbitrary but the VALUES at each rank are unaffected.
    // the offsets window runs on one partition by construction — its input
    // is one row per shuffle partition; the constant partitionBy only
    // silences Spark's single-partition warning for this bounded case
    val offsets = sorted.groupBy("_pid").count()
      .withColumn("_off", coalesce(
        sum("count").over(Window.partitionBy(lit(0)).orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("count")
    val inPart = Window.partitionBy("_pid").orderBy("v")
    val picked = sorted
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn("_i", col("_off") + row_number().over(inPart) - 1)
      .filter(col("_i").isin(need: _*))
      .select("_i", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = targets.map { case (p, h, lo, hi) =>
      val vLo = picked(lo); val vHi = picked(hi)
      // Spark's percentile() interpolates with the two-weight form — use
      // the identical expression so results are bit-compatible with the
      // built-in (the algebraically-equal vLo + w·(vHi−vLo) differs by ulps)
      val v = if (hi == lo) vLo else (hi - h) * vLo + (h - lo) * vHi
      (p, Some(v))
    }
    rows.toDF("p", "value")
  }

  /** Per-group exact quantiles, fully distributed — no driver collect at
    * all (unlike [[exact]], whose 2·|ps|-row collect is already bounded;
    * here even that would be |groups|-sized, so the order statistics are
    * fetched with joins instead).
    *
    * Shape: one range sort on `(groupCols…, value)` — each group occupies
    * a contiguous run of partitions with values in order — pinned by a lazy
    * localCheckpoint exactly as in [[exact]]. Per-(partition, group) counts
    * give within-group starting offsets (ranges are contiguous, so this
    * table holds ≈ |groups| + partitions rows, NOT groups × partitions);
    * a within-(partition, group) `row_number` completes each row's global
    * rank inside its group. Target ranks (2 per requested quantile per
    * group) broadcast against the sorted data to pluck the order
    * statistics; interpolation then runs group-side on a
    * |groups|·|ps|-sized table.
    *
    * The broadcast tables scale with |groups|, so this is the shape for
    * FEW LARGE groups (the regime where the built-in per-group
    * `percentile()` buffers a whole giant group on one reducer). For
    * millions of tiny groups the built-in's per-group state is small and
    * preferable.
    *
    * Interpolation is the same two-weight R-7 form as [[exact]] (evaluated
    * in Catalyst double arithmetic — identical IEEE ops). Null/NaN values
    * are ignored; a group whose values are all null/NaN emits no rows.
    * Output: `(groupCols…, p, value)`. */
  def exactGrouped(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   ps: Seq[Double]): DataFrame = {
    require(groupCols.nonEmpty, "exactGrouped requires at least one group column (use exact)")
    require(ps.nonEmpty, "at least one quantile is required")
    ps.foreach(p => require(p >= 0.0 && p <= 1.0, s"quantile out of range: $p"))
    val reserved = Seq("_v", "_pid", "_off", "_n", "_h", "_lo", "_hi", "_i", "p", "value")
    reserved.foreach(r => require(!groupCols.contains(r), s"group column name '$r' is reserved"))
    val spark = df.sparkSession
    val gs = groupCols.map(col)
    val vals = df.select(gs :+ col(valueCol).cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull && !isnan(col("_v")))
    // one range sort pinned to one physical partitioning (see exact())
    val sorted = vals.orderBy(gs :+ col("_v"): _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(false)
    // within-group starting offset of each (partition, group) run + group size
    val wg = Window.partitionBy(gs: _*).orderBy(col("_pid"))
    val offsets = sorted.groupBy(col("_pid") +: gs: _*).count()
      .withColumn("_off", coalesce(
        sum("count").over(wg.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n", sum("count").over(Window.partitionBy(gs: _*)))
      .drop("count")
    // target ranks: h = (n-1)p per group, the two bracketing order statistics
    val targets = offsets.select(gs :+ col("_n"): _*).distinct()
      .select(gs :+ explode(array(ps.map(lit): _*)).as("p") :+ col("_n"): _*)
      .withColumn("_h", (col("_n") - 1).cast("double") * col("p"))
      .withColumn("_lo", floor(col("_h")).cast("long"))
      .withColumn("_hi", ceil(col("_h")).cast("long"))
      .drop("_n")
    val need = targets.select(gs :+ col("_lo").as("_i"): _*)
      .unionByName(targets.select(gs :+ col("_hi").as("_i"): _*)).distinct()
    // global-in-group rank of every row, then keep only the needed ranks;
    // both joins keep the data in place (broadcast sides are |groups|-scaled)
    val inPart = Window.partitionBy(col("_pid") +: gs: _*).orderBy(col("_v"))
    val picked = sorted
      .join(broadcast(offsets.drop("_n")), "_pid" +: groupCols)
      .withColumn("_i", col("_off") + row_number().over(inPart) - 1)
      .join(broadcast(need), groupCols :+ "_i")
      .select(gs :+ col("_i") :+ col("_v"): _*)
    // interpolate group-side: two small joins fetch vLo/vHi per target
    val vlo = picked.withColumnRenamed("_i", "_lo").withColumnRenamed("_v", "_vlo")
    val vhi = picked.withColumnRenamed("_i", "_hi").withColumnRenamed("_v", "_vhi")
    targets
      .join(broadcast(vlo), groupCols :+ "_lo")
      .join(broadcast(vhi), groupCols :+ "_hi")
      // the identical two-weight form as exact() — bit-compatible with the
      // built-in percentile() (the algebraically-equal alternative differs by ulps)
      .withColumn("value", when(col("_lo") === col("_hi"), col("_vlo"))
        .otherwise((col("_hi").cast("double") - col("_h")) * col("_vlo") +
                   (col("_h") - col("_lo").cast("double")) * col("_vhi")))
      .select(gs :+ col("p") :+ col("value"): _*)
  }

  /** Per-group winsorization: clip `valueCol` to its group's
    * `[pLo, pHi]` exact quantiles — the standard heavy-tail taming step
    * before scale-sensitive statistics. Returns the input plus `outCol`.
    *
    * Built on [[exactGrouped]] (one range sort; never a per-group value
    * buffer); the two bounds pivot to one row per group and broadcast.
    * Bounds are rounded to 6 decimals BEFORE clipping (the
    * [[robustOutlierStats]] argument: interpolated quantiles can differ
    * by ulps across engines, and a clip threshold is a knife-edge
    * consumer — rounding makes the clipped SET, not just the values,
    * reproducible).
    *
    * Every input row is preserved (LEFT join on the bounds): a group
    * whose values are all null/NaN gets no bounds row from
    * [[exactGrouped]], so its rows — and rows whose own value is null —
    * carry a null `outCol` instead of being dropped or clamped to a
    * bound. */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                pLo: Double = 0.05, pHi: Double = 0.95,
                outCol: String = "winsorized"): DataFrame = {
    require(pLo < pHi, s"need pLo < pHi, got [$pLo, $pHi]")
    require(!df.columns.contains(outCol), s"input already contains column '$outCol'")
    val gs = groupCols.map(col)
    val bounds = exactGrouped(df, groupCols, valueCol, Seq(pLo, pHi))
      .groupBy(gs: _*)
      .agg(round(max(when(col("p") === pLo, col("value"))), 6).as("_blo"),
        round(max(when(col("p") === pHi, col("value"))), 6).as("_bhi"))
    // least/greatest IGNORE null arguments and order NaN above every
    // double, so the clip must be gated: an unguarded null value would
    // collapse to _blo, a NaN would silently clamp to _bhi, and a
    // boundless group's rows would pass through unclipped instead of
    // reporting null. NaN follows the null convention — the bounds
    // computation (exactGrouped) already excludes it
    df.join(broadcast(bounds), groupCols, "left")
      .withColumn(outCol,
        when(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")) &&
            col("_blo").isNotNull,
          least(greatest(col(valueCol).cast("double"), col("_blo")), col("_bhi"))))
      .drop("_blo", "_bhi")
  }

  /** Robust per-group outlier statistics: median, MAD (median absolute
    * deviation), and the count of rows beyond `k`·MAD from the median —
    * the standard heavy-tail-safe alternative to mean±kσ (one wild value
    * moves a mean arbitrarily; it moves a median by at most one rank).
    *
    * Built from two [[exactGrouped]] passes (median, then median of
    * |value − median|) — both scale-safe range sorts, never a per-group
    * value buffer. The medians are rounded to 6 decimals BEFORE the
    * deviation/threshold arithmetic so the flagged set is reproducible
    * across engines (raw interpolated medians can differ by ulps between
    * implementations, and an outlier test is a knife-edge consumer).
    * Output: `(groupCols…, median, mad, n_outliers)`. */
  def robustOutlierStats(df: DataFrame, groupCols: Seq[String], valueCol: String,
                         k: Double = 3.0): DataFrame = {
    require(k > 0.0, s"k must be positive, got $k")
    val gs = groupCols.map(col)
    val med = exactGrouped(df, groupCols, valueCol, Seq(0.5))
      .select(gs :+ round(col("value"), 6).as("median"): _*)
    val dev = df.join(broadcast(med), groupCols)
      .withColumn("_adev", abs(col(valueCol).cast("double") - col("median")))
    val mad = exactGrouped(dev, groupCols, "_adev", Seq(0.5))
      .select(gs :+ round(col("value"), 6).as("mad"): _*)
    dev.join(broadcast(mad), groupCols)
      .groupBy(gs: _*)
      .agg(first(col("median")).as("median"), first(col("mad")).as("mad"),
        sum(when(col("_adev") > col("mad") * k, 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Per-group percentile-rank calibration: each row's score mapped to its
    * within-group rank position `pct = (rank − 1) / max(n − 1, 1)` ∈
    * [0, 1] — the score-normalization step for mixing quality signals
    * from heterogeneous sources (a fastText score and a perplexity aren't
    * comparable; their within-source percentiles are). `rank` is SQL RANK
    * (ties share the min rank — equal scores always calibrate equally,
    * with no arbitrary tie order), and `pct` is one double division of
    * integer operands, so both reproduce bit-identically cross-engine.
    * Rows with null/NaN score are excluded (matching [[exactGrouped]]);
    * a singleton group calibrates to 0.0.
    *
    * Scale shape: the [[Sampling.curriculumBins]] score-axis scheme — the
    * affine `[gridLo, gridHi)`→`buckets` floor map is monotone in score
    * and equal scores can never straddle a bucket edge, so per-(group,
    * bucket) RANK plus broadcast bucket-count offsets reproduces the
    * whole-group rank with per-task work bounded by one bucket's slice
    * (never a whole-group sort; results identical for ANY grid). The
    * offsets windows run over the ≤ groups×buckets aggregate — the
    * ppsSample benign-global-window shape when `groupCols` is empty. */
  def percentileRank(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                     gridLo: Double, gridHi: Double,
                     buckets: Int = 256): DataFrame = {
    require(gridHi > gridLo, s"need gridLo < gridHi, got [$gridLo, $gridHi]")
    require(buckets >= 1 && buckets <= 65536,
      s"buckets ($buckets) must be in [1, 65536]")
    require(!Seq("_v", "_b", "_off", "_tot", "rank", "pct")
      .exists(df.columns.contains),
      "input must not contain the reserved columns _v/_b/_off/_tot/rank/pct")
    val gs = groupCols.map(col)
    val withB = df
      .withColumn("_v", col(scoreCol).cast("double"))
      .filter(col("_v").isNotNull && !isnan(col("_v")))
      .withColumn("_b", least(lit(buckets - 1L), greatest(lit(0L),
        floor((col("_v") - gridLo) * buckets / lit(gridHi - gridLo))
          .cast("long"))))
    val offsets = withB
      .groupBy(gs :+ col("_b"): _*).agg(count(lit(1)).as("_bs"))
      .withColumn("_off", coalesce(
        sum("_bs").over(Window.partitionBy(gs: _*).orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_tot", sum("_bs").over(Window.partitionBy(gs: _*)))
      .drop("_bs")
    val inBucket = Window.partitionBy(gs :+ col("_b"): _*).orderBy(col("_v"))
    withB
      .join(broadcast(offsets), groupCols :+ "_b")
      .withColumn("rank", col("_off") + rank().over(inBucket).cast("long"))
      .withColumn("pct", (col("rank") - 1L).cast("double") /
        greatest(col("_tot") - 1L, lit(1L)).cast("double"))
      .select(df.columns.map(col) ++ Seq(col("rank"), col("pct")): _*)
  }

  /** 1-Wasserstein (earth-mover) distance of every group's value
    * distribution against the REST of the corpus — the integral companion
    * of [[ksStatistic]]: KS reports the worst single gap, W₁ reports the
    * total transport `∫|F_g − F_rest| dv`, in VALUE units, which is what
    * "how far did the quality distribution move" actually means for
    * threshold decisions. Between step ECDFs the integral is the exact
    * finite sum `Σ |F_g(vᵢ) − F_rest(vᵢ)|·(vᵢ₊₁ − vᵢ)` over sorted
    * observed values.
    *
    * Determinism: CDF values are single divisions of exact integers; each
    * term is fixed-order IEEE arithmetic; the per-group sum folds in
    * VALUE order (`list_reduce(list(term ORDER BY v))` in the oracle) —
    * bit-exact cross-engine, no transcendentals, no rounding.
    *
    * Scale shape: identical to [[ksStatistic]] — one (group, value)
    * count, windows over the groups × distinct-values grid; the fold
    * state is one value-cardinality array per group (bucket `valueCol`
    * upstream when it is continuous and unbounded). `n_rest = 0` → null. */
  def wasserstein1(df: DataFrame, groupCol: String,
                   valueCol: String): DataFrame = {
    require(!df.columns.exists(Set("_g", "_v", "_c", "_ct", "_a", "_call",
      "_n1", "_nn", "_gap", "_term")),
      "input must not contain the reserved columns _g/_v/_c/_ct/_a/_call/_n1/_nn/_gap/_term")
    val vals = df.select(col(groupCol).as("_g"), col(valueCol).as("_v"))
      .filter(col("_v").isNotNull)
    val cnt = vals.groupBy("_g", "_v").agg(count(lit(1)).as("_c"))
      .localCheckpoint(false)
    val groups = cnt.groupBy("_g").agg(sum("_c").as("_n1"))
    val values = cnt.groupBy("_v").agg(sum("_c").as("_ct"))
    val total = values.agg(sum("_ct").as("_nn"))
    val wg = Window.partitionBy("_g").orderBy("_v")
    val grid = broadcast(groups).crossJoin(values)
      .join(cnt, Seq("_g", "_v"), "left")
      .crossJoin(broadcast(total))
      .withColumn("_a", sum(coalesce(col("_c"), lit(0L)))
        .over(wg.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_call", sum(col("_ct"))
        .over(wg.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_gap", lead(col("_v"), 1).over(wg) - col("_v"))
    val term = when(col("_gap").isNotNull && col("_nn") - col("_n1") > 0L,
      abs(col("_a").cast("double") / col("_n1").cast("double") -
        (col("_call") - col("_a")).cast("double") /
          (col("_nn") - col("_n1")).cast("double")) * col("_gap"))
    grid
      .withColumn("_term", term)
      .groupBy("_g")
      .agg(max(col("_n1")).as("n_group"),
        max(col("_nn") - col("_n1")).as("n_rest"),
        when(max(col("_nn") - col("_n1")) > 0L,
          aggregate(
            sort_array(collect_list(struct(col("_v"), col("_term")))),
            lit(0.0), (acc, s) => acc + coalesce(s("_term"), lit(0.0))))
          .as("w1"))
      .select(col("_g").as(groupCol), col("n_group"), col("n_rest"),
        col("w1"))
  }

  /** Exact weighted median per group: the smallest value whose cumulative
    * weight reaches half the group's total — "half the TOKEN mass sits at
    * or below this score", the right center for curation decisions where
    * documents are not equal (a 10-token doc should not count like a
    * 10k-token one). The selection rule `2·cumw ≥ W` is pure integer
    * arithmetic — no interpolation, no doubles, bit-exact cross-engine;
    * ties in the value column merge their weight before the rule applies.
    * Zero- and negative-weight rows are rejected at runtime (a negative
    * weight makes the cumulative non-monotone and the rule meaningless).
    *
    * Output: `(groupCols…, total_weight, weighted_median)`.
    *
    * Scale shape: one (group, value)-keyed weight aggregation, then a
    * per-group cumulative window over DISTINCT values (value-cardinality
    * sized, not row sized) and a min-filter — never a whole-group sort of
    * raw rows. */
  def weightedMedian(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     weightCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column is required")
    require(!df.columns.exists(Set("_w", "_cw", "_tw")),
      "input must not contain the reserved columns _w/_cw/_tw")
    val gcols = groupCols.map(col)
    // positivity AND integrality are checked on the POST-cast value: a
    // fractional weight like 0.5 passes `> 0` but truncates to 0L under
    // cast('long'), silently yielding total_weight 0 and a bogus minimum-
    // value "median" — so any weight the cast would change is rejected too
    val checkedW = when(
      col(weightCol).cast("long") > 0L &&
        col(weightCol).cast("long").cast(df.schema(weightCol).dataType)
          === col(weightCol),
      col(weightCol).cast("long"))
      .otherwise(raise_error(concat(
        lit("weightedMedian: weight must be a positive integer, got "),
        col(weightCol).cast("string"))))
    val agg = df.select(gcols :+ col(valueCol) :+ checkedW.as("_w"): _*)
      .groupBy(gcols :+ col(valueCol): _*)
      .agg(sum(col("_w")).as("_w"))
    val wcum = Window.partitionBy(gcols: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wall = Window.partitionBy(gcols: _*)
    agg
      .withColumn("_cw", sum(col("_w")).over(wcum))
      .withColumn("_tw", sum(col("_w")).over(wall))
      .filter(col("_cw") * 2L >= col("_tw"))
      .groupBy(gcols: _*)
      .agg(max(col("_tw")).as("total_weight"),
        min(col(valueCol)).as("weighted_median"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic of every group against the
    * REST of the corpus: `ks = sup_v |F_g(v) − F_rest(v)|` — the standard
    * distribution-drift alarm for per-slice score distributions (is this
    * source's quality/perplexity profile shaped like everyone else's?).
    * The sup of a difference of step functions is attained at observed
    * values, so evaluating at every distinct value is EXACT, not a grid
    * approximation.
    *
    * Determinism: all CDF numerators/denominators are exact integers;
    * each F value is one double division; `abs`/`max` are comparisons.
    * No rounding — bit-exact cross-engine.
    *
    * Scale shape: one (group, value)-keyed count, then windows over the
    * groups × distinct-values grid. The grid is the cost driver — bound
    * it by bucketing `valueCol` upstream when values are continuous and
    * unbounded (scores rounded to fixed decimals keep V small); the
    * cumulative windows partition by group, so no global sort. NULL
    * values are excluded. A group that IS the whole corpus (n_rest = 0)
    * reports a null ks.
    *
    * Output: `(groupCol, n_group, n_rest, ks)`. */
  def ksStatistic(df: DataFrame, groupCol: String,
                  valueCol: String): DataFrame = {
    require(!df.columns.exists(Set("_g", "_v", "_c", "_ct", "_a", "_call",
      "_n1", "_nn", "_d")),
      "input must not contain the reserved columns _g/_v/_c/_ct/_a/_call/_n1/_nn/_d")
    val vals = df.select(col(groupCol).as("_g"), col(valueCol).as("_v"))
      .filter(col("_v").isNotNull)
    val cnt = vals.groupBy("_g", "_v").agg(count(lit(1)).as("_c"))
      .localCheckpoint(false)
    val groups = cnt.groupBy("_g").agg(sum("_c").as("_n1"))
    val values = cnt.groupBy("_v").agg(sum("_c").as("_ct"))
    val total = values.agg(sum("_ct").as("_nn"))
    val wg = Window.partitionBy("_g").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val grid = broadcast(groups).crossJoin(values)
      .join(cnt, Seq("_g", "_v"), "left")
      .crossJoin(broadcast(total))
      .withColumn("_a", sum(coalesce(col("_c"), lit(0L))).over(wg))
      .withColumn("_call", sum(col("_ct")).over(wg))
    grid
      // the whole-corpus group (n_rest = 0) must not reach the division:
      // ANSI mode treats even a double /0 as an error, and its ks is
      // defined null anyway
      .withColumn("_d", when(col("_nn") - col("_n1") > 0L, abs(
        col("_a").cast("double") / col("_n1").cast("double") -
          (col("_call") - col("_a")).cast("double") /
            (col("_nn") - col("_n1")).cast("double"))))
      .groupBy("_g")
      .agg(max(col("_n1")).as("n_group"),
        max(col("_nn") - col("_n1")).as("n_rest"),
        max(col("_d")).as("ks"))
      .select(col("_g").as(groupCol), col("n_group"), col("n_rest"),
        col("ks"))
  }
}
