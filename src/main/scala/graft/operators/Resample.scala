package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling with forward fill — gap repair for
  * per-key metric series (training-data feature tables want one row per
  * (key, slot), not whatever slots happened to have events).
  *
  * Shape: per-key span (one aggregate) → `sequence(lo, hi, step)` exploded
  * into the complete grid → left join back to the observations → `last(...,
  * ignoreNulls)` over a running window to carry the previous value across
  * empty slots.
  *
  * Scale notes: the grid explode emits span/step rows per key — linear in
  * the output, no shuffle beyond the one the join needs; the fill window
  * partitions by key, so one key's grid must fit a task (pre-split
  * degenerate keys by coarse time range first, same caveat as Sessionize).
  */
object Resample {

  /** Fill `df` out to a complete per-key grid of `tsCol` values stepping by
    * `step` (e.g. `expr("INTERVAL 1 DAY")`) from each key's min to max slot,
    * forward-filling `valCols` across the introduced gaps.
    *
    * `df` must already be at grid granularity — exactly one row per
    * (keys, tsCol), with tsCol aligned to slot boundaries (aggregate first,
    * e.g. `date_trunc`): duplicate slots would fan out the grid join.
    */
  def forwardFill(df: DataFrame, keys: Seq[String], tsCol: String,
                  valCols: Seq[String], step: Column): DataFrame = {
    require(keys.nonEmpty, "forwardFill needs at least one partition key")
    require(valCols.nonEmpty, "forwardFill needs at least one value column")
    require(!df.columns.contains("_lo") && !df.columns.contains("_hi"),
      "input must not contain the reserved columns _lo/_hi")
    val k = keys.map(col)
    val grid = df.groupBy(k: _*)
      .agg(min(col(tsCol)).as("_lo"), max(col(tsCol)).as("_hi"))
      .select(k :+ explode(sequence(col("_lo"), col("_hi"), step)).as(tsCol): _*)
    val w = Window.partitionBy(k: _*).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valCols.foldLeft(grid.join(df, keys :+ tsCol, "left")) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Skew-proof [[forwardFill]] for fixed-duration steps: identical output,
    * but the grid is generated and filled per (key, chunk) — one degenerate
    * key with a decade-long span at fine granularity spreads over
    * span/chunkSeconds tasks instead of exploding one giant slot array and
    * sorting the whole key in one window task.
    *
    * Three phases:
    *  1. chunked grid: per key, explode the CHUNK index range (coarse),
    *     then the slot offsets inside each chunk — every generated array is
    *     ≤ chunkSeconds/stepSeconds elements, and slot values are exact
    *     integer arithmetic from the key's min slot (`lo + n·step`);
    *  2. within-chunk forward fill — window partitioned by (key, chunk);
    *  3. cross-chunk carry on per-chunk SUMMARY rows (latest non-null value
    *     per chunk, then a running `last ignoreNulls` over the chunk
    *     sequence per key) joined back to patch each chunk's leading nulls.
    *
    * `stepSeconds` replaces [[forwardFill]]'s interval column: chunking
    * needs slot arithmetic, which calendar intervals (months) don't admit.
    */
  def forwardFillBucketed(df: DataFrame, keys: Seq[String], tsCol: String,
                          valCols: Seq[String], stepSeconds: Long,
                          chunkSeconds: Long = 32L * 86400L): DataFrame = {
    require(keys.nonEmpty, "forwardFillBucketed needs at least one partition key")
    require(valCols.nonEmpty, "forwardFillBucketed needs at least one value column")
    require(stepSeconds > 0 && chunkSeconds >= stepSeconds,
      s"need stepSeconds > 0 and chunkSeconds >= stepSeconds ($stepSeconds/$chunkSeconds)")
    val reserved = Seq("_lo_s", "_hi_s", "_lo_us", "_hi_us", "_ck", "_n",
      "_ts_s", "_carry", "_frac", "_hrem")
    require(!df.columns.exists(c => reserved.contains(c) || c.startsWith("_last__")),
      s"input must not contain reserved columns ${reserved.mkString("/")}/_last__*")
    val k = keys.map(col)
    val chunkOf = (s: Column) => floor(s / chunkSeconds).cast("long")
    // 1. per-key span in whole seconds → chunk range → in-chunk slot range.
    //    Slot n lives at lo + n·step; chunk ck covers slots with
    //    ck·chunk ≤ lo + n·step < (ck+1)·chunk, clamped to [0, nMax].
    //    Sub-second stamps: forwardFill's contract has every stamp at
    //    lo + n·step with whole-second steps, so all of a key's stamps
    //    share lo's µs remainder. Carry that remainder (`_frac`) alongside
    //    and do the span/chunk/slot arithmetic in whole seconds (small
    //    integers — exact in doubles; raw micros would not be), restoring
    //    it when the grid timestamps materialize — a truncating
    //    unix_timestamp here would silently miss every sub-second stamp on
    //    the join-back.
    // pure integral arithmetic: subtracting the pmod remainder makes each
    // dividend exactly divisible, and `div` on an exact multiple equals
    // floor division for any sign — no double roundtrip, so the grid stays
    // exact for any representable timestamp (a double division would drift
    // past 2^53 µs)
    val span = df.groupBy(k: _*)
      .agg(min(unix_micros(col(tsCol))).as("_lo_us"),
        max(unix_micros(col(tsCol))).as("_hi_us"))
      .withColumn("_frac", pmod(col("_lo_us"), lit(1000000L)))
      .withColumn("_hrem", pmod(col("_hi_us") - col("_frac"), lit(1000000L)))
      .select(k ++ Seq(col("_frac"),
        expr("(_lo_us - _frac) div 1000000").as("_lo_s"),
        expr("(_hi_us - _frac - _hrem) div 1000000").as("_hi_s")): _*)
    val chunked = span.select(k ++ Seq(col("_frac"), col("_lo_s"), col("_hi_s"),
      explode(sequence(chunkOf(col("_lo_s")), chunkOf(col("_hi_s")))).as("_ck")): _*)
    val n0 = greatest(lit(0L),
      ceil((col("_ck") * chunkSeconds - col("_lo_s")).cast("double") / stepSeconds).cast("long"))
    val nMax = floor((col("_hi_s") - col("_lo_s")) / stepSeconds).cast("long")
    val n1 = least(nMax,
      floor(((col("_ck") + 1) * chunkSeconds - 1 - col("_lo_s")) / stepSeconds).cast("long"))
    val grid = chunked
      .filter(n1 >= n0) // a chunk may hold no slot when step > chunk overlap
      .select(k ++ Seq(col("_ck"), col("_frac"),
        explode(transform(sequence(n0, n1),
          n => col("_lo_s") + n * stepSeconds)).as("_ts_s")): _*)
      .select(k ++ Seq(col("_ck"),
        timestamp_micros(col("_ts_s") * 1000000L + col("_frac")).as(tsCol)): _*)
    // 2. join observations, fill within (key, chunk)
    val wc = Window.partitionBy(k :+ col("_ck"): _*).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valCols.foldLeft(grid.join(df, keys :+ tsCol, "left")) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(wc))
    }
    // 3. carry: per (key, chunk) the latest filled value is simply the last
    //    slot's (step 2 already propagated within the chunk); a running
    //    last-ignoreNulls over PRIOR chunks gives each chunk its carry-in
    val wk = Window.partitionBy(k: _*).orderBy(col("_ck"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // max(struct(ts, v)) = the chunk's LAST slot (ts is unique per slot);
    // after step 2 its value is null iff the whole chunk is null — exactly
    // the carry semantics (all-null chunks cascade the earlier carry)
    val lastAggs = valCols.map(c =>
      max(struct(col(tsCol).as("t"), col(c).as("v"))).getField("v").as(s"_last__$c"))
    val summaries = local
      .groupBy(k :+ col("_ck"): _*)
      .agg(lastAggs.head, lastAggs.tail: _*)
    val carries = valCols.foldLeft(summaries) { (d, c) =>
      d.withColumn(s"_last__$c", last(col(s"_last__$c"), ignoreNulls = true).over(wk))
    }
    val patched = valCols.foldLeft(
      local.join(carries, keys :+ "_ck", "left")) { (d, c) =>
      d.withColumn(c, coalesce(col(c), col(s"_last__$c")))
    }
    patched.drop("_ck" +: valCols.map(c => s"_last__$c"): _*)
  }

  /** CUSUM changepoint detection over per-key daily event counts (Page,
    * Biometrika 1954, in the exact integer form): with daily counts
    * `x_1..x_T`, the centered cumulative sum `S_t = Σ_{s≤t}(x_s − x̄)`
    * peaks at the most likely single changepoint. To keep it EXACT, the
    * statistic is scaled by `T`: `D_t = T·cum_t − t·total` (= `T·S_t`,
    * all longs — no mean double anywhere); the burst day is
    * `argmax |D_t|` (ties to the earliest day) and `score =
    * |D_t*| / (T·total)` ∈ [0, 1) is the one normalized double — a flat
    * series scores ~0, a clean step change approaches the step fraction.
    * The operational "did this event stream shift, and when" alarm for
    * ingest monitoring.
    *
    * Output per key: `(keyCols…, n_days, total, burst_day, t_star,
    * d_star, score)`, `d_star` signed (`> 0`: the early days run HOT —
    * rate fell after the burst day; `< 0`: rate rose).
    *
    * The day series is DENSIFIED over each key's [min day, max day] span
    * with zero-count fills before the cumulative windows: a stream that
    * halts entirely still accumulates flat days after the drop, so a
    * rate-fall-to-zero IS detected, and `t` indexes CALENDAR days — the
    * changepoint localizes correctly on sparse streams too. (Days outside
    * the observed span are unknowable from the data and stay out.)
    *
    * Scale shape: one (key, day)-keyed count (map-side combinable), a
    * calendar-sized per-key grid join, then windows over the per-key DAY
    * series (calendar-sized, not event-sized) and one max(struct) argmax. */
  def cusumBurst(df: DataFrame, keyCols: Seq[String],
                 tsCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column is required")
    require(!df.columns.exists(Set("_day", "_x", "_t", "_tt", "_tot",
      "_cum", "_dd", "_m", "_lo", "_hi")),
      "input must not contain the reserved columns _day/_x/_t/_tt/_tot/_cum/_dd/_m/_lo/_hi")
    val kcols = keyCols.map(col)
    val observed = df
      .groupBy(kcols :+ date_trunc("day", col(tsCol)).as("_day"): _*)
      .agg(count(lit(1)).as("_x"))
    // zero-fill the key's calendar span: the grid is days-sized per key
    // (bounded by the time range, never by event volume)
    val grid = observed
      .groupBy(kcols: _*)
      .agg(min(col("_day")).as("_lo"), max(col("_day")).as("_hi"))
      .select(kcols :+
        explode(sequence(col("_lo"), col("_hi"), expr("interval 1 day")))
          .as("_day"): _*)
    val daily = grid.join(observed, keyCols :+ "_day", "left")
      .withColumn("_x", coalesce(col("_x"), lit(0L)))
    val ord = Window.partitionBy(kcols: _*).orderBy(col("_day"))
    val all = Window.partitionBy(kcols: _*)
    val scored = daily
      .withColumn("_t", row_number().over(ord).cast("long"))
      .withColumn("_tt", count(lit(1)).over(all))
      .withColumn("_tot", sum(col("_x")).over(all))
      .withColumn("_cum", sum(col("_x"))
        .over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_dd", col("_tt") * col("_cum") - col("_t") * col("_tot"))
    scored
      .groupBy(kcols: _*)
      .agg(max(col("_tt")).as("n_days"), max(col("_tot")).as("total"),
        max(struct(abs(col("_dd")).as("_m"), (-col("_t")).as("_nt"),
          col("_day").as("_day"), col("_t").as("_t"), col("_dd").as("_dd")))
          .as("_b"))
      .select(kcols ++ Seq(col("n_days"), col("total"),
        col("_b._day").as("burst_day"), col("_b._t").as("t_star"),
        col("_b._dd").as("d_star"),
        (col("_b._m").cast("double") /
          (col("n_days") * col("total")).cast("double")).as("score")): _*)
  }
}
