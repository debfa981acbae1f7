package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: split each user's event stream into sessions at
  * inactivity gaps > `gapMinutes`.
  *
  * Classic two-window shape: lag() flags session starts, a running sum of
  * flags numbers the sessions. Both windows share one partitioning
  * (user_id, ordered by ts) so Spark plans a single shuffle + sort and the
  * second window reuses it — check `.explain`: one Exchange, one Sort.
  * Skewed users (one user = one partition's worth of events) are the scale
  * risk; AQE skew handling doesn't split windows, so for 100 TB use
  * [[assignSessionsBucketed]], which pre-splits every user by a coarse
  * time bucket and stitches sessions across bucket boundaries — same
  * result, per-task work bounded by one (user, bucket).
  */
object Sessionize {

  /** Assign `session_id` (1-based per user) to each event. `tieBreak`
    * columns make the ordering total when timestamps collide (a must for
    * cross-engine determinism). Gap comparison floors timestamps to whole
    * seconds so engines with different sub-second precision agree. */
  def assignSessions(events: DataFrame, userCol: String, tsCol: String,
                     gapMinutes: Int = 30, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy((tsCol +: tieBreak).map(col): _*)
    val gapSec = gapMinutes * 60L
    events
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev_ts").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("_prev_ts")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("_new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_prev_ts", "_new_session")
  }

  /** Skew-proof [[assignSessions]]: identical output, but no single task
    * ever holds more than one (user, coarse time bucket) of events.
    *
    * Two phases:
    *  1. local sessionization per (user, bucket) — the window partitions on
    *     BOTH columns, so a degenerate user (months of firehose events)
    *     spreads over bucketCount tasks instead of stalling one;
    *  2. boundary stitching on the per-bucket SUMMARY rows (one row per
    *     (user, bucket) — orders of magnitude smaller): a bucket's first
    *     session merges with the previous bucket's last session iff the
    *     boundary gap is within `gapMinutes` (there are no intervening
    *     events by construction), and a running offset re-bases each
    *     bucket's local session numbers onto the global sequence:
    *     global = Σ_{b'<b} sessions(b') − Σ_{b'≤b} merged(b') + local.
    *
    * The stitch windows partition by user alone but run over per-bucket
    * summaries, so the degenerate task is `buckets per user` rows — pick
    * `bucketHours` so that stays small (default: one summary row per
    * user-day). */
  def assignSessionsBucketed(events: DataFrame, userCol: String, tsCol: String,
                             gapMinutes: Int = 30, tieBreak: Seq[String] = Nil,
                             bucketHours: Int = 24): DataFrame = {
    val reserved = Seq("_bk", "_prev_ts", "_new_local", "_ls", "_first_s", "_last_s",
      "_n_sessions", "_prev_last_s", "_merge", "_base")
    require(!events.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    val gapSec = gapMinutes * 60L
    val bucketSec = bucketHours * 3600L
    val wLocal = Window.partitionBy(col(userCol), col("_bk"))
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val flagged = events
      .withColumn("_bk", floor(unix_timestamp(col(tsCol)) / bucketSec))
      .withColumn("_prev_ts", lag(col(tsCol), 1).over(wLocal))
      .withColumn("_new_local",
        when(col("_prev_ts").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("_prev_ts")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("_ls", sum(col("_new_local"))
        .over(wLocal.rowsBetween(Window.unboundedPreceding, 0)))
    val wU = Window.partitionBy(col(userCol)).orderBy(col("_bk"))
    val stitched = flagged
      .groupBy(col(userCol), col("_bk"))
      .agg(min(unix_timestamp(col(tsCol))).as("_first_s"),
        max(unix_timestamp(col(tsCol))).as("_last_s"),
        max(col("_ls")).as("_n_sessions"))
      .withColumn("_prev_last_s", lag(col("_last_s"), 1).over(wU))
      // merge iff the boundary gap fits: the previous SUMMARY row is the
      // previous bucket WITH events, so this is exactly the inter-event gap
      .withColumn("_merge",
        when(col("_prev_last_s").isNotNull &&
          col("_first_s") - col("_prev_last_s") <= gapSec, 1L).otherwise(0L))
      .withColumn("_base",
        coalesce(sum(col("_n_sessions"))
          .over(wU.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          - sum(col("_merge")).over(wU.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col(userCol), col("_bk"), col("_base"))
    flagged
      .join(stitched, Seq(userCol, "_bk"))
      .withColumn("session_id", col("_base") + col("_ls"))
      .drop("_bk", "_prev_ts", "_new_local", "_ls", "_base")
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   valueCol: String, gapMinutes: Int = 30,
                   tieBreak: Seq[String] = Nil): DataFrame =
    rollup(assignSessions(events, userCol, tsCol, gapMinutes, tieBreak),
      userCol, tsCol, valueCol)

  /** [[sessionStats]] over the skew-proof bucketed assigner — identical
    * output, bounded per-task state. */
  def sessionStatsBucketed(events: DataFrame, userCol: String, tsCol: String,
                           valueCol: String, gapMinutes: Int = 30,
                           tieBreak: Seq[String] = Nil,
                           bucketHours: Int = 24): DataFrame =
    rollup(assignSessionsBucketed(events, userCol, tsCol, gapMinutes, tieBreak,
      bucketHours), userCol, tsCol, valueCol)

  private def rollup(assigned: DataFrame, userCol: String, tsCol: String,
                     valueCol: String): DataFrame =
    assigned
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("value_sum"))

  /** Ordered-funnel completion per user: `stage_reached` is the longest
    * PREFIX of `stages` that occurs as a subsequence of the user's
    * time-ordered event types (0 = not even the first stage; a later
    * stage never counts without every earlier one — the product-analytics
    * funnel definition).
    *
    * Mechanism: one grouped collect of the ordered type sequence, joined
    * into a `|event||event|`-delimited string; each funnel prefix is one
    * LIKE pattern (`%|view|%|click|%` — double delimiters so adjacent
    * events still expose a `|` boundary to the next pattern), and
    * subsequence containment is monotone in the prefix so a CASE from
    * longest to shortest yields the stage. Strings and LIKE are
    * engine-portable; ordering follows the q16 (ts, tieBreak…) total
    * order.
    *
    * Only events whose type is in `stages` are collected (collect_list
    * skips the null the `when` yields for everything else): non-stage
    * types can neither create nor break a prefix match, so dropping them
    * is semantics-preserving — and it closes the injection where a DATA
    * value containing '|' (e.g. `x|view|y`) would fabricate a `|view|`
    * boundary in the joined string and falsely complete a stage. It also
    * bounds per-user state by the user's STAGE events, not their full
    * event history (the hot-user guard, now structural). A user with no
    * stage events still gets a row (empty sequence ⇒ stage 0).
    *
    * Stage names must not contain `|` or LIKE wildcards. Output:
    * `(userCol, stage_reached)`. */
  def funnelStages(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, stages: Seq[String],
                   tieBreak: Seq[String] = Nil): DataFrame = {
    val orderCols = (col(tsCol) +: tieBreak.map(col)) :+ col(typeCol)
    val stageEvent = when(col(typeCol).isin(stages: _*),
      struct(orderCols: _*))
    val ordered = sort_array(collect_list(stageEvent))
    events.groupBy(col(userCol))
      .agg(transform(ordered, _.getField(typeCol)).as("_types"))
      .select(col(userCol),
        funnelStageOf(col("_types"), stages).as("stage_reached"))
  }

  /** Column core of [[funnelStages]]: the longest completed prefix of
    * `stages` occurring as a subsequence of an ALREADY-ORDERED event-type
    * array — SQL-registered as `funnel_stage(types, stages)` so a query
    * that has collected its own ordered sequence (e.g. from a window or a
    * sessionized struct sort) can score it without the groupBy. Same
    * delimiter/LIKE mechanism and the same injection guard: types outside
    * the stage vocabulary are filtered before the join, so a '|' in a
    * DATA value can never fabricate a stage boundary. */
  def funnelStageOf(orderedTypes: Column, stages: Seq[String]): Column = {
    require(stages.nonEmpty, "at least one funnel stage is required")
    stages.foreach(s => require(!s.exists("|%_".contains(_)),
      s"stage name '$s' must not contain '|' or LIKE wildcards"))
    def pattern(i: Int): String = "%|" + stages.take(i).mkString("|%|") + "|%"
    val joined = concat(lit("|"),
      array_join(filter(orderedTypes, t => t.isin(stages: _*)), "||"), lit("|"))
    // let-bind the joined sequence (the Scrub.wordNgrams lesson): each of
    // the |stages| LIKE probes reads the bound value instead of re-joining
    get(transform(array(joined), s =>
      (stages.length to 1 by -1).foldLeft(Option.empty[Column]) {
        case (acc, i) =>
          val cond = s.like(pattern(i))
          Some(acc.fold(when(cond, i))(_.when(cond, i)))
      }.get.otherwise(0).cast("int")), lit(0))
  }

  /** First-order behavioral transition matrix: per `(state, next_state)`
    * adjacent-event pair within a user's time-ordered stream, the count and
    * the row-normalized probability `p = n / Σ_next n` — the Markov-chain
    * view of an event stream (what follows what), the pathing complement of
    * [[funnelStages]]'s fixed-order view.
    *
    * Each user's LAST event has no successor and contributes no pair;
    * `tieBreak` columns make the per-user order total when timestamps
    * collide (cross-engine determinism, [[assignSessions]]'s convention).
    *
    * Scale shape: one shuffle partitions by user for the lead() window
    * (streaming, spillable); pairs then aggregate to the state×state
    * matrix (state-vocabulary sized, tiny) with map-side partial counts,
    * and the row normalizer is a window over that matrix — no second
    * corpus-wide exchange. A firehose user concentrates one window task
    * (the window holds O(1) state, but the task sorts that user's whole
    * stream); for that regime use [[transitionMatrixBucketed]] — identical
    * output, per-task work bounded by one (user, time bucket). */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       stateCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    require(!events.columns.contains("_next"),
      "inputs must not contain the reserved column _next")
    val w = Window.partitionBy(userCol).orderBy((tsCol +: tieBreak).map(col): _*)
    val pairs = events
      .select(Seq(col(userCol), col(tsCol), col(stateCol).as("state")) ++
        tieBreak.map(col): _*)
      .withColumn("_next", lead(col("state"), 1).over(w))
      .filter(col("_next").isNotNull)
    val matrix = pairs.groupBy(col("state"), col("_next").as("next_state"))
      .agg(count(lit(1)).as("n_trans"))
    normalizeRows(matrix)
  }

  /** Skew-proof [[transitionMatrix]]: identical output, but no single task
    * ever sorts more than one (user, coarse time bucket) of events — the
    * [[assignSessionsBucketed]] pattern applied to adjacent-pair extraction.
    *
    * Adjacent pairs split exactly two ways: WITHIN a bucket (a lead()
    * window partitioned on (user, bucket), so a firehose user spreads over
    * `buckets` tasks) and ACROSS consecutive non-empty buckets (the last
    * event of bucket b precedes the first event of the user's next
    * non-empty bucket — no intervening events by construction). Boundary
    * pairs come off per-(user, bucket) SUMMARY rows — first/last state as
    * exact min/max of the (order key, state) struct, a lag() over rows
    * orders-of-magnitude fewer than events; the degenerate per-user task
    * is `buckets per user` rows, so pick `bucketHours` to keep that small
    * (default: one summary row per user-day).
    *
    * `tsCol` may be a timestamp (bucketed on whole seconds, the
    * [[assignSessionsBucketed]] convention) or any integral column
    * (bucketed on its value / 3600·bucketHours) — bucket id is monotone
    * in the order key either way, which is what the split relies on. */
  def transitionMatrixBucketed(events: DataFrame, userCol: String,
                               tsCol: String, stateCol: String,
                               tieBreak: Seq[String] = Nil,
                               bucketHours: Int = 24): DataFrame = {
    val reserved = Seq("_bk", "_st", "_next", "_first", "_last", "_pl")
    require(!events.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    require(bucketHours >= 1, s"bucketHours ($bucketHours) must be >= 1")
    val bucketSec = bucketHours * 3600L
    val ordLong = events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_timestamp(col(tsCol))
      case _ => col(tsCol).cast("long")
    }
    val base = events
      .select(Seq(col(userCol), col(tsCol), col(stateCol).as("_st")) ++
        tieBreak.map(col): _*)
      .withColumn("_bk", floor(ordLong / bucketSec))
    val wLocal = Window.partitionBy(col(userCol), col("_bk"))
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val within = base
      .withColumn("_next", lead(col("_st"), 1).over(wLocal))
      .filter(col("_next").isNotNull)
      .select(col("_st").as("state"), col("_next").as("next_state"))
    // first/last event state per bucket via struct min/max over the SAME
    // total order the window uses (ts, tieBreak...; state last for
    // struct-shape completeness — the order is already total per the
    // operator's determinism contract)
    val ordKey = struct((tsCol +: tieBreak).map(c =>
      col(c).as("k_" + c)) :+ col("_st").as("s"): _*)
    val wU = Window.partitionBy(col(userCol)).orderBy(col("_bk"))
    val boundary = base
      .groupBy(col(userCol), col("_bk"))
      .agg(min(ordKey).as("_first"), max(ordKey).as("_last"))
      .withColumn("_pl", lag(col("_last"), 1).over(wU))
      .filter(col("_pl").isNotNull)
      .select(col("_pl.s").as("state"), col("_first.s").as("next_state"))
    val matrix = within.unionByName(boundary)
      .groupBy(col("state"), col("next_state"))
      .agg(count(lit(1)).as("n_trans"))
    normalizeRows(matrix)
  }

  /** Event-path n-gram mining — the length-n generalization of
    * [[transitionMatrix]]'s pairs: every sliding window of `n`
    * consecutive states in a user's time-ordered stream, counted
    * corpus-wide as a path string (`a > b > c`). The "what are the
    * common journeys" pathing report; feed the result to a TopK if only
    * the head matters.
    *
    * One user-partitioned window produces all `n−1` lead() steps (one
    * shuffle + sort, every lead reuses it — check `.explain`: one
    * Exchange); windows that would cross the stream's end (any null
    * lead) are dropped, so a user with fewer than `n` events contributes
    * nothing. `tieBreak` totalizes the order as everywhere else. The
    * firehose-user caveat of [[transitionMatrix]] applies — one user's
    * stream is one window task ([[transitionMatrixBucketed]]'s split
    * generalizes to n-grams via n−1 boundary rows, built when needed).
    *
    * Output: `(path, n_paths)`, exact integer counts, at most
    * |states|ⁿ rows. */
  def pathNgrams(events: DataFrame, userCol: String, tsCol: String,
                 stateCol: String, n: Int,
                 tieBreak: Seq[String] = Nil): DataFrame = {
    require(n >= 2 && n <= 8, s"n ($n) must be in [2, 8]")
    val reserved = (0 until n).map(i => s"_s$i")
    require(!events.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    val w = Window.partitionBy(userCol).orderBy((tsCol +: tieBreak).map(col): _*)
    val steps = col(stateCol).as("_s0") +:
      (1 until n).map(i => lead(col(stateCol), i).over(w).as(s"_s$i"))
    events
      .select(steps: _*)
      .filter(reserved.map(col(_).isNotNull).reduce(_ && _))
      .select(concat_ws(" > ", reserved.map(col): _*).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_paths"))
  }

  /** Skew-proof [[pathNgrams]]: identical output, no task ever sorts more
    * than one (user, coarse time bucket) — [[transitionMatrixBucketed]]'s
    * boundary-row recipe generalized from 1 to n−1 boundary rows.
    *
    * Grams split exactly two ways. WITHIN a bucket: the same lead()-chain,
    * but partitioned on (user, bucket), so a firehose user spreads over
    * `buckets` tasks. CROSSING a bucket boundary: such a gram takes a
    * suffix of ≤ n−1 events from its earliest bucket, a prefix of ≤ n−1
    * from its latest, and whole middle buckets of ≤ n−2 events — so every
    * crossing gram lives entirely inside the REDUCED stream of each
    * bucket's first n−1 and last n−1 events. A per-user window over that
    * reduced stream (≤ 2(n−1) rows per non-empty bucket — the degenerate
    * per-user task is `2(n−1)·buckets` rows, orders of magnitude fewer
    * than events) re-runs the lead chain; each candidate is kept only if
    * every adjacent pair is provably consecutive in the ORIGINAL stream —
    * same bucket with per-bucket rank r+1, or a bucket hop from the true
    * bucket-last (rank = bucket size) to the next bucket's true first
    * (rank 1; no non-empty bucket can intervene, since its first event
    * would sit between them in the reduced stream) — and if it crosses
    * (first/last bucket differ, so within-bucket grams aren't re-counted).
    *
    * `tsCol` follows [[transitionMatrixBucketed]]'s convention: timestamp
    * (bucketed on whole seconds) or any integral column. */
  def pathNgramsBucketed(events: DataFrame, userCol: String, tsCol: String,
                         stateCol: String, n: Int,
                         tieBreak: Seq[String] = Nil,
                         bucketHours: Int = 24): DataFrame = {
    require(n >= 2 && n <= 8, s"n ($n) must be in [2, 8]")
    require(bucketHours >= 1, s"bucketHours ($bucketHours) must be >= 1")
    val reserved = Seq("_bk", "_st", "_rk", "_sz") ++
      (0 until n).flatMap(i => Seq(s"_s$i", s"_b$i", s"_r$i", s"_z$i"))
    require(!events.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    val bucketSec = bucketHours * 3600L
    val ordLong = events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_timestamp(col(tsCol))
      case _ => col(tsCol).cast("long")
    }
    val base = events
      .select(Seq(col(userCol), col(tsCol), col(stateCol).as("_st")) ++
        tieBreak.map(col): _*)
      .withColumn("_bk", floor(ordLong / bucketSec))
    val wLocal = Window.partitionBy(col(userCol), col("_bk"))
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val sCols = (0 until n).map(i => col(s"_s$i"))
    val allPresent = sCols.map(_.isNotNull).reduce(_ && _)
    val within = base
      .select(col("_st").as("_s0") +:
        (1 until n).map(i => lead(col("_st"), i).over(wLocal).as(s"_s$i")): _*)
      .filter(allPresent)
      .select(concat_ws(" > ", sCols: _*).as("path"))
    // reduced boundary stream; _rk/_sz are per-(user, bucket), cheap
    val ranked = base
      .withColumn("_rk", row_number().over(wLocal))
      .withColumn("_sz",
        count(lit(1)).over(Window.partitionBy(col(userCol), col("_bk"))))
      .filter(col("_rk") <= n - 1 || col("_rk") > col("_sz") - (n - 1))
    val wU = Window.partitionBy(col(userCol))
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val crossCols = (0 until n).flatMap { i =>
      if (i == 0) Seq(col("_st").as("_s0"), col("_bk").as("_b0"),
        col("_rk").as("_r0"), col("_sz").as("_z0"))
      else Seq(lead(col("_st"), i).over(wU).as(s"_s$i"),
        lead(col("_bk"), i).over(wU).as(s"_b$i"),
        lead(col("_rk"), i).over(wU).as(s"_r$i"),
        lead(col("_sz"), i).over(wU).as(s"_z$i"))
    }
    val consecutive = (1 until n).map { i =>
      (col(s"_b$i") === col(s"_b${i - 1}") &&
        col(s"_r$i") === col(s"_r${i - 1}") + 1) ||
      (col(s"_b$i") > col(s"_b${i - 1}") &&
        col(s"_r${i - 1}") === col(s"_z${i - 1}") && col(s"_r$i") === 1)
    }.reduce(_ && _)
    val crossing = ranked
      .select(crossCols: _*)
      .filter(allPresent && consecutive && col(s"_b${n - 1}") =!= col("_b0"))
      .select(concat_ws(" > ", sCols: _*).as("path"))
    within.unionByName(crossing)
      .groupBy("path").agg(count(lit(1)).as("n_paths"))
  }

  /** Row-normalize a (state, next_state, n_trans) matrix: `p = n / Σ_next
    * n`, a window over the state-vocabulary-sized matrix, never the data. */
  private def normalizeRows(matrix: DataFrame): DataFrame = {
    val rowW = Window.partitionBy("state")
    matrix.withColumn("p",
      col("n_trans").cast("double") / sum(col("n_trans")).over(rowW).cast("double"))
  }

  /** Last-touch conversion attribution: each `conversionType` event is
    * credited to the most recent STRICTLY-PRECEDING event of one of the
    * `touchTypes` in the same user's stream (`(none)` when no touch ever
    * preceded — never silently dropped). Output per touch type:
    * `n_conversions` and `revenue` (the conversion events' `valueCol`
    * mass; summed as decimal(18,6) so parallel aggregation order can't
    * move the double).
    *
    * Scale shape: one user-partitioned window (the carry-forward `last`
    * over touches runs streaming, O(1) state per row), then a
    * touch-vocabulary-sized aggregation. */
  /** EXACT Shapley-value attribution (Shapley 1953; the coalition model
    * of Zhao et al., "Shapley value methods for attribution modeling",
    * 2018): each converting user's pre-conversion touched-channel SET is
    * a coalition observation; the characteristic function
    * `v(S) = #conversions whose touch set ⊆ S`, and channel c's value is
    * `φ_c = Σ_{S ⊆ C∖{c}} |S|!·(n−1−|S|)!/n! · (v(S∪{c}) − v(S))` —
    * unlike last-touch/time-decay heuristics this is the unique
    * efficient-symmetric-null credit split over the observed coalition
    * behavior, and unlike the Markov removal effects it needs no chain
    * assumption.
    *
    * EXACT INTEGER arithmetic throughout: `v` values are counts, the
    * factorial weights are plan-literal integers, and the reported
    * `shapley_e` = φ_c·n! is an exact long (`shapley` = its one double
    * division by n!). Σ_c φ_c = v(C) − v(∅) exactly (efficiency over
    * attributable conversions; users converting with NO prior touch sit
    * in v(∅) and receive no credit, correctly).
    *
    * `channels` is the explicit vocabulary (n ≤ 16 — 2ⁿ subset rows;
    * Shapley over more channels is a different, sampled estimator);
    * touches are events with `typeCol` ∈ channels STRICTLY BEFORE the
    * user's first `conversionType` event.
    *
    * Scale shape: ONE user-keyed aggregation collapses the corpus to a
    * per-user bitmask; everything after is 2ⁿ-sized — the mask→subset
    * containment join, the two v lookups, the weighted sum. Nothing
    * data-sized past the first shuffle.
    *
    * Output per channel: `(channel, shapley_e, shapley, n_converters)`. */
  def shapleyAttribution(events: DataFrame, userCol: String, tsCol: String,
                         typeCol: String, conversionType: String,
                         channels: Seq[String]): DataFrame = {
    require(channels.nonEmpty && channels.size <= 16,
      s"channels (${channels.size}) must be 1..16")
    require(channels.distinct.size == channels.size, "duplicate channels")
    require(!channels.contains(conversionType),
      "the conversion type cannot also be a channel")
    val n = channels.size
    val spark = events.sparkSession
    import spark.implicits._
    val (cnt, conv) = touchMaskCounts(events, userCol, tsCol, typeCol,
      conversionType, channels)
    val subsets = spark.range(1L << n).select(col("id").as("_s"))
    val v = subsets.join(cnt,
        (col("_m").bitwiseAND(col("_s"))) === col("_m"), "left")
      .groupBy("_s").agg(coalesce(sum(col("_c")), lit(0L)).as("_v"))
      .localCheckpoint(true) // two lookups per channel term
    def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)
    val terms = channels.zipWithIndex.map { case (c, i) =>
      val bit = 1L << i
      val without = v.filter((col("_s").bitwiseAND(lit(bit))) === 0L)
        .select(col("_s"), col("_v").as("_vs"))
      val pop = expr("bit_count(_s)")
      val weight = (0 until n).map(s =>
        when(pop === s, lit(fact(s) * fact(n - 1 - s))).otherwise(lit(0L)))
        .reduce(_ + _)
      without
        .join(v.select((col("_s") - bit).as("_s"), col("_v").as("_vsc")),
          Seq("_s"))
        .agg(coalesce(sum(weight * (col("_vsc") - col("_vs"))), lit(0L))
          .as("shapley_e"))
        .select(lit(c).as("channel"), col("shapley_e"))
    }
    val nConv = conv.agg(count(lit(1)).as("n_converters"))
    terms.reduce(_.unionByName(_))
      .crossJoin(broadcast(nConv))
      .select(col("channel"), col("shapley_e"),
        (col("shapley_e").cast("double") / lit(fact(n).toDouble))
          .as("shapley"),
        col("n_converters"))
  }

  /** Shared core of the Shapley attributions: per-converter
    * pre-conversion touch BITMASK over `channels` (bit i set ⇔ the user
    * touched channel i strictly before their first conversion), rolled
    * up to `(_m, _c)` mask counts — converters with zero pre-conversion
    * touches land in mask 0. Returns `(maskCounts, converters)`; the
    * characteristic function both estimators share is
    * `v(S) = Σ_{m ⊆ S} count(m)` (converters fully explained by S). */
  private def touchMaskCounts(events: DataFrame, userCol: String,
                              tsCol: String, typeCol: String,
                              conversionType: String,
                              channels: Seq[String])
      : (DataFrame, DataFrame) = {
    val base = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), col(tsCol).as("_ts"),
        col(typeCol).as("_ty"))
      .localCheckpoint(true) // conversion times + touch scan
    val conv = base.filter(col("_ty") === conversionType)
      .groupBy("_u").agg(min(col("_ts")).as("_ct"))
    val maskExpr = channels.zipWithIndex.map { case (c, i) =>
      max(when(col("_ty") === c, lit(1L << i)).otherwise(0L))
    }.reduce(_ + _)
    val masks = base.join(conv, Seq("_u"))
      .filter(col("_ts") < col("_ct"))
      .groupBy("_u").agg(maskExpr.as("_m"))
    val cnt = conv.join(masks, Seq("_u"), "left")
      .select(coalesce(col("_m"), lit(0L)).as("_m"))
      .groupBy("_m").agg(count(lit(1)).as("_c"))
      .localCheckpoint(true) // observed-mask-bounded; read by subset joins
    (cnt, conv)
  }

  /** SAMPLED-permutation Shapley attribution (Castro, Gómez & Tejada,
    * "Polynomial calculation of the Shapley value based on sampling",
    * Computers & OR 2009) — the n > 16 regime [[shapleyAttribution]]'s
    * exact 2ⁿ subset table cannot reach: draw `nSamples` DETERMINISTIC
    * channel permutations (md5 lanes: position of channel i in sample t
    * is the rank of md5("t:i:domain"), ties by i — replayable by any
    * engine with md5), and average each channel's marginal contribution
    * `v(prefix ∪ {i}) − v(prefix)` over its sampled prefixes.
    *
    * Exactness of the ESTIMATE (not the estimand): every marginal is an
    * integer, `shapley_e = Σ_t marginal_t` is an exact long two engines
    * agree on bit-for-bit, and `shapley = shapley_e / nSamples` is one
    * double division. The estimator is unbiased with O(1/√nSamples)
    * error (Castro et al. §3); per permutation the marginals telescope,
    * so Σ_i shapley_e_i = nSamples·(v(full) − v(∅)) EXACTLY — the
    * efficiency axiom holds for the estimate, not just in expectation.
    *
    * Scale shape: one corpus pass builds the observed-mask counts
    * (M ≤ min(2ⁿ, converters) rows); the coalition table is
    * nSamples·(n+1) rows built DRIVER-SIDE (bounded by the two explicit
    * Scala arguments); v evaluates as one broadcast nested-loop subset
    * join of M × distinct-coalitions — at n = 24, T = 64 that is
    * ~1,600 probes per observed mask vs the exact form's 16M subsets.
    * Output: `(channel, n_samples, shapley_e, shapley, n_converters)`. */
  def shapleySampledAttribution(events: DataFrame, userCol: String,
                                tsCol: String, typeCol: String,
                                conversionType: String,
                                channels: Seq[String], nSamples: Int = 64,
                                domain: String = "shap"): DataFrame = {
    require(channels.nonEmpty && channels.size <= 62,
      s"channels (${channels.size}) must be 1..62 (long bitmask)")
    require(channels.distinct.size == channels.size, "duplicate channels")
    require(!channels.contains(conversionType),
      "the conversion type cannot also be a channel")
    require(nSamples >= 1 && nSamples <= 100000,
      s"nSamples ($nSamples) must be 1..100000")
    val spark = events.sparkSession
    import spark.implicits._
    val (cnt, conv) = touchMaskCounts(events, userCol, tsCol, typeCol,
      conversionType, channels)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // (sample, channel, prefix-without, prefix-with) — driver-side,
    // nSamples·n rows by construction
    val coals = (1 to nSamples).flatMap { t =>
      val perm = channels.zipWithIndex
        .map { case (c, i) => (md5hex(s"$t:$i:$domain"), i, c) }
        .sortBy(x => (x._1, x._2))
      var s = 0L
      perm.map { case (_, i, c) =>
        val row = (t, c, s, s | (1L << i))
        s |= (1L << i)
        row
      }
    }
    val coalDf = coals.toDF("_t", "channel", "_s0", "_s1")
    val need = coals.flatMap(x => Seq(x._3, x._4)).distinct.toDF("_s")
    // v(S) for every needed coalition: subset-containment BNL join with
    // the TINY coalition side broadcast; left join keeps v(∅) = 0 rows
    val v = broadcast(need).join(cnt,
        (col("_m").bitwiseAND(col("_s"))) === col("_m"), "left")
      .groupBy("_s").agg(coalesce(sum(col("_c")), lit(0L)).as("_v"))
      .localCheckpoint(true) // two lookups per coalition row
    val nConv = conv.agg(count(lit(1)).as("n_converters"))
    coalDf
      .join(v.select(col("_s").as("_s0"), col("_v").as("_v0")), Seq("_s0"))
      .join(v.select(col("_s").as("_s1"), col("_v").as("_v1")), Seq("_s1"))
      .groupBy(col("channel"))
      .agg(sum(col("_v1") - col("_v0")).as("shapley_e"))
      .crossJoin(broadcast(nConv))
      .select(col("channel"), lit(nSamples).as("n_samples"),
        col("shapley_e"),
        (col("shapley_e").cast("double") / lit(nSamples.toDouble))
          .as("shapley"),
        col("n_converters"))
  }

  def lastTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
                           typeCol: String, valueCol: String,
                           conversionType: String, touchTypes: Seq[String],
                           tieBreak: Seq[String] = Nil): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(conversionType),
      s"conversionType ($conversionType) cannot also be a touch type — a " +
        "conversion would attribute to the previous conversion")
    val w = Window.partitionBy(userCol)
      .orderBy((tsCol +: tieBreak).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isin(touchTypes.map(x => x: Any): _*), col(typeCol))
    events
      .withColumn("_touch", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .groupBy(coalesce(col("_touch"), lit("(none)")).as("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("revenue"))
  }

  /** Per-state transition entropy: how PREDICTABLE the next state is
    * given the current one — `H(next | cur = s) = −Σ_d p(d|s)·ln
    * p(d|s)` over the observed transition matrix. Low-entropy states
    * are funnels (one dominant next step); high-entropy states are
    * hubs. The information-theoretic read next to
    * [[transitionMatrix]]'s probabilities and [[rareTransitions]]'
    * flags.
    *
    * Determinism is the q199 mutual-information recipe: exact integer
    * cell counts, each ln term one fixed double expression of exact
    * integers, the per-state sum folded in DESTINATION order over a
    * sorted array (parallel double summation is order-dependent), the
    * result through [[graft.functions.ExactRound.roundFloor]] at 6 and
    * clamped at 0. Adjacency comes from one user-partitioned
    * `(tsCol, tieBreak…)` window; null users/states are excluded.
    *
    * Scale shape: ONE user-keyed window pass, one vocab²-sized count
    * aggregation; the folds are per-state vocabulary-sized arrays.
    * Output: `(state, total, n_dest, h_nats)`. */
  def transitionEntropy(events: DataFrame, userCol: String, tsCol: String,
                        stateCol: String,
                        tieBreak: Seq[String] = Nil): DataFrame = {
    val base = events.filter(col(userCol).isNotNull &&
      col(stateCol).isNotNull)
    val w = Window.partitionBy(userCol)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val matrix = base
      .withColumn("_next", lead(col(stateCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(stateCol).as("state"), col("_next").as("_d"))
      .agg(count(lit(1)).as("_n"))
    val folded = matrix.groupBy("state")
      .agg(sum(col("_n")).as("total"), count(lit(1)).as("n_dest"),
        sort_array(collect_list(struct(col("_d"), col("_n")))).as("_arr"))
    val totD = col("total").cast("double")
    folded.select(col("state"), col("total"), col("n_dest"),
      greatest(graft.functions.ExactRound.roundFloor(
        -aggregate(col("_arr"), lit(0.0), (acc, s) => {
          val p = s("_n").cast("double") / totD
          acc + p * log(p)
        }), 6), lit(0.0)).as("h_nats"))
  }

  /** Bot-regularity screen: users whose inter-event gaps are too
    * CLOCKWORK to be human — the complement of [[rareTransitions]]'
    * path screen. Per user, the population coefficient of variation of
    * consecutive gaps `cv = √(n·Σg² − (Σg)²) / Σg`; a user is flagged
    * iff they have ≥ `minGaps` gaps and `cv < cvPct/100`, decided
    * EXACTLY on integers: `10000·(n·Σg² − (Σg)²) < cvPct²·(Σg)²` in
    * decimal(38,0) (gaps are exact epoch-microsecond longs off one
    * lag() window; Σg² sums μs² — |gap| ≤ 10⁶ s keeps a 10⁶-event user
    * inside decimal(38)). No double ever decides a flag; the reported
    * `mean_gap_us`/`cv` are fixed-order doubles off the same exact
    * sums. Users whose gaps total 0 (all events at one instant) have
    * undefined cv and are NOT flagged (stated). Null user/ts rows are
    * excluded; the [[transitionMatrixBucketed]] firehose caveat
    * applies to the window.
    *
    * Scale shape: ONE user-keyed window pass + one map-side-combined
    * per-user aggregation; output is flagged-user-sized. Output:
    * `(user, n_gaps, mean_gap_us, cv)`. */
  def botRegularity(events: DataFrame, userCol: String, tsCol: String,
                    minGaps: Long = 5L, cvPct: Long = 10L,
                    tieBreak: Seq[String] = Nil): DataFrame = {
    require(minGaps >= 2L, s"minGaps ($minGaps) must be >= 2")
    require(cvPct >= 1L && cvPct <= 100L, s"cvPct ($cvPct) out of range")
    val d38 = "decimal(38,0)"
    val w = Window.partitionBy(userCol)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val gaps = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("_prev", lag(unix_micros(col(tsCol)), 1).over(w))
      .filter(col("_prev").isNotNull)
      .select(col(userCol).as("user"),
        (unix_micros(col(tsCol)) - col("_prev")).as("_g"))
    val g38 = col("_g").cast(d38)
    val sums = gaps.groupBy("user")
      .agg(count(lit(1)).as("n_gaps"), sum(col("_g")).as("_sg"),
        sum(g38 * g38).as("_sgg"))
    val num = col("n_gaps").cast(d38) * col("_sgg") -
      col("_sg").cast(d38) * col("_sg").cast(d38)
    sums
      .filter(col("n_gaps") >= minGaps && col("_sg") > 0L &&
        num * lit(10000L) < lit(cvPct * cvPct) *
          col("_sg").cast(d38) * col("_sg").cast(d38))
      .select(col("user"), col("n_gaps"),
        (col("_sg").cast("double") / col("n_gaps").cast("double"))
          .as("mean_gap_us"),
        (sqrt(num.cast("double")) / col("_sg").cast("double")).as("cv"))
  }

  /** Rare-transition anomaly flags: users whose event stream contains
    * a state transition the corpus almost never makes — the classic
    * bot/fraud screen over a Markov matrix (flag sessions walking
    * improbable paths). Rarity is decided EXACTLY on integers:
    * transition (s→d) is rare iff `n(s→d) · k < total(s)` (probability
    * strictly under 1/k) — no double ever decides a flag. `min_prob`
    * (the user's most improbable step) is reported as one fixed
    * double division per transition, min'd by comparison
    * (order-invariant).
    *
    * Output: only FLAGGED users — `(user, n_transitions, n_rare,
    * min_prob)` with `n_rare ≥ 1`. Adjacency comes from one
    * user-partitioned `(tsCol, tieBreak…)` window (the
    * [[transitionMatrixBucketed]] caveat applies under a firehose
    * user); the (src, dst) matrix is state-vocabulary-sized and
    * broadcast back onto the pairs. Null users/states are excluded.
    *
    * Scale shape: ONE user-keyed window pass, one vocab²-sized count
    * aggregation, one broadcast join, one per-user collapse. */
  def rareTransitions(events: DataFrame, userCol: String, tsCol: String,
                      stateCol: String, k: Long = 100L,
                      tieBreak: Seq[String] = Nil): DataFrame = {
    require(k >= 2L, s"k ($k) must be >= 2")
    val base = events.filter(col(userCol).isNotNull &&
      col(stateCol).isNotNull)
    val w = Window.partitionBy(userCol)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val pairs = base
      .withColumn("_next", lead(col(stateCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .select(col(userCol).as("_u"), col(stateCol).as("_s"),
        col("_next").as("_d"))
      .localCheckpoint(false) // matrix + the flag join read it
    val matrix = pairs.groupBy("_s", "_d").agg(count(lit(1)).as("_n"))
    val totals = matrix.groupBy("_s").agg(sum(col("_n")).as("_tot"))
    val cells = matrix.join(totals, Seq("_s"))
    pairs.join(broadcast(cells), Seq("_s", "_d"))
      .groupBy(col("_u").as("user"))
      .agg(count(lit(1)).as("n_transitions"),
        sum(when(col("_n") * lit(k) < col("_tot"), 1L).otherwise(0L))
          .as("n_rare"),
        min(col("_n").cast("double") / col("_tot").cast("double"))
          .as("min_prob"))
      .filter(col("n_rare") >= 1L)
  }

  /** Time-decay attribution — the third lane of the attribution family
    * ([[lastTouchAttribution]]'s heuristic, [[markovRemovalEffects]]'s
    * data-driven chain, and this: recency-weighted multi-touch): every
    * touch STRICTLY before its user's first `convState` event earns
    * weight `2^−k` with `k = floor(Δt / halfLife)` — an EXACT dyadic
    * rational, carried as the scaled integer `2^(62−k)` over the
    * common denominator 2⁶², summed in decimal(38,0) (10⁶ touches of
    * full weight ≈ 4.6·10²⁴ ≪ 10³⁸). Touches older than 62 half-lives
    * weigh exactly 0 (stated cutoff — their true weight is below any
    * double anyway). No ordering anywhere: weights depend only on the
    * time gap, so there is NO window and ties need no break.
    *
    * Share = channel's scaled sum / total scaled sum, one double
    * division of exact decimals; `weight` is the scaled sum over the
    * exact double 2⁶². Non-converting users contribute nothing; null
    * user/state rows are excluded.
    *
    * Scale shape: one user-keyed first-conversion aggregate, one
    * user-keyed join (converting users only), ONE map-side-combined
    * channel aggregation, a 1-row total broadcast. Output:
    * `(channel, n_touches, weight, share)`. */
  def timeDecayAttribution(events: DataFrame, userCol: String,
                           tsCol: String, stateCol: String,
                           convState: String,
                           halfLifeDays: Int = 7): DataFrame = {
    require(halfLifeDays >= 1 && halfLifeDays <= 3650,
      s"halfLifeDays ($halfLifeDays) out of range")
    val hlUs = halfLifeDays * 86400000000L
    val base = events.filter(col(userCol).isNotNull &&
      col(stateCol).isNotNull)
    val fc = base.filter(col(stateCol) === convState)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_fc"))
    val weighted = base.filter(col(stateCol) =!= convState)
      .join(fc, Seq(userCol))
      .filter(col(tsCol) < col("_fc"))
      .select(col(stateCol).as("channel"),
        (unix_micros(col("_fc")) - unix_micros(col(tsCol))).as("_d"))
      .select(col("channel"),
        expr(s"CASE WHEN _d div $hlUs <= 62 THEN " +
          s"shiftleft(1L, cast(62 - _d div $hlUs AS int)) " +
          "ELSE 0L END").as("_w"))
    val per = weighted.groupBy("channel")
      .agg(count(lit(1)).as("n_touches"),
        sum(col("_w").cast("decimal(38,0)")).as("_ws"))
      .localCheckpoint(false) // total + output read it
    val tot = per.agg(sum(col("_ws")).as("_wt"))
    per.crossJoin(broadcast(tot))
      .select(col("channel"), col("n_touches"),
        (col("_ws").cast("double") /
          lit(4611686018427387904L).cast("double")).as("weight"),
        when(col("_wt") === 0, lit(null).cast("double"))
          .otherwise(col("_ws").cast("double") / col("_wt").cast("double"))
          .as("share"))
  }

  /** Markov removal-effect attribution (Anderl et al., "Mapping the
    * customer journey", 2014 — the data-driven alternative to
    * [[lastTouchAttribution]]'s heuristic): model journeys as a
    * first-order chain over channels with absorbing `~conv`/`~null`
    * states, compute the chain's conversion probability from `~start`,
    * then for each channel recompute it on the chain WITH THAT CHANNEL
    * REMOVED (its outgoing transitions deleted, its incoming mass
    * redirected to `~null`). `removal_effect(c) = 1 − p_removed/p_base`
    * — how much of conversion the channel carries; `attribution`
    * normalizes the effects to shares.
    *
    * Journey construction: per user, `stateCol` events STRICTLY before
    * the user's first `convState` event (order `(tsCol, tieBreak…)`),
    * `~start` → first touch, touch→touch adjacents, last touch →
    * `~conv`/`~null` by whether the user ever converts; users who
    * convert with NO prior touch contribute `~start → ~conv` (never
    * silently dropped). Self-transitions are kept (stated; dropping
    * them is a different model). NULL users are excluded.
    *
    * Determinism: absorption probabilities are computed by `iters`
    * rounds of EXACT integer fixed-point in 10⁻¹² units
    * ([[graft.operators.Graph.pageRank]]'s arithmetic contract:
    * `v'(s) = (Σ_d n(s→d)·v(d)) div total(s)`, absorbers pinned at
    * 10¹²/0) — every replay is integer-for-integer; `iters` bounds the
    * walk length captured (mass on longer journeys is truncated toward
    * 0, identically on every engine). The final effects/shares are
    * fixed-order doubles; the share denominator folds in channel
    * order.
    *
    * Scale shape: ONE user-partitioned window pass over the events
    * (the only data-scale step). A CONVERTING firehose user
    * self-truncates (only pre-first-conversion events survive), but a
    * never-converting firehose keeps its whole stream in one window
    * task — for that regime pass `journeyBucketHours = Some(h)`:
    * identical output through [[transitionMatrixBucketed]]'s
    * within-bucket + boundary-summary split (measured at 8M events with
    * one 75% non-converter: 34.6 s plain → bounded per-(user, bucket)
    * tasks bucketed). Everything after — the (src, dst)
    * counts, the channel-variant expansion (|channels|+1 copies of a
    * vocabulary² table), and the fixed-point rounds — is channel-
    * vocabulary sized. Output per channel: `(channel, p_base_e12,
    * p_removed_e12, removal_effect, attribution)`. */
  def markovRemovalEffects(events: DataFrame, userCol: String,
                           tsCol: String, stateCol: String,
                           convState: String, tieBreak: Seq[String] = Nil,
                           iters: Int = 8,
                           journeyBucketHours: Option[Int] = None): DataFrame = {
    require(iters >= 1, s"iters ($iters) must be >= 1")
    require(journeyBucketHours.forall(_ >= 1),
      s"journeyBucketHours ($journeyBucketHours) must be >= 1")
    val Scale = 1000000000000L
    val spark = events.sparkSession
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    def idiv(a: Column, b: Column): Column = GraftColumnBridge.column(
      IntegralDivide(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b)))
    val base = events.filter(col(userCol).isNotNull &&
      col(stateCol).isNotNull)
    val fc = base.filter(col(stateCol) === convState)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_fc"))
    val j = base.filter(col(stateCol) =!= convState)
      .join(fc, Seq(userCol), "left")
      .filter(col("_fc").isNull || col(tsCol) < col("_fc"))
      .select(Seq(col(userCol), col(tsCol),
        col(stateCol).as("_c"), col("_fc").isNotNull.as("_cv")) ++
        tieBreak.map(col): _*)
      .localCheckpoint(false) // window pass + empty-journey anti-join
    // journey edges: per-user adjacent pairs + ~start→first + last→end.
    // Plain path: ONE per-user window (lead + row_number). Bucketed path
    // (journeyBucketHours = Some(h)): [[transitionMatrixBucketed]]'s
    // split — a never-converting firehose user otherwise sorts its whole
    // stream in one task (measured: 8M events / one 75% non-converter =
    // 34.6 s plain); within-bucket lead pairs partitioned on (user, h-hour
    // bucket), boundary pairs / first / last off per-bucket summary rows.
    val edges = journeyBucketHours match {
      case None =>
        val w = Window.partitionBy(userCol)
          .orderBy((tsCol +: tieBreak).map(col): _*)
        val marked = j
          .withColumn("_next", lead(col("_c"), 1).over(w))
          .withColumn("_rn", row_number().over(w))
        val mid = marked.filter(col("_next").isNotNull)
          .select(col("_c").as("src"), col("_next").as("dst"))
        val starts = marked.filter(col("_rn") === 1)
          .select(lit("~start").as("src"), col("_c").as("dst"))
        val ends = marked.filter(col("_next").isNull)
          .select(col("_c").as("src"),
            when(col("_cv"), lit("~conv")).otherwise(lit("~null")).as("dst"))
        mid.unionByName(starts).unionByName(ends)
      case Some(h) =>
        val bucketSec = h * 3600L
        val ordLong = j.schema(tsCol).dataType match {
          case org.apache.spark.sql.types.TimestampType =>
            unix_timestamp(col(tsCol))
          case _ => col(tsCol).cast("long")
        }
        val b = j.withColumn("_bk", floor(ordLong / bucketSec))
        val wLocal = Window.partitionBy(col(userCol), col("_bk"))
          .orderBy((tsCol +: tieBreak).map(col): _*)
        val within = b
          .withColumn("_next", lead(col("_c"), 1).over(wLocal))
          .filter(col("_next").isNotNull)
          .select(col("_c").as("src"), col("_next").as("dst"))
        val ordKey = struct((tsCol +: tieBreak).map(c =>
          col(c).as("k_" + c)) :+ col("_c").as("s"): _*)
        val wU = Window.partitionBy(col(userCol)).orderBy(col("_bk"))
        val sums = b.groupBy(col(userCol), col("_bk"))
          .agg(min(ordKey).as("_first"), max(ordKey).as("_last"),
            first(col("_cv")).as("_cvb")) // _cv is constant per user
          .withColumn("_pl", lag(col("_last"), 1).over(wU))
          .withColumn("_rn", row_number().over(wU))
          .withColumn("_nb", lead(col("_bk"), 1).over(wU))
        val boundary = sums.filter(col("_pl").isNotNull)
          .select(col("_pl.s").as("src"), col("_first.s").as("dst"))
        val starts = sums.filter(col("_rn") === 1)
          .select(lit("~start").as("src"), col("_first.s").as("dst"))
        val ends = sums.filter(col("_nb").isNull)
          .select(col("_last.s").as("src"),
            when(col("_cvb"), lit("~conv")).otherwise(lit("~null")).as("dst"))
        within.unionByName(boundary).unionByName(starts).unionByName(ends)
    }
    val emptyConv = fc.join(j.select(col(userCol)).distinct(),
        Seq(userCol), "left_anti")
      .select(lit("~start").as("src"), lit("~conv").as("dst"))
    val cnt = edges
      .unionByName(emptyConv)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // vocabulary²-sized; variants re-read it
    val channels = cnt.select(col("src").as("_ch"))
      .filter(!col("_ch").startsWith("~")).distinct()
    // channels is the channel vocabulary — tiny by contract, and AQE
    // would broadcast it anyway; hint it so the plan cannot degrade to a
    // shuffle cross product if the vocabulary contract is ever violated
    val variants = cnt.crossJoin(broadcast(channels))
      .filter(col("src") =!= col("_ch"))
      .select(col("_ch").as("variant"), col("src"),
        when(col("dst") === col("_ch"), lit("~null")).otherwise(col("dst"))
          .as("dst"), col("n"))
      .unionByName(cnt.select(lit("").as("variant"), col("src"),
        col("dst"), col("n")))
      .groupBy("variant", "src", "dst").agg(sum(col("n")).as("n"))
      .localCheckpoint(true)
    val tot = variants.groupBy("variant", "src")
      .agg(sum(col("n")).as("_tot")).localCheckpoint(true)
    var v = tot.select(col("variant"), col("src").as("state"),
      lit(0L).as("_v")).localCheckpoint(false)
    for (_ <- 1 to iters) {
      val joined = variants
        .join(v.select(col("variant"), col("state").as("dst"),
          col("_v").as("_vd")), Seq("variant", "dst"), "left")
        .select(col("variant"), col("src"),
          (col("n").cast("decimal(19,0)") *
            when(col("dst") === "~conv", lit(Scale))
              .when(col("dst") === "~null", lit(0L))
              .otherwise(coalesce(col("_vd"), lit(0L))).cast("decimal(19,0)"))
            .as("_p"))
      v = joined.groupBy("variant", "src")
        .agg(sum(col("_p")).as("_sp"))
        .join(tot, Seq("variant", "src"))
        .select(col("variant"), col("src").as("state"),
          idiv(col("_sp"), col("_tot").cast("decimal(38,0)"))
            .cast("long").as("_v"))
        .localCheckpoint(false)
    }
    val pStart = v.filter(col("state") === "~start")
      .select(col("variant"), col("_v"))
    val pBase = pStart.filter(col("variant") === "")
      .select(col("_v").as("_pb"))
    val perChannel = pStart.filter(col("variant") =!= "")
      .crossJoin(broadcast(pBase))
      .select(col("variant").as("channel"), col("_pb").as("p_base_e12"),
        col("_v").as("p_removed_e12"),
        when(col("_pb") === 0L, lit(null))
          .otherwise(lit(1.0) -
            col("_v").cast("double") / col("_pb").cast("double"))
          .as("removal_effect"))
      .localCheckpoint(false) // share fold re-reads it
    val denom = perChannel
      .agg(sort_array(collect_list(struct(col("channel"),
        col("removal_effect")))).as("_cs"))
      .select(aggregate(col("_cs"), lit(0.0),
        (acc, s) => acc + coalesce(s("removal_effect"), lit(0.0)))
        .as("_re_sum"))
    perChannel.crossJoin(broadcast(denom))
      .select(col("channel"), col("p_base_e12"), col("p_removed_e12"),
        col("removal_effect"),
        when(col("_re_sum") === 0.0 || col("removal_effect").isNull,
          lit(null))
          .otherwise(col("removal_effect") / col("_re_sum"))
          .as("attribution"))
  }
}
