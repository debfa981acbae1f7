package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise-preference ranking — the curation primitive behind
  * RLHF/eval preference data: turn "A beat B" match records into a
  * per-item strength scale.
  */
object Preference {

  /** Bradley–Terry strengths (Bradley & Terry, Biometrika 1952) by the
    * MM algorithm (Hunter, Annals of Statistics 2004): with `W_i` total
    * wins and `n_ij` matches between i and j, each round updates
    * `π_i ← W_i / Σ_j n_ij / (π_i + π_j)` — Hunter's minorize–maximize
    * step, monotone in the likelihood — then rescales so Σπ = #items
    * (BT is scale-invariant; the rescale pins one representative).
    * Runs a FIXED `iters` rounds from π = 1 — bounded, deterministic,
    * oracle-replayable; ranking quality needs few rounds (each is a
    * full MM sweep).
    *
    * Determinism: `W_i`/`n_ij` are exact integers; each item's
    * denominator folds its opponents in OPPONENT ORDER over a sorted
    * collect, the rescale folds items in item order — every double
    * chain order-pinned cross-engine. Items appearing only as losers
    * keep π = 0 from their first update (0 wins), which is the MLE
    * boundary; callers wanting regularization add pseudo-matches
    * upstream.
    *
    * Input: one row per match `(winnerCol, loserCol)`; null endpoints
    * and self-matches are dropped.
    *
    * Scale shape: matches collapse ONCE to the pair-count table
    * (item-vocabulary² bounded, usually tiny); every round is two
    * joins + one map-side-combined aggregation over that table and a
    * 1-row rescale — nothing match-sized after the first shuffle. The
    * item vocabulary must be modest (bucket raw keys upstream): the
    * per-item fold holds one item's opponent list.
    *
    * Output: `(item, n_wins, n_matches, bt_score)` with Σ bt_score =
    * #items. */
  def bradleyTerry(matches: DataFrame, winnerCol: String, loserCol: String,
                   iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters ($iters) must be >= 1")
    val m = matches
      .select(col(winnerCol).as("_w"), col(loserCol).as("_l"))
      .filter(col("_w").isNotNull && col("_l").isNotNull &&
        col("_w") =!= col("_l"))
      .localCheckpoint(true) // pair counts + win counts
    val wins = m.groupBy(col("_w").as("item"))
      .agg(count(lit(1)).as("n_wins"))
    val pairs = m
      .select(col("_w").as("_i"), col("_l").as("_j"))
      .unionByName(m.select(col("_l").as("_i"), col("_w").as("_j")))
      .groupBy("_i", "_j").agg(count(lit(1)).as("_n"))
      .localCheckpoint(true) // read every round
    val items = pairs.select(col("_i").as("item")).distinct()
      .join(wins, Seq("item"), "left")
      .select(col("item"), coalesce(col("n_wins"), lit(0L)).as("n_wins"))
      .localCheckpoint(true)
    val nItems = items.count()
    var pi = items.select(col("item"), lit(1.0).as("_pi"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val folded = pairs
        .join(pi.select(col("item").as("_i"), col("_pi").as("_pii")), Seq("_i"))
        .join(pi.select(col("item").as("_j"), col("_pi").as("_pij")), Seq("_j"))
        .groupBy(col("_i").as("item"))
        .agg(max(col("_pii")).as("_pii"),
          sort_array(collect_list(struct(col("_j"), col("_n"),
            col("_pij")))).as("_t"))
        .join(items, Seq("item"))
        .select(col("item"),
          (col("n_wins").cast("double") /
            aggregate(col("_t"), lit(0.0), (acc, t) =>
              acc + t("_n").cast("double") / (col("_pii") + t("_pij"))))
            .as("_raw"))
      val total = folded
        .agg(sort_array(collect_list(struct(col("item"), col("_raw"))))
          .as("_a"))
        .select(aggregate(col("_a"), lit(0.0),
          (acc, t) => acc + t("_raw")).as("_tot"))
      pi = folded.crossJoin(broadcast(total))
        .select(col("item"),
          (col("_raw") * lit(nItems.toDouble) / col("_tot")).as("_pi"))
        .localCheckpoint(false)
    }
    val nMatches = pairs.groupBy(col("_i").as("item"))
      .agg(sum(col("_n")).as("n_matches"))
    items.join(nMatches, Seq("item"))
      .join(pi, Seq("item"))
      .select(col("item"), col("n_wins"), col("n_matches"),
        col("_pi").as("bt_score"))
  }
}
