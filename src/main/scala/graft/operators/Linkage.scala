package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage: find pairs of records that describe the same entity
  * across noisy fields (names, phones, emails) — the multi-field cousin of
  * [[Dedup]]'s single-text family.
  *
  * The scale pattern is BLOCKING (Fellegi & Sunter, JASA 1969 lineage):
  * never all-pairs — candidates only form inside a block (records sharing
  * one blocking key), and several DIFFERENT blocking keys are unioned so a
  * record pair survives as long as ANY field they agree on blocks them
  * together. A pair differing in one noisy field still meets through the
  * other keys; a pair differing in every field was never a match.
  */
object Linkage {

  /** Candidate pairs from the UNION of per-column blocks. Per blocking
    * column: records sharing a non-null value pair up (`id_a < id_b`),
    * with two guards — singleton blocks generate nothing, and blocks
    * deeper than `maxBucket` are DROPPED entirely (a blocking value shared
    * by thousands of records — "UNKNOWN", empty-string phone — carries no
    * discrimination signal and would contribute depth² junk pairs; the
    * [[Dedup.containmentPairs]] df-cap rationale). Cross-block duplicates
    * collapse via one distinct.
    *
    * Scale shape: one shuffle per blocking column on its value (depth
    * counts are map-side combined), pair fan-out bounded by
    * maxBucket²·blocks; the union is linear in candidates. */
  def blockedPairs(df: DataFrame, idCol: String, blockCols: Seq[String],
                   maxBucket: Int = 256): DataFrame = {
    require(blockCols.nonEmpty, "blockCols must name at least one column")
    require(maxBucket >= 2, s"maxBucket ($maxBucket) must be >= 2")
    val perBlock = blockCols.map { c =>
      val b = df.select(col(idCol).as("_id"), col(c).as("_b"))
        .filter(col("_b").isNotNull)
      val eligible = b.groupBy("_b").agg(count(lit(1)).as("_d"))
        .filter(col("_d") >= 2 && col("_d") <= maxBucket)
        .select("_b")
      val members = b.join(eligible, "_b")
      members.select(col("_b"), col("_id").as("id_a"))
        .join(members.select(col("_b"), col("_id").as("id_b")), "_b")
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
    }
    perBlock.reduce(_ unionByName _).distinct()
  }

  /** Weighted field-agreement score per candidate pair: `score =
    * Σ weight·[field_a equals field_b]` with a NULL-SAFE compare (two
    * nulls agree — both records say "unknown"; treating that as evidence
    * is the caller's weighting decision). Weights fold left in the given
    * order, so the double sum is order-fixed and engine-reproducible.
    * Callers threshold downstream (`score >= t` = the match rule).
    *
    * Scale shape: two id-keyed joins back to the records (candidate-set
    * sized, never corpus²); the agreement arithmetic is map-side. */
  def scoreFieldAgreement(pairs: DataFrame, records: DataFrame, idCol: String,
                          weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    def side(tag: String) = records.select(
      col(idCol).as(s"id_$tag") +:
        weights.map { case (f, _) => col(f).as(s"_${tag}_$f") }: _*)
    pairs.join(side("a"), "id_a").join(side("b"), "id_b")
      .select(col("id_a"), col("id_b"),
        weights.map { case (f, w) =>
          when(col(s"_a_$f") <=> col(s"_b_$f"), lit(w)).otherwise(lit(0.0))
        }.reduce(_ + _).as("score"))
  }

  /** Golden-record survivorship: collapse each matched-entity cluster to
    * one canonical value per field by MAJORITY VOTE — per (entity, field)
    * the most-voted non-null value, ties broken by the lexicographically
    * smallest value (stated so the pick is deterministic, never
    * layout-dependent). The final step of the linkage pipeline:
    * [[blockedPairs]] → [[scoreFieldAgreement]] → threshold →
    * [[graft.operators.DupClusters.components]] → here.
    *
    * `clusters` carries `(idCol, cluster_id)` (components' output, id
    * renamed); records absent from it are singleton entities keyed by
    * their own id (`cluster_id` and `idCol` must share a type for that
    * coalesce). NULLs don't vote — a field every member left null gets
    * NO row for that entity (survivorship selects known values; emitting
    * a null winner would let one stray non-null lose to absence).
    *
    * Output LONG-FORM, one row per (entity, field): `entity_id, field,
    * value (string), n_votes, n_total` — `n_total` counts that field's
    * non-null votes in the entity, so `n_votes / n_total` is the
    * canonical value's support. Values vote as strings (the melt needs
    * one type); cast back at the caller where field types matter.
    *
    * Scale shape: the melt is a |fields|× map-side fanout (no shuffle);
    * votes aggregate with map-side combine on (entity, field, value);
    * both windows run over that AGGREGATED table, partitioned by
    * (entity, field) — per-task depth is distinct values per field per
    * entity, bounded by cluster size, never corpus-sized. */
  def goldenRecords(records: DataFrame, idCol: String, clusters: DataFrame,
                    fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    val reserved = Seq("_entity", "_fv", "_f", "_v", "_rk", "n_votes", "n_total")
    require(!records.columns.exists(reserved.contains),
      s"input must not contain reserved columns ${reserved.mkString("/")}")
    require(clusters.columns.contains(idCol) &&
      clusters.columns.contains("cluster_id"),
      s"clusters must carry ($idCol, cluster_id)")
    val assigned = records
      .join(clusters.select(col(idCol), col("cluster_id")), Seq(idCol), "left")
      .withColumn("_entity", coalesce(col("cluster_id"), col(idCol)))
    val melted = assigned
      .select(col("_entity"), explode(array(fields.map(f =>
        struct(lit(f).as("_f"), col(f).cast("string").as("_v"))): _*)).as("_fv"))
      .select(col("_entity"), col("_fv._f").as("_f"), col("_fv._v").as("_v"))
      .filter(col("_v").isNotNull)
    val wEF = Window.partitionBy("_entity", "_f")
    melted
      .groupBy("_entity", "_f", "_v").agg(count(lit(1)).as("n_votes"))
      .withColumn("n_total", sum(col("n_votes")).over(wEF))
      .withColumn("_rk", row_number()
        .over(wEF.orderBy(col("n_votes").desc, col("_v"))))
      .filter(col("_rk") === 1)
      .select(col("_entity").as("entity_id"), col("_f").as("field"),
        col("_v").as("value"), col("n_votes"), col("n_total"))
  }

  /** Sorted-neighborhood candidate generation (Hernández & Stolfo,
    * "The merge/purge problem", SIGMOD 1995): order records by a
    * discriminating sort key, slide a window of `window` positions,
    * pair everything inside it. The complement of [[blockedPairs]]:
    * equality blocking misses near-miss keys ("Smith" vs "Smyth" never
    * share a block), the sorted neighborhood catches whatever the sort
    * key puts adjacent — and its candidate count is EXACTLY
    * (window−1)·n, skew-proof by construction (a hot key cannot blow
    * up a rank window, only an equality block).
    *
    * Ranks are a total order over `(sortKey, id)` (id as tiebreak, so
    * ties are deterministic — `idCol` must be unique), computed
    * DISTRIBUTED: range-repartition + in-partition sort, then the
    * classic two-pass offset rank (`zipWithIndex`: one count pass over
    * partition sizes, one stamping pass — never a single-task global
    * window, the WindowExec-no-partition trap this repo avoids).
    * Output: `(id_a, id_b, rank_gap)` with `id_a < id_b`
    * canonicalization; each unordered pair appears exactly once (from
    * its lower-ranked end). NULL keys/ids are excluded.
    *
    * Scale shape: one range shuffle + two linear passes for ranks, one
    * explode×(window−1), one rank-keyed shuffle join. 100 TB: the
    * range partitioner keeps neighborhoods physically adjacent, and
    * the pair fan-out is linear in n — no block-depth² anywhere. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
                              sortKeyCol: String, window: Int): DataFrame = {
    require(window >= 2, s"window ($window) must be >= 2")
    val spark = df.sparkSession
    val base = df
      .select(col(idCol).as("_id"), col(sortKeyCol).as("_k"))
      .filter(col("_id").isNotNull && col("_k").isNotNull)
    val nPart = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val parted = base
      .repartitionByRange(nPart, col("_k"), col("_id"))
      .sortWithinPartitions(col("_k"), col("_id"))
      .localCheckpoint(true) // pin partitioning: both zipWithIndex passes
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val rankedRdd = parted.rdd.zipWithIndex.map { case (row, idx) =>
      Row(row.get(0), idx + 1L)
    }
    val ranked = spark.createDataFrame(rankedRdd,
      StructType(Seq(parted.schema.fields.head.copy(name = "_id"),
        StructField("_rnk", LongType, nullable = false))))
      .localCheckpoint(false) // both sides of the gap join read it
    val probes = ranked
      .withColumn("rank_gap", explode(array((1 until window).map(lit(_)): _*)))
      .select(col("_id").as("_ida"), (col("_rnk") + col("rank_gap")).as("_rnk"),
        col("rank_gap"))
    probes
      .join(ranked.withColumnRenamed("_id", "_idb"), Seq("_rnk"))
      .select(least(col("_ida"), col("_idb")).as("id_a"),
        greatest(col("_ida"), col("_idb")).as("id_b"), col("rank_gap"))
  }

  /** Fellegi–Sunter per-field match weights (Fellegi & Sunter, JASA
    * 1969 §3) — the probabilistic scoring the blocking above feeds:
    * a field agreeing on a pair contributes `w_agree = ln(m/u)`,
    * disagreeing contributes `w_dis = ln((1−m)/(1−u))`.
    *
    * `u` (chance agreement among NON-matches) is estimated EXACTLY from
    * the field's value histogram under the random-pairing model:
    * `u = Σ_v n_v² / N²` — an exact integer ratio, nulls counted as a
    * value (matching [[scoreFieldAgreement]]'s null-safe `<=>`). `m`
    * (agreement among true matches) needs labeled pairs or EM to
    * estimate, so it is an explicit parameter in exact 1e-6 units
    * (default 0.95, the classic clerical-review prior) — an honest
    * knob, not a silent fit.
    *
    * Determinism: histogram sums are exact integers ≤ N², `u` is one
    * exact-integer division, both logs are 6dp floor-rounded
    * ([[Classifier]]'s ln-seam contract). A CONSTANT field (u = 1,
    * detected exactly as `Σn_v² = N²`) has no disagreement evidence:
    * `w_dis` is NULL — visible, never −∞.
    *
    * Scale shape: one value-keyed aggregation per field (map-side
    * combined, output = distinct values), one 1-row rollup each —
    * fields are enumerated, so the union is |fields| rows total.
    *
    * Output: `(field, n, n_distinct, u_num, u, m, w_agree, w_dis)`
    * where `u_num = Σn_v²` (exact; needs N ≤ 3·10⁹ to fit the long).
    * Feed [[fsScorePairs]] or any caller that wants the weights. */
  def fellegiSunterWeights(records: DataFrame, fields: Seq[String],
                           mE6: Long = 950000L): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    require(mE6 > 0L && mE6 < 1000000L,
      s"mE6 ($mE6) must be inside (0, 1e6) — m is a probability")
    val m = lit(mE6.toDouble / 1.0e6)
    def rf6(c: org.apache.spark.sql.Column) =
      graft.functions.ExactRound.roundFloor(c, 6)
    val perField = fields.map { f =>
      records.groupBy(col(f)).agg(count(lit(1)).as("_nv"))
        .agg(sum(col("_nv").cast("decimal(38,0)") * col("_nv")).as("_unum"),
          sum(col("_nv")).as("_n"), count(lit(1)).as("n_distinct"))
        .select(lit(f).as("field"), col("_n").as("n"), col("n_distinct"),
          col("_unum").cast("long").as("u_num"),
          (col("_unum").cast("double") /
            (col("_n").cast("decimal(38,0)") * col("_n")).cast("double"))
            .as("u"))
    }
    perField.reduce(_.unionByName(_))
      .select(col("field"), col("n"), col("n_distinct"), col("u_num"),
        col("u"), m.as("m"),
        rf6(log(m / col("u"))).as("w_agree"),
        when(col("u_num") === (col("n").cast("decimal(38,0)") * col("n"))
            .cast("long"), lit(null).cast("double"))
          .otherwise(rf6(log((lit(1.0) - m) / (lit(1.0) - col("u")))))
          .as("w_dis"))
  }

  /** Score candidate pairs with [[fellegiSunterWeights]] output: per
    * field, `w_agree` on null-safe equality else `w_dis` (a NULL `w_dis`
    * — constant field — contributes 0.0: no evidence either way), summed
    * in the DECLARED field order as one literal expression chain, 4dp
    * floor-rounded. The weights table is |fields| rows, collected
    * driver-side (the BPE merge-rules precedent) so scoring is a pure
    * map over the joined pair fields — no per-row weight join.
    *
    * Output: `(id_a, id_b, fs_score)`. */
  def fsScorePairs(pairs: DataFrame, records: DataFrame, idCol: String,
                   fields: Seq[String], weights: DataFrame): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    val w = weights.select("field", "w_agree", "w_dis").collect()
      .map { r =>
        // a NULL w_agree (e.g. weights computed from an empty records
        // table) must fail loudly and named, not as a bare NPE in getDouble
        require(!r.isNullAt(1),
          s"weights row for field ${r.getString(0)} has NULL w_agree")
        r.getString(0) ->
          ((r.getDouble(1), if (r.isNullAt(2)) 0.0 else r.getDouble(2)))
      }
      .toMap
    val missing = fields.filterNot(w.contains)
    require(missing.isEmpty,
      s"weights table lacks fields ${missing.mkString(", ")}")
    def side(tag: String) = records.select(
      col(idCol).as(s"id_$tag") +:
        fields.map(f => col(f).as(s"_${tag}_$f")): _*)
    val score = fields.map { f =>
      val (wa, wd) = w(f)
      when(col(s"_a_$f") <=> col(s"_b_$f"), lit(wa)).otherwise(lit(wd))
    }.reduce(_ + _)
    pairs.join(side("a"), "id_a").join(side("b"), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.ExactRound.roundFloor(score, 4).as("fs_score"))
  }
}
