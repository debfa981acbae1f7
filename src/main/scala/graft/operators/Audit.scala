package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational data-quality audits for lakehouse ingestion — the checks a
  * pipeline runs BEFORE publishing a snapshot (the validation-guard family
  * of the reference pipeline, generalized to cross-table contracts).
  */
object Audit {

  /** Referential-integrity orphan audit: how much of `child` points at a
    * `parentKey` that does not exist. NULL child keys are tallied
    * separately (`n_null_rows`) — under SQL join semantics a null never
    * matches anything, but a null FK is usually "absent by design", not a
    * dangling reference, so folding them into orphans would overcount.
    *
    * Output (one row): `n_rows` (non-null-key child rows), `n_keys`
    * (distinct non-null keys), `n_orphan_rows`, `n_orphan_keys`,
    * `n_null_rows`, `orphan_frac` (= orphan rows / rows, 0.0 on an empty
    * child — no NaN leaks).
    *
    * Scale shape: child collapses to per-key counts in ONE map-side-
    * combined shuffle (checkpointed — both the totals and the anti-join
    * read it); the anti-join then runs key-vs-key against the parent's
    * distinct keys — never row-vs-row, so a 100 TB fact table audits at
    * the cost of its key cardinality, not its row count. */
  def referentialOrphans(child: DataFrame, childKey: String,
                         parent: DataFrame, parentKey: String): DataFrame = {
    val keyed = child.filter(col(childKey).isNotNull)
      .groupBy(col(childKey).as("_k")).agg(count(lit(1)).as("_c"))
      .localCheckpoint(false)
    val totals = keyed.agg(
      coalesce(sum("_c"), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_keys"))
    val orphans = keyed
      .join(parent.select(col(parentKey).as("_k")).distinct(), Seq("_k"), "left_anti")
      .agg(coalesce(sum("_c"), lit(0L)).as("n_orphan_rows"),
        count(lit(1)).as("n_orphan_keys"))
    val nulls = child.filter(col(childKey).isNull)
      .agg(count(lit(1)).as("n_null_rows"))
    totals.crossJoin(broadcast(orphans)).crossJoin(broadcast(nulls))
      .withColumn("orphan_frac",
        when(col("n_rows") === 0L, lit(0.0))
          .otherwise(col("n_orphan_rows").cast("double")
            / col("n_rows").cast("double")))
  }

  /** Benford first-digit audit (Newcomb 1881 / Benford 1938; the
    * fabricated-figures screen auditors run on financial columns): the
    * observed distribution of leading significant digits 1–9 vs the
    * Benford expectation `log₁₀(1 + 1/d)`, per digit, plus the χ²
    * statistic `Σ (obs − n·exp)² / (n·exp)`. Nulls and values ≤ 0 are
    * excluded (Benford applies to positive magnitudes).
    *
    * The leading digit is exact integer work, not formatting: values
    * ride the repo's decimal(18,6) micro-unit contract (≤ 6 decimal
    * places, < 10¹²), and ×10⁶ preserves the leading SIGNIFICANT digit —
    * so it is the first character of the micro-unit long's decimal
    * rendering, which every engine prints identically (no scientific
    * notation, no rounding, no grouping separators).
    *
    * Determinism: counts are exact integers; the nine Benford doubles
    * are computed once at plan build and planted as literals in plan AND
    * oracle ([[graft.operators.Retrieval.ndcgAtK]]'s discount
    * convention); χ² folds its nine terms in digit order via the sorted
    * 9-element fold.
    *
    * Output: one row per digit 1–9 (zero-observation digits included —
    * their expected mass still enters χ²): `(digit, n_obs, frac_obs,
    * frac_expected, chi2_total)` — the scalar verdict repeated per row
    * so it survives a per-digit projection.
    *
    * Scale shape: per-row digit extraction (codegen'd cast + substring)
    * → one 9-row map-side-combined aggregation; everything after is
    * constant-sized. */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    val expected = benfordLiterals
    val vi = (col(valueCol).cast("decimal(18,6)") * lit(1000000L)).cast("long")
    val obs = df
      .filter(col(valueCol).isNotNull)
      .select(vi.as("_vi")).filter(col("_vi") > 0L)
      .select(substring(col("_vi").cast("string"), 1, 1).as("_d"))
      .groupBy("_d").agg(count(lit(1)).as("n_obs"))
    import df.sparkSession.implicits._
    val spineDf = (1 to 9).map(d => (d.toString, expected(d - 1)))
      .toDF("_d", "frac_expected")
    val joined = spineDf.join(obs, Seq("_d"), "left")
      .select(col("_d"), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("frac_expected"))
      .localCheckpoint(false) // 9 rows; per-digit output + χ² both read it
    // scalar (n, chi2) via the digit-ordered fold — never an unordered
    // double sum
    val totals = joined
      .agg(sum(col("n_obs")).as("_n"),
        sort_array(collect_list(struct(col("_d"), col("n_obs"),
          col("frac_expected")))).as("_terms"))
      .select(col("_n"),
        when(col("_n") === 0L, lit(0.0)).otherwise(
          aggregate(col("_terms"), lit(0.0), (acc, t) => {
            val e = col("_n").cast("double") * t("frac_expected")
            acc + (t("n_obs").cast("double") - e) *
              (t("n_obs").cast("double") - e) / e
          })).as("chi2_total"))
    joined.crossJoin(broadcast(totals))
      .select(col("_d").cast("int").as("digit"), col("n_obs"),
        when(col("_n") === 0L, lit(0.0))
          .otherwise(col("n_obs").cast("double") / col("_n").cast("double"))
          .as("frac_obs"),
        col("frac_expected"), col("chi2_total"))
  }

  /** The nine Benford doubles of [[benfordDigits]], exposed so the q181
    * oracle carries the SAME literals the plan plants. */
  private[graft] def benfordLiterals: Seq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Functional-dependency audit: for each candidate rule
    * `determinant → dependent`, how many determinant keys map to MORE
    * than one distinct dependent value — the data-quality check behind
    * "is this column really keyed by that one" (normalization audits,
    * dimension conformance, schema inference). Per rule:
    * `(determinant, dependent, n_keys, n_violating, violation_rate,
    * max_values_per_key)`; a rule HOLDS iff n_violating = 0.
    *
    * Rows with a null determinant are excluded (no key to audit);
    * a null dependent COUNTS as one distinct value (a key mapping to
    * both 'x' and NULL is a real violation — count_distinct skips
    * nulls, so null presence is re-added via a max-flag).
    *
    * Scale shape: per rule, ONE map-side-combined aggregation to key
    * cardinality, then ONE collapse to a single row; rules union at
    * the end (rule-count-sized). Exact integer counts; one double
    * division. */
  def fdViolations(df: DataFrame,
                   rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "at least one (determinant, dependent) rule")
    rules.map { case (det, dep) =>
      val perKey = df.filter(col(det).isNotNull)
        .groupBy(col(det).as("_k"))
        .agg(countDistinct(col(dep)).as("_nv"),
          max(when(col(dep).isNull, 1L).otherwise(0L)).as("_hasNull"))
        .select(col("_k"), (col("_nv") + col("_hasNull")).as("_vals"))
      perKey.agg(count(lit(1)).as("n_keys"),
          sum(when(col("_vals") > 1L, 1L).otherwise(0L)).as("n_violating"),
          max(col("_vals")).as("max_values_per_key"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_keys"), col("n_violating"),
          when(col("n_keys") === 0L, lit(null).cast("double"))
            .otherwise(col("n_violating").cast("double") /
              col("n_keys").cast("double")).as("violation_rate"),
          col("max_values_per_key"))
    }.reduce(_ unionByName _)
  }
}
