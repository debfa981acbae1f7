package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
