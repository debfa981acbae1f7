package graft.operators

import org.apache.spark.sql.DataFrame
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
}
