package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature engineering for tabular training pipelines — the encoders a
  * model-prep stage runs over a 100 TB fact table before handing rows to
  * a trainer. Everything here follows the repo's exactness discipline:
  * integer/decimal accumulation, one correctly-rounded double at the
  * edge, engine-replayable.
  */
object Features {

  /** Leave-one-out target encoding (Micci-Barreca, SIGKDD Explorations
    * 2001 lineage; the LOO variant is the leakage-aware one): replace a
    * categorical value with the mean target of the OTHER rows sharing
    * it — `enc_i = (Σ_c y − y_i) / (n_c − 1)`. Including the row's own
    * target (plain mean encoding) leaks the label into its own
    * feature; LOO subtracts it out by construction. Singleton
    * categories yield NULL (there are no other rows to average —
    * callers impute with their global prior downstream, an explicit
    * modeling choice this operator refuses to make silently).
    *
    * Determinism: targets ride the exact decimal(18,6) micro-unit lane
    * ([[Trend.trendFit]]'s y-contract: ≤ 6 decimal places,
    * |y| < 10¹²); `Σ_c y − y_i` is exact decimal(38,0) arithmetic, and
    * the encoding is two fixed-order double divisions of
    * correctly-rounded casts. NULL categories or targets are excluded.
    *
    * Scale shape: ONE map-side-combined aggregation to per-category
    * (Σ, n) — vocabulary-sized, broadcast back onto the fact rows (no
    * second shuffle of the 100 TB side). Output is row-grain:
    * `(id, category, loo_mean)`. */
  def targetEncodeLoo(df: DataFrame, idCol: String, catCol: String,
                      targetCol: String): DataFrame = {
    val yi = (col(targetCol).cast("decimal(18,6)") * lit(1000000L))
      .cast("decimal(38,0)")
    val base = df
      .filter(col(catCol).isNotNull && col(targetCol).isNotNull)
      .select(col(idCol).as("_id"), col(catCol).as("_c"), yi.as("_yi"))
    val sums = base.groupBy("_c")
      .agg(sum(col("_yi")).as("_s"), count(lit(1)).as("_n"))
    base.join(broadcast(sums), Seq("_c"))
      .select(col("_id").as(idCol), col("_c").as("category"),
        when(col("_n") <= 1L, lit(null))
          .otherwise((col("_s") - col("_yi")).cast("double") / lit(1.0e6)
            / (col("_n") - 1L).cast("double"))
          .as("loo_mean"))
  }
}
