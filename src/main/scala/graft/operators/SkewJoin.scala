package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * A plain shuffle join sends every row of a hot key to one task; at 100 TB
  * a single celebrity key stalls the stage. Salting splits each hot key
  * into `salt` sub-keys: the big side gets a deterministic per-row salt,
  * the small side is replicated `salt` times — same join result, the hot
  * key's rows now spread over `salt` tasks. AQE's skew-join handles sort-
  * merge cases adaptively; explicit salting is the portable fallback and
  * works for aggregations feeding joins too.
  *
  * The per-row salt comes from monotonically_increasing_id, NOT from row
  * content: content-derived salts collapse when hot-key rows are identical
  * duplicates (the common celebrity-key case), putting every copy back on
  * one task. The join RESULT is salt-independent, so nondeterministic salt
  * values are safe.
  */
object SkewJoin {

  /** Pre-join key-skew audit — the "look before you shuffle 100 TB" tool.
    * Groups the key's depth distribution into power-of-two buckets
    * (`depth_bucket` b covers depths in [2^b, 2^(b+1))) and reports, per
    * bucket: how many keys, how many rows they carry, the SELF-JOIN cost
    * mass `Σ depth²` those keys would emit (the candidate-row count a
    * same-key join produces — the quantity AQE cannot see, because it
    * triggers on shuffle input bytes while a hot key's cost is its output;
    * see [[graft.operators.Dedup.editDistancePairs]]'s salt rationale),
    * and one example key for debugging. A heavy tail here says: broadcast
    * the other side, salt ([[saltedInnerJoin]]), or rethink the key.
    *
    * Depth buckets use exact integer arithmetic (binary-string length,
    * never floating log2 — `floor(ln(2^k)/ln 2)` can land below k); the
    * Σ depth² products run in decimal(38,0) (a 1e11-row hot key would wrap
    * Long) and surface as double, an audit estimate.
    *
    * Scale shape: one shuffle to key depths (map-side partial counts),
    * then a bucket-count-sized (≤ 64 rows) aggregation. Null key parts
    * participate under a sentinel, matching SQL GROUP BY semantics. */
  def keyDepthProfile(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must name at least one column")
    require(!df.columns.contains("_k") && !df.columns.contains("_c"),
      "inputs must not contain the reserved columns _k/_c")
    val keyStr = concat_ws("\u001f",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("\u001e"))): _*)
    df.select(keyStr.as("_k"))
      .groupBy("_k").agg(count(lit(1)).as("_c"))
      .groupBy((length(bin(col("_c"))) - 1).cast("int").as("depth_bucket"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("_c")).as("n_rows"),
        sum(col("_c").cast("decimal(19,0)") * col("_c").cast("decimal(19,0)"))
          .cast("double").as("selfjoin_rows"),
        min(col("_k")).as("example_key"))
  }

  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
                      salt: Int = 8): DataFrame = {
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs must not contain the reserved column _salt — it would be " +
        "silently overwritten and dropped from the join output")
    val bigSalted = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val smallReplicated = small
      .withColumn("_salt", explode(array((0 until salt).map(lit): _*)))
    val out = bigSalted.join(smallReplicated, Seq(key, "_salt"), "inner").drop("_salt")
    out
  }
}
