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
