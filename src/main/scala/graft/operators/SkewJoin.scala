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
  * The per-row salt derives from xxhash64 over the row's other columns
  * (deterministic, no RNG state), falling back to the key itself for
  * single-column frames.
  */
object SkewJoin {

  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
                      salt: Int = 8): DataFrame = {
    val saltSource = big.columns.filter(_ != key) match {
      case Array() => Array(key)
      case other => other
    }
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(saltSource.map(col): _*), lit(salt.toLong)).cast("int"))
    val smallReplicated = small
      .withColumn("_salt", explode(array((0 until salt).map(lit): _*)))
    val out = bigSalted.join(smallReplicated, Seq(key, "_salt"), "inner").drop("_salt")
    out
  }
}
