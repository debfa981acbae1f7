package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact decimal rounding.
  *
  * Engine `round()` implementations DISAGREE at representable-tie
  * boundaries: Spark rounds the shortest-decimal rendering of the double
  * (BigDecimal HALF_UP), DuckDB scales in binary — the sf1.0 sweep caught
  * score −2.78325 rounding to −2.7833 vs −2.7832 from bit-identical
  * inputs (PLANS.md round 10). [[roundFloor]] is rounding stated as pure
  * IEEE ops — multiply, add, floor, divide — which every engine computes
  * identically, so an oracle replays it as literal arithmetic:
  * `floor(x * 10^d + 0.5) / 10^d`. Half-way values round UP (toward
  * +∞·ε), including negatives: −2.5 → −2. Use in any operator whose
  * rounded output is oracle-compared; library round() stays fine for
  * display-only values.
  */
object ExactRound {

  /** `floor(x·10ᵈ + 0.5)/10ᵈ` — see object doc. `digits` ≤ 15 keeps
    * `x·10ᵈ` inside the double's exact-integer range for |x| < 2⁵³⁻ᵈ. */
  def roundFloor(x: Column, digits: Int): Column = {
    require(digits >= 0 && digits <= 15, s"digits ($digits) must be in [0, 15]")
    val p = lit(math.pow(10.0, digits))
    floor(x * p + lit(0.5)) / p
  }
}
