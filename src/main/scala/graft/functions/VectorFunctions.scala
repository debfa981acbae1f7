package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `ArrayType(FloatType|DoubleType)` columns.
  *
  * Built from Spark's higher-order functions (`zip_with`, `aggregate`) —
  * these stay inside whole-stage codegen, need no UDF serialization, and
  * work per-row with zero shuffle. All arithmetic is forced to DOUBLE so
  * results are bit-comparable with a DuckDB oracle computing over
  * `CAST(embedding AS DOUBLE[])` (both engines then fold left-to-right in
  * double precision).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision — a native codegen expression ([[VecDot]]);
    * the `zip_with`+`aggregate` equivalent is ~20× slower in pairwise joins. */
  def dot(a: Column, b: Column): Column = VecDot.dot(a, b)

  /** ‖a‖₂ in double precision. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Euclidean distance in double precision. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, v) => acc + v))
}
