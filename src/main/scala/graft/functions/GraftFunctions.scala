package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's custom Catalyst expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the Column API.
  *
  * Two entry points for the two deployment shapes:
  *  - [[register]]: imperative, on a live session (tests, notebooks);
  *  - [[GraftExtensions]]: a `SparkSessionExtensions` installer for
  *    `spark.sql.extensions=graft.functions.GraftExtensions` /
  *    `.withExtensions(...)` at session build time (spark-submit).
  */
object GraftFunctions {

  private val vecDotBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"vec_dot expects 2 arguments, got ${exprs.length}")
    VecDot(exprs.head, exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", vecDotBuilder, "scala_udf")

  private[functions] val vecDotInfo =
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      vecDotBuilder)
}

/** Session-build-time installer (`spark.sql.extensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction(GraftFunctions.vecDotInfo)
}
