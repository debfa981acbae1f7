package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst squared L2 distance over two numeric array columns —
  * the [[VecDot]] treatment for Σ (aᵢ−bᵢ)².
  *
  * Why: the `aggregate(zip_with(a, b, (x,y) => (x−y)·(x−y)), 0, _+_)`
  * formulation is a higher-order function — interpreted per row with an
  * allocated intermediate array. Fine once per document; hot on the PQ
  * paths, where encoding evaluates it n·m·k times (every sub-vector
  * against every codebook centroid) and each serve builds a
  * queries × nProbe × m × k LUT with it. This compiles to a primitive
  * loop inside whole-stage codegen: no boxing, no intermediate array.
  *
  * Semantics are IDENTICAL to the lambda it replaces: elements widen to
  * double, terms (x−y)·(x−y) accumulate LEFT-TO-RIGHT in double — the
  * same IEEE chain, so every code assignment and ADC sum it feeds is
  * bit-for-bit what the zip_with fold produced. Mismatched lengths
  * throw (scoring a truncated embedding would mask data corruption);
  * a null array or element yields null ([[VecDot]]'s contract).
  */
case class VecSqDist(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"VecSqDist expects array<float|double> inputs, got ${left.dataType} and ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elementsNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  /** Includes `containsNull` for the same reason [[VecDot]] documents:
    * without it, non-nullable array inputs make `ev.isNull` the literal
    * `false` and the generated assignment breaks compilation, silently
    * dropping the projection out of codegen. */
  override def nullable: Boolean =
    !childrenResolved || left.nullable || right.nullable || elementsNullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"VecSqDist: array sizes differ ($n vs ${y.numElements()})")
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getA = if (elemIsFloat(left)) "getFloat" else "getDouble"
      val getB = if (elemIsFloat(right)) "getFloat" else "getDouble"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "VecSqDist: array sizes differ (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $d = (double) $a.$getA($i) - (double) $b.$getB($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecSqDist {
  /** Column wrapper: Σ (aᵢ−bᵢ)² in double, whole-stage-codegen'd. */
  def sqDist(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecSqDist(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
