package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two numeric array columns.
  *
  * Why a custom Expression: the `zip_with`+`aggregate` formulation allocates
  * a lambda-evaluated intermediate array per row — fine per-document, ruinous
  * per-*pair* in O(n²)-ish similarity joins (measured ~20× slower on the
  * embedding near-dup scan). This compiles to a primitive `for` loop inside
  * whole-stage codegen: no boxing, no intermediate array.
  *
  * Semantics match DuckDB's `list_inner_product` over `DOUBLE[]`: each
  * element is widened to double, products accumulate left-to-right in
  * double — so results are bit-identical to the oracle's. Null elements are
  * not expected (embedding vectors); a null array yields null via the
  * standard BinaryExpression null contract.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

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
        s"VecDot expects array<float|double> inputs, got ${left.dataType} and ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elementsNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  /** Null can arise from a null array (BinaryExpression contract) OR from a
    * null element — so nullability must include `containsNull`. Without
    * this, non-nullable array inputs (e.g. arrays built by `transform` /
    * `collect_list`) make `ev.isNull` the literal `false` and the generated
    * `false = true` assignment breaks compilation, silently dropping the
    * whole projection out of codegen (found live: centroid classification
    * ran interpreted). */
  override def nullable: Boolean =
    !childrenResolved || left.nullable || right.nullable || elementsNullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"VecDot: array sizes differ ($n vs ${y.numElements()})")
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      // null element -> null result (DuckDB list_inner_product semantics);
      // ArrayData.getDouble on a null slot would silently read 0.0
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
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
      // mismatched lengths throw (matching DuckDB list_inner_product) —
      // silently scoring a truncated embedding would mask data corruption;
      // null elements null the result (getDouble on a null slot reads 0.0).
      // The element null check is emitted only when the array types can
      // hold nulls: when they can't, `ev.isNull` may be the `false`
      // literal (unassignable), and the branch-free loop is faster anyway.
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "VecDot: array sizes differ (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += (double) $a.$getA($i) * (double) $b.$getB($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column wrapper: Σ aᵢ·bᵢ in double, whole-stage-codegen'd. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
