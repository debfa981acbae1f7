package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared Jaro / Jaro–Winkler similarity kernel (Jaro 1989; Winkler
  * 1990) — the graded string-agreement score record linkage uses where
  * [[graft.operators.Linkage.scoreFieldAgreement]]'s exact-equality
  * weights are too blunt ("Smith" vs "Smyth" should score 0.96, not 0).
  *
  * Semantics are pinned to DuckDB's builtins (`jaro_similarity`,
  * `jaro_winkler_similarity` — the RapidFuzz formulation), verified
  * bit-for-bit by the q200 differential gate over md5-derived corpora:
  *  - either input empty → 0.0 (including BOTH empty — DuckDB's
  *    convention, not the 1.0 some libraries return);
  *  - match window `max(|a|,|b|)/2 − 1`, clamped at 0 (integer floor);
  *  - transpositions = half-count / 2 by INTEGER division;
  *  - jaro combines left-to-right: `(m/|a| + m/|b| + (m−t)/m) / 3`;
  *  - Winkler bonus only when jaro > 0.7 (the boost threshold —
  *    verified empirically: DuckDB applies it), prefix capped at 4,
  *    combined as `j + l·0.1·(1−j)` left-associated.
  * Comparison is by Unicode CODE POINT (matches DuckDB's
  * character-wise walk on any text; identical trivially on ASCII).
  *
  * The Catalyst expression stays inside whole-stage codegen: the
  * generated code calls this object's static forwarder directly — the
  * `levenshtein` pattern, no UDF, no boxing of the hot path. */
object JaroWinklerImpl {

  /** Jaro similarity of two UTF8Strings — see object doc for the exact
    * contract. */
  def jaro(a: UTF8String, b: UTF8String): Double =
    jaroCp(codePoints(a), codePoints(b))

  /** Jaro–Winkler similarity (prefix-boosted above 0.7). */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = codePoints(a)
    val s2 = codePoints(b)
    val j = jaroCp(s1, s2)
    if (j > 0.7) {
      val cap = math.min(4, math.min(s1.length, s2.length))
      var l = 0
      while (l < cap && s1(l) == s2(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }

  private def codePoints(s: UTF8String): Array[Int] =
    s.toString.codePoints().toArray

  private def jaroCp(s1: Array[Int], s2: Array[Int]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val w = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + w)
      var j = math.max(0, i - w)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s2(j) == s1(i)) {
          m2(j) = true; m1(i) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var half = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) half += 1
        k += 1
      }
      i += 1
    }
    val t = half / 2
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t) / md) / 3.0
  }
}

/** Catalyst expression: `jaro_winkler(a, b)` / `jaro_sim(a, b)` over two
  * string columns → double. Codegen emits a direct static call —
  * whole-stage-codegen-resident, the `levenshtein` builtin's pattern. */
case class JaroWinklerExpr(left: Expression, right: Expression,
                           winkler: Boolean)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got " +
          s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = if (winkler) "jaro_winkler" else "jaro_sim"

  private def method: String = if (winkler) "jaroWinkler" else "jaro"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    if (winkler) JaroWinklerImpl.jaroWinkler(x, y)
    else JaroWinklerImpl.jaro(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.$method($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Jaro–Winkler similarity Column (DuckDB-identical semantics). */
  def similarity(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinklerExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      winkler = true))

  /** Plain Jaro similarity Column (no prefix boost). */
  def jaro(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinklerExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      winkler = false))
}
