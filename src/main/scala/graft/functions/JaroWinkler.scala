package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a codegen'd Catalyst expression.
  *
  * Spark ships Levenshtein but no Jaro-Winkler — the measure entity
  * resolution / fuzzy matching actually wants (prefix-weighted,
  * length-normalized, O(len·window) instead of O(len²) DP). Semantics
  * are pinned to DuckDB's `jaro_winkler_similarity` (the external
  * oracle): prefix weight 0.1 over at most 4 chars, Winkler boost only
  * above jaro 0.7, and BOTH-empty or either-empty inputs score 0.0 —
  * verified exactly against DuckDB on 5000 random strings plus the
  * fixture's p_name corpus before porting.
  *
  * Codegen: like Spark's own Levenshtein, the generated code is one
  * static call ([[JaroWinklerImpl.score]]) — the expression stays
  * inside whole-stage codegen with no boxing or interpreted lambdas.
  * Comparison is by UTF-16 code unit, which coincides with DuckDB's
  * byte comparison on ASCII data (the fixture; non-BMP inputs would
  * need byte-level alignment).
  */
object JaroWinklerImpl {
  def score(a: UTF8String, b: UTF8String): Double =
    scoreStr(a.toString, b.toString)

  def scoreStr(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    var md = math.max(l1, l2) / 2 - 1
    if (md < 0) md = 0
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true
          m2(j) = true
          m += 1
          matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val dm = m.toDouble
    val jaro = (dm / l1 + dm / l2 + (dm - t) / dm) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val lim = math.min(math.min(l1, l2), 4)
      while (l < lim && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs string inputs, got " +
          s"${left.dataType} / ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerImpl.score(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.score($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Jaro-Winkler similarity in [0, 1], codegen'd. */
  def jaro_winkler(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinklerSim(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
