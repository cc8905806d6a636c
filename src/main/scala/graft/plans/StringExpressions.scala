package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity — the fuzzy-entity-matching scalar Spark lacks
  * (it ships only `levenshtein`/`soundex`). Standard parameterization:
  * match window `max(|a|,|b|)/2 - 1`, transpositions = mismatched matched
  * positions / 2 (integer), Winkler prefix boost `l·0.1·(1-jaro)` with
  * `l = min(4, common prefix)` applied only above the 0.7 threshold, and
  * 0.0 when either string is empty. Numerically identical to DuckDB's
  * `jaro_winkler_similarity` (the oracle for `j13_jw_blocked_er`),
  * asserted corner-by-corner in FunctionsSpec.
  *
  * The O(|a|·|b|) window scan runs as a static JVM method called from
  * generated code (the same shape as Spark's own `levenshtein`), so the
  * expression stays inside whole-stage codegen.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.JaroWinklerImpl.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerImpl {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String): Double =
    similarity(a.toString, b.toString)

  def similarity(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      var j = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var found = false
      while (!found && j <= hi) {
        if (!m2(j) && s2.charAt(j) == c) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // mismatched positions among the matched chars, taken in order
    var k = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1.charAt(i) != s2.charAt(j)) k += 1
        j += 1
      }
      i += 1
    }
    val t = k / 2 // integer half-transpositions (matches DuckDB)
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(l1, l2)) &&
      s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
