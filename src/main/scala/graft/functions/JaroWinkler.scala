package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_jaro_winkler_e6(a, b)` — Jaro–Winkler similarity as a half-up
  * 6-dp scaled BIGINT (`round(jw * 1e6)`), computed ENTIRELY in integer
  * arithmetic: the Jaro score is the exact rational
  *
  *   J = (l2·m² + l1·m² + l1·l2·(m − t)) / (3·l1·l2·m)
  *
  * and the Winkler boost (applied iff J ≥ 0.7, tested as 10·N ≥ 7·D)
  * rewrites to ((10−ℓ)·N + ℓ·D) / (10·D), ℓ = common prefix capped at 4 —
  * so the e6 rendering is one exact half-up integer division, never a
  * float. Doubles only approximate p·(1−J) chains; two engines' doubles
  * can disagree in the last ulp, and a similarity THRESHOLD then flips
  * rows. The integer form is bit-stable by construction.
  *
  * Semantics pinned against DuckDB's `jaro_winkler_similarity` on 80 000
  * random pairs over three alphabets (zero mismatches):
  *  - greedy left-to-right matching, window max(l1,l2)/2 − 1 (floor, ≥0);
  *  - t = FLOOR of half the mismatched matched-sequence positions;
  *  - boost iff J ≥ 0.7 (inclusive), prefix length capped at 4;
  *  - either side empty → 0.
  *
  * O(|a|·|b|) worst-case time like the window scan demands; O(|a|+|b|)
  * scratch. Codegen'd via a static call (the `levenshtein` pattern), so
  * the linkage scoring stays inside whole-stage codegen.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string inputs, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_jaro_winkler_e6"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarityE6(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarityE6($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def jaroWinklerE6(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** round(jw(a,b) · 1e6), half-up, exact. */
  def similarityE6(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString
    val b = ub.toString
    val l1 = a.length.toLong
    val l2 = b.length.toLong
    if (l1 == 0 || l2 == 0) return 0L
    val w = math.max(0L, math.max(l1, l2) / 2 - 1).toInt
    val aM = new Array[Boolean](l1.toInt)
    val bM = new Array[Boolean](l2.toInt)
    var m = 0L
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - w)
      val hi = math.min(l2.toInt - 1, i + w)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          bM(j) = true; aM(i) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0L) return 0L
    // mismatched positions of the two matched subsequences -> t = h/2 floor
    var h = 0L
    var j = 0
    i = 0
    while (i < l1) {
      if (aM(i)) {
        while (!bM(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) h += 1
        j += 1
      }
      i += 1
    }
    val t = h / 2
    var n = l2 * m * m + l1 * m * m + l1 * l2 * (m - t)
    var d = 3L * l1 * l2 * m
    if (10L * n >= 7L * d) { // Winkler boost, inclusive threshold
      var ell = 0L
      while (ell < 4 && ell < l1 && ell < l2 &&
        a.charAt(ell.toInt) == b.charAt(ell.toInt)) ell += 1
      n = (10L - ell) * n + ell * d
      d = 10L * d
    }
    // half-up e6: (2·n·10^6 + d) div (2·d); n/d <= 1 so no overflow for
    // strings up to ~40k chars (d <= 30·l^3; 2·d·10^6 < 2^63)
    (2L * n * 1000000L + d) / (2L * d)
  }
}
