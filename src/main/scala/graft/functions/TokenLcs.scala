package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_token_lcs(a, b)` — length of the longest common subsequence of
  * two TOKEN sequences (`array<string>` inputs), the core of ROUGE-L
  * (Lin 2004): generation-eval wants subsequence overlap, not the
  * contiguous-n-gram overlap BLEU measures, because a paraphrase keeps
  * word ORDER without keeping adjacency.
  *
  * Two integer-exact code paths, property-tested against each other:
  *  - |b| ≤ 64: Allison–Dix (1986) bit-parallel rows — the DP row is one
  *    Long where bit j says "column j did NOT increment"; one add/and/or
  *    per row instead of an inner loop, O(|a|) words total. LCS =
  *    |b| − popcount(finalRow). At |b| = 64 the masked add's carry out of
  *    bit 63 is discarded by Long wrap-around, which IS the mask.
  *  - |b| > 64: classic two-row DP, O(|a|·|b|) time, O(|b|) ints.
  *
  * The DuckDB oracle runs the SAME bit-parallel recurrence as an unrolled
  * recursive CTE over BIGINT rows (validated 200/200 vs reference DP), so
  * cross-engine comparison is pure integer arithmetic — no float anywhere.
  *
  * Scale shape: per-pair cost is linear in tokens on the fast path; the
  * eval family applies it to an equi-joined pair table (ref_id = cand's
  * neighbor), never a cross product. Null array elements match nothing
  * (split() never produces them); null arrays propagate null.
  */
case class TokenLcs(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isStringArray(t: DataType) = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(left.dataType) && isStringArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_token_lcs"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TokenLcs.lcsLength(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TokenLcs.lcsLength($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenLcs =
    copy(left = newLeft, right = newRight)
}

object TokenLcs {

  def tokenLcs(a: Column, b: Column): Column =
    ColumnBridge.column(TokenLcs(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def lcsLength(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0
    if (m <= 64) bitParallel(a, n, b, m) else twoRowDp(a, n, b, m)
  }

  /** Allison–Dix row recurrence: row' = ((row + x) | (row & ~mask_c))
    * & rowMask with x = row & mask_c, starting from all-ones; a cleared
    * bit j means DP column j+1 incremented somewhere above, so
    * LCS = m − popcount(row). Null tokens get mask 0 (match nothing).
    */
  private[functions] def bitParallel(
      a: ArrayData, n: Int, b: ArrayData, m: Int): Int = {
    val masks = new java.util.HashMap[UTF8String, java.lang.Long]()
    var j = 0
    while (j < m) {
      if (!b.isNullAt(j)) {
        val t = b.getUTF8String(j)
        val prev = masks.get(t)
        masks.put(t, java.lang.Long.valueOf(
          (if (prev == null) 0L else prev.longValue()) | (1L << j)))
      }
      j += 1
    }
    val rowMask = if (m == 64) -1L else (1L << m) - 1L
    var row = rowMask
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val mc = masks.get(a.getUTF8String(i))
        if (mc != null) {
          val mm = mc.longValue()
          row = ((row + (row & mm)) | (row & ~mm)) & rowMask
        }
      }
      i += 1
    }
    m - java.lang.Long.bitCount(row)
  }

  /** Reference-shaped fallback for |b| > 64 (and the property-test twin
    * of [[bitParallel]]).
    */
  private[functions] def twoRowDp(
      a: ArrayData, n: Int, b: ArrayData, m: Int): Int = {
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val ai = if (a.isNullAt(i - 1)) null else a.getUTF8String(i - 1)
      var j = 1
      while (j <= m) {
        val bj = if (b.isNullAt(j - 1)) null else b.getUTF8String(j - 1)
        cur(j) =
          if (ai != null && ai.equals(bj)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}
