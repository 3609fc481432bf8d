package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `graft_zorder(x, y)` — 64-bit Morton (Z-order) key: the bits of two
  * 32-bit values interleaved (x in even positions, y in odd), computed with
  * the classic mask-spread sequence inside whole-stage codegen.
  *
  * Sorting by the key clusters rows that are close in BOTH dimensions, so
  * parquet min/max file statistics prune 2-D range predicates — the real
  * Z-order layout behind `TableOps.compact(sortCols = Seq("zkey"))`, vs the
  * prefix-major clustering a plain composite sort gives (selective only on
  * the leading column).
  *
  * Contract: inputs are read as UNSIGNED 32-bit (callers bucket/normalize
  * first — ranks, quantile buckets, or `pmod`). Keep inputs below 2^31 and
  * the key stays non-negative, so signed `ORDER BY zkey` is the unsigned
  * Morton order.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == IntegerType || t == LongType
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires int/bigint inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_zorder"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(asLong(a), asLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderKey.interleave((long) $a, (long) $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {

  /** Spreads the low 32 bits of `v` to even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton key: x bits even, y bits odd. Public + static-reachable so the
    * generated code calls it directly (one invokestatic, JIT-inlined).
    */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  /** Column-API entry: `ZOrderKey.key(col("a"), col("b"))`. */
  def key(x: Column, y: Column): Column =
    ColumnBridge.column(ZOrderKey(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
