package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Exact k-dp presentation of an integer ratio, computed entirely in
  * integer arithmetic — the cross-engine-safe replacement for
  * `round(num / den, k)` on integer inputs.
  *
  * `round(double, k)` is engine-dependent at exact decimal ties: a
  * rational num/den whose lowest-terms denominator divides 10^(k+1) but
  * not 10^k (e.g. 5/128 = 0.0390625 at k=6) renders as a digit string
  * ending in 5 — Spark's `Round` does BigDecimal HALF_UP on the shortest
  * decimal string of the double and rounds UP, while an engine that
  * rounds the raw binary double (which sits an ulp off the tie) can go
  * either way. The incr_agg_merge correctness failure of rounds 6–7 was
  * exactly this class.
  *
  * The fix is to never round a double: with p = 10^k,
  *
  *   ratio_ek = (num·2p + den) div (2·den)      // half-up, pure integer
  *
  * is identical in every engine (DuckDB spelling:
  * `(num*2p + den) // (2*den)`), and ratio_ek ≤ 2^53 keeps the final
  * `ratio_ek / p` double presentation bit-identical too. Requires
  * num ≥ 0, den > 0 (integral `div` truncation-vs-floor conventions
  * differ across engines for negatives).
  *
  * Numeric budget (the r11 sf10 HITS lesson, applied here in r12): the
  * product num·2p overflows BIGINT at num > ~4.6e12 for k=6 — a count
  * a 100 TB corpus can exceed. The multiply-and-divide therefore runs
  * in DECIMAL(38,0) (DuckDB twin: BIGINT sums auto-promote to HUGEINT,
  * so the oracle side was already wide); the surviving budget is only
  * the presentation one: ratio_ek = round(num/den·10^k) must stay
  * ≤ 2^53 for the final double to be exact — num/den ≤ ~9×10^9 at k=6,
  * and every call site presents a ratio ≤ its aggregation fan-in.
  */
object ExactRatio {

  /** `round(num/den, k)` half-up, exact: num, den integer-valued columns,
    * num ≥ 0, den > 0, num/den ≤ ~9e9 at k=6 (the double-exactness
    * bound; the old num ≤ 4.6e12 BIGINT bound is gone — internals run
    * DECIMAL(38,0)).
    */
  def exactRatio(num: Column, den: Column, k: Int): Column = {
    require(k >= 1 && k <= 9, s"k=$k out of the supported 1..9")
    val p = math.pow(10, k).toLong
    val n = num.cast("decimal(38,0)")
    val d = den.cast("decimal(38,0)")
    // Catalyst IntegralDivide directly: Column has no integral divide,
    // and double floor-division breaks past 2^53. On DECIMAL inputs it
    // still returns LongType — the cast chain stays long → double.
    (ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        ColumnBridge.expression(n * lit(2L * p).cast("decimal(38,0)") + d),
        ColumnBridge.expression(d * lit(2L).cast("decimal(38,0)")))
    ).cast("double") / lit(p.toDouble))
  }
}
