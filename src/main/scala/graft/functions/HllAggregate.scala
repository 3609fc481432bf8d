package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) over the
  * repo's 60-bit md5 hashes — the CONSTANT-size leg of the distinct
  * family: 2048 byte registers (2 KiB) per group regardless of
  * cardinality, vs KMV's O(k) exact-hash state and the bitmap's
  * O(distinct) exactness. Standard error 1.04/√2048 ≈ 2.3 %; billions of
  * distinct ids per group cost the same 2 KiB, which is what a per-group
  * distinct monitor over a 100 TB corpus has to be.
  *
  * Register derivation is integer-exact and ENGINE-REPRODUCIBLE — the
  * property every sketch in this repo is built around: with
  * hv ∈ [0, 2^60) from [[graft.ops.Sketches.hash60]],
  *
  *   idx = hv div 2^49          (top 11 bits → register)
  *   rho = nlz(suffix) − 14     (leading-zero count of the 49-bit
  *                               suffix + 1; suffix = 0 → 50)
  *
  * and rho ≡ 50 − bitlength(suffix), which DuckDB computes as
  * `50 - length(bin(suffix))` — pure integer arithmetic, no floating
  * point, so both engines build BIT-IDENTICAL register arrays and the
  * oracle certifies build AND merge (elementwise max is a pure function
  * of the id set, insertion/merge-order free).
  *
  * The estimator keeps the harmonic-mean denominator in EXACT BIGINT:
  * Z_scaled = Σ_j 2^(50 − M[j]) ≤ 2048·2^50 < 2^62 (each term a power of
  * two, `1L << (50 − M[j])`; DuckDB twin `1::BIGINT << (50 - mj)`), so
  * the only floating-point step is ONE division of the same two values on
  * both engines — floor of identical IEEE doubles is identical, the
  * round()-tie class cannot occur. The small-range linear-counting
  * correction (m·ln(m/V)) is deliberately NOT in the certified columns:
  * ln() is not bit-reproducible across libms. [[HllFunctions
  * .correctedEstimate]] provides it for JVM consumers; exact-at-low-
  * cardinality use cases belong to KMV (exact below k) or the bitmap
  * (exact always).
  *
  * Mergeability is structural (max is idempotent/commutative/
  * associative): partial aggregation collapses every map task to 2 KiB
  * per group before the exchange, persisted per-partition registers
  * re-aggregate to any coarser rollup via [[HllMergeAggregate]] without
  * touching raw data.
  */
object Hll {
  val P = 11
  val M: Int = 1 << P // 2048 registers
  val SuffixBits = 49
  val MaxRho: Byte = 50 // suffix = 0

  /** alpha_m · m² · 2^50 — the estimator numerator, ONE double constant
    * computed once here and embedded as the same literal in the oracle
    * SQL (Double round-trips through its shortest decimal form, so both
    * engines parse the identical value).
    */
  val EstNumerator: Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    alpha * M.toDouble * M.toDouble * (1L << 50).toDouble
  }

  def registerIndex(hv: Long): Int = (hv >>> SuffixBits).toInt

  def rho(hv: Long): Byte = {
    val suffix = hv & ((1L << SuffixBits) - 1)
    if (suffix == 0L) MaxRho
    else (java.lang.Long.numberOfLeadingZeros(suffix) - 14).toByte
  }

  def add(regs: Array[Byte], hv: Long): Unit = {
    val idx = registerIndex(hv)
    val r = rho(hv)
    if (r > regs(idx)) regs(idx) = r
  }

  def maxMerge(into: Array[Byte], from: Array[Byte]): Unit = {
    var i = 0
    while (i < M) { if (from(i) > into(i)) into(i) = from(i); i += 1 }
  }

  /** Exact-BIGINT harmonic denominator: Σ 2^(50 − M[j]). */
  def zScaled(regs: Array[Byte]): Long = {
    var z = 0L
    var i = 0
    while (i < M) { z += 1L << (50 - regs(i)); i += 1 }
    z
  }

  /** Raw HLL estimate: floor(EstNumerator / Z_scaled) — the certified
    * estimator (see class doc for why no small-range branch).
    */
  def estimate(regs: Array[Byte]): Long =
    math.floor(EstNumerator / zScaled(regs).toDouble).toLong

  def zeroRegisters(regs: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < M) { if (regs(i) == 0) v += 1L; i += 1 }
    v
  }

  // ---- Column API --------------------------------------------------------

  def hll(hash: Column): Column =
    ColumnBridge.column(
      HllAggregate(ColumnBridge.expression(hash)).toAggregateExpression())

  def hllMerge(regs: Column): Column =
    ColumnBridge.column(
      HllMergeAggregate(ColumnBridge.expression(regs)).toAggregateExpression())

  def hllEstimate(regs: Column): Column =
    ColumnBridge.column(HllEstimate(ColumnBridge.expression(regs)))

  def hllZeroRegs(regs: Column): Column =
    ColumnBridge.column(HllZeroRegisters(ColumnBridge.expression(regs)))
}

object HllFunctions {
  /** The standard small-range-corrected estimate for JVM consumers: linear
    * counting m·ln(m/V) when the raw estimate ≤ 2.5·m and zero registers
    * remain. NOT cross-engine-certifiable (ln is libm-dependent) — kept
    * out of the oracle columns by design.
    */
  def correctedEstimate(regs: Array[Byte]): Long = {
    val raw = Hll.estimate(regs)
    val v = Hll.zeroRegisters(regs)
    if (raw <= (5L * Hll.M) / 2L && v > 0L)
      math.round(Hll.M.toDouble * math.log(Hll.M.toDouble / v.toDouble))
    else raw
  }
}

/** `graft_hll(hash)` — builds the group's 2048-register HLL sketch from
  * 60-bit hashes ([[graft.ops.Sketches.hash60]] output).
  */
case class HllAggregate(
    hashExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def checkInputDataTypes(): TypeCheckResult = hashExpr.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash column (hash60 output), got " +
        other.simpleString)
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val h = hashExpr.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long]
      if (hv < 0L || hv >= (1L << 60)) throw new IllegalArgumentException(
        s"graft_hll: hash $hv outside [0, 2^60) — feed Sketches.hash60")
      Hll.add(buf, hv)
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    Hll.maxMerge(b1, b2); b1
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hashExpr)
  override def prettyName: String = "graft_hll"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAggregate =
    copy(hashExpr = newChildren(0))
}

/** `graft_hll_merge(regs)` — elementwise-max union of PRE-BUILT register
  * arrays: the persisted-sketch rollup path (O(rows) 2 KiB values, raw
  * data never re-read).
  */
case class HllMergeAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary register column (graft_hll output), " +
        s"got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val regs = v.asInstanceOf[Array[Byte]]
      if (regs.length != Hll.M) throw new IllegalArgumentException(
        s"graft_hll_merge: expected ${Hll.M} registers, got ${regs.length} " +
          "bytes — input must be graft_hll output")
      Hll.maxMerge(buf, regs)
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    Hll.maxMerge(b1, b2); b1
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_hll_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMergeAggregate =
    copy(child = newChildren(0))
}

/** `graft_hll_est(regs)` — the certified raw estimate (see [[Hll]] doc). */
case class HllEstimate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary register column, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hll_est"

  override protected def nullSafeEval(v: Any): Any =
    Hll.estimate(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hll.estimate($c);")

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

/** `graft_hll_zeros(regs)` — untouched-register count (the small-range
  * indicator a consumer needs to decide whether the raw estimate is in
  * its accurate regime).
  */
case class HllZeroRegisters(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary register column, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hll_zeros"

  override protected def nullSafeEval(v: Any): Any =
    Hll.zeroRegisters(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hll.zeroRegisters($c);")

  override protected def withNewChildInternal(newChild: Expression): HllZeroRegisters =
    copy(child = newChild)
}
