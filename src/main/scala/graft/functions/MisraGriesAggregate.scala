package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `misra_gries(key, k)` — the Misra–Gries frequent-items summary as a
  * custom Catalyst aggregate: at most `k` (key, counter) entries whose
  * counters UNDER-estimate true frequency by at most N/(k+1), where N is
  * the total (non-null) input count.
  *
  * Why Misra–Gries and not SpaceSaving: the two keep the same O(k) state
  * and the same frequent-items guarantee, but MG's merge (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012) is the clean one — combine counters
  * keywise, then subtract the (k+1)-th largest combined counter from every
  * entry and drop the non-positives. That merge preserves the
  * `true − est ≤ N/(k+1)` deficit bound under ARBITRARY merge trees, which
  * is exactly Spark's partial-aggregation contract (per-partition update,
  * tree-shaped merge in whatever order tasks finish).
  *
  * Determinism: the SET of retained keys beyond the guaranteed heavy
  * hitters IS merge-order dependent (the reason a raw summary read-out
  * can't be oracle-certified), but the guarantee itself is not — every key
  * with true count strictly above N/(k+1) has `est ≥ true − N/(k+1) > 0`
  * and is therefore present no matter how the partials merged. The
  * certified query ([[graft.ops.Sketches.mgHeavyHitters]]) uses the
  * summary only as a candidate set and re-verifies exactly, so its output
  * is deterministic; the estimate values are exposed for spec-level bound
  * checks only.
  *
  * Update is the textbook amortized-O(1) step: increment a present key,
  * insert at 1 if below capacity, otherwise decrement ALL counters by one
  * and drop zeros (each decrement event retires k+1 units of mass, so
  * total decrement work is O(N)). State is O(k) longs per group — shuffle
  * carries the summary, never the keys.
  *
  * Result: array<struct<key:bigint, est:bigint>> sorted (est DESC, key
  * ASC) — a deterministic rendering of whatever set survived.
  */
case class MisraGriesAggregate(
    keyExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(
      buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val key = keyExpr.eval(input)
    if (key != null) {
      val x = key.asInstanceOf[Long]
      if (buf.contains(x)) buf.update(x, buf(x) + 1L)
      else if (buf.size < k) buf.update(x, 1L)
      else {
        // full and x absent: decrement every counter, drop zeros (the
        // arriving x is the +1 that cancels against its own decrement);
        // snapshot first — mutating a LongMap mid-iteration is UB
        val entries = buf.toArray
        entries.foreach { case (kk, v) =>
          if (v <= 1L) buf.remove(kk) else buf.update(kk, v - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      b1: mutable.LongMap[Long], b2: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b2.foreach { case (kk, v) =>
      b1.update(kk, b1.getOrElse(kk, 0L) + v)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest counter from everything; ties at
      // the threshold go to zero and drop, so at most k entries survive
      val values = b1.values.toArray
      java.util.Arrays.sort(values)
      val cut = values(values.length - (k + 1)) // (k+1)-th largest
      val entries = b1.toArray
      entries.foreach { case (kk, v) =>
        if (v <= cut) b1.remove(kk) else b1.update(kk, v - cut)
      }
    }
    b1
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val sorted = buf.toArray.sortBy { case (kk, v) => (-v, kk) }
    new GenericArrayData(sorted.map { case (kk, v) => InternalRow(kk, v): Any })
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, v) => out.writeLong(kk); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.update(in.readLong(), in.readLong()))
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType), StructField("est", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(keyExpr)
  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAggregate =
    copy(keyExpr = newChildren(0))
}

object MisraGriesAggregate {
  /** Column API: the ≤ k-entry Misra–Gries summary of a BIGINT key. */
  def misraGries(key: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAggregate(ColumnBridge.expression(key), k)
        .toAggregateExpression())
}
