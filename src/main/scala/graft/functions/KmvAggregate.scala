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

/** `kmv_agg(hash, k)` — K-Minimum-Values distinct-count sketch (Bar-Yossef
  * et al.): the k smallest DISTINCT hash values seen by the group, as a
  * sorted `array<bigint>`.
  *
  * Why this sketch and not HLL: the KMV state is a set of exact hash
  * values, so the sketch — and every estimate derived from it — is a pure
  * function of the input SET. Any engine that computes the same hashes
  * produces the bit-identical sketch, which is what lets the DuckDB oracle
  * certify the whole path (Spark's HLL++ registers have no cross-engine
  * twin). The estimator is `(k-1) / U_k` with `U_k` = the k-th smallest
  * hash as a fraction of the hash space; with fewer than k distinct values
  * the sketch IS the exact distinct set.
  *
  * Mergeability — the property that makes it a 100 TB primitive — is
  * structural: k-smallest-of-union == k-smallest of the concatenated
  * per-part k-smallest. `merge` is the same bounded insert as `update`,
  * so partial aggregation collapses each map task to ≤ k longs before the
  * exchange; the shuffle carries O(groups × k), never O(rows). Persisted
  * per-partition sketches (e.g. one row per day) re-aggregate to any
  * coarser rollup without touching the raw data — [[graft.ops.Sketches]]
  * builds that surface on top.
  *
  * State is a sorted distinct set (TreeSet) capped at k: insert is
  * O(log k), eviction drops the current maximum, and duplicate hashes are
  * absorbed for free — the DISTINCT the estimator requires.
  */
case class KmvAggregate(
    hashExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def offer(buf: mutable.TreeSet[Long], h: Long): Unit = {
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) { buf -= buf.last; buf += h }
  }

  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val h = hashExpr.eval(input)
    if (h != null) offer(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: mutable.TreeSet[Long], b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b2.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf += in.readLong())
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hashExpr)
  override def prettyName: String = "kmv_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAggregate =
    copy(hashExpr = newChildren(0))
}

object KmvAggregate {
  /** Column API: the k smallest distinct hash values per group, sorted. */
  def kmv(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvAggregate(ColumnBridge.expression(hash), k).toAggregateExpression())

  /** Column API: merge PRE-BUILT sketches (array<bigint> rows) into one —
    * see [[KmvMergeAggregate]]. */
  def kmvMerge(sketch: Column, k: Int): Column =
    ColumnBridge.column(
      KmvMergeAggregate(ColumnBridge.expression(sketch), k)
        .toAggregateExpression())
}

/** `kmv_merge_agg(sketch, k)` — merge PRE-BUILT KMV sketches: each input
  * row is a whole `array<bigint>` sketch (the [[KmvAggregate]] output),
  * folded element-wise into the same bounded TreeSet state. Produces the
  * bit-identical result to exploding every sketch and re-running
  * `kmv_agg`, WITHOUT the explode: rolling up a persisted sketch table
  * (one sketch per day/partition/tree-node) feeds O(rows) array values to
  * the aggregate instead of O(rows × k) generated rows — at a 3.4 M-pair
  * hierarchy closure with k = 64 that is 230 M Generate rows avoided
  * (measured 28 s → see BASELINE.md). Correct by the KMV merge property:
  * k-smallest-of-union == k-smallest of concatenated per-part k-smallest.
  */
case class KmvMergeAggregate(
    sketchExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def offer(buf: mutable.TreeSet[Long], h: Long): Unit = {
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) { buf -= buf.last; buf += h }
  }

  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val arr = sketchExpr.eval(input)
    if (arr != null) {
      val data = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < data.numElements()) { offer(buf, data.getLong(i)); i += 1 }
    }
    buf
  }

  override def merge(
      b1: mutable.TreeSet[Long], b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b2.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf += in.readLong())
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(sketchExpr)
  override def prettyName: String = "kmv_merge_agg"

  // Fail at ANALYSIS on a mis-typed input: update() reads elements with
  // ArrayData.getLong, which would silently produce garbage hashes for an
  // array<int> (or any other non-bigint array) instead of an error.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    sketchExpr.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> (a KMV sketch of 64-bit " +
            s"hashes), got ${other.simpleString}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMergeAggregate =
    copy(sketchExpr = newChildren(0))
}
