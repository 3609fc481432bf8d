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

/** `sample_k(hash, value, k)` — bottom-k-by-hash uniform row sample: the k
  * (hash ASC, value ASC)-smallest pairs seen by the group, as a sorted
  * `array<struct<hv:bigint, v:double>>`.
  *
  * Bottom-k by a uniform per-row hash IS a uniform sample without
  * replacement (every row's rank in the hash order is exchangeable), and —
  * like [[KmvAggregate]] — it is mergeable by construction:
  * bottom-k-of-union == bottom-k of the concatenated per-part bottom-k,
  * because every row a part DIDN'T keep hashes above that part's k-th
  * smallest. So partial aggregation caps each map task's state at k pairs,
  * the exchange carries O(groups × k), and persisted per-partition samples
  * re-merge to any coarser rollup without re-reading data — the quantile
  * counterpart of the KMV distinct sketch ([[graft.ops.Sketches]] derives
  * rank-error-bounded quantile estimates from it).
  *
  * Determinism is the oracle contract: the hash is
  * [[graft.ops.Sketches.hash60]] (md5-derived, DuckDB-replicable), the
  * order (hv ASC, v ASC) is total given distinct row hashes, so both
  * engines keep the identical sample. No RNG anywhere.
  *
  * State is a bounded max-heap (root = largest kept pair, first to evict):
  * insert O(log k), k bounded by the constructor.
  */
case class SampleKAggregate(
    hashExpr: Expression, valueExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Double)]] {

  require(k > 0, "k must be positive")

  // natural (hv, v) ordering; heap root = LARGEST kept pair
  private val keepOrder: Ordering[(Long, Double)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Double)] =
    mutable.PriorityQueue.empty(keepOrder)

  private def offer(
      buf: mutable.PriorityQueue[(Long, Double)], h: Long, v: Double): Unit = {
    if (buf.size < k) buf.enqueue((h, v))
    else if (keepOrder.lt((h, v), buf.head)) {
      buf.dequeue(); buf.enqueue((h, v))
    }
  }

  override def update(
      buf: mutable.PriorityQueue[(Long, Double)],
      input: InternalRow): mutable.PriorityQueue[(Long, Double)] = {
    val h = hashExpr.eval(input)
    val v = valueExpr.eval(input)
    if (h != null && v != null)
      offer(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(
      b1: mutable.PriorityQueue[(Long, Double)],
      b2: mutable.PriorityQueue[(Long, Double)]): mutable.PriorityQueue[(Long, Double)] = {
    b2.foreach { case (h, v) => offer(b1, h, v) }
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Double)]): Any = {
    val sorted = buf.toArray.sorted(keepOrder)
    new GenericArrayData(sorted.map { case (h, v) =>
      InternalRow(h, v): Any
    })
  }

  override def serialize(
      buf: mutable.PriorityQueue[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) => out.writeLong(h); out.writeDouble(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.PriorityQueue[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((in.readLong(), in.readDouble())))
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("hv", LongType), StructField("v", DoubleType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hashExpr, valueExpr)
  override def prettyName: String = "sample_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): SampleKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SampleKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SampleKAggregate =
    copy(hashExpr = newChildren(0), valueExpr = newChildren(1))
}

object SampleKAggregate {
  /** Column API: the k (hash ASC, value ASC)-smallest pairs per group. */
  def sampleK(hash: Column, value: Column, k: Int): Column =
    ColumnBridge.column(
      SampleKAggregate(
        ColumnBridge.expression(hash), ColumnBridge.expression(value), k)
        .toAggregateExpression())
}
