package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `topk_agg(score, id, k)` — custom Catalyst aggregate keeping the top-k
  * (score DESC, id ASC) pairs per group in a bounded heap.
  *
  * Why not sort + row_number + filter? That formulation shuffles and sorts
  * EVERY candidate row per group; this aggregate is a hash aggregate, so
  * each map task reduces its slice to <= k pairs before the exchange —
  * the shuffle carries O(groups x k), not O(candidates). At 100 TB of
  * scored pairs that is the difference between a bounded merge and a
  * full-data sort.
  *
  * Result: array<struct<score:double, id:bigint>> sorted best-first with
  * deterministic (score DESC, id ASC) total order — same ordering contract
  * as the window formulation, so results are oracle-comparable.
  */
case class TopKAggregate(
    scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // heap root = WORST kept element, so ordering is reversed:
  // (lower score, higher id) = "greater" = first to evict.
  private val evictionOrder: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(evictionOrder)

  private def offer(
      buf: mutable.PriorityQueue[(Double, Long)], s: Double, id: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, id))
    else {
      val worst = buf.head
      if (evictionOrder.lt((s, id), worst)) { buf.dequeue(); buf.enqueue((s, id)) }
    }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      offer(buf, s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach { case (s, id) => offer(b1, s, id) }
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sorted(evictionOrder)
    new GenericArrayData(sorted.map { case (s, id) =>
      InternalRow(s, id): Any
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, id) => out.writeDouble(s); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def prettyName: String = "topk_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggregate =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAggregate {
  /** Column API: top-k (score DESC, id ASC) pairs per group. */
  def topk(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAggregate(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
