package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Roaring-style compressed bitmap over non-negative integer ids — the
  * audience-segmentation primitive of the columnar-OLAP world (bitmap
  * indexes in Druid/ClickHouse/Pinot): EXACT distinct counting and EXACT
  * set algebra (AND/OR/ANDNOT) from mergeable per-group state, where the
  * sketch triad (KMV/CMS/sample) trades exactness for O(k) bounds.
  *
  * Layout (the public Roaring design, re-derived: two-level, 16-bit
  * chunking): id → (container = id >>> 16, low = id & 0xFFFF); each
  * container holds its low 16-bit members either as a SORTED short array
  * (≤ 4096 members — 2 bytes each) or as a 65536-bit bitset (8 KiB fixed,
  * > 4096 members — past that point the bitset is smaller). Memory is
  * therefore ≤ 2 bytes per member, capped at 8 KiB per 65536-id range —
  * dense id spaces (surrogate keys, row numbers, dictionary codes)
  * compress ~100× vs a hash set of longs.
  *
  * Why it matters at 100 TB: "users in segment A AND B, minus C" over
  * billions of ids is a per-container word-AND/popcount walk over
  * persisted per-segment bitmaps — no re-scan of the fact table, no
  * data-sized distinct join, and the aggregation shuffle carries one
  * compressed bitmap per (group × map task), never rows. Partial
  * aggregation collapses map-side state exactly like any algebraic agg
  * because bitmap union is idempotent/commutative/associative.
  *
  * The serialized form is CANONICAL — container keys ascending, members
  * ascending, representation chosen by cardinality alone (sparse ⇔
  * card ≤ 4096: promotion is monotone and containers never lose members,
  * so the threshold is stable) — which makes the bytes a pure function of
  * the id SET, independent of insertion/merge order. Set-algebra
  * combinators ([[Bitmap.cardinality]], [[Bitmap.andCardinality]]) walk
  * the serialized bytes directly: no deserialization, no allocation
  * beyond the two-pointer walk.
  *
  * Beyond-reference surface: the reference's SQL is exact aggregation over
  * single tables (azfunctions/InputBlobTrigger/processor.py:385-394); it
  * has no set-algebra or segment-overlap operators.
  */
object Bitmap {

  /** Roaring's array→bitset switchover: above 4096 members the 8 KiB
    * bitset is smaller than 2-byte members.
    */
  val SparseMax = 4096

  /** Ids must sit in [0, 2^47): container key = id >>> 16 must fit an Int. */
  val MaxId: Long = 1L << 47

  private val WordsPerDense = 1024 // 65536 bits

  /** One 16-bit-range container: sorted short array (sparse) or bitset
    * (dense). Mutable, single-writer — aggregation buffers are
    * single-threaded per partition by the Spark contract.
    */
  sealed trait Container {
    def cardinality: Int
    /** Adds `low` (0..65535); returns the container to keep (promotion
      * returns a new dense container). */
    def add(low: Int): Container
    def foreachMember(f: Int => Unit): Unit
  }

  final class Sparse(var arr: Array[Char], var n: Int) extends Container {
    def cardinality: Int = n
    def add(low: Int): Container = {
      val c = low.toChar
      var lo = 0; var hi = n - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid) < c) lo = mid + 1
        else if (arr(mid) > c) hi = mid - 1
        else return this // already present
      }
      if (n == SparseMax) { // promote: bitset is smaller from here on
        val d = new Dense(new Array[Long](WordsPerDense), 0)
        var i = 0
        while (i < n) { d.add(arr(i)); i += 1 }
        d.add(low)
        d
      } else {
        if (n == arr.length) {
          val grown = new Array[Char](math.min(SparseMax, math.max(8, arr.length * 2)))
          System.arraycopy(arr, 0, grown, 0, n)
          arr = grown
        }
        System.arraycopy(arr, lo, arr, lo + 1, n - lo)
        arr(lo) = c
        n += 1
        this
      }
    }
    def foreachMember(f: Int => Unit): Unit = {
      var i = 0
      while (i < n) { f(arr(i)); i += 1 }
    }
  }

  final class Dense(val words: Array[Long], var card: Int) extends Container {
    def cardinality: Int = card
    def add(low: Int): Container = {
      val w = low >>> 6
      val bit = 1L << (low & 63)
      if ((words(w) & bit) == 0L) { words(w) |= bit; card += 1 }
      this
    }
    def foreachMember(f: Int => Unit): Unit = {
      var w = 0
      while (w < WordsPerDense) {
        var bits = words(w)
        while (bits != 0L) {
          val low = (w << 6) + java.lang.Long.numberOfTrailingZeros(bits)
          f(low)
          bits &= bits - 1
        }
        w += 1
      }
    }
  }

  /** The aggregation state: container key (id >>> 16) → container. */
  final class State(val containers: mutable.LongMap[Container] =
      mutable.LongMap.empty) {

    def add(id: Long): Unit = {
      if (id < 0L || id >= MaxId) throw new IllegalArgumentException(
        s"graft_bitmap: id $id outside [0, 2^47) — bitmap ids are " +
          "non-negative surrogate/dictionary codes; map or offset first")
      val hi = id >>> 16
      val low = (id & 0xFFFF).toInt
      containers.get(hi) match {
        case Some(c) =>
          val kept = c.add(low)
          if (kept ne c) containers(hi) = kept
        case None =>
          val s = new Sparse(new Array[Char](8), 0)
          s.arr(0) = low.toChar; s.n = 1
          containers(hi) = s
      }
    }

    def merge(other: State): Unit =
      other.containers.foreach { case (hi, c) =>
        containers.get(hi) match {
          case None =>
            // adopt: other's buffer is dead after merge (Spark contract),
            // but copy anyway — cheap, and immune to buffer reuse
            containers(hi) = Bitmap.copyOf(c)
          case Some(mine) =>
            var kept = mine
            c.foreachMember { low => kept = kept.add(low) }
            if (kept ne mine) containers(hi) = kept
        }
      }

    def cardinality: Long = {
      var total = 0L
      containers.foreach { case (_, c) => total += c.cardinality }
      total
    }
  }

  private def copyOf(c: Container): Container = c match {
    case s: Sparse => new Sparse(java.util.Arrays.copyOf(s.arr, s.arr.length), s.n)
    case d: Dense => new Dense(java.util.Arrays.copyOf(d.words, WordsPerDense), d.card)
  }

  // ---- canonical serialization -------------------------------------------
  //
  // int32 nContainers, then per container in ASCENDING key order:
  //   int32 key, int32 cardinality,
  //   payload: card ≤ SparseMax → card × uint16 members ascending
  //            card > SparseMax → 1024 × int64 bitset words
  // Little-endian throughout. Sparse ⇔ card ≤ 4096 is an invariant of the
  // build path (promotion at 4097, members never removed), so the
  // representation — and the bytes — are a pure function of the id set.

  def serialize(st: State): Array[Byte] = {
    val keys = st.containers.keys.toArray
    java.util.Arrays.sort(keys)
    var size = 4
    keys.foreach { k =>
      val c = st.containers(k).cardinality
      size += 8 + (if (c <= SparseMax) 2 * c else 8 * WordsPerDense)
    }
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(keys.length)
    keys.foreach { k =>
      val c = st.containers(k)
      bb.putInt(k.toInt)
      bb.putInt(c.cardinality)
      c match {
        case s: Sparse =>
          var i = 0
          while (i < s.n) { bb.putShort(s.arr(i).toShort); i += 1 }
        case d: Dense =>
          var w = 0
          while (w < WordsPerDense) { bb.putLong(d.words(w)); w += 1 }
      }
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val st = new State()
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val key = bb.getInt.toLong
      val card = bb.getInt
      if (card <= SparseMax) {
        val arr = new Array[Char](math.max(8, card))
        var j = 0
        while (j < card) { arr(j) = (bb.getShort & 0xFFFF).toChar; j += 1 }
        st.containers(key) = new Sparse(arr, card)
      } else {
        val words = new Array[Long](WordsPerDense)
        var w = 0
        while (w < WordsPerDense) { words(w) = bb.getLong; w += 1 }
        st.containers(key) = new Dense(words, card)
      }
      i += 1
    }
    st
  }

  /** Folds a serialized bitmap into a live state without materializing a
    * second State (the merge-aggregate hot path).
    */
  def mergeSerialized(st: State, bytes: Array[Byte]): Unit = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val key = bb.getInt.toLong
      val card = bb.getInt
      if (card <= SparseMax) {
        var j = 0
        while (j < card) {
          st.add((key << 16) | (bb.getShort & 0xFFFF).toLong); j += 1
        }
      } else {
        var w = 0
        while (w < WordsPerDense) {
          var bits = bb.getLong
          while (bits != 0L) {
            st.add((key << 16) |
              ((w << 6) + java.lang.Long.numberOfTrailingZeros(bits)).toLong)
            bits &= bits - 1
          }
          w += 1
        }
      }
      i += 1
    }
  }

  // ---- zero-copy combinators over serialized bytes -----------------------
  // Static-reachable so generated code calls them directly (the ZOrderKey
  // pattern: one invokestatic, JIT-inlined walk over the byte arrays).

  /** Total members: sum of the per-container cardinality headers —
    * payloads are skipped, O(containers) regardless of density.
    */
  def cardinality(bytes: Array[Byte]): Long = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt
    var total = 0L
    var i = 0
    while (i < n) {
      bb.getInt // key
      val card = bb.getInt
      total += card
      bb.position(bb.position() +
        (if (card <= SparseMax) 2 * card else 8 * WordsPerDense))
      i += 1
    }
    total
  }

  /** |A ∩ B| by a two-pointer walk over the serialized container
    * directories: matching keys intersect member-wise (sorted-merge for
    * sparse×sparse, bit-probe for sparse×dense, word-AND popcount for
    * dense×dense); non-matching containers are skipped via the header —
    * never decoded. |A ∪ B| and |A \ B| derive by
    * inclusion-exclusion from this and [[cardinality]].
    */
  def andCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    val ba = ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)
    val bbuf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val na = ba.getInt; val nb = bbuf.getInt
    var ia = 0; var ib = 0
    var total = 0L
    var keyA = 0; var cardA = 0; var posA = 0
    var keyB = 0; var cardB = 0; var posB = 0
    def loadA(): Unit = { keyA = ba.getInt; cardA = ba.getInt; posA = ba.position() }
    def loadB(): Unit = { keyB = bbuf.getInt; cardB = bbuf.getInt; posB = bbuf.position() }
    def skipA(): Unit = ba.position(posA + (if (cardA <= SparseMax) 2 * cardA else 8 * WordsPerDense))
    def skipB(): Unit = bbuf.position(posB + (if (cardB <= SparseMax) 2 * cardB else 8 * WordsPerDense))
    if (ia < na) loadA()
    if (ib < nb) loadB()
    while (ia < na && ib < nb) {
      if (keyA < keyB) { skipA(); ia += 1; if (ia < na) loadA() }
      else if (keyB < keyA) { skipB(); ib += 1; if (ib < nb) loadB() }
      else {
        total += containerAnd(ba, cardA, bbuf, cardB)
        ba.position(posA + (if (cardA <= SparseMax) 2 * cardA else 8 * WordsPerDense))
        bbuf.position(posB + (if (cardB <= SparseMax) 2 * cardB else 8 * WordsPerDense))
        ia += 1; ib += 1
        if (ia < na) loadA()
        if (ib < nb) loadB()
      }
    }
    total
  }

  /** Intersection cardinality of two containers positioned at their
    * payloads; does not advance past the payloads (callers reposition).
    */
  private def containerAnd(
      a: ByteBuffer, cardA: Int, b: ByteBuffer, cardB: Int): Int = {
    val baseA = a.position(); val baseB = b.position()
    if (cardA <= SparseMax && cardB <= SparseMax) {
      var i = 0; var j = 0; var cnt = 0
      while (i < cardA && j < cardB) {
        val va = a.getShort(baseA + 2 * i) & 0xFFFF
        val vb = b.getShort(baseB + 2 * j) & 0xFFFF
        if (va < vb) i += 1
        else if (vb < va) j += 1
        else { cnt += 1; i += 1; j += 1 }
      }
      cnt
    } else if (cardA <= SparseMax) { // a sparse, b dense: probe b's bits
      var i = 0; var cnt = 0
      while (i < cardA) {
        val v = a.getShort(baseA + 2 * i) & 0xFFFF
        if ((b.getLong(baseB + 8 * (v >>> 6)) & (1L << (v & 63))) != 0L) cnt += 1
        i += 1
      }
      cnt
    } else if (cardB <= SparseMax) {
      var j = 0; var cnt = 0
      while (j < cardB) {
        val v = b.getShort(baseB + 2 * j) & 0xFFFF
        if ((a.getLong(baseA + 8 * (v >>> 6)) & (1L << (v & 63))) != 0L) cnt += 1
        j += 1
      }
      cnt
    } else {
      var w = 0; var cnt = 0
      while (w < WordsPerDense) {
        cnt += java.lang.Long.bitCount(
          a.getLong(baseA + 8 * w) & b.getLong(baseB + 8 * w))
        w += 1
      }
      cnt
    }
  }

  // ---- Column API --------------------------------------------------------

  /** Aggregate: compressed bitmap of the group's ids, as canonical bytes. */
  def bitmapBuild(id: Column): Column =
    ColumnBridge.column(
      BitmapBuildAggregate(ColumnBridge.expression(id)).toAggregateExpression())

  /** Aggregate: union of PRE-BUILT bitmaps (binary rows) — the persisted
    * rollup path, same role as [[KmvAggregate.kmvMerge]]. */
  def bitmapMerge(bitmap: Column): Column =
    ColumnBridge.column(
      BitmapMergeAggregate(ColumnBridge.expression(bitmap)).toAggregateExpression())

  def bitmapCardinality(bitmap: Column): Column =
    ColumnBridge.column(BitmapCardinality(ColumnBridge.expression(bitmap)))

  def bitmapAndCardinality(a: Column, b: Column): Column =
    ColumnBridge.column(
      BitmapAndCardinality(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** `graft_bitmap(id)` — builds the group's [[Bitmap]] from int/bigint ids. */
case class BitmapBuildAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Bitmap.State] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an int/bigint id column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Bitmap.State = new Bitmap.State()

  override def update(buf: Bitmap.State, input: InternalRow): Bitmap.State = {
    val v = child.eval(input)
    if (v != null) buf.add(v match {
      case i: Int => i.toLong
      case l: Long => l
    })
    buf
  }

  override def merge(b1: Bitmap.State, b2: Bitmap.State): Bitmap.State = {
    b1.merge(b2); b1
  }

  override def eval(buf: Bitmap.State): Any = Bitmap.serialize(buf)
  override def serialize(buf: Bitmap.State): Array[Byte] = Bitmap.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Bitmap.State =
    Bitmap.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_bitmap"

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBuildAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBuildAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapBuildAggregate =
    copy(child = newChildren(0))
}

/** `graft_bitmap_merge(bitmap)` — unions PRE-BUILT serialized bitmaps:
  * rolling up a persisted per-day/per-segment bitmap table touches O(rows)
  * binary values, never the raw ids.
  */
case class BitmapMergeAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Bitmap.State] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary bitmap column (graft_bitmap output), " +
        s"got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Bitmap.State = new Bitmap.State()

  override def update(buf: Bitmap.State, input: InternalRow): Bitmap.State = {
    val v = child.eval(input)
    if (v != null) Bitmap.mergeSerialized(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(b1: Bitmap.State, b2: Bitmap.State): Bitmap.State = {
    b1.merge(b2); b1
  }

  override def eval(buf: Bitmap.State): Any = Bitmap.serialize(buf)
  override def serialize(buf: Bitmap.State): Array[Byte] = Bitmap.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Bitmap.State =
    Bitmap.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_bitmap_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapMergeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapMergeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapMergeAggregate =
    copy(child = newChildren(0))
}

/** `graft_bitmap_card(bitmap)` — exact member count from the serialized
  * header walk (payloads skipped).
  */
case class BitmapCardinality(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary bitmap column, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bitmap_card"

  override protected def nullSafeEval(v: Any): Any =
    Bitmap.cardinality(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Bitmap.cardinality($c);")

  override protected def withNewChildInternal(newChild: Expression): BitmapCardinality =
    copy(child = newChild)
}

/** `graft_bitmap_and_card(a, b)` — exact |A ∩ B| straight off the two
  * serialized directories. OR and ANDNOT derive by inclusion-exclusion:
  * |A∪B| = |A| + |B| − |A∩B|, |A\B| = |A| − |A∩B|.
  */
case class BitmapAndCardinality(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary bitmap columns, got " +
          s"${l.simpleString} / ${r.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bitmap_and_card"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Bitmap.andCardinality(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Bitmap.andCardinality($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCardinality =
    copy(left = newLeft, right = newRight)
}
