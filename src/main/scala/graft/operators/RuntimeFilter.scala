package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter runtime filter — the 100 TB semi-join reduction primitive.
  *
  * A semi/inner join whose probe side is huge and whose build side is
  * selective still SHUFFLES the entire probe side before a single build row
  * can reject anything. The fix every warehouse engine ships (Spark's own
  * `InjectRuntimeFilter`, which only fires on its internal heuristics) is to
  * sketch the build keys into a Bloom filter, broadcast the sketch, and drop
  * probe rows BEFORE the exchange: the shuffle then carries only rows that
  * can possibly match (plus the sketch's false-positive fraction).
  *
  * This operator makes that plan shape explicit and composable:
  *
  *  1. [[keyBloom]] builds the sketch DISTRIBUTEDLY with Spark's native
  *     `BloomFilterAggregate` over `xxhash64(key)` — each map task folds its
  *     slice into a local sketch, partials OR together, and only the final
  *     `numBits/8`-byte blob reaches the driver. Nothing about the build is
  *     size-of-data.
  *  2. [[mightContain]] wraps the blob in the native (codegen'd)
  *     `BloomFilterMightContain` predicate — a narrow filter that runs at
  *     scan speed inside whole-stage codegen, beneath the join's exchange.
  *  3. [[bloomSemiJoin]] composes both with an EXACT `left_semi` verify
  *     join, so false positives never escape: the result is bit-identical
  *     to a plain semi-join, only the shuffle volume changes.
  *
  * The sketch collect is an eager action at plan-build time (same contract
  * as [[Broadcasting.checked]]'s probe, and as Spark's own runtime-filter
  * scalar subquery). The blob is bounded by construction — `numBits` is
  * capped at [[MaxNumBits]] (8 MB serialized), never size-of-data.
  *
  * Reference seam: the reference has no analog (its joins are single-node
  * pandas merges, processor.py); this is beyond-reference scale surface.
  */
object RuntimeFilter {

  /** Cap on sketch bits — matches Spark's own
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` default (8 MB).
    */
  val MaxNumBits: Long = 67108864L

  /** Serialized Bloom sketch of `xxhash64(key)` over `df`, built with the
    * native distributed aggregate. Returns None when `df` has no rows —
    * callers short-circuit to an empty result, the exact semantics of a
    * semi-join against an empty build.
    *
    * Self-sizing: `expectedItems = None` (the default) counts the build
    * side first and sizes the sketch from the actual cardinality — the
    * build side is the SMALL side by contract, so the extra scan is cheap
    * and beats a fixed guess by megabytes in either direction (Spark's own
    * InjectRuntimeFilter sizes from the creation-side row-count estimate;
    * without CBO stats that estimate is absent here, so we measure).
    * The count doubles as the empty check.
    *
    * The blob is memoized per canonicalized plan ([[sketchCache]], matched
    * by `sameResult` like [[Broadcasting]]'s probe cache): re-invoking the
    * same query pays the build-side scans once per JVM. Same staleness
    * contract as Broadcasting — the sketch reflects the side's content when
    * FIRST planned; pass `recheck = true` to force a rebuild.
    */
  def keyBloom(
      df: DataFrame,
      key: String,
      expectedItems: Option[Long] = None,
      fpp: Double = 0.03,
      recheck: Boolean = false): Option[Array[Byte]] = {
    val planKey = df.queryExecution.optimizedPlan.canonicalized
    def cached: Option[Option[Array[Byte]]] = cacheLock.synchronized {
      sketchCache.collectFirst {
        case (p, k, f, blob) if k == key && f == fpp && p.sameResult(planKey) => blob
      }
    }
    (if (recheck) None else cached)
      .getOrElse {
        // the aggregate itself yields NULL on empty input, so the explicit-
        // size path needs no separate empty check; Option() absorbs it
        def build(items: Long): Option[Array[Byte]] = {
          val numBits =
            math.min(BloomFilter.optimalNumOfBits(items.max(1L), fpp), MaxNumBits)
          val agg = new BloomFilterAggregate(
            new XxHash64(Seq(ColumnBridge.expression(col(key)))),
            Literal(items.max(1L)), Literal(numBits))
          Option(df
            .select(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
            .head().getAs[Array[Byte]](0))
        }
        // build runs OUTSIDE the lock (it scans the build side; holding the
        // lock would serialize unrelated concurrent sketches) — two racing
        // builders of the same plan both build, last one wins the cache slot.
        val blob = expectedItems match {
          case Some(n) => build(n)
          case None =>
            val n = df.count()
            if (n == 0L) None else build(n)
        }
        // lookup-and-replace is atomic under the lock: the r5 formulation
        // computed an index from a snapshot and remove(i)'d on the live
        // list, which a concurrent call could invalidate (wrong-entry
        // removal or IndexOutOfBounds).
        cacheLock.synchronized {
          val i = sketchCache.indexWhere {
            case (p, k, f, _) => k == key && f == fpp && p.sameResult(planKey)
          }
          if (i >= 0) sketchCache.remove(i)
          if (sketchCache.size >= SketchCacheMax) sketchCache.remove(0)
          sketchCache += ((planKey, key, fpp, blob))
        }
        blob
      }
  }

  /** Memoized sketches: (canonicalized plan, key, fpp) -> blob. Bounded
    * FIFO; sketches are <= 8 MB each, so the worst-case cache is ~128 MB
    * of driver heap — same order as one broadcast side. All reads and
    * mutations go through [[cacheLock]]; `sameResult` matching rules out a
    * plain hash map key.
    */
  private val sketchCache =
    scala.collection.mutable.ArrayBuffer.empty[
      (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        String, Double, Option[Array[Byte]])]
  private val cacheLock = new Object
  private val SketchCacheMax = 16

  /** Codegen'd `might_contain(sketch, xxhash64(key))` predicate column. */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** Exact semi-join with a Bloom pre-filter on the probe side: rows of
    * `fact` having a match in `dim`, where the sketch rejects non-matching
    * fact rows BEFORE the join's exchange and the `left_semi` join removes
    * the sketch's false positives. Result ≡ `fact.join(dim, key, left_semi)`.
    */
  def bloomSemiJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Option[Long] = None,
      fpp: Double = 0.03): DataFrame =
    keyBloom(dim, dimKey, expectedItems, fpp) match {
      case None => fact.filter(lit(false))
      case Some(sketch) =>
        val pre = fact.filter(mightContain(sketch, fact(factKey)))
        pre.join(dim, pre(factKey) === dim(dimKey), "left_semi")
    }
}
