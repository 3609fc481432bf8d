package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Guard-railed broadcast: `broadcast(df)` is an unconditional promise that
  * the side fits on the driver and every executor — a promise a
  * data-dependent side (a dim derived from the fact table, a "query subset"
  * that is a fixed fraction of the corpus) silently breaks at 100x scale,
  * OOMing the driver instead of failing the plan. The reference's own
  * broadcast analog is a BOUNDED side — the cell table read once and merged
  * per batch (processor.py:296-300) — never a corpus fraction.
  *
  * [[checked]] enforces the boundedness at plan-build time:
  *  1. If the schema is entirely FIXED-WIDTH and the optimizer's size
  *     estimate is within `maxEstBytes`, broadcast — zero extra cost.
  *     The fixed-width restriction matters: Catalyst estimates strings and
  *     arrays at small default widths (a LocalRelation of 40 KB strings
  *     estimates ~28 B/row), so for variable-width schemas the estimate
  *     can under-count by orders of magnitude and only the probe is
  *     trustworthy.
  *  2. Otherwise run a BOUNDED probe over at most `maxRows + 1` rows that
  *     measures BOTH the row count and the materialized payload (JSON
  *     octet length per row — an over-estimate of the binary size, i.e.
  *     conservative in the safe direction, and it counts variable-width
  *     arrays/strings the static schema width cannot). Plan-size
  *     estimates are upper bounds (filters/aggregates don't shrink them
  *     without CBO stats), so the probe rescues legitimately small sides
  *     with pessimistic estimates — but a side that is few-rows-yet-wide
  *     (2M x 6 KB embedding rows) fails the byte bound and is NOT
  *     broadcast, which a row-count-only probe would miss.
  *  3. An oversized side either degrades to a plain (shuffle-joinable)
  *     frame, or — for joins whose non-equi condition would turn a shuffle
  *     fallback into a cartesian product — fails fast with the size evidence.
  *
  * The probe is an EAGER action at plan-build time; its verdict is memoized
  * per canonicalized plan ([[probeCache]]) so re-invoking the same query
  * pays the probe once per JVM instead of re-running the side's upstream
  * plan on every build.
  */
object Broadcasting {

  /** Default plan-estimate bound under which a side broadcasts unprobed.
    * Matches the order of magnitude a healthy driver/executor can hold
    * (Spark's own autoBroadcastJoinThreshold default is 10 MB; estimates
    * are pessimistic upper bounds, so this is deliberately looser).
    */
  val DefaultMaxEstBytes: Long = 256L << 20

  /** Default row bound for the probe: broadcast sides beyond this are a
    * misuse of the operator contract regardless of byte size.
    */
  val DefaultMaxRows: Int = 4000000

  /** Returns `df` marked for broadcast iff it is provably within bounds;
    * otherwise returns it unmarked (Catalyst/AQE then pick a shuffle
    * strategy from actual runtime sizes).
    */
  def checked(
      df: DataFrame,
      maxEstBytes: Long = DefaultMaxEstBytes,
      maxRows: Int = DefaultMaxRows,
      tag: String = "broadcast side",
      recheck: Boolean = false): DataFrame =
    if (isBounded(df, maxEstBytes, maxRows, recheck)) broadcast(df) else df

  /** Like [[checked]] but throws on an oversized side. For joins where the
    * broadcast is load-bearing (non-equi conditions that would otherwise
    * plan as a cartesian product) failing loudly beats degrading quietly.
    */
  def checkedOrFail(
      df: DataFrame,
      maxEstBytes: Long = DefaultMaxEstBytes,
      maxRows: Int = DefaultMaxRows,
      tag: String = "broadcast side",
      recheck: Boolean = false): DataFrame =
    if (isBounded(df, maxEstBytes, maxRows, recheck)) broadcast(df)
    else throw new IllegalStateException(
      s"$tag exceeds the broadcast bound (> $maxRows rows and plan estimate " +
        s"${df.queryExecution.optimizedPlan.stats.sizeInBytes} B > $maxEstBytes B); " +
        "refusing to broadcast a side that grows with the data — restructure " +
        "the query (e.g. batch the queries, or use the shuffle-join variant)")

  /** Memoized probe verdicts, keyed by the side's CANONICALIZED logical
    * plan (alias/id-normalized, so the same query re-built each invocation
    * hits the cache) plus the bounds. Entry match is `sameResult`, never a
    * bare hashCode — a collision must not let an oversized side borrow a
    * small side's verdict. Bounded FIFO so a long-lived session doing plan
    * exploration cannot grow it without limit.
    *
    * Staleness contract: the verdict reflects the side's size when FIRST
    * planned in this JVM. A table that grows past the bound between
    * invocations (e.g. a slowly-changing dim re-read per micro-batch) keeps
    * its cached verdict — see [[graft.streaming.StreamJoins.enrich]]'s
    * scaladoc, which documents the build-time-only guarantee and the
    * foreachBatch re-check escape hatch.
    */
  private val probeCache =
    new java.util.concurrent.CopyOnWriteArrayList[
      (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long, Int, Boolean)]
  private val ProbeCacheMax = 64

  private def isBounded(
      df: DataFrame, maxEstBytes: Long, maxRows: Int,
      recheck: Boolean = false): Boolean = {
    import org.apache.spark.sql.types._
    val fixedWidth = df.schema.forall(_.dataType match {
      case _: NumericType | BooleanType | DateType | TimestampType => true
      case _ => false
    })
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    (fixedWidth && est <= maxEstBytes) || {
      val key = df.queryExecution.optimizedPlan.canonicalized
      import scala.jdk.CollectionConverters._
      (if (recheck) None // bypass reads; the fresh verdict still lands below
       else probeCache.asScala.collectFirst {
         case (p, b, r, v) if b == maxEstBytes && r == maxRows && p.sameResult(key) => v
       })
        .getOrElse {
          val probed = df.limit(maxRows + 1)
            .select(octet_length(to_json(struct(df.columns.map(col).toIndexedSeq: _*)))
              .cast("long").as("sz"))
            .agg(count(lit(1)).as("n"), coalesce(sum(col("sz")), lit(0L)).as("bytes"))
            .head()
          val verdict = probed.getLong(0) <= maxRows && probed.getLong(1) <= maxEstBytes
          // supersede any stale entry for this plan (a recheck must not
          // leave the old verdict shadowing the new one), then bound size
          probeCache.asScala.zipWithIndex.collectFirst {
            case ((p, b, r, _), i) if b == maxEstBytes && r == maxRows && p.sameResult(key) => i
          }.foreach(i => probeCache.remove(i))
          if (probeCache.size >= ProbeCacheMax) probeCache.remove(0)
          probeCache.add((key, maxEstBytes, maxRows, verdict))
          verdict
        }
    }
  }
}
