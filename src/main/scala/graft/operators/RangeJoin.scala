package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join — the missing Spark operator for a PURE range
  * predicate (`lo <= t <= hi` with no equality key). Catalyst can only
  * plan that as a nested-loop/cartesian join, O(|points| x |intervals|):
  * the shape that quietly works at test scale and never finishes at
  * 100 TB (PlanSweepSpec exists to catch exactly that).
  *
  * The bin trick restores an equi key: time is cut into fixed-width bins,
  * each interval is exploded to every bin it overlaps (bounded by
  * `maxBinsPerInterval` — a fail-fast guard, because an unbounded interval
  * would silently regrow the cartesian), each point belongs to exactly one
  * bin, and the join becomes a HASH join on `bin` followed by the exact
  * range verify. Cost: O(points + intervals·spanBins + trueMatches) — the
  * output-sensitive bound a dedicated interval-join engine gets, from
  * stock hash-join machinery. A point matches an interval in exactly one
  * bin (its own), so no dedup pass is needed.
  *
  * Pick `binWidth` ~ the typical interval length: much smaller multiplies
  * the explode; much larger multiplies false candidates per bin. Both ends
  * degrade smoothly, never quadratically (given the guard).
  *
  * This is the keyless complement of [[graft.streaming.StreamJoins]]'
  * interval join (which rides a user_id equi key) and of [[AsOfJoin]]
  * (nearest-one semantics); here every in-range pair is produced.
  */
object RangeJoin {

  /** All (point, interval) pairs with `points(tCol)` in
    * `[intervals(loCol), intervals(hiCol)]` (inclusive). Columns of both
    * inputs are preserved; `tCol`/`loCol`/`hiCol` must be numeric (e.g.
    * epoch millis). Intervals wider than `maxBinsPerInterval * binWidth`
    * raise at execution time rather than exploding the candidate set.
    */
  def pointInInterval(
      points: DataFrame, tCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long, maxBinsPerInterval: Int = 64): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val loBin = floor(col(loCol) / binWidth).cast("long")
    val hiBin = floor(col(hiCol) / binWidth).cast("long")
    val guarded = intervals.withColumn("__span_ok",
      when(hiBin - loBin >= maxBinsPerInterval,
        raise_error(concat(lit(s"RangeJoin: interval spans >= $maxBinsPerInterval bins of $binWidth; "),
          lit("widen binWidth or raise maxBinsPerInterval"))))
        .otherwise(lit(true)))
    val binned = guarded
      .withColumn("__bin", explode(sequence(loBin, hiBin)))
      .drop("__span_ok")
    points.withColumn("__bin", floor(col(tCol) / binWidth).cast("long"))
      .join(binned, Seq("__bin"))
      .filter(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("__bin")
  }
}
