package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of algebraic aggregates: keep (sum, count)
  * PARTIALS per group as the stored state, fold new batches in by
  * re-aggregating state ∪ batch-partials, and derive presentation values
  * (averages, rounded sums) only at read time.
  *
  * This is the view-maintenance discipline the reference applies to its
  * forecast_meta rollup — recomputed per-file over only that file's rows,
  * then upserted (`processor.py:337-351`) — generalized to any
  * sum/count-decomposable aggregate. At 100 TB the full-recompute
  * alternative rescans the corpus per batch; merging partials touches
  * O(groups) + O(batch) rows, and the merge is associative, so daily →
  * weekly → standing rollups compose without ever widening the scan.
  *
  * The derived average stays exact under merging because it is computed
  * from the merged sums, never averaged across partials.
  *
  * The partial state is DECIMAL(18,2), not double: double addition is not
  * associative, so merged double partials can drift an ulp from the full
  * recompute and `round` amplifies that at a .005 boundary. Mergeable
  * state must be exact — decimal sums are associative, so any merge order
  * reproduces the one-pass sum bit-for-bit. Presentation casts to double
  * only after the exact arithmetic is done.
  */
object IncrementalAgg {

  /** Per-day (sum, count) partial state for the orders fact. */
  def dailyOrderPartials(orders: DataFrame): DataFrame =
    orders.groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev_sum"),
        count(lit(1)).as("n_orders"))

  /** Fold any number of partial states into one: union + re-aggregate.
    * Map-side combine collapses each input's groups before the exchange,
    * so the shuffle is O(distinct groups), not O(rows).
    */
  def mergePartials(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy("day")
      .agg(sum("rev_sum").as("rev_sum"), sum("n_orders").as("n_orders"))

  /** Presentation view over the state: revenue + derived average, cast to
    * double only after the exact decimal arithmetic (the sum is already
    * 2-dp exact; the average divides the exact sum in double, which is
    * deterministic given identical inputs in any engine).
    */
  def finalizeDaily(state: DataFrame): DataFrame =
    state.select(col("day"),
      col("rev_sum").cast("double").as("revenue"),
      col("n_orders"),
      round(col("rev_sum").cast("double") / col("n_orders"), 4).as("avg_order"))
}
