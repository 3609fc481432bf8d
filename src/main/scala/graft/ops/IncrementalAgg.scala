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

  /** Presentation view over the state: revenue + the derived 4-dp average.
    *
    * The average is rounded HALF-UP in pure integer arithmetic, never via
    * `round(double, 4)`: a 2-dp-exact sum divided by n can land exactly on
    * a .00005 tie (e.g. 2116123.53 / 8 = 264515.44125), and engines then
    * disagree — Spark's `Round` does BigDecimal HALF_UP on the shortest
    * decimal rendering of the double and rounds the tie up, while engines
    * that round the raw binary double (which sits one ulp below the tie)
    * round it down. Integer fixed point sidesteps the double entirely:
    * with cents = sum×100 exact in BIGINT, the half-up 4-dp quotient is
    *   avg_e4 = (cents×200 + n) div (2n)
    * — identical in any engine, and ≤2⁵³ for any realistic group sum, so
    * the final avg_e4 / 1e4 double presentation is bit-identical too.
    * (Holds for the non-negative sums of a revenue fact; for signed sums
    * the `div` truncation-vs-floor convention would need pinning first.)
    */
  def finalizeDaily(state: DataFrame): DataFrame =
    state.select(col("day"),
      col("rev_sum").cast("double").as("revenue"),
      col("n_orders"),
      (expr("(CAST(rev_sum * 100 AS BIGINT) * 200 + n_orders) DIV (2 * n_orders)")
        .cast("double") / lit(10000.0)).as("avg_order"))

  /** Delta rule for an INSERT-only inner equi-join view — the join sibling
    * of the aggregate partials above. For V = A ⋈ B and insert batches
    * ΔA, ΔB:
    *
    *   ΔV = (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    *
    * and V' = V_old ∪ ΔV. The three terms are disjoint by construction
    * (each row of V' joins an A-row and a B-row that are each either old
    * or delta, and old/delta partition each input), so the union needs no
    * dedup.
    *
    * Scale story: V_old is a STORED table — maintaining it costs only the
    * three delta terms, and each term has a delta input that is small by
    * definition (a day's arrivals against a 100 TB standing side). Both
    * delta sides are broadcast here, so the two big-side terms are
    * broadcast-hash joins that never shuffle A_old or B_old, and the
    * ΔA ⋈ ΔB term is delta-sized on both sides. Full recompute rescans
    * and reshuffles 100 TB per batch; the delta rule touches
    * O(|ΔA| + |ΔB|) plus one pass over each standing side's scan — and
    * with the standing sides bucketed on the join key, not even that.
    *
    * Inputs must share no column names across A and B (pre-project).
    */
  /** Per-group top-k of RECORDS by a deterministic sort — and, because
    * record-selection top-k is a monoid under union-then-truncate
    * (topK(topK(A) ∪ topK(B)) = topK(A ∪ B), unlike top-k by re-aggregated
    * measure), the same function IS the incremental maintenance rule: keep
    * the O(groups·k) top-k table as standing state, topK each delta batch,
    * union and re-truncate. At 100 TB a batch touches O(batch) + the state
    * — the corpus is never rescanned.
    *
    * `orderCols` must totally order records within a group (include a
    * unique tiebreak) or the selection is nondeterministic.
    */
  def topK(df: DataFrame, partCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column], k: Int): DataFrame = {
    require(k >= 1, s"topK: k=$k below 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols: _*)
    df.drop("rank")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  def joinDelta(
      aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      key: String): DataFrame = {
    val newAgainstOld = broadcast(aDelta).join(bOld, key)
    val oldAgainstNew = aOld.join(broadcast(bDelta), key)
    val newAgainstNew = broadcast(aDelta).join(bDelta, key)
    newAgainstOld.unionByName(oldAgainstNew).unionByName(newAgainstNew)
  }
}
