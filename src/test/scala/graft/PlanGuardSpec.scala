package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Plan-shape regression guards: the scale properties this engine claims
  * (pushdown reaching the scan, single-exchange compositions, broadcast
  * only on bounded sides, exchange reuse on self-joins) are asserted on
  * the PHYSICAL plan, so a refactor that silently degrades a plan — an
  * extra shuffle, a lost filter pushdown, a broadcast that became a
  * cartesian — fails CI instead of surfacing as a 100x cliff at scale.
  *
  * Plans are inspected pre-execution (`sparkPlan`, before AQE re-planning)
  * because that is the shape Catalyst committed to from statistics alone —
  * the shape that decides scalability before any runtime rescue.
  */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = p.collect(pf)
    val nested = p.collect {
      // executedPlan = the adaptive node's CURRENT physical plan (post
      // EnsureRequirements); inputPlan would miss required exchanges
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
    }.flatten
    here ++ nested
  }

  private def shuffles(p: SparkPlan): Int =
    collectAll(p) { case s: ShuffleExchangeExec => s }.size

  test("p2_filter: predicate is pushed into the parquet scan") {
    val scans = collectAll(plan("p2_filter")) { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.exists(_.metadata.get("PushedFilters").exists(_.contains("GreaterThan"))),
      "filter must reach the scan as a pushed parquet predicate")
  }

  test("p7_projection: scan reads only the projected columns") {
    val scans = collectAll(plan("p7_projection")) { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.forall(_.requiredSchema.fieldNames.toSet ==
      Set("l_orderkey", "l_partkey", "l_shipdate")),
      "column pruning must reach the scan")
  }

  test("curate_corpus: exactly one shuffle (fingerprint repartition reused by the window)") {
    assert(shuffles(plan("curate_corpus")) == 1,
      "the window must reuse the fp repartition — a second exchange means the reuse broke")
  }

  test("j1/j2: bounded dims broadcast; fact side never shuffles") {
    for (q <- Seq("j1_left_join_2key", "j2_inner_join")) {
      val p = plan(q)
      assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
        s"$q must plan a broadcast hash join")
      assert(shuffles(p) == 0, s"$q must not shuffle the fact side")
    }
  }

  test("latest_view: scalar-subquery max is a broadcast, not a driver action") {
    // asserted on the pre-id view body: the surrogate-id step
    // (GlobalRowNumber) ends in an RDD boundary that hides the upstream
    // joins from the final query's plan
    val p = SparkEntry.latestViewBody(spark, dir).queryExecution.sparkPlan
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.size >= 2,
      "max-date row and dim side must both join as broadcasts")
  }

  test("dedup candidate self-joins are sort-merge (broadcastable sides would " +
    "materialize the corpus-sized stream twice)") {
    // asserted on the INLINE chains: the r11 memoized query entries are
    // LogicalRDD scans with no joins (plan-health lesson: guard the chain,
    // not the materialized artifact)
    val docs = Tables.documents(spark, dir)
    for ((n, df) <- Seq(
        "minhash" -> graft.ops.Dedup.minhashCandidates(docs),
        "simhash" -> graft.ops.Dedup.simhashCandidates(docs))) {
      val p = df.queryExecution.sparkPlan
      assert(collectAll(p) { case j: SortMergeJoinExec => j }.nonEmpty,
        s"$n chain must keep the merge-hinted self-join")
    }
  }

  test("per-doc aggregates ride the doc_id clustering: simhash plans no " +
    "second shuffle between tokenize and signature") {
    // one repartition(doc_id) + the final nothing — signature agg must not
    // introduce its own exchange
    val p = SparkEntry.queries("dedup_simhash")(spark, dir).queryExecution.sparkPlan
    assert(shuffles(p) == 1,
      "expected exactly the tokenStream repartition; signature agg must be shuffle-free")
  }

  test("sample_hash: pure narrow filter — zero shuffles") {
    assert(shuffles(plan("sample_hash")) == 0)
  }

  test("text analysis is scan-speed: zero shuffles") {
    for (q <- Seq("text_token_count", "text_quality", "text_langid", "text_fingerprint"))
      assert(shuffles(plan(q)) == 0, s"$q must stay a narrow projection")
  }

  test("split_assign stays narrow; pack_sequences shuffles once (per-shard window)") {
    assert(shuffles(plan("split_assign")) == 0)
    // the window's exchange is inserted by EnsureRequirements, so this one
    // is asserted on the executed (post-preparation) plan
    val packed = SparkEntry.queries("pack_sequences")(spark, dir)
      .queryExecution.executedPlan
    assert(shuffles(packed) == 1)
  }

  test("join-shaped corpus ops never plan a cartesian product") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // j11: the binned rewrite's whole purpose is turning the keyless
    // BETWEEN (which alone can only nested-loop) into a hash join on __bin
    // dedup_ngram_jaccard's query entry is a memoized LogicalRDD scan
    // since r11 — its chain is asserted inline below
    for (q <- Seq("decontaminate", "j8_interval_join", "j11_range_join")) {
      val p = plan(q)
      assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty,
        s"$q must not plan a cartesian product")
      assert(collectAll(p) { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
        s"$q must not plan a nested-loop join")
    }
    val ngram = graft.ops.Dedup.ngramJaccardPairs(Tables.documents(spark, dir))
      .queryExecution.sparkPlan
    assert(collectAll(ngram) { case c: CartesianProductExec => c }.isEmpty &&
      collectAll(ngram) { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      "ngram chain must not plan a cartesian/nested-loop join")
    // text_tfidf's single-row corpus-count cross join is the ONE sanctioned
    // nested-loop: build side is exactly one row by construction
    val tfidf = plan("text_tfidf")
    assert(collectAll(tfidf) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("text_repetition and text_pii_redact stay narrow: zero shuffles") {
    for (q <- Seq("text_repetition", "text_pii_redact"))
      assert(shuffles(plan(q)) == 0, s"$q must run at scan speed")
  }

  test("text_chunk: tokenize-explode-slice stays narrow — zero shuffles") {
    assert(shuffles(plan("text_chunk")) == 0)
  }

  test("events_funnel: whole funnel rides ONE data shuffle") {
    // executed plan: window/agg exchanges come from EnsureRequirements.
    // Expected: 1 user_id exchange feeding windows + per-user collapse,
    // plus the single-row final-aggregate exchange (constant-size).
    val p = SparkEntry.queries("events_funnel")(spark, dir)
      .queryExecution.executedPlan
    assert(shuffles(p) == 2, "one user_id exchange + the 1-row final agg")
    // the three stage windows and the per-user aggregate must NOT each
    // re-exchange: count Window operators sharing that single exchange
    import org.apache.spark.sql.execution.window.WindowExec
    assert(collectAll(p) { case w: WindowExec => w }.size == 3)
  }

  test("sample_stratified: rank and stratum-count windows share one exchange") {
    val p = SparkEntry.queries("sample_stratified")(spark, dir)
      .queryExecution.executedPlan
    assert(shuffles(p) == 1)
  }

  test("q3/q5 composites: filters reach the scans, top-N is TakeOrdered, no cartesian") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val q3 = plan("q3_shipping_priority")
    // the whole top-10 must be a TakeOrderedAndProject (only k rows leave
    // each partition), never a global sort
    assert(collectAll(q3) { case t: TakeOrderedAndProjectExec => t }.nonEmpty)
    val pushed = collectAll(q3) { case s: FileSourceScanExec => s }
      .flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("c_mktsegment,BUILDING") &&
      pushed.contains("o_orderdate") && pushed.contains("l_shipdate"),
      s"selective predicates must reach the parquet scans: $pushed")
    assert(collectAll(plan("q5_local_supplier")) {
      case c: CartesianProductExec => c }.isEmpty)
  }

  test("q6_forecast_revenue: every predicate and the 2-column projection reach the scan") {
    val p = plan("q6_forecast_revenue")
    val scans = collectAll(p) { case s: FileSourceScanExec => s }
    assert(scans.size == 1)
    val pushed = scans.head.metadata.get("PushedFilters").mkString
    assert(pushed.contains("l_discount") && pushed.contains("l_quantity") &&
      pushed.contains("l_shipdate"),
      s"all three selective predicates must push: $pushed")
    val read = scans.head.metadata.get("ReadSchema").mkString
    assert(!read.contains("l_orderkey") && !read.contains("l_returnflag"),
      s"scan must read only the referenced columns: $read")
  }

  test("j10_bucketed_join: the merge join consumes bucket layout — no exchange, no sort below it") {
    val p = plan("j10_bucketed_join")
    val smj = collectAll(p) { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"expected a sort-merge join:\n$p")
    // everything below the join must be scan-only: the bucketed+sorted
    // layout satisfies both the partitioning and the ordering requirement
    val below = smj.head.children.map(_.toString).mkString
    assert(!below.contains("Exchange"),
      s"bucketed sides must not re-shuffle:\n$below")
    assert(!below.contains("Sort "),
      s"sortBy'd buckets must not re-sort:\n$below")
  }

  test("w7_topn_per_group: rank filter becomes WindowGroupLimit below the exchange") {
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val p = plan("w7_topn_per_group")
    val limits = collectAll(p) { case w: WindowGroupLimitExec => w }
    assert(limits.nonEmpty,
      s"rnk <= k must plan as WindowGroupLimit (each task keeps k rows per " +
        s"group pre-shuffle), got:\n$p")
    // partial mode runs BEFORE the exchange: the shuffle carries O(groups*k)
    assert(limits.exists(_.mode.toString.contains("Partial")),
      s"expected a Partial WindowGroupLimit below the exchange:\n$limits")
  }

  test("text_keywords: the rank filter plans a Partial WindowGroupLimit") {
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val p = plan("text_keywords")
    val limits = collectAll(p) { case w: WindowGroupLimitExec => w }
    assert(limits.exists(_.mode.toString.contains("Partial")),
      s"per-doc top-k must keep k rows per doc below the exchange:\n$p")
  }

  test("snapshot_diff: one full-outer sort-merge join, no cartesian") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val p = plan("snapshot_diff")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q1_pricing_summary: partial aggregation collapses the scan before the exchange") {
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val p = plan("q1_pricing_summary")
    // two HashAggregates (partial below / final above) around exactly one
    // exchange: the map side reduces 600k rows to 6 per task, so the
    // shuffle is O(tasks x groups) at any scale
    assert(collectAll(p) { case a: HashAggregateExec => a }.size == 2,
      s"expected partial+final hash aggregate:\n$p")
    assert(shuffles(p) <= 1)
  }

  test("q4/q18: EXISTS and HAVING-IN plan as semi joins — no order row duplicates") {
    val plans = Seq("q4_priority_exists", "q18_large_orders").map(q => q -> plan(q))
    for ((q, p) <- plans)
      assert(p.toString.contains("LeftSemi"),
        s"$q must reduce orders through a left-semi join:\n$p")
  }

  test("q19_disjunctive: per-side disjunction arms reach both scans") {
    val p = plan("q19_disjunctive")
    val pushed = collectAll(p) { case s: FileSourceScanExec => s }
      .flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("p_brand") && pushed.contains("l_quantity"),
      s"brand arms must push to part, quantity arms to lineitem: $pushed")
  }

  test("q22_idle_customers: idleness is a left-anti join on the date-pruned order scan") {
    val p = plan("q22_idle_customers")
    assert(p.toString.contains("LeftAnti"),
      s"q22 must plan the NOT EXISTS as a left-anti join:\n$p")
    val pushed = collectAll(p) { case s: FileSourceScanExec => s }
      .flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("o_orderdate"),
      s"the idleness date filter must reach the orders scan: $pushed")
  }

  test("q20_excess_stock: semi joins at both levels, pushed dates, no cartesian") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val p = plan("q20_excess_stock")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty
      && collectAll(p) { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      s"the correlated subquery must decorrelate to keyed joins:\n$p")
    assert(p.toString.contains("LeftSemi"),
      s"part filter and supplier qualification must plan as semi joins:\n$p")
    val pushed = collectAll(p) { case s: FileSourceScanExec => s }
      .flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("l_shipdate"),
      s"stock/demand year windows must reach the lineitem scans: $pushed")
  }

  test("sim_topk_pq: codebook and distance table broadcast; no cartesian") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val p = plan("sim_topk_pq")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    assert(collectAll(p) { case b: BroadcastNestedLoopJoinExec => b }.isEmpty)
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "ADC lookup must be a broadcast hash join")
  }

  test("incr_join_maintain: all three delta terms broadcast the delta side") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val p = plan("incr_join_maintain")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    // dA⋈B_old, A_old⋈dB, dA⋈dB each carry an explicit broadcast hint:
    // the standing sides must never shuffle for the delta terms
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.size >= 3,
      s"the delta rule's three terms must be broadcast hash joins:\n$p")
  }

  test("maint_reconcile: dirty-bucket pruning is a broadcast semi join " +
    "on both sides") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val p = plan("maint_reconcile")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    val semis = collectAll(p) {
      case b: BroadcastHashJoinExec if b.joinType.sql == "LEFT SEMI" => b
    }
    assert(semis.size >= 2,
      s"each replica must be semi-filtered by the broadcast dirty set:\n$p")
  }

  test("hier_rollup: closure rounds and rollup stay keyed (no cartesian)") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val p = plan("hier_rollup")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    assert(collectAll(p) { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      s"pointer jumping must plan equi-joins only:\n$p")
  }

  test("rec_user_topn: ownership exclusion is an anti join; no cartesian " +
    "or nested loop anywhere in the CF chain") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // the QUERY entry serves the memoized materialized artifact (a
    // LogicalRDD scan — trivially join-free), so the plan-health contract
    // is asserted on the CHAIN that builds the artifact
    val p = graft.ops.Recommend.recommendItems(
      Tables.lineitem(spark, dir), Tables.orders(spark, dir))
      .queryExecution.sparkPlan
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    assert(collectAll(p) { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      s"item-CF must be equi-joins only:\n$p")
    val antis = collectAll(p) {
      case b: BroadcastHashJoinExec if b.joinType.sql == "LEFT ANTI" => b
      case s: SortMergeJoinExec if s.joinType.sql == "LEFT ANTI" => s
    }
    assert(antis.nonEmpty, s"owned items must be excluded by an anti join:\n$p")
  }

  test("events_pit_labels: both sides prune on the ts predicate at the scan") {
    val p = plan("events_pit_labels")
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty)
    // the cutoff must reach the source as a data filter on ts (two scans,
    // each with a pushed timestamp bound) - the 100 TB partition-pruning
    // contract
    val scans = collectAll(p) { case f: FileSourceScanExec => f }
    assert(scans.size >= 2 && scans.forall(
      _.dataFilters.exists(_.references.exists(_.name == "ts"))),
      s"feature and label scans must carry the ts bound:\n$p")
  }
}
