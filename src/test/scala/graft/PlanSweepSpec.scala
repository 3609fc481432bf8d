package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Whole-surface plan sweep: EVERY named query's physical plan is built
  * and screened for the two shapes that are never acceptable unreviewed —
  * cartesian products and nested-loop joins. Per-query guards
  * (PlanGuardSpec) pin specific good shapes; this net catches a future
  * query added WITHOUT a guard whose join degenerates silently.
  */
class PlanSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries with a REVIEWED nested-loop whose build side is bounded by
    * construction or guarded at build time:
    *  - 1-row corpus-count / codebook broadcasts (text_tfidf, sim_topk_sq8,
    *    skew_hot_keys' share denominator, dq_check's FK n_checked,
    *    corpus_drift's distribution totals);
    *  - the intentional tiny-axes geometry cross join (j3);
    *  - centroid/plane attachments: every vector x a BOUNDED broadcast
    *    (16 centroids, 32 hyperplanes) — the designed IVF/LSH assignment
    *    fan-out (dedup_embedding, dedup_embedding_lsh, embedding_outliers,
    *    sim_topk_ivf*);
    *  - non-equi scoring against a query set that passes
    *    Broadcasting.checkedOrFail, which throws rather than broadcast an
    *    unbounded side (sim_topk_brute, sim_topk_agg).
    */
  private val reviewedNestedLoop = Set(
    "text_tfidf", "j3_cross_join", "sim_topk_sq8", "corpus_stats", "mix_plan",
    // mix_apply composes mix_plan's rate CTE: the same 1-row n_total
    // broadcast cross join (the corpus-side join is a broadcast equi)
    "mix_apply",
    // epoch plan: the same 1-row total-tokens broadcast cross join
    "curate_epoch_plan",
    "skew_hot_keys",
    "dedup_embedding", "dedup_embedding_adaptive", "dedup_embedding_lsh",
    "embedding_outliers",
    "sim_topk_brute", "sim_topk_agg", "sim_topk_ivf", "sim_topk_ivf_kmeans",
    // MIPS shares the brute scorers' non-equi checkedOrFail query join
    "sim_topk_mips",
    // mips-ivf: the reviewed broadcast centroid fan-out (assignment)
    // plus a 1-row max-norm broadcast for the augmentation coordinate
    "sim_topk_mips_ivf",
    "sim_hard_negatives",
    "sim_topk_ivf_mp", "sim_topk_ivf_persisted", "dq_check", "corpus_drift",
    // q22's wealth threshold: customer x a 1-row global-average broadcast
    "q22_idle_customers",
    // bm25's corpus stats (avgdl, n_docs): a 1-row broadcast
    "text_bm25",
    // WAND: the same 1-row (avgdl, n_docs) stats broadcast plus a 1-row
    // theta broadcast onto the per-doc upper-bound table
    "retrieval_wand",
    // ivfpq's centroid attachment: the same bounded 16-centroid fan-out
    // as the rest of the IVF family
    "sim_topk_ivfpq",
    // ladder/two-level variants: the same broadcast centroid fan-out,
    // cell count bounded by the CellLadder (≤ 65536 rows broadcast)
    "sim_topk_ivf_adaptive", "sim_topk_ivf_hier",
    // composes ivfPqTopK (reviewed centroid fan-out above); the exact
    // re-rank tail is all equi-joins over the O(queries·depth) shortlist
    "sim_topk_ivfpq_rerank",
    // q11's global-share threshold: a 1-row broadcast over the value
    // table's re-aggregation
    "q11_important_stock",
    // skyline's bucket bounds: a 1-row (xmin, xmax) broadcast onto the
    // distinct-x aggregate
    "q_skyline",
    // basket lift's denominator: a 1-row basket-count broadcast
    "assoc_basket_pairs",
    // KMV rollup's ALL row: 1-row exact-count broadcast onto the merged
    // (single-row) sketch
    "sketch_kmv_distinct",
    // MG heavy hitters: the N/(k+1) cutoff joins a 1-row n_total
    // broadcast onto the <= k-group verified aggregate
    "sketch_mg_heavy",
    // maintained variant: same 1-row n_total broadcast, plus the 1-row
    // prune-cut broadcast onto the <= 2k-row merged summary
    "incr_mg_maintain",
    // bias baseline: the 1-row global-mean broadcast crosses the fact
    // rows (cheap constant attach) and the per-user bias table
    "rec_bias_model",
    // user read-out: the same 1-row global-mean broadcast cross
    "rec_bias_users",
    // CV target encoding: 1-row global-total broadcast onto the
    // O(categories x folds) cell table
    "feat_target_encode_cv",
    // DP quantile: 1-row (n, t) and 1-row W-total broadcasts onto the
    // <= |domain| (50-row) candidate table
    "dp_quantile_release",
    // maintained quantile sketch: 1-row n_rows and 1-row exact-cert
    // broadcasts onto the single merged-sample row
    "incr_quantile_maintain",
    // HLL rollup's ALL row: same reviewed 1-row exact-count broadcast onto
    // the merged (single-row) register sketch as sketch_kmv_distinct
    "sketch_hll_distinct",
    // zone-map study: 1-row bounds broadcast onto the bucket pass, 3-row
    // probe-list broadcasts onto the O(blocks) stats tables, 1-row totals
    // — every nested-loop side bounded by construction
    "maint_zonemap_prune",
    // HITS: each half-step's L1 total is a 1-row broadcast onto the
    // O(nodes) score table (the pageRank-family normalization shape)
    "graph_hits",
    // vocab growth: 1-row max-doc broadcast into the 10-row decile table,
    // which broadcasts onto the O(vocab)/O(docs) aggregates
    "corpus_vocab_growth",
    // join-size estimate: the 1-row CMS estimate crossed with the 1-row
    // exact-count certificate
    "sketch_join_size",
    // linkage evaluation: the 1-row n_truth denominator broadcast onto
    // the 1-row match/possible aggregate
    "link_eval",
    // permutation test: the 1-row observed-statistic broadcast onto the
    // O(perms)=64-row null-distribution table
    "stat_permutation",
    // FDR screen: the 1-row group-count broadcast onto the O(groups)
    // per-group statistic table
    "stat_fdr",
    // profile drift: the two 1-row snapshot profiles crossed
    "dq_profile_drift",
    // Krippendorff alpha: the 1-row Do census crossed with the 1-row
    // De census (the kappa-family stats composition)
    "label_krippendorff",
    // triangle census: the final stats row composes 1-row aggregates
    "graph_triangles",
    // modularity: the same 1-row stats composition (M, e_in onto the
    // 1-row community-census aggregate)
    "graph_modularity",
    // coverage audit: three 1-row aggregates (slots, max exposure,
    // catalog size) composed into the report row
    "rec_coverage",
    // method agreement: per method pair, three 1-row set-size aggregates
    // composed into the census row
    "dedup_method_agreement",
    // A-priori support threshold: a 1-row min_sup broadcast
    "assoc_frequent_triples",
    // contingency-total attachment: a 1-row sum(nxy) broadcast onto the
    // O(|X|x|Y|) joint table
    "stat_mutual_info", "stat_chi_square",
    // temperature mix normalizer: a 1-row (n_total, z) broadcast onto the
    // O(#sources) count table
    "mix_temperature",
    // nucleus cutoff denominator: a 1-row token-mass broadcast onto the
    // O(vocab) count table
    "vocab_top_p",
    // dedup_embedding's bounded 16-centroid attachment, reused by the
    // semantic-dedup composition
    "dedup_semantic",
    // shuffle pre-flight: the 1-row totals and the 1-row hot-key argmin
    // composed into the report row
    "skew_salt_plan",
    // SQ8 audit: the same 1-row (mns, spans) codebook broadcast as
    // sim_topk_sq8, attached to every vector before the error explode
    "sim_sq8_error",
    // same bounded 16-centroid broadcast, radius-query variant
    "retrieval_range_search",
    // bm25's 1-row corpus-stats broadcast inside the fused lexical pool
    "retrieval_rank_fusion",
    // 1-row corpus-size broadcast onto the O(vocab) df table
    "retrieval_stopwords",
    // brute-family scorer: bounded query-set broadcast, non-equi scored join
    "sim_knn_classify",
    // 1-row global-prior broadcast onto the O(categories) encoding table
    "feat_target_encode",
    // 1-row quantile-bounds + 1-row totals broadcasts
    "feat_woe_binning",
    // 1-row destination-set-size broadcast onto the O(types^2) cell table
    "events_markov",
    // composes the brute scorer (bounded query-set broadcast) with the
    // IVF scorer's 16-centroid fan-out
    "sim_recall_report",
    // same composition for the MIPS pair (exact anchor + augmented IVF)
    "sim_recall_report_mips",
    // text_tfidf's 1-row n_docs broadcast under the keyword rank window
    "text_keywords",
    // 1-row reference-date + quartile-bounds broadcasts onto O(users)
    "events_rfm",
    // 1-row block-totals broadcast onto the O(B) block table
    "stat_jackknife",
    // 1-row series-mean broadcast onto the O(days) daily table
    "events_changepoint",
    // 1-row Hill-alpha broadcast onto the O(degrees) histogram
    "graph_degrees",
    // 1-row first-digit total broadcast onto the 9-row digit histogram
    "dq_benford",
    // 1-row (n, total) broadcast onto the O(buckets) Lorenz table
    "stat_lorenz",
    // 1-row at-risk-total broadcast onto the O(event-times) risk table
    "stat_km_survival",
    // 1-row observation-horizon broadcast onto the O(users) snapshot
    "events_user_snapshot",
    // 1-row group-totals broadcast onto the O(distinct values) CDF table
    "stat_ks",
    // 1-row quantile-bounds + 1-row slice-totals broadcasts
    "feat_psi",
    // 1-row sketch frame x 1-row exact-certificate broadcast
    "sketch_kmv_overlap",
    // two 1-row broadcasts: the global row-count onto the (single-row)
    // merged ALL sample, and the same count onto the GlobalRowNumber-
    // ranked exact-certificate scan — both bounded attachments
    "sketch_sample_quantile",
    // t-closeness grid: groups x BROADCAST(sensitive-value domain —
    // bounded by the domain, never by data) plus a 1-row (N, m) totals
    // broadcast
    "dq_t_closeness",
    // composes the brute scorer (bounded query-set broadcast, non-equi
    // scored join) — the metric tail is all equi-joins
    "eval_mrr",
    // same brute-scorer composition; DCG/IDCG tail is all equi-joins
    "eval_ndcg",
    // Theil-Sen pair expansion: nested loop over the BOUNDED day table
    // (O(days²) from the day domain, never data-sized)
    "ts_theil_sen",
    // collocation lift: the 1-row bigram-total broadcast
    "text_collocations",
    // attribution share denominators: the 1-row total-credit broadcast
    "events_attr_linear", "events_attr_ushaped",
    // tf-idf rescoring: the 1-row pool-size broadcast under the df cap
    "dedup_tfidf_pairs")

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = p.collect(pf)
    val nested = p.collect {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
    }.flatten
    here ++ nested
  }

  test("no query plans an unreviewed cartesian product or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, dir).queryExecution.sparkPlan
          catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        val cart = collectAll(plan) { case c: CartesianProductExec => c }
        val bnlj = collectAll(plan) { case b: BroadcastNestedLoopJoinExec => b }
        val bad =
          (if (cart.nonEmpty) Seq(s"$name: CartesianProduct") else Nil) ++
            (if (bnlj.nonEmpty && !reviewedNestedLoop(name))
              Seq(s"$name: BroadcastNestedLoopJoin") else Nil)
        bad
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
