package graft

/** Whole-surface rounding-tie guard: the correctness gate compares doubles
  * after rounding, and `round(double, k)` is ENGINE-DEPENDENT at exact
  * decimal ties — a rational whose lowest-terms denominator divides
  * 10^(k+1) but not 10^k renders as a digit string ending in 5, where
  * Spark's decimal-string HALF_UP and an engine rounding the raw binary
  * double (one ulp off the tie) disagree by 10^-k. `incr_agg_merge` spent
  * rounds 6–7 red on exactly this.
  *
  * Every round-over-division in the oracle SQL surface must therefore be
  * either (a) converted to exact integer fixed point
  * ([[graft.functions.ExactRatio]] / `(2·n·10^k + d) // (2d)`), or
  * (b) REVIEWED into the allowlist below with the reason the tie class is
  * unreachable. A new query that rounds a division lands here before it
  * can land in CORRECTNESS as a one-in-a-fixture hash flake.
  */
class RoundingTieSpec extends SparkSpec {

  /** Queries whose oracle SQL still contains round( .. / .. ) — each with
    * the reviewed reason the exact-decimal-tie class cannot occur. The
    * recurring safe patterns:
    *  - IRRATIONAL: the rounded value passes through ln/log/sqrt/pow(.5)
    *    or similar, so it is never an exact 7-dp decimal; a tie would
    *    need the computed double within half an ulp of one (~1e-10/value
    *    chance, and BOTH engines compute the identical double).
    *  - NON-EXACT WEIGHTS: multiplied by binary-inexact decimal literals
    *    (0.4/0.3 quality weights), same argument.
    *  - DOUBLE SUM: numerator is a sum of arbitrary doubles (prices,
    *    event values) — not decimal-exact, same argument.
    *  - SAFE DENOMINATOR: denominator's prime factors make the decimal
    *    terminate within k digits (e.g. /16 at 4 dp) or never terminate
    *    at k+1 (e.g. /97, /7 — coprime to 10), so the tie digit string
    *    cannot arise.
    */
  private val CosineReason =
    "IRRATIONAL: cosine scores divide by sqrt L2 norms"

  private val reviewedDoubleRound: Map[String, String] = Map(
    "corpus_drift" -> "IRRATIONAL: JSD terms pass through ln",
    "corpus_stats" -> "NON-EXACT WEIGHTS: 0.4/0.3 quality composite",
    "curate_corpus" -> "NON-EXACT WEIGHTS: quality composite",
    "curate_curriculum" -> "NON-EXACT WEIGHTS: quality composite",
    "curate_dataset_card" -> ("NON-EXACT WEIGHTS: mean quality; " +
      "median is quantile interpolation (DOUBLE SUM class)"),
    "curate_token_budget" -> "NON-EXACT WEIGHTS: quality composite",
    "dedup_minhash_est" -> ("SAFE DENOMINATOR: matches/16 terminates " +
      "at 4 dp, so round(.,6) is the identity"),
    "dq_benford" -> ("IRRATIONAL: p_exp and abs_dev pass through " +
      "log10 (p_obs itself is exact fixed point)"),
    "embedding_outliers" -> "IRRATIONAL: z-score over stddev (sqrt)",
    "events_anomaly" -> "DOUBLE SUM: MAD via quantile interpolation",
    "events_ltv" -> "DOUBLE SUM: revenue sums of arbitrary doubles",
    "feat_psi" -> ("IRRATIONAL: psi_term passes through ln " +
      "(the share columns are exact fixed point)"),
    "feat_robust_scale" -> "DOUBLE SUM: median/MAD interpolation",
    "feat_standardize" -> "IRRATIONAL: stddev (sqrt)",
    "feat_target_encode" -> "DOUBLE SUM: sum of event values",
    "feat_target_encode_cv" ->
      "DOUBLE SUM: sum of event values (same class, out-of-fold cells)",
    "feat_woe_binning" -> "IRRATIONAL: ln odds ratios",
    "graph_degrees" -> "IRRATIONAL: Hill alpha passes through ln",
    "mix_temperature" -> ("IRRATIONAL: tempered columns pass through " +
      "pow(., 0.5) (raw_share is exact fixed point)"),
    "multimodal_batch_embed" -> ("SAFE DENOMINATOR: /97 is coprime to " +
      "10 — the decimal never terminates, no exact tie exists"),
    "prepare_training_set" -> "NON-EXACT WEIGHTS: quality composite",
    "q17_small_quantity" -> "DOUBLE SUM: price sum / 7.0",
    "q2_min_cost_supplier" -> "DOUBLE SUM: avg of double quotients",
    "retrieval_rank_fusion" -> ("IRRATIONAL: bm25 pool passes through " +
      "ln (the rrf column is exact fixed point)"),
    "sample_weighted" -> "NON-EXACT WEIGHTS: quality composite",
    "sim_recall_report" -> ("recall is exact fixed point; remaining " +
      "round-over-division is the IVF cosine scoring (IRRATIONAL: sqrt)"),
    "sim_recall_report_mips" -> ("recall is exact fixed point; remaining " +
      "round-over-division is the augmented assignment cosine " +
      "(IRRATIONAL: sqrt); published ip rounds with NO division"),
    "sim_topk_sq8" -> "IRRATIONAL: dequantized cosine via sqrt norms",
    "sim_sq8_error" -> ("SAFE QUANTIZER ROUND: round((x-mn)*255/span) is " +
      "the quantizer itself, evaluated on IDENTICAL doubles by both " +
      "engines (mirrored from the certified sim_topk_sq8 oracle); a " +
      "divergence needs the true value within 1 ulp of x.5 where the " +
      "span is a float difference — never an exact decimal; downstream " +
      "error columns are e6-FLOORED integers, not rounded"),
    "stat_chi_square" -> "DOUBLE SUM: chi2 terms are double products",
    "stat_gini" -> "DOUBLE SUM: sums of arbitrary event values",
    "stat_jackknife" -> "DOUBLE SUM: block sums of arbitrary doubles",
    "stat_lorenz" -> "DOUBLE SUM: value sums of arbitrary doubles",
    "stat_mutual_info" -> "IRRATIONAL: MI terms pass through ln",
    "text_bm25" -> "IRRATIONAL: ln IDF",
    "retrieval_wand" -> "IRRATIONAL: ln IDF (same exact-BM25 oracle shape)",
    "text_entropy" -> "IRRATIONAL: ln",
    "text_hashing_embed" -> "IRRATIONAL: L2 norm (sqrt)",
    "text_keywords" -> "IRRATIONAL: ln IDF",
    "text_lm_score" -> "IRRATIONAL: ln probabilities",
    "text_quality" -> ("NON-EXACT WEIGHTS: the composite; stop_ratio/" +
      "distinct_ratio are exact fixed point"),
    "text_readability" -> ("NON-EXACT WEIGHTS: Flesch/FK multipliers " +
      "(1.015, 84.6, 0.39, 11.8) are binary-inexact"),
    "text_tfidf" -> "IRRATIONAL: ln IDF",
    "mix_plan" -> ("NON-EXACT WEIGHTS: 0.025 target share literal is " +
      "binary-inexact"),
    "mix_apply" -> ("NON-EXACT WEIGHTS: sample_rate is mix_plan's " +
      "binary-inexact share arithmetic (same CTE)"),
    "curate_epoch_plan" -> ("NON-EXACT WEIGHTS: epochs divides the " +
      "binary-inexact share x 0.5-budget product"),
    "q14_promo_revenue" -> "DOUBLE SUM: price sums",
    "q8_market_share" -> "DOUBLE SUM: volume sums",
    "stat_ab_delta" -> ("DOUBLE SUM: user value sums feed the ratio " +
      "and delta-method variance"),
    "stat_ks" -> "IRRATIONAL: p-value passes through exp",
    "stat_spearman" -> ("IRRATIONAL: rho divides by sqrt rank variances " +
      "(the five sufficient statistics are exact BIGINT)"),
    "graph_assortativity" -> ("IRRATIONAL: r divides by sqrt degree " +
      "variances (sufficient statistics exact BIGINT)"),
    "dedup_tfidf_pairs" -> ("IRRATIONAL: cosine over sqrt norms of " +
      "quantized-idf weights (dots and norms exact BIGINT)"),
    "ts_ewma" -> "IRRATIONAL: (1-alpha)^j kernel weights",
    "ts_twa" -> ("DOUBLE SUM: value x duration products are arbitrary " +
      "doubles (the weights themselves are exact BIGINT micros)"),
    "eval_mrr" -> (CosineReason + " (MRR itself is exact fixed point " +
      "over 2520)"),
    "eval_ndcg" -> (CosineReason + " (DCG/IDCG are exact BIGINT sums " +
      "of the e6 weight table)"),
    "dedup_embedding" -> CosineReason,
    "dedup_embedding_adaptive" -> CosineReason,
    "dedup_embedding_lsh" -> CosineReason,
    "dedup_semantic" -> CosineReason,
    "retrieval_range_search" -> CosineReason,
    "sim_hard_negatives" -> CosineReason,
    "sim_knn_classify" -> CosineReason,
    "sim_topk_agg" -> CosineReason,
    "sim_topk_brute" -> CosineReason,
    "sim_topk_ivf" -> CosineReason,
    "sim_topk_ivf_adaptive" -> CosineReason,
    "sim_topk_ivf_hier" -> CosineReason,
    "sim_topk_ivf_kmeans" -> CosineReason,
    "sim_topk_ivf_mp" -> CosineReason,
    "sim_topk_ivf_persisted" -> CosineReason,
    "sim_topk_ivfpq" -> CosineReason,
    "sim_topk_ivfpq_rerank" -> CosineReason,
    // assignment cosine divides by mx*mx (mx via sqrt); the published
    // ip column is round(dot, 6) with NO division
    "sim_topk_mips_ivf" -> CosineReason)

  /** Extract every round(...) argument (balanced parens) from a SQL
    * string and keep those containing a division. `//` (already-exact
    * integer division) does not count; `/` does.
    */
  private def roundOverDivision(sql: String): Seq[String] = {
    val spans = Seq.newBuilder[String]
    var i = sql.indexOf("round(")
    while (i >= 0) {
      var depth = 0
      var j = i + "round(".length
      val sb = new StringBuilder
      var done = false
      while (j < sql.length && !done) {
        val c = sql.charAt(j)
        if (c == '(') depth += 1
        else if (c == ')') { if (depth == 0) done = true else depth -= 1 }
        if (!done) { sb.append(c); j += 1 }
      }
      val arg = sb.toString
      if (arg.replace("//", "").contains("/")) spans += arg
      i = sql.indexOf("round(", j)
    }
    spans.result()
  }

  test("every oracle round-over-division is reviewed or exact") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val spans = roundOverDivision(sql)
        if (spans.nonEmpty && !reviewedDoubleRound.contains(name))
          Some(s"$name: round over division without review: " +
            spans.head.take(80))
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("allowlist carries no dead entries") {
    val withDivision = SparkEntry.oracleSql.filter {
      case (_, sql) => roundOverDivision(sql).nonEmpty
    }.keySet
    val dead = reviewedDoubleRound.keySet -- withDivision
    assert(dead.isEmpty,
      s"reviewed entries whose oracle no longer rounds a division: " +
        s"${dead.toSeq.sorted.mkString(", ")}")
  }

  test("ExactRatio rounds the canonical tie half-up in pure integers") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 5/128 = 0.0390625 — a true 6-dp tie (the class round(double, 6)
    // gets wrong across engines); half-up says 0.039063 (not ...062)
    val out = Seq((5L, 128L), (1L, 3200L), (1L, 3L), (7L, 8L))
      .toDF("n", "d")
      .select(graft.functions.ExactRatio.exactRatio(col("n"), col("d"), 6)
        .as("r")).as[Double].collect().toSeq
    assert(out == Seq(0.039063, 0.000313, 0.333333, 0.875))
  }
}
