package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ExactRatio.exactRatio

/** Categorical/numeric dependence statistics for corpus and feature
  * auditing: which columns carry information about which others — the
  * question behind leakage checks, feature selection, and stratification
  * design.
  *
  * Shared shape: ONE size-of-data grouped aggregate produces an
  * O(cardinality) contingency/moment table; every derived statistic is
  * arithmetic over that bounded table (broadcast joins only). Nothing
  * after the first exchange scales with the data.
  */
object Stats {

  /** Poisson(1) CDF boundaries c_k = e⁻¹·Σ_{j≤k} 1/j! for k = 0..8 — the
    * bootstrap-weight twin of [[Expectations.dpNoiseBoundaries]]: a
    * per-(row, replicate) weight is the count of boundaries below the
    * md5-seeded uniform, so both engines derive it from comparisons of
    * IDENTICAL double literals (no cross-engine factorials or exp at
    * query time). Truncation at k = 8 caps a draw at w = 9 with
    * P ≈ 1.1e-7 of hitting the cap — deterministic and mirrored, so it
    * biases both engines identically and the certified values agree.
    */
  private[graft] val poissonBoundaries: Seq[Double] = {
    val e = math.exp(-1.0)
    (0 to 8).scanLeft(0.0) { (acc, k) =>
      acc + e / (1 to k).map(_.toDouble).product
    }.tail
  }

  /** [[poissonBoundaries]] as a SQL list literal at 17 significant digits
    * (full double round-trip — the [[Expectations.dpBoundarySql]]
    * rendering).
    */
  private[graft] def poissonBoundarySql: String = poissonBoundaries
    .map(d => java.lang.String.format(
      java.util.Locale.ROOT, "%.17g", Double.box(d)))
    .mkString("[", ", ", "]")

  /** Poisson bootstrap of the mean event value — the resampling CI that
    * survives 100 TB. The textbook bootstrap ("draw n rows with
    * replacement, B times") needs a coordinated global sample per
    * replicate; Poissonization replaces it with an INDEPENDENT
    * per-(row, replicate) weight w ~ Poisson(1) (the standard massive-data
    * streams formulation), so the whole bootstrap is one narrow pass:
    * explode B replicate indices per row, derive w from the md5-seeded
    * uniform against [[poissonBoundaries]], and partial-aggregate
    * map-side down to B groups — the exchange carries B rows per task,
    * never the corpus.
    *
    * Float-free until presentation: values are exact cents (the fixture's
    * 2-dp doubles scaled by 100 — both engines round the identical
    * product double), replicate sums are integers (per-row w·cents ≤
    * 9·10⁶; the BIGINT sum budget of ~9.2e18 needs > 1e12 rows per
    * replicate, loud under ANSI past it), and the mean presents via the
    * shared half-up exact-ratio form. Output: one row per replicate
    * (b, n_eff, boot_mean); percentile CIs are order statistics the
    * caller takes over the B rows.
    */
  def bootstrapMean(events: DataFrame, b: Int = 100): DataFrame = {
    val cents = round(col("value") * lit(100)).cast("long")
    val u = (conv(substring(md5(concat_ws("|",
        col("event_id").cast("string"), col("b").cast("string"))), 1, 12),
        16, 10).cast("long").cast("double") + lit(0.5)) /
      lit(281474976710656.0)
    val w = poissonBoundaries.map(c => when(u > lit(c), 1L).otherwise(0L))
      .reduce(_ + _)
    events.select(col("event_id"), cents.as("cents"))
      // explicit numbered round-robin BEFORE the ×B fan-out: the input is
      // bytes-small (a 2-column projection of events), so file splitting
      // gives it a handful of partitions and the B× md5 CPU below would
      // run near-serial — the eval_chrf under-parallelism class. A
      // REPARTITION_BY_NUM of the tiny pre-explode table buys full-width
      // parallelism for the expensive stage and is never AQE-coalesced.
      .repartition(events.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col("event_id"), col("cents"),
        explode(sequence(lit(0), lit(b - 1))).as("b"))
      .select(col("b"), w.as("w"), col("cents"))
      .groupBy("b")
      .agg(sum(col("w")).as("n_eff"),
        sum(col("w") * col("cents")).as("wsum_cents"))
      .select(col("b").cast("long").as("b"), col("n_eff"),
        exactRatio(col("wsum_cents"), col("n_eff") * lit(100L), 6)
          .as("boot_mean"))
  }

  /** Poisson bootstrap of an A/B DIFFERENCE in mean event value — the
    * form experimentation actually ships: arms are the deterministic md5
    * user split (the fdr/ab-test convention), weights and cent-exact sums
    * are [[bootstrapMean]]'s, and both arms' replicate sums come out of
    * ONE grouped aggregate (conditional sums, no self-join), so the plan
    * is still a single narrow pass with a B-row exchange. Means present
    * via the shared half-up exact ratio; `diff` is their engine-exact
    * double subtraction (identical operands both engines). Percentile CI
    * of the treatment effect = order statistics over the B diffs.
    */
  def bootstrapDiff(events: DataFrame, b: Int = 100): DataFrame = {
    val cents = round(col("value") * lit(100)).cast("long")
    val arm = pmod(conv(substring(md5(col("user_id").cast("string")), 1, 4),
      16, 10).cast("long"), lit(2))
    val u = (conv(substring(md5(concat_ws("|",
        col("event_id").cast("string"), col("b").cast("string"))), 1, 12),
        16, 10).cast("long").cast("double") + lit(0.5)) /
      lit(281474976710656.0)
    val w = poissonBoundaries.map(c => when(u > lit(c), 1L).otherwise(0L))
      .reduce(_ + _)
    val zero = lit(0L)
    events.select(col("event_id"), cents.as("cents"), arm.as("arm"))
      // pre-explode REPARTITION_BY_NUM: same under-parallelism fix as
      // bootstrapMean — the projection is bytes-small, the fan-out is not
      .repartition(events.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col("event_id"), col("arm"), col("cents"),
        explode(sequence(lit(0), lit(b - 1))).as("b"))
      .select(col("b"), col("arm"), w.as("w"), col("cents"))
      .groupBy("b")
      .agg(
        sum(when(col("arm") === 0, col("w")).otherwise(zero)).as("n_c"),
        sum(when(col("arm") === 0, col("w") * col("cents")).otherwise(zero))
          .as("s_c"),
        sum(when(col("arm") === 1, col("w")).otherwise(zero)).as("n_t"),
        sum(when(col("arm") === 1, col("w") * col("cents")).otherwise(zero))
          .as("s_t"))
      .select(col("b").cast("long").as("b"),
        col("n_c"), col("n_t"),
        exactRatio(col("s_c"), col("n_c") * lit(100L), 6).as("mean_c"),
        exactRatio(col("s_t"), col("n_t") * lit(100L), 6).as("mean_t"),
        (exactRatio(col("s_t"), col("n_t") * lit(100L), 6) -
          exactRatio(col("s_c"), col("n_c") * lit(100L), 6)).as("diff"))
  }

  /** Contingency table of two categorical columns with joint and marginal
    * probabilities attached — the common substrate of [[mutualInfo]] and
    * [[chiSquare]].
    *
    * One aggregate over the data (joint counts); marginals are re-aggregated
    * from the O(|X|·|Y|) joint table, NOT from the data again, and join back
    * broadcast. Null categories are excluded on both engines by
    * construction (a null key carries no dependence signal and DuckDB/Spark
    * disagree on null grouping order).
    */
  private def contingency(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("nxy"))
    val xm = joint.groupBy("x").agg(sum("nxy").as("nx"))
    val ym = joint.groupBy("y").agg(sum("nxy").as("ny"))
    val tot = joint.agg(sum("nxy").as("n"))
    joint
      .join(broadcast(xm), "x")
      .join(broadcast(ym), "y")
      .crossJoin(broadcast(tot))
  }

  /** Mutual information I(X;Y) in nats between two categorical columns:
    * sum over the joint support of p(x,y)·ln(p(x,y)/(p(x)p(y))).
    * Zero iff independent; the scale-free "does event_type predict
    * device" number. Single row out.
    */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame =
    contingency(df, xCol, yCol)
      .select(((col("nxy") / col("n")) *
        log((col("nxy") * col("n")) / (col("nx") * col("ny")))).as("term"))
      .agg(round(sum("term"), 6).as("mutual_info_nats"))

  /** Pearson chi-square statistic of independence over the same
    * contingency table: sum (observed − expected)²/expected with
    * expected = nx·ny/n, plus the degrees of freedom
    * (|X|−1)(|Y|−1) so the caller can look up a p-value. Cells absent
    * from the joint support are handled in closed form — expanding
    * (o−e)²/e and using Σo = Σe = n over the full grid collapses the
    * statistic to Σ(o²/e) − n, so the dense |X|×|Y| grid is never
    * materialized.
    */
  def chiSquare(df: DataFrame, xCol: String, yCol: String): DataFrame =
    contingency(df, xCol, yCol)
      .select(
        col("x"), col("y"), col("n"),
        (col("nxy").cast("double") * col("nxy") * col("n") /
          (col("nx") * col("ny"))).as("o2_over_e"))
      .agg(
        round(sum("o2_over_e") - first("n"), 6).as("chi_square"),
        ((countDistinct("x") - 1) * (countDistinct("y") - 1)).as("dof"))

  /** Pairwise Pearson correlation matrix over `cols` in ONE pass: all
    * k(k+1)/2 `corr` aggregates are fused into a single Aggregate
    * operator, so the data is scanned once regardless of k — the classic
    * "don't run k² corr() scans" formulation. Each pair keeps Spark's
    * numerically-stable co-moment accumulator (the same shifted-moment
    * scheme DuckDB's corr uses, so the 6-decimal parity holds where a
    * naive ΣxΣy expansion would cancel catastrophically).
    *
    * Output long form (col_x, col_y, corr), strict upper triangle —
    * derived from the one-row aggregate with a stack unpivot (O(k²)
    * rows of driver-free plan, no data motion).
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield (cols(i), cols(j))
    val aggs = pairs.zipWithIndex.map { case ((a, b), k) =>
      round(corr(col(a), col(b)), 6).as(s"c_$k")
    }
    val m = df.agg(aggs.head, aggs.tail: _*)
    val triples = pairs.zipWithIndex
      .map { case ((a, b), k) => s"'$a', '$b', c_$k" }.mkString(", ")
    m.select(expr(s"stack(${pairs.size}, $triples) AS (col_x, col_y, corr)"))
  }

  /** Per-group simple OLS of `yCol` on `xCol`: slope, intercept, and r²
    * from the numerically-stable co-moment aggregates (`covar_pop`,
    * `var_pop`, `corr` — the same shifted-moment accumulators DuckDB's
    * `regr_*` family uses, so 6-decimal parity holds). The per-group
    * trend-line primitive behind drift detection ("is quality declining
    * with document age in this source?") and metric forecasting.
    *
    * ONE partial-aggregable grouped pass over the data; every derived
    * statistic is arithmetic on the O(groups) moment table. Zero-variance
    * groups (vertical line) emit NULL slope/intercept rather than ±Inf —
    * same contract as [[Features.standardize]]'s zero-sigma rule. Rows
    * with a NULL in either column are excluded up front: Spark's corr
    * skips null PAIRS while count(*) would not, so the explicit filter
    * keeps `n` consistent with the moments on both engines.
    */
  def groupedOls(
      df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val m = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(
        count(lit(1)).as("n"),
        avg(col(xCol)).as("mx"), avg(col(yCol)).as("my"),
        covar_pop(col(yCol), col(xCol)).as("cxy"),
        stddev_pop(col(xCol)).as("sx"),
        stddev_pop(col(yCol)).as("sy"))
    // Pearson r spelled out as cxy/(sx·sy) instead of corr(): same
    // accumulators, but the when() guards keep ANSI mode from raising
    // DIVIDE_BY_ZERO on constant columns (corr's internal division has no
    // such escape) — degenerate groups emit NULL instead of killing the job
    val slope = col("cxy") / when(col("sx") =!= 0, col("sx") * col("sx"))
    val r = col("cxy") /
      (when(col("sx") =!= 0, col("sx")) * when(col("sy") =!= 0, col("sy")))
    m.select(col("grp"), col("n"),
      round(slope, 6).as("slope"),
      round(col("my") - slope * col("mx"), 6).as("intercept"),
      round(r * r, 6).as("r2"))
  }

  /** Block-jackknife standard error of a mean in ONE pass: rows land in
    * `nBlocks` md5 blocks, each block's leave-one-out mean θᵢ is computed
    * from the O(B) block-sum table, and SE² = (B−1)·var_pop(θᵢ) — the
    * delete-a-block jackknife. The resampling-based uncertainty estimate
    * that actually works at 100 TB: a bootstrap would re-scan (or
    * re-weight) the data per replicate; here ALL replicates are arithmetic
    * on one grouped aggregate, because leave-one-out sums are just
    * total − block.
    *
    * var_pop over the θᵢ (not E[θ²]−θ̄²) keeps the numerics: jackknife
    * replicates differ in the 4th+ decimal, exactly where the naive
    * expansion cancels catastrophically. Output one row:
    * (mean, se_jackknife, n_blocks, n_rows).
    */
  def blockJackknife(
      df: DataFrame, idCol: String, valueCol: String,
      nBlocks: Int = 20): DataFrame = {
    require(nBlocks >= 2, "jackknife needs at least two blocks")
    val blk = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long"),
      lit(nBlocks))
    val blocks = df.filter(col(valueCol).isNotNull)
      .groupBy(blk.as("blk"))
      .agg(sum(col(valueCol)).as("s"), count(lit(1)).as("n"))
    val tot = blocks.agg(
      sum("s").as("st"), sum("n").as("nt"), count(lit(1)).as("b"))
    blocks.crossJoin(broadcast(tot))
      // when() guard: a degenerate single-nonempty-block input yields NULL
      // instead of an ANSI DIVIDE_BY_ZERO
      .select(((col("st") - col("s")) /
          when(col("nt") =!= col("n"), col("nt") - col("n"))).as("theta"),
        col("st"), col("nt"), col("b"))
      .groupBy("st", "nt", "b")
      .agg(var_pop(col("theta")).as("v"))
      .select(
        round(col("st") / col("nt"), 6).as("mean"),
        round(sqrt((col("b") - 1) * col("v")), 6).as("se_jackknife"),
        col("b").as("n_blocks"), col("nt").as("n_rows"))
  }

  /** Experiment sizing from live data: users per arm needed to detect a
    * relative lift `mde` in the ratio metric Σvalue/Σevents at α = 0.05
    * (two-sided) and 80% power, using the SAME delta-method user-level
    * variance [[abDeltaTest]] tests with — so the sizing and the eventual
    * test agree on what "variance" means. n/arm =
    * (z_{α/2}+z_β)²·2σ²ᵤ / (mde·ratio)², σ²ᵤ the per-user delta-method
    * variance of the linearized ratio.
    *
    * One size-of-data user aggregate → one 1-row moment aggregate →
    * arithmetic. Output one row:
    * (ratio, sigma_user, mde_abs, n_per_arm, n_users).
    */
  def powerAnalysis(
      events: DataFrame, mde: Double = 0.02, userCol: String = "user_id",
      valueCol: String = "value"): DataFrame = {
    val users = events
      .filter(col(userCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(userCol))
      .agg(sum(col(valueCol)).as("x"), count(lit(1)).cast("double").as("y"))
    val zSum = 1.959964 + 0.841621 // z_{0.025} + z_{0.20}
    users
      .agg(count(lit(1)).as("n_users"),
        avg("x").as("mx"), avg("y").as("my"),
        var_samp("x").as("vx"), var_samp("y").as("vy"),
        covar_samp("x", "y").as("cxy"))
      .select(col("n_users"), (col("mx") / col("my")).as("ratio"),
        (col("vx") / (col("my") * col("my"))
          - lit(2.0) * col("mx") * col("cxy") / pow(col("my"), 3)
          + col("mx") * col("mx") * col("vy") / pow(col("my"), 4))
          .as("sigma2"))
      .select(
        round(col("ratio"), 6).as("ratio"),
        round(sqrt(col("sigma2")), 6).as("sigma_user"),
        round(col("ratio") * mde, 6).as("mde_abs"),
        ceil(lit(zSum * zSum) * lit(2.0) * col("sigma2") /
          pow(col("ratio") * mde, 2)).cast("long").as("n_per_arm"),
        col("n_users"))
  }

  /** Ratio-metric A/B test with delta-method variance — the standard
    * large-scale experimentation analysis (Deng et al., KDD'18 lineage):
    * users are deterministically split 50/50 by md5 (the same bucket
    * scheme as [[TextAnalysis.splitAssign]]), the metric is the RATIO of
    * per-user sums Σx/Σy (here: value per event), whose variance is NOT
    * the naive iid variance because both numerator and denominator are
    * random — the delta method gives
    * var(x̄/ȳ) ≈ (σx²/ȳ² − 2·x̄·σxy/ȳ³ + x̄²·σy²/ȳ⁴)/n over USER-level
    * sums (users are the iid unit; events within a user are not).
    *
    * Plan: one size-of-data grouped aggregate to O(users) sums, one
    * O(users)→2-row moment aggregate, then a 2-row→1-row conditional
    * aggregation — no joins at all. Both exchanges partial-aggregate
    * map-side; nothing after the first exchange scales with the data.
    * Output: one row (ratio_a, ratio_b, diff, z_score, n_users).
    */
  def abDeltaTest(
      events: DataFrame, userCol: String = "user_id",
      valueCol: String = "value"): DataFrame = {
    val variant = pmod(
      conv(substring(md5(col(userCol).cast("string")), 1, 4), 16, 10).cast("long"),
      lit(2))
    val users = events
      .filter(col(userCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(userCol))
      .agg(sum(col(valueCol)).as("x"), count(lit(1)).cast("double").as("y"))
      .withColumn("variant", variant)
    val moments = users.groupBy("variant").agg(
      count(lit(1)).as("n_users"),
      avg("x").as("mx"), avg("y").as("my"),
      var_samp("x").as("vx"), var_samp("y").as("vy"),
      covar_samp("x", "y").as("cxy"))
    val perVariant = moments.select(
      col("variant"), col("n_users"),
      (col("mx") / col("my")).as("ratio"),
      ((col("vx") / (col("my") * col("my"))
        - lit(2.0) * col("mx") * col("cxy") / pow(col("my"), 3)
        + col("mx") * col("mx") * col("vy") / pow(col("my"), 4))
        / col("n_users")).as("var_r"))
    perVariant
      .agg(
        max(when(col("variant") === 0, col("ratio"))).as("ra"),
        max(when(col("variant") === 1, col("ratio"))).as("rb"),
        max(when(col("variant") === 0, col("var_r"))).as("va"),
        max(when(col("variant") === 1, col("var_r"))).as("vb"),
        sum(col("n_users")).as("n_users"))
      .select(
        round(col("ra"), 6).as("ratio_a"),
        round(col("rb"), 6).as("ratio_b"),
        round(col("rb") - col("ra"), 6).as("diff"),
        // when() guard: two zero-variance variants yield NULL, not an
        // ANSI DIVIDE_BY_ZERO
        round((col("rb") - col("ra")) /
          when(col("va") + col("vb") =!= 0, sqrt(col("va") + col("vb"))), 6)
          .as("z_score"),
        col("n_users"))
  }

  /** Kaplan-Meier survival estimator over entity lifetimes derived from an
    * event log: lifetime = days between an entity's first and last event;
    * the lifetime is an observed "death" when the entity went quiet at
    * least `censorDays` before the log's horizon (max date), otherwise it
    * is right-censored (still alive when observation ended). Output: one
    * row per event time with the at-risk count and the KM survival
    * estimate S(t) = prod over event times <= t of (1 - d_i/n_i).
    *
    * Plan: one size-of-data grouped aggregate to O(entities) lifetimes,
    * a second aggregate to O(distinct durations), then cumulative windows
    * over that bounded table (durations are day-granular, bounded by the
    * observation span — never data-sized), with the horizon and the
    * entity total riding 1-row broadcasts. The product is computed as
    * exp(sum(ln(factor))) so it stays a cumulative-sum window; a zero
    * factor (everyone at risk dies) is handled by a cumulative-min guard
    * instead of ln(0), which Spark nulls and DuckDB rejects.
    */
  def kaplanMeier(
      events: DataFrame, idCol: String = "user_id",
      tsCol: String = "ts", censorDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perEntity = events
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), to_date(col(tsCol)).as("day"))
      .groupBy("id")
      .agg(min("day").as("fd"), max("day").as("ld"))
    val horizon = perEntity.agg(max("ld").as("h")) // 1 row
    val obs = perEntity.crossJoin(broadcast(horizon)).select(
      datediff(col("ld"), col("fd")).cast("long").as("t"),
      when(col("ld") < date_sub(col("h"), censorDays), 1L).otherwise(0L)
        .as("ev"))
    val byT = obs.groupBy("t")
      .agg(sum("ev").as("d"), (count(lit(1)) - sum("ev")).as("c"))
    val total = byT.agg(sum(col("d") + col("c")).as("n_total")) // 1 row
    val cum = Window.orderBy("t")
    val prior = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    byT.crossJoin(broadcast(total))
      .withColumn("n_risk", col("n_total")
        - coalesce(sum(col("d") + col("c")).over(prior), lit(0L)))
      .withColumn("factor",
        lit(1.0) - col("d").cast("double") / col("n_risk"))
      .withColumn("survival",
        when(min("factor").over(cum) === 0.0, lit(0.0)).otherwise(
          round(exp(sum(log(when(col("factor") > 0, col("factor"))
            .otherwise(1.0))).over(cum)), 6)))
      .filter(col("d") > 0) // report event times only, AFTER the windows
      .select(col("t").as("duration_days"), col("d").as("n_events"),
        col("n_risk"), col("survival"))
  }

  /** Two-sample Kolmogorov-Smirnov test: the max vertical distance between
    * the empirical CDFs of `valueCol` in groups `a` and `b` of `groupCol`,
    * with the asymptotic one-term p-value 2·exp(−2·D²·n_a·n_b/(n_a+n_b))
    * (clamped at 1) — "did the length distribution shift between these two
    * sources". One row out.
    *
    * Plan: one size-of-data aggregate to per-distinct-value counts for
    * both groups at once (conditional sums — the input is scanned once),
    * then cumulative windows over the O(distinct values) table. Like
    * [[graft.ops.Features.cdfTable]], the contract is a quantized value
    * column — quantize continuous doubles first or the distinct table is
    * the data.
    */
  def ksTest(df: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("v"),
        when(col(groupCol) === a, 1L).otherwise(0L).as("__ca"),
        when(col(groupCol) === b, 1L).otherwise(0L).as("__cb"))
    val counts = base.groupBy("v")
      .agg(sum("__ca").as("__na"), sum("__cb").as("__nb"))
    val tot = counts.agg(sum("__na").as("__ta"), sum("__nb").as("__tb"))
    val w = Window.orderBy("v") // O(distinct values) rows
    counts.crossJoin(broadcast(tot))
      .withColumn("__diff", abs(
        sum("__na").over(w) / col("__ta")
          - sum("__nb").over(w) / col("__tb")))
      .agg(max("__diff").as("__d"),
        max("__ta").as("n_a"), max("__tb").as("n_b"))
      .select(round(col("__d"), 6).as("d_stat"), col("n_a"), col("n_b"),
        round(least(lit(1.0), lit(2.0) * exp(lit(-2.0) * col("__d")
          * col("__d") * col("n_a") * col("n_b")
          / (col("n_a") + col("n_b")))), 6).as("p_value"))
  }

  /** Lorenz-curve bucket table — the distributional detail behind [[gini]]:
    * rank the values ascending, cut the ranking into `buckets` equal-count
    * slices, and report each slice's share and cumulative share of the
    * total ("the bottom 50% of users carry 8% of spend"). Bucket
    * assignment is pure integer arithmetic on the rank (ceil(b·i/n)), so
    * it is engine-exact, and rank ties across a boundary carry equal
    * values — every aggregate is tie-permutation-invariant.
    *
    * Plan: same GlobalRowNumber range exchange as [[gini]], one grouped
    * aggregate to O(buckets), one cumulative window on that bounded table.
    */
  def lorenz(df: DataFrame, valueCol: String, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("x"))
    val ranked = graft.operators.GlobalRowNumber
      .withGlobalRowNumber(vals, "__i", Seq(col("x")))
    val tot = ranked.agg(count(lit(1)).as("__n"), sum("x").as("__tx"))
    val grouped = ranked.crossJoin(broadcast(tot))
      .withColumn("bucket",
        expr(s"CAST(($buckets * __i + __n - 1) DIV __n AS INT)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("x").as("__bv"), max("__tx").as("__tx"))
    grouped
      .withColumn("__cum", sum("__bv").over(Window.orderBy("bucket")))
      .select(col("bucket"), col("n"),
        round(col("__bv"), 6).as("value_sum"),
        // all-zero totals yield NULL shares, not IEEE inf (engine-agnostic)
        round(when(col("__tx") =!= 0, col("__bv") / col("__tx")), 6)
          .as("value_share"),
        round(when(col("__tx") =!= 0, col("__cum") / col("__tx")), 6)
          .as("cum_share"))
  }

  /** Gini coefficient of a value distribution (spend concentration,
    * corpus-source imbalance): with values sorted ascending and 1-based
    * ranks i, G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n. Rank ties are broken
    * arbitrarily — tied values contribute x*(sum of their ranks), which is
    * permutation-invariant, so the statistic is still deterministic.
    *
    * Degenerate inputs (empty, or all-zero values) yield a NULL gini —
    * guarded explicitly so both engines agree instead of diverging on
    * IEEE inf-vs-NULL division behavior.
    *
    * Plan: ranking rides [[graft.operators.GlobalRowNumber]]'s range
    * exchange (the scalable global sort — no single-partition window), and
    * the statistic is one final scalar aggregate. One row out.
    */
  def gini(df: DataFrame, valueCol: String): DataFrame = {
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("x"))
    val ranked = graft.operators.GlobalRowNumber
      .withGlobalRowNumber(vals, "i", Seq(col("x")))
    ranked.agg(
      round(when(sum("x") =!= 0,
        lit(2.0) * sum(col("i") * col("x"))
          / (count(lit(1)) * sum("x"))
          - (count(lit(1)) + lit(1.0)) / count(lit(1))), 6).as("gini"),
      count(lit(1)).as("n"),
      round(sum("x"), 6).as("total"))
  }

  /** Spearman rank correlation with STANDARD midrank tie handling —
    * Pearson over the rank vectors, the monotone-association measure
    * that (unlike [[corrMatrix]]'s Pearson) ignores the variables'
    * scale: right for heavy-tailed per-user counts.
    *
    * Exactness discipline: ranks are computed as INTEGER doubled
    * midranks (2·midrank(v) = 2·|{< v}| + n(v) + 1, the
    * [[Eval.aucQuantized]] trick). Numeric budget (r12 fixed-point
    * sweep): Σa² ≤ 4n³ kills a BIGINT sum at n ≈ 1.3×10⁶ ROWS — far
    * inside corpus reach — so the product statistics (Σab, Σa², Σb²)
    * accumulate in DECIMAL(38,0), exact to n ≈ 2.9×10¹² (DuckDB's
    * BIGINT sum auto-promotes to HUGEINT, so the oracle was always
    * wide); the linear Σa, Σb stay BIGINT (2n² budget → n ≤ 2×10⁹...
    * also widened, same cast, zero extra cost). Only the final rho
    * combines them in double, as the same expression on the same
    * integers in both engines (identical IEEE ops → identical bits);
    * the sqrt makes rho itself irrational, never a rounding-tie
    * hazard. Zero variance on either side yields NULL, not NaN.
    *
    * Plan: per variable one grouped count to O(distinct values) + one
    * ordered pass on that bounded domain (single partition by design —
    * input must be pre-aggregated/quantized so domains are bounded,
    * like the per-user count table here), then two value-keyed joins
    * (broadcast-sized rank tables) and one scalar aggregate.
    */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(c: String, out: String): DataFrame = {
      val g = df.filter(col(c).isNotNull)
        .groupBy(col(c).cast("long").as("v")).agg(count(lit(1)).as("nv"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("cum", coalesce(sum("nv").over(w), lit(0L)))
        .select(col("v").as(c),
          (lit(2L) * col("cum") + col("nv") + lit(1L)).as(out))
    }
    val pairs = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as(xCol), col(yCol).cast("long").as(yCol))
      .join(ranked(xCol, "a"), Seq(xCol))
      .join(ranked(yCol, "b"), Seq(yCol))
    val s = pairs.agg(count(lit(1)).as("n"),
      sum(col("a").cast("decimal(19,0)")).as("sa"),
      sum(col("b").cast("decimal(19,0)")).as("sb"),
      sum(col("a").cast("decimal(19,0)") * col("b")).as("sab"),
      sum(col("a").cast("decimal(19,0)") * col("a")).as("saa"),
      sum(col("b").cast("decimal(19,0)") * col("b")).as("sbb"))
    val n = col("n").cast("double")
    val dx = n * col("saa").cast("double") -
      col("sa").cast("double") * col("sa").cast("double")
    val dy = n * col("sbb").cast("double") -
      col("sb").cast("double") * col("sb").cast("double")
    s.select(col("n"),
      round(when(dx > 0.0 && dy > 0.0,
        (n * col("sab").cast("double") -
          col("sa").cast("double") * col("sb").cast("double")) /
          (sqrt(dx) * sqrt(dy))), 6).as("rho"))
  }
  /** CUPED variance reduction (Deng et al. 2013) over integer-valued
    * (covariate, metric) pairs — the industry-standard pre-experiment
    * adjustment: theta = cov(x,y)/var(x), and the variance the adjusted
    * metric sheds is exactly corr(x,y)² — reported as a percentage, the
    * number that decides whether CUPED is worth wiring into an
    * experiment's readout.
    *
    * Exactness: [[spearman]]'s discipline — five BIGINT sufficient
    * statistics, combined in double as the same expression on the same
    * integers in both engines. theta and the reduction are emitted
    * UNROUNDED: identical doubles need no rounding, and rounding a
    * rational is exactly the cross-engine tie hazard ExactRatio exists
    * for. Zero covariate variance yields NULLs.
    */
  def cuped(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val b = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    // numeric budget (r12 fixed-point sweep): Σx² ≤ n·x²_max — BIGINT
    // dies at e.g. 10⁹ units × metric 3×10⁴ — so the product sums run
    // in DECIMAL(38,0) (the oracle's HUGEINT was always wide)
    val s = b.agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x").cast("decimal(19,0)") * col("y")).as("sxy"),
      sum(col("x").cast("decimal(19,0)") * col("x")).as("sxx"),
      sum(col("y").cast("decimal(19,0)") * col("y")).as("syy"))
    val n = col("n").cast("double")
    val cxy = n * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = n * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = n * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    s.select(col("n").as("n_units"),
      when(vx > 0.0, cxy / vx).as("theta"),
      when(vx > 0.0 && vy > 0.0, cxy * cxy / (vx * vy) * lit(100.0))
        .as("var_reduction_pct"))
  }

  /** Sample-ratio-mismatch guardrail for a 50/50 md5-hash assignment:
    * with two cells of expected size n/2, the chi-square statistic
    * collapses to (2a−n)²/n (df = 1), and the 95 % detection flag is the
    * pure-integer comparison 100·(2a−n)² > 384·n — no double ever
    * decides it. The first check an experimentation system runs: an SRM
    * means the assignment (not the metric) is broken.
    */
  def sampleRatioMismatch(units: DataFrame, idCol: String): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
        .cast("long"), lit(2))
    val s = units.select(bucket.as("b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("b") === 0L, 1L).otherwise(0L)).as("n_a"))
    val dev = lit(2L) * col("n_a") - col("n")
    s.select(col("n").as("n_units"), col("n_a"),
      (col("n") - col("n_a")).as("n_b"),
      (dev.cast("double") * dev.cast("double") / col("n").cast("double"))
        .as("chi2"),
      (lit(100L) * dev * dev > lit(384L) * col("n")).as("srm_detected"))
  }

  /** Mann–Whitney rank-sum test between two groups of an integer-valued
    * metric — the nonparametric alternative to the t-test when the
    * distribution is skewed (doc lengths, session counts): U counts how
    * often a group-a value beats a group-b value, and the tie-corrected
    * normal approximation z flags a location shift.
    *
    * Exactness: [[spearman]]'s doubled-midrank discipline. The
    * sufficient statistics — 2·R_a = Σ n_a(v)·(2·cum_before(v)+n(v)+1),
    * the tie term T = Σ (n(v)³−n(v)), and the deviation
    * 2·(U_a − n_a·n_b/2) = 2R_a − n_a(n_a+1) − n_a·n_b — are exact
    * integers, and z combines them in double as the same expression on
    * the same integers in both engines (sqrt-irrational, never a
    * decimal tie). u_a is the exact half-integer 2U_a/2. Degenerate
    * inputs (one group empty, or every value tied) yield NULL z.
    *
    * Numeric budget (r12 fixed-point sweep): 2R_a ≤ 2n² and T ≤ n³ —
    * BIGINT dies at n ≈ 2×10⁶ rows for T, well inside corpus reach, so
    * R_a, T and the n_a(n_a+1)/n_a·n_b deviation products accumulate in
    * DECIMAL(38,0), exact to n ≈ 4.6×10¹² (the DuckDB oracle's BIGINT
    * sums auto-promote to HUGEINT — always wide).
    *
    * Plan: one size-of-data aggregate to the O(distinct values) count
    * table (both groups in one scan), one cumulative window on that
    * bounded table, one scalar aggregate. The contract is a quantized
    * value column, as for [[ksTest]].
    */
  def mannWhitney(df: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("v"),
        when(col(groupCol) === a, 1L).otherwise(0L).as("__ca"),
        when(col(groupCol) === b, 1L).otherwise(0L).as("__cb"))
    val counts = base.groupBy("v")
      .agg(sum("__ca").as("__na"), sum("__cb").as("__nb"))
      .withColumn("__nv", col("__na") + col("__nb"))
    val w = Window.orderBy("v") // O(distinct values) rows
    val ranked = counts.withColumn("__dmr",
      lit(2L) * (sum("__nv").over(w) - col("__nv"))
        + col("__nv") + lit(1L))
    val s = ranked.agg(
      sum("__na").as("na"), sum("__nb").as("nb"),
      sum(col("__na").cast("decimal(19,0)") * col("__dmr")).as("r2a"),
      sum(col("__nv").cast("decimal(19,0)") * col("__nv") * col("__nv")
        - col("__nv")).as("t3"))
    val n = col("na") + col("nb")
    // 2·(U_a − n_a·n_b/2), exact DECIMAL(38,0) (see the budget above)
    val dev = col("r2a") - col("na").cast("decimal(19,0)") *
      (col("na") + lit(1L)) -
      col("na").cast("decimal(19,0)") * col("nb")
    // tie-corrected var(U_a), combined in double (ranges exceed BIGINT)
    val varU = col("na").cast("double") * col("nb").cast("double") *
      ((n + lit(1L)).cast("double") * n.cast("double") *
        (n - lit(1L)).cast("double") - col("t3").cast("double")) /
      (lit(12.0) * n.cast("double") * (n - lit(1L)).cast("double"))
    s.select(col("na").as("n_a"), col("nb").as("n_b"),
      ((col("r2a") - col("na").cast("decimal(19,0)") *
        (col("na") + lit(1L))).cast("double") /
        lit(2.0)).as("u_a"),
      when(varU > 0.0,
        dev.cast("double") / (lit(2.0) * sqrt(varU))).as("z"))
  }

  /** Seeded randomization (permutation) test of "does the 50/50 md5
    * assignment explain the metric?" — the exact, distribution-free
    * companion to [[sampleRatioMismatch]]: the observed statistic is the
    * pure-integer group-sum imbalance |2·Σ_a m − Σ m| under the unsalted
    * assignment, the null distribution re-derives it under `perms` salted
    * re-assignments of the SAME units, and the p-value is the exact
    * rational (1 + #{null ≥ observed}) / (perms + 1) — no distributional
    * assumption, no double ever compared.
    *
    * Plan: the per-unit metric table (already aggregated by the caller,
    * far smaller than the raw data) is exploded ×perms and re-aggregated
    * in one map-side-combining shuffle to O(perms) rows; the observed
    * statistic is a 1-row broadcast onto that bounded table. At 100 TB
    * the ×perms blow-up applies to the unit table only, never the events.
    */
  /** The md5 50/50 bucket shared by [[sampleRatioMismatch]],
    * [[permutationTest]] and [[fdrScreen]] — the same spelling as the
    * split_assign oracle.
    */
  private def md5Bucket(c: org.apache.spark.sql.Column) = pmod(
    conv(substring(md5(c), 1, 4), 16, 10).cast("long"), lit(2))

  def permutationTest(units: DataFrame, idCol: String, metricCol: String,
      perms: Int = 64): DataFrame = {
    require(perms >= 1 && perms <= 10000, s"perms=$perms out of 1..10000")
    def bucket(c: org.apache.spark.sql.Column) = md5Bucket(c)
    val base = units.select(col(idCol).cast("string").as("__id"),
      col(metricCol).cast("long").as("__m"))
    val obs = base.agg(
      sum(when(bucket(col("__id")) === 0L, col("__m")).otherwise(0L))
        .as("__sa"),
      sum("__m").as("__st"))
      .select(abs(lit(2L) * col("__sa") - col("__st")).as("__d0"))
    val nulls = base
      .select(col("__id"), col("__m"),
        explode(sequence(lit(0), lit(perms - 1))).as("__k"))
      .groupBy("__k")
      .agg(
        sum(when(bucket(concat(col("__id"), lit(":"),
          col("__k").cast("string"))) === 0L, col("__m")).otherwise(0L))
          .as("__sa"),
        sum("__m").as("__st"))
      .select(abs(lit(2L) * col("__sa") - col("__st")).as("__dk"))
    nulls.crossJoin(broadcast(obs))
      .agg(count(lit(1)).as("k_perms"),
        max("__d0").as("d_obs"),
        sum(when(col("__dk") >= col("__d0"), 1L).otherwise(0L)).as("n_ge"))
      .select(col("k_perms"), col("d_obs"), col("n_ge"),
        exactRatio(col("n_ge") + lit(1L), col("k_perms") + lit(1L), 6)
          .as("p_value"))
  }

  /** Exact Benjamini–Hochberg FDR screen over per-group randomization
    * tests — the multiple-comparisons step every metrics dashboard skips
    * at its peril: one [[permutationTest]]-style statistic per group
    * (does the md5 assignment explain this group's per-unit metric?),
    * then the BH step-up at level alphaNum/alphaDen across all m groups.
    * EVERYTHING is integer-exact: p_(j) ≤ α·j/m is decided as
    * alphaDen·m·(n_ge_j+1) ≤ alphaNum·j·(perms+1) — no p-value double is
    * ever compared, so the reject set is bit-identical in any engine.
    *
    * Plan: one grouped count to the (unit, group) table, one ×perms
    * explode re-aggregated in a single map-side-combining shuffle to
    * O(groups·perms) rows, then windows over the O(groups) table. The
    * blow-up applies to the aggregated unit×group table, never raw rows.
    */
  def fdrScreen(df: DataFrame, unitCol: String, groupCol: String,
      metric: org.apache.spark.sql.Column, perms: Int = 64,
      alphaNum: Int = 5, alphaDen: Int = 100): DataFrame = {
    require(perms >= 1 && perms <= 10000, s"perms=$perms out of 1..10000")
    require(alphaNum > 0 && alphaDen > 0 && alphaNum < alphaDen,
      s"fdrScreen: alpha $alphaNum/$alphaDen not in (0,1)")
    val base = df.filter(col(unitCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(unitCol).cast("string").as("__id"),
        col(groupCol).as("__g"))
      .agg(metric.cast("long").as("__m"))
    val obs = base.groupBy("__g")
      .agg(abs(lit(2L) * sum(when(md5Bucket(col("__id")) === 0L,
        col("__m")).otherwise(0L)) - sum("__m")).as("__d0"))
    val nulls = base
      .select(col("__g"), col("__m"),
        explode(sequence(lit(0), lit(perms - 1))).as("__k"),
        col("__id"))
      .groupBy("__g", "__k")
      .agg(abs(lit(2L) * sum(when(md5Bucket(concat(col("__id"), lit(":"),
        col("__k").cast("string"))) === 0L, col("__m")).otherwise(0L))
        - sum("__m")).as("__dk"))
    val perGroup = nulls.join(obs, "__g")
      .groupBy("__g")
      .agg(max("__d0").as("d_obs"),
        sum(when(col("__dk") >= col("__d0"), 1L).otherwise(0L)).as("n_ge"))
    val m = perGroup.agg(count(lit(1)).as("__m_groups"))
    import org.apache.spark.sql.expressions.Window
    val ranked = perGroup.crossJoin(broadcast(m))
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("n_ge"), col("__g"))).cast("long"))
      .withColumn("bh_pass",
        lit(alphaDen.toLong) * col("__m_groups") * (col("n_ge") + lit(1L))
          <= lit(alphaNum.toLong) * col("rank") * lit(perms + 1L))
    ranked
      .withColumn("significant",
        max(when(col("bh_pass"), 1L).otherwise(0L)).over(
          Window.orderBy(col("rank").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          === 1L)
      .select(col("__g").as(groupCol), col("d_obs"), col("n_ge"),
        exactRatio(col("n_ge") + lit(1L), lit(perms + 1L), 6)
          .as("p_value"),
        col("rank"), col("bh_pass"), col("significant"))
  }
}
