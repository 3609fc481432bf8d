package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ExactRatio.exactRatio

/** Numeric feature-prep operators for a training pipeline: the
  * distribution-shaping steps that run between curation and model input.
  *
  * Pattern shared by all of them: ONE size-of-data aggregate produces an
  * O(groups) statistics table, which joins back to the rows (AQE
  * broadcasts it); the row-side transform stays a narrow codegen'd
  * expression.
  */
object Features {

  /** Per-group quantile winsorization: clamp `valueCol` into its group's
    * [lo, hi] percentile range — the standard heavy-tail treatment before
    * scaling/training. Exact `percentile` is the parity path (buffers each
    * group's values); swap in `approx_percentile` at the 100 TB scale for
    * a bounded-memory sketch with the same plan shape.
    *
    * Output keeps `idCols` so the clamped rows stay addressable.
    */
  def winsorize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCols: Seq[String],
      lo: Double = 0.05,
      hi: Double = 0.95): DataFrame = {
    // one percentile aggregate with an array of probabilities: both bounds
    // come out of a single per-group value buffer — two scalar percentile
    // calls would each buffer the full group
    val bounds = df.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, array($lo, $hi))").as("__ps"))
      .select(col(groupCol),
        col("__ps").getItem(0).as("p_lo"), col("__ps").getItem(1).as("p_hi"))
    // O(groups) rows by construction: broadcast explicitly so the static
    // plan never considers shuffling the fact side on the (few-valued,
    // maximally skewed) group key
    df.join(broadcast(bounds), groupCol)
      .select(idCols.map(col) ++ Seq(
        col(groupCol), col(valueCol),
        round(least(greatest(col(valueCol), col("p_lo")), col("p_hi")), 6)
          .as("clamped")): _*)
  }

  /** Per-group z-score standardization: (x − μ)/σ with population σ
    * (`stddev_pop` — the n-denominator variant both engines define
    * identically; `stddev_samp` would also match but population is the
    * ML-normalization convention). Groups with zero variance emit NULL
    * (division by zero) rather than an arbitrary zero — the caller
    * decides whether constant features are droppable.
    *
    * Same plan as [[winsorize]]: one grouped aggregate → O(groups) stats
    * broadcast back onto a narrow row-side transform. The window-function
    * formulation (`avg(x) OVER (PARTITION BY g)`) would buffer whole
    * groups per task; this shape partial-aggregates map-side and never
    * holds more than O(groups) state.
    */
  def standardize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCols: Seq[String]): DataFrame = {
    val stats = df.groupBy(groupCol).agg(
      avg(col(valueCol)).as("mu"),
      stddev_pop(col(valueCol)).as("sigma"))
    df.join(broadcast(stats), groupCol)
      .select(idCols.map(col) ++ Seq(
        col(groupCol), col(valueCol),
        round((col(valueCol) - col("mu")) /
          when(col("sigma") =!= 0, col("sigma")), 6).as("z")): _*)
  }

  /** Smoothed target encoding: each category's mean target, shrunk toward
    * the global mean with pseudo-count `alpha` —
    * enc = (Σy + α·prior)/(n + α). Rare categories collapse to the prior
    * (no overfit to 3-row categories); frequent ones keep their own mean.
    * The output IS the O(categories) encoding table — the row-side apply
    * is a broadcast-join lookup the caller composes when needed.
    *
    * One size-of-data grouped aggregate; the prior is re-aggregated from
    * the O(categories) table (never a second data pass) and attaches as a
    * 1-row broadcast. NULL categories and NULL targets are excluded on
    * both engines by the same explicit filter.
    */
  def targetEncode(
      df: DataFrame, catCol: String, targetCol: String,
      alpha: Double = 20.0): DataFrame = {
    val cats = df
      .filter(col(catCol).isNotNull && col(targetCol).isNotNull)
      .groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n"), sum(col(targetCol)).as("s"))
    val prior = cats.agg((sum("s") / sum("n")).as("prior"))
    cats.crossJoin(broadcast(prior))
      .select(col("category"), col("n"),
        round(col("s") / col("n"), 6).as("raw_mean"),
        round((col("s") + lit(alpha) * col("prior")) / (col("n") + lit(alpha)), 6)
          .as("encoded"))
  }

  /** LEAKAGE-FREE target encoding — the cross-fold variant production
    * training pipelines actually use: each row's category is encoded
    * from OUT-OF-FOLD statistics only (fold = deterministic md5 bucket
    * of the row id), so a row never sees its own target — the leakage
    * [[targetEncode]]'s in-sample means would inject. The smoothing
    * prior is itself out-of-fold (the other folds' global mean), and
    * the encoding depends only on (category, fold), so the published
    * table is the bounded O(categories × folds) artifact a training job
    * broadcast-joins onto the corpus.
    *
    * Plan: ONE size-of-data pass to (category, fold) cells; category
    * totals, fold totals, and the global total all re-aggregate the
    * cells (bounded), with the out-of-fold numbers as subtractions —
    * never a second data pass per fold. Cells whose category lives
    * entirely in one fold are dropped (no out-of-fold signal; also
    * pins div-by-zero out of both engines).
    */
  def targetEncodeCv(
      df: DataFrame, catCol: String, targetCol: String, idCol: String,
      folds: Int = 5, alpha: Double = 20.0): DataFrame = {
    val b = df
      .filter(col(catCol).isNotNull && col(targetCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(catCol).as("category"),
        pmod(conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
          .cast("long"), lit(folds.toLong)).as("fold"),
        col(targetCol).as("value"))
    val cf = b.groupBy("category", "fold")
      .agg(count(lit(1)).as("n_f"), sum(col("value")).as("s_f"))
    val c = cf.groupBy("category")
      .agg(sum(col("n_f")).as("n"), sum(col("s_f")).as("s"))
    val f = cf.groupBy("fold")
      .agg(sum(col("n_f")).as("nf_tot"), sum(col("s_f")).as("sf_tot"))
    val g = broadcast(cf.agg(
      sum(col("n_f")).as("big_n"), sum(col("s_f")).as("big_s")))
    val oofPrior =
      (col("big_s") - col("sf_tot")) / (col("big_n") - col("nf_tot"))
    cf.join(c, "category").join(broadcast(f), "fold").crossJoin(g)
      .filter(col("n") > col("n_f"))
      .select(col("category"), col("fold"),
        (col("n") - col("n_f")).as("n_oof"),
        round((col("s") - col("s_f")) / (col("n") - col("n_f")), 6)
          .as("raw_oof"),
        round(((col("s") - col("s_f")) + lit(alpha) * oofPrior)
          / ((col("n") - col("n_f")) + lit(alpha)), 6).as("encoded"))
  }

  /** Weight-of-evidence binning: quantile-bin `valueCol` into `nBins`
    * buckets and score each bin's ln((pos share)/(neg share)) against the
    * boolean `posCol` — the credit-scoring/feature-screening measure of
    * how strongly a numeric feature separates a binary label (its sum over
    * bins weighted by share difference is Information Value).
    *
    * Bins are defined by VALUE against the exact quantile bounds
    * (`bin = #bounds strictly below x`), not by row position: `ntile`
    * would split tied values by arbitrary row order and never reproduce
    * cross-engine. Laplace 0.5 keeps empty-side bins finite.
    *
    * Plan: one percentile aggregate (a 1-row bounds broadcast), a narrow
    * codegen'd bin assignment, one O(bins) grouped aggregate; totals
    * re-aggregate from the bin table and attach as a 1-row broadcast —
    * after the two aggregates nothing scales with the data.
    */
  def woeBinning(
      df: DataFrame, valueCol: String, posCol: String,
      nBins: Int = 10): DataFrame = {
    val d = df.filter(col(valueCol).isNotNull && col(posCol).isNotNull)
    val probs = (1 until nBins).map(i => i.toDouble / nBins)
    val bounds = d.agg(
      expr(s"percentile($valueCol, array(${probs.mkString(",")}))").as("bs"))
    val binned = d.crossJoin(broadcast(bounds))
      .select(col(posCol),
        size(filter(col("bs"), b => b < col(valueCol))).cast("long").as("bin"))
    val cells = binned.groupBy("bin").agg(
      sum(when(col(posCol), 1L).otherwise(0L)).as("n_pos"),
      sum(when(col(posCol), 0L).otherwise(1L)).as("n_neg"))
    val tot = cells.agg(sum("n_pos").as("tp"), sum("n_neg").as("tn"))
    cells.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_pos"), col("n_neg"),
        round(log(((col("n_pos") + 0.5) / (col("tp") + 0.5)) /
          ((col("n_neg") + 0.5) / (col("tn") + 0.5))), 6).as("woe"))
  }

  /** Per-group empirical CDF table: for each (group, distinct value),
    * the count at that value, the running count, and
    * F(x) = P(X ≤ x) — the lookup table for percentile-rank transforms,
    * quantile normalization, and drift comparison between groups.
    *
    * The scale contract: the running sum runs over the AGGREGATED
    * (group, value) table, so per-group window partitions are
    * O(distinct values), never O(rows) — right for discrete/quantized
    * features (quantities, ratings, bucketed scores). For continuous
    * features quantize first ([[woeBinning]]'s bounds, or rounding);
    * a raw continuous column would regrow data-sized partitions. The
    * per-group totals re-aggregate from the same bounded table and attach
    * broadcast.
    */
  def cdfTable(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("grp"), col(valueCol).as("value"))
      .agg(count(lit(1)).as("n_at"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("value")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = counts.groupBy("grp").agg(sum("n_at").as("n_grp"))
    counts.withColumn("cum_n", sum("n_at").over(w))
      .join(broadcast(tot), "grp")
      .select(col("grp"), col("value"), col("n_at"), col("cum_n"),
        exactRatio(col("cum_n"), col("n_grp"), 6).as("cdf"))
  }

  /** Per-group robust scaling: (x − median)/IQR — the outlier-insensitive
    * sibling of [[standardize]] (sklearn's RobustScaler). Median and both
    * quartiles come out of ONE exact-percentile buffer per group (same
    * single-buffer trick as [[winsorize]]; `approx_percentile` is the
    * bounded-memory 100 TB drop-in with an identical plan). Zero-IQR
    * groups emit NULL, matching [[standardize]]'s zero-variance contract.
    */
  def robustScale(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCols: Seq[String]): DataFrame = {
    val stats = df.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, array(0.25, 0.5, 0.75))").as("__qs"))
      .select(col(groupCol),
        col("__qs").getItem(1).as("med"),
        (col("__qs").getItem(2) - col("__qs").getItem(0)).as("iqr"))
    df.join(broadcast(stats), groupCol)
      .select(idCols.map(col) ++ Seq(
        col(groupCol), col(valueCol),
        round((col(valueCol) - col("med")) /
          when(col("iqr") =!= 0, col("iqr")), 6).as("scaled")): _*)
  }

  /** Population stability index between a reference slice (`refCol` true)
    * and the current slice of the same column — the standard model-input
    * drift monitor. Bin edges are the reference slice's quantiles, so the
    * reference shares are ~1/bins by construction and PSI sums the
    * (current−ref)·ln(current/ref) surprise per bin (shares floored at
    * `floorP` so an empty bin contributes a large finite term, not ±inf).
    * Rule of thumb: total < 0.1 stable, > 0.25 action.
    *
    * Plan: ONE pass for the conditional quantile bounds (1-row broadcast;
    * exact `percentile` here, `approx_percentile` is the 100 TB drop-in),
    * one narrow bin-assignment projection, one O(bins) aggregate. Output
    * is the per-bin table; total PSI = sum(psi_term).
    */
  def psi(df: DataFrame, valueCol: String, refCol: String,
      bins: Int = 10, floorP: Double = 1e-6): DataFrame = {
    val probs = (1 until bins).map(_.toDouble / bins)
    val bounds = df.agg(expr(
      s"percentile(CASE WHEN $refCol THEN $valueCol END, " +
        s"array(${probs.mkString(",")}))").as("__bs"))
    val rs = col("__nr") / col("__tr")
    val cs = col("__nc") / col("__tc")
    df.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .select(
        size(filter(col("__bs"), x => x < col(valueCol))).as("bin"),
        when(col(refCol), 1L).otherwise(0L).as("__ir"))
      .groupBy("bin")
      .agg(sum("__ir").as("__nr"), (count(lit(1)) - sum("__ir")).as("__nc"))
      .crossJoin(broadcast(
        df.filter(col(valueCol).isNotNull).agg(
          sum(when(col(refCol), 1L).otherwise(0L)).as("__tr"),
          sum(when(col(refCol), 0L).otherwise(1L)).as("__tc"))))
      .select(col("bin"), col("__nr").as("n_ref"), col("__nc").as("n_cur"),
        exactRatio(col("__nr"), col("__tr"), 6).as("ref_share"),
        exactRatio(col("__nc"), col("__tc"), 6).as("cur_share"),
        round((cs - rs) * log(greatest(cs, lit(floorP))
          / greatest(rs, lit(floorP))), 6).as("psi_term"))
  }

  /** Model-calibration (reliability) table: bucket a [0,1] score column
    * into `bins` equal-width bins and report, per bin, the count, the mean
    * predicted score, and the observed positive rate — the table behind a
    * reliability diagram and the input to Platt/isotonic recalibration.
    * A perfectly calibrated scorer has mean_score ~= frac_pos per bin.
    *
    * `labelCol` must be 0/1 numeric. Scores exactly 1.0 fold into the top
    * bin. Plan: one narrow projection, one size-of-data grouped aggregate
    * to O(bins) rows — nothing else.
    */
  def calibrationTable(
      df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame =
    df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("double").as("y"))
      .groupBy(least(floor(col("s") * bins).cast("long"), lit(bins - 1L))
        .as("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg("s"), 6).as("mean_score"),
        // frac_pos = n_pos/n is an int/int rational — exact fixed point
        exactRatio(sum(col("y").cast("long")), count(lit(1)), 6)
          .as("frac_pos"))
}
