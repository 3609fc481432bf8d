package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
