package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
