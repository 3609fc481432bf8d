package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — declarative constraint checking over a
  * table, the Delta-constraints / Great-Expectations shape a pipeline runs
  * before promoting a batch: each rule yields one row
  * `(rule, n_violations, n_checked, pass)`.
  *
  * Cost model at 100 TB:
  *  - every ROW rule ([[NotNull]]/[[InRange]]/[[Matches]] — arbitrary
  *    [[Predicate]]s) is a conditional count, and ALL of them fuse into ONE
  *    scan + one partial aggregate (a `stack` unpivot of a single 1-row
  *    aggregate — the [[graft.icenet.TableOps.columnStats]] pattern);
  *  - [[Unique]] needs a distinct — one shuffle on its key, run as its own
  *    aggregate so no multi-distinct Expand multiplies the scan;
  *  - [[ForeignKey]] is a left-anti count against the dimension's key
  *    projection — the same pruned anti-join as the S5 write path.
  * Nothing ever collects rows; violations are COUNTED, not materialized
  * (a `violations(df, rule)` projection is trivial when samples are wanted).
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** Row-level predicate that must hold; NULL predicate results count as
    * violations (SQL CHECK semantics are the opposite — document choice:
    * a quality gate must not pass rows it could not evaluate).
    */
  final case class Predicate(name: String, holds: Column) extends Rule
  def NotNull(c: String): Predicate =
    Predicate(s"${c}_not_null", col(c).isNotNull)
  def InRange(c: String, lo: Double, hi: Double): Predicate =
    Predicate(s"${c}_in_range", col(c).between(lo, hi))
  def Matches(c: String, regex: String): Predicate =
    Predicate(s"${c}_matches", col(c).rlike(regex))

  /** No two rows share a value of `cols`. Violations = rows beyond the
    * first per duplicated key.
    */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name: String = cols.mkString("_", "_", "_unique").stripPrefix("_")
  }

  /** Every non-null `cols` tuple exists in `dim`'s `dimCols`. */
  final case class ForeignKey(
      cols: Seq[String], dim: DataFrame, dimCols: Seq[String],
      tag: String) extends Rule {
    def name: String = s"${tag}_fk"
  }

  /** Runs every rule; returns one row per rule in the RULES' order (an
    * `ordinal` column makes the order explicit and oracle-stable).
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    val predicates = rules.collect { case p: Predicate => p }
    val fused: Option[DataFrame] = if (predicates.isEmpty) None else Some {
      val aggs = predicates.flatMap { p =>
        Seq(sum(when(p.holds, 0L).otherwise(1L)).as(s"${p.name}__v"))
      } :+ count(lit(1)).as("__n")
      val one = df.agg(aggs.head, aggs.tail: _*)
      val stackArgs = predicates
        .map(p => s"'${p.name}', `${p.name}__v`").mkString(", ")
      one.select(
        expr(s"stack(${predicates.size}, $stackArgs) AS (rule, n_violations)"),
        col("__n").as("n_checked"))
    }
    val keyed: Seq[DataFrame] = rules.collect {
      case u: Unique =>
        df.agg(
          (count(lit(1)) - count_distinct(col(u.cols.head), u.cols.tail.map(col): _*))
            .as("n_violations"),
          count(lit(1)).as("n_checked"))
          .select(lit(u.name).as("rule"), col("n_violations"), col("n_checked"))
      case fk: ForeignKey =>
        val nn = fk.cols.map(col(_).isNotNull).reduce(_ && _)
        val facts = df.filter(nn)
        val dimKeys = fk.dim
          .select(fk.dimCols.zip(fk.cols).map { case (d, c) => col(d).as(c) }: _*)
          .distinct()
        facts.join(dimKeys, fk.cols, "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .crossJoin(broadcast(facts.agg(count(lit(1)).as("n_checked"))))
          .select(lit(fk.name).as("rule"), col("n_violations"), col("n_checked"))
    }
    val all = (fused.toSeq ++ keyed).reduce(_.unionByName(_))
    val order = rules.map(_.name).zipWithIndex.toMap
    val ordinal = order.foldLeft(lit(null).cast("long")) {
      case (acc, (n, i)) => when(col("rule") === n, i.toLong).otherwise(acc)
    }
    all.select(ordinal.as("ordinal"), col("rule"),
      col("n_violations").cast("long").as("n_violations"),
      col("n_checked").cast("long").as("n_checked"),
      (col("n_violations") === 0).as("pass"))
  }
}
