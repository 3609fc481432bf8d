package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ExactRatio.exactRatio

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
    Predicate(s"${c}_not_null", qcol(c).isNotNull)
  def InRange(c: String, lo: Double, hi: Double): Predicate =
    Predicate(s"${c}_in_range", qcol(c).between(lo, hi))
  def Matches(c: String, regex: String): Predicate =
    Predicate(s"${c}_matches", qcol(c).rlike(regex))

  /** `col(...)` that treats the whole string as ONE literal column name:
    * `col` itself parses dots/backticks, so an odd-but-legal parquet column
    * name (quotes, backticks, dots) needs explicit quoting here.
    */
  private def qcol(c: String): Column = col("`" + escId(c) + "`")

  /** No two rows share a value of `cols`. Violations = rows beyond the
    * first per duplicated key, counted ONLY among tuples with every key
    * column non-null. NULL-bearing key tuples are excluded from the
    * duplicate count entirely (not compared to each other or to anything
    * else): SQL engines disagree on NULL-tuple distinctness — Spark's
    * `count_distinct` skips them while DuckDB's `count(DISTINCT (a,b))`
    * keeps them — so the portable, explicit semantic is "uniqueness is a
    * property of fully-present keys; missing keys are [[NotNull]]'s job".
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
    if (rules.isEmpty) { // empty spec = empty report, not a reduce() crash
      import spark.implicits._
      return Seq.empty[(Long, String, Long, Long, Boolean)]
        .toDF("ordinal", "rule", "n_violations", "n_checked", "pass")
    }
    val predicates = rules.collect { case p: Predicate => p }
    val fused: Option[DataFrame] = if (predicates.isEmpty) None else Some {
      val aggs = predicates.flatMap { p =>
        Seq(sum(when(p.holds, 0L).otherwise(1L)).as(s"${p.name}__v"))
      } :+ count(lit(1)).as("__n")
      val one = df.agg(aggs.head, aggs.tail: _*)
      // Rule names flow from user column names into an expr() string; a
      // quote/backslash in the literal or a backtick in the identifier
      // would otherwise break parsing (or worse, splice).
      val stackArgs = predicates
        .map(p => s"'${escStr(p.name)}', `${escId(s"${p.name}__v")}`").mkString(", ")
      one.select(
        expr(s"stack(${predicates.size}, $stackArgs) AS (rule, n_violations)"),
        col("__n").as("n_checked"))
    }
    val keyed: Seq[DataFrame] = rules.collect {
      case u: Unique =>
        // Duplicates among fully-non-null key tuples only (see Unique's
        // scaladoc): the conditional count mirrors count_distinct's own
        // null-tuple skip, so the difference is exactly "extra copies".
        val nn = u.cols.map(col(_).isNotNull).reduce(_ && _)
        df.agg(
          (sum(when(nn, 1L).otherwise(0L)) -
            count_distinct(col(u.cols.head), u.cols.tail.map(col): _*))
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

  /** Benford's-law first-digit audit of a positive numeric column — the
    * classic fabricated-data / unit-mixing screen for financial-style
    * amounts. One row per leading digit 1..9 with the observed count and
    * share next to the Benford expectation log10(1 + 1/d) and the absolute
    * deviation.
    *
    * The leading digit is taken from the DECIMAL STRING of the truncated
    * value (values < 1 are excluded), not from floor(log10(x)) powers —
    * string extraction is integer-exact and engine-portable, while libm
    * log10 differs across engines by an ulp exactly at the decade
    * boundaries where the digit flips. Plan: one size-of-data aggregate to
    * a 9-row table, then arithmetic with the total on a 1-row broadcast.
    */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    val digits = df
      .filter(col(valueCol).isNotNull && col(valueCol) >= 1)
      .select(substring(floor(col(valueCol)).cast("long").cast("string"),
        1, 1).cast("int").as("digit"))
    val counts = digits.groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val total = counts.agg(sum("n_obs").as("n_total")) // 1 row
    val pObs = col("n_obs") / col("n_total")
    val pExp = log(10.0, lit(1.0) + lit(1.0) / col("digit"))
    counts.crossJoin(broadcast(total)).select(
      col("digit"), col("n_obs"),
      exactRatio(col("n_obs"), col("n_total"), 6).as("p_obs"),
      round(pExp, 6).as("p_exp"),
      round(abs(pObs - pExp), 6).as("abs_dev"))
  }

  /** k-anonymity audit: group the table by its quasi-identifier columns
    * and report how much of it sits in groups smaller than `k` — the
    * re-identification risk screen run before releasing or training on
    * user-adjacent data. One summary row: row/group totals, the number of
    * at-risk groups, the rows inside them, and their share.
    *
    * Plan: one size-of-data grouped aggregate to O(groups), one scalar
    * aggregate over that. Rows-at-risk is the quantity to act on
    * (suppress, generalize, or drop those groups before release).
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    val sizes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    sizes.agg(
      sum("n").as("n_rows"),
      count(lit(1)).as("n_groups"),
      sum(when(col("n") < k, 1L).otherwise(0L)).as("n_groups_at_risk"),
      coalesce(sum(when(col("n") < k, col("n"))), lit(0L))
        .as("n_rows_at_risk"))
      .select(lit(k).as("k"), col("n_rows"), col("n_groups"),
        col("n_groups_at_risk"), col("n_rows_at_risk"),
        exactRatio(col("n_rows_at_risk"), col("n_rows"), 6).as("risk_share"))
  }

  /** l-diversity of a sensitive column within quasi-identifier groups —
    * k-anonymity's companion: a group can be large (k-safe) yet expose the
    * sensitive attribute if every member shares one value. Reports, per
    * the same census shape as [[kAnonymity]]: groups whose DISTINCT
    * sensitive-value count falls below `l`, and the rows they contain.
    *
    * Scale: one grouped aggregate carrying a count_distinct (partial-agg
    * per-group distinct sets are bounded by the sensitive domain), then an
    * O(groups) census — no data-sized state beyond the one exchange.
    */
  def lDiversity(
      df: DataFrame, quasiCols: Seq[String], sensitive: String,
      l: Int): DataFrame = {
    val groups = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(col(sensitive)).as("n_sensitive"))
    groups.agg(
      sum("n").as("n_rows"),
      count(lit(1)).as("n_groups"),
      sum(when(col("n_sensitive") < l, 1L).otherwise(0L))
        .as("n_groups_at_risk"),
      coalesce(sum(when(col("n_sensitive") < l, col("n"))), lit(0L))
        .as("n_rows_at_risk"))
      .select(lit(l).as("l"), col("n_rows"), col("n_groups"),
        col("n_groups_at_risk"), col("n_rows_at_risk"),
        exactRatio(col("n_rows_at_risk"), col("n_rows"), 6).as("risk_share"))
  }

  /** t-closeness of an ORDERED sensitive column within quasi-identifier
    * groups — the third leg of the release-risk triad after [[kAnonymity]]
    * and [[lDiversity]]: a group can be k-large and l-diverse yet still
    * leak if its sensitive-value DISTRIBUTION sits far from the table's.
    * Distance is the standard ordered-attribute Earth Mover's Distance
    * (normalized cumulative-difference sum); a group violates when
    * EMD > tNum/tDen.
    *
    * Exactness: with integer counts, EMD = Σ_v |cum_v| / (n_g·N·(m−1))
    * where cum_v accumulates (n_gv·N − n_v·n_g) — every term BIGINT, so
    * the violation test `tDen·Σ|cum| > tNum·n_g·N·(m−1)` is pure integer
    * and engine-exact (no double ever formed). Bounds: Σ|cum| ≤
    * 2·m·n_g·N, so N ≤ ~1e8 rows with m ≤ 100 distinct values stays
    * inside BIGINT; quantize the sensitive column coarser past that.
    * Degenerate m=1 (single-valued attribute) yields 0 > 0 = no violation
    * — trivially t-close, which is the right answer. Null sensitive
    * values are excluded (they have no position in the ordered domain).
    *
    * Plan: three grouped aggregates collapse the data to O(groups),
    * O(values), O(groups × values); the zero-filled grid is
    * groups × BROADCAST(values) (values bounded by the sensitive domain,
    * never by data), the cumulative window partitions by group over m
    * rows, and the census is O(groups). The only data-sized stages are
    * the three map-side-combined groupBys.
    */
  def tCloseness(
      df: DataFrame, quasiCols: Seq[String], sensitive: String,
      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0, s"tCloseness: bad threshold $tNum/$tDen")
    val q = quasiCols.map(col)
    val base = df.filter(col(sensitive).isNotNull)
      .select(q :+ col(sensitive).cast("long").as("v"): _*)
    val tot = base.agg(count(lit(1)).as("big_n"),
      count_distinct(col("v")).as("m"))
    val vals = base.groupBy("v").agg(count(lit(1)).as("n_v"))
    val grp = base.groupBy(q: _*).agg(count(lit(1)).as("n_g"))
    val gv = base.groupBy(q :+ col("v"): _*).agg(count(lit(1)).as("n_gv"))
    val grid = grp.crossJoin(broadcast(vals))
      .join(gv, quasiCols :+ "v", "left")
      .withColumn("n_gv", coalesce(col("n_gv"), lit(0L)))
      .crossJoin(broadcast(tot))
    val w = Window.partitionBy(q: _*).orderBy(col("v"))
    val perGroup = grid
      .withColumn("cum",
        sum(col("n_gv") * col("big_n") - col("n_v") * col("n_g")).over(w))
      .groupBy(q: _*)
      .agg(max("n_g").as("n_g"), max("big_n").as("big_n"), max("m").as("m"),
        sum(abs(col("cum"))).as("emd_num"))
      .withColumn("violates",
        lit(tDen.toLong) * col("emd_num") >
          lit(tNum.toLong) * col("n_g") * col("big_n") * (col("m") - lit(1L)))
    perGroup.agg(
      sum("n_g").as("n_rows"),
      count(lit(1)).as("n_groups"),
      sum(when(col("violates"), 1L).otherwise(0L)).as("n_groups_at_risk"),
      coalesce(sum(when(col("violates"), col("n_g"))), lit(0L))
        .as("n_rows_at_risk"))
      .select(lit(tNum.toLong).as("t_num"), lit(tDen.toLong).as("t_den"),
        col("n_rows"), col("n_groups"), col("n_groups_at_risk"),
        col("n_rows_at_risk"),
        exactRatio(col("n_rows_at_risk"), col("n_rows"), 6).as("risk_share"))
  }

  /** Differentially-private count release — the DISCRETE Laplace
    * (two-sided geometric) mechanism, the step AFTER the
    * [[kAnonymity]]/[[lDiversity]]/[[tCloseness]] screens: per-group
    * counts with integer noise z, P(z) ∝ exp(−ε|z|), added — the
    * standard ε-DP mechanism for unit-sensitivity integer queries
    * (Ghosh, Roughgarden & Sundararajan 2009), and being integer-valued
    * it never leaks the mantissa fingerprint a continuous Laplace draw
    * embeds in its low bits. Noise is drawn by inverse CDF from a
    * uniform SEEDED off the group key's md5 — deterministic, so the
    * release is reproducible and gate-checkable; a production release
    * would fold a secret salt into the seed and drop `n_true` (kept here
    * so the audit can report the noise actually added).
    *
    * CROSS-ENGINE EXACTNESS (replaces r9's continuous-Laplace rendering,
    * whose ln() was the suite's one cross-engine libm call with a
    * documented ~g·2^-52 residual divergence risk): the geometric CDF
    * boundaries F(k) = α^(−k)/(1+α) for k<0 and 1 − α^(k+1)/(1+α) for
    * k≥0 (α = e^−ε) are computed ONCE driver-side
    * ([[dpNoiseBoundaries]]) and embedded as IDENTICAL double literals
    * in both the plan and the oracle SQL — the eval_ndcg weight-table
    * discipline. Each engine then only COMPARES the identical
    * u = (h + 0.5)/16^12 (h = first 12 md5 hex digits) against identical
    * literals and counts — no logarithm, no rounding, no residual risk:
    * comparison of identical doubles is engine-exact whether or not u
    * ever ties a boundary. The table spans |z| ≤ K sized so the tail
    * mass sits below u's 2^-48 resolution, so the implicit clamp at ±K
    * is unreachable.
    *
    * Plan: one size-of-data grouped count to O(groups); the noise is a
    * per-group scan of the O(K) literal array (interpreted HOF — off the
    * hot path by construction). Nothing after the first exchange scales
    * with the data.
    */
  def dpCountRelease(df: DataFrame, groupCols: Seq[String],
      epsilon: Double = 1.0): DataFrame = {
    val (bounds, k) = dpNoiseBoundaries(epsilon)
    val q = groupCols.map(col)
    val g = df.groupBy(q: _*).agg(count(lit(1)).as("n_true"))
    val keyStr = concat_ws("|", groupCols.map(c => col(c).cast("string")): _*)
    val u = (conv(substring(md5(keyStr), 1, 12), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(281474976710656.0)
    val noise = (size(filter(array(bounds.map(lit): _*), b => b < u))
      - lit(k)).cast("long")
    g.select(q ++ Seq(col("n_true"),
      noise.as("noise"),
      greatest(col("n_true") + noise, lit(0L)).as("n_released"),
      lit(epsilon).as("epsilon")): _*)
  }

  /** The discrete-Laplace CDF boundary table for [[dpCountRelease]]:
    * (F(−K), …, F(K−1)) ascending, plus K. noise = |{b : b < u}| − K.
    * Shared verbatim by the plan and the oracle SQL (render with
    * [[dpBoundarySql]]) so both engines compare the same doubles.
    * K = ceil(35/ε) puts the tail mass α^K/(1+α) below the md5-uniform's
    * 2^-48 resolution; the table size is hard-capped so a tiny ε can
    * never inflate the plan silently.
    */
  private[graft] def dpNoiseBoundaries(epsilon: Double): (Seq[Double], Int) = {
    require(epsilon > 0.0, s"dpCountRelease: epsilon=$epsilon must be > 0")
    val k = math.ceil(35.0 / epsilon).toInt
    require(k <= 1024,
      s"dpCountRelease: epsilon=$epsilon needs a ±$k-step boundary table " +
        "(cap 1024) — release at this privacy level in batches with a " +
        "larger per-batch epsilon")
    val a = math.exp(-epsilon)
    val bounds = (-k until k).map { j =>
      if (j < 0) math.pow(a, -j) / (1.0 + a)
      else 1.0 - math.pow(a, j + 1) / (1.0 + a)
    }
    (bounds, k)
  }

  /** Differentially-private QUANTILE release — the exponential mechanism
    * (McSherry & Talwar 2007) over a DECLARED bounded integer domain
    * [lo, hi], the companion release to [[dpCountRelease]]: candidates
    * are every domain value (present or not — the candidate list must be
    * data-independent), utility u(v) = −min(|cum(v) − t|, D) where
    * cum(v) = #{x ≤ v} and t is the target rank, and the selection
    * weight is ρ^|u| with ρ = 1/2.
    *
    * The RATIONAL base is the whole trick: with ρ = 1/2 every weight is
    * the integer 2^(D−min(d,D)) — no exp()/pow() libm call in either
    * engine (the dp_count_release lesson: in-engine transcendentals are
    * the one cross-engine divergence class). Weights come from a LITERAL
    * 41-entry array shared verbatim with the oracle (the boundary-table
    * discipline); selection compares exact-double renderings of < 2^53
    * integers against u·W (u = the md5 uniform seeded off the release
    * tag; one IEEE multiply — correctly rounded, engine-identical).
    * Privacy accounting: utility sensitivity ≤ 2 (cum and t each move by
    * ≤ 1 per neighboring dataset), so ε = 2·Δu·ln(1/ρ) = 4·ln 2 ≈ 2.77.
    * The D = 40 truncation caps the weight table; a production release
    * folds a secret salt into the seed and drops the v_true audit column.
    *
    * Plan: one size-of-data grouped count to O(|domain|) rows; the
    * window/cumulative machinery runs on the ≤ |domain| candidate table
    * (bounded by declaration, single partition by design). Nothing after
    * the first exchange scales with the data.
    */
  def dpQuantileRelease(df: DataFrame, valueCol: Column,
      lo: Int, hi: Int, qNum: Int = 1, qDen: Int = 2,
      seed: String = "dpq"): DataFrame = {
    require(lo <= hi && hi - lo <= 100000, "domain must be small+declared")
    require(qNum >= 1 && qNum < qDen, "quantile must be in (0,1)")
    val spark = df.sparkSession
    val w = Window.orderBy("v") // <= |domain| rows: bounded by declaration
    val counts = df.select(valueCol.cast("long").as("v"))
      .filter(col("v").between(lo.toLong, hi.toLong))
      .groupBy("v").agg(count(lit(1)).as("c"))
    val domain = spark.range(lo.toLong, hi.toLong + 1L).select(col("id").as("v"))
    val weightArr = array(dpQuantileWeights.map(lit): _*)
    val tbl = domain.join(counts, Seq("v"), "left")
      .select(col("v"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
    // t = halfup(qNum·n / qDen), clamped to >= 1 — INTEGRAL divide (a
    // double `/` would be inexact for general qDen)
    def idiv(num: Column, den: Column): Column =
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(num),
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(den)))
    val totals = broadcast(tbl.agg(max(col("cum")).as("n"))
      .select(col("n"), greatest(lit(1L),
        idiv(col("n") * qNum * 2 + qDen, lit(2L * qDen))).as("t")))
    val weighted = tbl.crossJoin(totals)
      .withColumn("d", abs(col("cum") - col("t")))
      .withColumn("wv", element_at(weightArr,
        (least(col("d"), lit(DpQuantileD.toLong)) + 1L).cast("int")))
      .withColumn("cumw", sum(col("wv")).over(w))
    val wTotal = broadcast(weighted.agg(sum(col("wv")).as("w_total")))
    val u = (conv(substring(md5(lit(s"$seed|$qNum/$qDen")), 1, 12), 16, 10)
      .cast("long").cast("double") + lit(0.5)) / lit(281474976710656.0)
    weighted.crossJoin(wTotal)
      .agg(
        max(col("n")).as("n_rows"), max(col("t")).as("t_rank"),
        min(when(col("cum") >= col("t"), col("v"))).as("v_true"),
        min(when(col("cumw").cast("double") >
          u * col("w_total").cast("double"), col("v"))).as("v_released"))
      .select(
        lit(qNum.toDouble / qDen).as("q"),
        lit(4.0 * math.log(2.0)).as("epsilon"),
        col("n_rows"), col("t_rank"), col("v_true"), col("v_released"))
  }

  /** 2^(D−d) for d = 0..D, D = 40: the integer exponential-mechanism
    * weight table [[dpQuantileRelease]] and its oracle share verbatim.
    * 2^40 keeps Σ weights ≤ |domain|·2^40 ≪ 2^53 (exact as doubles). */
  private[graft] val DpQuantileD = 40
  private[graft] val dpQuantileWeights: Seq[Long] =
    (0 to DpQuantileD).map(j => 1L << (DpQuantileD - j))

  private[graft] def dpQuantileWeightsSql: String =
    dpQuantileWeights.mkString("[", ", ", "]")

  /** The boundary table as a SQL list literal at full round-trip
    * precision (17 significant digits — both engines parse back the
    * bit-identical doubles).
    */
  private[graft] def dpBoundarySql(epsilon: Double): String =
    dpNoiseBoundaries(epsilon)._1
      .map(d => java.lang.String.format(
        java.util.Locale.ROOT, "%.17g", Double.box(d)))
      .mkString("[", ", ", "]")

  /** Per-column profile drift between two snapshots of the same table —
    * the check a data contract runs on every release: null rate and
    * distinct-value count per declared column, side by side, with two
    * deterministic alarms (null-rate shift beyond `nullRateShift`, NDV
    * outside the [½×, 2×] band). The cheap early-warning before
    * distribution-level drift ([[graft.ops.Features.psi]]) is worth
    * computing.
    *
    * The null-rate comparison is on doubles built from the same BIGINTs
    * by the same expression in both engines — a comparison (unlike a
    * rounding) of identical doubles is engine-exact; the NDV band is
    * pure integer. Presented rates are [[exactRatio]] fixed point.
    *
    * Plan: ONE aggregate over each snapshot carries every column's
    * metrics (count_distinct partials merge per column); the long-format
    * stack is arithmetic over the two 1-row results. Columns are a
    * compile-time list — never data-dependent.
    */
  def profileDrift(ref: DataFrame, cur: DataFrame, cols: Seq[String],
      nullRateShift: Double = 0.01): DataFrame = {
    require(cols.nonEmpty, "profileDrift: no columns declared")
    def prof(df: DataFrame, side: String): DataFrame = {
      val aggs = Seq(count(lit(1)).as(s"n_$side")) ++ cols.flatMap(c => Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"nn_${side}_$c"),
        count_distinct(col(c)).as(s"nd_${side}_$c")))
      df.agg(aggs.head, aggs.tail: _*)
    }
    val joined = prof(ref, "ref").crossJoin(broadcast(prof(cur, "cur")))
    val rows = cols.map { cn =>
      joined.select(
        lit(cn).as("column_name"),
        col("n_ref"), col(s"nn_ref_$cn").as("n_null_ref"),
        col(s"nd_ref_$cn").as("ndv_ref"),
        col("n_cur"), col(s"nn_cur_$cn").as("n_null_cur"),
        col(s"nd_cur_$cn").as("ndv_cur"))
    }
    rows.reduce(_ unionByName _)
      .select(col("column_name"),
        col("n_ref"), col("n_null_ref"), col("ndv_ref"),
        col("n_cur"), col("n_null_cur"), col("ndv_cur"),
        exactRatio(col("n_null_ref"), greatest(col("n_ref"), lit(1L)), 6)
          .as("null_rate_ref"),
        exactRatio(col("n_null_cur"), greatest(col("n_cur"), lit(1L)), 6)
          .as("null_rate_cur"),
        when(col("n_ref") > 0L && col("n_cur") > 0L,
          abs(col("n_null_ref").cast("double") / col("n_ref").cast("double")
            - col("n_null_cur").cast("double") / col("n_cur").cast("double"))
            > lit(nullRateShift)).as("null_shift"),
        (lit(2L) * col("ndv_cur") < col("ndv_ref")
          || col("ndv_cur") > lit(2L) * col("ndv_ref"))
          .as("ndv_outside_band"))
  }

  /** Functional-dependency violation census for candidate rules A → B:
    * per rule, the determinant values mapping to MORE than one dependent
    * value, the rows under them, and the minimum deletions to repair
    * (rows outside each determinant's majority dependent — the standard
    * g3-style FD error measure, exact). The profiling pass a schema
    * or data-contract advisor runs before declaring constraints.
    *
    * Scale: per rule one (A, B) grouped count + one A-grouped census —
    * both partial-aggregated, state O(distinct A); rules are a compile-
    * time list, so the whole check is a handful of keyed aggregates over
    * one scan each.
    */
  def fdViolations(
      df: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "fdViolations: no rules")
    val out = rules.map { case (a, b) =>
      val pairs = df.filter(col(a).isNotNull)
        .groupBy(col(a).as("det"), col(b).as("dep"))
        .agg(count(lit(1)).as("n"))
      pairs.groupBy("det")
        .agg(count(lit(1)).as("n_dep"), sum("n").as("n_rows_det"),
          max("n").as("n_majority"))
        .agg(
          count(lit(1)).as("n_determinants"),
          sum(when(col("n_dep") > 1, 1L).otherwise(0L))
            .as("n_violating"),
          coalesce(sum(when(col("n_dep") > 1, col("n_rows_det"))), lit(0L))
            .as("n_rows_violating"),
          coalesce(sum(col("n_rows_det") - col("n_majority")), lit(0L))
            .as("n_repair_deletes"))
        .select(lit(s"$a->$b").as("rule"), col("n_determinants"),
          col("n_violating"), col("n_rows_violating"),
          col("n_repair_deletes"))
    }
    out.reduce(_ unionByName _).orderBy("rule")
  }

  /** Escapes a value for a single-quoted Spark SQL string literal. */
  private def escStr(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** Escapes a value for a backtick-quoted Spark SQL identifier. */
  private def escId(s: String): String = s.replace("`", "``")

  /** One inclusion-dependency probe: what fraction of `child`'s distinct
    * `childCol` values appear in `parent`'s `parentCol`. */
  final case class Inclusion(
      rule: String, child: DataFrame, childCol: String,
      parent: DataFrame, parentCol: String)

  /** Inclusion-dependency (FK-candidate) census — the DISCOVERY twin of
    * the [[ForeignKey]] validation rule: instead of pass/fail against a
    * declared key, it measures containment of each candidate pair, the
    * schema-inference signal that surfaces undeclared join keys in a
    * 100 TB lake (containment 1.0 = FK candidate; high-but-under-1
    * = dirty FK worth quarantining; low = coincidental type match).
    *
    * Per pair: distinct child values (one shuffle), LEFT join against the
    * distinct parent key (one shuffle, no broadcast of anything
    * data-sized), then a single 1-row conditional-count aggregate — no
    * cross join, so the census adds nothing to the PlanSweep surface.
    * Ratios present through the exact fixed-point ratio.
    */
  def inclusionCensus(cases: Seq[Inclusion]): DataFrame = {
    require(cases.nonEmpty, "inclusionCensus: no candidate pairs given")
    cases.map { c =>
      val ch = c.child.select(col(c.childCol).as("k"))
        .filter(col("k").isNotNull).distinct()
      val pa = c.parent.select(col(c.parentCol).as("k"))
        .filter(col("k").isNotNull).distinct()
        .withColumn("__in", lit(1L))
      ch.join(pa, Seq("k"), "left")
        .agg(count(lit(1)).as("n_child_distinct"),
          coalesce(sum(coalesce(col("__in"), lit(0L))), lit(0L))
            .as("n_contained"))
        .select(lit(c.rule).as("rule"), col("n_child_distinct"),
          col("n_contained"),
          // an all-null child column has nothing to contain: NULL ratio,
          // guarded on both sides (DuckDB integer // 0 is an error)
          when(col("n_child_distinct") > 0L,
            exactRatio(col("n_contained"), col("n_child_distinct"), 6))
            .otherwise(lit(null).cast("double")).as("containment"))
    }.reduce(_ unionByName _)
      .orderBy("rule")
  }
}
