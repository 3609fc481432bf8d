package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ExactRatio.exactRatio

/** Temporal warehouse operators: slowly-changing-dimension history and
  * calendar gap-filling — the two shapes between a raw changelog and an
  * analysis-ready time series.
  *
  * Both are one-shuffle designs: everything happens inside per-key windows
  * riding a single exchange on the entity key.
  */
object Temporal {

  /** SCD Type 2: turn an attribute changelog (one row per key per change,
    * totally ordered per key by `orderCol`) into validity intervals —
    * each version stamped [valid_from, valid_to) with NULL valid_to (and
    * `is_current = true`) for the live version. The standard dimension
    * history build; [[graft.icenet.TableOps.cdcSnapshot]] is its
    * keep-latest-only degenerate case.
    *
    * One window (lead over the key exchange); rows whose attributes did
    * not change from the previous version are NOT collapsed — dedupe
    * upstream if the feed emits no-op updates.
    */
  def scd2(changes: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    // orderCols must be a TOTAL order per key (pass a tie-breaker like the
    // change id after the timestamp): lead over a partial order would
    // assign intervals nondeterministically
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    changes
      .withColumn("valid_from", col(orderCols.head))
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time lookup against an SCD2 frame: the version of each key
    * whose validity interval contains `at` (half-open [from, to)).
    */
  def asOfVersion(scd: DataFrame, at: Column): DataFrame =
    scd.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))

  /** Calendar gap-fill: densify a per-(key, date) series to EVERY date in
    * each key's own [min, max] span, carrying the last observed value
    * forward into the generated rows (`is_observed` marks real rows).
    *
    * Per-key spans (not one global spine) keep the generated volume
    * proportional to real key activity, and `sequence()` explodes inside
    * the key's partition, so the fill adds no shuffle beyond the one key
    * exchange the window already needs. The carry-forward is
    * `last(value, ignoreNulls)` over an unbounded-preceding frame — the
    * engine-portable formulation (DuckDB: `last_value(x IGNORE NULLS)`).
    */
  def gapFill(
      df: DataFrame, keyCol: String, dateCol: String,
      valueCol: String): DataFrame = {
    val spine = df.groupBy(keyCol).agg(
      min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as(dateCol))
    val w = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(df, Seq(keyCol, dateCol), "left")
      .select(col(keyCol), col(dateCol),
        col(valueCol).isNotNull.as("is_observed"),
        last(col(valueCol), ignoreNulls = true).over(w).as(valueCol))
  }

  /** Linear interpolation over a densified series: like [[gapFill]] but
    * gap rows get the straight line between the surrounding observations
    * instead of a carried-forward step. The time-series resampling
    * primitive (pandas' `interpolate(method='time')`).
    *
    * Plan: the same per-key spine join, then TWO frames over the ONE key
    * exchange — last observed (value, date) looking back, first observed
    * looking forward; interpolated = prev + (next−prev)·elapsed/span.
    * Rows before the first / after the last observation have only one
    * anchor and carry it flat. Window frames reuse the exchange, so this
    * is still a single-shuffle operator.
    */
  def interpolate(
      df: DataFrame, keyCol: String, dateCol: String,
      valueCol: String): DataFrame = {
    val spine = df.groupBy(keyCol).agg(
      min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as(dateCol))
    val back = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDate = when(col(valueCol).isNotNull, col(dateCol))
    val joined = spine.join(df, Seq(keyCol, dateCol), "left")
      .select(col(keyCol), col(dateCol),
        col(valueCol).isNotNull.as("is_observed"), col(valueCol))
      .withColumn("__pv", last(col(valueCol), ignoreNulls = true).over(back))
      .withColumn("__pd", last(obsDate, ignoreNulls = true).over(back))
      .withColumn("__nv", first(col(valueCol), ignoreNulls = true).over(fwd))
      .withColumn("__nd", first(obsDate, ignoreNulls = true).over(fwd))
    // The interpolated value (pv·g + (nv−pv)·Δ)/g is an exact rational
    // for the integral, non-negative series this op targets (counts) —
    // fixed point instead of round(double, 6), which diverges across
    // engines when an unobserved gap hits the 2^7·5^k-day tie class.
    val g = datediff(col("__nd"), col("__pd"))
    val dlt = datediff(col(dateCol), col("__pd"))
    joined.select(col(keyCol), col(dateCol), col("is_observed"),
      when(col("is_observed"), col(valueCol).cast("double"))
        .when(col("__pv").isNull, col("__nv").cast("double"))
        .when(col("__nv").isNull, col("__pv").cast("double"))
        .otherwise(exactRatio(
          col("__pv") * g + (col("__nv") - col("__pv")) * dlt, g, 6))
        .as(valueCol))
  }

  /** Exponentially-weighted moving average over each key's ordered series,
    * with a finite kernel: element j steps back of the current row weighs
    * (1-alpha)^j, truncated at `span` rows and renormalized over the
    * weights actually present (so series starts are unbiased, not damped
    * toward zero).
    *
    * The infinite-memory EWMA recursion y_t = a·x_t + (1-a)·y_{t-1} is not
    * a window aggregate (and its sum-rewrite needs (1-a)^(-rank), which
    * overflows doubles after ~1000 rows); the truncated kernel IS one: a
    * `collect_list` over a `span`-row frame plus a higher-order-function
    * dot product with the geometric weights — O(span) state per row, all
    * riding ONE exchange on the key. The geometric tail beyond `span` rows
    * carries weight (1-a)^span (0.4% at the 8/0.5 default), which is the
    * truncation error bound. Null values are excluded up front
    * (collect_list would silently skip them and misalign the weights).
    */
  def ewma(
      df: DataFrame, keyCol: String, orderCol: String, tieCol: String,
      valueCol: String, alpha: Double = 0.5, span: Int = 8): DataFrame = {
    require(alpha > 0 && alpha < 1 && span > 0)
    val q = 1.0 - alpha
    val frame = Window.partitionBy(keyCol)
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(-(span - 1), Window.currentRow)
    // null order keys sort first in Spark but last in most SQL engines —
    // exclude them so frame alignment is engine-agnostic
    df.filter(col(keyCol).isNotNull && col(valueCol).isNotNull
        && col(orderCol).isNotNull)
      .select(col(keyCol), col(orderCol), col(tieCol),
        col(valueCol).cast("double").as(valueCol))
      .withColumn("__l", collect_list(col(valueCol)).over(frame))
      .withColumn("__m", size(col("__l")).cast("double"))
      .withColumn("__num", aggregate(
        zip_with(col("__l"), sequence(lit(1), size(col("__l"))),
          (x, i) => x * pow(lit(q), col("__m") - i.cast("double"))),
        lit(0.0), (acc, v) => acc + v))
      .select(col(keyCol), col(orderCol), col(tieCol), col(valueCol),
        round(col("__num") /
          ((lit(1.0) - pow(lit(q), col("__m"))) / (1.0 - q)), 6).as("ewma"))
  }

  /** Autocorrelation function of an aggregated series: Pearson correlation
    * of the series with itself at row lags 1..`maxLag`. Input is the
    * ALREADY-AGGREGATED series (e.g. daily counts) — one row per step;
    * the lag is by row order of `orderCol`, so calendar gaps shift the
    * alignment (aggregate onto a gap-free spine first if that matters).
    *
    * Plan: the input is O(steps) (bounded by the observation span, never
    * data-sized), so the unpartitioned lag windows and the O(maxLag)
    * grouped corr are all bounded-state; the only size-of-data work is
    * whatever aggregate produced the series upstream.
    */
  def acf(df: DataFrame, orderCol: String, valueCol: String,
      maxLag: Int = 7): DataFrame = {
    val w = Window.orderBy(orderCol) // bounded: O(steps) rows
    // null order keys would shift every lag alignment engine-dependently
    val lagged = (1 to maxLag).foldLeft(
      df.filter(col(orderCol).isNotNull)
        .select(col(orderCol), col(valueCol).cast("double").as("__x"))) {
      (acc, l) => acc.withColumn(s"__y$l", lag(col("__x"), l).over(w))
    }
    val stacked = lagged.select(col("__x"), expr(
      (1 to maxLag).map(l => s"$l, __y$l")
        .mkString(s"stack($maxLag, ", ", ", ") as (lag, __y)")))
      .filter(col("__y").isNotNull)
    stacked.groupBy("lag")
      .agg(round(corr("__x", "__y"), 6).as("acf"),
        count(lit(1)).as("n_pairs"))
  }

  /** Classical additive seasonal decomposition of a daily series:
    * trend = centered 7-day moving average (null at the edges where the
    * window is partial), seasonal = mean detrended value per day-of-week
    * (0=Sunday), residual = value − trend − seasonal. The STL-lite
    * monitoring decomposition — is Monday low because of seasonality or is
    * something wrong?
    *
    * Input is the aggregated daily table, so every window here runs on
    * O(days) rows; the 7-row seasonal index joins back broadcast. Counts
    * being integers keeps the moving-average sums order-exact across
    * engines.
    */
  def seasonalDecompose(
      df: DataFrame, dayCol: String, valueCol: String): DataFrame = {
    val frame = Window.orderBy(dayCol).rowsBetween(-3, 3)
    val base = df.select(col(dayCol), col(valueCol).cast("double").as("__v"))
      .withColumn("__trend",
        when(count(lit(1)).over(frame) === 7, avg("__v").over(frame)))
      .withColumn("__dow", dayofweek(col(dayCol)) - 1)
    val seasonal = base.filter(col("__trend").isNotNull)
      .groupBy("__dow")
      .agg(avg(col("__v") - col("__trend")).as("__seasonal"))
    base.join(broadcast(seasonal), Seq("__dow"), "left")
      .select(col(dayCol), col("__dow").as("dow"),
        col("__v").as(valueCol),
        round(col("__trend"), 6).as("trend"),
        round(col("__seasonal"), 6).as("seasonal"),
        round(col("__v") - col("__trend") - col("__seasonal"), 6)
          .as("residual"))
  }

  /** Sweep-line interval concurrency: each line item is "open" from its
    * order date until it ships — this computes, per supplier, the PEAK
    * number of simultaneously open line items and the first date that
    * peak is reached ("how deep did the backlog ever get"), the classic
    * max-overlap query an interval tree answers point-wise and a sweep
    * answers corpus-wide in one sorted pass.
    *
    * Convention (pinned, engine-mirrored): intervals are
    * [order_date, ship_date) and same-date closings process BEFORE
    * openings, so per (supplier, date) the only peak candidate is the
    * cumulative NET sum — +1/−1 events collapse to one net row per
    * (supplier, date) BEFORE the window, making the sweep fully
    * deterministic (no intra-date ordering ambiguity) and the window
    * input O(supplier × active dates), not O(line items).
    *
    * Scale: the orders join is keyed on orderkey; the event census is one
    * partial-aggregated groupBy; the running sum partitions BY SUPPLIER —
    * never a global sort; the per-supplier reduction and top-k move
    * O(suppliers) rows. The shape survives any supplier count.
    */
  def backlogSweep(
      lineitem: DataFrame, orders: DataFrame, topK: Int = 20): DataFrame = {
    val li = lineitem.select(col("l_orderkey").as("ok"),
      col("l_suppkey").as("supp"), col("l_shipdate").cast("date").as("ship"))
    val o = orders.select(col("o_orderkey").as("ok"),
      col("o_orderdate").cast("date").as("odate"))
    val iv = li.join(o, "ok")
    val events = iv.select(col("supp"), col("odate").as("d"), lit(1L).as("delta"))
      .unionByName(iv.select(col("supp"), col("ship").as("d"),
        lit(-1L).as("delta")))
      .groupBy("supp", "d").agg(sum("delta").as("net"))
    val w = Window.partitionBy("supp").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = events.withColumn("open_now", sum("net").over(w))
    val withPeak = swept.withColumn("peak_open",
      max("open_now").over(Window.partitionBy("supp")))
    withPeak.filter(col("open_now") === col("peak_open"))
      .groupBy("supp")
      .agg(max("peak_open").as("peak_open"), min("d").as("peak_date"))
      .orderBy(col("peak_open").desc, col("supp").asc)
      .limit(topK)
  }
  /** Theil–Sen robust trend estimator of a (order, value) series: the
    * MEDIAN of all pairwise slopes (value_j − value_i)/(order_j − order_i),
    * i < j — the slope a single outlier day cannot move, where OLS
    * ([[graft.ops.Stats]]) bends to it. Returns the lower-median pair as an
    * EXACT rational (med_dy, med_dx) plus the slope double (both engines
    * divide the same two integers — identical bits; the gate's 6-dp float
    * rounding then rounds the same double the same way, so no decimal-tie
    * hazard arises even though the rational can land on one).
    *
    * Selection is deterministic: pairs ordered by (slope, dy, dx), the
    * lower median at position (n_pairs+1) div 2; pairs agreeing on all
    * three keys are interchangeable, so window tie order cannot change the
    * selected VALUES.
    *
    * Plan: the series is pre-aggregated to O(days), so the pair expansion
    * is a broadcast nested-loop over the BOUNDED day table — O(days²)
    * rows derived from the day DOMAIN, never from data size (2.9M pairs
    * for a 6-year daily series, at any corpus scale); ranking rides
    * [[graft.operators.GlobalRowNumber]] (range-partitioned, no single
    * 1-partition sort), and the only data-sized stage is the daily
    * count.
    */
  /** FIFO lot allocation — the accounting/inventory matching primitive:
    * per key, demand rows consume supply rows in strict arrival order
    * (cost-basis matching, returns-to-shipments, payments-to-invoices).
    * The classic sequential loop becomes two cumulative windows and one
    * interval-overlap join: supply row s spans [cum_s − q_s, cum_s) of the
    * key's running total, demand row d spans [cum_d − q_d, cum_d), and d
    * consumes min(hi) − max(lo) units from every s it overlaps — exactly
    * the FIFO assignment, with no iteration and no driver loop.
    *
    * All arithmetic is BIGINT on integral quantities (cast truncates;
    * mirror with trunc() in the oracle). Output is the bounded
    * lots-per-demand distribution: how many demands were served from 1
    * lot, from 2, …, and 0 for demands arriving after supply ran dry —
    * plus their quantities and the shortfall.
    *
    * Plan: two windowed cumsums riding ONE exchange each on the key, then
    * an equi-join on the key whose range predicate keeps only overlapping
    * pairs — output cardinality is n_demand + n_splits (a demand crossing
    * L lot boundaries emits L rows), never quadratic. Per-key skew is
    * bounded by the key's row count, the same bound the windows already
    * carry.
    */
  def fifoAllocate(
      supply: DataFrame, demand: DataFrame, keyCol: String,
      qtyCol: String, orderCols: Seq[String]): DataFrame = {
    def spans(df: DataFrame, hiName: String, loName: String,
        seqName: String): DataFrame = {
      val w = Window.partitionBy("__k")
        .orderBy(orderCols.map(col): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.select(Seq(col(keyCol).as("__k"),
        col(qtyCol).cast("long").as("__q")) ++ orderCols.map(col): _*)
        .filter(col("__q") > 0L)
        .withColumn(hiName, sum("__q").over(w))
        .withColumn(loName, col(hiName) - col("__q"))
        .withColumn(seqName, row_number().over(
          Window.partitionBy("__k").orderBy(orderCols.map(col): _*))
          .cast("long"))
    }
    val sup = spans(supply, "__shi", "__slo", "__sseq")
      .select("__k", "__shi", "__slo")
    val dem = spans(demand, "__dhi", "__dlo", "__dseq")
      .select("__k", "__dhi", "__dlo", "__dseq")
    // left join: a demand beyond the key's total supply keeps its row
    // (zero lots); alloc per overlapping pair = min(hi) − max(lo)
    val pairs = dem.join(sup,
      dem("__k") === sup("__k") &&
        sup("__shi") > dem("__dlo") && sup("__slo") < dem("__dhi"),
      "left")
      .select(dem("__k"), col("__dseq"),
        (col("__dhi") - col("__dlo")).as("__dq"),
        when(sup("__k").isNotNull,
          least(col("__shi"), col("__dhi")) -
            greatest(col("__slo"), col("__dlo"))).as("__alloc"))
    val perDemand = pairs.groupBy(col("__k"), col("__dseq"))
      .agg(max("__dq").as("__dq"),
        sum(when(col("__alloc").isNotNull, 1L).otherwise(0L))
          .as("lots_per_demand"),
        coalesce(sum("__alloc"), lit(0L)).as("__got"))
    perDemand.groupBy("lots_per_demand")
      .agg(count(lit(1)).as("n_demands"),
        sum("__dq").as("qty_demanded"),
        sum("__got").as("qty_allocated"),
        sum(col("__dq") - col("__got")).as("qty_short"))
      .orderBy("lots_per_demand")
  }

  /** Time-weighted average of an irregularly-sampled series per key — the
    * right mean when samples are state observations, not events: each
    * value holds until the next sample, so it weighs by its holding
    * duration (last sample weighs 0 — it holds for an unknown future).
    * Sensor rollups, position marks, price marks all want this, and the
    * arithmetic mean silently over-weights busy periods.
    *
    * Weights are exact BIGINT epoch-microsecond gaps; the weighted sum is
    * a double (values are arbitrary doubles). A key with a single sample
    * (zero total weight) yields NULL, never NaN.
    *
    * Plan: one lead window riding one exchange on the key, one grouped
    * aggregate on the same key — the partitioning is reused, nothing
    * re-shuffles.
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy("__k").orderBy(col("__tus"), col("__tie"))
    val base = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull
        && col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"),
        unix_micros(col(tsCol)).as("__tus"),
        col(tieCol).as("__tie"),
        col(valueCol).cast("double").as("__v"))
    base
      .withColumn("__w",
        coalesce(lead("__tus", 1).over(w) - col("__tus"), lit(0L)))
      .groupBy(col("__k").as(keyCol))
      .agg(count(lit(1)).as("n_samples"),
        sum("__w").as("span_us"),
        round(when(sum("__w") > 0L,
          sum(col("__v") * col("__w").cast("double")) /
            sum("__w").cast("double")), 6).as("twa"))
  }

  def theilSen(daily: DataFrame, orderCol: String, valueCol: String): DataFrame = {
    val base = daily.select(
      col(orderCol).cast("date").as("d"), col(valueCol).cast("long").as("v"))
    val a = base.select(col("d").as("da"), col("v").as("va"))
    val b = base.select(col("d").as("db"), col("v").as("vb"))
    val pairs = broadcast(a).join(b, col("da") < col("db"))
      .select((col("vb") - col("va")).as("dy"),
        datediff(col("db"), col("da")).cast("long").as("dx"))
      .withColumn("slope", col("dy").cast("double") / col("dx").cast("double"))
    val ranked = graft.operators.GlobalRowNumber
      .withGlobalRowNumber(pairs, "i", Seq(col("slope"), col("dy"), col("dx")))
      .localCheckpoint() // counted, then filtered: materialize once
    val nPairs = ranked.count()
    val nDays = base.count()
    ranked.filter(col("i") === (nPairs + 1L) / 2L)
      .select(lit(nDays).as("n_days"), lit(nPairs).as("n_pairs"),
        col("dy").as("med_dy"), col("dx").as("med_dx"), col("slope"))
  }

  /** Lead-lag cross-correlation between two daily count series — here
    * "orders placed" vs "lines shipped": Pearson r of (x_d, y_{d+lag})
    * for every lag in [0, maxLag], over the days both series observe.
    * The argmax lag reads off the dominant operational delay (TPC-H
    * ships 1–121 days after ordering, so r should crest inside the
    * window, not at its edge).
    *
    * Cross-engine exactness: both daily series are integer counts, so
    * all five co-moment sums (Σx, Σy, Σxy, Σx², Σy²) stay in BIGINT —
    * order-independent, hash-exact — and r is ONE identical double
    * expression over those integers on both engines (IEEE divide/sqrt
    * are correctly rounded; the rule that keeps [[graft.ops.Stats]]
    * green). Zero-variance slices surface r as NULL on both sides.
    *
    * Scale: the series are O(days) after the first aggregates — the lag
    * fan-out explodes a SEQUENCE on the aggregated frame (in-stage, no
    * join against a lag table), so the shuffled volume is days × lags,
    * independent of raw row count.
    */
  def leadLagCorrelation(
      orders: DataFrame, lineitem: DataFrame, maxLag: Int = 30): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val x = orders
      .groupBy(datediff(col("o_orderdate"), epoch).cast("long").as("day"))
      .agg(count(lit(1)).as("x"))
    val y = lineitem
      .groupBy(datediff(col("l_shipdate"), epoch).cast("long").as("day"))
      .agg(count(lit(1)).as("y"))
    val fanned = x
      .withColumn("lag_d", explode(sequence(lit(0L), lit(maxLag.toLong))))
      .withColumn("probe", col("day") + col("lag_d"))
    val m = fanned.join(y.withColumnRenamed("day", "probe"), "probe")
    // numeric budget (r12 fixed-point sweep, the HITS overflow class):
    // x, y are per-day counts — at 10¹² rows over ~2,500 days that is
    // ~4×10⁸/day, so Σx² ≈ days·x² ≈ 4×10²⁰ kills a BIGINT sum. The
    // product sums and the n·Σxy − Σx·Σy composition therefore run in
    // DECIMAL(38,0) (exact to 10³⁸; the final r is double anyway).
    val s = m.groupBy("lag_d").agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x").cast("decimal(19,0)") * col("y")).as("sxy"),
      sum(col("x").cast("decimal(19,0)") * col("x")).as("sx2"),
      sum(col("y").cast("decimal(19,0)") * col("y")).as("sy2"))
    val nD = s("n").cast("decimal(19,0)")
    val sxD = s("sx").cast("decimal(19,0)")
    val syD = s("sy").cast("decimal(19,0)")
    val varX = nD * s("sx2") - sxD * sxD
    val varY = nD * s("sy2") - syD * syD
    s.select(col("lag_d"), col("n").as("n_days"),
      when(varX === lit(0L) || varY === lit(0L), lit(null).cast("double"))
        .otherwise((nD * s("sxy") - sxD * syD).cast("double") /
          (sqrt(varX.cast("double")) * sqrt(varY.cast("double"))))
        .as("r"))
      .orderBy("lag_d")
  }

  /** Seasonal-naive forecast backtest over the daily revenue series:
    * forecast(d) = actual(d − `period`), scored per weekday-slot
    * (epoch_day mod 7 — an integer both engines derive identically,
    * unlike dayofweek(), whose origin is engine-specific) with exact
    * error accounting: revenue is DECIMAL(10,2) carried as integer
    * cents, so Σ|err| and Σactual are BIGINT and the headline ratio is
    * WAPE = Σ|err| / Σactual in exact fixed point — the scale-robust
    * percentage-error metric (per-row MAPE is a sum of unlike-denominator
    * rationals, unpresentable exactly, and blows up on near-zero days).
    *
    * This is the evaluation loop the reference's forecast-ingest pipeline
    * feeds but never closes (`azfunctions/InputBlobTrigger/processor.py`
    * ingests forecasts; nothing scores them): a calibrated baseline every
    * real forecaster must beat.
    *
    * Scale: two O(days) frames after the first aggregate; the self-join
    * on day+period and the weekday rollup are O(days) — independent of
    * raw row count.
    */
  def seasonalNaiveBacktest(
      orders: DataFrame, period: Int = 7): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val daily = orders
      .groupBy(datediff(col("o_orderdate"), epoch).cast("long").as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))
    val actual = daily.select(col("day"), col("cents").as("actual"))
    val forecast = daily.select((col("day") + period).as("day"),
      col("cents").as("forecast"))
    actual.join(forecast, "day")
      .groupBy(pmod(col("day"), lit(7L)).as("weekday_slot"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("actual") - col("forecast"))).as("sum_abs_err_cents"),
        sum(col("actual")).as("sum_actual_cents"))
      .select(col("weekday_slot"), col("n_days"), col("sum_abs_err_cents"),
        col("sum_actual_cents"),
        exactRatio(col("sum_abs_err_cents"), col("sum_actual_cents"), 6)
          .as("wape"))
      .orderBy("weekday_slot")
  }
}
