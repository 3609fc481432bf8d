package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ExactRatio.exactRatio

/** Event-time analytics over the `events` stream table — the streaming
  * surface the reference lacks (SURVEY.md §2.8: its forecast_meta rollup is
  * morally a grouped agg over event time; here it's expressed properly).
  *
  * Each transform below works identically on a batch DataFrame and a
  * streaming one (`spark.readStream`): pass either. Watermarking is applied
  * only when the input is streaming (it is a no-op marker on batch plans).
  */
object EventAggs {

  /** Tumbling-window counts/sums per event type. On a stream, late data
    * beyond `watermark` is dropped and state is bounded — the 100 TB/day
    * configuration is exactly this plan with a kafka/file source swapped in.
    */
  def windowedByType(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Sliding (overlapping) event-time windows: `size` window, `slide`
    * step — each event lands in size/slide windows (4 at the defaults).
    * Spark expands the windows at scan time (one row -> 4) and the
    * aggregate stays a plain two-phase hash agg; on a stream the same plan
    * runs with watermark-bounded state. The smoothing/trend shape tumbling
    * windows can't give (a burst at a window edge splits across tumbling
    * buckets; sliding windows see it whole).
    */
  def slidingByType(events: DataFrame, size: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(window(col("ts"), size, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Per-user session-ish rollup: event counts and value totals by user and
    * day — the partition-pruned fact shape downstream jobs read.
    */
  def dailyUserRollup(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("d"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))

  /** Distinct-user KMV sketch per tumbling window — the streaming face of
    * the mergeable sketch surface ([[graft.ops.Sketches]]): the
    * [[graft.functions.KmvAggregate]] state rides Structured Streaming's
    * ordinary stateful aggregation (its serialize/merge IS the state-store
    * contract), so each window holds O(k) longs regardless of cardinality
    * and late arrivals just merge in. Because the sketch is a pure
    * function of the input SET — order- and batching-invariant — a
    * stream's answer is BIT-IDENTICAL to the batch answer on the same
    * data (StreamingSpec pins this), and persisted window sketches
    * re-merge to day/week/all-time rollups without re-reading events:
    * the "distinct users per hour at 100 TB/day" shape.
    *
    * `approx_count_distinct` (see [[approxUserCounts]]) answers the same
    * question with HLL registers; this variant trades a little accuracy
    * headroom for exact cross-engine determinism and downstream
    * re-mergeability of the sketch column itself.
    */
  def windowedDistinctSketch(events: DataFrame, k: Int = 64,
      watermark: String = "1 hour"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.filter(col("user_id").isNotNull)
      .select(col("ts"), graft.ops.Sketches.hash60(col("user_id")).as("hv"))
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.functions.KmvAggregate.kmv(col("hv"), k).as("sketch"))
      .select(col("w.start").as("window_start"),
        graft.ops.Sketches.kmvEstimate(col("sketch"), k)
          .as("est_distinct_users"),
        size(col("sketch")).as("sketch_size"))
  }

  /** Top-k events by value per tumbling window — the fourth stream face
    * of the sketch family (frequency/CMS, distinct/KMV-HLL-bitmap,
    * quantile/GK, and now top-k): the per-hour "largest transactions"
    * monitor. Rides [[graft.functions.TopKAggregate]] as ordinary
    * stateful aggregation, so each window's state is a BOUNDED k-pair
    * heap regardless of event volume, map-side combine reduces every
    * partition to ≤ k pairs before the exchange, and late arrivals merge
    * in. Top-k of a union is the merge of top-ks (a semilattice, like
    * the other sketch states), so the stream answer is bit-identical to
    * the batch answer on the same data — StreamingSpec pins it. Output
    * exploded to atomic (window_start, rnk, user_id, value) rows under
    * the aggregate's deterministic (value DESC, user_id ASC) contract.
    */
  def windowedTopK(
      events: DataFrame, k: Int = 5, watermark: String = "1 hour"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .filter(col("user_id").isNotNull && col("value").isNotNull &&
        col("ts").isNotNull)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.functions.TopKAggregate
        .topk(col("value"), col("user_id"), k).as("top"))
      .select(col("w.start").as("window_start"),
        posexplode(col("top")).as(Seq("i", "e")))
      .select(col("window_start"), (col("i") + 1).cast("long").as("rnk"),
        col("e.id").as("user_id"), col("e.score").as("value"))
  }

  /** Distinct-user HLL registers per tumbling window — the constant-state
    * (2 KiB/window) streaming twin of [[windowedDistinctSketch]], built on
    * the engine-reproducible [[graft.functions.Hll]] rather than Spark's
    * `approx_count_distinct` precisely so the stream, the batch plan, AND
    * the DuckDB oracle produce bit-identical registers (max-merge is a
    * pure function of the input set: order-, batching-, and
    * late-arrival-invariant). Where the KMV window costs O(k) and is
    * exact below k, this window costs a flat 2 KiB at ANY cardinality —
    * the per-hour distinct monitor for a 100 TB/day event stream whose
    * hot hours see hundreds of millions of uniques. `zero_regs` rides
    * along as the estimator-regime indicator.
    */
  def windowedDistinctHll(
      events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    import graft.functions.Hll
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("ts"), graft.ops.Sketches.hash60(col("user_id")).as("hv"))
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(Hll.hll(col("hv")).as("regs"))
      .select(col("w.start").as("window_start"),
        Hll.hllEstimate(col("regs")).as("est_distinct_users"),
        Hll.hllZeroRegs(col("regs")).as("zero_regs"))
  }

  /** EXACT distinct users per tumbling window via the roaring-style
    * bitmap ([[graft.functions.Bitmap]]) riding ordinary stateful
    * aggregation — the third distinct-counter stream face: KMV (O(k),
    * exact below k), HLL (flat 2 KiB, ~2.3 % past 5 k), and this
    * (EXACT at any cardinality, ≤ 2 B per distinct id). Union state
    * composes under partial agg, state-store merge, and late arrivals,
    * so stream == batch == the oracle's plain count DISTINCT. The fit:
    * dense non-negative id spaces (surrogate user ids) where "exact
    * uniques per window" is a billing/delivery number an estimate
    * can't be.
    */
  def windowedDistinctBitmap(
      events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    import graft.functions.Bitmap
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("ts"), col("user_id").cast("long").as("uid"))
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(Bitmap.bitmapBuild(col("uid")).as("bm"))
      .select(col("w.start").as("window_start"),
        Bitmap.bitmapCardinality(col("bm")).as("n_distinct_users"))
  }

  /** Count-min sketch per tumbling window — the streaming face of the
    * frequency leg of the sketch triad ([[graft.ops.Sketches
    * .cmsHeavyHitters]] is the batch face). The sketch is maintained as
    * an ordinary stateful aggregation over (window, row, bucket) — cell
    * counts are additive, so partial aggregation, state-store merging,
    * and late arrivals all compose exactly, and a stream's sketch is
    * BIT-IDENTICAL to the batch sketch on the same data (order- and
    * batching-invariant; StreamingSpecs pin it).
    *
    * State is O(windows-in-watermark × d × w) cells regardless of key
    * cardinality — the always-on "what's hot this hour" monitor at
    * 100 TB/day, where an exact per-key count table would itself be
    * data-sized. Probe any key's windowed frequency downstream from the
    * persisted cells: est = min over the d rows of its bucket count
    * (one-sided, est ≥ exact — see the batch oracle's certificate).
    *
    * Bucket hashes are the same md5-derived engine-reproducible family as
    * every hash in [[graft.ops.Sketches]].
    */
  def windowedFrequencySketch(events: DataFrame, keyCol: String = "event_type",
      d: Int = 4, w: Int = 256, watermark: String = "1 hour"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.filter(col(keyCol).isNotNull)
      .select(col("ts"),
        explode(sequence(lit(0), lit(d - 1))).as("j"),
        col(keyCol).cast("string").as("key"))
      .select(col("ts"), col("j"),
        (conv(substring(md5(concat(col("j").cast("string"), lit(":"),
          col("key"))), 1, 8), 16, 10).cast("long") % w).as("bucket"))
      .groupBy(window(col("ts"), "1 hour").as("wnd"), col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("wnd.start").as("window_start"), col("j"), col("bucket"),
        col("cnt"))
  }

  /** Per-window value-quantile sketch — the streaming face of the
    * quantile leg ([[graft.ops.Sketches.quantileSketch]] is the batch
    * face): the bottom-k-by-hash uniform sample
    * ([[graft.functions.SampleKAggregate]]) rides Structured Streaming's
    * stateful aggregation exactly like the KMV above — its
    * serialize/merge IS the state-store contract, each window holds O(k)
    * (hash, value) pairs at any row count, and the sample is a pure
    * function of the input SET, so stream == batch bit-for-bit and the
    * persisted window samples re-merge into day/week rollups without
    * re-reading events.
    *
    * The estimate is rank selection on the sorted sample (a data value,
    * no interpolation); with n ≤ k rows in a window it is exact.
    */
  def windowedQuantileSketch(events: DataFrame, k: Int = 64,
      watermark: String = "1 hour"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    def est(q: Double): Column = {
      val vs = array_sort(expr("transform(sample, x -> x.v)"))
      round(element_at(vs, ceil(lit(q) * size(vs)).cast("int")), 2)
    }
    src.filter(col("value").isNotNull && col("event_id").isNotNull)
      .select(col("ts"), col("value").cast("double").as("v"),
        graft.ops.Sketches.hash60(col("event_id")).as("hv"))
      .groupBy(window(col("ts"), "1 hour").as("wnd"))
      .agg(graft.functions.SampleKAggregate.sampleK(col("hv"), col("v"), k)
        .as("sample"), count(lit(1)).as("n_rows"))
      .select(col("wnd.start").as("window_start"), col("n_rows"),
        size(col("sample")).cast("long").as("m"),
        est(0.5).as("est_p50"), est(0.9).as("est_p90"))
  }

  /** Robust daily-volume anomaly detection per event type: median/MAD
    * (median absolute deviation) instead of mean/stddev, so one spike day
    * cannot poison its own baseline. A day is anomalous when its count
    * deviates from the type's median by more than `k` MADs; `robust_z` is
    * the continuous score (NULL when MAD = 0 — a flat series has no scale).
    *
    * Scale shape: ONE size-of-data pass (the daily count aggregate);
    * everything after operates on the O(types x days) rollup, whose
    * median/MAD joins AQE broadcasts. Medians of integer counts
    * interpolate at exact binary halves, so the flag compares exactly
    * cross-engine.
    */
  def dailyAnomalies(events: DataFrame, k: Double = 3.0): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"))
    val med = daily.groupBy("event_type")
      .agg(expr("percentile(cnt, 0.5)").as("med"))
    val dev = daily.join(med, "event_type")
      .withColumn("dev", abs(col("cnt") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(mad, "event_type")
      .select(col("event_type"), col("d"), col("cnt"), col("med"), col("mad"),
        when(col("mad") > 0, round(col("dev") / col("mad"), 4)).as("robust_z"),
        (col("dev") > lit(k) * col("mad")).as("is_anomaly"))
  }

  /** Semi-structured extraction from the JSON-ish `props` column — stays a
    * narrow codegen'd expression (no UDF, no parser object churn).
    */
  def extractProps(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))

  /** Ordered funnel analysis: of the users who viewed, how many clicked
    * within `clickWithin` of their FIRST view, and then purchased within
    * `purchaseWithin` of that first qualifying click. The classic
    * product-analytics query (reference analog: the matview read path is a
    * one-stage version of this; SURVEY.md §3.3).
    *
    * Shape: ONE shuffle on user_id; three stacked per-user window minima
    * (each stage's first-event time conditions on the previous stage's
    * column — no self-joins, no re-exchange: the windows and the per-user
    * collapse all reuse the same clustering), then a single-row count
    * aggregate. Per-user state is three timestamps, so the plan is
    * identical at 100 TB — the only growth axis is the user-hash exchange.
    */
  def funnel(events: DataFrame,
             clickWithin: String = "12 hours",
             purchaseWithin: String = "48 hours"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = Window.partitionBy("user_id")
    val staged = events
      .withColumn("first_view",
        min(when(col("event_type") === "view", col("ts"))).over(perUser))
      .withColumn("first_click",
        min(when(col("event_type") === "click" &&
          col("ts") >= col("first_view") &&
          col("ts") <= col("first_view") + expr(s"INTERVAL $clickWithin"),
          col("ts"))).over(perUser))
      .withColumn("first_purchase",
        min(when(col("event_type") === "purchase" &&
          col("ts") >= col("first_click") &&
          col("ts") <= col("first_click") + expr(s"INTERVAL $purchaseWithin"),
          col("ts"))).over(perUser))
    staged
      .groupBy("user_id")
      .agg(first(col("first_view")).as("fv"),
        first(col("first_click")).as("fc"),
        first(col("first_purchase")).as("fp"))
      .agg(count(lit(1)).as("n_users"),
        count(col("fv")).as("n_viewed"),
        count(col("fc")).as("n_clicked"),
        count(col("fp")).as("n_purchased"))
  }

  /** Cardinality rollup with HyperLogLog++ — the approx-distinct the
    * SURVEY (§2.4) flags as the natural 100 TB addition: exact
    * count-distinct shuffles every distinct value; HLL shuffles a fixed
    * sketch per group. rsd 0.02 = ~1.5 KB sketches.
    */
  def approxUserCounts(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events.groupBy(col("event_type")).agg(
      approx_count_distinct(col("user_id"), rsd).as("approx_users"),
      count(lit(1)).as("n_events"))

  /** Cohort retention: users grouped by first-seen date, distinct users
    * active again `offset` days later for each offset ≤ `maxOffsetDays` —
    * the classic retention triangle in long form. Two exchanges, both on
    * bounded state: the per-user first-seen aggregate (O(users)), and the
    * (cohort, offset) distinct-count whose key space is
    * O(days × maxOffset). The cohort join hits the per-user table on its
    * existing user_id exchange.
    */
  def retention(events: DataFrame, maxOffsetDays: Int = 7): DataFrame = {
    val e = events.filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts").cast("date").as("d"))
    val cohorts = e.groupBy("user_id").agg(min("d").as("cohort"))
    e.join(cohorts, "user_id")
      .withColumn("offset_days", datediff(col("d"), col("cohort")))
      .filter(col("offset_days") <= maxOffsetDays)
      .groupBy("cohort", "offset_days")
      .agg(countDistinct("user_id").as("n_users"))
  }

  /** Cohort LTV (lifetime-value) curve: users grouped by first-seen date,
    * revenue accumulated by days-since-signup — the "how much is a day-0
    * cohort worth by day 14" table that retention counts can't answer.
    * Output per (cohort, age_days): that day's revenue, the running
    * cumulative, the cohort size, and cumulative revenue per cohort user.
    *
    * Plan: first-seen is one user-keyed aggregate, re-joined onto the
    * events (both sides ride the same user_id exchange); the curve is a
    * grouped aggregate to O(cohorts·ages) plus a cumulative window on that
    * bounded table, cohort sizes broadcast.
    */
  def ltvCurve(events: DataFrame, maxAgeDays: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events.filter(col("user_id").isNotNull && col("value").isNotNull)
      .select(col("user_id"), col("ts").cast("date").as("d"), col("value"))
    val cohorts = e.groupBy("user_id").agg(min("d").as("cohort"))
    val sizes = cohorts.groupBy("cohort")
      .agg(count(lit(1)).as("cohort_users"))
    val rev = e.join(cohorts, "user_id")
      .withColumn("age_days", datediff(col("d"), col("cohort")))
      .filter(col("age_days") <= maxAgeDays)
      .groupBy("cohort", "age_days")
      .agg(sum("value").as("__rev"))
    val w = Window.partitionBy("cohort").orderBy("age_days")
    rev.withColumn("__cum", sum("__rev").over(w))
      .join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("age_days"),
        round(col("__rev"), 6).as("revenue"),
        round(col("__cum"), 6).as("cum_revenue"),
        col("cohort_users"),
        round(col("__cum") / col("cohort_users"), 6).as("ltv_per_user"))
  }

  /** Per-user feature snapshot as of the log horizon: recency, frequency
    * at two lookback windows, monetary total, and behavioral breadth — the
    * feature-store row a churn/propensity model trains on. One user-keyed
    * aggregate with conditional sums; the horizon rides a 1-row broadcast.
    */
  def userSnapshot(events: DataFrame): DataFrame = {
    val e = events.filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts").cast("date").as("d"),
        col("value"), col("event_type"))
    val horizon = e.agg(max("d").as("h")) // 1 row
    e.crossJoin(broadcast(horizon))
      .groupBy("user_id")
      .agg(
        datediff(max("h"), max("d")).as("days_since_last"),
        count(lit(1)).as("n_events"),
        sum(when(datediff(col("h"), col("d")) < 7, 1L).otherwise(0L))
          .as("n_events_7d"),
        sum(when(datediff(col("h"), col("d")) < 28, 1L).otherwise(0L))
          .as("n_events_28d"),
        round(sum(coalesce(col("value"), lit(0.0))), 6).as("total_value"),
        countDistinct("event_type").as("n_event_types"))
  }

  /** Top event-type trigrams: each user's event stream in (ts, event_id)
    * order contributes its consecutive 3-step paths; output the `k` most
    * frequent paths — the "what do users do next" behavioral summary.
    * The path build is two leads over ONE user_id exchange (no
    * per-user collect_list buffering — state per row is O(1)); the count
    * is a second, already-reduced aggregate, and the top-k moves only
    * O(paths) rows through a TakeOrdered.
    */
  /** Last-touch attribution: each purchase annotated with the user's
    * latest non-purchase event at-or-before it — the credit-assignment
    * query behind every "which channel drove this?" report, built on
    * [[graft.operators.AsOfJoin]] (ONE user-keyed exchange + window, no
    * per-purchase scans).
    *
    * Touches are first collapsed to one per (user, ts) — arg-max event_id
    * — because as-of semantics pick "the latest right row ≤ t" and two
    * touches at the SAME timestamp would otherwise leave the winner to
    * engine-internal sort stability. The dedup rides the same user
    * exchange the as-of window needs.
    */
  def lastTouchAttribution(events: DataFrame): DataFrame = {
    val purchases = events
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val touches = events
      .filter(col("event_type") =!= "purchase" && col("user_id").isNotNull)
      .groupBy(col("user_id"), col("ts").as("touch_ts"))
      .agg(max(struct(col("event_id"), col("event_type"))).as("m"))
      .select(col("user_id"), col("touch_ts"),
        col("m.event_id").as("touch_id"), col("m.event_type").as("touch_type"))
    graft.operators.AsOfJoin.leftAsOf(
      purchases, touches, "user_id", "ts", "touch_ts",
      Seq("touch_id", "touch_type"))
  }

  /** CUSUM changepoint scan over the daily event-count series: the day
    * with the largest |running sum of (count − mean)| is where the level
    * shift happened (Page's cumulative-sum statistic). Output one row:
    * the change day, its CUSUM value, the series mean, and the day count.
    *
    * The series is the O(days) daily aggregate, so the ordered running
    * sum is a bounded unpartitioned window (same contract as
    * [[graft.ops.TextAnalysis.vocabTopP]]); the mean attaches as a 1-row
    * broadcast and is ROUNDED first so the cusum — and therefore the
    * argmax day — is engine-exact, not ULP-sensitive.
    */
  def changepoint(events: DataFrame): DataFrame = {
    val daily = events.groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("n"))
    val stats = daily.agg(
      round(avg("n"), 6).as("mu"), count(lit(1)).as("days"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    daily.crossJoin(broadcast(stats))
      .withColumn("cusum", round(sum(col("n") - col("mu")).over(w), 6))
      .orderBy(abs(col("cusum")).desc, col("day").asc).limit(1)
      .select(col("day").as("change_day"), col("cusum"),
        col("mu").as("mean_daily"), col("days"))
  }

  /** DAU / trailing-7-day WAU stickiness per day — the engagement ratio
    * (1/7 = every user once a week, 1 = everyone daily). The trailing
    * distinct count never re-scans windows: each (day, user) activity row
    * is exploded to the ≤7 future days it supports and distinct-counted
    * there — turning a sliding DISTINCT (which no engine aggregates
    * incrementally) into two plain hash aggregates. Cost is a bounded 7×
    * multiply of the already-deduplicated (day, user) table, not of the
    * raw events.
    */
  def stickiness(events: DataFrame): DataFrame = {
    val dayUsers = events.filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val dau = dayUsers.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = dayUsers
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("wday"))
      .distinct()
      .groupBy("wday").agg(count(lit(1)).as("wau"))
    dau.join(wau, dau("day") === wau("wday"))
      .select(col("day"), col("dau"), col("wau"),
        exactRatio(col("dau"), col("wau"), 6).as("stickiness"))
  }

  /** RFM user segmentation: per-user Recency (days since last event,
    * against the corpus max date), Frequency (event count), Monetary
    * (value sum), each scored 1–4 by its quartile across users, plus the
    * concatenated segment code ("444" = recent, frequent, high-value).
    *
    * Scores bin by VALUE against quartile bounds (`1 + #bounds strictly
    * below x`, recency inverted so fresher = higher) — `ntile` would
    * split tied users by row order and never reproduce cross-engine; the
    * bound rule puts every tied user in the same bucket on both engines.
    *
    * Plan: ONE size-of-data grouped aggregate to the O(users) table; the
    * reference date, then all nine quartile bounds, come from two bounded
    * re-aggregations of it (1-row broadcasts); scoring is a narrow
    * codegen'd projection. Nothing after the first exchange scales with
    * the data.
    */
  def rfmSegments(events: DataFrame): DataFrame = {
    val users = events.filter(col("user_id").isNotNull)
      .groupBy("user_id")
      // m rounded AT the aggregate: downstream quartile bounds and score
      // comparisons then run on engine-identical doubles (an unrounded sum
      // could flip a boundary user's bucket via summation-order ULPs)
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("f"),
        round(sum(col("value")), 6).as("m"))
    val ref = users.agg(max(col("last_ts")).as("ref_ts"))
    val base = users.crossJoin(broadcast(ref))
      .select(col("user_id"),
        datediff(to_date(col("ref_ts")), to_date(col("last_ts")))
          .cast("double").as("r_days"),
        col("f").cast("double").as("f"), col("m"))
    val bounds = base.agg(
      expr("percentile(r_days, array(0.25, 0.5, 0.75))").as("rb"),
      expr("percentile(f, array(0.25, 0.5, 0.75))").as("fb"),
      expr("percentile(m, array(0.25, 0.5, 0.75))").as("mb"))
    def below(bs: Column, x: Column): Column =
      size(filter(bs, b => b < x)).cast("long")
    base.crossJoin(broadcast(bounds))
      .select(col("user_id"), col("r_days").cast("long").as("r_days"),
        col("f").cast("long").as("f"), col("m"),
        (lit(4L) - below(col("rb"), col("r_days"))).as("r_score"),
        (lit(1L) + below(col("fb"), col("f"))).as("f_score"),
        (lit(1L) + below(col("mb"), col("m"))).as("m_score"))
      .withColumn("segment",
        concat(col("r_score"), col("f_score"), col("m_score")))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next event type | current), Laplace-smoothed with pseudo-count
    * `alpha` over the observed destination set — the behavioral model
    * behind next-action prediction and anomalous-session scoring
    * (a session's likelihood is the product of its transition probs).
    *
    * Same exchange discipline as [[topPaths]]: ONE user-keyed window with
    * O(1) state per row (a single lead) builds the bigrams; the transition
    * counts, per-source totals, and destination-set size are all
    * aggregates of the O(types²) cell table, attached back by broadcast.
    */
  def markovTransitions(events: DataFrame, alpha: Double = 1.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cells = events.filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy("from_type").agg(sum("n").as("n_from"))
    val k = cells.agg(count_distinct(col("to_type")).as("k"))
    // Laplace-smoothed (n+α)/(n_from+αk) is an exact rational for
    // integral α (the default) — present it in exact fixed point; a
    // fractional α falls back to the double path (its true value is not
    // rational over 10^7, so the tie class is unreachable anyway).
    val p =
      if (alpha == math.rint(alpha) && alpha >= 0) {
        val a = alpha.toLong
        exactRatio(col("n") + lit(a), col("n_from") + lit(a) * col("k"), 6)
      } else
        round((col("n") + alpha) / (col("n_from") + lit(alpha) * col("k")), 6)
    cells.join(broadcast(totals), "from_type")
      .crossJoin(broadcast(k))
      .select(col("from_type"), col("to_type"), col("n"), p.as("p"))
  }

  def topPaths(events: DataFrame, k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events.filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("e2").as("step2"),
        col("e3").as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(k)
  }

  /** Consecutive event-type transition census per user — the first-order
    * sequence-mining view ("what follows what"): each user's event stream
    * ordered by (ts, event_id), adjacent type pairs counted corpus-wide.
    * The deterministic cousin of [[markovTransitions]]'s probability
    * matrix: raw pair counts, no normalization, full (t_a, t_b) ordering
    * so the output needs no top-k cut (type vocabularies are small).
    *
    * Scale: one keyed window (per-user lead — partition sizes are a
    * user's event count) + one partial-aggregated census over O(types²)
    * groups. Nothing global.
    */
  def typeBigrams(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull && col("event_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("t_a"), col("next_type").as("t_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("t_a", "t_b")
  }
  /** Multi-touch attribution over the purchase lookback window — the
    * models beyond [[lastTouchAttribution]]'s single-touch credit:
    * `linear` splits each purchase's credit equally across its touches;
    * `u_shaped` gives 40 % to the first and last touch and splits the
    * remaining 20 % across the middles (1-touch paths keep 100 %,
    * 2-touch paths 50/50 — the standard position-based degenerations).
    *
    * Credit is EXACT e6 fixed point: per-touch credit is an integer
    * `div` of 1,000,000 (identical truncation in both engines), so the
    * per-channel totals are BIGINT sums — no double is ever split. The
    * per-purchase remainder lost to truncation (< n·1e-6) is
    * deterministic, identical cross-engine, and intentionally NOT
    * redistributed (a redistribution rule would need its own tie
    * semantics for zero gain). Purchases with no touch inside the
    * window are excluded — last-touch's 'direct' bucket covers them.
    *
    * Attribution horizon: besides the time `lookback`, each purchase
    * keeps only its `maxTouches` MOST RECENT touches — the knob that
    * bounds the per-purchase join product when a user's event density
    * grows (measured: GenScale's sf1 holds users fixed and multiplies
    * density 10×, inflating the uncapped window join 100×, 221 k → 22 M
    * pairs). "First touch" under the U model then means first within
    * the horizon, the standard rendering once paths exceed the cap.
    *
    * Plan: one keyed (user) join bounded by the lookback window, one
    * keyed (purchase) window for the recency cap + positions, one
    * O(channels) rollup; the credit-share denominator is a 1-row
    * broadcast.
    */
  def multiTouchAttribution(
      events: DataFrame, lookback: String = "7 days",
      model: String = "linear", maxTouches: Int = 64): DataFrame = {
    require(Set("linear", "u_shaped")(model),
      s"multiTouchAttribution: unknown model '$model'")
    require(maxTouches >= 1,
      s"multiTouchAttribution: maxTouches=$maxTouches below 1")
    import org.apache.spark.sql.expressions.Window
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("event_id").as("pid"))
    val touches = events.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts").as("tts"),
        col("event_id").as("tid"), col("event_type"))
    val joined = purchases.join(touches, Seq("user_id"))
      .filter(col("tts") <= col("pts") &&
        col("tts") >= col("pts") - expr(s"INTERVAL $lookback"))
    val recency = Window.partitionBy("pid")
      .orderBy(col("tts").desc, col("tid").desc)
    val capped = joined
      .withColumn("__recent", row_number().over(recency))
      .filter(col("__recent") <= maxTouches)
      .drop("__recent")
    val w = Window.partitionBy("pid").orderBy(col("tts"), col("tid"))
    val positioned = capped
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("pid"))
        .cast("long"))
    val credit = model match {
      case "linear" => expr("CAST(1000000 AS BIGINT) div n")
      case "u_shaped" => when(col("n") === 1L, 1000000L)
        .when(col("n") === 2L, 500000L)
        .when(col("pos") === 1L || col("pos") === col("n"), 400000L)
        .otherwise(expr("CAST(200000 AS BIGINT) div (n - 2)"))
    }
    val perChannel = positioned.withColumn("credit_e6", credit)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_touches"), sum("credit_e6").as("credit_e6"))
    val total = perChannel.agg(sum("credit_e6").as("total_e6"))
    perChannel.crossJoin(broadcast(total))
      .select(col("event_type"), col("n_touches"), col("credit_e6"),
        exactRatio(col("credit_e6"), col("total_e6"), 6).as("credit_share"))
      .orderBy("event_type")
  }

  /** Point-in-time (leakage-safe) training-set construction — the
    * churn-label factory: features computed ONLY from events strictly
    * before `cutoff`, the label ONLY from [cutoff, cutoff + labelDays) —
    * the temporal wall that keeps target information out of the features
    * (the leakage class that silently inflates every offline metric).
    * Users with no pre-cutoff activity are excluded (nothing to featurize);
    * `label` = 1 iff the user acts inside the label window.
    *
    * All features are integers (counts, distinct days/types, recency in
    * days), so the output is hash-exact cross-engine. One shuffle per
    * side on user_id; label attaches as a left join on the same key.
    * At 100 TB both scans prune on the ts predicate (partition/zone-map
    * pruning on event time is the standing layout assumption).
    */
  def pointInTimeTrainingSet(
      events: DataFrame, cutoff: String = "2024-01-24 00:00:00",
      labelDays: Int = 7): DataFrame = {
    val cut = to_timestamp(lit(cutoff))
    val labelEnd = cut + expr(s"INTERVAL $labelDays DAYS")
    val feats = events.filter(col("ts") < cut)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        count_distinct(to_date(col("ts"))).as("n_active_days"),
        datediff(to_date(cut), max(to_date(col("ts"))))
          .cast("long").as("days_since_last"),
        count_distinct(col("event_type")).as("n_types"))
    val labels = events
      .filter(col("ts") >= cut && col("ts") < labelEnd)
      .select(col("user_id")).distinct()
      .withColumn("label", lit(1L))
    feats.join(labels, Seq("user_id"), "left")
      .withColumn("label", coalesce(col("label"), lit(0L)))
      .orderBy("user_id")
  }

  /** Watermark-lateness census — how much data would a given watermark
    * delay discard? Each event type is its own stream (the keyed
    * formulation that scales; a single global arrival order would funnel
    * everything through one partition): an event is LATE iff its event
    * time sits more than `delayMinutes` behind the maximum event time
    * already seen in its stream (arrival order = event_id). The number a
    * team reads before choosing `withWatermark`'s delay — too tight
    * silently drops the tail this census makes visible.
    *
    * Times compare as exact integer MICROSECONDS (unix_micros /
    * DuckDB epoch_us — the suite's timestamp-comparison rule); one
    * running-max window and one aggregate, both riding a single
    * event_type exchange.
    */
  def latenessCensus(
      events: DataFrame, delayMinutes: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    events.select(col("event_type"), col("event_id"),
      unix_micros(col("ts")).as("tus"))
      .withColumn("late",
        // null watermark (first row of a stream) -> otherwise-branch 0
        when(col("tus") < (max(col("tus")).over(w)
          - lit(delayMinutes * 60000000L)), 1L).otherwise(0L))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("late").as("n_late"))
      .select(col("event_type"), col("n_events"), col("n_late"),
        exactRatio(col("n_late"), col("n_events"), 6).as("late_share"))
      .orderBy("event_type")
  }

  /** Diurnal activity profile: per (event type, hour-of-day) counts and
    * each hour's share of its type's traffic — the seasonality
    * fingerprint anomaly baselines and capacity plans are calibrated
    * against (an alert threshold that ignores the 3am trough pages
    * nobody for real incidents and everyone at lunch).
    *
    * Two partial-aggregated groupBys riding one event_type exchange
    * (the share join keys on the same grouping); shares in exact fixed
    * point. Hours are naive-UTC on both engines (the suite's event-time
    * convention).
    */
  def hourlyProfile(events: DataFrame): DataFrame = {
    val h = events
      .select(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .groupBy("event_type", "hod").agg(count(lit(1)).as("n_events"))
    val tot = h.groupBy("event_type").agg(sum("n_events").as("n_total"))
    h.join(tot, "event_type")
      .select(col("event_type"), col("hod"), col("n_events"),
        exactRatio(col("n_events"), col("n_total"), 6).as("share"))
      .orderBy("event_type", "hod")
  }
}
