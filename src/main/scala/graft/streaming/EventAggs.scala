package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Per-user session-ish rollup: event counts and value totals by user and
    * day — the partition-pruned fact shape downstream jobs read.
    */
  def dailyUserRollup(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("d"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))

  /** Semi-structured extraction from the JSON-ish `props` column — stays a
    * narrow codegen'd expression (no UDF, no parser object churn).
    */
  def extractProps(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))

  /** Cardinality rollup with HyperLogLog++ — the approx-distinct the
    * SURVEY (§2.4) flags as the natural 100 TB addition: exact
    * count-distinct shuffles every distinct value; HLL shuffles a fixed
    * sketch per group. rsd 0.02 = ~1.5 KB sketches.
    */
  def approxUserCounts(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events.groupBy(col("event_type")).agg(
      approx_count_distinct(col("user_id"), rsd).as("approx_users"),
      count(lit(1)).as("n_events"))
}
