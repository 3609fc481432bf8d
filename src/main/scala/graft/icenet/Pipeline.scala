package graft.icenet

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end IceNet ingest pipeline — the Spark re-expression of the
  * reference's per-file run (azfunctions/InputBlobTrigger/__init__.py:14-32):
  * load -> update_geometries -> update_forecasts -> update_latest_forecast ->
  * update_forecast_meta (view refresh deliberately BEFORE meta upsert,
  * matching __init__.py:22-26).
  *
  * The reference's five PostgreSQL round-trips collapse into five DataFrame
  * plans over one warehouse directory. Re-running any file is a fixed point:
  * cells and forecasts are first-write-wins, meta is last-write-wins, the
  * latest view is a full recompute — identical convergence semantics to the
  * reference's ON CONFLICT clauses (processor.py:256,333,395-401,444-448).
  */
class Pipeline(spark: SparkSession, warehouse: String, hemi: Hemisphere) {
  private val h = hemi.name
  val cellPath: String = s"$warehouse/${h}_cell"
  val forecastPath: String = s"$warehouse/${h}_forecast"
  val metaPath: String = s"$warehouse/forecast_meta"
  val latestPath: String = s"$warehouse/${h}_forecast_latest"
  val quarantinePath: String = s"$warehouse/${h}_forecast_quarantine"

  /** Run the whole pipeline for one raw long-form file frame. The view
    * refresh uses [[updateLatestIncremental]] (provably equal to the full
    * recompute, PipelineSpec) so a one-date ingest touches one date's
    * partitions end to end; [[updateLatest]] remains the full-recompute
    * escape hatch (e.g. after a manual fact-table repair).
    */
  def ingest(raw: DataFrame): Unit = {
    val loaded = Ingest.load(raw).cache()
    try {
      updateGeometries(loaded)
      updateForecasts(loaded)
      updateLatestIncremental(loaded)
      updateMeta(loaded)
    } finally loaded.unpersist()
  }

  /** Stage 2 (processor.py:192-266): distinct centroid axes -> cross join ->
    * WKT rings -> first-write-wins insert keyed on the centroid pair
    * (the reference's UNIQUE(centroid_x, centroid_y), processor.py:206).
    */
  def updateGeometries(loaded: DataFrame): Unit = {
    val xs = loaded.select(col("xc_m").as("centroid_x")).distinct()
    val ys = loaded.select(col("yc_m").as("centroid_y")).distinct()
    val cells = Geometry.buildCells(xs, ys, hemi.north)
    TableOps.insertIgnore(spark, cellPath, cells, Seq("centroid_x", "centroid_y"))
  }

  /** Stage 3 (processor.py:268-344): resolve cell_id by left equi-join on the
    * centroid pair (J1) — cells are O(10^5) rows, so broadcast — then
    * first-write-wins insert on the natural key (processor.py:283).
    * Partitioned by generation date, replacing the reference's
    * date-column b-tree indexes (processor.py:286-288) with pruning.
    *
    * FK integrity (the reference's fk_cell_id constraint,
    * processor.py:283-284): a forecast row whose centroid pair resolves to
    * no known cell is QUARANTINED to [[quarantinePath]] and counted — never
    * silently inserted with a NULL cell_id, which would corrupt every
    * downstream cell join. Returns the number of quarantined rows.
    */
  def updateForecasts(loaded: DataFrame): Long = {
    val cells = TableOps.read(spark, cellPath)
      .select("cell_id", "centroid_x", "centroid_y")
    val withCell = loaded.join(
      broadcast(cells),
      loaded("xc_m") === cells("centroid_x") && loaded("yc_m") === cells("centroid_y"),
      "left")
    val facts = withCell.select(
      col("date_forecast_generated"), col("date_forecast_for"), col("cell_id"),
      col("xc_m"), col("yc_m"),
      col("sea_ice_concentration_mean"), col("sea_ice_concentration_stddev"))
    val bad = facts.filter(col("cell_id").isNull)
    val nBad = bad.count()
    if (nBad > 0) bad.write.mode("append").parquet(quarantinePath)
    TableOps.insertIgnore(spark, forecastPath,
      facts.filter(col("cell_id").isNotNull).drop("xc_m", "yc_m"),
      Seq("date_forecast_generated", "date_forecast_for", "cell_id"),
      partitionCols = Seq("date_forecast_generated"))
    nBad
  }

  /** Stage 4 (processor.py:409-451): the latest-forecast materialized view —
    * scalar-subquery max-date filter (J4/A3) + inner join to cells (J2) +
    * GROUP-BY-all dedup (A4) + row_number id (W1) + full-refresh overwrite
    * (S7). The reference's `PARTITION BY true` row_number is nondeterministic
    * (processor.py:420); we order by the view's natural key so ids are
    * stable. Single-partition window is fine here: the view holds ONE
    * generation date (never the whole fact table).
    */
  def latestView(): DataFrame = {
    val facts = TableOps.read(spark, forecastPath)
    // scalar-subquery max as a broadcast single-row join: one plan, no
    // driver-side action; the fact side is filtered on its PARTITION column,
    // so dynamic partition pruning keeps the scan to the latest date's files.
    val maxd = facts.agg(max("date_forecast_generated").as("__maxd"))
    viewOf(facts
      .join(broadcast(maxd), col("date_forecast_generated") === col("__maxd"))
      .drop("__maxd"))
  }

  /** The view body shared by the full and incremental refresh paths —
    * cells join, projection, GROUP-BY-all dedup, deterministic surrogate
    * id. Keeping it single-sourced is what makes "incremental == full"
    * (PipelineSpec) a structural guarantee rather than a copy-paste
    * coincidence.
    *
    * The surrogate id is the SCALABLE global row number (range-partitioned,
    * [[graft.operators.GlobalRowNumber]]), not a bare un-partitioned
    * window: the view is one generation date, but one date is lead-times x
    * full grid (~17M rows on the production 432x432 EASE grid) — big
    * enough that a single-partition sort per ingest is the write path's
    * bottleneck, and it warned on every bench run. Ids are identical
    * ((date_forecast_for, cell_id) is unique per view).
    */
  private def viewOf(facts: DataFrame): DataFrame = {
    val cells = TableOps.read(spark, cellPath).select("cell_id", "geom_4326")
    graft.operators.GlobalRowNumber.withGlobalRowNumber(
      facts
        .join(broadcast(cells), Seq("cell_id"))
        .select("date_forecast_generated", "date_forecast_for", "cell_id",
          "sea_ice_concentration_mean", "sea_ice_concentration_stddev", "geom_4326")
        .distinct(),
      "forecast_id", Seq(col("date_forecast_for"), col("cell_id")))
  }

  def updateLatest(): Unit =
    TableOps.overwriteView(spark, latestPath, latestView())

  /** Incremental S7 — the scale path the reference lacks: its
    * `REFRESH MATERIALIZED VIEW` recomputes the view from ALL facts on
    * every ingest (processor.py:444-448), which at 100 TB re-reads years
    * of partitions to re-derive one date. The view only ever shows the
    * max generation date, so its next state is decidable from two bounded
    * scalars (incoming date, current view date):
    *
    *  - incoming >= current: the view's next content is exactly the
    *    incoming date's facts — rebuild from THAT one partition
    *    (partition-pruned scan), identical result to the full recompute.
    *  - incoming < current (a late replay): the view is already correct;
    *    nothing runs at all.
    *
    * PipelineSpec asserts equality with [[latestView]]'s full recompute
    * after new-date, same-date and older-date ingests.
    */
  def updateLatestIncremental(loaded: DataFrame): Unit = {
    val incoming = loaded.agg(max("date_forecast_generated")).head().getDate(0)
    if (!TableOps.exists(spark, forecastPath)) return
    // the decision scalar is the FACT table's max date, never the view's:
    // a crashed earlier ingest can leave facts ahead of the view, and an
    // incoming-vs-view comparison would silently pin the view to a stale
    // date until a newer drop arrived. Both scalars are bounded
    // (partition-column aggregates). An EMPTY incoming frame (incoming ==
    // null) does not return early: this method is the designated heal point
    // for a crash that landed between updateForecasts and the view refresh,
    // and an empty drop must still detect facts-ahead-of-view and repair it
    // (it falls through to the stale-view branch below).
    val factsMax = TableOps.read(spark, forecastPath)
      .agg(max("date_forecast_generated")).head().getDate(0)
    if (factsMax == null) return // fact table exists but is empty: no view state
    val current =
      if (TableOps.exists(spark, latestPath))
        Option(TableOps.read(spark, latestPath)
          .agg(max("date_forecast_generated")).head().getDate(0))
      else None
    if (incoming != null && incoming == factsMax) {
      // this ingest IS the newest date: the view's next content is exactly
      // that date's facts — rebuild from the one partition-pruned date
      TableOps.overwriteView(spark, latestPath,
        viewOf(TableOps.read(spark, forecastPath)
          .filter(col("date_forecast_generated") === lit(incoming))))
    } else if (!current.contains(factsMax)) {
      // view is stale or absent (crash recovery, manual repair) and this
      // ingest is not the max date: only the full recompute is correct
      updateLatest()
    }
    // else: view already shows the max date and this ingest was older —
    // nothing to refresh (the late-replay fast path)
  }

  /** Registers the warehouse tables and the latest view in the session
    * catalog, so a downstream SQL consumer (SURVEY §3.3's read path — the
    * reference's readers query PostgreSQL tables/views by name) can
    * `spark.sql("SELECT ... FROM north_forecast_latest")` without touching
    * the Scala API. Names mirror the reference's table names: `<hemi>_cell`,
    * `<hemi>_forecast`, `<hemi>_forecast_latest`, `forecast_meta`.
    *
    * Views are registered over the CURRENT parquet state (the file listing
    * is captured at registration, Spark's temp-view semantics) — call again
    * after ingests to refresh, exactly like the reference's readers see a
    * refreshed materialized view only after `REFRESH`. Tables that don't
    * exist yet are skipped, so registration is safe at any pipeline stage.
    */
  def registerSqlViews(): Unit = {
    def reg(name: String, path: String): Unit =
      if (TableOps.exists(spark, path))
        TableOps.read(spark, path).createOrReplaceTempView(name)
    reg(s"${h}_cell", cellPath)
    reg(s"${h}_forecast", forecastPath)
    reg(s"${h}_forecast_latest", latestPath)
    reg("forecast_meta", metaPath)
  }

  /** Stage 5 (processor.py:346-407): meta rollup — grouped MIN/MAX/COUNT over
    * the generation date (A2) upserted last-write-wins on
    * (date_forecast_generated, hemisphere) (processor.py:361,395-401).
    */
  def updateMeta(loaded: DataFrame): Unit = {
    val rollup = loaded.groupBy(col("date_forecast_generated"))
      .agg(
        min("date_forecast_for").as("date_forecast_first"),
        max("date_forecast_for").as("date_forecast_last"),
        count(lit(1)).as("n_records"))
      .withColumn("hemisphere", lit(h))
    TableOps.upsert(spark, metaPath, rollup,
      Seq("date_forecast_generated", "hemisphere"))
  }
}
