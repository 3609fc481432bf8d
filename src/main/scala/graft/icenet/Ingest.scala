package graft.icenet

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hemisphere classification result (reference processor.py:137-150). */
sealed trait Hemisphere { def name: String; def north: Boolean }
case object North extends Hemisphere { val name = "north"; val north = true }
case object South extends Hemisphere { val name = "south"; val north = false }

/** Ingest-side transforms — the Spark-first re-expression of the reference's
  * `Processor.load()` (processor.py:117-190). The NetCDF tensor is assumed
  * already flattened to long form (the reference itself flattens immediately,
  * processor.py:158-160); decode of real NetCDF bytes is a deferred source
  * concern (SURVEY.md S2).
  *
  * All steps are plain narrow transformations: no shuffle anywhere in this
  * file, so ingest scales linearly with input splits on a cluster.
  */
object Ingest {

  /** P1 — legacy column rename shim, applied only when the legacy names are
    * present (reference processor.py:126-133: `mean`->`sic_mean`,
    * `stddev`->`sic_stddev`).
    */
  def renameShim(df: DataFrame): DataFrame = {
    val step1 =
      if (df.columns.contains("mean") && !df.columns.contains("sic_mean"))
        df.withColumnRenamed("mean", "sic_mean") else df
    if (step1.columns.contains("stddev") && !step1.columns.contains("sic_stddev"))
      step1.withColumnRenamed("stddev", "sic_stddev") else step1
  }

  /** P9 — hemisphere detection from global attributes (processor.py:137-150):
    * `geospatial_lat_max > 80` -> north; `geospatial_lat_min < -80` -> south;
    * otherwise fall back to keyword search; ambiguous/absent -> error
    * (the reference raises InputBlobTriggerException).
    */
  def detectHemisphere(
      latMax: Option[Double], latMin: Option[Double], keywords: String): Hemisphere = {
    val byLat: Option[Hemisphere] =
      if (latMax.exists(_ > 80)) Some(North)
      else if (latMin.exists(_ < -80)) Some(South)
      else None
    byLat.getOrElse {
      val kw = keywords.toLowerCase
      val n = kw.contains("north")
      val s = kw.contains("south")
      if (n && !s) North
      else if (s && !n) South
      else throw new IllegalArgumentException(
        s"cannot determine hemisphere from keywords: '$keywords'")
    }
  }

  /** P2+P3 — positive-concentration filter then any-null drop (reference
    * `xr.where(sic_mean > 0)` masks to NaN, then `.dropna()`;
    * processor.py:158-160). In Spark the mask+dropna pair collapses to a
    * single predicate, but we keep `na.drop("any")` for rows that were null
    * in the input (land cells), matching the reference exactly.
    */
  def filterValid(df: DataFrame): DataFrame =
    df.filter(col("sic_mean") > 0).na.drop("any")

  /** P5 — km->m unit scale with integer downcast (processor.py:156-166). */
  def toMeters(df: DataFrame): DataFrame =
    df.withColumn("xc_m", (col("xc") * 1000).cast("int"))
      .withColumn("yc_m", (col("yc") * 1000).cast("int"))

  /** P6+P8 — forecast-for date = date(time) + leadtime days
    * (processor.py:167-169, with the date truncation of processor.py:329).
    */
  def deriveDates(df: DataFrame): DataFrame =
    df.withColumn("date_forecast_generated", to_date(col("time")))
      .withColumn("date_forecast_for",
        date_add(to_date(col("time")), col("leadtime")))

  /** P7 — drop carried-along columns not needed downstream
    * (processor.py:170-180). Dropping a missing column is a no-op, same as
    * the reference's errors="ignore".
    */
  def dropCarried(df: DataFrame): DataFrame =
    df.drop("yc", "xc", "leadtime", "Lambert_Azimuthal_Grid", "lat", "lon", "time")

  /** Full load stage: long-form raw frame -> forecast-shaped frame with
    * float4 measure columns (processor.py:281-282 stores float4).
    */
  def load(raw: DataFrame): DataFrame = {
    val staged = deriveDates(toMeters(filterValid(renameShim(raw))))
    dropCarried(staged)
      .withColumn("sea_ice_concentration_mean", col("sic_mean").cast("float"))
      .withColumn("sea_ice_concentration_stddev", col("sic_stddev").cast("float"))
      .drop("sic_mean", "sic_stddev")
  }
  /** Spatial regrid (coarsening) of the long-form grid: `factor`×`factor`
    * blocks of cells collapse to one coarse cell per (time, leadtime) —
    * the preprocessing step the reference's ecosystem runs when moving
    * between the 25 km EASE grid and coarser training resolutions. Cell
    * indices are recovered EXACTLY from the centre coordinates (the grid's
    * centres are multiples of 0.5 km, representable in double, so
    * `(c − origin)/step` is an exact integer), and the coarse centre is
    * again a multiple of 0.5 km, presented in integer metres like the
    * ingest chain's `xc_m`.
    *
    * Per coarse cell: non-null fine-cell count, min/max (order-exact on
    * doubles), and the block mean (null cells excluded; an all-null block
    * keeps the row with n_cells = 0 and a NULL mean — masked ocean/land
    * blocks stay visible rather than vanishing).
    *
    * Plan: one narrow index projection + one grouped aggregate — the
    * same linear-in-splits shape as the rest of the ingest chain.
    */
  def regrid(
      raw: DataFrame, factor: Int = 2, originXKm: Double = -262.5,
      originYKm: Double = -537.5, stepKm: Double = 25.0): DataFrame = {
    require(factor >= 2, s"regrid: factor=$factor below 2 (identity regrid)")
    def coarseCentreM(idx: org.apache.spark.sql.Column, origin: Double) =
      ((lit(origin) + lit(stepKm) *
        (idx.cast("double") * factor + (factor - 1) / 2.0)) * 1000.0)
        .cast("int")
    raw
      .groupBy(col("time"), col("leadtime"),
        expr(s"CAST((yc - $originYKm) / $stepKm AS BIGINT) div $factor")
          .as("yi_c"),
        expr(s"CAST((xc - $originXKm) / $stepKm AS BIGINT) div $factor")
          .as("xi_c"))
      .agg(
        // the raw tensor marks masked land/ocean cells NaN (not NULL) —
        // fold both to missing so the block statistics skip them the way
        // the oracle's NULLs do
        count(when(!isnan(col("sic_mean")), col("sic_mean"))).as("n_cells"),
        min(when(!isnan(col("sic_mean")), col("sic_mean"))).as("sic_min"),
        max(when(!isnan(col("sic_mean")), col("sic_mean"))).as("sic_max"),
        avg(when(!isnan(col("sic_mean")), col("sic_mean"))).as("sic_avg"))
      .select(to_date(col("time")).as("date_forecast_generated"),
        col("leadtime").cast("long").as("leadtime"),
        coarseCentreM(col("xi_c"), originXKm).as("xc_m"),
        coarseCentreM(col("yi_c"), originYKm).as("yc_m"),
        col("n_cells"), col("sic_min"), col("sic_max"), col("sic_avg"))
  }

  /** Per-cell climatology + anomaly over the ingested forecast frame —
    * the anomaly-map primitive of the reference's domain: how unusual is
    * THIS forecast versus the same cell and leadtime across forecast
    * dates? Climatology = mean concentration per (cell, leadtime) over
    * forecast-generation dates; anomaly = value − climatology.
    *
    * The climatology join keys on the exact grouping the aggregate
    * shuffled on, so the join rides the aggregate's exchange. The mean is
    * a double sum over the per-cell DATE axis — bounded by calendar
    * length (thousands), never data volume; the fixture's 2 dates make
    * it order-free outright.
    */
  def climatologyAnomaly(loaded: DataFrame): DataFrame = {
    val withLead = loaded.withColumn("leadtime",
      datediff(col("date_forecast_for"), col("date_forecast_generated"))
        .cast("long"))
    val clim = withLead.groupBy("xc_m", "yc_m", "leadtime")
      .agg(count(lit(1)).as("n_obs"),
        avg(col("sea_ice_concentration_mean").cast("double"))
          .as("clim_mean"))
    withLead.join(clim, Seq("xc_m", "yc_m", "leadtime"))
      .select(col("date_forecast_generated"), col("leadtime"),
        col("xc_m"), col("yc_m"),
        col("sea_ice_concentration_mean"), col("n_obs"), col("clim_mean"),
        (col("sea_ice_concentration_mean").cast("double") -
          col("clim_mean")).as("anomaly"))
  }

  /** Sea-ice extent per (forecast date, leadtime) — THE headline metric
    * of the reference's domain: total area of cells whose concentration
    * exceeds the standard 15 % threshold (NSIDC convention). Cell area is
    * exact integer km² (25 km EASE cells → 625 km²), so the extent is a
    * BIGINT and hash-exact; the threshold compares sic·100 against an
    * integer, avoiding a binary-inexact 0.15 literal.
    *
    * One grouped aggregate over the ingested frame — linear, one shuffle
    * on the tiny (date, leadtime) key space.
    */
  def iceExtent(
      loaded: DataFrame, thresholdPct: Int = 15,
      cellAreaKm2: Long = 625L): DataFrame = {
    val sic = col("sea_ice_concentration_mean").cast("double")
    val thr = lit(thresholdPct.toLong)
    loaded
      .withColumn("leadtime",
        datediff(col("date_forecast_for"), col("date_forecast_generated"))
          .cast("long"))
      .groupBy("date_forecast_generated", "leadtime")
      .agg(count(lit(1)).as("n_cells"),
        // integer compare: sic*100 > 15 avoids a 0.15 double literal
        sum(when(sic * 100 > thr, 1L).otherwise(0L)).as("n_ice_cells"))
      .select(col("date_forecast_generated"), col("leadtime"),
        col("n_cells"), col("n_ice_cells"),
        (col("n_ice_cells") * lit(cellAreaKm2)).as("extent_km2"))
      .orderBy("date_forecast_generated", "leadtime")
  }
}
