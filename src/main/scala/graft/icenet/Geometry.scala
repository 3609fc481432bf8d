package graft.icenet

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grid-cell geometry construction — the Spark-first re-expression of the
  * reference's `update_geometries` stage (processor.py:192-266).
  *
  * The reference cross-joins the x/y centroid axes in nested Python loops
  * (processor.py:223-226), builds a shapely rectangle per cell
  * (processor.py:225-236), serializes to WKT, and lets PostGIS reproject
  * (`ST_Transform`, processor.py:252). Here: `crossJoin` of two tiny axis
  * DataFrames, a codegen'd `format_string` for the WKT ring (F1), and a
  * pure-Scala LAEA inverse ([[Laea]]) for the EPSG:4326 ring (F4).
  */
object Geometry {

  /** Half of the mean step between sorted distinct axis values — the
    * reference's `mean_step_size/2` (utils.py:47-48, processor.py:218-219),
    * i.e. (max-min)/(n-1)/2, computed as a scalar aggregate.
    */
  def halfStep(axis: DataFrame, colName: String): Double = {
    val row = axis.agg(
      ((max(col(colName)) - min(col(colName))) /
        (countDistinct(col(colName)) - 1) / 2.0).as("half")).head()
    row.getDouble(0)
  }

  /** WKT 5-point closed rectangle ring around an integer centroid (F1;
    * reference processor.py:225-236). Pure `format_string` — stays inside
    * whole-stage codegen, no UDF.
    */
  def wktCellPolygon(cx: Column, cy: Column, halfX: Column, halfY: Column): Column =
    format_string(
      "POLYGON((%d %d, %d %d, %d %d, %d %d, %d %d))",
      (cx - halfX).cast("long"), (cy - halfY).cast("long"),
      (cx - halfX).cast("long"), (cy + halfY).cast("long"),
      (cx + halfX).cast("long"), (cy + halfY).cast("long"),
      (cx + halfX).cast("long"), (cy - halfY).cast("long"),
      (cx - halfX).cast("long"), (cy - halfY).cast("long"))

  /** Reproject a projected-meters cell rectangle to an EPSG:4326 WKT ring
    * (F4; reference delegates to `ST_Transform(geom, 4326)` at
    * processor.py:252). Vertex-wise LAEA inverse; emitted with 6 decimal
    * places (~0.1 m), matching typical WKT output precision.
    */
  def wkt4326Udf(north: Boolean) = udf { (cx: Long, cy: Long, hx: Long, hy: Long) =>
    val corners = Seq(
      (cx - hx, cy - hy), (cx - hx, cy + hy),
      (cx + hx, cy + hy), (cx + hx, cy - hy), (cx - hx, cy - hy))
    val pts = corners.map { case (x, y) =>
      val (lon, lat) = Laea.inverse(x.toDouble, y.toDouble, north)
      f"$lon%.6f $lat%.6f"
    }
    pts.mkString("POLYGON((", ", ", "))")
  }

  /** Build the cell dimension table from the two centroid axes: cross join
    * (J3, processor.py:223-226) + WKT rings + deterministic surrogate key.
    *
    * The reference's `cell_id SERIAL` assigns ids in arrival order; we order
    * by the natural key `(centroid_x, centroid_y)` so ids are reproducible.
    * Axes are O(hundreds) of rows, so the single-partition window for id
    * assignment is a non-issue; the result is broadcast downstream anyway.
    */
  def buildCells(xAxis: DataFrame, yAxis: DataFrame, north: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hx = lit(math.round(halfStep(xAxis, "centroid_x")))
    val hy = lit(math.round(halfStep(yAxis, "centroid_y")))
    val geomCol = if (north) "geom_6931" else "geom_6932"
    val cells = xAxis.crossJoin(yAxis)
    cells
      .withColumn(geomCol,
        wktCellPolygon(col("centroid_x"), col("centroid_y"), hx, hy))
      .withColumn("geom_4326",
        wkt4326Udf(north)(col("centroid_x").cast("long"),
          col("centroid_y").cast("long"), hx.cast("long"), hy.cast("long")))
      .withColumn("cell_id",
        row_number().over(Window.orderBy("centroid_x", "centroid_y")).cast("long"))
      .select("cell_id", "centroid_x", "centroid_y", geomCol, "geom_4326")
  }
}
