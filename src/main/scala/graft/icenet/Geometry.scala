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
    * processor.py:252). Vertex-wise LAEA inverse via the native codegen'd
    * [[graft.functions.Wkt4326Ring]] expression (the former UDF, promoted
    * per SURVEY §2.9); 6 decimal places (~0.1 m), typical WKT precision.
    */
  def wkt4326(north: Boolean)(cx: Column, cy: Column, hx: Column, hy: Column): Column =
    graft.functions.Wkt4326Ring.wkt4326(north)(cx, cy, hx, hy)

  /** Axis-length bound for [[buildCells]]: the EASE-Grid 2.0 axes are O(500)
    * values by contract (25 km pitch over a hemisphere, SURVEY §1.1); 16384
    * is ~30x headroom. Anything bigger is a mis-wired input (a fact table
    * where an axis belongs), and the unpartitioned id window below would
    * single-task it — fail loudly instead, pointing at the scalable path.
    */
  val MaxAxisLen: Long = 16384L

  /** Build the cell dimension table from the two centroid axes: cross join
    * (J3, processor.py:223-226) + WKT rings + deterministic surrogate key.
    *
    * The reference's `cell_id SERIAL` assigns ids in arrival order; we order
    * by the natural key `(centroid_x, centroid_y)` so ids are reproducible.
    * Axes are size-guarded to [[MaxAxisLen]] (the half-step aggregate
    * doubles as the counter — no extra job), so the single-partition window
    * for id assignment is bounded by construction; the result is broadcast
    * downstream anyway. A data-sized keyed table needs
    * [[graft.operators.GlobalRowNumber]] instead.
    */
  def buildCells(xAxis: DataFrame, yAxis: DataFrame, north: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def halfAndCount(axis: DataFrame, c: String): (Double, Long) = {
      val row = axis.agg(
        ((max(col(c)) - min(col(c))) / (countDistinct(col(c)) - 1) / 2.0).as("half"),
        countDistinct(col(c)).as("n")).head()
      (row.getDouble(0), row.getLong(1))
    }
    val (halfX, nx) = halfAndCount(xAxis, "centroid_x")
    val (halfY, ny) = halfAndCount(yAxis, "centroid_y")
    require(nx <= MaxAxisLen && ny <= MaxAxisLen,
      s"buildCells axes have $nx x $ny distinct centroids; the contract is " +
        s"O(500) grid axes (max $MaxAxisLen). A data-sized table would " +
        "single-task the cell_id window — use GlobalRowNumber for scalable ids.")
    val hx = lit(math.round(halfX))
    val hy = lit(math.round(halfY))
    val geomCol = if (north) "geom_6931" else "geom_6932"
    val cells = xAxis.crossJoin(yAxis)
    cells
      .withColumn(geomCol,
        wktCellPolygon(col("centroid_x"), col("centroid_y"), hx, hy))
      .withColumn("geom_4326",
        wkt4326(north)(col("centroid_x").cast("long"),
          col("centroid_y").cast("long"), hx.cast("long"), hy.cast("long")))
      .withColumn("cell_id",
        row_number().over(Window.orderBy("centroid_x", "centroid_y")).cast("long"))
      .select("cell_id", "centroid_x", "centroid_y", geomCol, "geom_4326")
  }
}
