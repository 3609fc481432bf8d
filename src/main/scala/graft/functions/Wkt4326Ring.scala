package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.icenet.Laea

/** `graft_wkt4326(cx, cy, hx, hy)` — EPSG:4326 WKT ring of a projected
  * LAEA cell rectangle (F4; the reference delegates to
  * `ST_Transform(geom, 4326)`, processor.py:252): the four corners of the
  * `(cx ± hx, cy ± hy)` rectangle pass vertex-wise through the pure-Scala
  * LAEA inverse ([[Laea.inverse]], EPSG:6931/6932 by the `north` flag) and
  * render as a 5-point closed `POLYGON` at 6 decimals (~0.1 m).
  *
  * This is the promotion of the former `wkt4326Udf` (SURVEY §7.3's
  * UDF-until-hot exception, §2.9's named promotion candidate) to a native
  * expression: no ScalaUDF serialization wall — the generated code makes
  * one `invokestatic` into [[Wkt4326Ring.ring]] and stays inside the
  * whole-stage-codegen pipeline, null-safe and Filter/Project-fusable like
  * any built-in. The geodesy itself is deliberately NOT inlined into
  * generated Java: a JIT-compiled static method is as fast and keeps the
  * math in one audited place (LaeaSpec's round-trip properties).
  */
case class Wkt4326Ring(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression,
    north: Boolean) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == IntegerType || t == LongType
    if (children.forall(c => ok(c.dataType))) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires int/bigint inputs, got " +
        children.map(_.dataType).mkString(", "))
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_wkt4326"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override protected def nullSafeEval(cx: Any, cy: Any, hx: Any, hy: Any): Any =
    Wkt4326Ring.ring(asLong(cx), asLong(cy), asLong(hx), asLong(hy), north)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cx, cy, hx, hy) =>
      s"${ev.value} = graft.functions.Wkt4326Ring.ring(" +
        s"(long) $cx, (long) $cy, (long) $hx, (long) $hy, $north);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Wkt4326Ring =
    copy(first = f, second = s, third = t, fourth = q)
}

object Wkt4326Ring {

  /** Static-reachable kernel for the generated code (one invokestatic,
    * JIT-inlined). Corner order matches the projected-meters ring
    * ([[graft.icenet.Geometry.wktCellPolygon]]): SW, NW, NE, SE, SW.
    */
  def ring(cx: Long, cy: Long, hx: Long, hy: Long, north: Boolean): UTF8String = {
    val sb = new java.lang.StringBuilder(128)
    sb.append("POLYGON((")
    val xs = Array(cx - hx, cx - hx, cx + hx, cx + hx, cx - hx)
    val ys = Array(cy - hy, cy + hy, cy + hy, cy - hy, cy - hy)
    var i = 0
    while (i < 5) {
      if (i > 0) sb.append(", ")
      val (lon, lat) = Laea.inverse(xs(i).toDouble, ys(i).toDouble, north)
      sb.append(String.format(java.util.Locale.ROOT, "%.6f %.6f",
        Double.box(lon), Double.box(lat)))
      i += 1
    }
    sb.append("))")
    UTF8String.fromString(sb.toString)
  }

  /** Column-API entry: `Wkt4326Ring.wkt4326(north)(cx, cy, hx, hy)`. */
  def wkt4326(north: Boolean)(cx: Column, cy: Column, hx: Column, hy: Column): Column =
    ColumnBridge.column(Wkt4326Ring(
      ColumnBridge.expression(cx), ColumnBridge.expression(cy),
      ColumnBridge.expression(hx), ColumnBridge.expression(hy), north))
}
