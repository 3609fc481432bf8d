package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions (with `doGenCode`) for the vector kernels the
  * similarity/dedup operators run in their hot loops. Spark's higher-order
  * functions (`zip_with` + `aggregate`) evaluate interpreted, lambda-object
  * per element; these generate a tight primitive loop inside whole-stage
  * codegen instead.
  *
  * Arithmetic is strictly left-to-right double accumulation — bit-identical
  * to the higher-order formulation they replace and to the DuckDB oracle's
  * `list_aggregate(list_transform(...), 'sum')`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a double vector: sqrt of left-to-right sum of squares. */
case class L2Norm(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double> input, got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_l2norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** Column-API entry points + SQL registration for the custom expressions. */
object VectorFunctions {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2norm(a: Column): Column =
    ColumnBridge.column(L2Norm(ColumnBridge.expression(a)))

  /** Register `graft_dot` / `graft_l2norm` / `graft_topk` for spark.sql
    * users on an EXISTING session (the builder-time path is
    * [[graft.GraftExtensions]]). Idempotent.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_l2norm", exprs => L2Norm(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_zorder", exprs => ZOrderKey(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_wkt4326", exprs => Wkt4326Ring(exprs(0), exprs(1), exprs(2),
        exprs(3), graft.GraftExtensions.boolLit(exprs(4), "graft_wkt4326 north")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_topk", exprs => {
        val k = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_topk k must be an integer literal, got $other")
        }
        TopKAggregate(exprs(0), exprs(1), k).toAggregateExpression()
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "graft_kmv", exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_kmv k must be an integer literal, got $other")
        }
        KmvAggregate(exprs(0), k).toAggregateExpression()
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "graft_kmv_merge", exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_kmv_merge k must be an integer literal, got $other")
        }
        KmvMergeAggregate(exprs(0), k).toAggregateExpression()
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "graft_misra_gries", exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_misra_gries k must be an integer literal, got $other")
        }
        MisraGriesAggregate(exprs(0), k).toAggregateExpression()
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "graft_sample_k", exprs => {
        val k = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_sample_k k must be an integer literal, got $other")
        }
        SampleKAggregate(exprs(0), exprs(1), k).toAggregateExpression()
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "graft_bitmap",
      exprs => BitmapBuildAggregate(exprs.head).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_bitmap_merge",
      exprs => BitmapMergeAggregate(exprs.head).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_bitmap_card", exprs => BitmapCardinality(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_bitmap_and_card",
      exprs => BitmapAndCardinality(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_hll",
      exprs => HllAggregate(exprs.head).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_hll_merge",
      exprs => HllMergeAggregate(exprs.head).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_hll_est", exprs => HllEstimate(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_hll_zeros", exprs => HllZeroRegisters(exprs.head), "built-in")
  }
}
