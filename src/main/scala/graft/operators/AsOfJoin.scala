package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) left join: for each left row, attach the payload of
  * the LATEST right row with `right.timeCol <= left.timeCol` for the same
  * key — the temporal-join primitive Spark lacks natively.
  *
  * Implemented by composition (preference (a) of the custom-operator ladder):
  * tag and union both sides, then one window pass per key ordered by
  * (time, side) taking the last non-null right payload. Right rows sort
  * before left rows at equal timestamps, so the match is inclusive.
  *
  * Scale: ONE shuffle (hash partition by key) + ONE sort per partition —
  * same cost as a sort-merge join, with no range-explosion risk; skewed keys
  * are handled by AQE like any other exchange. This beats the
  * join-then-filter-then-argmax formulation, which shuffles the full
  * left x right-per-key product.
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry (must not collide with left
    *                     column names — rename on the right side first)
    */
  def leftAsOf(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.forall(!left.columns.contains(_)),
      "rightPayload columns must not collide with left columns")
    val rightTypes = rightPayload.map(p => p -> right.schema(p).dataType).toMap

    val lAug = rightPayload.foldLeft(
        left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))) {
      (df, p) => df.withColumn(p, lit(null).cast(rightTypes(p)))
    }
    val rAug = {
      val base = right.select(
        (col(rightTime).as("__t") +: lit(0).as("__side") +: col(key).as(key) +:
          rightPayload.map(col)): _*)
      left.columns.filter(c => c != key).foldLeft(base) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }
    val unioned = lAug.select(
      (left.columns.map(col) ++ rightPayload.map(col) ++ Seq(col("__t"), col("__side"))): _*)
      .unionByName(rAug.select(
        (left.columns.map(col) ++ rightPayload.map(col) ++ Seq(col("__t"), col("__side"))): _*))

    val w = Window.partitionBy(key).orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select((left.columns ++ rightPayload).map(col): _*)
  }
}
