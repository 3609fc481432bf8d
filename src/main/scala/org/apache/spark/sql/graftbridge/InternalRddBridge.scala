package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge to `private[sql] SparkSession.internalCreateDataFrame`: wraps an
  * `RDD[InternalRow]` as a DataFrame WITHOUT the external-Row round-trip
  * `createDataFrame(RDD[Row], schema)` pays (per-row decode to JVM objects
  * + re-encode through RowEncoder). Used by operators that must drop to
  * the RDD layer for one narrow step (e.g. GlobalRowNumber's
  * zipWithIndex) but keep rows in Tungsten binary format end to end.
  */
object InternalRddBridge {
  def internalCreateDataFrame(
      spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
