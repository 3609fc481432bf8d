package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAggregate

/** TopKAggregate unit coverage: bounded-heap semantics, deterministic
  * tie-break, partial-aggregation merge across partitions, and the
  * serialize/deserialize path (exercised whenever partials cross an
  * exchange).
  */
class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  private def run(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(TopKAggregate.topk(col("s"), col("id"), k).as("top"))
      .select(col("g"), col("top").cast("array<struct<score:double,id:bigint>>"))
      .as[(Long, Seq[(Double, Long)])]
      .collect().toMap

  test("keeps the k best by (score desc, id asc), sorted best-first") {
    val df = Seq((1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.7, 12L), (1L, 0.9, 5L))
      .toDF("g", "s", "id")
    assert(run(df, 3)(1L) == Seq((0.9, 5L), (0.9, 11L), (0.7, 12L)))
  }

  test("groups with fewer than k rows return all rows") {
    val df = Seq((1L, 0.4, 1L), (2L, 0.8, 2L)).toDF("g", "s", "id")
    val got = run(df, 5)
    assert(got(1L) == Seq((0.4, 1L)) && got(2L) == Seq((0.8, 2L)))
  }

  test("merge across many partitions equals single-partition result") {
    val big = spark.range(10000).select(
      (col("id") % 7).as("g"),
      (col("id") % 1000 / 1000.0).as("s"),
      col("id").as("id"))
    val p1 = run(big.repartition(1), 4)
    val p16 = run(big.repartition(16), 4)
    assert(p1 == p16)
  }

  test("SQL surface: graft_topk callable from spark.sql after registration") {
    graft.functions.VectorFunctions.register(spark)
    Seq((1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.7, 12L))
      .toDF("g", "s", "id").createOrReplaceTempView("scores")
    val got = spark.sql(
      """SELECT g, graft_topk(s, id, 2) AS top FROM scores GROUP BY g""")
      .select(col("g"), col("top").cast("array<struct<score:double,id:bigint>>"))
      .as[(Long, Seq[(Double, Long)])].collect().toMap
    assert(got(1L) == Seq((0.9, 11L), (0.7, 12L)))
  }
}
