package graft

import org.apache.spark.sql.functions._

/** Bucketing demo/spec: pre-bucketed tables joined on the bucket key need
  * NO exchange — the co-located-join strategy that replaces repeated
  * shuffles for fact-to-fact joins at 100 TB (the parquet-table analog of
  * the reference's FK join, processor.py:314-321, done shuffle-free).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key runs without any Exchange") {
    val n = 10000
    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dims")
    spark.range(n).select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("b_facts")
    spark.range(n / 10).select(col("id").as("k"), lit("d").as("tag"))
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("b_dims")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be exchange-free, got:\n$plan")
      assert(joined.count() == n / 10)
      // un-bucketed control: the same join DOES shuffle
      val flat = spark.range(n).select(col("id").as("k"), (col("id") * 2).as("v"))
      val control = flat.join(
        spark.range(n / 10).select(col("id").as("k"), lit("d").as("tag")), "k")
      assert(control.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
