package graft

import org.apache.spark.sql.functions._

import graft.functions.{Hll, HllFunctions}
import graft.ops.Sketches

/** HLL sketch: register derivation vs an independent SQL formulation
  * (Spark's own bin/shiftleft — the same arithmetic the DuckDB oracle
  * runs), merge identity, estimator accuracy at known cardinality,
  * corrected-estimate regime, and the SQL surface.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  test("rho/index arithmetic matches the bitlength formula") {
    // suffix = 1 → bitlen 1 → rho 49; top suffix bit set → rho 1;
    // suffix 0 → 50; index = top 11 bits
    assert(Hll.rho(1L) == 49)
    assert(Hll.rho(1L << 48) == 1)
    assert(Hll.rho(0L) == 50)
    assert(Hll.registerIndex((2047L << 49) | 123L) == 2047)
    assert(Hll.registerIndex(123L) == 0)
    // cross-check vs Spark SQL bin() length on a spread of hashes — the
    // exact expression the DuckDB oracle evaluates
    val df = (1 to 2000).map(_.toLong).toDF("v")
      .withColumn("hv", Sketches.hash60(col("v")))
      .withColumn("sfx", col("hv") % lit(1L << 49))
      .withColumn("rho_sql",
        when(col("sfx") === 0L, 50)
          .otherwise(lit(50) - length(bin(col("sfx")))).cast("int"))
      .select(col("hv"), col("rho_sql")).as[(Long, Int)].collect()
    df.foreach { case (hv, rhoSql) => assert(Hll.rho(hv).toInt == rhoSql) }
  }

  test("merging per-group registers is bit-identical to the direct global " +
    "sketch, and the merge aggregate accepts only graft_hll binaries") {
    val df = (1 to 30000).map(i => (s"g${i % 7}", i.toLong)).toDF("grp", "v")
      .withColumn("hv", Sketches.hash60(col("v")))
    val direct = df.agg(Hll.hll(col("hv"))).as[Array[Byte]].head()
    val merged = df.groupBy("grp").agg(Hll.hll(col("hv")).as("regs"))
      .agg(Hll.hllMerge(col("regs"))).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(direct, merged))
    assert(direct.length == Hll.M)
    val e = intercept[org.apache.spark.sql.AnalysisException](
      df.agg(graft.functions.Hll.hllMerge(col("grp"))).collect())
    assert(e.getMessage.contains("binary register"))
  }

  test("estimator lands inside 3 standard errors at known cardinality") {
    // 100k distinct values: raw regime (est >> 2.5m). se = 1.04/sqrt(2048)
    val n = 100000
    val est = (1 to n).map(_.toLong).toDF("v")
      .withColumn("hv", Sketches.hash60(col("v")))
      .agg(Hll.hllEstimate(Hll.hll(col("hv"))))
      .as[Long].head()
    val se = 1.04 / math.sqrt(Hll.M.toDouble)
    assert(math.abs(est - n).toDouble / n < 3 * se,
      s"est $est vs $n outside ${3 * se}")
  }

  test("estimate is a deterministic pure function of the value set") {
    val a = (1 to 5000).map(_.toLong)
    val est1 = a.toDF("v").withColumn("hv", Sketches.hash60(col("v")))
      .agg(Hll.hllEstimate(Hll.hll(col("hv")))).as[Long].head()
    val est2 = scala.util.Random.shuffle(a).toDF("v").repartition(7)
      .withColumn("hv", Sketches.hash60(col("v")))
      .agg(Hll.hllEstimate(Hll.hll(col("hv")))).as[Long].head()
    assert(est1 == est2)
  }

  test("corrected estimate switches to linear counting at low cardinality") {
    val regs = (1 to 100).map(_.toLong).toDF("v")
      .withColumn("hv", Sketches.hash60(col("v")))
      .agg(Hll.hll(col("hv"))).as[Array[Byte]].head()
    val corrected = HllFunctions.correctedEstimate(regs)
    // linear counting at 100 distinct is within a few percent
    assert(corrected > 80 && corrected < 120, s"corrected $corrected")
    // while the raw estimate is in its known low-cardinality bias regime
    assert(Hll.estimate(regs) > corrected)
  }

  test("the hll family is registered for SQL users") {
    graft.functions.VectorFunctions.register(spark)
    (1 to 1000).map(i => (s"g${i % 2}", i.toLong)).toDF("grp", "v")
      .withColumn("hv", Sketches.hash60(col("v")))
      .createOrReplaceTempView("hll_sql_in")
    val row = spark.sql(
      """SELECT graft_hll_est(graft_hll_merge(regs)) AS est,
        |       graft_hll_zeros(graft_hll_merge(regs)) AS zeros
        |FROM (SELECT grp, graft_hll(hv) AS regs FROM hll_sql_in
        |      GROUP BY grp)""".stripMargin).as[(Long, Long)].head()
    assert(row._2 == (Hll.M - spark.sql(
      """SELECT count(DISTINCT hv DIV 562949953421312) FROM hll_sql_in""")
      .as[Long].head()))
  }
}
