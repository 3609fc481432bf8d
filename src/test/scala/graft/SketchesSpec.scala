package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvAggregate
import graft.ops.Sketches

/** KMV sketch: merge identity (the property that makes it a rollup
  * primitive), exact-below-k semantics, estimate error on a known
  * cardinality, and the SQL registration.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("merging per-group sketches equals sketching the union directly") {
    val df = (1 to 5000).map(i => (s"g${i % 7}", i.toLong)).toDF("grp", "v")
      .withColumn("hv", Sketches.hash60(col("v")))
    val direct = df.agg(KmvAggregate.kmv(col("hv"), 64)).as[Seq[Long]].head()
    val merged = df.groupBy("grp").agg(KmvAggregate.kmv(col("hv"), 64).as("sk"))
      .select(explode(col("sk")).as("hv"))
      .agg(KmvAggregate.kmv(col("hv"), 64)).as[Seq[Long]].head()
    assert(merged == direct)
    assert(direct.length == 64 && direct == direct.sorted && direct.distinct == direct)
  }

  test("below k distinct values the sketch is the exact distinct set") {
    val df = (1 to 1000).map(i => (i % 10).toLong).toDF("v")
      .withColumn("hv", Sketches.hash60(col("v")))
    val sk = df.agg(KmvAggregate.kmv(col("hv"), 64).as("sk"))
    assert(sk.select(size(col("sk"))).as[Int].head() == 10)
    val est = sk.select(Sketches.kmvEstimate(col("sk"), 64)).as[Long].head()
    assert(est == 10L)
  }

  test("estimate lands within the KMV error envelope on a known cardinality") {
    // n = 20000 distinct, k = 64: relative standard error ~ 1/sqrt(k-2)
    // ~ 12.7%; 4 sigma is a deterministic-safe bound (the hash is fixed,
    // so this is a one-time check of THIS hash function, not a flaky one)
    val df = (1 to 20000).map(_.toLong).toDF("v")
      .withColumn("hv", Sketches.hash60(col("v")))
    val est = df.agg(KmvAggregate.kmv(col("hv"), 64).as("sk"))
      .select(Sketches.kmvEstimate(col("sk"), 64)).as[Long].head()
    assert(math.abs(est - 20000L) < 20000 * 0.51, s"est=$est")
  }

  test("rollup output: one row per group plus a merged ALL row") {
    val df = (1 to 3000)
      .map(i => (s"2024-0${1 + i % 3}", (i % 500).toLong))
      .toDF("m", "v")
    val out = Sketches.kmvDistinctRollup(df, col("m"), col("v"), k = 64)
      .as[(String, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq("2024-01", "2024-02", "2024-03", "ALL"))
    val all = out.last
    assert(all._3 == 500L) // exact distinct
    assert(math.abs(all._2 - 500L) < 500 * 0.51)
    // per-group exact counts sum >= global (overlap), each est near exact
    out.dropRight(1).foreach { case (_, est, exact) =>
      assert(math.abs(est - exact) <= math.max(1L, (exact * 0.51).toLong))
    }
  }

  test("graft_kmv is registered for SQL users") {
    graft.functions.VectorFunctions.register(spark)
    (1 to 100).map(_.toLong).toDF("v").createOrReplaceTempView("kmv_in")
    val arr = spark.sql(
      """SELECT graft_kmv(CAST(conv(substring(md5(CAST(v AS STRING)), 1, 15),
        |16, 10) AS BIGINT), 16) AS sk FROM kmv_in""".stripMargin)
      .as[Seq[Long]].head()
    assert(arr.length == 16 && arr == arr.sorted)
  }

  test("CMS heavy hitters: estimates are one-sided and exact without collisions") {
    // 5 distinct keys into a 256-bucket sketch: collision probability per
    // (row, pair) is tiny and the seeds are fixed, so est == exact here
    val df = (Seq.fill(50)(1L) ++ Seq.fill(30)(2L) ++ Seq.fill(10)(3L) ++
      Seq(4L, 5L)).toDF("k")
    val got = Sketches.cmsHeavyHitters(df, "k", topK = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((50L, 50L)))
    assert(got(2L) == ((30L, 30L)))
    assert(got.forall { case (_, (exact, est)) => est >= exact },
      "CMS never underestimates")
  }

  test("CMS heavy hitters: forced collisions overestimate, never underestimate") {
    // width 1 forces every key into the same bucket on every row: each
    // estimate becomes the total row count - the degenerate worst case
    val df = Seq(1L, 1L, 2L, 3L).toDF("k")
    val got = Sketches.cmsHeavyHitters(df, "k", w = 1, topK = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.values.forall(_ == 4L))
  }

  test("kmvOverlap: exact below k — sketches are the complete sets") {
    import org.apache.spark.sql.functions.col
    // A = {1..5}, B = {4..8}: union 8, intersection {4,5} = 2
    val df = ((1L to 5L).map(v => (v, true, (4L to 8L).contains(v)))
      ++ Seq(6L, 7L, 8L).map(v => (v, false, true))).toDF("v", "a", "b")
    val r = Sketches.kmvOverlap(df, col("v"), col("a"), col("b")).head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 5L) // est_a, est_b
    assert(r.getLong(2) == 8L) // est_union
    assert(r.getLong(3) == 2L) // est_intersection == exact below k
    assert(r.getDouble(4) == 0.25) // jaccard 2/8
    assert(r.getLong(5) == 2L) // exact certificate
  }

  test("kmvOverlap: estimate tracks a known overlap within the KMV envelope") {
    import org.apache.spark.sql.functions.col
    // |A| = 300, |B| = 300, overlap 150 -> union 450, jaccard 1/3
    val df = ((1L to 300L).map(v => (v, true, v > 150L))
      ++ (301L to 450L).map(v => (v, false, true))).toDF("v", "a", "b")
    val r = Sketches.kmvOverlap(df, col("v"), col("a"), col("b"), k = 128)
      .head()
    assert(r.getLong(5) == 150L, "exact certificate")
    // KMV relative error ~ 1/sqrt(k-1) ≈ 8.9% at k=128; ~3 sigma bounds
    // (hashes are deterministic, so this pins a concrete draw: 516/181)
    assert(math.abs(r.getLong(2) - 450L) < 450 * 0.30, s"union ${r.getLong(2)}")
    assert(math.abs(r.getLong(3) - 150L) < 150 * 0.45,
      s"intersection ${r.getLong(3)}")
    assert(r.getDouble(4) > 0.2 && r.getDouble(4) < 0.5,
      s"jaccard ${r.getDouble(4)}")
  }
}
