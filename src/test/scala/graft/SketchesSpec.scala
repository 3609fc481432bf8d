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

  test("kmvMerge: array-input merge of pre-built sketches equals the " +
    "explode + re-sketch path AND the direct sketch") {
    val df = (1 to 5000).map(i => (s"g${i % 7}", i.toLong)).toDF("grp", "v")
      .withColumn("hv", Sketches.hash60(col("v")))
    val direct = df.agg(KmvAggregate.kmv(col("hv"), 64)).as[Seq[Long]].head()
    val per = df.groupBy("grp").agg(KmvAggregate.kmv(col("hv"), 64).as("sk"))
    val merged = per.agg(KmvAggregate.kmvMerge(col("sk"), 64))
      .as[Seq[Long]].head()
    assert(merged == direct)
    // truncation safety at a smaller k: merging k=64 sketches into a k=16
    // result equals the direct k=16 sketch
    val small = per.agg(KmvAggregate.kmvMerge(col("sk"), 16))
      .as[Seq[Long]].head()
    val directSmall = df.agg(KmvAggregate.kmv(col("hv"), 16))
      .as[Seq[Long]].head()
    assert(small == directSmall)
  }

  test("graft_kmv_merge is registered for SQL users") {
    val df = (1 to 200).map(i => (s"g${i % 3}", i.toLong)).toDF("grp", "v")
      .withColumn("hv", Sketches.hash60(col("v")))
    df.groupBy("grp").agg(KmvAggregate.kmv(col("hv"), 32).as("sk"))
      .createOrReplaceTempView("kmv_merge_in")
    graft.functions.VectorFunctions.register(spark)
    val sql = spark.sql(
      "SELECT graft_kmv_merge(sk, 32) AS sk FROM kmv_merge_in")
      .as[Seq[Long]].head()
    val direct = df.agg(KmvAggregate.kmv(col("hv"), 32)).as[Seq[Long]].head()
    assert(sql == direct)
  }

  test("graft_kmv_merge rejects a non-bigint array at analysis time") {
    // ArrayData.getLong on an array<int> would silently read garbage
    // hashes; the type check turns that into an analysis error instead.
    Seq(Seq(1, 2, 3)).toDF("sk").createOrReplaceTempView("kmv_bad_in")
    graft.functions.VectorFunctions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_kmv_merge(sk, 32) FROM kmv_bad_in").collect())
    assert(e.getMessage.contains("array<bigint>"))
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

  test("cmsJoinSize: exact without collisions, one-sided with them") {
    // A: key 1 x3, key 2 x2; B: key 1 x2, key 3 x4 -> |A join B| = 3*2 = 6.
    // 256 buckets, 2 distinct keys per side: collisions are absent for
    // these fixed seeds, so est == exact
    val a = Seq(1L, 1L, 1L, 2L, 2L).toDF("k")
    val b = Seq(1L, 1L, 3L, 3L, 3L, 3L).toDF("k")
    val got = Sketches.cmsJoinSize(a, col("k"), b, col("k"))
      .as[(Long, Long)].head()
    assert(got == ((6L, 6L)))
    // forced collisions (w = 1: every key in one bucket) overestimate,
    // never underestimate: est = 5 * 6 = 30 >= 6
    val tight = Sketches.cmsJoinSize(a, col("k"), b, col("k"), d = 2, w = 1)
      .as[(Long, Long)].head()
    assert(tight._1 == 30L && tight._1 >= tight._2)
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

  // ------------------------------------------------ sample-quantile sketch

  private def quantileFixture = (1 to 3).flatMap { g =>
    (1 to 500).map(i => (s"g$g", (g * 1000 + i).toLong, i.toDouble * g))
  }.toDF("grp", "id", "v")

  test("quantileSketch: groups of n <= k are exact (sample = whole group)") {
    val df = (1 to 2).flatMap { g =>
      (1 to 40).map(i => (s"g$g", (g * 100 + i).toLong, i.toDouble))
    }.toDF("grp", "id", "v")
    val out = Sketches.quantileSketch(df, col("grp"), col("id"), col("v"),
      k = 64).collect().map(r => r.getString(0) -> r).toMap
    // n=40 < k=64: est == exact for every group
    Seq("g1", "g2").foreach { g =>
      assert(out(g).getAs[Double]("est_p50") == out(g).getAs[Double]("exact_p50"))
      assert(out(g).getAs[Double]("est_p90") == out(g).getAs[Double]("exact_p90"))
      assert(out(g).getAs[Long]("m") == 40L)
    }
    // ALL row: 80 rows > k -> sampled, but still within the group range
    assert(out("ALL").getAs[Long]("n_rows") == 80L)
    assert(out("ALL").getAs[Long]("m") == 64L)
  }

  test("quantileSketch: estimates land within the uniform-sample rank bound") {
    val out = Sketches.quantileSketch(quantileFixture,
      col("grp"), col("id"), col("v"), k = 64).collect()
    out.filter(_.getString(0) != "ALL").foreach { r =>
      // rank error of a k=64 uniform sample at ~3 sigma: |F(est)-q| <
      // 3/(2*sqrt(k)) ≈ 0.19; values are i*g over i=1..500, so the value
      // at quantile q is ~ q*500*g and F(est) = est/(500*g)
      val scale = r.getString(0).drop(1).toInt.toDouble
      val f50 = r.getAs[Double]("est_p50") / (500.0 * scale)
      val f90 = r.getAs[Double]("est_p90") / (500.0 * scale)
      assert(math.abs(f50 - 0.5) < 0.19, s"${r.getString(0)} p50 at $f50")
      assert(math.abs(f90 - 0.9) < 0.19, s"${r.getString(0)} p90 at $f90")
    }
  }

  test("quantileSketch: the ALL sample merged from group samples equals " +
    "the direct global bottom-k (merge property)") {
    import graft.functions.SampleKAggregate
    val base = quantileFixture.select(col("grp"), col("v").cast("double").as("v"),
      Sketches.hash60(col("id")).as("hv"))
    val direct = base
      .agg(SampleKAggregate.sampleK(col("hv"), col("v"), 64).as("s"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    val merged = base.groupBy("grp")
      .agg(SampleKAggregate.sampleK(col("hv"), col("v"), 64).as("s"))
      .select(explode(col("s")).as("p"))
      .agg(SampleKAggregate.sampleK(col("p.hv"), col("p.v"), 64).as("s"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(direct == merged)
  }

  test("misra-gries: hand-computed tiny stream (single partition)") {
    // k = 2, stream 1 1 1 2 3: after 1,1,1,2 the buffer is {1:3, 2:1};
    // 3 arrives into a full buffer -> decrement all, drop zeros -> {1:2}
    val df = Seq(1L, 1L, 1L, 2L, 3L).toDF("key").repartition(1)
    val got = df
      .agg(graft.functions.MisraGriesAggregate.misraGries(col("key"), 2).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.key"), col("e.est")).as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("misra-gries: deficit bound and no-false-negative guarantee hold " +
    "under every partitioning; the verified read-out is exact and stable") {
    val k = 8
    // 4 planted heavies (each 600 of n=3400 > n/(k+1)=377) + 1000-key tail
    val rows = (0 until 4).flatMap(h => Seq.fill(600)(h.toLong)) ++
      (0 until 1000).map(i => 1000L + i)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val truth = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(truth == Set(0L, 1L, 2L, 3L))
    for (parts <- Seq(1, 5, 32)) {
      val df = rows.toDF("key").repartition(parts)
      val mg = df
        .agg(graft.functions.MisraGriesAggregate.misraGries(col("key"), k).as("mg"))
        .select(explode(col("mg")).as("e"))
        .select(col("e.key"), col("e.est")).as[(Long, Long)].collect().toMap
      assert(mg.size <= k)
      // summary estimates never overshoot, and undershoot by <= n/(k+1)
      mg.foreach { case (key, est) =>
        assert(est <= exact(key), s"overshoot at $key")
        assert(exact(key) - est <= n / (k + 1), s"deficit bound at $key")
      }
      // every true heavy hitter is present regardless of merge order
      assert(truth.subsetOf(mg.keySet), s"false negative at parts=$parts")
      // the certified read-out equals the exact GROUP BY ... HAVING
      val out = graft.ops.Sketches.mgHeavyHitters(df, col("key"), k)
        .as[(Long, Long, Long)].collect().toSet
      assert(out == truth.map(key => (key, exact(key), n)))
    }
  }

  test("mgMergeSummaries: hand-computed keywise-sum + (k+1)-th-largest " +
    "prune, ties at the threshold drop") {
    val a = Seq((1L, 3L), (2L, 1L)).toDF("key", "est")
    val b = Seq((3L, 2L), (2L, 2L)).toDF("key", "est")
    // sums: 1->3, 2->3, 3->2; 3rd largest = 2; subtract -> {1:1, 2:1}
    val got = graft.ops.Sketches.mgMergeSummaries(a, b, 2)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L)))
    // k large enough: no prune, plain keywise sum
    val all = graft.ops.Sketches.mgMergeSummaries(a, b, 3)
      .as[(Long, Long)].collect().toSet
    assert(all == Set((1L, 3L), (2L, 3L), (3L, 2L)))
  }

  test("mgHeavyHittersIncremental: the merged-summary candidates still " +
    "cover every true heavy hitter, and the read-out equals the full " +
    "recompute for every split") {
    val k = 8
    val rows = (0 until 4).flatMap(h => Seq.fill(600)(h.toLong)) ++
      (0 until 1000).map(i => 1000L + i)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val truth = exact.filter { case (_, c) => c * (k + 1) > n }
      .map { case (key, c) => (key, c, n) }.toSet
    // delta residues slice the stream differently each time; the
    // maintained path must converge to the same exact answer
    for (residue <- Seq(2, 5, 10)) {
      val df = rows.zipWithIndex
        .map { case (key, i) => (key, i.toLong) }.toDF("key", "i")
        .repartition(16)
      val out = graft.ops.Sketches.mgHeavyHittersIncremental(
        df, col("key"), col("i") % residue === 0, k)
        .as[(Long, Long, Long)].collect().toSet
      assert(out == truth, s"residue=$residue")
    }
  }

  test("mgHeavyHittersGrouped: per-group guarantee — different planted " +
    "heavies per group, read-out equals the exact per-group census " +
    "under every partitioning") {
    val k = 8
    // group A: heavies 0-3; group B: heavies 100-101 (hotter, fewer);
    // both share a 500-key cold tail
    val rowsA = (0 until 4).flatMap(h => Seq.fill(600)(("A", h.toLong))) ++
      (0 until 500).map(i => ("A", 1000L + i))
    val rowsB = (0 until 2).flatMap(h => Seq.fill(900)(("B", 100L + h))) ++
      (0 until 500).map(i => ("B", 1000L + i))
    val rows = rowsA ++ rowsB
    def truthOf(side: Seq[(String, Long)]) = {
      val n = side.size.toLong
      side.groupBy(_._2).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * (k + 1) > n }
        .map { case (key, c) => (side.head._1, key, c, n) }.toSet
    }
    val truth = truthOf(rowsA) ++ truthOf(rowsB)
    assert(truth.map(t => (t._1, t._2)) ==
      Set(("A", 0L), ("A", 1L), ("A", 2L), ("A", 3L),
        ("B", 100L), ("B", 101L)))
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("grp", "key").repartition(parts)
      val out = graft.ops.Sketches
        .mgHeavyHittersGrouped(df, col("grp"), col("key"), k)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(out == truth, s"parts=$parts")
    }
  }

  test("quantileMaintain: union-then-truncate is the bottom-k monoid — " +
    "every delta split yields the bit-identical merged sample read-out") {
    val df = (1 to 5000)
      .map(i => (i.toLong, (i * 37 % 1000).toDouble + 0.25))
      .toDF("id", "v")
    // no-split reference: everything in base, delta empty
    val direct = graft.ops.Sketches
      .quantileMaintain(df, col("id"), col("v"), lit(false))
      .collect().toSeq
    assert(direct.nonEmpty && direct.head.getLong(1) == 64L)
    for (residue <- Seq(2, 5, 10)) {
      val got = graft.ops.Sketches.quantileMaintain(
        df.repartition(16), col("id"), col("v"), col("id") % residue === 0)
        .collect().toSeq
      assert(got == direct, s"residue=$residue")
    }
  }

  test("graft_misra_gries is registered for SQL users") {
    graft.functions.VectorFunctions.register(spark)
    Seq(1L, 1L, 1L, 2L, 3L).toDF("key").repartition(1)
      .createOrReplaceTempView("mgq")
    val arr = spark
      .sql("SELECT graft_misra_gries(key, 2) AS mg FROM mgq")
      .head().getSeq[org.apache.spark.sql.Row](0)
    // same hand case as the native-API test: {1: 2} after the decrement
    assert(arr.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 2L)))
  }

  test("graft_sample_k is registered for SQL users") {
    graft.functions.VectorFunctions.register(spark)
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
    df.createOrReplaceTempView("skq")
    val arr = spark.sql("SELECT graft_sample_k(id, v, 5) AS s FROM skq")
      .head().getSeq[org.apache.spark.sql.Row](0)
    // bottom-5 by the "hash" column, sorted ascending
    assert(arr.map(_.getLong(0)) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(arr.map(_.getDouble(1)) == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
  }
}
