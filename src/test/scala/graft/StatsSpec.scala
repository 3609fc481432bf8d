package graft

import graft.ops.Stats

/** Dependence statistics: mutual information and chi-square against
  * hand-computable contingency tables, correlation matrix against known
  * linear relationships.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("mutualInfo: independent columns score 0, determined columns score H(X)") {
    // X uniform over {a,b}, Y = X -> I(X;Y) = H(X) = ln 2; Y constant -> 0
    val dependent = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("b", "b"))
      .toDF("x", "y")
    val mi = Stats.mutualInfo(dependent, "x", "y")
      .first().getDouble(0)
    assert(math.abs(mi - math.log(2)) < 1e-6)

    // perfectly independent 2x2: every cell = joint of its marginals
    val indep = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .toDF("x", "y")
    assert(Stats.mutualInfo(indep, "x", "y").first().getDouble(0) == 0.0)
  }

  test("mutualInfo drops null categories rather than counting them") {
    val withNulls = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"),
      (null, "u"), ("a", null)).toDF("x", "y")
    assert(Stats.mutualInfo(withNulls, "x", "y").first().getDouble(0) == 0.0)
  }

  test("chiSquare: 0 on independence, n on perfect 2x2 dependence, dof right") {
    val indep = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .toDF("x", "y")
    val r0 = Stats.chiSquare(indep, "x", "y").first()
    assert(math.abs(r0.getDouble(0)) < 1e-9)
    assert(r0.getLong(1) == 1L)

    // X==Y on a 2x2 grid: chi-square = n
    val dep = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("b", "b")).toDF("x", "y")
    val r1 = Stats.chiSquare(dep, "x", "y").first()
    assert(math.abs(r1.getDouble(0) - 4.0) < 1e-9)
  }

  test("corrMatrix: one pass yields +1 / -1 / 0 for known relationships") {
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0),
      (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0),
      (4.0, 8.0, -4.0, 5.0)
    ).toDF("a", "b", "c", "d")
    val got = Stats.corrMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got(("a", "b")) == 1.0)
    assert(got(("a", "c")) == -1.0)
    assert(got(("b", "c")) == -1.0)
    assert(got.size == 3, "strict upper triangle: k(k-1)/2 pairs")
  }

  test("corrMatrix reads the data once: a single Aggregate in the plan") {
    val df = Seq((1.0, 2.0, 3.0), (2.0, 1.0, 5.0)).toDF("a", "b", "c")
    val plan = Stats.corrMatrix(df, Seq("a", "b", "c"))
      .queryExecution.optimizedPlan.toString
    val aggs = "Aggregate".r.findAllIn(plan).size
    assert(aggs == 1, s"expected one fused aggregate, plan:\n$plan")
  }

  test("groupedOls recovers an exact line and nulls out zero-variance groups") {
    // group a: y = 2x + 1 exactly -> slope 2, intercept 1, r2 1
    // group b: x constant -> vertical line, slope/intercept NULL
    val df = Seq(("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0),
      ("b", 4.0, 1.0), ("b", 4.0, 9.0)).toDF("g", "x", "y")
    val got = Stats.groupedOls(df, "g", "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 3L && a.getDouble(2) == 2.0
      && a.getDouble(3) == 1.0 && a.getDouble(4) == 1.0)
    val b = got("b")
    assert(b.getLong(1) == 2L && b.isNullAt(2) && b.isNullAt(3))
  }

  test("groupedOls excludes null pairs from n and the moments alike") {
    val df = Seq(("a", Some(1.0), Some(3.0)), ("a", Some(2.0), Some(5.0)),
      ("a", Option.empty[Double], Some(9.0)), ("a", Some(9.0), Option.empty[Double]))
      .toDF("g", "x", "y")
    val r = Stats.groupedOls(df, "g", "x", "y").collect().head
    assert(r.getLong(1) == 2L && r.getDouble(2) == 2.0 && r.getDouble(3) == 1.0)
  }

  test("blockJackknife: constant values give exact mean and zero SE") {
    val df = (1 to 40).map(i => (s"row-$i", 7.5)).toDF("rid", "v")
    val r = Stats.blockJackknife(df, "rid", "v").collect().head
    assert(r.getDouble(0) == 7.5 && r.getDouble(1) == 0.0)
    assert(r.getLong(3) == 40L)
    assert(r.getLong(2) >= 2L && r.getLong(2) <= 20L,
      "only nonempty md5 blocks count")
    intercept[IllegalArgumentException] {
      Stats.blockJackknife(df, "rid", "v", nBlocks = 1)
    }
  }

  test("powerAnalysis: detecting a smaller lift needs ~4x the users") {
    // per-user value varies, so sigma2 > 0 and the sizing is real
    val events = (1L to 60L)
      .flatMap(u => Seq.fill((u % 3 + 1).toInt)((u, (u % 7).toDouble)))
      .toDF("user_id", "value")
    val n2 = Stats.powerAnalysis(events, mde = 0.02).collect().head
    val n4 = Stats.powerAnalysis(events, mde = 0.04).collect().head
    assert(n2.getLong(4) == 60L)
    assert(n2.getDouble(1) > 0, "user-level sigma is positive")
    // n scales with 1/mde^2: halving the detectable lift quadruples n
    val ratio = n2.getLong(3).toDouble / n4.getLong(3)
    assert(ratio > 3.9 && ratio < 4.1, s"expected ~4x, got $ratio")
  }

  test("abDeltaTest: value proportional to events gives equal ratios, zero diff") {
    // every event carries value 2.5, so each user's x = 2.5 * y exactly and
    // both variants' ratio metrics collapse to 2.5 with diff 0
    val events = (1L to 40L)
      .flatMap(u => Seq.fill((u % 5 + 1).toInt)((u, 2.5)))
      .toDF("user_id", "value")
    val r = Stats.abDeltaTest(events).collect().head
    assert(math.abs(r.getDouble(0) - 2.5) < 1e-9)
    assert(math.abs(r.getDouble(1) - 2.5) < 1e-9)
    assert(r.getDouble(2) == 0.0)
    assert(r.getLong(4) == 40L, "every user lands in exactly one variant")
  }

  test("kaplanMeier: hand-computed curve with censoring") {
    import org.apache.spark.sql.functions.to_timestamp
    // horizon = Jan 31; churned iff last event before Jan 24 (censorDays=7)
    // u1,u2: t=1 churned; u3: t=10 churned; u4,u5: censored (active at end)
    val events = Seq(
      ("u1", "2024-01-01"), ("u1", "2024-01-02"),
      ("u2", "2024-01-01"), ("u2", "2024-01-02"),
      ("u3", "2024-01-01"), ("u3", "2024-01-11"),
      ("u4", "2024-01-21"), ("u4", "2024-01-31"),
      ("u5", "2024-01-30"), ("u5", "2024-01-31")
    ).toDF("user_id", "d").select($"user_id", to_timestamp($"d").as("ts"))
    val got = Stats.kaplanMeier(events)
      .select("duration_days", "n_events", "n_risk", "survival")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // t=1: 5 at risk, 2 die -> S=0.6; t=10: 2 at risk (u3,u4), 1 dies -> 0.3
    assert(got == Seq((1L, 2L, 5L, 0.6), (10L, 1L, 2L, 0.3)))
  }

  test("kaplanMeier: total death at the last event time drives S to 0") {
    import org.apache.spark.sql.functions.to_timestamp
    // uh pins the horizon (t=0, censored); u1,u2 churn at t=2 — at t=2 both
    // remaining at-risk users die, factor 0, and the ln(0) guard must kick in
    val events = Seq(
      ("uh", "2024-01-31"),
      ("u1", "2024-01-01"), ("u1", "2024-01-03"),
      ("u2", "2024-01-01"), ("u2", "2024-01-03")
    ).toDF("user_id", "d").select($"user_id", to_timestamp($"d").as("ts"))
    val got = Stats.kaplanMeier(events)
      .select("duration_days", "n_events", "n_risk", "survival")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((2L, 2L, 2L, 0.0)))
  }

  test("gini: 0 for equal values, (n-1)/n for total concentration, 0.25 known") {
    def g(xs: Seq[Double]): Double =
      Stats.gini(xs.toDF("x"), "x").first().getDouble(0)
    assert(g(Seq(5.0, 5.0, 5.0, 5.0)) == 0.0)
    assert(g(Seq(0.0, 0.0, 0.0, 10.0)) == 0.75)
    assert(g(Seq(1.0, 2.0, 3.0, 4.0)) == 0.25)
  }

  test("lorenz: equal-count buckets with exact shares and cumulative") {
    val got = Stats.lorenz(Seq(1.0, 2.0, 3.0, 4.0).toDF("x"), "x",
      buckets = 2)
      .select("bucket", "n", "value_sum", "value_share", "cum_share")
      .as[(Int, Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, 2L, 3.0, 0.3, 0.3), (2, 2L, 7.0, 0.7, 1.0)))
  }

  test("gini and lorenz: all-zero values yield NULL ratios, never inf") {
    val zeros = Seq(0.0, 0.0, 0.0).toDF("x")
    val g = Stats.gini(zeros, "x").first()
    assert(g.isNullAt(g.fieldIndex("gini")))
    val l = Stats.lorenz(zeros, "x", buckets = 3).collect()
    assert(l.forall(r => r.isNullAt(r.fieldIndex("value_share"))
      && r.isNullAt(r.fieldIndex("cum_share"))))
  }

  test("ksTest: disjoint supports give D=1 with the exact asymptotic p") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3), ("b", 4), ("a", 1))
      .toDF("g", "v")
    val r = Stats.ksTest(df, "g", "v", "a", "b").first()
    assert(r.getDouble(0) == 1.0) // d_stat
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L) // n_a, n_b
    // p = 2*exp(-2 * 1 * 3*2/5) = 2*exp(-2.4)
    val want = math.min(1.0, 2.0 * math.exp(-2.4))
    assert(math.abs(r.getDouble(3) - want) < 1e-6)
  }

  test("ksTest: identical samples give D=0, p clamped to 1; nulls dropped") {
    val df = Seq(("a", java.lang.Integer.valueOf(1)),
      ("a", java.lang.Integer.valueOf(7)),
      ("b", java.lang.Integer.valueOf(1)),
      ("b", java.lang.Integer.valueOf(7)),
      ("a", null.asInstanceOf[java.lang.Integer]),
      ("c", java.lang.Integer.valueOf(99))) // other group: excluded
      .toDF("g", "v")
    val r = Stats.ksTest(df, "g", "v", "a", "b").first()
    assert(r.getDouble(0) == 0.0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 1.0)
  }

  test("ksTest: one-sided shift is the CDF gap at the crossover") {
    // a = {1,2,3,4}, b = {3,4,5,6}: max gap at v=2 -> |2/4 - 0/4| = 0.5
    val df = (Seq(1, 2, 3, 4).map(("a", _)) ++ Seq(3, 4, 5, 6).map(("b", _)))
      .toDF("g", "v")
    assert(Stats.ksTest(df, "g", "v", "a", "b").first().getDouble(0) == 0.5)
  }

  test("spearman: monotone maps hit ±1, a midrank tie matches the hand " +
    "Pearson-on-ranks value") {
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    assert(Stats.spearman(up, "x", "y")
      .select("rho").as[Double].collect().head == 1.0)
    val down = Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("x", "y")
    assert(Stats.spearman(down, "x", "y")
      .select("rho").as[Double].collect().head == -1.0)
    // x = [1,1,2] (midranks 1.5, 1.5, 3), y = [1,2,3]: by hand
    // rho = 18 / sqrt(18*24) = 0.8660254...
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("x", "y")
    assert(Stats.spearman(tied, "x", "y")
      .select("rho").as[Double].collect().head == 0.866025)
  }

  test("cuped: perfect covariate gives theta = slope and 100% reduction; " +
    "zero covariate variance gives NULLs") {
    // y = 2x exactly: theta = cov/var = 2, corr² = 1 -> 100%
    val perfect = Seq((1L, 2L), (2L, 4L), (3L, 6L)).toDF("x", "y")
    val got = graft.ops.Stats.cuped(perfect, "x", "y")
      .as[(Long, Double, Double)].collect().head
    assert(got == ((3L, 2.0, 100.0)))
    val flat = Seq((5L, 1L), (5L, 2L)).toDF("x", "y")
    val row = graft.ops.Stats.cuped(flat, "x", "y")
      .select("theta", "var_reduction_pct").collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("sampleRatioMismatch: counts match an independent md5 parity and " +
    "the integer flag matches the chi2 double") {
    val ids = (1L to 400L)
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val expA = ids.count(bucket(_) == 0).toLong
    val df = ids.toDF("user_id")
    val got = graft.ops.Stats.sampleRatioMismatch(df, "user_id")
      .as[(Long, Long, Long, Double, Boolean)].collect().head
    val n = 400L
    val dev = 2 * expA - n
    assert(got._1 == n && got._2 == expA && got._3 == n - expA)
    assert(got._4 == dev.toDouble * dev.toDouble / n.toDouble)
    assert(got._5 == (100 * dev * dev > 384 * n))
  }

  test("spearman: zero variance on either side is NULL, never NaN") {
    val flat = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("x", "y")
    val row = Stats.spearman(flat, "x", "y").select("rho").collect().head
    assert(row.isNullAt(0))
  }

  test("mannWhitney: tie-free hand case U=1, z=-2/sqrt(3)") {
    // A = {1,2,4}, B = {3,5}: R_A = 7, U_A = 7 - 3*4/2 = 1,
    // var(U) = 3*2*(6*5*4)/(12*5*4) = 3, z = (1-3)/sqrt(3)
    val df = Seq(("a", 1L), ("a", 2L), ("a", 4L), ("b", 3L), ("b", 5L))
      .toDF("g", "v")
    val r = Stats.mannWhitney(df, "g", "v", "a", "b")
      .as[(Long, Long, Double, Double)].collect().head
    assert(r._1 == 3L && r._2 == 2L)
    assert(r._3 == 1.0)
    assert(math.abs(r._4 - (-2.0 / math.sqrt(3.0))) < 1e-12)
  }

  test("mannWhitney: midrank ties carry the exact correction") {
    // A = {1,2,2}, B = {2,3}: midrank of the three 2s is 3, R_A = 7,
    // U_A = 1; T = 3^3-3 = 24, var(U) = 6*(120-24)/240 = 2.4
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 2L), ("b", 3L))
      .toDF("g", "v")
    val r = Stats.mannWhitney(df, "g", "v", "a", "b")
      .as[(Long, Long, Double, Double)].collect().head
    assert(r._3 == 1.0)
    assert(math.abs(r._4 - (-2.0 / math.sqrt(2.4))) < 1e-12)
  }

  test("mannWhitney: degenerate inputs yield NULL z, never NaN") {
    // every value tied -> zero variance
    val tied = Seq(("a", 2L), ("a", 2L), ("b", 2L)).toDF("g", "v")
    val r1 = Stats.mannWhitney(tied, "g", "v", "a", "b").collect().head
    assert(r1.getDouble(2) == 1.0) // U_A = midrank sum 4 - 3
    assert(r1.isNullAt(3))
    // one group empty
    val one = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    val r2 = Stats.mannWhitney(one, "g", "v", "a", "b").collect().head
    assert(r2.getLong(1) == 0L && r2.isNullAt(3))
  }

  test("permutationTest: a metric equal to the assignment is extreme " +
    "under every salted null, deterministic p = 1/65") {
    import org.apache.spark.sql.functions._
    val ids = (1L to 200L).toDF("user_id")
    // metric = the unsalted assignment indicator itself: d_obs equals the
    // full bucket-0 count, which no salted re-assignment's half-overlap
    // imbalance can reach
    val units = ids.select(col("user_id"),
      when(pmod(conv(substring(md5(col("user_id").cast("string")), 1, 4),
        16, 10).cast("long"), lit(2)) === 0L, 1L).otherwise(0L).as("m"))
    val r = Stats.permutationTest(units, "user_id", "m")
      .as[(Long, Long, Long, Double)].collect().head
    assert(r._1 == 64L)
    assert(r._2 > 50L && r._2 < 150L) // d_obs = bucket-0 count of 200 ids
    assert(r._3 == 0L)
    assert(r._4 == 0.015385) // ExactRatio(1, 65, 6)
    // deterministic: a second run is bit-identical
    val again = Stats.permutationTest(units, "user_id", "m")
      .as[(Long, Long, Long, Double)].collect().head
    assert(again == r)
  }

  test("permutationTest: empty input returns the 0-perm row, no crash") {
    val empty = Seq.empty[(String, Long)].toDF("user_id", "m")
    val r = Stats.permutationTest(empty, "user_id", "m").collect().head
    assert(r.getLong(0) == 0L)
  }

  test("fdrScreen: an assignment-correlated group is BH-significant at " +
    "rank 1; zero-signal groups sit at p=1 and stay out of the reject set") {
    import org.apache.spark.sql.functions._
    val ids = (1L to 200L).toDF("user_id")
    // group 'a': metric = the unsalted assignment indicator (extreme,
    // n_ge = 0); groups 'b','c': all-zero metric -> d_obs = dk = 0 ->
    // every null tie counts, p = 1 by construction
    val withBucket = ids.select(col("user_id"),
      when(pmod(conv(substring(md5(col("user_id").cast("string")), 1, 4),
        16, 10).cast("long"), lit(2)) === 0L, 1L).otherwise(0L).as("ind"))
    val df = Seq("a", "b", "c").map(g =>
      withBucket.select(col("user_id"), lit(g).as("g"),
        (if (g == "a") col("ind") else lit(0L)).as("z")))
      .reduce(_ unionByName _)
    val got = Stats.fdrScreen(df, "user_id", "g", sum(col("z")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4), r.getBoolean(5),
          r.getBoolean(6))).toMap
    // a: n_ge=0, p=1/65, rank 1; BH: 100*3*1 = 300 <= 5*1*65 = 325
    assert(got("a") == ((0L, 0.015385, 1L, true, true)))
    // b, c: n_ge=64, p=1, ranks 2-3, never pass, never significant
    for (g <- Seq("b", "c")) {
      val (nGe, p, _, pass, sig) = got(g)
      assert(nGe == 64L && p == 1.0 && !pass && !sig)
    }
  }

  test("fdrScreen: step-up rescues a borderline group below a stronger " +
    "one (the BH property a per-test threshold lacks)") {
    import org.apache.spark.sql.functions._
    // two groups, both assignment-correlated -> both n_ge=0, ranks 1,2;
    // rank 2 passes because 100*2*1 = 200 <= 5*2*65 = 650 — and if only
    // rank 2's own Bonferroni-style bound held it would still reject
    val ids = (1L to 100L).toDF("user_id")
    val withBucket = ids.select(col("user_id"),
      when(pmod(conv(substring(md5(col("user_id").cast("string")), 1, 4),
        16, 10).cast("long"), lit(2)) === 0L, 1L).otherwise(0L).as("ind"))
    val df = Seq("a", "b").map(g =>
      withBucket.select(col("user_id"), lit(g).as("g"), col("ind").as("z")))
      .reduce(_ unionByName _)
    val got = Stats.fdrScreen(df, "user_id", "g", sum(col("z")))
      .collect().map(r => r.getString(0) -> (r.getBoolean(5), r.getBoolean(6)))
      .toMap
    assert(got("a") == ((true, true)) && got("b") == ((true, true)))
  }

  test("poissonBoundaries are the Poisson(1) CDF at k = 0..8") {
    val b = Stats.poissonBoundaries
    assert(b.size == 9)
    assert(math.abs(b.head - math.exp(-1.0)) < 1e-15)
    assert(math.abs(b(2) - 2.5 * math.exp(-1.0)) < 1e-15) // e⁻¹(1+1+1/2)
    assert(b == b.sorted && b.last < 1.0)
    // the SQL rendering round-trips to the identical doubles
    val parsed = Stats.poissonBoundarySql.stripPrefix("[").stripSuffix("]")
      .split(", ").map(_.toDouble).toSeq
    assert(parsed == b)
  }

  test("bootstrapMean: constant values give the constant back for every " +
    "replicate; weights are Poisson-calibrated and run-deterministic") {
    import org.apache.spark.sql.functions._
    val events = (1L to 400L).toDF("event_id")
      .select(col("event_id"), lit(7.25).as("value"))
    val got = Stats.bootstrapMean(events, b = 50)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 50)
    // a replicate's mean of a constant is that constant, whatever the draw
    assert(got.forall(_._3 == 7.25), s"non-constant means: ${got.take(3).toSeq}")
    // E[n_eff] = n (E[Poisson(1)] = 1): the 50-replicate average must sit
    // within 4 sigma (sigma = sqrt(n/B) ≈ 2.8)
    val meanNeff = got.map(_._2).sum.toDouble / got.length
    assert(math.abs(meanNeff - 400.0) < 12.0, s"n_eff mean $meanNeff")
    // md5-seeded: a second run is bit-identical
    val again = Stats.bootstrapMean(events, b = 50)
      .as[(Long, Long, Double)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("bootstrapDiff: arm-constant values give the exact treatment " +
    "effect in every replicate") {
    import org.apache.spark.sql.functions._
    val arm = pmod(conv(substring(md5(col("user_id").cast("string")), 1, 4),
      16, 10).cast("long"), lit(2))
    val events = (1L to 200L).toDF("user_id").select(
      col("user_id").as("event_id"), col("user_id"),
      when(arm === 0, 10.0).otherwise(12.5).as("value"))
    val got = Stats.bootstrapDiff(events, b = 40)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length == 40)
    assert(got.forall(r => r._4 == 10.0 && r._5 == 12.5 && r._6 == 2.5),
      s"non-constant arm means: ${got.take(3).toSeq}")
    // both arms drew non-degenerate weights in every replicate
    assert(got.forall(r => r._2 > 0 && r._3 > 0))
  }
}
