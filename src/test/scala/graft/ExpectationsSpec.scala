package graft

import org.apache.spark.sql.functions._
import graft.ops.Expectations._

/** Data-quality expectations: per-rule-type violation counting (including
  * the unevaluable-row policy), rule ordering, and the fused-scan shape.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    (1L, Option(5.0), Option("ok")),
    (2L, Option(500.0), Option("ok")),     // out of range
    (3L, Option.empty[Double], Option("ok")), // NULL range input -> violation
    (3L, Option(6.0), Option.empty[String]),  // dup id + null tag
    (4L, Option(7.0), Option("bad!"))
  ).toDF("id", "x", "tag")

  test("row rules: holds, fails, and unevaluable all counted correctly") {
    val got = check(facts, Seq(
      NotNull("tag"),
      InRange("x", 0, 100),
      Matches("tag", "^[a-z]+$")))
      .orderBy("ordinal")
      .select("rule", "n_violations", "n_checked", "pass")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("tag_not_null", 1L, 5L, false),
      // 500 out of range + NULL x is unevaluable -> 2
      ("x_in_range", 2L, 5L, false),
      // "bad!" fails the regex, NULL tag is unevaluable -> 2
      ("tag_matches", 2L, 5L, false)))
  }

  test("unique and foreign-key rules count keyed violations") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val got = check(facts, Seq(
      Unique(Seq("id")),
      ForeignKey(Seq("id"), dim, Seq("k"), "id_dim")))
      .orderBy("ordinal")
      .select("rule", "n_violations", "n_checked", "pass")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("id_unique", 1L, 5L, false),   // id 3 appears twice
      ("id_dim_fk", 1L, 5L, false))) // id 4 missing from dim
  }

  test("a fully clean table passes every rule") {
    val clean = Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("id", "x", "tag")
    val got = check(clean, Seq(
      NotNull("tag"), InRange("x", 0, 10), Unique(Seq("id"))))
    assert(got.filter(!col("pass")).count() == 0)
    assert(got.count() == 3)
  }

  test("all row rules fuse into a single scan of the input") {
    val p = check(facts, Seq(
      NotNull("tag"), InRange("x", 0, 100), Matches("tag", "x"),
      NotNull("x"), InRange("id", 0, 10)))
      .queryExecution.sparkPlan.toString
    val scans = "LocalTableScan".r.findAllIn(p).size
    assert(scans == 1, s"5 row rules must share one scan, got $scans:\n$p")
  }

  test("empty rule list yields an empty report, not a crash") {
    val got = check(facts, Nil)
    assert(got.count() == 0)
    assert(got.columns.toSeq ==
      Seq("ordinal", "rule", "n_violations", "n_checked", "pass"))
  }

  test("rule names with quotes and backticks survive the fused stack") {
    val odd = Seq((1L, Option("a")), (2L, Option.empty[String]))
      .toDF("id", "it's `quoted`")
    val got = check(odd, Seq(NotNull("it's `quoted`")))
      .select("rule", "n_violations", "pass")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got == Seq(("it's `quoted`_not_null", 1L, false)))
  }

  test("Unique counts duplicates only among fully-non-null key tuples") {
    // two NULL-keyed rows: NOT duplicates of each other (explicit policy);
    // id 3 still duplicated among the non-null tuples
    val withNulls = Seq(
      (Option(3L), "a"), (Option(3L), "b"),
      (Option.empty[Long], "c"), (Option.empty[Long], "d"),
      (Option(4L), "e")
    ).toDF("id", "v")
    val got = check(withNulls, Seq(Unique(Seq("id"))))
      .select("n_violations", "n_checked")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L))) // only the id-3 extra copy; NULLs exempt
  }

  test("benfordDigits: string-exact leading digits, sub-1 values excluded") {
    val vals = Seq(123.45, 0.5, 9876.0, 1.0, 55.0, Double.NaN)
      .toDF("v").filter(!isnan(col("v")))
    val got = benfordDigits(vals, "v")
      .select("digit", "n_obs", "p_obs", "p_exp")
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1).toSeq
    // 0.5 excluded; digits: 1 (123.45), 9 (9876), 1 (1.0), 5 (55) -> n=4
    assert(got.map(t => (t._1, t._2)) == Seq((1, 2L), (5, 1L), (9, 1L)))
    assert(got.head._3 == 0.5) // p_obs(1) = 2/4
    assert(math.abs(got.head._4 - math.log10(2.0)) < 1e-6)
  }

  test("kAnonymity: counts groups and rows below k") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c"))
      .zipWithIndex.toDF("qid", "i")
    val r = kAnonymity(df, Seq("qid"), k = 3).collect().head
    assert(r.getInt(0) == 3)        // k
    assert(r.getLong(1) == 9L)      // n_rows
    assert(r.getLong(2) == 3L)      // n_groups
    assert(r.getLong(3) == 2L)      // groups b, c at risk
    assert(r.getLong(4) == 3L)      // their 3 rows
    assert(r.getDouble(5) == 0.333333)
  }

  test("lDiversity: a large-but-homogeneous group is at risk while a " +
    "small diverse one is not") {
    // group a: 4 rows, all sensitive=1 (k-safe, l-risky);
    // group b: 2 rows, sensitive {1, 2} (l=2, at risk only for l=3);
    // group c: 3 rows, sensitive {1, 2, 3} (diverse)
    val df = Seq(
      ("a", 1), ("a", 1), ("a", 1), ("a", 1),
      ("b", 1), ("b", 2),
      ("c", 1), ("c", 2), ("c", 3)).toDF("q", "s")
    val r = lDiversity(df, Seq("q"), "s", l = 3).head()
    assert(r.getInt(0) == 3)        // l
    assert(r.getLong(1) == 9L)      // n_rows
    assert(r.getLong(2) == 3L)      // n_groups
    assert(r.getLong(3) == 2L)      // a (1 value), b (2 values)
    assert(r.getLong(4) == 6L)      // their rows
    assert(r.getDouble(5) == 0.666667)
  }

  test("fdViolations: holding rule reports zero; violated rule counts " +
    "determinants, rows, and g3 repair deletes exactly") {
    // rule q->s: det a maps to {1,1,2} (majority 2 -> 1 delete),
    // det b maps to {5} (holds), det c maps to {6,7} (1+1 -> 1 delete)
    val df = Seq(
      ("a", 1), ("a", 1), ("a", 2),
      ("b", 5),
      ("c", 6), ("c", 7)).toDF("q", "s")
      .withColumn("id", monotonically_increasing_id())
    val byRule = fdViolations(df, Seq(("q", "s"), ("id", "q")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byRule("q->s") == ((3L, 2L, 5L, 2L)))
    assert(byRule("id->q") == ((6L, 0L, 0L, 0L))) // id is a key: holds
  }

  /** md5-seeded uniform, reimplemented independently of the operator. */
  private def uOf(key: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 12)
    (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 281474976710656.0
  }

  /** Independent discrete-Laplace inverse CDF: cumulative SUM of the pmf
    * p(j) = (1−α)/(1+α)·α^|j| scanned left to right — a different
    * arithmetic path from the operator's closed-form pow() boundaries,
    * so agreement is evidence, not tautology. Also returns the distance
    * of u from the nearest cumulative boundary.
    */
  private def refNoise(u: Double, eps: Double, k: Int): (Long, Double) = {
    val a = math.exp(-eps)
    val pmf = (-k to k).map(j =>
      (1.0 - a) / (1.0 + a) * math.pow(a, math.abs(j)))
    val cums = pmf.scanLeft(0.0)(_ + _).tail // F(-k) .. F(k), summed
    val idx = cums.indexWhere(_ >= u)
    val z = (if (idx < 0) k else idx - k).toLong
    (z, cums.map(c => math.abs(c - u)).min)
  }

  test("dpCountRelease: integer noise matches an independent pmf-sum " +
    "inverse-CDF draw from the key's md5, and the release is deterministic") {
    val df = Seq("x", "x", "x", "y").toDF("g")
    val got = dpCountRelease(df, Seq("g"), epsilon = 1.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for ((k, n) <- Seq("x" -> 3L, "y" -> 1L)) {
      val (want, dist) = refNoise(uOf(k), 1.0, 35)
      assert(dist > 1e-9, s"fixture key $k draws u on a bucket boundary")
      assert(got(k)._1 == n)
      assert(got(k)._2 == want, s"noise for $k")
      assert(got(k)._3 == math.max(n + want, 0L)) // clamped integer release
    }
    // deterministic: a second run is bit-identical
    val again = dpCountRelease(df, Seq("g"), epsilon = 1.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again == got)
  }

  test("profileDrift: null-rate shift and NDV band alarms fire exactly " +
    "where the hand profile says") {
    val ref = Seq[(Option[Int], String)](
      (Some(1), "a"), (Some(2), "b"), (Some(3), "c"), (Some(4), "d"))
      .toDF("x", "y")
    // x: nulls 0/4 -> 2/4 (shift), ndv 4 -> 2 (band edge: 2*2 = 4, NOT
    // outside); y: ndv 4 -> 1 (outside), no nulls
    val cur = Seq[(Option[Int], String)](
      (Some(5), "e"), (Some(5), "e"), (None, "e"), (None, "e"))
      .toDF("x", "y")
    val got = profileDrift(ref, cur, Seq("x", "y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6),
          r.getDouble(8), r.getBoolean(9), r.getBoolean(10))).toMap
    assert(got("x") == ((0L, 4L, 2L, 1L, 0.5, true, true)))
    assert(got("y") == ((0L, 4L, 0L, 1L, 0.0, false, true)))
  }

  test("profileDrift: an empty snapshot yields NULL shift alarms, " +
    "never NaN, and zero-denominator rates stay 0") {
    val ref = Seq((1, "a")).toDF("x", "y")
    val cur = ref.filter(lit(false))
    val row = profileDrift(ref, cur, Seq("x")).collect().head
    assert(row.getLong(4) == 0L)           // n_cur
    assert(row.getDouble(8) == 0.0)        // null_rate_cur
    assert(row.isNullAt(9))                // null_shift undecidable
  }

  test("dpCountRelease cross-engine certificate: the boundary-table SQL " +
    "rendering round-trips to the bit-identical doubles, ascending") {
    // the whole exactness argument is "both engines compare the same
    // doubles": the plan takes them from the Seq, the oracle parses the
    // %.17g rendering — assert the rendering is lossless and the table
    // is strictly ascending with the tail below u's 2^-48 resolution
    val (bounds, k) = dpNoiseBoundaries(1.0)
    assert(k == 35 && bounds.size == 2 * k)
    val sql = dpBoundarySql(1.0)
    val parsed = sql.stripPrefix("[").stripSuffix("]")
      .split(",").map(_.trim.toDouble).toSeq
    assert(parsed == bounds, "SQL literal rendering must round-trip")
    assert(bounds.sliding(2).forall(p => p(0) < p(1)), "ascending CDF")
    assert(bounds.head < math.pow(2, -48) &&
      1.0 - bounds.last < math.pow(2, -48),
      "tail mass must sit below the md5-uniform's resolution")
  }

  test("dpCountRelease: smaller epsilon gives weakly larger |noise| on " +
    "the same seed; the released count never goes negative; a tiny " +
    "epsilon fails loudly at the table cap") {
    val df = (1 to 2).map(_ => "k").toDF("g")
    val n1 = dpCountRelease(df, Seq("g"), epsilon = 1.0)
      .collect().head.getLong(2)
    val n2 = dpCountRelease(df, Seq("g"), epsilon = 0.5)
      .collect().head.getLong(2)
    assert(math.abs(n2) >= math.abs(n1))
    assert(n1 * n2 >= 0, "same seed, same side of the median")
    val rel = dpCountRelease(df, Seq("g"), epsilon = 0.05)
      .collect().head.getLong(3)
    assert(rel >= 0L)
    val e = intercept[IllegalArgumentException](
      dpCountRelease(df, Seq("g"), epsilon = 0.001))
    assert(e.getMessage.contains("cap 1024"))
  }

  test("inclusionCensus: containment ratios, null keys dropped, " +
    "direction matters") {
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(3L), None)
      .toDF("ck")
    val parent = Seq(1L, 2L, 9L).toDF("pk")
    val got = graft.ops.Expectations.inclusionCensus(Seq(
      graft.ops.Expectations.Inclusion("c->p", child, "ck", parent, "pk"),
      graft.ops.Expectations.Inclusion("p->c", parent, "pk", child, "ck")))
      .as[(String, Long, Long, Double)].collect().toSeq
    // c->p: distinct {1,2,3}, contained {1,2} -> 2/3 = .666667 half-up
    // p->c: distinct {1,2,9}, contained {1,2} -> 2/3
    assert(got == Seq(("c->p", 3L, 2L, 0.666667), ("p->c", 3L, 2L, 0.666667)))
  }

  test("dpQuantileRelease: engine mechanism equals an independent Scala " +
    "replication, and the release is partitioning-invariant") {
    import spark.implicits._
    val values = Seq.fill(10)(3L) ++ Seq.fill(25)(5L) ++
      Seq.fill(7)(6L) ++ Seq.fill(18)(9L)
    // independent replication of the whole mechanism
    val n = values.size.toLong
    val t = math.max(1L, (n * 2 + 2) / 4)
    val counts = values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val doms = (1L to 10L).toSeq
    val cums = doms.scanLeft(0L)((acc, v) => acc + counts.getOrElse(v, 0L)).tail
    val ws = cums.map(c => 1L << (40L - math.min(math.abs(c - t), 40L)).toInt)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("dpq|1/2".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 281474976710656.0
    val wTot = ws.sum
    val cumw = ws.scanLeft(0L)(_ + _).tail
    val released = doms.zip(cumw)
      .find { case (_, cw) => cw.toDouble > u * wTot.toDouble }.get._1
    val vTrue = doms.zip(cums).find { case (_, c) => c >= t }.get._1
    assert(vTrue == 5L) // hand check: cum(3)=10 < 30 = t <= cum(5)=35
    for (parts <- Seq(1, 8)) {
      val out = graft.ops.Expectations.dpQuantileRelease(
        values.toDF("x").repartition(parts), col("x"), 1, 10)
        .as[(Double, Double, Long, Long, Long, Long)].head()
      assert(out == ((0.5, 4.0 * math.log(2.0), n, t, vTrue, released)),
        s"parts=$parts")
    }
  }

  test("inclusionCensus: an all-null child column yields a NULL ratio") {
    val child = Seq[Option[Long]](None, None).toDF("ck")
    val parent = Seq(1L).toDF("pk")
    val row = graft.ops.Expectations.inclusionCensus(Seq(
      graft.ops.Expectations.Inclusion("n->p", child, "ck", parent, "pk")))
      .collect().head
    assert(row.getLong(1) == 0L && row.getLong(2) == 0L && row.isNullAt(3))
  }
}
