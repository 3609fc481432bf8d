package graft

import org.apache.spark.sql.functions._
import graft.ops.Linkage
import graft.ops.Linkage._

/** Record linkage: the noisy-view construction, blocking recall (boundary
  * buckets recovered by the neighbor pass), agreement semantics with a
  * missing field, threshold classification, and the evaluation identities.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def customers(rows: (Long, String, Int, Double, String)*) =
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")

  private def cust(k: Long, bal: Double, nation: Int = 1,
      seg: String = "BUILDING"): (Long, String, Int, Double, String) =
    (k, f"Customer#$k%09d", nation, bal, seg)

  test("noisyViews: perturbations are the documented pure functions of key") {
    val (a, b) = noisyViews(customers(
      cust(11, 123.45), // % 11: name digits transposed
      cust(10, 99.50),  // % 5: segment nulled; balance rounds up to 100
      cust(3, 67.49)))  // clean; balance rounds down to 67
    val av = a.orderBy("a_id").collect()
    val bv = b.orderBy("b_id").collect()
    assert(av.map(_.getString(1)).toSeq ==
      Seq("000000003", "000000010", "000000011"))
    // key 11: last two digits swapped ('11' stays '11'? no: "000000011"
    // -> swap positions 8,9 -> "000000011" has digits ...1,1 -> same; use
    // the rendered value to pin the rule instead for key 10 (no swap)
    assert(bv.map(_.getString(1)).toSeq ==
      Seq("000000003", "000000010", "000000011"))
    assert(bv.map(_.getLong(3)).toSeq == Seq(67L, 100L, 123L))
    assert(bv.map(r => Option(r.getString(4))).toSeq ==
      Seq(Some("BUILDING"), None, Some("BUILDING")))
  }

  test("noisyViews: the transposition typo actually transposes") {
    // two-digit multiples of 11 have equal final digits (no visible swap),
    // so use 110: "000000110" -> last two digits swapped -> "000000101"
    val (_, b) = noisyViews(customers(cust(110, 10.0)))
    assert(b.head().getString(1) == "000000101")
  }

  test("blocking recovers boundary pairs via the neighbor bucket") {
    // a_bal 199.70 lives in bucket 1; b_bal rounds to 200 (bucket 2) —
    // only the neighbor pass can pair them
    val (a, b) = noisyViews(customers(cust(1, 199.70)))
    val pairs = candidates(a, b)
    assert(pairs.count() == 1)
    assert(pairs.head().getAs[Int]("agr_bal") == 1)
  }

  test("agreement vector: missing segment is 'missing', not 'disagree'") {
    val (a, b) = noisyViews(customers(cust(5, 50.0))) // % 5: seg nulled
    val r = candidates(a, b).head()
    assert(r.getAs[Int]("agr_seg") == 0)
    assert(r.getAs[Int]("seg_missing") == 1)
  }

  test("score: thresholds classify and non-matches are dropped") {
    val cand = Seq(
      (1L, 1L, 1, 1, 1, 0), // 24+10+6 = 40 -> match
      (2L, 3L, 0, 1, 1, 0), // -8+10+6 = 8  -> possible
      (4L, 5L, 0, 0, 0, 0)  // -8-6-4 = -18 -> dropped
    ).toDF("a_id", "b_id", "agr_name", "agr_bal", "agr_seg", "seg_missing")
    val got = score(cand).orderBy("a_id")
      .select("a_id", "score", "decision").as[(Long, Int, String)].collect()
    assert(got.toSeq == Seq((1L, 40, "match"), (2L, 8, "possible")))
  }

  test("evaluate: precision/recall/F1 identities on a known confusion") {
    // 3 matches of which 2 true, 1 possible, 4 truth entities:
    // prec = 2/3 -> 0.6667 (half-up e4), recall = 2/4, f1 = 4/7 -> 0.5714
    val scored = Seq(
      (1L, 1L, 40, "match"), (2L, 2L, 40, "match"), (3L, 9L, 31, "match"),
      (4L, 4L, 8, "possible")
    ).toDF("a_id", "b_id", "score", "decision")
    val truth = Seq(4L).toDF("n_truth")
    val r = evaluate(scored, truth).head()
    assert(r.getAs[Long]("n_match") == 3 && r.getAs[Long]("n_match_true") == 2
      && r.getAs[Long]("n_possible") == 1)
    assert(r.getAs[Double]("prec") == 0.6667)
    assert(r.getAs[Double]("recall") == 0.5)
    assert(r.getAs[Double]("f1") == 0.5714)
  }

  test("pipeline on the fixture: perfect precision, typo-bounded recall") {
    val dir = "/root/testdata/sf0.001"
    val c = Tables.customer(spark, dir)
    val (a, b) = noisyViews(c)
    val r = evaluate(score(candidates(a, b)),
      c.agg(count(lit(1)).as("n_truth"))).head()
    val n = c.count()
    assert(r.getAs[Double]("prec") == 1.0) // no false merges by design
    assert(r.getAs[Long]("n_match") + r.getAs[Long]("n_possible") <= n)
    assert(r.getAs[Double]("recall") > 0.85) // only %11 typos fall short
  }

  test("candidate generation never leaves the block: cross-nation pairs " +
    "are impossible even on identical names") {
    val (a, _) = noisyViews(customers(cust(1, 10.0, nation = 1)))
    val (_, b) = noisyViews(customers(cust(1, 10.0, nation = 2)))
    assert(candidates(a, b).count() == 0)
  }

  // ---- true Damerau-Levenshtein + fuzzy-name linkage

  private def dl(a: String, b: String): Int =
    graft.functions.DamerauLevenshtein.distance(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("DamerauLevenshtein: known vectors, incl. the OSA discriminator") {
    // 'ca' -> 'ac' (transpose) -> 'abc' (insert) = 2; the restricted OSA
    // variant forbids editing a transposed pair again and answers 3 —
    // this case pins the UNRESTRICTED definition (= DuckDB's)
    assert(dl("ca", "abc") == 2)
    assert(dl("ab", "ba") == 1)
    assert(dl("abab", "baba") == 2)
    assert(dl("kitten", "sitting") == 3)
    assert(dl("martha", "marhta") == 1)
    assert(dl("abcdef", "abcfde") == 2)
    assert(dl("smith", "smyth") == 1)
    assert(dl("", "") == 0)
    assert(dl("a", "") == 1 && dl("", "abc") == 3)
    assert(dl("same", "same") == 0)
  }

  test("DamerauLevenshtein: metric properties vs plain Levenshtein") {
    val words = Seq("small ring", "small king", "red widget", "red widgte",
      "blue bolt", "bleu bolt", "hot gear", "", "a", "ab", "ba", "ca", "abc")
    val lev = (a: String, b: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .levenshteinDistance(org.apache.spark.unsafe.types.UTF8String.fromString(b))
    for (a <- words; b <- words) {
      val d = dl(a, b)
      assert(d == dl(b, a), s"symmetry $a/$b")
      assert(d <= lev(a, b), s"DL <= LV for $a/$b")
      assert(d >= math.abs(a.length - b.length), s"length bound $a/$b")
      assert((d == 0) == (a == b), s"identity $a/$b")
    }
  }

  test("DamerauLevenshtein: codegen path agrees with eval on the fixture") {
    import graft.functions.DamerauLevenshtein.damerauLevenshtein
    val p = Tables.part(spark, "/root/testdata/sf0.001")
      .limit(50).select(col("p_name")).collect().map(_.getString(0))
    val df = p.zip(p.reverse).toSeq.toDF("a", "b")
      .select(col("a"), col("b"), damerauLevenshtein(col("a"), col("b")).as("d"))
    df.collect().foreach { r =>
      assert(r.getInt(2) == dl(r.getString(0), r.getString(1)))
    }
  }

  test("dlNameMatches scores distinct names once; multiplicity is a count") {
    val part = Seq(
      (1L, "small ring", "Brand#1"), (2L, "small ring", "Brand#1"),
      (3L, "small king", "Brand#1"), (4L, "small king", "Brand#1"),
      (5L, "small ring", "Brand#2"), // other block: no cross-brand pair
      (6L, "red widget", "Brand#1")  // other tok: no cross-token pair
    ).toDF("p_partkey", "p_name", "p_brand")
    val m = Linkage.dlNameMatches(part).collect()
    assert(m.length == 1)
    val r = m.head
    assert(r.getAs[String]("name_a") == "small king" &&
      r.getAs[String]("name_b") == "small ring" &&
      r.getAs[Long]("dist") == 1L &&
      r.getAs[Long]("entity_pairs") == 4L) // 2 kings x 2 rings
  }

  // ---- Jaro-Winkler e6 (exact integer rational)

  private def jwE6(a: String, b: String): Long =
    graft.functions.JaroWinkler.similarityE6(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** Independent exact reference: same pinned semantics, BigInt rational,
    * plus the distance of n·10^6/d to the nearest half-integer — the
    * boundary margin that makes DuckDB's `round(double * 1e6)` provably
    * agree with the exact half-up rendering.
    */
  private def jwExact(a: String, b: String): (BigInt, BigInt) = {
    val l1 = a.length; val l2 = b.length
    if (l1 == 0 || l2 == 0) return (BigInt(0), BigInt(1))
    val w = math.max(0, math.max(l1, l2) / 2 - 1)
    val aM = new Array[Boolean](l1); val bM = new Array[Boolean](l2)
    var m = 0
    for (i <- 0 until l1) {
      var j = math.max(0, i - w); var found = false
      while (j <= math.min(l2 - 1, i + w) && !found) {
        if (!bM(j) && a(i) == b(j)) { bM(j) = true; aM(i) = true; m += 1; found = true }
        j += 1
      }
    }
    if (m == 0) return (BigInt(0), BigInt(1))
    val s1 = (0 until l1).filter(aM).map(a(_))
    val s2 = (0 until l2).filter(bM).map(b(_))
    val t = s1.zip(s2).count { case (x, y) => x != y } / 2
    var n = BigInt(l2) * m * m + BigInt(l1) * m * m + BigInt(l1) * l2 * (m - t)
    var d = BigInt(3) * l1 * l2 * m
    if (n * 10 >= d * 7) {
      val ell = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
      n = (10 - ell) * n + ell * d
      d = 10 * d
    }
    (n, d)
  }

  test("JaroWinkler e6: classic vectors at the pinned DuckDB semantics") {
    assert(jwE6("dwayne", "duane") == 840000L)
    assert(jwE6("dixon", "dicksonx") == 813333L)
    assert(jwE6("martha", "marhta") == 961111L)
    assert(jwE6("kitten", "sitting") == 746032L) // J>0.7, no common prefix
    assert(jwE6("b", "babedebdcd") == 730000L)   // J = 0.7 exactly: boost
      // applies at the INCLUSIVE threshold (0.7 + 1*0.1*0.3)
    assert(jwE6("ab", "ba") == 0L)               // window 0: no matches
    assert(jwE6("", "anything") == 0L && jwE6("", "") == 0L)
    assert(jwE6("same", "same") == 1000000L)
    assert(jwE6("small ring", "small king") == 960000L)
  }

  test("JaroWinkler e6 equals the independent BigInt reference, and every " +
    "fixture vocab pair sits clear of a half-integer rounding boundary") {
    val v = Linkage.nameVocab(Tables.part(spark, "/root/testdata/sf0.01"))
      .select("tok", "p_brand", "p_name").collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
    var pairs = 0
    v.values.foreach { rows =>
      val names = rows.map(_.getString(2)).sorted
      for (i <- names.indices; j <- (i + 1) until names.length) {
        val (a, b) = (names(i), names(j))
        val (n, d) = jwExact(a, b)
        val scaled = n * 1000000
        assert(jwE6(a, b) == ((2 * scaled + d) / (2 * d)).toLong,
          s"e6 mismatch for '$a'/'$b'")
        // margin to the nearest half-integer of n*1e6/d, in e6 units:
        // |frac - 1/2| > 1e-3 makes a <=1e-9 cross-engine double error
        // unable to flip the rounded value
        val frac = scaled % d
        val margin = (frac * 2 - d).abs  // |frac/d - 1/2| * 2d
        assert(margin * 500 > d, s"'$a'/'$b' within 1e-3 of a half boundary")
        pairs += 1
      }
    }
    assert(pairs > 2000) // the sf0.01 candidate space is actually covered
  }

  test("jwNameMatches: threshold filters on the exact integer score") {
    val part = Seq(
      (1L, "small ring", "Brand#1"), (2L, "small king", "Brand#1"),
      (3L, "small gizmo", "Brand#1") // jw vs ring/king < 0.7+: dropped
    ).toDF("p_partkey", "p_name", "p_brand")
    val m = Linkage.jwNameMatches(part, minJwE6 = 900000L).collect()
    assert(m.length == 1)
    assert(m.head.getAs[Long]("jw_e6") == 960000L &&
      m.head.getAs[Long]("entity_pairs") == 1L)
  }

  test("nameClusters: transitive merge within block, singletons kept") {
    val part = Seq(
      (1L, "small ring", "Brand#1"), (2L, "small ring", "Brand#1"),
      (3L, "small king", "Brand#1"), // ring~king (1), king~kind (1),
      (4L, "small kind", "Brand#1"), // ring~kind (2): one 3-name cluster
      (5L, "red widget", "Brand#1")  // singleton survives
    ).toDF("p_partkey", "p_name", "p_brand")
    val c = Linkage.nameClusters(part).orderBy("comp").collect()
    assert(c.length == 2)
    val merged = c.find(_.getAs[Long]("n_names") == 3).get
    assert(merged.getAs[String]("canonical_name") == "small kind" &&
      merged.getAs[Long]("n_entities") == 4L)
    val single = c.find(_.getAs[Long]("n_names") == 1).get
    assert(single.getAs[String]("canonical_name") == "red widget" &&
      single.getAs[String]("comp") == "Brand#1|red widget")
  }
}
