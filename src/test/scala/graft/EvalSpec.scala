package graft

import org.apache.spark.sql.functions._

/** Model-eval metrics: hand-computed confusion cells, the midrank AUC on
  * a tied example worked by hand (pair-counting cross-check), degenerate
  * separations, and the same-label MRR rank math including the no-hit
  * zero-contribution rule.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("confusionReport: hand-counted cells and exact ratios") {
    // scores/labels: (10,1) (5,1) (0,0) (-5,1) (-10,0)
    val df = Seq((10L, 1L), (5L, 1L), (0L, 0L), (-5L, 1L), (-10L, 0L))
      .toDF("score", "y")
    val got = graft.ops.Eval.confusionReport(df, "score", "y", Seq(0L))
      .select("threshold", "tp", "fp", "fn", "tn", "accuracy", "prec",
        "recall", "f1")
      .as[(Long, Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    // >= 0 predicts positive: tp = {10, 5} = 2, fp = {0} = 1,
    // fn = {-5} = 1, tn = {-10} = 1
    // accuracy 3/5 = .6, precision 2/3 = .666667 (half-up),
    // recall 2/3, f1 = 4/(4+1+1) = .666667
    assert(got == Seq((0L, 2L, 1L, 1L, 1L, 0.6, 0.666667, 0.666667,
      0.666667)))
  }

  test("confusionReport: empty-denominator metrics are null, not NaN") {
    val df = Seq((1L, 0L), (2L, 0L)).toDF("score", "y") // no positives
    val row = graft.ops.Eval.confusionReport(df, "score", "y", Seq(10L))
      .select("prec", "recall", "f1").collect().head
    // threshold above every score: tp = fp = 0 -> precision null;
    // no positive labels at all -> recall null; f1 denominator 0 -> null
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
  }

  test("aucQuantized: tied example matches hand pair-counting") {
    // scores [1, 2, 2, 3], labels [0, 1, 0, 1]
    // pairs (pos vs neg): 2+ vs 1 win, 2+ vs 2- tie (0.5),
    //                     3+ vs 1 win, 3+ vs 2- win => U = 3.5, AUC = 7/8
    val df = Seq((1L, 0L), (2L, 1L), (2L, 0L), (3L, 1L)).toDF("s", "y")
    val got = graft.ops.Eval.aucQuantized(df, "s", "y")
      .select("n_pos", "n_neg", "n_scores", "auc")
      .as[(Long, Long, Long, Double)].collect().head
    assert(got == ((2L, 2L, 3L, 0.875)))
  }

  test("aucQuantized: perfect and inverted separations hit 1 and 0") {
    val perfect = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("s", "y")
    val inverted = Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L)).toDF("s", "y")
    assert(graft.ops.Eval.aucQuantized(perfect, "s", "y")
      .select("auc").as[Double].collect().head == 1.0)
    assert(graft.ops.Eval.aucQuantized(inverted, "s", "y")
      .select("auc").as[Double].collect().head == 0.0)
  }

  private def emb(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("mrrSameLabel: first same-label neighbor at rank 2 gives 1/2") {
    // query = vec_id 0 (the % 50 == 0 subset); cosines to [1,0]:
    // id 1 -> .995 (label 2), id 2 -> .958 (label 1), id 3 -> 0 (label 3),
    // id 4 -> -1 (label 1). First label-1 hit at rank 2.
    val df = emb(
      (0L, Seq(1f, 0f), 1), (1L, Seq(1f, 0.1f), 2), (2L, Seq(1f, 0.3f), 1),
      (3L, Seq(0f, 1f), 3), (4L, Seq(-1f, 0f), 1))
    val got = graft.ops.Eval.mrrSameLabel(df)
      .select("label", "n_queries", "n_hit", "mrr")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1, 1L, 1L, 0.5)))
  }

  test("mrrSameLabel: no same-label neighbor contributes zero, not null") {
    val df = emb(
      (0L, Seq(1f, 0f), 9), (1L, Seq(1f, 0.1f), 2), (2L, Seq(1f, 0.3f), 1))
    val got = graft.ops.Eval.mrrSameLabel(df)
      .select("label", "n_queries", "n_hit", "mrr")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(got == Seq((9, 1L, 0L, 0.0)))
  }

  test("mrrSameLabel: k > 10 breaks 2520-exactness and fails loudly") {
    val e = intercept[IllegalArgumentException] {
      graft.ops.Eval.mrrSameLabel(emb((0L, Seq(1f), 1)), k = 11)
    }
    assert(e.getMessage.contains("2520"))
  }

  test("tCloseness: hand EMD — fully skewed groups violate, uniform do not") {
    // values {0,1}, global 2/2 (N=4, m=2); group a = {0,0}, b = {1,1}
    // group a cum: v0 -> 2*4 - 2*2 = 4, v1 -> 4 + (0 - 2*2) = 0
    // EMD = 4 / (2*4*1) = 0.5 > 1/5 -> both groups violate
    val df = Seq(("a", 0L), ("a", 0L), ("b", 1L), ("b", 1L)).toDF("g", "v")
    val got = graft.ops.Expectations.tCloseness(df, Seq("g"), "v", 1, 5)
      .select("t_num", "t_den", "n_rows", "n_groups", "n_groups_at_risk",
        "n_rows_at_risk", "risk_share")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().head
    assert(got == ((1L, 5L, 4L, 2L, 2L, 4L, 1.0)))

    // perfectly mirrored groups: every group's distribution == global
    val uniform = Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L))
      .toDF("g", "v")
    val u = graft.ops.Expectations.tCloseness(uniform, Seq("g"), "v", 1, 5)
      .select("n_groups_at_risk", "n_rows_at_risk", "risk_share")
      .as[(Long, Long, Double)].collect().head
    assert(u == ((0L, 0L, 0.0)))
  }

  test("tCloseness: single-valued attribute (m=1) is trivially t-close") {
    val df = Seq(("a", 7L), ("b", 7L)).toDF("g", "v")
    val got = graft.ops.Expectations.tCloseness(df, Seq("g"), "v", 1, 5)
      .select("n_groups_at_risk").as[Long].collect().head
    assert(got == 0L)
  }

  test("tCloseness: null sensitive values are excluded from the census") {
    val df = Seq(("a", Option(0L)), ("a", Option(0L)), ("b", Option(1L)),
      ("b", Option.empty[Long])).toDF("g", "v")
    val got = graft.ops.Expectations.tCloseness(df, Seq("g"), "v", 1, 5)
      .select("n_rows").as[Long].collect().head
    assert(got == 3L)
  }

  test("ndcgSameLabel: quantized weight table and worked micro-average") {
    // weight table pins (floor(1e6 / log2(i+1))): ranks 1..4
    assert(graft.ops.Eval.ndcgWeightsE6.take(4) ==
      Seq(1000000L, 630929L, 500000L, 430676L))
    // mrr fixture: query 0 (label 1), ranked neighbors by cosine:
    // rank1 id1 (label 2), rank2 id2 (label 1), rank3 id3 (label 3),
    // rank4 id4 (label 1) -> DCG = W2 + W4 = 1061605
    // R = 3 same-label vectors - self = 2 -> IDCG = W1 + W2 = 1630929
    val df = emb(
      (0L, Seq(1f, 0f), 1), (1L, Seq(1f, 0.1f), 2), (2L, Seq(1f, 0.3f), 1),
      (3L, Seq(0f, 1f), 3), (4L, Seq(-1f, 0f), 1))
    val got = graft.ops.Eval.ndcgSameLabel(df)
      .select("label", "n_queries", "sum_dcg_e6", "sum_idcg_e6",
        "ndcg_micro")
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    // exactRatio(1061605, 1630929, 6) = 0.650920
    assert(got == Seq((1, 1L, 1061605L, 1630929L, 0.650920)))
  }

  test("ndcgSameLabel: a singleton-label query has IDCG 0 and NULL ndcg") {
    val df = emb(
      (0L, Seq(1f, 0f), 9), (1L, Seq(1f, 0.1f), 2), (2L, Seq(1f, 0.3f), 1))
    val row = graft.ops.Eval.ndcgSameLabel(df)
      .select("sum_dcg_e6", "sum_idcg_e6", "ndcg_micro").collect().head
    assert(row.getLong(0) == 0L && row.getLong(1) == 0L && row.isNullAt(2))
  }

  test("featureAuc: per-feature midrank AUC in one pass, constant " +
    "feature scores 0.5") {
    // feature a: aucQuantized's worked tied example (7/8); feature b:
    // constant - all scores tied, AUC exactly 1/2
    val df = Seq((1L, 0L), (2L, 1L), (2L, 0L), (3L, 1L)).toDF("a", "y")
    val got = graft.ops.Eval.featureAuc(df,
      Seq("a" -> col("a"), "b" -> lit(7L)), col("y") === 1L)
      .select("feature", "n_pos", "n_neg", "n_scores", "auc")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 2L, 2L, 3L, 0.875), ("b", 2L, 2L, 1L, 0.5)))
  }

  test("featureAuc: a single-class label yields NULL AUC, not a crash") {
    val df = Seq((1L, 1L), (2L, 1L)).toDF("a", "y")
    val row = graft.ops.Eval.featureAuc(df, Seq("a" -> col("a")),
      col("y") === 1L).collect().head
    assert(row.getLong(1) == 2L && row.getLong(2) == 0L && row.isNullAt(4))
  }

  test("calibrationBins: hand binning — edge values land in the right " +
    "bins, p = 10000 absorbed by the top bin, exact rates") {
    // (p, y): bin = min(p*10 div 10000, 9)
    val df = Seq(
      (0L, 0L), (999L, 1L),       // bin 0: n=2, sum_p=999, pos=1
      (1000L, 0L),                // bin 1 (exact edge)
      (9999L, 1L), (10000L, 1L)   // bin 9 (10000 clamps into 9)
    ).toDF("p", "y")
    val got = graft.ops.Eval.calibrationBins(df, "p", "y")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 1L, 0.04995, 0.5),  // 999/20000, 1/2
      (1L, 1L, 0L, 0.1, 0.0),
      (9L, 2L, 2L, 0.99995, 1.0))) // 19999/20000
  }

  test("brierScore: hand squared errors and the exact numerator") {
    // (p, y): (10000-10000)^2=0, (0-0)^2=0, (5000-10000)^2=25e6,
    // (2500-0)^2=6.25e6 -> num=31.25e6, mean over 4*1e8
    val df = Seq((10000L, 1L), (0L, 0L), (5000L, 1L), (2500L, 0L))
      .toDF("p", "y")
    val r = graft.ops.Eval.brierScore(df, "p", "y").collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 31250000L)
    assert(r.getDouble(2) == 31250000.0 / 400000000.0)
  }

  test("cohensKappa: textbook 2x2 — po 0.7, pe 0.5, kappa 0.4; " +
    "degenerate all-one-cell table yields NULL kappa") {
    val rows = Seq.fill(20)((1L, 1L)) ++ Seq.fill(5)((1L, 0L)) ++
      Seq.fill(10)((0L, 1L)) ++ Seq.fill(15)((0L, 0L))
    val r = graft.ops.Eval.cohensKappa(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((20L, 5L, 10L, 15L)))
    assert(r.getLong(4) == 50L)
    assert(r.getDouble(5) == 0.7)
    // kappa = (50*35 - (25*30 + 25*20)) / (2500 - 1250) = 500/1250
    assert(r.getDouble(6) == 0.4)
    val degen = graft.ops.Eval.cohensKappa(
      Seq.fill(3)((1L, 1L)).toDF("a", "b"), "a", "b").collect().head
    assert(degen.isNullAt(6)) // n^2 == chance: kappa undefined, not NaN
  }

  test("calibrationError: the weighted gap telescopes to the hand " +
    "integer numerator") {
    // bin 0: (0,0),(999,1): |999 - 10000| = 9001
    // bin 9: (9999,1),(10000,1): |19999 - 20000| = 1 -> num 9002, n=4
    val df = Seq((0L, 0L), (999L, 1L), (9999L, 1L), (10000L, 1L))
      .toDF("p", "y")
    val r = graft.ops.Eval.calibrationError(df, "p", "y").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 9002L)
    assert(r.getDouble(3) == 9002.0 / 40000.0)
  }

  test("annotatorAccuracy: agreement with the pinned consensus, " +
    "including the tie-resolved item") {
    val ann = Seq(
      (1L, 0L, 2L), (1L, 1L, 2L), (1L, 2L, 3L), // consensus 2
      (2L, 0L, 4L), (2L, 1L, 1L), (2L, 2L, 0L)  // 3-way tie -> 0
    ).toDF("item", "annotator", "label")
    val got = graft.ops.Eval.annotatorAccuracy(
      ann, "item", "annotator", "label")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 1L, 0.5),  // agreed on item 1 only
      (1L, 2L, 1L, 0.5),
      (2L, 2L, 1L, 0.5))) // annotator 2 agreed on item 2 (label 0)
  }

  test("majorityVote: unanimous, 2-1 majority, and the pinned " +
    "all-distinct smallest-label tie") {
    val ann = Seq(
      (1L, 2L), (1L, 2L), (1L, 2L),  // unanimous 2
      (2L, 3L), (2L, 3L), (2L, 4L),  // majority 3
      (3L, 4L), (3L, 1L), (3L, 0L)   // 3-way tie -> smallest label 0
    ).toDF("item", "label")
    val got = graft.ops.Eval.majorityVote(ann, "item", "label")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 0L, 0.0),   // the tie win is not unanimous
      (2L, 1L, 1L, 1.0),
      (3L, 1L, 0L, 0.0)))
  }

  test("passAtK: hand falling factorials — partial, zero, and " +
    "clamped-to-one problems; n < k dropped") {
    val trials = Seq(
      // problem A: n=4, c=2 -> fail 2*1=2, den 4*3=12, pass 10/12
      ("A", 1L), ("A", 0L), ("A", 0L), ("A", 1L),
      // problem B: n=3, c=0 -> fail 3*2=6 = den -> pass 0
      ("B", 0L), ("B", 0L), ("B", 0L),
      // problem C: n=2, c=2 -> n-c < k, clamp zeroes the product -> pass 1
      ("C", 1L), ("C", 1L),
      // problem D: n=1 < k -> dropped
      ("D", 1L)
    ).toDF("problem", "correct")
    val got = graft.ops.Eval.passAtK(trials, "problem", "correct", k = 2)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("A", 4L, 2L, 10.0 / 12.0), // one exact-integer double division
      ("B", 3L, 0L, 0.0),
      ("C", 2L, 2L, 1.0)))
  }

  test("krippendorffAlpha: perfect agreement is 1; hand-worked mixed " +
    "panel is -1/9; short panels are dropped from BOTH Do and De") {
    val perfect = Seq(
      (1L, 0L), (1L, 0L), (1L, 0L),
      (2L, 1L), (2L, 1L), (2L, 1L)).toDF("item", "label")
    val p = graft.ops.Eval.krippendorffAlpha(perfect, "item", "label", m = 3)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(p == ((2L, 6L, 0L, 36L, 1.0)))
    // item1 (0,0,1), item2 (0,1,1): Do = (1/6)(4/2+4/2) = 2/3,
    // De = (36-18)/30 = 3/5, alpha = 1 - (2/3)/(3/5) = -1/9;
    // item3 has only 2 of 3 ratings -> dropped everywhere
    val mixed = Seq(
      (1L, 0L), (1L, 0L), (1L, 1L),
      (2L, 0L), (2L, 1L), (2L, 1L),
      (3L, 4L), (3L, 4L)).toDF("item", "label")
    val m = graft.ops.Eval.krippendorffAlpha(mixed, "item", "label", m = 3)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(m == ((2L, 6L, 8L, 36L, (36.0 - 5.0 * 8.0) / 36.0)))
  }

  test("krippendorffAlpha: single-label universe has De 0 and NULL " +
    "alpha, not a division blow-up") {
    val ann = Seq((1L, 7L), (1L, 7L), (2L, 7L), (2L, 7L))
      .toDF("item", "label")
    val row = graft.ops.Eval.krippendorffAlpha(ann, "item", "label", m = 2)
      .select("de_num", "alpha").collect().head
    assert(row.getLong(0) == 0L && row.isNullAt(1))
  }

  test("prCurve: hand running census over distinct scores, ties " +
    "grouped, recall against the global positive total") {
    val df = Seq((3L, 1L), (2L, 1L), (2L, 0L), (1L, 0L)).toDF("p", "y")
    val got = graft.ops.Eval.prCurve(df, "p", "y")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (3L, 1L, 1L, 1.0, 0.5),
      (2L, 3L, 2L, 0.666667, 1.0),
      (1L, 4L, 2L, 0.5, 1.0)))
  }

  test("prCurve: no positives anywhere leaves recall NULL at every " +
    "threshold") {
    val df = Seq((2L, 0L), (1L, 0L)).toDF("p", "y")
    val rows = graft.ops.Eval.prCurve(df, "p", "y")
      .select("rec_e6").collect()
    assert(rows.length == 2 && rows.forall(_.isNullAt(0)))
  }

  test("chrF: hand pair — clipped char n-grams per n, chrF2 = 5m/(4r+p), " +
    "whitespace stripped, incomplete pairs dropped") {
    // ref "abab", cand "abba": n=1 all match (1.0); n=2 clip ab:1+ba:1
    // of cand's 3 grams vs ref's 3 (2/3); n=3 nothing matches (0.0).
    // doc 3 has no even partner -> no rows for pid 1.
    val docs = Seq((0L, "ab ab"), (1L, " ab ba "), (3L, "zzz"))
      .toDF("doc_id", "text")
    val got = graft.ops.Eval.chrF(docs)
      .orderBy("n")
      .as[(Long, Long, Int, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq(
      (0L, 1L, 1, 4L, 4L, 4L, 1.0, 1.0, 1.0),
      (0L, 1L, 2, 2L, 3L, 3L, 0.666667, 0.666667, 0.666667),
      (0L, 1L, 3, 0L, 2L, 2L, 0.0, 0.0, 0.0)))
  }

  // ---- generation-eval: TokenLcs + ROUGE-L / clipped BLEU / distinct-n

  private def arr(toks: String*) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)

  /** Independent reference: memo-free full-table LCS DP (NOT the two-row
    * production fallback — a genuinely separate derivation).
    */
  private def lcsRef(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length)
  }

  test("TokenLcs: known sequences on both code paths") {
    import graft.functions.TokenLcs.lcsLength
    assert(lcsLength(arr("a", "b", "c"), arr("b", "a", "c")) == 2)
    assert(lcsLength(arr("the", "cat", "sat"), arr("the", "cat", "ran")) == 2)
    assert(lcsLength(arr(), arr("a")) == 0)
    assert(lcsLength(arr("a"), arr()) == 0)
    assert(lcsLength(arr("x", "y"), arr("y", "x")) == 1)
    // identical long sequence exercises the > 64 DP fallback on b
    val long = (1 to 70).map(i => s"t${i % 7}")
    assert(lcsLength(arr(long: _*), arr(long: _*)) == 70)
  }

  test("TokenLcs: bit-parallel path (|b| <= 64, incl. the 64-bit " +
    "wrap-around boundary) agrees with an independent full-table DP " +
    "on seeded random token sequences") {
    import graft.functions.TokenLcs.lcsLength
    val rnd = new scala.util.Random(20260816L)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (_ <- 1 to 300) {
      val a = Seq.fill(rnd.nextInt(70))(vocab(rnd.nextInt(vocab.size)))
      val b = Seq.fill(rnd.nextInt(70))(vocab(rnd.nextInt(vocab.size)))
      assert(lcsLength(arr(a: _*), arr(b: _*)) == lcsRef(a, b),
        s"a=$a b=$b")
    }
    // pin the m = 64 boundary explicitly: the masked add's carry out of
    // bit 63 must be discarded by Long wrap-around, not corrupt the row
    for (_ <- 1 to 50) {
      val a = Seq.fill(64)(vocab(rnd.nextInt(vocab.size)))
      val b = Seq.fill(64)(vocab(rnd.nextInt(vocab.size)))
      assert(lcsLength(arr(a: _*), arr(b: _*)) == lcsRef(a, b))
    }
  }

  test("rougeL: hand-computed pair — LCS 2 of 3|3 tokens, F1 = 4/6") {
    val docs = Seq(
      (0L, "the cat sat", "en"),
      (1L, "the cat ran", "en")).toDF("doc_id", "text", "lang")
    val got = graft.ops.Eval.rougeL(docs)
      .select("ref_id", "cand_id", "lcs_len", "ref_len", "cand_len",
        "rouge_l_f1")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 1L, 2L, 3L, 3L, 0.666667)))
  }

  test("rougeL: an unpaired trailing reference drops out instead of " +
    "producing a null-candidate row") {
    val docs = Seq(
      (0L, "a b", "en"), (1L, "a c", "en"), (2L, "d e", "en"))
      .toDF("doc_id", "text", "lang")
    val got = graft.ops.Eval.rougeL(docs).select("ref_id")
      .as[Long].collect().toSeq
    assert(got == Seq(0L))
  }

  test("bleuClipped: clipping counts candidate n-grams at their " +
    "reference multiplicity") {
    // ref "the the cat", cand "the the the ran":
    //   unigrams: the x3 clipped at 2, ran 0 -> p1 = 2/4
    //   bigrams: "the the" x2 clipped at 1, "the ran" 0 -> p2 = 1/3
    val docs = Seq(
      (0L, "the the cat", "en"),
      (1L, "the the the ran", "en")).toDF("doc_id", "text", "lang")
    val got = graft.ops.Eval.bleuClipped(docs)
      .select("ref_id", "cand_id", "p1_num", "p1_den", "p2_num", "p2_den",
        "p1", "p2")
      .as[(Long, Long, Long, Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(got == Seq((0L, 1L, 2L, 4L, 1L, 3L, 0.5, 0.333333)))
  }

  test("bleuClipped: single-token candidate has no bigrams — p2 null, " +
    "not a divide-by-zero") {
    val docs = Seq(
      (0L, "x", "en"), (1L, "x", "en")).toDF("doc_id", "text", "lang")
    val row = graft.ops.Eval.bleuClipped(docs)
      .select("p1", "p2_den", "p2").collect().head
    assert(row.getDouble(0) == 1.0 && row.getLong(1) == 0L
      && row.isNullAt(2))
  }

  test("distinctNgrams: hand census per language and n") {
    val docs = Seq(
      (0L, "a a", "en"), (1L, "a b", "en"), (2L, "z z", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = graft.ops.Eval.distinctNgrams(docs)
      .select("lang", "n", "distinct_grams", "total_grams",
        "distinct_ratio")
      .as[(String, Int, Long, Long, Double)].collect().toSet
    assert(got == Set(
      ("en", 1, 2L, 4L, 0.5), // a a a b -> {a, b}
      ("en", 2, 2L, 2L, 1.0), // "a a", "a b"
      ("fr", 1, 1L, 2L, 0.5),
      ("fr", 2, 1L, 1L, 1.0)))
  }

  test("tokenF1: hand-computed overlaps, incl. order-insensitivity, " +
    "clipped duplicates, and the zero-overlap pair") {
    import spark.implicits._
    // pair 0: shuffled identical bag -> F1 1.0 (where WER/ROUGE punish);
    // pair 1: cand repeats 'a' 3x vs ref 2x -> overlap clips at 2 (+c) = 3;
    // pair 2: disjoint -> overlap 0, all scores 0
    val docs = Seq(
      (0L, "a b c d"), (1L, "d c b a"),
      (2L, "a a b c"), (3L, "a a a c"),
      (4L, "x y"),     (5L, "p q r")
    ).toDF("doc_id", "text")
    val got = graft.ops.Eval.tokenF1(docs)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._3, r._6, r._7, r._8))).toMap
    assert(got == Map(
      0L -> ((4L, 1.0, 1.0, 1.0)),
      2L -> ((3L, 0.75, 0.75, 0.75)),
      4L -> ((0L, 0.0, 0.0, 0.0))))
  }

  test("gleu: pooled 1+2-gram overlap, min(prec, rec) as one ratio") {
    import spark.implicits._
    // pair 0: identical "a b c": grams r = {a,b,c,'a b','b c'} (5),
    //   overlap 5 -> gleu 1.0
    // pair 1: ref "a b c" (5 grams), cand "a b" (3 grams: a, b, 'a b');
    //   overlap = a, b, 'a b' = 3; gleu = 3/max(5,3) = 0.6
    // pair 2: single-token sides (no 2-grams), disjoint -> 0
    val docs = Seq(
      (0L, "a b c"), (1L, "a b c"),
      (2L, "a b c"), (3L, "a b"),
      (4L, "x"),     (5L, "y")
    ).toDF("doc_id", "text")
    val got = graft.ops.Eval.gleu(docs)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got == Map(
      0L -> ((5L, 5L, 5L, 1.0)),
      2L -> ((3L, 5L, 3L, 0.6)),
      4L -> ((0L, 1L, 1L, 0.0))))
  }

  test("wer: hand-computed token edit distances, including WER > 1") {
    import spark.implicits._
    // pair 0: identical 4 tokens -> 0; pair 1: one substitution in 4
    // -> 0.25; pair 2: one insertion (ref 2, cand 3) -> 0.5; pair 3:
    // ref 1 token, cand 3 all different -> dist 3, WER 3.0
    val docs = Seq(
      (0L, "a b c d"), (1L, "a b c d"),
      (2L, "a b c d"), (3L, "a x c d"),
      (4L, "a b"),     (5L, "a q b"),
      (6L, "z"),       (7L, "p q r")
    ).toDF("doc_id", "text")
    val got = graft.ops.Eval.wer(docs)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._3, r._6))).toMap
    assert(got == Map(
      0L -> ((0L, 0.0)), 2L -> ((1L, 0.25)),
      4L -> ((1L, 0.5)), 6L -> ((3L, 3.0))))
  }
}
