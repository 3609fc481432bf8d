package graft

import graft.ops.TextAnalysis

/** Corpus-curation policy operators: canonical normalization, greedy
  * token-budget selection, temperature mixing, and the nucleus vocab
  * cutoff — the decision layer between scoring and the training set.
  */
class CurationPolicySpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("normalize: case, punctuation and whitespace runs collapse; key is md5-stable") {
    val got = TextAnalysis.normalize(
      docs((1L, "Hello,  World!\nThis--is IT."), (2L, "hello world this is it")))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got(1L)._1 == "hello world this is it")
    assert(got(1L) == got(2L),
      "differently-punctuated duplicates share one canonical key")
  }

  test("tokenBudget admits by quality until the cumulative budget, not past it") {
    // quality is driven by length ratio/stopwords; engineer a clear order
    val hi = (1 to 30).map(i => "the quick data table spark value").mkString(" ")
    val lo = "zz zz zz zz zz zz zz zz"
    val d = docs((1L, hi), (2L, hi + " extra"), (3L, lo), (4L, lo + " zz"))
    val all = TextAnalysis.tokenBudget(d, budget = 1000000L)
      .orderBy("cum_tokens").collect()
    assert(all.length == 4, "unbounded budget admits everything")
    val cumAfterTwo = all(1).getAs[Long]("cum_tokens")
    val kept = TextAnalysis.tokenBudget(d, budget = cumAfterTwo)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(all(0).getLong(0), all(1).getLong(0)),
      "budget at the 2nd doc's cumulative count keeps exactly the best two")
  }

  test("mixTemperature: alpha=1 is a no-op mix; alpha<1 boosts small sources") {
    val d = (1 to 90).map(i => (i.toLong, "x", "big")) ++
      (91 to 100).map(i => (i.toLong, "x", "small"))
    val df = d.toDF("doc_id", "text", "source")
    val noop = TextAnalysis.mixTemperature(df, alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("sample_factor")).toMap
    assert(noop.values.forall(f => math.abs(f - 1.0) < 1e-9))

    val flat = TextAnalysis.mixTemperature(df, alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("raw_share"), r.getAs[Double]("tempered_share"),
          r.getAs[Double]("sample_factor")))).toMap
    assert(flat("small")._2 > flat("small")._1, "small source share rises")
    assert(flat("big")._2 < flat("big")._1, "big source share falls")
    assert(flat("small")._3 > 1.0 && flat("big")._3 < 1.0)
  }

  test("qualityPrune: each domain prunes at ITS OWN quantile, not a global one") {
    // lang a: token counts 1..4 (p75 disc = 3); lang b: 10..40 by tens
    // (p75 = 30). A global p75 would keep ALL of b and almost none of a;
    // per-domain keeps exactly the top quartile-and-ties of each.
    val d = Seq(
      (1L, "w", "a"), (2L, "w w", "a"), (3L, "w w w", "a"),
      (4L, "w w w w", "a"),
      (5L, ("w " * 10).trim, "b"), (6L, ("w " * 20).trim, "b"),
      (7L, ("w " * 30).trim, "b"), (8L, ("w " * 40).trim, "b")
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.qualityPrune(d)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Int]("thr"), r.getAs[Long]("n_total"),
          r.getAs[Long]("n_kept"), r.getAs[Long]("toks_kept")))).toMap
    assert(got("a") == ((3, 4L, 2L, 7L)), s"got ${got("a")}") // keeps 3,4
    assert(got("b") == ((30, 4L, 2L, 70L)), s"got ${got("b")}") // keeps 30,40
  }

  test("vocabTopP keeps the smallest prefix reaching p, boundary token included") {
    // freqs: a=5, b=3, c=1, d=1 (total 10). p=0.5 -> mass before a is 0,
    // a alone reaches 0.5 -> keep exactly {a}
    val d = docs((1L, "a a a a a b b b c d"))
    val half = TextAnalysis.vocabTopP(d, p = 0.5)
      .collect().map(_.getString(0)).toSet
    assert(half == Set("a"))
    // p=0.8: after a (0.5) < 0.8 so b joins (0.8); mass before c = 0.8 not
    // < 0.8 -> c excluded
    val most = TextAnalysis.vocabTopP(d, p = 0.8)
      .collect().map(_.getString(0)).toSet
    assert(most == Set("a", "b"))
  }
}
