package graft

import org.apache.spark.sql.functions._
import graft.ops.Retrieval

/** Retrieval-layer semantics: RRF fusion arithmetic and membership,
  * stopword-induction threshold behavior, and range-search completeness
  * against a brute-force scan of the same IVF cells.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("rankFusion: doc in both pools gets both rank terms; single-pool docs keep one") {
    // doc 1 matches the query terms AND is high quality; doc 2 only
    // matches lexically; doc 3 is only high quality (long, stopword-rich)
    val corpus = docs(
      1L -> "the spark window merge of the spark and the window is that it is in the merge",
      2L -> "spark window merge",
      3L -> ("the a and of to in is that " * 8).trim,
      4L -> "zzz yyy xxx")
    val got = Retrieval.rankFusion(corpus, Seq("spark", "window", "merge"),
      poolK = 3, topK = 4).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getDouble(3)))).toMap

    val (rLex1, rQual1, rrf1) = got(1L)
    assert(rLex1.isDefined && rQual1.isDefined,
      "doc 1 must appear in both pools")
    val expected1 = BigDecimal(
      1.0 / (60 + rLex1.get.asInstanceOf[Int]) +
        1.0 / (60 + rQual1.get.asInstanceOf[Int]))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(rrf1 - expected1) < 1e-9, s"rrf mismatch: $rrf1 vs $expected1")

    // doc 3 contains none of the query terms, so it can never enter the
    // BM25 pool (pool membership requires >= 1 matching term) — its rrf
    // is exactly the single quality term
    val (rLex3, rQual3, rrf3) = got(3L)
    assert(rLex3.isEmpty && rQual3.isDefined,
      "doc 3 is quality-only: no query terms")
    assert(rrf3 == BigDecimal(1.0 / (60 + rQual3.get.asInstanceOf[Int]))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("rankFusion: both-pool membership dominates equal single-pool ranks") {
    // a doc ranked r in BOTH pools beats any doc ranked r in one pool
    val corpus = docs(
      1L -> "the spark window merge of the spark and the window is in the merge to a",
      2L -> "spark spark window window merge merge spark window merge spark",
      3L -> "qqq")
    val rows = Retrieval.rankFusion(corpus, Seq("spark", "window", "merge"),
      poolK = 2, topK = 3).collect()
    val order = rows.map(_.getLong(0)).toSeq
    val rrfOf = rows.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(order.head == 1L || rrfOf(1L) >= rrfOf.values.max - 1e-9,
      s"dual-pool doc 1 should lead: $order")
  }

  test("stopwordInduction: threshold is inclusive and ratio-exact") {
    val corpus = docs(
      1L -> "the cat sat",
      2L -> "the dog ran",
      3L -> "the cat slept",
      4L -> "a bird flew",
      5L -> "the a end")
    // df: the=4/5=0.8, cat=2/5=0.4 (inclusive boundary), a=2/5=0.4,
    // everything else 1/5
    val got = Retrieval.stopwordInduction(corpus, dfRatio = 0.4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set("the", "cat", "a"))
    assert(got("the") == ((4L, 0.8)))
    assert(got("cat") == ((2L, 0.4)), "boundary df ratio must be kept")
  }

  test("rangeSearch: matches brute-force within-cell scan, excludes self, honors radius") {
    val dim = 8
    val vecs = (0L until 120L).map { i =>
      val base = Array.tabulate(dim)(d =>
        math.sin(i * 0.37 + d * 1.3).toFloat)
      (i, base.toSeq)
    }.toDF("vec_id", "embedding")
    val got = Retrieval.rangeSearch(vecs, minCos = 0.3, queryMod = 40,
      nCentroids = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute force over the SAME cell assignment
    val cells = graft.ops.Similarity.ivfAssign(vecs, nCentroids = 4)
    val byCell = cells.select("vec_id", "cell", "vec", "norm").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toArray, r.getDouble(3)))
    val queries = byCell.filter(_._1 % 40 == 0)
    val expected = (for {
      (qid, qcell, qv, qn) <- queries.iterator
      (nid, ncell, nv, nn) <- byCell.iterator
      if ncell == qcell && nid != qid
      cos = BigDecimal(qv.zip(nv).map { case (a, b) => a * b }.sum / (qn * nn))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if cos >= 0.3
    } yield (qid, nid)).toSet
    assert(got == expected)
    assert(got.forall { case (q, n) => q != n })
  }

  test("invertedIndex: sorted postings, aligned tfs, df cap drops hot tokens") {
    import spark.implicits._
    val docs = Seq((3L, "b b a"), (1L, "a the"), (2L, "b the"), (4L, "the"))
      .toDF("doc_id", "text")
    val got = graft.ops.Retrieval.invertedIndex(docs, maxDf = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))).toMap
    // "the" has df 3 > cap: its posting list is never built
    assert(got.keySet == Set("a", "b"))
    // postings/tfs are the flat comma-joined output contract (gate-hashable)
    assert(got("a") == ((2L, 2L, "1,3", "1,1")))
    // doc 3 contributes tf 2 for "b", and postings stay doc_id-sorted
    assert(got("b") == ((2L, 3L, "2,3", "1,2")))
  }

  test("positional index: postings count equals total tokens; phrase " +
    "search finds exactly the hand-planted contiguous occurrences") {
    val docs = Seq(
      (1L, "spark fast join fast join fast"),
      (2L, "fast join nothing here"),
      (3L, "join fast join"),
      (4L, "fastjoin fast")).toDF("doc_id", "text")
    val idx = Retrieval.positionalIndex(docs)
    assert(idx.count() == 6 + 4 + 3 + 2)
    // "fast join": doc1 twice (pos 1, 3), doc2 once at 0, doc3 once at
    // 1 ("join FAST JOIN"); doc4's "fastjoin" must not match
    val hits = Retrieval.phraseSearch(docs, Seq("fast", "join"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    // 3-token phrase crosses two join steps
    val tri = Retrieval.phraseSearch(docs, Seq("join", "fast", "join"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tri == Map(1L -> 1L, 3L -> 1L))
  }

  test("topBigrams: census counts match brute force and the ordering is " +
    "fully deterministic under ties") {
    val docs = Seq(
      (1L, "a b a b c d"),
      (2L, "a b c d"),
      (3L, "c d")).toDF("doc_id", "text")
    val top = Retrieval.topBigrams(docs, k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // occurrences: (a,b)=3, (c,d)=3, (b,c)=2, (b,a)=1, (d,?)...
    // tie (a,b) vs (c,d): both 3 occurrences; docs 2 vs 3 -> (c,d) first
    assert(top(0) == ("c", "d", 3L, 3L))
    assert(top(1) == ("a", "b", 3L, 2L))
    assert(top(2) == ("b", "c", 2L, 2L))
  }

  test("wandTopK equals the unpruned BM25 top-k, and the upper-bound " +
    "prune actually drops docs on a skewed corpus") {
    // 3 docs carry the rare high-IDF term; 97 carry only the ubiquitous
    // near-zero-IDF term — their UB (max aaa impact) can't reach the
    // theta seeded from the rare-term docs' full scores
    val docs = ((1L to 3L).map(i => (i, "zzz aaa bbb")) ++
      (4L to 100L).map(i => (i, s"aaa bbb ccc ddd${i % 5}")))
      .toDF("doc_id", "text")
    val terms = Seq("zzz", "aaa")
    val exact = graft.ops.TextAnalysis.bm25(docs, terms, topK = 3)
      .as[(Long, Double)].collect().toSeq
    val wand = Retrieval.wandTopK(docs, terms, topK = 3)
      .as[(Long, Double)].collect().toSeq
    assert(wand == exact)
    val (impacts, survivors) = Retrieval.wandParts(docs, terms, 1.2, 0.75, 3)
    val matched = impacts.select("doc_id").distinct().count()
    val kept = survivors.count()
    assert(matched == 100L && kept < 10L, s"prune inert: $kept of $matched")
  }

  test("wandTopK: fewer matched docs than k disables the prune " +
    "(sentinel theta) and returns everything, exactly") {
    val docs = Seq((1L, "zzz a"), (2L, "zzz zzz b"), (3L, "c d"))
      .toDF("doc_id", "text")
    val exact = graft.ops.TextAnalysis.bm25(docs, Seq("zzz"), topK = 5)
      .as[(Long, Double)].collect().toSeq
    val wand = Retrieval.wandTopK(docs, Seq("zzz"), topK = 5)
      .as[(Long, Double)].collect().toSeq
    assert(wand == exact && wand.map(_._1).toSet == Set(1L, 2L))
  }

  test("proximitySearch: min gap over all occurrence pairs, both-term " +
    "docs only, ascending with doc-id tiebreak") {
    val docs = Seq(
      (1L, "x q q q y"),        // gap 4
      (2L, "q x y q"),          // adjacent -> gap 1
      (3L, "x q x q y x"),      // min over 3x2 pairs -> gap 1 (pos 4,5)
      (4L, "x only here"),      // no y -> excluded
      (5L, "y alone")           // no x -> excluded
    ).toDF("doc_id", "text")
    val got = Retrieval.proximitySearch(docs, "x", "y")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L, 1L, 1L), (3L, 1L, 3L, 1L),
      (1L, 4L, 1L, 1L)))
  }
}
