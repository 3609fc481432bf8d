package graft

import graft.ops.Association

/** Basket co-occurrence: hand-computed supports and lifts, duplicate-line
  * collapse, deterministic top-k ordering, and the mega-basket guard.
  */
class AssociationSpec extends SparkSpec {
  import spark.implicits._

  // baskets: 1 -> {10, 20, 30}; 2 -> {10, 20}; 3 -> {10}; with a duplicate
  // (1, 10) line that must collapse before pair counting
  private def li = Seq(
    (1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L),
    (2L, 10L), (2L, 20L),
    (3L, 10L)
  ).toDF("l_orderkey", "l_partkey")

  test("hand-computed supports and lifts") {
    val rows = Association.basketPairs(li, topK = 10)
      .as[(Long, Long, Long, Double)].collect()
    // (10,20): 2 baskets; (10,30) and (20,30): 1 each
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap ==
      Map((10L, 20L) -> 2L, (10L, 30L) -> 1L, (20L, 30L) -> 1L))
    val lift = rows.map(r => (r._1, r._2) -> r._4).toMap
    // n=3 baskets; supp: 10->3, 20->2, 30->1
    assert(math.abs(lift((10L, 20L)) - 2.0 * 3 / (3 * 2)) < 1e-9)
    assert(math.abs(lift((10L, 30L)) - 1.0 * 3 / (3 * 1)) < 1e-9)
    assert(math.abs(lift((20L, 30L)) - 1.0 * 3 / (2 * 1)) < 1e-9)
  }

  test("top-k orders by support desc then pair asc, and truncates") {
    val rows = Association.basketPairs(li, topK = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == 2)
    assert((rows(0)._1, rows(0)._2) == (10L, 20L)) // support 2 first
    assert((rows(1)._1, rows(1)._2) == (10L, 30L)) // tie broken by pair id
  }

  test("mega-basket guard excludes oversized baskets from pairing") {
    val mega = (1L to 50L).map(p => (99L, p)).toDF("l_orderkey", "l_partkey")
    val both = li.unionByName(mega)
    val capped = Association.basketPairs(both, topK = 1000, maxBasketSize = 10)
      .as[(Long, Long, Long, Double)].collect()
    // mega-basket contributes no pairs AND no support: result identical to
    // the small fixture alone
    val alone = Association.basketPairs(li, topK = 1000)
      .as[(Long, Long, Long, Double)].collect()
    assert(capped.toSet == alone.toSet)
  }

  // docs: tokens a b c frequent (3/4 docs each as a triple); d rare
  private def docs = Seq(
    (1L, "a b c d"),
    (2L, "a b c"),
    (3L, "c b a a"), // duplicate token collapses; order irrelevant
    (4L, "a d")
  ).toDF("doc_id", "text")

  test("frequent triples match a brute-force count over all triples") {
    val got = Association.frequentTriples(docs, minSupportPct = 0.5, topK = 100)
      .as[(String, String, String, Long)].collect().toSet
    // brute force: every token triple's doc support, threshold ceil(4*0.5)=2
    val itemSets = Map(1L -> Set("a", "b", "c", "d"), 2L -> Set("a", "b", "c"),
      3L -> Set("a", "b", "c"), 4L -> Set("a", "d"))
    val vocab = itemSets.values.flatten.toSet.toSeq.sorted
    val expected = (for {
      i <- vocab.indices; j <- i + 1 until vocab.size; l <- j + 1 until vocab.size
      t = (vocab(i), vocab(j), vocab(l))
      sup = itemSets.values.count(s => s(t._1) && s(t._2) && s(t._3))
      if sup >= 2
    } yield (t._1, t._2, t._3, sup.toLong)).toSet
    assert(got == expected)
    assert(got == Set(("a", "b", "c", 3L)))
  }

  test("A-priori L1 restriction drops infrequent-token triples, not answers") {
    // token d appears in 2/4 docs at 75% threshold -> not L1-frequent; no
    // triple containing it can be frequent, and none survives
    val got = Association.frequentTriples(docs, minSupportPct = 0.75, topK = 100)
      .as[(String, String, String, Long)].collect()
    // a: 4 docs, b: 3, c: 3 -> threshold 3; triple (a,b,c) support 3 stays
    assert(got.toSeq == Seq(("a", "b", "c", 3L)))
  }

  test("triple order is lexicographic within the triple and stable overall") {
    val rows = Association.frequentTriples(docs, minSupportPct = 0.25, topK = 100)
      .as[(String, String, String, Long)].collect()
    rows.foreach { case (a, b, c, _) => assert(a < b && b < c) }
    val sorted = rows.sortBy { case (a, b, c, s) => (-s, a, b, c) }
    assert(rows.toSeq == sorted.toSeq)
  }

  test("localizedLevel: bound fires loudly BEFORE any driver " +
    "materialization, names the knob; in-bound sets pass through intact") {
    val lvl = Seq("a", "b", "c").toDF("token")
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val e = intercept[IllegalArgumentException](
      Association.localizedLevel(lvl, "L1 frequent-token", bound = 2))
    assert(e.getMessage.contains("exceeds the localization bound (3 > 2"))
    assert(e.getMessage.contains("minSupportPct"))
    // the failed path must release the checkpoint blocks it materialized
    // (r10 ADVICE) — no new persistent RDD may survive the throw
    assert(spark.sparkContext.getPersistentRDDs.keySet == persistedBefore,
      "bound-violation path leaked checkpoint storage")
    val ok = Association.localizedLevel(lvl, "L1 frequent-token", bound = 3)
    assert(ok.as[String].collect().toSet == Set("a", "b", "c"))
    // the localized set is materialized (lineage cut): its plan is a scan,
    // so every broadcast consumer reads bytes, never re-runs the census
    assert(ok.queryExecution.optimizedPlan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]))
  }

  test("rules: directed confidence from the pair census, support floor, " +
    "deterministic top-k") {
    // baskets: {10,20} x3, {10,30}, {20,30} -> pair (10,20) support 3;
    // (10,30) and (20,30) support 1 die at minSupport 2
    val li = Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 10L), (3L, 20L),
      (4L, 10L), (4L, 30L), (5L, 20L), (5L, 30L)
    ).toDF("l_orderkey", "l_partkey")
    val got = Association.rules(li)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // n(10)=4, n(20)=4: 10->20 conf 3/4, 20->10 conf 3/4; tie broken by
    // antecedent asc
    assert(got == Seq((10L, 20L, 3L, 4L, 0.75), (20L, 10L, 3L, 4L, 0.75)))
  }
}
