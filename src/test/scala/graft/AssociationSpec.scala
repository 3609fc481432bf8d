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
}
