package graft

import graft.ops.Graph

/** Fixed-point PageRank: hand-checkable tiny graph (independent reference
  * implementation in the test), determinism across parallelism, and mass
  * accounting under truncation.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // supplier 1 -> parts {1, 2}; supplier 2 -> part {2}
  // bipartite ids: suppliers 2,4; parts 3,5
  private def tiny = Seq(
    (1L, 1L), (1L, 2L), (2L, 2L), (1L, 2L) // duplicate edge collapses
  ).toDF("l_suppkey", "l_partkey")

  /** Independent fixed-point reference (driver-side BigInt-free: longs are
    * exact here) mirroring the operator's arithmetic spec, not its plan.
    */
  private def referenceRanks(
      edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
    val undirected = edges ++ edges.map { case (u, v) => (v, u) }
    val deg = undirected.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val n = deg.size.toLong
    val base = Graph.RankScale * 15L / 100L / n
    var r = deg.keys.map(_ -> Graph.RankScale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = undirected.toSeq
        .map { case (u, v) => v -> r(u) / deg(u) }
        .groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).sum }
      r = contrib.map { case (v, c) => v -> (base + c * 85L / 100L) }
    }
    r
  }

  test("tiny graph matches the independent fixed-point reference") {
    val expected = referenceRanks(Set((2L, 3L), (2L, 5L), (4L, 5L)), 3)
    val got = Graph.pageRank(tiny, iters = 3, topK = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    // structural sanity: part 5 (two suppliers) outranks part 3 (one)
    assert(got(5L) > got(3L))
  }

  test("identical output under different parallelism") {
    val a = Graph.pageRank(tiny.repartition(1), iters = 3, topK = 10)
      .as[(Long, Long)].collect().toSet
    val b = Graph.pageRank(tiny.repartition(7), iters = 3, topK = 10)
      .as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("rank mass is conserved up to truncation loss") {
    val ranks = Graph.pageRank(tiny, iters = 3, topK = 10)
      .as[(Long, Long)].collect()
    val total = ranks.map(_._2).sum
    // each division truncates < 1 unit per edge/node per iteration; with
    // 6 directed edges, 4 nodes, 3 iterations the loss is microscopic
    // relative to the 1e12 scale
    assert(total <= Graph.RankScale)
    assert(total > Graph.RankScale - 1000L)
    assert(ranks.forall(_._2 > 0L))
  }
}
