package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relational edge lists.
  *
  * Beyond-reference surface: the reference's only graph-shaped artifact is
  * the cell-adjacency implicit in its grid (never queried as a graph);
  * training-data pipelines, by contrast, routinely rank entities in an
  * interaction graph (documents↔sources, users↔items) to weight sampling.
  * Companion to [[Dedup.connectedComponents]], which owns the label-
  * propagation side of the graph family.
  */
object Graph {

  /** Fixed-point integer scale: ranks are BIGINTs in units of 1e-12.
    * Integer arithmetic makes every step associative and
    * order-independent, so a distributed sum over any partitioning —
    * and any other engine's sum over the same integers — produces the
    * IDENTICAL bit pattern. Floating-point PageRank cannot make that
    * cross-engine promise (sum order differs), which is why the oracle
    * certification of [[pageRank]] is exact, not tolerance-based.
    */
  val RankScale: Long = 1000000000000L

  /** PageRank over the bipartite supplier↔part interaction graph implied
    * by `lineitem`, run for `iters` synchronous iterations at damping
    * 0.85, in 1e-12 fixed point. Returns the `topK` nodes by rank:
    * `(node, rank)` where suppliers map to `2·l_suppkey` and parts to
    * `2·l_partkey + 1` (disjoint id spaces).
    *
    * Undirected edges (both directions materialized) mean every node has
    * in-degree ≥ 1, so no dangling-mass correction is needed: each
    * iteration is exactly `r' = base + 0.85·Σ r(u)/deg(u)` with the
    * division truncating in fixed point — both engines truncate
    * identically on nonnegative integers.
    *
    * Scale: the edge list is deduplicated, hash-partitioned on the source
    * ONCE and locally checkpointed — each of the `iters` joins re-reads
    * the materialized partitions instead of re-shuffling the (static,
    * data-sized) side; only the (node, rank) table — one row per node —
    * moves per iteration. The per-iteration `groupBy(dst)` is the
    * irreducible PageRank shuffle; partial aggregation collapses it to
    * O(distinct dst per partition) before the exchange. Driver state is
    * one `count()` (node count) — no collect of data-sized state.
    */
  def pageRank(
      lineitem: DataFrame, iters: Int = 3, topK: Int = 20): DataFrame = {
    val once = lineitem.select(
      (col("l_suppkey") * 2).as("u"), (col("l_partkey") * 2 + 1).as("v"))
      .distinct()
    val edges = once
      .unionByName(once.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u"))
      .localCheckpoint()
    val deg = edges.groupBy("u").agg(count(lit(1)).as("deg"))
    // deg join rides the same hash-on-u exchange the aggregate needed;
    // checkpoint the joined (u, v, deg) so iterations start from bytes
    val withDeg = edges.join(deg, "u").localCheckpoint()
    val n = deg.count()
    val base = RankScale * 15L / 100L / n
    var ranks = deg.select(col("u").as("node"), lit(RankScale / n).as("rank"))
    for (_ <- 1 to iters) {
      ranks = withDeg
        .join(ranks, withDeg("u") === ranks("node"))
        .select(col("v").as("node"), expr("rank div deg").as("c"))
        .groupBy("node")
        .agg(sum("c").as("contrib"))
        .select(col("node"),
          (lit(base) + expr("(contrib * 85) div 100")).as("rank"))
    }
    // rank_fp: "fp" for fixed-point, and a name neither engine can
    // confuse with the rank() window keyword
    ranks.orderBy(col("rank").desc, col("node").asc).limit(topK)
      .withColumnRenamed("rank", "rank_fp")
  }
}
