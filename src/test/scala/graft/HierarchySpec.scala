package graft

import org.apache.spark.sql.DataFrame
import graft.ops.Hierarchy

/** Pointer-jumping ancestor closure + subtree rollup: hand-checked trees,
  * chain depth beyond one doubling round, forests, and the cycle guard.
  */
class HierarchySpec extends SparkSpec {
  import spark.implicits._

  //        1
  //       / \
  //      2   3
  //     / \   \
  //    4   5   6
  private val treeEdges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L),
    (6L, 3L)).toDF("node", "parent")
  private val treeNodes = (1L to 6L).map(i => (i, BigDecimal(i)))
    .toDF("node", "value")

  private def closureSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.as[(Long, Long, Long)].collect().toSet

  test("ancestorClosure: every (node, ancestor, distance) pair, nothing else") {
    val got = closureSet(Hierarchy.ancestorClosure(treeEdges))
    assert(got == Set((2L, 1L, 1L), (3L, 1L, 1L), (4L, 2L, 1L), (5L, 2L, 1L),
      (6L, 3L, 1L), (4L, 1L, 2L), (5L, 1L, 2L), (6L, 1L, 2L)))
  }

  test("subtreeRollup: hand-computed depths, counts, and sums") {
    val got = Hierarchy.subtreeRollup(treeNodes, treeEdges)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((0L, 6L, 21.0))) // whole tree
    assert(got(2L) == ((1L, 3L, 11.0))) // {2,4,5}
    assert(got(3L) == ((1L, 2L, 9.0)))  // {3,6}
    assert(got(4L) == ((2L, 1L, 4.0)))  // leaf
  }

  test("chain deeper than one doubling round closes completely") {
    // 1 <- 2 <- ... <- 9: depth 8 needs 3 doubling rounds (2,4,8)
    val chain = (2L to 9L).map(i => (i, i - 1)).toDF("node", "parent")
    val got = closureSet(Hierarchy.ancestorClosure(chain))
    val want = (for { n <- 2L to 9L; a <- 1L until n } yield
      (n, a, n - a)).toSet
    assert(got == want)
  }

  test("forest: disjoint roots roll up independently") {
    val edges = Seq((2L, 1L), (12L, 11L)).toDF("node", "parent")
    val nodes = Seq((1L, BigDecimal(1)), (2L, BigDecimal(2)),
      (11L, BigDecimal(10)), (12L, BigDecimal(20))).toDF("node", "value")
    val got = Hierarchy.subtreeRollup(nodes, edges)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((0L, 2L, 3.0)) && got(11L) == ((0L, 2L, 30.0)))
  }

  test("subtree distinct via merged KMV sketches: shared customer counts " +
    "once at the ancestor") {
    import org.apache.spark.sql.functions._
    // node 2 and node 3 are children of 1; customer 77 bought in BOTH
    // branches, customer 88 only under node 2 — subtree distinct at the
    // root is 2, never 3 (the thing additive rollups get wrong)
    val perNode = Seq((2L, 77L), (2L, 88L), (3L, 77L))
      .toDF("node", "cust")
      .select(col("node"), graft.ops.Sketches.hash60(col("cust")).as("hv"))
      .groupBy("node")
      .agg(graft.functions.KmvAggregate.kmv(col("hv"), 8).as("sk"))
    val edges = Seq((2L, 1L), (3L, 1L)).toDF("node", "parent")
    val pairs = Hierarchy.ancestorClosure(edges).select("node", "anc")
      .unionByName(Seq(1L, 2L, 3L).toDF("node")
        .select(col("node"), col("node").as("anc")))
    val got = pairs.join(perNode, "node")
      .select(col("anc"), explode(col("sk")).as("hv"))
      .groupBy("anc")
      .agg(graft.functions.KmvAggregate.kmv(col("hv"), 8).as("sk"))
      .select(col("anc"), size(col("sk")))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 2, 2L -> 2, 3L -> 1))
  }

  test("seeded-random forest: closure equals brute transitive closure, " +
    "rollup equals brute subtree sums") {
    val rnd = new scala.util.Random(0xBEEF)
    // random forest on 120 nodes: each node's parent is a strictly lower
    // id (acyclic by construction) or absent (root) with p = 1/8
    val parent: Map[Long, Long] = (2L to 120L).flatMap { n =>
      if (rnd.nextInt(8) == 0) None
      else Some(n -> (rnd.nextInt((n - 1).toInt).toLong + 1L))
    }.toMap
    val values = (1L to 120L).map(n => n -> BigDecimal(rnd.nextInt(100)))
    def ancestorsOf(n: Long): List[(Long, Long)] = { // (anc, dist)
      var cur = n; var d = 0L
      val out = List.newBuilder[(Long, Long)]
      while (parent.contains(cur)) {
        cur = parent(cur); d += 1; out += ((cur, d))
      }
      out.result()
    }
    val bruteClosure = (1L to 120L).flatMap(n =>
      ancestorsOf(n).map { case (a, d) => (n, a, d) }).toSet
    val edges = parent.toSeq.map { case (n, p) => (n, p) }.toDF("node", "parent")
    val got = Hierarchy.ancestorClosure(edges)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == bruteClosure)

    val valueMap = values.toMap
    val descendants = (1L to 120L).map { a =>
      a -> ((1L to 120L).filter(n =>
        n == a || ancestorsOf(n).exists(_._1 == a)))
    }.toMap
    val gotRoll = Hierarchy.subtreeRollup(
        values.toDF("node", "value"), edges)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for (a <- 1L to 120L) {
      val ds = descendants(a)
      val want = (ancestorsOf(a).size.toLong, ds.size.toLong,
        ds.map(valueMap).sum.toDouble)
      assert(gotRoll(a) == want, s"node $a")
    }
  }

  test("level-synchronous sketch rollup is bit-identical to the closure " +
    "merge and to sketching each subtree directly") {
    import org.apache.spark.sql.functions._
    import graft.functions.KmvAggregate
    val rnd = new scala.util.Random(0xACE)
    val parent: Map[Long, Long] = (2L to 60L).flatMap { n =>
      if (rnd.nextInt(6) == 0) None
      else Some(n -> (rnd.nextInt((n - 1).toInt).toLong + 1L))
    }.toMap
    val edges = parent.toSeq.map { case (n, p) => (n, p) }.toDF("node", "parent")
    // node 2n's "customers": two per node, with cross-branch overlap;
    // node 7 carries NO rows (pure relay)
    val rows = (1L to 60L).filter(_ != 7L).flatMap(n =>
      Seq((n, n % 9), (n, 100L + n % 5)))
    val perNode = rows.toDF("node", "cust")
      .select(col("node"), graft.ops.Sketches.hash60(col("cust")).as("hv"))
      .groupBy("node").agg(KmvAggregate.kmv(col("hv"), 8).as("sk"))
    val level = Hierarchy.subtreeSketchRollup(perNode, edges, k = 8)
      .as[(Long, Seq[Long])].collect().toMap
    // closure-merge path
    val pairs = Hierarchy.ancestorClosure(edges).select("node", "anc")
      .unionByName((1L to 60L).toDF("node")
        .select(col("node"), col("node").as("anc")))
    val viaClosure = pairs.join(perNode, "node")
      .groupBy(col("anc").as("node"))
      .agg(KmvAggregate.kmvMerge(col("sk"), 8).as("sk"))
      .as[(Long, Seq[Long])].collect().toMap
    // direct: brute subtree membership, sketch each subtree from raw rows
    def anc(n: Long): Set[Long] = {
      var cur = n; val out = Set.newBuilder[Long]
      while (parent.contains(cur)) { cur = parent(cur); out += cur }
      out.result()
    }
    for ((node, sk) <- viaClosure)
      assert(level(node) == sk, s"level vs closure at node $node")
    // direct-sketch certification on a sample (one Spark job per node)
    for (node <- viaClosure.keys.toSeq.sorted.take(8)) {
      val subtree = (1L to 60L).filter(m => m == node || anc(m).contains(node))
      val direct = rows.filter(r => subtree.contains(r._1))
        .toDF("node", "cust")
        .select(graft.ops.Sketches.hash60(col("cust")).as("hv"))
        .agg(KmvAggregate.kmv(col("hv"), 8)).as[Seq[Long]].head()
      assert(viaClosure(node) == direct, s"closure vs direct at node $node")
    }
    // relay node with no own rows still carries its descendants
    assert(level.contains(7L))
  }

  test("empty input: sketch rollup returns empty, no NPE on max(depth)") {
    val noEdges = Seq.empty[(Long, Long)].toDF("node", "parent")
    val noSketches = Seq.empty[(Long, Seq[Long])].toDF("node", "sk")
    assert(Hierarchy.subtreeSketchRollup(noSketches, noEdges, 8).count() == 0)
  }

  test("prebuilt closure is reused (no second validation/build)") {
    val closure = Hierarchy.ancestorClosure(treeEdges)
    val viaPrebuilt = Hierarchy.subtreeRollup(treeNodes, treeEdges,
      prebuiltClosure = Some(closure)).collect().toSet
    val direct = Hierarchy.subtreeRollup(treeNodes, treeEdges).collect().toSet
    assert(viaPrebuilt == direct)
  }

  test("multi-parent input (DAG) fails loudly, never double-counts") {
    val dag = Seq((3L, 1L), (3L, 2L)).toDF("node", "parent")
    val e = intercept[IllegalArgumentException] {
      Hierarchy.ancestorClosure(dag)
    }
    assert(e.getMessage.contains("multiple parents"))
  }

  test("cycle trips the round cap instead of spinning") {
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("node", "parent")
    val e = intercept[Exception] {
      Hierarchy.ancestorClosure(cyc, maxRounds = 3).count()
    }
    assert(e.getMessage.contains("cycle") || e.getMessage.contains("maxRounds"))
  }
}
