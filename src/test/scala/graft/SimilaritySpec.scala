package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** ANN-layer specs beyond the DuckDB oracles: k-means refinement
  * properties and multi-probe assignment mechanics on the generated
  * embeddings fixture.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  /** Mean best-centroid cosine over the corpus — the (negated) spherical
    * k-means objective.
    */
  private def meanBestCos(cents: DataFrame): Double =
    Similarity.ivfAssignTo(emb, cents)
      .join(broadcast(cents), col("cell") === col("cent_id"))
      .select(avg(Similarity.cosine(
        col("vec"), col("cvec"), col("norm"), col("cnorm"))))
      .head().getDouble(0)

  test("kmeans refinement does not decrease the spherical objective") {
    val seeds = Similarity.kmeansCentroids(emb, k = 8, iters = 0)
    val refined = Similarity.kmeansCentroids(emb, k = 8, iters = 2)
    assert(refined.count() <= 8 && refined.count() > 0)
    val before = meanBestCos(seeds)
    val after = meanBestCos(refined)
    assert(after >= before - 1e-9, s"objective regressed: $before -> $after")
  }

  test("kmeans centroids keep the embedding dimensionality") {
    val dims = Similarity.kmeansCentroids(emb, k = 4, iters = 1)
      .select(size(col("cvec"))).distinct().collect().map(_.getInt(0)).toSet
    assert(dims == Set(64))
  }

  test("multi-probe assignment emits nProbe distinct cells per vector") {
    val probes = Similarity.ivfAssign(emb, nCentroids = 16, nProbe = 3)
      .groupBy("vec_id")
      .agg(countDistinct("cell").as("n"))
      .select(min("n"), max("n")).head()
    assert(probes.getLong(0) == 3L && probes.getLong(1) == 3L)
  }

  test("multi-probe top-k recall >= single-probe (probes can only add candidates)") {
    val single = Similarity.ivfTopK(emb).select("query_id", "neighbor_id", "cos_sim")
    val multi = Similarity.ivfTopKMultiProbe(emb)
      .select("query_id", "neighbor_id", "cos_sim")
    val exact = Similarity.bruteForceTopK(emb, k = 3)
      .select("query_id", "neighbor_id")
    def recall(approx: DataFrame): Double =
      approx.join(exact, Seq("query_id", "neighbor_id")).count().toDouble /
        exact.count()
    assert(recall(multi) >= recall(single) - 1e-12)
  }

  test("centroidOutliers flags below-mean vectors deterministically") {
    import spark.implicits._
    val flagged = Similarity.centroidOutliers(emb, zThresh = 1.0)
      .as[(Long, Long, Double, Double)].collect()
    assert(flagged.nonEmpty)
    // z > 0 by construction means every flagged vector sits BELOW its
    // cell's mean own-centroid cosine (far from its cluster)
    assert(flagged.forall(_._4 > 1.0))
    val again = Similarity.centroidOutliers(emb.repartition(7), zThresh = 1.0)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(again == flagged.toSet)
  }

  test("pqEncode emits exactly m in-range codes per vector") {
    val codes = Similarity.pqEncode(emb, m = 4, codebookSize = 16)
    val shape = codes.groupBy("vec_id")
      .agg(count(lit(1)).as("n"), countDistinct("sub_m").as("nd"))
      .select(min("n"), max("n"), min("nd"), max("nd")).head()
    assert(shape == org.apache.spark.sql.Row(4L, 4L, 4L, 4L))
    val range = codes.select(min("code"), max("code")).head()
    assert(range.getLong(0) >= 0L && range.getLong(1) < 16L)
  }

  test("pq codes of a codebook seed reconstruct the seed itself") {
    // a seed vector's nearest codeword in every subspace is its own
    // subvector (distance 0), so its m codes must all equal its vec_id
    val own = Similarity.pqEncode(emb)
      .filter(col("vec_id") < 64)
      .filter(col("code") =!= col("vec_id"))
    assert(own.count() == 0)
  }

  test("pq top-k has useful recall vs the exact ranking and is repartition-stable") {
    val pq = Similarity.pqTopK(emb).select("query_id", "neighbor_id")
    val exact = Similarity.bruteForceTopK(emb, k = 5).select("query_id", "neighbor_id")
    val recall = pq.join(exact, Seq("query_id", "neighbor_id")).count().toDouble /
      exact.count()
    // seed (untrained) 16x64 codebooks on unit vectors measure ~0.52 on the
    // fixture; 0.3 leaves headroom while staying far above random (~1%)
    assert(recall >= 0.3, s"pq recall@5 $recall")
    val again = Similarity.pqTopK(emb.repartition(7))
      .select("query_id", "neighbor_id", "rnk")
      .collect().toSet
    assert(again == Similarity.pqTopK(emb)
      .select("query_id", "neighbor_id", "rnk").collect().toSet)
  }

  test("hardNegatives: never returns the query's own label, ranks by similarity") {
    val got = Similarity.hardNegatives(emb)
    val labels = emb.select(col("vec_id"), col("label"))
    val crossLabel = got
      .join(labels.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "qlabel"), "query_id")
      .filter(col("neg_label") === col("qlabel"))
    assert(crossLabel.count() == 0, "a same-label vector leaked into the negatives")
    // rnk ordering is by cos_sim desc within each query
    val bad = got.as("x").join(got.as("y"),
        col("x.query_id") === col("y.query_id") && col("x.rnk") < col("y.rnk"))
      .filter(col("x.cos_sim") < col("y.cos_sim"))
    assert(bad.count() == 0)
  }

  test("ivfpq: candidates confined to the query's cell; ADC distances agree with pq") {
    val got = Similarity.ivfPqTopK(emb)
    // every returned neighbor shares the query's IVF cell (the composite
    // sizes its index via the CellLadder, so assign with the same C)
    val cells = Similarity
      .ivfAssign(emb, Similarity.adaptiveCellCount(emb.count()))
      .select(col("vec_id"), col("cell"))
    val crossCell = got
      .join(cells.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("cell", "qcell"), "query_id")
      .join(cells.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      .filter(col("cell") =!= col("qcell"))
    assert(crossCell.count() == 0, "a neighbor escaped the probed cell")
    // within the cell, the ADC distance is EXACTLY pqTopK's for the same
    // pair (same codes, same table) - the composite changes the candidate
    // set, never the metric
    val pqAll = Similarity.pqTopK(emb, k = Int.MaxValue)
      .select(col("query_id"), col("neighbor_id"),
        col("approx_dist").as("pq_dist"))
    val joined = got.join(pqAll, Seq("query_id", "neighbor_id"))
    assert(joined.count() == got.count())
    assert(joined.filter(col("approx_dist") =!= col("pq_dist")).count() == 0)
  }

  test("ivfPqRerank: neighbors come from the ADC shortlist, scores are " +
    "the exact brute cosines, ranked by the shared tie rule") {
    val got = Similarity.ivfPqRerankTopK(emb, k = 3, depth = 25)
    // confinement: every (query, neighbor) sits in the depth-25 shortlist
    val shortlist = Similarity.ivfPqTopK(emb, k = 25)
      .select("query_id", "neighbor_id")
    assert(got.join(shortlist, Seq("query_id", "neighbor_id"), "left_anti")
      .count() == 0, "a neighbor escaped the ADC shortlist")
    // exactness: the published cos_sim equals the brute-force cosine for
    // the same pair (PQ error confined to the cut, never the score)
    val brute = Similarity.bruteForceTopK(emb, k = Int.MaxValue)
      .select(col("query_id"), col("neighbor_id"),
        col("cos_sim").as("exact_sim"))
    val j = got.join(brute, Seq("query_id", "neighbor_id"))
    assert(j.count() == got.count())
    assert(j.filter(col("cos_sim") =!= col("exact_sim")).count() == 0)
    // ordering: within a query, rnk ascends as cos_sim descends
    val bad = got.as("x").join(got.as("y"),
        col("x.query_id") === col("y.query_id") && col("x.rnk") < col("y.rnk"))
      .filter(col("x.cos_sim") < col("y.cos_sim"))
    assert(bad.count() == 0)
  }

  test("persisted IVF index: query path matches the inline ivfTopK exactly") {
    val root = tmpDir("ivfidx")
    Similarity.buildIvfIndex(emb, root)
    val fromIndex = Similarity.ivfTopKFromIndex(emb, root)
    val inline = Similarity.ivfTopK(emb)
    assert(fromIndex.exceptAll(inline).isEmpty && inline.exceptAll(fromIndex).isEmpty)
  }

  test("appendToIvfIndex: append+query is bit-identical to a rebuild over the union") {
    val root = tmpDir("ivfappend")
    // initial build holds the first 300 vectors (includes all centroid
    // seeds, vec_id < 16); the remaining 200 arrive as a later batch
    Similarity.buildIvfIndex(emb.filter(col("vec_id") < 300), root)
    val v1 = Similarity.ivfTopKFromIndex(emb, root).collect().toSet
    Similarity.appendToIvfIndex(emb.filter(col("vec_id") >= 300), root)
    val appended = Similarity.ivfTopKFromIndex(emb, root)
    // frozen centroids => append == rebuild over the union corpus
    val rebuilt = tmpDir("ivfrebuild")
    Similarity.buildIvfIndex(emb, rebuilt)
    assert(appended.exceptAll(Similarity.ivfTopKFromIndex(emb, rebuilt)).isEmpty)
    assert(Similarity.ivfTopKFromIndex(emb, rebuilt).exceptAll(appended).isEmpty)
    // the appended index sees MORE candidates than the partial one did
    assert(appended.collect().toSet != v1)
  }

  test("persisted IVF index versions: a rebuild is a new snapshot, the old stays queryable") {
    val root = tmpDir("ivfidx")
    val (_, cellsV1) = Similarity.buildIvfIndex(emb, root)
    val (_, cellsV2) = Similarity.buildIvfIndex(emb.filter(col("vec_id") < 200), root)
    assert(cellsV2 == cellsV1 + 1)
    val v1 = graft.icenet.Snapshots.read(spark, s"$root/cells", Some(cellsV1))
    val v2 = graft.icenet.Snapshots.read(spark, s"$root/cells", Some(cellsV2))
    assert(v1.count() > v2.count(), "old index version remains readable")
  }

  test("recallReport: single-cell IVF is exhaustive, so recall is exactly 1") {
    // with nCentroids = 1 every vector shares one cell and the IVF scorer
    // degenerates to brute force — recall@k must be 1.0 for every query
    val got = Similarity.recallReport(emb, nCentroids = 1).collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getDouble(2) == 1.0 && r.getLong(1) == 3L),
      "exhaustive index must reproduce the exact top-k")
    // the real 16-cell index: recall stays a valid fraction of k
    val real = Similarity.recallReport(emb).collect()
    assert(real.forall(r => r.getLong(1) >= 0L && r.getLong(1) <= 3L
      && r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("knnClassify: majority vote predicts the cluster label") {
    import spark.implicits._
    // query 0 sits in the label-7 cluster; with k = 5 its neighbors vote
    // 3 (label 7) to 2 (label 9)
    val rows = Seq(
      (0L, Array(1f, 0f), 7),
      (1L, Array(0.99f, 0.1f), 7),
      (2L, Array(0.98f, 0.15f), 7),
      (3L, Array(0.97f, 0.2f), 7),
      (4L, Array(0.6f, 0.8f), 9),
      (5L, Array(0.55f, 0.83f), 9)).toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(rows, k = 5).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 0L && r.getInt(1) == 7 && r.getInt(2) == 7
      && r.getLong(3) == 3L && r.getBoolean(4))
  }

  test("knnClassify tie-break: equal votes go to the lowest label") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array(1f, 0f), 9),
      (1L, Array(0.99f, 0.05f), 8),
      (2L, Array(0.98f, 0.1f), 3)).toDF("vec_id", "embedding", "label")
    val r = Similarity.knnClassify(rows, k = 2).collect().head
    assert(r.getInt(2) == 3 && r.getLong(3) == 1L && !r.getBoolean(4))
  }

  test("adaptiveCellCount: smallest ladder power of two with C^2 >= n, " +
    "floored at 16 and capped at the last rung") {
    assert(Similarity.adaptiveCellCount(1L) == 16)
    assert(Similarity.adaptiveCellCount(256L) == 16)
    assert(Similarity.adaptiveCellCount(257L) == 32)
    assert(Similarity.adaptiveCellCount(1024L) == 32)
    assert(Similarity.adaptiveCellCount(1025L) == 64)
    assert(Similarity.adaptiveCellCount(5L * 1000 * 1000 * 1000L) == 65536)
    assert(Similarity.adaptiveCellCount(Long.MaxValue) == 65536)
  }

  test("ivfTopKAdaptive: identical to ivfTopK at the ladder's computed " +
    "cell count") {
    val c = Similarity.adaptiveCellCount(emb.count())
    val adaptive = Similarity.ivfTopKAdaptive(emb)
    val fixed = Similarity.ivfTopK(emb, nCentroids = c)
    assert(adaptive.exceptAll(fixed).isEmpty && fixed.exceptAll(adaptive).isEmpty)
  }

  test("coarseCellCount: smallest power of two (floor 4) covering the " +
    "fine count") {
    assert(Similarity.coarseCellCount(16) == 4)
    assert(Similarity.coarseCellCount(17) == 8)
    assert(Similarity.coarseCellCount(128) == 16)
    assert(Similarity.coarseCellCount(1024) == 32)
    assert(Similarity.coarseCellCount(65536) == 256)
  }

  test("hierarchicalAssign: every fine seed lands in its OWN cell (it " +
    "is its nearest fine seed under any parent), and every vector's " +
    "cell is a fine seed under the vector's coarse parent") {
    val v = Similarity.withNorm(emb)
    val c = Similarity.adaptiveCellCount(emb.count())
    val cells = Similarity.hierarchicalAssign(v, c)
    // seeds self-assign: cosine(seed, seed) = 1 with lowest-id tie-break
    val seedRows = cells.filter(col("vec_id") < c)
      .filter(col("vec_id") =!= col("cell"))
    assert(seedRows.count() == 0, "a fine seed escaped its own cell")
    // cells are fine-seed ids
    assert(cells.filter(col("cell") >= c || col("cell") < 0).count() == 0)
    // total: every vector assigned exactly once
    assert(cells.count() == emb.count())
  }

  test("ivfTopKHierarchical: neighbors confined to the query's " +
    "hierarchical cell; deterministic under repartition") {
    val v = Similarity.withNorm(emb)
    val c = Similarity.adaptiveCellCount(emb.count())
    val cells = Similarity.hierarchicalAssign(v, c)
      .select(col("vec_id"), col("cell"))
    val got = Similarity.ivfTopKHierarchical(emb)
    val crossCell = got
      .join(cells.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("cell", "qcell"), "query_id")
      .join(cells.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      .filter(col("cell") =!= col("qcell"))
    assert(crossCell.count() == 0, "a neighbor escaped the probed cell")
    val again = Similarity.ivfTopKHierarchical(
      emb.repartition(7, col("vec_id")))
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
  }

  test("mipsTopK ranks by raw inner product: magnitude wins where cosine " +
    "would tie, and the heap aggregate matches a window re-rank") {
    import spark.implicits._
    // query [1,0]; candidates along the same direction with different
    // norms plus an orthogonal one: cosine calls a and b identical
    // (both 1.0), MIPS must put the LONGER b first.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0L),   // query (vec_id % 50 == 0)
      (1L, Array(2.0f, 0.0f), 0L),   // a: ip 2
      (2L, Array(5.0f, 0.0f), 0L),   // b: ip 5 — same cosine as a
      (3L, Array(0.0f, 9.0f), 0L))   // orthogonal: ip 0
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.mipsTopK(vecs, k = 3, queryMod = 50)
      .orderBy("rnk").as[(Long, Long, Double, Long)].collect()
    assert(got.map(_._2).toSeq == Seq(2L, 1L, 3L), s"order was ${got.toSeq}")
    assert(got.map(_._3).toSeq == Seq(5.0, 2.0, 0.0))
    // independent driver-side reference on the sf0.001 fixture: same
    // index-order dot, same HALF_UP rounding, same tie-break — catches
    // heap pruning, self-match, and subset bugs alike
    val emb001 = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = emb001.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val expect = rows.filter(_._1 % 50 == 0).flatMap { case (qid, qv) =>
      rows.filter(_._1 != qid).map { case (nid, nv) =>
        val ip = BigDecimal(
          qv.zip(nv).map { case (a, b) => a.toDouble * b.toDouble }.sum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (qid, nid, ip)
      }.sortBy(t => (-t._3, t._2)).take(5)
        .zipWithIndex.map { case ((q, n, s), i) => (q, n, s, (i + 1).toLong) }
    }.toSet
    val mips = Similarity.mipsTopK(emb001)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(mips == expect)
  }

  test("mipsIvfTopK: published scores are exact dots (subset of the " +
    "exact scorer's candidate scores); query-form multi-probe recall@5 " +
    "vs exact MIPS is high") {
    import spark.implicits._
    val c = Similarity.adaptiveCellCount(emb.count())
    val ivf = Similarity.mipsIvfTopK(emb, nCentroids = c)
      .as[(Long, Long, Double, Long)].collect()
    val exact = Similarity.mipsTopK(emb, k = 1000000, queryMod = 50)
    // every published (query, neighbor, ip) must appear in the exact
    // scorer's full candidate scoring with the IDENTICAL score — the
    // reduction may drop candidates, never change a score
    val exactScores = exact.drop("rnk").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(ivf.forall(r => exactScores.get((r._1, r._2)).contains(r._3)),
      "an ivf-published score diverged from the exact dot")
    // recall@5: the augmented-cosine bucketing should find most true
    // neighbors on the fixture (same band the cosine IVF family holds)
    val trueTop = exact.filter(col("rnk") <= 5)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val gotTop = ivf.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = trueTop.map { case (q, t) =>
      (gotTop.getOrElse(q, Set.empty) & t).size.toDouble / t.size
    }.sum / trueTop.size
    info(f"recall@5 vs exact MIPS = $recall%.3f (query-form, nProbe=4)")
    assert(recall >= 0.5, s"recall@5 = $recall — bucketing broken")
  }
}
